#!/usr/bin/env python3
"""Generate the committed EIP-137 namehash expected-vectors parquet.

Run once (builder-side tooling, not part of the library):
    python3 tools/gen_namehash_vectors.py

Writes src/main/resources/graft/namehash_vectors.parquet with columns
(name STRING, namehash STRING — uppercase hex, matching Spark `hex`).

The keccak-256 here is an INDEPENDENT pure-Python implementation of the
public Keccak specification (Bertoni/Daemen/Peeters/Van Assche,
keccak.team; Ethereum 0x01 padding, not SHA-3's 0x06), written from the
spec — it shares no code with the engine's Scala Keccak256 expression.
It self-checks against published vectors (empty-string keccak256 and
the EIP-137 namehash examples) before writing anything, so a bug here
fails loudly instead of committing wrong expectations. NamehashOracleSpec
then cross-checks every row against the Scala implementation in CI.

Label-splitting mirrors the engine's `String.split('.')` semantics
(Scala drops TRAILING empty labels; interior empties are kept) so edge
vectors like "foo..eth" and "foo." pin the exact behavior.
"""
import os
import random
import struct
import sys

ROT = [[0, 36, 3, 41, 18],
       [1, 44, 10, 45, 2],
       [62, 6, 43, 15, 61],
       [28, 55, 25, 21, 56],
       [27, 20, 39, 8, 14]]

RC = [0x0000000000000001, 0x0000000000008082, 0x800000000000808a,
      0x8000000080008000, 0x000000000000808b, 0x0000000080000001,
      0x8000000080008081, 0x8000000000008009, 0x000000000000008a,
      0x0000000000000088, 0x0000000080008009, 0x000000008000000a,
      0x000000008000808b, 0x800000000000008b, 0x8000000000008089,
      0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
      0x000000000000800a, 0x800000008000000a, 0x8000000080008081,
      0x8000000000008080, 0x0000000080000001, 0x8000000080008008]

MASK = (1 << 64) - 1
RATE = 136  # bytes: 1600/8 - 2*256/8


def _rotl(v, n):
    return ((v << n) | (v >> (64 - n))) & MASK


def _keccak_f(s):
    for rnd in range(24):
        # theta
        c = [s[x] ^ s[x + 5] ^ s[x + 10] ^ s[x + 15] ^ s[x + 20]
             for x in range(5)]
        for x in range(5):
            d = c[(x + 4) % 5] ^ _rotl(c[(x + 1) % 5], 1)
            for y in range(5):
                s[x + 5 * y] ^= d
        # rho + pi
        b = [0] * 25
        for x in range(5):
            for y in range(5):
                b[y + 5 * ((2 * x + 3 * y) % 5)] = _rotl(s[x + 5 * y],
                                                         ROT[x][y])
        # chi
        for x in range(5):
            for y in range(5):
                s[x + 5 * y] = b[x + 5 * y] ^ (
                    (~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y]
                    & MASK)
        # iota
        s[0] ^= RC[rnd]


def keccak256(data: bytes) -> bytes:
    state = [0] * 25
    padded = bytearray(data)
    pad_len = RATE - (len(data) % RATE)
    padded += b"\x00" * pad_len
    padded[len(data)] ^= 0x01
    padded[-1] ^= 0x80
    for off in range(0, len(padded), RATE):
        for lane in range(RATE // 8):
            state[lane] ^= struct.unpack_from("<Q", padded,
                                              off + 8 * lane)[0]
        _keccak_f(state)
    return b"".join(struct.pack("<Q", state[i]) for i in range(4))


def split_labels(name: str):
    """Mirror Scala String.split('.'): drop trailing empty strings."""
    parts = name.split(".")
    while parts and parts[-1] == "":
        parts.pop()
    return parts


def namehash(name: str) -> bytes:
    node = b"\x00" * 32
    if name:
        for label in reversed(split_labels(name)):
            node = keccak256(node + keccak256(label.encode("utf-8")))
    return node


def self_check():
    # Published keccak-256 vectors: the empty-input digest is the
    # ubiquitous Ethereum "empty code hash"; "abc" is the classic
    # Keccak submission vector.
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    # EIP-137 spec vectors.
    assert namehash("").hex() == "00" * 32
    assert namehash("eth").hex() == (
        "93cdeb708b7545dc668eb9280176169d1c33cfd8ed6f04690a0bcc88a93fc4ae")
    assert namehash("foo.eth").hex() == (
        "de9b09fd7c5f901e23a3f19fecc54828e9c848539801e86591bd9801b019f84f")


def vector_names():
    names = [
        # EIP-137 spec pins.
        "", "eth", "foo.eth",
        # Plain ASCII labels of assorted shapes.
        "alice.eth", "a.eth", "0.eth", "123.eth", "foo-bar.eth",
        "-leading.eth", "trailing-.eth", "--.eth",
        "a.b.c.d.eth", "sub.domain.alice.eth",
        # Case sensitivity is the caller's problem (EIP-137 hashes the
        # normalized form); the expression hashes bytes as given.
        "Foo.eth", "FOO.ETH",
        # Interior / trailing empty labels (Scala split semantics).
        "foo..eth", "foo.", "foo..", ".",
        # Multi-byte UTF-8: 2-, 3-, 4-byte sequences.
        "héllo.eth", "ξ.eth", "中文.eth",
        "\U0001f525.eth", "\U0001f9e0\U0001f680.eth",
        # TPC-H-ish curated part names (what a23's corpus side hashes).
        "goldenrod-lavender-spring-chiffon.eth",
        "blush-thistle-blue-yellow-saddle.eth",
    ]
    # Label lengths straddling the 136-byte sponge rate and one
    # multi-block label; plus the 64-byte node||labelhash block size.
    for n in (31, 32, 63, 64, 135, 136, 137, 300):
        names.append(("x" * n) + ".eth")
    # Deterministic pseudo-random names (seeded: reproducible output,
    # no run-time dependence — Date/random are banned in the engine,
    # not in offline tooling).
    rng = random.Random(137)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789-"
    uni = "éα世\U0001f31f"
    for _ in range(200):
        k = rng.randint(1, 4)
        labels = []
        for _ in range(k):
            ln = rng.randint(1, 40)
            chars = alphabet + (uni if rng.random() < 0.3 else "")
            labels.append("".join(rng.choice(chars) for _ in range(ln)))
        names.append(".".join(labels) + ".eth")
    # De-dup, keep order.
    seen, out = set(), []
    for n in names:
        if n not in seen:
            seen.add(n)
            out.append(n)
    return out


def main():
    self_check()
    import pyarrow as pa
    import pyarrow.parquet as pq
    names = vector_names()
    # Uppercase hex to match Spark's `hex()` on binary.
    hashes = [namehash(n).hex().upper() for n in names]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))),
        "src", "main", "resources", "graft", "namehash_vectors.parquet")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    table = pa.table({"name": names, "namehash": hashes})
    pq.write_table(table, out)
    print(f"wrote {len(names)} vectors -> {out}")


if __name__ == "__main__":
    sys.exit(main())
