#!/usr/bin/env python3
"""Generate the committed tiny REAL embedding model + its expected
outputs (independent implementation — the media-fixtures pattern).

Writes, under src/main/resources/graft/:

  linear_embedder.bin       the model artifact MediaEmbedder loads:
                            magic 'GFTW' | int32 LE in_dim=256 |
                            int32 LE out_dim=8 | out*in float32 LE
                            weights (row-major, one row per output)
  linear_expected.parquet   (name, features list<float32>) — the
                            embeddings an independent Python
                            implementation computes for every
                            media fixture payload

The model is a real linear encoder over a byte-histogram feature map:
feat[i] = count(byte == i) / len(payload), out[j] = sum_i feat[i] *
W[j][i], accumulated in float64 in ascending i (the JVM side loops the
same order, so the float32 cast of the sum is bit-identical), then
cast to float32. Weights are a deterministic LCG expansion — no RNG
library whose stream could drift between versions.
"""
import struct

import pyarrow as pa
import pyarrow.parquet as pq

IN_DIM = 256
OUT_DIM = 8
MAGIC = b"GFTW"


def weights():
    # Deterministic LCG in [-0.5, 0.5): replicable from the spec text
    # alone, no numpy RNG stream dependence.
    w = []
    state = 20260815
    for _ in range(OUT_DIM * IN_DIM):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        # struct round-trips through float32 so the file and this
        # reference computation use the SAME quantized weight.
        v = struct.unpack("<f", struct.pack("<f", (state >> 11) / float(1 << 53) - 0.5))[0]
        w.append(v)
    return w


def embed(payload, w):
    n = len(payload)
    hist = [0] * IN_DIM
    for b in payload:
        hist[b] += 1
    feat = [c / float(n) for c in hist]  # float64, exact counts
    out = []
    for j in range(OUT_DIM):
        acc = 0.0
        for i in range(IN_DIM):
            acc += feat[i] * w[j * IN_DIM + i]  # float64, ascending i
        out.append(struct.unpack("<f", struct.pack("<f", acc))[0])
    return out


def main():
    w = weights()
    res = "src/main/resources/graft"
    with open(f"{res}/linear_embedder.bin", "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<ii", IN_DIM, OUT_DIM))
        f.write(struct.pack(f"<{len(w)}f", *w))

    fixtures = pq.read_table(f"{res}/media_fixtures.parquet")
    names = fixtures.column("name").to_pylist()
    medias = fixtures.column("media").to_pylist()
    feats = [embed(m, w) for m in medias]
    pq.write_table(pa.table({
        "name": pa.array(names, pa.string()),
        "features": pa.array(feats, pa.list_(pa.float32())),
    }), f"{res}/linear_expected.parquet")
    print(f"wrote {res}/linear_embedder.bin ({OUT_DIM}x{IN_DIM} f32) and "
          f"{len(names)} expected embeddings to {res}/linear_expected.parquet")


if __name__ == "__main__":
    main()
