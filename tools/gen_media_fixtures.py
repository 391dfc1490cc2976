#!/usr/bin/env python3
"""Generate the committed multimodal fixtures + expected-features
parquets for the h1_media_decode machine oracle (the a23
gen_namehash_vectors.py pattern: an INDEPENDENT implementation computes
the expected values, the engine must reproduce them through the
driver's hash gate).

Two outputs under src/main/resources/graft/:
  media_fixtures.parquet  (name, kind, media BINARY) — real PNG and
    WAV payloads written by pure-Python encoders (struct+zlib for PNG,
    the stdlib wave module for WAV; no PIL/scipy needed), plus one
    deliberately corrupt payload.
  media_expected.parquet  (name, kind, img_width, img_height, mean_r,
    mean_g, mean_b, sample_rate, n_channels, n_samples, rms) — the
    features graft.multimodal.Media.decodeImageStats /
    decodeAudioStats must produce, computed HERE from the known pixel
    and sample values with the engine's documented arithmetic
    (float32 mean = float32(channel_sum) / float32(w*h*255); rms =
    float32(sqrt(mean of (s/32768)^2 over interleaved samples)));
    numpy.float32 replicates JVM strict IEEE-754 single precision
    bit-for-bit, so no rounding slop is needed anywhere.

Deterministic: fixed pixel/sample formulas, no RNG, stable row order —
regenerating produces byte-identical values (parquet container bytes
may differ; values cannot).
"""
import io
import math
import struct
import wave
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def png_rgb(w, h, pixel):
    """Minimal 8-bit truecolor PNG: IHDR/IDAT/IEND only — no gAMA, no
    iCCP, no sRGB chunk, so no decoder applies color management and
    getRGB returns the raw pixel values."""
    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes(v for x in range(w) for v in pixel(x, y))
        for y in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def bmp_rgb(w, h, pixel):
    """Minimal 24-bit uncompressed BMP (bottom-up rows, BGR byte
    order, rows padded to 4 bytes) — the second lossless JDK image
    codec h1 proves, written byte-exactly with no library."""
    row_size = (3 * w + 3) // 4 * 4
    data_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + data_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size,
                      2835, 2835, 0, 0)
    rows = []
    for y in range(h - 1, -1, -1):
        row = bytearray()
        for x in range(w):
            r, g, b = pixel(x, y)
            row += bytes((b, g, r))
        row += b"\x00" * (row_size - len(row))
        rows.append(bytes(row))
    return header + dib + b"".join(rows)


def _ext80(x):
    """80-bit IEEE 754 extended float (AIFF's COMM sample-rate field)
    for a positive integer: biased 15-bit exponent + explicit-leading-
    one 64-bit mantissa."""
    e = x.bit_length() - 1
    return struct.pack(">HQ", 16383 + e, x << (63 - e))


def aiff_pcm16(rate, channels, frames):
    """Big-endian PCM16 AIFF, hand-packed (FORM/COMM/SSND — the
    bmp_rgb approach; the stdlib aifc module was removed in Python
    3.13, PEP 594) — exercises the decoder's big-endian
    sample-assembly branch, which the little-endian WAVs never do."""
    flat = [s for frame in frames for s in frame]
    data = struct.pack(">%dh" % len(flat), *flat)
    comm = struct.pack(">hLh", channels, len(frames), 16) + _ext80(rate)
    ssnd = struct.pack(">LL", 0, 0) + data
    body = (b"AIFF"
            + b"COMM" + struct.pack(">L", len(comm)) + comm
            + b"SSND" + struct.pack(">L", len(ssnd)) + ssnd)
    return b"FORM" + struct.pack(">L", len(body)) + body


def wav_pcm16(rate, channels, frames):
    """PCM16 little-endian WAV from per-frame sample tuples."""
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(channels)
    w.setsampwidth(2)
    w.setframerate(rate)
    flat = [s for frame in frames for s in frame]
    w.writeframes(struct.pack("<%dh" % len(flat), *flat))
    w.close()
    return buf.getvalue()


def image_expected(w, h, pixel):
    """Replicates Media.decodeImageStats: per-channel mean intensity =
    float32(channel_sum) / float32(((w_f32 * h) * 255))."""
    sums = [0, 0, 0]
    for y in range(h):
        for x in range(w):
            p = pixel(x, y)
            for c in range(3):
                sums[c] += p[c]
    n = np.float32(np.float32(np.float32(w) * np.float32(h)) * np.float32(255))
    return [float(np.float32(np.float32(s) / n)) for s in sums]


def audio_expected(frames):
    """Replicates Media.decodeAudioStats' RMS walk: samples consumed in
    interleaved stream order, s = short/32768.0 in double, sum of s*s
    sequentially in double, rms = float32(sqrt(sum/n))."""
    total = 0.0
    n = 0
    for frame in frames:
        for s in frame:
            v = s / 32768.0
            total += v * v
            n += 1
    return float(np.float32(math.sqrt(total / n)))


def main():
    rows = []  # (name, kind, media, imgw, imgh, mr, mg, mb, sr, ch, ns, rms)

    def img_pixel(a, b, c, d, e, f):
        return lambda x, y: ((a * x + b * y + 3) % 256,
                             (c * x + d * y + 8) % 256,
                             (e * x + f * y + 29) % 256)

    for name, w, h, enc, pix in [
        ("png_7x5", 7, 5, png_rgb, img_pixel(13, 7, 5, 11, 3, 17)),
        ("png_16x9", 16, 9, png_rgb, img_pixel(31, 5, 17, 23, 7, 13)),
        ("png_1x1", 1, 1, png_rgb, lambda x, y: (200, 100, 50)),
        ("bmp_9x7", 9, 7, bmp_rgb, img_pixel(7, 19, 11, 3, 23, 5)),
    ]:
        mr, mg, mb = image_expected(w, h, pix)
        rows.append((name, "image", enc(w, h, pix),
                     w, h, mr, mg, mb, None, None, None, None))

    def mono_frames(n, amp, period):
        return [(int(amp * math.sin(2 * math.pi * i / period)),)
                for i in range(n)]

    def stereo_frames(n):
        return [(((i * 173 + 11) % 20001) - 10000,
                 ((i * 97 + 5) % 16001) - 8000) for i in range(n)]

    m = mono_frames(512, 10000, 18.18)
    rows.append(("wav_mono_8k", "audio", wav_pcm16(8000, 1, m),
                 None, None, None, None, None,
                 8000.0, 1, 512, audio_expected(m)))
    st = stereo_frames(300)
    rows.append(("wav_stereo_44k", "audio", wav_pcm16(44100, 2, st),
                 None, None, None, None, None,
                 44100.0, 2, 300, audio_expected(st)))
    ai = [((((i * 211 + 17) % 24001) - 12000,)) for i in range(256)]
    rows.append(("aiff_mono_11k", "audio", aiff_pcm16(11025, 1, ai),
                 None, None, None, None, None,
                 11025.0, 1, 256, audio_expected(ai)))

    rows.append(("corrupt_bytes", "corrupt",
                 b"not-a-media-payload \x00\xff\x13\x37" * 9,
                 None, None, None, None, None,
                 None, None, None, None))

    # ---- resize fixtures (h2_media_resize) -------------------------
    # SOLID-COLOR payloads only, on purpose: bilinear (or any convex
    # resampling whose weights sum to 1) of a constant image is that
    # constant, so the expected post-resize channel means are
    # RESAMPLER-INDEPENDENT — the gate proves the decode → resize →
    # PNG re-encode → re-decode round trip and the null contract
    # without pinning AWT's interpolation kernel (which no independent
    # implementation could replicate bit-for-bit). Target dims must
    # match the h2 registration (GroupH.scala): 8x6.
    RESIZE_W, RESIZE_H = 8, 6
    rrows = []  # (name, media, ow, oh, out_w, out_h, mr, mg, mb)
    for name, w, h, enc, color in [
        ("solid_png_7x5", 7, 5, png_rgb, (200, 100, 50)),
        ("solid_png_1x1", 1, 1, png_rgb, (17, 250, 3)),     # upscale
        ("solid_png_16x9", 16, 9, png_rgb, (255, 0, 255)),  # downscale
        ("solid_bmp_9x7", 9, 7, bmp_rgb, (0, 255, 128)),    # 2nd codec
    ]:
        mr, mg, mb = image_expected(RESIZE_W, RESIZE_H,
                                    lambda x, y, c=color: c)
        rrows.append((name, enc(w, h, lambda x, y, c=color: c),
                      w, h, RESIZE_W, RESIZE_H, mr, mg, mb))
    rrows.append(("corrupt_bytes", b"\x89PNG but not really \x00\xff" * 7,
                  None, None, None, None, None, None, None))

    resize_fixtures = pa.table({
        "name": pa.array([r[0] for r in rrows], pa.string()),
        "media": pa.array([r[1] for r in rrows], pa.binary()),
    })
    resize_expected = pa.table({
        "name": pa.array([r[0] for r in rrows], pa.string()),
        "orig_width": pa.array([r[2] for r in rrows], pa.int32()),
        "orig_height": pa.array([r[3] for r in rrows], pa.int32()),
        "out_width": pa.array([r[4] for r in rrows], pa.int32()),
        "out_height": pa.array([r[5] for r in rrows], pa.int32()),
        "mean_r": pa.array([r[6] for r in rrows], pa.float64()),
        "mean_g": pa.array([r[7] for r in rrows], pa.float64()),
        "mean_b": pa.array([r[8] for r in rrows], pa.float64()),
    })

    names = [r[0] for r in rows]
    fixtures = pa.table({
        "name": pa.array(names, pa.string()),
        "kind": pa.array([r[1] for r in rows], pa.string()),
        "media": pa.array([r[2] for r in rows], pa.binary()),
    })
    expected = pa.table({
        "name": pa.array(names, pa.string()),
        "kind": pa.array([r[1] for r in rows], pa.string()),
        "img_width": pa.array([r[3] for r in rows], pa.int32()),
        "img_height": pa.array([r[4] for r in rows], pa.int32()),
        "mean_r": pa.array([r[5] for r in rows], pa.float64()),
        "mean_g": pa.array([r[6] for r in rows], pa.float64()),
        "mean_b": pa.array([r[7] for r in rows], pa.float64()),
        "sample_rate": pa.array([r[8] for r in rows], pa.float64()),
        "n_channels": pa.array([r[9] for r in rows], pa.int32()),
        "n_samples": pa.array([r[10] for r in rows], pa.int64()),
        "rms": pa.array([r[11] for r in rows], pa.float64()),
    })
    out = "src/main/resources/graft"
    pq.write_table(fixtures, f"{out}/media_fixtures.parquet")
    pq.write_table(expected, f"{out}/media_expected.parquet")
    pq.write_table(resize_fixtures, f"{out}/resize_fixtures.parquet")
    pq.write_table(resize_expected, f"{out}/resize_expected.parquet")
    print(f"wrote {len(rows)} fixtures to {out}/media_fixtures.parquet "
          f"and expected features to {out}/media_expected.parquet; "
          f"{len(rrows)} resize fixtures to {out}/resize_fixtures.parquet "
          f"and expected to {out}/resize_expected.parquet")


if __name__ == "__main__":
    main()
