#!/usr/bin/env python
"""Single-core decode/encode throughput of the pure-numpy codecs
(jpegcodec sequential + progressive, PNG, WAV G.711/IMA, MJPEG-AVI).

These run inside mapInPandas on executors, so per-image cost is
embarrassingly parallel — the point of recording single-core numbers is
(a) honesty about the Python codec tax vs the raw path and (b) a
regression baseline. Writes one JSON line; give --out a NEW filename
(never point it at committed evidence).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402


def _images(n, w, h, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (n, h // 4, w // 4, 3), dtype=np.uint8)
    return np.repeat(np.repeat(base, 4, axis=1), 4, axis=2)


def _time(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--n", type=int, default=50, help="images per codec")
    ap.add_argument("--size", type=int, default=64, help="square image edge")
    args = ap.parse_args()

    from bench import cpu_sentinel
    from datasketches_cpp_spark.operators.audiocodec import (
        decode_wav,
        encode_wav,
    )
    from datasketches_cpp_spark.operators.avicodec import decode_avi, encode_avi
    from datasketches_cpp_spark.operators.imagecodec import decode, encode
    from datasketches_cpp_spark.operators.jpegcodec import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    sentinel = cpu_sentinel()
    n, s = args.n, args.size
    imgs = _images(n, s, s)
    out = {
        "what": "single-core codec throughput (executor-parallel in the lanes)",
        "sentinel_sec": round(sentinel, 3),
        "n_images": n,
        "image_px": f"{s}x{s}",
        "results": {},
    }

    seq = [encode_jpeg(im, s, s, quality=90) for im in imgs]
    pro = [encode_jpeg_progressive(im, s, s, quality=90) for im in imgs]
    png = [encode(im.reshape(-1), s, s, "png") for im in imgs]
    res = out["results"]
    res["jpeg_seq_decode_img_per_s"] = round(
        n / _time(lambda: [decode_jpeg(b) for b in seq]), 1
    )
    res["jpeg_prog_decode_img_per_s"] = round(
        n / _time(lambda: [decode_jpeg(b) for b in pro]), 1
    )
    res["jpeg_seq_encode_img_per_s"] = round(
        n / _time(lambda: [encode_jpeg(im, s, s, quality=90) for im in imgs]), 1
    )
    res["png_decode_img_per_s"] = round(
        n / _time(lambda: [decode(b, s, s, "png") for b in png]), 1
    )

    # MJPEG AVI: one 32-frame clip
    clip = _images(32, s, s, seed=9).tobytes()
    avi = encode_avi(clip, s, s, 32, codec="mjpg")
    res["mjpeg_avi_decode_frames_per_s"] = round(
        32 / _time(lambda: decode_avi(avi)), 1
    )

    # audio: 10 s of 16 kHz mono per codec
    t = np.arange(160000)
    pcm = (np.sin(2 * np.pi * 440 * t / 16000) * 20000).astype("<i2")
    for codec in ("pcm16", "mulaw", "ima_adpcm", "float32"):
        wav = encode_wav(pcm, 16000, codec=codec)
        sec = _time(lambda wav=wav: decode_wav(wav))
        res[f"wav_{codec}_decode_x_realtime"] = round(10.0 / sec, 1)

    line = json.dumps(out)
    print(line)
    if args.out:
        if os.path.exists(args.out):
            raise SystemExit(f"refusing to overwrite {args.out}")
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
