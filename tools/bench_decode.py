"""Native decode+transform throughput per core (img/s, single thread).

The decode leg is the tightest leg of the v5e-8 >=10x scaling model
(docs/PERF.md): ~13.6k img/s of demand vs ~224 cores on a production host.
This tool measures the per-core rate at the production geometry (256px HDF5
crops -> eval CenterCrop(224) / train RandomResizedCrop(224)) and on
oversized sources where DCT-scaled decode engages.

Usage: python tools/bench_decode.py [--lib PATH] [--n N]
  --lib: alternate .so (e.g. one built with the eval fast path disabled,
         for an A/B against the current library).
"""
import argparse
import io
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from clibd_tpu.data.native import NativeDecoder, native_lib_path


def make_jpegs(n: int, h: int, w: int, smooth: bool = True) -> list:
    from PIL import Image

    rng = np.random.default_rng(0)
    out = []
    for i in range(n):
        if smooth:
            y, x = np.mgrid[0:h, 0:w].astype(np.float32)
            r = 127 + 100 * np.sin(x / (31.0 + i % 7)) * np.cos(y / 23.0)
            g = 127 + 100 * np.cos(x / 29.0 + i)
            b = 127 + 100 * np.sin((x + y) / 51.0)
            arr = np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.uint8)
        else:
            arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=85)
        out.append(buf.getvalue())
    return out


def rate(dec: NativeDecoder, jpegs: list, repeats: int = 3, **kw) -> float:
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        dec.decode_transform_batch(jpegs, rng=np.random.default_rng(1), **kw)
        best = min(best, time.perf_counter() - t0)
    return len(jpegs) / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lib", default=None)
    ap.add_argument("--n", type=int, default=256)
    args = ap.parse_args()
    dec = NativeDecoder(args.lib or native_lib_path(), num_threads=1)

    j256 = make_jpegs(args.n, 256, 256)
    big = make_jpegs(args.n // 4, 600, 800)
    rows = [
        ("eval 256->224 (production)", rate(dec, j256, train=False)),
        ("train 256->224 (production)", rate(dec, j256, train=True)),
        ("eval 600x800->224, dct off", rate(dec, big, train=False, dct_scale=False)),
        ("eval 600x800->224, dct on", rate(dec, big, train=False, dct_scale=True)),
        ("train 600x800->224, dct off", rate(dec, big, train=True, dct_scale=False)),
        ("train 600x800->224, dct on", rate(dec, big, train=True, dct_scale=True)),
    ]
    for name, r in rows:
        print(f"{name:32s} {r:8.1f} img/s/core")


if __name__ == "__main__":
    main()
