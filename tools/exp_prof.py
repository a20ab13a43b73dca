"""Per-encoder / per-component timing on the real chip, flagship bench config.

Usage: python tools/exp_prof.py [both image dna ...]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from clibd_tpu.config.schema import ExperimentConfig
from clibd_tpu.models import init_clibd_params
from clibd_tpu.models.clibd import clibd_apply

BATCH = 256


def timeit(fn, *args, iters=10, warmup=3):
    for _ in range(warmup):
        o = fn(*args)
    jax.tree.map(np.asarray, o)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn(*args)
        jax.tree.map(np.asarray, o)
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    which = sys.argv[1:] or ["both", "image", "dna"]
    cfg = ExperimentConfig()
    cfg.language.enable = False
    cfg.disable_lora = True
    params = init_clibd_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.random((BATCH, 224, 224, 3), dtype=np.float32))
    dna = jnp.asarray(rng.integers(0, 1027, (BATCH, 133)).astype(np.int32))

    if "both" in which:
        @jax.jit
        def encode(params, image, dna):
            out = clibd_apply(params, cfg, image_input=image, dna_input=dna)
            return out["image"], out["dna"]

        dt = timeit(encode, params, image, dna)
        print(f"both: {dt*1e3:.1f} ms/batch  {BATCH/dt:.0f} samples/s", flush=True)

    if "image" in which:
        @jax.jit
        def encode_img(params, image):
            return clibd_apply(params, cfg, image_input=image)["image"]

        dt = timeit(encode_img, params, image)
        print(f"image only: {dt*1e3:.1f} ms/batch  {BATCH/dt:.0f} img/s", flush=True)

    if "dna" in which:
        @jax.jit
        def encode_dna(params, dna):
            return clibd_apply(params, cfg, dna_input=dna)["dna"]

        dt = timeit(encode_dna, params, dna)
        print(f"dna only: {dt*1e3:.1f} ms/batch  {BATCH/dt:.0f} samples/s", flush=True)


if __name__ == "__main__":
    main()
