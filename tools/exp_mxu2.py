"""Mosaic GEMM rate tuning, 8192^3 bf16 (above the ~1.2 ms dispatch floor).

Baseline from round 2: XLA 123.7 TF/s; naive Pallas 256x256x512 = 61.8 TF/s.
If Pallas can approach XLA's rate, the fused-outproj attention and an MLP
megakernel become wins.  Run: python tools/exp_mxu2.py [variant ...]
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = N = K = 8192


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        o = fn(*args)
    np.asarray(o.reshape(-1)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn(*args)
        np.asarray(o.reshape(-1)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def report(name, dt):
    print(f"{name:44s}: {dt*1e3:8.2f} ms ({2*M*N*K/dt/1e12:6.1f} TF/s)", flush=True)


def make_tiled(tm, tn, tk, out_bf16=False, semantics=False):
    def kern(a_ref, b_ref, o_ref, acc):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        acc[:] += jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)

        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            o_ref[:] = acc[:].astype(o_ref.dtype)

    params = {}
    if semantics:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kern,
            grid=(M // tm, N // tn, K // tk),
            in_specs=[
                pl.BlockSpec((tm, tk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
                pl.BlockSpec((tk, tn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16 if out_bf16 else jnp.float32),
            scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * M * N * K, bytes_accessed=(M * K + K * N + M * N) * 2,
                transcendentals=0),
            **params,
        )(a, b)

    return run


VARIANTS = {
    "xla": None,
    "t256x256x512": (256, 256, 512, False, False),
    "t512x512x512": (512, 512, 512, False, False),
    "t512x512x512_sem": (512, 512, 512, False, True),
    "t512x512x512_bf16out_sem": (512, 512, 512, True, True),
    "t512x1024x512_bf16out_sem": (512, 1024, 512, True, True),
    "t1024x512x512_bf16out_sem": (1024, 512, 512, True, True),
    "t512x512x1024_bf16out_sem": (512, 512, 1024, True, True),
    "t512x512x2048_bf16out_sem": (512, 512, 2048, True, True),
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32), jnp.bfloat16)
    for name in names:
        if name == "xla":
            fn = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32))
        else:
            fn = make_tiled(*VARIANTS[name])
        t0 = time.perf_counter()
        try:
            o = fn(a, b)
            np.asarray(o.reshape(-1)[0])
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:120]}", flush=True)
            continue
        print(f"  [{name}] compile {time.perf_counter()-t0:.1f}s", flush=True)
        report(name, timeit(fn, a, b))


if __name__ == "__main__":
    main()
