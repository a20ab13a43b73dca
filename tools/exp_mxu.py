"""Can Mosaic reach the MXU on this chip at all? Try canonical matmul forms."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = N = K = 2048


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        o = fn(*args)
    np.asarray(o.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    np.asarray(o.reshape(-1)[0])
    return (time.perf_counter() - t0) / iters


def report(name, dt):
    print(f"{name:34s}: {dt*1e6:9.1f} us ({2*M*N*K/dt/1e12:6.1f} TF/s)", flush=True)


def xla_mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def make_tiled(tm, tn, use_pl_dot=False):
    def kern(a_ref, b_ref, o_ref, acc):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        if use_pl_dot:
            acc[:] += pl.dot(a_ref[:], b_ref[:])
        else:
            acc[:] += jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)

        @pl.when(k == pl.num_programs(2) - 1)
        def _():
            o_ref[:] = acc[:].astype(o_ref.dtype)

    tk = 512

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
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        )(a, b)

    return run


def main():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((M, K), dtype=np.float32), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((K, N), dtype=np.float32), jnp.bfloat16)
    report("xla dot", timeit(jax.jit(xla_mm), a, b))
    for tm, tn, pld in ((512, 512, False), (256, 256, False), (512, 512, True)):
        t0 = time.perf_counter()
        fn = make_tiled(tm, tn, pld)
        o = fn(a, b)
        np.asarray(o[0, 0])
        ref = xla_mm(a, b)
        err = float(jnp.max(jnp.abs(o - ref)))
        name = f"pallas tiled {tm}x{tn} {'pl.dot' if pld else 'jnp.dot'}"
        print(f"  compile {time.perf_counter()-t0:.1f}s maxerr {err:.4f}", flush=True)
        report(name, timeit(fn, a, b))


if __name__ == "__main__":
    main()
