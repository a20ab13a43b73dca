"""Round-2 attention experiments on the real chip.

Measures: (1) whether Pallas/Mosaic executes at hardware speed through the
axon tunnel (bandwidth probe), (2) the per-layer cost of attention variants
at ViT-B/16 shapes (B=256, H=12, N=197, hd=64).
"""
import functools
import math
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        o = fn(*args)
    jax.tree.map(lambda x: np.asarray(x[(0,) * x.ndim]) if hasattr(x, "ndim") and x.ndim else np.asarray(x), o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    jax.tree.map(lambda x: np.asarray(x[(0,) * x.ndim]) if hasattr(x, "ndim") and x.ndim else np.asarray(x), o)
    return (time.perf_counter() - t0) / iters


def probe_pallas_bandwidth():
    """Copy 64 MB through a trivial Pallas kernel; compiled TPU should do this
    in ~0.2 ms (2*64MB/819GB/s); interpreted would take seconds."""
    x = jnp.ones((8192, 2048), jnp.float32)  # 64 MB

    def kern(i_ref, o_ref):
        o_ref[:] = i_ref[:] * 2.0

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            grid=(64,),
            in_specs=[pl.BlockSpec((128, 2048), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((128, 2048), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x)

    t0 = time.perf_counter()
    o = run(x)
    np.asarray(o[0, 0])
    print(f"pallas copy compile+run: {time.perf_counter()-t0:.2f}s", flush=True)
    dt = timeit(run, x, iters=50)
    print(f"pallas copy 64MB: {dt*1e3:.3f} ms  ({2*64e-3/dt:.1f} GB/s)", flush=True)


def probe_pallas_matmul():
    """1024^3 matmul in one program: MXU probe. bf16 peak ~197 TFLOPs -> 11 us."""
    a = jnp.ones((1024, 1024), jnp.bfloat16)
    b = jnp.ones((1024, 1024), jnp.bfloat16)

    def kern(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1024, 1024), jnp.float32),
        )(a, b)

    t0 = time.perf_counter()
    o = run(a, b)
    np.asarray(o[0, 0])
    print(f"pallas matmul compile+run: {time.perf_counter()-t0:.2f}s", flush=True)
    dt = timeit(run, a, b, iters=50)
    print(f"pallas 1024^3 matmul: {dt*1e6:.1f} us  ({2*1024**3/dt/1e12:.1f} TFLOP/s)", flush=True)


B, H, N, HD = 256, 12, 197, 64


def make_qkv(dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, N, HD), dtype=np.float32), dtype=dtype)
    k = jnp.asarray(rng.standard_normal((B, H, N, HD), dtype=np.float32), dtype=dtype)
    v = jnp.asarray(rng.standard_normal((B, H, N, HD), dtype=np.float32), dtype=dtype)
    return q, k, v


@jax.jit
def attn_xla_current(q, k, v):
    scale = 1.0 / math.sqrt(HD)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.bfloat16) * scale
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.bfloat16)


@jax.jit
def attn_xla_bf16softmax(q, k, v):
    scale = 1.0 / math.sqrt(HD)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m).astype(jnp.bfloat16)
    s = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
    probs = (e / s.astype(jnp.bfloat16))
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.bfloat16)


@jax.jit
def attn_dpa(q, k, v):
    # jax.nn.dot_product_attention expects [B, N, H, hd]
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    o = jax.nn.dot_product_attention(qt, kt, vt)
    return o.transpose(0, 2, 1, 3)


def _round_up(x, m):
    return -(-x // m) * m


def make_pallas_attn(bb: int, np_pad: int, fuse_heads: bool):
    """grid (B//bb,), block [bb, H, Np, hd]; heads looped inside with 2D dots."""
    scale = 1.0 / math.sqrt(HD)

    def kern(q_ref, k_ref, v_ref, o_ref):
        for b in range(bb):
            for h in range(H):
                q2 = q_ref[b, h]  # [Np, hd]
                k2 = k_ref[b, h]
                v2 = v_ref[b, h]
                s = jax.lax.dot_general(
                    q2, k2, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < N, s, -1e30)
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
                o_ref[b, h] = jax.lax.dot_general(
                    p, v2, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(o_ref.dtype)

    @jax.jit
    def run(q, k, v):
        np_ = _round_up(N, 128)
        pad = [(0, 0), (0, 0), (0, np_ - N), (0, 0)]
        qp, kp, vp = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        blk = pl.BlockSpec((bb, H, np_, HD), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kern,
            grid=(B // bb,),
            in_specs=[blk, blk, blk],
            out_specs=blk,
            out_shape=jax.ShapeDtypeStruct((B, H, np_, HD), q.dtype),
        )(qp, kp, vp)
        return out[:, :, :N, :]

    return run


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "probe"):
        probe_pallas_bandwidth()
        probe_pallas_matmul()
    q, k, v = make_qkv()
    flops = 4 * B * H * N * N * HD
    if which in ("all", "xla"):
        dt = timeit(attn_xla_current, q, k, v)
        print(f"xla current (bf16 scores, fp32 softmax): {dt*1e3:.2f} ms/layer ({flops/dt/1e12:.1f} TF/s)", flush=True)
        dt = timeit(attn_xla_bf16softmax, q, k, v)
        print(f"xla flashless bf16 e/sum: {dt*1e3:.2f} ms/layer ({flops/dt/1e12:.1f} TF/s)", flush=True)
    if which in ("all", "dpa"):
        dt = timeit(attn_dpa, q, k, v)
        print(f"jax.nn.dot_product_attention: {dt*1e3:.2f} ms/layer ({flops/dt/1e12:.1f} TF/s)", flush=True)
    if which in ("all", "pallas"):
        for bb in (4, 8):
            t0 = time.perf_counter()
            fn = make_pallas_attn(bb, 256, False)
            o = fn(q, k, v)
            np.asarray(o[0, 0, 0, 0])
            print(f"pallas bb={bb} compile: {time.perf_counter()-t0:.1f}s", flush=True)
            ref = attn_xla_current(q, k, v)
            err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - ref.astype(jnp.float32))))
            dt = timeit(fn, q, k, v)
            print(f"pallas grid(B/{bb}) per-head 2D dots: {dt*1e3:.2f} ms/layer ({flops/dt/1e12:.1f} TF/s) maxerr={err:.4f}", flush=True)


if __name__ == "__main__" and not (len(sys.argv) > 1 and sys.argv[1] == "extra"):
    main()


@jax.jit
def attn_nosoftmax(q, k, v):
    scale = 1.0 / math.sqrt(HD)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.bfloat16) * scale
    return jnp.einsum("bhqk,bhkd->bhqd", scores, v, preferred_element_type=jnp.bfloat16)


@jax.jit
def attn_bf16_softmax(q, k, v):
    scale = 1.0 / math.sqrt(HD)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.bfloat16) * scale
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.bfloat16)


@jax.jit
def softmax_only(s):
    return jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)


@jax.jit
def softmax_only_bf16(s):
    return jax.nn.softmax(s, axis=-1)


@jax.jit
def bw_probe(x):
    return x * 2.0


def extra():
    q, k, v = make_qkv()
    flops = 4 * B * H * N * N * HD
    x = jnp.ones((64, 1024, 1024), jnp.float32)  # 256 MB
    dt = timeit(bw_probe, x, iters=30)
    print(f"XLA elementwise 256MB r+w: {dt*1e3:.2f} ms ({2*x.nbytes/dt/1e9:.0f} GB/s)", flush=True)
    dt = timeit(attn_nosoftmax, q, k, v)
    print(f"attn matmuls only (no softmax): {dt*1e3:.2f} ms ({flops/dt/1e12:.1f} TF/s)", flush=True)
    dt = timeit(attn_bf16_softmax, q, k, v)
    print(f"attn full-bf16 softmax: {dt*1e3:.2f} ms ({flops/dt/1e12:.1f} TF/s)", flush=True)
    s = jnp.ones((B, H, N, N), jnp.bfloat16)
    dt = timeit(softmax_only, s)
    print(f"softmax f32 on [B,H,N,N] bf16: {dt*1e3:.2f} ms ({2*s.nbytes/dt/1e9:.0f} GB/s eff)", flush=True)
    dt = timeit(softmax_only_bf16, s)
    print(f"softmax bf16 on [B,H,N,N] bf16: {dt*1e3:.2f} ms ({2*s.nbytes/dt/1e9:.0f} GB/s eff)", flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "extra":
    extra()
