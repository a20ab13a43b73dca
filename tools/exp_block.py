"""Block-stack ablations at ViT-B/16 shape (B=256, L=12, N=197, D=768).

Each variant times a full 12-layer scanned stack so layout/fusion effects are
realistic. Run: python tools/exp_block.py [variant ...]
"""
import math
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

B, L, N, D, H, F = 256, 12, 197, 768, 12, 3072
HD = D // H


def timeit(fn, *args, iters=10, warmup=3):
    for _ in range(warmup):
        o = fn(*args)
    np.asarray(o[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    np.asarray(o[0, 0, 0])
    return (time.perf_counter() - t0) / iters


def make_params():
    rng = np.random.default_rng(0)

    def g(*shape):
        return jnp.asarray(rng.standard_normal(shape, dtype=np.float32) * 0.02)

    return {
        "qkv_w": g(L, D, 3 * D), "qkv_b": g(L, 3 * D),
        "out_w": g(L, D, D), "out_b": g(L, D),
        "fc1_w": g(L, D, F), "fc1_b": g(L, F),
        "fc2_w": g(L, F, D), "fc2_b": g(L, D),
        "ln1_scale": jnp.ones((L, D)), "ln1_bias": jnp.zeros((L, D)),
        "ln2_scale": jnp.ones((L, D)), "ln2_bias": jnp.zeros((L, D)),
    }


def ln_f32(scale, bias, x, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = ((x32 - mean) ** 2).mean(axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias).astype(x.dtype)


def ln_bf16(scale, bias, x, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32).astype(x.dtype)
    xc = x - mean
    var = jnp.mean(jax.lax.square(xc.astype(jnp.float32)), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps).astype(x.dtype)
    return xc * inv * scale.astype(x.dtype) + bias.astype(x.dtype)


def build(variant):
    cd = jnp.bfloat16
    scale = 1.0 / math.sqrt(HD)

    def attn(p, x):
        qkv = jnp.dot(x, p["qkv_w"].astype(cd), preferred_element_type=cd) + p["qkv_b"].astype(cd)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if variant in ("bnhd", "bnhd_lnbf16", "bnhd_tanh", "best"):
            # no explicit transpose: batch dims (b, h) at positions (0, 2)
            q = q.reshape(B, N, H, HD)
            k = k.reshape(B, N, H, HD)
            v = v.reshape(B, N, H, HD)
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=cd) * scale
            pr = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(cd)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", pr, v, preferred_element_type=cd)
            ctx = ctx.reshape(B, N, D)
        else:
            def sh(t):
                return t.reshape(B, N, H, HD).transpose(0, 2, 1, 3)
            q, k, v = sh(q), sh(k), sh(v)
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=cd) * scale
            pr = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(cd)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", pr, v, preferred_element_type=cd)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(B, N, D)
        return jnp.dot(ctx, p["out_w"].astype(cd), preferred_element_type=cd) + p["out_b"].astype(cd)

    use_tanh = variant in ("tanh", "bnhd_tanh", "best")
    use_lnbf16 = variant in ("lnbf16", "bnhd_lnbf16", "best")
    ln = ln_bf16 if use_lnbf16 else ln_f32

    def mlp(p, x):
        h = jnp.dot(x, p["fc1_w"].astype(cd), preferred_element_type=cd) + p["fc1_b"].astype(cd)
        h = jax.nn.gelu(h, approximate=use_tanh)
        return jnp.dot(h, p["fc2_w"].astype(cd), preferred_element_type=cd) + p["fc2_b"].astype(cd)

    def block(h, p):
        h = h + attn(p, ln(p["ln1_scale"], p["ln1_bias"], h))
        h = h + mlp(p, ln(p["ln2_scale"], p["ln2_bias"], h))
        return h, None

    @jax.jit
    def run(params, x):
        y, _ = jax.lax.scan(block, x.astype(cd), params)
        return y

    return run


def main():
    variants = sys.argv[1:] or ["base", "bnhd", "lnbf16", "tanh", "best"]
    params = make_params()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, N, D), dtype=np.float32))
    base_out = None
    for v in variants:
        fn = build(v)
        o = fn(params, x)
        if base_out is None:
            base_out = o
        err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - base_out.astype(jnp.float32))))
        dt = timeit(fn, params, x)
        print(f"{v:14s}: {dt*1e3:7.2f} ms/stack   maxerr_vs_base={err:.4f}", flush=True)


if __name__ == "__main__":
    main()
