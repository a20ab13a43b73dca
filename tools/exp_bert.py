"""BarcodeBERT-shaped ablations: B=256, L=12, N=133, D=768, vocab=1030 head."""
import math
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

B, L, N, D, H, F, V = 256, 12, 133, 768, 12, 3072, 1030
HD = D // H


def timeit(fn, *args, iters=10, warmup=3):
    for _ in range(warmup):
        o = fn(*args)
    np.asarray(o if o.ndim == 0 else o.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    np.asarray(o if o.ndim == 0 else o.reshape(-1)[0])
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
        "head_w": g(D, V), "head_b": g(V),
    }


def build(variant):
    cd = jnp.bfloat16
    scale = 1.0 / math.sqrt(HD)
    use_tanh = variant in ("fast", "fast_nohead")
    with_head = variant != "fast_nohead" and variant != "base_nohead"

    def ln(s, b, x, eps=1e-12):
        if variant.startswith("fast"):
            mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32).astype(x.dtype)
            xc = x - mean
            var = jnp.mean(jax.lax.square(xc.astype(jnp.float32)), axis=-1, keepdims=True)
            return xc * jax.lax.rsqrt(var + eps).astype(x.dtype) * s.astype(x.dtype) + b.astype(x.dtype)
        x32 = x.astype(jnp.float32)
        mean = x32.mean(axis=-1, keepdims=True)
        var = ((x32 - mean) ** 2).mean(axis=-1, keepdims=True)
        return ((x32 - mean) * jax.lax.rsqrt(var + eps) * s + b).astype(x.dtype)

    def attn(p, x, bias):
        qkv = jnp.dot(x, p["qkv_w"].astype(cd), preferred_element_type=cd) + p["qkv_b"].astype(cd)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def sh(t):
            return t.reshape(B, N, H, HD).transpose(0, 2, 1, 3)

        q, k, v = sh(q), sh(k), sh(v)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=cd) * scale + bias.astype(cd)
        pr = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(cd)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", pr, v, preferred_element_type=cd)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, N, D)
        return jnp.dot(ctx, p["out_w"].astype(cd), preferred_element_type=cd) + p["out_b"].astype(cd)

    def mlp(p, x):
        h = jnp.dot(x, p["fc1_w"].astype(cd), preferred_element_type=cd) + p["fc1_b"].astype(cd)
        h = jax.nn.gelu(h, approximate=use_tanh)
        return jnp.dot(h, p["fc2_w"].astype(cd), preferred_element_type=cd) + p["fc2_b"].astype(cd)

    def block(h, p, bias):
        h = ln(p["ln1_scale"], p["ln1_bias"], h + attn(p, h, bias))
        h = ln(p["ln2_scale"], p["ln2_bias"], h + mlp(p, h))
        return h

    @jax.jit
    def run(params, x, mask):
        bias = ((1.0 - mask.astype(jnp.float32)) * jnp.finfo(jnp.float32).min)[:, None, None, :]
        stacked = {k: v for k, v in params.items() if k not in ("head_w", "head_b")}
        y, _ = jax.lax.scan(lambda h, p: (block(h, p, bias), None), x.astype(cd), stacked)
        if with_head:
            logits = jnp.dot(y, params["head_w"].astype(cd), preferred_element_type=cd) + params["head_b"].astype(cd)
            pr = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return pr.mean(axis=1)  # [B, V]
        return y

    return run


def main():
    variants = sys.argv[1:] or ["base", "base_nohead", "fast", "fast_nohead"]
    params = make_params()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, N, D), dtype=np.float32))
    mask = jnp.ones((B, N), jnp.int32)
    for v in variants:
        fn = build(v)
        dt = timeit(fn, params, x, mask)
        print(f"{v:14s}: {dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
