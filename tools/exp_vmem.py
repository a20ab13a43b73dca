"""Measure the flash-kernel block_b scoped-VMEM compile boundary under remat.

ADVICE round 4 (medium): `vmem_safe_block_b`'s ceiling model
(12.7·block_b·Npad·D·2 bytes, measured 2026-08-18 on the INTERLEAVED kernel
with the old N→16 HBM padding) was never recalibrated for (a) the round-4
phased forward, which keeps every head's fp32 QK^T tile + bf16 prob tile
live at once, and (b) the N-pad removal (Npad now == N).  This probe finds
the true compile boundary the way production hits it: jax.grad of a
2-block remat(save-attn) residual stack at batch 500, AOT-compiled, per
(shape, phased, block_b).  A scoped-VMEM overflow is a compile-time
RESOURCE_EXHAUSTED / Mosaic error — no step needs to run.

Usage: python tools/exp_vmem.py [vit|bert] [phased 0|1] [block_b ...]
(remote compiles are slow — probe one (shape, phased) pair per invocation)
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from clibd_tpu.ops.pallas import attention as A

B = 500
SHAPES = [
    ("vit", 197, 768, 12, False),
    ("bert", 133, 768, 12, True),
]


def build_step(n, d, num_heads, has_mask, block_b):
    rng = np.random.default_rng(0)
    params = {
        "qkv_w": jnp.asarray(rng.standard_normal((d, 3 * d), dtype=np.float32) * 0.02,
                             dtype=jnp.bfloat16),
        "out_w": jnp.asarray(rng.standard_normal((d, d), dtype=np.float32) * 0.02,
                             dtype=jnp.bfloat16),
    }
    x = jnp.asarray(rng.standard_normal((B, n, d), dtype=np.float32), dtype=jnp.bfloat16)
    mask = None
    if has_mask:
        m = np.zeros((B, n), dtype=np.float32)
        m[:, -8:] = np.float32(np.finfo(np.float32).min)
        mask = jnp.asarray(m)

    def block(p, h):
        qkv = jnp.dot(h, p["qkv_w"], preferred_element_type=jnp.bfloat16)
        ctx = checkpoint_name(
            A.flash_attention_qkv(qkv, num_heads, mask_row=mask, block_b=block_b),
            "attn_ctx")
        return h + jnp.dot(ctx, p["out_w"], preferred_element_type=jnp.bfloat16)

    block = jax.checkpoint(
        block, policy=jax.checkpoint_policies.save_only_these_names("attn_ctx"))

    def loss(p):
        h = block(p, x)
        h = block(p, h)
        return jnp.sum(h.astype(jnp.float32) ** 2)

    return jax.grad(loss), params


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "vit"
    phased = bool(int(sys.argv[2])) if len(sys.argv) > 2 else True
    bbs = [int(a) for a in sys.argv[3:]] or [2, 3, 4]
    A.ATTN_FWD_PHASED = phased
    print(f"backend={jax.default_backend()} B={B}", flush=True)
    name, n, d, h, has_mask = next(s for s in SHAPES if s[0] == which)
    for bb in bbs:
        fn, params = build_step(n, d, h, has_mask, bb)
        t0 = time.time()
        try:
            jax.jit(fn).lower(params).compile()
            verdict = "OK"
        except Exception as e:  # noqa: BLE001 — any compile failure is data
            full = str(e).replace("\n", " ")
            key = [s for s in ("vmem", "VMEM", "scoped", "exceeds", "scratch")
                   if s in full]
            msg = full[:160] + (f" ... [{'|'.join(key)}] ... " + full[-240:]
                                if key else full[160:340])
            verdict = f"FAIL {msg}"
        print(f"phased={int(phased)} {name:4s} N={n} block_b={bb}: "
              f"{verdict}  ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
