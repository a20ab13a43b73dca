"""Flash-backward floor analysis (VERDICT r4 #4).

Computes the HBM-traffic and MXU-FLOP floors of `_flash_bwd_kernel` at the
flagship shapes and measures the standalone kernel against them, plus the
ATTN_BWD_GROUP head-phasing A/B.  The kernel's unavoidable traffic per
(sample, layer) is 7 [N, D] bf16 passes — read qkv (3) + dO (1), write
dqkv (3); its MXU work is 5 dots of 2N²hd per head (S, dV, dP, dQ, dK).

Usage:
  python tools/exp_bwd_floor.py table           # the analytic floor table
  python tools/exp_bwd_floor.py measure [group ...]   # on-chip kernel timing
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

B = 500
LAYERS = 12
SHAPES = [("vit", 197, 768, 12, False), ("bert", 133, 768, 12, True)]
PEAK_TFS = 197.0       # v5e bf16
DMA_TUNNEL = 170e9     # measured Pallas DMA through this env's tunnel
DMA_SPEC = 819e9       # v5e HBM spec


def table():
    total_flop = total_bytes = 0.0
    print(f"{'tower':6s} {'N':>4s} {'GFLOP/step':>11s} {'GB/step':>8s} "
          f"{'MXU ms@100%':>11s} {'MXU ms@30%':>10s} {'DMA ms@170':>10s} {'@819':>6s}")
    for name, n, d, h, _ in SHAPES:
        hd = d // h
        flop = 10 * n * n * d * 2 / 2  # 5 dots x 2*N^2*hd per head x H = 10*N^2*D
        flop = 10 * n * n * d
        bytes_ = 7 * n * d * 2
        step_flop = flop * B * LAYERS
        step_bytes = bytes_ * B * LAYERS
        total_flop += step_flop
        total_bytes += step_bytes
        # 0.30 = measured-shape MXU tile utilization: every dot pads two of
        # (M, N, K) from (197|133, 64) up to 128-multiples
        mxu_full = step_flop / (PEAK_TFS * 1e12) * 1e3
        print(f"{name:6s} {n:4d} {step_flop/1e9:11.1f} {step_bytes/1e9:8.2f} "
              f"{mxu_full:11.2f} {mxu_full/0.30:10.1f} "
              f"{step_bytes/DMA_TUNNEL*1e3:10.1f} {step_bytes/DMA_SPEC*1e3:6.1f}")
    print(f"{'TOTAL':6s}      {total_flop/1e9:11.1f} {total_bytes/1e9:8.2f} "
          f"{total_flop/(PEAK_TFS*1e12)*1e3:11.2f} "
          f"{total_flop/(PEAK_TFS*1e12)*1e3/0.30:10.1f} "
          f"{total_bytes/DMA_TUNNEL*1e3:10.1f} {total_bytes/DMA_SPEC*1e3:6.1f}")
    print("""
Measured standalone (this chip, 2026-08-20, `measure 1 2 3`): group=1
totals 104.3 ms/step-equiv (ViT 48.6 + BERT 55.7) ≈ the traced 122 ms
remat-context share; ATTN_BWD_GROUP=3 totals 71.8 ms (ViT 40.1 + BERT
31.7, −31%) — within 1.6× of the 30%-tile-utilization MXU floor above,
i.e. the kernel runs FASTER than the 170 GB/s tunnel-DMA roofline
(~262-318 GB/s effective), so Pallas DMA streaming on this chip exceeds
that older microbench figure and the binding constraint is MXU tile
padding (197|133 rows, 64-wide head dots), partially hidden by grouping.""")


def measure(groups):
    import jax
    import jax.numpy as jnp

    from clibd_tpu.ops.pallas import attention as A

    print(f"backend={jax.default_backend()} B={B} block_b=2", flush=True)
    rng = np.random.default_rng(0)
    for name, n, d, h, has_mask in SHAPES:
        qkv = jnp.asarray(rng.standard_normal((B, n, 3 * d)).astype(np.float32) * 0.3,
                          dtype=jnp.bfloat16)
        mr = None
        if has_mask:
            m = np.zeros((B, n), np.float32)
            m[:, -8:] = np.finfo(np.float32).min
            mr = jnp.asarray(m)
        g_out = jnp.asarray(rng.standard_normal((B, n, d)).astype(np.float32),
                            dtype=jnp.bfloat16)

        for group in groups:
            A.ATTN_BWD_GROUP = group
            A._make_flash.cache_clear()

            def loss(t):
                return jnp.sum((A.flash_attention_qkv(t, h, mask_row=mr,
                                                      block_b=2) * g_out)
                               .astype(jnp.float32))

            # reduce the [B, N, 3D] grad to a scalar ON DEVICE — reading the
            # full dqkv back is a 454 MB d2h through the tunnel (~3 s) that
            # would swamp the kernel time being measured
            gfn = jax.jit(lambda t: jnp.sum(
                jax.grad(loss)(t).astype(jnp.float32)))
            np.asarray(gfn(qkv))  # force compile + warm
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(5):
                    out = gfn(qkv)
                np.asarray(out)
                best = min(best, (time.perf_counter() - t0) / 5)
            # fwd+bwd together (grad includes the forward); subtract the
            # forward measured separately
            ffn = jax.jit(loss)
            np.asarray(ffn(qkv))
            fbest = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(5):
                    r = ffn(qkv)
                np.asarray(r)
                fbest = min(fbest, (time.perf_counter() - t0) / 5)
            per_layer_bwd = (best - fbest) * 1e3
            print(f"{name:4s} group={group}: grad(fwd+bwd) {best*1e3:7.2f} ms  "
                  f"fwd {fbest*1e3:7.2f} ms  bwd-only {per_layer_bwd:7.2f} ms/layer-eq  "
                  f"(x{LAYERS} layers = {per_layer_bwd*LAYERS:6.1f} ms/step-tower)",
                  flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "measure":
        measure([int(a) for a in sys.argv[2:]] or [1, 2, 3])
    else:
        table()
