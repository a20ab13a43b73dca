"""Flash-attention kernel variants: parity (CPU interpret) + chip timing.

Round-4 trace (docs/PERF.md "Round-4 extraction profile"): the 24 Pallas
flash calls cost 24.1 ms of the 114.9 ms extraction step — ~1 ms/call vs a
~0.4 ms combined HBM(310 MB @ 819 GB/s)+MXU(30.5 GFLOP @ ~50% util at
hd=64) floor.  Candidate explanation: each (batch, head) iteration is a
serial dot -> softmax -> dot chain, so the MXU idles during every softmax
unless the compiler software-pipelines across the unrolled iterations.

Variants (same math, same [B, N, 3D] fused-qkv layout as production
ops/pallas/attention.py):
  v0      production flash_attention_qkv (baseline)
  phased  per batch element: ALL heads' QK^T dots first, then all softmaxes,
          then all PV dots — cross-head independence made explicit
  batched one 3D batched dot_general over a stacked [H, N, hd] tensor
          (may not lower in Mosaic; a compile failure is a result too)

Usage:
  python tools/exp_flash.py parity            # CPU interpret-mode parity
  python tools/exp_flash.py time [block_b...] # real-chip timing sweep
"""
import functools
import math
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clibd_tpu.ops.pallas.attention import (
    flash_attention_qkv, _xla_attention_from_qkv, _round_up)


def _softmax_rows(s, mrow, valid_len):
    if mrow is not None:
        s = s + mrow
    if valid_len < s.shape[1]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < valid_len, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)


def _phased_kernel(*refs, num_heads: int, head_dim: int, valid_len: int,
                   block_b: int, scale: float, has_mask: bool):
    if has_mask:
        qkv_ref, mask_ref, o_ref = refs
    else:
        qkv_ref, o_ref = refs
    D = num_heads * head_dim
    for b in range(block_b):
        mrow = mask_ref[b] if has_mask else None
        # phase 1: every head's QK^T back-to-back (MXU-dense)
        ss = []
        for h in range(num_heads):
            q = qkv_ref[b, :, h * head_dim:(h + 1) * head_dim]
            k = qkv_ref[b, :, D + h * head_dim: D + (h + 1) * head_dim]
            ss.append(jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale)
        # phase 2: every softmax (VPU) — independent of phase-1 dots h'>h
        ps = [_softmax_rows(s, mrow, valid_len) for s in ss]
        # phase 3: every PV dot
        for h in range(num_heads):
            v = qkv_ref[b, :, 2 * D + h * head_dim: 2 * D + (h + 1) * head_dim]
            ctx = jax.lax.dot_general(
                ps[h], v.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[b, :, h * head_dim:(h + 1) * head_dim] = ctx.astype(o_ref.dtype)


def _batched_kernel(*refs, num_heads: int, head_dim: int, valid_len: int,
                    block_b: int, scale: float, has_mask: bool):
    if has_mask:
        qkv_ref, mask_ref, o_ref = refs
    else:
        qkv_ref, o_ref = refs
    D = num_heads * head_dim
    for b in range(block_b):
        mrow = mask_ref[b] if has_mask else None
        qall = qkv_ref[b, :, :D]
        kall = qkv_ref[b, :, D:2 * D]
        vall = qkv_ref[b, :, 2 * D:]
        N = qall.shape[0]
        q3 = qall.reshape(N, num_heads, head_dim).transpose(1, 0, 2)
        k3 = kall.reshape(N, num_heads, head_dim).transpose(1, 0, 2)
        v3 = vall.reshape(N, num_heads, head_dim).transpose(1, 0, 2)
        s = jax.lax.dot_general(
            q3, k3, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # [H, N, N]
        if mrow is not None:
            s = s + mrow[None, :, :]
        if valid_len < s.shape[-1]:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
            s = jnp.where(col < valid_len, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
        ctx = jax.lax.dot_general(
            p, v3.astype(jnp.bfloat16),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [H, N, hd]
        o_ref[b] = ctx.transpose(1, 0, 2).reshape(N, D).astype(o_ref.dtype)


def call_variant(kernel_fn, qkv, num_heads, mask_row=None, block_b=4,
                 interpret=None):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, N, threeD = qkv.shape
    D = threeD // 3
    hd = D // num_heads
    bpad = _round_up(B, block_b)
    qkvp = jnp.pad(qkv, ((0, bpad - B), (0, 0), (0, 0))) if bpad != B else qkv
    has_mask = mask_row is not None
    kernel = functools.partial(
        kernel_fn, num_heads=num_heads, head_dim=hd, valid_len=N,
        block_b=block_b, scale=1.0 / math.sqrt(hd), has_mask=has_mask)
    in_specs = [pl.BlockSpec((block_b, N, threeD), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    operands = [qkvp]
    if has_mask:
        maskp = mask_row.astype(jnp.float32)
        if bpad != B:
            maskp = jnp.pad(maskp, ((0, bpad - B), (0, 0)))
        in_specs.append(pl.BlockSpec((block_b, 1, N), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(maskp.reshape(bpad, 1, N))
    out = pl.pallas_call(
        kernel,
        grid=(bpad // block_b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, N, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bpad, N, D), qkv.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bpad * num_heads * N * N * hd,
            bytes_accessed=qkvp.size * 2 + bpad * N * D * 2,
            transcendentals=bpad * num_heads * N * N,
        ),
    )(*operands)
    return out[:B] if bpad != B else out


VARIANTS = {"phased": _phased_kernel, "batched": _batched_kernel}


def _phased_bwd_kernel(*refs, num_heads: int, head_dim: int, valid_len: int,
                       block_b: int, scale: float, has_mask: bool):
    """Phased flash backward: per batch element, phase the per-head chain
    (S dot -> softmax -> dv/dp dots -> ds -> dq/dk dots) so each phase's MXU
    dots issue back-to-back across heads.  Math identical per head to
    ops/pallas/attention._flash_bwd_kernel.  Liveness cost: all heads' P and
    dP (fp32 [N,N]) coexist — ~3.7 MB/elem at N=197."""
    if has_mask:
        qkv_ref, do_ref, mask_ref, dqkv_ref = refs
    else:
        qkv_ref, do_ref, dqkv_ref = refs
    D = num_heads * head_dim
    for b in range(block_b):
        mrow = mask_ref[b] if has_mask else None
        # phase 1: all S dots + softmaxes (keep fp32 P per head)
        ps = []
        for h in range(num_heads):
            q = qkv_ref[b, :, h * head_dim:(h + 1) * head_dim]
            k = qkv_ref[b, :, D + h * head_dim: D + (h + 1) * head_dim]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if mrow is not None:
                s = s + mrow
            if valid_len < s.shape[1]:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < valid_len, s, -jnp.inf)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            ps.append(e / jnp.sum(e, axis=-1, keepdims=True))  # fp32
        # phase 2: all dv + dp dots
        dps = []
        for h in range(num_heads):
            v = qkv_ref[b, :, 2 * D + h * head_dim: 2 * D + (h + 1) * head_dim]
            do = do_ref[b, :, h * head_dim:(h + 1) * head_dim].astype(jnp.bfloat16)
            dv = jax.lax.dot_general(
                ps[h].astype(jnp.bfloat16), do,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dqkv_ref[b, :, 2 * D + h * head_dim: 2 * D + (h + 1) * head_dim] = (
                dv.astype(dqkv_ref.dtype))
            dps.append(jax.lax.dot_general(
                do, v.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
        # phase 3: all dS (VPU)
        dss = []
        for h in range(num_heads):
            p, dp = ps[h], dps[h]
            row = jnp.sum(p * dp, axis=-1, keepdims=True)
            dss.append((p * (dp - row) * scale).astype(jnp.bfloat16))
        # phase 4: all dq + dk dots
        for h in range(num_heads):
            q = qkv_ref[b, :, h * head_dim:(h + 1) * head_dim]
            k = qkv_ref[b, :, D + h * head_dim: D + (h + 1) * head_dim]
            dq = jax.lax.dot_general(
                dss[h], k.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(
                dss[h], q.astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dqkv_ref[b, :, h * head_dim:(h + 1) * head_dim] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[b, :, D + h * head_dim: D + (h + 1) * head_dim] = dk.astype(dqkv_ref.dtype)


def call_bwd_variant(kernel_fn, qkv, g, num_heads, mask_row=None, block_b=2,
                     interpret=None):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, N, threeD = qkv.shape
    D = threeD // 3
    hd = D // num_heads
    bpad = _round_up(B, block_b)
    qkvp = jnp.pad(qkv, ((0, bpad - B), (0, 0), (0, 0))) if bpad != B else qkv
    gp = jnp.pad(g, ((0, bpad - B), (0, 0), (0, 0))) if bpad != B else g
    has_mask = mask_row is not None
    kernel = functools.partial(
        kernel_fn, num_heads=num_heads, head_dim=hd, valid_len=N,
        block_b=block_b, scale=1.0 / math.sqrt(hd), has_mask=has_mask)
    qkv_spec = pl.BlockSpec((block_b, N, threeD), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    do_spec = pl.BlockSpec((block_b, N, D), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [qkv_spec, do_spec]
    operands = [qkvp, gp]
    if has_mask:
        maskp = mask_row.astype(jnp.float32)
        if bpad != B:
            maskp = jnp.pad(maskp, ((0, bpad - B), (0, 0)))
        in_specs.append(pl.BlockSpec((block_b, 1, N), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(maskp.reshape(bpad, 1, N))
    out = pl.pallas_call(
        kernel,
        grid=(bpad // block_b,),
        in_specs=in_specs,
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((bpad, N, threeD), qkv.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=11 * bpad * num_heads * N * N * hd,
            bytes_accessed=qkvp.size * 4 + bpad * N * D * 2,
            transcendentals=bpad * num_heads * N * N,
        ),
    )(*operands)
    return out[:B] if bpad != B else out


def bwd_parity():
    from clibd_tpu.ops.pallas.attention import _flash_bwd_call
    rng = np.random.default_rng(0)
    for N, masked in [(197, False), (133, True)]:
        B, H, hd = 5, 12, 64
        qkv = jnp.asarray(
            rng.standard_normal((B, N, 3 * H * hd)).astype(np.float32))
        g = jnp.asarray(
            rng.standard_normal((B, N, H * hd)).astype(np.float32))
        mask = None
        if masked:
            m = np.zeros((B, N), np.float32)
            m[:, N - 9:] = np.finfo(np.float32).min
            mask = jnp.asarray(m)
        ref = np.asarray(_flash_bwd_call(
            qkv, mask, g, num_heads=H, valid_len=N, block_b=1,
            has_mask=masked, interpret=True))
        out = np.asarray(call_bwd_variant(
            _phased_bwd_kernel, qkv, g, H, mask_row=mask, block_b=1,
            interpret=True))
        err = np.abs(out - ref).max()
        print(f"bwd parity N={N} masked={masked} phased: max|err|={err:.2e}"
              f"  {'OK' if err == 0 else 'CHECK'}")


def bwd_timing(block_bs):
    from clibd_tpu.ops.pallas.attention import _flash_bwd_kernel
    rng = np.random.default_rng(0)
    B, H, hd = 256, 12, 64
    for N, masked in [(197, False), (133, True)]:
        qkv = jnp.asarray(
            rng.standard_normal((B, N, 3 * H * hd)).astype(np.float32)
        ).astype(jnp.bfloat16)
        mask = None
        if masked:
            m = np.zeros((B, N), np.float32)
            m[:, N - 9:] = np.finfo(np.float32).min
            mask = jnp.asarray(m)
        flops = 11 * B * H * N * N * hd
        for bb in block_bs:
            for name, kern in [("v0", _flash_bwd_kernel),
                               ("phased", _phased_bwd_kernel)]:
                def one(x, m=mask, bb=bb, kern=kern):
                    # dO derived from x to keep the loop dependency honest
                    D = x.shape[-1] // 3
                    return call_bwd_variant(kern, x, x[..., :D], 12,
                                            mask_row=m, block_b=bb,
                                            interpret=False)
                fn = _looped(one)
                try:
                    o = fn(qkv); np.asarray(o)
                    best = float("inf")
                    for _ in range(4):
                        t0 = time.perf_counter()
                        o = fn(qkv)
                        np.asarray(o)
                        best = min(best, (time.perf_counter() - t0) / REPS)
                    print(f"bwd N={N} masked={masked} block_b={bb} {name:8s}: "
                          f"{best*1e3:7.3f} ms/call  {flops/best/1e12:5.1f} TF/s",
                          flush=True)
                except Exception as e:
                    print(f"bwd N={N} masked={masked} block_b={bb} {name:8s}: "
                          f"EXC {type(e).__name__}: {str(e)[:160]}", flush=True)


def parity():
    rng = np.random.default_rng(0)
    for N, masked in [(197, False), (133, True)]:
        B, H, hd = 5, 12, 64
        qkv = jnp.asarray(
            rng.standard_normal((B, N, 3 * H * hd)).astype(np.float32))
        mask = None
        if masked:
            m = np.zeros((B, N), np.float32)
            m[:, N - 9:] = np.finfo(np.float32).min
            mask = jnp.asarray(m)
        ref = np.asarray(_xla_attention_from_qkv(qkv, mask, H, N))
        for name, k in VARIANTS.items():
            try:
                out = np.asarray(call_variant(k, qkv, H, mask_row=mask,
                                              block_b=2, interpret=True))
                err = np.abs(out - ref).max()
                print(f"parity N={N} masked={masked} {name}: max|err|={err:.2e}"
                      f"  {'OK' if err < 2e-2 else 'FAIL'}")
            except Exception as e:
                print(f"parity N={N} masked={masked} {name}: "
                      f"EXC {type(e).__name__}: {str(e)[:160]}")


REPS = 24  # kernel applications per dispatch (≈ the 24 calls/step)


def _looped(one_call):
    """Apply the kernel REPS times inside ONE jit dispatch, with a data
    dependency between iterations, and return only a SCALAR: through the
    axon tunnel `block_until_ready` does not synchronize and `np.asarray`
    of a full [B,N,D] output measures ~seconds of tunnel transfer, not
    device time — fetching a scalar reduction is the only clean sync."""
    def fn(qkv):
        def body(_, x):
            o = one_call(x)  # [B, N, D] (fwd) or [B, N, 3D] (bwd)
            if o.shape != x.shape:
                # force dependency: rebuild a [B, N, 3D] input from the output
                o = jnp.concatenate([o, o, o], axis=-1)
            return o.astype(x.dtype)
        return jnp.sum(jax.lax.fori_loop(0, REPS, body, qkv).astype(jnp.float32))
    return jax.jit(fn)


def timing(block_bs):
    rng = np.random.default_rng(0)
    B, H, hd = 256, 12, 64
    for N, masked in [(197, False), (133, True)]:
        qkv = jnp.asarray(
            rng.standard_normal((B, N, 3 * H * hd)).astype(np.float32)
        ).astype(jnp.bfloat16)
        mask = None
        if masked:
            m = np.zeros((B, N), np.float32)
            m[:, N - 9:] = np.finfo(np.float32).min
            mask = jnp.asarray(m)
        flops = 4 * B * H * N * N * hd
        for bb in block_bs:
            cands = {"v0": _looped(lambda x, m=mask, bb=bb: flash_attention_qkv(
                x, H, mask_row=m, block_b=bb, interpret=False))}
            for name, kern in VARIANTS.items():
                cands[name] = _looped(
                    lambda x, m=mask, bb=bb, kern=kern: call_variant(
                        kern, x, H, mask_row=m, block_b=bb, interpret=False))
            for name, fn in cands.items():
                try:
                    o = fn(qkv); np.asarray(o)
                    best = float("inf")
                    for _ in range(4):
                        t0 = time.perf_counter()
                        o = fn(qkv)
                        np.asarray(o)
                        best = min(best, (time.perf_counter() - t0) / REPS)
                    print(f"N={N} masked={masked} block_b={bb} {name:8s}: "
                          f"{best*1e3:7.3f} ms/call  {flops/best/1e12:5.1f} TF/s",
                          flush=True)
                except Exception as e:
                    print(f"N={N} masked={masked} block_b={bb} {name:8s}: "
                          f"EXC {type(e).__name__}: {str(e)[:160]}", flush=True)


def fwd_group_timing(groups):
    """Sweep CLIBD_ATTN_FWD_GROUP on the production kernel (the forward
    analogue of the round-5 backward head-group sweep): group=0 is the
    round-4 fully-phased forward, smaller groups trade cross-head overlap
    for a smaller live VMEM set.  Production block_b=2."""
    from clibd_tpu.ops.pallas import attention as A

    rng = np.random.default_rng(0)
    B, H, hd = 256, 12, 64
    print(f"backend={jax.default_backend()} B={B} block_b=2 phased={A.ATTN_FWD_PHASED}",
          flush=True)
    for N, masked in [(197, False), (133, True)]:
        qkv = jnp.asarray(
            rng.standard_normal((B, N, 3 * H * hd)).astype(np.float32)
        ).astype(jnp.bfloat16)
        mask = None
        if masked:
            m = np.zeros((B, N), np.float32)
            m[:, N - 9:] = np.finfo(np.float32).min
            mask = jnp.asarray(m)
        flops = 4 * B * H * N * N * hd
        for g in groups:
            # g == -1 → the CLIBD_ATTN_FWD_BPHASE variant (block_b loop
            # flattened into the phases), full head phasing
            A.ATTN_FWD_BPHASE = g == -1
            A.ATTN_FWD_GROUP = max(g, 0)
            A._make_flash.cache_clear()
            fn = _looped(lambda x, m=mask: flash_attention_qkv(
                x, H, mask_row=m, block_b=2, interpret=False))
            try:
                o = fn(qkv); np.asarray(o)
                best = float("inf")
                for _ in range(4):
                    t0 = time.perf_counter()
                    o = fn(qkv)
                    np.asarray(o)
                    best = min(best, (time.perf_counter() - t0) / REPS)
                print(f"N={N} masked={masked} fwd_group={g:2d}: "
                      f"{best*1e3:7.3f} ms/call  {flops/best/1e12:5.1f} TF/s",
                      flush=True)
            except Exception as e:
                print(f"N={N} masked={masked} fwd_group={g:2d}: "
                      f"EXC {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "parity"
    if mode == "parity":
        parity()
    elif mode == "bwd_parity":
        bwd_parity()
    elif mode == "bwd_time":
        bwd_timing([int(x) for x in sys.argv[2:]] or [2, 4])
    elif mode == "fwd_group":
        fwd_group_timing([int(x) for x in sys.argv[2:]] or [0, 2, 3, 4, 6])
    else:
        timing([int(x) for x in sys.argv[2:]] or [2, 4, 8])
