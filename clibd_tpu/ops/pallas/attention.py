"""Flash attention Pallas kernels (forward + backward) for short sequences.

Why: XLA's unfused attention materializes the [B, H, N, N] score tensor in
HBM (plus head-split transposes); for ViT-B/16 (N=197) that is ~half the
encoder's wall time at ~4% of its FLOPs (measured on v5e).  CLIBD's
sequences are tiny (197 image patches, 133 DNA tokens, 20 text tokens —
SURVEY.md §5.7), so a whole block of batch elements' (head × N × N) working
set fits VMEM and the kernel computes qkᵀ → (mask) → softmax → @v entirely
on-chip, straight from the fused qkv projection output (no head-split
transposes in HBM).

Live paths: `flash_attention_qkv` (batch-blocked forward, custom VJP with a
Pallas backward — `CLIBD_ATTN_BWD=pallas|xla`) and the optional
attention+out-projection fusion (`CLIBD_ATTN_FUSE_OUTPROJ`, a wash through
the tunneled chip, re-A/B on direct-attached v5e — docs/PERF.md).  The
round-1 per-(batch,head) `fused_mha` kernel lost to this layout (measured
~1s/layer vs ~5ms; docs/PERF.md "measured and rejected") and was removed in
round 3.

Layout: input [B, N, 3·H·hd] fused qkv; the wrapper pads B to block_b and
leaves N ragged by default (Mosaic tiles the [197, ...] VMEM block
internally; `CLIBD_ATTN_NPAD16=1` restores the old explicit N→16-multiple
HBM pad, which a round-4 trace measured at ~13% of the extraction step —
see `_seq_pad`).  When padding is present, padded key columns are masked to
-inf before the softmax and padded rows are sliced off.  `interpret=True`
keeps every kernel testable on the CPU backend (tests/test_pallas.py).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# Backward implementation for flash_attention_qkv's custom VJP:
#   "pallas" — dedicated flash backward kernel (_flash_bwd_kernel): P is
#              recomputed per (batch, head) in VMEM; the [B,H,N,N] tensors
#              never exist in HBM during the backward either.
#   "xla"    — recompute the attention with XLA ops and differentiate that
#              (the score tensor materializes inside the backward, which the
#              plain XLA training path pays anyway).
ATTN_BWD_IMPL = os.environ.get("CLIBD_ATTN_BWD", "pallas")


def _seq_pad(n: int) -> int:
    """Sequence-axis padding for the flash kernels.

    Default: none.  Mosaic waives the block-shape divisibility rule when a
    block dim equals the array dim (our N and 3D block dims always do), and
    it tiles the ragged [197, ...] / [133, ...] VMEM blocks internally — so
    the explicit HBM pad N→16-multiple the wrapper used to do was pure copy
    traffic: a round-4 profiler trace of the batch-256 extraction step
    measured 15.0 ms of `pad` + 3.1 ms of `slice` per 135 ms execution
    (~13% of device time; docs/PERF.md round-4 extraction profile), and the
    unpadded kernel output is bit-identical on the chip.
    `CLIBD_ATTN_NPAD16=1` restores the old rounding for A/B.
    """
    if os.environ.get("CLIBD_ATTN_NPAD16", "0") == "1":
        return _round_up(n, 16)
    return n


# ---------------------------------------------------------------------------
# flash_attention_qkv — round-2 kernel (the one that wins on this chip)
# ---------------------------------------------------------------------------
#
# Takes the FUSED qkv tensor [B, N, 3D] straight from the qkv projection (no
# head-split transposes ever touch HBM) and writes ctx [B, N, D] ready for the
# out-projection.  One grid program handles `block_b` batch elements; per
# (batch, head) it runs two 2D MXU dots with an fp32 softmax entirely in VMEM,
# so the [B, H, N, N] score tensor never exists in HBM — that tensor's 3-4
# HBM passes are ~2.9 ms/layer of the XLA path at ViT-B shapes (docs/PERF.md).
#
# Numerics: scores accumulate fp32 (MORE precise than the XLA path's bf16
# scores), softmax fp32, probs bf16 for the PV dot.
#
# Gradients: jax.custom_vjp whose backward RECOMPUTES the attention with
# plain XLA ops and differentiates that (flash-style recompute; the score
# tensor only ever materializes inside the backward pass, which the XLA
# training path pays anyway).


# Forward statement ordering: "phased" issues every head's QK^T dot
# back-to-back, then every softmax, then every PV dot, making the cross-head
# independence explicit so Mosaic can overlap VPU softmaxes with MXU dots of
# other heads.  Per-head math (and therefore the output) is bit-identical to
# the interleaved order; a looped-dispatch microbench measured phased 10-15%
# faster at both tower shapes (tools/exp_flash.py; docs/PERF.md round-4
# ledger).  CLIBD_ATTN_PHASED=0 restores the interleaved order for A/B.
ATTN_FWD_PHASED = os.environ.get("CLIBD_ATTN_PHASED", "1") == "1"

# Forward head-group size for the phased ordering: process this many heads
# per phase batch (the forward analogue of ATTN_BWD_GROUP; 0 = all heads,
# the round-4 fully-phased default).  Per-head math is identical for any
# group, so the output is bit-identical.  Swept on chip 2026-08-21
# (tools/exp_flash.py fwd_group, block_b=2, min-of-4): the backward's
# grouping win does NOT transfer — groups 2/3/4/6 measure 0.5–15% WORSE
# than full phasing at both tower shapes (ViT 2.17 ms @ 0 vs 2.27–2.37
# grouped; BERT 1.85 vs 1.81–2.13, group=4's 1.81 within the ±2% noise),
# so 0 stays the default: the forward's per-head VMEM live set (one fp32 S
# + one bf16 P tile, no dP/dS) is small enough that full cross-head
# overlap fits and wins.
ATTN_FWD_GROUP = int(os.environ.get("CLIBD_ATTN_FWD_GROUP", "0"))

# CLIBD_ATTN_FWD_BPHASE=1 additionally flattens the block_b loop into the
# phases (all block_b·num_heads QK^T dots, then all softmaxes, then all PV
# dots) — a strict superset of the per-batch-row phasing.  Same per-head
# math, bit-identical output; live fp32 S set grows ×block_b.  Same sweep:
# 2.103 ms (ViT) / 1.833 ms (BERT) vs 2.166 / 1.852 phased — a 1–3% edge
# inside the tunnel's run-to-run noise, not worth the ×block_b scoped-VMEM
# liveness growth under remat training; off by default.
ATTN_FWD_BPHASE = os.environ.get("CLIBD_ATTN_FWD_BPHASE", "0") == "1"


def _softmax_masked(s, mrow, valid_len: int):
    """fp32 softmax with the optional HF additive mask + pad-column mask.

    Padded key columns must rank strictly below even fully-masked real
    columns (HF mask bias = float32 finfo.min): -inf makes an all-masked row
    fall back to a uniform softmax over the REAL keys, matching the XLA path.
    """
    if mrow is not None:
        s = s + mrow
    if valid_len < s.shape[1]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < valid_len, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)


def _flash_kernel(*refs, num_heads: int, head_dim: int,
                  valid_len: int, block_b: int, scale: float, has_mask: bool):
    if has_mask:
        qkv_ref, mask_ref, o_ref = refs
    else:
        qkv_ref, o_ref = refs
    D = num_heads * head_dim
    if ATTN_FWD_PHASED and ATTN_FWD_BPHASE:
        bh = [(b, h) for b in range(block_b) for h in range(num_heads)]
        ss = []
        for b, h in bh:
            q = qkv_ref[b, :, h * head_dim:(h + 1) * head_dim]
            k = qkv_ref[b, :, D + h * head_dim: D + (h + 1) * head_dim]
            ss.append(jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale)
        ps = [_softmax_masked(s, mask_ref[b] if has_mask else None, valid_len)
              for (b, h), s in zip(bh, ss)]
        for (b, h), p in zip(bh, ps):
            v = qkv_ref[b, :, 2 * D + h * head_dim: 2 * D + (h + 1) * head_dim]
            ctx = jax.lax.dot_general(
                p, v.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[b, :, h * head_dim:(h + 1) * head_dim] = ctx.astype(o_ref.dtype)
        return
    for b in range(block_b):
        mrow = mask_ref[b] if has_mask else None  # [1, Npad] additive bias
        if ATTN_FWD_PHASED:
            g = num_heads if ATTN_FWD_GROUP <= 0 else max(
                1, min(ATTN_FWD_GROUP, num_heads))
            for h0 in range(0, num_heads, g):
                hs = list(range(h0, min(h0 + g, num_heads)))
                ss = []
                for h in hs:
                    q = qkv_ref[b, :, h * head_dim:(h + 1) * head_dim]
                    k = qkv_ref[b, :, D + h * head_dim: D + (h + 1) * head_dim]
                    ss.append(jax.lax.dot_general(
                        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * scale)
                ps = [_softmax_masked(s, mrow, valid_len) for s in ss]
                for h, p in zip(hs, ps):
                    v = qkv_ref[b, :, 2 * D + h * head_dim: 2 * D + (h + 1) * head_dim]
                    ctx = jax.lax.dot_general(
                        p, v.astype(jnp.bfloat16),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    o_ref[b, :, h * head_dim:(h + 1) * head_dim] = ctx.astype(o_ref.dtype)
            continue
        for h in range(num_heads):
            q = qkv_ref[b, :, h * head_dim:(h + 1) * head_dim]
            k = qkv_ref[b, :, D + h * head_dim: D + (h + 1) * head_dim]
            v = qkv_ref[b, :, 2 * D + h * head_dim: 2 * D + (h + 1) * head_dim]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [Npad, Npad] fp32
            p = _softmax_masked(s, mrow, valid_len)
            ctx = jax.lax.dot_general(
                p, v.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[b, :, h * head_dim:(h + 1) * head_dim] = ctx.astype(o_ref.dtype)


# Backward head-group phasing: process CLIBD_ATTN_BWD_GROUP heads at a time
# with the per-stage statements batched across the group (all S dots, then
# all softmaxes, then all dV/dP dots, then all dS, then all dQ/dK dots) —
# the backward's analogue of the forward's phased ordering: cross-head
# independence made explicit so Mosaic can overlap the VPU softmax/dS work
# of one head with MXU dots of its neighbors.  Per-head math (and output)
# is bit-identical to group=1 (the original interleaved order).  VMEM cost
# grows ~0.6 MB per extra grouped head per batch row (live fp32 P/dP +
# bf16 Pb/dS tiles), so full phasing (group=num_heads) OOMs under remat —
# that was round 4's measured-rejected "phased backward"; small groups are
# the middle ground.  Measured on chip 2026-08-20 (docs/PERF.md round-5):
# standalone kernel 104.3 → 71.8 ms/step-equiv at group=3 (−31%; BERT
# tower −43%), flagship batch-500 train step 495 → 504 samples/s, grads
# bit-identical, and the remat scoped-VMEM boundary does NOT tighten
# (tools/exp_vmem.py re-probe at group=3) — so 3 is the default.
ATTN_BWD_GROUP = int(os.environ.get("CLIBD_ATTN_BWD_GROUP", "3"))


def _flash_bwd_kernel(*refs, num_heads: int, head_dim: int,
                      valid_len: int, block_b: int, scale: float,
                      has_mask: bool):
    """Flash backward: dqkv from (qkv, dO), recomputing P per (batch, head)
    entirely in VMEM — the XLA recompute backward materializes the
    [B, H, N, N] score/probability tensors in HBM twice (recompute + grad);
    here they never leave the chip.

    Math (per head; S = qKᵀ·scale, P = softmax(S), O = PV):
      dV = Pᵀ dO
      dP = dO Vᵀ
      dS = P ∘ (dP − rowsum(P ∘ dP))
      dQ = dS K · scale,  dK = dSᵀ Q · scale
    Zero-padded dO rows make every padded-row/col contribution vanish.
    Heads are processed ATTN_BWD_GROUP at a time with per-stage statements
    batched across the group (see the flag comment above).
    """
    if has_mask:
        qkv_ref, do_ref, mask_ref, dqkv_ref = refs
    else:
        qkv_ref, do_ref, dqkv_ref = refs
    D = num_heads * head_dim
    group = max(1, min(ATTN_BWD_GROUP, num_heads))
    for b in range(block_b):
        if has_mask:
            mrow = mask_ref[b]  # [1, Npad] additive bias
        for h0 in range(0, num_heads, group):
            hs = list(range(h0, min(h0 + group, num_heads)))
            qg = [qkv_ref[b, :, h * head_dim:(h + 1) * head_dim] for h in hs]
            kg = [qkv_ref[b, :, D + h * head_dim: D + (h + 1) * head_dim]
                  for h in hs]
            vg = [qkv_ref[b, :, 2 * D + h * head_dim: 2 * D + (h + 1) * head_dim]
                  for h in hs]
            dog = [do_ref[b, :, h * head_dim:(h + 1) * head_dim].astype(jnp.bfloat16)
                   for h in hs]
            # stage 1: every head's S dot
            sg = [jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
                for q, k in zip(qg, kg)]
            # stage 2: softmaxes (fp32 P + bf16 Pb)
            pg = []
            for s in sg:
                if has_mask:
                    s = s + mrow
                if valid_len < s.shape[1]:
                    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                    s = jnp.where(col < valid_len, s, -jnp.inf)
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                pg.append(e / jnp.sum(e, axis=-1, keepdims=True))  # fp32 [Nq, Nk]
            pbg = [p.astype(jnp.bfloat16) for p in pg]
            # stage 3: dV = Pᵀ dO (contract the query axis) and dP = dO Vᵀ
            dvg = [jax.lax.dot_general(
                pb, do, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
                for pb, do in zip(pbg, dog)]
            dpg = [jax.lax.dot_general(
                do, v.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
                for do, v in zip(dog, vg)]
            # stage 4: dS
            dsg = []
            for p, dp in zip(pg, dpg):
                row = jnp.sum(p * dp, axis=-1, keepdims=True)
                dsg.append((p * (dp - row) * scale).astype(jnp.bfloat16))
            # stage 5: dQ/dK dots + the dqkv writes
            for h, ds, q, k, dv in zip(hs, dsg, qg, kg, dvg):
                dq = jax.lax.dot_general(
                    ds, k.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dk = jax.lax.dot_general(
                    ds, q.astype(jnp.bfloat16),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dqkv_ref[b, :, h * head_dim:(h + 1) * head_dim] = dq.astype(dqkv_ref.dtype)
                dqkv_ref[b, :, D + h * head_dim: D + (h + 1) * head_dim] = dk.astype(dqkv_ref.dtype)
                dqkv_ref[b, :, 2 * D + h * head_dim: 2 * D + (h + 1) * head_dim] = dv.astype(dqkv_ref.dtype)


def _flash_outproj_kernel(*refs, num_heads: int, head_dim: int,
                          valid_len: int, block_b: int, scale: float,
                          has_mask: bool):
    """flash attention + out-projection in one program.

    ctx never touches HBM: per (batch, head) attention writes its [Npad, hd]
    slice into a VMEM scratch, then one [Npad, D] @ [D, D] MXU dot produces
    the projected output.  out_w/out_b use constant index maps so Mosaic
    fetches them once and keeps them VMEM-resident across programs.
    """
    if has_mask:
        qkv_ref, mask_ref, ow_ref, ob_ref, o_ref, ctx_scratch = refs
    else:
        qkv_ref, ow_ref, ob_ref, o_ref, ctx_scratch = refs
    D = num_heads * head_dim
    Np = ctx_scratch.shape[0] // block_b
    for b in range(block_b):
        if has_mask:
            mrow = mask_ref[b]  # [1, Npad] additive bias
        for h in range(num_heads):
            q = qkv_ref[b, :, h * head_dim:(h + 1) * head_dim]
            k = qkv_ref[b, :, D + h * head_dim: D + (h + 1) * head_dim]
            v = qkv_ref[b, :, 2 * D + h * head_dim: 2 * D + (h + 1) * head_dim]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if has_mask:
                s = s + mrow
            if valid_len < s.shape[1]:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < valid_len, s, -jnp.inf)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
            ctx_scratch[b * Np:(b + 1) * Np, h * head_dim:(h + 1) * head_dim] = (
                jax.lax.dot_general(
                    p, v.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16))
    # one [block_b·Npad, D] @ [D, D] dot — larger M runs the MXU at a much
    # better rate than per-batch-element [Npad, D] dots (tools/exp_mxu2.py)
    proj = jax.lax.dot_general(
        ctx_scratch[:], ow_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + ob_ref[:].astype(jnp.float32)
    for b in range(block_b):
        o_ref[b] = proj[b * Np:(b + 1) * Np].astype(o_ref.dtype)


def _xla_attention_from_qkv(qkv, mask_row, num_heads: int, valid_len: int):
    """Reference math on the padded [B, Npad, 3D] tensor (backward recompute)."""
    B, Npad, threeD = qkv.shape
    D = threeD // 3
    hd = D // num_heads
    scale = 1.0 / math.sqrt(hd)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, Npad, num_heads, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if mask_row is not None:
        s = s + mask_row[:, None, None, :].astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
    s = jnp.where(col < valid_len, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return ctx.transpose(0, 2, 1, 3).reshape(B, Npad, D).astype(qkv.dtype)


@functools.lru_cache(maxsize=None)
def _make_flash(num_heads: int, valid_len: int, npad: int, block_b: int,
                has_mask: bool, interpret: bool, bwd_impl: str = "xla"):
    @jax.custom_vjp
    def flash(qkv, mask_row):
        return _fwd(qkv, mask_row)

    def _fwd(qkv, mask_row):
        Bp, Np, threeD = qkv.shape
        D = threeD // 3
        hd = D // num_heads
        kernel = functools.partial(
            _flash_kernel, num_heads=num_heads, head_dim=hd,
            valid_len=valid_len, block_b=block_b,
            scale=1.0 / math.sqrt(hd), has_mask=has_mask,
        )
        qkv_spec = pl.BlockSpec((block_b, Np, threeD), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((block_b, Np, D), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        in_specs = [qkv_spec]
        operands = [qkv]
        if has_mask:
            # [B, 1, Np] so the trailing block dims equal the array dims
            # (Mosaic's block-shape divisibility rule)
            in_specs.append(pl.BlockSpec((block_b, 1, Np), lambda i: (i, 0, 0),
                                         memory_space=pltpu.VMEM))
            operands.append(mask_row.reshape(Bp, 1, Np))
        return pl.pallas_call(
            kernel,
            grid=(Bp // block_b,),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((Bp, Np, D), qkv.dtype),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=4 * Bp * num_heads * Np * Np * hd,
                bytes_accessed=qkv.size * 2 + Bp * Np * D * 2,
                transcendentals=Bp * num_heads * Np * Np,
            ),
        )(*operands)

    def fwd(qkv, mask_row):
        return _fwd(qkv, mask_row), (qkv, mask_row)

    def bwd(res, g):
        qkv, mask_row = res
        if bwd_impl == "pallas":
            return _flash_bwd_call(qkv, mask_row, g, num_heads=num_heads,
                                   valid_len=valid_len, block_b=block_b,
                                   has_mask=has_mask, interpret=interpret), None
        _, vjp = jax.vjp(
            lambda t: _xla_attention_from_qkv(t, mask_row, num_heads, valid_len), qkv
        )
        (dqkv,) = vjp(g)
        return dqkv, None

    flash.defvjp(fwd, bwd)
    return flash


def _flash_bwd_call(qkv, mask_row, g, *, num_heads: int, valid_len: int,
                    block_b: int, has_mask: bool, interpret: bool):
    """Invoke _flash_bwd_kernel on padded arrays: (qkv, dO) → dqkv."""
    Bp, Np, threeD = qkv.shape
    D = threeD // 3
    hd = D // num_heads
    kernel = functools.partial(
        _flash_bwd_kernel, num_heads=num_heads, head_dim=hd,
        valid_len=valid_len, block_b=block_b,
        scale=1.0 / math.sqrt(hd), has_mask=has_mask,
    )
    qkv_spec = pl.BlockSpec((block_b, Np, threeD), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    do_spec = pl.BlockSpec((block_b, Np, D), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [qkv_spec, do_spec]
    operands = [qkv, g]
    if has_mask:
        in_specs.append(pl.BlockSpec((block_b, 1, Np), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(mask_row.reshape(Bp, 1, Np))
    return pl.pallas_call(
        kernel,
        grid=(Bp // block_b,),
        in_specs=in_specs,
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, Np, threeD), qkv.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=11 * Bp * num_heads * Np * Np * hd,
            bytes_accessed=qkv.size * 4 + Bp * Np * D * 2,
            transcendentals=Bp * num_heads * Np * Np,
        ),
    )(*operands)


@functools.lru_cache(maxsize=None)
def _make_flash_outproj(num_heads: int, valid_len: int, npad: int, block_b: int,
                        has_mask: bool, interpret: bool, bwd_impl: str = "xla"):
    @jax.custom_vjp
    def flash(qkv, mask_row, out_w, out_b):
        return _fwd(qkv, mask_row, out_w, out_b)

    def _fwd(qkv, mask_row, out_w, out_b):
        Bp, Np, threeD = qkv.shape
        D = threeD // 3
        hd = D // num_heads
        kernel = functools.partial(
            _flash_outproj_kernel, num_heads=num_heads, head_dim=hd,
            valid_len=valid_len, block_b=block_b,
            scale=1.0 / math.sqrt(hd), has_mask=has_mask,
        )
        qkv_spec = pl.BlockSpec((block_b, Np, threeD), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((block_b, Np, D), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        # constant index maps → Mosaic's revisiting rule: fetched once,
        # VMEM-resident for every subsequent program
        ow_spec = pl.BlockSpec((D, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
        ob_spec = pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
        in_specs = [qkv_spec]
        operands = [qkv]
        if has_mask:
            in_specs.append(pl.BlockSpec((block_b, 1, Np), lambda i: (i, 0, 0),
                                         memory_space=pltpu.VMEM))
            operands.append(mask_row.reshape(Bp, 1, Np))
        in_specs += [ow_spec, ob_spec]
        operands += [out_w, out_b.reshape(1, D)]
        return pl.pallas_call(
            kernel,
            grid=(Bp // block_b,),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((Bp, Np, D), qkv.dtype),
            scratch_shapes=[pltpu.VMEM((block_b * Np, D), jnp.bfloat16)],
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=4 * Bp * num_heads * Np * Np * hd + 2 * Bp * Np * D * D,
                bytes_accessed=qkv.size * 2 + Bp * Np * D * 2 + D * D * 2,
                transcendentals=Bp * num_heads * Np * Np,
            ),
        )(*operands)

    def fwd(qkv, mask_row, out_w, out_b):
        return _fwd(qkv, mask_row, out_w, out_b), (qkv, mask_row, out_w, out_b)

    def bwd(res, g):
        qkv, mask_row, out_w, out_b = res
        if bwd_impl == "pallas":
            # dctx = g @ Wᵀ feeds the dedicated flash backward kernel; ctx is
            # recomputed with the (non-differentiated) flash forward for the
            # weight grads.  Padded/invalid rows carry zero g → zero grads.
            gb = g.astype(jnp.bfloat16)
            dctx = jnp.dot(gb, out_w.astype(jnp.bfloat16).T,
                           preferred_element_type=jnp.float32).astype(qkv.dtype)
            dqkv = _flash_bwd_call(qkv, mask_row, dctx, num_heads=num_heads,
                                   valid_len=valid_len, block_b=block_b,
                                   has_mask=has_mask, interpret=interpret)
            ctx = _make_flash(num_heads, valid_len, npad, block_b, has_mask,
                              interpret, bwd_impl="xla")(qkv, mask_row)
            dw = jnp.einsum("bnd,bne->de", ctx.astype(jnp.bfloat16), gb,
                            preferred_element_type=jnp.float32).astype(out_w.dtype)
            db = jnp.sum(g.astype(jnp.float32), axis=(0, 1)).astype(out_b.dtype)
            return dqkv, None, dw, db

        def ref_fn(t, w, bvec):
            ctx = _xla_attention_from_qkv(t, mask_row, num_heads, valid_len)
            y = jnp.dot(ctx.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            return (y + bvec.astype(jnp.float32)).astype(t.dtype)

        _, vjp = jax.vjp(ref_fn, qkv, out_w, out_b)
        dqkv, dw, db = vjp(g)
        return dqkv, None, dw, db

    flash.defvjp(fwd, bwd)
    return flash


def flash_attention_qkv_outproj(qkv: jnp.ndarray, out_w: jnp.ndarray,
                                out_b: jnp.ndarray, num_heads: int,
                                mask_row: Optional[jnp.ndarray] = None,
                                block_b: int = 2,
                                interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fused attention + out-projection from the fused qkv tensor.

    qkv: [B, N, 3D]; out_w: [D, D] ([in, out] layout); out_b: [D].
    → attention_output @ out_w + out_b, [B, N, D] in qkv.dtype.  The per-head
    context tensor never exists in HBM (saves a [B,N,D] write + read per
    layer over flash_attention_qkv followed by an XLA out-projection).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, N, threeD = qkv.shape
    npad = _seq_pad(N)
    bpad = _round_up(B, block_b)
    qkvp = qkv
    if bpad != B or npad != N:
        qkvp = jnp.pad(qkv, ((0, bpad - B), (0, npad - N), (0, 0)))
    has_mask = mask_row is not None
    maskp = None
    if has_mask:
        maskp = mask_row.astype(jnp.float32)
        if bpad != B or npad != N:
            maskp = jnp.pad(maskp, ((0, bpad - B), (0, npad - N)))
    fn = _make_flash_outproj(num_heads, N, npad, block_b, has_mask, interpret,
                             bwd_impl=ATTN_BWD_IMPL)
    out = fn(qkvp, maskp, out_w, out_b)
    if bpad != B or npad != N:
        out = out[:B, :N, :]
    return out


_BLOCK_B_WARNED: set = set()


def vmem_safe_block_b(requested: int, n: int, d: int) -> int:
    """Clamp a flash block_b so a *differentiated* call cannot OOM scoped VMEM.

    Two calibrations, keyed on ATTN_FWD_PHASED (the round-4 phased forward
    keeps every head's fp32 QK^T score tile + bf16 prob tile live at once,
    so its per-batch-row footprint is larger):

    * PHASED (default; re-measured 2026-08-20 with `tools/exp_vmem.py` —
      jax.grad of a 2-block remat(save-attn) stack at batch 500, AOT
      compile, no N-pad): ViT N=197 fails at block_b=3 (compiler: 16.19 MB
      scoped vs 16 MB limit → ~5.40 MB/row) and BarcodeBERT N=133 fails at
      block_b=5 (19.38 MB → ~3.9 MB/row); block_b 2 / 4 compile.  Both
      boundaries are reproduced by bytes/row ≈ 18.5 · N · D · 2 (caps: 2
      ViT, 4 BERT — exactly the measured OK values).  Re-probed at the
      round-5 ATTN_BWD_GROUP=3 default: the boundary does NOT tighten
      (ViT block_b 2 AND 3 compile — the grouped backward's statement
      schedule lowers peak scoped pressure; BERT block_b=4 compiles), so
      the group=1-calibrated caps remain conservative.
    * INTERLEAVED (`CLIBD_ATTN_PHASED=0`; measured 2026-08-18 on the old
      N→16-pad kernel): compiler reported 22.48 MB at block_b=8, Npad=144
      → ≈ 12.7 · block_b · Npad · D · 2 bytes; caps 3 (ViT) / 5 (BERT)
      matched which train-step compiles failed.

    Standalone forward-only calls tolerate block_b=8+ but measure no faster
    (docs/PERF.md), so one conservative policy serves both.  Callers probing
    the kernel directly (tools/, tests/) bypass this by passing block_b
    explicitly to flash_attention_qkv.
    """
    if ATTN_FWD_PHASED:
        cap = max(1, int(15.5e6 / (n * d * 2 * 18.5)))
    else:
        npad = _round_up(n, 16)
        cap = max(1, int(15.5e6 / (npad * d * 2 * 12.7)))
    if requested > cap:
        key = (requested, n, d, ATTN_FWD_PHASED)
        if key not in _BLOCK_B_WARNED:
            _BLOCK_B_WARNED.add(key)
            import warnings

            warnings.warn(
                f"CLIBD_ATTN_BLOCK_B={requested} exceeds the measured scoped-VMEM "
                f"ceiling for N={n}, D={d} (phased={ATTN_FWD_PHASED}) under remat "
                f"training; clamping to "
                f"{cap} (16 MB VMEM; see ops/pallas/attention.vmem_safe_block_b).")
        return cap
    return requested


def flash_attention_qkv(qkv: jnp.ndarray, num_heads: int,
                        mask_row: Optional[jnp.ndarray] = None,
                        block_b: int = 4, interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fused attention from the fused qkv tensor.

    qkv: [B, N, 3D] (bias and any LoRA deltas already added).
    mask_row: optional [B, N] additive fp32 bias (0 / -inf) — the HF-style
    attention mask collapsed to its key axis.
    → ctx [B, N, D] in qkv.dtype, ready for the out-projection.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, N, threeD = qkv.shape
    npad = _seq_pad(N)
    bpad = _round_up(B, block_b)
    qkvp = qkv
    if bpad != B or npad != N:
        qkvp = jnp.pad(qkv, ((0, bpad - B), (0, npad - N), (0, 0)))
    has_mask = mask_row is not None
    maskp = None
    if has_mask:
        maskp = mask_row.astype(jnp.float32)
        if bpad != B or npad != N:
            maskp = jnp.pad(maskp, ((0, bpad - B), (0, npad - N)))
    fn = _make_flash(num_heads, N, npad, block_b, has_mask, interpret,
                     bwd_impl=ATTN_BWD_IMPL)
    ctx = fn(qkvp, maskp)
    if bpad != B or npad != N:
        ctx = ctx[:B, :N, :]
    return ctx
