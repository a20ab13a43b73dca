"""Fused multi-head self-attention Pallas kernel for short sequences.

Why: XLA's unfused attention materializes the [B, H, N, N] score tensor in
HBM (plus head-split transposes); for ViT-B/16 (N=197) that is ~half the
encoder's wall time at ~4% of its FLOPs (measured on v5e).  CLIBD's
sequences are tiny (197 image patches, 133 DNA tokens, 20 text tokens —
SURVEY.md §5.7), so the whole (head × N × N) working set of one batch
element fits VMEM and a single-program-per-image kernel computes
qkᵀ → (mask) → softmax → @v entirely on-chip.

Layout: inputs [B, H, N, hd]; the wrapper pads N to a multiple of 128;
padded key columns are masked to -inf before the softmax; padded query rows
produce garbage that the wrapper slices off.

`interpret=True` keeps the kernel testable on the CPU backend.

STATUS: numerically validated (tests/test_pallas.py); on this environment's
tunneled v5e chip Mosaic compiles take ~8 min and the generated code lowers
the [H, N, hd] batched dot_generals poorly (measured ~1s/layer vs ~5ms for
the XLA einsum path), so layers.ATTENTION_IMPL defaults to "xla".  On
directly-attached TPU hardware re-profile with CLIBD_ATTN_IMPL=pallas; the
per-(batch,head) tiling likely needs head-major blocking (grid (B, H) with
2D [N, hd] tiles) before it wins.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, valid_len: int, scale: float):
    # block shapes: [1, H, Np, hd] — one batch element per program
    q = q_ref[0].astype(jnp.bfloat16)
    k = k_ref[0].astype(jnp.bfloat16)
    v = v_ref[0].astype(jnp.bfloat16)

    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),  # [H, Np, Np]
        preferred_element_type=jnp.float32,
    ) * scale

    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=2)
    scores = jnp.where(col < valid_len, scores, jnp.finfo(jnp.float32).min)

    # numerically-stable softmax in fp32, entirely in VMEM
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)

    ctx = jax.lax.dot_general(
        probs, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),  # [H, Np, hd]
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = ctx.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """q/k/v: [B, H, N, hd] (any float dtype) → [B, H, N, hd] in q.dtype.

    Non-causal full attention with 1/sqrt(hd) scaling (ViT/BERT semantics).
    """
    B, H, N, hd = q.shape
    scale = 1.0 / math.sqrt(hd)
    n_pad = _round_up(N, 128)
    pad = [(0, 0), (0, 0), (0, n_pad - N), (0, 0)]
    qp = jnp.pad(q, pad)
    kp = jnp.pad(k, pad)
    vp = jnp.pad(v, pad)

    kernel = functools.partial(_attention_kernel, valid_len=N, scale=scale)
    block = pl.BlockSpec((1, H, n_pad, hd), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[block, block, block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((B, H, n_pad, hd), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * n_pad * n_pad * hd,
            bytes_accessed=4 * B * H * n_pad * hd * 2,
            transcendentals=B * H * n_pad * n_pad,
        ),
    )(qp, kp, vp)
    return out[:, :, :N, :]
