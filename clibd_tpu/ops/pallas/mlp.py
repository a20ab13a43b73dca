"""Fused transformer-MLP Pallas kernel: fc1 → GELU → fc2 in one program.

Why: the [rows, mlp_dim] intermediate (e.g. [50432, 3072] ≈ 310 MB bf16 at
ViT-B batch-256 shapes) is written by fc1 and re-read by fc2 in the XLA
path — two full HBM passes per layer.  Here it lives only in VMEM.

Tiling insight (tools/exp_mxu2.py): Mosaic reaches 113-116 TF/s on this
chip with ≥512-wide tiles — the round-2 measurement of 62 TF/s was a
256×256 tiling artifact — so running both GEMMs inside the kernel no
longer forfeits MXU rate.

Weights use constant index maps → Mosaic's revisiting rule fetches them
once and keeps them VMEM-resident across the row-block grid.

Gradients: custom VJP, backward recomputes with plain XLA ops — the
intermediate materializes only inside the backward.  (Unlike
flash_attention_qkv, there is no dedicated Pallas backward here: this
kernel is not the default path, see models/layers.py MLP_IMPL.)

Reference hot path: bioscanclip ViT/BERT encoder MLPs
(timm Mlp / HF BertIntermediate+BertOutput).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import _round_up


def _act(x, activation: str):
    if activation == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    if activation == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if activation == "quick_gelu":
        from ...models.layers import quick_gelu

        return quick_gelu(x)
    raise ValueError(activation)


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, acc_ref, *,
                activation: str):
    """Grid (row_blocks, f_blocks): each program computes one F-chunk of the
    intermediate for one row block and accumulates its fc2 contribution.
    Smaller per-program weight slices keep VMEM low enough for 512-row
    blocks (the MXU-efficient shape — tools/exp_mxu2.py)."""
    f = pl.program_id(1)

    @pl.when(f == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    h = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    # intermediate precision follows the input dtype (bf16 compute keeps the
    # XLA path's bf16 h; fp32 parity runs stay fp32)
    h = _act(h + b1_ref[:].astype(jnp.float32), activation).astype(x_ref.dtype)
    acc_ref[:] += jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)

    @pl.when(f == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = (acc_ref[:] + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _xla_mlp(x, w1, b1, w2, b2, activation: str):
    h = jnp.dot(x, w1, preferred_element_type=jnp.float32)
    h = _act(h + b1.astype(jnp.float32), activation).astype(x.dtype)
    o = jnp.dot(h, w2, preferred_element_type=jnp.float32)
    return (o + b2.astype(jnp.float32)).astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _make_fused_mlp(rows_block: int, f_block: int, activation: str, interpret: bool):
    @jax.custom_vjp
    def fused(x2d, w1, b1, w2, b2):
        return _fwd(x2d, w1, b1, w2, b2)

    def _fwd(x2d, w1, b1, w2, b2):
        R, D = x2d.shape
        F = w1.shape[1]
        # the accumulation grid has no tail-block masking — Mosaic pads edge
        # blocks with undefined values on hardware, which would be summed
        # into the output.  Clamp to the largest divisor of F.
        fb = min(f_block, F)
        while F % fb:
            fb -= 1
        kernel = functools.partial(_mlp_kernel, activation=activation)
        return pl.pallas_call(
            kernel,
            grid=(R // rows_block, F // fb),
            in_specs=[
                pl.BlockSpec((rows_block, D), lambda i, f: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((D, fb), lambda i, f: (0, f), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, fb), lambda i, f: (0, f), memory_space=pltpu.VMEM),
                pl.BlockSpec((fb, D), lambda i, f: (f, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D), lambda i, f: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rows_block, D), lambda i, f: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, D), x2d.dtype),
            scratch_shapes=[pltpu.VMEM((rows_block, D), jnp.float32)],
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=4 * R * D * F,
                bytes_accessed=(2 * R * D + 2 * D * F) * 2,
                transcendentals=R * F,
            ),
        )(x2d, w1, b1.reshape(1, F), w2, b2.reshape(1, D))

    def fwd(x2d, w1, b1, w2, b2):
        return _fwd(x2d, w1, b1, w2, b2), (x2d, w1, b1, w2, b2)

    def bwd(res, g):
        x2d, w1, b1, w2, b2 = res
        _, vjp = jax.vjp(
            lambda x_, w1_, b1_, w2_, b2_: _xla_mlp(x_, w1_, b1_, w2_, b2_, activation),
            x2d, w1, b1, w2, b2)
        return vjp(g)

    fused.defvjp(fwd, bwd)
    return fused


_ROWS_BLOCK = int(os.environ.get("CLIBD_MLP_ROWS_BLOCK", "512"))
_F_BLOCK = int(os.environ.get("CLIBD_MLP_F_BLOCK", "768"))


def fused_mlp(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
              w2: jnp.ndarray, b2: jnp.ndarray, activation: str = "gelu_tanh",
              rows_block: int | None = None, f_block: int | None = None,
              interpret: bool | None = None) -> jnp.ndarray:
    """act(x @ w1 + b1) @ w2 + b2 with the intermediate resident in VMEM.

    x: [..., D]; w1: [D, F]; w2: [F, D].  Leading dims are flattened to rows
    and padded to a rows_block multiple (padded rows sliced off).  The grid
    accumulates over F-chunks of f_block so per-program weight slices stay
    small enough for MXU-efficient 512-row blocks.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    rows_block = rows_block or _ROWS_BLOCK
    f_block = f_block or _F_BLOCK
    lead = x.shape[:-1]
    D = x.shape[-1]
    x2d = x.reshape(-1, D)
    R = x2d.shape[0]
    Rp = _round_up(R, rows_block)
    if Rp != R:
        x2d = jnp.pad(x2d, ((0, Rp - R), (0, 0)))
    fn = _make_fused_mlp(rows_block, f_block, activation, interpret)
    out = fn(x2d, w1, b1, w2, b2)
    if Rp != R:
        out = out[:R]
    return out.reshape(*lead, D)
