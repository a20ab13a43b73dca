"""LoRA adapter parameters (rank r on q and v projections only).

Parity with the reference's hand-rolled LoRA (image_encoder.py:40-107,
dna_encoder.py:80-125, language_encoder.py:36-89): A initialized with
kaiming_uniform(a=sqrt(5)) → U(±1/sqrt(fan_in)), B zero-initialized so the
step-0 output equals the frozen backbone.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def init_lora_params(rng, num_layers: int, dim: int, rank: int) -> dict:
    """Stacked LoRA params for a transformer stack: a_* [L, D, r], b_* [L, r, D]."""
    k1, k2 = jax.random.split(rng)
    bound = 1.0 / math.sqrt(dim)
    return {
        "a_q": jax.random.uniform(k1, (num_layers, dim, rank), jnp.float32, -bound, bound),
        "b_q": jnp.zeros((num_layers, rank, dim), jnp.float32),
        "a_v": jax.random.uniform(k2, (num_layers, dim, rank), jnp.float32, -bound, bound),
        "b_v": jnp.zeros((num_layers, rank, dim), jnp.float32),
    }


def merge_lora_into_qkv(stacked: dict, lora: dict) -> dict:
    """Fold LoRA deltas into the fused qkv weights (for inference export):
    W_q += A_q @ B_q, W_v += A_v @ B_v on the q/v thirds of qkv_w, and
    W_k += A_k @ B_k when the q/k/v variant's adapters are present (the CLIP
    towers train a_k/b_k — dropping them would silently diverge the merged
    model from the trained one)."""
    qkv_w = stacked["qkv_w"]
    L, D, threeD = qkv_w.shape
    hp = jax.lax.Precision.HIGHEST
    dq = jnp.einsum("ldr,lre->lde", lora["a_q"], lora["b_q"], precision=hp)
    dv = jnp.einsum("ldr,lre->lde", lora["a_v"], lora["b_v"], precision=hp)
    qkv_w = qkv_w.at[:, :, :D].add(dq)
    qkv_w = qkv_w.at[:, :, 2 * D :].add(dv)
    if "a_k" in lora:
        dk = jnp.einsum("ldr,lre->lde", lora["a_k"], lora["b_k"], precision=hp)
        qkv_w = qkv_w.at[:, :, D : 2 * D].add(dk)
    out = dict(stacked)
    out["qkv_w"] = qkv_w
    return out
