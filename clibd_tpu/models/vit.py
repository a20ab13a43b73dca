"""ViT-B/16 image encoder (pure JAX).

Architecture parity with timm `vit_base_patch16_224` as used by the reference
(bioscanclip/model/simple_clip.py:150-166, image_encoder.py:49-107): patch
embed (16×16 conv ≡ patch-flatten matmul), CLS token, learned pos embed,
12 pre-LN blocks (GELU MLP ×4), final LN, token pooling (CLS), then a linear
head to `output_dim` (the reference's `reset_classifier(num_classes=768)`).
LoRA rank-4 adapters on q/v of the fused qkv (reference `_LoRA_qkv_timm`).

TPU-first: the patch conv is expressed as a single [B·196, 768]×[768, 768]
matmul (MXU-shaped); blocks run under lax.scan over stacked weights.
Input is NHWC float (normalized upstream).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config.schema import ViTConfig
from .layers import (
    init_stacked_block_params,
    layernorm,
    linear,
    ln_init,
    torch_linear_init,
    transformer_stack,
    trunc_normal_init,
)
from .lora import init_lora_params


def init_vit_params(rng, cfg: ViTConfig, output_dim: int = 768, lora_rank: int = 0) -> dict:
    keys = jax.random.split(rng, 6)
    D = cfg.hidden_size
    patch_dim = cfg.patch_size * cfg.patch_size * 3
    params = {
        "patch_embed": {
            "w": trunc_normal_init(keys[0], (patch_dim, D)),
            "b": jnp.zeros((D,), jnp.float32),
        },
        "cls_token": jnp.zeros((1, 1, D), jnp.float32),
        "pos_embed": trunc_normal_init(keys[1], (1, cfg.seq_len, D)),
        "blocks": init_stacked_block_params(keys[2], cfg.num_layers, D, cfg.mlp_dim),
        "norm": ln_init(D),
        "head": torch_linear_init(keys[3], D, output_dim),
    }
    if lora_rank > 0:
        params["lora"] = init_lora_params(keys[4], cfg.num_layers, D, lora_rank)
    return params


def patchify(images: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """[B, H, W, 3] NHWC → [B, N, patch*patch*3] with (h, w, c) ordering inside
    each patch (the weight converter permutes torch's OIHW kernel to match)."""
    B, H, W, C = images.shape
    p = patch_size
    x = images.reshape(B, H // p, p, W // p, p, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, h, w, p, p, C]
    return x.reshape(B, (H // p) * (W // p), p * p * C)


def vit_apply(
    params: dict,
    images: jnp.ndarray,
    cfg: ViTConfig,
    compute_dtype=jnp.bfloat16,
    return_tokens: bool = False,
    remat: bool = False,
    fast_math: bool = True,
) -> jnp.ndarray:
    """images: [B, 224, 224, 3] float32 (ImageNet-normalized). → [B, output_dim]."""
    B = images.shape[0]
    patches = patchify(images, cfg.patch_size)
    x = linear(params["patch_embed"], patches, compute_dtype)
    cls = jnp.broadcast_to(params["cls_token"].astype(compute_dtype), (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(compute_dtype)

    x = transformer_stack(
        params["blocks"], x,
        num_heads=cfg.num_heads, pre_ln=True, ln_eps=cfg.layernorm_eps,
        lora=params.get("lora"), compute_dtype=compute_dtype, remat=remat,
        fast_math=fast_math,
    )
    fast = fast_math and compute_dtype != jnp.float32
    if return_tokens:
        return layernorm(params["norm"], x, cfg.layernorm_eps, fast=fast)
    # LN is per-token: normalizing only the CLS row == timm's norm-then-select
    # (exact), skipping a full [B, N, D] pass
    cls_out = layernorm(params["norm"], x[:, 0], cfg.layernorm_eps, fast=fast)
    return linear(params["head"], cls_out, compute_dtype).astype(jnp.float32)
