"""CLIP towers (OpenCLIP / BioCLIP backbone path, reference
simple_clip.py:140-147 `using_open_clip`/`for_bio_clip`,
image_encoder.py:117-149 `LoRA_ViT_OpenCLIP`, language_encoder.py:92-122).

Vision: CLIP-style ViT (no-bias patch conv, class embedding, ln_pre, pre-LN
transformer, ln_post, linear projection).  Text: token embedding + learned
positions, CAUSAL pre-LN transformer, ln_final, projection of the EOT-token
(argmax of token ids) feature.  Activation is configurable — QuickGELU for
OpenAI-pretrained weights, exact GELU for LAION-trained OpenCLIP.

Reuses the stacked-scan transformer core (layers.transformer_stack); the
converter fuses torch MultiheadAttention's in_proj into the [D,3D] qkv.
LoRA on q/k/v (rank 4) mirrors `add_lora_layer_to_open_clip`.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .layers import layernorm, linear, ln_init, transformer_stack, trunc_normal_init
from .lora import init_lora_params
from .vit import patchify


@dataclass
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_dim: int = 4096
    embed_dim: int = 768
    layernorm_eps: float = 1e-5
    activation: str = "gelu"  # "quick_gelu" for OpenAI weights

    @property
    def seq_len(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1


@dataclass
class CLIPTextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    embed_dim: int = 768
    layernorm_eps: float = 1e-5
    activation: str = "gelu"


def init_clip_vision_params(rng, cfg: CLIPVisionConfig, lora_rank: int = 0) -> dict:
    from .layers import init_stacked_block_params

    keys = jax.random.split(rng, 7)
    D = cfg.hidden_size
    params = {
        "patch_embed": {"w": trunc_normal_init(keys[0], (cfg.patch_size**2 * 3, D))},  # no bias
        "class_embedding": trunc_normal_init(keys[1], (D,)),
        "pos_embed": trunc_normal_init(keys[2], (cfg.seq_len, D)),
        "ln_pre": ln_init(D),
        "blocks": init_stacked_block_params(keys[3], cfg.num_layers, D, cfg.mlp_dim),
        "ln_post": ln_init(D),
        "proj": trunc_normal_init(keys[4], (D, cfg.embed_dim)),
    }
    if lora_rank > 0:
        lora = init_lora_params(keys[5], cfg.num_layers, D, lora_rank)
        bound = 1.0 / math.sqrt(D)
        lora["a_k"] = jax.random.uniform(keys[6], (cfg.num_layers, D, lora_rank), jnp.float32, -bound, bound)
        lora["b_k"] = jnp.zeros((cfg.num_layers, lora_rank, D), jnp.float32)
        params["lora"] = lora
    return params


def clip_vision_apply(params: dict, images: jnp.ndarray, cfg: CLIPVisionConfig,
                      compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """images: [B, S, S, 3] (CLIP-normalized upstream) → [B, embed_dim]."""
    B = images.shape[0]
    x = linear({"w": params["patch_embed"]["w"]}, patchify(images, cfg.patch_size), compute_dtype)
    cls = jnp.broadcast_to(params["class_embedding"].astype(compute_dtype), (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"].astype(compute_dtype)[None]
    x = layernorm(params["ln_pre"], x, cfg.layernorm_eps)
    x = transformer_stack(
        params["blocks"], x, num_heads=cfg.num_heads, pre_ln=True,
        ln_eps=cfg.layernorm_eps, lora=params.get("lora"),
        compute_dtype=compute_dtype, activation=cfg.activation,
    )
    pooled = layernorm(params["ln_post"], x[:, 0:1], cfg.layernorm_eps)[:, 0]
    return jnp.dot(pooled.astype(compute_dtype), params["proj"].astype(compute_dtype)).astype(jnp.float32)


def init_clip_text_params(rng, cfg: CLIPTextConfig, lora_rank: int = 0) -> dict:
    from .layers import init_stacked_block_params

    keys = jax.random.split(rng, 5)
    D = cfg.hidden_size
    params = {
        "token_embedding": trunc_normal_init(keys[0], (cfg.vocab_size, D)),
        "pos_embed": trunc_normal_init(keys[1], (cfg.context_length, D)),
        "blocks": init_stacked_block_params(keys[2], cfg.num_layers, D, cfg.mlp_dim),
        "ln_final": ln_init(D),
        "text_projection": trunc_normal_init(keys[3], (D, cfg.embed_dim)),
    }
    if lora_rank > 0:
        params["lora"] = init_lora_params(keys[4], cfg.num_layers, D, lora_rank)
    return params


def causal_mask_bias(n: int) -> jnp.ndarray:
    neg = jnp.finfo(jnp.float32).min
    mask = jnp.triu(jnp.full((n, n), neg, jnp.float32), k=1)
    return mask[None, None]  # [1, 1, N, N]


def clip_text_apply(params: dict, token_ids: jnp.ndarray, cfg: CLIPTextConfig,
                    compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """token_ids: [B, 77] int (BPE, 0-padded, EOT = max id in each row)."""
    B, N = token_ids.shape
    x = jnp.asarray(params["token_embedding"])[token_ids].astype(compute_dtype)
    x = x + jnp.asarray(params["pos_embed"])[:N].astype(compute_dtype)[None]
    x = transformer_stack(
        params["blocks"], x, num_heads=cfg.num_heads, pre_ln=True,
        ln_eps=cfg.layernorm_eps, mask_bias=causal_mask_bias(N),
        lora=params.get("lora"), compute_dtype=compute_dtype,
        activation=cfg.activation,
    )
    x = layernorm(params["ln_final"], x, cfg.layernorm_eps)
    eot = jnp.argmax(token_ids, axis=-1)
    pooled = x[jnp.arange(B), eot]
    return jnp.dot(pooled.astype(compute_dtype),
                   params["text_projection"].astype(compute_dtype)).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Converter from open_clip / OpenAI CLIP state_dicts
# ---------------------------------------------------------------------------


def clip_params_from_state_dict(sd: Dict[str, np.ndarray], vcfg: CLIPVisionConfig,
                                tcfg: CLIPTextConfig) -> tuple:
    """→ (vision_params, text_params, logit_scale).  Accepts open_clip naming
    (visual.*, transformer.*, token_embedding, …)."""
    g = lambda k: np.asarray(sd[k])

    def blocks_from(prefix: str, num_layers: int):
        out = {k: [] for k in (
            "qkv_w", "qkv_b", "out_w", "out_b", "fc1_w", "fc1_b", "fc2_w", "fc2_b",
            "ln1_scale", "ln1_bias", "ln2_scale", "ln2_bias",
        )}
        for i in range(num_layers):
            p = f"{prefix}.resblocks.{i}."
            out["qkv_w"].append(g(p + "attn.in_proj_weight").T)
            out["qkv_b"].append(g(p + "attn.in_proj_bias"))
            out["out_w"].append(g(p + "attn.out_proj.weight").T)
            out["out_b"].append(g(p + "attn.out_proj.bias"))
            out["fc1_w"].append(g(p + "mlp.c_fc.weight").T)
            out["fc1_b"].append(g(p + "mlp.c_fc.bias"))
            out["fc2_w"].append(g(p + "mlp.c_proj.weight").T)
            out["fc2_b"].append(g(p + "mlp.c_proj.bias"))
            out["ln1_scale"].append(g(p + "ln_1.weight"))
            out["ln1_bias"].append(g(p + "ln_1.bias"))
            out["ln2_scale"].append(g(p + "ln_2.weight"))
            out["ln2_bias"].append(g(p + "ln_2.bias"))
        return {k: np.stack(v) for k, v in out.items()}

    D = vcfg.hidden_size
    vision = {
        "patch_embed": {"w": g("visual.conv1.weight").transpose(2, 3, 1, 0).reshape(-1, D)},
        "class_embedding": g("visual.class_embedding"),
        "pos_embed": g("visual.positional_embedding"),
        "ln_pre": {"scale": g("visual.ln_pre.weight"), "bias": g("visual.ln_pre.bias")},
        "blocks": blocks_from("visual.transformer", vcfg.num_layers),
        "ln_post": {"scale": g("visual.ln_post.weight"), "bias": g("visual.ln_post.bias")},
        "proj": g("visual.proj"),
    }
    text = {
        "token_embedding": g("token_embedding.weight"),
        "pos_embed": g("positional_embedding"),
        "blocks": blocks_from("transformer", tcfg.num_layers),
        "ln_final": {"scale": g("ln_final.weight"), "bias": g("ln_final.bias")},
        "text_projection": g("text_projection"),
    }
    logit_scale = float(np.asarray(sd["logit_scale"]))
    return vision, text, logit_scale


CLIP_IMAGE_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_normalize(images: jnp.ndarray) -> jnp.ndarray:
    """[0,1] floats → CLIP-normalized (the reference's OpenCLIP transform
    Normalize step, dataset.py:173-183)."""
    return (images - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
