"""Aux model wrappers (reference component #10): frozen-backbone +
extra-classifier-head combos used by the fine-tune / linear-probe scripts
(`EncoderWithExtraLayer` util/util.py:42-54, `ViTWIthExtraLayer`
vit_with_mlp.py, `BarcodeBERT_And_MLP` barcode_bert_with_mlp.py).

In the functional design these are thin closures over encoder apply
functions + a linear head; `get_feature` exposes the pre-head feature like
the reference wrappers do."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .layers import linear, torch_linear_init


def init_extra_layer(rng, feature_dim: int, num_classes: int) -> dict:
    return torch_linear_init(rng, feature_dim, num_classes)


def encoder_with_extra_layer(encode_fn: Callable) -> Callable:
    """encode_fn(params, x) → features; returns apply(params, x) → logits
    where params = {'encoder': ..., 'head': {w, b}}."""

    def apply(params, x, compute_dtype=jnp.bfloat16, return_features: bool = False):
        feats = encode_fn(params["encoder"], x)
        if return_features:
            return feats
        return linear(params["head"], feats, compute_dtype).astype(jnp.float32)

    return apply


def frozen_backbone_with_mlp(encode_fn: Callable, mlp_apply: Callable) -> Callable:
    """ViT_And_MLP / BarcodeBERT_And_MLP: frozen backbone features feed a
    trainable MLP head; the backbone is wrapped in stop_gradient."""

    def apply(params, x, compute_dtype=jnp.bfloat16):
        feats = jax.lax.stop_gradient(encode_fn(params["backbone"], x))
        return mlp_apply(params["mlp"], feats, compute_dtype)

    return apply
