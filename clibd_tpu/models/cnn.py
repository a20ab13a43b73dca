"""DNACNN legacy baseline (reference bioscanclip/model/cnn.py:1-28): conv
tower over one-hot DNA.  Input [B, L, 4] one-hot (the reference permutes a
[B, H=L, W?, C] layout; here the natural [B, L, 4] with 1D convs expressed
as 2D convs over (L, 4) matches the reference's (3,3)-kernel / (3,1)-maxpool
structure).  Kept for capability parity; unused by the main path."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import torch_linear_init


def init_dnacnn_params(rng, in_feature: int = 1, dim: int = 2208, embedding_dim: int = 512) -> dict:
    keys = jax.random.split(rng, 4)

    def conv_init(key, cin, cout, kh, kw):
        bound = 1.0 / (cin * kh * kw) ** 0.5
        k1, k2 = jax.random.split(key)
        return {
            "w": jax.random.uniform(k1, (kh, kw, cin, cout), jnp.float32, -bound, bound),
            "b": jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound),
        }

    return {
        "conv1": conv_init(keys[0], in_feature, 64, 3, 3),
        "conv2": conv_init(keys[1], 64, 32, 3, 3),
        "conv3": conv_init(keys[2], 32, 16, 3, 3),
        "lin1": torch_linear_init(keys[3], dim, embedding_dim),
    }


def _conv(p, x, pad_w=1):
    # x NHWC; valid in H, same-ish in W (reference padding=(0,1))
    return jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, 1),
        padding=((0, 0), (pad_w, pad_w)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"]


def _maxpool31(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 1, 1), (1, 3, 1, 1), "VALID"
    )


def dnacnn_apply(params: dict, onehot: jnp.ndarray) -> jnp.ndarray:
    """onehot: [B, L, 4, C_in] (C_in=1 for plain one-hot) → [B, embedding_dim].

    Reference ordering: conv → relu → bn → pool per stage (BatchNorm is
    omitted — inference-mode identity at init; dropout is eval-mode off),
    then flatten → linear → tanh."""
    x = onehot.astype(jnp.float32)
    x = _maxpool31(jax.nn.relu(_conv(params["conv1"], x)))
    x = _maxpool31(jax.nn.relu(_conv(params["conv2"], x)))
    x = _maxpool31(jax.nn.relu(_conv(params["conv3"], x)))
    x = x.reshape(x.shape[0], -1)
    w = params["lin1"]
    return jnp.tanh(x @ w["w"] + w["b"])


def one_hot_dna(tokens: jnp.ndarray, num_classes: int = 4) -> jnp.ndarray:
    """[B, L] base indices (0..3) → [B, L, 4, 1]."""
    return jax.nn.one_hot(tokens, num_classes)[..., None]
