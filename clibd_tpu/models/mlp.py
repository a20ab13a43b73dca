"""MLP feature encoders (reference bioscanclip/model/mlp.py): 3-layer
Linear-ReLU-Linear-ReLU-Linear over pre-extracted image/DNA features."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import linear, torch_linear_init


def init_mlp_encoder_params(rng, input_dim: int, hidden_dim: int = 512, output_dim: int = 512) -> dict:
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "fc1": torch_linear_init(k1, input_dim, hidden_dim),
        "fc2": torch_linear_init(k2, hidden_dim, hidden_dim),
        "fc3": torch_linear_init(k3, hidden_dim, output_dim),
    }


def mlp_encoder_apply(params: dict, x: jnp.ndarray, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    h = jax.nn.relu(linear(params["fc1"], x, compute_dtype))
    h = jax.nn.relu(linear(params["fc2"], h, compute_dtype))
    return linear(params["fc3"], h, compute_dtype).astype(jnp.float32)
