"""Pallas fused attention: interpret-mode numerics on the CPU backend."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clibd_tpu.ops.pallas.attention import fused_mha


def _reference(q, k, v):
    hd = q.shape[-1]
    s = np.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("shape", [(2, 3, 17, 8), (1, 2, 128, 16), (2, 1, 133, 32)])
def test_fused_mha_matches_reference(rng, shape):
    q, k, v = [rng.standard_normal(shape).astype(np.float32) for _ in range(3)]
    ref = _reference(q, k, v)
    out = np.asarray(fused_mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True))
    assert out.shape == shape
    # kernel computes in bf16 internally
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_fused_mha_padding_mask(rng):
    """Padded key columns must not leak into the softmax: compare N=100
    (padded to 128) against an exact fp32 reference."""
    q, k, v = [rng.standard_normal((1, 2, 100, 8)).astype(np.float32) for _ in range(3)]
    ref = _reference(q, k, v)
    out = np.asarray(fused_mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)
