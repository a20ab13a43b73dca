"""Attention-rollout visualization (reference representation_visualization/):
probe correctness, rollout math, and the CLI figure writer."""

import os

import numpy as np
import pytest

import jax

from clibd_tpu.analysis.attention_maps import (
    attention_rollout,
    bert_attention_probs,
    mask_to_grid,
    overlay_mask,
    top_orders_barcodes,
    vit_attention_probs,
)
from clibd_tpu.config.schema import BertConfig, ViTConfig
from clibd_tpu.models.bert import init_bert_params
from clibd_tpu.models.vit import init_vit_params


@pytest.fixture(scope="module")
def vit_setup(rng_module):
    cfg = ViTConfig(image_size=64, patch_size=16, hidden_size=32,
                    num_layers=3, num_heads=4, mlp_dim=64)
    params = init_vit_params(jax.random.PRNGKey(0), cfg, output_dim=16)
    images = rng_module.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    return cfg, params, images


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(0)


def test_vit_probs_shape_and_stochasticity(vit_setup):
    cfg, params, images = vit_setup
    probs = vit_attention_probs(params, images, cfg)
    N = 1 + (64 // 16) ** 2
    assert probs.shape == (3, 2, 4, N, N)
    # rows are probability distributions
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    assert probs.min() >= 0


def test_bert_probs_mask_respected(rng_module):
    cfg = BertConfig(vocab_size=50, hidden_size=32, num_layers=2, num_heads=4,
                     intermediate_size=64, max_position_embeddings=20)
    params = init_bert_params(jax.random.PRNGKey(1), cfg)
    ids = rng_module.integers(0, 50, (2, 12)).astype(np.int32)
    mask = np.ones((2, 12), np.int32)
    mask[:, 8:] = 0  # padding
    probs = bert_attention_probs(params, ids, mask, cfg)
    assert probs.shape == (2, 2, 4, 12, 12)
    # masked key columns receive (numerically) zero attention
    assert probs[..., 8:].max() < 1e-6
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)


def test_rollout_identity_attention_uniform():
    """Pure identity attention rolls out to ... the identity: CLS attends
    only to itself, so the patch mask is all zeros (then max-normalized by
    the eps floor)."""
    N = 10
    eye = np.broadcast_to(np.eye(N, dtype=np.float32), (2, 1, 3, N, N)).copy()
    mask = attention_rollout(eye, discard_ratio=0.0, layer_range=(0, 0))
    assert mask.shape == (1, N - 1)  # [L=2, B=1, H=3, N, N] → [B, N-1]
    assert mask.max() < 1e-6


def test_rollout_concentrated_attention_peaks():
    """Attention focused on one patch → rollout peaks on that patch."""
    N = 17  # CLS + 16 patches
    probs = np.full((2, 1, 2, N, N), 1e-4, np.float32)
    probs[..., 5] = 1.0  # everything attends to patch index 5
    probs /= probs.sum(-1, keepdims=True)
    mask = attention_rollout(probs, discard_ratio=0.5, layer_range=(0, 0))
    assert mask.shape == (1, N - 1)
    assert mask[0].argmax() == 4  # patch 5 → mask position 4 (CLS removed)
    assert mask[0, 4] == 1.0
    grid = mask_to_grid(mask[0])
    assert grid.shape == (4, 4)


def test_rollout_batch_vectorized():
    """The discard step must act per batch row (the reference only zeroed
    row 0 — it ran B=1)."""
    rng = np.random.default_rng(3)
    N = 9
    probs = rng.dirichlet(np.ones(N), size=(2, 3, 2, N)).astype(np.float32)
    both = attention_rollout(probs, discard_ratio=0.8, layer_range=(0, 0))
    # each row independently computed == batched computation
    single0 = attention_rollout(probs[:, :1], discard_ratio=0.8, layer_range=(0, 0))
    single1 = attention_rollout(probs[:, 1:2], discard_ratio=0.8, layer_range=(0, 0))
    np.testing.assert_allclose(both[0], single0[0], atol=1e-12)
    np.testing.assert_allclose(both[1], single1[0], atol=1e-12)


def test_overlay_mask_shape():
    img = np.random.default_rng(0).uniform(size=(32, 32, 3)).astype(np.float32)
    grid = np.random.default_rng(1).uniform(size=(4, 4)).astype(np.float32)
    out = overlay_mask(img, grid)
    assert out.shape == (32, 32, 3)
    assert 0 <= out.min() and out.max() <= 1


def test_top_orders_barcodes(tiny_hdf5):
    by_order = top_orders_barcodes(tiny_hdf5, "all_keys", n_orders=2, n_samples=3)
    assert len(by_order) == 2
    for order, bcs in by_order.items():
        assert 1 <= len(bcs) <= 3
        assert all(set(b) <= set("ACGTN") for b in bcs)


def test_cli_attention_maps(tiny_hdf5, tmp_path, monkeypatch):
    from clibd_tpu.cli import main

    exp = tmp_path / "exp.yaml"
    exp.write_text("""
model_output_name: tiny_attn
dataset: bioscan_1m
batch_size: 4
output_dim: 16
load_ckpt: false
image:
  vit: {image_size: 224, patch_size: 32, hidden_size: 32, num_layers: 2, num_heads: 4, mlp_dim: 64}
dna:
  bert: {vocab_size: 1027, hidden_size: 32, num_layers: 2, num_heads: 4, intermediate_size: 64, max_position_embeddings: 140, with_mlm_head: true}
language:
  bert: {vocab_size: 2000, hidden_size: 16, num_layers: 2, num_heads: 2, intermediate_size: 32, max_position_embeddings: 24}
""")
    monkeypatch.chdir(tmp_path)
    out = str(tmp_path / "maps")
    rc = main(["attention-maps", "-e", str(exp), "--hdf5", tiny_hdf5,
               "--modality", "both", "--split", "test_seen",
               "--out", out, "--n-samples", "4", "--n-orders", "2",
               "--layer-range", "0", "0",
               "pipeline.num_workers=0"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "image_attention_test_seen.png"))
    assert os.path.exists(os.path.join(out, "dna_attention_test_seen.png"))
