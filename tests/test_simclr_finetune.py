"""SimCLR trainer + color augs + supervised fine-tune engine tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clibd_tpu.config.schema import BertConfig, GlobalConfig, ViTConfig


def tiny_gcfg():
    g = GlobalConfig()
    g.save_ckpt = True
    c = g.model_config
    c.batch_size = 6
    c.epochs = 1
    c.output_dim = 16
    c.image.vit = ViTConfig(image_size=224, patch_size=32, hidden_size=32,
                            num_layers=2, num_heads=4, mlp_dim=64)
    return g


def test_color_ops_match_torchvision_semantics(rng):
    """brightness/contrast/saturation vs manual blends; hue self-inverse."""
    from clibd_tpu.ops.color import (
        adjust_brightness,
        adjust_contrast,
        adjust_hue,
        adjust_saturation,
        gaussian_blur,
        rgb_to_grayscale,
    )

    imgs = jnp.asarray(rng.random((2, 8, 8, 3), dtype=np.float32))
    ones = jnp.ones((2,))
    # factor 1 is identity for all three blends
    for fn in (adjust_brightness, adjust_contrast, adjust_saturation):
        np.testing.assert_allclose(np.asarray(fn(imgs, ones)), np.asarray(imgs), atol=1e-6)
    # brightness 0 -> black
    assert float(adjust_brightness(imgs, jnp.zeros((2,))).max()) == 0.0
    # hue shift by 0 is identity; shift by +0.5 twice returns original
    np.testing.assert_allclose(np.asarray(adjust_hue(imgs, jnp.zeros((2,)))), np.asarray(imgs), atol=1e-5)
    shifted = adjust_hue(adjust_hue(imgs, jnp.full((2,), 0.5)), jnp.full((2,), 0.5))
    np.testing.assert_allclose(np.asarray(shifted), np.asarray(imgs), atol=1e-4)
    # grayscale has equal channels
    g = rgb_to_grayscale(imgs)
    np.testing.assert_allclose(np.asarray(g[..., 0]), np.asarray(g[..., 1]))
    # blur preserves mean approximately (edge padding) and shape
    b = gaussian_blur(jax.random.PRNGKey(0), imgs, kernel_size=5)
    assert b.shape == imgs.shape
    assert abs(float(b.mean()) - float(imgs.mean())) < 0.02


def test_hue_matches_torchvision_formula(rng):
    """Cross-check adjust_hue against colorsys (per-pixel HSV ground truth)."""
    import colorsys

    from clibd_tpu.ops.color import adjust_hue

    imgs = rng.random((1, 4, 4, 3)).astype(np.float32)
    delta = 0.13
    out = np.asarray(adjust_hue(jnp.asarray(imgs), jnp.asarray([delta])))
    for i in range(4):
        for j in range(4):
            r, g, b = imgs[0, i, j]
            h, s, v = colorsys.rgb_to_hsv(r, g, b)
            expected = colorsys.hsv_to_rgb((h + delta) % 1.0, s, v)
            np.testing.assert_allclose(out[0, i, j], expected, atol=1e-4)


def test_simclr_augment_shapes():
    from clibd_tpu.ops.color import simclr_augment

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((4, 32, 32, 3), dtype=np.float32))
    out = simclr_augment(jax.random.PRNGKey(0), imgs, size=32)
    assert out.shape == imgs.shape
    assert np.isfinite(np.asarray(out)).all()


def test_simclr_trainer(tiny_hdf5, tmp_path):
    import os

    import jax

    from clibd_tpu.engine.simclr import SimCLRTrainer
    from clibd_tpu.parallel.mesh import create_mesh

    g = tiny_gcfg()
    trainer = SimCLRTrainer(
        g, tiny_hdf5, output_dir=str(tmp_path / "simclr"),
        split="no_split_and_seen_train", num_workers=0,
        mesh=create_mesh(jax.devices()[:1]),
    )
    hist = trainer.fit()
    trainer.close()
    assert len(hist["loss"]) == 1 and np.isfinite(hist["loss"][0])
    assert os.path.exists(tmp_path / "simclr" / "model_best" / "params.npz")
    assert os.path.exists(tmp_path / "simclr" / "checkpoint_0000" / "params.npz")


def test_simclr_trainer_multi_device(tiny_hdf5, tmp_path):
    """shard_map SimCLR step (per-device local NT-Xent + psum grads — the
    reference's DDP semantics) on a 2-device mesh: loader yields the device
    share (batch_size × 2) and training runs."""
    import jax

    from clibd_tpu.engine.simclr import SimCLRTrainer
    from clibd_tpu.parallel.mesh import create_mesh

    g = tiny_gcfg()
    g.model_config.batch_size = 4  # × 2 devices = 8-row loader batches
    trainer = SimCLRTrainer(
        g, tiny_hdf5, output_dir=str(tmp_path / "simclr2"),
        split="no_split_and_seen_train", num_workers=0,
        mesh=create_mesh(jax.devices()[:2]),
    )
    assert trainer.loader.a.spec.batch_size == 8
    hist = trainer.fit()
    trainer.close()
    assert len(hist["loss"]) == 1 and np.isfinite(hist["loss"][0])


@pytest.mark.slow
def test_finetune_learns(rng):
    import optax

    from clibd_tpu.engine.finetune import (
        init_classifier_head,
        make_finetune_step,
        species_to_index,
        topk_accuracy,
    )
    from clibd_tpu.models import init_clibd_params

    g = tiny_gcfg()
    cfg = g.model_config
    cfg.dna.bert = BertConfig(vocab_size=1027, hidden_size=32, num_layers=2,
                              num_heads=4, intermediate_size=64,
                              max_position_embeddings=140, with_mlm_head=True)
    params = init_clibd_params(jax.random.PRNGKey(0), cfg)
    params["classifier"] = init_classifier_head(jax.random.PRNGKey(1), cfg.output_dim, 4)

    optimizer = optax.adamw(1e-3)
    opt_state = optimizer.init(params)
    step, predict = make_finetune_step(cfg, optimizer, modality="dna")

    batch = {
        "dna": jnp.asarray(rng.integers(0, 1027, (8, 133)).astype(np.int32)),
        "target": jnp.asarray(np.arange(8) % 4, dtype=jnp.int32),
    }
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]

    logits = np.asarray(predict(params, batch))
    acc = topk_accuracy(logits, np.asarray(batch["target"]))
    assert set(acc.keys()) == {1, 3, 5}
    assert acc[1] <= acc[3] <= acc[5] <= 1.0

    labels = [{"species": s} for s in ("a", "b", "a", "c")]
    idx = species_to_index(labels, ["a", "b", "c"])
    np.testing.assert_array_equal(idx, [0, 1, 0, 2])
