"""Trainer smoke + semantics tests on the tiny fixture with an 8-device mesh."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clibd_tpu.config.schema import BertConfig, ExperimentConfig, GlobalConfig, ViTConfig
from clibd_tpu.engine.checkpoint import (
    BestLastCheckpointer,
    load_params_any,
    load_train_state,
    resolve_checkpoint_path,
    save_train_state,
)
from clibd_tpu.engine.train import Trainer, build_optimizer, make_train_step
from clibd_tpu.models import init_clibd_params, trainable_mask
from clibd_tpu.parallel.mesh import create_mesh


def tiny_global_cfg():
    g = GlobalConfig()
    g.save_ckpt = True
    cfg = g.model_config
    cfg.batch_size = 4  # per-device; ×mesh-size global
    cfg.epochs = 2
    cfg.evaluation_period = 1
    cfg.eval_skip_epoch = -1
    cfg.output_dim = 16
    cfg.disable_lora = False
    cfg.image.vit = ViTConfig(image_size=224, patch_size=32, hidden_size=32,
                              num_layers=2, num_heads=4, mlp_dim=64)
    cfg.dna.bert = BertConfig(vocab_size=1027, hidden_size=32, num_layers=2,
                              num_heads=4, intermediate_size=64,
                              max_position_embeddings=140, with_mlm_head=True)
    cfg.language.bert = BertConfig(vocab_size=2000, hidden_size=16, num_layers=2,
                                   num_heads=2, intermediate_size=32,
                                   max_position_embeddings=24)
    return g


@pytest.mark.slow
def test_train_step_decreases_loss_and_freezes_backbone(tiny_hdf5):
    g = tiny_global_cfg()
    cfg = g.model_config
    params = init_clibd_params(jax.random.PRNGKey(0), cfg)
    backbone_before = np.asarray(params["image_encoder"]["blocks"]["qkv_w"]).copy()
    lora_before = np.asarray(params["image_encoder"]["lora"]["b_q"]).copy()
    logit_scale_before = float(params["logit_scale"])

    mesh = create_mesh(jax.devices()[:4])
    from clibd_tpu.engine.schedules import build_schedule

    schedule = build_schedule(cfg.optim, total_steps=20, batch_size=cfg.batch_size)
    optimizer = build_optimizer(cfg, params, schedule)
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, optimizer, mesh=mesh)

    rng = np.random.default_rng(0)
    batch = {
        "image": rng.random((8, 224, 224, 3), dtype=np.float32),
        "dna": rng.integers(0, 1027, (8, 133)).astype(np.int32),
        "language": {
            "input_ids": rng.integers(0, 2000, (8, 20)).astype(np.int32),
            "token_type_ids": np.zeros((8, 20), np.int32),
            "attention_mask": np.ones((8, 20), np.int32),
        },
        "label": np.arange(8, dtype=np.int32),
    }
    from clibd_tpu.parallel.mesh import replicate, shard_batch

    params_d = replicate(mesh, params)
    opt_d = replicate(mesh, opt_state)
    batch_d = shard_batch(mesh, batch)
    key = jax.random.PRNGKey(0)

    losses = []
    for i in range(4):
        params_d, opt_d, loss = step(params_d, opt_d, batch_d, jax.random.fold_in(key, i))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses

    after = jax.device_get(params_d)
    # frozen ViT backbone unchanged; LoRA B moved off zero
    np.testing.assert_array_equal(np.asarray(after["image_encoder"]["blocks"]["qkv_w"]), backbone_before)
    assert np.abs(np.asarray(after["image_encoder"]["lora"]["b_q"]) - lora_before).max() > 0
    # logit_scale trains
    assert float(after["logit_scale"]) != logit_scale_before


@pytest.mark.slow
def test_trainer_fit_end_to_end(tiny_hdf5, tmp_path):
    g = tiny_global_cfg()
    trainer = Trainer(
        g,
        tiny_hdf5,
        output_dir=str(tmp_path / "ckpt"),
        train_split="no_split_and_seen_train",
        eval_splits={"keys": "all_keys", "seen": "val_seen", "unseen": "val_unseen"},
        mesh=create_mesh(jax.devices()[:2]),
        num_workers=0,
    )
    history = trainer.fit()
    trainer.close()
    assert len(history["loss"]) == 2
    assert len(history["overall_acc"]) == 2
    assert os.path.exists(tmp_path / "ckpt" / "last" / "params.npz")
    assert os.path.exists(tmp_path / "ckpt" / "best" / "params.npz")
    assert os.path.exists(tmp_path / "ckpt" / "best" / "meta.json")


def test_checkpoint_roundtrip(tmp_path):
    g = tiny_global_cfg()
    cfg = g.model_config
    params = init_clibd_params(jax.random.PRNGKey(0), cfg)
    from clibd_tpu.engine.schedules import build_schedule

    optimizer = build_optimizer(cfg, params, build_schedule(cfg.optim, 10, 8))
    opt_state = optimizer.init(params)

    d = str(tmp_path / "state")
    save_train_state(d, params, opt_state, step=7, epoch=2, meta={"overall_acc": 0.5})
    donor = optimizer.init(params)
    p2, o2, meta = load_train_state(d, opt_state_like=donor)
    assert meta["step"] == 7 and meta["epoch"] == 2
    for (kp1, l1), (kp2, l2) in zip(
        jax.tree_util.tree_leaves_with_path(params), jax.tree_util.tree_leaves_with_path(p2)
    ):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    flat1 = jax.tree.leaves(opt_state)
    flat2 = jax.tree.leaves(o2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    assert resolve_checkpoint_path(d) == d
    # best/last resolution
    os.makedirs(tmp_path / "run" / "best", exist_ok=True)
    save_train_state(str(tmp_path / "run" / "best"), params)
    assert resolve_checkpoint_path(str(tmp_path / "run")) == str(tmp_path / "run" / "best")


def test_load_reference_torch_checkpoint(tmp_path):
    """Full released-checkpoint import path: build a torch SimpleCLIP-shaped
    state_dict (LoRA layout with legacy names + module. prefix) and load it."""
    import torch

    g = tiny_global_cfg()
    cfg = g.model_config
    D_vit, L = cfg.image.vit.hidden_size, cfg.image.vit.num_layers
    r = cfg.lora_rank
    sd = {"module.logit_scale": torch.tensor(2.659)}

    # legacy-named image encoder (LoRA_ViT_timm/lora_vit -> migrated)
    pre = "module.image_encoder.lora_vit."
    sd[pre + "cls_token"] = torch.randn(1, 1, D_vit)
    sd[pre + "pos_embed"] = torch.randn(1, cfg.image.vit.seq_len, D_vit)
    sd[pre + "patch_embed.proj.weight"] = torch.randn(D_vit, 3, 32, 32)
    sd[pre + "patch_embed.proj.bias"] = torch.randn(D_vit)
    for i in range(L):
        p = pre + f"blocks.{i}."
        sd[p + "attn.qkv.qkv.weight"] = torch.randn(3 * D_vit, D_vit)
        sd[p + "attn.qkv.qkv.bias"] = torch.randn(3 * D_vit)
        sd[p + "attn.qkv.linear_a_q.weight"] = torch.randn(r, D_vit)
        sd[p + "attn.qkv.linear_b_q.weight"] = torch.randn(D_vit, r)
        sd[p + "attn.qkv.linear_a_v.weight"] = torch.randn(r, D_vit)
        sd[p + "attn.qkv.linear_b_v.weight"] = torch.randn(D_vit, r)
        sd[p + "attn.proj.weight"] = torch.randn(D_vit, D_vit)
        sd[p + "attn.proj.bias"] = torch.randn(D_vit)
        sd[p + "mlp.fc1.weight"] = torch.randn(cfg.image.vit.mlp_dim, D_vit)
        sd[p + "mlp.fc1.bias"] = torch.randn(cfg.image.vit.mlp_dim)
        sd[p + "mlp.fc2.weight"] = torch.randn(D_vit, cfg.image.vit.mlp_dim)
        sd[p + "mlp.fc2.bias"] = torch.randn(D_vit)
        for ln in ("norm1", "norm2"):
            sd[p + ln + ".weight"] = torch.randn(D_vit)
            sd[p + ln + ".bias"] = torch.randn(D_vit)
    sd[pre + "norm.weight"] = torch.randn(D_vit)
    sd[pre + "norm.bias"] = torch.randn(D_vit)
    sd[pre + "head.weight"] = torch.randn(cfg.output_dim, D_vit)
    sd[pre + "head.bias"] = torch.randn(cfg.output_dim)

    path = str(tmp_path / "best.pth")
    torch.save(sd, path)
    params = load_params_any(path, cfg)
    assert params["image_encoder"]["blocks"]["qkv_w"].shape == (L, D_vit, 3 * D_vit)
    assert params["image_encoder"]["lora"]["a_q"].shape == (L, D_vit, r)
    assert abs(float(params["logit_scale"]) - 2.659) < 1e-5
    # transposition correctness
    np.testing.assert_allclose(
        params["image_encoder"]["blocks"]["qkv_w"][0],
        sd["module.image_encoder.lora_vit.blocks.0.attn.qkv.qkv.weight"].numpy().T,
    )


def test_shard_map_train_step_matches_global(tiny_hdf5, monkeypatch):
    """make_train_step_shard_map (explicit all_gather loss + psum grads) must
    produce the same loss and parameter update as the global-math jit step
    (augmentation disabled for determinism — its PRNG streams differ by
    construction)."""
    import jax.numpy as jnp

    from clibd_tpu.config.schema import BertConfig, ExperimentConfig, ViTConfig
    from clibd_tpu.engine import train as train_mod
    from clibd_tpu.engine.schedules import build_schedule
    from clibd_tpu.models import init_clibd_params
    from clibd_tpu.parallel.mesh import create_mesh, replicate, shard_batch

    monkeypatch.setattr(train_mod, "train_augment", lambda rng, x: x)

    cfg = ExperimentConfig()
    cfg.batch_size = 2
    cfg.output_dim = 16
    cfg.remat = False
    cfg.image.vit = ViTConfig(image_size=64, patch_size=16, hidden_size=32,
                              num_layers=2, num_heads=4, mlp_dim=64)
    cfg.dna.bert = BertConfig(vocab_size=1027, hidden_size=32, num_layers=2,
                              num_heads=4, intermediate_size=64,
                              max_position_embeddings=140, with_mlm_head=True)
    cfg.language.enable = False

    mesh = create_mesh(jax.devices()[:4])
    params = init_clibd_params(jax.random.PRNGKey(0), cfg)
    schedule = build_schedule(cfg.optim, total_steps=4, batch_size=cfg.batch_size)
    optimizer = train_mod.build_optimizer(cfg, params, schedule)
    opt_state = optimizer.init(params)

    rng = np.random.default_rng(0)
    B = cfg.batch_size * mesh.size
    batch = {
        "image": rng.random((B, 64, 64, 3), dtype=np.float32),
        "dna": rng.integers(0, 1027, (B, 133)).astype(np.int32),
        "label": np.arange(B, dtype=np.int32),
    }
    key = jax.random.PRNGKey(7)

    p_g = replicate(mesh, params)
    o_g = replicate(mesh, opt_state)
    b_g = shard_batch(mesh, batch)
    step_g = train_mod.make_train_step(cfg, optimizer, mesh=mesh, donate=False)
    pg, og, loss_g = step_g(p_g, o_g, b_g, key)

    p_s = replicate(mesh, params)
    o_s = replicate(mesh, opt_state)
    step_s = train_mod.make_train_step_shard_map(cfg, optimizer, mesh, donate=False)
    ps, os_, loss_s = step_s(p_s, o_s, shard_batch(mesh, batch), key)

    np.testing.assert_allclose(float(loss_s), float(loss_g), rtol=2e-5)
    flat_g = jax.tree.leaves(jax.device_get(pg))
    flat_s = jax.tree.leaves(jax.device_get(ps))
    for a, b in zip(flat_s, flat_g):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                                   atol=5e-5, rtol=1e-3)


def test_shard_map_train_step_with_flash_kernels(tiny_hdf5, monkeypatch):
    """The v5e-8 training configuration: flash Pallas attention (forward AND
    the dedicated pallas backward) inside the shard_map train step, on the
    CPU mesh in interpret mode.  Loss and updated params must agree with the
    XLA-attention shard_map step at bf16-kernel tolerance."""
    import jax.numpy as jnp

    from clibd_tpu.config.schema import BertConfig, ExperimentConfig, ViTConfig
    from clibd_tpu.engine import train as train_mod
    from clibd_tpu.engine.schedules import build_schedule
    from clibd_tpu.models import init_clibd_params, layers
    from clibd_tpu.parallel.mesh import create_mesh, replicate, shard_batch

    monkeypatch.setattr(train_mod, "train_augment", lambda rng, x: x)

    cfg = ExperimentConfig()
    cfg.batch_size = 2
    cfg.output_dim = 16
    cfg.remat = True  # the production config: recompute runs the kernel again
    cfg.image.vit = ViTConfig(image_size=64, patch_size=16, hidden_size=32,
                              num_layers=1, num_heads=4, mlp_dim=64)
    cfg.dna.bert = BertConfig(vocab_size=1027, hidden_size=32, num_layers=1,
                              num_heads=4, intermediate_size=64,
                              max_position_embeddings=140, with_mlm_head=True)
    cfg.language.enable = False

    mesh = create_mesh(jax.devices()[:2])
    params = init_clibd_params(jax.random.PRNGKey(0), cfg)
    schedule = build_schedule(cfg.optim, total_steps=4, batch_size=cfg.batch_size)
    optimizer = train_mod.build_optimizer(cfg, params, schedule)
    opt_state = optimizer.init(params)

    rng = np.random.default_rng(0)
    B = cfg.batch_size * mesh.size
    batch = {
        "image": rng.random((B, 64, 64, 3), dtype=np.float32),
        "dna": rng.integers(0, 1027, (B, 133)).astype(np.int32),
        "label": np.arange(B, dtype=np.int32),
    }
    key = jax.random.PRNGKey(7)

    def run():
        p = replicate(mesh, params)
        o = replicate(mesh, opt_state)
        step = train_mod.make_train_step_shard_map(cfg, optimizer, mesh, donate=False)
        return step(p, o, shard_batch(mesh, batch), key)

    monkeypatch.setattr(layers, "ATTENTION_IMPL", "xla")
    p_ref, _, loss_ref = run()
    monkeypatch.setattr(layers, "ATTENTION_IMPL", "pallas")
    p_fl, _, loss_fl = run()

    np.testing.assert_allclose(float(loss_fl), float(loss_ref), rtol=2e-2)
    for a, b in zip(jax.tree.leaves(jax.device_get(p_fl)),
                    jax.tree.leaves(jax.device_get(p_ref))):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                                   atol=3e-2, rtol=3e-2)


def test_async_checkpoint_writer(tmp_path):
    """AsyncCheckpointWriter: overlapped writes land complete and readable;
    same-directory submits serialize; failures surface on wait()."""
    import numpy as np

    from clibd_tpu.engine.checkpoint import (
        AsyncCheckpointWriter, load_train_state, save_train_state)

    w = AsyncCheckpointWriter()
    params = {"a": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}}
    d = str(tmp_path / "last")
    for step in range(3):  # re-submits join the previous write
        w.submit(d, {"a": {"w": params["a"]["w"] + step}}, None, step, step)
    w.wait()
    loaded, _opt, meta = load_train_state(d)
    np.testing.assert_array_equal(loaded["a"]["w"], params["a"]["w"] + 2)
    assert meta["step"] == 2

    # atomicity naming: no stray .tmp files
    import os

    assert not [f for f in os.listdir(d) if ".tmp" in f]

    # a failing write surfaces on wait(), not silently — a regular file used
    # as a directory component fails portably (no procfs assumption)
    blocker = tmp_path / "afile"
    blocker.write_text("x")
    w2 = AsyncCheckpointWriter()
    w2.submit(str(blocker / "sub"), params, None, 0, 0)
    import pytest

    with pytest.raises(RuntimeError):
        w2.wait()


def test_remat_policy_loss_and_grad_parity(monkeypatch):
    """Remat save-policies only change WHAT is stored for the backward, never
    the math: loss and one-step parameter updates must be identical (fp32)
    across no-remat, blanket remat, and every named save policy."""
    from clibd_tpu.engine import train as train_mod
    from clibd_tpu.engine.schedules import build_schedule

    monkeypatch.setattr(train_mod, "train_augment", lambda rng, x: x)

    def run(remat, policy):
        cfg = ExperimentConfig()
        cfg.batch_size = 3
        cfg.output_dim = 16
        cfg.amp = False  # fp32 → policy equivalence is exact, not tolerance
        cfg.remat = remat
        cfg.remat_policy = policy
        cfg.image.vit = ViTConfig(image_size=32, patch_size=16, hidden_size=32,
                                  num_layers=2, num_heads=4, mlp_dim=64)
        cfg.dna.bert = BertConfig(vocab_size=1027, hidden_size=32, num_layers=2,
                                  num_heads=4, intermediate_size=64,
                                  max_position_embeddings=140, with_mlm_head=True)
        cfg.language.enable = False
        params = init_clibd_params(jax.random.PRNGKey(0), cfg)
        schedule = build_schedule(cfg.optim, total_steps=4, batch_size=cfg.batch_size)
        optimizer = build_optimizer(cfg, params, schedule)
        opt_state = optimizer.init(params)
        rng = np.random.default_rng(0)
        batch = {
            "image": rng.random((3, 32, 32, 3), dtype=np.float32),
            "dna": rng.integers(0, 1027, (3, 133)).astype(np.int32),
            "label": np.arange(3, dtype=np.int32),
        }
        step = make_train_step(cfg, optimizer, donate=False)
        p, _, loss = step(params, opt_state, batch, jax.random.PRNGKey(7))
        return float(loss), jax.tree.leaves(jax.device_get(p))

    loss_ref, p_ref = run(False, "attn")
    for policy in ("none", "attn", "qkv", "mlp", "attn+mlp", "dots"):
        loss_p, p_p = run(True, policy)
        assert loss_p == pytest.approx(loss_ref, abs=1e-6), policy
        for a, b in zip(p_p, p_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, rtol=1e-5, err_msg=policy)

    with pytest.raises(ValueError):
        from clibd_tpu.models.layers import remat_policy
        remat_policy("bogus")


def test_gradcache_accum_step_matches_monolithic(monkeypatch):
    """make_train_step_accum (gradient-cache microbatching) computes the EXACT
    full-batch contrastive loss and gradients of the monolithic step — not k
    independent batch-B/k CLIP losses.  fp32, augmentation stubbed (the accum
    path folds the rng per microbatch, a deliberate stream difference), so
    loss and one-step parameter updates must agree to fp32 tolerance."""
    from clibd_tpu.engine import train as train_mod
    from clibd_tpu.engine.schedules import build_schedule
    from clibd_tpu.engine.train import make_train_step, make_train_step_accum

    monkeypatch.setattr(train_mod, "train_augment", lambda rng, x: x)

    cfg = ExperimentConfig()
    cfg.batch_size = 8
    cfg.output_dim = 16
    cfg.amp = False
    cfg.remat = False
    cfg.image.vit = ViTConfig(image_size=32, patch_size=16, hidden_size=32,
                              num_layers=2, num_heads=4, mlp_dim=64)
    cfg.dna.bert = BertConfig(vocab_size=1027, hidden_size=32, num_layers=2,
                              num_heads=4, intermediate_size=64,
                              max_position_embeddings=140, with_mlm_head=True)
    cfg.language.enable = False
    params = init_clibd_params(jax.random.PRNGKey(0), cfg)
    schedule = build_schedule(cfg.optim, total_steps=4, batch_size=cfg.batch_size)
    optimizer = build_optimizer(cfg, params, schedule)
    opt_state = optimizer.init(params)
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.random((8, 32, 32, 3), dtype=np.float32),
        "dna": rng.integers(0, 1027, (8, 133)).astype(np.int32),
        "label": np.arange(8, dtype=np.int32),
    }

    step = make_train_step(cfg, optimizer, donate=False)
    p_ref, _, loss_ref = step(params, opt_state, batch, jax.random.PRNGKey(7))

    for k in (2, 4):
        astep = make_train_step_accum(cfg, optimizer, k, donate=False)
        p_k, _, loss_k = astep(params, opt_state, batch, jax.random.PRNGKey(7))
        assert float(loss_k) == pytest.approx(float(loss_ref), abs=1e-6), k
        for a, b in zip(jax.tree.leaves(jax.device_get(p_k)),
                        jax.tree.leaves(jax.device_get(p_ref))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, rtol=1e-5, err_msg=f"accum={k}")

    # accum_steps=1 degrades to the monolithic builder
    assert make_train_step_accum(cfg, optimizer, 1, donate=False) is not None
