"""Loss parity vs torch reference semantics + multi-device collectives."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clibd_tpu.config.schema import LossConfig
from clibd_tpu.ops.loss import (
    clip_loss,
    sharded_clip_loss,
    simclr_loss,
    soft_target_cross_entropy,
)


def torch_reference_clip_loss(feats, labels, scale, bind_to=None, no_image_text=False):
    """Literal transcription of reference ClipLoss.forward math (world=1)."""
    import torch
    import torch.nn.functional as F

    feats_t = [torch.tensor(f) if f is not None else None for f in feats]
    labels_t = torch.tensor(labels)
    matrix = (labels_t.unsqueeze(0) == labels_t.unsqueeze(1)).float()
    feature_list = [f for f in feats_t if f is not None]
    crit = torch.nn.CrossEntropyLoss()
    bind_idx = {"image": 0, "dna": 1, "text": 2}.get(bind_to) if bind_to else None
    losses = []
    for ia, fa in enumerate(feature_list):
        for ib, fb in enumerate(feature_list):
            if bind_idx is not None and ia != bind_idx and ib != bind_idx:
                continue
            if ia == ib:
                continue
            if no_image_text and (ia == 0 or ib == 0) and (ia == 2 or ib == 2):
                continue
            a = F.normalize(fa, p=2, dim=1)
            b = F.normalize(fb, p=2, dim=1)
            losses.append(crit(scale * a @ b.T, matrix))
            losses.append(crit(scale * b @ a.T, matrix))
    return float(sum(losses) / len(losses))


def _random_features(rng, b=8, d=16, n_mods=3):
    feats = [rng.standard_normal((b, d)).astype(np.float32) for _ in range(n_mods)]
    labels = rng.integers(0, 4, b).astype(np.int32)  # duplicates -> multi-positive
    return feats, labels


@pytest.mark.parametrize("n_mods", [2, 3])
def test_clip_loss_matches_torch(rng, n_mods):
    feats, labels = _random_features(rng, n_mods=n_mods)
    scale = 14.2
    names = ["image", "dna", "language"][:n_mods]
    features = {m: jnp.asarray(f) for m, f in zip(names, feats)}
    ours = float(clip_loss(features, jnp.asarray(labels), scale, LossConfig()))
    ref = torch_reference_clip_loss(feats, labels, scale)
    assert abs(ours - ref) < 1e-4


def test_clip_loss_bind_to_and_no_image_text(rng):
    feats, labels = _random_features(rng)
    features = {m: jnp.asarray(f) for m, f in zip(("image", "dna", "language"), feats)}
    for bind in ("image", "dna", "text"):
        cfg = LossConfig(bind_to=bind)
        ours = float(clip_loss(features, jnp.asarray(labels), 10.0, cfg))
        ref = torch_reference_clip_loss(feats, labels, 10.0, bind_to=bind)
        assert abs(ours - ref) < 1e-4, bind
    cfg = LossConfig(no_image_text_loss=True)
    ours = float(clip_loss(features, jnp.asarray(labels), 10.0, cfg))
    ref = torch_reference_clip_loss(feats, labels, 10.0, no_image_text=True)
    assert abs(ours - ref) < 1e-4


def test_soft_target_ce_matches_torch(rng):
    import torch

    logits = rng.standard_normal((6, 6)).astype(np.float32)
    labels = rng.integers(0, 3, 6)
    target = (labels[:, None] == labels[None, :]).astype(np.float32)
    ref = float(torch.nn.CrossEntropyLoss()(torch.tensor(logits), torch.tensor(target)))
    ours = float(soft_target_cross_entropy(jnp.asarray(logits), jnp.asarray(target)))
    assert abs(ours - ref) < 1e-4


def test_sharded_loss_equals_global(rng):
    """8-device CPU mesh: shard_map all-gather loss == single-device global loss."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax import shard_map

    devices = np.array(jax.devices()[:8])
    assert devices.size == 8, "conftest must force 8 CPU devices"
    mesh = Mesh(devices, ("data",))

    b_global, d = 16, 8
    feats, labels = _random_features(rng, b=b_global, d=d)
    features = {m: jnp.asarray(f) for m, f in zip(("image", "dna", "language"), feats)}
    labels_j = jnp.asarray(labels)
    cfg = LossConfig()

    global_val = float(clip_loss(features, labels_j, 7.0, cfg))

    fn = shard_map(
        lambda f, l: sharded_clip_loss(f, l, 7.0, cfg, axis_name="data"),
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P("data"), features), P("data")),
        out_specs=P(),
    )
    sharded_val = float(jax.jit(fn)(features, labels_j))
    assert abs(sharded_val - global_val) < 1e-4

    # local_loss variant reaches the same value for equal shards
    cfg_local = LossConfig(local_loss=True)
    global_local = float(clip_loss(features, labels_j, 7.0, cfg))
    fn2 = shard_map(
        lambda f, l: sharded_clip_loss(f, l, 7.0, cfg_local, axis_name="data"),
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P("data"), features), P("data")),
        out_specs=P(),
    )
    local_val = float(jax.jit(fn2)(features, labels_j))
    assert abs(local_val - global_local) < 1e-4


def test_gradients_flow_through_gather(rng):
    """Gradient of the sharded loss wrt features == gradient of global loss
    (the reference's gather_with_grad semantics)."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    feats, labels = _random_features(rng, b=8, d=6, n_mods=2)
    features = {m: jnp.asarray(f) for m, f in zip(("image", "dna"), feats)}
    labels_j = jnp.asarray(labels)
    cfg = LossConfig()

    g_global = jax.grad(lambda f: clip_loss(f, labels_j, 5.0, cfg))(features)

    def sharded(f):
        fn = shard_map(
            lambda ff, ll: sharded_clip_loss(ff, ll, 5.0, cfg, axis_name="data"),
            mesh=mesh,
            in_specs=(jax.tree.map(lambda _: P("data"), f), P("data")),
            out_specs=P(),
        )
        return fn(f, labels_j)

    g_sharded = jax.grad(sharded)(features)
    for m in features:
        np.testing.assert_allclose(np.asarray(g_global[m]), np.asarray(g_sharded[m]), atol=1e-5)


def test_simclr_loss_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    b, d = 6, 10
    features = rng.standard_normal((2 * b, d)).astype(np.float32)

    # reference info_nce_loss (util/simclr.py:64-92)
    t = torch.tensor(features)
    labels = torch.cat([torch.arange(b) for _ in range(2)], dim=0)
    labels = (labels.unsqueeze(0) == labels.unsqueeze(1)).float()
    f = F.normalize(t, dim=1)
    sim = f @ f.T
    mask = torch.eye(labels.shape[0], dtype=torch.bool)
    labels = labels[~mask].view(labels.shape[0], -1)
    sim = sim[~mask].view(sim.shape[0], -1)
    positives = sim[labels.bool()].view(labels.shape[0], -1)
    negatives = sim[~labels.bool()].view(sim.shape[0], -1)
    logits = torch.cat([positives, negatives], dim=1) / 0.07
    ref = float(torch.nn.CrossEntropyLoss()(logits, torch.zeros(logits.shape[0], dtype=torch.long)))

    ours = float(simclr_loss(jnp.asarray(features), temperature=0.07))
    assert abs(ours - ref) < 1e-4
