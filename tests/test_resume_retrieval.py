"""Trainer resume + retrieval-grid orchestration."""

import os

import numpy as np
import pytest

import jax


@pytest.mark.slow
def test_trainer_resume(tiny_hdf5, tmp_path):
    from tests.test_train import tiny_global_cfg

    from clibd_tpu.engine.train import Trainer
    from clibd_tpu.parallel.mesh import create_mesh

    g = tiny_global_cfg()
    g.model_config.epochs = 2
    kwargs = dict(
        train_split="no_split_and_seen_train",
        eval_splits={"keys": "all_keys", "seen": "val_seen", "unseen": "val_unseen"},
        mesh=create_mesh(jax.devices()[:2]),
        num_workers=0,
    )
    t1 = Trainer(g, tiny_hdf5, output_dir=str(tmp_path / "run"), **kwargs)
    t1.fit()
    step_after = t1.global_step
    p1 = jax.device_get(t1.params)
    t1.close()
    assert step_after > 0

    t2 = Trainer(g, tiny_hdf5, output_dir=str(tmp_path / "run"), **kwargs)
    start = t2.resume(str(tmp_path / "run" / "last"))
    assert t2.global_step == step_after
    assert start == 2  # finished both epochs
    # params restored identically (t2 was freshly initialized before resume,
    # so equality proves the checkpoint round-trip, not luck)
    p2 = jax.device_get(t2.params)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    t2.close()

    # single-host resume_multihost: delegates to resume() when the
    # checkpoint exists, returns None (fresh start) when it does not
    t3 = Trainer(g, tiny_hdf5, output_dir=str(tmp_path / "run2"), **kwargs)
    assert t3.resume_multihost(str(tmp_path / "nonexistent")) is None
    assert t3.resume_multihost(str(tmp_path / "run" / "last")) == 2
    assert t3.global_step == step_after
    t3.close()


def test_retrieve_images_grid_from_hdf5(tiny_hdf5, tmp_path, rng):
    from clibd_tpu.data.hdf5 import BioscanSplit
    from clibd_tpu.engine.retrieval_grid import retrieve_images

    s = BioscanSplit(tiny_hdf5, "test_seen")
    k = BioscanSplit(tiny_hdf5, "all_keys")
    q_labels = s.label_dicts()
    k_labels = k.label_dicts()
    s.close(); k.close()
    q_feats = rng.standard_normal((12, 8)).astype(np.float32)
    k_feats = rng.standard_normal((12, 8)).astype(np.float32)
    out = retrieve_images(
        str(tmp_path / "ret"), tiny_hdf5, "test_seen", "all_keys",
        q_feats, k_feats, q_labels, k_labels, num_queries=3, max_k=2,
    )
    assert os.path.exists(out["figure"])
    assert len(out["record"]) == 3
    first = next(iter(out["record"].values()))
    assert len(first["retrieved"]) == 2


def test_loader_start_batch_resume(tiny_hdf5):
    """batches(epoch, start_batch=k) must reproduce the tail of the epoch
    stream exactly (indices AND augmentation randomness, which is keyed by
    absolute batch index)."""
    from clibd_tpu.data.pipeline import BatchSpec, BioscanLoader

    spec = BatchSpec(batch_size=3, train=True, with_language=False)
    loader = BioscanLoader(tiny_hdf5, "all_keys", spec, num_workers=2, seed=4)
    full = list(loader.batches(epoch=1, shuffle=True))
    tail = list(loader.batches(epoch=1, shuffle=True, start_batch=2))
    loader.close()
    assert len(tail) == len(full) - 2
    for a, b in zip(full[2:], tail):
        np.testing.assert_array_equal(a["index"], b["index"])
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["dna"], b["dna"])
