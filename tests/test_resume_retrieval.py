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


def test_midepoch_step_checkpoint_kill_resume_bitexact(tiny_hdf5, tmp_path):
    """checkpoint_every_steps + kill mid-epoch + resume must reproduce the
    uninterrupted run's remaining per-step losses BIT-EXACTLY (deterministic
    loader order + batch-indexed augmentation keys + restored optimizer
    state)."""
    from tests.test_train import tiny_global_cfg

    from clibd_tpu.engine.train import Trainer
    from clibd_tpu.parallel.mesh import create_mesh

    def make(outdir, every=0, log=None):
        g = tiny_global_cfg()
        g.model_config.batch_size = 2  # ×2 devices → 3 steps/epoch on 12 records
        g.model_config.epochs = 3
        g.model_config.evaluation_period = 10  # no eval (speed)
        g.model_config.eval_skip_epoch = 10
        g.model_config.checkpoint_every_steps = every
        return Trainer(
            g, tiny_hdf5, output_dir=outdir,
            eval_splits={"keys": "all_keys", "seen": "val_seen", "unseen": "val_unseen"},
            mesh=create_mesh(jax.devices()[:2]), num_workers=0,
            log_fn=log,
        )

    losses_a = {}
    ta = make(str(tmp_path / "a"),
              log=lambda d: losses_a.update({d["step"]: d["loss"]}) if "loss" in d else None)
    ta.fit()
    total_steps = ta.global_step
    ta.close()
    assert total_steps >= 6

    # interrupted run: step-cadence checkpoints, killed after the 4th step
    # (mid-epoch-0) via an exception from the loss callback
    class Kill(Exception):
        pass

    def killer(d):
        if d.get("step", 0) >= 4:
            raise Kill

    tb = make(str(tmp_path / "b"), every=2, log=killer)
    with pytest.raises(Kill):
        tb.fit()
    killed_at = tb.global_step
    tb.close()
    assert killed_at < total_steps  # genuinely interrupted

    losses_b = {}
    tb2 = make(str(tmp_path / "b"), every=2,
               log=lambda d: losses_b.update({d["step"]: d["loss"]}) if "loss" in d else None)
    start = tb2.resume(str(tmp_path / "b" / "last"))
    assert tb2.global_step == 4  # the step-cadence checkpoint, not epoch-end
    assert start == 1 and tb2._resume_start_batch == 1
    tb2.fit(start_epoch=start)
    tb2.close()

    # steps 4..N from the resumed run equal the uninterrupted run bit-exactly
    resumed_steps = sorted(losses_b)
    assert resumed_steps[0] == 5 and resumed_steps[-1] == total_steps
    for s in resumed_steps:
        assert losses_b[s] == losses_a[s], f"step {s}: {losses_b[s]} != {losses_a[s]}"
