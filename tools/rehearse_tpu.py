"""Full-size accuracy rehearsal on the real TPU chip.

Trains the flagship-dims model (ViT-B/16 + BarcodeBERT, LoRA) on the
synthetic learnable dataset (species determines image color + barcode motif)
with every perf optimization active — flash Pallas attention forward AND
backward, fast_math, uint8 transport — and reports loss + retrieval
overall_acc before/after.  Validates that the approximated stack trains.

Usage: python tools/rehearse_tpu.py [epochs] [batch]
"""
import importlib.util
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax


def load_fixture_builder():
    spec = importlib.util.spec_from_file_location(
        "learn_fixture", "/root/repo/tests/test_learnability.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.make_learnable_hdf5


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from clibd_tpu.config.schema import GlobalConfig
    from clibd_tpu.engine.train import Trainer
    from clibd_tpu.parallel.mesh import create_mesh

    make_learnable_hdf5 = load_fixture_builder()
    tmp = tempfile.mkdtemp(prefix="rehearse_")
    path = make_learnable_hdf5(f"{tmp}/learnable.hdf5", n_per_split=128, n_species=8)

    g = GlobalConfig()
    g.save_ckpt = False
    cfg = g.model_config  # flagship defaults (ViT-B/16 + BarcodeBERT, LoRA r=4)
    cfg.batch_size = batch
    cfg.epochs = epochs
    cfg.evaluation_period = 10_000  # eval manually before/after
    cfg.language.enable = False
    cfg.optim.lr_config.lr = 1e-4
    cfg.optim.scale_lr_by_batch = False
    cfg.optim.lr_scheduler = "none"

    from clibd_tpu.engine.evaluate import compute_overall_acc

    trainer = Trainer(g, path, output_dir=f"{tmp}/out", mesh=create_mesh(jax.devices()[:1]),
                      eval_splits={"keys": "all_keys", "seen": "val_seen", "unseen": "val_unseen"},
                      num_workers=2)
    acc0 = compute_overall_acc(trainer.evaluate())
    print(f"before: overall_acc={acc0:.3f}", flush=True)
    t0 = time.time()
    hist = trainer.fit()
    acc1 = compute_overall_acc(trainer.evaluate())
    print(f"loss: {hist['loss'][0]:.4f} -> {hist['loss'][-1]:.4f} over {epochs} epochs "
          f"({time.time()-t0:.0f}s)", flush=True)
    print(f"after: overall_acc={acc1:.3f}  (before {acc0:.3f})", flush=True)
    trainer.close()


if __name__ == "__main__":
    main()
