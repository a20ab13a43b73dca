"""Sustained on-chip training soak at realistic scale (VERDICT r3 #4).

Drives the flagship batch-500 tri-modal full-fine-tune recipe through the
real Trainer — host HDF5 loader + native JPEG decode + prefetch + uint8
transport + remat[attn] train step — on a 50k-record synthetic dataset of
unique 256×256 JPEGs (the BIOSCAN-1M image shape, DATA.md), for one full
epoch (100 steps).  Reports steady-state steps/s, the device-only step
time re-measured in-process, the input-bound fraction, and the loss curve.
A hard-kill leg (SIGKILL from inside the step callback — no atexit, no
finally) plus --resume validates bit-exact mid-epoch recovery through the
step-cadence checkpoints (checkpoint_every_steps).

Replaces the reference's epoch loop at scripts/train_cl.py:145-369 as the
thing being soaked.

Usage:
  python tools/soak_train.py build                      # /tmp/soak50k.hdf5
  python tools/soak_train.py run --tag base             # full epoch
  python tools/soak_train.py run --tag killed --kill-at 55
  python tools/soak_train.py run --tag resumed --resume # continue killed
  python tools/soak_train.py compare                    # bit-exact check
"""
import argparse
import io
import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DATA = "/tmp/soak50k.hdf5"
OUT = "/tmp/soak_out"
N_TRAIN = 50_000
BATCH = 500


def build(path: str = DATA, splits=None, n_species: int = 200):
    """Synthesize a DATA.md-schema HDF5 of unique 256×256 JPEGs at scale.

    splits: ((name, n_records), ...) — defaults to the training-soak layout;
    tools/soak_extract.py reuses this with eval-sized test/key splits."""
    import h5py
    from PIL import Image

    rng = np.random.default_rng(0)
    colors = rng.integers(40, 220, size=(n_species, 3))
    motifs = ["".join(rng.choice(list("ACGT"), size=60)) for _ in range(n_species)]
    t0 = time.time()
    if splits is None:
        splits = (("no_split_and_seen_train", N_TRAIN), ("val_seen", 256),
                  ("val_unseen", 256), ("all_keys", 512))
    total = sum(n for _, n in splits)
    with h5py.File(path, "w") as f:
        for split, n in splits:
            g = f.create_group(split)
            img_ds = None
            maxlen = 0
            species_all = rng.integers(0, n_species, n)
            mask = np.zeros(n, np.int64)
            chunk = 1000
            for lo in range(0, n, chunk):
                hi = min(lo + chunk, n)
                jpegs = []
                for s in species_all[lo:hi]:
                    arr = np.clip(colors[s][None, None, :]
                                  + rng.normal(0, 18, (256, 256, 3)), 0, 255).astype(np.uint8)
                    buf = io.BytesIO()
                    Image.fromarray(arr).save(buf, format="JPEG", quality=90)
                    jpegs.append(buf.getvalue())
                m = max(len(j) for j in jpegs)
                if img_ds is None:
                    img_ds = g.create_dataset(
                        "image", shape=(n, int(m * 1.5)), maxshape=(n, None),
                        dtype=np.uint8, chunks=(min(64, n), int(m * 1.5)))
                if m > img_ds.shape[1]:
                    img_ds.resize((n, m))
                maxlen = max(maxlen, m)
                block = np.zeros((hi - lo, img_ds.shape[1]), np.uint8)
                for i, j in enumerate(jpegs):
                    block[i, : len(j)] = np.frombuffer(j, np.uint8)
                    mask[lo + i] = len(j)
                img_ds[lo:hi] = block
                if lo % 10_000 == 0:
                    print(f"{split}: {lo}/{n} ({time.time()-t0:.0f}s)", flush=True)
            g.create_dataset("image_mask", data=mask)
            barcodes = [motifs[s] * 10 + "".join(rng.choice(list("ACGT"), 10))
                        for s in species_all]
            g.create_dataset("barcode", data=np.array([b.encode() for b in barcodes]))
            for level, fmt in (("order", "o{}"), ("family", "f{}"),
                               ("genus", "g{}"), ("species", "sp{}")):
                g.create_dataset(level, data=np.array(
                    [fmt.format(s).encode() for s in species_all]))
            ids = np.array([f"{split}_{i}".encode() for i in range(n)])
            g.create_dataset("sampleid", data=ids)
            g.create_dataset("processid", data=ids)
            g.create_dataset("image_file", data=ids)
            toks = np.ones((n, 20), np.int64)
            g.create_dataset("language_tokens_input_ids", data=toks)
            g.create_dataset("language_tokens_token_type_ids", data=np.zeros_like(toks))
            g.create_dataset("language_tokens_attention_mask", data=toks)
    sz = os.path.getsize(path) / 1e9
    print(f"built {path}: {total} records, {sz:.2f} GB, {time.time()-t0:.0f}s")


def run(tag: str, kill_at: int = 0, resume: bool = False):
    import jax

    from clibd_tpu.config.schema import GlobalConfig
    from clibd_tpu.engine.train import Trainer
    from clibd_tpu.parallel.mesh import create_mesh

    g = GlobalConfig()
    g.save_ckpt = True
    cfg = g.model_config  # flagship dims: ViT-B/16 + BarcodeBERT + BERT-small
    cfg.batch_size = BATCH
    cfg.epochs = 1
    cfg.language.enable = True
    cfg.disable_lora = True  # full fine-tune (the batch-500 released recipe)
    cfg.evaluation_period = 10_000
    cfg.eval_skip_epoch = 10_000
    cfg.checkpoint_every_steps = 25

    log_path = f"/tmp/soak_{tag}.jsonl"
    logf = open(log_path, "a" if resume else "w")
    times = []

    def log(d):
        if "loss" in d:
            d = dict(d, t=time.time())
            times.append(d["t"])
            logf.write(json.dumps(d) + "\n")
            logf.flush()
            print(f"step {d['step']:3d} loss {d['loss']:.4f}", flush=True)
            if kill_at and d["step"] >= kill_at:
                print(f"SIGKILL at step {d['step']}", flush=True)
                os.kill(os.getpid(), signal.SIGKILL)

    trainer = Trainer(g, DATA, output_dir=OUT, mesh=create_mesh(jax.devices()[:1]),
                      eval_splits={"keys": "all_keys", "seen": "val_seen",
                                   "unseen": "val_unseen"},
                      log_fn=log)
    start_epoch = 0
    if resume:
        start_epoch = trainer.resume(os.path.join(OUT, "last"))
        print(f"resumed: global_step={trainer.global_step}, "
              f"start_epoch={start_epoch}, start_batch={trainer._resume_start_batch}",
              flush=True)
    t0 = time.time()
    hist = trainer.fit(start_epoch=start_epoch)
    wall = time.time() - t0

    # steady-state wall per step (drop first 3 steps: compile + warm caches)
    if len(times) > 6:
        steady = np.diff(np.asarray(times))[3:]
        wall_step = float(np.median(steady))
    else:
        wall_step = wall / max(len(times), 1)

    # device-only step time, re-measured in-process on a resident batch
    batch = next(iter(trainer.train_loader.batches(epoch=0)))
    model_batch = {k: batch[k] for k in ("image", "dna", "language", "label")
                   if k in batch}
    from clibd_tpu.parallel.mesh import shard_batch
    sb = shard_batch(trainer.mesh, model_batch)
    rng = jax.random.PRNGKey(0)
    p, o = trainer.params, trainer.opt_state
    p, o, loss = trainer.step_fn(p, o, sb, rng)
    np.asarray(loss)
    dev = 1e9
    for _ in range(4):
        t = time.perf_counter()
        p, o, loss = trainer.step_fn(p, o, sb, rng)
        np.asarray(loss)
        dev = min(dev, time.perf_counter() - t)
    trainer.close()

    print(json.dumps({
        "tag": tag, "steps": len(times), "wall_s": round(wall, 1),
        "steady_wall_ms_per_step": round(wall_step * 1e3, 1),
        "device_ms_per_step": round(dev * 1e3, 1),
        "input_bound_frac": round(max(0.0, 1 - dev / wall_step), 3),
        "samples_per_s_endtoend": round(BATCH / wall_step, 1),
        "loss_epoch_mean": hist["loss"] and round(hist["loss"][-1], 4),
    }), flush=True)


def compare():
    def load(tag):
        out = {}
        with open(f"/tmp/soak_{tag}.jsonl") as f:
            for line in f:
                d = json.loads(line)
                out[d["step"]] = d["loss"]
        return out

    base, killed, resumed = load("base"), load("killed"), load("resumed")
    overlap = sorted(set(resumed) & set(base))
    assert overlap, "no overlapping steps"
    mism = [s for s in overlap if base[s] != resumed[s]]
    print(f"killed run reached step {max(killed)}; resumed covers "
          f"{min(resumed)}..{max(resumed)}; overlap with base: {len(overlap)} steps; "
          f"mismatches: {len(mism)} {mism[:5]}")
    # bf16 step on identical state/batch/key is deterministic on one chip
    assert not mism, "resume is NOT bit-exact"
    print("RESUME BIT-EXACT: OK")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["build", "run", "compare"])
    ap.add_argument("--tag", default="base")
    ap.add_argument("--kill-at", type=int, default=0)
    ap.add_argument("--resume", action="store_true")
    a = ap.parse_args()
    if a.mode == "build":
        build()
    elif a.mode == "run":
        run(a.tag, kill_at=a.kill_at, resume=a.resume)
    else:
        compare()
