"""On-chip extraction soak at scale (VERDICT r4 #1 + #7).

Drives the north-star deliverable — test-split extraction →
`extracted_feature_from_test_split.hdf5` — end-to-end through the REAL
`clibd eval` CLI over a 50k-record synthetic dataset of unique 256×256
JPEGs (the BIOSCAN image shape): host HDF5 loader + native JPEG decode +
eval transform + tri-encoder encode on the chip + reference-schema cache
write + the full kNN grid/metrics/report tail.  Mirrors what
tools/soak_train.py did for training in round 4.

Reference hot path being replaced:
  scripts/inference_and_eval.py:552-667 (cache build + eval)
  bioscanclip/epoch/inference_epoch.py:43-111 (get_feature_and_label)

Legs:
  build           /tmp/soakx.hdf5 — all_keys 25k, test_seen 15k, test_unseen 10k
  run             `clibd eval` end-to-end (CLIBD_EVAL_TIMING=1), then re-measure
                  the device-only encode step in-process → sustained samples/s,
                  device-idle fraction, per-phase wall table
  verify          schema round-trip (reload the cache, shape/row/semantic
                  asserts) + a second `clibd eval` via the load_inference
                  cached path must produce the identical acc_dict
  stream          `clibd extract --stream` (AppendableEmbeddingWriter) over
                  all_keys; --kill-at N SIGKILLs mid-stream (torn append),
                  --resume continues
  stream-compare  killed+resumed streaming output must be bit-identical to an
                  uninterrupted one-shot streaming run
"""
import argparse
import json
import os
import re
import signal
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DATA = "/tmp/soakx.hdf5"
ROOT = "/tmp/soakx_out"
LOG = "/tmp/soakx_eval.log"
SPLITS = (("all_keys", 25_000), ("test_seen", 15_000), ("test_unseen", 10_000))
N_TOTAL = sum(n for _, n in SPLITS)
STREAM_ONESHOT = "/tmp/soakx_stream_oneshot.hdf5"
STREAM_KILLED = "/tmp/soakx_stream_killed.hdf5"


def build():
    from tools.soak_train import build as build_synth

    build_synth(path=DATA, splits=SPLITS)


class _Tee:
    """Mirror stdout to a log file so the PhaseTimer report and the
    extract_split progress rates can be parsed afterwards."""

    def __init__(self, path):
        self._f = open(path, "w")
        self._out = sys.stdout

    def write(self, s):
        self._out.write(s)
        self._f.write(s)
        self._f.flush()  # progress lines visible to outside watchers

    def flush(self):
        self._out.flush()
        self._f.flush()


def _overrides():
    return [
        f"project_root_path={ROOT}",
        "load_inference=false",
        "save_inference=true",
        "model_config.language.enable=true",
    ]


def run():
    os.environ["CLIBD_EVAL_TIMING"] = "1"
    os.makedirs(ROOT, exist_ok=True)
    tee = _Tee(LOG)
    old = sys.stdout
    sys.stdout = tee
    try:
        from clibd_tpu.cli import main as cli_main

        t0 = time.time()
        rc = cli_main(["eval", "--hdf5", DATA] + _overrides())
        wall = time.time() - t0
    finally:
        sys.stdout = old
        tee.flush()
    assert rc == 0, f"clibd eval rc={rc}"

    # parse the per-split sustained rates and the PhaseTimer extraction wall
    text = open(LOG).read()
    rates = [float(r) for r in re.findall(r"encoded \d+ samples \(([\d.]+)/s\)", text)]
    m = re.search(r"extraction \(decode\+encode\)\s+([\d.]+)s", text)
    extract_wall = float(m.group(1)) if m else None

    # device-only encode time on a resident batch, same step the CLI ran
    import jax

    from clibd_tpu.cli.common import _load_cfg, _resolve_params
    from clibd_tpu.data.pipeline import BatchSpec, BioscanLoader
    from clibd_tpu.engine.extract import make_encode_step
    from clibd_tpu.parallel.mesh import create_mesh, replicate, shard_batch

    class _A:
        experiment = None
        global_config = None
        hdf5 = DATA
        unimodel = None

    cfg = _load_cfg(_A(), _overrides())
    mc = cfg.model_config
    params = _resolve_params(cfg)
    spec = BatchSpec.eval_spec(mc)
    loader = BioscanLoader(DATA, "all_keys", spec, num_workers=cfg.pipeline.num_workers,
                           use_native=cfg.pipeline.use_native_decoder)
    batch = next(iter(loader.batches(epoch=0, shuffle=False)))
    loader.close()
    mesh = create_mesh(jax.devices()[:1])
    step = make_encode_step(mc, mesh=mesh)
    rparams = replicate(mesh, params)
    model_batch = shard_batch(mesh, {k: batch[k] for k in ("image", "dna", "language")
                                     if k in batch})
    out = step(rparams, model_batch)
    np.asarray(out["image"])  # force
    dev = 1e9
    for _ in range(5):
        t = time.perf_counter()
        out = step(rparams, model_batch)
        np.asarray(out["image"])
        dev = min(dev, time.perf_counter() - t)
    bs = mc.batch_size
    n_batches = sum(-(-n // bs) for _, n in SPLITS)
    device_busy = dev * n_batches

    summary = {
        "records": N_TOTAL,
        "batch_size": bs,
        "endtoend_wall_s": round(wall, 1),
        "extraction_wall_s": extract_wall,
        "sustained_samples_per_s": (round(N_TOTAL / extract_wall, 1)
                                    if extract_wall else None),
        "per_split_final_rates": rates,
        "device_ms_per_batch": round(dev * 1e3, 1),
        "device_busy_s": round(device_busy, 1),
        "device_idle_frac": (round(max(0.0, 1 - device_busy / extract_wall), 3)
                             if extract_wall else None),
    }
    print(json.dumps(summary))
    with open("/tmp/soakx_summary.json", "w") as f:
        json.dump(summary, f)


def verify():
    import h5py

    folder = None
    for dirpath, _dirs, files in os.walk(os.path.join(ROOT, "extracted_embedding")):
        if "extracted_feature_from_test_split.hdf5" in files:
            folder = dirpath
    assert folder, "run the `run` leg first"
    feat = os.path.join(folder, "extracted_feature_from_test_split.hdf5")
    labels = os.path.join(folder, "labels_test.json")
    ids = os.path.join(folder, "processed_id_test.json")

    # 1. raw schema: reference group/dataset layout at scale
    with h5py.File(feat) as f:
        assert set(f.keys()) == {"seen", "unseen", "key"}
        for g, n in (("seen", 15_000), ("unseen", 10_000), ("key", 25_000)):
            for t in ("encoded_image_feature", "encoded_dna_feature",
                      "encoded_language_feature"):
                assert f[g][t].shape == (n, 768), (g, t, f[g][t].shape)
            assert f[g]["averaged_feature"].shape == (n, 768)
            assert f[g]["concatenated_feature"].shape == (n, 1536)
        assert f["key"]["all_key_features"].shape == (75_000, 768)

    # 2. loader round-trip: the exact load_inference path
    from clibd_tpu.engine.extract import load_extracted_features

    seen, unseen, keys = load_extracted_features(feat, labels, ids)
    assert len(seen["label_list"]) == 15_000
    assert len(unseen["processed_id_list"]) == 10_000
    assert len(keys["all_key_features_label"]) == 75_000
    for d in (seen, unseen, keys):
        norms = np.linalg.norm(d["encoded_image_feature"], axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    np.testing.assert_allclose(
        keys["all_key_features"][:25_000], keys["encoded_image_feature"], atol=0)

    # 3. cached-path equality: a second `clibd eval` that LOADS the cache
    # must produce the identical accuracy tables
    acc_path = os.path.join(folder, "acc_dict_test.json")
    first = json.load(open(acc_path))
    import shutil

    shutil.copy(acc_path, acc_path + ".first")
    from clibd_tpu.cli import main as cli_main

    rc = cli_main(["eval", "--hdf5", DATA] + [
        f"project_root_path={ROOT}", "load_inference=true", "save_inference=true",
        "model_config.language.enable=true",
        # skip the already-verified report tail on the reload leg
        "inference_and_eval_setting.plot_embeddings=false",
    ])
    assert rc == 0
    second = json.load(open(acc_path))
    assert first == second, "cached-path acc_dict differs from extraction-path"
    print("VERIFY OK: schema + round-trip + cached-path acc equality "
          f"({feat}, {os.path.getsize(feat)/1e9:.2f} GB)")


def stream(kill_at: int = 0, resume: bool = False, out: str = STREAM_KILLED):
    """`clibd extract --stream` over all_keys with an optional hard kill."""
    from clibd_tpu.cli import main as cli_main

    if kill_at:
        # SIGKILL from a watcher thread once the output file passes kill_at
        # records — no atexit, no finally, a real torn append
        import h5py

        def watch():
            while True:
                time.sleep(0.5)
                try:
                    with h5py.File(out) as f:
                        if "file_name" in f and f["file_name"].shape[0] >= kill_at:
                            print(f"\nSIGKILL at >={kill_at} records", flush=True)
                            os.kill(os.getpid(), signal.SIGKILL)
                except Exception:
                    continue

        threading.Thread(target=watch, daemon=True).start()
    t0 = time.time()
    args = ["extract", "--hdf5", DATA, "--split", "all_keys", "--out", out,
            "--stream", "model_config.language.enable=true",
            f"project_root_path={ROOT}"]
    if resume:
        args.append("--resume")
    rc = cli_main(args)
    print(f"stream rc={rc} wall={time.time()-t0:.1f}s → {out}")


def stream_compare():
    import h5py

    with h5py.File(STREAM_ONESHOT) as fa, h5py.File(STREAM_KILLED) as fb:
        assert set(fa.keys()) == set(fb.keys()), (set(fa.keys()), set(fb.keys()))
        for k in fa.keys():
            a, b = fa[k][:], fb[k][:]
            assert a.shape == b.shape, (k, a.shape, b.shape)
            if a.dtype.kind == "f":
                np.testing.assert_array_equal(a, b)
            else:
                assert (a == b).all(), k
    print(f"STREAM RESUME BIT-IDENTICAL: OK ({STREAM_ONESHOT} == {STREAM_KILLED})")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["build", "run", "verify", "stream",
                                     "stream-compare"])
    ap.add_argument("--kill-at", type=int, default=0)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--out", default=None)
    a = ap.parse_args()
    if a.mode == "build":
        build()
    elif a.mode == "run":
        run()
    elif a.mode == "verify":
        verify()
    elif a.mode == "stream":
        stream(kill_at=a.kill_at, resume=a.resume,
               out=a.out or STREAM_KILLED)
    else:
        stream_compare()
