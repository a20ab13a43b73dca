"""Serve soak: live gallery writers + client load against a resident server.

The reference's backend flow appends embeddings to an HDF5 that a consumer
reads (scripts/save_embedding/extract_embedding_for_backend.py); here the
consumer is the resident `clibd serve` process with `--reload-watch`.  This
harness proves the full loop holds under concurrency for all three writer
patterns a production gallery writer can use:

  1. long-lived appender (AppendableEmbeddingWriter + flush) — the
     reference's actual flow,
  2. truncate-in-place rewrite (h5py 'w' on the live path) — the pattern
     that FAILED before gallery reads went locking=False ("unable to
     truncate a file which is already open"),
  3. atomic replace (write tmp + os.replace) — the recommended
     no-cooperation pattern (docs/DEPLOY.md).

While a subprocess writer cycles through those, client threads hammer
/embed and /search over HTTP.  Pass criteria: the writer never errors, no
request returns 5xx, the watcher reloads at least twice, and after the
writer stops the served gallery converges to the final written row count.

Usage:
    python tools/soak_serve.py --cpu --seconds 15          # tiny model
    python tools/soak_serve.py --seconds 60 --clients 8    # real chip

Prints one JSON verdict line; exit 0 iff ok.
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# one python -c program, parameterized by argv:
# soak_writer <path> <dim> <period_s> <duration_s> <n0>
# duration is measured from AFTER the imports — on a busy 1-core host the
# subprocess import of jax+clibd_tpu can outlast a short soak window
_WRITER = r"""
import os, sys, time
import numpy as np
sys.path.insert(0, %(repo)r)
import jax; jax.config.update("jax_platforms", "cpu")
from clibd_tpu.engine.extract import AppendableEmbeddingWriter, save_embedding_export

path, d, period, duration, n0 = (sys.argv[1], int(sys.argv[2]),
                                 float(sys.argv[3]), float(sys.argv[4]),
                                 int(sys.argv[5]))
deadline = time.time() + duration
n = n0 + 1  # every write changes the row count, so served-keys converging
            # to FINAL is unambiguous vs the pre-soak gallery
rng = np.random.default_rng(123)

def rows(k, start):
    f = rng.normal(size=(k, d)).astype(np.float32)
    f /= np.linalg.norm(f, axis=1, keepdims=True)
    labels = [{lv: f"{lv}{start + i}" for lv in
               ("order", "family", "genus", "species")} for i in range(k)]
    return f, labels, [f"r{start + i}.jpg" for i in range(k)]

def full_payload(n):
    f, labels, names = rows(n, 0)
    return {"encoded_image_feature": f, "encoded_dna_feature": f[::-1].copy(),
            "encoded_language_feature": None, "label_list": labels,
            "file_name_list": names}

# phase 1 — the reference's long-lived appender, flushed per batch so the
# watcher sees the file grow while the handle stays open
w = AppendableEmbeddingWriter(path, d, compress=False)
f, labels, names = rows(n, 0)
w.append({"encoded_image_feature": f, "encoded_dna_feature": f[::-1].copy()},
         labels, names)
w.file.flush()
print("WROTE", n, flush=True)
appends = 0
while appends < 3 and time.time() < deadline:
    time.sleep(period)
    f, labels, names = rows(2, n)
    w.append({"encoded_image_feature": f,
              "encoded_dna_feature": f[::-1].copy()}, labels, names)
    w.file.flush()
    n += 2
    appends += 1
    print("WROTE", n, flush=True)
w.close()

# phase 2 — alternate truncate-in-place (locked-reader regression) and
# atomic os.replace until the deadline
i = 0
while time.time() < deadline:
    time.sleep(period)
    i += 1
    n += 1
    if i %% 2:
        save_embedding_export(path, full_payload(n), compress=False)
    else:
        save_embedding_export(path + ".tmp", full_payload(n), compress=False)
        os.replace(path + ".tmp", path)
    print("WROTE", n, flush=True)
print("FINAL", n, flush=True)
"""


def http_json(port: int, path: str, payload=None, timeout: float = 120.0):
    data = json.dumps(payload).encode() if payload is not None else None
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}", data=data)
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="tiny model on CPU")
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--clients", type=int, default=2)
    ap.add_argument("--write-period", type=float, default=1.5)
    ap.add_argument("--watch-interval", type=float, default=0.25)
    ap.add_argument("--settle-seconds", type=float, default=None,
                    help="post-writer convergence budget (default 10 on "
                         "CPU; 180 on the chip, where every reload "
                         "recompiles the search program at the new "
                         "gallery shape)")
    ap.add_argument("--workdir", default=None,
                    help="gallery directory (default: a fresh tempdir)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax  # noqa: F811

    from clibd_tpu.config.schema import (BertConfig, ExperimentConfig,
                                         ViTConfig)
    from clibd_tpu.engine.extract import save_embedding_export
    from clibd_tpu.engine.serve import InferenceService, make_server
    from clibd_tpu.models import init_clibd_params
    from tools.bench_serve import make_jpeg

    cfg = ExperimentConfig()
    if args.cpu:
        cfg.output_dim = 16
        cfg.image.vit = ViTConfig(image_size=64, patch_size=16, hidden_size=32,
                                  num_layers=1, num_heads=4, mlp_dim=64)
        cfg.dna.bert = BertConfig(vocab_size=1027, hidden_size=32,
                                  num_layers=1, num_heads=4,
                                  intermediate_size=64,
                                  max_position_embeddings=140,
                                  with_mlm_head=True)
    image_size = cfg.image.vit.image_size
    d = cfg.output_dim

    import tempfile

    workdir = args.workdir or tempfile.mkdtemp(prefix="clibd_soak_")
    gallery = os.path.join(workdir, "gallery.hdf5")
    rng = np.random.default_rng(0)
    n0 = 6
    feats = rng.normal(size=(n0, d)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    save_embedding_export(gallery, {
        "encoded_image_feature": feats,
        "encoded_dna_feature": feats[::-1].copy(),
        "encoded_language_feature": None,
        "label_list": [{lv: f"{lv}{i}" for lv in
                        ("order", "family", "genus", "species")}
                       for i in range(n0)],
        "file_name_list": [f"f{i}.jpg" for i in range(n0)]}, compress=False)

    params = init_clibd_params(jax.random.PRNGKey(0), cfg)
    svc = InferenceService(params, cfg, keys_path=gallery,
                           window_ms=8.0, max_batch=8, buckets=(1, 2, 4, 8),
                           image_size=image_size,
                           resize_to=round(image_size * 256 / 224))
    svc.pre_warm()
    svc.start_reload_watch(args.watch_interval)
    server = make_server(svc, host="127.0.0.1", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    # PYTHONPATH must be EXTENDED, never replaced (the axon JAX plugin rides
    # on it in this environment)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    writer = subprocess.Popen(
        [sys.executable, "-c", _WRITER % {"repo": REPO}, gallery, str(d),
         str(args.write_period), str(args.seconds), str(n0)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)

    # collect BOTH writer pipes as they arrive — stdout drives the client
    # clock (starts at the writer's FIRST write, not at spawn: subprocess
    # imports are slow here) and an undrained stderr could fill its pipe
    # buffer and deadlock the writer before its deadline
    writer_lines: list = []
    err_lines: list = []
    first_write = threading.Event()

    def pump_out() -> None:
        for line in writer.stdout:
            writer_lines.append(line)
            if line.startswith("WROTE"):
                first_write.set()
        first_write.set()  # EOF: never leave the parent waiting

    def pump_err() -> None:
        for line in writer.stderr:
            err_lines.append(line)

    pumps = [threading.Thread(target=pump_out, daemon=True),
             threading.Thread(target=pump_err, daemon=True)]
    for t in pumps:
        t.start()
    if not first_write.wait(timeout=300):
        raise RuntimeError("soak writer produced no output in 300s")
    deadline = time.time() + args.seconds

    jpegs = [make_jpeg(rng, image_size, image_size) for _ in range(4)]
    barcodes = ["".join(rng.choice(list("ACGT"), size=120)) for _ in range(4)]
    counts = {"ok": 0, "4xx": 0, "5xx": 0, "neterr": 0}
    lock = threading.Lock()

    def client(idx: int) -> None:
        i = 0
        while time.time() < deadline:
            i += 1
            b64 = base64.b64encode(jpegs[(idx + i) % 4]).decode()
            try:
                if i % 2:
                    status, _ = http_json(port, "/embed", {
                        "image_b64": b64, "dna": barcodes[(idx + i) % 4]})
                else:
                    status, _ = http_json(port, "/search",
                                          {"image_b64": b64, "k": 1})
                key = "ok" if status < 400 else "4xx"
            except urllib.error.HTTPError as e:
                key = "5xx" if e.code >= 500 else "4xx"
            except Exception:
                key = "neterr"
            with lock:
                counts[key] += 1

    with ThreadPoolExecutor(max_workers=args.clients) as pool:
        list(pool.map(client, range(args.clients)))

    writer_hung = False
    try:
        writer.wait(timeout=120)
    except subprocess.TimeoutExpired:
        writer_hung = True  # still produce a verdict (ok=false) below
        writer.kill()
        writer.wait()
    # the pump threads may lag the process exit — join before scanning,
    # or a timely run could spuriously miss its FINAL line
    for t in pumps:
        t.join(timeout=30)
    werr = "".join(err_lines)
    final = None
    for line in writer_lines:
        if line.startswith("FINAL"):
            final = int(line.split()[1])
    # let the watcher see the final write settle (stability needs 2 polls;
    # on the chip each reload also pays a search-program compile)
    settle = (args.settle_seconds if args.settle_seconds is not None
              else (10.0 if args.cpu else 180.0))
    settle_by = time.time() + max(20 * args.watch_interval, settle)
    health = {}
    while time.time() < settle_by:
        time.sleep(args.watch_interval)
        _, health = http_json(port, "/healthz")
        if (final is not None and health.get("keys") == final
                and health.get("reloads", 0) >= 2):
            break

    server.shutdown()
    svc.close()

    ok = (not writer_hung and writer.returncode == 0 and final is not None
          and counts["5xx"] == 0 and counts["neterr"] == 0
          and counts["ok"] > 0
          and health.get("keys") == final
          and health.get("reloads", 0) >= 2)
    print(json.dumps({
        "ok": ok, "seconds": args.seconds, "clients": args.clients,
        "requests": counts, "reloads": health.get("reloads"),
        "final_keys_written": final, "final_keys_served": health.get("keys"),
        "writer_rc": writer.returncode, "writer_hung": writer_hung,
        "writer_err_tail": werr.strip().splitlines()[-3:],
        "stats": svc.stats.snapshot(),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
