"""Trace-backed roofline decomposition of the flagship extraction step.

Captures a `jax.profiler` device trace of the batch-256 image+DNA encode
(the bench.py workload — mirrors the reference hot path
scripts/inference_and_eval.py -> epoch/inference_epoch.py:43-111), then
aggregates the XLA-op timeline into a per-execution table: module wall
time, time inside the two `lax.scan` tower loops, and the op-category
breakdown (GEMM fusions, Pallas flash calls, layernorm/reduce fusions,
pad/slice copy traffic, ...).  This is the evidence behind docs/PERF.md's
"Round-4 extraction profile" section.

Usage: python tools/prof_extract.py [trace_dir]
"""
import collections
import glob
import gzip
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 256
FLOP_PER_SAMPLE = 57e9   # ViT-B/16 ~35 GFLOP + BarcodeBERT(133) ~22 GFLOP
PEAK_TFLOPS = 197e12     # v5e bf16


def capture(trace_dir: str) -> None:
    import jax
    import jax.numpy as jnp
    from clibd_tpu.utils.compile_cache import maybe_enable_compile_cache
    from clibd_tpu.config.schema import ExperimentConfig
    from clibd_tpu.models import init_clibd_params
    from clibd_tpu.models.clibd import clibd_apply

    maybe_enable_compile_cache()
    cfg = ExperimentConfig()
    cfg.language.enable = False
    cfg.disable_lora = True
    params = init_clibd_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.random((BATCH, 224, 224, 3), dtype=np.float32))
    dna = jnp.asarray(rng.integers(0, 1027, (BATCH, 133)).astype(np.int32))

    @jax.jit
    def encode(params, image, dna):
        out = clibd_apply(params, cfg, image_input=image, dna_input=dna)
        return out["image"], out["dna"]

    for _ in range(3):  # warm + compile outside the trace
        o = encode(params, image, dna)
    jax.tree.map(np.asarray, o)

    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            o = encode(params, image, dna)
        jax.tree.map(np.asarray, o)


def analyze(trace_dir: str) -> None:
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/", "*.trace.json.gz")))
    if not paths:
        raise SystemExit(f"no trace under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]

    tids = {}
    device_pid = None
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name" \
                and "TPU" in e["args"]["name"]:
            device_pid = e["pid"]
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name" \
                and e["pid"] == device_pid:
            tids[e["args"]["name"]] = e["tid"]

    mods = [e for e in ev if e.get("ph") == "X" and e["pid"] == device_pid
            and e.get("tid") == tids.get("XLA Modules")]
    n_exec = len(mods)
    mod_ms = sum(e["dur"] for e in mods) / 1e3 / max(n_exec, 1)

    agg = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and e["pid"] == device_pid \
                and e.get("tid") == tids.get("XLA Ops"):
            base = re.sub(r"[.\d]+$", "", e["name"])
            agg[base] += e["dur"]
            cnt[base] += 1

    samples_s = BATCH / (mod_ms / 1e3)
    mfu = samples_s * FLOP_PER_SAMPLE / PEAK_TFLOPS
    print(f"executions traced: {n_exec}")
    print(f"module time/exec: {mod_ms:.2f} ms  ->  device-side "
          f"{samples_s:.0f} samples/s  ({100*mfu:.0f}% MFU at "
          f"{FLOP_PER_SAMPLE/1e9:.0f} GFLOP/sample)")
    print(f"{'ms/exec':>9}  {'count/exec':>10}  op category")
    # `while` wraps the scanned tower layers; its children are also on the
    # timeline, so report it separately rather than summing everything.
    for k, v in agg.most_common(18):
        per = v / 1e3 / max(n_exec, 1)
        if per < 0.005:
            break
        tag = "  (outer scan loops — children double-counted below)" \
            if k == "while" else ""
        print(f"{per:9.2f}  {cnt[k]/max(n_exec,1):10.0f}  {k}{tag}")


def main() -> None:
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace_extract"
    if not glob.glob(os.path.join(trace_dir, "plugins/profile/*/")):
        t0 = time.time()
        capture(trace_dir)
        print(f"trace captured in {time.time()-t0:.0f} s -> {trace_dir}")
    analyze(trace_dir)


if __name__ == "__main__":
    main()
