"""Headline benchmark: image+DNA embedding extraction throughput per chip.

Mirrors the reference's hot path (scripts/inference_and_eval.py →
epoch/inference_epoch.py:43-111: ViT-B/16 + BarcodeBERT forward, L2
normalize) on the flagship full-size model, bf16, batch 256, on one real TPU
chip.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/s/chip", "vs_baseline": N}

Baseline: the reference publishes no machine-readable numbers
(BASELINE.md:3-7).  A100_REF_SAMPLES_PER_S estimates the A100 PyTorch eager
reference for the same two-encoder extraction (ViT-B/16 ≈ 35 GFLOP/img +
BarcodeBERT(133 tok) ≈ 22 GFLOP/sample at typical eager-mode utilization,
batch 500, bf16 autocast) ≈ 1000 samples/s.  The v5e-8 "≥10×" north star
(BASELINE.json) therefore needs ≥1250 samples/s/chip.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # repo-root import safety

A100_REF_SAMPLES_PER_S = 1000.0
# The A100 figure is an ESTIMATE (point 1000, honest band 700–1400 — the
# torch-CPU FLOP anchor + eager-utilization bounds in BASELINE.md); the JSON
# carries the band so the single vs_baseline number isn't read as exact.
A100_REF_BAND = (700.0, 1400.0)
BATCH = 256
WARMUP = 3
ITERS = 10
PASSES = 3  # take the best pass — the tunneled chip shows ±2% run-to-run noise


def main() -> None:
    import jax
    import jax.numpy as jnp

    from clibd_tpu.utils.compile_cache import maybe_enable_compile_cache

    # default to a repo-local persistent cache: the ~130 s flagship compile
    # drops to ~7 s on repeat runs (docs/PERF.md), shrinking the window a
    # tunnel hiccup can hit.  Steady-state throughput (the metric) is
    # unaffected — timing starts after warmup.  CLIBD_COMPILE_CACHE overrides.
    maybe_enable_compile_cache(os.environ.get(
        "CLIBD_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".xla_cache")))

    from clibd_tpu.config.schema import ExperimentConfig
    from clibd_tpu.models import init_clibd_params
    from clibd_tpu.models.clibd import clibd_apply

    cfg = ExperimentConfig()  # flagship ViT-B/16 + BarcodeBERT, 768-d
    cfg.language.enable = False  # headline metric is image+DNA extraction
    # The reference's final released recipes are FULL fine-tune
    # (disable_lora: true — for_bioscan_1m/final_experiments/
    # image_dna_text_seed_42.yaml:1-41), so the extraction model carries no
    # LoRA adapters.
    cfg.disable_lora = True
    params = init_clibd_params(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def encode(params, image, dna):
        out = clibd_apply(params, cfg, image_input=image, dna_input=dna)
        return out["image"], out["dna"]

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.random((BATCH, 224, 224, 3), dtype=np.float32))
    dna = jnp.asarray(rng.integers(0, 1027, (BATCH, 133)).astype(np.int32))

    # NOTE: block_until_ready is a no-op on the tunneled 'axon' platform —
    # force a host fetch to get a true device-complete timestamp.
    for _ in range(WARMUP):
        o = encode(params, image, dna)
    np.asarray(o[0])

    best_dt = float("inf")
    for _ in range(PASSES):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            o = encode(params, image, dna)
        np.asarray(o[0])
        np.asarray(o[1])
        best_dt = min(best_dt, time.perf_counter() - t0)

    n_chips = 1  # bench runs on the one tunneled chip
    samples_per_s = BATCH * ITERS / best_dt / n_chips
    print(
        json.dumps(
            {
                "metric": "image+DNA embeddings/sec/chip",
                "value": round(samples_per_s, 2),
                "unit": "samples/s/chip",
                "vs_baseline": round(samples_per_s / A100_REF_SAMPLES_PER_S, 3),
                "vs_baseline_band": [
                    round(samples_per_s / A100_REF_BAND[1], 3),
                    round(samples_per_s / A100_REF_BAND[0], 3),
                ],
            }
        )
    )


def _watchdog(seconds: float) -> None:
    """Fail loudly and boundedly if the tunneled chip is unreachable
    (observed 2026-08-17 evening: jax.devices() hangs indefinitely during a
    tunnel outage) — a hung bench is worse than an honest error line."""
    import threading

    def fire():
        print(json.dumps({
            "metric": "image+DNA embeddings/sec/chip",
            "value": 0.0,
            "unit": "samples/s/chip",
            "vs_baseline": 0.0,
            "error": f"TPU unreachable: no result within {int(seconds)}s "
                     "(tunnel outage — see BENCH history for real values)",
        }), flush=True)
        os._exit(2)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()


def _supervised() -> int:
    """Run the measurement in a child process with a bounded per-attempt
    timeout and ONE retry.  The axon tunnel can wedge transiently (observed
    2026-08-21: a bench attempt hung >15 min, while a probe a few minutes
    later measured a healthy roundtrip) — a retry after a cooldown turns
    that flake into a real number instead of the watchdog's value-0 line."""
    import subprocess

    attempt_s = float(os.environ.get("CLIBD_BENCH_ATTEMPT_S", 700))
    env = dict(os.environ, CLIBD_BENCH_CHILD="1")
    last_out = ""
    for attempt in (1, 2):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, timeout=attempt_s, capture_output=True, text=True)
            last_out = r.stdout
            for line in r.stdout.splitlines():
                if line.startswith("{") and '"metric"' in line and '"error"' not in line:
                    print(line, flush=True)
                    return 0
        except subprocess.TimeoutExpired:
            last_out = f"attempt {attempt} timed out after {int(attempt_s)}s"
        if attempt == 1:
            time.sleep(30)  # tunnel-recovery cooldown
    print(json.dumps({
        "metric": "image+DNA embeddings/sec/chip",
        "value": 0.0,
        "unit": "samples/s/chip",
        "vs_baseline": 0.0,
        "error": "TPU unreachable in 2 bounded attempts (tunnel outage — "
                 "see BENCH history for real values): " + last_out[-200:],
    }), flush=True)
    return 2


if __name__ == "__main__":
    if os.environ.get("CLIBD_BENCH_CHILD") == "1":
        _watchdog(float(os.environ.get("CLIBD_BENCH_TIMEOUT_S", 1500)))
        main()
    else:
        sys.exit(_supervised())
