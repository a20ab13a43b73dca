"""Trace-backed decomposition of the flagship training step.

Captures a `jax.profiler` device trace of the batch-500 tri-modal
full-fine-tune train step (the reference's released recipe —
for_bioscan_1m/final_experiments/image_dna_text_seed_42.yaml; loop at
scripts/train_cl.py:145-369) and aggregates the XLA-op timeline with the
same analyzer as tools/prof_extract.py.  Use it to see where the step's
time goes: GEMM fusions, Pallas flash fwd/bwd calls, remat recompute,
optimizer update fusions, augmentation, and any copy traffic.

Usage: python tools/prof_train.py [trace_dir] [--batch N] [--policy P]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.prof_extract import analyze  # noqa: E402  (shared op-timeline analyzer)
import glob  # noqa: E402


def capture(trace_dir: str, batch: int, policy: str | None) -> float:
    import jax
    import jax.numpy as jnp
    from clibd_tpu.utils.compile_cache import maybe_enable_compile_cache
    from clibd_tpu.config.schema import ExperimentConfig
    from clibd_tpu.engine import train as train_mod
    from clibd_tpu.engine.schedules import build_schedule
    from clibd_tpu.models import init_clibd_params

    maybe_enable_compile_cache()
    cfg = ExperimentConfig()
    cfg.batch_size = batch
    cfg.language.enable = True
    cfg.disable_lora = True
    cfg.remat = True
    if policy == "off":
        cfg.remat = False
    elif policy is not None:
        cfg.remat_policy = policy
    params = init_clibd_params(jax.random.PRNGKey(0), cfg)
    schedule = build_schedule(cfg.optim, total_steps=1000, batch_size=batch)
    optimizer = train_mod.build_optimizer(cfg, params, schedule)
    opt_state = optimizer.init(params)
    step = train_mod.make_train_step(cfg, optimizer, donate=True)

    rng = np.random.default_rng(0)
    batch_data = {
        "image": rng.random((batch, 224, 224, 3), dtype=np.float32),
        "dna": rng.integers(0, 1027, (batch, 133)).astype(np.int32),
        "label": np.arange(batch, dtype=np.int32),
        "language": {
            "input_ids": rng.integers(0, 30522, (batch, 20)).astype(np.int32),
            "token_type_ids": np.zeros((batch, 20), np.int32),
            "attention_mask": np.ones((batch, 20), np.int32),
        },
    }
    batch_data = jax.tree.map(jnp.asarray, batch_data)
    key = jax.random.PRNGKey(7)

    for _ in range(3):  # warm + compile outside the trace
        params, opt_state, loss = step(params, opt_state, batch_data, key)
    np.asarray(loss)
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            params, opt_state, loss = step(params, opt_state, batch_data, key)
        np.asarray(loss)
    return (time.perf_counter() - t0) / 3


def main() -> None:
    trace_dir = "/tmp/jaxtrace_train"
    batch, policy = 500, None
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--batch":
            batch = int(args[i + 1]); i += 2
        elif args[i] == "--policy":
            policy = args[i + 1]; i += 2
        else:
            trace_dir = args[i]; i += 1
    if not glob.glob(os.path.join(trace_dir, "plugins/profile/*/")):
        t0 = time.time()
        wall = capture(trace_dir, batch, policy)
        print(f"trace captured in {time.time()-t0:.0f} s -> {trace_dir}  "
              f"(host wall {wall*1e3:.0f} ms/step incl. tunnel)")
    # train FLOPs ≈ 3× the 57 GFLOP/sample forward (fwd + 2× bwd) + remat
    # recompute; report MFU against the 3× floor
    import tools.prof_extract as pe
    pe.BATCH = batch
    pe.FLOP_PER_SAMPLE = 3 * 57e9
    analyze(trace_dir)


if __name__ == "__main__":
    main()
