"""Training-step throughput on the real chip (flagship recipe).

Usage: python tools/bench_train.py [batch ...]   (default: 128 500)

batch 128: image+DNA LoRA config (round-1 comparison point).
batch 500: tri-modal full fine-tune with remat — the reference's released
recipe batch (for_bioscan_1m/final_experiments/image_dna_text_seed_42.yaml).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from clibd_tpu.config.schema import ExperimentConfig
from clibd_tpu.engine import train as train_mod
from clibd_tpu.engine.schedules import build_schedule
from clibd_tpu.models import init_clibd_params


def bench(batch: int, tri_modal: bool, lora: bool, remat: bool, iters=8, warmup=2):
    cfg = ExperimentConfig()
    cfg.batch_size = batch
    cfg.language.enable = tri_modal
    cfg.disable_lora = not lora
    cfg.remat = remat
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
    }
    if tri_modal:
        batch_data["language"] = {
            "input_ids": rng.integers(0, 30522, (batch, 20)).astype(np.int32),
            "token_type_ids": np.zeros((batch, 20), np.int32),
            "attention_mask": np.ones((batch, 20), np.int32),
        }
    batch_data = jax.tree.map(jnp.asarray, batch_data)
    key = jax.random.PRNGKey(7)

    for _ in range(warmup):
        params, opt_state, loss = step(params, opt_state, batch_data, key)
    np.asarray(loss)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, loss = step(params, opt_state, batch_data, key)
        np.asarray(loss)
        best = min(best, time.perf_counter() - t0)
    dt = best / iters
    mode = ("tri-modal" if tri_modal else "image+DNA") + (" lora" if lora else " full-ft") + (" remat" if remat else "")
    print(f"train step batch {batch} ({mode}): {dt*1e3:.1f} ms/step  "
          f"{batch/dt:.0f} samples/s/chip  loss={float(loss):.4f}", flush=True)


def main():
    batches = [int(a) for a in sys.argv[1:]] or [128, 500]
    for b in batches:
        if b >= 256:
            bench(b, tri_modal=True, lora=False, remat=True)
        else:
            bench(b, tri_modal=False, lora=True, remat=True)


if __name__ == "__main__":
    main()
