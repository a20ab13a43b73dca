"""Training-step throughput on the real chip (flagship recipe).

Usage: python tools/bench_train.py [batch ...] [--policy P ...]
       (default: 128 500; default policy: the config default)

batch 128: image+DNA LoRA config (round-1 comparison point).
batch 500: tri-modal full fine-tune with remat — the reference's released
recipe batch (for_bioscan_1m/final_experiments/image_dna_text_seed_42.yaml).
--policy: remat policies to sweep per batch — "none" (blanket recompute),
"off" (no remat), or a save-policy spec ("attn", "attn+mlp", "dots", ...;
models/layers.remat_policy).
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


def bench(batch: int, tri_modal: bool, lora: bool, remat: bool, iters=8, warmup=2,
          policy: str | None = None, accum: int = 1):
    cfg = ExperimentConfig()
    cfg.batch_size = batch
    cfg.language.enable = tri_modal
    cfg.disable_lora = not lora
    cfg.remat = remat
    if policy == "off":
        cfg.remat = False
    elif policy is not None:
        cfg.remat_policy = policy
    params = init_clibd_params(jax.random.PRNGKey(0), cfg)
    schedule = build_schedule(cfg.optim, total_steps=1000, batch_size=batch)
    optimizer = train_mod.build_optimizer(cfg, params, schedule)
    opt_state = optimizer.init(params)
    if accum > 1:
        step = train_mod.make_train_step_accum(cfg, optimizer, accum, donate=True)
    else:
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
    mode = ("tri-modal" if tri_modal else "image+DNA") + (" lora" if lora else " full-ft")
    mode += f" remat[{policy or cfg.remat_policy}]" if cfg.remat else " no-remat"
    if accum > 1:
        mode += f" accum={accum}"
    print(f"train step batch {batch} ({mode}): {dt*1e3:.1f} ms/step  "
          f"{batch/dt:.0f} samples/s/chip  loss={float(loss):.4f}", flush=True)


def main():
    batches, policies, accums = [], [], []
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--policy":
            policies.append(args[i + 1])
            i += 2
        elif args[i] == "--accum":
            accums.append(int(args[i + 1]))
            i += 2
        else:
            batches.append(int(args[i]))
            i += 1
    batches = batches or [128, 500]
    policies = policies or [None]
    accums = accums or [1]
    for b in batches:
        for p in policies:
            for a in accums:
                try:
                    if b >= 256:
                        bench(b, tri_modal=True, lora=False, remat=True, policy=p,
                              accum=a)
                    else:
                        bench(b, tri_modal=False, lora=True, remat=True, policy=p,
                              accum=a)
                except Exception as e:  # OOM policies report, sweep continues
                    print(f"train step batch {b} policy {p} accum {a}: FAILED "
                          f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
