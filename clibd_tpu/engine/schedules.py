"""LR schedules with torch parity (reference scripts/train_cl.py:223-250).

All schedules step PER BATCH (the reference calls scheduler.step() every
batch, epoch/train_epoch.py:62-63 — including ExponentialLR/StepLR, which is
reproduced literally).  LR scaling by total_batch/500 (util/util.py:753-756)
is applied by the caller before building the schedule.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ..config.schema import OptimConfig


def scale_learning_rate(lr: float, batch_size: int, base_batch_size: int = 500, world_size: int = 1) -> float:
    return lr * (batch_size * world_size) / base_batch_size


def one_cycle_lr(
    max_lr: float,
    total_steps: int,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
) -> Callable:
    """torch OneCycleLR(anneal_strategy='cos', cycle_momentum=False) parity:
    initial = max/div_factor, min = initial/final_div_factor;
    phase 1 ends at float(pct_start·total) − 1, cosine ramp up then down."""
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    end1 = float(pct_start * total_steps) - 1.0
    end2 = float(total_steps) - 1.0

    def _cos(start, end, pct):
        return end + (start - end) / 2.0 * (jnp.cos(jnp.pi * pct) + 1.0)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        pct1 = jnp.clip(step / jnp.maximum(end1, 1e-9), 0.0, 1.0)
        up = _cos(initial_lr, max_lr, pct1)
        pct2 = jnp.clip((step - end1) / jnp.maximum(end2 - end1, 1e-9), 0.0, 1.0)
        down = _cos(max_lr, min_lr, pct2)
        return jnp.where(step <= end1, up, down)

    return schedule


def exponential_lr(lr: float, gamma: float = 0.95) -> Callable:
    def schedule(step):
        return lr * gamma ** jnp.asarray(step, jnp.float32)

    return schedule


def step_lr(lr: float, step_size: int = 10, gamma: float = 0.5) -> Callable:
    def schedule(step):
        return lr * gamma ** jnp.floor(jnp.asarray(step, jnp.float32) / step_size)

    return schedule


def cosine_lr(lr: float, total_steps: int, min_lr: float = 1e-9) -> Callable:
    def schedule(step):
        pct = jnp.asarray(step, jnp.float32) / max(total_steps, 1)
        return min_lr + (lr - min_lr) * (1.0 + jnp.cos(jnp.pi * pct)) / 2.0

    return schedule


def build_schedule(cfg: OptimConfig, total_steps: int, batch_size: int, world_size: int = 1) -> Callable:
    lrc = cfg.lr_config
    base = cfg.base_batch_size

    def scaled(x):
        return scale_learning_rate(x, batch_size, base, world_size) if cfg.scale_lr_by_batch else x

    name = cfg.lr_scheduler
    if name == "one_cycle":
        return one_cycle_lr(
            scaled(lrc.max_lr), total_steps, lrc.pct_start, lrc.div_factor, lrc.final_div_factor
        )
    if name == "exponential":
        return exponential_lr(scaled(lrc.lr), lrc.gamma)
    if name == "step":
        return step_lr(scaled(lrc.lr), lrc.step_size, lrc.step_gamma)
    if name == "cosine":
        return cosine_lr(scaled(lrc.lr), total_steps, scaled(lrc.min_lr))
    if name in ("none", "", None):
        lr = scaled(lrc.lr)
        return lambda step: jnp.asarray(lr, jnp.float32)
    raise ValueError(f"Unknown lr_scheduler {name!r}")
