"""LR schedule parity vs torch schedulers (per-step stepping, as the
reference does)."""

import numpy as np
import pytest

from clibd_tpu.config.schema import OptimConfig
from clibd_tpu.engine.schedules import (
    build_schedule,
    cosine_lr,
    exponential_lr,
    one_cycle_lr,
    scale_learning_rate,
    step_lr,
)


def torch_lrs(scheduler_name, total_steps, lr=1e-3, max_lr=5e-3):
    import torch

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=lr)
    if scheduler_name == "one_cycle":
        sch = torch.optim.lr_scheduler.OneCycleLR(
            opt, max_lr=max_lr, total_steps=total_steps, pct_start=0.3,
            anneal_strategy="cos", cycle_momentum=False,
        )
    elif scheduler_name == "exponential":
        sch = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=0.95)
    elif scheduler_name == "step":
        sch = torch.optim.lr_scheduler.StepLR(opt, step_size=10, gamma=0.5)
    elif scheduler_name == "cosine":
        sch = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=total_steps, eta_min=1e-9)
    lrs = []
    for _ in range(total_steps):
        lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sch.step()
    return np.asarray(lrs)


def test_one_cycle_matches_torch():
    total = 50
    ref = torch_lrs("one_cycle", total, max_lr=5e-3)
    sch = one_cycle_lr(5e-3, total)
    ours = np.asarray([float(sch(t)) for t in range(total)])
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_exponential_matches_torch():
    ref = torch_lrs("exponential", 30, lr=1e-3)
    sch = exponential_lr(1e-3, 0.95)
    ours = np.asarray([float(sch(t)) for t in range(30)])
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_step_matches_torch():
    ref = torch_lrs("step", 35, lr=1e-3)
    sch = step_lr(1e-3, 10, 0.5)
    ours = np.asarray([float(sch(t)) for t in range(35)])
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_cosine_matches_torch():
    ref = torch_lrs("cosine", 40, lr=1e-3)
    sch = cosine_lr(1e-3, 40, 1e-9)
    ours = np.asarray([float(sch(t)) for t in range(40)])
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_lr_scaling_rule():
    # reference util/util.py:753-756
    assert scale_learning_rate(1e-6, 500, 500, 4) == pytest.approx(4e-6)
    assert scale_learning_rate(5e-5, 250, 500, 1) == pytest.approx(2.5e-5)


def test_build_schedule_scales_by_batch():
    cfg = OptimConfig()
    cfg.lr_config.max_lr = 5e-5
    sch = build_schedule(cfg, total_steps=100, batch_size=1000, world_size=2)
    # peak should be 5e-5 * 2000/500 = 2e-4
    peak = max(float(sch(t)) for t in range(100))
    assert peak == pytest.approx(2e-4, rel=1e-3)
