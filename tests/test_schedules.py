"""Scheduler-parity tests: onecycle and plateau must match torch's formulas
step-for-step; warmup-cosine must do what the reference's broken
'cosine_warmup' config *describes* (train_model.py:356-365).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from crosstalk_tpu.config import OptimConfig
from crosstalk_tpu.train.schedules import (
    ReduceLROnPlateau,
    Schedule,
    onecycle_lr,
    warmup_cosine_lr,
)


def test_onecycle_matches_torch():
    epochs, steps_per_epoch, base_lr = 5, 7, 1e-4
    total = epochs * steps_per_epoch
    model = torch.nn.Linear(2, 1)
    opt = torch.optim.Adam(model.parameters(), lr=base_lr)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=1e-3, pct_start=0.3, anneal_strategy="cos",
        div_factor=25.0, final_div_factor=1e4,
        epochs=epochs, steps_per_epoch=steps_per_epoch,
    )
    torch_lrs = []
    for _ in range(total):
        torch_lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    ours = [onecycle_lr(s, total) for s in range(total)]
    np.testing.assert_allclose(ours, torch_lrs, rtol=1e-10)


def test_plateau_matches_torch():
    model = torch.nn.Linear(2, 1)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, factor=0.3, patience=3, threshold=5e-5, min_lr=1e-8
    )
    ours = ReduceLROnPlateau(1e-3, factor=0.3, patience=3, threshold=5e-5,
                             min_lr=1e-8)
    rng = np.random.default_rng(0)
    # a plateauing loss sequence with occasional improvements
    losses = [1.0, 0.9, 0.85, 0.85, 0.851, 0.8501, 0.85, 0.849, 0.8489,
              0.84889, 0.84888, 0.848879, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5]
    losses += list(0.5 + rng.random(20) * 1e-6)
    for loss in losses:
        tsched.step(loss)
        ours.step(loss)
        assert ours.lr == pytest.approx(opt.param_groups[0]["lr"], rel=1e-12), loss


def test_warmup_cosine_shape():
    lrs = [warmup_cosine_lr(e, 50) for e in range(50)]
    np.testing.assert_allclose(lrs[:5], [1e-4 * k / 5 for k in range(1, 6)])
    assert lrs[5] == pytest.approx(1e-4)
    assert lrs[-1] == pytest.approx(1e-7, rel=1e-6)
    assert all(a >= b for a, b in zip(lrs[5:], lrs[6:]))  # monotone decay


def test_schedule_driver_dispatch():
    cfg = OptimConfig(learning_rate=3e-4, scheduler="aggressive_plateau")
    s = Schedule(cfg, num_epochs=10, steps_per_epoch=4)
    assert s.scheduler_type == "plateau"
    assert s.early_stop_patience == 8
    assert s.lr_for_step(0) == 3e-4
    # 4 consecutive bad epochs -> factor 0.3
    for _ in range(5):
        s.on_epoch_end(1.0)
    assert s.lr_for_step(99) == pytest.approx(3e-4 * 0.3)

    s2 = Schedule(OptimConfig(scheduler="onecycle"), 10, 4)
    assert s2.scheduler_type == "onecycle"
    assert s2.lr_for_step(0) == pytest.approx(1e-3 / 25.0)

    s3 = Schedule(OptimConfig(scheduler="cosine_warmup"), 10, 4)
    assert s3.scheduler_type == "custom_warmup"
    assert s3.lr_for_step(0) == pytest.approx(1e-4 / 5)

    with pytest.raises(ValueError, match="unknown scheduler"):
        Schedule(OptimConfig(scheduler="nope"), 10, 4)


def test_schedule_state_roundtrip():
    cfg = OptimConfig(scheduler="aggressive_plateau")
    a = Schedule(cfg, 10, 4)
    for loss in (1.0, 1.0, 1.0, 1.0, 1.0):
        a.on_epoch_end(loss)
    b = Schedule(cfg, 10, 4)
    b.load_state_dict(a.state_dict())
    assert b.lr_for_step(0) == a.lr_for_step(0)
    assert b._plateau.num_bad_epochs == a._plateau.num_bad_epochs


def test_plateau_eps_guard_matches_torch():
    """torch skips reductions smaller than eps=1e-8; an lr within ~1e-8 of
    min_lr must freeze exactly where torch freezes (ADVICE r1)."""
    model = torch.nn.Linear(2, 1)
    opt = torch.optim.Adam(model.parameters(), lr=3e-8)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, factor=0.3, patience=0, threshold=5e-5, min_lr=1e-8
    )
    ours = ReduceLROnPlateau(3e-8, factor=0.3, patience=0, threshold=5e-5,
                             min_lr=1e-8)
    for loss in [1.0] * 6:  # every epoch is "bad" -> reduction attempted
        tsched.step(loss)
        ours.step(loss)
        assert ours.lr == opt.param_groups[0]["lr"], (
            ours.lr, opt.param_groups[0]["lr"])
