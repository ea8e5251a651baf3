"""StepLR semantics parity: decay per EPOCH, not per optimizer step.

Reference `scripts/train.py:146-151` pairs Adam with
`torch.optim.lr_scheduler.StepLR(step_size=STEP_SIZE, gamma=GAMMA)` and
Lightning steps the scheduler once per epoch — so the LR during epoch e is
LR * GAMMA ** (e // STEP_SIZE). The optax schedule counts optimizer updates,
hence the boundary must be STEP_SIZE * updates_per_epoch.
"""

import numpy as np
import pytest

from dl_swin_gan_tpu.config import get_cfg
from dl_swin_gan_tpu.train.train_state import make_lr_schedule


def _cfg(lr=1e-3, step_size=2, gamma=0.5, accum=1):
    cfg = get_cfg()
    cfg.OPTIMIZER.ADAM.LR = lr
    cfg.LR_SCHEDULER.STEP_SIZE = step_size
    cfg.LR_SCHEDULER.GAMMA = gamma
    cfg.OPTIMIZER.GRAD_ACCUM_ITERS = accum
    return cfg


def test_steplr_matches_torch_per_epoch_semantics():
    torch = pytest.importorskip("torch")
    steps_per_epoch = 7
    cfg = _cfg(step_size=2, gamma=0.5)
    sched = make_lr_schedule(cfg, steps_per_epoch=steps_per_epoch)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=cfg.OPTIMIZER.ADAM.LR)
    tsched = torch.optim.lr_scheduler.StepLR(
        opt, step_size=cfg.LR_SCHEDULER.STEP_SIZE,
        gamma=cfg.LR_SCHEDULER.GAMMA)

    update = 0
    for epoch in range(10):
        torch_lr = opt.param_groups[0]["lr"]
        for _ in range(steps_per_epoch):
            # LR used by optimizer update #`update` (0-indexed)
            ours = float(sched(update))
            assert np.isclose(ours, torch_lr, rtol=1e-6), (
                f"epoch {epoch} update {update}: {ours} != torch {torch_lr}")
            update += 1
        tsched.step()  # Lightning: scheduler.step() once per epoch


def test_steplr_decay_boundaries():
    cfg = _cfg(lr=4e-4, step_size=3, gamma=0.1)
    sched = make_lr_schedule(cfg, steps_per_epoch=294)
    # within the first 3 epochs: no decay
    assert np.isclose(float(sched(0)), 4e-4)
    assert np.isclose(float(sched(3 * 294 - 1)), 4e-4)
    # epoch 3 begins: one decay
    assert np.isclose(float(sched(3 * 294)), 4e-5)
    assert np.isclose(float(sched(6 * 294 - 1)), 4e-5)
    assert np.isclose(float(sched(6 * 294)), 4e-6)


def test_steplr_with_grad_accumulation():
    # With accumulation k, the inner Adam count advances once per k batches
    # (optax.MultiSteps), so boundaries shrink by k in update units.
    cfg = _cfg(step_size=2, gamma=0.5, accum=4)
    sched = make_lr_schedule(cfg, steps_per_epoch=8)  # 2 updates/epoch
    assert np.isclose(float(sched(0)), 1e-3)
    assert np.isclose(float(sched(3)), 1e-3)   # epoch 1, still pre-boundary
    assert np.isclose(float(sched(4)), 5e-4)   # epoch 2 first update
    assert np.isclose(float(sched(8)), 2.5e-4)


def test_trainer_rebuilds_optimizer_with_epoch_length():
    from dl_swin_gan_tpu.train.trainer import Trainer
    cfg = _cfg(step_size=1000)
    cfg.MODEL.MODEL_TYPE = "RES"
    cfg.MODEL.META_ARCHITECTURE = "dlespirit"
    cfg.OUTPUT_DIR = "/tmp/test_lr_sched"
    trainer = Trainer(cfg)
    assert trainer.steps_per_epoch == 1  # construction-time hint
    trainer.set_steps_per_epoch(294)
    assert trainer.steps_per_epoch == 294
    # the rebuilt schedule must hold LR flat through a realistic run
    sched = make_lr_schedule(cfg, steps_per_epoch=trainer.steps_per_epoch)
    assert np.isclose(float(sched(950 * 294)), cfg.OPTIMIZER.ADAM.LR)
