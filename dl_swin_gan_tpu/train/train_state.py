"""Train state (params / optimizer / EMA) and optimizer construction.

Replaces the reference's Lightning `configure_optimizers` (train.py:146-151:
Adam + StepLR) plus the DiT/Latte trainers' hand-rolled EMA
(train_DiT.py:59-82,417-426). Gradient accumulation (Lightning
`accumulate_grad_batches`) maps to optax.MultiSteps; DeepSpeed ZeRO-3 maps
to the fsdp mesh axis (see parallel/mesh.py), so no CPU-offload optimizer
is needed.
"""

from typing import Any

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any  # empty dict when EMA disabled (static pytree structure)


def make_lr_schedule(cfg, steps_per_epoch: int = 1) -> optax.Schedule:
    """StepLR twin: lr = LR * GAMMA ** (epoch // STEP_SIZE).

    Reference StepLR steps once per EPOCH (train.py:148-151), so the decay
    boundary in optimizer-update units is STEP_SIZE * updates_per_epoch.
    `steps_per_epoch` counts dataloader batches; with gradient accumulation
    the inner Adam count (which drives this schedule under optax.MultiSteps)
    only advances every GRAD_ACCUM_ITERS batches, hence the division.
    """
    accum = max(1, cfg.OPTIMIZER.GRAD_ACCUM_ITERS)
    updates_per_epoch = max(1, steps_per_epoch // accum)
    return optax.exponential_decay(
        init_value=cfg.OPTIMIZER.ADAM.LR,
        transition_steps=max(1, cfg.LR_SCHEDULER.STEP_SIZE * updates_per_epoch),
        decay_rate=cfg.LR_SCHEDULER.GAMMA,
        staircase=True,
    )


def make_optimizer(cfg, steps_per_epoch: int = 1) -> optax.GradientTransformation:
    """Adam(+WD) with per-epoch StepLR decay, optional clip + accumulation."""
    opt = cfg.OPTIMIZER
    sched = make_lr_schedule(cfg, steps_per_epoch)
    b1, b2 = opt.ADAM.BETAS
    if opt.ADAM.WEIGHT_DECAY > 0:
        tx = optax.adamw(sched, b1=b1, b2=b2, eps=opt.ADAM.EPS,
                         weight_decay=opt.ADAM.WEIGHT_DECAY)
    else:
        tx = optax.adam(sched, b1=b1, b2=b2, eps=opt.ADAM.EPS)
    if opt.GRAD_CLIP_VAL > 0:
        tx = optax.chain(optax.clip_by_global_norm(opt.GRAD_CLIP_VAL), tx)
    if opt.GRAD_ACCUM_ITERS > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=opt.GRAD_ACCUM_ITERS)
    return tx


def ema_update(ema_params: Any, params: Any, decay: float = 0.9999) -> Any:
    """Polyak averaging after each optimizer step (train_DiT.py:417-426)."""
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p,
                        ema_params, params)
