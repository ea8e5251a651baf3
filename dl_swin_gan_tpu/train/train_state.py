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


def make_optimizer(cfg, steps_per_epoch: int = 1) -> optax.GradientTransformation:
    """Adam(+WD) with StepLR staircase decay, optional clip + accumulation."""
    opt = cfg.OPTIMIZER
    sched = optax.exponential_decay(
        init_value=opt.ADAM.LR,
        transition_steps=max(1, cfg.LR_SCHEDULER.STEP_SIZE * steps_per_epoch),
        decay_rate=cfg.LR_SCHEDULER.GAMMA,
        staircase=True,
    )
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
