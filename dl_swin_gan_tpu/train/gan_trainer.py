"""Adversarial trainer: unrolled (Swin) generator + PatchGAN discriminator.

Completes the capability the reference repo is named for: its driver
dispatches `SWINGAN -> scripts/train_swin_gan.py + configs/config_swingan.yaml`
(reference run_script.sh:45-47,144-155) but neither exists in the snapshot.
Generator = any unrolled solver (Swin by config); discriminator = 3D
PatchGAN on magnitude frames; LSGAN objective:

    L_D = 1/2 E[(D(real)-1)^2] + 1/2 E[D(fake)^2]
    L_G = recon_loss + lambda_adv * E[(D(fake)-1)^2]

Both updates run inside ONE jitted step over the ('data','fsdp') mesh.
"""

import logging
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from dl_swin_gan_tpu.models.discriminator import PatchDiscriminator3D
from dl_swin_gan_tpu.parallel.mesh import fsdp_shardings, shard_batch
from dl_swin_gan_tpu.train import packing
from dl_swin_gan_tpu.train.losses import select_loss
from dl_swin_gan_tpu.train.trainer import Trainer
from dl_swin_gan_tpu.train.train_state import make_optimizer

logger = logging.getLogger(__name__)


class GANTrainState(struct.PyTreeNode):
    step: jax.Array
    g_params: Any
    g_opt: Any
    d_params: Any
    d_opt: Any


class GANTrainer(Trainer):
    """Trainer with an adversarial term on top of the unrolled generator."""

    def __init__(self, cfg, **kw):
        super().__init__(cfg, **kw)
        g = cfg.MODEL.GAN
        self.adv_weight = g.ADV_WEIGHT
        self.disc = PatchDiscriminator3D(features=g.DISC_FEATURES,
                                         num_layers=g.DISC_LAYERS)
        d_cfg = cfg.clone()
        d_cfg.defrost()
        d_cfg.OPTIMIZER.ADAM.LR = g.DISC_LR
        d_cfg.freeze()
        self._d_cfg = d_cfg
        self.d_tx = make_optimizer(d_cfg)

    def set_steps_per_epoch(self, n: int) -> None:
        super().set_steps_per_epoch(n)
        self.d_tx = make_optimizer(self._d_cfg,
                                   steps_per_epoch=self.steps_per_epoch)

    # ------------------------------------------------------------------ init
    def init_state(self, sample_batch: dict, seed: Optional[int] = None):
        seed = self.cfg.SEED if seed is None else seed
        packed = packing.pack(sample_batch)

        def _init(packed_batch):
            b = packing.unpack(packed_batch)
            g_params = self.model.init(
                jax.random.PRNGKey(seed), b["kspace"], b["maps"], b["mask"],
                x0=b.get("init_image"))["params"]
            d_params = self.disc.init(jax.random.PRNGKey(seed + 1),
                                      b["target"])["params"]
            return GANTrainState(step=jnp.zeros((), jnp.int32),
                                 g_params=g_params,
                                 g_opt=self.tx.init(g_params),
                                 d_params=d_params,
                                 d_opt=self.d_tx.init(d_params))

        abstract = jax.eval_shape(_init, packed)
        shardings = fsdp_shardings(abstract, self.mesh)
        state = jax.jit(_init, out_shardings=shardings)(
            shard_batch(packed, self.mesh))
        n_g = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(abstract.g_params))
        n_d = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(abstract.d_params))
        logger.info("GAN: generator %.2fM + discriminator %.2fM params",
                    n_g / 1e6, n_d / 1e6)
        return state

    # ------------------------------------------------------------------ steps
    def _build_steps(self):
        base_key = jax.random.PRNGKey(self.cfg.SEED + 17)

        def train_step(state: GANTrainState, packed_batch):
            b = packing.unpack(packed_batch)
            rngs = {"dropout": jax.random.fold_in(base_key, state.step)}

            # ---- discriminator update (generator frozen)
            fake = self._apply(state.g_params, b, train=True, rngs=rngs)
            fake_sg = jax.lax.stop_gradient(fake)

            def d_loss_fn(d_params):
                d_real = self.disc.apply({"params": d_params}, b["target"])
                d_fake = self.disc.apply({"params": d_params}, fake_sg)
                return 0.5 * (jnp.mean((d_real - 1.0) ** 2)
                              + jnp.mean(d_fake ** 2))

            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
            d_updates, d_opt = self.d_tx.update(d_grads, state.d_opt,
                                                state.d_params)
            d_params = jax.tree.map(lambda p, u: p + u, state.d_params,
                                    d_updates)

            # ---- generator update (new discriminator frozen)
            def g_loss_fn(g_params):
                pred = self._apply(g_params, b, train=True, rngs=rngs)
                metrics = self._metrics(pred, b, "Train")
                recon = select_loss(metrics, self.loss_name, "Train")
                d_fake = self.disc.apply({"params": d_params}, pred)
                adv = jnp.mean((d_fake - 1.0) ** 2)
                metrics["Train/adv_loss"] = adv
                metrics["Train/disc_loss"] = d_loss
                return recon + self.adv_weight * adv, metrics

            g_grads, metrics = jax.grad(g_loss_fn, has_aux=True)(state.g_params)
            g_updates, g_opt = self.tx.update(g_grads, state.g_opt,
                                              state.g_params)
            g_params = jax.tree.map(lambda p, u: p + u, state.g_params,
                                    g_updates)

            new_state = GANTrainState(step=state.step + 1, g_params=g_params,
                                      g_opt=g_opt, d_params=d_params,
                                      d_opt=d_opt)
            return new_state, metrics

        def val_step(params, packed_batch):
            b = packing.unpack(packed_batch)
            pred = self._apply(params, b)
            metrics = self._metrics(pred, b, "Validate")
            return metrics, packing.pack_jnp(pred)

        self._train_step = jax.jit(train_step, donate_argnums=0)
        self._val_step = jax.jit(val_step)

    # base validate() reconstructs with the generator's params
    def _val_params(self, state):
        return state.g_params
