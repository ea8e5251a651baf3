"""Diffusion trainer for DiT / Latte reconstruction.

TPU-native counterpart of reference `scripts/train_DiT.py` /
`train_Latte.py` (near-identical clones; here one trainer takes the backbone
from MODEL.MODEL_TYPE): two diffusion processes (1000-step training,
100-step sampling — both fresh processes, train_DiT.py:118-130), EMA params
updated after every optimizer step (:59-82, 417-426), the 90/10 submask
split of acquired lines for DDPM_X (:136-158), k-space L1 training loss
(DDPM_X) or eps-MSE (DDPM_E), and periodic conditional hard-DC sampling.
"""

import logging
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dl_swin_gan_tpu.data import CinePreprocess, DataLoader, Hdf5Dataset
from dl_swin_gan_tpu.diffusion import create_diffusion
from dl_swin_gan_tpu.models import build_denoiser
from dl_swin_gan_tpu.ops.sense import SenseOp
from dl_swin_gan_tpu.parallel.mesh import (fsdp_shardings, make_mesh,
                                            shard_batch,
                                            shard_batch_or_replicate)
from dl_swin_gan_tpu.solvers.diffusion_unrolled import build_diffusion_solver
from dl_swin_gan_tpu.train import packing
from dl_swin_gan_tpu.train.checkpoint import CheckpointManager
from dl_swin_gan_tpu.train.trainer import MetricsWriter
from dl_swin_gan_tpu.train.train_state import (
    TrainState, ema_update, make_optimizer,
)

logger = logging.getLogger(__name__)


def submask_np(mask: np.ndarray, factor: float,
               rng: np.random.RandomState):
    """Split the acquired mask per frame: remove `factor` of acquired ky
    lines -> mask_r (kept 1-factor... reference keeps the removed-complement
    naming); mask_p keeps the other side. Host numpy twin of
    train_DiT.py:136-158 (randperm over acquired ky lines per frame)."""
    mask_unsamp = mask.copy()
    mask_inv_unsamp = mask.copy()
    B = mask.shape[0]
    F = mask.shape[2]
    for b in range(B):
        for f in range(F):
            frame = mask[b, 0, f]            # [Y, X]
            line_counts = frame.sum(axis=1)  # [Y]
            ones = np.nonzero(line_counts)[0]
            num_remove = int(ones.shape[0] * factor)
            perm = rng.permutation(ones.shape[0])
            ind = ones[perm[:num_remove]]
            ind_inv = ones[perm[num_remove:]]
            mask_unsamp[b, 0, f, ind, :] = 0
            mask_inv_unsamp[b, 0, f, ind_inv, :] = 0
    return mask_unsamp, mask_inv_unsamp


def make_diffusion_denoiser_factory(cfg, deterministic: bool):
    """(learn_sigma_final) -> DiT/Latte module factory for the solver."""
    base = cfg.clone() if hasattr(cfg, "clone") else cfg

    def factory(learn_sigma: bool):
        c = base.clone()
        c.defrost()
        c.MODEL.PARAMETERS.LEARN_SIGMA = learn_sigma
        c.freeze()
        return build_denoiser(c, deterministic=deterministic)

    return factory


class DiffusionTrainer:
    """Config-driven DDPM_X / DDPM_E trainer with EMA."""

    def __init__(self, cfg, mesh=None, ema_decay: float = 0.9999,
                 sample_steps: int = 100):
        self.cfg = cfg
        self.ema_decay = ema_decay
        fsdp_axis = cfg.PARALLEL.FSDP_AXIS
        if str(cfg.MODEL.STRATEGY).lower() == "fsdp" and fsdp_axis == 1:
            import jax as _jax
            fsdp_axis = max(1, len(_jax.devices()) // max(1, cfg.PARALLEL.DATA_AXIS))
        self.mesh = mesh if mesh is not None else make_mesh(
            data=cfg.PARALLEL.DATA_AXIS, fsdp=fsdp_axis,
            model=cfg.PARALLEL.MODEL_AXIS)
        self.meta = cfg.MODEL.META_ARCHITECTURE.lower()
        p = cfg.MODEL.PARAMETERS
        self.model = build_diffusion_solver(
            cfg, make_diffusion_denoiser_factory(cfg, deterministic=True))
        self.train_model = build_diffusion_solver(
            cfg, make_diffusion_denoiser_factory(cfg, deterministic=False))
        predict_xstart = self.meta != "ddpm_e"
        self.diffusion = create_diffusion(
            timestep_respacing="", noise_schedule=p.NOISE_SCHED,
            diffusion_steps=1000, learn_sigma=p.LEARN_SIGMA,
            predict_xstart=predict_xstart)
        # fresh shorter process for sampling (train_DiT.py:125-130)
        self.diffusion2 = create_diffusion(
            timestep_respacing="", noise_schedule=p.NOISE_SCHED,
            diffusion_steps=sample_steps, learn_sigma=p.LEARN_SIGMA,
            predict_xstart=predict_xstart)
        self.steps_per_epoch = 1  # fit() overwrites with len(loader)
        self.tx = make_optimizer(cfg)
        self.renormalize = cfg.MODEL.RECON_LOSS.RENORMALIZE_DATA
        self.submask_rng = np.random.RandomState(cfg.SEED + 99)
        self._train_step = None
        self._sample_fn = None

    # -- jit-side model closure ------------------------------------------------
    def _model_fn(self, model, params, rngs=None):
        def fn(x, t, **kwargs):
            return model.apply({"params": params}, x, t, rngs=rngs, **kwargs)
        return fn

    def _kwargs_from_batch(self, batch, dc_mask):
        maps = batch["maps"]
        return dict(
            A=SenseOp(maps, dc_mask),
            A_1=SenseOp(maps, 1.0 - dc_mask),
            A_F=SenseOp(maps, None),
            A_S=SenseOp(maps, batch.get("mask_r", batch["mask"])),
            fs=batch["target"],
            c=jnp.ones((batch["target"].shape[0],), jnp.int32),
        )

    # -- host-side batch prep ----------------------------------------------------
    def prepare_batch(self, batch: dict) -> dict:
        """Add the DDPM_X 90/10 submask split on host (numpy RNG parity)."""
        batch = dict(batch)
        # raw k-space is never consumed by the diffusion paths (the SenseOps
        # are built from maps+masks; losses are on target) — don't ship it
        # through the slow host->device relay (~17 MB/example saved)
        batch.pop("kspace", None)
        if self.meta == "ddpm_x":
            mask_r, mask_p = submask_np(batch["mask"], 0.9, self.submask_rng)
            batch["mask_r"] = mask_r
            batch["mask_p"] = mask_p
        else:
            batch["mask_r"] = batch["mask"]
            batch["mask_p"] = batch["mask"]
        return batch

    # -- init / steps --------------------------------------------------------------
    def init_state(self, sample_batch: dict) -> TrainState:
        packed = packing.pack(self.prepare_batch(sample_batch))

        def _init(packed_batch):
            b = packing.unpack(packed_batch)
            kwargs = self._kwargs_from_batch(b, b["mask_p"])
            t = jnp.zeros((b["target"].shape[0],), jnp.int32)
            params = self.model.init(jax.random.PRNGKey(self.cfg.SEED),
                                     b["target"], t, **kwargs)["params"]
            opt_state = self.tx.init(params)
            ema = jax.tree.map(lambda x: x, params)
            return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                              opt_state=opt_state, ema_params=ema)

        abstract = jax.eval_shape(_init, packed)
        shardings = fsdp_shardings(abstract, self.mesh)
        state = jax.jit(_init, out_shardings=shardings)(
            shard_batch(packed, self.mesh))
        n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(abstract.params))
        logger.info("diffusion model %s (%s): %.2fM params",
                    self.cfg.MODEL.MODEL_TYPE, self.meta, n / 1e6)
        return state

    def _build_steps(self):
        base_key = jax.random.PRNGKey(self.cfg.SEED + 7)
        is_x = self.meta == "ddpm_x"

        def train_step(state: TrainState, packed_batch):
            b = packing.unpack(packed_batch)
            key = jax.random.fold_in(base_key, state.step)
            k_t, k_noise, k_drop = jax.random.split(key, 3)
            B = b["target"].shape[0]
            t = jax.random.randint(k_t, (B,), 0, self.diffusion.num_timesteps)

            target = b["target"]
            if self.renormalize:
                scale = b["scale"].reshape((-1,) + (1,) * (target.ndim - 1))
                target = target * scale
            bb = dict(b)
            bb["target"] = target

            def loss_fn(params):
                model = self._model_fn(self.train_model, params,
                                       rngs={"dropout": k_drop})
                kwargs = self._kwargs_from_batch(bb, bb["mask_p"])
                if is_x:
                    terms, pred, x_t = self.diffusion.training_kspace_loss(
                        k_noise, model, target, t, kwargs)
                else:
                    terms, pred, x_t = self.diffusion.training_losses(
                        k_noise, model, target, t, kwargs)
                return jnp.mean(terms["loss"]), terms

            (loss, terms), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = jax.tree.map(lambda p, u: p + u, state.params, updates)
            ema = ema_update(state.ema_params, params, self.ema_decay)
            new_state = TrainState(step=state.step + 1, params=params,
                                   opt_state=opt_state, ema_params=ema)
            metrics = {"Train MSE": loss}
            return new_state, metrics

        def sample_fn(params, packed_batch, key):
            """100-step conditional hard-DC reconstruction
            (train_DiT.py:283-291)."""
            b = packing.unpack(packed_batch)
            model = self._model_fn(self.model, params)
            kwargs = self._kwargs_from_batch(b, b["mask"])  # full mask for DC
            gen = self.diffusion2.p_sample_loop_conditional(
                key, model, b["init_image"], kwargs, clip_denoised=False)
            return packing.pack_jnp(gen)

        def val_loss_step(params, packed_batch, key):
            """Validation loss in the SAME units as the training objective:
            renormalized target when RECON_LOSS.RENORMALIZE_DATA (matching
            train_DiT.py:313-315). Deliberate divergence from the
            reference's validation_step, which scores training_kspace_loss
            on `initial_guess` (train_DiT.py:320-326) — a leftover from
            before its training_step switched to `target`
            (train_DiT.py:259-260); monitoring the actual objective keeps
            best-checkpoint selection meaningful."""
            b = packing.unpack(packed_batch)
            k_t, k_noise = jax.random.split(key)
            B = b["target"].shape[0]
            t = jax.random.randint(k_t, (B,), 0, self.diffusion.num_timesteps)
            target = b["target"]
            if self.renormalize:
                scale = b["scale"].reshape((-1,) + (1,) * (target.ndim - 1))
                target = target * scale
            bb = dict(b)
            bb["target"] = target
            model = self._model_fn(self.model, params)
            kwargs = self._kwargs_from_batch(bb, bb["mask_p"])
            if is_x:
                terms, _, _ = self.diffusion.training_kspace_loss(
                    k_noise, model, target, t, kwargs)
            else:
                terms, _, _ = self.diffusion.training_losses(
                    k_noise, model, target, t, kwargs)
            return jnp.mean(terms["loss"])

        self._train_step = jax.jit(train_step, donate_argnums=0)
        self._sample_fn = jax.jit(sample_fn)
        # built once: a fresh jit per validate() call would recompile the
        # full val step every validation epoch (minutes on the compile relay)
        self._val_loss_step = jax.jit(val_loss_step)

    # -- public API ------------------------------------------------------------------
    def sample(self, params, batch: dict, seed: int = 0) -> np.ndarray:
        if self._sample_fn is None:
            self._build_steps()
        packed = shard_batch(packing.pack(self.prepare_batch(batch)), self.mesh)
        out = self._sample_fn(params, packed, jax.random.PRNGKey(seed))
        return packing.unpack_np(out)

    def fit(self, train_dir: Optional[str] = None, val_dir: Optional[str] = None,
            max_epochs: Optional[int] = None, resume: bool = False) -> TrainState:
        cfg = self.cfg
        train_dir = train_dir or cfg.DATASET.TRAIN[0]
        val_dir = val_dir or (cfg.DATASET.VAL[0] if cfg.DATASET.VAL else None)
        max_epochs = max_epochs or cfg.OPTIMIZER.MAX_EPOCHS

        import numpy as _np
        use_dp = (bool(cfg.DATALOADER.DEVICE_PIPELINE)
                  and cfg.DATALOADER.TRAIN_BATCH_SIZE == 1
                  and int(_np.prod(list(self.mesh.devices.shape))) == 1)
        if use_dp:
            from dl_swin_gan_tpu.data.device_pipeline import DevicePipelineLoader
            train_loader = DevicePipelineLoader(
                train_dir, cfg, use_seed=False, diffusion=True, shuffle=True,
                seed=cfg.SEED, sample_rate=cfg.DATALOADER.SUBSAMPLE)
        else:
            train_data = Hdf5Dataset(train_dir,
                                     CinePreprocess(cfg, use_seed=False),
                                     sample_rate=cfg.DATALOADER.SUBSAMPLE)
            train_loader = DataLoader(train_data,
                                      batch_size=cfg.DATALOADER.TRAIN_BATCH_SIZE,
                                      num_workers=cfg.DATALOADER.NUM_WORKERS,
                                      prefetch=cfg.DATALOADER.PREFETCH,
                                      shuffle=True, seed=cfg.SEED)
        val_loader = None
        if val_dir:
            val_data = Hdf5Dataset(
                val_dir, CinePreprocess(cfg, aug_node=cfg.AUG_VAL, use_seed=True))
            val_loader = DataLoader(val_data,
                                    batch_size=cfg.DATALOADER.VAL_BATCH_SIZE,
                                    num_workers=cfg.DATALOADER.NUM_WORKERS,
                                    shuffle=False, drop_last=False)

        # per-epoch StepLR semantics (see Trainer.fit / train_state.py)
        self.steps_per_epoch = max(1, len(train_loader))
        self.tx = make_optimizer(cfg, steps_per_epoch=self.steps_per_epoch)

        sample = (train_loader.host_sample() if use_dp
                  else next(iter(train_loader)))
        state = self.init_state(sample)
        self._build_steps()

        writer = MetricsWriter(cfg.OUTPUT_DIR)
        monitor = cfg.EVAL.MONITOR or "Validate MSE"
        ckpt = CheckpointManager(
            os.path.join(cfg.OUTPUT_DIR, "checkpoints"), monitor=monitor,
            mode=("max" if ("ssim" in monitor.lower()
                            or "psnr" in monitor.lower()) else "min"))
        start_epoch = 0
        if resume and ckpt.latest_step() is not None:
            state = ckpt.restore(state)
            # restore the epoch clock (see Trainer.fit): keeps MAX_EPOCHS /
            # RUN_EVERY_N_EPOCHS meaningful across crash-resumes
            start_epoch = int(state.step) // max(1, len(train_loader))
            logger.info("resumed from step %d (epoch %d)", int(state.step),
                        start_epoch)

        log_every = cfg.LOGGER.LOG_METRICS_EVERY_N_STEPS
        pred_every = cfg.LOGGER.LOG_PREDICTION_EVERY_N_STEPS
        t0, n0 = time.perf_counter(), 0
        # host-side step counter (see Trainer.fit): avoids a per-step D2H
        # sync of state.step that defeats async dispatch on slow links
        host_step = int(state.step)
        for epoch in range(start_epoch, max_epochs):
            for batch in train_loader:
                if use_dp:  # already a packed, device-resident batch
                    packed = batch
                else:
                    packed = shard_batch(
                        packing.pack(self.prepare_batch(batch)), self.mesh)
                state, metrics = self._train_step(state, packed)
                n0 += 1
                host_step += 1
                step = host_step
                if pred_every and step % pred_every == 0:
                    # periodic conditional hard-DC sampling from the EMA
                    # model (train_DiT.py:283-291; Latte samples from EMA).
                    # Reuses the already-prepared packed batch: calling
                    # sample(batch) here would re-run prepare_batch and draw
                    # a second DDPM_X submask, shifting the training RNG
                    # stream — a logging knob must not change the trajectory.
                    gen = packing.unpack_np(self._sample_fn(
                        state.ema_params, packed, jax.random.PRNGKey(step)))
                    mag = np.abs(gen["pred"] if isinstance(gen, dict) else gen)
                    strip = np.concatenate(list(mag[0, 0][:8]), axis=1)
                    writer.image(step, "Train/sampled_magnitude", strip)
                if step % log_every == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    m["Train/steps_per_sec"] = n0 / (time.perf_counter() - t0)
                    writer.scalars(step, m)
                    logger.info("epoch %d step %d MSE=%.5f (%.2f it/s)",
                                epoch, step, m["Train MSE"],
                                m["Train/steps_per_sec"])
                # step-based checkpointing decoupled from validation (see
                # Trainer.fit): banks progress on preemptible/flaky pools
                ckpt_steps = cfg.EVAL.CKPT_EVERY_N_STEPS
                if ckpt_steps and step % ckpt_steps == 0:
                    ckpt.save(step, state)

            if val_loader and (epoch + 1) % cfg.EVAL.RUN_EVERY_N_EPOCHS == 0:
                rm = cfg.EVAL.RECON_SSIM_EVERY_N_EPOCHS
                val = self.validate(state, val_loader, writer,
                                    recon_metric=bool(rm)
                                    and (epoch + 1) % rm == 0)
                ckpt.save(int(state.step), state, metrics=val)

        # final state always banked (no-op when the step is already saved)
        ckpt.save(int(state.step), state)
        ckpt.close()
        writer.close()
        return state

    def validate(self, state: TrainState, val_loader,
                 writer: Optional[MetricsWriter] = None,
                 recon_metric: bool = False) -> Dict[str, float]:
        if self._train_step is None:
            self._build_steps()
        base_key = jax.random.PRNGKey(self.cfg.SEED + 23)
        losses = []
        first = None
        for i, batch in enumerate(val_loader):
            # drop_last=False: the epoch's last batch can be ragged
            prepared = self.prepare_batch(batch)
            packed = shard_batch_or_replicate(
                packing.pack(prepared), self.mesh)
            if i == 0:
                # reuse the SAME prepared batch: a second prepare_batch
                # would draw another DDPM_X submask and shift the host RNG
                # stream — the monitor must not change the trajectory
                first = (prepared, packed)
            losses.append(float(self._val_loss_step(
                state.params, packed, jax.random.fold_in(base_key, i))))
        out = {"Validate MSE": float(np.mean(losses))}
        if recon_metric and first is not None:
            out.update(self._recon_ssim(state, *first))
        if writer is not None:
            writer.scalars(int(state.step), out)
        logger.info("validate step %d: %s", int(state.step), out)
        return out

    def _recon_ssim(self, state: TrainState, batch: dict,
                    packed) -> Dict[str, float]:
        """Sampling-quality monitor: conditional hard-DC reconstruction of
        one val batch from raw AND EMA params, scored by SSIM against the
        batch target. Exists because the denoising loss is NOT a proxy for
        sampling quality (measured round 4: Validate MSE improved 0.046 →
        0.017 monotonically while 12× recon SSIM peaked ~7k steps then fell
        0.845 → 0.783); pair with EVAL.MONITOR='Validate recon SSIM' to
        retain the best-sampling checkpoint. First call compiles the
        sampling graph at the val batch shape (once per fit)."""
        from dl_swin_gan_tpu.infer.evaluate import ssim2d

        key = jax.random.PRNGKey(self.cfg.SEED + 99)  # fixed: comparable
        # target/sampler layout is [B, E, T, Y, X] complex; score emap 0
        # phase-by-phase, like the quality protocol (infer/evaluate.py)
        ref = np.abs(np.asarray(batch["target"]))[:, 0]  # [B, T, Y, X]
        out = {}
        for tag, params in (("", state.params), (" (EMA)", state.ema_params)):
            gen = packing.unpack_np(self._sample_fn(params, packed, key))
            gen = gen["pred"] if isinstance(gen, dict) else gen
            mag = np.abs(np.asarray(gen))[:, 0]
            vals = []
            for b in range(min(ref.shape[0], mag.shape[0])):
                rng = ref[b].max() - ref[b].min()
                vals.extend(ssim2d(ref[b, t], mag[b, t], data_range=rng)
                            for t in range(ref.shape[1]))
            out[f"Validate recon SSIM{tag}"] = float(np.mean(vals))
        return out
