"""Single pjit train/val step + training loop.

TPU-native counterpart of reference `scripts/train.py` (LitUnrolled +
Lightning Trainer) — one jitted train step over a ('data','fsdp') mesh
replaces Lightning DDP/DeepSpeed; orbax replaces ModelCheckpoint; a JSONL +
TensorBoard metrics writer replaces TensorBoardLogger. The same Trainer
drives every unrolled variant (RES/SE/CBAM/SWIN) — they differ only in the
denoiser module, mirroring how the reference's train_{se,cbam,swin}.py are
whitespace clones of train.py.
"""

import json
import logging
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dl_swin_gan_tpu.data import CinePreprocess, DataLoader, Hdf5Dataset
from dl_swin_gan_tpu.models import build_denoiser
from dl_swin_gan_tpu.parallel.mesh import (fsdp_shardings, make_mesh,
                                            shard_batch,
                                            shard_batch_or_replicate)
from dl_swin_gan_tpu.solvers import build_solver
from dl_swin_gan_tpu.train import packing
from dl_swin_gan_tpu.train.checkpoint import CheckpointManager
from dl_swin_gan_tpu.train.losses import compute_metrics, select_loss
from dl_swin_gan_tpu.train.train_state import TrainState, ema_update, make_optimizer

logger = logging.getLogger(__name__)


class MetricsWriter:
    """JSONL always; TensorBoard scalars when tensorboardX is available."""

    def __init__(self, output_dir: str):
        os.makedirs(output_dir, exist_ok=True)
        self._jsonl = open(os.path.join(output_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from tensorboardX import SummaryWriter
            self._tb = SummaryWriter(os.path.join(output_dir, "exp"))
        except Exception:
            pass

    def scalars(self, step: int, metrics: Dict[str, float]) -> None:
        rec = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), step)

    def image(self, step: int, tag: str, img: np.ndarray) -> None:
        if self._tb is not None:
            lo, hi = img.min(), img.max()
            img = (img - lo) / (hi - lo + 1e-12)
            self._tb.add_image(tag, img[None], step)  # [1, H, W]

    def video(self, step: int, tag: str, frames: np.ndarray, fps: int = 7):
        """frames: [T, Y, X] float. Mirrors reference save_video
        (train.py:81-87): min-max normalize, (y,x)->(x,y) transpose, logged
        as an animated-GIF image summary. (tensorboardX add_video needs
        moviepy, absent here — a PIL-encoded GIF in a raw image summary is
        what add_video produces anyway.)"""
        if self._tb is None:
            return
        try:
            import io
            from PIL import Image
            from tensorboardX.proto.summary_pb2 import Summary
        except Exception:
            return
        v = frames.transpose(0, 2, 1)                  # [T, X, Y]
        lo, hi = v.min(), v.max()
        v = ((v - lo) / (hi - lo + 1e-12) * 255).astype(np.uint8)
        imgs = [Image.fromarray(f, mode="L").convert("P") for f in v]
        buf = io.BytesIO()
        imgs[0].save(buf, format="GIF", save_all=True,
                     append_images=imgs[1:],
                     duration=max(1, int(1000 / fps)), loop=0)
        img = Summary.Image(height=v.shape[1], width=v.shape[2], colorspace=1,
                            encoded_image_string=buf.getvalue())
        self._tb.file_writer.add_summary(
            Summary(value=[Summary.Value(tag=tag, image=img)]), step)

    def close(self):
        self._jsonl.close()
        if self._tb:
            self._tb.close()


class Trainer:
    """Config-driven trainer for unrolled reconstruction models."""

    def __init__(self, cfg, use_ema: bool = False, ema_decay: float = 0.9999,
                 mesh=None, steps_per_epoch_hint: int = 1):
        self.cfg = cfg
        self.use_ema = use_ema
        self.ema_decay = ema_decay
        fsdp_axis = cfg.PARALLEL.FSDP_AXIS
        if str(cfg.MODEL.STRATEGY).lower() == "fsdp" and fsdp_axis == 1:
            # STRATEGY fsdp (the DeepSpeed-ZeRO-3 replacement) defaults to
            # sharding parameters across every available chip
            import jax as _jax
            fsdp_axis = max(1, len(_jax.devices()) // max(1, cfg.PARALLEL.DATA_AXIS))
        self.mesh = mesh if mesh is not None else make_mesh(
            data=cfg.PARALLEL.DATA_AXIS, fsdp=fsdp_axis,
            model=cfg.PARALLEL.MODEL_AXIS)
        self._build_models(cfg)
        self.steps_per_epoch = steps_per_epoch_hint  # fit() overwrites with len(loader)
        self.tx = make_optimizer(cfg, steps_per_epoch=steps_per_epoch_hint)
        self.loss_name = cfg.MODEL.RECON_LOSS.NAME
        self.loss_weight = cfg.MODEL.RECON_LOSS.LOSS_WEIGHT
        self.renormalize = cfg.MODEL.RECON_LOSS.RENORMALIZE_DATA
        self.perceptual = None
        if "vggloss" in self.loss_name:
            from dl_swin_gan_tpu.train.perceptual import PerceptualLoss
            self.perceptual = PerceptualLoss()
        self._train_step = None
        self._val_step = None

    def _build_models(self, cfg):
        # eval model is deterministic; train model enables dropout/drop-path
        self.model = build_solver(cfg, lambda: build_denoiser(cfg))
        self.train_model = build_solver(
            cfg, lambda: build_denoiser(cfg, deterministic=False))

    def set_steps_per_epoch(self, n: int) -> None:
        """Rebuild optimizer(s) for per-epoch StepLR once the dataset is known."""
        self.steps_per_epoch = max(1, n)
        self.tx = make_optimizer(self.cfg, steps_per_epoch=self.steps_per_epoch)

    def make_preprocess(self, aug_node=None, use_seed=False):
        return CinePreprocess(self.cfg, aug_node=aug_node, use_seed=use_seed)

    def _extra_metrics(self, params):
        """Scalar learnables worth logging (reference logs DSLR lambdas,
        train_lr.py:80-113, and the PGD step size)."""
        out = {}
        for name, tag in (("step_size", "StepSize"), ("lamda", "Lambda/MoDL"),
                          ("lambda_l", "Lambda/L"), ("lambda_r", "Lambda/R")):
            if isinstance(params, dict) and name in params:
                out[tag] = params[name][0]
        return out

    # -- model application on an unpacked batch ------------------------------
    def _apply(self, params, batch, train: bool = False, rngs=None):
        model = self.train_model if train else self.model
        return model.apply(
            {"params": params}, batch["kspace"], batch["maps"], batch["mask"],
            x0=batch.get("init_image"), rngs=rngs)

    def _metrics(self, pred, batch, tag):
        target = batch["target"]
        if self.renormalize:
            scale = batch["scale"].reshape((-1,) + (1,) * (pred.ndim - 1))
            pred = pred * scale
            target = target * scale
        return compute_metrics(pred, target, weight=self.loss_weight, tag=tag,
                               perceptual=self.perceptual)

    # -- jitted steps ---------------------------------------------------------
    def init_state(self, sample_batch: dict, seed: Optional[int] = None) -> TrainState:
        """Initialize (params, opt_state, ema) sharded over the mesh."""
        seed = self.cfg.SEED if seed is None else seed
        packed = packing.pack(sample_batch)

        def _init(packed_batch):
            batch = packing.unpack(packed_batch)
            params = self.model.init(
                jax.random.PRNGKey(seed), batch["kspace"], batch["maps"],
                batch["mask"], x0=batch.get("init_image"))["params"]
            opt_state = self.tx.init(params)
            ema = jax.tree.map(lambda p: p, params) if self.use_ema else {}
            return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                              opt_state=opt_state, ema_params=ema)

        abstract = jax.eval_shape(_init, packed)
        shardings = fsdp_shardings(abstract, self.mesh)
        init_jit = jax.jit(_init, out_shardings=shardings)
        state = init_jit(shard_batch(packed, self.mesh))
        state = self._maybe_import_pretrained(state, shardings)
        self._state_shardings = shardings
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree.leaves(abstract.params))
        logger.info("initialized %s params=%.3fM mesh=%s",
                    self.cfg.MODEL.MODEL_TYPE, n_params / 1e6,
                    dict(self.mesh.shape))
        return state

    def _maybe_import_pretrained(self, state: "TrainState", shardings):
        """Seed the Swin trunks from a 2D Swin checkpoint when
        MODEL.PARAMETERS.PRETRAINED is set (reference
        video_swin_transformer_mri_downsample.py:651-700 inflate path).
        One-time host round trip at init; EMA restarts from the imported
        params."""
        path = getattr(self.cfg.MODEL.PARAMETERS, "PRETRAINED", "")
        if not path:
            return state
        if self.cfg.MODEL.MODEL_TYPE != "SWIN":
            logger.warning("PRETRAINED set but MODEL_TYPE=%s is not SWIN; "
                           "ignoring", self.cfg.MODEL.MODEL_TYPE)
            return state
        from dl_swin_gan_tpu.models.swin_import import import_swin2d_checkpoint

        params = jax.tree.map(np.asarray, jax.device_get(state.params))
        stage = self.cfg.MODEL.PARAMETERS.PRETRAINED_STAGE
        total = {"loaded": 0, "skipped": 0, "missing": 0}
        for net in [k for k in params if k.startswith("SwinNet3D_")]:
            for trunk in [k for k in params[net]
                          if k.startswith("SwinTransformer3D_")]:
                sub = params[net][trunk]
                patch_t = sub["patch_embed"]["kernel"].shape[0]
                # the wrapper hardcodes the inner window (swin3D.py:315)
                report = import_swin2d_checkpoint(
                    sub, path, window_size=(7, 8, 8), patch_t=patch_t,
                    stage_map=None if stage < 0 else {0: stage})
                for k in total:
                    total[k] += len(report[k])
        logger.info("pretrained Swin import (%s): %s", path, total)
        params = jax.device_put(params, shardings.params)
        ema = (jax.tree.map(lambda p: p, params) if self.use_ema
               else state.ema_params)
        return TrainState(step=state.step, params=params,
                          opt_state=state.opt_state, ema_params=ema)

    def _build_steps(self):
        base_key = jax.random.PRNGKey(self.cfg.SEED + 17)

        def train_step(state: TrainState, packed_batch):
            batch = packing.unpack(packed_batch)
            rngs = {"dropout": jax.random.fold_in(base_key, state.step)}

            def loss_fn(params):
                pred = self._apply(params, batch, train=True, rngs=rngs)
                metrics = self._metrics(pred, batch, "Train")
                return select_loss(metrics, self.loss_name, "Train"), metrics

            grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
            metrics.update(self._extra_metrics(state.params))
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = jax.tree.map(lambda p, u: p + u, state.params, updates)
            ema = (ema_update(state.ema_params, params, self.ema_decay)
                   if self.use_ema else state.ema_params)
            new_state = TrainState(step=state.step + 1, params=params,
                                   opt_state=opt_state, ema_params=ema)
            return new_state, metrics

        def val_step(params, packed_batch):
            batch = packing.unpack(packed_batch)
            pred = self._apply(params, batch)
            metrics = self._metrics(pred, batch, "Validate")
            return metrics, packing.pack_jnp(pred)

        self._train_step = jax.jit(train_step, donate_argnums=0)
        self._val_step = jax.jit(val_step)

    # -- the loop --------------------------------------------------------------
    supports_device_pipeline = True

    def _device_pipeline_kwargs(self) -> dict:
        """Extra DevicePipelineLoader kwargs (DSLRTrainer: lr_decom)."""
        return {}

    def _use_device_pipeline(self) -> bool:
        import numpy as _np
        return (bool(self.cfg.DATALOADER.DEVICE_PIPELINE)
                and self.supports_device_pipeline
                and self.cfg.DATALOADER.TRAIN_BATCH_SIZE == 1
                and int(_np.prod(list(self.mesh.devices.shape))) == 1)

    def fit(self, train_dir: Optional[str] = None, val_dir: Optional[str] = None,
            max_epochs: Optional[int] = None, resume: bool = False) -> TrainState:
        cfg = self.cfg
        train_dir = train_dir or cfg.DATASET.TRAIN[0]
        val_dir = val_dir or (cfg.DATASET.VAL[0] if cfg.DATASET.VAL else None)
        max_epochs = max_epochs or cfg.OPTIMIZER.MAX_EPOCHS

        use_dp = self._use_device_pipeline()
        if use_dp:
            from dl_swin_gan_tpu.data.device_pipeline import DevicePipelineLoader
            train_loader = DevicePipelineLoader(
                train_dir, cfg, use_seed=False, shuffle=True, seed=cfg.SEED,
                sample_rate=cfg.DATALOADER.SUBSAMPLE,
                **self._device_pipeline_kwargs())
        else:
            train_data = Hdf5Dataset(
                train_dir, self.make_preprocess(use_seed=False),
                sample_rate=cfg.DATALOADER.SUBSAMPLE)
            train_loader = DataLoader(train_data,
                                      batch_size=cfg.DATALOADER.TRAIN_BATCH_SIZE,
                                      num_workers=cfg.DATALOADER.NUM_WORKERS,
                                      prefetch=cfg.DATALOADER.PREFETCH,
                                      shuffle=True, seed=cfg.SEED)
        val_loader = None
        if val_dir:
            val_data = Hdf5Dataset(
                val_dir, self.make_preprocess(aug_node=cfg.AUG_VAL, use_seed=True))
            val_loader = DataLoader(val_data,
                                    batch_size=cfg.DATALOADER.VAL_BATCH_SIZE,
                                    num_workers=cfg.DATALOADER.NUM_WORKERS,
                                    shuffle=False, drop_last=False)

        # StepLR decays per EPOCH (reference train.py:148-151) — now that the
        # dataset is known, rebuild the optimizer with the real epoch length
        # (the __init__ hint defaults to 1, which would decay per step).
        self.set_steps_per_epoch(len(train_loader))

        sample = (train_loader.host_sample() if use_dp
                  else next(iter(train_loader)))
        state = self.init_state(sample)
        self._build_steps()

        writer = MetricsWriter(cfg.OUTPUT_DIR)
        monitor = cfg.EVAL.MONITOR or f"Validate/{self.loss_name}"
        ckpt = CheckpointManager(
            os.path.join(cfg.OUTPUT_DIR, "checkpoints"), monitor=monitor,
            mode=("max" if ("ssim" in monitor.lower()
                            or "psnr" in monitor.lower()) else "min"))
        start_epoch = 0
        if resume and ckpt.latest_step() is not None:
            state = ckpt.restore(state)
            # restore the epoch clock too, so MAX_EPOCHS / RUN_EVERY_N_EPOCHS
            # keep their meaning across crash-resumes (torch Lightning
            # restores current_epoch; we derive it from the step counter).
            # Mid-epoch checkpoints floor to the epoch start, so the partial
            # epoch replays and the run can overshoot MAX_EPOCHS*steps_per_
            # epoch by up to one epoch of steps — accepted crash-resume
            # semantics (replayed batches are reshuffled, not repeated).
            start_epoch = int(state.step) // max(1, self.steps_per_epoch)
            logger.info("resumed from step %d (epoch %d)", int(state.step),
                        start_epoch)

        log_every = cfg.LOGGER.LOG_METRICS_EVERY_N_STEPS
        img_every = cfg.LOGGER.LOG_IMAGES_EVERY_N_STEPS
        t_start, steps_done = time.perf_counter(), 0
        # host-side step counter: int(state.step) every iteration would be a
        # per-step device->host read that serializes jax's async dispatch
        # (costly on high-latency links); the device counter stays
        # authoritative for checkpoint/resume
        host_step = int(state.step)

        # jax.profiler trace (reference: Lightning AdvancedProfiler,
        # train_DiT.py:500) — enabled via env DL_SWIN_GAN_PROFILE=<dir>
        profile_dir = os.environ.get("DL_SWIN_GAN_PROFILE")
        if profile_dir:
            jax.profiler.start_trace(profile_dir)
            logger.info("jax profiler tracing to %s", profile_dir)

        def device_batches(loader):
            """Overlap host->device transfer with compute: device_put is
            async, so uploading batch N+1 while step N executes hides the
            transfer (the relay's H2D path is slow; see CLAUDE.md)."""
            it = iter(loader)
            try:
                nxt = shard_batch(packing.pack(next(it)), self.mesh)
            except StopIteration:
                return
            for batch in it:
                cur, nxt = nxt, shard_batch(packing.pack(batch), self.mesh)
                yield cur
            yield nxt

        for epoch in range(start_epoch, max_epochs):
            # DevicePipelineLoader already yields packed device batches
            for packed in (train_loader if use_dp
                           else device_batches(train_loader)):
                state, metrics = self._train_step(state, packed)
                steps_done += 1
                host_step += 1
                step = host_step
                if profile_dir and steps_done == 10:
                    jax.profiler.stop_trace()
                    logger.info("profiler trace written to %s", profile_dir)
                    profile_dir = None
                if img_every and step % img_every == 0 and self._val_step:
                    # qualitative magnitude/phase/error videos + mask image
                    # (reference log_data, train.py:73-101)
                    _, packed_pred = self._val_step(self._val_params(state),
                                                    packed)
                    self._log_videos(writer, step, packed, packed_pred)
                if step % log_every == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    dt = time.perf_counter() - t_start
                    m["Train/steps_per_sec"] = steps_done / dt
                    writer.scalars(step, m)
                    logger.info("epoch %d step %d %s=%.5f (%.2f it/s)", epoch,
                                step, self.loss_name,
                                m[f"Train/{self.loss_name}"],
                                m["Train/steps_per_sec"])
                ckpt_steps = cfg.EVAL.CKPT_EVERY_N_STEPS
                if ckpt_steps and step % ckpt_steps == 0:
                    ckpt.save(step, state)

            if val_loader and (epoch + 1) % cfg.EVAL.RUN_EVERY_N_EPOCHS == 0:
                val_metrics = self.validate(state, val_loader, writer)
                ckpt.save(int(state.step), state, metrics=val_metrics)

        # final state always banked: trailing epochs after the last
        # interval/validation save would otherwise be silently discarded
        # (the duplicate-step guard makes this a no-op when already saved)
        ckpt.save(int(state.step), state)
        ckpt.close()
        writer.close()
        return state

    def _val_params(self, state):
        """Params used for validation (GANTrainer overrides: generator)."""
        return state.params

    def _log_videos(self, writer: MetricsWriter, step: int, packed_batch,
                    packed_pred) -> None:
        """Reference log_data parity (train.py:73-101): init|pred|target
        magnitude + phase videos, |pred|-|target| error video, mask image."""
        b = packing.unpack_np(packed_batch)
        pred = packing.unpack_np(packed_pred)
        init = b.get("init_image", np.zeros_like(pred))
        target = b["target"]
        if self.renormalize:
            scale = b["scale"].reshape((-1,) + (1,) * (pred.ndim - 1))
            pred, init, target = pred * scale, init * scale, target * scale
        images = np.concatenate([init, pred, target], axis=3)[:, 0]  # [N,t,y,x]
        err = np.abs(pred[:, 0]) - np.abs(target[:, 0])
        writer.video(step, "Magnitude", np.abs(images[0]))
        writer.video(step, "Phase", np.angle(images[0]))
        writer.video(step, "MagnitudeError", np.abs(err[0]))
        if "mask" in b:
            writer.image(step, "Mask", np.abs(b["mask"][0, 0, :, :, -1]))

    def validate(self, state: TrainState, val_loader,
                 writer: Optional[MetricsWriter] = None) -> Dict[str, float]:
        if self._val_step is None:
            self._build_steps()
        acc: Dict[str, list] = {}
        last = None
        params = self._val_params(state)
        for batch in val_loader:
            # drop_last=False: the epoch's last batch can be ragged
            packed = shard_batch_or_replicate(packing.pack(batch), self.mesh)
            metrics, packed_pred = self._val_step(params, packed)
            last = (packed, packed_pred)
            for k, v in metrics.items():
                acc.setdefault(k, []).append(float(v))
        out = {k: float(np.mean(v)) for k, v in acc.items()}
        step = int(state.step)
        if writer is not None:
            writer.scalars(step, out)
            if last is not None:
                pred = packing.unpack_np(last[1])
                frames = np.abs(pred[0, 0])  # [T, Y, X]
                strip = np.concatenate(list(frames[:8]), axis=1)
                writer.image(step, "Validate/magnitude", strip)
                self._log_videos(writer, step, *last)
        logger.info("validate step %d: %s", step,
                    {k: round(v, 5) for k, v in out.items()})
        return out
