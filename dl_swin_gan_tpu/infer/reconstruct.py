"""Batched jit reconstruction + H5/CFL frontends.

TPU-native counterpart of reference `scripts/reconstruct.py` (CFL) and
`scripts/reconstruct_h5.py` (H5): load checkpoint, preprocess per slice,
run the unrolled model, rescale, write CFL in the scanner dim order. The
reference's nn.DataParallel complex workaround disappears — batches shard
over the mesh 'data' axis and complex stays inside jit.
"""

import logging
import os
import time
from typing import Optional

import jax
import numpy as np

from dl_swin_gan_tpu.data import cfl
from dl_swin_gan_tpu.infer.transforms import InferenceTransform, ResampleTransform
from dl_swin_gan_tpu.models import build_denoiser
from dl_swin_gan_tpu.solvers import build_solver
from dl_swin_gan_tpu.train import packing

logger = logging.getLogger(__name__)


def load_checkpoint_params(ckpt_dir: str, step: Optional[int] = None,
                           use_ema: bool = False):
    """Restore raw params (or EMA params) from an orbax checkpoint dir."""
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(os.path.abspath(ckpt_dir)) as mgr:
        step = step if step is not None else mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoint found in {ckpt_dir}")
        restored = mgr.restore(step, args=ocp.args.StandardRestore())
    if use_ema and restored.get("ema_params"):
        params = restored["ema_params"]
    elif "params" in restored:
        params = restored["params"]
    else:
        # GANTrainState checkpoints: reconstruct with the generator
        params = restored["g_params"]
    logger.info("loaded checkpoint step %s from %s (ema=%s)", step, ckpt_dir,
                use_ema)
    return params


def _jit_data_parallel(fn, mesh, n_args):
    """jit with the 2nd arg (the packed batch) sharded over 'data' and every
    other arg replicated; plain jit when mesh is None."""
    if mesh is None:
        return jax.jit(fn)
    from dl_swin_gan_tpu.parallel.mesh import batch_sharding, replicated
    shardings = [replicated(mesh)] * n_args
    shardings[1] = batch_sharding(mesh)
    return jax.jit(fn, in_shardings=tuple(shardings),
                   out_shardings=batch_sharding(mesh))


def _pad_pack_shard(batch: dict, mesh):
    """Pad-replicate a ragged batch to the data-axis extent, pack, shard.
    Returns (packed, real_batch_size)."""
    n = int(mesh.shape["data"]) if mesh is not None else 1
    b = next(iter(batch.values())).shape[0]
    pad = (-b) % n
    if pad:
        batch = {k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
                 for k, v in batch.items()}
    packed = packing.pack(batch)
    if mesh is not None:
        from dl_swin_gan_tpu.parallel.mesh import shard_batch
        packed = shard_batch(packed, mesh)
    return packed, b


def _replicate_params(params, mesh):
    if mesh is None:
        return params
    from dl_swin_gan_tpu.parallel.mesh import replicated
    return jax.device_put(params, replicated(mesh))


class Reconstructor:
    """Jitted reconstruction closed over a config-built unrolled model.

    With ``mesh`` (any mesh carrying a 'data' axis), the batch shards over
    'data' and params replicate — the TPU-native counterpart of the
    reference's `nn.DataParallel` inference fan-out
    (reference scripts/reconstruct.py:199-202, reconstruct_h5.py:409-412),
    minus its complex64 view_as_real workaround: complex stays inside jit.
    Batches that don't divide the data-axis extent are pad-replicated and
    cropped after.
    """

    def __init__(self, cfg, params, mesh=None):
        self.cfg = cfg
        self.model = build_solver(cfg, lambda: build_denoiser(cfg))
        self.mesh = mesh
        self.params = _replicate_params(params, mesh)

        def _recon(params, packed):
            b = packing.unpack(packed)
            pred = self.model.apply({"params": params}, b["kspace"], b["maps"],
                                    b["mask"], x0=b["init_image"])
            scale = b["scale"].reshape((-1,) + (1,) * (pred.ndim - 1))
            return packing.pack_jnp(pred * scale)

        self._recon = _jit_data_parallel(_recon, mesh, n_args=2)

    def __call__(self, batch: dict) -> np.ndarray:
        """batch: dict of stacked numpy example arrays -> complex images."""
        packed, b = _pad_pack_shard(batch, self.mesh)
        out = self._recon(self.params, packed)
        return packing.unpack_np(out).astype(np.complex64)[:b]


class DiffusionReconstructor:
    """Conditional hard-DC sampling reconstruction for DiT/Latte checkpoints.

    The reference has NO diffusion inference script — conditional sampling
    only happens inside training logging (train_DiT.py:283-291). This
    productizes the same `p_sample_loop_conditional` chain (100 respaced
    steps by default) as a first-class inference path: one compiled
    `lax.scan` over the reverse process, hard k-space data consistency
    after every step except t=0 (gaussian_diffusion.py:524-632).

    With ``mesh``, batches shard over the 'data' axis like Reconstructor.
    JAX's counter-based RNG makes sharded == single-device bit-stable at
    equal batch shapes; a pad-replicated ragged batch draws a different
    (equally distributed) ancestral noise sequence than the unpadded run.
    """

    def __init__(self, cfg, params, sample_steps: int = 100, seed: int = 0,
                 mesh=None):
        from dl_swin_gan_tpu.diffusion import create_diffusion
        from dl_swin_gan_tpu.ops.sense import SenseOp
        from dl_swin_gan_tpu.solvers.diffusion_unrolled import (
            build_diffusion_solver,
        )
        from dl_swin_gan_tpu.train.diffusion_trainer import (
            make_diffusion_denoiser_factory,
        )
        import jax.numpy as jnp

        p = cfg.MODEL.PARAMETERS
        self.params = params
        self.seed = seed
        self.model = build_diffusion_solver(
            cfg, make_diffusion_denoiser_factory(cfg, deterministic=True))
        predict_xstart = cfg.MODEL.META_ARCHITECTURE.lower() != "ddpm_e"
        # fresh short process for sampling (train_DiT.py:125-130)
        self.diffusion = create_diffusion(
            timestep_respacing="", noise_schedule=p.NOISE_SCHED,
            diffusion_steps=sample_steps, learn_sigma=p.LEARN_SIGMA,
            predict_xstart=predict_xstart)

        def _recon(params, packed, key):
            b = packing.unpack(packed)

            def model_fn(x, t, **kw):
                return self.model.apply({"params": params}, x, t, **kw)

            kwargs = dict(
                A=SenseOp(b["maps"], b["mask"]),
                A_1=SenseOp(b["maps"], 1.0 - b["mask"]),
                A_F=SenseOp(b["maps"], None),
                A_S=SenseOp(b["maps"], b["mask"]),
                c=jnp.ones((b["init_image"].shape[0],), jnp.int32),
            )
            gen = self.diffusion.p_sample_loop_conditional(
                key, model_fn, b["init_image"], kwargs, clip_denoised=False)
            scale = b["scale"].reshape((-1,) + (1,) * (gen.ndim - 1))
            return packing.pack_jnp(gen * scale)

        self.mesh = mesh
        # PRNG key replicates so per-slice noise matches the single-device
        # chain at equal batch shapes
        self.params = _replicate_params(self.params, mesh)
        self._recon = _jit_data_parallel(_recon, mesh, n_args=3)

    def __call__(self, batch: dict) -> np.ndarray:
        batch = {k: v for k, v in batch.items() if k != "kspace"}  # unused
        packed, b = _pad_pack_shard(batch, self.mesh)
        out = self._recon(self.params, packed, jax.random.PRNGKey(self.seed))
        return packing.unpack_np(out).astype(np.complex64)[:b]


def _batched(examples, batch_size):
    for i in range(0, len(examples), batch_size):
        chunk = examples[i:i + batch_size]
        yield {k: np.stack([ex[k] for ex in chunk]) for k in chunk[0]}


def reconstruct_h5_file(h5_path: str, out_directory: str, cfg, params,
                        acceleration: float = 1, batch_size: int = 1,
                        sample_steps: int = 100, mesh=None) -> str:
    """Reconstruct one prepared H5 file; writes `<name>_<R>accel.im` CFL.

    accel > 1: re-undersample at the parity seed (reconstruct_h5.py:417-420).
    accel == 1: write the fully-sampled adjoint recon (reconstruct_h5.py:456-458).
    """
    import h5py

    name = os.path.splitext(os.path.basename(h5_path))[0]
    accel_str = (str(int(acceleration)) if float(acceleration).is_integer()
                 else str(acceleration))
    out_path = os.path.join(out_directory, f"{name}_{accel_str}accel.im")
    os.makedirs(out_directory, exist_ok=True)

    if acceleration > 1:
        transform = ResampleTransform(acceleration, cfg)
    else:
        transform = InferenceTransform(cfg, apply_fftmod=False)

    with h5py.File(h5_path, "r") as f:
        n_slices = f["kspace"].shape[0]
        examples = [transform(f["kspace"][s], f["maps"][s])
                    for s in range(n_slices)]

    recon = None
    if acceleration > 1:
        if cfg.MODEL.MODEL_TYPE.upper() in ("DIT", "LATTE"):
            recon = DiffusionReconstructor(cfg, params,
                                           sample_steps=sample_steps,
                                           mesh=mesh)
        else:
            recon = Reconstructor(cfg, params, mesh=mesh)

    t0 = time.perf_counter()
    out = []
    for batch in _batched(examples, batch_size):
        if acceleration > 1:
            out.append(recon(batch))
        else:
            scale = batch["scale"].reshape((-1, 1, 1, 1, 1))
            out.append((scale * batch["init_image"]).astype(np.complex64))
    images = np.concatenate(out, axis=0)  # [slices, E, T, Y, X]
    logger.info("reconstructed %s: %d slices in %.2fs", name, len(images),
                time.perf_counter() - t0)

    # scanner dim order [x, y, sl, emap, ph] + singleton tail
    # (reconstruct_h5.py:219-231 write)
    images = np.transpose(images, (4, 3, 0, 1, 2))
    images = images[:, :, :, :, :, None, None, None]
    cfl.write(out_path, images, order="F")
    return out_path


def reconstruct_cfl(file_ks: str, file_maps: str, file_im: str, cfg, params,
                    batch_size: int = 1, mesh=None) -> str:
    """Reconstruct scanner CFL k-space (BART dims) — the deployment path.

    Mirrors reference CflDataset (reconstruct.py:57-120): BART dims
    (kx, ky, slice, coil, emap, echo, _, phase) -> per-(slice, echo)
    examples; fftmod applied; output written back in scanner dim order.
    """
    kspace = cfl.read(file_ks, order="F")
    maps = cfl.read(file_maps, order="F")

    shape_x, shape_y = kspace.shape[0], kspace.shape[1]
    num_slices, num_coils = kspace.shape[2], kspace.shape[3]
    num_echoes = kspace.shape[5] if kspace.ndim > 5 else 1
    num_phases = kspace.shape[7] if kspace.ndim > 7 else 1
    num_emaps = maps.shape[4] if maps.ndim > 4 else 1

    kspace = kspace.reshape(shape_x, shape_y, num_slices, num_coils,
                            num_echoes, num_phases)
    maps = maps.reshape(shape_x, shape_y, num_slices, 1, num_coils, num_emaps)
    kspace = np.transpose(kspace, (2, 4, 3, 5, 1, 0))  # [sl, ec, coil, ph, y, x]
    maps = np.transpose(maps, (2, 5, 4, 3, 1, 0))      # [sl, em, coil, 1, y, x]

    transform = InferenceTransform(cfg, apply_fftmod=True)
    # slice-major to match the (num_slices, num_echoes, ...) output reshape
    # below. Deliberate divergence: the reference builds its example list
    # echo-major but reshapes slice-major (reconstruct.py:92-107), silently
    # scrambling slice/echo assignment whenever both counts exceed 1.
    examples = [transform(kspace[sl, ec], maps[sl])
                for sl in range(num_slices) for ec in range(num_echoes)]

    recon = Reconstructor(cfg, params, mesh=mesh)
    t0 = time.perf_counter()
    out = [recon(b) for b in _batched(examples, batch_size)]
    images = np.concatenate(out, axis=0)
    logger.info("reconstructed %s: %d examples in %.2fs", file_ks,
                len(images), time.perf_counter() - t0)

    image_dims = (num_slices, num_echoes, num_emaps, num_phases,
                  shape_y, shape_x)
    images = images.reshape(image_dims)
    images = np.transpose(images, (5, 4, 0, 2, 1, 3))  # [x, y, sl, em, ec, ph]
    images = images[:, :, :, None, :, :, None, :]
    cfl.write(file_im, images, order="F")
    return file_im
