"""Device-resident training input pipeline.

The host CinePreprocess (reference `dl_cs/data/preprocess.py:31-180`
semantics) ships ~20 MB of kspace/maps/target per step to the device. On a
fast PCIe link that's noise; through a slow host->device path it IS the
training throughput (measured on the axon relay: diffusion train steps run
22x faster device-resident than host-fed — see CLAUDE.md). This pipeline
moves the physics on-device:

  - raw `kspace`/`maps` for every (file, slice) example upload ONCE;
  - per step only the VDkt mask (uint8, ~0.2 MB) plus a handful of
    augmentation scalars cross the link;
  - the FFT crop/flip round-trip, SENSE adjoint target, 95th-percentile
    normalization, and sliding-window init run inside one jitted function
    (numerically equivalent to CinePreprocess — tested in
    tests/test_device_pipeline.py).

Host RNG draw order exactly mirrors `CinePreprocess._augment` + `subsample`
so seeded (validation/parity) masks and crops are bit-identical. The VDkt
generator itself stays host-side numpy — it is sequential, branch-heavy,
and tiny (the reference keeps it in DataLoader workers for the same reason,
`subsample.py:122-254`).
"""

import logging
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from dl_swin_gan_tpu.ops import masks as ss
from dl_swin_gan_tpu.ops.fft import fftc, ifftc
from dl_swin_gan_tpu.ops.sense import sense_adjoint
from dl_swin_gan_tpu.train import packing

logger = logging.getLogger(__name__)


def _time_average(data, axis, eps=1e-6):
    """jnp twin of host_ops.time_average (masked mean over nonzero samples)."""
    nz = (jnp.abs(data) > 1e-12).astype(jnp.float32)
    return data.sum(axis, keepdims=True) / (nz.sum(axis, keepdims=True) + eps)


def _sliding_window(data, window_size: int):
    """jnp twin of host_ops.sliding_window (circular view sharing, axis=2)."""
    nt = data.shape[2]
    out = []
    for i in range(nt):
        shifted = jnp.roll(data, int(window_size / 2) - i, axis=2)
        out.append(_time_average(shifted[:, :, :window_size], 2))
    return jnp.concatenate(out, axis=2)


def _maybe_flip(x, flag, axis):
    return jnp.where(flag > 0, jnp.flip(x, axis=axis), x)


class DevicePipeline:
    """Builds network-ready batches on device from cached raw examples."""

    def __init__(self, cfg, aug_node=None, use_seed: bool = False,
                 diffusion: bool = False, lr_decom: bool = False):
        self.cfg = cfg
        self.use_seed = use_seed
        self.diffusion = diffusion
        self.lr_decom = lr_decom
        self.rng = np.random.RandomState()
        aug = aug_node if aug_node is not None else cfg.AUG_TRAIN
        self.aug = aug
        self.mask_func = ss.VDktMaskFunc(
            aug.UNDERSAMPLE.ACCELERATIONS,
            sim_partial_kx=aug.UNDERSAMPLE.PARTIAL_KX,
            sim_partial_ky=aug.UNDERSAMPLE.PARTIAL_KY,
        )
        self.slwin_init = cfg.MODEL.PARAMETERS.SLWIN_INIT
        self.submask_rng = np.random.RandomState(cfg.SEED + 99)
        self._jit_build = jax.jit(self._build)

    # -- one-time upload ------------------------------------------------------
    def upload_raw(self, kspace: np.ndarray, maps: np.ndarray) -> Dict:
        """Pack + device_put one raw example ([C,T,Y,X], [E,C,1,Y,X])."""
        raw = packing.pack({"kspace": np.asarray(kspace)[None],
                            "maps": np.asarray(maps)[None]})
        return jax.tree.map(jax.device_put, raw)

    # -- per-step host draws (CinePreprocess._augment RNG order) --------------
    def draw_params(self, fname: str, raw_shape: Tuple[int, ...]) -> Dict:
        """Crop starts, flips, and the VDkt mask for one step.

        raw_shape: [C, T, Y, X] of the raw (pre-crop) k-space.
        """
        seed = None if not self.use_seed else tuple(map(ord, fname))
        self.rng.seed(seed)
        _, T, Y, X = raw_shape

        xs = 0
        crop_x = self.aug.CROP_READOUT
        if crop_x > 0:
            center = int(self.rng.normal(loc=X // 2 + 1, scale=crop_x // 2))
            center = int(np.clip(center, crop_x // 2, X - crop_x // 2 - 1))
            xs = center - crop_x // 2 + 1
            X = crop_x
        ys = 0
        crop_y = self.aug.ZPAD_PE
        if crop_y > 0:
            center = int(self.rng.normal(loc=Y // 2 + 1, scale=crop_y // 2))
            center = int(np.clip(center, crop_y // 2, Y - crop_y // 2 - 1))
            ys = center - crop_y // 2 + 1
            Y = crop_y
        flips = np.asarray([self.rng.rand() > 0.5 for _ in range(3)],
                           np.float32)

        mask = self.mask_func((1, 1, T, Y, X), seed).astype(np.uint8)
        out = dict(xs=np.int32(xs), ys=np.int32(ys), flips=flips, mask=mask)
        if self.diffusion and \
                self.cfg.MODEL.META_ARCHITECTURE.lower() == "ddpm_x":
            from dl_swin_gan_tpu.train.diffusion_trainer import submask_np
            mask_r, mask_p = submask_np(mask.astype(np.float32), 0.9,
                                        self.submask_rng)
            out["mask_r"] = mask_r.astype(np.uint8)
            out["mask_p"] = mask_p.astype(np.uint8)
        return out

    # -- the jitted device build ----------------------------------------------
    def _build(self, raw, mask_u8, xs, ys, flips, mask_r_u8, mask_p_u8):
        kspace = packing.unpack(raw["kspace"])   # [1, C, T, Y, X]
        maps = packing.unpack(raw["maps"])       # [1, E, C, 1, Y, X]

        multicoil = ifftc(kspace)
        crop_x = self.aug.CROP_READOUT
        if crop_x > 0:
            multicoil = jax.lax.dynamic_slice_in_dim(multicoil, xs, crop_x, -1)
            maps = jax.lax.dynamic_slice_in_dim(maps, xs, crop_x, -1)
        crop_y = self.aug.ZPAD_PE
        if crop_y > 0:
            multicoil = jax.lax.dynamic_slice_in_dim(multicoil, ys, crop_y, -2)
            maps = jax.lax.dynamic_slice_in_dim(maps, ys, crop_y, -2)
        multicoil = _maybe_flip(multicoil, flips[0], -1)
        maps = _maybe_flip(maps, flips[0], -1)
        multicoil = _maybe_flip(multicoil, flips[1], -2)
        maps = _maybe_flip(maps, flips[1], -2)
        multicoil = _maybe_flip(multicoil, flips[2], -3)  # time; maps static
        kspace = fftc(multicoil)

        target = sense_adjoint(kspace, maps)
        mask = mask_u8.astype(jnp.float32)
        masked_kspace = kspace * mask

        # 95th-percentile magnitude normalization (preprocess.py:149-157):
        # k-th largest of the time-averaged adjoint magnitude
        averaged = _time_average(masked_kspace, 2)
        image = sense_adjoint(averaged, maps)
        magnitude = jnp.abs(image).reshape(-1)
        k = int(round(0.05 * magnitude.size))
        scale = (jax.lax.top_k(magnitude, k)[0][-1] if k > 0
                 else magnitude.max())

        masked_kspace = masked_kspace / scale
        target = target / scale

        init_kspace = (_sliding_window(masked_kspace, 5) if self.slwin_init
                       else masked_kspace)
        init_image = sense_adjoint(init_kspace, maps)

        out = dict(kspace=masked_kspace, mask=mask, maps=maps,
                   init_image=init_image,
                   scale=scale.astype(jnp.float32).reshape(1),
                   target=target)
        if self.lr_decom:
            # DSLR L0/R0 init on device: jnp.linalg.svd runs on TPU, so the
            # truncated block SVD the host loader pays per step
            # (preprocess.py:166-168 semantics) fuses into the build. SVD
            # factor phases differ from the numpy host path (both valid —
            # LR^H is identical; the reference's torch CPU SVD picks a third
            # phase convention).
            from dl_swin_gan_tpu.ops.llr import BlockOp, decompose
            p = self.cfg.MODEL.PARAMETERS
            op = BlockOp(p.DSLR.BLOCK_SIZE, init_image.shape,
                         overlapping=p.DSLR.OVERLAPPING)
            L, R = decompose(op.extract(init_image), p.DSLR.NUM_BASIS)
            out["L_init"] = L[None].astype(jnp.complex64)
            out["R_init"] = R[None].astype(jnp.complex64)
        if self.diffusion:
            # the diffusion paths never consume raw k-space
            # (DiffusionTrainer.prepare_batch) — don't materialize it
            del out["kspace"]
            out["mask_r"] = mask_r_u8.astype(jnp.float32)
            out["mask_p"] = mask_p_u8.astype(jnp.float32)
        return packing.pack_jnp(out)

    def build(self, raw: Dict, params: Dict):
        """One packed device batch from a cached raw example + host draws."""
        mask_r = params.get("mask_r", params["mask"])
        mask_p = params.get("mask_p", params["mask"])
        return self._jit_build(raw, params["mask"], params["xs"], params["ys"],
                               params["flips"], mask_r, mask_p)


class DevicePipelineLoader:
    """Drop-in replacement for (Hdf5Dataset + DataLoader) yielding packed
    DEVICE batches; batch_size=1 (the reference's cine protocol and every
    committed quality config). Raw examples are uploaded once at
    construction; each epoch reshuffles like DataLoader does."""

    def __init__(self, root_directory: str, cfg, aug_node=None,
                 use_seed: bool = False, diffusion: bool = False,
                 lr_decom: bool = False, shuffle: bool = True,
                 seed: Optional[int] = None, sample_rate: float = 1.0):
        import h5py
        import glob
        import os
        import random

        self.pipe = DevicePipeline(cfg, aug_node=aug_node, use_seed=use_seed,
                                   diffusion=diffusion, lr_decom=lr_decom)
        self.shuffle = shuffle
        self.seed = seed
        self._epoch = 0
        self._raw: List[Dict] = []
        self._names: List[str] = []
        self._shapes: List[Tuple[int, ...]] = []
        # One host-side example only (for init_state's shape/struct sample);
        # keeping every example's numpy copy alive would duplicate the whole
        # dataset in host RAM on top of the device-resident cache.
        self._host: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None

        files = glob.glob(os.path.join(root_directory, "*.h5"))
        if sample_rate < 1.0:
            random.shuffle(files)
            files = files[:round(len(files) * sample_rate)]
        total = 0
        for filename in sorted(files):
            with h5py.File(filename, "r") as f:
                for s in range(f["kspace"].shape[0]):
                    k, m = f["kspace"][s], f["maps"][s]
                    self._raw.append(self.pipe.upload_raw(k, m))
                    self._names.append(filename)
                    self._shapes.append(tuple(k.shape))
                    if self._host is None:
                        self._host = (k, m, f["target"][s])
                    total += k.nbytes + m.nbytes
        logger.info("device pipeline: cached %d examples (%.0f MB) on device",
                    len(self._raw), total / 1e6)

    def __len__(self) -> int:
        return len(self._raw)

    def host_sample(self) -> dict:
        """One HOST-preprocessed batch (for init_state's shape/struct)."""
        from dl_swin_gan_tpu.data.preprocess import CinePreprocess
        pre = CinePreprocess(self.pipe.cfg, aug_node=self.pipe.aug,
                             use_seed=True, lr_decom=self.pipe.lr_decom)
        k, m, t = self._host
        ex = pre(k, m, t, self._names[0])
        return {key: np.asarray(v)[None] for key, v in ex.items()}

    def __iter__(self):
        import random
        idx = list(range(len(self._raw)))
        if self.shuffle:
            rng = random.Random(None if self.seed is None
                                else self.seed + self._epoch)
            rng.shuffle(idx)
        self._epoch += 1
        for i in idx:
            params = self.pipe.draw_params(self._names[i], self._shapes[i])
            yield self.pipe.build(self._raw[i], params)
