"""Compact-transfer deployment path: ship only acquired k-space lines.

The reference deployment loop (`scripts/reconstruct.py:211-240`) moves the
FULL dense k-space volume to the device per slice even though, at clinical
accelerations, ~1/R of the ky-t grid is acquired — the rest is zeros. Over
a slow host->device link that dead weight IS the reconstruction throughput
(measured here: a 20x180x64x8-coil slice is ~21 MB dense vs ~3.5 MB packed
at 12x, and the e2e bench is transfer-ceilinged).

This module is the TPU-native answer:

  host   — pack the acquired ky lines per frame into [C, T, n_max, X]
           (+ int32 line indices and a validity mask), the wire format a
           scanner would actually send;
  device — scatter back to the dense grid, derive the sampling mask from
           the nonzero pattern (the reference's own convention:
           `reconstruct.py:132-136` get_mask), then run the 95%-max
           normalization, sliding-window init, and the unrolled model in
           ONE jitted function (twins of `infer/transforms.py:20-35`,
           reusing the device-pipeline ops that are parity-tested against
           the host path).

Numerics match the dense `Reconstructor` path to float32 round-off
(tests/test_compact_transfer.py).
"""

import numpy as np
import jax
import jax.numpy as jnp

from dl_swin_gan_tpu.data.device_pipeline import _sliding_window, _time_average
from dl_swin_gan_tpu.infer.transforms import PARITY_SEED
from dl_swin_gan_tpu.models import build_denoiser
from dl_swin_gan_tpu.ops import masks as ss
from dl_swin_gan_tpu.ops.sense import sense_adjoint
from dl_swin_gan_tpu.solvers import build_solver
from dl_swin_gan_tpu.train import packing


def pack_lines(kspace: np.ndarray, n_max=None):
    """Pack acquired ky lines of masked k-space [C, T, Y, X].

    Returns (packed [C, T, n, X] complex64, idx [T, n] int32,
    valid [T, n] float32). A line is "acquired" when any coil/readout
    sample on it is nonzero; partial-kx zeros ride inside the packed line.
    """
    kspace = np.asarray(kspace)
    C, T, Y, X = kspace.shape
    acquired = (np.abs(kspace) > 1e-12).any(axis=(0, 3))  # [T, Y]
    counts = acquired.sum(1)
    n = int(counts.max() if n_max is None else n_max)
    if counts.max() > n:
        raise ValueError(
            f"n_max={n} < max acquired lines per frame ({counts.max()})")
    idx = np.zeros((T, n), np.int32)
    valid = np.zeros((T, n), np.float32)
    for t in range(T):
        ys = np.flatnonzero(acquired[t])
        idx[t, :len(ys)] = ys
        valid[t, :len(ys)] = 1.0
    packed = kspace[:, np.arange(T)[:, None], idx, :]
    packed = packed * valid[None, :, :, None]
    return packed.astype(np.complex64), idx, valid


def pad_lines(example: dict, n_max: int) -> dict:
    """Pad a packed example's line dimension to n_max (for batching)."""
    n = example["line_idx"].shape[-1]
    if n == n_max:
        return example
    pad = n_max - n
    out = dict(example)
    out["kspace_lines"] = np.pad(example["kspace_lines"],
                                 ((0, 0), (0, 0), (0, pad), (0, 0)))
    out["line_idx"] = np.pad(example["line_idx"], ((0, 0), (0, pad)))
    out["line_valid"] = np.pad(example["line_valid"], ((0, 0), (0, pad)))
    return out


def unpack_lines(packed, idx, valid, ny: int):
    """Device twin of pack_lines: [B, C, T, n, X] -> dense [B, C, T, Y, X].

    Invalid (padded) entries carry zero data and scatter-ADD into row
    idx=0, contributing nothing.
    """
    def one(p, i, v):
        C, T, n, X = p.shape
        p = p * v[None, :, :, None].astype(p.dtype)
        t = jnp.arange(T)[:, None]
        dense = jnp.zeros((C, T, ny, X), p.dtype)
        return dense.at[:, t, i, :].add(p)

    return jax.vmap(one)(packed, idx, valid)


def wire_bytes(example) -> int:
    """Bytes this example moves over the host->device link."""
    if isinstance(example, np.ndarray):
        return example.nbytes
    return sum(np.asarray(v).nbytes for v in example.values())


class FlatWire:
    """One-transfer wire codec for the compact path.

    The dict wire format moves SEVEN host->device arrays per call (two
    ``__re``/``__im`` pairs for k-space lines and maps, plus idx/valid);
    on a high-latency relay the per-array round trips dominate the ~2.8 MB
    payload (measured r4: the dict wire sustained only ~11 MB/s effective
    on a ~40 MB/s link — 77.5 f/s). FlatWire concatenates every field into
    ONE contiguous 1-D buffer per slice — one transfer — and slices /
    reshapes it back inside the jitted reconstruction.

    dtype float32 is bit-lossless (ky line indices are exact as floats up
    to 2**24). dtype float16 additionally halves the payload: indices stay
    exact up to 2048 (asserted at encode), validity is 0/1, and the
    k-space / map samples quantize to ~1e-3 relative — quality-check
    before deploying f16 (see tests/test_compact_transfer.py).
    """

    def __init__(self, template: dict, dtype=np.float32):
        self.dtype = np.dtype(dtype)
        k = np.asarray(template["kspace_lines"])
        i = np.asarray(template["line_idx"])
        v = np.asarray(template["line_valid"])
        m = np.asarray(template["maps"])
        # (name, stored shape, complex?) — re/im planes stack on axis 0
        self._segs = [
            ("kspace_lines", (2,) + k.shape, True),
            ("line_idx", i.shape, False),
            ("line_valid", v.shape, False),
            ("maps", (2,) + m.shape, True),
        ]
        self._sizes = [int(np.prod(s)) for _, s, _ in self._segs]
        self._offsets = np.cumsum([0] + self._sizes[:-1]).tolist()
        self.length = int(sum(self._sizes))

    def encode(self, example: dict) -> np.ndarray:
        """Host side: example dict -> one 1-D buffer of self.dtype."""
        idx = np.asarray(example["line_idx"])
        if self.dtype.itemsize < 4 and idx.size and idx.max() > 2048:
            raise ValueError("float16 wire: line indices exceed 2048, "
                             "not exactly representable")
        buf = np.empty(self.length, self.dtype)
        for (name, shape, cplx), size, off in zip(
                self._segs, self._sizes, self._offsets):
            a = np.asarray(example[name])
            flat = (np.stack([a.real, a.imag]) if cplx else a).ravel()
            buf[off:off + size] = flat.astype(self.dtype)
        return buf

    def decode(self, buf) -> dict:
        """Device side (inside jit): [B, length] -> the example dict."""
        out = {}
        B = buf.shape[0]
        for (name, shape, cplx), size, off in zip(
                self._segs, self._sizes, self._offsets):
            seg = buf[:, off:off + size].reshape((B,) + shape)
            seg = seg.astype(jnp.float32)
            if cplx:
                out[name] = jax.lax.complex(seg[:, 0], seg[:, 1])
            elif name == "line_idx":
                out[name] = jnp.round(seg).astype(jnp.int32)
            else:
                out[name] = seg
        return out


class CompactTransform:
    """Host side of the compact path: (re)undersample + line-pack ONLY.

    Unlike `ResampleTransform`/`InferenceTransform`, normalization and the
    sliding-window init do NOT run here — they run on device inside
    `CompactReconstructor`, so neither the dense k-space nor the init image
    ever crosses the link.

    acceleration > 1: re-undersample fully-sampled data at the parity seed
    (reconstruct_h5.py:314-368 protocol). acceleration in (None, 1): the
    input is already undersampled scanner data (reconstruct.py path);
    apply_fftmod=True for raw CFL.
    """

    def __init__(self, cfg, acceleration=None, n_max=None,
                 seed: int = PARITY_SEED, apply_fftmod: bool = False):
        self.n_max = n_max
        self.seed = seed
        self.apply_fftmod = apply_fftmod
        self.mask_func = None
        if acceleration is not None and acceleration > 1:
            self.mask_func = ss.VDktMaskFunc(
                (acceleration, acceleration),
                sim_partial_kx=cfg.AUG_TRAIN.UNDERSAMPLE.PARTIAL_KX,
                sim_partial_ky=cfg.AUG_TRAIN.UNDERSAMPLE.PARTIAL_KY,
            )

    def __call__(self, kspace: np.ndarray, maps: np.ndarray) -> dict:
        kspace = np.asarray(kspace)
        maps = np.asarray(maps)
        if self.apply_fftmod:
            from dl_swin_gan_tpu.data import host_ops as H
            kspace = H.fftmod(kspace)
            maps = H.fftmod(maps)
        if self.mask_func is not None:
            kspace, _ = ss.subsample(kspace[None], self.mask_func,
                                     seed=self.seed, mode="3D")
            kspace = kspace[0]
        packed, idx, valid = pack_lines(kspace, self.n_max)
        return dict(kspace_lines=packed, line_idx=idx, line_valid=valid,
                    maps=maps.astype(np.complex64))


class CompactReconstructor:
    """Jitted dense-grid rebuild + normalize + init + unrolled recon.

    ny: the dense ky grid size (static; packed batches carry only indices).
    Output matches `Reconstructor` fed by the dense transforms to float32
    round-off, de-normalized to input units.

    wire: None for the dict wire (packing.pack'd example dicts), or a
    `FlatWire` — then `__call__` takes a [B, wire.length] buffer and the
    whole slice crosses the link in one transfer.
    """

    def __init__(self, cfg, params, ny: int, wire: "FlatWire" = None):
        self.cfg = cfg
        self.params = params
        self.wire = wire
        self.model = build_solver(cfg, lambda: build_denoiser(cfg))
        slwin = cfg.MODEL.PARAMETERS.SLWIN_INIT

        def _recon(params, packed):
            b = (wire.decode(packed) if wire is not None
                 else packing.unpack(packed))
            kspace = unpack_lines(b["kspace_lines"], b["line_idx"],
                                  b["line_valid"], ny)
            maps = b["maps"]
            # sampling mask from the nonzero pattern of coil 0 — the
            # reference's own deployment convention (get_mask,
            # reconstruct.py:132-136 / infer/transforms.py:53)
            mask = (jnp.abs(kspace[:, :1]) > 1e-12).astype(jnp.float32)

            # 95%-max normalization (transforms.py:20-28), per example
            averaged = _time_average(kspace, 2)
            image = sense_adjoint(averaged, maps)
            nb = image.shape[0]
            mag = jnp.abs(image).reshape(nb, -1)
            k = int(round(0.05 * mag.shape[1]))
            scale = (jax.lax.top_k(mag, k)[0][:, -1] if k > 0
                     else mag.max(axis=1))
            kb = scale.reshape((nb,) + (1,) * (kspace.ndim - 1))
            kspace = kspace / kb.astype(kspace.dtype)

            init_kspace = _sliding_window(kspace, 5) if slwin else kspace
            init_image = sense_adjoint(init_kspace, maps)

            pred = self.model.apply({"params": params}, kspace, maps, mask,
                                    x0=init_image)
            sb = scale.reshape((nb,) + (1,) * (pred.ndim - 1))
            return packing.pack_jnp(pred * sb.astype(pred.dtype))

        self._recon = jax.jit(_recon)

    def init_params(self, batch: dict, seed: int = 0):
        """Initialize model params from one packed batch (bench/test use)."""
        def _init(packed):
            b = packing.unpack(packed)
            kspace = unpack_lines(b["kspace_lines"], b["line_idx"],
                                  b["line_valid"],
                                  self._ny_from(b))
            mask = (jnp.abs(kspace[:, :1]) > 1e-12).astype(jnp.float32)
            x0 = sense_adjoint(kspace, b["maps"])
            return self.model.init(jax.random.PRNGKey(seed), kspace,
                                   b["maps"], mask, x0=x0)["params"]
        return jax.jit(_init)(packing.pack(batch))

    def _ny_from(self, b):
        return b["maps"].shape[-2]

    def __call__(self, batch) -> np.ndarray:
        """batch: dict of stacked examples (dict wire) or an encoded
        [B, wire.length] buffer (flat wire) -> complex images."""
        if self.wire is not None:
            out = self._recon(self.params, np.asarray(batch))
        else:
            out = self._recon(self.params, packing.pack(batch))
        return packing.unpack_np(out).astype(np.complex64)
