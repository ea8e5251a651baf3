"""Compact-transfer deployment path (infer/compact.py).

The packed-line wire format + device-side rebuild must reproduce the dense
`Reconstructor` path (ResampleTransform -> normalize/init on host) to
float32 round-off, since the quality protocol is defined on the dense path.
"""

import jax
import numpy as np
import pytest

from dl_swin_gan_tpu.config import get_cfg
from dl_swin_gan_tpu.data.synthetic import make_cine_example
from dl_swin_gan_tpu.infer.compact import (
    CompactReconstructor,
    CompactTransform,
    pack_lines,
    pad_lines,
    unpack_lines,
    wire_bytes,
)
from dl_swin_gan_tpu.infer.reconstruct import Reconstructor
from dl_swin_gan_tpu.infer.transforms import ResampleTransform
from dl_swin_gan_tpu.models import build_denoiser
from dl_swin_gan_tpu.solvers import build_solver
from dl_swin_gan_tpu.train import packing

T, Y, X, C, E = 6, 24, 16, 3, 2


def tiny_cfg():
    cfg = get_cfg()
    cfg.MODEL.MODEL_TYPE = "RES"
    cfg.MODEL.PARAMETERS.NUM_UNROLLS = 2
    cfg.MODEL.PARAMETERS.NUM_RESBLOCKS = 1
    cfg.MODEL.PARAMETERS.NUM_FEATURES = 8
    cfg.MODEL.PARAMETERS.NUM_EMAPS = E
    cfg.MODEL.PARAMETERS.FIX_STEP_SIZE = True
    cfg.MODEL.PARAMETERS.SLWIN_INIT = True
    cfg.MODEL.PARAMETERS.CONV_BLOCK.COMPLEX = False
    cfg.OUTPUT_DIR = "/tmp/test_compact"
    return cfg


def masked_example(seed=0, accel=3.0):
    cfg = tiny_cfg()
    kspace, maps, _ = make_cine_example(T=T, Y=Y, X=X, C=C, E=E, seed=seed)
    dense_tf = ResampleTransform(accel, cfg)
    return cfg, np.asarray(kspace), np.asarray(maps), dense_tf


def test_pack_unpack_roundtrip():
    cfg, kspace, maps, dense_tf = masked_example()
    masked = dense_tf(kspace, maps)["kspace"] * dense_tf(kspace, maps)["scale"]
    # use the raw (unnormalized) masked k-space for the roundtrip
    from dl_swin_gan_tpu.ops import masks as ss
    ks_m, _ = ss.subsample(kspace[None], dense_tf.mask_func, seed=1000,
                           mode="3D")
    ks_m = ks_m[0].astype(np.complex64)

    packed, idx, valid = pack_lines(ks_m)
    dense = np.asarray(unpack_lines(packed[None], idx[None], valid[None], Y))
    np.testing.assert_allclose(dense[0], ks_m, rtol=0, atol=1e-7)

    # padded packing reconstructs identically
    ex = dict(kspace_lines=packed, line_idx=idx, line_valid=valid)
    ex = pad_lines(ex, idx.shape[-1] + 5)
    dense2 = np.asarray(unpack_lines(ex["kspace_lines"][None],
                                     ex["line_idx"][None],
                                     ex["line_valid"][None], Y))
    np.testing.assert_allclose(dense2[0], ks_m, rtol=0, atol=1e-7)


def test_pack_is_compact():
    cfg, kspace, maps, _ = masked_example(accel=4.0)
    compact_tf = CompactTransform(cfg, acceleration=4.0)
    dense_tf = ResampleTransform(4.0, cfg)
    compact = compact_tf(kspace, maps)
    dense = dense_tf(kspace, maps)
    assert wire_bytes(compact) < 0.55 * wire_bytes(dense)


def test_compact_matches_dense_reconstructor():
    cfg, kspace, maps, dense_tf = masked_example()
    compact_tf = CompactTransform(cfg, acceleration=3.0)

    # shared params from the dense path init
    dense_ex = dense_tf(kspace, maps)
    batch_d = {k: np.asarray(v)[None] for k, v in dense_ex.items()}
    model = build_solver(cfg, lambda: build_denoiser(cfg))
    packed_d = packing.pack(batch_d)

    def _init(p):
        b = packing.unpack(p)
        return model.init(jax.random.PRNGKey(0), b["kspace"], b["maps"],
                          b["mask"], x0=b["init_image"])["params"]

    params = jax.jit(_init)(packed_d)

    dense_rec = Reconstructor(cfg, params)
    out_dense = dense_rec(batch_d)

    compact_ex = compact_tf(kspace, maps)
    batch_c = {k: np.asarray(v)[None] for k, v in compact_ex.items()}
    compact_rec = CompactReconstructor(cfg, params, ny=Y)
    out_compact = compact_rec(batch_c)

    ref = np.abs(out_dense).max()
    np.testing.assert_allclose(out_compact, out_dense, rtol=2e-3,
                               atol=2e-4 * ref)


def test_compact_batched_mixed_line_counts():
    """Slices with different acquired-line counts batch via pad_lines."""
    cfg = tiny_cfg()
    exs, dense_outs = [], []

    model = build_solver(cfg, lambda: build_denoiser(cfg))
    params = None
    for seed, accel in [(0, 3.0), (1, 5.0)]:
        kspace, maps, _ = make_cine_example(T=T, Y=Y, X=X, C=C, E=E,
                                            seed=seed)
        dense_ex = ResampleTransform(accel, cfg)(kspace, maps)
        batch_d = {k: np.asarray(v)[None] for k, v in dense_ex.items()}
        if params is None:
            packed_d = packing.pack(batch_d)

            def _init(p):
                b = packing.unpack(p)
                return model.init(jax.random.PRNGKey(0), b["kspace"],
                                  b["maps"], b["mask"],
                                  x0=b["init_image"])["params"]

            params = jax.jit(_init)(packed_d)
        dense_outs.append(Reconstructor(cfg, params)(batch_d)[0])
        exs.append(CompactTransform(cfg, acceleration=accel)(kspace, maps))

    n_max = max(e["line_idx"].shape[-1] for e in exs)
    exs = [pad_lines(e, n_max) for e in exs]
    batch_c = {k: np.stack([e[k] for e in exs]) for k in exs[0]}
    out = CompactReconstructor(cfg, params, ny=Y)(batch_c)

    for i, ref in enumerate(dense_outs):
        np.testing.assert_allclose(out[i], ref, rtol=2e-3,
                                   atol=2e-4 * np.abs(ref).max())


def test_flat_wire_matches_dict_wire():
    """FlatWire f32 is bit-identical to the dict wire; f16 is close.

    The flat codec only re-encodes the transfer — same jitted recon —
    so the f32 buffer must reproduce the dict-wire output exactly and
    the f16 buffer to ~1e-3 relative (payload quantization).
    """
    from dl_swin_gan_tpu.infer.compact import FlatWire

    cfg, kspace, maps, _ = masked_example()
    compact_tf = CompactTransform(cfg, acceleration=3.0)
    ex = compact_tf(kspace, maps)
    batch_c = {k: np.asarray(v)[None] for k, v in ex.items()}

    rec = CompactReconstructor(cfg, None, ny=Y)
    params = rec.init_params(batch_c)
    rec.params = params
    out_dict = rec(batch_c)

    w32 = FlatWire(ex, np.float32)
    buf = w32.encode(ex)
    assert buf.dtype == np.float32 and buf.ndim == 1
    assert buf.nbytes == wire_bytes(buf)
    out_f32 = CompactReconstructor(cfg, params, ny=Y, wire=w32)(buf[None])
    np.testing.assert_array_equal(out_f32, out_dict)

    w16 = FlatWire(ex, np.float16)
    assert w16.length == w32.length
    out_f16 = CompactReconstructor(cfg, params, ny=Y,
                                   wire=w16)(w16.encode(ex)[None])
    ref = np.abs(out_dict).max()
    np.testing.assert_allclose(out_f16, out_dict, rtol=0, atol=5e-3 * ref)


def test_flat_wire_f16_rejects_wide_grids():
    """float16 wire refuses line indices above its exact-integer range."""
    from dl_swin_gan_tpu.infer.compact import FlatWire

    ex = dict(
        kspace_lines=np.zeros((1, 1, 2, 4), np.complex64),
        line_idx=np.array([[100, 3000]], np.int32),
        line_valid=np.ones((1, 2), np.float32),
        maps=np.zeros((1, 1, 4096, 4), np.complex64),
    )
    with pytest.raises(ValueError):
        FlatWire(ex, np.float16).encode(ex)
    FlatWire(ex, np.float32).encode(ex)  # f32 is fine


def test_pack_lines_rejects_small_budget():
    cfg, kspace, maps, dense_tf = masked_example()
    from dl_swin_gan_tpu.ops import masks as ss
    ks_m, _ = ss.subsample(kspace[None], dense_tf.mask_func, seed=1000,
                           mode="3D")
    with pytest.raises(ValueError):
        pack_lines(ks_m[0], n_max=1)
