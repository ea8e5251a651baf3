"""Device-resident input pipeline: numerical equivalence with the host
CinePreprocess (the parity-pinned implementation) and an end-to-end fit
smoke through Trainer with DATALOADER.DEVICE_PIPELINE on."""

import numpy as np
import pytest

from dl_swin_gan_tpu.config import get_cfg
from dl_swin_gan_tpu.data.preprocess import CinePreprocess
from dl_swin_gan_tpu.data.synthetic import make_cine_example, \
    write_synthetic_dataset
from dl_swin_gan_tpu.data.device_pipeline import DevicePipeline
from dl_swin_gan_tpu.train import packing


def _cfg(slwin=True, crop=16, partial_kx=0.0):
    cfg = get_cfg()
    cfg.MODEL.MODEL_TYPE = "RES"
    cfg.MODEL.PARAMETERS.NUM_UNROLLS = 1
    cfg.MODEL.PARAMETERS.NUM_RESBLOCKS = 1
    cfg.MODEL.PARAMETERS.NUM_FEATURES = 8
    cfg.MODEL.PARAMETERS.SLWIN_INIT = slwin
    cfg.AUG_TRAIN.CROP_READOUT = crop
    cfg.AUG_TRAIN.UNDERSAMPLE.ACCELERATIONS = (3, 4)
    cfg.AUG_TRAIN.UNDERSAMPLE.PARTIAL_KX = partial_kx
    cfg.AUG_TRAIN.UNDERSAMPLE.PARTIAL_KY = 0.0
    cfg.MODEL.RECON_LOSS.RENORMALIZE_DATA = False
    cfg.OUTPUT_DIR = "/tmp/devpipe"
    return cfg


@pytest.mark.parametrize("slwin,crop,partial_kx", [
    (True, 16, 0.0), (False, 0, 0.25)])
def test_device_pipeline_matches_host_preprocess(slwin, crop, partial_kx):
    cfg = _cfg(slwin=slwin, crop=crop, partial_kx=partial_kx)
    k, m, t = make_cine_example(T=6, Y=32, X=24, C=4, E=2, seed=3)

    host = CinePreprocess(cfg, use_seed=True)(k, m, t, "devpipe_ex")

    pipe = DevicePipeline(cfg, use_seed=True)
    raw = pipe.upload_raw(k, m)
    params = pipe.draw_params("devpipe_ex", k.shape)
    got = packing.unpack_np(pipe.build(raw, params))

    # identical RNG draws -> bit-identical mask
    np.testing.assert_array_equal(got["mask"][0], host["mask"])
    # physics recomputed in complex64 on device vs numpy's complex128 host
    # path: agreement to float32 round-off
    np.testing.assert_allclose(got["scale"][0], host["scale"], rtol=1e-4)
    for key in ("kspace", "maps", "target", "init_image"):
        ref = host[key]
        mag = np.abs(ref).max()
        np.testing.assert_allclose(got[key][0], ref, rtol=2e-4,
                                   atol=2e-5 * max(mag, 1.0), err_msg=key)


def test_device_pipeline_diffusion_batch_structure():
    cfg = _cfg()
    cfg.MODEL.META_ARCHITECTURE = "DDPM_X"
    k, m, _ = make_cine_example(T=6, Y=32, X=24, C=4, E=2, seed=4)
    pipe = DevicePipeline(cfg, use_seed=True, diffusion=True)
    raw = pipe.upload_raw(k, m)
    params = pipe.draw_params("devpipe_d", k.shape)
    got = packing.unpack_np(pipe.build(raw, params))
    assert "kspace" not in got
    assert set(got) >= {"mask", "mask_r", "mask_p", "maps", "init_image",
                        "scale", "target"}
    # submask split: mask_r and mask_p partition the acquired ky lines
    np.testing.assert_array_equal(
        np.maximum(got["mask_r"], got["mask_p"]), got["mask"])
    assert got["mask_r"].sum() < got["mask"].sum()


def test_fit_with_device_pipeline(tmp_path):
    from dl_swin_gan_tpu.train import Trainer

    train = str(tmp_path / "train")
    write_synthetic_dataset(train, num_files=2, slices=1, T=6, Y=32, X=24,
                            C=4, E=2, seed=0)
    cfg = _cfg()
    cfg.MODEL.PARAMETERS.NUM_UNROLLS = 2
    cfg.DATALOADER.DEVICE_PIPELINE = True
    cfg.DATALOADER.NUM_WORKERS = 1
    cfg.OPTIMIZER.ADAM.LR = 0.002
    cfg.LOGGER.LOG_METRICS_EVERY_N_STEPS = 1
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.DATASET.TRAIN = (train,)
    cfg.DATASET.VAL = ()

    trainer = Trainer(cfg)
    assert trainer._use_device_pipeline()  # (1,1) mesh regardless of devices
    state = trainer.fit(max_epochs=3)
    assert int(state.step) == 6

    import json
    recs = [json.loads(l) for l in
            open(str(tmp_path / "out" / "metrics.jsonl"))]
    losses = [r["Train/complex_l1"] for r in recs if "Train/complex_l1" in r]
    assert losses[-1] < losses[0]


def test_device_pipeline_dslr_batch():
    """lr_decom mode: on-device truncated block SVD init. SVD factor phases
    are convention-dependent (numpy/torch/XLA all differ) — what is pinned
    is the composed low-rank image LR^H."""
    from dl_swin_gan_tpu.ops.llr import BlockOp, compose
    import jax.numpy as jnp

    cfg = _cfg()
    cfg.MODEL.PARAMETERS.DSLR.BLOCK_SIZE = 8
    cfg.MODEL.PARAMETERS.DSLR.NUM_BASIS = 3
    k, m, t = make_cine_example(T=6, Y=32, X=24, C=4, E=2, seed=5)

    host = CinePreprocess(cfg, use_seed=True, lr_decom=True)(k, m, t, "lr_ex")
    pipe = DevicePipeline(cfg, use_seed=True, lr_decom=True)
    raw = pipe.upload_raw(k, m)
    got = packing.unpack_np(pipe.build(raw, pipe.draw_params("lr_ex", k.shape)))

    assert got["L_init"].shape[1:] == host["L_init"].shape
    assert got["R_init"].shape[1:] == host["R_init"].shape
    op = BlockOp(8, (1, 2) + host["target"].shape[1:], xp=np)
    img_host = np.asarray(compose(host["L_init"], host["R_init"], op))
    img_dev = np.asarray(compose(got["L_init"][0], got["R_init"][0], op))
    np.testing.assert_allclose(img_dev, img_host, rtol=2e-3,
                               atol=2e-4 * np.abs(img_host).max())


def test_dslr_fit_with_device_pipeline(tmp_path):
    from dl_swin_gan_tpu.train.dslr_trainer import DSLRTrainer

    train = str(tmp_path / "train")
    write_synthetic_dataset(train, num_files=2, slices=1, T=6, Y=32, X=24,
                            C=4, E=2, seed=0)
    cfg = _cfg()
    cfg.MODEL.META_ARCHITECTURE = "dslr-cg-v1"
    cfg.MODEL.PARAMETERS.NUM_UNROLLS = 1
    cfg.MODEL.PARAMETERS.DSLR.BLOCK_SIZE = 8
    cfg.MODEL.PARAMETERS.DSLR.NUM_BASIS = 2
    cfg.MODEL.PARAMETERS.DSLR.NUM_CG_STEPS = 2
    cfg.DATALOADER.DEVICE_PIPELINE = True
    cfg.DATALOADER.NUM_WORKERS = 1
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.DATASET.TRAIN = (train,)
    cfg.DATASET.VAL = ()

    trainer = DSLRTrainer(cfg)
    state = trainer.fit(max_epochs=2)
    assert int(state.step) == 4
