#!/usr/bin/env python
"""Causal bisect of the Latte-vs-DiT quality gap, tiny scale, CPU.

The full-scale Latte quality row trails the zero-filled baseline (README
quality table: 0.819 vs 0.840 SSIM at the reference's 1-unroll/192-wide
operating point), while DiT at 2 trained hard-DC unrolls/256 wins (0.908).
The round-3 rescue runs (configs/quality/latte2.yaml, latte3.yaml) test the
"unrolls per reverse step" hypothesis at full scale on the TPU; this script
tests it *causally* at tiny scale on CPU, where all arms share the exact
same data, budget, seed, and evaluation protocol and only the bisected
variable moves:

  zf          zero-filled sliding-window baseline
  latte1      Latte backbone, 1 hard-DC unroll  (reference config_latte.yaml shape)
  latte2s     Latte backbone, 2 SHARED unrolls  (latte2.yaml recipe, same params)
  dit2        DiT   backbone, 2 unrolls         (the winning ditq2 recipe shape)
  dit1        DiT   backbone, 1 unroll          (separates backbone from unrolls)

All arms: DDPM_X, identical layer count/width/heads, identical synthetic
cine data, identical train/eval undersampling, identical step budget, eval
by the README protocol machinery (ResampleTransform at the parity seed →
DiffusionReconstructor conditional hard-DC sampling → evaluate_volumes
SSIM/PSNR vs the fully-sampled adjoint).

Run (CPU only — strip the axon site dir, CLAUDE.md "CPU-only scripts"):
  env -u PYTHONPATH PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
      python scripts/latte_bisect_cpu.py | tee runs/latte_bisect.log

Env knobs: BISECT_STEPS (default 2000), BISECT_SAMPLE_STEPS (default 50),
BISECT_ARMS (comma list to subset).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

T, Y, X, C, E = 8, 64, 32, 4, 2
TRAIN_SLICES = 8          # 2 files x 4 slices
EVAL_ACCEL = 8.0
STEPS = int(os.environ.get("BISECT_STEPS", "2000"))
SAMPLE_STEPS = int(os.environ.get("BISECT_SAMPLE_STEPS", "50"))
ROOT = "runs/latte_bisect"


def base_cfg(model_type: str, unrolls: int, share: bool, out: str):
    from dl_swin_gan_tpu.config import get_cfg
    cfg = get_cfg()
    cfg.MODEL.MODEL_TYPE = model_type
    cfg.MODEL.META_ARCHITECTURE = "DDPM_X"
    p = cfg.MODEL.PARAMETERS
    p.NUM_UNROLLS = unrolls
    p.NUM_RESBLOCKS = 0
    p.NUM_LAYERS = 4          # Latte interleave needs an even count
    p.NUM_HEADS = 4
    p.NUM_FEATURES = 64
    p.NUM_EMAPS = E
    p.SHARE_WEIGHTS = share
    p.FIX_STEP_SIZE = True
    p.SLWIN_INIT = False
    p.LEARN_SIGMA = False
    p.NOISE_SCHED = "linear"
    p.PATCH_SIZE = (2, 4, 4)
    cfg.MODEL.RECON_LOSS.NAME = "complex_l1"
    cfg.MODEL.RECON_LOSS.RENORMALIZE_DATA = False
    cfg.DATASET.TRAIN = (os.path.join(ROOT, "data", "train"),)
    cfg.DATASET.VAL = (os.path.join(ROOT, "data", "val"),)
    cfg.DATALOADER.NUM_WORKERS = 1
    cfg.DATALOADER.TRAIN_BATCH_SIZE = 1
    for aug in (cfg.AUG_TRAIN, cfg.AUG_VAL):
        aug.UNDERSAMPLE.NAME = "VDktMaskFunc"
        aug.UNDERSAMPLE.ACCELERATIONS = (6, 9)
        aug.UNDERSAMPLE.PARTIAL_KX = 0.25
        aug.UNDERSAMPLE.PARTIAL_KY = 0.25
    cfg.OPTIMIZER.NAME = "Adam"
    cfg.OPTIMIZER.ADAM.LR = 2e-4
    cfg.OPTIMIZER.MAX_EPOCHS = max(1, STEPS // TRAIN_SLICES)
    cfg.LR_SCHEDULER.STEP_SIZE = 10 ** 6   # flat LR: bisect one variable
    cfg.EVAL.RUN_EVERY_N_EPOCHS = 10 ** 6  # no mid-run validation
    cfg.EVAL.CKPT_EVERY_N_STEPS = 0        # final-state bank only
    cfg.LOGGER.LOG_METRICS_EVERY_N_STEPS = max(1, STEPS // 4)
    cfg.LOGGER.LOG_IMAGES_EVERY_N_STEPS = 0
    cfg.LOGGER.LOG_PREDICTION_EVERY_N_STEPS = 0
    cfg.SEED = 1000
    cfg.OUTPUT_DIR = out
    cfg.freeze()
    return cfg


def make_data():
    from dl_swin_gan_tpu.data.synthetic import write_synthetic_dataset
    d = os.path.join(ROOT, "data")
    if not os.path.isdir(os.path.join(d, "train")):
        write_synthetic_dataset(os.path.join(d, "train"), num_files=2,
                                slices=TRAIN_SLICES // 2, T=T, Y=Y, X=X,
                                C=C, E=E, seed=0)
        write_synthetic_dataset(os.path.join(d, "val"), num_files=1,
                                slices=1, T=T, Y=Y, X=X, C=C, E=E, seed=100)
        write_synthetic_dataset(os.path.join(d, "test"), num_files=2,
                                slices=2, T=T, Y=Y, X=X, C=C, E=E, seed=500)
    return os.path.join(d, "test")


def test_examples(cfg, accel):
    """[slices] list of protocol eval examples + fully-sampled adjoint refs."""
    import h5py

    from dl_swin_gan_tpu.infer.transforms import (
        InferenceTransform, ResampleTransform,
    )
    test_dir = os.path.join(ROOT, "data", "test")
    rt = ResampleTransform(accel, cfg)
    ft = InferenceTransform(cfg)
    exs, refs = [], []
    for fname in sorted(os.listdir(test_dir)):
        with h5py.File(os.path.join(test_dir, fname), "r") as f:
            for s in range(f["kspace"].shape[0]):
                ks, mp = f["kspace"][s], f["maps"][s]
                exs.append(rt(ks, mp))
                full = ft(ks, mp)
                refs.append(full["init_image"] * full["scale"])
    return exs, np.stack(refs)


def eval_recon(recon_vols, refs):
    from dl_swin_gan_tpu.infer.evaluate import evaluate_volumes
    m = evaluate_volumes(refs, recon_vols)
    return {k: float(v.mean()) for k, v in m.items()}


def run_arm(name, model_type, unrolls, share):
    from dl_swin_gan_tpu.infer.reconstruct import DiffusionReconstructor
    from dl_swin_gan_tpu.train.diffusion_trainer import DiffusionTrainer

    out = os.path.join(ROOT, name)
    cfg = base_cfg(model_type, unrolls, share, out)
    t0 = time.time()
    trainer = DiffusionTrainer(cfg)
    state = trainer.fit()
    n_params = sum(x.size for x in
                   __import__("jax").tree_util.tree_leaves(state.params))
    t_train = time.time() - t0

    exs, refs = test_examples(cfg, EVAL_ACCEL)
    recon = DiffusionReconstructor(cfg, state.params,
                                   sample_steps=SAMPLE_STEPS)
    t0 = time.time()
    vols = np.concatenate(
        [recon({k: np.asarray(v)[None] for k, v in ex.items()})
         for ex in exs], axis=0)
    m = eval_recon(vols, refs)
    m.update(arm=name, params=int(n_params), steps=int(state.step),
             train_s=round(t_train, 1), sample_s=round(time.time() - t0, 1))
    print(json.dumps(m), flush=True)
    return m


def run_zf():
    """Zero-filled sliding-window baseline through the same protocol."""
    from dl_swin_gan_tpu.config import get_cfg
    cfg = get_cfg()
    cfg.MODEL.PARAMETERS.SLWIN_INIT = True   # README zf row semantics
    cfg.AUG_TRAIN.UNDERSAMPLE.PARTIAL_KX = 0.25
    cfg.AUG_TRAIN.UNDERSAMPLE.PARTIAL_KY = 0.25
    cfg.freeze()
    exs, refs = test_examples(cfg, EVAL_ACCEL)
    vols = np.stack([ex["init_image"] * ex["scale"] for ex in exs])
    m = eval_recon(vols, refs)
    m.update(arm="zf", params=0, steps=0)
    print(json.dumps(m), flush=True)
    return m


ARMS = {
    "zf": run_zf,
    "latte1": lambda: run_arm("latte1", "LATTE", 1, False),
    "latte2s": lambda: run_arm("latte2s", "LATTE", 2, True),
    "dit1": lambda: run_arm("dit1", "DIT", 1, False),
    "dit2": lambda: run_arm("dit2", "DIT", 2, False),
}


def main():
    make_data()
    wanted = os.environ.get("BISECT_ARMS")
    names = [n.strip() for n in wanted.split(",")] if wanted else list(ARMS)
    print(f"# latte bisect: steps={STEPS} sample_steps={SAMPLE_STEPS} "
          f"accel={EVAL_ACCEL} shapes T{T} Y{Y} X{X} C{C} E{E}", flush=True)
    results = [ARMS[n]() for n in names]
    print("#", "  ".join(f"{r['arm']}:ssim={r['ssim']:.4f}" for r in results),
          flush=True)


if __name__ == "__main__":
    main()
