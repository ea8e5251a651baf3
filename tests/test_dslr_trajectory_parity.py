"""DSLR training-trajectory parity vs the PyTorch reference.

Completes the trajectory-parity layer across trainer families (unrolled:
test_train_trajectory_parity, diffusion: test_diffusion_trajectory_parity):
reference semantics are `train_lr.py:116-144` (AltMinCGv1 forward on
(L, R) block factors, loss = Train/<name> from compute_metrics at :57-77,
Adam + inert StepLR — same configure_optimizers as train.py:146-151),
ours is the actual `DSLRTrainer._train_step`. The DSLR step is
deterministic (no dropout, no diffusion noise), so the REAL trainer step
runs unmodified; both sides start from weight-copied params and see the
same preprocessed batches.

Skips gracefully without the reference checkout.
"""

import numpy as np
import pytest

from tests.test_dslr_solver_parity import (
    _load_ref, _map_resnet, _ref_cfg)
from tests.test_train_trajectory_parity import _load_ref_metrics, REF_METRICS


def test_dslr_training_trajectory_matches_reference():
    import os

    loaded = _load_ref()
    if loaded is None or not os.path.exists(REF_METRICS):
        pytest.skip("reference/torch unavailable")
    ref_dslr, ref_transforms, ArrayToBlocks = loaded
    import torch

    import jax

    from dl_swin_gan_tpu.config import get_cfg
    from dl_swin_gan_tpu.data.preprocess import CinePreprocess
    from dl_swin_gan_tpu.data.synthetic import make_cine_example
    from dl_swin_gan_tpu.train import packing
    from dl_swin_gan_tpu.train.dslr_trainer import DSLRTrainer
    from dl_swin_gan_tpu.train.train_state import TrainState

    ref_metric = _load_ref_metrics()

    E, C, T, Y, X = 1, 4, 8, 24, 16
    unrolls, resblocks, feats, basis, block = 2, 1, 8, 3, 8
    lr = 1e-3
    n_steps = 8

    cfg = get_cfg()
    cfg.MODEL.MODEL_TYPE = "RES"
    cfg.MODEL.META_ARCHITECTURE = "dslr-cg-v1"
    p = cfg.MODEL.PARAMETERS
    p.NUM_UNROLLS = unrolls
    p.NUM_RESBLOCKS = resblocks
    p.NUM_FEATURES = feats
    p.NUM_EMAPS = E
    p.DSLR.BLOCK_SIZE = block
    p.DSLR.NUM_BASIS = basis
    p.DSLR.NUM_CG_STEPS = 4
    p.CONV_BLOCK.COMPLEX = True
    p.SLWIN_INIT = True
    cfg.MODEL.RECON_LOSS.NAME = "complex_l1"
    cfg.MODEL.RECON_LOSS.LOSS_WEIGHT = False
    cfg.MODEL.RECON_LOSS.RENORMALIZE_DATA = False
    cfg.OPTIMIZER.ADAM.LR = lr
    cfg.LR_SCHEDULER.STEP_SIZE = 1000   # inert within this test
    cfg.AUG_TRAIN.UNDERSAMPLE.ACCELERATIONS = (3, 4)
    cfg.AUG_TRAIN.UNDERSAMPLE.PARTIAL_KY = 0.0
    cfg.OUTPUT_DIR = "/tmp/dslr_traj_parity"

    # identical data: our preprocess with lr_decom (L/R from truncated SVD
    # of the sliding-window init, train_lr.py:188,204) feeds BOTH sides
    pre = CinePreprocess(cfg, use_seed=True, lr_decom=True)
    batches = []
    for i in range(2):
        k, m, t = make_cine_example(T=T, Y=Y, X=X, C=C, E=E, seed=i)
        ex = pre(k, m, t, f"dslr_traj_{i}")
        batches.append({key: np.asarray(v)[None] for key, v in ex.items()})

    trainer = DSLRTrainer(cfg)
    trainer.set_steps_per_epoch(len(batches))
    state = trainer.init_state(batches[0])
    trainer._build_steps()

    torch.manual_seed(7)
    ref = ref_dslr.AltMinCGv1(_ref_cfg(NUM_UNROLLS=unrolls)).train()
    # The reference's inplace ReLUs (resnet{1,2}d.py Activation,
    # inplace=True on .real/.imag views) abort torch 2.x autograd on this
    # path ("variable needed for gradient computation has been modified").
    # Flip them out-of-place — numerically identical forward, and the only
    # way the reference oracle can backprop here at all.
    for m in ref.modules():
        if isinstance(m, (torch.nn.ReLU, torch.nn.LeakyReLU)):
            m.inplace = False

    params = jax.tree.map(np.asarray, state.params)
    for i in range(unrolls):
        _map_resnet(ref.spatial_cnn_update[i], params[f"ResNet2D_{i}"], 2)
        _map_resnet(ref.temporal_cnn_update[i], params[f"ResNet1D_{i}"], 1)
    # deep-copy: torch's opt.step() must not alias our param storage
    params = jax.tree.map(lambda x: np.array(x, copy=True), params)
    state = TrainState(step=state.step, params=params,
                       opt_state=trainer.tx.init(params),
                       ema_params=state.ema_params)

    opt = torch.optim.Adam(ref.parameters(), lr=lr)

    ours, theirs = [], []
    for s in range(n_steps):
        b = batches[s % len(batches)]

        # reference training_step (train_lr.py:116-144)
        tb = {k: torch.from_numpy(np.asarray(v)) for k, v in b.items()}
        A = ref_transforms.SenseModel(tb["maps"], weights=tb["mask"])
        block_op = ArrayToBlocks(block, list(tb["target"].shape),
                                 overlapping=True)
        pred = ref(tb["kspace"], A, block_op, tb["L_init"][0],
                   tb["R_init"][0])
        ref_loss = ref_metric["l1"](tb["target"], pred, False)
        opt.zero_grad()
        ref_loss.backward()
        opt.step()
        theirs.append(float(ref_loss.detach()))

        state, metrics = trainer._train_step(state, packing.pack(b))
        ours.append(float(metrics["Train/complex_l1"]))

    ours, theirs = np.asarray(ours), np.asarray(theirs)
    np.testing.assert_allclose(ours[0], theirs[0], rtol=5e-3)
    np.testing.assert_allclose(ours, theirs, rtol=3e-2)
