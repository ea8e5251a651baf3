"""Training-trajectory parity vs the PyTorch reference.

Forward parity is proven per-backbone elsewhere; this closes the last
parity layer: the full TRAINING step. Both frameworks start from identical
(weight-copied) parameters, see identical preprocessed batches, and take
real optimizer steps — reference semantics are `LitUnrolled.training_step`
+ `configure_optimizers` (`/root/reference/scripts/train.py:103-151`:
Adam(lr) + per-epoch StepLR, loss = metrics['Train/<name>']), ours is the
actual `Trainer._train_step`. Agreement of the per-step loss trajectory
would catch divergence in Adam semantics, loss weighting, metric
normalization, or gradients that no forward test can see.

The reference loss is executed from its own source: `dl_cs/utils/metrics.py`
(l1/l2/calc_weight extracted via ast — the module's top-level imports pull
torchvision, absent here). Skips gracefully without the reference checkout.
"""

import ast
import os
import sys
import warnings

import numpy as np
import pytest

REF_METRICS = "/root/reference/dl_cs/utils/metrics.py"


def _load_ref_unrolled():
    try:
        sys.path.insert(0, "/root/reference")
        import torch  # noqa: F401
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            from dl_cs.models import unrolled as ref_unrolled
            from dl_cs.mri import transforms as ref_transforms
        return ref_unrolled, ref_transforms
    except Exception:
        return None


def _load_ref_metrics():
    """Extract l1/l2/calc_weight from the reference metrics module
    (reference train.py:51-53 calls metric.l1/l2 with LOSS_WEIGHT)."""
    import torch
    tree = ast.parse(open(REF_METRICS).read())
    wanted = {"l1", "l2", "calc_weight"}
    mod = ast.Module(body=[n for n in tree.body if isinstance(
        n, ast.FunctionDef) and n.name in wanted], type_ignores=[])
    ns = {"torch": torch}
    exec(compile(mod, REF_METRICS, "exec"), ns)
    return ns


@pytest.mark.parametrize("loss_weight", [False, True])
def test_training_trajectory_matches_reference(loss_weight):
    loaded = _load_ref_unrolled()
    if loaded is None or not os.path.exists(REF_METRICS):
        pytest.skip("reference/torch unavailable")
    ref_unrolled, ref_transforms = loaded
    import torch

    import jax
    from dl_swin_gan_tpu.config import get_cfg
    from dl_swin_gan_tpu.data.preprocess import CinePreprocess
    from dl_swin_gan_tpu.data.synthetic import make_cine_example
    from dl_swin_gan_tpu.train import packing
    from dl_swin_gan_tpu.train.train_state import TrainState
    from dl_swin_gan_tpu.train.trainer import Trainer
    from tests.test_forward_parity import _map_convblock
    from tests.test_solver_parity import _ref_cfg

    ref_metric = _load_ref_metrics()

    E, C, T, Y, X = 2, 4, 8, 24, 16
    unrolls, resblocks, feats = 2, 1, 8
    lr = 1e-3
    n_steps = 12

    cfg = get_cfg()
    cfg.MODEL.MODEL_TYPE = "RES"
    cfg.MODEL.META_ARCHITECTURE = "dlespirit"
    cfg.MODEL.PARAMETERS.NUM_UNROLLS = unrolls
    cfg.MODEL.PARAMETERS.NUM_RESBLOCKS = resblocks
    cfg.MODEL.PARAMETERS.NUM_FEATURES = feats
    cfg.MODEL.PARAMETERS.NUM_EMAPS = E
    cfg.MODEL.PARAMETERS.CONV_BLOCK.COMPLEX = False
    cfg.MODEL.PARAMETERS.FIX_STEP_SIZE = False
    cfg.MODEL.PARAMETERS.SLWIN_INIT = True
    cfg.MODEL.RECON_LOSS.NAME = "complex_l1"
    cfg.MODEL.RECON_LOSS.LOSS_WEIGHT = loss_weight
    cfg.MODEL.RECON_LOSS.RENORMALIZE_DATA = False
    cfg.OPTIMIZER.ADAM.LR = lr
    cfg.LR_SCHEDULER.STEP_SIZE = 1000      # no decay inside this test
    cfg.AUG_TRAIN.UNDERSAMPLE.ACCELERATIONS = (4, 5)
    cfg.AUG_TRAIN.UNDERSAMPLE.PARTIAL_KY = 0.0
    cfg.OUTPUT_DIR = "/tmp/traj_parity"

    # ---- identical data: our preprocess (itself parity-tested) feeds BOTH
    pre = CinePreprocess(cfg, use_seed=True)
    batches = []
    for i in range(3):
        k, m, t = make_cine_example(T=T, Y=Y, X=X, C=C, E=E, seed=i)
        ex = pre(k, m, t, f"traj_{i}")
        batches.append({key: np.asarray(v)[None] for key, v in ex.items()})

    # ---- our trainer, real train step
    trainer = Trainer(cfg)
    trainer.set_steps_per_epoch(len(batches))
    state = trainer.init_state(batches[0])
    trainer._build_steps()

    # ---- reference model, weight-copied INTO our params
    rcfg = _ref_cfg(NUM_UNROLLS=unrolls, NUM_RESBLOCKS=resblocks,
                    NUM_FEATURES=feats, NUM_EMAPS=E)
    torch.manual_seed(3)
    ref = ref_unrolled.ProximalGradientDescent(rcfg).train()

    params = jax.tree.map(np.asarray, state.params)
    params["step_size"] = ref.step_size.detach().numpy().copy()
    for i in range(unrolls):
        rnet = ref.cnn_update[i]
        fnet = params[f"ResNet3D_{i}"]
        _map_convblock(rnet.init_layer, fnet["ConvBlock_0"], False)
        for j, rb in enumerate(rnet.res_blocks):
            blk = fnet[f"GatedResBlock_{j}"]
            _map_convblock(rb.layers[0], blk["ConvBlock_0"], False)
            _map_convblock(rb.layers[1], blk["ConvBlock_1"], False)
        _map_convblock(rnet.final_layer, fnet["ConvBlock_1"], False)
    # deep-copy: on CPU jax, jnp.asarray(tensor.detach().numpy()) can alias
    # the torch parameter storage, so torch's opt.step() would silently
    # mutate our params mid-trajectory
    params = jax.tree.map(lambda x: np.array(x, copy=True), params)
    state = TrainState(step=state.step, params=params,
                       opt_state=trainer.tx.init(params),
                       ema_params=state.ema_params)

    # ---- reference optimizer: train.py:146-151 (StepLR epoch-scale, inert)
    opt = torch.optim.Adam(ref.parameters(), lr=lr)

    ours, theirs = [], []
    for step in range(n_steps):
        b = batches[step % len(batches)]

        # reference training_step (train.py:103-127)
        tb = {k: torch.from_numpy(v) for k, v in b.items()}
        A = ref_transforms.SenseModel(tb["maps"], weights=tb["mask"])
        pred = ref(y=tb["kspace"], A=A, x0=tb["init_image"])
        ref_loss = ref_metric["l1"](tb["target"], pred, loss_weight)
        opt.zero_grad()
        ref_loss.backward()
        opt.step()
        theirs.append(float(ref_loss.detach()))

        state, metrics = trainer._train_step(state, packing.pack(b))
        ours.append(float(metrics["Train/complex_l1"]))

    ours, theirs = np.asarray(ours), np.asarray(theirs)
    # step 0 is pure forward parity; later steps accumulate float32
    # optimizer drift — a loose bound still catches any semantic divergence
    # (wrong lr, eps placement, loss weighting => % level divergence fast)
    np.testing.assert_allclose(ours[0], theirs[0], rtol=1e-4)
    np.testing.assert_allclose(ours, theirs, rtol=2e-2)
    # training makes progress: compare the last pass over the 3 batches
    # against the first (per-batch losses aren't comparable across batches)
    assert ours[-3:].mean() < ours[:3].mean()
    assert theirs[-3:].mean() < theirs[:3].mean()


@pytest.mark.parametrize("weight", [False, True])
def test_metric_values_match_reference(weight):
    """Value parity for the loss/metric functions themselves: l1, l2, psnr,
    calc_weight, and perp_loss (reference `dl_cs/utils/metrics.py:11-39,
    121-153`) on random complex volumes."""
    if not os.path.exists(REF_METRICS):
        pytest.skip("reference unavailable")
    import ast

    import torch

    import jax.numpy as jnp

    from dl_swin_gan_tpu.ops import metrics as M

    tree = ast.parse(open(REF_METRICS).read())
    wanted = {"l1", "l2", "psnr", "calc_weight", "perp_loss"}
    mod = ast.Module(body=[n for n in tree.body if isinstance(
        n, ast.FunctionDef) and n.name in wanted], type_ignores=[])
    ns = {"torch": torch}
    exec(compile(mod, REF_METRICS, "exec"), ns)

    rngnp = np.random.RandomState(3)
    shape = (2, 2, 6, 12, 10)
    ref = (rngnp.randn(*shape) + 1j * rngnp.randn(*shape)).astype(np.complex64)
    pred = (ref + 0.1 * (rngnp.randn(*shape) + 1j * rngnp.randn(*shape))
            ).astype(np.complex64)
    tr, tp = torch.from_numpy(ref), torch.from_numpy(pred)
    jr, jp = jnp.asarray(ref), jnp.asarray(pred)

    for name in ("l1", "l2", "psnr", "perp_loss"):
        theirs = float(ns[name](tr, tp, weight))
        ours = float(getattr(M, name)(jr, jp, weight))
        np.testing.assert_allclose(ours, theirs, rtol=1e-5,
                                   err_msg=f"{name} weight={weight}")
    np.testing.assert_allclose(np.asarray(M.calc_weight(jr)),
                               ns["calc_weight"](tr).numpy(), rtol=1e-5)
