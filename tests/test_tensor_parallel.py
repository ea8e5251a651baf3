"""Tensor-parallel ('model' mesh axis) equivalence for the transformer trunks.

The megatron rules live in `parallel/mesh.py::_TP_RULES` as pure GSPMD
parameter annotations (qkv/MLP-up column-parallel, attention-proj/MLP-down
row-parallel). Correctness bar: the SAME batch and init seed must produce
the same first-step metrics on a 1-device mesh and on a (2 x 2 x 2)
data x fsdp x model mesh (CPU, 8 virtual devices — tests/conftest.py), and
the attention kernels must actually be sharded over 'model' (a silently
replicated layout would pass the numerics check).

Reference counterpart: none — the reference's distribution stack
(Lightning DDP / DeepSpeed ZeRO-3, SURVEY §2.9) has no tensor parallelism;
this is TPU headroom for trunk widths past one chip's HBM.
"""

import jax
import numpy as np
import pytest

from dl_swin_gan_tpu.config import get_cfg
from dl_swin_gan_tpu.parallel.mesh import axis_size, make_mesh, shard_batch
from dl_swin_gan_tpu.train import packing

from tests.test_sharded_trainers import _batch  # same synthetic protocol


def _diff_cfg(tmp_path, model_type):
    cfg = get_cfg()
    cfg.MODEL.MODEL_TYPE = model_type
    cfg.MODEL.META_ARCHITECTURE = "DDPM_X"
    p = cfg.MODEL.PARAMETERS
    p.NUM_UNROLLS = 1
    p.NUM_RESBLOCKS = 0
    p.NUM_LAYERS = 2
    p.NUM_HEADS = 2
    p.NUM_FEATURES = 32
    p.NUM_EMAPS = 2
    p.PATCH_SIZE = (2, 4, 4)
    p.SLWIN_INIT = False
    cfg.MODEL.RECON_LOSS.RENORMALIZE_DATA = False
    cfg.AUG_TRAIN.UNDERSAMPLE.ACCELERATIONS = (3, 4)
    cfg.AUG_TRAIN.UNDERSAMPLE.PARTIAL_KY = 0.0
    cfg.OUTPUT_DIR = str(tmp_path)
    return cfg


def _first_step(trainer, batch):
    state = trainer.init_state(batch)
    trainer._build_steps()
    packed = shard_batch(packing.pack(batch), trainer.mesh)
    new_state, metrics = trainer._train_step(state, packed)
    return state, new_state, {k: float(v) for k, v in metrics.items()}


def _leaf_specs(params):
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        out[key] = (leaf.sharding.spec if hasattr(leaf, "sharding") else None,
                    leaf)
    return out


@pytest.mark.parametrize("model_type", ["DIT", "LATTE"])
def test_tp_step_matches_single_device(tmp_path, model_type):
    from dl_swin_gan_tpu.train.diffusion_trainer import DiffusionTrainer

    cfg = _diff_cfg(tmp_path, model_type)

    t1 = DiffusionTrainer(cfg, mesh=make_mesh(
        data=1, fsdp=1, model=1, devices=jax.devices()[:1]))
    tp_mesh = make_mesh(data=2, fsdp=2, model=2)
    assert axis_size(tp_mesh, "model") == 2
    ttp = DiffusionTrainer(cfg, mesh=tp_mesh)

    # the 90/10 submask split is host-side numpy RNG: prepare ONCE and feed
    # the identical prepared batch to both meshes
    batch = t1.prepare_batch(_batch(cfg, B=2))

    m1_state, m1_new, m1 = _first_step(t1, batch)
    tp_state, tp_new, mtp = _first_step(ttp, batch)

    # the trunk attention kernels must really live sharded over 'model'
    specs = _leaf_specs(tp_state.params)
    qkv = {k: v for k, v in specs.items() if k.endswith("qkv/kernel")}
    assert qkv, f"no qkv kernels found in {model_type} param tree"
    for k, (spec, leaf) in qkv.items():
        assert spec is not None and "model" in tuple(spec), (
            f"{k} not tensor-parallel: spec={spec}")
        # physical shard really is half the kernel on the model axis
        shard = leaf.addressable_shards[0]
        assert shard.data.shape[1] * 2 == leaf.shape[1], (
            f"{k}: shard {shard.data.shape} vs global {leaf.shape}")

    assert set(m1) == set(mtp)
    for k in m1:
        np.testing.assert_allclose(
            m1[k], mtp[k], rtol=2e-3, atol=1e-6,
            err_msg=f"metric {k} diverges between 1-device and 2x2x2 mesh")

    # one optimizer step under tp must land on the same parameters
    flat1 = _leaf_specs(m1_new.params)
    flattp = _leaf_specs(tp_new.params)
    assert set(flat1) == set(flattp)
    for k in flat1:
        np.testing.assert_allclose(
            np.asarray(flat1[k][1]), np.asarray(flattp[k][1]),
            rtol=2e-3, atol=2e-5,
            err_msg=f"param {k} diverges after one tp step")


def test_tp_rules_indivisible_fall_back():
    """A kernel whose tp axis doesn't divide by the model extent must fall
    back to the fsdp rule instead of producing an invalid spec."""
    from jax.sharding import PartitionSpec as P

    from dl_swin_gan_tpu.parallel.mesh import fsdp_shardings

    mesh = make_mesh(data=2, fsdp=2, model=2)
    tree = {
        "Attention_0": {"qkv": {
            # out dim 33 % 2 != 0 -> no 'model' sharding
            "kernel": jax.ShapeDtypeStruct((16, 33), np.float32)}},
        "Mlp_0": {"Dense_0": {
            "kernel": jax.ShapeDtypeStruct((64, 256), np.float32)}},
    }
    sh = fsdp_shardings(tree, mesh)
    assert "model" not in str(sh["Attention_0"]["qkv"]["kernel"].spec)
    assert sh["Mlp_0"]["Dense_0"]["kernel"].spec == P("fsdp", "model")


def test_tp_step_matches_single_device_swin(tmp_path):
    """Swin trunk tensor parallelism (round-3 verdict #5): the Swin blocks
    now use the shared Mlp module, so `_TP_RULES` must really shard BOTH the
    window-attention qkv/proj kernels and the MLP kernels over 'model', and
    a TP-mesh first step must match the 1-device step."""
    from dl_swin_gan_tpu.train.trainer import Trainer

    cfg = get_cfg()
    cfg.MODEL.MODEL_TYPE = "SWIN"
    cfg.MODEL.META_ARCHITECTURE = "dlespirit"
    p = cfg.MODEL.PARAMETERS
    p.NUM_UNROLLS = 1
    p.NUM_RESBLOCKS = 1
    p.NUM_SWINBLOCKS = 1
    p.NUM_FEATURES = 16
    p.NUM_EMAPS = 2
    p.SLWIN_INIT = False
    p.CONV_BLOCK.COMPLEX = False  # Swin trunk runs real/imag channels
    cfg.MODEL.RECON_LOSS.RENORMALIZE_DATA = False
    cfg.AUG_TRAIN.UNDERSAMPLE.ACCELERATIONS = (3, 4)
    cfg.AUG_TRAIN.UNDERSAMPLE.PARTIAL_KY = 0.0
    cfg.OUTPUT_DIR = str(tmp_path)

    t1 = Trainer(cfg, mesh=make_mesh(
        data=1, fsdp=1, model=1, devices=jax.devices()[:1]))
    tp_mesh = make_mesh(data=2, fsdp=2, model=2)
    assert axis_size(tp_mesh, "model") == 2
    ttp = Trainer(cfg, mesh=tp_mesh)

    batch = _batch(cfg, B=2)

    def _step(trainer):
        state = trainer.init_state(batch, seed=0)
        trainer._build_steps()
        packed = shard_batch(packing.pack(batch), trainer.mesh)
        new_state, metrics = trainer._train_step(state, packed)
        return state, new_state, {k: float(v) for k, v in metrics.items()}

    s1, n1, m1 = _step(t1)
    stp, ntp, mtp = _step(ttp)

    specs = _leaf_specs(stp.params)
    for suffix, ax in (("attn/qkv/kernel", 1), ("Mlp_0/Dense_0/kernel", 1),
                       ("Mlp_0/Dense_1/kernel", 0)):
        hits = {k: v for k, v in specs.items() if k.endswith(suffix)}
        assert hits, f"no {suffix} params found in SWIN tree"
        for k, (spec, leaf) in hits.items():
            assert spec is not None and "model" in tuple(spec), (
                f"{k} not tensor-parallel: spec={spec}")
            shard = leaf.addressable_shards[0]
            assert shard.data.shape[ax] * 2 == leaf.shape[ax], (
                f"{k}: shard {shard.data.shape} vs global {leaf.shape}")

    assert set(m1) == set(mtp)
    for k in m1:
        np.testing.assert_allclose(
            m1[k], mtp[k], rtol=2e-3, atol=1e-6,
            err_msg=f"metric {k} diverges between 1-device and 2x2x2 mesh")


def test_tp_mesh_with_no_matchable_params_raises():
    """The silent-TP-loss guard: requesting a model>1 mesh over a tree with
    nothing tensor-parallelizable (e.g. a pure-conv net, or after a rename
    breaks the rules) must raise instead of quietly sharding fsdp-only."""
    from dl_swin_gan_tpu.parallel.mesh import fsdp_shardings

    mesh = make_mesh(data=2, fsdp=2, model=2)
    tree = {"ConvBlock_0": {
        "Conv_0": {"kernel": jax.ShapeDtypeStruct((3, 3, 3, 16, 16),
                                                  np.float32)}}}
    with pytest.raises(ValueError, match="tensor-parallel"):
        fsdp_shardings(tree, mesh)
