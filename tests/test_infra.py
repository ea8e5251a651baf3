"""Infrastructure tests: config system (incl. loading the REFERENCE yaml
files verbatim), CFL roundtrip, packing, coil compression, perceptual loss,
folder naming, graft entry."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dl_swin_gan_tpu.config import CfgNode, get_cfg, load_cfg
from dl_swin_gan_tpu.data import cfl
from dl_swin_gan_tpu.train import packing
from dl_swin_gan_tpu.utils import folder_to_parameter, parameter_to_folder

REF_CONFIGS = "/root/reference/configs"


def test_defaults_tree_keys():
    cfg = get_cfg()
    assert cfg.MODEL.PARAMETERS.NUM_UNROLLS == 5
    assert cfg.AUG_TRAIN.UNDERSAMPLE.ACCELERATIONS == (10, 15)
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.MODEL.NAME = "x"
    cfg.defrost()
    cfg.MODEL.NAME = "x"


def _all_reference_configs():
    """Every YAML in the reference tree, including the dslr_experiments
    sweeps and config_recon.yaml. config_se_experimental.yaml is excluded:
    it is invalid YAML in the reference itself (a broken `&anchor:` +
    `!!python/object/apply` line at :12 that even yaml.safe_load rejects).
    """
    import glob
    paths = sorted(glob.glob(os.path.join(REF_CONFIGS, "**", "*.yaml"),
                             recursive=True))
    return [os.path.relpath(p, REF_CONFIGS) for p in paths
            if "se_experimental" not in p]


@pytest.mark.parametrize(
    "name", _all_reference_configs() or ["reference-unavailable"])
def test_reference_configs_load_unchanged(name):
    """The reference's own YAML files must merge cleanly (key compatibility)."""
    path = os.path.join(REF_CONFIGS, name)
    if not os.path.exists(path):
        pytest.skip("reference unavailable")
    cfg = load_cfg(path, require_output_dir=False, freeze=False)
    assert isinstance(cfg.AUG_TRAIN.UNDERSAMPLE.ACCELERATIONS, tuple)
    assert cfg.MODEL.PARAMETERS.NUM_UNROLLS >= 1
    assert isinstance(cfg.DATASET.TRAIN, tuple)


def test_our_configs_load():
    for name in ["basic/example.yaml", "config_se.yaml", "config_swin.yaml",
                 "config_dit.yaml", "config_latte.yaml", "config_dslr.yaml",
                 "smoke.yaml"]:
        cfg = load_cfg(os.path.join(os.path.dirname(__file__), "..",
                                    "configs", name))
        assert cfg.is_frozen()


def test_merge_from_list_decodes_literals():
    cfg = get_cfg()
    cfg.merge_from_list(["AUG_TRAIN.UNDERSAMPLE.ACCELERATIONS", "(4,6)",
                         "MODEL.PARAMETERS.NUM_UNROLLS", "3",
                         "MODEL.MODEL_TYPE", "SE"])
    assert cfg.AUG_TRAIN.UNDERSAMPLE.ACCELERATIONS == (4, 6)
    assert cfg.MODEL.PARAMETERS.NUM_UNROLLS == 3
    assert cfg.MODEL.MODEL_TYPE == "SE"


def test_cfl_roundtrip(tmp_path, make_complex):
    x = make_complex((6, 5, 4, 3))
    base = str(tmp_path / "vol")
    cfl.writecfl(base, x)
    back = cfl.readcfl(base)
    np.testing.assert_allclose(back, x)
    # C-order convention too
    cfl.write(base + "_c", x, order="C")
    np.testing.assert_allclose(cfl.read(base + "_c", order="C"), x)


def test_cfl_reference_compat(tmp_path, make_complex):
    """Files written by the reference cfl.py must read back identically."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_cfl", "/root/reference/dl_cs/fileio/cfl.py")
    if spec is None:
        pytest.skip("reference unavailable")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    x = make_complex((4, 3, 2))
    base = str(tmp_path / "refvol")
    ref.writecfl(base, np.asarray(x))
    np.testing.assert_allclose(cfl.readcfl(base), x)


def test_packing_roundtrip(make_complex):
    batch = {"a": make_complex((2, 3)), "b": np.ones((4,), np.float32),
             "nested": {"c": make_complex((2,))}}
    packed = packing.pack(batch)
    unpacked = packing.unpack(jax.tree.map(jnp.asarray, packed))
    np.testing.assert_allclose(np.asarray(unpacked["a"]), batch["a"], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(unpacked["nested"]["c"]),
                               batch["nested"]["c"], rtol=1e-6)
    host = packing.unpack_np(packed)
    np.testing.assert_allclose(host["a"], batch["a"])


def test_coil_compression_preserves_signal():
    """GCC to full coil count is (unitary) lossless; to fewer coils it keeps
    most of the energy of smooth coil data."""
    from dl_swin_gan_tpu.data.coilcomp import compress
    rng = np.random.RandomState(0)
    Y, X, C = 32, 24, 8
    yy, xx = np.mgrid[0:Y, 0:X]
    img = np.exp(-(((yy - 16) / 16) ** 2 + ((xx - 12) / 12) ** 2))
    coils = np.stack([img * np.exp(-((yy - 4 * c) ** 2) / 400 + 1j * 0.1 * c)
                      for c in range(C)])
    ksp = np.fft.fftshift(np.fft.fft2(coils, norm="ortho"), axes=(-2, -1))
    out_full = compress(ksp.astype(np.complex64), num_virtual=C)
    e_in = float((np.abs(ksp) ** 2).sum())
    e_full = float((np.abs(out_full) ** 2).sum())
    assert np.isclose(e_full, e_in, rtol=1e-3)
    out4 = compress(ksp.astype(np.complex64), num_virtual=4)
    e4 = float((np.abs(out4) ** 2).sum())
    assert e4 > 0.95 * e_in  # smooth coils compress well


def test_perceptual_loss_grad(make_complex):
    from dl_swin_gan_tpu.train.perceptual import PerceptualLoss
    pl = PerceptualLoss()
    ref = jnp.asarray(make_complex((1, 2, 2, 32, 24)))
    pred = jnp.asarray(make_complex((1, 2, 2, 32, 24)))
    assert float(pl(ref, ref)) < 1e-6
    g = jax.grad(lambda p: pl(ref, p))(pred)
    assert float(jnp.abs(g).sum()) > 0


def test_folder_param_roundtrip():
    cfg = get_cfg()
    cfg.MODEL.MODEL_TYPE = "SE"
    name = parameter_to_folder(cfg)
    assert name == "train-3D_5steps_2SEblocks_256features_2emaps_0weight"
    param = folder_to_parameter(name)
    assert param["num_unrolls"] == 5
    assert param["num_features"] == 256
    cfg2 = get_cfg()
    folder_to_parameter(name, write_config=True, config=cfg2)
    assert cfg2.MODEL.MODEL_TYPE == "SE"

    # transformer types encode their OWN depth knob: two Swin runs differing
    # only in swinblock count must not collide on a folder name
    cfg3 = get_cfg()
    cfg3.MODEL.MODEL_TYPE = "SWIN"
    cfg3.MODEL.PARAMETERS.NUM_SWINBLOCKS = 6
    name3 = parameter_to_folder(cfg3)
    assert "6SWINblocks" in name3
    cfg4 = get_cfg()
    folder_to_parameter(name3, write_config=True, config=cfg4)
    assert cfg4.MODEL.MODEL_TYPE == "SWIN"
    assert cfg4.MODEL.PARAMETERS.NUM_SWINBLOCKS == 6


def test_graft_entry_single_chip():
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(out))


def test_checkpoint_duplicate_step_keeps_metrics(tmp_path):
    """A metric-less step-interval save followed by a metric-bearing
    validation save at the SAME step must not lose the metrics (orbax
    no-ops duplicate-step saves; the manager replaces the banked step).
    Regression test: CKPT_EVERY_N_STEPS colliding with end-of-epoch
    validation previously defeated best-by-monitor retention."""
    from dl_swin_gan_tpu.train.checkpoint import CheckpointManager

    state = {"w": np.arange(4, dtype=np.float32)}
    mgr = CheckpointManager(str(tmp_path / "ck"), monitor="Validate MSE",
                            max_to_keep=1)
    mgr.save(8, state)                                   # step-interval save
    mgr.save(8, state, metrics={"Validate MSE": 0.5})    # validation, same step
    assert mgr.best_step() == 8
    mgr.save(16, state, metrics={"Validate MSE": 0.9})   # worse -> best stays 8
    assert mgr.best_step() == 8
    mgr.save(16, state)                                  # metric-less re-save: no-op
    assert mgr.best_step() == 8
    restored = mgr.restore({"w": np.zeros(4, np.float32)}, step=mgr.best_step())
    np.testing.assert_array_equal(restored["w"], state["w"])
    mgr.close()


def test_checkpoint_best_retention_mode_max(tmp_path):
    """Under mode='max', metric-less periodic saves must never rank as
    "best". Regression: the missing-metric sentinel was +inf for both
    modes, so with mode='max' every periodic save outranked the genuinely
    best validated checkpoint and evicted it."""
    from dl_swin_gan_tpu.train.checkpoint import CheckpointManager

    state = {"w": np.arange(4, dtype=np.float32)}
    mgr = CheckpointManager(str(tmp_path / "ck"), monitor="Validate SSIM",
                            max_to_keep=1, mode="max")
    mgr.save(8, state, metrics={"Validate SSIM": 0.9})   # the genuine best
    mgr.save(16, state)                                  # periodic, metric-less
    mgr.save(24, state, metrics={"Validate SSIM": 0.5})  # worse validation
    assert mgr.best_step() == 8
    steps = set(mgr._mgr.all_steps())
    assert 8 in steps                    # best survives the periodic saves
    assert mgr.latest_step() == 24
    mgr.close()


def test_checkpoint_keeps_latest_even_when_worse(tmp_path):
    """Retention must be (best N by monitor) OR (latest step). With plain
    max_to_keep+best_fn, once every periodic save collides with a
    validation save (so all saves carry metrics), orbax GC'd the newest
    checkpoint whenever it wasn't among the best — crash-resume then
    rewound to the best step (observed: a 32k-step run whose final
    checkpoint was deleted seconds after being written)."""
    from dl_swin_gan_tpu.train.checkpoint import CheckpointManager

    state = {"w": np.arange(4, dtype=np.float32)}
    mgr = CheckpointManager(str(tmp_path / "ck"), monitor="Validate MSE",
                            max_to_keep=1)
    mgr.save(8, state, metrics={"Validate MSE": 0.5})
    # Degrading metric: every later step is worse than the best.
    mgr.save(16, state, metrics={"Validate MSE": 0.9})
    mgr.save(24, state, metrics={"Validate MSE": 0.8})
    assert mgr.best_step() == 8
    assert mgr.latest_step() == 24      # latest survives GC despite being worse
    steps = set(mgr._mgr.all_steps())
    assert 8 in steps and 24 in steps
    assert 16 not in steps              # neither best nor latest -> GC'd
    restored = mgr.restore({"w": np.zeros(4, np.float32)})
    np.testing.assert_array_equal(restored["w"], state["w"])
    mgr.close()


def test_dataloader_early_exit_releases_producer():
    """Breaking out of a DataLoader iteration mid-epoch must terminate the
    producer thread. Regression: with the queue full, the producer blocked
    forever inside q.put() (stop was only checked between batches), leaking
    a thread plus its prefetched batches per abandoned iteration."""
    import threading
    import time

    from dl_swin_gan_tpu.data.dataset import DataLoader

    class _DS:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            return {"x": np.full((4, 4), i, np.float32)}

    loader = DataLoader(_DS(), batch_size=1, shuffle=False, prefetch=1)
    before = threading.active_count()
    for _ in range(3):
        for batch in loader:
            break  # abandon the epoch with the queue full
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_merge_from_list_rejects_unknown_keys():
    """A typo'd CLI override must fail loudly (fvcore semantics) — silently
    creating a dead key leaves the intended setting at its default (e.g.
    'EVAL.CKPT_EVERY_N_STEP 8' would leave checkpointing off during a
    crash storm)."""
    cfg = get_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["EVAL.CKPT_EVERY_N_STEP", "8"])
    with pytest.raises(KeyError):
        cfg.merge_from_list(["EVALX.CKPT_EVERY_N_STEPS", "8"])


def test_frozen_config_rejects_dict_mutation():
    """freeze() must also guard dict-style bulk mutation (update/pop/
    setdefault/del), not just attribute sets."""
    cfg = get_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.update({"SEED": 99})
    with pytest.raises(AttributeError):
        cfg.pop("SEED")
    with pytest.raises(AttributeError):
        cfg.setdefault("NEW", 1)
    with pytest.raises(AttributeError):
        del cfg["SEED"]
    cfg.defrost()
    cfg.update({"SEED": 99})
    assert cfg.SEED == 99


def test_merge_from_file_rejects_newer_version(tmp_path):
    """Versioned-compat contract (reference config.py:41-69): a config file
    newer than this schema must fail loudly, not merge silently."""
    p = tmp_path / "v99.yaml"
    p.write_text("VERSION: 99\nOUTPUT_DIR: /tmp/x\n")
    cfg = get_cfg()
    with pytest.raises(AssertionError):
        cfg.merge_from_file(str(p))


def test_run_training_heals_missing_val_split(tmp_path, monkeypatch):
    """--synthetic-data regeneration is checked PER SPLIT: a run killed
    between the train and val writes must heal the val split on rerun."""
    import yaml

    from dl_swin_gan_tpu.train.cli import run_training

    cfg = yaml.safe_load(open("configs/smoke.yaml"))
    cfg["OUTPUT_DIR"] = str(tmp_path / "out")
    cfgp = tmp_path / "cfg.yaml"
    cfgp.write_text(yaml.safe_dump(cfg))

    captured = {}

    class Stop(Exception):
        pass

    def fake(cfg):
        captured["train"] = cfg.DATASET.TRAIN[0]
        captured["val"] = cfg.DATASET.VAL[0]
        raise Stop

    argv = ["--config-file", str(cfgp), "--synthetic-data"]
    with pytest.raises(Stop):
        run_training(fake, "t", argv)
    assert os.listdir(captured["val"])
    # simulate the crash case: wipe the val split, keep train
    import shutil
    shutil.rmtree(captured["val"])
    with pytest.raises(Stop):
        run_training(fake, "t", argv)
    assert os.listdir(captured["val"])  # healed, not skipped
