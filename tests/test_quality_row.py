"""The committed quality-table protocol driver (scripts/quality_row.py):
zero-filled kind end-to-end on tiny synthetic data — 1accel references +
R-accel recons written as CFL, eval CSV produced with sane metrics."""

import csv
import os

from dl_swin_gan_tpu.config import get_cfg
from dl_swin_gan_tpu.data.synthetic import write_synthetic_dataset


def test_quality_row_zerofilled(tmp_path):
    test_dir = str(tmp_path / "test")
    write_synthetic_dataset(test_dir, num_files=2, slices=1, T=8, Y=32, X=24,
                            C=4, E=2, seed=42)
    cfg = get_cfg()
    cfg.MODEL.PARAMETERS.SLWIN_INIT = True
    cfg.AUG_VAL.UNDERSAMPLE.ACCELERATIONS = (4, 5)
    cfg.AUG_VAL.UNDERSAMPLE.PARTIAL_KY = 0.0
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(cfg.dump())

    from scripts.quality_row import main

    out = str(tmp_path / "zf")
    rc = main(["--kind", "zerofilled", "--config-file", cfg_path,
               "--out", out, "--test-glob", os.path.join(test_dir, "*.h5"),
               "--acceleration", "4"])
    assert not rc

    for name in ("synthetic_000", "synthetic_001"):
        assert os.path.exists(os.path.join(out, f"{name}_1accel.im.hdr"))
        assert os.path.exists(os.path.join(out, f"{name}_4accel.im.hdr"))

    with open(os.path.join(out, "eval_4accel.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    for row in rows:
        ssim, psnr = float(row["ssim"]), float(row["psnr"])
        # 4x zero-filled on a tiny phantom: imperfect but recognizable
        assert 0.3 < ssim < 1.0
        assert 10.0 < psnr < 60.0
