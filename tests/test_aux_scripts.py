"""Smoke tests for the evaluation/visualization/utility tooling scripts.

The reference ships these as untested one-off tools (`eval.py`,
`eval_recon.py:114-357`, `display_data.py`, `display_matrix.py`,
`write_dcm.py:18-236`, `im_count.py`, `copy_mask.py`, `rename_file.py`);
here each one runs end-to-end against a tiny synthetic CFL recon pair so a
refactor can't silently break the offline evaluation toolchain.
"""

import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from dl_swin_gan_tpu.data import cfl


@pytest.fixture(scope="module")
def recon_dir(tmp_path_factory):
    """A recon directory with exam_{1,12}accel.im in scanner dim order
    ([x, y, sl, emap, ph] + singleton tail), as reconstruct_h5_file writes."""
    d = tmp_path_factory.mktemp("recon")
    rng = np.random.RandomState(0)
    sl, e, t, y, x = 2, 2, 4, 24, 16
    yy, xx = np.mgrid[0:y, 0:x]
    base = np.exp(-((yy - y / 2) ** 2 + (xx - x / 2) ** 2) / 40.0)
    clean = (base[None, None, None] *
             (1.0 + 0.2 * np.sin(np.arange(t) / t * 2 * np.pi))
             .reshape(1, 1, t, 1, 1)).astype(np.complex64)
    clean = np.broadcast_to(clean, (sl, e, t, y, x)).copy()
    noisy = clean + 0.05 * (rng.randn(*clean.shape) +
                            1j * rng.randn(*clean.shape)).astype(np.complex64)

    def write(path, vol):
        v = np.transpose(vol, (4, 3, 0, 1, 2))[:, :, :, :, :, None, None, None]
        cfl.write(path, v, order="F")

    write(str(d / "exam_1accel.im"), clean)
    write(str(d / "exam_12accel.im"), noisy)
    return d


def test_eval_script(recon_dir):
    import eval as eval_script

    eval_script.main(["--recon-directory", str(recon_dir),
                      "--acceleration", "12"])
    pkl = recon_dir / "eval_12accel.pkl"
    assert pkl.exists()
    with open(pkl, "rb") as f:
        results = pickle.load(f)
    assert "exam" in results
    m = results["exam"]
    assert set(m) >= {"ssim", "rmse", "psnr"}
    assert 0.2 < float(np.mean(m["ssim"])) < 1.0  # noisy vs clean
    assert np.isfinite(m["psnr"]).all()


def test_eval_recon_script(recon_dir, tmp_path):
    import eval as eval_script
    import eval_recon

    eval_script.main(["--recon-directory", str(recon_dir),
                      "--acceleration", "12"])
    pkl = str(recon_dir / "eval_12accel.pkl")
    out = str(tmp_path / "cmp.png")
    eval_recon.main(["--pickle-a", pkl, "--pickle-b", pkl,
                     "--label-a", "a", "--label-b", "b", "--out", out])
    assert os.path.exists(out)


def test_eval_recon_roi_columns(recon_dir, tmp_path, capsys):
    """ROI-mean comparison columns (reference eval_recon.py:62-66,189-193):
    with an `roi` mask installed into the pickles (copy_mask.py route) and
    the per-pixel maps from eval.py, eval_recon reports per-exam
    `<label>_roi` means — verified against a hand-computed mean over the
    masked pixels of the stored ssim_image."""
    import eval as eval_script
    import eval_recon

    eval_script.main(["--recon-directory", str(recon_dir),
                      "--acceleration", "12"])
    pkl = str(recon_dir / "eval_12accel.pkl")
    with open(pkl, "rb") as f:
        res = pickle.load(f)
    assert "ssim_image" in res["exam"] and "rmse_image" in res["exam"]

    y, x = res["exam"]["ssim_image"].shape[-2:]
    roi = np.zeros((y, x), bool)
    roi[y // 4: y // 2, x // 4: x // 2] = True
    res["exam"]["roi"] = roi
    pkl_roi = str(tmp_path / "roi.pkl")
    with open(pkl_roi, "wb") as f:
        pickle.dump(res, f)

    capsys.readouterr()  # drop eval.py's own summary lines
    eval_recon.main(["--pickle-a", pkl_roi, "--pickle-b", pkl_roi,
                     "--label-a", "a", "--label-b", "b"])
    printed = capsys.readouterr().out
    assert "a_roi" in printed and "b_roi" in printed and "delta_roi" in printed

    expect = float(res["exam"]["ssim_image"][..., roi].mean())
    from dl_swin_gan_tpu.infer.evaluate import mean_roi
    assert abs(mean_roi(res["exam"]["ssim_image"], roi) - expect) < 1e-12
    # the printed a_roi column carries that value
    import re
    row = next(l for l in printed.splitlines()
               if l.startswith("exam") and re.search(r"\d", l))
    vals = [float(v) for v in re.findall(r"-?\d+\.\d+", row)]
    assert any(abs(v - expect) < 5e-4 for v in vals)


def test_copy_mask_roundtrip(recon_dir, tmp_path):
    import copy_mask

    rec = {"exam": {"ssim": np.ones(3), "roi": np.ones((4, 4), bool)}}
    src = str(tmp_path / "src.pkl")
    dst = str(tmp_path / "dst.pkl")
    with open(src, "wb") as f:
        pickle.dump(rec, f)
    with open(dst, "wb") as f:
        pickle.dump({"exam": {"ssim": np.zeros(3)}}, f)
    copy_mask.main(["--source", src, "--dest", dst])
    with open(dst, "rb") as f:
        out = pickle.load(f)
    np.testing.assert_array_equal(out["exam"]["roi"], rec["exam"]["roi"])


def test_display_data_script(recon_dir, tmp_path):
    import display_data

    png = str(tmp_path / "frames.png")
    gif = str(tmp_path / "cine.gif")
    display_data.main([str(recon_dir / "exam_12accel.im"),
                       "--out", png, "--gif", gif])
    assert os.path.getsize(png) > 0
    assert os.path.getsize(gif) > 0


def test_display_matrix_script(recon_dir, tmp_path):
    import display_matrix

    out = str(tmp_path / "matrix.png")
    display_matrix.main(["--recon-directory", str(recon_dir),
                         "--name", "exam", "--accelerations", "12",
                         "--out", out])
    assert os.path.getsize(out) > 0


def test_write_dcm_script(recon_dir, tmp_path):
    import write_dcm

    out = str(tmp_path / "dcm")
    write_dcm.main([str(recon_dir / "exam_12accel.im"),
                    "--out-directory", out])
    # with pydicom: a DICOM series; without: int16 pixels + metadata JSON
    assert os.listdir(out)


def test_im_count_script(recon_dir, capsys):
    import im_count

    im_count.main([str(recon_dir)])
    out = capsys.readouterr().out
    assert "total:" in out


def test_rename_file_script(tmp_path):
    import rename_file

    (tmp_path / "a_old.im.hdr").write_text("x")
    (tmp_path / "a_old.im.cfl").write_text("x")
    rename_file.main([str(tmp_path), "--find", "old", "--replace", "new",
                      "--dry-run"])
    assert (tmp_path / "a_old.im.hdr").exists()  # dry run: untouched
    rename_file.main([str(tmp_path), "--find", "old", "--replace", "new"])
    assert (tmp_path / "a_new.im.hdr").exists()
    assert not (tmp_path / "a_old.im.hdr").exists()


def test_batch_recon_script(tmp_path):
    """batch_recon loops reconstruct_h5 over a directory; at acceleration 1
    (no checkpoint needed) it writes the fully-sampled adjoint recon per
    file under the folder_param-derived subfolder (reference
    batch_recon.py:10-42)."""
    import glob

    import batch_recon

    from dl_swin_gan_tpu.data.synthetic import write_synthetic_dataset

    data = str(tmp_path / "h5")
    write_synthetic_dataset(data, num_files=2, slices=1, seed=0,
                            T=6, Y=24, X=16, C=2)  # T >= slwin window (5)
    out = str(tmp_path / "out")
    batch_recon.main(["--config-file", "configs/smoke.yaml",
                      "--ckpt", "/nonexistent",  # unused at accel 1
                      "--data-directory", data,
                      "--out-directory", out,
                      "--acceleration", "1"])
    ims = glob.glob(os.path.join(out, "*", "*_1accel.im.hdr"))
    assert len(ims) == 2
