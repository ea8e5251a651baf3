#!/usr/bin/env python
"""One-command quality-table row: run the reference evaluation protocol
(12x VDkt re-undersampling at the parity seed, SSIM/RMSE/PSNR vs the
fully-sampled adjoint) over the held-out quality-set exams.

This is the committed form of the protocol behind every row of the README
quality table (reference counterpart: `reconstruct_h5.py` at accel 1 and R,
then `evaluate.py`):

  python scripts/quality_row.py --config-file configs/quality/dslr.yaml \
      --ckpt runs/dslrq2/checkpoints --kind dslr --out runs/dslrq2/recon

  python scripts/quality_row.py --kind zerofilled --out runs/quality/zf \
      --config-file configs/quality/dslr.yaml

Writes `<exam>_{1,R}accel.im` CFLs and `eval_<R>accel.csv` under --out.
"""

import argparse
import glob
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger(__name__)


def _write_im(out_path, images):
    """[slices, E, T, Y, X] -> scanner dim order CFL (reconstruct_h5.py:219-231)."""
    from dl_swin_gan_tpu.data import cfl
    images = np.transpose(images, (4, 3, 0, 1, 2))[:, :, :, :, :, None, None, None]
    cfl.write(out_path, images, order="F")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    parser.add_argument("--kind", required=True,
                        choices=["unrolled", "diffusion", "dslr", "zerofilled"])
    parser.add_argument("--out", required=True)
    parser.add_argument("--test-glob", default="runs/quality/data/test/*.h5")
    parser.add_argument("--acceleration", type=float, default=12)
    parser.add_argument("--use-ema", action="store_true")
    parser.add_argument("--sample-steps", type=int, default=100)
    parser.add_argument("--batch-size", type=int, default=1,
                        help="slices per jitted recon call (diffusion "
                             "sampling amortizes its fixed per-call cost)")
    parser.add_argument("opts", nargs="*", help="KEY VALUE config overrides")
    args = parser.parse_args(argv)
    if args.kind != "zerofilled" and not args.ckpt:
        parser.error(f"--ckpt is required for --kind {args.kind}")

    # Publish this pid for bench arbitration (bench.py _tpu_arbitration):
    # a long sampling eval hogs the shared TPU exactly like a trainer, so
    # a concurrently-fired driver bench pauses it for the measurement.
    # Worst case the supervisor's eval `timeout` kills a paused eval —
    # re-running an eval is cheap; a contention-corrupted round headline
    # is unrecoverable.
    _pidfile = os.environ.get("TRAINER_PIDFILE", "/tmp/dl_swin_gan_trainer.pid")
    try:
        with open(_pidfile, "w") as _f:
            _f.write(str(os.getpid()))
        import atexit
        atexit.register(lambda: os.path.exists(_pidfile) and os.remove(_pidfile))
    except OSError:
        pass

    import h5py

    from dl_swin_gan_tpu.config import load_cfg
    from dl_swin_gan_tpu.infer import load_checkpoint_params, reconstruct_h5_file
    from dl_swin_gan_tpu.infer.transforms import ResampleTransform

    cfg = load_cfg(args.config_file, freeze=False)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    # reconstruct_h5_file dispatches on MODEL_TYPE, so a mismatched --kind
    # would silently run the other protocol and mislabel the eval row
    is_diff_model = cfg.MODEL.MODEL_TYPE.upper() in ("DIT", "LATTE")
    if args.kind == "diffusion" and not is_diff_model:
        parser.error(f"--kind diffusion but MODEL_TYPE is "
                     f"{cfg.MODEL.MODEL_TYPE} (not DiT/Latte)")
    if args.kind == "unrolled" and is_diff_model:
        parser.error(f"--kind unrolled but MODEL_TYPE is "
                     f"{cfg.MODEL.MODEL_TYPE} (would run diffusion sampling)")

    files = sorted(glob.glob(args.test_glob))
    if not files:
        logger.error("no test files match %s", args.test_glob)
        return 1
    os.makedirs(args.out, exist_ok=True)
    accel = args.acceleration
    accel_str = str(int(accel)) if float(accel).is_integer() else str(accel)

    # 1) fully-sampled adjoint references (<exam>_1accel.im) — the library
    # accel==1 path (reconstruct_h5.py:456-458 semantics)
    for path in files:
        reconstruct_h5_file(path, args.out, cfg, None, acceleration=1)

    # 2) reconstructions at R
    if args.kind == "zerofilled":
        rt = ResampleTransform(accel, cfg)
        for path in files:
            name = os.path.splitext(os.path.basename(path))[0]
            with h5py.File(path, "r") as f:
                zfs = []
                for s in range(f["kspace"].shape[0]):
                    ex = rt(f["kspace"][s], f["maps"][s])
                    zfs.append(ex["init_image"] * ex["scale"])
            _write_im(os.path.join(args.out, f"{name}_{accel_str}accel.im"),
                      np.stack(zfs).astype(np.complex64))
    elif args.kind == "dslr":
        from scripts.reconstruct_lr import main as recon_lr
        for path in files:
            recon_lr(["--config-file", args.config_file,
                      "--ckpt", args.ckpt, "--file", path,
                      "--out-directory", args.out,
                      "--acceleration", str(accel)] + list(args.opts))
    else:
        params = load_checkpoint_params(args.ckpt, use_ema=args.use_ema)
        for path in files:
            reconstruct_h5_file(path, args.out, cfg, params,
                                acceleration=accel,
                                batch_size=args.batch_size,
                                sample_steps=args.sample_steps)

    # 3) evaluate
    from scripts.evaluate import main as evaluate_main
    return evaluate_main(["--recon-directory", args.out,
                          "--acceleration", str(accel)])


if __name__ == "__main__":
    sys.exit(main() or 0)
