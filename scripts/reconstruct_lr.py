#!/usr/bin/env python
"""DSLR inference on prepared H5 data: re-undersample at a fixed
acceleration (parity seed), run the low-rank alt-min model, write CFL.

TPU-native counterpart of reference `scripts/reconstruct_lr.py` (which
builds ArrayToBlocks + Decompose in its transform, :33-76).
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger(__name__)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--file", required=True)
    parser.add_argument("--out-directory", required=True)
    parser.add_argument("--acceleration", type=float, default=12)
    parser.add_argument("opts", nargs="*", help="KEY VALUE config overrides")
    args = parser.parse_args(argv)

    import h5py
    import jax

    from dl_swin_gan_tpu.config import load_cfg
    from dl_swin_gan_tpu.data import cfl
    from dl_swin_gan_tpu.infer import load_checkpoint_params
    from dl_swin_gan_tpu.infer.transforms import ResampleTransform
    from dl_swin_gan_tpu.ops.llr import BlockOp, decompose_init
    from dl_swin_gan_tpu.solvers.dslr import build_dslr_solver
    from dl_swin_gan_tpu.train import packing

    cfg = load_cfg(args.config_file, freeze=False)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    params = load_checkpoint_params(args.ckpt)
    model = build_dslr_solver(cfg)
    p = cfg.MODEL.PARAMETERS

    transform = ResampleTransform(args.acceleration, cfg)

    @jax.jit
    def recon(params, packed):
        b = packing.unpack(packed)
        block_op = BlockOp(p.DSLR.BLOCK_SIZE, b["init_image"].shape,
                           overlapping=p.DSLR.OVERLAPPING)
        pred = model.apply({"params": params}, b["kspace"], b["maps"],
                           b["mask"], b["L_init"], b["R_init"], block_op)
        scale = b["scale"].reshape((-1,) + (1,) * (pred.ndim - 1))
        return packing.pack_jnp(pred * scale)

    out = []
    with h5py.File(args.file, "r") as f:
        n_slices = f["kspace"].shape[0]
        for s in range(n_slices):
            ex = transform(f["kspace"][s], f["maps"][s])
            L0, R0 = decompose_init(ex["init_image"][None], p.DSLR.BLOCK_SIZE,
                                    p.DSLR.NUM_BASIS,
                                    overlapping=p.DSLR.OVERLAPPING)
            batch = {k: v[None] if isinstance(v, np.ndarray) and v.ndim > 0
                     else np.asarray([v]) for k, v in ex.items()}
            batch["L_init"] = L0
            batch["R_init"] = R0
            packed = packing.pack(batch)
            out.append(packing.unpack_np(recon(params, packed)))
    images = np.concatenate(out, axis=0)

    name = os.path.splitext(os.path.basename(args.file))[0]
    accel = args.acceleration
    accel_str = str(int(accel)) if float(accel).is_integer() else str(accel)
    os.makedirs(args.out_directory, exist_ok=True)
    out_path = os.path.join(args.out_directory, f"{name}_{accel_str}accel.im")
    images = np.transpose(images, (4, 3, 0, 1, 2))[:, :, :, :, :, None, None, None]
    cfl.write(out_path, images, order="F")
    logger.info("wrote %s", out_path)
    print(out_path)


if __name__ == "__main__":
    main()
