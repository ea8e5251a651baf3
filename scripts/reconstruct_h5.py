#!/usr/bin/env python
"""H5 inference (RES/SE/CBAM/SWIN): re-undersample fully-sampled data at a
fixed acceleration (parity seed 1000) and reconstruct; accel=1 writes the
fully-sampled adjoint reference. TPU-native counterpart of reference
`scripts/reconstruct_h5.py`.

Usage:
  python scripts/reconstruct_h5.py --config-file cfg.yaml --ckpt runs/x/checkpoints \
      --file data.h5 --out-directory out/ --acceleration 12
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--ckpt", required=True, help="orbax checkpoint dir")
    parser.add_argument("--file", required=True, help="input .h5 file")
    parser.add_argument("--out-directory", required=True)
    parser.add_argument("--acceleration", type=float, default=1)
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--model", default=None,
                        help="override MODEL.MODEL_TYPE "
                             "(RES/SE/CBAM/SWIN/DiT/Latte)")
    parser.add_argument("--use-ema", action="store_true",
                        help="reconstruct with the EMA weights (diffusion)")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard the batch over all devices' 'data' mesh "
                             "axis (reference --multi-gpu nn.DataParallel)")
    parser.add_argument("--sample-steps", type=int, default=100,
                        help="diffusion sampling steps (DiT/Latte)")
    parser.add_argument("opts", nargs="*", help="KEY VALUE config overrides")
    args = parser.parse_args(argv)

    from dl_swin_gan_tpu.config import load_cfg
    from dl_swin_gan_tpu.infer import load_checkpoint_params, reconstruct_h5_file

    cfg = load_cfg(args.config_file, freeze=False)
    if args.model:
        cfg.MODEL.MODEL_TYPE = args.model
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    params = (load_checkpoint_params(args.ckpt, use_ema=args.use_ema)
              if args.acceleration > 1 else None)
    mesh = None
    if args.data_parallel:
        from dl_swin_gan_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
    out = reconstruct_h5_file(args.file, args.out_directory, cfg, params,
                              acceleration=args.acceleration,
                              batch_size=args.batch_size,
                              sample_steps=args.sample_steps, mesh=mesh)
    print(out)
    return out


if __name__ == "__main__":
    main()
