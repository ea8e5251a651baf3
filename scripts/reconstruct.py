#!/usr/bin/env python
"""CFL inference — the deployment path. TPU-native counterpart of reference
`scripts/reconstruct.py`: BART-dim CFL k-space + ESPIRiT maps in, `im.dl`
CFL out.

Usage:
  python scripts/reconstruct.py --config-file cfg.yaml --ckpt runs/x/checkpoints \
      --kspace ks --maps mps --output im.dl
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
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--kspace", required=True, help="input k-space CFL (no ext)")
    parser.add_argument("--maps", required=True, help="ESPIRiT maps CFL (no ext)")
    parser.add_argument("--output", required=True, help="output image CFL (no ext)")
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard the batch over all devices' 'data' mesh "
                             "axis (reference --multi-gpu nn.DataParallel)")
    parser.add_argument("opts", nargs="*", help="KEY VALUE config overrides")
    args = parser.parse_args(argv)

    from dl_swin_gan_tpu.config import load_cfg
    from dl_swin_gan_tpu.infer import load_checkpoint_params, reconstruct_cfl

    cfg = load_cfg(args.config_file, freeze=False)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    mesh = None
    if args.data_parallel:
        from dl_swin_gan_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
    params = load_checkpoint_params(args.ckpt)
    out = reconstruct_cfl(args.kspace, args.maps, args.output, cfg, params,
                          batch_size=args.batch_size, mesh=mesh)
    print(out)
    return out


if __name__ == "__main__":
    main()
