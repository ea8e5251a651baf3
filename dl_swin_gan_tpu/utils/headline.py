"""The canonical headline benchmark operating point, in one place.

Every throughput/profiling number the README compares (bench.py train +
recon + e2e workloads, scripts/profile_headline.py, scripts/profile_conv3d.py)
must run the SAME model: the reference's configs/basic/example.yaml point —
5 unrolls x 2 resblocks x 64 features, PGD with fixed step size,
sliding-window init, real (split-channel) convs — on a 20x180x64x8-coil
cine slice. Duplicating the block per script invites silently benchmarking
a different model than the headline it is compared against; change the
operating point here and nowhere else.
"""
import os


def headline_cfg(output_dir: str = "/tmp/bench"):
    """Config at the headline operating point (site-specific knobs such as
    CONV_BLOCK.DTYPE / GRAD_CHECKPOINT / RECON_LOSS stay at call sites)."""
    from dl_swin_gan_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.MODEL_TYPE = "RES"
    cfg.MODEL.PARAMETERS.NUM_UNROLLS = 5
    cfg.MODEL.PARAMETERS.NUM_RESBLOCKS = 2
    cfg.MODEL.PARAMETERS.NUM_FEATURES = 64
    cfg.MODEL.PARAMETERS.FIX_STEP_SIZE = True
    cfg.MODEL.PARAMETERS.SLWIN_INIT = True
    cfg.MODEL.PARAMETERS.CONV_BLOCK.COMPLEX = False
    cfg.OUTPUT_DIR = output_dir
    return cfg


def headline_shape():
    """(T, Y, X, C, E) of the headline cine slice; BENCH_SHAPE="T,Y,X,C"
    overrides for smoke tests."""
    T, Y, X, C, E = 20, 180, 64, 8, 2  # stanfordCine slice, post readout-crop
    if os.environ.get("BENCH_SHAPE"):
        T, Y, X, C = (int(v) for v in os.environ["BENCH_SHAPE"].split(","))
    return T, Y, X, C, E
