from dl_swin_gan_tpu.infer.transforms import InferenceTransform, ResampleTransform
from dl_swin_gan_tpu.infer.reconstruct import (
    Reconstructor, load_checkpoint_params, reconstruct_h5_file, reconstruct_cfl,
)
