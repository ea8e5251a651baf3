"""Complex linear-operator / signal-processing core (pure jnp functions).

TPU-native counterpart of the reference `dl_cs/mri/` package.
"""

from dl_swin_gan_tpu.ops.fft import fftc, ifftc, fftmod, fft_centered
from dl_swin_gan_tpu.ops.sense import SenseOp, sense_forward, sense_adjoint, sense_normal
from dl_swin_gan_tpu.ops.cg import conjugate_gradient, power_method, zdot
from dl_swin_gan_tpu.ops.utils import (
    root_sum_of_squares,
    time_average,
    sliding_window,
    center_crop,
    get_mask,
)
from dl_swin_gan_tpu.ops import masks
from dl_swin_gan_tpu.ops import metrics
