"""Pallas TPU kernels for the hot operators.

Correctness never depends on these: every kernel has a pure-XLA reference
implementation and a custom-VJP wrapper that falls back off-TPU.
"""

from dl_swin_gan_tpu.kernels.window_attn import window_attention
