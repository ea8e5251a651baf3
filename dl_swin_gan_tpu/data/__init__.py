"""Data pipeline: HDF5/CFL readers, cine preprocessing, synthetic phantoms.

Host-side numpy (runs in loader threads, like the reference's DataLoader
workers) feeding float32-packed batches to the device. The axon TPU tunnel
cannot transfer complex64, so batches carry real/imag float32 pairs and the
jitted step reassembles complex (see `dl_swin_gan_tpu.train.packing`).
"""

from dl_swin_gan_tpu.data.preprocess import CinePreprocess
from dl_swin_gan_tpu.data.dataset import Hdf5Dataset, DataLoader
from dl_swin_gan_tpu.data.synthetic import make_cine_example, write_synthetic_dataset
from dl_swin_gan_tpu.data import cfl
