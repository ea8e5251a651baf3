from dl_swin_gan_tpu.train import packing
from dl_swin_gan_tpu.train.losses import compute_metrics, select_loss
from dl_swin_gan_tpu.train.train_state import TrainState, make_optimizer, ema_update
from dl_swin_gan_tpu.train.trainer import Trainer, MetricsWriter
from dl_swin_gan_tpu.train.checkpoint import CheckpointManager
