from dl_swin_gan_tpu.config.config import CfgNode, get_cfg, load_cfg
