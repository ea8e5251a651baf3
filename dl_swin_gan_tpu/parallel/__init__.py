from dl_swin_gan_tpu.parallel.mesh import (
    axis_size,
    make_mesh,
    batch_sharding,
    fsdp_shardings,
    replicated,
)
