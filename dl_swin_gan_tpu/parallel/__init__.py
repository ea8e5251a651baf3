from dl_swin_gan_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    fsdp_shardings,
    replicated,
)
