"""Root-importable experiment-folder naming (the reference keeps a copy of
fileio/folder_param.py at the repo root for its top-level tools)."""

from dl_swin_gan_tpu.utils.folder_param import (  # noqa: F401
    folder_to_parameter,
    parameter_to_folder,
)
