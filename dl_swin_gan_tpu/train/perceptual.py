"""VGG16 perceptual loss.

TPU-native counterpart of reference `dl_cs/utils/VGGloss.py:6-54` (feature
extractor tapping torchvision vgg16 `features.{4,9,16}` — the outputs of the
first three max-pools — with layer weights 0.65/0.3/0.05, ImageNet mean/std
normalization and bilinear resize to 224) used by `metrics.vggloss`
(`dl_cs/utils/metrics.py:41-117`): the second emap's real/imag parts become
image channels (zero-padded to 3), compared per frame in VGG feature space.

Zero-egress environment: torchvision's pretrained VGG16 cannot be downloaded
at runtime. The flax VGG16 loads weights from a local .npz (env
DL_SWIN_GAN_VGG16_NPZ, convertible once from a torchvision checkpoint via
`convert_torchvision_vgg16`); without weights it falls back to FIXED random
features — still a valid structural loss, and loudly logged, not silent.
"""

import logging
import os
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

logger = logging.getLogger(__name__)

# VGG16 conv plan; 'M' = maxpool. Taps = after each of the first 3 pools.
VGG16_PLAN = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M")
TAP_WEIGHTS = (0.65, 0.3, 0.05)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class VGG16Features(nn.Module):
    """VGG16 stem through pool3; returns the three pool outputs."""

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        taps = []
        for spec in VGG16_PLAN:
            if spec == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                taps.append(x)
            else:
                x = nn.relu(nn.Conv(spec, (3, 3), padding="SAME")(x))
        return taps


def convert_torchvision_vgg16(state_dict_path: str, out_npz: str) -> None:
    """One-time conversion of a torchvision vgg16 state_dict to npz."""
    import torch
    sd = torch.load(state_dict_path, map_location="cpu")
    arrays = {k: v.numpy() for k, v in sd.items() if k.startswith("features")}
    np.savez(out_npz, **arrays)


def _load_params(model: VGG16Features, npz_path: str):
    sample = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = jax.tree.map(np.asarray,
                          model.init(jax.random.PRNGKey(0), sample)["params"])
    data = np.load(npz_path)
    # torchvision features indices of convs in the first 3 stages
    tv_conv_idx = [0, 2, 5, 7, 10, 12, 14]
    keys = sorted(params.keys(), key=lambda k: int(k.split("_")[-1]))
    for k, tv_i in zip(keys, tv_conv_idx):
        w = data[f"features.{tv_i}.weight"].transpose(2, 3, 1, 0)
        params[k]["kernel"] = w.astype(np.float32)
        params[k]["bias"] = data[f"features.{tv_i}.bias"].astype(np.float32)
    return jax.tree.map(jnp.asarray, params)


class PerceptualLoss:
    """vggloss(ref, pred) matching reference metrics.py:41-117 semantics."""

    def __init__(self, weights_npz: Optional[str] = None, resize: bool = True):
        self.model = VGG16Features()
        self.resize = resize
        path = weights_npz or os.environ.get("DL_SWIN_GAN_VGG16_NPZ")
        if path and os.path.exists(path):
            self.params = _load_params(self.model, path)
            self.pretrained = True
            logger.info("loaded VGG16 weights from %s", path)
        else:
            self.params = self.model.init(
                jax.random.PRNGKey(42), jnp.zeros((1, 64, 64, 3)))["params"]
            self.pretrained = False
            logger.warning(
                "no pretrained VGG16 weights (zero-egress env); using fixed "
                "random features — set DL_SWIN_GAN_VGG16_NPZ for parity")

    def _features(self, x):
        """x: [B, H, W, 3] in image units -> list of tap features."""
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        if self.resize:
            x = jax.image.resize(x, (x.shape[0], 224, 224, 3), "bilinear")
        return self.model.apply({"params": self.params}, x)

    def __call__(self, ref: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
        """ref/pred: [N, E, T, Y, X] complex (uses emap 1 like the reference,
        metrics.py:84-85) or [N, E, T, Y, X] real magnitudes."""
        emap = min(1, ref.shape[1] - 1)
        r, p = ref[:, emap], pred[:, emap]  # [N, T, Y, X]

        def to_rgb(v):
            if jnp.iscomplexobj(v):
                x = jnp.stack([v.real, v.imag, jnp.zeros_like(v.real)], axis=-1)
            else:
                # reference zero-pads two channels (metrics.py:95-96), so the
                # VGG sees [mag, 0, 0] — NOT a 3x channel repeat
                z = jnp.zeros_like(v)
                x = jnp.stack([v, z, z], axis=-1)
            return x.reshape((-1,) + x.shape[2:])  # [(N T), Y, X, 3]

        # note: the reference wires (ref, pred) such that the PREDICTION goes
        # through torch.no_grad (VGGloss.py:46-47 with metrics.py:99) — a bug
        # that would zero the training gradient; here gradient flows through
        # pred and the (constant) reference is detached instead.
        fr = self._features(to_rgb(r))
        fp = self._features(to_rgb(p))
        loss = 0.0
        for w, a, b in zip(TAP_WEIGHTS, fr, fp):
            loss = loss + w * jnp.mean(jnp.abs(jax.lax.stop_gradient(a) - b))
        # the reference SUMS per-frame losses (metrics.py:99 `loss +=` over
        # nt) — our batched mean over (N*T) frames must scale back by T
        return loss * r.shape[1]
