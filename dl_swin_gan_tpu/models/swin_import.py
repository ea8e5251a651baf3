"""Pretrained-weight import for the video Swin trunk: 2D -> 3D inflation.

TPU-native counterpart of the reference's `inflate_weights`
(`dl_cs/models/video_swin_transformer_mri_downsample.py:651-700`) and its
checkpoint loaders (`dl_cs/models/swin_transformer.py:634-710`): initialize
the 3D SwinTransformer trunk from a 2D Swin checkpoint (ImageNet-style,
official microsoft/Swin key schema) by

- inflating `patch_embed.proj.weight` across the temporal patch axis
  (repeat `patch_t` times, divide by `patch_t` — reference :675),
- bicubic-resizing each `relative_position_bias_table` from the 2D window's
  (2w-1)^2 spatial extent to the 3D window's (2*ws1-1)*(2*ws2-1) when they
  differ, then tiling it across the (2*ws0-1) temporal offsets
  (reference :677-694; our 3D table is temporal-major, models/swin.py
  `_relative_position_index`, matching torch `.repeat(2*wd-1, 1)`),
- copying matching blocks with torch->flax layout transposes, skipping
  anything shape-incompatible (the reference's `strict=False` load +
  nH-mismatch warn, :687-688,696 — except we also SKIP shape-mismatched
  tensors instead of letting the load crash, a deliberate divergence since
  torch raises on size mismatch even with strict=False).

The inflation math is parity-checked against the reference's own
`inflate_weights` executed as an oracle (tests/test_swin_import.py).
"""

import logging
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def _to_np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def _bicubic_resize_table(table: np.ndarray, out_hw: Tuple[int, int]
                          ) -> np.ndarray:
    """Bicubic-resize a [L1, nH] table (L1 = S1*S1) to [out_h*out_w, nH] —
    the exact reference call (torch.nn.functional.interpolate bicubic on
    [1, nH, S1, S1], video_swin...downsample.py:690-693)."""
    import torch
    import torch.nn.functional as F

    L1, nH = table.shape
    S1 = int(round(L1 ** 0.5))
    t = torch.from_numpy(np.ascontiguousarray(table.astype(np.float32)))
    t = t.permute(1, 0).reshape(1, nH, S1, S1)
    t = F.interpolate(t, size=out_hw, mode="bicubic")
    return t.reshape(nH, out_hw[0] * out_hw[1]).permute(1, 0).numpy()


def inflate_swin2d(state_dict: Dict[str, "np.ndarray"],
                   window_size: Tuple[int, int, int],
                   patch_t: int) -> Dict[str, np.ndarray]:
    """Inflate a 2D Swin state_dict (torch layout) to 3D, reference rules
    (video_swin_transformer_mri_downsample.py:661-694). Returns a new dict
    of numpy arrays in torch layout; rel-pos-index / attn-mask buffers are
    dropped (always re-derived here, as there)."""
    sd = {k: _to_np(v) for k, v in state_dict.items()
          if "relative_position_index" not in k and "attn_mask" not in k}

    if "patch_embed.proj.weight" in sd:
        w = sd["patch_embed.proj.weight"]
        if w.ndim == 4:  # [E, C, kh, kw] -> [E, C, kt, kh, kw]
            sd["patch_embed.proj.weight"] = (
                np.repeat(w[:, :, None], patch_t, axis=2) / patch_t)

    wt, wh, ww = window_size
    L2 = (2 * wh - 1) * (2 * ww - 1)
    for k in [k for k in sd if "relative_position_bias_table" in k]:
        tab = sd[k]
        L1, nH = tab.shape
        if L1 != L2:
            tab = _bicubic_resize_table(tab, (2 * wh - 1, 2 * ww - 1))
        sd[k] = np.tile(tab, (2 * wt - 1, 1))
    return sd


def _set(params: dict, path: Sequence[str], value: np.ndarray,
         report: dict, torch_key: str) -> None:
    node = params
    for p in path[:-1]:
        if p not in node:
            report["missing"].append("/".join(path))
            return
        node = node[p]
    leaf = path[-1]
    if leaf not in node:
        report["missing"].append("/".join(path))
        return
    if tuple(np.shape(node[leaf])) != tuple(value.shape):
        # strict=False semantics, but survivable (see module docstring)
        logger.warning("swin import: shape mismatch for %s (%s vs %s), "
                       "keeping init", torch_key,
                       tuple(value.shape), tuple(np.shape(node[leaf])))
        report["skipped"].append(torch_key)
        return
    node[leaf] = value.astype(np.asarray(node[leaf]).dtype)
    report["loaded"].append(torch_key)


def apply_swin_state_dict(params: dict, sd: Dict[str, np.ndarray],
                          stage_map: Optional[Dict[int, int]] = None) -> dict:
    """Copy an (inflated, torch-layout) Swin state_dict into a flax
    `SwinTransformer3D` param subtree IN PLACE; returns a
    {loaded, skipped, missing} report.

    stage_map maps OUR BasicLayer index -> checkpoint `layers.<i>` index
    (default identity), so e.g. ImageNet Swin-T's depth-6 stage 2 can seed
    the MRI wrapper's single depth-6 stage (`swin3D.py:315` hardcodes
    depths=[6]).
    """
    report = {"loaded": [], "skipped": [], "missing": []}

    def lin(k):  # torch Linear weight -> flax Dense kernel
        return np.ascontiguousarray(sd[k].T)

    if "patch_embed.proj.weight" in sd:
        # torch conv [E, C, kt, kh, kw] -> flax [kt, kh, kw, C, E]
        _set(params, ("patch_embed", "kernel"),
             np.ascontiguousarray(
                 sd["patch_embed.proj.weight"].transpose(2, 3, 4, 1, 0)),
             report, "patch_embed.proj.weight")
    if "patch_embed.proj.bias" in sd:
        _set(params, ("patch_embed", "bias"), sd["patch_embed.proj.bias"],
             report, "patch_embed.proj.bias")

    stages = sorted({int(k.split(".")[1]) for k in sd
                     if k.startswith("layers.")})
    our_stages = sorted(int(k.split("_")[1]) for k in params
                        if k.startswith("BasicLayer_"))
    stage_map = stage_map or {i: i for i in our_stages}
    for ours in our_stages:
        theirs = stage_map.get(ours)
        if theirs is None or theirs not in stages:
            continue
        fl = params[f"BasicLayer_{ours}"]
        blocks = sorted({int(k.split(".")[3]) for k in sd
                         if k.startswith(f"layers.{theirs}.blocks.")})
        for j in sorted(int(k.split("_")[1]) for k in fl
                        if k.startswith("SwinBlock3D_")):
            if j not in blocks:
                continue
            fb = fl[f"SwinBlock3D_{j}"]
            p = f"layers.{theirs}.blocks.{j}"
            pairs = [
                (("LayerNorm_0", "scale"), f"{p}.norm1.weight", None),
                (("LayerNorm_0", "bias"), f"{p}.norm1.bias", None),
                (("attn", "relative_position_bias_table"),
                 f"{p}.attn.relative_position_bias_table", None),
                (("attn", "qkv", "kernel"), f"{p}.attn.qkv.weight", lin),
                (("attn", "qkv", "bias"), f"{p}.attn.qkv.bias", None),
                (("attn", "proj", "kernel"), f"{p}.attn.proj.weight", lin),
                (("attn", "proj", "bias"), f"{p}.attn.proj.bias", None),
                (("LayerNorm_1", "scale"), f"{p}.norm2.weight", None),
                (("LayerNorm_1", "bias"), f"{p}.norm2.bias", None),
                (("Mlp_0", "Dense_0", "kernel"), f"{p}.mlp.fc1.weight", lin),
                (("Mlp_0", "Dense_0", "bias"), f"{p}.mlp.fc1.bias", None),
                (("Mlp_0", "Dense_1", "kernel"), f"{p}.mlp.fc2.weight", lin),
                (("Mlp_0", "Dense_1", "bias"), f"{p}.mlp.fc2.bias", None),
            ]
            for path, key, f in pairs:
                if key in sd:
                    _set(fb, path, f(key) if f else sd[key], report, key)
        dkey = f"layers.{theirs}.downsample"
        if f"{dkey}.reduction.weight" in sd and "PatchMerging_0" in fl:
            pm = fl["PatchMerging_0"]
            _set(pm, ("LayerNorm_0", "scale"), sd[f"{dkey}.norm.weight"],
                 report, f"{dkey}.norm.weight")
            _set(pm, ("LayerNorm_0", "bias"), sd[f"{dkey}.norm.bias"],
                 report, f"{dkey}.norm.bias")
            _set(pm, ("Dense_0", "kernel"), lin(f"{dkey}.reduction.weight"),
                 report, f"{dkey}.reduction.weight")
    return report


def load_checkpoint_file(path: str) -> Dict[str, np.ndarray]:
    """Read a 2D Swin checkpoint: torch .pth (official releases wrap the
    weights under 'model' / 'state_dict') or a pre-converted .npz."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model", "state_dict", "module"):
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
            break
    return {k: _to_np(v) for k, v in ckpt.items()}


def import_swin2d_checkpoint(trunk_params: dict, path: str,
                             window_size: Tuple[int, int, int],
                             patch_t: int,
                             stage_map: Optional[Dict[int, int]] = None
                             ) -> dict:
    """One-call import: load, inflate (2D->3D), apply to a flax
    SwinTransformer3D subtree in place. Returns the load report."""
    sd = load_checkpoint_file(path)
    sd = inflate_swin2d(sd, window_size, patch_t)
    report = apply_swin_state_dict(trunk_params, sd, stage_map=stage_map)
    logger.info("swin 2D->3D import from %s: %d loaded, %d skipped, "
                "%d missing", path, len(report["loaded"]),
                len(report["skipped"]), len(report["missing"]))
    return report
