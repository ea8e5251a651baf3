"""2D->3D Swin pretrained-weight import parity.

The inflation math (patch-embed temporal repeat/divide, bias-table bicubic
resize + temporal tile, strict=False block mapping) is checked against the
reference's own `inflate_weights`
(video_swin_transformer_mri_downsample.py:651-700) executed as an oracle on
a fabricated official-schema 2D Swin checkpoint, then the trainer-level
PRETRAINED hook is exercised end to end.
"""

import logging
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from test_forward_parity_transformers import _load_ref


def _fab_sd2d(rng, embed=16, depths=(2, 2), heads=(2, 4), win2d=7, cin=8,
              patch2d=4):
    """A well-formed 2D Swin state_dict (official microsoft/Swin keys)."""
    sd = {"patch_embed.proj.weight":
          rng.standard_normal((embed, cin, patch2d, patch2d)).astype("f"),
          "patch_embed.proj.bias": rng.standard_normal(embed).astype("f")}
    for i, depth in enumerate(depths):
        dim = embed * 2 ** i
        for j in range(depth):
            p = f"layers.{i}.blocks.{j}"
            sd[f"{p}.norm1.weight"] = rng.standard_normal(dim).astype("f")
            sd[f"{p}.norm1.bias"] = rng.standard_normal(dim).astype("f")
            sd[f"{p}.attn.qkv.weight"] = (
                rng.standard_normal((3 * dim, dim)).astype("f"))
            sd[f"{p}.attn.qkv.bias"] = rng.standard_normal(3 * dim).astype("f")
            sd[f"{p}.attn.relative_position_bias_table"] = (
                rng.standard_normal(((2 * win2d - 1) ** 2,
                                     heads[i])).astype("f"))
            # buffers the inflation must DELETE (reference :666-673)
            sd[f"{p}.attn.relative_position_index"] = np.zeros(
                (win2d * win2d, win2d * win2d), np.int64)
            sd[f"{p}.attn_mask"] = np.zeros((1,), np.float32)
            sd[f"{p}.attn.proj.weight"] = (
                rng.standard_normal((dim, dim)).astype("f"))
            sd[f"{p}.attn.proj.bias"] = rng.standard_normal(dim).astype("f")
            sd[f"{p}.norm2.weight"] = rng.standard_normal(dim).astype("f")
            sd[f"{p}.norm2.bias"] = rng.standard_normal(dim).astype("f")
            sd[f"{p}.mlp.fc1.weight"] = (
                rng.standard_normal((4 * dim, dim)).astype("f"))
            sd[f"{p}.mlp.fc1.bias"] = rng.standard_normal(4 * dim).astype("f")
            sd[f"{p}.mlp.fc2.weight"] = (
                rng.standard_normal((dim, 4 * dim)).astype("f"))
            sd[f"{p}.mlp.fc2.bias"] = rng.standard_normal(dim).astype("f")
        if i < len(depths) - 1:
            d = f"layers.{i}.downsample"
            sd[f"{d}.norm.weight"] = rng.standard_normal(4 * dim).astype("f")
            sd[f"{d}.norm.bias"] = rng.standard_normal(4 * dim).astype("f")
            sd[f"{d}.reduction.weight"] = (
                rng.standard_normal((2 * dim, 4 * dim)).astype("f"))
    return sd


def test_inflate_matches_reference_oracle(rng, tmp_path):
    """inflate_swin2d + apply_swin_state_dict reproduce the reference's
    inflate_weights tensor-for-tensor (incl. the bicubic 13x13 -> 7x7 bias
    resize and the (2*wt-1)x temporal tile)."""
    ref_mod = _load_ref("video_swin_transformer_mri_downsample")
    if ref_mod is None:
        pytest.skip("reference/torch unavailable")
    import torch

    from dl_swin_gan_tpu.models.swin import SwinTransformer3D
    from dl_swin_gan_tpu.models.swin_import import (
        import_swin2d_checkpoint, inflate_swin2d)

    depths, heads = (2, 2), (2, 4)
    embed, cin = 16, 8
    ps, ws = (2, 4, 4), (2, 4, 4)  # 2D win 7 -> bicubic to (2*4-1)=7 ... same
    sd2d = _fab_sd2d(rng, embed=embed, depths=depths, heads=heads,
                     win2d=7, cin=cin, patch2d=ps[1])
    path = str(tmp_path / "swin2d.pth")
    torch.save({"model": {k: torch.from_numpy(np.asarray(v))
                          for k, v in sd2d.items()}}, path)

    # --- reference oracle: build 3D model, inflate from the checkpoint
    torch.manual_seed(0)
    ref = ref_mod.SwinTransformer3D(
        pretrained=path, pretrained2d=True, patch_size=ps, in_chans=cin,
        embed_dim=embed, depths=list(depths), num_heads=list(heads),
        window_size=ws, drop_path_rate=0.0)
    ref.inflate_weights(logging.getLogger(__name__))

    # --- ours: same checkpoint through the converter into a flax tree
    net = SwinTransformer3D(in_chans=cin, embed_dim=embed, patch_size=ps,
                            depths=depths, num_heads=heads, window_size=ws,
                            drop_path_rate=0.0)
    x = jnp.zeros((1, 4, 16, 16, cin), jnp.float32)
    params = jax.tree.map(np.asarray,
                          net.init(jax.random.PRNGKey(0), x)["params"])
    report = import_swin2d_checkpoint(params, path, window_size=ws,
                                      patch_t=ps[0])
    assert not report["skipped"] and not report["missing"]
    # every fabricated tensor (minus the dropped buffers) landed
    n_buffers = sum("relative_position_index" in k or "attn_mask" in k
                    for k in sd2d)
    assert len(report["loaded"]) == len(sd2d) - n_buffers

    def t(x):
        return x.detach().numpy()

    np.testing.assert_allclose(
        params["patch_embed"]["kernel"],
        t(ref.patch_embed.proj.weight).transpose(2, 3, 4, 1, 0), rtol=1e-6)
    # temporal inflation rule directly: repeat/patch_t of the 2D kernel
    np.testing.assert_allclose(
        t(ref.patch_embed.proj.weight)[:, :, 0],
        sd2d["patch_embed.proj.weight"] / ps[0], rtol=1e-6)

    for i, depth in enumerate(depths):
        fl = params[f"BasicLayer_{i}"]
        for j in range(depth):
            rb = ref.layers[i].blocks[j]
            fb = fl[f"SwinBlock3D_{j}"]
            np.testing.assert_allclose(
                fb["attn"]["relative_position_bias_table"],
                t(rb.attn.relative_position_bias_table), rtol=1e-6)
            np.testing.assert_allclose(fb["attn"]["qkv"]["kernel"],
                                       t(rb.attn.qkv.weight).T, rtol=1e-6)
            np.testing.assert_allclose(fb["Mlp_0"]["Dense_0"]["kernel"],
                                       t(rb.mlp.fc1.weight).T, rtol=1e-6)
            np.testing.assert_allclose(fb["LayerNorm_0"]["scale"],
                                       t(rb.norm1.weight), rtol=1e-6)
        if i < len(depths) - 1:
            np.testing.assert_allclose(
                fl["PatchMerging_0"]["Dense_0"]["kernel"],
                t(ref.layers[i].downsample.reduction.weight).T, rtol=1e-6)

    # the bias-table tile is temporal-major in BOTH layouts: row blocks of
    # the spatial table repeated (2*wt-1) times
    tab3d = params["BasicLayer_0"]["SwinBlock3D_0"]["attn"][
        "relative_position_bias_table"]
    L2 = (2 * ws[1] - 1) * (2 * ws[2] - 1)
    assert tab3d.shape[0] == (2 * ws[0] - 1) * L2
    np.testing.assert_allclose(tab3d[:L2], tab3d[L2:2 * L2], rtol=1e-6)

    # bicubic happened (13x13 table -> 7x7): spot-check via the module rule
    inf = inflate_swin2d(sd2d, ws, ps[0])
    key = "layers.0.blocks.0.attn.relative_position_bias_table"
    np.testing.assert_allclose(inf[key], tab3d, rtol=1e-6)


def test_shape_mismatch_skipped(rng, tmp_path):
    """strict=False semantics: incompatible tensors keep their init values
    and are reported, nothing raises."""
    torch = pytest.importorskip("torch")
    from dl_swin_gan_tpu.models.swin import SwinTransformer3D
    from dl_swin_gan_tpu.models.swin_import import import_swin2d_checkpoint

    sd = _fab_sd2d(rng, embed=16, depths=(2,), heads=(2,), win2d=7, cin=8,
                   patch2d=4)
    sd["layers.0.blocks.0.attn.qkv.weight"] = (
        rng.standard_normal((12, 12)).astype("f"))  # wrong dim
    path = str(tmp_path / "bad.pth")
    torch.save({"model": {k: torch.from_numpy(np.asarray(v))
                          for k, v in sd.items()}}, path)

    net = SwinTransformer3D(in_chans=8, embed_dim=16, patch_size=(2, 4, 4),
                            depths=(2,), num_heads=(2,),
                            window_size=(2, 4, 4), drop_path_rate=0.0)
    x = jnp.zeros((1, 4, 16, 16, 8), jnp.float32)
    params = jax.tree.map(np.asarray,
                          net.init(jax.random.PRNGKey(0), x)["params"])
    before = params["BasicLayer_0"]["SwinBlock3D_0"]["attn"]["qkv"][
        "kernel"].copy()
    report = import_swin2d_checkpoint(params, path, window_size=(2, 4, 4),
                                      patch_t=2)
    assert "layers.0.blocks.0.attn.qkv.weight" in report["skipped"]
    np.testing.assert_array_equal(
        params["BasicLayer_0"]["SwinBlock3D_0"]["attn"]["qkv"]["kernel"],
        before)
    assert report["loaded"]  # everything else still landed


def test_trainer_pretrained_hook(tmp_path):
    """MODEL.PARAMETERS.PRETRAINED seeds every unroll's Swin trunk at
    init_state (checkpoint stage selected by PRETRAINED_STAGE)."""
    torch = pytest.importorskip("torch")
    from dl_swin_gan_tpu.config import get_cfg
    from dl_swin_gan_tpu.train.trainer import Trainer

    rng = np.random.default_rng(3)

    class R:  # adapt default_rng to the standard_normal API used above
        def standard_normal(self, shape):
            return rng.standard_normal(shape)

    feats = 8
    # the SWIN wrapper hardcodes heads=8 / window (7,8,8) / patch (4,4,4)
    sd = _fab_sd2d(R(), embed=feats, depths=(6,), heads=(8,), win2d=8,
                   cin=feats, patch2d=4)
    path = str(tmp_path / "swin2d.pth")
    torch.save({"model": {k: torch.from_numpy(np.asarray(v))
                          for k, v in sd.items()}}, path)

    cfg = get_cfg()
    cfg.MODEL.MODEL_TYPE = "SWIN"
    cfg.MODEL.PARAMETERS.NUM_UNROLLS = 1
    cfg.MODEL.PARAMETERS.NUM_SWINBLOCKS = 1
    cfg.MODEL.PARAMETERS.NUM_RESBLOCKS = 1
    cfg.MODEL.PARAMETERS.NUM_FEATURES = feats
    cfg.MODEL.PARAMETERS.CONV_BLOCK.COMPLEX = False
    cfg.MODEL.PARAMETERS.PRETRAINED = path
    cfg.MODEL.PARAMETERS.PRETRAINED_STAGE = 0
    cfg.AUG_TRAIN.UNDERSAMPLE.ACCELERATIONS = (4, 5)
    cfg.AUG_TRAIN.UNDERSAMPLE.PARTIAL_KY = 0.0
    cfg.DATALOADER.NUM_WORKERS = 1
    cfg.OUTPUT_DIR = str(tmp_path / "out")

    from dl_swin_gan_tpu.data.preprocess import CinePreprocess
    from dl_swin_gan_tpu.data.synthetic import make_cine_example

    pre = CinePreprocess(cfg, use_seed=True)
    k, m, t = make_cine_example(T=8, Y=32, X=24, C=4, E=2, seed=0)
    ex = pre(k, m, t, "imp_0")
    batch = {key: np.stack([ex[key]]) for key in ex}

    trainer = Trainer(cfg)
    state = trainer.init_state(batch)

    got = np.asarray(jax.device_get(
        state.params["SwinNet3D_0"]["SwinTransformer3D_0"]["BasicLayer_0"]
        ["SwinBlock3D_3"]["attn"]["qkv"]["kernel"]))
    np.testing.assert_allclose(
        got, sd["layers.0.blocks.3.attn.qkv.weight"].T, rtol=1e-6)
