"""Gradient-level parity for the video-Swin U-Net vs the reference.

Forward parity (test_forward_parity_transformers) proves the shifted-window
attention / rel-pos bias / PatchMerging-Expand forward; the OTHER trainer
backbones get gradient coverage from the trajectory-parity tests, but the
Swin trunk's gradients (softmax-attention backward through window
partition/shift, bias-table scatter, strided merge/expand) were only
exercised indirectly. Here: identical weight-copied params, identical
input, identical scalar loss — then the full per-parameter gradient trees
must match. The torch gradients are pushed through the SAME linear
reindexing map used for the weights (map_swin_unet), which is valid
because every assignment is a transpose/flip/lookup.
"""

import numpy as np
import pytest

from tests.test_forward_parity_transformers import _load_ref, map_swin_unet


def test_video_swin_unet_grads_match_reference(rng):
    ref_mod = _load_ref("video_swin_transformer_mri_downsample")
    if ref_mod is None:
        pytest.skip("reference/torch unavailable")
    import torch

    import jax
    import jax.numpy as jnp

    from dl_swin_gan_tpu.models.swin import SwinTransformer3D

    C, D, H, W = 8, 4, 26, 16
    depths, heads = (2, 2), (2, 4)
    embed, ps, ws = 16, (2, 4, 4), (2, 4, 4)
    torch.manual_seed(5)
    ref = ref_mod.SwinTransformer3D(
        patch_size=ps, in_chans=C, embed_dim=embed, depths=list(depths),
        num_heads=list(heads), window_size=ws, drop_path_rate=0.0)
    ref.eval()

    net = SwinTransformer3D(in_chans=C, embed_dim=embed, patch_size=ps,
                            depths=depths, num_heads=heads, window_size=ws,
                            drop_path_rate=0.0, deterministic=True)

    x = rng.standard_normal((1, D, H, W, C)).astype(np.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = jax.tree.map(np.asarray, params)
    map_swin_unet(ref, params, depths)
    params = jax.tree.map(lambda v: np.array(v, copy=True), params)

    # fixed random projection makes the scalar loss sensitive to every
    # output element with an asymmetric weighting
    w = rng.standard_normal((1, D, H, W, C)).astype(np.float32)

    def loss_fn(p):
        out = net.apply({"params": p}, jnp.asarray(x))
        return jnp.sum(out * jnp.asarray(w))

    our_loss, our_grads = jax.value_and_grad(loss_fn)(params)
    our_grads = jax.tree.map(np.asarray, our_grads)

    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))       # [B, C, D, H, W]
    wt = torch.from_numpy(w.transpose(0, 4, 1, 2, 3))
    ref_loss = (ref(xt) * wt).sum()
    ref_loss.backward()
    np.testing.assert_allclose(float(our_loss), float(ref_loss.detach()),
                               rtol=1e-4)

    # replace every reference parameter VALUE by its gradient, then run the
    # same weight map: the result is the expected flax gradient tree for
    # every mapped leaf (unmapped leaves keep our own grads -> trivially ok)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(p.grad if p.grad is not None else torch.zeros_like(p))
    expected = jax.tree.map(lambda v: np.array(v, copy=True), our_grads)
    map_swin_unet(ref, expected, depths)

    flat_e = jax.tree_util.tree_flatten_with_path(expected)[0]
    flat_o = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_flatten_with_path(our_grads)[0]}
    scale = max(float(np.abs(np.asarray(v)).max()) for _, v in flat_e)
    for keypath, ev in flat_e:
        ov = flat_o[jax.tree_util.keystr(keypath)]
        np.testing.assert_allclose(
            np.asarray(ov), np.asarray(ev), rtol=5e-3, atol=1e-5 * scale,
            err_msg=f"gradient mismatch at {jax.tree_util.keystr(keypath)}")
