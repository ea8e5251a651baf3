"""Init-distribution parity for the conv trunk: the reference trains with
torch nn.Conv3d/nn.Linear DEFAULT init (kaiming_uniform_(a=sqrt(5)) weights
= U(+-sqrt(1/fan_in)); bias U(+-1/sqrt(fan_in))). Weight-copy tests bypass
init entirely — this pins the from-scratch starting distribution, the one
parity layer a trajectory test can't see."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dl_swin_gan_tpu.models.layers import ComplexConv, Conv


def _uniform_stats(samples: np.ndarray, bound: float):
    """Assert sample stats match U(-bound, +bound)."""
    assert np.abs(samples).max() <= bound * (1 + 1e-6)
    assert abs(samples.mean()) < 0.05 * bound
    expected_var = bound ** 2 / 3.0
    assert 0.9 < samples.var() / expected_var < 1.1
    # a genuinely uniform sample fills the tails a normal wouldn't
    assert (np.abs(samples) > 0.9 * bound).mean() > 0.05


@pytest.mark.parametrize("is_complex", [False, True])
def test_conv_init_matches_torch_defaults(is_complex):
    cin, cout, k = 16, 16, 3
    fan_in = cin * k ** 3
    layer = (ComplexConv if is_complex else Conv)(cout, (k, k, k))
    x = jnp.ones((1, 4, 6, 6, cin),
                 jnp.complex64 if is_complex else jnp.float32)
    params = jax.tree.map(np.asarray,
                          layer.init(jax.random.PRNGKey(0), x)["params"])
    leaves = params if is_complex else params["Conv_0"]
    if is_complex:
        kernels = np.concatenate([leaves["kernel_re"].ravel(),
                                  leaves["kernel_im"].ravel()])
        biases = np.concatenate([leaves["bias_re"], leaves["bias_im"]])
    else:
        kernels = leaves["kernel"].ravel()
        biases = leaves["bias"]
    _uniform_stats(kernels, np.sqrt(1.0 / fan_in))
    assert np.abs(biases).max() <= 1.0 / np.sqrt(fan_in) * (1 + 1e-6)
    assert np.abs(biases).std() > 0  # torch draws biases, flax default zeros


def test_init_stats_match_reference_torch_layer():
    """Direct two-sample check against an actual torch Conv3d when torch is
    available: variances agree within 10%."""
    torch = pytest.importorskip("torch")
    cin, cout, k = 16, 16, 3
    torch.manual_seed(0)
    ref = torch.nn.Conv3d(cin, cout, k)
    layer = Conv(cout, (k, k, k))
    x = jnp.ones((1, 4, 6, 6, cin), jnp.float32)
    params = layer.init(jax.random.PRNGKey(1), x)["params"]["Conv_0"]
    ours = np.asarray(params["kernel"]).ravel()
    theirs = ref.weight.detach().numpy().ravel()
    assert 0.9 < ours.var() / theirs.var() < 1.1
    assert 0.9 < (np.asarray(params["bias"]).var()
                  / ref.bias.detach().numpy().var()) < 1.15
