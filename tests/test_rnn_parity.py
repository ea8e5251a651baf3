"""Weight-level forward parity for the RNN backbone vs the reference.

Reference `dl_cs/models/rnn.py:11-62`: complex input packed interleaved
(view_as_real), a multi-layer bidirectional torch nn.LSTM, linear resample
back to the input channels, repacked complex. Our `models/rnn.py` stacks
flax nn.RNN(LSTMCell) pairs per layer. The reference defines RNNs for the
DSLR temporal path but never wires them (dslr.py:99-120 — dead upstream);
parity is still proven so the backbone inventory is fully covered.

torch LSTM gate rows are ordered (i, f, g, o); flax LSTMCell splits the
same gates into per-gate Dense modules ii/if/ig/io (input, no bias) and
hi/hf/hg/ho (recurrent, bias) — the torch bias_ih + bias_hh sum maps onto
the single flax recurrent bias.
"""

import sys
import warnings

import numpy as np
import pytest


def _load_ref():
    try:
        sys.path.insert(0, "/root/reference")
        import torch  # noqa: F401
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            from dl_cs.models import rnn as ref_rnn
        return ref_rnn
    except Exception:
        return None


def test_rnn_forward_matches_reference(make_complex):
    ref_rnn = _load_ref()
    if ref_rnn is None:
        pytest.skip("reference/torch unavailable")
    import torch

    import jax
    import jax.numpy as jnp

    from dl_swin_gan_tpu.models.rnn import RNN

    N, T, C = 2, 7, 3
    hidden, layers = 6, 3

    torch.manual_seed(5)
    ref = ref_rnn.RNN(in_chans=2 * C, hidden_size=hidden, num_layers=layers,
                      bidirectional=True).eval()

    net = RNN(hidden_size=hidden, num_layers=layers, bidirectional=True)
    x = make_complex((N, T, C))
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = jax.tree.map(np.asarray, params)

    def copy_cell(cell, w_ih, w_hh, b_ih, b_hh):
        """torch gate-stacked [4H, in] rows (i,f,g,o) -> flax per-gate."""
        H = hidden
        for g, name in enumerate("ifgo"):
            sl = slice(g * H, (g + 1) * H)
            cell[f"i{name}"]["kernel"] = w_ih.detach().numpy()[sl].T.copy()
            cell[f"h{name}"]["kernel"] = w_hh.detach().numpy()[sl].T.copy()
            cell[f"h{name}"]["bias"] = (b_ih.detach().numpy()[sl]
                                        + b_hh.detach().numpy()[sl]).copy()

    for l in range(layers):
        # creation order in our module: forward cell then backward cell
        copy_cell(params[f"LSTMCell_{2 * l}"],
                  getattr(ref.rnn, f"weight_ih_l{l}"),
                  getattr(ref.rnn, f"weight_hh_l{l}"),
                  getattr(ref.rnn, f"bias_ih_l{l}"),
                  getattr(ref.rnn, f"bias_hh_l{l}"))
        copy_cell(params[f"LSTMCell_{2 * l + 1}"],
                  getattr(ref.rnn, f"weight_ih_l{l}_reverse"),
                  getattr(ref.rnn, f"weight_hh_l{l}_reverse"),
                  getattr(ref.rnn, f"bias_ih_l{l}_reverse"),
                  getattr(ref.rnn, f"bias_hh_l{l}_reverse"))
    params["Dense_0"]["kernel"] = ref.resample.weight.detach().numpy().T.copy()
    params["Dense_0"]["bias"] = ref.resample.bias.detach().numpy().copy()

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()
    out = np.asarray(net.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref_out, rtol=2e-5, atol=2e-6)
