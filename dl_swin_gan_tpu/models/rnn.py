"""Bidirectional LSTM over time for complex 1-D basis learning.

TPU-native counterpart of reference `dl_cs/models/rnn.py:11-62`: complex
input packed as interleaved real/imag features, a multi-layer bidirectional
LSTM, then a linear resample back to the input channel count, repacked
complex.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn


class RNN(nn.Module):
    hidden_size: int = 64
    num_layers: int = 3
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [N, T, C] complex -> same shape."""
        N, T, C = x.shape
        # torch view_as_real packs (re, im) interleaved per channel
        h = jnp.stack([x.real, x.imag], axis=-1).reshape(N, T, 2 * C)

        for _ in range(self.num_layers):
            fwd = nn.RNN(nn.LSTMCell(self.hidden_size))
            if self.bidirectional:
                bwd = nn.RNN(nn.LSTMCell(self.hidden_size), reverse=True,
                             keep_order=True)
                h = jnp.concatenate([fwd(h), bwd(h)], axis=-1)
            else:
                h = fwd(h)

        h = nn.Dense(2 * C)(h)
        h = h.reshape(N, T, C, 2)
        return jax.lax.complex(h[..., 0], h[..., 1])
