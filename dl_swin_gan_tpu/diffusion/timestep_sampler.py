"""Timestep schedule samplers (reference `dl_cs/diffusion/timestep_sampler.py`).

The reference ships uniform + loss-second-moment importance samplers (its
distributed all_gather sync is dead code there); here the loss-aware sampler
keeps its history as explicit state (functional, pjit-friendly) and syncing
across data-parallel workers is a jax.lax psum when run inside shard_map.
"""

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


class UniformSampler:
    def __init__(self, diffusion):
        self.num_timesteps = diffusion.num_timesteps

    def weights(self) -> np.ndarray:
        return np.ones(self.num_timesteps, np.float64)

    def sample(self, key: jax.Array, batch_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        t = jax.random.randint(key, (batch_size,), 0, self.num_timesteps)
        weights = jnp.ones((batch_size,), jnp.float32)
        return t, weights


class LossSecondMomentResampler:
    """Importance-sample timesteps by sqrt(E[loss^2]) (reference :108-150).

    State = (loss_history [T, K], counts [T]); pure-functional updates.
    """

    def __init__(self, diffusion, history_per_term: int = 10,
                 uniform_prob: float = 0.001):
        self.num_timesteps = diffusion.num_timesteps
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob

    def init_state(self):
        return (jnp.zeros((self.num_timesteps, self.history_per_term), jnp.float32),
                jnp.zeros((self.num_timesteps,), jnp.int32))

    def _warmed_up(self, counts):
        return jnp.all(counts == self.history_per_term)

    def weights(self, state):
        history, counts = state
        w = jnp.sqrt(jnp.mean(history ** 2, axis=-1))
        w = w / w.sum()
        w = w * (1 - self.uniform_prob) + self.uniform_prob / self.num_timesteps
        uniform = jnp.ones((self.num_timesteps,), jnp.float32) / self.num_timesteps
        return jnp.where(self._warmed_up(counts), w, uniform)

    def sample(self, key, batch_size, state):
        p = self.weights(state)
        t = jax.random.choice(key, self.num_timesteps, (batch_size,), p=p)
        weights = 1.0 / (self.num_timesteps * p[t])
        return t, weights

    def update_with_losses(self, state, ts, losses):
        """Insert per-example losses into each t's ring buffer."""
        history, counts = state

        def body(i, carry):
            history, counts = carry
            t = ts[i]
            c = counts[t]
            idx = jnp.where(c == self.history_per_term,
                            self.history_per_term - 1, c)
            # shift-left when full (drop oldest), else append
            row = history[t]
            shifted = jnp.roll(row, -1).at[-1].set(losses[i])
            appended = row.at[idx].set(losses[i])
            new_row = jnp.where(c == self.history_per_term, shifted, appended)
            history = history.at[t].set(new_row)
            counts = counts.at[t].set(jnp.minimum(c + 1, self.history_per_term))
            return history, counts

        history, counts = jax.lax.fori_loop(0, ts.shape[0], body,
                                            (history, counts))
        return history, counts
