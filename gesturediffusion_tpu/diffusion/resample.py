"""Timestep importance samplers.

Functional parity surface with the reference resamplers
(reference: diffusion/resample.py — UniformSampler, LossAwareSampler with
cross-rank all_gather :83-99, LossSecondMomentResampler :124-154).

TPU design: sampler state is a pure pytree updated functionally inside the
jitted train step.  Under GSPMD/pjit the per-batch (t, loss) pairs are
already global, so the reference's explicit `dist.all_gather` disappears —
XLA materializes the same global view (the multi-host path simply shards
the batch axis; the update below consumes the full logical batch).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp


def create_named_schedule_sampler(name: str, num_timesteps: int):
    """Factory mirroring resample.py:create_named_schedule_sampler."""
    if name == "uniform":
        return UniformSampler(num_timesteps=num_timesteps)
    if name == "loss-second-moment":
        return LossSecondMomentState.create(num_timesteps)
    raise NotImplementedError(f"unknown schedule sampler: {name}")


@flax.struct.dataclass
class UniformSampler:
    """Uniform timesteps; importance weights are identically 1."""

    num_timesteps: int = flax.struct.field(pytree_node=False)

    def sample(self, rng: jax.Array, batch_size: int):
        t = jax.random.randint(rng, (batch_size,), 0, self.num_timesteps)
        weights = jnp.ones((batch_size,), jnp.float32)
        return t, weights

    def update_with_losses(self, ts, losses):
        return self


@flax.struct.dataclass
class LossSecondMomentState:
    """Importance-sample timesteps ∝ sqrt(E[loss²]) with a per-t loss ring.

    `history` is a [T, K] ring of the last K losses per timestep; until every
    timestep has K observations the sampler stays uniform.
    """

    history: jax.Array  # [T, K] float32
    counts: jax.Array  # [T] int32
    num_timesteps: int = flax.struct.field(pytree_node=False)
    history_per_term: int = flax.struct.field(pytree_node=False, default=10)
    uniform_prob: float = flax.struct.field(pytree_node=False, default=0.001)

    @classmethod
    def create(cls, num_timesteps: int, history_per_term: int = 10,
               uniform_prob: float = 0.001) -> "LossSecondMomentState":
        return cls(
            history=jnp.zeros((num_timesteps, history_per_term), jnp.float32),
            counts=jnp.zeros((num_timesteps,), jnp.int32),
            num_timesteps=num_timesteps,
            history_per_term=history_per_term,
            uniform_prob=uniform_prob,
        )

    def warmed_up(self) -> jax.Array:
        return jnp.all(self.counts == self.history_per_term)

    def weights(self) -> jax.Array:
        """Per-timestep sampling probabilities (normalized)."""
        raw = jnp.sqrt(jnp.mean(self.history**2, axis=-1))
        raw = raw / jnp.sum(raw)
        raw = raw * (1 - self.uniform_prob) + self.uniform_prob / self.num_timesteps
        uniform = jnp.full((self.num_timesteps,), 1.0 / self.num_timesteps)
        return jnp.where(self.warmed_up(), raw, uniform)

    def sample(self, rng: jax.Array, batch_size: int):
        p = self.weights()
        t = jax.random.categorical(rng, jnp.log(p), shape=(batch_size,))
        weights = 1.0 / (self.num_timesteps * jnp.take(p, t))
        return t, weights

    def update_with_losses(self, ts: jax.Array, losses: jax.Array
                           ) -> "LossSecondMomentState":
        """Functionally insert a batch of (t, loss) observations.

        Sequential ring insert (handles duplicate timesteps within a batch
        exactly like the reference's python loop) via `lax.fori_loop`.
        """

        def body(i, state):
            history, counts = state
            t = ts[i]
            loss = losses[i].astype(jnp.float32)
            cnt = counts[t]
            row = history[t]
            full = cnt == self.history_per_term
            shifted = jnp.concatenate([row[1:], loss[None]])
            inserted = jax.lax.dynamic_update_slice(row, loss[None], (cnt,))
            new_row = jnp.where(full, shifted, inserted)
            history = history.at[t].set(new_row)
            counts = counts.at[t].set(jnp.where(full, cnt, cnt + 1))
            return history, counts

        history, counts = jax.lax.fori_loop(
            0, ts.shape[0], body, (self.history, self.counts)
        )
        return self.replace(history=history, counts=counts)
