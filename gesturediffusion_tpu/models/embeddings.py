"""Positional/timestep embeddings and rotary position encoding.

Functional parity surface with the reference embedding helpers
(reference: model/mdm.py:277-310 PositionalEncoding/TimestepEmbedder,
model/local_attention.py:43-62 SinusoidalEmbeddings / rotate_half /
apply_rotary_pos_emb).

The rotary convention is the "half-split" variant: the feature dim is split
into two halves, freqs are duplicated across the halves, and rotate_half maps
(x1, x2) -> (-x2, x1).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gesturediffusion_tpu.ops.seed_dropout import SeedDropout


def sinusoidal_table(max_len: int, d_model: int, dtype=jnp.float32) -> jax.Array:
    """Classic transformer sin/cos table [max_len, d_model]."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * (-np.log(10000.0) / d_model)
    )
    pe = np.zeros((max_len, d_model), np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return jnp.asarray(pe, dtype)


class PositionalEncoding(nn.Module):
    """Additive sinusoidal positional encoding over the time axis.

    Input [B, T, D] (batch-major; the reference is seq-major torch).
    """

    d_model: int
    dropout: float = 0.1
    max_len: int = 5000

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        pe = sinusoidal_table(self.max_len, self.d_model, x.dtype)
        x = x + pe[None, : x.shape[1], :]
        return SeedDropout(self.dropout)(x, deterministic=deterministic)


class TimestepEmbedder(nn.Module):
    """t -> PE-table lookup -> Linear/SiLU/Linear; output [B, latent_dim]."""

    latent_dim: int
    max_len: int = 5000

    @nn.compact
    def __call__(self, timesteps: jax.Array) -> jax.Array:
        pe = sinusoidal_table(self.max_len, self.latent_dim)
        h = jnp.take(pe, timesteps.astype(jnp.int32), axis=0)
        h = nn.Dense(self.latent_dim, name="time_embed_0")(h)
        h = nn.silu(h)
        h = nn.Dense(self.latent_dim, name="time_embed_1")(h)
        return h


def rotary_freqs(seq_len: int, dim_head: int, dtype=jnp.float32) -> jax.Array:
    """RoPE frequency table [seq_len, dim_head] (duplicated halves)."""
    inv_freq = 1.0 / (
        10000 ** (np.arange(0, dim_head, 2, dtype=np.float64) / dim_head)
    )
    t = np.arange(seq_len, dtype=np.float64)
    freqs = np.einsum("i,j->ij", t, inv_freq)
    return jnp.asarray(np.concatenate([freqs, freqs], axis=-1), dtype)


def rotate_half(x: jax.Array) -> jax.Array:
    """(x1, x2) -> (-x2, x1) on the split-in-half last dim."""
    d = x.shape[-1] // 2
    x1, x2 = x[..., :d], x[..., d:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary_pos_emb(
    q: jax.Array, k: jax.Array, freqs: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Rotate q and k by position; freqs [T, D] broadcasts over leading dims."""
    cos, sin = jnp.cos(freqs), jnp.sin(freqs)
    q = q * cos + rotate_half(q) * sin
    k = k * cos + rotate_half(k) * sin
    return q, k


def mask_cond(cond2d, uncond, cond_mask_prob, train, rng=None):
    """Per-sample conditioning dropout, shared by every denoiser
    (reference: model/mdm.py:242-250 mask_cond).

    Zeros cond2d [B, C] rows where `uncond` is set (forced CFG
    unconditional branch), plus bernoulli(cond_mask_prob) random rows
    during training.  ONE implementation so CFG-dropout semantics cannot
    drift between MDM / MotionMDM / MDMOld."""
    keep = 1.0 - uncond.astype(cond2d.dtype)[:, None]
    out = cond2d * keep
    if train and cond_mask_prob > 0.0:
        bern = jax.random.bernoulli(rng, cond_mask_prob, (cond2d.shape[0], 1))
        out = out * (1.0 - bern.astype(cond2d.dtype))
    return out
