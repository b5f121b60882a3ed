"""Causal windowed (banded) attention.

Functional parity surface with the reference's lucidrains-style
LocalAttention (reference: model/local_attention.py:92-172 — window
reshape :112, look_around KV gathering :36-41, banded sim einsum :129,
causal mask :138-145, padding mask :148-159).

TPU design: the banded structure is expressed as a static window reshape +
shifted-slice concatenation, which XLA fuses into a tight O(T·w) kernel —
no gather, no dynamic shapes.  A Pallas kernel for the same band layout
lives in ops/pallas_attention.py (used on TPU for large shapes); this XLA
formulation is the reference semantics and the CPU/test fallback.

Layout: [B, H, T, D] throughout (batch-major; the reference packs B*H).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

MASK_VALUE = -jnp.finfo(jnp.float32).max


def look_around(
    x: jax.Array, backward: int = 1, forward: int = 0, pad_value=-1.0
) -> jax.Array:
    """Concatenate each window with its `backward` predecessors / `forward`
    successors along the window axis.

    x: [..., W, N, ...rest] with windows on axis -3 (for 4D [B, W, N, D]) —
    here specialized to window axis=1, token axis=2: input [B, W, N, *],
    output [B, W, (backward+1+forward)*N, *].
    """
    w = x.shape[1]
    pad_width = [(0, 0)] * x.ndim
    pad_width[1] = (backward, forward)
    padded = jnp.pad(x, pad_width, constant_values=pad_value)
    pieces = [padded[:, ind : ind + w] for ind in range(backward + forward + 1)]
    return jnp.concatenate(pieces, axis=2)


def local_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    window_size: int,
    causal: bool = True,
    look_backward: int = 1,
    look_forward: int = 0,
    mask: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    exact_windowsize: bool = False,
) -> jax.Array:
    """Banded attention over fixed windows.

    q, k, v: [B, H, T, D]; T must be divisible by window_size.
    mask: optional [B, T] key validity mask.
    Each query attends within its window plus `look_backward` previous
    windows (and `look_forward` next, non-causal only).
    """
    if causal and look_forward > 0:
        raise ValueError("cannot look forward with causal attention")
    b, h, t, d = q.shape
    if t % window_size != 0:
        raise ValueError(
            f"sequence length {t} must be divisible by window size {window_size}"
        )
    windows = t // window_size
    scale = d**-0.5

    # [B*H, W, N, D] window reshape
    def to_windows(x):
        return x.reshape(b * h, windows, window_size, d)

    bq, bk, bv = to_windows(q), to_windows(k), to_windows(v)

    # absolute token indices per window: [1, W, N]
    seq = jnp.arange(t, dtype=jnp.int32).reshape(1, windows, window_size)

    bk = look_around(bk, look_backward, look_forward, 0.0)
    bv = look_around(bv, look_backward, look_forward, 0.0)
    bq_t = seq[..., :, None]  # [1, W, N, 1]
    bq_k = look_around(seq, look_backward, look_forward, -1)[..., None, :]
    # bq_k: [1, W, 1, N*(lb+lf+1)]

    sim = (
        jnp.einsum("bwie,bwje->bwij", bq, bk, precision=jax.lax.Precision.HIGHEST)
        * scale
    )

    band_mask = jnp.zeros(sim.shape[-4:], bool)
    if causal:
        causal_mask = bq_t < bq_k
        if exact_windowsize:
            max_back = window_size * look_backward
            causal_mask = causal_mask | (bq_t > (bq_k + max_back))
        band_mask = band_mask | causal_mask
    # padded (out-of-range) keys carry index -1
    band_mask = band_mask | (bq_k < 0)
    sim = jnp.where(band_mask, MASK_VALUE, sim)

    if mask is not None:
        km = mask.reshape(b, windows, window_size)
        km = look_around(km.astype(jnp.int32), look_backward, look_forward, 0) > 0
        km = km[:, None, :, None, :]  # [B, 1, W, 1, N*(..)]
        sim = sim.reshape(b, h, windows, window_size, -1)
        sim = jnp.where(km, sim, MASK_VALUE)
        sim = sim.reshape(b * h, windows, window_size, -1)

    attn = jax.nn.softmax(sim, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, attn.shape)
        attn = jnp.where(keep, attn / (1.0 - dropout_rate), 0.0)

    out = jnp.einsum(
        "bwij,bwje->bwie", attn, bv, precision=jax.lax.Precision.HIGHEST
    )
    return out.reshape(b, h, t, d)


def local_attention_dense(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    window_size: int,
    causal: bool = True,
    look_backward: int = 1,
    look_forward: int = 0,
    mask: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    exact_windowsize: bool = False,
) -> jax.Array:
    """Banded attention as ONE dense [T, T] matmul with a static band mask.

    Numerically identical to `local_attention` (same softmax domain per
    query; dropout draws differ in shape only).  At short sequences
    (T ≲ 256, the production gesture shapes) this is much faster on TPU
    than the window-reshape formulation: a single MXU-friendly QK^T +
    masked softmax + AV instead of pad/slice/concat gather chains —
    the band structure only pays off once T·w ≪ T².
    """
    if causal and look_forward > 0:
        raise ValueError("cannot look forward with causal attention")
    b, h, t, d = q.shape
    scale = d**-0.5
    sim = (
        jnp.einsum(
            "bhid,bhjd->bhij", q, k, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,  # f32 scores/softmax
        )
        * scale
    )
    i = jnp.arange(t, dtype=jnp.int32)[:, None]
    j = jnp.arange(t, dtype=jnp.int32)[None, :]
    wi, wj = i // window_size, j // window_size
    allowed = (wi - wj <= look_backward) & (wj - wi <= look_forward)
    if causal:
        allowed = allowed & (j <= i)
    if exact_windowsize and causal:
        # (the windowed formulation above applies exact_windowsize only to
        # the causal band, matching the reference's usage)
        allowed = allowed & (i - j <= window_size * look_backward)
    sim = jnp.where(allowed[None, None], sim, MASK_VALUE)
    if mask is not None:
        sim = jnp.where(mask[:, None, None, :], sim, MASK_VALUE)
    attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, attn.shape)
        attn = jnp.where(keep, attn / (1.0 - dropout_rate), 0.0)
    return jnp.einsum(
        "bhij,bhjd->bhid", attn, v, precision=jax.lax.Precision.HIGHEST
    )
