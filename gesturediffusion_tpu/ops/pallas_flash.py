"""Fused full self-attention Pallas kernel for the encoder backbone.

The transformer encoder's hot op at production shapes (T≈200, d_head 128)
is HBM-traffic-bound in the XLA formulation: the [B,H,T,T] score tensor
round-trips HBM per layer.  At these sequence lengths an entire head's
attention — q, k, v, scores, softmax, output — fits comfortably in VMEM
(~600 KB), so the kernel runs one (batch, head) pair per grid step with
zero intermediate HBM traffic: read q/k/v once, write out once.

Opt-in via TransformerEncoder(use_fused_kernel=True) — measured SLOWER than
XLA's own fusion at production shapes (T<=200) on v5e, so off by default;
intended for long-sequence configs where the score tensor dominates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -jnp.finfo(jnp.float32).max


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, t_real: int, scale: float):
    q = q_ref[0]  # [Tp, D]
    k = k_ref[0]
    v = v_ref[0]
    tp = q.shape[0]

    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST) * scale
    kpos = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
    scores = jnp.where(kpos < t_real, scores, NEG_INF)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    out = jnp.dot(
        e.astype(v.dtype), v, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) / denom
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_self_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """Full (non-causal) softmax attention, one fused pass per (B, H).

    q, k, v: [B, H, T, D].  Equivalent to
    softmax(q k^T / sqrt(D)) v with f32 score accumulation.
    """
    b, h, t, d = q.shape
    scale = d**-0.5

    # pad T to the sublane tile and D to the lane tile
    tp = -(-t // 16) * 16
    dp = -(-d // 128) * 128
    pad = [(0, 0), (0, 0), (0, tp - t), (0, dp - d)]
    qp = jnp.pad(q, pad).reshape(b * h, tp, dp)
    kp = jnp.pad(k, pad).reshape(b * h, tp, dp)
    vp = jnp.pad(v, pad).reshape(b * h, tp, dp)

    kernel = functools.partial(_attn_kernel, t_real=t, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, tp, dp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, dp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, dp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tp, dp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, tp, dp), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, h, tp, dp)[:, :, :t, :d]
