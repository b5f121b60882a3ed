"""Blocked flash self-attention Pallas kernel for the encoder backbone.

The transformer encoder's hot op at LONG sequence lengths is the
[B,H,T,T] score tensor: the XLA formulation round-trips it through HBM
per layer, and a naive fused kernel holds the whole [T,T] slab in VMEM
(16 MB at T=2048 — over the v5e VMEM budget, so the naive version could
not even compile at the shapes it existed for).  This version is a
FlashAttention-style blocked kernel: the k/v sequence axis is tiled and
the softmax is computed online (running row-max m, running normalizer l,
rescaled accumulator), so VMEM holds only [BQ,D] q, [BK,D] k/v, one
[BQ,BK] score tile, and the [BQ,D] accumulator — independent of T.

Grid: (B*H, T/BQ, T/BK) with the k axis innermost; scratch (m, l, acc)
persists across the k steps of one (bh, q-block) and the output block is
written once on the last k step (standard revisit-accumulate pattern).

Opt-in via TransformerEncoder(use_fused_kernel=True) — measured SLOWER
than XLA's own fusion at production shapes (T<=200) on v5e, so off by
default; intended for long-sequence configs where the score tensor
dominates HBM traffic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -jnp.finfo(jnp.float32).max


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
    *, t_real: int, scale: float, block_k: int,
):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # [BQ, D]
    k = k_ref[0]  # [BK, D]
    v = v_ref[0]

    # NOTE: no precision=HIGHEST here — Mosaic lowers it to a multi-pass
    # path that is LESS exact than the default on v5e (measured 1.2e-1
    # max diff on a 128x128 f32 dot vs 0.0 for the default)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    kpos = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(kpos < t_real, s, NEG_INF)

    # online softmax update (m/l are lane-broadcast [BQ, 128] tiles;
    # column 0 carries the value)
    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)  # rescale of the old accumulator
    p = jnp.exp(s - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(kb == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("interpret", "block_q", "block_k")
)
def fused_self_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, *,
    block_q: int = 256, block_k: int = 256, interpret: bool = False,
) -> jax.Array:
    """Full (non-causal) softmax attention, flash-blocked per (B, H).

    q, k, v: [B, H, T, D].  Equivalent to softmax(q k^T / sqrt(D)) v
    with f32 score accumulation and an online (streaming) softmax —
    VMEM use is O(block_q * block_k), independent of T.
    """
    b, h, t, d = q.shape
    scale = d**-0.5

    # pad T to one tile when it fits a single block, else to a common
    # multiple of BOTH block sizes (padding to only the larger one would
    # silently drop the other axis's tail); D pads to the 128 lane tile
    if t <= block_q and t <= block_k:
        tp = -(-t // 16) * 16
        bq, bk = tp, tp
    else:
        import math

        bq, bk = block_q, block_k
        lcm = math.lcm(bq, bk)
        tp = -(-t // lcm) * lcm
    dp = -(-d // 128) * 128
    pad = [(0, 0), (0, 0), (0, tp - t), (0, dp - d)]
    qp = jnp.pad(q, pad).reshape(b * h, tp, dp)
    kp = jnp.pad(k, pad).reshape(b * h, tp, dp)
    vp = jnp.pad(v, pad).reshape(b * h, tp, dp)

    kernel = functools.partial(
        _flash_kernel, t_real=t, scale=scale, block_k=bk
    )
    out = pl.pallas_call(
        kernel,
        grid=(b * h, tp // bq, tp // bk),
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda i, qb, kb: (i, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dp), lambda i, qb, kb: (i, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dp), lambda i, qb, kb: (i, kb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dp), lambda i, qb, kb: (i, qb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, tp, dp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),  # running row max m
            pltpu.VMEM((bq, 128), jnp.float32),  # running normalizer l
            pltpu.VMEM((bq, dp), jnp.float32),   # output accumulator
        ],
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, h, tp, dp)[:, :, :t, :d]
