"""Fused MDM pre-encoder block as one Pallas kernel (inference path).

The gesture denoiser runs, per denoise step, BEFORE its global encoder
(models/mdm.py:221-249; reference structure: model/mdm.py:153-200):

    heads = split(xseq); rope(heads); local_attention(heads);
    merge(heads); prepend cond token; split; rope; merge

Measured on v5e (B=82, T=80, D=256, 8 heads of 32): this block costs
~0.23 ms/step in XLA — not for FLOPs (the band attention is ~0.5 GFLOP)
but for LAYOUT: every head split/merge is a [B,T,256] -> [B,8,T,32]
relayout whose 32-wide lane dimension wastes 3/4 of each (8,128) tile,
and rotary's rotate-half runs more 16-wide lane slices on top.  This
kernel keeps the activation block VMEM-resident in the [BB, T, 256]
layout end-to-end: heads are addressed with STATIC lane slices (the same
trick as ops/pallas_encoder.py), the rotary tables arrive pre-tiled to
[T, D], and the band mask is a broadcasted-iota predicate — no HBM
round-trips between the stages.

Semantics: identical to the XLA composition (rotary q=k=v, causal
banded attention with window w / look_backward 1, softmax in f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


NEG_INF = -jnp.finfo(jnp.float32).max


def _tiled_rope_tables(t: int, dim_head: int, d: int):
    """cos/sin tables [t, d]: per-head rotary tables tiled across heads
    (all heads share the same frequencies), f32 numpy.  Pure numpy twin
    of models/embeddings.py::rotary_freqs — must stay host-side so the
    tables are jit constants, not traced values."""
    inv_freq = 1.0 / (
        10000 ** (np.arange(0, dim_head, 2, dtype=np.float64) / dim_head)
    )
    freqs = np.einsum("i,j->ij", np.arange(t, dtype=np.float64), inv_freq)
    freqs = np.concatenate([freqs, freqs], axis=-1).astype(np.float32)
    reps = d // dim_head
    cos = np.tile(np.cos(freqs), (1, reps)).astype(np.float32)
    sin = np.tile(np.sin(freqs), (1, reps)).astype(np.float32)
    return cos, sin


def _rotate_half_matrix(d: int, num_heads: int) -> np.ndarray:
    """Constant [D, D] permutation-sign matrix R with x @ R ==
    per-head rotate_half(x).  On TPU one small MXU matmul beats the
    16-lane-wide shuffle chain a sliced concat lowers to."""
    dh = d // num_heads
    half = dh // 2
    r = np.zeros((d, d), np.float32)
    for h in range(num_heads):
        base = h * dh
        for k in range(half):
            r[base + half + k, base + k] = -1.0       # out1 = -x2
            r[base + k, base + half + k] = 1.0        # out2 = +x1
    return r


def _rope_flat(x, cos, sin, rot):
    """Rotary in flat [BB, T, D] layout: x*cos + (x@R)*sin where R is the
    per-head rotate-half permutation-sign matrix."""
    bb, t, d = x.shape
    xr = jax.lax.dot_general(
        x.reshape(bb * t, d), rot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(bb, t, d)
    xf = x.astype(jnp.float32)
    return (xf * cos + xr * sin).astype(x.dtype)


def _local_block_kernel(
    x_ref, coa_ref, cos1_ref, sin1_ref, cos2_ref, sin2_ref, rot_ref, o_ref,
    *, num_heads: int, window: int, t_real: int,
):
    bb, t, d = x_ref.shape
    dh = d // num_heads
    scale = dh**-0.5
    x = x_ref[:]                                    # [BB, T, D]
    coa = coa_ref[:][:, 0, :]                       # [BB, 1, D] -> [BB, D]
    rot = rot_ref[:]

    q = _rope_flat(x, cos1_ref[:], sin1_ref[:], rot)

    # static causal band mask (local_attention_dense semantics:
    # wi - wj <= 1, wj <= wi, j <= i) over REAL key positions
    i = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    wi, wj = i // window, j // window
    allowed = (wi - wj <= 1) & (wj <= wi) & (j <= i) & (j < t_real)

    outs = []
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        qh = q[:, :, sl]                            # [BB, T, dh]
        scores = jax.lax.dot_general(
            qh, qh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                                   # [BB, T, T] f32
        scores = jnp.where(allowed[None], scores, NEG_INF)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        attn = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        outs.append(
            jax.lax.dot_general(
                attn, qh,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        )
    a = jnp.concatenate(outs, axis=-1)              # [BB, T, D]

    # prepend the conditioning token, pad to the output tile, then the
    # second rotary pass over T+1 (pad rows stay zero: 0*cos + 0*sin)
    t_out = o_ref.shape[1]
    pieces = [coa[:, None, :], a]
    if t_out > t + 1:
        pieces.append(jnp.zeros((bb, t_out - t - 1, d), x.dtype))
    y = jnp.concatenate(pieces, axis=1)             # [BB, T_out, D]
    o_ref[:] = _rope_flat(y, cos2_ref[:], sin2_ref[:], rot)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "window", "block_b", "interpret"),
)
def fused_local_block(
    xseq: jax.Array,
    coa: jax.Array,
    *,
    num_heads: int,
    window: int,
    block_b: int = 22,
    interpret: bool = False,
) -> jax.Array:
    """rope1 + causal band attention + prepend(coa) + rope2, fused.

    xseq: [B, T, D], coa: [B, D] -> [B, T+1, D].  T must be a multiple
    of the sublane tile (8); the production gesture shape is T=80.
    ``block_b`` is a MAXIMUM (VMEM budget): the actual block is the
    pad-minimizing choice in [block_b//2, block_b].
    """
    b, t, d = xseq.shape
    assert d % num_heads == 0
    assert t % 8 == 0, "pad T to the sublane tile before the fused block"
    dh = d // num_heads

    cos1, sin1 = _tiled_rope_tables(t, dh, d)
    cos2, sin2 = _tiled_rope_tables(t + 1, dh, d)
    t_out = t + 1 + (-(t + 1) % 8)
    pad2 = t_out - (t + 1)
    cos2 = np.pad(cos2, ((0, pad2), (0, 0)))
    sin2 = np.pad(sin2, ((0, pad2), (0, 0)))

    # pad-minimizing block choice (see ops/pallas_encoder.pick_block_b):
    # at the gesture CFG batch 82 the raw default 22 would pad to 88 rows
    # where 21 pads to 84
    from gesturediffusion_tpu.ops.pallas_encoder import pick_block_b

    block_b = pick_block_b(b, block_b)
    b_pad = -b % block_b
    xp = jnp.pad(xseq, ((0, b_pad), (0, 0), (0, 0)))
    # coa rides as [B, 1, D] so its block shape satisfies the Mosaic
    # last-two-dims tiling rule for any block_b
    coap = jnp.pad(coa, ((0, b_pad), (0, 0)))[:, None, :]
    bp = b + b_pad

    row3 = lambda i: (i, 0, 0)   # noqa: E731
    const2 = lambda i: (0, 0)    # noqa: E731

    out = pl.pallas_call(
        functools.partial(
            _local_block_kernel,
            num_heads=num_heads, window=window, t_real=t,
        ),
        out_shape=jax.ShapeDtypeStruct((bp, t_out, d), xseq.dtype),
        grid=(bp // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, t, d), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1, d), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((t, d), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((t, d), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((t_out, d), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((t_out, d), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_b, t_out, d), row3, memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(xp, coap, jnp.asarray(cos1), jnp.asarray(sin1),
      jnp.asarray(cos2), jnp.asarray(sin2),
      jnp.asarray(_rotate_half_matrix(d, num_heads), xseq.dtype))
    return out[:b, : t + 1]
