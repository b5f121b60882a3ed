"""Fused transformer-encoder-layer Pallas kernel (inference path).

Motivation (measured on v5e, gesture config [B=82, T=81, D=256] x8
layers): the XLA encoder is HBM-bandwidth-bound — every layer round-trips
q/k/v/scores/ffn activations through HBM (~100 MB/layer), capping the
encoder at ~44% MXU utilization.  This kernel runs ONE ENTIRE post-LN
encoder layer per grid step with the activation block resident in VMEM:

    a = selfattn(x); x = LN1(x + a); x = LN2(x + FF(x))

HBM traffic per layer drops to x-in + x-out + weights (weights are
fetched once — their block index is constant across the grid, so Mosaic
keeps them resident).

Semantics match models/transformer.py TransformerEncoderLayer
(torch nn.TransformerEncoderLayer post-LN, gelu, deterministic — the
training path keeps the XLA formulation for dropout + autodiff).
Softmax and LayerNorm statistics are computed in f32.

Reference lineage: the backbone being fused is the reference's 8-layer
`nn.TransformerEncoder` (reference: model/mdm.py:90-96).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -jnp.finfo(jnp.float32).max
LN_EPS = 1e-5

# Budget for the largest f32 intermediate ([block_b*T, ff] gelu activations)
# when auto-selecting block_b.  Measured on v5e (16 MB VMEM): gesture
# [82,82,256]f=1024 fits up to block 23 (block 41 fails to compile);
# t2m [64,200,512]f=1024 fits up to 10.
_AUTO_FF_BYTES = 8 << 20


def pick_block_b(b: int, max_block: int) -> int:
    """Pad-minimizing batch block: the grid computes ceil(b/bb)*bb rows,
    so among blocks in [max_block//2, max_block] pick the one wasting the
    fewest padded rows, tie-broken toward the largest block (fewest grid
    steps).  Measured on v5e at the gesture CFG batch 82: the largest
    fitting block (22) pads to 88 rows while 21 pads to 84 — 4.5% less
    kernel compute for an otherwise identical program.  Blocks below
    max_block//2 are excluded: per-block efficiency falls off faster
    than pad waste shrinks (block 8 measured +6% vs 22 at the gesture
    shape)."""
    if max_block < 1:
        return 1
    if b <= max_block:
        return b
    best_bp, best_bb = None, None
    for bb in range(max_block, max(1, max_block // 2) - 1, -1):
        bp = -(-b // bb) * bb
        if best_bp is None or bp < best_bp:
            best_bp, best_bb = bp, bb
    return best_bb


def _auto_block_b(b: int, t_padded: int, ff: int) -> int:
    """VMEM-fitting, pad-minimizing batch block for the fused layer.

    $GDT_ENC_BLOCK overrides the choice (perf-tuning knob).  Caveats: an
    oversized value can VMEM-OOM at compile time (the auto budget is
    bypassed on purpose — that is what the knob is for), and because the
    resolved block is part of the jit cache key, the env var is read on
    the FIRST trace per shape only."""
    import os

    env = os.environ.get("GDT_ENC_BLOCK")
    if env:
        try:
            bb = int(env)
        except ValueError as e:
            raise ValueError(
                f"GDT_ENC_BLOCK={env!r} is not an integer"
            ) from e
        if bb < 1:
            raise ValueError(f"GDT_ENC_BLOCK must be >= 1, got {bb}")
        return min(bb, b)
    fit = _AUTO_FF_BYTES // (t_padded * ff * 4)
    return pick_block_b(b, min(int(fit), 32))


def _layer_norm_f32(x, scale, bias):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + LN_EPS)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _encoder_layer_kernel(
    x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, ln1s_ref, ln1b_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, ln2s_ref, ln2b_ref, o_ref,
    *, num_heads: int, t_real: int,
):
    bb, t, d = x_ref.shape
    dh = d // num_heads
    scale = dh**-0.5
    x = x_ref[:]                       # [BB, T, D]
    x2 = x.reshape(bb * t, d)

    qkv = jnp.dot(
        x2, wqkv_ref[:], preferred_element_type=jnp.float32
    ) + bqkv_ref[:].astype(jnp.float32)      # [BB*T, 3D] f32
    qkv = qkv.astype(x.dtype)
    q, k, v = qkv[:, :d], qkv[:, d : 2 * d], qkv[:, 2 * d :]

    # Per-head attention via STATIC lane slices (Mosaic cannot split the
    # lane dim in a reshape, and tpu.matmul supports at most 1 batch dim —
    # the python loop over heads is unrolled at trace time).
    head_outs = []
    for hh in range(num_heads):
        sl = slice(hh * dh, (hh + 1) * dh)
        qh = q[:, sl].reshape(bb, t, dh)
        kh = k[:, sl].reshape(bb, t, dh)
        vh = v[:, sl].reshape(bb, t, dh)
        scores = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                        # [BB, T, T] f32
        # mask padded key positions (T may be padded to the sublane tile)
        if t_real < t:
            kpos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
            scores = jnp.where(kpos < t_real, scores, NEG_INF)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        attn = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        oh = jax.lax.dot_general(
            attn, vh,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                # [BB, T, dh] f32
        head_outs.append(oh.astype(x.dtype))
    out = jnp.concatenate(head_outs, axis=-1).reshape(bb * t, d)
    out = jnp.dot(
        out, wo_ref[:], preferred_element_type=jnp.float32
    ) + bo_ref[:].astype(jnp.float32)

    x2 = _layer_norm_f32(
        x2.astype(jnp.float32) + out, ln1s_ref[:], ln1b_ref[:]
    ).astype(x.dtype)

    h = jnp.dot(
        x2, w1_ref[:], preferred_element_type=jnp.float32
    ) + b1_ref[:].astype(jnp.float32)
    # gelu stays in f32: bf16 transcendentals measured 12% SLOWER on the
    # v5e VPU (upconvert-per-op), besides being less accurate
    h = jax.nn.gelu(h).astype(x.dtype)
    h = jnp.dot(
        h, w2_ref[:], preferred_element_type=jnp.float32
    ) + b2_ref[:].astype(jnp.float32)

    y = _layer_norm_f32(x2.astype(jnp.float32) + h, ln2s_ref[:], ln2b_ref[:])
    o_ref[:] = y.reshape(bb, t, d).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "block_b", "interpret", "t_real"),
)
def fused_encoder_layer(
    x: jax.Array,
    wqkv: jax.Array, bqkv: jax.Array,
    wo: jax.Array, bo: jax.Array,
    ln1_scale: jax.Array, ln1_bias: jax.Array,
    w1: jax.Array, b1: jax.Array,
    w2: jax.Array, b2: jax.Array,
    ln2_scale: jax.Array, ln2_bias: jax.Array,
    *,
    num_heads: int,
    block_b: int | None = None,
    interpret: bool = False,
    t_real: int | None = None,
) -> jax.Array:
    """One post-LN encoder layer, fused.  x: [B, T, D] -> [B, T, D].

    Weights follow the packed layout of
    models/transformer.py::TransformerEncoderLayer
    (wqkv [D, 3D], wo [D, D], w1 [D, F], w2 [F, D]; LN scale/bias [D]).

    block_b=None auto-selects the largest VMEM-fitting batch block.

    ``t_real`` opts into PADDED I/O for layer stacking: the input is
    already tile-aligned ([B, T, D] with T % 8 == 0, B % block_b == 0,
    only the first ``t_real`` time rows meaningful) and the output stays
    padded — no per-layer pad/slice round-trips.  Padded-region rows
    carry finite garbage between layers but can never leak into real
    rows: attention masks keys at positions >= t_real, and every other
    op is row-local.  The caller (TransformerEncoder) pads once before
    layer 0 and slices once after the last layer.
    """
    b, t, d = x.shape
    f = w1.shape[1]
    assert d % num_heads == 0

    if t_real is not None:
        # pre-padded stacking path
        assert t % 8 == 0 and block_b is not None and b % block_b == 0
        out = pl.pallas_call(
            functools.partial(
                _encoder_layer_kernel, num_heads=num_heads, t_real=t_real
            ),
            out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
            grid=(b // block_b,),
            in_specs=[
                pl.BlockSpec((block_b, t, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, 3 * d), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3 * d,), lambda i: (0,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, d), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, f), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((f,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((f, d), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (block_b, t, d), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            interpret=interpret,
        )(
            x, wqkv, bqkv, wo, bo, ln1_scale, ln1_bias,
            w1, b1, w2, b2, ln2_scale, ln2_bias,
        )
        return out

    if block_b is None:
        block_b = _auto_block_b(b, t + (-t % 8), f)
    # pad T to the f32 sublane tile and B to the block size
    t_pad = -t % 8
    b_pad = -b % block_b
    xp = jnp.pad(x, ((0, b_pad), (0, t_pad), (0, 0)))
    bp, tp = b + b_pad, t + t_pad
    grid = (bp // block_b,)

    row = lambda i: (i, 0, 0)  # noqa: E731
    const2 = lambda i: (0, 0)  # noqa: E731
    const1 = lambda i: (0,)    # noqa: E731

    out = pl.pallas_call(
        functools.partial(
            _encoder_layer_kernel, num_heads=num_heads, t_real=t
        ),
        out_shape=jax.ShapeDtypeStruct((bp, tp, d), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, tp, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * d,), const1, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), const1, memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), const1, memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), const1, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((f,), const1, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), const1, memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), const1, memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), const1, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_b, tp, d), row, memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(
        xp, wqkv, bqkv, wo, bo, ln1_scale, ln1_bias,
        w1, b1, w2, b2, ln2_scale, ln2_bias,
    )
    return out[:b, :t]
