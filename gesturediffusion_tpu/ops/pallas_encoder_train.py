"""Fused transformer-encoder-layer TRAINING kernels (custom-VJP path).

Motivation (measured on v5e, PROFILE.md round-4/5 pinpoint): the XLA
training step spends ~26% of device time on copy ops, and the dominant
families are saved-for-backward residuals — 66 copies of
``bf16[128,81,256]`` (350 MB/step of per-layer encoder activations) plus
the dropout-mask rng bits (u32 mask tensors, 134-241 MB/step depending
on the dropout formulation).  XLA's AD must materialize every
intermediate the backward pass touches; remat re-computes them but then
copies the recomputation inputs (measured -22%, models/transformer.py).

This module removes the traffic structurally, flash-attention style:

* the FORWARD kernel runs one whole post-LN encoder layer per grid step
  with activations resident in VMEM (same structure as the inference
  kernel, ops/pallas_encoder.py) and applies dropout INSIDE the kernel;
* the only residual saved for backward is the LAYER INPUT ``x`` (which
  the stacked architecture needs live anyway — it is the previous
  layer's output);
* the BACKWARD kernel re-computes the layer's internals from ``x`` in
  VMEM and emits dx plus all weight/bias/LN gradients, accumulated in
  f32 scratch across the sequential TPU grid;
* dropout masks are never stored: they are drawn from a counter-based
  hash PRNG (murmur3-finalizer over the GLOBAL element index, the site
  id, and a per-call seed) and re-drawn bit-identically in the backward
  kernel.  The same hash is implemented in plain jnp
  (``hash_dropout_mask``) so tests can replay the exact masks and check
  gradients against autodiff of a pure-XLA twin
  (tests/test_pallas_encoder_train.py).

Semantics: torch ``nn.TransformerEncoderLayer`` post-LN, gelu(tanh),
four dropout sites (attention probs, post-attention, post-activation,
post-FF — reference: model/mdm.py:90-96 with torch defaults), softmax
and LayerNorm statistics in f32.  Distribution of the hash-PRNG masks
is Bernoulli(keep) per element, independent across sites/elements (the
murmur3 finalizer passes standard avalanche tests); it is NOT the same
stream as ``jax.random.bernoulli``, which is fine — dropout only needs
an unbiased iid mask, not a particular stream (the reference's torch
dropout stream differs from both).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -jnp.finfo(jnp.float32).max
LN_EPS = 1e-5

# dropout site ids (folded into the hash so sites are independent)
SITE_ATTN, SITE_POST_ATTN, SITE_ACT, SITE_FF = 0, 1, 2, 3

_GOLD = np.uint32(0x9E3779B9)
_M1 = np.uint32(0x85EBCA6B)
_M2 = np.uint32(0xC2B2AE35)


def _hash_u32(idx: jax.Array, salt: jax.Array) -> jax.Array:
    """murmur3 fmix32 over (idx, salt); u32 in, u32 out, wraparound ok."""
    h = idx.astype(jnp.uint32) * _M1 + salt.astype(jnp.uint32)
    h = h ^ (h >> 16)
    h = h * _M1
    h = h ^ (h >> 13)
    h = h * _M2
    h = h ^ (h >> 16)
    return h


def _salt(seed: jax.Array, site: int) -> jax.Array:
    site_gold = np.uint32((site * 0x9E3779B9) & 0xFFFFFFFF)
    return (seed.astype(jnp.uint32) + site_gold) | jnp.uint32(1)


def _keep_from_idx(idx, seed, site, keep_prob: float):
    """Boolean keep-mask for global element indices ``idx`` (int32)."""
    thresh = jnp.uint32(min(int(keep_prob * 2**32), 2**32 - 1))
    return _hash_u32(idx, _salt(seed, site)) < thresh


def hash_dropout_mask(shape, base: int, seed, site: int, keep_prob: float):
    """jnp twin of the in-kernel mask draw: global flat indices
    base..base+prod(shape) reshaped to ``shape``.  Used by the pure-XLA
    reference twin in tests to replay the kernel's exact masks."""
    n = int(np.prod(shape))
    idx = (jnp.arange(n, dtype=jnp.int32) + jnp.int32(base)).reshape(shape)
    return _keep_from_idx(idx, jnp.asarray(seed), site, keep_prob)


def _iota2(shape, dim):
    return lax.broadcasted_iota(jnp.int32, shape, dim)


# --------------------------------------------------------------------- #
# Shared in-kernel forward recompute (used by fwd and bwd kernels)
# --------------------------------------------------------------------- #
def _forward_core(
    x, weights, seed, *, num_heads, t_real, rate: float,
    b_offset,
):
    """Recompute the layer's internals for a [BB, T, D] block.

    Returns a dict of every intermediate the backward pass needs.
    All dropout masks derive from (seed, site, global element index);
    ``b_offset`` is the global batch index of this block's row 0.
    """
    (wqkv, bqkv, wo, bo, ln1s, ln1b, w1, b1, w2, b2, ln2s, ln2b) = weights
    bb, t, d = x.shape
    f = w1.shape[1]
    dh = d // num_heads
    scale = dh**-0.5
    keep = 1.0 - rate
    cdt = x.dtype

    x2 = x.reshape(bb * t, d)
    qkv = jnp.dot(x2, wqkv, preferred_element_type=jnp.float32) \
        + bqkv.astype(jnp.float32)
    qkv = qkv.astype(cdt)
    q, k, v = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]

    # global row index of (local batch row, time) for mask derivation
    brow = (_iota2((bb, t), 0) + b_offset)          # [BB, T] global b
    trow = _iota2((bb, t), 1)                       # [BB, T] t

    head_outs = []
    p_list, pd_list = [], []
    for hh in range(num_heads):
        sl = slice(hh * dh, (hh + 1) * dh)
        qh = q[:, sl].reshape(bb, t, dh)
        kh = k[:, sl].reshape(bb, t, dh)
        vh = v[:, sl].reshape(bb, t, dh)
        scores = lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                                    # [BB, T, T] f32
        if t_real < t:
            kpos = _iota2(scores.shape, 2)
            scores = jnp.where(kpos < t_real, scores, NEG_INF)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)   # f32 probs
        if rate > 0.0:
            # site ATTN: global index over conceptual [B, H, T, T]
            bidx = (brow[:, :, None] * np.int32(num_heads)
                    + np.int32(hh))                  # [BB, T, 1]
            # strides use t_real so indices are pad-layout-invariant
            # (padded rows/cols compute junk indices; their probs are 0)
            idx = (bidx * t_real + trow[:, :, None]) * t_real + _iota2(
                (bb, t, t), 2
            )
            keep_m = _keep_from_idx(idx, seed, SITE_ATTN, keep)
            pd = jnp.where(keep_m, p * (1.0 / keep), 0.0)
        else:
            pd = p
        pdc = pd.astype(cdt)
        oh = lax.dot_general(
            pdc, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        head_outs.append(oh.astype(cdt))
        p_list.append(p)
        pd_list.append(pdc)
    o = jnp.concatenate(head_outs, axis=-1).reshape(bb * t, d)
    a = jnp.dot(o, wo, preferred_element_type=jnp.float32) \
        + bo.astype(jnp.float32)                     # [BB*T, D] f32

    # site POST_ATTN over conceptual [B, T, D].  Row-site indices are
    # built in 3-D [BB, T, width] and only the LEADING dims collapsed:
    # Mosaic rejects the (bb, t) -> (bb*t, 1) shape cast a 1-D rowidx
    # would need (lane dim 88 -> 1), but leading-dim merges with the
    # lane dim unchanged lower fine.
    row3 = brow * np.int32(t_real) + trow            # [BB, T] global row

    def _row_keep(width, site):
        idx = (row3[:, :, None] * np.int32(width)
               + _iota2((bb, t, width), 2))
        return _keep_from_idx(idx, seed, site, keep).reshape(
            bb * t, width)

    if rate > 0.0:
        keep2 = _row_keep(d, SITE_POST_ATTN)
        a_drop = jnp.where(keep2, a * (1.0 / keep), 0.0)
    else:
        keep2 = None
        a_drop = a

    u = x2.astype(jnp.float32) + a_drop              # pre-LN1 f32
    mu1 = jnp.mean(u, axis=-1, keepdims=True)
    var1 = jnp.mean((u - mu1) ** 2, axis=-1, keepdims=True)
    rs1 = lax.rsqrt(var1 + LN_EPS)
    uhat = (u - mu1) * rs1
    y1 = (uhat * ln1s.astype(jnp.float32)
          + ln1b.astype(jnp.float32)).astype(cdt)    # [BB*T, D]

    h1 = jnp.dot(y1, w1, preferred_element_type=jnp.float32) \
        + b1.astype(jnp.float32)                     # [BB*T, F] f32
    hg = jax.nn.gelu(h1)                             # f32 (tanh approx)
    if rate > 0.0:
        keep3 = _row_keep(f, SITE_ACT)
        hd = jnp.where(keep3, hg * (1.0 / keep), 0.0)
    else:
        keep3 = None
        hd = hg
    hdc = hd.astype(cdt)
    ff = jnp.dot(hdc, w2, preferred_element_type=jnp.float32) \
        + b2.astype(jnp.float32)                     # [BB*T, D] f32
    if rate > 0.0:
        keep4 = _row_keep(d, SITE_FF)
        ff_drop = jnp.where(keep4, ff * (1.0 / keep), 0.0)
    else:
        keep4 = None
        ff_drop = ff

    vv = y1.astype(jnp.float32) + ff_drop            # pre-LN2 f32
    mu2 = jnp.mean(vv, axis=-1, keepdims=True)
    var2 = jnp.mean((vv - mu2) ** 2, axis=-1, keepdims=True)
    rs2 = lax.rsqrt(var2 + LN_EPS)
    vhat = (vv - mu2) * rs2
    y2 = (vhat * ln2s.astype(jnp.float32) + ln2b.astype(jnp.float32))

    return dict(
        x2=x2, qkv=qkv, q=q, k=k, v=v, p_list=p_list, pd_list=pd_list,
        o=o, a=a, keep2=keep2, u=u, rs1=rs1, uhat=uhat, y1=y1,
        h1=h1, hg=hg, keep3=keep3, hd=hdc, ff=ff, keep4=keep4,
        rs2=rs2, vhat=vhat, y2=y2,
    )


def _gelu_tanh_grad(x):
    # d/dx of 0.5 x (1 + tanh(c (x + a x^3))), the tanh approximation
    # jax.nn.gelu uses by default
    c = np.float32(np.sqrt(2.0 / np.pi))
    a = np.float32(0.044715)
    inner = c * (x + a * x**3)
    th = jnp.tanh(inner)
    return 0.5 * (1.0 + th) + 0.5 * x * (1.0 - th**2) * c * (
        1.0 + 3.0 * a * x**2
    )


# --------------------------------------------------------------------- #
# Forward kernel
# --------------------------------------------------------------------- #
def _fwd_kernel(
    seed_ref, x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, ln1s_ref,
    ln1b_ref, w1_ref, b1_ref, w2_ref, b2_ref, ln2s_ref, ln2b_ref,
    o_ref, *, num_heads, t_real, rate, block_b,
):
    bb, t, d = x_ref.shape
    x = x_ref[:]
    weights = (
        wqkv_ref[:], bqkv_ref[:], wo_ref[:], bo_ref[:], ln1s_ref[:],
        ln1b_ref[:], w1_ref[:], b1_ref[:], w2_ref[:], b2_ref[:],
        ln2s_ref[:], ln2b_ref[:],
    )
    b_offset = pl.program_id(0) * np.int32(block_b)
    core = _forward_core(
        x, weights, seed_ref[0], num_heads=num_heads, t_real=t_real,
        rate=rate, b_offset=b_offset,
    )
    o_ref[:] = core["y2"].reshape(bb, t, d).astype(o_ref.dtype)


# --------------------------------------------------------------------- #
# Backward kernel (recompute + grads; weight grads accumulate in f32
# scratch across the sequential grid, written out on the last step)
# --------------------------------------------------------------------- #
def _bwd_kernel(
    seed_ref, x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, ln1s_ref,
    ln1b_ref, w1_ref, b1_ref, w2_ref, b2_ref, ln2s_ref, ln2b_ref,
    g_ref,
    dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref, dln1s_ref,
    dln1b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dln2s_ref,
    dln2b_ref,
    awqkv, abqkv, awo, abo, aln1s, aln1b, aw1, ab1, aw2, ab2, aln2s,
    aln2b,
    *, num_heads, t_real, rate, block_b,
):
    bb, t, d = x_ref.shape
    f = aw1.shape[1]
    dh = d // num_heads
    scale = dh**-0.5
    keep = 1.0 - rate
    x = x_ref[:]
    cdt = x.dtype
    weights = (
        wqkv_ref[:], bqkv_ref[:], wo_ref[:], bo_ref[:], ln1s_ref[:],
        ln1b_ref[:], w1_ref[:], b1_ref[:], w2_ref[:], b2_ref[:],
        ln2s_ref[:], ln2b_ref[:],
    )
    i = pl.program_id(0)
    b_offset = i * np.int32(block_b)
    core = _forward_core(
        x, weights, seed_ref[0], num_heads=num_heads, t_real=t_real,
        rate=rate, b_offset=b_offset,
    )

    g3 = g_ref[:].astype(jnp.float32)

    # mask padded time rows of the cotangent: their forward rows are
    # garbage and must contribute nothing to any gradient (masked in
    # 3-D — Mosaic rejects (bb, t) -> (bb*t, 1) shape casts)
    if t_real < t:
        trow3 = _iota2((bb, t, 1), 1)
        g3 = jnp.where(trow3 < t_real, g3, 0.0)
    g = g3.reshape(bb * t, d)

    ln2s_f = weights[10].astype(jnp.float32)
    # ---- LN2 backward ----
    gy = g * ln2s_f
    dln2s = jnp.sum(g * core["vhat"], axis=0)
    dln2b = jnp.sum(g, axis=0)
    mean_gy = jnp.mean(gy, axis=-1, keepdims=True)
    mean_gyv = jnp.mean(gy * core["vhat"], axis=-1, keepdims=True)
    dv = core["rs2"] * (gy - mean_gy - core["vhat"] * mean_gyv)

    # ---- FF branch ----
    dy1 = dv
    if rate > 0.0:
        dff = jnp.where(core["keep4"], dv * (1.0 / keep), 0.0)
    else:
        dff = dv
    dw2 = lax.dot_general(
        core["hd"].astype(jnp.float32), dff, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                # [F, D]
    db2 = jnp.sum(dff, axis=0)
    dhd = jnp.dot(
        dff.astype(cdt), weights[8].T,
        preferred_element_type=jnp.float32,
    )                                                # [BB*T, F] f32
    if rate > 0.0:
        dhg = jnp.where(core["keep3"], dhd * (1.0 / keep), 0.0)
    else:
        dhg = dhd
    dh1 = dhg * _gelu_tanh_grad(core["h1"])
    dw1 = lax.dot_general(
        core["y1"].astype(jnp.float32), dh1, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                # [D, F]
    db1 = jnp.sum(dh1, axis=0)
    dy1 = dy1 + jnp.dot(
        dh1.astype(cdt), weights[6].T, preferred_element_type=jnp.float32
    )

    # ---- LN1 backward ----
    ln1s_f = weights[4].astype(jnp.float32)
    gy1 = dy1 * ln1s_f
    dln1s = jnp.sum(dy1 * core["uhat"], axis=0)
    dln1b = jnp.sum(dy1, axis=0)
    mean_g1 = jnp.mean(gy1, axis=-1, keepdims=True)
    mean_g1u = jnp.mean(gy1 * core["uhat"], axis=-1, keepdims=True)
    du = core["rs1"] * (gy1 - mean_g1 - core["uhat"] * mean_g1u)

    # ---- attention branch ----
    dx2 = du                                         # residual path
    if rate > 0.0:
        da = jnp.where(core["keep2"], du * (1.0 / keep), 0.0)
    else:
        da = du
    dwo = lax.dot_general(
        core["o"].astype(jnp.float32), da, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbo = jnp.sum(da, axis=0)
    do = jnp.dot(
        da.astype(cdt), weights[2].T, preferred_element_type=jnp.float32
    ).astype(cdt)                                    # [BB*T, D]

    dq_heads, dk_heads, dv_heads = [], [], []
    for hh in range(num_heads):
        sl = slice(hh * dh, (hh + 1) * dh)
        do_h = do[:, sl].reshape(bb, t, dh)
        vh = core["v"][:, sl].reshape(bb, t, dh)
        qh = core["q"][:, sl].reshape(bb, t, dh)
        kh = core["k"][:, sl].reshape(bb, t, dh)
        pd = core["pd_list"][hh]                     # [BB, T, T] cdt
        p = core["p_list"][hh]                       # f32
        dv_h = lax.dot_general(
            pd, do_h, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                            # [BB, T, dh]
        dpd = lax.dot_general(
            do_h, vh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                            # [BB, T, T] f32
        if rate > 0.0:
            brow = (_iota2((bb, t), 0) + b_offset)
            trow = _iota2((bb, t), 1)
            bidx = (brow[:, :, None] * np.int32(num_heads)
                    + np.int32(hh))
            idx = (bidx * t_real + trow[:, :, None]) * t_real + _iota2(
                (bb, t, t), 2
            )
            keep_m = _keep_from_idx(
                idx, seed_ref[0], SITE_ATTN, keep
            )
            dp = jnp.where(keep_m, dpd * (1.0 / keep), 0.0)
        else:
            dp = dpd
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = (ds * scale).astype(cdt)
        dq_h = lax.dot_general(
            ds, kh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk_h = lax.dot_general(
            ds, qh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dq_heads.append(dq_h.reshape(bb * t, dh))
        dk_heads.append(dk_h.reshape(bb * t, dh))
        dv_heads.append(dv_h.reshape(bb * t, dh))
    dqkv = jnp.concatenate(
        [jnp.concatenate(dq_heads, axis=-1),
         jnp.concatenate(dk_heads, axis=-1),
         jnp.concatenate(dv_heads, axis=-1)], axis=-1,
    )                                                # [BB*T, 3D] f32
    dwqkv = lax.dot_general(
        core["x2"].astype(jnp.float32), dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbqkv = jnp.sum(dqkv, axis=0)
    dx2 = dx2 + jnp.dot(
        dqkv.astype(cdt), weights[0].T, preferred_element_type=jnp.float32
    )

    dx_ref[:] = dx2.reshape(bb, t, d).astype(dx_ref.dtype)

    # ---- accumulate weight grads across the sequential grid ----
    grads = (dwqkv, dbqkv, dwo, dbo, dln1s, dln1b, dw1, db1, dw2, db2,
             dln2s, dln2b)
    scratch = (awqkv, abqkv, awo, abo, aln1s, aln1b, aw1, ab1, aw2, ab2,
               aln2s, aln2b)
    outs = (dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref, dln1s_ref, dln1b_ref,
            dw1_ref, db1_ref, dw2_ref, db2_ref, dln2s_ref, dln2b_ref)

    @pl.when(i == 0)
    def _init():
        for s, gr in zip(scratch, grads):
            s[:] = gr

    @pl.when(i > 0)
    def _acc():
        for s, gr in zip(scratch, grads):
            s[:] = s[:] + gr

    @pl.when(i == pl.num_programs(0) - 1)
    def _flush():
        for out, s in zip(outs, scratch):
            out[:] = s[:].astype(out.dtype)


# --------------------------------------------------------------------- #
# pallas_call plumbing
# --------------------------------------------------------------------- #
_W_SHAPES = (
    lambda d, f: (d, 3 * d), lambda d, f: (3 * d,),
    lambda d, f: (d, d), lambda d, f: (d,),
    lambda d, f: (d,), lambda d, f: (d,),
    lambda d, f: (d, f), lambda d, f: (f,),
    lambda d, f: (f, d), lambda d, f: (d,),
    lambda d, f: (d,), lambda d, f: (d,),
)

# f32 backward intermediates are larger than the inference kernel's:
# budget the auto block for the biggest one ([BB*T, F] f32 x ~3 live)
_TRAIN_FF_BYTES = 3 << 20


def _train_block_b(b, t_padded, f, budget=_TRAIN_FF_BYTES,
                   env_name="GDT_ENC_TRAIN_BLOCK"):
    import os

    env = os.environ.get(env_name)
    if env:
        return min(max(int(env), 1), b)
    for bb in (16, 8, 4, 2, 1):
        if bb * t_padded * f * 4 <= budget:
            return min(bb, b)
    return 1


def _specs(block_b, tp, d, f, n_w=12):
    # index maps take (i, scalar_prefetch_ref) under PrefetchScalarGridSpec
    row = pl.BlockSpec(
        (block_b, tp, d), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
    )
    w_specs = []
    for k in range(n_w):
        shp = _W_SHAPES[k](d, f)
        if len(shp) == 2:
            w_specs.append(pl.BlockSpec(
                shp, lambda i, *_: (0, 0), memory_space=pltpu.VMEM))
        else:
            w_specs.append(pl.BlockSpec(
                shp, lambda i, *_: (0,), memory_space=pltpu.VMEM))
    return row, w_specs


def _pad_x(x, block_b):
    b, t, d = x.shape
    t_pad = -t % 8
    b_pad = -b % block_b
    return jnp.pad(x, ((0, b_pad), (0, t_pad), (0, 0))), b + b_pad, t + t_pad


def make_fused_train_layer(
    num_heads: int, rate: float, *, block_b: int | None = None,
    interpret: bool = False,
):
    """Build the custom-VJP fused training layer for a given config.

    Returns ``layer(x, *weights, seed)`` where x: [B, T, D],
    weights are the 12 packed arrays of
    models/transformer.py::TransformerEncoderLayer (wqkv, bqkv, wo, bo,
    ln1_scale, ln1_bias, w1, b1, w2, b2, ln2_scale, ln2_bias) and
    ``seed`` is an int32 scalar array deriving all four dropout sites.
    Output: [B, T, D] in x.dtype.  d(out)/d(seed) is defined as zero.
    """
    rate = float(rate)

    def _resolve_block(b, tp, f, bwd=False):
        if block_b is not None:
            return min(block_b, b)
        if bwd:
            # the backward kernel's live set (recompute + per-head probs
            # + the f32 FF-grad chain + weight-grad scratch) measures
            # ~20 MB at block 4 on v5e — over the 16 MB scoped-VMEM cap
            # XLA enforces for kernel stacks (and LIBTPU_INIT_ARGS is
            # terminal-controlled here, so the cap can't be raised).
            # Quarter the budget so the default block is 2 at the
            # production [*, 88, 256]x1024 shapes; GDT_ENC_TRAIN_BLOCK_BWD
            # overrides for other shapes/parts.
            return _train_block_b(b, tp, f, budget=_TRAIN_FF_BYTES // 4,
                                  env_name="GDT_ENC_TRAIN_BLOCK_BWD")
        return _train_block_b(b, tp, f)

    def seed_arr(seed):
        return jnp.asarray(seed, jnp.int32).reshape(1)

    def _fwd_call(x, ws, seed):
        b, t, d = x.shape
        f = ws[6].shape[1]
        bb = _resolve_block(b, t + (-t % 8), f)
        xp, bp, tp_ = _pad_x(x, bb)
        row, w_specs = _specs(bb, tp_, d, f)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bp // bb,),
            in_specs=[row] + w_specs,
            out_specs=row,
        )
        out = pl.pallas_call(
            functools.partial(
                _fwd_kernel, num_heads=num_heads, t_real=t, rate=rate,
                block_b=bb,
            ),
            out_shape=jax.ShapeDtypeStruct((bp, tp_, d), x.dtype),
            grid_spec=grid_spec,
            interpret=interpret,
            name="fused_encoder_train_fwd",
        )(seed_arr(seed), xp, *ws)
        return out[:b, :t]

    @jax.custom_vjp
    def layer(x, *ws_and_seed):
        ws, seed = ws_and_seed[:-1], ws_and_seed[-1]
        return _fwd_call(x, ws, seed)

    def fwd(x, *ws_and_seed):
        ws, seed = ws_and_seed[:-1], ws_and_seed[-1]
        return _fwd_call(x, ws, seed), (x, ws, seed)

    def bwd(res, g):
        x, ws, seed = res
        b, t, d = x.shape
        f = ws[6].shape[1]
        bb = _resolve_block(b, t + (-t % 8), f, bwd=True)
        xp, bp, tp_ = _pad_x(x, bb)
        gp, _, _ = _pad_x(g.astype(x.dtype), bb)
        row, w_specs = _specs(bb, tp_, d, f)
        w_shapes = [_W_SHAPES[k](d, f) for k in range(12)]
        out_shapes = (
            [jax.ShapeDtypeStruct((bp, tp_, d), x.dtype)]
            + [jax.ShapeDtypeStruct(s, w.dtype)
               for s, w in zip(w_shapes, ws)]
        )
        out_specs = [row] + [
            pl.BlockSpec(s, (lambda i, *_: (0, 0)) if len(s) == 2
                         else (lambda i, *_: (0,)), memory_space=pltpu.VMEM)
            for s in w_shapes
        ]
        scratch = [pltpu.VMEM(s, jnp.float32) for s in w_shapes]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bp // bb,),
            in_specs=[row] + w_specs + [row],
            out_specs=tuple(out_specs),
            scratch_shapes=scratch,
        )
        outs = pl.pallas_call(
            functools.partial(
                _bwd_kernel, num_heads=num_heads, t_real=t, rate=rate,
                block_b=bb,
            ),
            out_shape=tuple(out_shapes),
            grid_spec=grid_spec,
            interpret=interpret,
            name="fused_encoder_train_bwd",
        )(seed_arr(seed), xp, *ws, gp)
        dx = outs[0][:b, :t].astype(x.dtype)
        dws = tuple(outs[1:])
        dseed = np.zeros((), dtype=jax.dtypes.float0)
        return (dx, *dws, dseed)

    layer.defvjp(fwd, bwd)
    return layer


# --------------------------------------------------------------------- #
# Pure-XLA twin (tests + CPU fallback): same math, same hash masks
# --------------------------------------------------------------------- #
def encoder_layer_train_reference(
    x, ws, seed, *, num_heads: int, rate: float,
):
    """jnp reference of the fused training layer — identical math and
    identical hash-PRNG masks (global element indexing matches the
    kernels for any block_b).  Autodiff through THIS is the gradient
    spec the custom VJP is tested against."""
    b, t, d = x.shape
    weights = tuple(ws)
    core = _forward_core(
        x, weights, jnp.asarray(seed, jnp.int32), num_heads=num_heads,
        t_real=t, rate=float(rate), b_offset=jnp.int32(0),
    )
    return core["y2"].reshape(b, t, d).astype(x.dtype)
