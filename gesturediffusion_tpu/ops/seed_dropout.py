"""Dropout that re-draws its mask in the backward pass instead of saving it.

Standard dropout (flax ``nn.Dropout``) draws a bernoulli mask in the
forward pass; autodiff then saves that mask for the backward pass.  On
TPU the saved mask is RNG bits that XLA spills to HBM as copy ops —
measured at 133.7 MB/step of the production gesture train step
(PROFILE.md round-4 pinpoint: ``u32[128,4,81,81]`` per-layer attention
masks + the input-process mask, ~20% of the step's copy bytes).

``seed_dropout`` removes that traffic with a ``jax.custom_vjp`` whose
only saved residual is the PRNG key (a few bytes): the backward pass
re-draws the identical bernoulli mask from the key.  RNG generation is
cheap on TPU (~3% of the step for ALL draws, PROFILE.md), so this trades
a second tiny rng-bit-generator call for hundreds of MB of HBM copy
traffic per step.

Semantics are exactly flax ``nn.Dropout`` (same bernoulli draw, same
``x / keep_prob`` scaling, same ``lax.select`` zeros), so given the same
key the outputs are bit-identical — tested in
tests/test_seed_dropout.py.  Gradients are mask/keep_prob, analytically
identical to AD through the select.

Reference parity: the reference backbone's dropout is torch
``nn.Dropout(p)`` inside ``nn.TransformerEncoderLayer``
(/root/reference/model/mdm.py:90-96); distribution semantics match.
"""

from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _mask(key: jax.Array, keep_prob: float, shape) -> jax.Array:
    return jax.random.bernoulli(key, p=keep_prob, shape=shape)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def seed_dropout(x: jax.Array, key: jax.Array, rate: float) -> jax.Array:
    """Apply dropout with probability ``rate``; mask derived from ``key``.

    ``rate`` must be a static python float in (0, 1) — the 0/1 edge
    cases are handled by the ``SeedDropout`` module wrapper, mirroring
    flax ``nn.Dropout``'s early returns.
    """
    keep_prob = 1.0 - rate
    mask = _mask(key, keep_prob, x.shape)
    return lax.select(mask, x / keep_prob, jnp.zeros_like(x))


def _fwd(x, key, rate):
    # Residuals: ONLY the key (+ static shape/dtype via g in bwd).  The
    # mask is intentionally not saved — that is the whole point.
    return seed_dropout(x, key, rate), key


def _bwd(rate, key, g):
    keep_prob = 1.0 - rate
    # Without a barrier XLA CSEs this re-draw with the forward draw
    # (same key, same shape => identical subgraph) and the shared mask
    # buffer lives across fwd->bwd again — exactly the copy traffic this
    # op exists to delete (measured: copy table byte-identical without
    # it).  The barrier makes the backward draw opaque so the mask is
    # genuinely recomputed.
    mask = _mask(lax.optimization_barrier(key), keep_prob, g.shape)
    dx = lax.select(mask, g / keep_prob, jnp.zeros_like(g))
    # Cotangent for the integer/prng key arg is float0 (JAX's tangent
    # type for non-differentiable dtypes).
    key_bar = np.zeros(key.shape, dtype=jax.dtypes.float0)
    return (dx, key_bar)


seed_dropout.defvjp(_fwd, _bwd)


class SeedDropout(nn.Module):
    """Drop-in ``nn.Dropout`` replacement backed by ``seed_dropout``.

    Same rng collection ('dropout'), same early returns for
    deterministic / rate==0 / rate==1.  The only behavioral difference
    from ``nn.Dropout`` is invisible to the forward math: the backward
    pass re-draws the mask instead of saving it.

    **OFF BY DEFAULT — measured regression** (round-5 on-chip A/B,
    PROFILE.md): the production train step runs 14.60 ms/step with plain
    ``nn.Dropout`` vs 17.85 ms/step with seed_dropout (+22%).  The
    hypothesis behind the op was wrong at these shapes: the u32 mask
    copies in the HLO are layout copies attached to EACH
    rng-bit-generator call, not saved-for-backward traffic that a
    re-draw can delete — so re-drawing in backward DOUBLES both the rng
    cost (0.52 → 1.70 ms/step) and the u32 copy family (9×/134 MB →
    17×/241 MB).  The custom-VJP fused training layer
    (ops/pallas_encoder_train.py) is the structural fix: masks are
    hash-PRNG bits generated inside the kernel, never materialized in
    HBM at all.  ``GDT_SEED_DROPOUT=1`` opts back in for re-measurement;
    read at trace time (set before the first jit of the train step).
    """

    rate: float
    rng_collection: str = "dropout"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        if self.rate == 1.0:
            return jnp.zeros_like(x)
        import os

        key = self.make_rng(self.rng_collection)
        if os.environ.get("GDT_SEED_DROPOUT", "0") != "1":
            # exact nn.Dropout math inline (same rng fold as the single
            # make_rng call above, so masks are bit-identical to the
            # opt-in path's forward); plain AD saves the mask
            keep_prob = 1.0 - self.rate
            mask = jax.random.bernoulli(key, p=keep_prob, shape=x.shape)
            return lax.select(mask, x / keep_prob, jnp.zeros_like(x))
        return seed_dropout(x, key, self.rate)

