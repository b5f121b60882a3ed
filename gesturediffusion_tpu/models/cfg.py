"""Classifier-free guidance as a model_fn combinator.

Functional parity surface with the reference wrapper
(reference: model/cfg_sampler.py:7-30 — out_uncond + scale*(out - out_uncond)
with per-sample y['scale']).

TPU design: instead of two sequential forward passes per denoise step, the
cond and uncond problems are stacked along the batch axis and run as ONE
forward (2B batch) — this is the "CFG pair batched along batch dim"
optimization called out in SURVEY.md §3.2, and it doubles MXU utilization
instead of doubling latency.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from gesturediffusion_tpu.diffusion.gaussian import ModelFn


def stack_cfg_cond(cond: dict, b: int, dtype=jnp.float32) -> dict:
    """Duplicate every per-sample conditioning leaf on the batch axis and
    append the uncond mask [zeros(B), ones(B)] — the ONE stacking rule
    shared by the generic CFG wrapper and the fast path's
    precompute_cfg (reference: model/cfg_sampler.py:33-40)."""
    def stack(leaf):
        if hasattr(leaf, "shape") and leaf.shape and leaf.shape[0] == b:
            return jnp.concatenate([leaf, leaf], axis=0)
        return leaf

    cond2 = {k: stack(v) for k, v in cond.items() if k != "uncond"}
    cond2["uncond"] = jnp.concatenate(
        [jnp.zeros((b,), dtype), jnp.ones((b,), dtype)], axis=0
    )
    return cond2


def classifier_free_guidance(
    model_fn: ModelFn, cond_mask_prob: float = 0.1
) -> ModelFn:
    """Wrap a model_fn with batched classifier-free guidance.

    The wrapped fn reads the per-sample guidance scale from
    ``cond['scale']`` ([B] array; 1.0 = no guidance).  The model must have
    been trained with conditioning dropout (cond_mask_prob > 0).
    """
    assert cond_mask_prob > 0.0, (
        "Cannot run CFG on a model trained without conditioning dropout"
    )

    def guided(x: jax.Array, t: jax.Array, cond: dict) -> jax.Array:
        b = x.shape[0]
        scale = cond["scale"].reshape((b,) + (1,) * (x.ndim - 1))

        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        cond2 = stack_cfg_cond(cond, b, x.dtype)
        out = model_fn(x2, t2, cond2)
        out_cond, out_uncond = out[:b], out[b:]
        return out_uncond + scale * (out_cond - out_uncond)

    return guided
