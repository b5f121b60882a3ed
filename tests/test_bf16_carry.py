"""bf16 sampler-state carry (p_sample_loop(carry_dtype=jnp.bfloat16)).

The x_t chain state rounds to bf16 between steps while every update
computes in f32 via promotion (schedule coefficients stay f32).  The
gate for using it in the bench/serving path: samples must be
DISTRIBUTIONALLY equivalent to the f32 chain — same per-feature mean
and scale and the same conditional structure — though not bitwise
(each step's rounding perturbs the chaotic chain).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesturediffusion_tpu.diffusion import ModelMeanType, create_diffusion
from gesturediffusion_tpu.diffusion.sampling import (
    autoregressive_sample_loop,
    p_sample_loop,
)

B, J, T = 64, 8, 12


@pytest.fixture(scope="module")
def chain():
    diffusion = create_diffusion(
        steps=100, model_mean_type=ModelMeanType.START_X
    )
    # a fixed linear "denoiser" pulling toward a known target: the
    # stationary distribution of the chain is analytically identical for
    # any carry precision
    rs = np.random.RandomState(0)
    target = jnp.asarray(rs.randn(1, J, 1, T) * 0.5, jnp.float32)

    def model_fn(x, t, cond):
        return (0.7 * x.astype(jnp.float32) + 0.3 * target).astype(
            jnp.bfloat16
        )

    return diffusion, model_fn, target


class TestDistributionalParity:
    def test_moments_match_f32_chain(self, chain):
        diffusion, model_fn, _ = chain
        shape = (B, J, 1, T)

        f32 = jax.jit(
            lambda r: p_sample_loop(diffusion, model_fn, shape, r, None)
        )(jax.random.PRNGKey(0))
        bf16 = jax.jit(
            lambda r: p_sample_loop(
                diffusion, model_fn, shape, r, None,
                carry_dtype=jnp.bfloat16,
            )
        )(jax.random.PRNGKey(0))

        a, b = np.asarray(f32), np.asarray(bf16)
        assert b.dtype == np.float32  # output upcasts
        # same chain, same seed: trajectories stay CLOSE (rounding noise
        # only), far tighter than distribution-level checks
        rms = np.sqrt(np.mean((a - b) ** 2)) / max(np.std(a), 1e-6)
        assert rms < 0.05, f"bf16 carry diverged: relative RMS {rms:.4f}"
        np.testing.assert_allclose(a.mean(), b.mean(), atol=5e-3)
        np.testing.assert_allclose(a.std(), b.std(), rtol=2e-2)
        # per-feature means across the batch agree (conditional structure)
        np.testing.assert_allclose(
            a.mean(axis=0), b.mean(axis=0), atol=4 * a.std() / np.sqrt(B)
        )

    def test_ar_loop_with_bf16_carry(self, chain):
        from functools import partial

        diffusion, model_fn, _ = chain
        C, S = 3, 2
        shape = (8, J, 1, T)
        rs = np.random.RandomState(1)
        cc = {"dummy": jnp.zeros((C, 8))}
        seed0 = jnp.asarray(rs.randn(8, J, 1, S), jnp.float32)

        def run(loop):
            return autoregressive_sample_loop(
                diffusion, lambda x, t, c: model_fn(x, t, c), shape,
                jax.random.PRNGKey(2), cc, seed0, S, loop=loop,
            )

        want = np.asarray(jax.jit(lambda: run(p_sample_loop))())
        got = np.asarray(jax.jit(lambda: run(
            partial(p_sample_loop, carry_dtype=jnp.bfloat16)))())
        assert got.shape == (C, 8, J, 1, T)
        assert got.dtype == np.float32
        rms = np.sqrt(np.mean((want - got) ** 2)) / max(np.std(want), 1e-6)
        assert rms < 0.05

    def test_f32_default_unchanged(self, chain):
        """carry_dtype=None must be bit-identical to the pre-knob chain
        (no behavior change for every existing caller)."""
        diffusion, model_fn, _ = chain
        shape = (4, J, 1, T)
        out1 = jax.jit(
            lambda r: p_sample_loop(diffusion, model_fn, shape, r, None)
        )(jax.random.PRNGKey(3))
        out2 = jax.jit(
            lambda r: p_sample_loop(
                diffusion, model_fn, shape, r, None, carry_dtype=None
            )
        )(jax.random.PRNGKey(3))
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
