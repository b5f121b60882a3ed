"""seed_dropout: bit-parity with nn.Dropout, grads, tiny residuals.

The op exists to delete the saved-for-backward dropout-mask copies
PROFILE.md pinpointed (133.7 MB/step); these tests pin (a) exact forward
parity with flax nn.Dropout under the same key, (b) gradient parity,
and (c) that the vjp residuals really are key-sized, not mask-sized.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesturediffusion_tpu.ops.seed_dropout import SeedDropout, seed_dropout


def _flax_dropout_apply(x, key, rate):
    mod = nn.Dropout(rate, deterministic=False)
    return mod.apply({}, x, rngs={"dropout": key})


def _flax_dropout_formula(x, key, rate):
    """nn.Dropout's exact math on a RAW key (``.apply`` folds the key by
    module path first, so function-level parity is against the formula;
    module-level parity against real nn.Dropout is tested below)."""
    keep_prob = 1.0 - rate
    mask = jax.random.bernoulli(key, p=keep_prob, shape=x.shape)
    return jax.lax.select(mask, x / keep_prob, jnp.zeros_like(x))


class TestSeedDropoutFunction:
    def test_forward_bit_identical_to_flax(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 17, 32))
        key = jax.random.PRNGKey(7)
        got = seed_dropout(x, key, 0.1)
        want = _flax_dropout_formula(x, key, 0.1)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    @pytest.mark.parametrize("rate", [0.1, 0.5])
    def test_grad_matches_flax_dropout(self, rate):
        x = jax.random.normal(jax.random.PRNGKey(1), (3, 8, 16))
        key = jax.random.PRNGKey(11)
        g_seed = jax.grad(lambda y: seed_dropout(y, key, rate).sum())(x)
        g_flax = jax.grad(
            lambda y: _flax_dropout_formula(y, key, rate).sum()
        )(x)
        np.testing.assert_array_equal(np.asarray(g_seed), np.asarray(g_flax))

    def test_grad_under_jit(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 8))
        key = jax.random.PRNGKey(3)
        f = jax.jit(jax.grad(lambda y: seed_dropout(y, key, 0.3).sum()))
        g = f(x)
        # Gradient is keep_mask / keep_prob: values in {0, 1/0.7}.
        vals = np.unique(np.asarray(g))
        for v in vals:
            assert abs(v) < 1e-6 or abs(v - 1 / 0.7) < 1e-5, vals

    def test_residuals_are_key_sized_not_mask_sized(self):
        # The whole point: AD through nn.Dropout saves an x-shaped mask;
        # seed_dropout's vjp closure must hold only the key (+ nothing
        # proportional to x).
        x = jax.random.normal(jax.random.PRNGKey(4), (64, 81, 256))
        key = jax.random.PRNGKey(5)

        _, vjp_seed = jax.vjp(lambda y: seed_dropout(y, key, 0.1), x)
        seed_bytes = sum(
            np.asarray(leaf).nbytes
            for leaf in jax.tree_util.tree_leaves(vjp_seed)
            if hasattr(leaf, "nbytes") or isinstance(leaf, jnp.ndarray)
        )

        _, vjp_flax = jax.vjp(
            lambda y: _flax_dropout_apply(y, key, 0.1), x
        )
        flax_bytes = sum(
            np.asarray(leaf).nbytes
            for leaf in jax.tree_util.tree_leaves(vjp_flax)
            if hasattr(leaf, "nbytes") or isinstance(leaf, jnp.ndarray)
        )

        # flax saves the bool mask (>= 1 byte/elem); seed saves ~a key.
        assert seed_bytes <= 64, f"seed residuals too big: {seed_bytes}B"
        assert flax_bytes >= x.size, f"expected flax to save a mask"

    def test_bf16_dtype_preserved(self):
        x = jax.random.normal(jax.random.PRNGKey(6), (4, 8)).astype(
            jnp.bfloat16
        )
        key = jax.random.PRNGKey(9)
        out = seed_dropout(x, key, 0.1)
        assert out.dtype == jnp.bfloat16
        g = jax.grad(
            lambda y: seed_dropout(y, key, 0.1).astype(jnp.float32).sum()
        )(x)
        assert g.dtype == jnp.bfloat16


class TestSeedDropoutModule:
    def test_matches_nn_dropout_with_same_rng(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 16))
        key = jax.random.PRNGKey(42)
        got = SeedDropout(0.2).apply(
            {}, x, deterministic=False, rngs={"dropout": key}
        )
        # Same collection + same sole make_rng call site => same key fold.
        want = nn.Dropout(0.2).apply(
            {}, x, deterministic=False, rngs={"dropout": key}
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_deterministic_and_edge_rates(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (3, 4))
        key = jax.random.PRNGKey(0)
        np.testing.assert_array_equal(
            np.asarray(SeedDropout(0.5).apply({}, x, deterministic=True)),
            np.asarray(x),
        )
        np.testing.assert_array_equal(
            np.asarray(
                SeedDropout(0.0).apply(
                    {}, x, deterministic=False, rngs={"dropout": key}
                )
            ),
            np.asarray(x),
        )
        np.testing.assert_array_equal(
            np.asarray(
                SeedDropout(1.0).apply(
                    {}, x, deterministic=False, rngs={"dropout": key}
                )
            ),
            np.zeros_like(np.asarray(x)),
        )
