"""Custom-VJP fused training encoder layer (ops/pallas_encoder_train.py).

CPU runs the kernels in interpret mode; the gradient spec is autodiff
through the pure-XLA twin ``encoder_layer_train_reference``, which uses
the IDENTICAL hash-PRNG dropout masks (global-index derivation), so
value AND gradient comparisons are exact up to f32 accumulation order.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesturediffusion_tpu.ops.pallas_encoder_train import (
    SITE_ACT,
    SITE_ATTN,
    encoder_layer_train_reference,
    hash_dropout_mask,
    make_fused_train_layer,
)

RS = np.random.RandomState(0)
D, F, NH = 16, 32, 4


def _weights(d=D, f=F, dtype=jnp.float32):
    shapes = [(d, 3 * d), (3 * d,), (d, d), (d,), (d,), (d,),
              (d, f), (f,), (f, d), (d,), (d,), (d,)]
    ws = []
    for i, s in enumerate(shapes):
        if s in ((d,), (f,)) and i in (4, 10):  # LN scales -> ~1
            ws.append(jnp.asarray(1.0 + 0.1 * RS.randn(*s), dtype))
        else:
            ws.append(jnp.asarray(0.2 * RS.randn(*s), dtype))
    return ws


class TestHashMask:
    def test_keep_rate(self):
        m = hash_dropout_mask((64, 1024), 0, 123, SITE_ATTN, 0.9)
        assert abs(float(jnp.mean(m)) - 0.9) < 0.01

    def test_sites_and_seeds_independent(self):
        a = np.asarray(hash_dropout_mask((4096,), 0, 7, SITE_ATTN, 0.5))
        b = np.asarray(hash_dropout_mask((4096,), 0, 7, SITE_ACT, 0.5))
        c = np.asarray(hash_dropout_mask((4096,), 0, 8, SITE_ATTN, 0.5))
        # agreement rate ~0.5 for independent Bernoulli(0.5)
        assert abs((a == b).mean() - 0.5) < 0.05
        assert abs((a == c).mean() - 0.5) < 0.05

    def test_deterministic(self):
        a = hash_dropout_mask((128,), 5, 42, SITE_ACT, 0.7)
        b = hash_dropout_mask((128,), 5, 42, SITE_ACT, 0.7)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestForwardParity:
    def test_rate0_matches_stock_xla_layer(self):
        """rate=0 fused train layer == the stock deterministic
        TransformerEncoderLayer (same packed weights)."""
        from gesturediffusion_tpu.models.transformer import (
            TransformerEncoderLayer,
        )

        b, t = 3, 11
        x = jnp.asarray(RS.randn(b, t, D), jnp.float32)
        ws = _weights()
        layer = make_fused_train_layer(NH, 0.0, interpret=True)
        got = layer(x, *ws, jnp.int32(0))

        mod = TransformerEncoderLayer(
            d_model=D, num_heads=NH, dim_feedforward=F, dropout=0.0
        )
        params = {"params": {
            "self_attn": {
                "in_proj": {"kernel": ws[0], "bias": ws[1]},
                "out_proj": {"kernel": ws[2], "bias": ws[3]},
            },
            "norm1": {"scale": ws[4], "bias": ws[5]},
            "linear1": {"kernel": ws[6], "bias": ws[7]},
            "linear2": {"kernel": ws[8], "bias": ws[9]},
            "norm2": {"scale": ws[10], "bias": ws[11]},
        }}
        want = mod.apply(params, x, deterministic=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )

    @pytest.mark.parametrize("rate", [0.0, 0.3])
    def test_kernel_matches_reference_twin(self, rate):
        b, t = 5, 13  # unaligned on purpose (pads to 8|16)
        x = jnp.asarray(RS.randn(b, t, D), jnp.float32)
        ws = _weights()
        layer = make_fused_train_layer(NH, rate, interpret=True)
        got = layer(x, *ws, jnp.int32(99))
        want = encoder_layer_train_reference(
            x, ws, 99, num_heads=NH, rate=rate
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )

    def test_block_size_invariance(self):
        b, t = 8, 16
        x = jnp.asarray(RS.randn(b, t, D), jnp.float32)
        ws = _weights()
        l2 = make_fused_train_layer(NH, 0.4, block_b=2, interpret=True)
        l4 = make_fused_train_layer(NH, 0.4, block_b=4, interpret=True)
        np.testing.assert_allclose(
            np.asarray(l2(x, *ws, jnp.int32(5))),
            np.asarray(l4(x, *ws, jnp.int32(5))),
            rtol=1e-6, atol=1e-6,
        )

    def test_dropout_actually_drops(self):
        b, t = 4, 16
        x = jnp.asarray(RS.randn(b, t, D), jnp.float32)
        ws = _weights()
        l0 = make_fused_train_layer(NH, 0.0, interpret=True)
        l5 = make_fused_train_layer(NH, 0.5, interpret=True)
        a = np.asarray(l0(x, *ws, jnp.int32(1)))
        bb = np.asarray(l5(x, *ws, jnp.int32(1)))
        assert np.abs(a - bb).max() > 1e-3


class TestGradParity:
    @pytest.mark.parametrize("rate", [0.0, 0.3])
    def test_grads_match_twin_autodiff(self, rate):
        b, t = 5, 13
        x = jnp.asarray(RS.randn(b, t, D), jnp.float32)
        ws = _weights()
        seed = jnp.int32(7)
        cot = jnp.asarray(RS.randn(b, t, D), jnp.float32)

        layer = make_fused_train_layer(NH, rate, interpret=True)

        def loss_kernel(x, *ws):
            return jnp.sum(layer(x, *ws, seed) * cot)

        def loss_twin(x, *ws):
            return jnp.sum(
                encoder_layer_train_reference(
                    x, ws, seed, num_heads=NH, rate=rate
                ) * cot
            )

        got = jax.grad(loss_kernel, argnums=tuple(range(13)))(x, *ws)
        want = jax.grad(loss_twin, argnums=tuple(range(13)))(x, *ws)
        names = ["x", "wqkv", "bqkv", "wo", "bo", "ln1s", "ln1b",
                 "w1", "b1", "w2", "b2", "ln2s", "ln2b"]
        for n, g, w in zip(names, got, want):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(w), rtol=5e-4, atol=5e-5,
                err_msg=f"grad mismatch: {n} (rate={rate})",
            )

    def test_grad_block_invariance(self):
        b, t = 8, 16
        x = jnp.asarray(RS.randn(b, t, D), jnp.float32)
        ws = _weights()
        seed = jnp.int32(3)

        def loss(layer, x, *ws):
            return jnp.sum(layer(x, *ws, seed) ** 2)

        l2 = make_fused_train_layer(NH, 0.2, block_b=2, interpret=True)
        l8 = make_fused_train_layer(NH, 0.2, block_b=8, interpret=True)
        g2 = jax.grad(functools.partial(loss, l2))(x, *ws)
        g8 = jax.grad(functools.partial(loss, l8))(x, *ws)
        np.testing.assert_allclose(
            np.asarray(g2), np.asarray(g8), rtol=1e-5, atol=1e-6
        )

    def test_value_and_grad_jits(self):
        b, t = 4, 8
        x = jnp.asarray(RS.randn(b, t, D), jnp.float32)
        ws = _weights()
        layer = make_fused_train_layer(NH, 0.1, interpret=True)

        @jax.jit
        def step(x, *ws):
            return jax.value_and_grad(
                lambda *a: jnp.sum(layer(*a, jnp.int32(11)) ** 2)
            )(x, *ws)

        v, g = step(x, *ws)
        assert np.isfinite(float(v))
        assert np.isfinite(np.asarray(g).sum())


class TestModelIntegration:
    """--use_fused_train_encoder: the flag swaps the encoder stack's
    training path onto the custom-VJP fused layers (param tree
    unchanged)."""

    def _model(self, **kw):
        from gesturediffusion_tpu.models.mdm import MDM

        return MDM(njoints=24, latent_dim=32, num_layers=2, ff_size=64,
                   seed_poses=4, cl_head=4, window_size=10,
                   cond_mask_prob=0.0, num_heads=4, **kw)

    def _data(self, b=3, t=12):
        rs = np.random.RandomState(5)
        x = jnp.asarray(rs.randn(b, 24, 1, t), jnp.float32)
        tt = jnp.asarray(rs.randint(0, 20, b), jnp.int32)
        cond = {
            "mfcc": jnp.asarray(rs.randn(b, 26, 1, t), jnp.float32),
            "seed": jnp.asarray(rs.randn(b, 24, 1, 4), jnp.float32),
        }
        return x, tt, cond

    def test_param_tree_identical_and_eval_forward_matches(self):
        x, tt, cond = self._data()
        m0 = self._model()
        m1 = self._model(use_fused_train_encoder=True)
        p0 = m0.init(jax.random.PRNGKey(0), x, tt, cond)
        p1 = m1.init(jax.random.PRNGKey(0), x, tt, cond)
        assert jax.tree_util.tree_structure(p0) == \
            jax.tree_util.tree_structure(p1)
        # inference path identical (flag is train-only)
        np.testing.assert_array_equal(
            np.asarray(m0.apply(p0, x, tt, cond)),
            np.asarray(m1.apply(p0, x, tt, cond)),
        )

    def test_train_grads_match_xla_path_at_dropout0(self):
        x, tt, cond = self._data()
        m0 = self._model(dropout=0.0)
        m1 = self._model(dropout=0.0, use_fused_train_encoder=True)
        params = m0.init(jax.random.PRNGKey(0), x, tt, cond)
        rngs = {"dropout": jax.random.PRNGKey(1)}

        def loss(m):
            def f(p):
                out = m.apply(p, x, tt, cond, train=True, rngs=rngs)
                return jnp.mean(out**2)
            return f

        v0, g0 = jax.value_and_grad(loss(m0))(params)
        v1, g1 = jax.value_and_grad(loss(m1))(params)
        np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5
            ),
            g0, g1,
        )

    def test_train_step_runs_with_dropout(self):
        x, tt, cond = self._data()
        m1 = self._model(dropout=0.1, use_fused_train_encoder=True)
        params = m1.init(jax.random.PRNGKey(0), x, tt, cond)
        rngs = {"dropout": jax.random.PRNGKey(2)}

        def f(p):
            out = m1.apply(p, x, tt, cond, train=True, rngs=rngs)
            return jnp.mean(out**2)

        v, g = jax.value_and_grad(f)(params)
        assert np.isfinite(float(v))
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(leaf)).all() for leaf in leaves)
        # some gradient must be nonzero through the fused layers
        assert any(float(jnp.abs(leaf).max()) > 0 for leaf in leaves)
