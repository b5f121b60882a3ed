"""Pallas banded-attention kernel vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesturediffusion_tpu.ops.local_attention import local_attention
from gesturediffusion_tpu.ops.pallas_attention import local_attention_pallas


def _qkv(b, h, t, d, seed=0):
    qkv = jax.random.normal(jax.random.PRNGKey(seed), (3, b, h, t, d))
    return qkv[0], qkv[1], qkv[2]


class TestPallasBandKernel:
    @pytest.mark.parametrize(
        "b,h,t,d,w,bq",
        [
            (2, 4, 80, 32, 10, 80),   # production gesture shape, one chunk
            (1, 2, 80, 32, 10, 40),   # two chunks (cross-chunk band)
            (1, 2, 160, 16, 10, 40),  # four chunks
            (1, 1, 60, 8, 10, 20),    # ragged-ish small
        ],
    )
    def test_matches_xla_reference(self, b, h, t, d, w, bq):
        q, k, v = _qkv(b, h, t, d)
        ours = local_attention_pallas(
            q, k, v, window_size=w, block_q=bq, interpret=True
        )
        ref = local_attention(q, k, v, window_size=w)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), atol=2e-5
        )

    def test_rejects_bad_window(self):
        q, k, v = _qkv(1, 1, 37, 8)
        with pytest.raises(ValueError):
            local_attention_pallas(q, k, v, window_size=10, interpret=True)

    def test_jit_composes(self):
        q, k, v = _qkv(1, 2, 40, 16)

        @jax.jit
        def f(q, k, v):
            return local_attention_pallas(
                q, k, v, window_size=10, interpret=True
            )

        out = f(q, k, v)
        assert bool(jnp.all(jnp.isfinite(out)))


class TestDenseBandFormulation:
    """local_attention_dense == windowed local_attention across configs."""

    import itertools

    CONFIGS = [
        # (b, h, t, d, ws, causal, lb, lf, exact, use_mask)
        (2, 4, 80, 32, 10, True, 1, 0, False, False),  # production gesture
        (2, 4, 80, 32, 10, True, 1, 0, True, False),
        (1, 2, 64, 16, 8, True, 2, 0, False, True),
        (2, 2, 60, 16, 10, False, 1, 1, False, False),
        (2, 2, 60, 16, 10, False, 1, 1, True, True),
        (1, 1, 40, 8, 20, True, 1, 0, False, False),
    ]

    @pytest.mark.parametrize("cfg", CONFIGS)
    def test_matches_windowed(self, cfg):
        from gesturediffusion_tpu.ops.local_attention import (
            local_attention,
            local_attention_dense,
        )

        b, h, t, d, ws, causal, lb, lf, exact, use_mask = cfg
        rs = np.random.RandomState(0)
        q = jnp.asarray(rs.randn(b, h, t, d), jnp.float32)
        k = jnp.asarray(rs.randn(b, h, t, d), jnp.float32)
        v = jnp.asarray(rs.randn(b, h, t, d), jnp.float32)
        # contiguous length masks (the production mask shape); queries with
        # an empty softmax domain (fully masked band) are undefined by
        # contract in BOTH formulations, so compare valid rows only
        if use_mask:
            lengths = rs.randint(t // 2, t, size=(b,))
            mask = jnp.asarray(np.arange(t)[None] < lengths[:, None])
        else:
            lengths = np.full((b,), t)
            mask = None
        kw = dict(window_size=ws, causal=causal, look_backward=lb,
                  look_forward=lf, mask=mask, exact_windowsize=exact)
        a = np.asarray(local_attention(q, k, v, **kw))
        bd = np.asarray(local_attention_dense(q, k, v, **kw))
        valid = np.arange(t)[None, None, :, None] < lengths[:, None, None,
                                                            None]
        np.testing.assert_allclose(
            np.where(valid, a, 0.0), np.where(valid, bd, 0.0), atol=2e-5
        )

    def test_auto_dispatch_uses_dense_at_short_t(self):
        """local_attention_auto at T<=256 must produce the dense result
        (same numerics as windowed — verified above — so just shape/flow)."""
        from gesturediffusion_tpu.ops.pallas_attention import (
            LOCAL_ATTN_DENSE_MAX_T,
            local_attention_auto,
        )

        assert LOCAL_ATTN_DENSE_MAX_T >= 80  # production gesture length
        rs = np.random.RandomState(1)
        q = jnp.asarray(rs.randn(2, 4, 80, 32), jnp.float32)
        out = local_attention_auto(
            q, q, q, window_size=10, causal=True, look_backward=1,
            look_forward=0,
        )
        from gesturediffusion_tpu.ops.local_attention import (
            local_attention_dense,
        )

        np.testing.assert_allclose(
            np.asarray(out),
            np.asarray(local_attention_dense(
                q, q, q, window_size=10, causal=True, look_backward=1,
                look_forward=0,
            )),
            atol=1e-6,
        )
