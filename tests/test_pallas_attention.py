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
