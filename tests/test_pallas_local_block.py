"""Parity of the fused pre-encoder block kernel (interpret mode) vs the
XLA composition it replaces (models/mdm.py:221-249)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesturediffusion_tpu.models.mdm import pre_encoder_local_block
from gesturediffusion_tpu.ops.pallas_local_block import fused_local_block


def xla_reference(xseq, coa, num_heads, window, dtype=jnp.float32):
    """Parity reference = the production XLA implementation itself
    (models/mdm.py::pre_encoder_local_block — one source of truth)."""
    return pre_encoder_local_block(
        xseq.astype(dtype), coa.astype(dtype),
        num_heads=num_heads, window_size=window,
    )


class TestFusedLocalBlock:
    @pytest.mark.parametrize("b,t,d,h,w", [
        (3, 16, 64, 8, 5),
        (2, 80, 256, 8, 10),   # production gesture shape (small batch)
        (5, 24, 32, 4, 10),
    ])
    def test_matches_xla_composition(self, b, t, d, h, w):
        rs = np.random.RandomState(0)
        xseq = jnp.asarray(rs.randn(b, t, d), jnp.float32)
        coa = jnp.asarray(rs.randn(b, d), jnp.float32)
        want = np.asarray(xla_reference(xseq, coa, h, w))
        got = np.asarray(fused_local_block(
            xseq, coa, num_heads=h, window=w, block_b=2, interpret=True
        ))
        assert got.shape == (b, t + 1, d)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_batch_padding(self):
        """b not divisible by block_b pads and slices correctly."""
        rs = np.random.RandomState(1)
        b, t, d, h, w = 7, 16, 64, 8, 5
        xseq = jnp.asarray(rs.randn(b, t, d), jnp.float32)
        coa = jnp.asarray(rs.randn(b, d), jnp.float32)
        want = np.asarray(xla_reference(xseq, coa, h, w))
        got = np.asarray(fused_local_block(
            xseq, coa, num_heads=h, window=w, block_b=4, interpret=True
        ))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_unpadded_t_rejected(self):
        xseq = jnp.zeros((2, 17, 64))
        coa = jnp.zeros((2, 64))
        with pytest.raises(AssertionError, match="sublane"):
            fused_local_block(xseq, coa, num_heads=8, window=5,
                              interpret=True)
