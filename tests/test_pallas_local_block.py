"""Parity of the fused pre-encoder block kernel (interpret mode) vs the
XLA composition it replaces (models/mdm.py:221-249)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesturediffusion_tpu.models.embeddings import (
    apply_rotary_pos_emb,
    rotary_freqs,
)
from gesturediffusion_tpu.ops.local_attention import local_attention_dense
from gesturediffusion_tpu.ops.pallas_local_block import fused_local_block


def xla_reference(xseq, coa, num_heads, window, dtype=jnp.float32):
    b, t, d = xseq.shape
    dh = d // num_heads
    heads = xseq.reshape(b, t, num_heads, dh).transpose(0, 2, 1, 3)
    freqs = rotary_freqs(t, dh, dtype)
    heads, _ = apply_rotary_pos_emb(heads, heads, freqs)
    heads = local_attention_dense(
        heads, heads, heads, window_size=window, causal=True,
        look_backward=1, look_forward=0,
    ).astype(dtype)
    x = heads.transpose(0, 2, 1, 3).reshape(b, t, d)
    x = jnp.concatenate([coa[:, None, :], x], axis=1)
    heads = x.reshape(b, t + 1, num_heads, dh).transpose(0, 2, 1, 3)
    freqs2 = rotary_freqs(t + 1, dh, dtype)
    heads, _ = apply_rotary_pos_emb(heads, heads, freqs2)
    return heads.transpose(0, 2, 1, 3).reshape(b, t + 1, d)


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
