"""Interpret-mode parity for the blocked flash self-attention kernel
(ops/pallas_flash.py) against the plain XLA softmax-attention formula.
On-chip compiled parity runs in tpu_parity_check.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesturediffusion_tpu.ops.pallas_flash import fused_self_attention


def xla_attention(q, k, v):
    d = q.shape[-1]
    s = jnp.einsum("bhid,bhjd->bhij", q, k,
                   preferred_element_type=jnp.float32) * (d**-0.5)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", p.astype(v.dtype), v)


@pytest.mark.parametrize("t,d", [(24, 32), (81, 64), (200, 128)])
def test_single_block_parity(t, d):
    rs = np.random.RandomState(0)
    q, k, v = (jnp.asarray(rs.randn(2, 3, t, d), jnp.float32)
               for _ in range(3))
    got = fused_self_attention(q, k, v, interpret=True)
    want = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("t", [300, 513])
def test_multi_block_online_softmax_parity(t):
    """T spanning several k blocks exercises the running-max/normalizer
    rescale path (the whole point of the flash formulation)."""
    rs = np.random.RandomState(1)
    q, k, v = (jnp.asarray(rs.randn(1, 2, t, 64), jnp.float32)
               for _ in range(3))
    got = fused_self_attention(q, k, v, block_q=128, block_k=128,
                               interpret=True)
    want = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_padding_mask_excludes_fake_keys():
    """Padded key positions must not receive probability mass: compare
    T=130 (pads to 256 with block 128) against the exact answer."""
    rs = np.random.RandomState(2)
    t = 130
    q, k, v = (jnp.asarray(rs.randn(1, 1, t, 32), jnp.float32)
               for _ in range(3))
    got = fused_self_attention(q, k, v, block_q=128, block_k=128,
                               interpret=True)
    want = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_bf16_inputs():
    rs = np.random.RandomState(3)
    q, k, v = (jnp.asarray(rs.randn(1, 2, 90, 64), jnp.bfloat16)
               for _ in range(3))
    got = fused_self_attention(q, k, v, interpret=True)
    want = xla_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                         v.astype(jnp.float32))
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=3e-2
    )
