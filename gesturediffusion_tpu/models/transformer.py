"""Transformer encoder with torch `nn.TransformerEncoderLayer` semantics.

The reference backbone is an 8-layer post-LN encoder (d_model=latent,
4 heads, ff 1024, gelu, dropout 0.1; reference: model/mdm.py:90-96).
Post-LN ordering (torch norm_first=False):

    x = norm1(x + dropout(selfattn(x)))
    x = norm2(x + dropout(ff(x)))

Batch-major [B, T, D] (the reference is seq-major; semantics identical).
Attention uses a fused qkv projection sized for the MXU; softmax in f32.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class MultiheadSelfAttention(nn.Module):
    """Packed-QKV multihead self-attention (torch MultiheadAttention layout).

    `use_fused_kernel` opts into the Pallas attention kernel
    (ops/pallas_flash.py).  Off by default: at the production shapes
    (T<=200, d_head 128) XLA's own fusion measured faster on v5e; the
    kernel exists for long-sequence configs where the [B,H,T,T] score
    tensor dominates HBM traffic.
    """

    num_heads: int
    dropout: float = 0.0
    use_fused_kernel: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        b, t, d = x.shape
        assert d % self.num_heads == 0
        dh = d // self.num_heads

        qkv = nn.Dense(3 * d, name="in_proj")(x)  # [B, T, 3D]
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(y):
            return y.reshape(b, t, self.num_heads, dh).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)

        use_fused = (
            self.use_fused_kernel
            and jax.default_backend() == "tpu"
            and mask is None
            and (deterministic or self.dropout == 0.0)
        )
        if use_fused:
            from gesturediffusion_tpu.ops.pallas_flash import (
                fused_self_attention,
            )

            out = fused_self_attention(q, k, v)
        else:
            sim = jnp.einsum(
                "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
            ) * (dh**-0.5)
            if mask is not None:
                sim = jnp.where(mask, sim, -jnp.finfo(jnp.float32).max)
            attn = jax.nn.softmax(sim, axis=-1).astype(x.dtype)
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
            out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
        return nn.Dense(d, name="out_proj")(out)


class TransformerEncoderLayer(nn.Module):
    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    activation: str = "gelu"
    use_fused_kernel: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        act = {"gelu": nn.gelu, "relu": nn.relu}[self.activation]
        attn_out = MultiheadSelfAttention(
            self.num_heads, dropout=self.dropout,
            use_fused_kernel=self.use_fused_kernel, name="self_attn",
        )(x, mask=mask, deterministic=deterministic)
        x = x + nn.Dropout(self.dropout)(attn_out, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)

        h = nn.Dense(self.dim_feedforward, name="linear1")(x)
        h = act(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, name="linear2")(h)
        x = x + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        return x


class TransformerEncoder(nn.Module):
    num_layers: int
    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    activation: str = "gelu"
    use_fused_kernel: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                d_model=self.d_model,
                num_heads=self.num_heads,
                dim_feedforward=self.dim_feedforward,
                dropout=self.dropout,
                activation=self.activation,
                use_fused_kernel=self.use_fused_kernel,
                name=f"layer_{i}",
            )(x, mask=mask, deterministic=deterministic)
        return x
