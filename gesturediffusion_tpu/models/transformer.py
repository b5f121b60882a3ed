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

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from gesturediffusion_tpu.ops.seed_dropout import SeedDropout


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
    dtype: Any = None  # computation dtype (params stay f32); None = f32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """``mask`` is broadcastable to [B, H, T, T] with **True = may
        attend** (JAX/flax convention) — the INVERSE of torch's
        src_mask/key_padding_mask, where True means masked.  Negate any
        mask ported from reference torch code."""
        b, t, d = x.shape
        assert d % self.num_heads == 0
        dh = d // self.num_heads

        qkv = nn.Dense(3 * d, dtype=self.dtype, name="in_proj")(x)  # [B, T, 3D]
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
            attn = SeedDropout(self.dropout)(attn, deterministic=deterministic)
            out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class TransformerEncoderLayer(nn.Module):
    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    activation: str = "gelu"
    use_fused_kernel: bool = False
    dtype: Any = None

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
            use_fused_kernel=self.use_fused_kernel, dtype=self.dtype,
            name="self_attn",
        )(x, mask=mask, deterministic=deterministic)
        x = x + SeedDropout(self.dropout)(attn_out, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)

        h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
        h = act(h)
        h = SeedDropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)
        x = x + SeedDropout(self.dropout)(h, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        return x


class _DenseParams(nn.Module):
    """Param container matching nn.Dense's tree ({kernel, bias})."""

    din: int
    dout: int

    @nn.compact
    def __call__(self):
        return (
            self.param("kernel", nn.initializers.lecun_normal(),
                       (self.din, self.dout)),
            self.param("bias", nn.initializers.zeros, (self.dout,)),
        )


class _LayerNormParams(nn.Module):
    """Param container matching nn.LayerNorm's tree ({scale, bias})."""

    d: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.d,)),
            self.param("bias", nn.initializers.zeros, (self.d,)),
        )


class _AttnParams(nn.Module):
    """Param container matching MultiheadSelfAttention's tree."""

    d: int

    @nn.compact
    def __call__(self):
        wqkv, bqkv = _DenseParams(self.d, 3 * self.d, name="in_proj")()
        wo, bo = _DenseParams(self.d, self.d, name="out_proj")()
        return wqkv, bqkv, wo, bo


class FusedTransformerEncoderLayer(nn.Module):
    """Inference-path encoder layer running the fused Pallas kernel
    (ops/pallas_encoder.py): one kernel per layer, activations resident in
    VMEM.  The param tree is IDENTICAL to TransformerEncoderLayer, so
    checkpoints trained with the XLA path load directly.  Deterministic
    (no dropout), gelu, no mask — the sampling/eval configuration.
    Measured ~28% faster per layer than the XLA path at the t2m shape
    ([64, 197, 512]) on v5e; ties XLA at the small gesture shape."""

    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1        # accepted for ctor parity; must be unused
    activation: str = "gelu"
    block_b: Optional[int] = None  # None = auto (largest VMEM-fitting block)
    # padded-I/O stacking (input pre-padded by TransformerEncoder; output
    # stays padded — see ops/pallas_encoder.py fused_encoder_layer t_real)
    t_real: Optional[int] = None
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        if mask is not None or not deterministic:
            raise NotImplementedError(
                "FusedTransformerEncoderLayer is the inference path: "
                "no mask, no dropout (use TransformerEncoderLayer)."
            )
        if self.activation != "gelu":
            raise NotImplementedError("fused layer supports gelu only")
        from gesturediffusion_tpu.ops.pallas_encoder import (
            fused_encoder_layer,
        )

        wqkv, bqkv, wo, bo = _AttnParams(self.d_model, name="self_attn")()
        s1, bn1 = _LayerNormParams(self.d_model, name="norm1")()
        w1, b1 = _DenseParams(
            self.d_model, self.dim_feedforward, name="linear1"
        )()
        w2, b2 = _DenseParams(
            self.dim_feedforward, self.d_model, name="linear2"
        )()
        s2, bn2 = _LayerNormParams(self.d_model, name="norm2")()
        if self.dtype is not None:
            cast = lambda a: a.astype(self.dtype)  # noqa: E731
            x = cast(x)
            wqkv, bqkv, wo, bo = map(cast, (wqkv, bqkv, wo, bo))
            w1, b1, w2, b2 = map(cast, (w1, b1, w2, b2))
        return fused_encoder_layer(
            x, wqkv, bqkv, wo, bo, s1, bn1, w1, b1, w2, b2, s2, bn2,
            num_heads=self.num_heads, block_b=self.block_b,
            t_real=self.t_real,
            # CPU (tests) runs the kernel in interpret mode
            interpret=jax.default_backend() != "tpu",
        )


class FusedTrainEncoderLayer(nn.Module):
    """TRAINING-path encoder layer: one fused Pallas kernel forward, one
    fused Pallas kernel backward via jax.custom_vjp — the only saved
    residual is the layer input (ops/pallas_encoder_train.py).  Dropout
    runs INSIDE the kernels from a hash-PRNG (masks never hit HBM), so
    the per-layer saved-activation and dropout-mask copy families the
    XLA grad program emits (PROFILE.md round-4/5 pinpoint) disappear.

    Param tree is IDENTICAL to TransformerEncoderLayer — checkpoints are
    interchangeable across the XLA / fused-inference / fused-train
    paths.  gelu only, no mask (the production encoder call).
    """

    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    activation: str = "gelu"
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        if mask is not None:
            raise NotImplementedError(
                "FusedTrainEncoderLayer supports the unmasked encoder "
                "call only (use TransformerEncoderLayer)."
            )
        if self.activation != "gelu":
            raise NotImplementedError("fused train layer supports gelu only")
        from gesturediffusion_tpu.ops.pallas_encoder_train import (
            make_fused_train_layer,
        )

        wqkv, bqkv, wo, bo = _AttnParams(self.d_model, name="self_attn")()
        s1, bn1 = _LayerNormParams(self.d_model, name="norm1")()
        w1, b1 = _DenseParams(
            self.d_model, self.dim_feedforward, name="linear1"
        )()
        w2, b2 = _DenseParams(
            self.dim_feedforward, self.d_model, name="linear2"
        )()
        s2, bn2 = _LayerNormParams(self.d_model, name="norm2")()
        ws = [wqkv, bqkv, wo, bo, s1, bn1, w1, b1, w2, b2, s2, bn2]
        if self.dtype is not None:
            x = x.astype(self.dtype)
            ws = [w.astype(self.dtype) for w in ws]
        rate = 0.0 if deterministic else float(self.dropout)
        if rate > 0.0:
            key = self.make_rng("dropout")
            seed = jax.random.randint(
                key, (), 0, jnp.iinfo(jnp.int32).max, jnp.int32
            )
        else:
            seed = jnp.int32(0)
        layer = make_fused_train_layer(
            self.num_heads, rate,
            interpret=jax.default_backend() != "tpu",
        )
        return layer(x, *ws, seed)


class TransformerEncoder(nn.Module):
    num_layers: int
    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    activation: str = "gelu"
    use_fused_kernel: bool = False
    # run each layer as one fused Pallas kernel (inference only; param
    # tree unchanged, so the flag can differ between train and serve)
    use_fused_layer: bool = False
    # run each layer as one fused fwd + one fused bwd Pallas kernel with
    # custom VJP (training path; only the layer input is saved for
    # backward — see FusedTrainEncoderLayer).  Param tree unchanged.
    use_fused_train_layer: bool = False
    # rematerialize each layer in the backward pass (jax.checkpoint).
    # Training-only effect (no-op when deterministic); gradients are
    # exactly equal to the stored-activation path (lifted RNGs replay
    # the same dropout masks — tests/test_models.py remat test).  This
    # is a MEMORY knob (activation residency drops from all layers to
    # one), not a speed knob: at the gesture production config on v5e it
    # measured 18.7 vs 14.6 ms/step (-22%) — the checkpoint barriers
    # break XLA's fusions and double the RNG work, and the ~1.5 GB/step
    # of saved-activation copies it was aimed at did NOT go away with a
    # dots-saveable policy either (see bench.py notes).  Use it to fit
    # configs whose activations exceed HBM; keep it off otherwise.
    remat: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        if self.use_fused_train_layer and mask is None:
            layer_cls = FusedTrainEncoderLayer
            kw = {}
        elif self.use_fused_layer:
            layer_cls = FusedTransformerEncoderLayer
            kw = {}
        else:
            layer_cls = TransformerEncoderLayer
            kw = {"use_fused_kernel": self.use_fused_kernel}
        # Fused stacking: pad to the tile/block layout ONCE around the
        # whole layer loop instead of per layer (the per-layer pad+slice
        # round-trips measured ~2% of gesture sampling step time).  The
        # layers then run padded-I/O with the real length masked inside
        # the kernel; real-row outputs are bitwise identical.
        #
        # Side effect (measured on v5e): with no relayout op between the
        # back-to-back pallas calls, XLA forwards the inter-layer
        # activation through scoped VMEM — free bandwidth when it fits,
        # but a compile-time scoped-VMEM OOM when it does not (the
        # default scoped limit is 16 MB and XLA's accounting runs a bit
        # above the raw tensor size).  Gate the path on the padded
        # activation size; larger shapes keep the per-layer pad/slice,
        # which forces the activation through HBM exactly as before.
        pad_once = (layer_cls is FusedTransformerEncoderLayer
                    and mask is None and deterministic)
        b = t = 0
        if pad_once:
            from gesturediffusion_tpu.ops.pallas_encoder import (
                _auto_block_b,
            )

            b, t, d = x.shape
            tp = t + (-t % 8)
            bb = _auto_block_b(b, tp, self.dim_feedforward)
            bp = b + (-b % bb)
            itemsize = jnp.dtype(self.dtype or x.dtype).itemsize
            if bp * tp * d * itemsize <= 15 << 20:
                x = jnp.pad(x, ((0, bp - b), (0, tp - t), (0, 0)))
                kw = {"block_b": bb, "t_real": t}
            else:
                pad_once = False
        use_remat = (
            self.remat and not deterministic
            and layer_cls is TransformerEncoderLayer
        )
        if use_remat:
            # function-form lifted remat: `deterministic` stays a Python
            # constant (a traced bool would break flax Dropout's `if`),
            # while x/mask are checkpointed inputs and the dropout RNGs
            # are lifted so the backward replay draws identical masks
            def run_layer(mod, h, m):
                return mod(h, mask=m, deterministic=False)

            # prevent_cse=True is required for the memory effect: with
            # False, XLA's CSE merges the replay back into the forward
            # and the compiled program is bit-identical to no-remat
            # (measured — same op counts, same 14.6 ms/step)
            run_layer = nn.remat(run_layer)
        for i in range(self.num_layers):
            layer = layer_cls(
                d_model=self.d_model,
                num_heads=self.num_heads,
                dim_feedforward=self.dim_feedforward,
                dropout=self.dropout,
                activation=self.activation,
                dtype=self.dtype,
                name=f"layer_{i}",
                **kw,
            )
            if use_remat:
                x = run_layer(layer, x, mask)
            else:
                x = layer(x, mask=mask, deterministic=deterministic)
        if pad_once:
            x = x[:b, :t]
        return x
