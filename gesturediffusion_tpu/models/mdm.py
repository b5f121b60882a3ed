"""MDM V2 gesture denoiser ("CrossAtt+RPM") in Flax.

Functional parity surface with the reference denoiser
(reference: model/mdm.py:10-224): audio (MFCC) + seed-pose + optional CLIP
text conditioning, causal windowed LocalAttention with rotary embeddings
over 8 attention heads, then an 8-layer post-LN transformer encoder with a
prepended conditioning token.

JAX/TPU design differences from the reference (semantics preserved):
  * Batch-major [B, T, D] instead of seq-major.
  * Text enters as a precomputed CLIP sentence embedding (`cond['text_emb']`)
    — string tokenization/CLIP run host-side once per batch, outside jit
    (see models/clip_text.py), exactly mirroring the frozen-CLIP contract.
  * `uncond` is a per-sample float mask (enables batched classifier-free
    guidance: cond/uncond stacked on the batch axis, one forward pass).
  * Conditioning dropout (`cond_mask_prob`) draws from the 'cond_mask' RNG
    collection when train=True.

Shape flow (reference: model/mdm.py:105-224 and SURVEY.md §3.6):
[B,J,1,T] -(InputProcess)-> [B,T,D] -(cat audio)-> [B,T,D+A]
-(cat tiled seed+text+t token)-> [B,T,2D+A] -(Dense)-> [B,T,D]
-> 8 local-attn heads + RoPE -> causal LocalAttention(window 10)
-> prepend cond token -> RoPE -> TransformerEncoder x8 -> drop token
-(OutputProcess)-> [B,J,1,T].
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from gesturediffusion_tpu.models import embeddings
from gesturediffusion_tpu.models.embeddings import (
    TimestepEmbedder,
    apply_rotary_pos_emb,
    rotary_freqs,
)
from gesturediffusion_tpu.models.transformer import TransformerEncoder
from gesturediffusion_tpu.ops.pallas_attention import local_attention_auto


def pre_encoder_local_block(
    xseq: jax.Array,
    coa: jax.Array,
    *,
    num_heads: int,
    window_size: int,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """The MDM-V2 pre-encoder block, XLA formulation: head split -> rope
    -> causal windowed local attention -> merge -> prepend cond token ->
    rope -> merge (reference: model/mdm.py:175-214).

    THE single source of truth for these semantics — used by
    `MDM.__call__`, the sampling fast path's fallback
    (models/mdm_fastpath.py), and as the parity reference for the fused
    kernel (ops/pallas_local_block.py, tests + tpu_parity_check).

    xseq: [B, T, D]; coa: [B, D] -> [B, T+1, D].
    """
    bs, nt, d = xseq.shape
    dh = d // num_heads
    heads = xseq.reshape(bs, nt, num_heads, dh).transpose(0, 2, 1, 3)
    freqs = rotary_freqs(nt, dh, xseq.dtype)
    heads, _ = apply_rotary_pos_emb(heads, heads, freqs)
    heads = local_attention_auto(
        heads, heads, heads,
        window_size=window_size, causal=True,
        look_backward=1, look_forward=0,
        dropout_rate=dropout_rate, dropout_rng=dropout_rng,
    ).astype(xseq.dtype)
    xseq = heads.transpose(0, 2, 1, 3).reshape(bs, nt, d)

    xseq = jnp.concatenate([coa[:, None, :], xseq], axis=1)
    heads = xseq.reshape(bs, nt + 1, num_heads, dh).transpose(0, 2, 1, 3)
    freqs2 = rotary_freqs(nt + 1, dh, xseq.dtype)
    heads, _ = apply_rotary_pos_emb(heads, heads, freqs2)
    return heads.transpose(0, 2, 1, 3).reshape(bs, nt + 1, d)


class SeedPoseEncoder(nn.Module):
    """Flattened seed poses -> latent (reference: model/mdm.py:382-392)."""

    latent_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, flat_seed: jax.Array) -> jax.Array:
        return nn.Dense(self.latent_dim, dtype=self.dtype,
                        name="seed_embed")(flat_seed)


class WavEncoder(nn.Module):
    """Raw-audio conv stack (reference: model/mdm.py:312-338, Trimodal).

    Input [B, L] -> [B, 32, T'] frame features.
    """

    @nn.compact
    def __call__(self, wav: jax.Array, *, train: bool = False) -> jax.Array:
        x = wav[..., None]  # [B, L, 1]
        specs = [
            # (features, dilation, padding)
            (16, 1, 1600),
            (32, 4, 0),
            (64, 7, 0),
            (32, 13, 0),
        ]
        for i, (feat, dil, pad) in enumerate(specs):
            x = nn.Conv(
                feat,
                kernel_size=(15,),
                strides=(5,),
                kernel_dilation=(dil,),
                padding=[(pad, pad)],
                name=f"conv_{i}",
            )(x)
            if i < len(specs) - 1:
                x = nn.BatchNorm(
                    use_running_average=not train, name=f"bn_{i}"
                )(x)
                x = nn.leaky_relu(x, negative_slope=0.3)
        return x.transpose(0, 2, 1)  # [B, C, T']


class MDM(nn.Module):
    """MDM V2 gesture denoiser."""

    njoints: int = 498
    nfeats: int = 1
    latent_dim: int = 256
    text_dim: int = 64
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 4
    dropout: float = 0.1
    activation: str = "gelu"
    clip_dim: int = 512
    use_text: bool = False
    cond_mask_prob: float = 0.0
    seed_poses: int = 10
    mfcc_input: bool = True
    use_wav_enc: bool = False
    mfcc_dim: int = 26
    cl_head: int = 8
    window_size: int = 10
    data_rep: str = "genea_vec"
    # inference-only: run each encoder layer as one fused Pallas kernel
    # (param tree unchanged; see models/transformer.py)
    use_fused_encoder: bool = False
    # training-path: custom-VJP fused encoder layers (fused fwd + fused
    # bwd Pallas kernels; only the layer input saved for backward — see
    # models/transformer.py FusedTrainEncoderLayer).  Param tree
    # unchanged, so the flag can differ between train and serve.
    use_fused_train_encoder: bool = False
    # training-only: rematerialize encoder layers in the backward pass
    # (see models/transformer.py TransformerEncoder.remat)
    remat: bool = False
    dtype: Any = jnp.float32

    @property
    def audio_feat_dim(self) -> int:
        # mfcc takes precedence, matching __call__ (line ~233): with both
        # flags set the MFCC branch runs, so the projection width (and the
        # fast path's w_proj split in mdm_fastpath.py) must follow it
        return self.mfcc_dim if self.mfcc_input else (
            32 if self.use_wav_enc else self.mfcc_dim
        )

    def _mask_cond(self, cond2d, uncond, train, rng=None):
        """Zero conditioning per-sample: forced (uncond) and/or random CFG
        dropout during training (reference: model/mdm.py:242-250)."""
        return embeddings.mask_cond(
            cond2d, uncond, self.cond_mask_prob, train, rng
        )

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        timesteps: jax.Array,
        cond: dict,
        *,
        train: bool = False,
    ) -> jax.Array:
        # NOTE: models/mdm_fastpath.py re-derives this forward for
        # inference (composed input projections, hoisted conditioning).
        # Any change to the math below MUST be mirrored there;
        # tests/test_fastpath.py::TestFastpathContract enumerates the
        # config axes and fails on silent divergence.
        bs, njoints, nfeats, nframes = x.shape
        # computation dtype: params stay f32, activations in self.dtype
        # (bf16 halves the HBM traffic of the non-matmul ops on TPU)
        x = x.astype(self.dtype)
        if self.use_text and self.text_dim >= self.latent_dim:
            raise ValueError(
                "text_dim must be < latent_dim (seed encoder gets the rest)"
            )
        uncond = cond.get("uncond")
        if uncond is None:
            uncond = jnp.zeros((bs,), x.dtype)
        mask_rng = (
            self.make_rng("cond_mask")
            if train and self.cond_mask_prob > 0.0
            else None
        )

        # ---- feature calculation -------------------------------------- #
        # independent dropout masks per conditioning stream (the reference
        # draws a fresh bernoulli per mask_cond call, mdm.py:242-250)
        text_rng = (
            jax.random.fold_in(mask_rng, 0) if mask_rng is not None else None
        )
        seed_rng = (
            jax.random.fold_in(mask_rng, 1) if mask_rng is not None else None
        )
        if self.use_text:
            enc_text = cond["text_emb"].astype(x.dtype)  # [B, clip_dim]
            emb_text = nn.Dense(self.text_dim, dtype=self.dtype,
                                name="embed_text")(
                self._mask_cond(enc_text, uncond, train, text_rng)
            )

        seed = cond["seed"]  # [B, J, F, S]
        flat_seed = seed.reshape(bs, -1)  # all features (F=1 in production)
        seed_latent = (
            self.latent_dim - self.text_dim if self.use_text else self.latent_dim
        )
        emb_seed = SeedPoseEncoder(seed_latent, dtype=self.dtype,
                                   name="seed_pose_encoder")(
            self._mask_cond(flat_seed, uncond, train, seed_rng)
        )

        emb_t = TimestepEmbedder(self.latent_dim, name="embed_timestep")(
            timesteps
        ).astype(x.dtype)  # [B, D]

        if self.mfcc_input:
            emb_audio = cond["mfcc"][:, :, 0, :]  # [B, A, T]
        elif self.use_wav_enc:
            emb_audio = WavEncoder(name="wav_encoder")(cond["audio"], train=train)
            # align conv frame count to the motion frame count
            tw = emb_audio.shape[-1]
            if tw >= nframes:
                emb_audio = emb_audio[..., :nframes]
            else:
                emb_audio = jnp.pad(
                    emb_audio, ((0, 0), (0, 0), (0, nframes - tw))
                )
        else:
            raise NotImplementedError("audio conditioning required")
        emb_audio = emb_audio.transpose(0, 2, 1).astype(x.dtype)  # [B, T, A]

        # pose: [B, J, F, T] -> [B, T, J*F] (all features, not just idx 0)
        pose = x.reshape(bs, njoints * nfeats, nframes).transpose(0, 2, 1)
        emb_pose = nn.Dense(self.latent_dim, dtype=self.dtype,
                            name="input_process")(pose)

        # ---- feature aggregation -------------------------------------- #
        fg = jnp.concatenate([emb_pose, emb_audio], axis=-1)  # [B, T, D+A]
        if self.use_text:
            stxt = jnp.concatenate([emb_text, emb_seed], axis=-1)  # [B, D]
        else:
            stxt = emb_seed
        coa = stxt + emb_t  # [B, D] conditioning token
        coa_rep = jnp.broadcast_to(coa[:, None, :], (bs, nframes, self.latent_dim))
        embs = jnp.concatenate([fg, coa_rep], axis=-1)  # [B, T, 2D+A]
        xseq = nn.Dense(self.latent_dim, dtype=self.dtype,
                        name="project_to_lat")(embs)  # [B, T, D]

        # ---- cross-local attention + cond token + rope (shared impl) -- #
        drop_rng = (
            self.make_rng("dropout") if train and self.dropout > 0 else None
        )
        xseq = pre_encoder_local_block(
            xseq, coa,
            num_heads=self.cl_head, window_size=self.window_size,
            dropout_rate=self.dropout if train else 0.0,
            dropout_rng=drop_rng,
        )

        # ---- global self-attention ------------------------------------ #
        out = TransformerEncoder(
            num_layers=self.num_layers,
            d_model=self.latent_dim,
            num_heads=self.num_heads,
            dim_feedforward=self.ff_size,
            dropout=self.dropout,
            activation=self.activation,
            use_fused_layer=self.use_fused_encoder and not train,
            use_fused_train_layer=self.use_fused_train_encoder and train,
            remat=self.remat,
            dtype=self.dtype,
            name="seqTransEncoder",
        )(xseq, deterministic=not train)

        out = out[:, 1:]  # drop conditioning token
        out = nn.Dense(self.njoints * self.nfeats, dtype=self.dtype,
                       name="output_process")(out)
        # [B, T, J*F] -> [B, J, F, T]
        out = out.reshape(bs, nframes, self.njoints, self.nfeats)
        return out.transpose(0, 2, 3, 1).astype(jnp.float32)
