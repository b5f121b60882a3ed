"""Upstream-style MDM denoiser for text-to-motion / action-to-motion /
unconstrained configs, in Flax.

The fork keeps the upstream MDM codepaths for the HumanML3D/KIT and
HumanAct12/UESTC configs (SURVEY.md §0 table; released `humanml-encoder-512`
checkpoints use this architecture: token-0 conditioning = timestep + CLIP
text / action embedding, additive sinusoidal PE, trans_enc backbone —
reference lineage: model/mdm_old.py structure minus audio, plus
text/action conditioning per the original MDM).

cond contract:
  * 'text_emb': [B, clip_dim] CLIP sentence embedding (cond_mode='text')
  * 'action': [B] int action ids (cond_mode='action')
  * 'uncond': [B] float CFG mask
  * cond_mode='no_cond': token 0 is the timestep embedding alone
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from gesturediffusion_tpu.models import embeddings
from gesturediffusion_tpu.models.embeddings import (
    PositionalEncoding,
    TimestepEmbedder,
)
from gesturediffusion_tpu.models.transformer import TransformerEncoder


class MotionMDM(nn.Module):
    """Original-MDM denoiser: [B, J, F, T] -> [B, J, F, T]."""

    njoints: int = 263
    nfeats: int = 1
    latent_dim: int = 512
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 4
    dropout: float = 0.1
    activation: str = "gelu"
    clip_dim: int = 512
    cond_mode: str = "text"  # 'text' | 'action' | 'no_cond'
    cond_mask_prob: float = 0.1
    num_actions: int = 12
    data_rep: str = "hml_vec"
    # inference-only: run each encoder layer as one fused Pallas kernel
    use_fused_encoder: bool = False
    # training-path custom-VJP fused encoder (models/transformer.py)
    use_fused_train_encoder: bool = False
    # training-only: rematerialize encoder layers in the backward pass
    # (memory knob — see models/transformer.py TransformerEncoder.remat)
    remat: bool = False
    dtype: Any = jnp.float32

    def _mask_cond(self, cond2d, uncond, train, rng=None):
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
        bs, njoints, nfeats, nframes = x.shape
        # computation dtype: params stay f32, activations in self.dtype
        x = x.astype(self.dtype)
        uncond = cond.get("uncond")
        if uncond is None:
            uncond = jnp.zeros((bs,), x.dtype)
        mask_rng = (
            self.make_rng("cond_mask")
            if train and self.cond_mask_prob > 0.0
            else None
        )

        emb = TimestepEmbedder(self.latent_dim, name="embed_timestep")(
            timesteps
        ).astype(x.dtype)

        if self.cond_mode == "text":
            enc_text = cond["text_emb"].astype(x.dtype)
            emb = emb + nn.Dense(self.latent_dim, dtype=self.dtype,
                             name="embed_text")(
                self._mask_cond(enc_text, uncond, train, mask_rng)
            )
        elif self.cond_mode == "action":
            # mask AFTER the embedding, like the reference's EmbedAction
            # lookup (model/mdm.py:526-530 masks action_emb) — masking the
            # one-hot before a biased Dense would leak the bias into the
            # 'unconditional' CFG branch (and diverge from the torch
            # export, which folds the bias into the embedding rows)
            onehot = jax.nn.one_hot(cond["action"], self.num_actions, dtype=x.dtype)
            act_emb = nn.Dense(self.latent_dim, dtype=self.dtype,
                               name="embed_action")(onehot)
            emb = emb + self._mask_cond(act_emb, uncond, train, mask_rng)
        elif self.cond_mode != "no_cond":
            raise ValueError(f"unknown cond_mode {self.cond_mode}")

        feats = x[:, :, :, :].reshape(bs, njoints * nfeats, nframes)
        feats = feats.transpose(0, 2, 1)  # [B, T, J*F]
        h = nn.Dense(self.latent_dim, dtype=self.dtype,
                     name="input_process")(feats)

        xseq = jnp.concatenate([emb[:, None, :], h], axis=1)  # [B, T+1, D]
        xseq = PositionalEncoding(
            self.latent_dim, self.dropout, name="sequence_pos_encoder"
        )(xseq, deterministic=not train)

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

        out = out[:, 1:]
        out = nn.Dense(self.njoints * self.nfeats, dtype=self.dtype,
                       name="output_process")(out)
        out = out.reshape(bs, nframes, self.njoints, self.nfeats)
        return out.transpose(0, 2, 3, 1).astype(jnp.float32)
