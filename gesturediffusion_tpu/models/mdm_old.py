"""MDM V1 gesture denoiser in Flax.

Functional parity surface with the reference V1 model
(reference: model/mdm_old.py:6-122): MFCCs concatenated onto the pose
channels, seed+timestep as token 0, additive sinusoidal positional
encoding, 8-layer post-LN transformer encoder.
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
from gesturediffusion_tpu.models.mdm import SeedPoseEncoder
from gesturediffusion_tpu.models.transformer import TransformerEncoder


class MDMOld(nn.Module):
    """MDM V1: channel-concat audio conditioning + token-0 cond."""

    njoints: int = 498
    nfeats: int = 1
    latent_dim: int = 256
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 4
    dropout: float = 0.1
    activation: str = "gelu"
    cond_mask_prob: float = 0.0
    seed_poses: int = 10
    mfcc_dim: int = 26
    data_rep: str = "genea_vec"
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

        flat_seed = cond["seed"].astype(x.dtype).reshape(bs, -1)
        emb_seed = SeedPoseEncoder(self.latent_dim, dtype=self.dtype,
                                   name="seed_pose_encoder")(
            self._mask_cond(flat_seed, uncond, train, mask_rng)
        )
        emb = emb + emb_seed  # [B, D]

        # audio concat on channel axis: [B, J+A, F, T]
        mfccs = cond["mfcc"].astype(x.dtype)
        xa = jnp.concatenate([x, mfccs], axis=1)
        feats = xa.reshape(bs, -1, nframes).transpose(0, 2, 1)  # [B,T,(J+A)F]
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
            dtype=self.dtype,
            name="seqTransEncoder",
        )(xseq, deterministic=not train)

        out = out[:, 1:]
        out = nn.Dense(self.njoints * self.nfeats, dtype=self.dtype,
                       name="output_process")(out)
        out = out.reshape(bs, nframes, self.njoints, self.nfeats)
        return out.transpose(0, 2, 3, 1).astype(jnp.float32)
