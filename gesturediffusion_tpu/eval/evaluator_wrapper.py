"""Frozen T2M evaluator bundle.

Functional parity surface with the reference wrapper
(reference: data_loaders/humanml/networks/evaluator_wrapper.py —
build_evaluators :112 (loads text_mot_match/model/finest.tar),
EvaluatorMDMWrapper:121 with get_co_embeddings:154 /
get_motion_embeddings:175; dims table :124-139).

Weights come from the released torch checkpoint via the converters in
eval/networks.py; the co-embedding pipeline (length-sorted alignment,
movement encoding on motions[..., :-4], unit_length downsampling) is
preserved exactly.  The forward passes are jitted.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gesturediffusion_tpu.eval.networks import (
    MotionEncoderBiGRUCo,
    MovementConvEncoder,
    TextEncoderBiGRUCo,
    convert_motion_encoder,
    convert_movement_encoder,
    convert_text_encoder,
)


class EvaluatorWrapper:
    """Text/motion co-embedding evaluator (frozen)."""

    UNIT_LENGTH = 4

    def __init__(
        self,
        dataset_name: str = "humanml",
        checkpoint_path: Optional[str] = None,
        params: Optional[dict] = None,
        dim_pose: Optional[int] = None,
        seed: int = 0,
    ):
        self.dataset_name = dataset_name
        self.dim_pose = dim_pose or (263 if dataset_name == "humanml" else 251)

        self.text_encoder = TextEncoderBiGRUCo(
            word_size=300, pos_size=15, hidden_size=512, output_size=512
        )
        self.motion_encoder = MotionEncoderBiGRUCo(
            input_size=512, hidden_size=1024, output_size=512
        )
        self.movement_encoder = MovementConvEncoder(
            hidden_size=512, output_size=512
        )

        if checkpoint_path is None:
            # reference default location (prepare/download_t2m_evaluators.sh
            # unpacks to ./{t2m,kit}/text_mot_match/model/finest.tar)
            import os

            candidate = os.environ.get(
                "T2M_EVALUATOR_PATH",
                os.path.join(
                    "t2m" if dataset_name == "humanml" else "kit",
                    "text_mot_match", "model", "finest.tar",
                ),
            )
            if os.path.isfile(candidate):
                checkpoint_path = candidate

        if params is not None:
            self.params = params
        elif checkpoint_path is not None:
            self.params = self.load_torch_checkpoint(checkpoint_path)
        else:
            # random frozen weights (hermetic tests / no-assets smoke runs)
            from gesturediffusion_tpu.utils import logger as _log

            _log.log(
                "WARNING: T2M evaluator checkpoint (finest.tar) not found "
                "— using RANDOM frozen evaluator weights; metrics are NOT "
                "comparable to the reference protocol."
            )
            self.params = self._init_random(seed)

        self._jit_text = jax.jit(
            lambda w, p, l: self.text_encoder.apply(
                {"params": self.params["text"]}, w, p, l
            )
        )
        self._jit_motion = jax.jit(self._motion_embed)

    def _init_random(self, seed: int) -> dict:
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        t = 16
        text = self.text_encoder.init(
            k1, jnp.zeros((2, t, 300)), jnp.zeros((2, t, 15)),
            jnp.asarray([t, t]),
        )["params"]
        motion = self.motion_encoder.init(
            k2, jnp.zeros((2, t, 512)), jnp.asarray([t, t])
        )["params"]
        movement = self.movement_encoder.init(
            k3, jnp.zeros((2, t, self.dim_pose - 4))
        )["params"]
        return {"text": text, "motion": motion, "movement": movement}

    @staticmethod
    def load_torch_checkpoint(path_or_ckpt) -> dict:
        """Convert the released finest.tar into flax params.

        Accepts a path or an already-`torch.load`ed checkpoint dict (so
        callers that inspect the raw file, e.g. prepare/verify_assets.py,
        don't pay a second multi-hundred-MB load)."""
        if isinstance(path_or_ckpt, (str, bytes, os.PathLike)):
            import torch

            ckpt = torch.load(
                path_or_ckpt, map_location="cpu", weights_only=False
            )
        else:
            ckpt = path_or_ckpt

        def sd(key):
            return {k: v.numpy() for k, v in ckpt[key].items()}

        return {
            "text": convert_text_encoder(sd("text_encoder")),
            "motion": convert_motion_encoder(sd("motion_encoder")),
            "movement": convert_movement_encoder(sd("movement_encoder")),
        }

    def _motion_embed(self, motions: jax.Array, m_lens: jax.Array):
        movements = self.movement_encoder.apply(
            {"params": self.params["movement"]}, motions[..., :-4]
        )
        return self.motion_encoder.apply(
            {"params": self.params["motion"]},
            movements,
            m_lens // self.UNIT_LENGTH,
        )

    def get_co_embeddings(self, word_embs, pos_ohot, cap_lens, motions, m_lens):
        """Aligned (text, motion) embeddings, length-sorted like the
        reference (results do NOT follow input order)."""
        align_idx = np.argsort(np.asarray(m_lens))[::-1].copy()
        motions = jnp.asarray(np.asarray(motions)[align_idx])
        m_lens_s = jnp.asarray(np.asarray(m_lens)[align_idx])

        motion_embedding = self._jit_motion(motions, m_lens_s)
        text_embedding = self._jit_text(
            jnp.asarray(word_embs), jnp.asarray(pos_ohot), jnp.asarray(cap_lens)
        )
        text_embedding = jnp.asarray(np.asarray(text_embedding)[align_idx])
        return np.asarray(text_embedding), np.asarray(motion_embedding)

    def get_motion_embeddings(self, motions, m_lens, keep_order: bool = False):
        """Motion embeddings; length-sorted like the reference unless
        ``keep_order`` (needed when the caller regroups by input index,
        e.g. multimodality's [b, repeats] reshape)."""
        align_idx = np.argsort(np.asarray(m_lens))[::-1].copy()
        motions = jnp.asarray(np.asarray(motions)[align_idx])
        m_lens_s = jnp.asarray(np.asarray(m_lens)[align_idx])
        emb = np.asarray(self._jit_motion(motions, m_lens_s))
        if keep_order:
            inverse = np.empty_like(align_idx)
            inverse[align_idx] = np.arange(len(align_idx))
            return emb[inverse]
        return emb
