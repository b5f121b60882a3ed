"""Text-embedder factory: real CLIP when assets exist, hash fallback.

The reference hard-depends on downloading OpenAI CLIP ViT-B/32
(model/mdm.py:229-240).  In asset-free environments we substitute a
deterministic hash embedder so pipelines stay runnable end-to-end; swap in
the real tower by dropping the checkpoint + BPE files (see
models/clip_text.py).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np

from gesturediffusion_tpu.utils import logger as log_lib


class HashTextEmbedder:
    """Deterministic pseudo-embedding per caption (pipeline stand-in)."""

    def __init__(self, dim: int = 512):
        self.dim = dim

    def __call__(self, texts: list[str]) -> np.ndarray:
        import hashlib

        out = np.zeros((len(texts), self.dim), np.float32)
        for i, t in enumerate(texts):
            # stable digest, NOT hash(): the built-in is salted per
            # process, so a model trained with these embeddings would see
            # DIFFERENT vectors for the same caption at sampling time
            seed = int.from_bytes(
                hashlib.md5(t.encode()).digest()[:4], "little"
            )
            rs = np.random.RandomState(seed)
            out[i] = rs.randn(self.dim).astype(np.float32) * 0.1
        return out


def get_text_encoder(
    clip_version: str = "ViT-B/32", dim: int = 512
) -> Callable:
    """Real CLIP if checkpoint+BPE assets are present, else hash fallback."""
    from gesturediffusion_tpu.models.clip_text import (
        CLIPTextEmbedder,
        default_bpe_path,
    )

    ckpt = os.environ.get("CLIP_CHECKPOINT", "assets/clip/ViT-B-32.pt")
    bpe = default_bpe_path()
    if bpe and os.path.isfile(ckpt):
        log_lib.log(f"loading CLIP text tower from {ckpt}")
        return CLIPTextEmbedder.from_torch_checkpoint(ckpt, bpe)
    log_lib.log(
        "CLIP assets not found — using deterministic hash text embedder "
        "(set CLIP_CHECKPOINT and CLIP_BPE_PATH for the real tower)"
    )
    return HashTextEmbedder(dim)
