"""Fixed-shape batch collation.

Functional parity surface with the reference collate layer
(reference: data_loaders/tensors.py — lengths_to_mask:3, collate:22,
gg_collate:56): produces the canonical batch contract

    motion [B, J, 1, T] float32
    cond = {mask [B,1,1,T] bool, lengths [B] i32,
            mfcc [B, C, 1, T], audio [B, L], seed [B, J, 1, S],
            text: list[str] (host-side only — excluded from device cond)}

TPU design: batches are always padded to a static T (max_frames) so every
jit sees one shape; text stays host-side (CLIP embeds it outside jit).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


# gesture audio contract: 22050 Hz at 30 fps (BASELINE.md pose/window
# config row; reference: data_loaders/gesture/data/dataset.py:10)
AUDIO_SAMPLES_PER_FRAME = 22050 // 30


def lengths_to_mask(lengths: np.ndarray, max_len: int) -> np.ndarray:
    from gesturediffusion_tpu.data import native

    return native.lengths_to_mask_native(np.asarray(lengths), max_len)


def collate_gesture(
    items: Sequence[dict], max_frames: Optional[int] = None,
    audio_samples_per_frame: int = AUDIO_SAMPLES_PER_FRAME,
) -> tuple[np.ndarray, dict]:
    """Collate gesture dataset items into the canonical batch contract.

    ``audio_samples_per_frame`` sets the STATIC audio pad target (t
    frames x samples/frame); pass round(sr/fps) for datasets built with
    non-default audio rates (the registry wires this automatically)."""
    b = len(items)
    t = max_frames or max(it["motion"].shape[0] for it in items)
    d = items[0]["motion"].shape[1]

    from gesturediffusion_tpu.data import native

    def fill_transposed(dst, src, i):
        """dst[i, :, 0, :] = padded src.T — fused C kernel when available."""
        if native.get_lib() is not None:
            zeros = np.zeros(src.shape[1], np.float32)
            ones = np.ones(src.shape[1], np.float32)
            dst[i, :, 0, :] = native.window_znorm_transpose(
                src, 0, dst.shape[-1], zeros, ones
            )
        else:
            dst[i, :, 0, : src.shape[0]] = src.T

    motion = np.zeros((b, d, 1, t), np.float32)
    lengths = np.zeros((b,), np.int32)
    for i, it in enumerate(items):
        fill_transposed(motion, it["motion"][:t], i)
        lengths[i] = min(int(it["length"]), t)

    cond: dict = {
        "mask": lengths_to_mask(lengths, t)[:, None, None, :],
        "lengths": lengths,
    }

    if "mfcc" in items[0]:
        c = items[0]["mfcc"].shape[1]
        mf = np.zeros((b, c, 1, t), np.float32)
        for i, it in enumerate(items):
            fill_transposed(mf, it["mfcc"][:t], i)
        cond["mfcc"] = mf

    if "seed" in items[0]:
        s = items[0]["seed"].shape[0]
        seed = np.zeros((b, d, 1, s), np.float32)
        for i, it in enumerate(items):
            seed[i, :, 0, :] = it["seed"].T
        cond["seed"] = seed

    if "audio" in items[0]:
        # STATIC pad target (t frames at the gesture contract's fixed
        # 22050 Hz / 30 fps = 735 samples per frame): padding to the
        # per-batch max would retrace the jitted step for every distinct
        # short-tail batch and desync per-process shard shapes under
        # multi-host collation
        la = t * audio_samples_per_frame
        audio = np.zeros((b, la), np.float32)
        for i, it in enumerate(items):
            n = min(it["audio"].shape[0], la)
            audio[i, :n] = it["audio"][:n]
        cond["audio"] = audio

    if "text" in items[0]:
        cond["text"] = [it["text"] for it in items]

    return motion, cond


def _is_host_only(key, value) -> bool:
    """True for string-valued fields ('text', a2m 'action_text'): strings
    can't live in a jit-traced pytree.  Numeric lists/tuples pass through
    (jnp.asarray handles them downstream)."""
    if key == "text" or isinstance(value, str):
        return True
    if isinstance(value, (list, tuple)):
        return len(value) == 0 or isinstance(value[0], str)
    return False


def device_cond(cond: dict) -> dict:
    """Strip host-only fields so the cond pytree is jit-safe."""
    return {k: v for k, v in cond.items() if not _is_host_only(k, v)}
