"""Checkpoint load helpers (Orbax pytrees, `model{step:09d}` dirs).

Counterpart of the reference's torch.load + load_model_wo_clip
(reference: utils/model_util.py:6-9, train/training_loop.py:102-124).
"""

from __future__ import annotations

import os
from typing import Any, Optional


TORCH_SUFFIXES = (".pt", ".pth", ".tar", ".pth.tar")


def load_checkpoint(
    path: str, template: Optional[Any] = None, model: Optional[Any] = None
) -> dict:
    """Restore a checkpoint dict ({'params', 'ema_params', 'opt_state', ...}).

    `template` (optional) restores with exact dtypes/structure.

    Reference torch checkpoints (``model*.pt`` files) are converted on
    the fly via utils/convert_torch.py — pass the target ``model``
    instance (the CLIs do) so the state dict can be mapped onto its
    param tree.
    """
    if os.path.isfile(path) and path.endswith(TORCH_SUFFIXES):
        if model is None:
            raise ValueError(
                "loading a reference torch checkpoint requires the model "
                "instance (load_checkpoint(path, model=model))"
            )
        if template is not None:
            raise ValueError(
                "template restore is not supported for torch checkpoints "
                "— the converted dict contains ONLY 'params' (no "
                "ema_params/opt_state; reference .pt files carry none)"
            )
        from gesturediffusion_tpu.utils.convert_torch import (
            load_torch_checkpoint,
        )

        return {"params": load_torch_checkpoint(path, model)}

    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    path = os.path.abspath(path)
    if template is not None:
        return ckptr.restore(path, item=template)
    return ckptr.restore(path)


def load_params(path: str, use_ema: bool = False):
    ckpt = load_checkpoint(path)
    if use_ema and ckpt.get("ema_params"):
        return ckpt["ema_params"]
    return ckpt["params"]
