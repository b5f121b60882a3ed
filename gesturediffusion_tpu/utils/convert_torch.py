"""Reference (PyTorch) denoiser checkpoints -> Flax param trees.

The reference trains with `torch.save(model.state_dict())` and loads via
`load_model_wo_clip` (reference: utils/model_util.py:6-9) — the released
checkpoints (gesture "finest" MDM-V2, upstream humanml/kit/a2m MDM) are
flat torch state dicts.  These converters map them onto the param trees
of `models/mdm.py::MDM` and `models/mdm_t2m.py::MotionMDM` so reference
users can load their existing checkpoints directly.

Conventions:
  * torch `nn.Linear.weight` is [out, in]; flax Dense kernel is
    [in, out] -> transpose.
  * `nn.MultiheadAttention.in_proj_weight` is [3D, D]; our packed
    in_proj kernel is [D, 3D] -> transpose.
  * torch `nn.Conv1d.weight` is [out_c, in_c, k]; flax Conv kernel is
    [k, in_c, out_c] -> transpose(2, 1, 0).
  * LayerNorm/BatchNorm `weight` -> `scale`.
  * Buffers that our models recompute (`sequence_pos_encoder.pe`,
    rotary tables) and frozen towers (`clip_model.*`, `rot2xyz.*`) are
    skipped, mirroring load_model_wo_clip's missing-key allowance.

Every converter asserts that NO unexpected source key remains, so a
layout drift fails loudly instead of silently producing garbage.
"""

from __future__ import annotations

from typing import Any

import numpy as np

_SKIP_PREFIXES = ("clip_model.", "rot2xyz.", "sequence_pos_encoder.",
                  "embed_timestep.sequence_pos_encoder.",
                  "rel_pos.")  # rotary inv_freq buffer — recomputed here
_SKIP_SUFFIXES = (".num_batches_tracked",)


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def _linear(sd: dict, name: str) -> dict:
    return {
        "kernel": _np(sd.pop(f"{name}.weight")).T,
        "bias": _np(sd.pop(f"{name}.bias")),
    }


def _layernorm(sd: dict, name: str) -> dict:
    return {
        "scale": _np(sd.pop(f"{name}.weight")),
        "bias": _np(sd.pop(f"{name}.bias")),
    }


def _encoder_layers(sd: dict, num_layers: int) -> dict:
    """torch nn.TransformerEncoder state -> models/transformer.py tree."""
    out = {}
    for i in range(num_layers):
        p = f"seqTransEncoder.layers.{i}"
        out[f"layer_{i}"] = {
            "self_attn": {
                "in_proj": {
                    "kernel": _np(sd.pop(f"{p}.self_attn.in_proj_weight")).T,
                    "bias": _np(sd.pop(f"{p}.self_attn.in_proj_bias")),
                },
                "out_proj": _linear(sd, f"{p}.self_attn.out_proj"),
            },
            "linear1": _linear(sd, f"{p}.linear1"),
            "linear2": _linear(sd, f"{p}.linear2"),
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
        }
    return out


def _timestep_embedder(sd: dict) -> dict:
    return {
        "time_embed_0": _linear(sd, "embed_timestep.time_embed.0"),
        "time_embed_1": _linear(sd, "embed_timestep.time_embed.2"),
    }


def _strip_skipped(sd: dict) -> dict:
    return {
        k: v
        for k, v in sd.items()
        if not k.startswith(_SKIP_PREFIXES)
        and not k.endswith(_SKIP_SUFFIXES)
    }


def _assert_consumed(sd: dict, what: str) -> None:
    leftovers = sorted(_strip_skipped(sd))
    if leftovers:
        raise ValueError(
            f"{what}: unconverted reference keys {leftovers[:8]}"
            f"{' …' if len(leftovers) > 8 else ''} — "
            "checkpoint layout drift?"
        )


def convert_mdm_state_dict(sd: dict, model: Any) -> dict:
    """Reference MDM-V2 gesture state dict -> Flax variables.

    Returns {'params': ..., [+'batch_stats' when use_wav_enc]} matching
    `models/mdm.py::MDM` (reference layout: model/mdm.py:10-103).
    """
    sd = dict(sd)
    if "project_to_lat.weight" not in sd:
        # V2 fingerprint; a V1 (mdm_old) checkpoint has no projection —
        # say so instead of KeyError'ing mid-conversion
        raise ValueError(
            "checkpoint has no 'project_to_lat.*' — this looks like an "
            "MDM V1 (mdm_old) state dict; convert it with "
            "convert_mdm_old_state_dict onto models/mdm_old.py::MDMOld "
            "(the CLIs build the V2 model only, matching the reference)"
        )
    params = {
        "input_process": _linear(sd, "input_process.poseEmbedding"),
        "project_to_lat": _linear(sd, "project_to_lat"),
        "output_process": _linear(sd, "output_process.poseFinal"),
        "embed_timestep": _timestep_embedder(sd),
        "seed_pose_encoder": {
            "seed_embed": _linear(sd, "seed_pose_encoder.seed_embed"),
        },
        "seqTransEncoder": _encoder_layers(sd, model.num_layers),
    }
    if model.use_text:
        params["embed_text"] = _linear(sd, "embed_text")

    variables: dict = {"params": params}
    if model.use_wav_enc:
        wav_p, wav_s = {}, {}
        # Sequential indices: Conv1d at 0/3/6/9, BatchNorm1d at 1/4/7
        for i, ci in enumerate((0, 3, 6, 9)):
            wav_p[f"conv_{i}"] = {
                "kernel": _np(
                    sd.pop(f"wav_encoder.feat_extractor.{ci}.weight")
                ).transpose(2, 1, 0),
                "bias": _np(sd.pop(f"wav_encoder.feat_extractor.{ci}.bias")),
            }
        for i, bi in enumerate((1, 4, 7)):
            wav_p[f"bn_{i}"] = {
                "scale": _np(sd.pop(f"wav_encoder.feat_extractor.{bi}.weight")),
                "bias": _np(sd.pop(f"wav_encoder.feat_extractor.{bi}.bias")),
            }
            wav_s[f"bn_{i}"] = {
                "mean": _np(
                    sd.pop(f"wav_encoder.feat_extractor.{bi}.running_mean")
                ),
                "var": _np(
                    sd.pop(f"wav_encoder.feat_extractor.{bi}.running_var")
                ),
            }
        params["wav_encoder"] = wav_p
        variables["batch_stats"] = {"wav_encoder": wav_s}

    _assert_consumed(sd, "MDM")
    return variables


def convert_mdm_old_state_dict(sd: dict, model: Any) -> dict:
    """Reference MDM V1 state dict -> Flax variables for
    `models/mdm_old.py::MDMOld` (reference layout: model/mdm_old.py:6-69:
    seed encoder + mfcc-concat input + token-0 conditioning; no
    project_to_lat / local attention / text)."""
    sd = dict(sd)
    params = {
        "input_process": _linear(sd, "input_process.poseEmbedding"),
        "output_process": _linear(sd, "output_process.poseFinal"),
        "embed_timestep": _timestep_embedder(sd),
        "seed_pose_encoder": {
            "seed_embed": _linear(sd, "seed_pose_encoder.seed_embed"),
        },
        "seqTransEncoder": _encoder_layers(sd, model.num_layers),
    }
    _assert_consumed(sd, "MDMOld")
    return {"params": params}


def convert_motion_mdm_state_dict(sd: dict, model: Any) -> dict:
    """Upstream-MDM (t2m/a2m/unconstrained) state dict -> Flax variables
    for `models/mdm_t2m.py::MotionMDM`.

    The upstream action embedding is a bare [num_actions, D] parameter
    (`embed_action.action_embedding`); our Dense-over-one-hot is the
    same map with kernel = that matrix and bias = 0.
    """
    sd = dict(sd)
    params = {
        "input_process": _linear(sd, "input_process.poseEmbedding"),
        "output_process": _linear(sd, "output_process.poseFinal"),
        "embed_timestep": _timestep_embedder(sd),
        "seqTransEncoder": _encoder_layers(sd, model.num_layers),
    }
    if model.cond_mode == "text":
        params["embed_text"] = _linear(sd, "embed_text")
    elif model.cond_mode == "action":
        emb = _np(sd.pop("embed_action.action_embedding"))
        params["embed_action"] = {
            "kernel": emb,
            "bias": np.zeros((emb.shape[1],), np.float32),
        }
    _assert_consumed(sd, "MotionMDM")
    return {"params": params}


def _export_linear(out: dict, name: str, p: dict) -> None:
    out[f"{name}.weight"] = np.asarray(p["kernel"], np.float32).T
    out[f"{name}.bias"] = np.asarray(p["bias"], np.float32)


def _export_layernorm(out: dict, name: str, p: dict) -> None:
    out[f"{name}.weight"] = np.asarray(p["scale"], np.float32)
    out[f"{name}.bias"] = np.asarray(p["bias"], np.float32)


def _export_encoder_layers(out: dict, enc: dict, num_layers: int) -> None:
    for i in range(num_layers):
        lp = enc[f"layer_{i}"]
        p = f"seqTransEncoder.layers.{i}"
        out[f"{p}.self_attn.in_proj_weight"] = np.asarray(
            lp["self_attn"]["in_proj"]["kernel"], np.float32
        ).T
        out[f"{p}.self_attn.in_proj_bias"] = np.asarray(
            lp["self_attn"]["in_proj"]["bias"], np.float32
        )
        _export_linear(out, f"{p}.self_attn.out_proj",
                       lp["self_attn"]["out_proj"])
        _export_linear(out, f"{p}.linear1", lp["linear1"])
        _export_linear(out, f"{p}.linear2", lp["linear2"])
        _export_layernorm(out, f"{p}.norm1", lp["norm1"])
        _export_layernorm(out, f"{p}.norm2", lp["norm2"])


def _pe_buffer(d_model: int, max_len: int = 5000) -> np.ndarray:
    """The reference PositionalEncoding.pe buffer [max_len, 1, d]
    (reference: model/mdm.py:277-289) — same table our
    models/embeddings.py::sinusoidal_table computes."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64)
        * (-np.log(10000.0) / d_model)
    )
    pe = np.zeros((max_len, d_model), np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe[:, None, :].astype(np.float32)


def export_mdm_state_dict(variables: dict, model: Any) -> dict:
    """Flax MDM variables -> reference torch state dict (numpy values).

    Includes the buffers the reference's `load_model_wo_clip` requires
    to be present (`sequence_pos_encoder.pe`, `rel_pos.inv_freq`, BN
    running stats) so the export loads with its standard path: only
    `clip_model.*` keys may be missing."""
    P = variables["params"]
    out: dict = {}
    _export_linear(out, "input_process.poseEmbedding", P["input_process"])
    _export_linear(out, "project_to_lat", P["project_to_lat"])
    _export_linear(out, "output_process.poseFinal", P["output_process"])
    _export_linear(out, "embed_timestep.time_embed.0",
                   P["embed_timestep"]["time_embed_0"])
    _export_linear(out, "embed_timestep.time_embed.2",
                   P["embed_timestep"]["time_embed_1"])
    _export_linear(out, "seed_pose_encoder.seed_embed",
                   P["seed_pose_encoder"]["seed_embed"])
    if model.use_text:
        _export_linear(out, "embed_text", P["embed_text"])
    _export_encoder_layers(out, P["seqTransEncoder"], model.num_layers)

    pe = _pe_buffer(model.latent_dim)
    out["sequence_pos_encoder.pe"] = pe
    out["embed_timestep.sequence_pos_encoder.pe"] = pe
    dh = model.latent_dim // model.cl_head
    out["rel_pos.inv_freq"] = (
        1.0 / (10000 ** (np.arange(0, dh, 2, dtype=np.float64) / dh))
    ).astype(np.float32)

    if model.use_wav_enc:
        wav_p = P["wav_encoder"]
        wav_s = variables.get("batch_stats", {}).get("wav_encoder", {})
        if not wav_s:
            raise ValueError(
                "use_wav_enc export needs the 'batch_stats' collection "
                "(BatchNorm running stats) in `variables` — EMA trees "
                "don't carry it; merge the live batch_stats in "
                "(utils/export_torch.py does)"
            )
        for i, ci in enumerate((0, 3, 6, 9)):
            out[f"wav_encoder.feat_extractor.{ci}.weight"] = np.asarray(
                wav_p[f"conv_{i}"]["kernel"], np.float32
            ).transpose(2, 1, 0)
            out[f"wav_encoder.feat_extractor.{ci}.bias"] = np.asarray(
                wav_p[f"conv_{i}"]["bias"], np.float32
            )
        for i, bi in enumerate((1, 4, 7)):
            out[f"wav_encoder.feat_extractor.{bi}.weight"] = np.asarray(
                wav_p[f"bn_{i}"]["scale"], np.float32
            )
            out[f"wav_encoder.feat_extractor.{bi}.bias"] = np.asarray(
                wav_p[f"bn_{i}"]["bias"], np.float32
            )
            out[f"wav_encoder.feat_extractor.{bi}.running_mean"] = (
                np.asarray(wav_s[f"bn_{i}"]["mean"], np.float32)
            )
            out[f"wav_encoder.feat_extractor.{bi}.running_var"] = (
                np.asarray(wav_s[f"bn_{i}"]["var"], np.float32)
            )
            out[f"wav_encoder.feat_extractor.{bi}.num_batches_tracked"] = (
                np.asarray(0, np.int64)
            )
    return out


def export_motion_mdm_state_dict(variables: dict, model: Any) -> dict:
    """Flax MotionMDM variables -> upstream-MDM torch state dict
    (inverse of convert_motion_mdm_state_dict; pe buffer included)."""
    P = variables["params"]
    out: dict = {}
    _export_linear(out, "input_process.poseEmbedding", P["input_process"])
    _export_linear(out, "output_process.poseFinal", P["output_process"])
    _export_linear(out, "embed_timestep.time_embed.0",
                   P["embed_timestep"]["time_embed_0"])
    _export_linear(out, "embed_timestep.time_embed.2",
                   P["embed_timestep"]["time_embed_1"])
    _export_encoder_layers(out, P["seqTransEncoder"], model.num_layers)
    if model.cond_mode == "text":
        _export_linear(out, "embed_text", P["embed_text"])
    elif model.cond_mode == "action":
        # upstream's action embedding is a bare matrix — a trained Dense
        # bias has no slot there; fold it into every row instead
        # (one_hot @ W + b == one_hot @ (W + b_row))
        out["embed_action.action_embedding"] = (
            np.asarray(P["embed_action"]["kernel"], np.float32)
            + np.asarray(P["embed_action"]["bias"], np.float32)[None, :]
        )
    pe = _pe_buffer(model.latent_dim)
    out["sequence_pos_encoder.pe"] = pe
    out["embed_timestep.sequence_pos_encoder.pe"] = pe
    return out


def save_torch_checkpoint(path: str, variables: dict, model: Any) -> str:
    """Export Flax variables as a reference-loadable torch .pt file."""
    import torch

    from gesturediffusion_tpu.models.mdm import MDM

    if isinstance(model, MDM):
        sd = export_mdm_state_dict(variables, model)
    else:
        sd = export_motion_mdm_state_dict(variables, model)
    # .copy(): jax buffers are non-writable; torch warns (and writing
    # through the tensor would be UB)
    torch.save(
        {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()},
        path,
    )
    return path


def load_torch_checkpoint(path: str, model: Any) -> dict:
    """torch.load a reference checkpoint file and convert it for `model`
    (an MDM or MotionMDM instance)."""
    import torch

    from gesturediffusion_tpu.models.mdm import MDM
    from gesturediffusion_tpu.models.mdm_old import MDMOld

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and isinstance(
        sd["model"], dict
    ):
        sd = sd["model"]
    if isinstance(model, MDM):
        return convert_mdm_state_dict(sd, model)
    if isinstance(model, MDMOld):
        return convert_mdm_old_state_dict(sd, model)
    return convert_motion_mdm_state_dict(sd, model)
