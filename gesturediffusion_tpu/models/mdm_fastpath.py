"""Sampling fast path for the MDM gesture denoiser.

The denoise scan calls the model 1000x per chunk with the SAME
conditioning (seed poses, audio, text) every step — only ``x`` and ``t``
change.  The standard flax ``MDM.__call__`` recomputes the conditioning
encoders and materializes two [B, T, 2D+A]-wide concats per step
(reference structure: model/mdm.py:105-224).  This module rebuilds the
identical function for inference as:

  * a per-chunk ``precompute`` that runs every loop-invariant piece once
    (seed encoder, audio projection, conditioning-token projection), and
  * a per-step ``fast_fn`` whose glue is ONE [B*T, J] x [J, D] matmul
    plus adds — the two consecutive linear maps ``input_process`` and
    ``project_to_lat`` collapse into one composed weight (there is no
    nonlinearity between them), and the concats disappear because a
    Dense over a concat is the sum of Denses over the parts:
    ``[pose|audio|coa] @ W = pose@W1 + audio@W2 + coa@W3``.

The transformer encoder and timestep embedder are NOT reimplemented —
the per-step function applies the very same flax submodules on the same
param subtrees, so parity with ``MDM.apply`` is by construction (exact
in f32; composed-weight rounding only in bf16).

Training keeps the standard module (dropout, autodiff); this path is
used by bench.py and sample/generate.py.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from gesturediffusion_tpu.models.embeddings import TimestepEmbedder
from gesturediffusion_tpu.models.mdm import MDM, pre_encoder_local_block
from gesturediffusion_tpu.models.transformer import TransformerEncoder


def make_fast_model_fn(
    model: MDM, params: Any, layout: str = "bjft"
) -> tuple[Callable, Callable]:
    """Build (precompute, fast_fn) for inference-time MDM sampling.

    precompute(cond) -> cond' : runs the loop-invariant conditioning once
      (per chunk).  ``cond`` needs 'seed' [B,J,F,S] and 'mfcc' [B,A,1,T]
      (+ 'text_emb' when model.use_text, + optional 'uncond' [B]); the
      returned dict carries the precomputed features under '_fast'.
    fast_fn(x, t, cond') -> model output, numerically matching
      ``model.apply(params, x, t, cond, train=False)``.

    layout selects the sampling-state layout:
      * "bjft" (default): canonical [B, J, F, T] in and out.
      * "btj": TIME-MAJOR [B, T, J*F] in and out — the model-internal
        layout.  This removes the two per-step [B,J*F,T] <-> [B,T,J*F]
        relayouts (a pure-bandwidth cost at J=498); diffusion math is
        elementwise so the chain is layout-agnostic, and the per-step
        gaussian draws are iid either way (samples are distributionally
        identical, not bitwise, vs the canonical layout).  In "btj" the
        'seed' cond may arrive either canonical [B,J,F,S] (chunk 0) or
        time-major [B,S,J*F] (the AR carry).

    Raises NotImplementedError for configurations the fast path does not
    cover (wav-encoder audio input).
    """
    if layout not in ("bjft", "btj"):
        raise ValueError(f"unknown layout {layout!r}")
    if not model.mfcc_input:
        raise NotImplementedError(
            "fast path supports the MFCC audio input only "
            "(use_wav_enc runs a BatchNorm conv stack — keep MDM.apply)"
        )
    P = params["params"]
    dt = model.dtype
    D = model.latent_dim
    A = model.audio_feat_dim

    # ---- composed glue weights (f32 composition, then compute dtype),
    # computed in ONE jitted call: eager per-op dispatch is a round-trip
    # storm through tunneled TPU backends ---------------------------- #
    def _compose(Pp):
        w_in = Pp["input_process"]["kernel"].astype(jnp.float32)  # [J*F, D]
        b_in = Pp["input_process"]["bias"].astype(jnp.float32)
        w_proj = Pp["project_to_lat"]["kernel"].astype(jnp.float32)
        b_proj = Pp["project_to_lat"]["bias"].astype(jnp.float32)
        out = {
            "w_pose": (w_in @ w_proj[:D]).astype(dt),            # [J*F, D]
            "b_glue": (b_in @ w_proj[:D] + b_proj).astype(jnp.float32),
            "w_audio": w_proj[D : D + A].astype(dt),             # [A, D]
            "w_coa": w_proj[D + A :].astype(dt),                 # [D, D]
            "w_seed": Pp["seed_pose_encoder"]["seed_embed"]["kernel"]
            .astype(dt),
            "b_seed": Pp["seed_pose_encoder"]["seed_embed"]["bias"]
            .astype(dt),
            "w_out": Pp["output_process"]["kernel"].astype(dt),  # [D, J*F]
            "b_out": Pp["output_process"]["bias"].astype(dt),
        }
        if model.use_text:
            out["w_text"] = Pp["embed_text"]["kernel"].astype(dt)
            out["b_text"] = Pp["embed_text"]["bias"].astype(dt)
        return out

    W = jax.jit(_compose)(P)
    w_pose, b_glue = W["w_pose"], W["b_glue"]
    w_audio, w_coa = W["w_audio"], W["w_coa"]
    w_seed, b_seed = W["w_seed"], W["b_seed"]
    w_out, b_out = W["w_out"], W["b_out"]
    if model.use_text:
        w_text, b_text = W["w_text"], W["b_text"]

    temb = TimestepEmbedder(D)
    temb_params = {"params": P["embed_timestep"]}
    enc = TransformerEncoder(
        num_layers=model.num_layers,
        d_model=D,
        num_heads=model.num_heads,
        dim_feedforward=model.ff_size,
        dropout=0.0,
        activation=model.activation,
        use_fused_layer=model.use_fused_encoder,
        dtype=None if dt is jnp.float32 else dt,
    )
    enc_params = {"params": P["seqTransEncoder"]}

    def precompute(cond: dict) -> dict:
        """Run the loop-invariant conditioning; returns cond + '_fast'."""
        seed = cond["seed"]
        b = seed.shape[0]
        if seed.ndim == 3:
            # time-major carry [B, S, J*F] -> canonical (j,f,s) flattening
            seed = seed.transpose(0, 2, 1)
        uncond = cond.get("uncond")
        if uncond is None:
            uncond = jnp.zeros((b,), jnp.float32)
        keep = 1.0 - uncond.astype(jnp.float32)[:, None]

        flat_seed = (seed.reshape(b, -1) * keep).astype(dt)
        emb_seed = flat_seed @ w_seed + b_seed                  # [B, Ds]
        if model.use_text:
            enc_text = (
                cond["text_emb"].astype(jnp.float32) * keep
            ).astype(dt)
            emb_text = enc_text @ w_text + b_text
            stxt = jnp.concatenate([emb_text, emb_seed], -1)    # [B, D]
        else:
            stxt = emb_seed

        audio = cond["mfcc"][:, :, 0, :].transpose(0, 2, 1).astype(dt)
        # fold the composed bias in once: per-step glue is then a single
        # matmul + two adds
        base = (audio @ w_audio).astype(jnp.float32) + b_glue   # [B, T, D]
        out = {k: v for k, v in cond.items()}
        out["_fast"] = {
            "base": base.astype(dt),
            "stxt": stxt,
            "stxt_proj": stxt @ w_coa,                          # [B, D]
        }
        return out

    cl_head, window = model.cl_head, model.window_size
    dh = D // cl_head

    def _to_pose(x):
        """Sampler state -> [B, T, J*F] compute-dtype + shape info."""
        if layout == "btj":
            bs, nt, _ = x.shape
            return x.astype(dt), bs, nt, None, None
        bs, nj, nf, nt = x.shape
        pose = x.reshape(bs, nj * nf, nt).transpose(0, 2, 1).astype(dt)
        return pose, bs, nt, nj, nf

    def _latent_forward(xseq, coa, bs, nt):
        """[B, T, D] latent + cond token -> model output [B, T, J*F] in
        the COMPUTE dtype (the final f32 cast is the caller's — for CFG
        the guidance combine runs before it, saving a 2B f32 pass)."""
        # the head split/merge relayouts around rope + band attention are
        # the measured hotspot of this block — route through the fused
        # VMEM-resident kernel when available (ops/pallas_local_block.py)
        if model.use_fused_encoder and nt % 8 == 0 and dh % 2 == 0:
            from gesturediffusion_tpu.ops.pallas_local_block import (
                fused_local_block,
            )

            xseq = fused_local_block(
                xseq, coa, num_heads=cl_head, window=window,
                interpret=jax.default_backend() != "tpu",
            )
        else:
            xseq = pre_encoder_local_block(
                xseq, coa, num_heads=cl_head, window_size=window
            )

        out = enc.apply(enc_params, xseq, deterministic=True)
        return out[:, 1:] @ w_out + b_out                       # [B, T, J*F]

    def _from_tm(out, bs, nt, nj, nf):
        # stay in the compute dtype: a bf16 model's f32 output is exactly
        # bf16-valued (the output projection computes in bf16), so the
        # upcast is pure bandwidth — the sampler's f32 math promotes the
        # operand on the fly instead (half the HBM read)
        if layout == "btj":
            return out
        out = out.reshape(bs, nt, nj, nf)
        return out.transpose(0, 2, 3, 1)

    def fast_fn(x: jax.Array, t: jax.Array, cond: dict) -> jax.Array:
        pc = cond["_fast"]
        pose, bs, nt, nj, nf = _to_pose(x)

        emb_t = temb.apply(temb_params, t).astype(dt)           # [B, D]
        coa = pc["stxt"] + emb_t
        xseq = (
            pose @ w_pose
            + pc["base"]
            + (pc["stxt_proj"] + emb_t @ w_coa)[:, None, :]
        )                                                        # [B, T, D]
        out = _latent_forward(xseq, coa, bs, nt)
        return _from_tm(out, bs, nt, nj, nf)

    fast_fn.internals = {
        "to_pose": _to_pose,
        "latent_forward": _latent_forward,
        "from_tm": _from_tm,
        "temb": lambda t: temb.apply(temb_params, t).astype(dt),
        "w_pose": w_pose,
        "w_coa": w_coa,
    }
    return precompute, fast_fn


def select_sampling_model_fn(
    model: Any,
    params: Any,
    guidance: float,
    cond_mask_prob: float,
    no_fast: bool = False,
) -> tuple[Optional[Callable], Callable]:
    """The sampling-CLI model_fn selector (shared by sample/generate.py
    and sample/edit.py): returns (cond_precompute, model_fn).

    Fast path when `model` is a gesture MDM with MFCC input and
    `no_fast` is False; otherwise the plain module apply, CFG-wrapped
    when guidance != 1.  For guidance == 0 (pure-unconditional editing,
    where scale 0 returns the uncond pass exactly) cond_mask_prob is
    clamped away from zero so the no-dropout assertion doesn't fire;
    any other scale keeps the guard — CFG on a model trained without
    conditioning dropout is meaningless."""
    from gesturediffusion_tpu.models.cfg import classifier_free_guidance

    p = max(cond_mask_prob, 1e-9) if guidance == 0 else cond_mask_prob
    if not no_fast and isinstance(model, MDM) and model.mfcc_input:
        if guidance != 1:
            return make_fast_cfg_fn(model, params, p)
        return make_fast_model_fn(model, params)

    def base_model_fn(x, t, c):
        return model.apply(params, x, t, c)

    if guidance != 1:
        return None, classifier_free_guidance(base_model_fn, p)
    return None, base_model_fn


def make_fast_cfg_fn(
    model: MDM,
    params: Any,
    cond_mask_prob: float = 0.1,
    layout: str = "bjft",
) -> tuple[Callable, Callable]:
    """Fast-path twin of models/cfg.py::classifier_free_guidance.

    Returns (precompute_cfg, guided_fn).  precompute_cfg stacks the
    cond/uncond problems on the batch axis ONCE per chunk and runs the
    fast precompute on the stacked batch; guided_fn then does one 2B
    forward per step and the guidance combine, reading the per-sample
    scale from cond['scale'] (reference: model/cfg_sampler.py:7-30).
    """
    assert cond_mask_prob > 0.0, (
        "Cannot run CFG on a model trained without conditioning dropout"
    )
    precompute, fast_fn = make_fast_model_fn(model, params, layout=layout)

    def precompute_cfg(cond: dict) -> dict:
        from gesturediffusion_tpu.models.cfg import stack_cfg_cond

        b = cond["seed"].shape[0]
        out = precompute(stack_cfg_cond(cond, b))
        # keep the ORIGINAL [B] scale for the combine
        out["scale"] = cond["scale"]
        return out

    ins = fast_fn.internals

    def guided(x: jax.Array, t: jax.Array, cond: dict) -> jax.Array:
        b = x.shape[0]
        pc = cond["_fast"]

        # the cond and uncond passes share the SAME x — project the pose
        # ONCE at B and duplicate at the [B, T, D] latent level (vs
        # concatenating the [B, J*F, T] state: 4x less duplicate traffic
        # and half the input-projection FLOPs)
        pose, bs, nt, nj, nf = ins["to_pose"](x)
        xp = pose @ ins["w_pose"]                               # [B, T, D]
        t2 = jnp.concatenate([t, t], axis=0)
        emb_t2 = ins["temb"](t2)                                # [2B, D]
        coa2 = pc["stxt"] + emb_t2
        xseq2 = (
            jnp.concatenate([xp, xp], axis=0)
            + pc["base"]
            + (pc["stxt_proj"] + emb_t2 @ ins["w_coa"])[:, None, :]
        )                                                        # [2B, T, D]
        out = ins["latent_forward"](xseq2, coa2, 2 * b, nt)

        # guidance combine in the compute dtype, ONE f32 cast after (the
        # f32 output of the bf16 model is bf16-valued anyway)
        scale = cond["scale"].reshape((b, 1, 1)).astype(out.dtype)
        out_cond, out_uncond = out[:b], out[b:]
        mixed = out_uncond + scale * (out_cond - out_uncond)
        return ins["from_tm"](mixed, bs, nt, nj, nf)

    return precompute_cfg, guided
