"""Programmatic text-to-motion predictor.

Functional parity surface with the reference Cog/Replicate predictor
(reference: sample/predict.py:31-167 — hardcoded humanml-encoder-512
config :31-50, prompt -> collate :106-107, p_sample_loop :113-125,
recover_from_ric + rot2xyz :127-139, mp4 / HumanIK JSON outputs :143-145).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gesturediffusion_tpu.diffusion import ModelMeanType, create_diffusion
from gesturediffusion_tpu.diffusion.sampling import p_sample_loop
from gesturediffusion_tpu.models.cfg import classifier_free_guidance
from gesturediffusion_tpu.models.mdm_t2m import MotionMDM
from gesturediffusion_tpu.ops.motion_process import recover_from_ric
from gesturediffusion_tpu.utils.cache import enable_compilation_cache
from gesturediffusion_tpu.utils.checkpoint import load_checkpoint


class Predictor:
    """humanml-encoder-512 text-to-motion predictor."""

    def __init__(
        self,
        model_path: str,
        dataset_root: Optional[str] = None,
        guidance_param: float = 2.5,
        num_frames: int = 196,
        model: Optional[MotionMDM] = None,
        diffusion=None,
    ):
        """``model``/``diffusion`` default to the reference predictor's
        hardcoded humanml-encoder-512 / DDPM-1000 config (reference:
        predict.py:31-50); overriding them serves other trained configs
        (and keeps tests hermetic at tiny sizes)."""
        enable_compilation_cache()
        self.num_frames = num_frames
        self.guidance_param = guidance_param

        self.model = model or MotionMDM(
            njoints=263, nfeats=1, latent_dim=512, ff_size=1024,
            num_layers=8, num_heads=4, cond_mode="text",
            cond_mask_prob=0.1,
        )
        self.njoints = self.model.njoints
        self.diffusion = diffusion or create_diffusion(
            steps=1000, noise_schedule="cosine",
            model_mean_type=ModelMeanType.START_X,
        )
        self.params = load_checkpoint(model_path, model=self.model)["params"]

        root = dataset_root or "./dataset/HumanML3D"
        mean_p, std_p = (
            os.path.join(root, "Mean.npy"), os.path.join(root, "Std.npy")
        )
        if os.path.isfile(mean_p):
            self.mean = np.load(mean_p)
            self.std = np.load(std_p)
            if self.mean.shape[0] != self.njoints:
                raise ValueError(
                    f"dataset stats at {mean_p} are "
                    f"{self.mean.shape[0]}-dim but the model expects "
                    f"{self.njoints} features — pass the dataset_root "
                    "matching this model (or none for unit stats)"
                )
        else:
            self.mean = np.zeros(self.njoints, np.float32)
            self.std = np.ones(self.njoints, np.float32)

        from gesturediffusion_tpu.utils.text_embedder import get_text_encoder

        self.text_encoder = get_text_encoder()

        def base_model_fn(x, t, c):
            return self.model.apply(self.params, x, t, c)

        model_fn = (
            # the model's OWN dropout prob, so the no-CFG-without-dropout
            # guard actually fires for cond_mask_prob=0 models
            classifier_free_guidance(
                base_model_fn, self.model.cond_mask_prob
            )
            if guidance_param != 1
            else base_model_fn
        )
        self._model_fn = model_fn
        self._sample = {}  # per-shape jitted samplers

    def predict(
        self,
        prompt: str,
        num_repetitions: int = 3,
        seed: int = 0,
        motion_length: float = 6.0,
    ) -> dict:
        """prompt -> dict(motion [R, J, 3, T] xyz joints, features, length)."""
        n_frames = min(self.num_frames, int(motion_length * 20))
        b = num_repetitions
        shape = (b, self.njoints, 1, self.num_frames)

        text_emb = jnp.asarray(self.text_encoder([prompt] * b))
        cond = {
            "text_emb": text_emb,
            "mask": jnp.asarray(
                (np.arange(self.num_frames)[None] < n_frames)[:, None, None, :]
                .repeat(b, 0)
            ),
            "lengths": jnp.full((b,), n_frames, jnp.int32),
        }
        if self.guidance_param != 1:
            cond["scale"] = jnp.full((b,), self.guidance_param)

        # cache one jitted sampler per batch shape (a single cached fn
        # would silently reuse the FIRST call's shape for later calls
        # with a different num_repetitions)
        if shape not in self._sample:
            self._sample[shape] = jax.jit(
                lambda rng, c, shape=shape: p_sample_loop(
                    self.diffusion, self._model_fn, shape, rng, c,
                    clip_denoised=False,
                )
            )
        sample = self._sample[shape](jax.random.PRNGKey(seed), cond)

        feats = np.asarray(sample)[:, :, 0, :].transpose(0, 2, 1)
        feats = feats * self.std + self.mean
        # humanml codec: feature dim = 12*J - 1 (root 4 + ric 3(J-1) +
        # rot 6(J-1) + vel 3J + foot 4), so J recovers from njoints
        n_joints = (self.njoints + 1) // 12
        xyz = np.asarray(
            recover_from_ric(jnp.asarray(feats, jnp.float32), n_joints)
        )  # [R, T, J, 3]
        return {
            "motion_xyz": xyz[:, :n_frames].transpose(0, 2, 3, 1),
            "features": feats[:, :n_frames],
            "length": n_frames,
            "prompt": prompt,
        }


def main(argv=None):
    """CLI front end for the Predictor (the reference serves this via
    cog, cog.yaml + predict.py:60-167; here it is a plain command):

        python -m gesturediffusion_tpu.sample.predict \\
            --model_path save/run/model000600000 \\
            --text "a person walks forward" --num_repetitions 3
    """
    import argparse
    import json
    import os

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--text", required=True, help="text prompt")
    ap.add_argument("--num_repetitions", type=int, default=3)
    ap.add_argument("--motion_length", type=float, default=6.0,
                    help="seconds (reference predict.py caps at 9.8)")
    ap.add_argument("--guidance_param", type=float, default=2.5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dataset_root", default="",
                    help="dataset dir with Mean.npy/Std.npy (optional)")
    ap.add_argument("--output_dir", default="")
    # small-config overrides (the reference hardcodes humanml-512)
    ap.add_argument("--latent_dim", type=int, default=512)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--njoints", type=int, default=263)
    ap.add_argument("--ff_size", type=int, default=1024)
    ap.add_argument("--diffusion_steps", type=int, default=1000)
    args = ap.parse_args(argv)

    from gesturediffusion_tpu.diffusion import (
        ModelMeanType,
        create_diffusion,
    )
    from gesturediffusion_tpu.utils.parser import default_output_dir

    model = MotionMDM(
        njoints=args.njoints, nfeats=1, latent_dim=args.latent_dim,
        ff_size=args.ff_size, num_layers=args.layers, num_heads=4,
        cond_mode="text", cond_mask_prob=0.1,
    )
    diffusion = create_diffusion(
        steps=args.diffusion_steps, noise_schedule="cosine",
        model_mean_type=ModelMeanType.START_X,
    )
    predictor = Predictor(
        args.model_path, guidance_param=args.guidance_param,
        dataset_root=args.dataset_root or None,
        model=model, diffusion=diffusion,
    )
    out = predictor.predict(
        args.text, num_repetitions=args.num_repetitions,
        seed=args.seed, motion_length=args.motion_length,
    )

    out_path = args.output_dir or default_output_dir(
        args.model_path, "predict", f"seed{args.seed}"
    )
    os.makedirs(out_path, exist_ok=True)
    np.save(os.path.join(out_path, "results.npy"), {
        "motion": out["motion_xyz"],
        "text": [args.text] * args.num_repetitions,
        "lengths": np.full((args.num_repetitions,), out["length"]),
        "num_samples": args.num_repetitions,
    })
    with open(os.path.join(out_path, "results.txt"), "w") as f:
        f.write("\n".join([args.text] * args.num_repetitions))
    print(json.dumps({
        "output_dir": os.path.abspath(out_path),
        "frames": out["length"],
        "repetitions": args.num_repetitions,
    }))
    return out_path


if __name__ == "__main__":
    import sys

    main(sys.argv[1:])
