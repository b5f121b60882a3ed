"""Action-to-motion benchmark (HumanAct12 / UESTC).

Functional parity surface with the reference a2m evaluation
(reference: eval/eval_humanact12_uestc.py:18-80 — CFG wrap, dispatch,
YAML metric dumps, debug/full modes (1000 samples x 20 seeds);
eval/a2m/gru_eval.py:19-131 — NewDataloader generating per-batch samples
and FK'ing to xyz via rot2xyz(pose_rep='rot6d', jointstype='smpl');
eval/a2m/action2motion/evaluate.py — A2MEvaluation with GRU classifier
accuracy/FID/diversity/multimodality (quota-based multimodality loop)).

TPU design: sample generation + FK + classifier forward are jitted; the
metric math is host numpy.  The reference's unseeded-randn classifier
hidden state (a nondeterminism bug) is replaced by zeros.
"""

from __future__ import annotations

import os
import sys
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gesturediffusion_tpu.eval import metrics as M
from gesturediffusion_tpu.eval.networks import (
    MotionDiscriminator,
    convert_motion_discriminator,
)
from gesturediffusion_tpu.utils import logger as log_lib


def _warn_random_classifier(
    name: str, script: str = "prepare/download_recognition_models.sh"
) -> None:
    """Loud banner when an eval classifier falls back to random frozen
    weights (mirrors eval/evaluator_wrapper.py's missing-finest.tar
    warning).  The reference protocol assumes the downloaded tars
    (reference: eval/a2m/stgcn/evaluate.py:22, eval/a2m/gru_eval.py:60);
    without them every FID/accuracy number is meaningless."""
    log_lib.log(
        f"WARNING: {name} checkpoint not found — using RANDOM frozen "
        "classifier weights; FID/accuracy/diversity are NOT comparable "
        f"to the reference protocol. Fetch the asset with {script} or "
        "point the env var at an existing tar."
    )


class A2MEvaluation:
    """GRU-classifier based accuracy/FID/diversity/multimodality."""

    def __init__(
        self,
        input_size_raw: int = 72,
        num_classes: int = 12,
        classifier_params: Optional[dict] = None,
        checkpoint_path: Optional[str] = None,
        seed: int = 0,
    ):
        self.input_size_raw = input_size_raw
        self.num_classes = num_classes
        self.classifier = MotionDiscriminator(
            input_size=input_size_raw, hidden_size=128, hidden_layer=2,
            output_size=num_classes,
        )
        self.classifier_fid = MotionDiscriminator(
            input_size=input_size_raw, hidden_size=128, hidden_layer=2,
            output_size=num_classes, return_fid_features=True,
        )
        if classifier_params is not None:
            self.params = classifier_params
        elif checkpoint_path is not None:
            self.params = self.load_torch_checkpoint(checkpoint_path)
        else:
            _warn_random_classifier("a2m GRU classifier (humanact12_gru.tar)")
            x0 = jnp.zeros((2, input_size_raw // 3, 3, 8))
            self.params = self.classifier.init(
                jax.random.PRNGKey(seed), x0, jnp.asarray([8, 8])
            )["params"]

        self._jit_logits = jax.jit(
            lambda m, l: self.classifier.apply({"params": self.params}, m, l)
        )
        self._jit_feats = jax.jit(
            lambda m, l: self.classifier_fid.apply({"params": self.params}, m, l)
        )

    @staticmethod
    def load_torch_checkpoint(path_or_ckpt) -> dict:
        """Released humanact12_gru.tar -> flax params.  Accepts a path
        or an already-`torch.load`ed checkpoint dict (single-load for
        callers that inspect the raw file, e.g.
        prepare/verify_assets.py)."""
        if isinstance(path_or_ckpt, (str, bytes, os.PathLike)):
            import torch

            ckpt = torch.load(path_or_ckpt, map_location="cpu",
                              weights_only=False)
        else:
            ckpt = path_or_ckpt
        sd = {k: v.numpy() for k, v in ckpt["model"].items()}
        return convert_motion_discriminator(sd)

    # ---------------------------------------------------------------- #
    def calculate_accuracy(self, batches) -> float:
        confusion = np.zeros((self.num_classes, self.num_classes), np.int64)
        for batch in batches:
            logits = np.asarray(
                self._jit_logits(
                    jnp.asarray(batch["output_xyz"]),
                    jnp.asarray(batch["lengths"]),
                )
            )
            pred = logits.argmax(-1)
            for label, p in zip(np.asarray(batch["y"]), pred):
                confusion[label, p] += 1
        return float(np.trace(confusion) / max(np.sum(confusion), 1))

    def compute_features(self, batches, with_labels=True):
        feats, labels = [], []
        for batch in batches:
            feats.append(
                np.asarray(
                    self._jit_feats(
                        jnp.asarray(batch["output_xyz"]),
                        jnp.asarray(batch["lengths"]),
                    )
                )
            )
            if with_labels:
                labels.append(np.asarray(batch["y"]))
        feats = np.concatenate(feats, 0)
        labels = np.concatenate(labels, 0) if with_labels else None
        return feats, labels

    @staticmethod
    def diversity_multimodality(
        activations, labels, num_labels, unconstrained=False, rng=None,
        diversity_times=200, multimodality_times=20,
    ):
        """action2motion diversity + quota-based per-class multimodality."""
        rng = rng or np.random
        num_motions = activations.shape[0]
        first = rng.randint(0, num_motions, diversity_times)
        second = rng.randint(0, num_motions, diversity_times)
        diversity = float(
            np.linalg.norm(
                activations[first] - activations[second], axis=1
            ).mean()
        )

        if unconstrained or labels is None:
            return diversity, float("nan")

        multimodality = 0.0
        label_quotas = np.zeros(num_labels)
        label_quotas[np.unique(labels)] = multimodality_times
        guard = 0
        while np.any(label_quotas > 0) and guard < 10_000_000:
            guard += 1
            first_idx = rng.randint(0, num_motions)
            first_label = labels[first_idx]
            if not label_quotas[first_label]:
                continue
            second_idx = rng.randint(0, num_motions)
            while labels[second_idx] != first_label:
                second_idx = rng.randint(0, num_motions)
            label_quotas[first_label] -= 1
            multimodality += np.linalg.norm(
                activations[first_idx] - activations[second_idx]
            )
        # denominator uses ALL labels even when some are absent from the
        # sample set — reference parity (eval/a2m/stgcn/diversity.py:28
        # assigns quotas only to labels.unique(), :49 divides by
        # multimodality_times * num_labels), so small/debug runs deflate
        # multimodality exactly like the reference does
        multimodality /= multimodality_times * num_labels
        return diversity, float(multimodality)

    def evaluate(self, loaders: dict, cond_mode: str = "action") -> dict:
        metrics: dict = {}
        computed = {}
        for key, batches in loaders.items():
            batches = list(batches)
            if cond_mode != "no_cond":
                metrics[f"accuracy_{key}"] = self.calculate_accuracy(batches)
            else:
                metrics[f"accuracy_{key}"] = float("nan")
            feats, labels = self.compute_features(
                batches, with_labels=cond_mode != "no_cond"
            )
            stats = M.calculate_activation_statistics(feats)
            computed[key] = {"feats": feats, "labels": labels, "stats": stats}
            div, mm = self.diversity_multimodality(
                feats, labels, self.num_classes,
                unconstrained=cond_mode == "no_cond",
            )
            metrics[f"diversity_{key}"] = div
            metrics[f"multimodality_{key}"] = mm

        gt_mu, gt_cov = computed["gt"]["stats"]
        for key in computed:
            mu, cov = computed[key]["stats"]
            metrics[f"fid_{key}"] = M.calculate_frechet_distance(
                gt_mu, gt_cov, mu, cov
            )
        return metrics


class STGCNA2MEvaluation(A2MEvaluation):
    """UESTC evaluation: ST-GCN classifier on rot6d joint features
    (reference: eval/a2m/stgcn_eval.py + eval/a2m/stgcn/evaluate.py —
    in_channels=6, layout 'smpl', 10-block recognition variant; the
    classifier consumes batch['output'][:, :-1], i.e. rotations without
    the translation row)."""

    def __init__(
        self,
        num_classes: int = 40,
        in_channels: int = 6,
        variables: Optional[dict] = None,
        checkpoint_path: Optional[str] = None,
        seed: int = 0,
    ):
        from gesturediffusion_tpu.eval.stgcn import STGCN

        self.num_classes = num_classes
        self.model = STGCN(
            in_channels=in_channels, num_class=num_classes, layout="smpl",
            strategy="spatial", edge_importance_weighting=True,
            variant="recognition",
        )
        if variables is not None:
            self.variables = variables
        elif checkpoint_path is not None:
            from gesturediffusion_tpu.eval.stgcn import (
                load_stgcn_checkpoint,
            )

            self.variables = load_stgcn_checkpoint(checkpoint_path)
        else:
            _warn_random_classifier(
                "UESTC STGCN classifier (uestc_rot6d_stgcn.tar)"
            )
            x0 = jnp.zeros((2, in_channels, 16, 24))
            self.variables = self.model.init(jax.random.PRNGKey(seed), x0)

        def fwd(batch_rot):  # [B, 24, 6, T] -> [B, 6, T, 24]
            x = batch_rot.transpose(0, 2, 3, 1)
            return self.model.apply(self.variables, x, return_features=True)

        self._jit_fwd = jax.jit(fwd)

    def calculate_accuracy(self, batches) -> float:
        confusion = np.zeros((self.num_classes, self.num_classes), np.int64)
        for batch in batches:
            logits, _ = self._jit_fwd(jnp.asarray(batch["output_rot"]))
            pred = np.asarray(logits).argmax(-1)
            for label, p in zip(np.asarray(batch["y"]), pred):
                confusion[label, p] += 1
        return float(np.trace(confusion) / max(np.sum(confusion), 1))

    def compute_features(self, batches, with_labels=True):
        feats, labels = [], []
        for batch in batches:
            _, f = self._jit_fwd(jnp.asarray(batch["output_rot"]))
            feats.append(np.asarray(f))
            if with_labels:
                labels.append(np.asarray(batch["y"]))
        feats = np.concatenate(feats, 0)
        labels = np.concatenate(labels, 0) if with_labels else None
        return feats, labels


def _batch_indices(n: int, batch_size: int):
    """Full-size index blocks covering n samples; the last block is padded
    to batch_size (keeping jit shapes static) with a `keep` count so the
    caller can truncate host-side (reference: stgcn_eval.py:68-71 truncates
    the last batch to num_samples % batch_size)."""
    for lo in range(0, n, batch_size):
        keep = min(batch_size, n - lo)
        idxs = list(range(lo, lo + keep))
        idxs += [idxs[-1]] * (batch_size - keep)
        yield idxs, keep


def make_generated_batches(
    sample_fn: Callable,
    fk_fn: Callable,
    dataset,
    num_samples: int,
    batch_size: int,
    num_frames: int,
    seed: int = 0,
) -> list[dict]:
    """NewDataloader('gen') equivalent: sample -> FK -> classifier batches."""
    from gesturediffusion_tpu.data.a2m import collate_a2m

    rng = jax.random.PRNGKey(seed)
    batches = []
    n = min(num_samples, len(dataset))
    for idxs, keep in _batch_indices(n, batch_size):
        items = [dataset[i] for i in idxs]
        motion, cond = collate_a2m(items, max_frames=num_frames)
        dcond = {
            "mask": jnp.asarray(cond["mask"]),
            "lengths": jnp.asarray(cond["lengths"]),
            "action": jnp.asarray(cond["action"]),
        }
        rng, srng = jax.random.split(rng)
        sample = sample_fn(srng, motion.shape, dcond)
        xyz = fk_fn(sample)
        batches.append(
            {
                "output_xyz": np.asarray(xyz)[:keep],
                # rotations minus the translation row (STGCN eval input)
                "output_rot": np.asarray(sample)[:keep, :-1],
                "lengths": cond["lengths"][:keep],
                "y": cond["action"][:keep],
            }
        )
    return batches


def make_gt_batches(
    fk_fn: Callable, dataset, num_samples: int, batch_size: int,
    num_frames: int,
) -> list[dict]:
    from gesturediffusion_tpu.data.a2m import collate_a2m

    batches = []
    n = min(num_samples, len(dataset))
    for idxs, keep in _batch_indices(n, batch_size):
        items = [dataset[i] for i in idxs]
        motion, cond = collate_a2m(items, max_frames=num_frames)
        xyz = fk_fn(jnp.asarray(motion))
        batches.append(
            {
                "output_xyz": np.asarray(xyz)[:keep],
                "output_rot": motion[:keep, :-1],
                "lengths": cond["lengths"][:keep],
                "y": cond["action"][:keep],
            }
        )
    return batches


def evaluate_humanact12(
    sample_fn,
    fk_fn,
    dataset,
    evaluation: A2MEvaluation,
    num_seeds: int = 20,
    num_samples: int = 1000,
    batch_size: int = 64,
    num_frames: int = 60,
    cond_mode: str = "action",
    log=print,
) -> dict:
    """Multi-seed evaluation loop (reference: gru_eval.py:76-102)."""
    all_metrics: dict = {}
    for seed in range(num_seeds):
        dataset.reset_shuffle()
        dataset.shuffle()
        gt_batches = make_gt_batches(
            fk_fn, dataset, num_samples, batch_size, num_frames
        )
        gen_batches = make_generated_batches(
            sample_fn, fk_fn, dataset, num_samples, batch_size, num_frames,
            seed=seed,
        )
        metrics = evaluation.evaluate(
            {"gt": gt_batches, "gen": gen_batches}, cond_mode=cond_mode
        )
        log(f"[seed {seed}] {metrics}")
        for k, v in metrics.items():
            all_metrics.setdefault(k, []).append(v)
    summary = {}
    for k, values in all_metrics.items():
        mean, conf = M.get_metric_statistics(np.asarray(values), num_seeds)
        summary[k] = float(mean)
        summary[f"{k}_conf"] = float(conf)
    return summary


def evaluate_uestc(
    sample_fn,
    fk_fn,
    dataset,
    evaluation: STGCNA2MEvaluation,
    num_seeds: int = 20,
    num_samples: int = 1000,
    batch_size: int = 64,
    num_frames: int = 60,
    cond_mode: str = "action",
    log=print,
) -> dict:
    """UESTC multi-seed evaluation over BOTH the train and test GT splits
    (reference: eval/a2m/stgcn_eval.py:78-147 — per-seed shuffles, gt+gen
    loaders per split, STGCN accuracy/FID/diversity/multimodality, metric
    keys suffixed `_train`/`_test`)."""
    from gesturediffusion_tpu.data.a2m import A2MSplitView

    splits = {key: A2MSplitView(dataset, key) for key in ("train", "test")}

    all_metrics: dict = {}
    for seed in range(num_seeds):
        per_seed = {}
        for key, ds in splits.items():
            ds.reset_shuffle()
            ds.shuffle()
            gt_batches = make_gt_batches(
                fk_fn, ds, num_samples, batch_size, num_frames
            )
            gen_batches = make_generated_batches(
                sample_fn, fk_fn, ds, num_samples, batch_size, num_frames,
                seed=seed,
            )
            metrics = evaluation.evaluate(
                {"gt": gt_batches, "gen": gen_batches}, cond_mode=cond_mode
            )
            per_seed.update({f"{k}_{key}": v for k, v in metrics.items()})
        log(f"[seed {seed}] {per_seed}")
        for k, v in per_seed.items():
            all_metrics.setdefault(k, []).append(v)
    summary = {}
    for k, values in all_metrics.items():
        mean, conf = M.get_metric_statistics(np.asarray(values), num_seeds)
        summary[k] = float(mean)
        summary[f"{k}_conf"] = float(conf)
    return summary


# SMPL-joint indices of the 15-joint openpose-like subset used by the
# unconstrained (MoDi) metrics (reference: eval/a2m/gru_eval.py:115).
UNCONSTRAINED_15_JOINTS = [15, 12, 16, 18, 20, 17, 19, 21, 0, 1, 4, 7, 2, 5, 8]


def evaluate_unconstrained_branch(
    sample_fn,
    fk_fn,
    dataset,
    num_samples: int = 1000,
    batch_size: int = 64,
    num_frames: int = 60,
    dataset_npy_path: Optional[str] = None,
    evaluator=None,
    seed: int = 12345,
    log=print,
) -> dict:
    """MoDi-STGCN FID/KID/diversity on unconstrained samples
    (reference: eval/a2m/gru_eval.py:106-121 — generate
    num_samples_unconstrained motions, take the 15-joint SMPL subset,
    call evaluate_unconstrained_metrics).  GT motions come from the
    precomputed modi-struct npy when available, else are derived from the
    dataset's own joints via the same FK + subset (loudly logged)."""
    from gesturediffusion_tpu.eval.eval_unconstrained import (
        evaluate_unconstrained_metrics,
    )

    dataset.reset_shuffle()
    dataset.shuffle()
    gen_batches = make_generated_batches(
        sample_fn, fk_fn, dataset, num_samples, batch_size, num_frames,
        seed=seed,
    )
    generated = np.concatenate(
        [b["output_xyz"][:, UNCONSTRAINED_15_JOINTS] for b in gen_batches]
    )

    if dataset_npy_path and os.path.exists(dataset_npy_path):
        motion_data = np.load(dataset_npy_path, allow_pickle=True)
    else:
        log(
            "WARNING: unconstrained GT npy not found at "
            f"[{dataset_npy_path}]; deriving 15-joint GT motions from the "
            "dataset via FK (metric values will differ from the reference "
            "protocol until the asset is provided)."
        )
        gt_batches = make_gt_batches(
            fk_fn, dataset, num_samples, batch_size, num_frames
        )
        motion_data = np.concatenate(
            [b["output_xyz"][:, UNCONSTRAINED_15_JOINTS] for b in gt_batches]
        )
    metrics = evaluate_unconstrained_metrics(
        generated, motion_data, evaluator=evaluator, fast=True, log=log
    )
    return {f"{k}_unconstrained": v for k, v in metrics.items()}


def save_metrics(path: str, metrics: dict) -> None:
    """YAML metric dump (reference: eval/a2m/tools.py:11)."""
    import yaml

    with open(path, "w") as f:
        yaml.safe_dump(metrics, f)


EVAL_MODES_A2M = {
    # reference: eval_humanact12_uestc.py:58-63
    "debug": dict(num_seeds=2, num_samples=64),
    "full": dict(num_seeds=20, num_samples=1000),
}


def _existing(path: Optional[str]) -> Optional[str]:
    return path if path and os.path.exists(path) else None


def _require_classifier(
    path: Optional[str], env_var: str, default: str,
    eval_mode: Optional[str],
    script: str = "prepare/download_recognition_models.sh",
) -> Optional[str]:
    """Full-protocol a2m runs refuse to proceed without the real
    classifier tar (random-init weights would silently produce garbage
    FID/accuracy — the reference protocol assumes the downloaded assets,
    reference: eval/a2m/stgcn/evaluate.py:22).  Debug / in-training runs
    fall through to the ctor's loud random-init warning instead."""
    if path is None and eval_mode == "full":
        raise FileNotFoundError(
            f"a2m full-protocol evaluation requires the classifier "
            f"checkpoint; nothing found at ${env_var} "
            f"(default: {default}). Fetch it with {script}, or use "
            "--eval_mode debug for a smoke run with random-init weights."
        )
    return path


def make_a2m_evaluation(dataset_name: str, eval_mode: Optional[str] = None):
    """Benchmark-evaluation object for an a2m dataset, resolving the
    classifier checkpoint from its env var / default asset path in ONE
    place (shared by the CLI and the in-training eval hook).

    uestc -> STGCNA2MEvaluation over $UESTC_STGCN_PATH
    (reference: eval/a2m/stgcn_eval.py:87-95); anything else ->
    A2MEvaluation over $A2M_CLASSIFIER_PATH
    (reference: eval/a2m/gru_eval.py:60-68).

    eval_mode='full' refuses to run without the real checkpoint; any
    other mode warns loudly and proceeds on random-init weights."""
    if dataset_name == "uestc":
        env_var, default = (
            "UESTC_STGCN_PATH",
            "assets/actionrecognition/uestc_rot6d_stgcn.tar",
        )
        return STGCNA2MEvaluation(
            checkpoint_path=_require_classifier(
                _existing(os.environ.get(env_var, default)),
                env_var, default, eval_mode,
            ),
        )
    env_var, default = (
        "A2M_CLASSIFIER_PATH",
        "assets/actionrecognition/humanact12_gru.tar",
    )
    return A2MEvaluation(
        checkpoint_path=_require_classifier(
            _existing(os.environ.get(env_var, default)),
            env_var, default, eval_mode,
        ),
    )


def make_a2m_training_eval_fn(args, model, diffusion, dataset, log=None):
    """In-training a2m benchmark hook (reference: training_loop.py:188-199
    — num_seeds=eval_rep_times, num_samples=eval_num_samples, guidance 1).

    Returns eval_fn(state, step) -> {metric: float}.  Raises at
    construction when the SMPL model (needed for FK) is unavailable so
    the caller can fall back to val-loss eval.
    """
    import functools

    from gesturediffusion_tpu.diffusion.sampling import p_sample_loop
    from gesturediffusion_tpu.models.rotation2xyz import rotation2xyz
    from gesturediffusion_tpu.models.smpl import load_smpl_pickle
    from gesturediffusion_tpu.utils import logger as log_lib_

    log = log or log_lib_.log
    smpl = load_smpl_pickle(
        os.environ.get("SMPL_MODEL_PATH", "body_models/smpl/SMPL_NEUTRAL.pkl")
    )

    evaluation_obj = make_a2m_evaluation(args.dataset)

    num_frames = 60

    @functools.partial(jax.jit, static_argnums=2)
    def sample_with_params(params, rng, shape, cond):
        return p_sample_loop(
            diffusion,
            lambda x, t, c: model.apply(params, x, t, c),
            shape, rng, cond, clip_denoised=False,
        )

    @jax.jit
    def fk_fn(sample):
        return rotation2xyz(
            smpl, sample, pose_rep="rot6d", translation=True, glob=True,
            jointstype="smpl", vertstrans=True,
        )

    num_seeds = getattr(args, "eval_rep_times", 3)
    num_samples = getattr(args, "eval_num_samples", 1_000)
    batch_size = getattr(args, "eval_batch_size", 32)
    cond_mode = "no_cond" if getattr(args, "unconstrained", False) else "action"

    def eval_fn(state, step):
        params = (
            state.ema_params
            if getattr(state, "ema_params", None)
            else state.params
        )
        sample_fn = functools.partial(sample_with_params, params)
        evaluate = (
            evaluate_uestc if args.dataset == "uestc" else evaluate_humanact12
        )
        summary = evaluate(
            sample_fn, fk_fn, dataset, evaluation_obj,
            num_seeds=num_seeds, num_samples=num_samples,
            batch_size=batch_size, num_frames=num_frames,
            cond_mode=cond_mode, log=log,
        )
        return {k: float(v) for k, v in summary.items()
                if np.isfinite(v)}

    return eval_fn


def main(argv=None):
    from gesturediffusion_tpu.diffusion.sampling import p_sample_loop
    from gesturediffusion_tpu.models.cfg import classifier_free_guidance
    from gesturediffusion_tpu.models.rotation2xyz import rotation2xyz
    from gesturediffusion_tpu.models.smpl import load_smpl_pickle
    from gesturediffusion_tpu.utils.cache import enable_compilation_cache
    from gesturediffusion_tpu.utils.checkpoint import load_checkpoint
    from gesturediffusion_tpu.utils.fixseed import fixseed
    from gesturediffusion_tpu.utils.model_factory import (
        create_model_and_diffusion,
    )
    from gesturediffusion_tpu.utils.parser import evaluation_parser

    args = evaluation_parser(argv)
    fixseed(args.seed)
    from gesturediffusion_tpu.utils.fixseed import set_prng_impl

    set_prng_impl(getattr(args, "prng", "rbg"))
    enable_compilation_cache()
    if args.eval_mode not in EVAL_MODES_A2M:
        # the reference raises on unsupported modes too
        # (eval_humanact12_uestc.py:58)
        raise ValueError(
            f"eval_mode {args.eval_mode!r} unsupported for a2m; "
            f"choose from {sorted(EVAL_MODES_A2M)}"
        )
    mode = EVAL_MODES_A2M[args.eval_mode]

    # dataset dispatch (reference: eval_humanact12_uestc.py:30-35)
    if args.dataset == "uestc":
        from gesturediffusion_tpu.data.uestc import UESTC

        dataset = UESTC(
            args.data_dir or "dataset/uestc",
            num_frames=60, pose_rep="rot6d", split="test",
        )
    elif args.dataset == "humanact12":
        from gesturediffusion_tpu.data.a2m import HumanAct12Poses

        dataset = HumanAct12Poses(
            args.data_dir or "dataset/HumanAct12Poses",
            num_frames=60, pose_rep="rot6d", split="test",
        )
    else:
        raise NotImplementedError(
            f"dataset [{args.dataset}] is not supported by the a2m "
            "benchmark (expected humanact12 or uestc)."
        )
    model, diffusion = create_model_and_diffusion(args, dataset)
    params = load_checkpoint(args.model_path, model=model)["params"]

    smpl_path = os.environ.get(
        "SMPL_MODEL_PATH", "body_models/smpl/SMPL_NEUTRAL.pkl"
    )
    smpl = load_smpl_pickle(smpl_path)

    def base_model_fn(x, t, c):
        return model.apply(params, x, t, c)

    model_fn = (
        classifier_free_guidance(base_model_fn, args.cond_mask_prob)
        if args.guidance_param != 1
        else base_model_fn
    )

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def sample_fn(rng, shape, cond):
        if args.guidance_param != 1:
            cond = {**cond, "scale": jnp.full(
                (shape[0],), args.guidance_param)}
        return p_sample_loop(
            diffusion, model_fn, shape, rng, cond, clip_denoised=False
        )

    @jax.jit
    def fk_fn(sample):
        return rotation2xyz(
            smpl, sample, pose_rep="rot6d", translation=True, glob=True,
            jointstype="smpl", vertstrans=True,
        )

    cond_mode = "no_cond" if args.unconstrained else "action"
    evaluation = make_a2m_evaluation(args.dataset, eval_mode=args.eval_mode)
    if args.dataset == "uestc":
        summary = evaluate_uestc(
            sample_fn, fk_fn, dataset, evaluation,
            num_seeds=mode["num_seeds"], num_samples=mode["num_samples"],
            batch_size=args.batch_size, cond_mode=cond_mode,
            log=log_lib.log,
        )
    else:
        summary = evaluate_humanact12(
            sample_fn, fk_fn, dataset, evaluation,
            num_seeds=mode["num_seeds"], num_samples=mode["num_samples"],
            batch_size=args.batch_size, cond_mode=cond_mode,
            log=log_lib.log,
        )
        if args.unconstrained:
            from gesturediffusion_tpu.eval.eval_unconstrained import (
                UnconstrainedEvaluator,
            )

            # full protocol uses 1000 unconstrained samples, matching
            # the mode table (reference: gru_eval.py:17,112)
            n_unconstrained = mode["num_samples"]
            modi_env, modi_default = (
                "MODI_STGCN_PATH",
                "assets/actionrecognition/"
                "humanact12_gru_modi_struct.pth.tar",
            )
            evaluator = UnconstrainedEvaluator(
                checkpoint_path=_require_classifier(
                    _existing(os.environ.get(modi_env, modi_default)),
                    modi_env, modi_default, args.eval_mode,
                    script=(
                        "prepare/"
                        "download_recognition_unconstrained_models.sh"
                    ),
                ),
            )
            summary.update(
                evaluate_unconstrained_branch(
                    sample_fn, fk_fn, dataset,
                    num_samples=n_unconstrained,
                    batch_size=args.batch_size,
                    dataset_npy_path=os.environ.get(
                        "UNCONSTRAINED_DATASET_PATH",
                        os.path.join(
                            args.data_dir or "dataset/HumanAct12Poses",
                            "humanact12_unconstrained_modi_struct.npy",
                        ),
                    ),
                    evaluator=evaluator,
                    log=log_lib.log,
                )
            )
    out = os.path.join(
        os.path.dirname(args.model_path),
        f"eval_{args.dataset}_{args.eval_mode}.yaml",
    )
    save_metrics(out, summary)
    log_lib.log(f"saved metrics to {out}")
    return summary


if __name__ == "__main__":
    main(sys.argv[1:])
