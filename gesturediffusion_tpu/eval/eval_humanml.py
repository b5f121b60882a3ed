"""Text-to-motion benchmark driver.

Functional parity surface with the reference benchmark
(reference: eval/eval_humanml.py — evaluate_matching_score:19,
evaluate_fid:72, evaluate_diversity:98, evaluate_multimodality:109,
get_metric_statistics:131, evaluation:138, eval modes :244-267;
data_loaders/humanml/motion_loaders/comp_v6_model_dataset.py —
CompMDMGeneratedDataset:146 with the evaluator-convention renorm
:246-250).

TPU design: sample generation runs as jitted scan chains with batched CFG
(the dominant cost — ~1000 samples x 1000 steps); metric math stays on
host over small embedding matrices.
"""

from __future__ import annotations

import os
import sys
from collections import OrderedDict
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gesturediffusion_tpu.eval import metrics as M
from gesturediffusion_tpu.eval.evaluator_wrapper import EvaluatorWrapper
from gesturediffusion_tpu.utils import logger as log_lib


def collate_humanml_eval(items, max_frames: int = 196):
    """Collate eval items -> dict with motions [B, T, D] + text features."""
    b = len(items)
    d = items[0]["motion"].shape[-1]
    motions = np.zeros((b, max_frames, d), np.float32)
    lengths = np.zeros((b,), np.int32)
    for i, it in enumerate(items):
        t = min(it["motion"].shape[0], max_frames)
        motions[i, :t] = it["motion"][:t]
        lengths[i] = it["length"]
    out = {
        "motions": motions,
        "m_lens": lengths,
        "captions": [it["text"] for it in items],
    }
    if "word_embeddings" in items[0]:
        out["word_embs"] = np.stack([it["word_embeddings"] for it in items])
        out["pos_ohot"] = np.stack([it["pos_one_hots"] for it in items])
        out["cap_lens"] = np.asarray([it["sent_len"] for it in items])
    return out


class GroundTruthMotionSet:
    """Batches of ground-truth eval items.

    ``cache=True`` materializes the batches once (the dataset re-crops
    randomly per access, like the reference's DataLoader; caching gives a
    fixed GT set within one evaluation run).
    """

    def __init__(self, dataset, batch_size: int = 32, max_frames: int = 196,
                 cache: bool = False, renorm: Optional[tuple] = None):
        """``renorm``: same (our_mean, our_std, ev_mean, ev_std) tuple as
        GeneratedMotionSet — the reference's GT loader normalizes with
        the EVALUATOR's stats (dataset_motion_loader.py:15-16 loads
        opt.meta_dir mean/std), so GT must be renormed exactly like the
        generated motions or FID compares two conventions."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_frames = max_frames
        self.renorm = renorm
        self._cached = None
        if cache:
            self._cached = list(self._generate())

    def _generate(self):
        n = len(self.dataset)
        for lo in range(0, n - self.batch_size + 1, self.batch_size):
            items = [self.dataset[i] for i in range(lo, lo + self.batch_size)]
            batch = collate_humanml_eval(items, self.max_frames)
            if self.renorm is not None:
                our_mean, our_std, ev_mean, ev_std = self.renorm
                batch["motions"] = (
                    batch["motions"] * our_std + our_mean - ev_mean
                ) / ev_std
            yield batch

    def __iter__(self):
        if self._cached is not None:
            return iter(self._cached)
        return self._generate()


class GeneratedMotionSet:
    """Sample the model over the eval split and serve evaluator batches.

    Mirrors CompMDMGeneratedDataset: one p_sample_loop per batch (here a
    single on-device scan), optional multimodality repeats, renorm to the
    evaluator's normalization convention.
    """

    def __init__(
        self,
        sample_fn,
        dataset,
        text_encoder=None,
        batch_size: int = 32,
        max_frames: int = 196,
        mm_num_samples: int = 0,
        mm_num_repeats: int = 0,
        scale: float = 1.0,
        # (our_mean, our_std, eval_mean, eval_std): convert generated
        # motions from the training normalization to the frozen
        # evaluator's convention (reference: comp_v6_model_dataset.py:246)
        renorm: Optional[tuple] = None,
        seed: int = 0,
        num_samples_limit: Optional[int] = None,
    ):
        self.batches = []
        self.mm_batches = []
        rng = jax.random.PRNGKey(seed)
        n = len(dataset)
        if num_samples_limit:
            n = min(n, num_samples_limit)
        n_batches = n // batch_size
        # mm_num_samples counts SAMPLES; pick mm_num_samples//bs + 1
        # batches (reference: comp_v6_model_dataset.py:166-167)
        n_mm_batches = (
            min(mm_num_samples // batch_size + 1, n_batches)
            if mm_num_samples > 0
            else 0
        )
        mm_idxs = (
            np.random.RandomState(seed).choice(
                n_batches, n_mm_batches, replace=False
            )
            if n_mm_batches
            else []
        )

        for bi in range(n_batches):
            items = [
                dataset[i] for i in range(bi * batch_size, (bi + 1) * batch_size)
            ]
            batch = collate_humanml_eval(items, max_frames)
            cond = {
                "mask": (
                    np.arange(max_frames)[None] < batch["m_lens"][:, None]
                )[:, None, None, :],
                "lengths": batch["m_lens"],
            }
            if text_encoder is not None:
                cond["text_emb"] = np.asarray(text_encoder(batch["captions"]))
            if scale != 1.0:
                cond["scale"] = np.full((batch_size,), scale, np.float32)
            dcond = {k: jnp.asarray(v) for k, v in cond.items()}

            repeats = mm_num_repeats if bi in mm_idxs else 1
            reps = []
            for r in range(repeats):
                rng, srng = jax.random.split(rng)
                sample = sample_fn(srng, dcond)  # [B, D, 1, T]
                motions = np.asarray(sample)[:, :, 0, :].transpose(0, 2, 1)
                if renorm is not None:
                    our_mean, our_std, ev_mean, ev_std = renorm
                    motions = (
                        motions * our_std + our_mean - ev_mean
                    ) / ev_std
                reps.append(motions)
            out = dict(batch)
            out["motions"] = reps[0]
            self.batches.append(out)
            if repeats > 1:
                self.mm_batches.append(
                    {"motions": np.stack(reps, 1), "m_lens": batch["m_lens"]}
                )

    def __iter__(self):
        return iter(self.batches)


# ---------------------------------------------------------------------- #
# metric passes (reference: eval_humanml.py:19-135)
# ---------------------------------------------------------------------- #
def evaluate_matching_score(eval_wrapper, motion_loaders, log=print):
    match_score_dict = OrderedDict()
    r_precision_dict = OrderedDict()
    activation_dict = OrderedDict()
    for name, loader in motion_loaders.items():
        all_motion_embeddings = []
        score_list = []
        all_size = 0
        matching_score_sum = 0
        top_k_count = 0
        for batch in loader:
            text_emb, motion_emb = eval_wrapper.get_co_embeddings(
                batch["word_embs"], batch["pos_ohot"], batch["cap_lens"],
                batch["motions"], batch["m_lens"],
            )
            dist_mat = M.euclidean_distance_matrix(text_emb, motion_emb)
            matching_score_sum += dist_mat.trace()
            argsmax = np.argsort(dist_mat, axis=1)
            top_k_mat = M.calculate_top_k(argsmax, top_k=3)
            top_k_count += top_k_mat.sum(axis=0)
            all_size += text_emb.shape[0]
            all_motion_embeddings.append(motion_emb)

        if all_size == 0:
            raise ValueError(
                f"motion loader {name!r} yielded no batches — the split "
                "is smaller than the fixed R-precision batch size (32); "
                "use a larger dataset (reference: eval_humanml.py:232 "
                "asserts batch_size 32)"
            )
        matching_score = matching_score_sum / all_size
        r_precision = top_k_count / all_size
        match_score_dict[name] = matching_score
        r_precision_dict[name] = r_precision
        activation_dict[name] = np.concatenate(all_motion_embeddings, axis=0)
        log(f"---> [{name}] Matching Score: {matching_score:.4f}")
        for i, v in enumerate(r_precision):
            log(f"---> [{name}] R_precision: (top {i+1}): {v:.4f}")
    return match_score_dict, r_precision_dict, activation_dict


def evaluate_fid(eval_wrapper, groundtruth_loader, activation_dict, log=print):
    gt_motion_embeddings = []
    for batch in groundtruth_loader:
        emb = eval_wrapper.get_motion_embeddings(
            batch["motions"], batch["m_lens"]
        )
        gt_motion_embeddings.append(emb)
    gt_motion_embeddings = np.concatenate(gt_motion_embeddings, axis=0)
    gt_mu, gt_cov = M.calculate_activation_statistics(gt_motion_embeddings)

    eval_dict = OrderedDict()
    for name, activations in activation_dict.items():
        mu, cov = M.calculate_activation_statistics(activations)
        fid = M.calculate_frechet_distance(gt_mu, gt_cov, mu, cov)
        log(f"---> [{name}] FID: {fid:.4f}")
        eval_dict[name] = fid
    return eval_dict


def evaluate_diversity(activation_dict, diversity_times=300, log=print):
    eval_dict = OrderedDict()
    for name, activations in activation_dict.items():
        dt = min(diversity_times, activations.shape[0] - 1)
        diversity = M.calculate_diversity(activations, dt)
        eval_dict[name] = diversity
        log(f"---> [{name}] Diversity: {diversity:.4f}")
    return eval_dict


def evaluate_multimodality(eval_wrapper, mm_motion_loaders,
                           mm_num_times=10, log=print):
    eval_dict = OrderedDict()
    for name, loader in mm_motion_loaders.items():
        embs = []
        for batch in loader:
            reps = batch["motions"]  # [B, R, T, D]
            b, r = reps.shape[:2]
            flat = reps.reshape(b * r, *reps.shape[2:])
            lens = np.repeat(batch["m_lens"], r)
            # keep_order: the [b, r] regroup below requires input order
            emb = eval_wrapper.get_motion_embeddings(flat, lens,
                                                     keep_order=True)
            embs.append(emb.reshape(b, r, -1))
        if not embs:
            eval_dict[name] = 0.0
            continue
        embs = np.concatenate(embs, axis=0)
        mm = M.calculate_multimodality(
            embs, min(mm_num_times, embs.shape[1] - 1)
        )
        eval_dict[name] = mm
        log(f"---> [{name}] Multimodality: {mm:.4f}")
    return eval_dict


def evaluation(
    eval_wrapper: EvaluatorWrapper,
    gt_loader,
    eval_motion_loaders: dict,
    log_file: str,
    replication_times: int,
    diversity_times: int = 300,
    mm_num_times: int = 10,
    run_mm: bool = False,
) -> dict:
    """N-replication evaluation -> mean ± 95% CI per metric
    (reference: eval_humanml.py:138-226)."""
    with open(log_file, "w") as f:

        def log(msg):
            print(msg)
            print(msg, file=f, flush=True)

        all_metrics = OrderedDict(
            {
                "Matching Score": OrderedDict(),
                "R_precision": OrderedDict(),
                "FID": OrderedDict(),
                "Diversity": OrderedDict(),
                "MultiModality": OrderedDict(),
            }
        )
        for replication in range(replication_times):
            motion_loaders = {"ground truth": gt_loader}
            mm_motion_loaders = {}
            for name, make_loader in eval_motion_loaders.items():
                loader, mm_loader = make_loader(replication)
                motion_loaders[name] = loader
                mm_motion_loaders[name] = mm_loader
            log(f"==================== Replication {replication} "
                f"====================")
            match, rprec, acti = evaluate_matching_score(
                eval_wrapper, motion_loaders, log
            )
            fid = evaluate_fid(eval_wrapper, gt_loader, acti, log)
            div = evaluate_diversity(acti, diversity_times, log)
            mm = (
                evaluate_multimodality(
                    eval_wrapper, mm_motion_loaders, mm_num_times, log
                )
                if run_mm
                else {}
            )
            for key, d in [
                ("Matching Score", match),
                ("R_precision", rprec),
                ("FID", fid),
                ("Diversity", div),
                ("MultiModality", mm),
            ]:
                for name, value in d.items():
                    all_metrics[key].setdefault(name, []).append(value)

        mean_dict = {}
        for metric_name, metric_dict in all_metrics.items():
            log(f"========== {metric_name} Summary ==========")
            for model_name, values in metric_dict.items():
                mean, conf = M.get_metric_statistics(
                    np.asarray(values), replication_times
                )
                mean_dict[f"{metric_name}_{model_name}"] = mean
                log(f"---> [{model_name}] Mean: {mean} CInterval: {conf}")
        return mean_dict


EVAL_MODES = {
    # reference: eval_humanml.py:244-267
    "debug": dict(num_samples_limit=1000, run_mm=False, mm_num_samples=0,
                  mm_num_repeats=0, mm_num_times=0, diversity_times=300,
                  replication_times=5),
    "wo_mm": dict(num_samples_limit=1000, run_mm=False, mm_num_samples=0,
                  mm_num_repeats=0, mm_num_times=0, diversity_times=300,
                  replication_times=20),
    "mm_short": dict(num_samples_limit=1000, run_mm=True, mm_num_samples=100,
                     mm_num_repeats=30, mm_num_times=10, diversity_times=300,
                     replication_times=5),
}


def load_eval_renorm(dataset, log=None, dataset_name="humanml"):
    """(our_mean, our_std, eval_mean, eval_std) renorm tuple when the T2M
    evaluator stats ship at dataset/{t2m|kit}_{mean,std}.npy; None (with a
    loud log) otherwise.  Both files must exist.  Stats are per-dataset —
    t2m_* for HumanML3D (263-dim), kit_* for KIT (251-dim) — matching the
    reference's `{opt.dataset_name}_mean.npy` convention
    (reference: data_loaders/humanml/data/dataset.py:756)."""
    log = log or log_lib.log
    prefix = "kit" if dataset_name == "kit" else "t2m"
    # cwd first (reference convention: repo-root `dataset/`), then the
    # stats this package ships (dataset/ next to the package dir), so
    # the renorm works out of the box regardless of invocation dir
    repo_dataset = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        "dataset",
    )
    for d in ("dataset", repo_dataset):
        mean_p = os.path.join(d, f"{prefix}_mean.npy")
        std_p = os.path.join(d, f"{prefix}_std.npy")
        if os.path.isfile(mean_p) and os.path.isfile(std_p):
            ev_mean, ev_std = np.load(mean_p), np.load(std_p)
            if ev_mean.shape != np.shape(dataset.mean):
                # dimension mismatch (synthetic / reduced-dim stand-in in
                # this directory): try the NEXT candidate dir — a stale
                # cwd fixture must not shadow the repo-shipped real stats
                log(f"{prefix} evaluator stats at {mean_p} are "
                    f"{ev_mean.shape[0]}-dim but the dataset is "
                    f"{np.shape(dataset.mean)[0]}-dim — ignoring them")
                continue
            return (dataset.mean, dataset.std, ev_mean, ev_std)
    log(f"{prefix} evaluator norm stats not found (or none match the "
        "dataset dim) — generated motions evaluated in training "
        "normalization (NOT metric-parity)")
    return None


def make_training_eval_fn(args, model, diffusion, text_encoder=None,
                          log=None):
    """In-training benchmark eval hook for humanml/kit
    (reference: train/training_loop.py:165-202 — runs the full T2M metric
    protocol every save_interval with scale=1, mm off, diversity 300,
    `eval_rep_times` replications over `eval_num_samples` samples).

    Returns eval_fn(state, step) -> {metric: float}.  Falls back to hash
    vectorizer / training normalization with loud logs when the external
    evaluator assets are absent (pipeline still exercised end-to-end).
    """
    import functools

    from gesturediffusion_tpu.data.humanml import (
        HashVectorizer,
        Text2MotionDatasetV2,
        WordVectorizer,
    )
    from gesturediffusion_tpu.diffusion.sampling import p_sample_loop

    log = log or log_lib.log
    batch_size = 32  # R-precision protocol invariant

    try:
        w_vectorizer = WordVectorizer("./glove", "our_vab")
    except (FileNotFoundError, OSError):
        log("in-training eval: GloVe assets not found — hash vectorizer "
            "(NOT metric-parity)")
        w_vectorizer = HashVectorizer()

    root = args.data_dir or (
        "./dataset/HumanML3D" if args.dataset == "humanml"
        else "./dataset/KIT-ML"
    )
    dataset = Text2MotionDatasetV2(
        root,
        split=getattr(args, "eval_split", "test"),
        dataset_name="t2m" if args.dataset == "humanml" else "kit",
        w_vectorizer=w_vectorizer,
    )
    if len(dataset) < batch_size:
        raise ValueError(
            f"eval split has {len(dataset)} samples < protocol batch "
            f"{batch_size} — benchmark eval impossible"
        )
    renorm = load_eval_renorm(dataset, log,
                              dataset_name=args.dataset)
    gt_loader = GroundTruthMotionSet(dataset, batch_size=batch_size,
                                     renorm=renorm)
    eval_wrapper = EvaluatorWrapper(args.dataset, dim_pose=dataset.pose_dim)

    shape = (batch_size, dataset.pose_dim, 1, 196)

    @jax.jit
    def sample_with_params(params, rng, cond):
        return p_sample_loop(
            diffusion,
            lambda x, t, c: model.apply(params, x, t, c),
            shape, rng, cond, clip_denoised=False,
        )

    num_samples = getattr(args, "eval_num_samples", 1_000)
    rep_times = getattr(args, "eval_rep_times", 3)
    diversity_times = min(300, max(2, (num_samples // batch_size)
                                   * batch_size - 1))
    save_dir = getattr(args, "save_dir", ".")

    def eval_fn(state, step):
        params = (
            state.ema_params
            if getattr(state, "ema_params", None)
            else state.params
        )
        sample_fn = functools.partial(sample_with_params, params)

        def make_gen_loader(replication):
            gen = GeneratedMotionSet(
                sample_fn, dataset, text_encoder=text_encoder,
                batch_size=batch_size,
                mm_num_samples=0, mm_num_repeats=0,
                scale=1.0,  # reference in-training eval runs without CFG
                renorm=renorm, seed=replication,
                num_samples_limit=num_samples,
            )
            return gen, gen.mm_batches

        log_file = os.path.join(save_dir, f"eval_humanml_{step:09d}.log")
        mean_dict = evaluation(
            eval_wrapper, gt_loader, {"vald": make_gen_loader}, log_file,
            replication_times=rep_times, diversity_times=diversity_times,
            run_mm=False,
        )
        out = {}
        for k, v in mean_dict.items():
            arr = np.asarray(v)
            if arr.ndim == 0:
                out[k] = float(arr)
            else:  # R-precision returns top-1/2/3
                for i, vi in enumerate(arr):
                    out[f"{k}_top{i + 1}"] = float(vi)
        return out

    return eval_fn


def main(argv=None):
    from gesturediffusion_tpu.data.humanml import Text2MotionDatasetV2
    from gesturediffusion_tpu.diffusion.sampling import p_sample_loop
    from gesturediffusion_tpu.models.cfg import classifier_free_guidance
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
    args.batch_size = 32  # fixed: R-precision is defined at batch 32

    if args.eval_mode not in EVAL_MODES:
        # 'full' is an a2m-only protocol (reference raises here too)
        raise ValueError(
            f"eval_mode {args.eval_mode} unsupported for t2m; "
            f"choose from {sorted(EVAL_MODES)}"
        )
    mode_cfg = EVAL_MODES[args.eval_mode]

    name = os.path.basename(os.path.dirname(args.model_path))
    # reference niter parsing strips BOTH the prefix and the extension
    # (eval/eval_humanml.py: .replace('model','').replace('.pt',''))
    niter = (
        os.path.basename(os.path.normpath(args.model_path))
        .replace("model", "").replace(".pt", "").replace(".safetensors", "")
    )
    log_file = os.path.join(
        os.path.dirname(args.model_path),
        f"eval_humanml_{name}_{niter}_{args.eval_mode}.log",
    )

    # GloVe vectorizer when assets exist (metric parity); hash stand-in
    # keeps the pipeline runnable without them
    from gesturediffusion_tpu.data.humanml import HashVectorizer, WordVectorizer

    try:
        w_vectorizer = WordVectorizer("./glove", "our_vab")
    except (FileNotFoundError, OSError):
        log_lib.log("GloVe assets not found — using hash vectorizer "
                    "(NOT metric-parity)")
        w_vectorizer = HashVectorizer()

    root = args.data_dir or (
        "./dataset/HumanML3D" if args.dataset == "humanml"
        else "./dataset/KIT-ML"
    )
    dataset = Text2MotionDatasetV2(
        root,
        split="test",
        dataset_name="t2m" if args.dataset == "humanml" else "kit",
        w_vectorizer=w_vectorizer,
    )
    # renorm from the training normalization to the frozen T2M evaluator's
    # convention (reference: comp_v6_model_dataset.py:246-250); eval stats
    # ship as dataset/{t2m|kit}_{mean,std}.npy.  Applied to BOTH loaders
    # (the reference GT loader normalizes with the evaluator stats).
    renorm = load_eval_renorm(dataset, dataset_name=args.dataset)
    gt_loader = GroundTruthMotionSet(dataset, batch_size=args.batch_size,
                                     renorm=renorm)

    from gesturediffusion_tpu.utils.text_embedder import get_text_encoder

    text_encoder = get_text_encoder()

    model, diffusion = create_model_and_diffusion(args, dataset)
    params = load_checkpoint(args.model_path, model=model)["params"]

    def base_model_fn(x, t, c):
        return model.apply(params, x, t, c)

    model_fn = (
        classifier_free_guidance(base_model_fn, args.cond_mask_prob)
        if args.guidance_param != 1
        else base_model_fn
    )
    shape = (args.batch_size, dataset.pose_dim, 1, 196)

    @jax.jit
    def sample_fn(rng, cond):
        return p_sample_loop(
            diffusion, model_fn, shape, rng, cond, clip_denoised=False
        )

    eval_wrapper = EvaluatorWrapper(args.dataset)

    def make_gen_loader(replication):
        gen = GeneratedMotionSet(
            sample_fn,
            dataset,
            text_encoder=text_encoder,
            batch_size=args.batch_size,
            mm_num_samples=mode_cfg["mm_num_samples"],
            mm_num_repeats=mode_cfg["mm_num_repeats"],
            scale=args.guidance_param,
            renorm=renorm,
            seed=replication,
            num_samples_limit=mode_cfg["num_samples_limit"],
        )
        return gen, gen.mm_batches

    return evaluation(
        eval_wrapper,
        gt_loader,
        {"vald": make_gen_loader},
        log_file,
        replication_times=mode_cfg["replication_times"],
        diversity_times=mode_cfg["diversity_times"],
        mm_num_times=mode_cfg["mm_num_times"],
        run_mm=mode_cfg["run_mm"],
    )


if __name__ == "__main__":
    main(sys.argv[1:])
