"""Unconstrained-generation metrics (MoDi-style STGCN features).

Functional parity surface with the reference unconstrained evaluation
(reference: eval/unconstrained/evaluate.py:21-121 — 15-joint openpose
STGCN feature extractor, root-centering at joint 8, FID :86, KID, improved
precision/recall, diversity :94-97).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gesturediffusion_tpu.eval import metrics as M
from gesturediffusion_tpu.eval.stgcn import STGCN


class UnconstrainedEvaluator:
    def __init__(
        self,
        num_classes: int = 12,
        variables: Optional[dict] = None,
        checkpoint_path: Optional[str] = None,
        seed: int = 0,
    ):
        self.model = STGCN(
            in_channels=3, num_class=num_classes, layout="openpose15",
            strategy="spatial", edge_importance_weighting=True,
        )
        if variables is not None:
            self.variables = variables
        elif checkpoint_path is not None:
            from gesturediffusion_tpu.eval.stgcn import (
                load_stgcn_checkpoint,
            )

            self.variables = load_stgcn_checkpoint(checkpoint_path)
        else:
            from gesturediffusion_tpu.eval.eval_a2m import (
                _warn_random_classifier,
            )

            _warn_random_classifier(
                "MoDi unconstrained STGCN evaluator "
                "(humanact12_gru_modi_struct.pth.tar)",
                script=(
                    "prepare/download_recognition_unconstrained_models.sh"
                ),
            )
            x0 = jnp.zeros((2, 3, 16, 15))
            self.variables = self.model.init(jax.random.PRNGKey(seed), x0)

        self._jit = jax.jit(
            lambda x: self.model.apply(self.variables, x, return_features=True)
        )

    def compute_features(self, motions: np.ndarray, batch_size: int = 64):
        """motions [N, 15, 3, T] -> (features [N, 256], predictions)."""
        feats, preds = [], []
        n = len(motions)
        for lo in range(0, n, batch_size):
            batch = motions[lo : lo + batch_size]
            x = jnp.asarray(batch.transpose(0, 2, 3, 1))  # [B, 3, T, V]
            logits, f = self._jit(x)
            feats.append(np.asarray(f))
            preds.append(np.asarray(logits))
        return np.concatenate(feats), np.concatenate(preds)


def evaluate_unconstrained_metrics(
    generated_motions: np.ndarray,  # [N, 15, 3, T]
    dataset_motions: np.ndarray,  # [M, >=15, 3, T]
    evaluator: Optional[UnconstrainedEvaluator] = None,
    fast: bool = True,
    log=print,
) -> dict:
    evaluator = evaluator or UnconstrainedEvaluator()

    # dataset_motions contract: MoDi-struct joint ORDER (the reference's
    # humanact12_unconstrained_modi_struct.npy carries 16 joints; its
    # evaluate.py:76 takes the first 15).  Raw SMPL-24 xyz must be
    # remapped with eval_a2m.UNCONSTRAINED_15_JOINTS first — the first
    # 15 SMPL joints are NOT the MoDi subset.  Index 8 in MoDi order is
    # the pelvis (root-centering joint).
    generated = generated_motions - generated_motions[:, 8:9]
    dataset = dataset_motions[:, :15] - dataset_motions[:, 8:9]

    gen_feats, _ = evaluator.compute_features(generated)
    ds_feats, _ = evaluator.compute_features(dataset)

    gen_stats = M.calculate_activation_statistics(gen_feats)
    ds_stats = M.calculate_activation_statistics(ds_feats)

    fid = M.calculate_frechet_distance(*gen_stats, *ds_stats)
    log(f"FID score: {fid}")

    kid_mean, kid_std = M.calculate_kid(
        ds_feats, gen_feats, subset_size=min(1000, len(gen_feats))
    )
    log(f"KID: {kid_mean:.3f} ({kid_std:.3f})")

    dt = min(200, len(gen_feats) - 1, len(ds_feats) - 1)
    gen_div = M.calculate_diversity(gen_feats, dt)
    ds_div = M.calculate_diversity(ds_feats, dt)
    log(f"Diversity generated: {gen_div}  dataset: {ds_div}")

    out = {
        "fid": fid,
        "kid_mean": kid_mean,
        "kid_std": kid_std,
        "diversity_gen": gen_div,
        "diversity_gt": ds_div,
    }
    if not fast:
        precision, recall = M.precision_and_recall(gen_feats, ds_feats)
        log(f"precision: {precision}  recall: {recall}")
        out["precision"] = precision
        out["recall"] = recall
    return out
