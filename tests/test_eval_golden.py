"""Cross-stack metric-VALUE golden: reference metric pipeline vs ours.

The evaluator NETWORKS are already golden (tests/test_eval.py,
tests/test_stgcn.py); what had never been executed side-by-side is the
metric *pipeline* — the reference's batch-accumulation orchestration
(`/root/reference/eval/eval_humanml.py:19-135`) and metric math
(`data_loaders/humanml/utils/metrics.py`, `eval/a2m/action2motion/
{fid.py,diversity.py}`, `eval/unconstrained/metrics/{kid.py,
precision_recall.py}`) against this repo's `eval/{eval_humanml,
metrics,eval_a2m}`.  These tests import the actual reference modules
(torch + scipy + sklearn are installed), feed BOTH stacks identical
motions/embeddings through a shared deterministic embedding stub (the
network layer being separately golden), seed the global numpy RNG
identically on both sides, and assert the final metric VALUES agree.

This is the strongest parity statement available without egress (no
released checkpoints to download); with real assets the same harness
applies unchanged (prepare/verify_assets.py stages that run).
"""

import importlib.util
import os
import sys
import types
from collections import OrderedDict

import numpy as np
import pytest

# torch/scipy must be fully imported BEFORE the sys.modules snapshot in
# _load_ref_eval_humanml: C-extension modules cannot be cleanly
# re-imported after a snapshot restore drops them.
import scipy.linalg  # noqa: F401
import torch  # noqa: F401

from gesturediffusion_tpu.eval import eval_humanml as ours_eh
from gesturediffusion_tpu.eval import metrics as ours_m

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "eval", "eval_humanml.py")),
    reason="reference not mounted",
)

RS = np.random.RandomState(20260820)


# --------------------------------------------------------------------- #
# Reference module loading (file-based, sys.modules snapshot/restored)
# --------------------------------------------------------------------- #
def _file_module(name, relpath):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, relpath)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _Stub(types.ModuleType):
    """Empty module whose attribute lookups return inert callables (the
    reference file's module-level imports resolve; the functions under
    test never call them)."""

    def __getattr__(self, item):
        if item.startswith("__"):
            raise AttributeError(item)
        return lambda *a, **k: None


def _load_ref_eval_humanml():
    """Load /root/reference/eval/eval_humanml.py with its heavy imports
    stubbed and its metrics import REAL (the functions under test star-
    import from data_loaders.humanml.utils.metrics)."""
    snapshot = dict(sys.modules)
    try:
        ref_metrics = _file_module(
            "data_loaders.humanml.utils.metrics",
            "data_loaders/humanml/utils/metrics.py",
        )
        stubs = [
            "utils", "utils.parser_util", "utils.fixseed", "utils.model_util",
            "utils.dist_util",
            "data_loaders", "data_loaders.get_data",
            "data_loaders.humanml", "data_loaders.humanml.motion_loaders",
            "data_loaders.humanml.motion_loaders.model_motion_loaders",
            "data_loaders.humanml.networks",
            "data_loaders.humanml.networks.evaluator_wrapper",
            "data_loaders.humanml.scripts",
            "data_loaders.humanml.scripts.motion_process",
            "data_loaders.humanml.utils", "data_loaders.humanml.utils.utils",
            "diffusion", "diffusion.logger",
            "model", "model.cfg_sampler",
        ]
        for name in stubs:
            sys.modules[name] = _Stub(name)
        # the reference file gets `torch`/`np` via star-imports from
        # motion_process / utils.utils (their module-level imports are
        # public names) — provide them on those stubs
        import torch

        for name in ("data_loaders.humanml.scripts.motion_process",
                     "data_loaders.humanml.utils.utils"):
            sys.modules[name].__dict__.update({"torch": torch, "np": np})
        sys.modules["data_loaders.humanml.utils.metrics"] = ref_metrics
        mod = _file_module("ref_eval_humanml", "eval/eval_humanml.py")
        return mod, ref_metrics
    finally:
        sys.modules.clear()
        sys.modules.update(snapshot)


# --------------------------------------------------------------------- #
# Shared deterministic embedding stub (numpy core used by BOTH sides)
# --------------------------------------------------------------------- #
DW, DP, DM, E = 24, 15, 32, 20  # word/pos/motion feature dims, embed dim
W_TEXT = RS.randn(DW + DP, E).astype(np.float32) * 0.3
W_MOT = RS.randn(DM, E).astype(np.float32) * 0.3


def _np_text_emb(word_embs, pos_ohot, cap_lens):
    x = np.concatenate([word_embs, pos_ohot], axis=-1)  # [B, L, DW+DP]
    t = np.arange(x.shape[1])[None, :, None]
    mask = (t < np.asarray(cap_lens)[:, None, None]).astype(np.float32)
    pooled = (x * mask).sum(1) / np.maximum(mask.sum(1), 1.0)
    return np.tanh(pooled @ W_TEXT)


def _np_motion_emb(motions, m_lens):
    t = np.arange(motions.shape[1])[None, :, None]
    mask = (t < np.asarray(m_lens)[:, None, None]).astype(np.float32)
    pooled = (motions * mask).sum(1) / np.maximum(mask.sum(1), 1.0)
    return np.tanh(pooled @ W_MOT)


class _OurStubWrapper:
    """Duck-types gesturediffusion_tpu EvaluatorWrapper for the metric
    pipeline (positional args, numpy in/out, keep_order kwarg)."""

    def get_co_embeddings(self, word_embs, pos_ohot, cap_lens, motions,
                          m_lens):
        return (_np_text_emb(word_embs, pos_ohot, cap_lens),
                _np_motion_emb(motions, m_lens))

    def get_motion_embeddings(self, motions, m_lens, keep_order=False):
        return _np_motion_emb(motions, m_lens)


class _RefStubWrapper:
    """Duck-types the reference EvaluatorMDMWrapper (keyword args, torch
    tensors in/out; reference: evaluator_wrapper.py:154,175)."""

    def get_co_embeddings(self, word_embs, pos_ohot, cap_lens, motions,
                          m_lens):
        import torch

        te = _np_text_emb(word_embs.numpy(), pos_ohot.numpy(),
                          cap_lens.numpy())
        me = _np_motion_emb(motions.numpy(), m_lens.numpy())
        return torch.from_numpy(te), torch.from_numpy(me)

    def get_motion_embeddings(self, motions, m_lens):
        return __import__("torch").from_numpy(
            _np_motion_emb(motions.numpy(), m_lens.numpy())
        )


def _make_batches(n_batches=3, bs=32, seed=0):
    """Identical eval batches in both stacks' loader conventions."""
    rs = np.random.RandomState(seed)
    ref_batches, our_batches = [], []
    import torch

    for _ in range(n_batches):
        L, T = 12, 40
        word = rs.randn(bs, L, DW).astype(np.float32)
        pos = rs.randn(bs, L, DP).astype(np.float32)
        cap_lens = rs.randint(3, L + 1, bs)
        motions = rs.randn(bs, T, DM).astype(np.float32)
        m_lens = rs.randint(8, T + 1, bs)
        # reference loader tuple: (word, pos, caption, sent_len, motion,
        # m_len, tokens) — eval_humanml.py:33
        ref_batches.append((
            torch.from_numpy(word), torch.from_numpy(pos), None,
            torch.from_numpy(cap_lens), torch.from_numpy(motions),
            torch.from_numpy(m_lens), None,
        ))
        our_batches.append({
            "word_embs": word, "pos_ohot": pos, "cap_lens": cap_lens,
            "motions": motions, "m_lens": m_lens,
        })
    return ref_batches, our_batches


# --------------------------------------------------------------------- #
# T2M pipeline: matching/R-precision -> FID -> diversity -> multimodality
# --------------------------------------------------------------------- #
class TestHumanmlPipelineGolden:
    @classmethod
    def setup_class(cls):
        cls.ref_eh, cls.ref_metrics = _load_ref_eval_humanml()
        cls.devnull = open(os.devnull, "w")

    @classmethod
    def teardown_class(cls):
        cls.devnull.close()

    def test_matching_fid_diversity_chain(self):
        ref_gen, our_gen = _make_batches(seed=1)
        ref_gt, our_gt = _make_batches(seed=2)

        ref_match, ref_rprec, ref_act = self.ref_eh.evaluate_matching_score(
            _RefStubWrapper(), OrderedDict([("vald", ref_gen)]), self.devnull
        )
        our_match, our_rprec, our_act = ours_eh.evaluate_matching_score(
            _OurStubWrapper(), OrderedDict([("vald", our_gen)]),
            log=lambda *_: None,
        )
        np.testing.assert_allclose(
            our_match["vald"], ref_match["vald"], rtol=1e-6
        )
        np.testing.assert_allclose(
            our_rprec["vald"], ref_rprec["vald"], rtol=0, atol=0
        )
        np.testing.assert_allclose(
            our_act["vald"], ref_act["vald"], rtol=1e-6
        )

        ref_fid = self.ref_eh.evaluate_fid(
            _RefStubWrapper(), ref_gt, ref_act, self.devnull
        )
        our_fid = ours_eh.evaluate_fid(
            _OurStubWrapper(), our_gt, our_act, log=lambda *_: None
        )
        np.testing.assert_allclose(
            our_fid["vald"], ref_fid["vald"], rtol=1e-5
        )

        np.random.seed(77)
        ref_div = self.ref_eh.evaluate_diversity(ref_act, self.devnull, 30)
        np.random.seed(77)
        our_div = ours_eh.evaluate_diversity(
            our_act, diversity_times=30, log=lambda *_: None
        )
        np.testing.assert_allclose(
            our_div["vald"], ref_div["vald"], rtol=1e-6
        )

    def test_multimodality(self):
        import torch

        rs = np.random.RandomState(3)
        n, reps, T = 6, 8, 40
        motions = rs.randn(n, reps, T, DM).astype(np.float32)
        m_lens = rs.randint(8, T + 1, n)

        # reference mm loader: batches of ONE sample, motions [1, R, T, D]
        ref_loader = [
            (torch.from_numpy(motions[i : i + 1]),
             torch.from_numpy(np.repeat(m_lens[i : i + 1], reps)[None]))
            for i in range(n)
        ]
        np.random.seed(5)
        ref_mm = self.ref_eh.evaluate_multimodality(
            _RefStubWrapper(), OrderedDict([("vald", ref_loader)]),
            self.devnull, 4,
        )
        our_loader = [{"motions": motions, "m_lens": m_lens}]
        np.random.seed(5)
        our_mm = ours_eh.evaluate_multimodality(
            _OurStubWrapper(), OrderedDict([("vald", our_loader)]),
            mm_num_times=4, log=lambda *_: None,
        )
        np.testing.assert_allclose(
            our_mm["vald"], ref_mm["vald"], rtol=1e-6
        )

    def test_metric_statistics(self):
        vals = RS.randn(20, 3)
        ref_mean, ref_ci = self.ref_eh.get_metric_statistics(vals, 20)
        our_mean, our_ci = ours_m.get_metric_statistics(vals, 20)
        np.testing.assert_allclose(our_mean, ref_mean, rtol=1e-12)
        np.testing.assert_allclose(our_ci, ref_ci, rtol=1e-12)


# --------------------------------------------------------------------- #
# Metric math: FID (humanml + a2m), KID, precision/recall, a2m div/mm
# --------------------------------------------------------------------- #
def _random_stats(d=16, n=200, seed=0):
    rs = np.random.RandomState(seed)
    x = rs.randn(n, d)
    y = rs.randn(n, d) * 1.3 + 0.2
    return (x.mean(0), np.cov(x, rowvar=False),
            y.mean(0), np.cov(y, rowvar=False))


class TestMetricMathGolden:
    def test_frechet_humanml(self):
        ref_metrics = _file_module(
            "ref_hml_metrics", "data_loaders/humanml/utils/metrics.py"
        )
        mu1, s1, mu2, s2 = _random_stats(seed=4)
        ref = ref_metrics.calculate_frechet_distance(mu1, s1, mu2, s2)
        ours = ours_m.calculate_frechet_distance(mu1, s1, mu2, s2)
        np.testing.assert_allclose(ours, ref, rtol=1e-8)

    def test_frechet_a2m(self):
        ref_fid = _file_module("ref_a2m_fid", "eval/a2m/action2motion/fid.py")
        mu1, s1, mu2, s2 = _random_stats(seed=5)
        ref = ref_fid.calculate_fid((mu1, s1), (mu2, s2))
        ours = ours_m.calculate_frechet_distance(mu1, s1, mu2, s2)
        np.testing.assert_allclose(ours, ref, rtol=1e-8)

    def test_kid(self):
        ref_kid = _file_module(
            "ref_kid", "eval/unconstrained/metrics/kid.py"
        )
        rs = np.random.RandomState(6)
        gen = rs.randn(60, 12).astype(np.float64)
        real = (rs.randn(60, 12) * 1.1 + 0.1).astype(np.float64)
        np.random.seed(9)
        ref_mmds, _ = ref_kid.polynomial_mmd_averages(
            gen, real, n_subsets=5, subset_size=25, ret_var=True
        )
        np.random.seed(9)
        our_mean, our_std = ours_m.calculate_kid(
            real, gen, n_subsets=5, subset_size=25
        )
        np.testing.assert_allclose(our_mean, ref_mmds.mean(), rtol=1e-8)
        np.testing.assert_allclose(our_std, ref_mmds.std(), rtol=1e-8)

    def test_precision_recall(self):
        ref_pr = _file_module(
            "ref_pr", "eval/unconstrained/metrics/precision_recall.py"
        )
        import torch

        rs = np.random.RandomState(7)
        gen = rs.randn(40, 10).astype(np.float32)
        real = (rs.randn(40, 10) * 1.2).astype(np.float32)
        ref_p, ref_r = ref_pr.precision_and_recall(
            torch.from_numpy(gen), torch.from_numpy(real)
        )
        our_p, our_r = ours_m.precision_and_recall(gen, real)
        np.testing.assert_allclose(our_p, ref_p, atol=1e-9)
        np.testing.assert_allclose(our_r, ref_r, atol=1e-9)

    def test_a2m_diversity_multimodality(self):
        ref_div = _file_module(
            "ref_a2m_div", "eval/a2m/action2motion/diversity.py"
        )
        import torch

        from gesturediffusion_tpu.eval.eval_a2m import A2MEvaluation

        rs = np.random.RandomState(8)
        n, d, num_labels = 120, 16, 4
        acts = rs.randn(n, d).astype(np.float32)
        labels = rs.randint(0, num_labels, n)

        np.random.seed(11)
        ref_d, ref_m = ref_div.calculate_diversity_multimodality(
            torch.from_numpy(acts), torch.from_numpy(labels), num_labels
        )
        np.random.seed(11)
        our_d, our_m = A2MEvaluation.diversity_multimodality(
            acts, labels, num_labels
        )
        np.testing.assert_allclose(our_d, ref_d, rtol=1e-5)
        np.testing.assert_allclose(our_m, ref_m, rtol=1e-5)

    def test_euclidean_and_topk(self):
        ref_metrics = _file_module(
            "ref_hml_metrics2", "data_loaders/humanml/utils/metrics.py"
        )
        rs = np.random.RandomState(10)
        a = rs.randn(32, 8)
        b = rs.randn(32, 8)
        ref_dm = ref_metrics.euclidean_distance_matrix(a, b)
        our_dm = ours_m.euclidean_distance_matrix(a, b)
        np.testing.assert_allclose(our_dm, ref_dm, rtol=1e-7, atol=1e-9)
        args = np.argsort(ref_dm, axis=1)
        np.testing.assert_array_equal(
            ours_m.calculate_top_k(args, 3),
            ref_metrics.calculate_top_k(args, 3),
        )

    def test_activation_statistics(self):
        ref_metrics = _file_module(
            "ref_hml_metrics3", "data_loaders/humanml/utils/metrics.py"
        )
        acts = np.random.RandomState(12).randn(50, 9)
        ref_mu, ref_cov = ref_metrics.calculate_activation_statistics(acts)
        our_mu, our_cov = ours_m.calculate_activation_statistics(acts)
        np.testing.assert_allclose(our_mu, ref_mu, rtol=1e-12)
        np.testing.assert_allclose(our_cov, ref_cov, rtol=1e-12)
