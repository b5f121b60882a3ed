"""Asset-arrival parity harness (prepare/verify_assets.py): one command
that verifies every external asset, run here as a subprocess on the full
synthetic stand-in set (the first real-asset run is the same command
without --make-synthetic)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def report(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("assets"))
    out = os.path.join(root, "PARITY.md")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    # asset env overrides from the outer environment would shadow the
    # synthetic tree
    for var in ("SMPL_MODEL_PATH", "SMPL_MEAN_PATH", "T2M_EVALUATOR_PATH",
                "A2M_CLASSIFIER_PATH", "UESTC_STGCN_PATH",
                "MODI_STGCN_PATH", "CLIP_CHECKPOINT", "CLIP_BPE_PATH",
                "UNCONSTRAINED_DATASET_PATH"):
        env.pop(var, None)
    proc = subprocess.run(
        [sys.executable, "prepare/verify_assets.py", "--root", root,
         "--make-synthetic", "--out", out],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=580,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    with open(out) as f:
        return proc.stdout, f.read()


class TestSyntheticRun:
    def test_every_asset_has_a_row(self, report):
        _, md = report
        from prepare.verify_assets import ASSETS

        for name, *_ in ASSETS:
            assert name in md, f"no report row for {name}"

    def test_stand_ins_flagged_synthetic(self, report):
        stdout, md = report
        # every converter-backed stand-in must be flagged, not OK'd
        for name in ("SMPL neutral model", "T2M evaluator (finest.tar)",
                     "A2M GRU classifier", "UESTC ST-GCN", "MoDi ST-GCN",
                     "CLIP ViT-B/32", "SMPLify GMM prior",
                     "SMPLify mean params"):
            row = next(ln for ln in md.splitlines() if name in ln)
            assert "SYNTHETIC" in row, row

    def test_no_missing_or_error(self, report):
        _, md = report
        summary = next(ln for ln in md.splitlines()
                       if ln.startswith("Summary:"))
        assert "MISSING" not in summary and "ERROR" not in summary

    def test_forward_fingerprints_recorded(self, report):
        _, md = report
        # converters actually RAN (fingerprints present), not just stat'd
        assert "fk_fingerprint=" in md
        assert "logit_sum=" in md
        assert "motion_emb[" in md


class TestMissingRun:
    def test_empty_root_reports_missing(self, tmp_path):
        env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
        for var in ("SMPL_MODEL_PATH", "CLIP_BPE_PATH"):
            env.pop(var, None)
        out = str(tmp_path / "PARITY.md")
        proc = subprocess.run(
            [sys.executable, "prepare/verify_assets.py", "--root",
             str(tmp_path), "--out", out],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=300,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        with open(out) as f:
            md = f.read()
        assert "MISSING" in md and "prepare/" in md
