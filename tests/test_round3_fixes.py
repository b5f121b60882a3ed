"""Round-3 robustness fixes: no silent-garbage metric paths.

Missing-asset a2m evaluation must WARN loudly in debug mode and REFUSE
in the full protocol (the reference protocol assumes the downloaded
classifier tars, reference: eval/a2m/stgcn/evaluate.py:22,
eval/a2m/gru_eval.py:60-68).
"""

import pytest

from gesturediffusion_tpu.eval.eval_a2m import (
    A2MEvaluation,
    STGCNA2MEvaluation,
    make_a2m_evaluation,
)


@pytest.fixture(autouse=True)
def _no_assets(monkeypatch, tmp_path):
    missing = str(tmp_path / "definitely-not-there.tar")
    monkeypatch.setenv("A2M_CLASSIFIER_PATH", missing)
    monkeypatch.setenv("UESTC_STGCN_PATH", missing)
    monkeypatch.setenv("MODI_STGCN_PATH", missing)


class TestRandomInitWarns:
    def test_gru_ctor_warns(self, capsys):
        A2MEvaluation(input_size_raw=72, num_classes=12)
        assert "RANDOM frozen" in capsys.readouterr().out

    def test_stgcn_ctor_warns(self, capsys):
        STGCNA2MEvaluation()
        assert "RANDOM frozen" in capsys.readouterr().out

    def test_unconstrained_ctor_warns(self, capsys):
        from gesturediffusion_tpu.eval.eval_unconstrained import (
            UnconstrainedEvaluator,
        )

        UnconstrainedEvaluator()
        assert "RANDOM frozen" in capsys.readouterr().out

    def test_no_warning_with_explicit_params(self, capsys):
        ev = A2MEvaluation(input_size_raw=72, num_classes=12)
        capsys.readouterr()
        A2MEvaluation(input_size_raw=72, num_classes=12,
                      classifier_params=ev.params)
        assert "RANDOM" not in capsys.readouterr().out


class TestFullModeRefuses:
    def test_humanact12_full_raises(self):
        with pytest.raises(FileNotFoundError, match="full-protocol"):
            make_a2m_evaluation("humanact12", eval_mode="full")

    def test_uestc_full_raises(self):
        with pytest.raises(FileNotFoundError, match="UESTC_STGCN_PATH"):
            make_a2m_evaluation("uestc", eval_mode="full")

    def test_debug_mode_warns_and_proceeds(self, capsys):
        ev = make_a2m_evaluation("humanact12", eval_mode="debug")
        assert ev is not None
        assert "RANDOM frozen" in capsys.readouterr().out

    def test_no_mode_warns_and_proceeds(self, capsys):
        # the in-training eval hook passes no mode: warn, don't kill
        # a training run
        ev = make_a2m_evaluation("uestc")
        assert ev is not None
        assert "RANDOM frozen" in capsys.readouterr().out
