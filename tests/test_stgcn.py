"""STGCN graph/classifier tests incl. golden parity vs the torch reference."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesturediffusion_tpu.eval.stgcn import STGCN, build_graph, convert_stgcn


class TestGraph:
    def test_openpose15_shape_and_rows(self):
        A = build_graph("openpose15", "spatial")
        assert A.shape[1:] == (15, 15)
        assert A.shape[0] == 3  # spatial partition: root, close, further
        assert np.all(A >= 0)

    def test_smpl_layout(self):
        A = build_graph("smpl", "spatial")
        assert A.shape[1:] == (24, 24)

    def test_uniform_strategy(self):
        A = build_graph("openpose15", "uniform")
        assert A.shape[0] == 1


class TestSTGCNForward:
    def test_forward_shapes(self):
        m = STGCN(in_channels=3, num_class=12, layout="openpose15")
        x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 16, 15),
                        jnp.float32)
        variables = m.init(jax.random.PRNGKey(0), x)
        logits, feats = m.apply(variables, x, return_features=True)
        assert logits.shape == (2, 12)
        assert feats.shape == (2, 256)
        assert bool(jnp.all(jnp.isfinite(logits)))

    @pytest.mark.skipif(
        not os.path.exists(
            "/root/reference/eval/unconstrained/models/stgcn.py"
        ),
        reason="reference not mounted",
    )
    def test_golden_vs_torch_reference(self):
        import torch

        sys.path.insert(0, "/root/reference")
        try:
            from eval.unconstrained.models.stgcn import STGCN as RefSTGCN
        finally:
            sys.path.remove("/root/reference")

        torch.manual_seed(0)
        ref = RefSTGCN(
            in_channels=3, num_class=12,
            graph_args={"layout": "openpose", "strategy": "spatial"},
            edge_importance_weighting=True, device="cpu",
        )
        ref.eval()

        x = np.random.RandomState(1).randn(2, 15, 3, 16).astype(np.float32)
        with torch.no_grad():
            batch = {"x": torch.from_numpy(x)}
            out = ref(batch)
            ref_logits = out["yhat"].numpy()
            ref_feats = out["features"].numpy()

        ours = STGCN(in_channels=3, num_class=12, layout="openpose15",
                     strategy="spatial", edge_importance_weighting=True)
        variables = convert_stgcn(
            {k: v.numpy() for k, v in ref.state_dict().items()}
        )
        xj = jnp.asarray(x.transpose(0, 2, 3, 1))  # [B, 3, T, V]
        logits, feats = ours.apply(variables, xj, return_features=True)
        np.testing.assert_allclose(np.asarray(feats), ref_feats, atol=3e-4)
        np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=3e-4)
