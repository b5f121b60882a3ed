"""Eval harness tests: metric math + evaluator-network torch parity."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesturediffusion_tpu.eval import metrics as M
from gesturediffusion_tpu.eval.networks import (
    MotionDiscriminator,
    MotionEncoderBiGRUCo,
    MovementConvEncoder,
    TextEncoderBiGRUCo,
    convert_motion_discriminator,
    convert_motion_encoder,
    convert_movement_encoder,
    convert_text_encoder,
    gru_cell,
    masked_gru,
)

RS = np.random.RandomState(0)


class TestMetrics:
    def test_distance_matrix(self):
        a = RS.randn(5, 4)
        b = RS.randn(7, 4)
        d = M.euclidean_distance_matrix(a, b)
        expected = np.linalg.norm(a[:, None] - b[None], axis=-1)
        np.testing.assert_allclose(d, expected, atol=1e-6)

    def test_r_precision_perfect(self):
        emb = RS.randn(32, 16)
        top3 = M.calculate_R_precision(emb, emb, top_k=3, sum_all=True)
        assert top3[0] == 32  # identical embeddings -> rank-1 always

    def test_matching_score(self):
        a = RS.randn(10, 8)
        s = M.calculate_matching_score(a, a, sum_all=True)
        assert s == pytest.approx(0.0)

    def test_fid_zero_for_identical(self):
        x = RS.randn(200, 16)
        mu, cov = M.calculate_activation_statistics(x)
        fid = M.calculate_frechet_distance(mu, cov, mu, cov)
        assert abs(fid) < 1e-6

    def test_fid_positive_for_shifted(self):
        x = RS.randn(300, 8)
        y = x + 2.0
        mu1, c1 = M.calculate_activation_statistics(x)
        mu2, c2 = M.calculate_activation_statistics(y)
        fid = M.calculate_frechet_distance(mu1, c1, mu2, c2)
        assert fid == pytest.approx(8 * 4.0, rel=0.05)

    def test_diversity_and_multimodality(self):
        act = RS.randn(100, 16)
        d = M.calculate_diversity(act, 50, rng=np.random.RandomState(1))
        assert d > 0
        act3 = RS.randn(10, 20, 16)
        mm = M.calculate_multimodality(act3, 8, rng=np.random.RandomState(1))
        assert mm > 0

    def test_kid_zero_same_distribution(self):
        x = RS.randn(500, 8)
        mean, std = M.calculate_kid(x, x.copy(), n_subsets=10,
                                    subset_size=100,
                                    rng=np.random.RandomState(2))
        assert abs(mean) < 0.05

    def test_kid_positive_for_shifted(self):
        x = RS.randn(400, 8)
        y = RS.randn(400, 8) + 3.0
        mean, _ = M.calculate_kid(x, y, n_subsets=5, subset_size=100,
                                  rng=np.random.RandomState(2))
        assert mean > 1.0

    def test_precision_recall(self):
        real = RS.randn(200, 8)
        # generated == real distribution -> both near 1
        gen = RS.randn(200, 8)
        p, r = M.precision_and_recall(gen, real)
        assert p > 0.8 and r > 0.8
        # far-away generated -> precision ~0
        p2, r2 = M.precision_and_recall(gen + 50.0, real)
        assert p2 < 0.05 and r2 < 0.05

    def test_metric_statistics(self):
        vals = np.asarray([[1.0, 2.0], [3.0, 4.0]])
        mean, ci = M.get_metric_statistics(vals, 2)
        np.testing.assert_allclose(mean, [2.0, 3.0])
        assert np.all(ci > 0)

    def test_frechet_singular_uses_psd_fallback(self):
        """Rank-deficient covariances must route to the PSD eigh fallback
        WITHOUT scipy's LinAlgWarning leaking (the warning is promoted to
        an error inside calculate_frechet_distance and caught there)."""
        import warnings

        from scipy.linalg import LinAlgWarning

        # n < d makes np.cov rank-deficient -> sigma1 @ sigma2 singular
        x = RS.randn(6, 16)
        y = RS.randn(6, 16) + 0.5
        mu1, c1 = M.calculate_activation_statistics(x)
        mu2, c2 = M.calculate_activation_statistics(y)
        with warnings.catch_warnings():
            warnings.simplefilter("error", LinAlgWarning)
            fid = M.calculate_frechet_distance(mu1, c1, mu2, c2)
        assert np.isfinite(fid) and fid >= 0


@pytest.mark.skipif(
    not os.path.exists("/root/reference/data_loaders/humanml/networks/modules.py"),
    reason="reference not mounted",
)
class TestTorchParity:
    """Golden: random-weight torch reference nets vs converted flax nets."""

    @classmethod
    def _load_ref(cls):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "ref_modules",
            "/root/reference/data_loaders/humanml/networks/modules.py",
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_gru_cell_matches_torch(self):
        import torch

        b, d, h = 3, 8, 16
        cell = torch.nn.GRUCell(d, h)
        x = RS.randn(b, d).astype(np.float32)
        h0 = RS.randn(b, h).astype(np.float32)
        with torch.no_grad():
            out_t = cell(torch.from_numpy(x), torch.from_numpy(h0)).numpy()
        out_j = gru_cell(
            jnp.asarray(h0), jnp.asarray(x),
            jnp.asarray(cell.weight_ih.detach().numpy()),
            jnp.asarray(cell.weight_hh.detach().numpy()),
            jnp.asarray(cell.bias_ih.detach().numpy()),
            jnp.asarray(cell.bias_hh.detach().numpy()),
        )
        np.testing.assert_allclose(out_j, out_t, atol=1e-5)

    def test_text_encoder_parity(self):
        import torch

        ref = self._load_ref()
        torch.manual_seed(0)
        net = ref.TextEncoderBiGRUCo(word_size=32, pos_size=15,
                                     hidden_size=24, output_size=16,
                                     device="cpu")
        net.eval()
        b, t = 4, 10
        word = RS.randn(b, t, 32).astype(np.float32)
        pos = RS.randn(b, t, 15).astype(np.float32)
        lens = np.asarray([10, 8, 6, 3])
        with torch.no_grad():
            out_t = net(
                torch.from_numpy(word), torch.from_numpy(pos),
                torch.from_numpy(lens),
            ).numpy()

        flax_net = TextEncoderBiGRUCo(word_size=32, pos_size=15,
                                      hidden_size=24, output_size=16)
        params = {"params": convert_text_encoder(
            {k: v.numpy() for k, v in net.state_dict().items()}
        )}
        out_j = flax_net.apply(params, jnp.asarray(word), jnp.asarray(pos),
                               jnp.asarray(lens))
        np.testing.assert_allclose(np.asarray(out_j), out_t, atol=2e-5)

    def test_motion_encoder_parity(self):
        import torch

        ref = self._load_ref()
        torch.manual_seed(1)
        net = ref.MotionEncoderBiGRUCo(input_size=20, hidden_size=24,
                                       output_size=16, device="cpu")
        net.eval()
        b, t = 4, 12
        x = RS.randn(b, t, 20).astype(np.float32)
        lens = np.asarray([12, 9, 5, 4])
        with torch.no_grad():
            out_t = net(torch.from_numpy(x), torch.from_numpy(lens)).numpy()

        flax_net = MotionEncoderBiGRUCo(input_size=20, hidden_size=24,
                                        output_size=16)
        params = {"params": convert_motion_encoder(
            {k: v.numpy() for k, v in net.state_dict().items()}
        )}
        out_j = flax_net.apply(params, jnp.asarray(x), jnp.asarray(lens))
        np.testing.assert_allclose(np.asarray(out_j), out_t, atol=2e-5)

    def test_movement_encoder_parity(self):
        import torch

        ref = self._load_ref()
        torch.manual_seed(2)
        net = ref.MovementConvEncoder(input_size=30, hidden_size=16,
                                      output_size=12)
        net.eval()
        x = RS.randn(2, 16, 30).astype(np.float32)
        with torch.no_grad():
            out_t = net(torch.from_numpy(x)).numpy()
        flax_net = MovementConvEncoder(hidden_size=16, output_size=12)
        params = {"params": convert_movement_encoder(
            {k: v.numpy() for k, v in net.state_dict().items()}
        )}
        out_j = flax_net.apply(params, jnp.asarray(x))
        # dropout is identity at eval; conv/linear parity only
        np.testing.assert_allclose(np.asarray(out_j), out_t, atol=2e-5)

    def test_motion_discriminator_parity(self):
        import importlib.util

        import torch

        spec = importlib.util.spec_from_file_location(
            "ref_a2m_models",
            "/root/reference/eval/a2m/action2motion/models.py",
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        torch.manual_seed(3)
        net = mod.MotionDiscriminator(input_size=18, hidden_size=16,
                                      hidden_layer=2, device="cpu",
                                      output_size=5)
        net.eval()
        b, j, f, t = 3, 6, 3, 10
        x = RS.randn(b, j, f, t).astype(np.float32)
        lens = torch.tensor([10, 7, 4])
        hidden = torch.zeros(2, b, 16)
        with torch.no_grad():
            out_t = net(torch.from_numpy(x), lengths=lens,
                        hidden_unit=hidden).numpy()

        flax_net = MotionDiscriminator(input_size=18, hidden_size=16,
                                       hidden_layer=2, output_size=5)
        params = {"params": convert_motion_discriminator(
            {k: v.numpy() for k, v in net.state_dict().items()}
        )}
        out_j = flax_net.apply(params, jnp.asarray(x),
                               jnp.asarray([10, 7, 4]))
        np.testing.assert_allclose(np.asarray(out_j), out_t, atol=2e-5)


class TestMaskedGRUSemantics:
    def test_forward_stops_at_length(self):
        b, t, d, h = 2, 6, 4, 8
        x = jnp.asarray(RS.randn(b, t, d), jnp.float32)
        params = {
            "w_ih": jnp.asarray(RS.randn(3 * h, d) * 0.1, jnp.float32),
            "w_hh": jnp.asarray(RS.randn(3 * h, h) * 0.1, jnp.float32),
            "b_ih": jnp.zeros(3 * h),
            "b_hh": jnp.zeros(3 * h),
        }
        h0 = jnp.zeros((b, h))
        _, h_full = masked_gru(x, jnp.asarray([6, 3]), h0, params)
        # sample 1 truncated at 3 == running only its first 3 frames
        _, h_trunc = masked_gru(x[1:2, :3], jnp.asarray([3]), h0[1:2], params)
        np.testing.assert_allclose(h_full[1], h_trunc[0], atol=1e-6)


class TestGTRenorm:
    """The GT loader must renorm to the evaluator convention exactly
    like the generated loader — the reference's GT loader normalizes
    with the evaluator's own mean/std (dataset_motion_loader.py:15-16);
    mixing conventions silently skews every FID/R-precision number."""

    class _DS:
        def __init__(self, motions):
            self._items = [
                {"motion": m, "length": m.shape[0], "text": ""}
                for m in motions
            ]

        def __len__(self):
            return len(self._items)

        def __getitem__(self, i):
            return self._items[i]

    def test_gt_motions_renormed(self):
        from gesturediffusion_tpu.eval.eval_humanml import (
            GroundTruthMotionSet,
        )

        rs = np.random.RandomState(0)
        motions = [rs.randn(8, 4).astype(np.float32) for _ in range(2)]
        our_mean = np.zeros(4, np.float32)
        our_std = np.ones(4, np.float32)
        ev_mean = np.full(4, 0.5, np.float32)
        ev_std = np.full(4, 2.0, np.float32)
        ds = self._DS(motions)
        plain = next(iter(GroundTruthMotionSet(ds, batch_size=2,
                                               max_frames=8)))
        renormed = next(iter(GroundTruthMotionSet(
            ds, batch_size=2, max_frames=8,
            renorm=(our_mean, our_std, ev_mean, ev_std),
        )))
        np.testing.assert_allclose(
            renormed["motions"], (plain["motions"] - 0.5) / 2.0, rtol=1e-6
        )

    def test_symmetric_gru_init(self):
        from gesturediffusion_tpu.eval.networks import (
            MotionEncoderBiGRUCo,
            torch_gru_uniform,
        )

        init = torch_gru_uniform(64)
        w = init(jax.random.PRNGKey(0), (192, 64))
        assert float(w.min()) < 0 < float(w.max())  # symmetric, not [0, s)
        assert abs(float(w.mean())) < 0.01
        enc = MotionEncoderBiGRUCo(input_size=8, hidden_size=16,
                                   output_size=8)
        params = enc.init(jax.random.PRNGKey(1),
                          jnp.zeros((2, 6, 8)), jnp.asarray([6, 6]))
        leaves = {
            "/".join(str(k.key) for k in p): np.asarray(v)
            for p, v in jax.tree_util.tree_leaves_with_path(params)
        }
        gru_ws = [v for k, v in leaves.items() if "w_ih" in k]
        assert gru_ws and all(v.min() < 0 for v in gru_ws)
