"""GMM pose prior (MaxMixturePrior) golden parity + SMPLify integration."""

import pickle

import jax.numpy as jnp
import numpy as np
import pytest

from gesturediffusion_tpu.viz.prior import (
    MaxMixturePrior,
    angle_prior,
    load_gmm_prior,
    make_synthetic_gmm,
)


def torch_reference_nll(gmm: dict, pose: np.ndarray) -> np.ndarray:
    """The reference's merged min-NLL computed independently with torch
    (formula from visualize/joints2smpl/src/prior.py:141-195)."""
    import torch

    means = torch.tensor(gmm["means"], dtype=torch.float32)
    covs = gmm["covars"]
    precisions = torch.tensor(
        np.stack([np.linalg.inv(c) for c in covs]), dtype=torch.float32
    )
    sqrdets = np.array([np.sqrt(np.linalg.det(c)) for c in covs])
    const = (2 * np.pi) ** (69 / 2.0)
    nll_weights = torch.tensor(
        gmm["weights"] / (const * (sqrdets / sqrdets.min())),
        dtype=torch.float32,
    ).unsqueeze(0)

    p = torch.tensor(pose, dtype=torch.float32)
    diff = p.unsqueeze(1) - means
    prec_diff = torch.einsum("mij,bmj->bmi", precisions, diff)
    quad = (prec_diff * diff).sum(-1)
    ll = 0.5 * quad - torch.log(nll_weights)
    return ll.min(dim=1).values.numpy()


class TestMaxMixturePrior:
    def test_golden_vs_torch_formula(self):
        gmm = make_synthetic_gmm(n_gaussians=8, dim=69, seed=1)
        prior = MaxMixturePrior(gmm["means"], gmm["covars"], gmm["weights"])
        pose = np.random.RandomState(2).randn(16, 69).astype(np.float32)
        got = np.asarray(prior(jnp.asarray(pose)))
        want = torch_reference_nll(gmm, pose)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_mean_pose_has_low_nll(self):
        gmm = make_synthetic_gmm(n_gaussians=4, dim=12, seed=3)
        prior = MaxMixturePrior(gmm["means"], gmm["covars"], gmm["weights"])
        at_means = np.asarray(prior(jnp.asarray(gmm["means"],
                                                jnp.float32)))
        far = np.asarray(
            prior(jnp.asarray(gmm["means"] + 10.0, jnp.float32))
        )
        assert np.all(at_means < far)

    def test_load_gmm_prior_roundtrip(self, tmp_path):
        gmm = make_synthetic_gmm(n_gaussians=8, dim=69, seed=4)
        path = str(tmp_path / "gmm_08.pkl")
        with open(path, "wb") as f:
            pickle.dump(gmm, f)
        prior = load_gmm_prior(path)
        assert prior is not None
        pose = np.zeros((2, 69), np.float32)
        out = np.asarray(prior(jnp.asarray(pose)))
        assert out.shape == (2,) and np.all(np.isfinite(out))

    def test_load_missing_returns_none(self, tmp_path):
        assert load_gmm_prior(str(tmp_path / "nope.pkl")) is None
        assert load_gmm_prior("") is None


class TestAnglePrior:
    def test_formula(self):
        pose = np.zeros((1, 69), np.float32)
        out = np.asarray(angle_prior(jnp.asarray(pose)))
        np.testing.assert_allclose(out, np.ones((1, 4)), atol=1e-6)

    def test_bent_knee_direction(self):
        """Natural knee bend (positive x-rotation at idx 9/12) must be
        cheaper than hyperextension."""
        pose = np.zeros((1, 69), np.float32)
        pose[0, 9] = 1.0  # left knee natural bend
        natural = float(np.asarray(angle_prior(jnp.asarray(pose)))[0, 2])
        pose[0, 9] = -1.0
        hyper = float(np.asarray(angle_prior(jnp.asarray(pose)))[0, 2])
        assert natural < hyper


class TestSMPLifyWithPrior:
    def test_fit_with_gmm_prior_reduces_error(self):
        from gesturediffusion_tpu.models.smpl import make_synthetic_smpl
        from gesturediffusion_tpu.viz.joints2smpl import (
            _fk_joints,
            joints2smpl,
        )

        smpl = make_synthetic_smpl(n_vertices=96)
        t = 2
        rs = np.random.RandomState(0)
        true_pose = jnp.asarray(rs.randn(t, 24, 3) * 0.2, jnp.float32)
        transl = jnp.asarray(rs.randn(t, 3) * 0.1, jnp.float32)
        target = np.asarray(_fk_joints(smpl, true_pose, transl))

        gmm = make_synthetic_gmm(n_gaussians=4, dim=69, seed=5)
        prior = MaxMixturePrior(gmm["means"], gmm["covars"], gmm["weights"])
        fit = joints2smpl(
            smpl, target, num_smplify_iters=120, lr=0.05, pose_prior=prior
        )
        pred = np.asarray(
            _fk_joints(
                smpl,
                jnp.asarray(fit["thetas"]),
                jnp.asarray(fit["root_translation"]),
            )
        )
        init_err = float(np.mean(np.sum(target[:, :22] ** 2, -1)))
        final_err = float(
            np.mean(np.sum((pred[:, :22] - target[:, :22]) ** 2, -1))
        )
        assert final_err < 0.5 * init_err
        assert fit["loss"][1] < fit["loss"][0]
