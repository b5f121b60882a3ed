"""Pose priors for SMPLify fitting.

Functional parity surface with the reference priors
(reference: visualize/joints2smpl/src/prior.py — MaxMixturePrior:99 over
gmm_08.pkl with the merged min-NLL formulation :179-195, SMPLifyAnglePrior
:51 knee/elbow bend prior, L2Prior:91).

The reference's constant term hardcodes the 69-dim pose space
(prior.py:154 `(2*np.pi)**(69/2.)`); we reproduce that quirk via
`const_dim` so converted gmm_08.pkl weights match bit-for-bit.
"""

from __future__ import annotations

import functools
import os
import pickle
from typing import Optional

import jax.numpy as jnp
import numpy as np


class MaxMixturePrior:
    """Min-over-components GMM negative log-likelihood on the 69-dim body
    pose (merged formulation, reference prior.py:179-195):

        nll(pose) = min_m [ 0.5 * (pose-mu_m)^T P_m (pose-mu_m)
                            - log(w_m / (const * sqrtdet_m/min sqrtdet)) ]
    """

    def __init__(
        self,
        means: np.ndarray,    # [M, D]
        covs: np.ndarray,     # [M, D, D]
        weights: np.ndarray,  # [M]
        epsilon: float = 1e-16,
        const_dim: int = 69,
    ):
        means = np.asarray(means, np.float64)
        covs = np.asarray(covs, np.float64)
        weights = np.asarray(weights, np.float64)
        precisions = np.stack([np.linalg.inv(c) for c in covs])
        sqrdets = np.array([np.sqrt(np.linalg.det(c)) for c in covs])
        const = (2 * np.pi) ** (const_dim / 2.0)
        nll_weights = weights / (const * (sqrdets / sqrdets.min()))

        # keep constants as HOST numpy: eagerly-created device arrays
        # closed over by jit can crash/hang on tunneled TPU backends
        # (they become baked constants when converted inside the trace)
        self.means = np.asarray(means, np.float32)
        self.precisions = np.asarray(precisions, np.float32)
        self.nll_weights = np.asarray(nll_weights, np.float32)
        self.epsilon = epsilon
        self.random_var_dim = means.shape[1]

    def __call__(self, pose: jnp.ndarray) -> jnp.ndarray:
        """pose [B, D] flat body pose -> [B] min-component NLL."""
        means = jnp.asarray(self.means)
        precisions = jnp.asarray(self.precisions)
        log_nll_w = jnp.log(jnp.asarray(self.nll_weights))
        diff = pose[:, None, :] - means[None]               # [B, M, D]
        prec_diff = jnp.einsum("mij,bmj->bmi", precisions, diff)
        quad = jnp.sum(prec_diff * diff, -1)                # [B, M]
        ll = 0.5 * quad - log_nll_w[None]
        return jnp.min(ll, axis=1)


def load_gmm_prior(
    path: str, epsilon: float = 1e-16
) -> Optional[MaxMixturePrior]:
    """Load gmm_08.pkl (dict or sklearn-GMM pickle) into a MaxMixturePrior;
    None when the asset is absent (reference: prior.py:118-137).

    Loads are cached per (path, epsilon) — joints2smpl auto-loads the
    prior on every fit, and a rendering loop fits once per clip."""
    if not path or not os.path.exists(path):
        return None
    return _load_gmm_prior_cached(path, epsilon)


@functools.lru_cache(maxsize=8)
def _load_gmm_prior_cached(
    path: str, epsilon: float
) -> MaxMixturePrior:
    with open(path, "rb") as f:
        gmm = pickle.load(f, encoding="latin1")
    if isinstance(gmm, dict):
        means, covs, weights = gmm["means"], gmm["covars"], gmm["weights"]
    elif hasattr(gmm, "means_"):
        means, covs, weights = gmm.means_, gmm.covars_, gmm.weights_
    else:
        raise ValueError(f"Unknown GMM pickle type: {type(gmm)}")
    return MaxMixturePrior(means, covs, weights, epsilon=epsilon)


def make_synthetic_gmm(
    n_gaussians: int = 8, dim: int = 69, seed: int = 0
) -> dict:
    """Random well-conditioned GMM in the gmm_08.pkl dict layout."""
    rs = np.random.RandomState(seed)
    means = rs.randn(n_gaussians, dim) * 0.3
    covs = []
    for _ in range(n_gaussians):
        a = rs.randn(dim, dim) * 0.05
        covs.append(a @ a.T + np.eye(dim) * 0.5)
    weights = rs.rand(n_gaussians)
    weights = weights / weights.sum()
    return {
        "means": means.astype(np.float64),
        "covars": np.stack(covs).astype(np.float64),
        "weights": weights.astype(np.float64),
    }


# host numpy (not eager device arrays — see MaxMixturePrior note)
ANGLE_PRIOR_IDX = np.asarray([55 - 3, 58 - 3, 12 - 3, 15 - 3])
ANGLE_PRIOR_SIGNS = np.asarray([1.0, -1.0, -1.0, -1.0], np.float32)


def angle_prior(body_pose: jnp.ndarray) -> jnp.ndarray:
    """Knee/elbow bend prior on the flat 69-dim body pose
    (reference: prior.py:51-88, indices corrected for no-global pose)."""
    return (
        jnp.exp(
            body_pose[:, jnp.asarray(ANGLE_PRIOR_IDX)]
            * jnp.asarray(ANGLE_PRIOR_SIGNS)
        )
        ** 2
    )
