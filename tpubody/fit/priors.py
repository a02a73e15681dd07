"""Fitting priors: GMoF robustifier, L2, elbow/knee angle prior, GMM pose
prior.

Capability parity with lib/Gen_SMPLH/prior.py:36-231 and util.py:60-71,
re-designed as pure functions (jit/grad-safe):

  * ``gmof``: Geman-McClure robustifier x^2 -> rho^2 * x^2/(x^2+rho^2),
  * ``angle_prior``: exp(+-theta)^2 on the elbow/knee bend components
    (body-pose indices 52,55,9,12 without global orient; the reference's
    55,58,12,15 include it, prior.py:62-89),
  * ``MaxMixturePrior``: negative log of the max-likelihood mixture
    component of a GMM over 69-dim body pose — min over components of
    0.5*(x-mu)^T P (x-mu) - log(w') (prior.py:100-231).  The GMM pickle
    (gmm_08.pkl) is not shipped with the reference; ``load_gmm`` reads the
    standard format, ``synthetic_gmm`` provides a deterministic stand-in.
"""
from __future__ import annotations

import pickle
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def gmof(residual: jnp.ndarray, rho: float = 100.0) -> jnp.ndarray:
    sq = residual ** 2
    return (sq / (sq + rho ** 2)) * rho ** 2


def l2_prior(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(x ** 2)


# Body-pose (69-dim, no global orient) indices of the bend components:
# left elbow z, right elbow z, left knee x, right knee x; signs chosen so a
# natural bend decreases the prior (reference prior.py:62-71).
ANGLE_PRIOR_IDXS = np.array([55, 58, 12, 15]) - 3
ANGLE_PRIOR_SIGNS = np.array([1.0, -1.0, -1.0, -1.0])


def angle_prior(body_pose: jnp.ndarray) -> jnp.ndarray:
    """body_pose: (..., 69).  Returns (..., 4) penalties."""
    comp = body_pose[..., jnp.asarray(ANGLE_PRIOR_IDXS)]
    return jnp.exp(comp * jnp.asarray(ANGLE_PRIOR_SIGNS,
                                      body_pose.dtype)) ** 2


class GMMPrior(NamedTuple):
    means: jnp.ndarray        # (K, D)
    precisions: jnp.ndarray   # (K, D, D)
    log_norm: jnp.ndarray     # (K,) -log(w_k * det-normalizer)


def synthetic_gmm(n_components: int = 8, dim: int = 69,
                  seed: int = 0) -> GMMPrior:
    """Deterministic stand-in GMM centered near zero pose."""
    rng = np.random.default_rng(seed)
    means = rng.normal(scale=0.1, size=(n_components, dim))
    means[0] = 0.0
    prec = np.tile(np.eye(dim) * 4.0, (n_components, 1, 1))
    weights = np.full(n_components, 1.0 / n_components)
    log_norm = -np.log(weights)
    return GMMPrior(means=jnp.asarray(means, jnp.float32),
                    precisions=jnp.asarray(prec, jnp.float32),
                    log_norm=jnp.asarray(log_norm, jnp.float32))


def load_gmm(path: str, dtype=jnp.float32) -> GMMPrior:
    """Load the SMPLify GMM pickle format (keys: means, covars, weights)."""
    with open(path, "rb") as f:
        gmm = pickle.load(f, encoding="latin1")
    if hasattr(gmm, "means_"):
        means, covars, weights = gmm.means_, gmm.covars_, gmm.weights_
    else:
        means, covars, weights = gmm["means"], gmm["covars"], gmm["weights"]
    means = np.asarray(means, np.float64)
    covars = np.asarray(covars, np.float64)
    weights = np.asarray(weights, np.float64)
    precisions = np.stack([np.linalg.inv(c) for c in covars])
    # constant: log(w / sqrt((2pi)^D det C)) -> we keep -log term
    D = means.shape[1]
    dets = np.array([np.linalg.det(c) for c in covars])
    log_norm = -(np.log(weights) - 0.5 * (np.log(dets)
                                          + D * np.log(2 * np.pi)))
    return GMMPrior(means=jnp.asarray(means, dtype),
                    precisions=jnp.asarray(precisions, dtype),
                    log_norm=jnp.asarray(log_norm, dtype))


def max_mixture_prior(body_pose: jnp.ndarray, gmm: GMMPrior) -> jnp.ndarray:
    """NLL of the best mixture component (the reference's merged
    min-component, prior.py:186-231)."""
    diff = body_pose[None, :] - gmm.means                # (K, D)
    mahal = 0.5 * jnp.einsum("kd,kde,ke->k", diff, gmm.precisions, diff)
    return jnp.min(mahal + gmm.log_norm)
