"""Automatic num_repeats escalation (sampler/repeats.py): the repeats
ladder that validated the flagship evidence, as a first-class feature."""

import jax
import jax.numpy as jnp
import numpy as np

from mcalf_tpu.sampler import NSConfig, converged_sample


def gaussian_loglike(sigma, ndim, mu=0.5):
    norm = -0.5 * ndim * np.log(2 * np.pi * sigma**2)

    def loglike(u):
        r2 = jnp.sum((u - mu) ** 2, axis=-1)
        return (norm - 0.5 * r2 / sigma**2).astype(jnp.float32)

    return loglike


def test_ladder_escalates_from_undermixed_start():
    # Start DELIBERATELY under-mixed (num_repeats=2 at ndim=4, far below
    # the calibrated 12*ndim): the ladder must climb and finish on a rung
    # whose evidence is consistent with the analytic truth (logZ = 0).
    ndim, sigma = 4, 0.08
    cfg = NSConfig(ndim=ndim, nlive=100, num_repeats=2, max_samples=6000,
                   precision_criterion=1e-2)
    conv = converged_sample(
        gaussian_loglike(sigma, ndim), jax.random.PRNGKey(3), cfg,
        seeds=2, max_doublings=5,
    )
    assert len(conv.ladder) >= 2                 # at least one doubling ran
    assert conv.num_repeats > 2                  # it escalated
    assert conv.converged
    # Merged evidence within 4 combined uncertainties of the truth.
    tol = 4 * max(conv.merged.logzerr, conv.ladder[-1].scatter / np.sqrt(2))
    assert abs(conv.merged.logz) < max(tol, 0.3), (
        conv.merged.logz, conv.ladder
    )
    # The final two rungs agree (that is the acceptance criterion).
    m1 = np.mean(conv.ladder[-1].logz_seeds)
    m0 = np.mean(conv.ladder[-2].logz_seeds)
    assert abs(m1 - m0) < 1.0, conv.ladder


def test_ladder_budget_exhaustion_reported():
    # A 1-rung budget cannot satisfy the doubling criterion's rank gate if
    # we make it unpassable; with rank_p_min=1.0 no rung can pass, so the
    # ladder must report converged=False after its budget.
    ndim, sigma = 2, 0.06
    cfg = NSConfig(ndim=ndim, nlive=60, num_repeats=8, max_samples=2500,
                   precision_criterion=1e-2)
    conv = converged_sample(
        gaussian_loglike(sigma, ndim), jax.random.PRNGKey(5), cfg,
        seeds=1, max_doublings=1, rank_p_min=1.0,
    )
    assert not conv.converged
    assert len(conv.ladder) == 2
    # Results are still returned (lower-confidence estimate).
    assert np.isfinite(conv.merged.logz)
