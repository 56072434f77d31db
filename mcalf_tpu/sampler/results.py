"""Posterior post-processing for nested-sampling results.

Equal-weight resampling reproduces the reference's jaxns output path
(/root/reference/mcalf/cli.py:297-325): resample with replacement to
``S = max_samples`` equally weighted samples, then emit the chain matrix
``[weight=1, -2 lnL, params...]`` consumed by the analyzer
(hires_fitter.py:716-721).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mcalf_tpu.sampler.nested import NSResults

__all__ = [
    "resample_equal",
    "posterior_stats",
    "equal_weights_matrix",
]


def resample_equal(key, results, S: int) -> Tuple[jax.Array, jax.Array]:
    """Draw S equally-weighted posterior samples (with replacement) from the
    weighted dead-point set.  Returns (samples_u (S, ndim), logl (S,)).

    Multinomial draws via inverse-CDF (sorted uniforms against the
    cumulative weights) in float64 on host: ``jax.random.categorical``
    materializes an (S, N) Gumbel matrix -- 16 GB for a 4-seed merged
    flagship (S=40000, N~100k), which RESOURCE_EXHAUSTED the chip at
    finalize time -- where this is O(N + S) memory.  This is a one-time
    host-side finalize step (the reference resamples on host too,
    cli.py:298-312).

    Duck-typed: accepts :class:`NSResults` or a
    :class:`~mcalf_tpu.sampler.merge.MergedRun` (host numpy arrays)."""
    logp = np.asarray(results.log_posterior_weights, np.float64)
    w = np.exp(logp - logp.max())
    cdf = np.cumsum(w)
    u = np.asarray(jax.random.uniform(key, (S,), jnp.float32), np.float64)
    idx = np.searchsorted(cdf, u * cdf[-1], side="right")
    idx = np.clip(idx, 0, logp.size - 1)
    return (
        jnp.asarray(np.asarray(results.samples_u, np.float32)[idx]),
        jnp.asarray(np.asarray(results.logl, np.float32)[idx]),
    )


def posterior_stats(results: NSResults):
    """Weighted posterior mean/std per unit-cube dimension (host numpy)."""
    logp = np.asarray(results.log_posterior_weights, np.float64)
    w = np.exp(logp - logp.max())
    w /= w.sum()
    u = np.asarray(results.samples_u, np.float64)
    mean = (w[:, None] * u).sum(axis=0)
    var = (w[:, None] * (u - mean) ** 2).sum(axis=0)
    return mean, np.sqrt(var)


def equal_weights_matrix(samples_phys: np.ndarray, logl: np.ndarray) -> np.ndarray:
    """Chain matrix in the reference's `_equal_weights.txt` layout:
    col0 weight (=1), col1 -2 lnL, cols 2+ the physical parameter vector
    (cli.py:314-322)."""
    samples_phys = np.asarray(samples_phys, np.float64)
    logl = np.asarray(logl, np.float64)
    n = samples_phys.shape[0]
    return np.hstack(
        [np.ones((n, 1)), (-2.0 * logl)[:, None], samples_phys]
    )
