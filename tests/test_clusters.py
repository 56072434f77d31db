"""Mode clustering: the PolyChord ``do_clustering`` role (reference
cli.py:95) / MultiNest multimodal role (cli.py:179-182).

The acid test: a well-separated two-mode posterior, where a global
covariance smears the proposal geometry across the gap.  The clustered
kernel must recover the analytic evidence AND the 50/50 mode split.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mcalf_tpu.sampler import (
    NSConfig,
    assign_clusters,
    nested_sample,
    posterior_cluster_report,
)


def test_assign_clusters_two_blobs():
    rng = np.random.default_rng(0)
    a = rng.normal(0.25, 0.02, size=(120, 3))
    b = rng.normal(0.75, 0.02, size=(80, 3))
    u = np.concatenate([a, b])
    labels, k = assign_clusters(u)
    assert k == 2
    # ordered by size: cluster 0 is the bigger blob
    assert (labels[:120] == 0).mean() > 0.95
    assert (labels[120:] == 1).mean() > 0.95


def test_assign_clusters_single_gaussian_not_split():
    rng = np.random.default_rng(1)
    u = rng.normal(0.5, 0.1, size=(200, 4))
    labels, k = assign_clusters(u)
    assert k == 1
    assert np.all(labels == 0)


def test_assign_clusters_respects_max_and_degenerate_input():
    rng = np.random.default_rng(2)
    blobs = [rng.normal(0.1 + 0.2 * i, 0.008, size=(50, 2)) for i in range(4)]
    labels, k = assign_clusters(np.concatenate(blobs), max_clusters=3)
    assert k <= 3
    # tiny / identical point sets never crash
    labels, k = assign_clusters(np.full((6, 2), 0.5))
    assert k == 1


def _two_mode_loglike(sigma, ndim, w1=0.5):
    """Equal-width Gaussians at 0.25 and 0.75 with masses w1 / 1-w1:
    Z = 1 exactly (sigma small), logZ = 0."""
    norm = -0.5 * ndim * np.log(2 * np.pi * sigma**2)

    def loglike(u):
        r1 = jnp.sum((u - 0.25) ** 2, axis=-1)
        r2 = jnp.sum((u - 0.75) ** 2, axis=-1)
        l1 = norm + jnp.log(w1) - 0.5 * r1 / sigma**2
        l2 = norm + jnp.log(1 - w1) - 0.5 * r2 / sigma**2
        return jnp.logaddexp(l1, l2).astype(jnp.float32)

    return loglike


def test_two_mode_evidence_and_mass_split():
    ndim, sigma = 4, 0.03
    ll = _two_mode_loglike(sigma, ndim)
    cfg = NSConfig(ndim=ndim, nlive=400, max_samples=40000, max_clusters=8)
    logzs, masses = [], []
    for seed in (0, 1, 2):
        res = nested_sample(ll, jax.random.PRNGKey(seed), cfg)
        assert int(res.termination_reason) == 0
        logzs.append(float(res.logz))
        rep = posterior_cluster_report(res, max_clusters=8)
        assert rep.k == 2, rep.k
        masses.append(float(rep.mass[0]))
        # the two mode means sit at the two centers
        centers = sorted(rep.mean_u[:, 0])
        assert abs(centers[0] - 0.25) < 0.03
        assert abs(centers[1] - 0.75) < 0.03
    # evidence: mean over seeds consistent with the analytic logZ = 0
    assert abs(np.mean(logzs)) < 0.25, logzs
    # mass split: the larger mode holds ~half the mass, not all of it
    assert np.mean(masses) < 0.62, masses


def test_clustered_matches_unclustered_on_unimodal():
    # On a unimodal problem clustering must be a no-op statistically.
    def gauss(u):
        return (
            -0.5 * jnp.sum((u - 0.5) ** 2, axis=-1) / 0.05**2
            - 2 * np.log(2 * np.pi * 0.05**2)
        ).astype(jnp.float32)

    cfg1 = NSConfig(ndim=4, nlive=150, max_samples=12000, max_clusters=1)
    cfg8 = NSConfig(ndim=4, nlive=150, max_samples=12000, max_clusters=8)
    z1 = np.mean(
        [float(nested_sample(gauss, jax.random.PRNGKey(s), cfg1).logz)
         for s in range(4)]
    )
    z8 = np.mean(
        [float(nested_sample(gauss, jax.random.PRNGKey(s), cfg8).logz)
         for s in range(4)]
    )
    # per-run scatter is ~0.25 nats (logzerr at nlive=150), so compare each
    # 4-seed mean to the analytic truth (logZ = 0) rather than to each other
    assert abs(z1) < 0.4, z1
    assert abs(z8) < 0.4, z8
