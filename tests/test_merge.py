"""Run merging via birth contours: single-run invariance and multi-run
error reduction."""

import jax
import jax.numpy as jnp
import numpy as np

from mcalf_tpu.sampler import NSConfig, nested_sample
from mcalf_tpu.sampler.merge import merge_results


def _loglike(sigma=0.05, ndim=2):
    norm = -0.5 * ndim * np.log(2 * np.pi * sigma**2)

    def f(u):
        return (norm - 0.5 * jnp.sum((u - 0.5) ** 2, axis=-1) / sigma**2).astype(
            jnp.float32
        )

    return f


def test_single_run_merge_reproduces_bookkeeping():
    """Merging one run must reproduce its own logZ: the birth/death volume
    reconstruction equals the incremental on-device bookkeeping."""
    ll = _loglike()
    cfg = NSConfig(ndim=2, nlive=150, max_samples=10000)
    res = nested_sample(ll, jax.random.PRNGKey(0), cfg)
    merged = merge_results([res])
    assert abs(merged.logz - float(res.logz)) < 0.05, (
        merged.logz,
        float(res.logz),
    )
    # Batch deletion (B = num_delete) cycles the live count between nlive
    # and nlive-B+1 in likelihood space, so the bulk median sits near
    # nlive - B/2 (with slack for the sawtooth phase).
    B = cfg.resolved().num_delete
    med = np.median(merged.nlive_at_death[: merged.logl.size // 2])
    assert 150 - B / 2 - 15 <= med <= 150, med


def test_multi_run_merge_reduces_error():
    ll = _loglike()
    cfg = NSConfig(ndim=2, nlive=100, max_samples=10000)
    runs = [nested_sample(ll, jax.random.PRNGKey(k), cfg) for k in range(4)]
    merged = merge_results(runs)
    single_err = float(runs[0].logzerr)
    # K=4 runs: error shrinks ~2x; logZ stays consistent with truth (0).
    assert merged.logzerr < 0.7 * single_err
    assert abs(merged.logz) < max(4 * merged.logzerr, 0.1), merged.logz
    # merged live counts ~ 4 * (nlive - B/2) in the bulk (with slack for
    # the deletion sawtooth phase)
    B = cfg.resolved().num_delete
    med = np.median(merged.nlive_at_death[: merged.logl.size // 2])
    assert med > 4 * (100 - B / 2) - 30, med
