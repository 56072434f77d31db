"""Dynamic (posterior-boost) nested sampling: evidence parity, posterior
ESS gain, moment preservation -- the dyPolyChord-role replacement
(sampler/dynamic.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from mcalf_tpu.runner import solver_nsconfig
from mcalf_tpu.sampler import (
    NSConfig,
    dynamic_sample,
    posterior_ess,
    resample_equal,
)


def gaussian_loglike(sigma, ndim, mu=0.5):
    norm = -0.5 * ndim * np.log(2 * np.pi * sigma**2)

    def loglike(u):
        r2 = jnp.sum((u - mu) ** 2, axis=-1)
        return (norm - 0.5 * r2 / sigma**2).astype(jnp.float32)

    return loglike


def test_dynamic_gaussian():
    ndim, sigma = 4, 0.08
    ll = gaussian_loglike(sigma, ndim)
    cfg = NSConfig(ndim=ndim, nlive=100, max_samples=10000)
    dyn = dynamic_sample(ll, jax.random.PRNGKey(0), cfg)

    # evidence: merged estimate agrees with the analytic truth (logZ = 0)
    assert abs(dyn.merged.logz) < max(4 * dyn.merged.logzerr, 0.15), (
        dyn.merged.logz,
        dyn.merged.logzerr,
    )
    # the boost threshold sits below the posterior bulk
    assert dyn.l_init < float(np.nanmax(np.asarray(dyn.base.logl)))

    # posterior ESS: the boost at least ~doubles the effective sample count
    # at the same nlive (its whole run lives inside the posterior bulk)
    ess_base = posterior_ess(dyn.base.log_posterior_weights)
    ess_merged = posterior_ess(dyn.merged.log_posterior_weights)
    assert ess_merged > 1.5 * ess_base, (ess_base, ess_merged)

    # posterior moments preserved by the merge
    su, _ = resample_equal(jax.random.PRNGKey(1), dyn.merged, 4000)
    s = np.asarray(su)
    assert np.all(np.abs(s.mean(axis=0) - 0.5) < 0.015), s.mean(axis=0)
    assert np.all(np.abs(s.std(axis=0) - sigma) < 0.02), s.std(axis=0)


def test_dynamic_resume_bit_identical(tmp_path):
    """A dynamic run killed mid-flight and resumed from its checkpoints must
    reach the same merged evidence as the uninterrupted run (dyPolyChord's
    resume role, reference cli.py:143-144)."""
    from mcalf_tpu.utils.checkpoint import load_state, save_state

    ndim, sigma = 3, 0.08
    ll = gaussian_loglike(sigma, ndim)
    cfg = NSConfig(ndim=ndim, nlive=60, max_samples=6000)

    saved = {}

    def save_cb(prefix):
        def cb(s):
            saved[prefix] = s

        return cb

    straight = dynamic_sample(
        ll,
        jax.random.PRNGKey(5),
        cfg,
        on_chunk_base=save_cb("base"),
        on_chunk_boost=save_cb("boost"),
    )
    # The last callback state of each pass is the terminal state; resume
    # from the TERMINAL base + a round-tripped mid-boost checkpoint: the
    # base pass is replayed as a no-op finalization and the boost continues.
    bpath = str(tmp_path / "ns_state_final.npz")
    save_state(bpath, saved["base"])
    opath = str(tmp_path / "ns_boost_final.npz")
    save_state(opath, saved["boost"])
    resumed = dynamic_sample(
        ll,
        jax.random.PRNGKey(5),
        cfg,
        base_state=load_state(bpath),
        boost_state=load_state(opath),
    )
    assert float(resumed.merged.logz) == float(straight.merged.logz)
    assert resumed.l_init == straight.l_init


def test_merged_logzerr_calibrated_against_repeat_scatter():
    """MergedRun.logzerr (simulated-weights estimate) must be consistent
    with the actual scatter of repeated dynamic runs: the error bar is only
    trustworthy if K independent merged estimates scatter by ~logzerr."""
    ndim, sigma = 3, 0.08
    ll = gaussian_loglike(sigma, ndim)
    cfg = NSConfig(ndim=ndim, nlive=80, max_samples=6000)
    runs = [
        dynamic_sample(ll, jax.random.PRNGKey(100 + i), cfg) for i in range(4)
    ]
    logzs = np.array([r.merged.logz for r in runs])
    errs = np.array([r.merged.logzerr for r in runs])
    # all runs agree with the analytic truth (logZ = 0) within 4 error bars
    assert np.all(np.abs(logzs) < 4 * errs + 0.05), (logzs, errs)
    # the quoted error is the right ORDER: neither 5x smaller than the
    # empirical scatter (overconfident) nor 10x larger (useless)
    scatter = logzs.std(ddof=1)
    assert errs.mean() > scatter / 5, (scatter, errs)
    assert errs.mean() < 10 * scatter + 0.2, (scatter, errs)


def test_dypolychord_solver_maps_to_dynamic():
    assert solver_nsconfig({"solver": "dypolychord"}, ndim=4).dynamic
    assert not solver_nsconfig({"solver": "polychord"}, ndim=4).dynamic
    assert solver_nsconfig(
        {"solver": "polychord", "ns_settings": {"dynamic": "True"}}, ndim=4
    ).dynamic
    assert not solver_nsconfig(
        {"solver": "dypolychord", "ns_settings": {"dynamic": "false"}}, ndim=4
    ).dynamic
    # dynesty's reference role is a DynamicNestedSampler (cli.py:196), so
    # it routes to the dynamic sampler by default too.
    assert solver_nsconfig({"solver": "dynesty"}, ndim=4).dynamic
    assert not solver_nsconfig(
        {"solver": "dynesty", "ns_settings": {"dynamic": "false"}}, ndim=4
    ).dynamic
