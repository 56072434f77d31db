#!/usr/bin/env python3
"""Simulation-based posterior-coverage calibration (SBC) of the sampler.

Evidence accuracy is anchored elsewhere (tools/truth_anchor.py, the
repeats ladder); this study calibrates the POSTERIOR: draw truths from
the prior, generate noisy 1-component CIV mock spectra, fit every
realization with the production pipeline sharded over the device mesh
(:func:`mcalf_tpu.parallel.fit_many`), and test

* SBC rank uniformity -- for each parameter, the weighted posterior rank
  of the truth, ``r = sum_i w_i 1[u_i < u*]``, must be U(0,1) across
  realizations (Talts et al. 2018 style, in unit-cube coordinates --
  the prior transform is monotone per-dimension, so cube ranks equal
  physical ranks);
* central credible-interval coverage -- the truth must fall inside the
  central 68%/95% (weighted-quantile) intervals for the binomially
  expected fraction of realizations.

The reference has no analogue (its posterior calibration is implicit in
trusting PolyChord); SURVEY.md section 4 lists the mock generator as the
de-facto integration test -- this closes the loop on it.  Usage:

    python tools/coverage_study.py [out.json] [n_realizations]

Run under the virtual CPU mesh for a deterministic 8-way shard:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu
"""

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import numpy as np


def _weighted_quantile(x, w, q):
    """Quantiles of samples ``x`` with normalized weights ``w``."""
    order = np.argsort(x)
    cw = np.cumsum(w[order])
    return np.interp(q, cw, x[order])


def run_coverage(
    n_real=64,
    nlive=100,
    max_samples=6000,
    seed=20260819,
    mesh=None,
    noise_sigma=0.02,
):
    """Run the SBC battery; returns a summary dict (see module docstring).

    Problems are stacked and sharded with :func:`fit_many`, so this also
    exercises the fleet path end-to-end with structurally identical but
    data-distinct problems."""
    import jax

    from mcalf_tpu.atomic import get_lines
    from mcalf_tpu.models import AbsorptionModel
    from mcalf_tpu.parallel import fit_many
    from mcalf_tpu.sampler import NSConfig

    n = 300
    wave = np.linspace(6180.0, 6220.0, n)
    lines = get_lines(["CIV 1548", "CIV 1550"])
    kw = dict(
        lines=lines, ncomp=(1, 1), specres=[8.0],
        Nrange=[12.8, 14.0], brange=[10.0, 40.0], zrange=[2.997, 3.003],
    )
    base = AbsorptionModel(
        wave=wave, flux=np.ones(n), noise=np.full(n, noise_sigma), **kw
    )
    ndim = base.ndim

    rng = np.random.default_rng(seed)
    truths_u = rng.uniform(size=(n_real, ndim)).astype(np.float32)
    problems = []
    for i in range(n_real):
        p = base.scale_cube(truths_u[i])
        clean = base.reconstruct_spec(p)
        noisy = clean + rng.normal(0.0, noise_sigma, n)
        problems.append(
            AbsorptionModel(
                wave=wave, flux=noisy, noise=np.full(n, noise_sigma), **kw
            )
        )

    cfg = NSConfig(ndim=ndim, nlive=nlive, max_samples=max_samples)
    res = fit_many(problems, cfg, seed=seed % 100000, mesh=mesh)

    samples = np.asarray(res.samples_u)          # (n_real, cap, ndim)
    logpw = np.asarray(res.log_posterior_weights, np.float64)

    ranks = np.empty((n_real, ndim))
    cover = {0.68: np.zeros((n_real, ndim), bool),
             0.95: np.zeros((n_real, ndim), bool)}
    for i in range(n_real):
        w = np.exp(logpw[i] - logpw[i].max())
        w /= w.sum()
        for d in range(ndim):
            x = samples[i, :, d]
            ranks[i, d] = float(w[x < truths_u[i, d]].sum())
            for lvl in (0.68, 0.95):
                lo, hi = _weighted_quantile(
                    x, w, [(1 - lvl) / 2, 1 - (1 - lvl) / 2]
                )
                cover[lvl][i, d] = lo <= truths_u[i, d] <= hi

    from scipy import stats

    ks_p = [
        float(stats.kstest(ranks[:, d], "uniform").pvalue)
        for d in range(ndim)
    ]
    out = {
        "n_realizations": n_real,
        "ndim": ndim,
        "nlive": nlive,
        "converged_all": bool(
            np.all(np.asarray(res.termination_reason) == 0)
        ),
        "rank_ks_p": [round(p, 4) for p in ks_p],
        "coverage": {},
    }
    for lvl in (0.68, 0.95):
        frac = cover[lvl].mean(axis=0)
        tol = 3.0 * np.sqrt(lvl * (1 - lvl) / n_real)
        out["coverage"][str(lvl)] = {
            "fraction_per_dim": [round(float(f), 3) for f in frac],
            "binomial_3sigma_tol": round(float(tol), 3),
            "ok": bool(np.all(np.abs(frac - lvl) <= tol)),
        }
    out["ranks_ok"] = bool(min(ks_p) > 0.01 / ndim)  # Bonferroni at 1%
    return out


if __name__ == "__main__":
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/coverage_study.json"
    n_real = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    summary = run_coverage(n_real=n_real)
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))
