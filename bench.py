#!/usr/bin/env python3
"""Flagship benchmark: the reference's shipped workload end-to-end on TPU.

Workload (reference testdata/fit.cfg:24-42): trans-dimensional fit of the
10-component CIV mock with ncomp in [8,11] (ndim=34), nlive=200 -- run
entirely on-device by the native nested sampler with the ground-truth
calibrated kernel settings (num_repeats=544 = 16*ndim: the round-2 flagship
study showed 272 under-decorrelates by ~5 nats while 544 is seed-stable;
see tests/test_truth_anchor.py for the quadrature-anchored calibration).

Two independent seeds are fit and merged via birth-contour run merging
(sampler/merge.py), so the reported evidence carries an HONEST cross-seed
check: `extra.logz_seeds` shows the per-seed values, `extra.logz` the
merged estimate, and `extra.seed_spread` their spread (compare with
`extra.logzerr`).

Printed JSON:
* value          -- end-to-end wall-clock of ONE converged fit [s]
                    (seed A; compiled executables are cached)
* vs_baseline    -- sustained-throughput ratio, on the SAME chip, of our
                    sampler's execution pattern (likelihood batched over the
                    deletion block) versus the reference's execution pattern
                    (its best solver, jaxns, evaluates the likelihood
                    point-sequentially inside the sampler loop; the
                    formulation is re-expressed faithfully in
                    ops/reference_style.py, including its direct-exponential
                    Algorithm-916 series).  The reference publishes no
                    absolute numbers (BASELINE.md), so same-hardware
                    pattern speedup is the honest comparison; the
                    assumption is recorded in extra.vs_baseline_definition.
* extra          -- merged/per-seed logZ, convergence, eval counts,
                    throughputs, a FLOP/s utilization estimate, and a
                    num_delete batch-width study.
"""

import json
import os
import sys
import time

import numpy as np


def _find_testdata(name):
    here = os.path.dirname(os.path.abspath(__file__))
    for root in (os.path.join(here, "testdata"), "/root/reference/testdata"):
        p = os.path.join(root, name)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(name)


def _make_sustained(fn, arg, iters=40):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(x):
        def body(i, acc):
            return acc + jnp.sum(fn(x + acc * 1e-12)) * 0.0 + 1.0

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    jax.block_until_ready(loop(arg))  # compile

    def measure():
        t0 = time.perf_counter()
        jax.block_until_ready(loop(arg))
        return iters * arg.shape[0] / (time.perf_counter() - t0)

    return measure


def _interleaved_best(measures, reps=3):
    """Alternate the measurements to decorrelate from device-speed drift;
    take each function's best."""
    best = [0.0] * len(measures)
    for _ in range(reps):
        for i, m in enumerate(measures):
            best[i] = max(best[i], m())
    return best


# Approximate FLOPs of one fused likelihood evaluation (Harris tau path):
# per (transition, pixel): u assembly ~5 + Harris H ~55 + accumulate 2;
# plus exp(-tau), 23-tap convolution and the chi^2 reduction per pixel.
def _flops_per_eval(ntrans, npix, taps):
    return ntrans * npix * 62 + npix * (2 * taps + 6)


def main():
    import jax

    from mcalf_tpu.models import AbsorptionModel, make_jax_forward
    from mcalf_tpu.ops.reference_style import make_reference_style_loglike
    from mcalf_tpu.sampler import (
        NSConfig,
        insertion_rank_test,
        merge_results,
        nested_sample,
    )

    model = AbsorptionModel.from_file(
        _find_testdata("civ_mock_spec_multicomp.txt"),
        fitrange=[(6180.0, 6220.0)],
        fitlines=["CIV 1548", "CIV 1550"],
        ncomp=(8, 11),
        specres=[8.0],
        Nrange=[12.0, 14.5],
        brange=[10.0, 40.0],
        zrange=[2.99, 3.01],
    )
    fwd = make_jax_forward(model)
    cfg = NSConfig(
        ndim=model.ndim,
        nlive=200,
        num_repeats=544,
        max_samples=60000,
        precision_criterion=1e-3,
    )

    # ---- end-to-end converged fits (2 seeds) + merge --------------------
    runs, times, ranks = [], [], []
    for seed in (43, 44):
        t0 = time.perf_counter()
        res = nested_sample(fwd.loglike_cube, jax.random.PRNGKey(seed), cfg)
        jax.block_until_ready(res.logz)
        times.append(time.perf_counter() - t0)
        runs.append(res)
        ranks.append(insertion_rank_test(res, cfg).p_value)
    fit_s = times[0]
    n_like = int(runs[0].n_like)
    merged = merge_results(runs)
    logz_seeds = [round(float(r.logz), 3) for r in runs]
    seed_spread = round(max(logz_seeds) - min(logz_seeds), 3)

    # ---- sustained likelihood throughput vs reference formulation -------
    rng = np.random.default_rng(0)
    lo = np.asarray(fwd.bounds_lo)
    hi = np.asarray(fwd.bounds_hi)

    def draw(B):
        return (
            lo + rng.uniform(0.2, 0.8, size=(B, model.ndim)) * (hi - lo)
        ).astype(np.float32)

    ref_ll = make_reference_style_loglike(model)
    p200 = draw(cfg.nlive)
    p50 = draw(cfg.resolved().num_delete)
    p1 = draw(1)
    ours_eps, ref_eps = _interleaved_best(
        [_make_sustained(fwd.loglike, p200), _make_sustained(ref_ll, p200)]
    )
    ours_eps_small, ref_eps_small = _interleaved_best(
        [_make_sustained(fwd.loglike, p50), _make_sustained(ref_ll, p50)]
    )
    # The reference's execution pattern: point-sequential likelihood calls
    # inside the sampler loop (jaxns, cli.py:275-280).
    (ref_eps_seq,) = _interleaved_best(
        [_make_sustained(ref_ll, p1, iters=300)]
    )

    # ---- num_delete batch-width study (evals/s at fixed quality) --------
    ndel_study = {}
    for ndel in (50, 100, 200):
        c2 = NSConfig(
            ndim=model.ndim, nlive=max(cfg.nlive, 2 * ndel),
            num_delete=ndel, num_repeats=64, max_samples=4000,
        )
        from mcalf_tpu.sampler import init_state, run_steps

        st = init_state(fwd.loglike_cube, jax.random.PRNGKey(0), c2)
        st = run_steps(fwd.loglike_cube, st, c2, 3)  # compile + warm
        jax.block_until_ready(st.logz)
        n0 = int(st.n_like)
        t0 = time.perf_counter()
        st = run_steps(fwd.loglike_cube, st, c2, 10)
        jax.block_until_ready(st.logz)
        dt = time.perf_counter() - t0
        ndel_study[str(ndel)] = round((int(st.n_like) - n0) / dt / 1e3)
        # kevals/s at this deletion-batch width

    ntrans = int(model.transition_table()["pidx"].size)
    flops = _flops_per_eval(ntrans, model.npix, 2 * model.kernel_half_size() + 1)
    fit_eps = n_like / fit_s

    print(
        json.dumps(
            {
                "metric": "civ_multicomp_converged_fit_walltime",
                "value": round(fit_s, 1),
                "unit": "s",
                "vs_baseline": round(ours_eps_small / ref_eps_seq, 2),
                "extra": {
                    "logz": round(merged.logz, 3),
                    "logzerr": round(merged.logzerr, 3),
                    "logz_seeds": logz_seeds,
                    "seed_spread": seed_spread,
                    "rank_test_p": [round(p, 4) for p in ranks],
                    "converged": all(
                        int(r.termination_reason) == 0 for r in runs
                    ),
                    "n_like": n_like,
                    "fit_evals_per_s": round(fit_eps, 1),
                    "est_flops_per_eval": flops,
                    "est_sustained_tflops": round(fit_eps * flops / 1e12, 3),
                    "fused_likelihood_evals_per_s": round(ours_eps, 1),
                    "reference_style_evals_per_s": round(ref_eps, 1),
                    "reference_sequential_evals_per_s": round(ref_eps_seq, 1),
                    "formulation_ratio_live_batch": round(ours_eps / ref_eps, 2),
                    "formulation_ratio_deletion_batch": round(
                        ours_eps_small / ref_eps_small, 2
                    ),
                    "num_delete_kevals_per_s": ndel_study,
                    "vs_baseline_definition": (
                        "same-chip sustained-throughput ratio of our "
                        "deletion-batched evaluation vs the reference's "
                        "point-sequential pattern (assumes jaxns evaluates "
                        "sequentially; per-element formulation ratios ~1 "
                        "are reported separately)"
                    ),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
