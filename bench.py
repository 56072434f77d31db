#!/usr/bin/env python3
"""Flagship benchmark: the reference's shipped workload end-to-end on TPU.

Workload (reference testdata/fit.cfg:24-42): trans-dimensional fit of the
10-component CIV mock with ncomp in [8,11] (ndim=34), nlive=200,
max_samples=2000, difficult_model -- run entirely on-device by the native
nested sampler.

Printed JSON:
* value          -- best warm end-to-end wall-clock of the full fit [s]
* vs_baseline    -- speedup of our fused batched likelihood over the
                    reference's own computational formulation (scalar-vmap +
                    fori-loops, re-expressed in ops/reference_style.py and
                    vmapped over the same live-point batch) measured on the
                    SAME chip with the SAME batch size.  The reference
                    publishes no absolute numbers (BASELINE.md), so
                    same-hardware formulation speedup is the honest
                    comparison; >1 means the TPU-first design wins.
* extra          -- fit logZ, likelihood-eval throughputs, eval counts.
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
    # nlive/difficult from the reference fit.cfg; max_samples raised from its
    # 2000 to a value that lets the 34-dim evidence actually converge
    # (n_dead ~ nlive * H; H ~ 100 nats here) -- a capped run benchmarks
    # garbage.
    cfg = NSConfig(
        ndim=model.ndim,
        nlive=200,
        max_samples=30000,
        precision_criterion=1e-3,
        difficult_model=True,
    )

    # ---- end-to-end fit wall-clock (warm) -------------------------------
    def run(seed):
        res = nested_sample(fwd.loglike_cube, jax.random.PRNGKey(seed), cfg)
        jax.block_until_ready(res.logz)
        return res

    run(43)  # compile
    times, res = [], None
    for i in range(2):
        t0 = time.perf_counter()
        res = run(43 + i)
        times.append(time.perf_counter() - t0)
    fit_s = min(times)
    n_like = int(res.n_like)

    # ---- likelihood-throughput comparison vs reference formulation ------
    B = cfg.nlive
    rng = np.random.default_rng(0)
    u = rng.uniform(0.2, 0.8, size=(B, model.ndim)).astype(np.float32)
    p = np.asarray(fwd.cube_to_params(u))

    ours = jax.jit(fwd.loglike)
    ref = make_reference_style_loglike(model)

    def throughput(fn, arg, reps=30):
        jax.block_until_ready(fn(arg))  # compile
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(arg)
        jax.block_until_ready(out)
        return reps * B / (time.perf_counter() - t0)

    ours_eps = throughput(ours, p)
    ref_eps = throughput(ref, p)

    print(
        json.dumps(
            {
                "metric": "civ_multicomp_fit_walltime",
                "value": round(fit_s, 3),
                "unit": "s",
                "vs_baseline": round(ours_eps / ref_eps, 2),
                "extra": {
                    "logz": round(float(res.logz), 3),
                    "logzerr": round(float(res.logzerr), 3),
                    "converged": int(res.termination_reason) == 0,
                    "n_like": n_like,
                    "fit_evals_per_s": round(n_like / fit_s, 1),
                    "fused_likelihood_evals_per_s": round(ours_eps, 1),
                    "reference_style_evals_per_s": round(ref_eps, 1),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
