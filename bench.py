#!/usr/bin/env python3
"""Flagship benchmark: the reference's shipped workload end-to-end on TPU.

Workload (reference testdata/fit.cfg:24-42): trans-dimensional fit of the
10-component CIV mock with ncomp in [8,11] (ndim=34), nlive=200 -- run
entirely on-device by the native nested sampler in its PRODUCTION
configuration: label-gauge fixing + triplet-DE (canon_layout), mode
clustering, the fused Pallas likelihood kernel,
num_delete = nlive//2 = 100 (the measured throughput knee),
num_repeats = 544 -- the FIRST CONVERGED RUNG of the round-5 repeats
ladder, recalibrated on FRESH seeds (tools/flagship_study_r05_anchor.jsonl,
seeds 51-62, current kernel): 272 -> 4856.60 +/- 0.46 (n=8),
544 -> 4854.94 +/- 0.48 (n=8), 1088 -> 4855.37 (n=2).  The 272->544
doubling shift is -1.66 +/- 0.66 (2.5 sigma) -- REAL residual
under-mixing bias at 272 -- while 544->1088 is +0.43 +/- 1.45, so the
ladder criterion (run at the first rung whose doubling moves logZ by
less than its combined uncertainty) selects 544.  Rounds 3-4 ran 272:
their '544 pool' (4856.45 +/- 0.31, n=4) was seeds 43/44 counted twice
across scheduler variants -- correlated with the bench's own merged
seeds, so the gate was judging the rung against its own draws and the
bias was invisible.  The per-seed logZ scatter is sd ~1.33, 1.6x the
quoted per-run logzerr ~0.84 (SEED_SCATTER_SD below); the convergence
gate uses the measured scatter, not the quoted error.  ``converged``
gates on the termination criterion AND green insertion ranks AND the
merged evidence landing within 2 sigma of the fresh-seed 544+1088
pooled limit (logz_vs_ladder_limit).

Two independent seeds are fit and merged via birth-contour run merging
(sampler/merge.py).  ``converged`` gates on the evidence termination
criterion AND the Fowlie et al. insertion-rank health test (p > 0.01)
for every seed -- a failing sampler cannot report success.

Printed JSON:
* value          -- end-to-end wall-clock of ONE converged fit [s] with
                    the executables resident (seed A; seed B repeats it
                    as extra.fit_s_warm -- the two agree when the TPU
                    relay is healthy).  The one-time executable
                    build/load happens inside an UNTIMED
                    sampler.warmup_executables call (two production-shape
                    steps driving every executable on the fit path; round 4
                    used a full warmup fit, which buried the load tail
                    under ~46 s of redundant fit compute) whose wall-clock
                    is recorded as extra.warmup_compile_s, with
                    extra.distinct_executables counting the programs built
                    (jax.monitoring backend-compile events) and
                    extra.compile_cache saying whether it was a cold XLA
                    compile or a hit in the persistent executable cache
                    (utils/compile_cache.py, repo-local .jax_cache/).
                    Why untimed: the axon relay's compile/load time is
                    dominated by ITS recovery state, not by this code --
                    measured 46 s (healthy, cold), 645 s (recovering,
                    cold), 90-150 s (recovering, warm cache) for the
                    identical program; folding that lottery into the
                    headline made rounds incomparable.  A production
                    deployment with the cache enabled pays it once per
                    model shape, ever.
* vs_baseline    -- sustained-throughput ratio, on the SAME chip, of our
                    sampler's execution pattern (likelihood batched over the
                    deletion block) versus the reference's execution pattern
                    (its best solver, jaxns, evaluates the likelihood
                    point-sequentially inside the sampler loop; re-expressed
                    faithfully in ops/reference_style.py).  The reference
                    publishes no absolute numbers (BASELINE.md), so
                    same-hardware pattern speedup is the honest comparison.
                    NOTE round 4 fixed a ~4x dispatch dilution in the
                    kernel-level rate measurements (_make_sustained
                    docstring); vs_baseline and the formulation ratios are
                    therefore NOT comparable to rounds 1-3 (which
                    understated them), while `value` and fit_evals_per_s
                    always were and remain measured inside real fits.
* extra          -- merged/per-seed logZ + rank health, eval counts,
                    throughputs, a MEASURED VPU-roofline utilization, the
                    fused-Pallas vs XLA head-to-head at the production
                    batch, a num_delete batch-width study, and an
                    interleaved 4-problem-vmapped occupancy measurement.
"""

import json
import os
import sys
import time

import numpy as np

#: Round-5 repeats-ladder limit: the FRESH-SEED 544+1088 pool with the
#: current kernel (tools/flagship_study_r05_anchor.jsonl, seeds 51-58 at
#: 544 and 55-56 at 1088, n=10): 4855.03 +/- 0.44.  Replaces the round-3
#: value 4856.7, which pooled seeds 43/44 twice (scheduler variants) --
#: the same seeds the bench merges, so the old limit was correlated with
#: the quantity it gated AND sat in the 272-rung bias (see the module
#: docstring).  The round-3 fixed-k decomposition (4857.5) shares both
#: defects: fixed-k runs at 272 repeats on seeds 43/44.
LADDER_LIMIT = 4855.03
#: sem of the pooled limit above
LADDER_LIMIT_SEM = 0.44
#: Measured per-seed logZ scatter at the production rung (sd over the
#: n=8 fresh 544 runs; 1.6x the quoted per-run logzerr ~0.84 -- the
#: quoted error understates run-to-run variation, so gates use this).
SEED_SCATTER_SD = 1.33


def _find_testdata(name):
    here = os.path.dirname(os.path.abspath(__file__))
    for root in (os.path.join(here, "testdata"), "/root/reference/testdata"):
        p = os.path.join(root, name)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(name)


def _make_sustained(fn, arg, iters=400):
    """Sustained-rate measure of ``fn`` over a batch ``arg``.

    Round-4 methodology fixes (the relay taught us three lessons, see
    CLAUDE.md):
    * iters=400 (was 40): one relay dispatch costs ~30 ms; at 40
      iterations x ~0.2 ms of compute the measurement was ~4x
      dispatch-diluted (fused kernel read 248k evals/s while the SAME
      kernel sustained 930k inside a fit), and the dilution compressed
      every kernel-level ratio toward 1 -- including vs_baseline, which
      UNDERSTATED the architectural win.
    * every timed call is salted with a changing scalar that feeds the
      computation: the relay memoizes bit-identical dispatches.
    * the timing barrier is a host transfer (float(...)):
      block_until_ready does not reliably block through the relay.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(x, salt):
        def body(i, acc):
            return acc + jnp.sum(fn(x + acc * 1e-12)) * 1e-20 + 1.0

        return jax.lax.fori_loop(0, iters, body, salt * 1e-20)

    float(loop(arg, jnp.float32(1.0)))  # compile
    salt = [2.0]

    def measure():
        s = jnp.float32(salt[0])
        salt[0] += 1.0
        t0 = time.perf_counter()
        float(loop(arg, s))
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


def _make_roofline_measure(chain=256, nacc=16, shape=(512, 1024), iters=400):
    """Measure closure for the attainable f32 VPU FMA rate on THIS chip
    (the roofline denominator for utilization).

    Round-5 methodology fixes (each is a measured failure mode):
    * nacc=16 INDEPENDENT accumulator arrays per element: the round-4
      probe chained 32 *dependent* FMAs per element, so the FMA pipeline
      never filled across issue slots and the 'roofline' read 2.2 TFLOP/s
      -- BELOW what the real kernel sustains (hence the unphysical 118%
      utilization).  The ILP sweep (chain x nacc interleaved on-chip)
      plateaus at ~5.5 TFLOP/s at chain=256, nacc=16; chain=512 collapses
      (program too large), both documented by the sweep in the round-5
      notes.
    * the multiplier is a TRACED argument, so XLA cannot constant-fold
      the chain (with a literal 1.0000001 the algebraic collapse is
      legal).
    * every timed call is salted (the relay memoizes bit-identical
      dispatches -- a salt-free probe read 1651 'TFLOP/s').
    * the timing barrier is a host transfer (float), since
      block_until_ready does not reliably block through the relay.

    ~1.7 TFLOP per timed call amortizes the relay's per-call overhead.
    Returns a measure() -> FLOP/s closure compatible with
    _interleaved_best, so the roofline can be sampled IN THE SAME
    interleaved block as the kernel rate it normalizes (the relay drifts
    up to 5x within a session; a roofline sampled at a different moment
    is not a valid denominator)."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones(shape, jnp.float32)

    @jax.jit
    def loop(x, m):
        accs = [x * (1.0 + 0.001 * i) for i in range(nacc)]

        def _chain(a):
            for _ in range(chain):
                a = a * m + 1e-7
            return a

        accs = jax.lax.fori_loop(
            0, iters, lambda i, accs: [_chain(a) for a in accs], accs
        )
        s = accs[0]
        for a in accs[1:]:
            s = s + a
        return jnp.sum(s)

    salt = [1.0000001]
    float(loop(x, jnp.float32(salt[0])))  # compile

    def measure():
        # Salt step must SURVIVE the float32 cast (spacing at 1.0 is
        # ~1.2e-7; a 1e-9 step left the multiplier bit-identical across
        # calls).  1e-6 changes bits every call while keeping m^
        # (chain*iters) finite over any plausible number of calls.
        salt[0] += 1e-6
        m = jnp.float32(salt[0])
        t0 = time.perf_counter()
        float(loop(x, m))
        dt = time.perf_counter() - t0
        return 2.0 * chain * nacc * iters * x.size / dt

    return measure


def _measure_vpu_roofline():
    """Best-of-3 standalone roofline sample (see _make_roofline_measure)."""
    m = _make_roofline_measure()
    return max(m() for _ in range(3))


def _hi_forest_fit():
    """Secondary workload: HI Lya forest + filler nuisance line (BASELINE.md
    config #4, mirroring tests/test_hi_forest.py) -- a different transition,
    grid, and trans-dimensional shape (ncomp 1-3 + 1 filler, ndim=13) so the
    recorded numbers show the sampler generalizes beyond the CIV flagship.
    Truth: 2 HI components plus a CIV contaminant the filler absorbs."""
    import jax
    import numpy as np

    from mcalf_tpu.atomic import get_lines
    from mcalf_tpu.models import AbsorptionModel, make_jax_forward
    from mcalf_tpu.models.forward import CLIGHT_KMS
    from mcalf_tpu.sampler import NSConfig, insertion_rank_test, nested_sample

    velstep = 2.0
    step = 1.0 + velstep / CLIGHT_KMS
    n = 400
    wave = 4251.0 * step ** np.arange(n)
    gen = AbsorptionModel(
        wave=wave, flux=np.ones(n), noise=np.full(n, 0.02),
        lines=get_lines(["HI 1215"]), ncomp=(2, 2), specres=[8.0],
    )
    p = np.array([2.0, 13.6, 2.4975, 25.0, 13.2, 2.4995, 18.0])
    flux = gen.reconstruct_spec(p)
    civ = AbsorptionModel(
        wave=wave, flux=np.ones(n), noise=np.full(n, 0.02),
        lines=get_lines(["CIV 1548"]), ncomp=(1, 1), specres=[8.0],
    )
    zciv = 4259.0 / 1548.204 - 1.0
    flux = flux * civ.reconstruct_spec(np.array([1.0, 13.4, zciv, 12.0]))
    rng = np.random.RandomState(7)
    noisy = flux + rng.normal(0, 0.02, n)

    m = AbsorptionModel(
        wave=wave, flux=noisy, noise=np.full(n, 0.02),
        lines=get_lines(["HI 1215"]), ncomp=(1, 3), nfill=1,
        specres=[8.0], Nrange=[12.5, 14.5], brange=[10.0, 40.0],
        zrange=[(4251.0 / 1215.67 - 1), (4262.0 / 1215.67 - 1)],
        Nrangefill=[12.5, 15.0], brangefill=[5.0, 30.0],
    )
    fwd = make_jax_forward(m)
    cfg = NSConfig(
        ndim=m.ndim, nlive=100, max_samples=8000, precision_criterion=0.05,
        canon_layout=m.canon_layout(),
    )
    t0 = time.perf_counter()
    res = nested_sample(fwd.loglike_cube, jax.random.PRNGKey(11), cfg)
    jax.block_until_ready(res.logz)
    wall = time.perf_counter() - t0
    diag = insertion_rank_test(res, cfg)
    # Posterior over the active component count (ncomp dim is index 0; no
    # free specres/continuum in this model).
    lo, hi = float(fwd.bounds_lo[0]), float(fwd.bounds_hi[0])
    k = np.floor(lo + np.asarray(res.samples_u)[:, 0] * (hi - lo)).astype(int)
    w = np.exp(np.asarray(res.log_posterior_weights, np.float64))
    mass = {int(kk): float(w[k == kk].sum()) for kk in np.unique(k)}
    map_ncomp = max(mass, key=mass.get)
    return {
        "wall_s": round(wall, 1),
        "logz": round(float(res.logz), 2),
        "logzerr": round(float(res.logzerr), 2),
        "n_like": int(res.n_like),
        "rank_p": round(diag.p_value, 4),
        "map_ncomp": map_ncomp,
        "map_ncomp_mass": round(mass[map_ncomp], 3),
        "converged": bool(int(res.termination_reason) == 0),
    }


def main():
    import dataclasses

    # Persistent executable cache (utils/compile_cache.py): the sampler's
    # one-time XLA compile is ~half a cold flagship fit.  Enabled BEFORE
    # the first compile; extra.compile_cache records whether this run
    # started warm so the headline is never silently flattered -- a cold
    # run's `value` includes the compile, a warm run's legitimately
    # doesn't (the executable is on disk, as in any production
    # deployment that enables the cache).
    from mcalf_tpu.utils.compile_cache import enable_compile_cache

    cache_dir = enable_compile_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    )
    cache_warm = bool(cache_dir and os.listdir(cache_dir))

    # Self-warm the cache in a SUBPROCESS (untimed) so the timed warmup
    # below always measures CROSS-PROCESS cache loads -- the
    # "time-to-first-result with a warm cache" the metric is defined as --
    # rather than cold XLA compiles whenever .jax_cache/ was cleared (e.g.
    # by a cache-key change).  In-process warming would be cheating: the
    # executables would already be resident in memory and the timed warmup
    # would measure neither a compile nor a load.  Unconditional (not
    # gated on the directory being empty): cache keys include the backend,
    # so entries left by a CPU run would make a non-empty directory look
    # warm to a TPU bench; when entries for this backend already exist the
    # subprocess is a cheap idempotent load (~21 s healthy relay).  Cache
    # keys are entry-script-independent (utils/compile_cache.py), so the
    # tools/warm_cache.py entries are visible here.  Failure (wedged
    # relay, missing tool) falls through to the honest cold measurement.
    if cache_dir:
        import subprocess

        warm_tool = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools", "warm_cache.py"
        )
        try:
            print("bench: pre-warming the executable cache in a subprocess (untimed)")
            subprocess.run([sys.executable, warm_tool], timeout=1800, check=False)
        except Exception as e:  # noqa: BLE001 - never let warming kill the bench
            print(f"bench: cache pre-warm failed ({e}); continuing cold")
        cache_warm = bool(os.listdir(cache_dir))

    import jax

    from mcalf_tpu.models import AbsorptionModel, make_jax_forward
    from mcalf_tpu.ops.reference_style import make_reference_style_loglike
    from mcalf_tpu.sampler import (
        NSConfig,
        init_state,
        insertion_rank_test,
        merge_results,
        nested_sample,
        run_steps,
        warmup_executables,
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
    # PRODUCTION kernel configuration: gauge fixing + triplet-DE via
    # canon_layout (exactly what runner.run_fit applies, runner.py:186-193)
    # and the retuned num_delete default (nlive//2 = 100).
    cfg = NSConfig(
        ndim=model.ndim,
        nlive=200,
        num_repeats=544,
        max_samples=60000,
        precision_criterion=1e-3,
        canon_layout=model.canon_layout(),
    )

    # ---- untimed warmup: make the flagship executables resident ----------
    # (see the module docstring: the compile/load wall-clock measures the
    # relay's recovery state, so it is recorded separately, never in
    # `value`.)  Round 5 replaced the round-4 warmup FIT (82.5 s warm-cache,
    # ~46 s of it redundant fit compute) with sampler.warmup_executables:
    # two real steps at production shapes drive every executable on the
    # seed-A path (init_state, the single traced-num_steps run_steps
    # program, the jitted termination check, finalize) through
    # compile-or-cache-load, so warmup now measures the load tail ALONE and
    # time-to-first-result is warmup + one fit.  distinct_executables
    # counts backend compiles/cache-loads during warmup via jax.monitoring
    # (the round-4 tail was ~28 programs -- 15 of them op-by-op eager
    # dispatches from the termination check, since folded into one program,
    # nested.py _not_done_jit).
    compile_events = {"backend_compiles": 0, "cache_hits": 0}

    def _count_compiles(key, *a, **kw):
        if key == "/jax/core/compile/backend_compile_duration":
            compile_events["backend_compiles"] += 1

    def _count_hits(key, **kw):
        if key == "/jax/compilation_cache/cache_hits":
            compile_events["cache_hits"] += 1

    jax.monitoring.register_event_duration_secs_listener(_count_compiles)
    jax.monitoring.register_event_listener(_count_hits)
    t0 = time.perf_counter()
    warmup_executables(fwd.loglike_cube, jax.random.PRNGKey(7), cfg)
    warmup_compile_s = time.perf_counter() - t0
    distinct_executables = compile_events["backend_compiles"]
    cache_hits_at_warmup = compile_events["cache_hits"]
    # Second call with everything resident: separates the relay's recovery
    # lottery (warmup_compile_s measured 21 s healthy / 197 s recovering
    # for the IDENTICAL 6-program load) from the actual per-call cost of
    # the warmup steps.
    # (fresh key: a bit-identical repeat dispatch could be relay-memoized)
    t0 = time.perf_counter()
    warmup_executables(fwd.loglike_cube, jax.random.PRNGKey(8), cfg)
    warmup_repeat_s = time.perf_counter() - t0

    # Roofline sample before the fits (relay drift; two more later).
    roofline_pre = _measure_vpu_roofline()

    # ---- end-to-end converged fits (2 seeds) + merge --------------------
    runs, times, ranks = [], [], []
    for seed in (43, 44):
        t0 = time.perf_counter()
        res = nested_sample(fwd.loglike_cube, jax.random.PRNGKey(seed), cfg)
        jax.block_until_ready(res.logz)
        times.append(time.perf_counter() - t0)
        runs.append(res)
        ranks.append(insertion_rank_test(res, cfg))
    fit_s = times[0]
    fit_s_warm = times[1]  # seed B reuses seed A's single executable
    n_like = int(runs[0].n_like)
    merged = merge_results(runs)
    logz_seeds = [round(float(r.logz), 3) for r in runs]
    seed_spread = round(max(logz_seeds) - min(logz_seeds), 3)
    # A failing health check or a truncated run is NOT a success, whatever
    # the termination flag says (the round-2 verdict's gating requirement).
    # Third gate per the module docstring: the merged evidence must land
    # within 2 sigma of the fresh-seed pooled ladder limit (round 4 used
    # 3 sigma of an uncertainty built from the QUOTED logzerr; the round-5
    # recalibration measured the real per-seed scatter at 1.6x that, and
    # a correlated limit -- see LADDER_LIMIT).  The merged-run scatter is
    # SEED_SCATTER_SD/sqrt(2) (two seeds), combined with the limit's sem.
    ladder_tol = 2.0 * float(
        np.hypot(SEED_SCATTER_SD / np.sqrt(2.0), LADDER_LIMIT_SEM)
    )
    converged = (
        all(int(r.termination_reason) == 0 for r in runs)
        and all(d.p_value > 0.01 for d in ranks)
        and abs(merged.logz - LADDER_LIMIT) < ladder_tol
    )

    # Roofline sample adjacent to the fits (the relay drifts; see
    # _measure_vpu_roofline) -- max over pre/post/end samples is used.
    roofline_a = max(roofline_pre, _measure_vpu_roofline())

    # Secondary workload: HI forest + filler (different transition/grid/
    # trans-dimensional shape; generality evidence).
    hi_forest = _hi_forest_fit()

    # ---- nlive=400 / num_delete=200 flagship study -----------------------
    # The round-3 num_delete sweep peaked at 876 kevals/s at B=200, but
    # B=200 needs nlive >= 400, and convergence needs ~2x the dead points
    # at 2x nlive -- whether the per-eval throughput win survives
    # END-TO-END is an empirical question answered here: one converged fit
    # at the same calibrated num_repeats, judged against the ladder limit.
    # (Round-4 measurement: the higher rate does NOT make up for the 2x
    # work; nlive=200 stays the production flagship config.)
    cfg400 = dataclasses.replace(
        cfg, nlive=400, num_delete=200, max_samples=120000
    )
    t0 = time.perf_counter()
    res400 = nested_sample(fwd.loglike_cube, jax.random.PRNGKey(43), cfg400)
    jax.block_until_ready(res400.logz)
    wall400 = time.perf_counter() - t0
    d400 = insertion_rank_test(res400, cfg400)
    nlive400_study = {
        "wall_s": round(wall400, 1),
        "logz": round(float(res400.logz), 3),
        "logzerr": round(float(res400.logzerr), 3),
        "n_like": int(res400.n_like),
        "kevals_per_s": round(int(res400.n_like) / wall400 / 1e3),
        "rank_p": round(d400.p_value, 4),
        "vs_ladder_limit": round(float(res400.logz) - LADDER_LIMIT, 3),
        "converged": bool(int(res400.termination_reason) == 0),
    }

    # ---- sustained likelihood throughput vs reference formulation -------
    rng = np.random.default_rng(0)
    lo = np.asarray(fwd.bounds_lo)
    hi = np.asarray(fwd.bounds_hi)

    def draw(B):
        return (
            lo + rng.uniform(0.2, 0.8, size=(B, model.ndim)) * (hi - lo)
        ).astype(np.float32)

    ref_ll = make_reference_style_loglike(model)
    B_prod = cfg.resolved().num_delete
    p200 = draw(cfg.nlive)
    pprod = draw(B_prod)
    p1 = draw(1)
    ours_eps, ref_eps = _interleaved_best(
        [_make_sustained(fwd.loglike, p200), _make_sustained(ref_ll, p200)]
    )
    # The roofline is sampled IN THIS interleaved block so the
    # production-batch kernel rate and its normalizing denominator see the
    # same relay moment (utilization from rates sampled minutes apart was
    # how round 4 printed 118%).
    ours_eps_small, ref_eps_small, roof_at_kernel = _interleaved_best(
        [
            _make_sustained(fwd.loglike, pprod),
            _make_sustained(ref_ll, pprod),
            _make_roofline_measure(),
        ]
    )
    # The reference's execution pattern: point-sequential likelihood calls
    # inside the sampler loop (jaxns, cli.py:275-280).  2000 chained
    # iterations so the ~30 ms relay dispatch is <10% of the measurement
    # (at 300 it was ~half, understating the reference pattern's rate and
    # overstating nothing of ours -- but an inflated ratio is not a ratio
    # we want to quote).
    (ref_eps_seq,) = _interleaved_best(
        [_make_sustained(ref_ll, p1, iters=2000)]
    )

    # ---- fused-Pallas likelihood head-to-head at the production batch ----
    # (the production `fwd` auto-selects the fused kernel on TPU; compare
    # against the explicit XLA path)
    fwd_xla = make_jax_forward(model, use_pallas=False)
    fwd_pal = make_jax_forward(model, use_pallas=True)
    pallas_ratio = {"production_default": fwd.static.use_pallas}
    for tag, batch in (("B100", pprod), ("B200", p200)):
        xla_eps, pal_eps = _interleaved_best(
            [
                _make_sustained(fwd_xla.loglike, batch),
                _make_sustained(fwd_pal.loglike, batch),
            ]
        )
        pallas_ratio[tag] = round(pal_eps / xla_eps, 3)

    # ---- wing-window study: clustered-batch speedup ---------------------
    # The windowed kernel path (ops/voigt_pallas._ll_kernel_win) engages
    # when a deletion block's samples cluster -- the posterior-predictive /
    # dynamic-boost regime.  Sampling fits are chord-heterogeneous, so the
    # flagship headline is window-NEUTRAL by design (PARITY.md); this
    # measures the engaged path at posterior-clustered batches (truth
    # perturbations) against the same model with windowing disabled.
    zs = [2.999, 2.9995, 3.0, 3.001, 3.0005, 3.0015, 3.002, 3.0025,
          3.0035, 3.0039]
    Ns = [13.6, 13.0, 13.8, 13.6, 13.2, 13.4, 13.5, 14.0, 14.2, 13.7]
    bs = [17.5, 10.5, 20.0, 25.0, 15.0, 30.0, 10.0, 25.0, 15.0, 20.0]
    ptruth = [10.5]
    for N, z, b in zip(Ns, zs, bs):
        ptruth += [N, z, b]
    ptruth += [13.0, 3.0, 20.0]
    pc = np.asarray(ptruth, np.float32)[None, :] + (
        rng.normal(0, 1e-4, size=(B_prod, model.ndim)) * (hi - lo)[None, :]
    ).astype(np.float32)
    pc = np.clip(
        pc, lo + 1e-5 * (hi - lo), hi - 1e-5 * (hi - lo)
    ).astype(np.float32)
    os.environ["MCALF_TPU_WINDOW"] = "0"
    fwd_nw = make_jax_forward(model)
    del os.environ["MCALF_TPU_WINDOW"]
    w_eps, nw_eps = _interleaved_best(
        [_make_sustained(fwd.loglike, pc), _make_sustained(fwd_nw.loglike, pc)]
    )
    window_study = {
        "clustered_kevals_per_s": round(w_eps / 1e3),
        "unwindowed_kevals_per_s": round(nw_eps / 1e3),
        "clustered_speedup": round(w_eps / nw_eps, 2),
    }

    # ---- num_delete batch-width study (evals/s via real sampler steps) ---
    # INTERLEAVED across the three widths (like every other comparison
    # here): measured sequentially, the relay's throughput drift scrambled
    # the ratios between bench runs (e.g. 8/25/49 vs 18/59/160 kevals/s
    # for the same code); interleaving decorrelates the drift so only the
    # relative batch-width effect remains.
    def _make_ndel_measure(ndel):
        c2 = NSConfig(
            ndim=model.ndim, nlive=max(cfg.nlive, 2 * ndel),
            num_delete=ndel, num_repeats=64, max_samples=60000,
            canon_layout=model.canon_layout(),
        )
        st = init_state(fwd.loglike_cube, jax.random.PRNGKey(0), c2)
        st = run_steps(fwd.loglike_cube, st, c2, 3)  # compile + warm
        jax.block_until_ready(st.logz)
        holder = {"st": st}

        def measure():
            s0 = holder["st"]
            n0 = int(s0.n_like)
            t0 = time.perf_counter()
            s1 = run_steps(fwd.loglike_cube, s0, c2, 10)
            jax.block_until_ready(s1.logz)
            dt = time.perf_counter() - t0
            holder["st"] = s1
            return (int(s1.n_like) - n0) / dt

        return measure

    ndel_widths = (50, 100, 200)
    ndel_rates = _interleaved_best([_make_ndel_measure(n) for n in ndel_widths])
    ndel_study = {
        str(n): round(r / 1e3) for n, r in zip(ndel_widths, ndel_rates)
    }

    # ---- occupancy: K vmapped flagship problems on ONE chip --------------
    # Is the chip under-filled at one problem per chip?  Measured honestly:
    # aggregate sampler step throughput at K = 1 vs 4 problems VECTORIZED
    # (jax.vmap over NSState -- the likelihood batch becomes (K, B, ndim)),
    # INTERLEAVED in one process so the relay's large throughput drift
    # (measured up to 5x between sessions) cannot masquerade as an
    # occupancy gain (it did exactly that in the round-3 draft: a 'stacked4
    # gain' of 7.4x that an interleaved re-measurement showed to be ~1.0 --
    # one flagship problem already saturates the chip).
    ck = dataclasses.replace(cfg, num_repeats=64, max_samples=4000).resolved()

    def _make_vmeasure(K):
        keys = jax.random.split(jax.random.PRNGKey(0), K)
        st = jax.jit(
            jax.vmap(lambda k: init_state(fwd.loglike_cube, k, ck))
        )(keys)
        step = jax.jit(
            jax.vmap(lambda s: run_steps(fwd.loglike_cube, s, ck, 6))
        )
        st = step(st)  # compile + warm
        jax.block_until_ready(st.logz)
        holder = {"st": st}

        def measure():
            s0 = holder["st"]
            n0 = int(np.sum(np.asarray(s0.n_like)))
            t0 = time.perf_counter()
            s1 = step(s0)
            jax.block_until_ready(s1.logz)
            dt = time.perf_counter() - t0
            holder["st"] = s1
            return (int(np.sum(np.asarray(s1.n_like))) - n0) / dt
        return measure

    k1_eps, k4_eps = _interleaved_best(
        [_make_vmeasure(1), _make_vmeasure(4)]
    )
    occupancy_gain = round(k4_eps / k1_eps, 2)

    # ---- measured utilization -------------------------------------------
    # FLOPs/eval from an automatic op census of the likelihood's jaxpr
    # (utils/flops.py; policy stated there -- elementwise arithmetic at 1
    # FLOP per output element, FMA=2, transcendentals at 1 = a LOWER
    # bound, predicates/selects/data-movement at 0).  The census walks the
    # XLA path's jaxpr; the fused Pallas kernel implements the same math
    # (ops/voigt_pallas.py mirrors models/jax_model.py term for term), so
    # the count applies to both.  Round 4's hand formula (62 FLOP per
    # transition-pixel) under-counted the Harris path ~2x; censused it is
    # ~109, which together with the round-4 dependent-chain roofline bug
    # (see _make_roofline_measure) produced the unphysical 118%.
    from mcalf_tpu.utils.flops import flop_census

    census = flop_census(fwd_xla.loglike, pprod)
    flops = census.flops // B_prod
    # Drift-immune utilization: kernel rate and roofline from the SAME
    # interleaved block (roof_at_kernel above).
    kernel_utilization_pct = round(
        100.0 * ours_eps_small * flops / roof_at_kernel, 1
    )
    # Fit-level throughput from the WARM fit (seed B): seed A's wall-clock
    # carries the one-time executable load.  The fit and the roofline
    # samples are minutes apart, so their ratio carries the relay's
    # throughput drift (up to +/-40%) -- reported for continuity with
    # rounds 1-4, but kernel_utilization_pct is the accountable number.
    fit_eps = int(runs[1].n_like) / fit_s_warm
    roofline = max(roofline_a, roof_at_kernel, _measure_vpu_roofline())
    utilization_pct = round(100.0 * fit_eps * flops / roofline, 1)

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
                    "logz_vs_ladder_limit": round(
                        merged.logz - LADDER_LIMIT, 3
                    ),
                    "num_repeats": cfg.num_repeats,
                    "ladder_limit": LADDER_LIMIT,
                    "ladder_tol_2sigma": round(ladder_tol, 3),
                    "seed_scatter_sd": SEED_SCATTER_SD,
                    "rank_test_p": [round(d.p_value, 4) for d in ranks],
                    "rank_test_p_blocks": [
                        round(d.p_value_blocks, 4) for d in ranks
                    ],
                    "rank_test_kappa": round(ranks[0].kappa, 3),
                    "converged": converged,
                    "n_like": n_like,
                    "fit_s_warm": round(fit_s_warm, 1),
                    "compile_cache": "warm" if cache_warm else "cold",
                    "warmup_compile_s": round(warmup_compile_s, 1),
                    "distinct_executables": distinct_executables,
                    "cache_hits_at_warmup": cache_hits_at_warmup,
                    "warmup_repeat_s": round(warmup_repeat_s, 1),
                    "nlive400_b200": nlive400_study,
                    "fit_evals_per_s": round(fit_eps, 1),
                    "censused_flops_per_eval": flops,
                    "est_sustained_tflops": round(fit_eps * flops / 1e12, 3),
                    "measured_vpu_roofline_tflops": round(roofline / 1e12, 3),
                    "roofline_at_kernel_tflops": round(
                        roof_at_kernel / 1e12, 3
                    ),
                    "kernel_utilization_pct": kernel_utilization_pct,
                    "utilization_pct": utilization_pct,
                    "utilization_note": (
                        "kernel_utilization_pct is drift-immune (kernel "
                        "rate and roofline interleaved in one block); "
                        "utilization_pct divides the fit-level rate by a "
                        "roofline sampled minutes away, so it carries the "
                        "relay's throughput drift and can disagree with "
                        "fused_likelihood_evals_per_s for the same reason"
                    ),
                    "fused_likelihood_evals_per_s": round(ours_eps, 1),
                    "reference_style_evals_per_s": round(ref_eps, 1),
                    "reference_sequential_evals_per_s": round(ref_eps_seq, 1),
                    "formulation_ratio_live_batch": round(ours_eps / ref_eps, 2),
                    "formulation_ratio_deletion_batch": round(
                        ours_eps_small / ref_eps_small, 2
                    ),
                    "hi_forest": hi_forest,
                    "pallas_fused_vs_xla": pallas_ratio,
                    "wing_window": window_study,
                    "num_delete_kevals_per_s": ndel_study,
                    "vmap4_kevals_per_s": round(k4_eps / 1e3),
                    "vmap1_kevals_per_s": round(k1_eps / 1e3),
                    "occupancy_gain_4x": occupancy_gain,
                    "vs_baseline_definition": (
                        "same-chip sustained-throughput ratio of our "
                        "deletion-batched evaluation vs the reference's "
                        "point-sequential pattern (assumes jaxns evaluates "
                        "sequentially; per-element formulation ratios are "
                        "reported separately).  Round 4 amortizes relay "
                        "dispatch out of the kernel-level rates "
                        "(_make_sustained); rounds 1-3 were ~4x "
                        "dispatch-diluted, so this ratio is not comparable "
                        "to theirs (fit-level rates always were)"
                    ),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
