"""Pre-warm the persistent XLA executable cache for every bench workload.

Drives ``sampler.warmup_executables`` (two real production-shape steps:
init_state, the traced-num_steps run_steps program, the one-program
termination check, finalize) for the three bench.py workloads — the CIV
flagship (nlive=200/B=100), the nlive=400/B=200 study variant, and the
HI-forest secondary — so a subsequent ``python bench.py`` starts with
every large executable on disk and its ``warmup_compile_s`` measures the
cache-LOAD tail, not cold XLA compiles (~21 s healthy-relay vs minutes
cold; see bench.py docstring).

Use after anything that invalidates the cache (kernel edits, jax/libtpu
upgrades) or after the ``.jax_cache`` directory is cleared:

    python tools/warm_cache.py

Each warmup call is internally chunked by the sampler (~15 s device
executions), so this respects the axon relay's execution-time limit.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import dataclasses

    from mcalf_tpu.utils.compile_cache import enable_compile_cache

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache_dir = enable_compile_cache(os.path.join(repo, ".jax_cache"))
    print(f"cache dir: {cache_dir}")

    import jax
    import numpy as np

    from mcalf_tpu.atomic import get_lines
    from mcalf_tpu.models import AbsorptionModel, make_jax_forward
    from mcalf_tpu.models.forward import CLIGHT_KMS
    from mcalf_tpu.sampler import NSConfig, warmup_executables

    testdata = os.path.join(repo, "testdata", "civ_mock_spec_multicomp.txt")

    # --- flagship (bench.py main config) -------------------------------
    model = AbsorptionModel.from_file(
        testdata,
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
        canon_layout=model.canon_layout(),
    )
    t0 = time.perf_counter()
    warmup_executables(fwd.loglike_cube, jax.random.PRNGKey(7), cfg)
    print(f"flagship warm: {time.perf_counter() - t0:.1f} s")

    # __graft_entry__.entry() compile-check program: the standalone batched
    # likelihood at the (64, ndim) example shape.
    t0 = time.perf_counter()
    example = np.full((64, model.ndim), 0.5, np.float32)
    jax.block_until_ready(jax.jit(fwd.loglike_cube)(example))
    print(f"entry warm: {time.perf_counter() - t0:.1f} s")

    # --- nlive=400 / num_delete=200 study variant -----------------------
    cfg400 = dataclasses.replace(cfg, nlive=400, num_delete=200, max_samples=120000)
    t0 = time.perf_counter()
    warmup_executables(fwd.loglike_cube, jax.random.PRNGKey(7), cfg400)
    print(f"nlive400 warm: {time.perf_counter() - t0:.1f} s")

    # --- HI-forest secondary workload (bench.py _hi_forest_fit shapes) --
    velstep = 2.0
    step = 1.0 + velstep / CLIGHT_KMS
    n = 400
    wave = 4251.0 * step ** np.arange(n)
    m = AbsorptionModel(
        wave=wave,
        flux=np.ones(n),
        noise=np.full(n, 0.02),
        lines=get_lines(["HI 1215"]),
        ncomp=(1, 3),
        nfill=1,
        specres=[8.0],
        Nrange=[12.5, 14.5],
        brange=[10.0, 40.0],
        zrange=[(4251.0 / 1215.67 - 1), (4262.0 / 1215.67 - 1)],
        Nrangefill=[12.5, 15.0],
        brangefill=[5.0, 30.0],
    )
    fwd_hi = make_jax_forward(m)
    cfg_hi = NSConfig(
        ndim=m.ndim,
        nlive=100,
        max_samples=8000,
        precision_criterion=0.05,
        canon_layout=m.canon_layout(),
    )
    t0 = time.perf_counter()
    warmup_executables(fwd_hi.loglike_cube, jax.random.PRNGKey(11), cfg_hi)
    print(f"hi-forest warm: {time.perf_counter() - t0:.1f} s")

    n_entries = len(os.listdir(cache_dir)) if cache_dir else 0
    print(f"done: {n_entries} cache entries")


if __name__ == "__main__":
    main()
