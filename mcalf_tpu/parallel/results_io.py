"""Result gathering for sharded fleets: write per-problem chain files.

After :func:`mcalf_tpu.parallel.fit_many` returns stacked NSResults, this
module fans the per-problem posteriors back out to the reference's on-disk
chain format (`.stats` + `_equal_weights.txt` per problem), so downstream
analysis/plotting is identical whether a fit ran alone or in a fleet.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import numpy as np

from mcalf_tpu.io.chains import write_equal_weights, write_stats
from mcalf_tpu.models.batched import index_consts
from mcalf_tpu.models.jax_model import cube_to_params_core
from mcalf_tpu.sampler.nested import NSResults
from mcalf_tpu.sampler.results import equal_weights_matrix

__all__ = ["save_fleet_results", "fleet_summary"]


def _per_problem_results(results: NSResults, i: int) -> NSResults:
    return jax.tree.map(lambda x: x[i], results)


def save_fleet_results(
    results: NSResults,
    stacked_consts: Dict,
    basenames: Sequence[str],
    resample_S: int = 0,
    seed: int = 42,
) -> None:
    """Write `<base>.stats` + `<base>_equal_weights.txt` for each problem in
    a stacked fleet result (equal-weight resampling per problem, reference
    output semantics, cli.py:293-325)."""
    from mcalf_tpu.sampler.results import resample_equal

    n = len(basenames)
    for i in range(n):
        r = _per_problem_results(results, i)
        write_stats(basenames[i] + ".stats", float(r.logz), float(r.logzerr))
        S = resample_S if resample_S > 0 else int(r.n_dead)
        su, logl = resample_equal(jax.random.PRNGKey(seed), r, S)
        consts_i = index_consts(stacked_consts, i)
        params = np.asarray(cube_to_params_core(su, consts_i), np.float64)
        write_equal_weights(
            basenames[i] + "_equal_weights.txt",
            equal_weights_matrix(params, np.asarray(logl)),
        )


def fleet_summary(results: NSResults) -> np.ndarray:
    """(n_problems, 5) array: logZ, logZerr, H, n_like, converged."""
    return np.stack(
        [
            np.asarray(results.logz, np.float64),
            np.asarray(results.logzerr, np.float64),
            np.asarray(results.h, np.float64),
            np.asarray(results.n_like, np.float64),
            (np.asarray(results.termination_reason) == 0).astype(np.float64),
        ],
        axis=1,
    )
