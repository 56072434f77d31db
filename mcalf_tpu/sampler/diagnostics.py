"""Sampler-calibration diagnostics.

The reference ecosystem validates nested-sampling runs with the
insertion-index (rank-uniformity) test of Fowlie, Handley & Su (2020,
MNRAS 497:5256): each replacement live point, being an iid draw from the
prior truncated at the deletion contour, has a rank among the surviving
live points that is uniform on {0, ..., nsurv}.  Correlated or biased
constrained sampling (too few slice repeats, stuck chains) shows up as a
non-uniform rank distribution long before it is visible in logZ.

The sampler records these ranks on device (``NSResults.insertion_rank``);
this module runs the host-side tests.  The reference itself ships no such
diagnostic (its jaxns ``--debug`` writes an opaque diagnostics PNG,
/root/reference/mcalf/cli.py:288-289); this is the quantitative version.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

__all__ = ["RankDiagnostic", "insertion_rank_test"]


class RankDiagnostic(NamedTuple):
    #: Kolmogorov-Smirnov statistic of the full-run rank distribution
    ks_stat: float
    #: p-value of the full-run KS test (uniform null)
    p_value: float
    #: Bonferroni-corrected minimum p-value over per-block tests -- more
    #: sensitive to transient failures (Fowlie et al. recommend testing in
    #: blocks of ~nlive iterations)
    p_value_blocks: float
    #: number of ranks tested
    n: int
    #: number of rank values + 1 (ranks are uniform on {0..n_levels-1})
    n_levels: int
    #: ranks themselves (for histogram plots)
    ranks: np.ndarray


def _ks_uniform(x: np.ndarray) -> tuple[float, float]:
    """One-sample KS test of x ~ U(0,1).  Uses scipy when available, else
    the asymptotic Kolmogorov distribution."""
    x = np.sort(x)
    n = x.size
    if n == 0:
        return 0.0, 1.0
    ecdf_hi = np.arange(1, n + 1) / n
    ecdf_lo = np.arange(0, n) / n
    d = max(np.max(ecdf_hi - x), np.max(x - ecdf_lo))
    try:
        from scipy.stats import kstwobign

        p = float(kstwobign.sf(d * np.sqrt(n)))
    except Exception:  # pragma: no cover - scipy is a baked-in dep
        t = d * np.sqrt(n)
        k = np.arange(1, 101)
        p = float(2.0 * np.sum((-1.0) ** (k - 1) * np.exp(-2.0 * k**2 * t**2)))
    return float(d), min(max(p, 0.0), 1.0)


def insertion_rank_test(
    results, config=None, *, nsurv: int | None = None, seed: int = 0,
    block: int | None = None,
) -> RankDiagnostic:
    """Test the recorded insertion ranks for uniformity.

    Parameters
    ----------
    results : NSResults (or anything with an ``insertion_rank`` array)
    config : the NSConfig of the run; used to derive
        ``nsurv = nlive - num_delete`` (ranks live on {0..nsurv}).
        Pass ``nsurv`` directly to override.
    seed : for the randomized continuity correction (discrete ranks are
        smeared with U[0,1) before the KS test, the standard treatment).
    block : block length for the per-block scan (default: one deletion
        "generation", nsurv + 1 ranks).

    Returns a :class:`RankDiagnostic`; a healthy run has
    ``p_value`` and ``p_value_blocks`` not tiny (e.g. > 0.01).
    """
    ranks = np.asarray(results.insertion_rank, np.int64).ravel()
    ranks = ranks[ranks >= 0]
    if nsurv is None:
        if config is None:
            raise ValueError("pass config or nsurv")
        cfg = config.resolved() if hasattr(config, "resolved") else config
        nsurv = cfg.nlive - cfg.num_delete
    n_levels = int(nsurv) + 1
    rng = np.random.default_rng(seed)
    x = (ranks + rng.random(ranks.size)) / n_levels

    d, p = _ks_uniform(x)

    if block is None:
        block = n_levels
    block = max(int(block), 8)
    # Cover EVERY rank including the trailing partial block: late-run ranks
    # are exactly where under-mixing shows up (the constrained region is
    # tightest near termination), so dropping the tail would blind the scan
    # there.  A short tail (< block/2) is folded into the final full block
    # rather than tested alone (tiny blocks have no KS power).
    nblocks = max(-(-x.size // block), 1)
    if nblocks > 1 and x.size - (nblocks - 1) * block < block // 2:
        nblocks -= 1
    pmin = 1.0
    for i in range(nblocks):
        end = x.size if i == nblocks - 1 else (i + 1) * block
        _, pb = _ks_uniform(x[i * block : end])
        pmin = min(pmin, pb)
    p_blocks = min(pmin * nblocks, 1.0)

    return RankDiagnostic(
        ks_stat=d,
        p_value=p,
        p_value_blocks=p_blocks,
        n=int(x.size),
        n_levels=n_levels,
        ranks=ranks,
    )
