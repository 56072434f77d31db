"""Calibration of the insertion-rank diagnostic under batch deletion.

With num_delete = nsurv (the production geometry) all ranks of one step
share one survivor set, inflating KS fluctuations by kappa ~ 2 (module
docstring of sampler/diagnostics.py).  These tests simulate EXACT null
runs -- iid uniform survivors and replacements, which is what a perfect
constrained sampler produces after the probability integral transform --
and check that the corrected test neither false-alarms on them nor loses
the power to catch real defects.
"""

import numpy as np
import pytest

from mcalf_tpu.sampler.diagnostics import insertion_rank_test

B, NSURV, NSTEPS = 100, 100, 230
NLEV = NSURV + 1


class FakeResults:
    def __init__(self, ranks):
        self.insertion_rank = np.asarray(ranks, np.int32)


def _null_run(rng, draw_new=None):
    """Ranks from a perfect sampler: per step, nsurv iid U(0,1) survivors
    and B iid new points (draw_new overrides the new-point law)."""
    ranks = np.empty(NSTEPS * B, np.int64)
    for s in range(NSTEPS):
        surv = np.sort(rng.uniform(size=NSURV))
        new = rng.uniform(size=B) if draw_new is None else draw_new(rng, B)
        ranks[s * B : (s + 1) * B] = np.searchsorted(surv, new)
    return ranks


def _diag(ranks, seed=0):
    return insertion_rank_test(
        FakeResults(ranks), nsurv=NSURV, num_delete=B, seed=seed
    )


def test_null_calibration():
    """A perfect sampler must pass: over 30 simulated runs the corrected
    p-values stay healthy (the UNCORRECTED test fails p<0.01 on ~16% of
    full runs and ~77% of block scans at this geometry)."""
    rng = np.random.default_rng(7)
    ps, pbs = [], []
    for t in range(30):
        d = _diag(_null_run(rng), seed=t)
        assert d.kappa == pytest.approx(1.0 + B / NLEV)
        ps.append(d.p_value)
        pbs.append(d.p_value_blocks)
    ps, pbs = np.array(ps), np.array(pbs)
    assert (ps < 0.01).sum() <= 1, ps
    assert (pbs < 0.01).sum() <= 1, pbs
    # p-values should be spread over (0,1), not piled at the bottom
    assert 0.15 < np.median(ps) < 0.9, ps


def test_power_global_skew():
    """Chains hugging the deletion contour (the round-1/2 defect) skew
    ranks low; the corrected test must still scream."""
    rng = np.random.default_rng(1)
    low = _null_run(rng, draw_new=lambda r, n: r.beta(1.0, 1.15, size=n))
    d = _diag(low)
    assert d.p_value < 1e-6, d.p_value


def test_power_transient_failure():
    """A handful of broken steps (all replacements clumped in a narrow
    band) must trip the block scan even when the full-run test passes."""
    rng = np.random.default_rng(2)
    ranks = _null_run(rng)
    bad = rng.choice(NSTEPS, size=6, replace=False)
    for s in bad:
        # stuck chains: replacements pile into one decile of the survivors
        lo = rng.uniform(0, 0.9)
        ranks[s * B : (s + 1) * B] = np.searchsorted(
            np.sort(rng.uniform(size=NSURV)), rng.uniform(lo, lo + 0.1, B)
        )
    d = _diag(ranks)
    assert d.p_value_blocks < 1e-4, d.p_value_blocks


def test_classic_single_deletion_unchanged():
    """For num_delete=1 the correction is negligible (kappa ~ 1.005) and
    the test reduces to the standard Fowlie et al. treatment."""
    rng = np.random.default_rng(3)
    n = 20000
    nsurv = 199
    ranks = (
        rng.uniform(size=(n, nsurv)) < rng.uniform(size=(n, 1))
    ).sum(axis=1)
    # survivor sets here are fresh per rank -> truly iid; classic test
    d = insertion_rank_test(FakeResults(ranks), nsurv=nsurv, num_delete=1)
    assert d.kappa < 1.01
    assert d.p_value > 0.01
