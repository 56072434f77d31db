"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Substitutes for a real pod (SURVEY.md section 4): independent fits sharded
over the mesh axis must give the same answers as single-device fits.
"""

import jax
import numpy as np
import pytest

from mcalf_tpu.models import AbsorptionModel
from mcalf_tpu.models.batched import pad_model_to_npix, stack_problems
from mcalf_tpu.parallel import fit_many, make_mesh
from mcalf_tpu.sampler import NSConfig


@pytest.fixture(scope="module")
def problems(testdata_dir):
    base = AbsorptionModel.from_file(
        f"{testdata_dir}/civ_mock_spec.txt",
        fitrange=[(6180.0, 6220.0)],
        fitlines=["CIV 1548", "CIV 1550"],
        ncomp=(1, 1),
        specres=[8.0],
        Nrange=[12.0, 14.5],
        brange=[10.0, 40.0],
        zrange=[2.99, 3.01],
    )
    return [base] * 8  # same problem on every shard -> answers must agree


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_fit_many_sharded(problems):
    # Calibrated default num_repeats (12*ndim; see tests/test_truth_anchor).
    cfg = NSConfig(
        ndim=problems[0].ndim, nlive=60, max_samples=4000,
        precision_criterion=1e-2,
    )
    res = fit_many(problems, cfg, seed=7)
    logz = np.asarray(res.logz)
    logzerr = np.asarray(res.logzerr)
    assert logz.shape == (8,)
    assert np.isfinite(logz).all()
    # Independent seeds on the same problem must agree: with the
    # ground-truth-calibrated kernel the 8-shard spread is a few per-run
    # sigma (logzerr ~ 0.6 at nlive=60).  The old pre-calibration kernel
    # showed ~2-4x larger decorrelation scatter; this bound catches such a
    # regression.
    spread = logz.max() - logz.min()
    assert spread < 6.0 * logzerr.mean(), (logz, logzerr)
    # ...and the ensemble mean must sit on the brute-force quadrature truth
    # for this file (tools/truth_anchor.py; tests/test_truth_anchor.py).
    assert abs(logz.mean() - 4983.62) < 1.2, (logz.mean(), logz)
    # Different shards got different RNG streams.
    assert len(np.unique(logz)) > 1


def test_stack_problem_validation(problems, testdata_dir):
    other = AbsorptionModel.from_file(
        f"{testdata_dir}/civ_mock_spec.txt",
        fitrange=[(6180.0, 6220.0)],
        fitlines=["CIV 1548", "CIV 1550"],
        ncomp=(1, 2),  # different ncompmax -> different structure
        specres=[8.0],
    )
    with pytest.raises(ValueError):
        stack_problems([problems[0], other])


def test_pad_model_to_npix(problems):
    m = problems[0]
    padded = pad_model_to_npix(m, m.npix + 50)
    assert padded.npix == m.npix + 50
    assert not padded.valid[-50:].any()  # padding carries no weight
    p = np.array([1.0, 13.8, 3.0, 15.0])
    # Likelihood is unchanged by zero-weight padding.
    assert abs(padded.lnlhood(p) - m.lnlhood(p)) < 1e-6


def test_problem_count_must_divide_mesh(problems):
    cfg = NSConfig(ndim=problems[0].ndim, nlive=50, max_samples=500)
    with pytest.raises(ValueError):
        fit_many(problems[:3], cfg)


def test_fleet_results_io(problems, tmp_path):
    from mcalf_tpu.models.batched import stack_problems
    from mcalf_tpu.parallel import fit_stacked, fleet_summary, save_fleet_results
    from mcalf_tpu.analysis import analyze_chains

    spec, stacked = stack_problems(problems[:8])
    cfg = NSConfig(ndim=problems[0].ndim, nlive=60, max_samples=2500,
                   precision_criterion=0.1, num_repeats=16)
    res = fit_stacked(spec, stacked, cfg, seed=7)
    bases = [str(tmp_path / f"sl{i}") for i in range(8)]
    save_fleet_results(res, stacked, bases)
    summary = fleet_summary(res)
    assert summary.shape == (8, 5)
    for i, b in enumerate(bases):
        lnz, err, lhood, post = analyze_chains(b)
        assert abs(lnz - summary[i, 0]) < 1e-6
        # truth N=13.8 recovered in each shard's chains
        assert abs(np.nanmedian(post[:, 1]) - 13.8) < 0.1


def test_fit_stacked_chunked_matches_single_shot(problems):
    """The chunked fleet path must be bit-identical to the single-shot
    fleet path (same per-shard RNG streams)."""
    from mcalf_tpu.models.batched import stack_problems
    from mcalf_tpu.parallel import fit_stacked

    spec, stacked = stack_problems(problems[:8])
    cfg = NSConfig(ndim=problems[0].ndim, nlive=40, max_samples=1000,
                   precision_criterion=0.2, num_repeats=8)
    one = fit_stacked(spec, stacked, cfg, seed=5)
    chk = fit_stacked(spec, stacked, cfg, seed=5, chunk_steps=3)
    assert np.array_equal(np.asarray(one.logz), np.asarray(chk.logz))
    assert np.array_equal(np.asarray(one.n_like), np.asarray(chk.n_like))


def test_fit_stacked_sharded_checkpoint_resume(problems, tmp_path):
    """A fleet killed mid-run must resume from its on-disk SHARDED
    checkpoint bit-identically -- the pod kill-and-resume contract (the
    reference's only analogue is PolyChord's MPI resume, cli.py:97-98).
    The checkpoint is the stacked NSState pytree ``on_chunk`` receives,
    round-tripped through utils.checkpoint's .npz format."""
    from mcalf_tpu.models.batched import stack_problems
    from mcalf_tpu.parallel import fit_stacked
    from mcalf_tpu.utils.checkpoint import load_state, save_state

    spec, stacked = stack_problems(problems[:8])
    cfg = NSConfig(ndim=problems[0].ndim, nlive=40, max_samples=1000,
                   precision_criterion=0.2, num_repeats=8)
    path = str(tmp_path / "fleet_state.npz")
    chunks_seen = []

    def on_chunk(states):
        chunks_seen.append(int(np.asarray(states.step).max()))
        if len(chunks_seen) == 1:
            # "kill" point: persist the first-chunk sharded state only
            save_state(path, states)

    straight = fit_stacked(
        spec, stacked, cfg, seed=5, chunk_steps=3, on_chunk=on_chunk
    )
    assert len(chunks_seen) >= 2, (
        "fit converged within one chunk; shrink chunk_steps so the resume "
        "path is actually exercised"
    )
    resumed = fit_stacked(
        spec, stacked, cfg, seed=5, chunk_steps=3, states=load_state(path)
    )
    assert np.array_equal(np.asarray(straight.logz), np.asarray(resumed.logz))
    assert np.array_equal(
        np.asarray(straight.n_like), np.asarray(resumed.n_like)
    )
    # per-shard posterior weights identical too, not just scalars
    assert np.array_equal(
        np.asarray(straight.logw, np.float64),
        np.asarray(resumed.logw, np.float64),
    )
