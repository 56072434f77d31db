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
    cfg = NSConfig(
        ndim=problems[0].ndim, nlive=40, max_samples=1500,
        precision_criterion=0.1, num_repeats=4,
    )
    res = fit_many(problems, cfg, seed=7)
    logz = np.asarray(res.logz)
    assert logz.shape == (8,)
    assert np.isfinite(logz).all()
    # Independent seeds on the same problem: evidences agree within errors.
    err = np.asarray(res.logzerr)
    spread = logz.max() - logz.min()
    assert spread < 6 * err.mean() + 1.0, (logz, err)
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
