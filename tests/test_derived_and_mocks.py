"""Derived quantities (equivalent width, total column density) and the
standalone mock generator."""

import numpy as np
import pytest

from mcalf_tpu import mocks
from mcalf_tpu.models import AbsorptionModel


@pytest.fixture(scope="module")
def model(testdata_dir):
    return AbsorptionModel.from_file(
        f"{testdata_dir}/civ_mock_spec.txt",
        fitrange=[(6180.0, 6220.0)],
        fitlines=["CIV 1548", "CIV 1550"],
        ncomp=(1, 2),
        specres=[8.0],
    )


def test_calc_N_sums_active_columns(model):
    # Two active components with logN 13.0 and 13.5.
    p = np.array([2.0, 13.0, 3.0, 15.0, 13.5, 3.001, 15.0])
    want = np.log10(10**13.0 + 10**13.5)
    assert abs(model.calc_N(p) - want) < 1e-12
    # One active component: only the first counts.
    p1 = np.array([1.0, 13.0, 3.0, 15.0, 13.5, 3.001, 15.0])
    assert abs(model.calc_N(p1) - 13.0) < 1e-12


def test_calc_w_positive_and_scales_with_N(model):
    p_weak = np.array([1.0, 13.0, 3.0, 15.0, 12.0, 3.001, 15.0])
    p_strong = np.array([1.0, 14.2, 3.0, 15.0, 12.0, 3.001, 15.0])
    w_weak = model.calc_w(p_weak)
    w_strong = model.calc_w(p_strong)
    assert 0 < w_weak < w_strong
    # CIV 1548 at logN=13.8 has W_r ~ 0.2-0.5 A; sanity band.
    w = model.calc_w(np.array([1.0, 13.8, 3.0, 15.0, 12.0, 3.001, 15.0]))
    assert 0.05 < w < 1.0


def test_mock_generator_reproduces_reference_fixtures(testdata_dir):
    """Our generator on the reference's own wavelength grid reproduces the
    reference's shipped mock files to machine precision -- generator and
    physics are verified in one shot."""
    from mcalf_tpu.io.spectra import load_spectrum

    wave_ref, flux_ref, err_ref = load_spectrum(f"{testdata_dir}/civ_mock_spec.txt")
    _, _, noisy = mocks.generate_single(wave=wave_ref)
    assert np.max(np.abs(noisy - flux_ref)) < 1e-10

    wave_m, flux_m, err_m = load_spectrum(
        f"{testdata_dir}/civ_mock_spec_multicomp.txt"
    )
    _, _, noisym = mocks.generate_multicomp(wave=wave_ref)
    assert np.max(np.abs(noisym - flux_m)) < 1e-10


def test_mock_generator_writes_files(tmp_path):
    mocks.main(str(tmp_path))
    assert (tmp_path / "civ_mock_spec.txt").exists()
    assert (tmp_path / "civ_mock_spec_multicomp.txt").exists()
    cfg = (tmp_path / "fit.cfg").read_text()
    assert "ncomp = 8,11" in cfg
    from mcalf_tpu.config import readconfig

    parsed = readconfig(str(tmp_path / "fit.cfg"))
    assert parsed["solver"] == "jaxns"
