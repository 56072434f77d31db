"""HI Lyman-alpha forest fit with filler nuisance lines (BASELINE.md
config #4): generate an HI mock with a contaminating unidentified line, fit
HI components + one filler, check the filler absorbs the contaminant."""

import jax
import numpy as np
import pytest

from mcalf_tpu.atomic import get_lines
from mcalf_tpu.models import AbsorptionModel, make_jax_forward
from mcalf_tpu.models.forward import CLIGHT_KMS
from mcalf_tpu.sampler import NSConfig, nested_sample, resample_equal


@pytest.fixture(scope="module")
def hi_mock():
    # Log-uniform grid around Lya at z~2.5: 4251-4262 A.
    velstep = 2.0
    step = 1.0 + velstep / CLIGHT_KMS
    n = 400
    wave = 4251.0 * step ** np.arange(n)
    lines = get_lines(["HI 1215"])
    gen = AbsorptionModel(
        wave=wave, flux=np.ones(n), noise=np.full(n, 0.02),
        lines=lines, ncomp=(2, 2), specres=[8.0],
    )
    # Two HI components.
    truth = [(13.6, 2.4975, 25.0), (13.2, 2.4995, 18.0)]
    p = np.array([2.0] + [v for t in truth for v in t])
    flux = gen.reconstruct_spec(p)
    # A contaminating metal line from some other redshift: inject CIV 1548
    # absorption at observed 4259 A.
    civ = AbsorptionModel(
        wave=wave, flux=np.ones(n), noise=np.full(n, 0.02),
        lines=get_lines(["CIV 1548"]), ncomp=(1, 1), specres=[8.0],
    )
    zciv = 4259.0 / 1548.204 - 1.0
    flux = flux * civ.reconstruct_spec(np.array([1.0, 13.4, zciv, 12.0]))
    rng = np.random.RandomState(7)
    noisy = flux + rng.normal(0, 0.02, n)
    return wave, noisy, truth


def test_hi_fit_with_filler_absorbs_contaminant(hi_mock):
    wave, flux, truth = hi_mock
    m = AbsorptionModel(
        wave=wave, flux=flux, noise=np.full(wave.size, 0.02),
        lines=get_lines(["HI 1215"]),
        ncomp=(1, 3), nfill=1,
        specres=[8.0],
        Nrange=[12.5, 14.5], brange=[10.0, 40.0],
        zrange=[(4251.0 / 1215.67 - 1), (4262.0 / 1215.67 - 1)],
        Nrangefill=[12.5, 15.0], brangefill=[5.0, 30.0],
    )
    assert m.ndim == 1 + 3 * 3 + 3
    fwd = make_jax_forward(m)
    cfg = NSConfig(ndim=m.ndim, nlive=100, max_samples=8000,
                   precision_criterion=0.05)
    res = nested_sample(fwd.loglike_cube, jax.random.PRNGKey(11), cfg)
    assert int(res.termination_reason) == 0
    su, _ = resample_equal(jax.random.PRNGKey(42), res, 2000)
    p = np.asarray(fwd.cube_to_params(su), np.float64)

    # The filler (wrest=250 clone of HI) should sit at the contaminant's
    # observed wavelength 4259 A.
    fill_wobs = (1.0 + p[:, m.endind + 1]) * m.linefill.wrest
    assert abs(np.median(fill_wobs) - 4259.0) < 0.3, np.median(fill_wobs)

    # The HI component count should favor 2 (the truth), and recovered HI
    # redshifts should bracket the true ones.
    from mcalf_tpu.analysis import ncomp_occurrence, sort_components

    vals, frac, mapn = ncomp_occurrence(p, m.startind)
    assert mapn == 2, dict(zip(vals.tolist(), frac.tolist()))
    srt = sort_components(p[np.floor(p[:, m.startind]) == 2], startind=None)
    # sort_components infers startind=(ncols-1)%3 which works for this
    # layout (13 cols -> 0).
    z_meds = np.nanmedian(srt[:, 2::3], axis=0)[:2]
    assert abs(z_meds[0] - 2.4975) < 5e-4
    assert abs(z_meds[1] - 2.4995) < 5e-4
