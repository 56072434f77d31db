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

    # Which absorber models which feature is NOT identified by the data: a
    # single Lya transition carries no doublet information, so "HI comp at
    # the contaminant + filler on an HI line" is likelihood-degenerate with
    # the generating assignment (measured: identical max logL, and the swap
    # labeling carries MORE prior volume, hence higher evidence -- the
    # round-3 sampler finds it where the round-2 kernel missed it).  What
    # the data DOES constrain: there are exactly 3 absorbers, at observed
    # 4252.3 / 4254.7 / 4259.0 A.  Assert the posterior covers all three
    # with the union of active HI components and the filler.
    from mcalf_tpu.analysis import ncomp_occurrence

    vals, frac, mapn = ncomp_occurrence(p, m.startind)
    assert mapn == 2, dict(zip(vals.tolist(), frac.tolist()))

    fill_wobs = np.median((1.0 + p[:, m.endind + 1]) * m.linefill.wrest)
    nact = np.floor(p[:, m.startind]).astype(int)
    sel = p[nact == 2]
    comp_wobs = [
        np.median((1.0 + sel[:, m.startind + 2 + 3 * i]) * 1215.67)
        for i in range(2)  # gauge fixing z-sorts actives into slots 0..1
    ]
    absorbers = sorted(comp_wobs + [fill_wobs])
    features = [
        (1 + 2.4975) * 1215.67,  # 4252.3
        (1 + 2.4995) * 1215.67,  # 4254.7
        4259.0,                   # injected CIV contaminant
    ]
    for want, got in zip(features, absorbers):
        assert abs(got - want) < 0.5, (features, absorbers)


def test_shipped_hi_forest_config_end_to_end(tmp_path, capsys):
    """The SHIPPED testdata/hi_forest.cfg (mcalf_tpu.mocks) runs end to end
    through the CLI surface: fit + analysis + plot on the bundled HI-forest
    mock, recovering the 2-component MAP and writing the reference-format
    outputs.  (Settings are reduced from the shipped config only in
    max_samples/precision to keep CI time bounded; the shipped values are
    the benchmark's converged configuration.)"""
    import configparser
    import os

    from mcalf_tpu import cli
    from mcalf_tpu.analysis import analyze_chains

    repo_testdata = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata",
    )
    cp = configparser.ConfigParser()
    assert cp.read(os.path.join(repo_testdata, "hi_forest.cfg"))
    cp["pathing"]["datadir"] = repo_testdata + os.sep
    cp["pathing"]["outdir"] = str(tmp_path) + os.sep
    cp["ns_settings"]["nlive"] = "60"
    cp["ns_settings"]["max_samples"] = "6000"
    cp["ns_settings"]["precision_criterion"] = "0.2"
    cfg = tmp_path / "hi.cfg"
    with open(cfg, "w") as f:
        cp.write(f)
    assert cli.main([str(cfg)]) == 0
    banner = capsys.readouterr().out
    # trans-dimensional banner regression: never-active component columns
    # are all-NaN after z-sorting; the chi2-at-medians must still be finite
    assert "Chi2:    nan" not in banner and "Chi2:" in banner
    base = os.path.join(str(tmp_path), "fits", "hi_fits_1")
    lnz, lnz_err, _lhood, post = analyze_chains(base)
    assert np.isfinite(lnz) and lnz_err > 0
    # MAP active-HI-component count: the ncomp dim sits at startind=0
    # (fixed cont/specres); 2 HI comps + the filler absorbs the contaminant
    nact = np.floor(post[:, 0]).astype(int)
    vals, counts = np.unique(nact, return_counts=True)
    assert vals[np.argmax(counts)] == 2, dict(zip(vals, counts))
    assert os.path.exists(
        os.path.join(str(tmp_path), "plots", "hi_fits_1.pdf")
    )
