"""Multi-window fits: several ``wavefit`` ranges in one fit + multi-panel
plots (reference cli.py:404-412; its shipped SiII example config uses six
windows).  The CIV doublet at z=3 is split across two windows -- 1548 at
6192.8 A in the first, 1550 at 6203.1 A in the second -- so the likelihood
must combine disjoint pixel sets and the plot must panel per window."""

import os

import numpy as np
import pytest

from mcalf_tpu.analysis import analyze_chains
from mcalf_tpu.cli import main
from mcalf_tpu.io.chains import read_stats
from mcalf_tpu.models import AbsorptionModel


def test_forward_model_masks_two_windows(testdata_dir):
    m = AbsorptionModel.from_file(
        f"{testdata_dir}/civ_mock_spec.txt",
        fitrange=[(6188.0, 6197.0), (6199.0, 6208.0)],
        fitlines=["CIV 1548", "CIV 1550"],
        ncomp=(1, 1),
        specres=[8.0],
        zrange=[2.99, 3.01],
    )
    assert m.numfitranges == 2
    # The FITTED pixel set (obj_wl; m.wave keeps the raw input) excludes
    # the gap between the windows and covers both.
    assert np.all(
        ((m.obj_wl >= 6188.0) & (m.obj_wl <= 6197.0))
        | ((m.obj_wl >= 6199.0) & (m.obj_wl <= 6208.0))
    )
    assert (m.obj_wl < 6197.5).any() and (m.obj_wl > 6198.5).any()
    assert m.npix == m.obj_wl.size < m.wave.size
    # The forward model at the generative truth matches the (noisy) data to
    # the noise level in BOTH windows: the doublet physics spans the gap.
    p = np.array([1.0, 13.8, 3.0, 15.0])
    spec = m.reconstruct_spec(p)
    resid = (m.obj - spec) / m.obj_noise
    for lo, hi in ((6188.0, 6197.0), (6199.0, 6208.0)):
        sel = (m.obj_wl >= lo) & (m.obj_wl <= hi)
        assert np.abs(resid[sel]).mean() < 1.5, (lo, hi)


@pytest.fixture(scope="module")
def multiwindow_outputs(tmp_path_factory, testdata_dir):
    out = tmp_path_factory.mktemp("mw")
    cfg = out / "fit.cfg"
    cfg.write_text(
        f"""
[input]
specfile = civ_mock_spec.txt
wavefit = 6188,6197,6199,6208
linelist = CIV 1548, CIV 1550
coldef = Wave, Flux, Err
solver = polychord
specres = 8.0

[pathing]
datadir = {testdata_dir}/
outdir = {out}/
chainfmt = mw_{{0}}

[components]
ncomp = 1,1
contval = 1
Nrange = 12.0,14.5
brange = 10.0, 40.0
zrange = 2.99, 3.01

[run]
dofit = True
doplot = True

[pc_settings]
nlive = 60
precision_criterion = 0.01
read_resume = False
write_resume = False
write_dead = False

[ns_settings]
max_samples = 2500

[plots]
nmaxcols = 5
"""
    )
    rc = main([str(cfg)])
    assert rc == 0
    return out


def test_multiwindow_fit_recovers_truth(multiwindow_outputs):
    out = multiwindow_outputs
    lnz, err = read_stats(str(out / "fits" / "mw_0.stats"))
    assert np.isfinite(lnz) and 0 < err < 1.5
    _, _, _, post = analyze_chains(str(out / "fits" / "mw_0"))
    # Layout: [ncomp, N, z, b]; truth N=13.8, z=3.0, b=15.  Both windows
    # constrain z jointly through the doublet ratio.
    assert abs(np.nanmedian(post[:, 1]) - 13.8) < 0.08
    assert abs(np.nanmedian(post[:, 2]) - 3.0) < 1.5e-4
    assert abs(np.nanmedian(post[:, 3]) - 15.0) < 2.0


def test_multiwindow_plot_panels(multiwindow_outputs, testdata_dir):
    # One panel per wavefit range in a single row at nmaxcols=5...
    out = multiwindow_outputs
    pdf = out / "plots" / "mw_0.pdf"
    assert os.path.exists(pdf)
    # ... and the multi-ROW branch (numfitranges > nmaxcols) renders too:
    # re-plot the same chains with nmaxcols=1 (plot-only invocation).
    cfg2 = out / "plot_only.cfg"
    cfg2.write_text(
        (out / "fit.cfg")
        .read_text()
        .replace("dofit = True", "dofit = False")
        .replace("nmaxcols = 5", "nmaxcols = 1")
    )
    os.remove(pdf)
    rc = main([str(cfg2)])
    assert rc == 0
    assert os.path.exists(pdf)
