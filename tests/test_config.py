"""Config-system tests: reference fit.cfg compatibility + defaults."""

import numpy as np
import pytest

from mcalf_tpu.config import readconfig
from mcalf_tpu.runner import solver_nsconfig


def test_reads_reference_fit_cfg(testdata_dir):
    # The reference's shipped config must parse unchanged.
    cfg = readconfig(f"{testdata_dir}/fit.cfg")
    assert cfg["specfile"] == "./testdata/civ_mock_spec_multicomp.txt"
    assert cfg["wavefit"] == [(6180.0, 6220.0)]
    assert cfg["linelist"] == ["CIV 1548", "CIV 1550"]
    assert cfg["coldef"] == ["Wave", "Flux", "Err"]
    assert cfg["solver"] == "jaxns"
    assert np.allclose(cfg["specres"], [8.0])
    assert cfg["asymmlike"] is False
    assert list(cfg["ncomp"]) == [8, 11]
    assert np.allclose(cfg["Nrange"], [12.0, 14.5])
    assert np.allclose(cfg["brange"], [10.0, 40.0])
    assert np.allclose(cfg["zrange"], [2.99, 3.01])
    assert cfg["chaindir"] == "testdata/output/fits/"
    assert cfg["plotdir"] == "testdata/output/plots/"
    assert cfg["chainfmt"] == "pc_fits_{0}"
    assert cfg["jaxns_settings"]["max_samples"] == "2000"
    assert cfg["jaxns_settings"]["difficult_model"] is True
    assert cfg["pc_settings"]["nlive"] == "150"
    assert cfg["nmaxcols"] == 3
    assert cfg["dofit"] is True and cfg["doplot"] is True


def test_defaults(tmp_path):
    p = tmp_path / "min.cfg"
    p.write_text(
        "[input]\nspecfile = s.txt\nwavefit = 1, 2\nlinelist = CIV 1548\n"
    )
    cfg = readconfig(str(p))
    assert cfg["solver"] == "polychord"
    assert np.allclose(cfg["specres"], [7.0])
    assert list(cfg["ncomp"]) == [1, 1]
    assert cfg["nfill"] == 0
    assert np.allclose(cfg["Nrange"], (11.5, 16))
    assert np.allclose(cfg["brange"], (1, 30))
    assert cfg["zrange"] is None
    assert cfg["chaindir"] == "./fits/"
    assert cfg["chainfmt"].format(0) == "pc_fits_0"  # valid format string
    assert cfg["nmaxcols"] == 5
    assert np.allclose(cfg["yrange"], (-0.1, 1.2))
    assert cfg["seed"] == 43


def test_mandatory_keys(tmp_path):
    p = tmp_path / "bad.cfg"
    p.write_text("[input]\nwavefit = 1,2\nlinelist = CIV 1548\n")
    with pytest.raises(Exception):
        readconfig(str(p))
    p.write_text("[input]\nspecfile = s\nwavefit = 1,2,3\nlinelist = CIV 1548\n")
    with pytest.raises(ValueError):
        readconfig(str(p))


def test_solver_mapping(testdata_dir):
    cfg = readconfig(f"{testdata_dir}/fit.cfg")
    ns, S, _ = solver_nsconfig(cfg, ndim=34)
    # jaxns settings from fit.cfg: max_samples=2000, nlive=200, difficult.
    assert ns.nlive == 200
    assert ns.max_samples == 2000
    assert ns.difficult_model is True
    assert S == 2000
    # polychord mapping picks up pc_settings.
    cfg2 = dict(cfg, solver="polychord")
    ns2, S2, _ = solver_nsconfig(cfg2, ndim=34)
    assert ns2.nlive == 150
    assert ns2.num_repeats == 25
    assert ns2.precision_criterion == 0.01
    assert S2 == 0
    with pytest.raises(ValueError):
        solver_nsconfig(dict(cfg, solver="emcee"), ndim=4)


def test_specfile_list_and_glob(tmp_path):
    for name in ("s1.txt", "s2.txt", "other.dat"):
        (tmp_path / name).write_text("1 1 1\n")
    cfg = tmp_path / "c.cfg"
    cfg.write_text(
        f"""
[input]
specfile = s*.txt, other.dat
wavefit = 6180,6220
linelist = CIV 1548

[pathing]
datadir = {tmp_path}/
"""
    )
    pars = readconfig(str(cfg))
    names = [p.rsplit("/", 1)[-1] for p in pars["specfiles"]]
    assert names == ["s1.txt", "s2.txt", "other.dat"]
    assert pars["specfile"].endswith("s1.txt")  # back-compat: first entry


def test_specfile_single_unchanged(tmp_path):
    (tmp_path / "one.txt").write_text("1 1 1\n")
    cfg = tmp_path / "c.cfg"
    cfg.write_text(
        f"""
[input]
specfile = one.txt
wavefit = 6180,6220
linelist = CIV 1548

[pathing]
datadir = {tmp_path}/
"""
    )
    pars = readconfig(str(cfg))
    assert pars["specfiles"] == [pars["specfile"]]
    assert pars["specfile"].endswith("one.txt")
