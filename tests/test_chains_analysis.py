"""Chain-file format round-trips and analyzer behavior."""

import numpy as np

from mcalf_tpu.analysis import analyze_chains, get_parnames, ncomp_occurrence, sort_components
from mcalf_tpu.io.chains import (
    read_equal_weights,
    read_stats,
    write_equal_weights,
    write_stats,
)
from mcalf_tpu.sampler.results import equal_weights_matrix


def test_stats_roundtrip(tmp_path):
    path = str(tmp_path / "run.stats")
    write_stats(path, -123.456, 0.789)
    lnz, err = read_stats(path)
    assert lnz == -123.456 and err == 0.789
    # Exact reference line format (cli.py:295).
    line = open(path).read()
    assert line == "log(Z)   : -123.456   +/-   0.789\n"


def test_equal_weights_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    params = rng.uniform(size=(50, 4))
    logl = rng.uniform(-10, 0, size=50)
    mat = equal_weights_matrix(params, logl)
    path = str(tmp_path / "run_equal_weights.txt")
    write_equal_weights(path, mat)
    back = read_equal_weights(path)
    assert back.shape == (50, 6)
    assert np.allclose(back[:, 0], 1.0)
    assert np.allclose(-0.5 * back[:, 1], logl)
    assert np.allclose(back[:, 2:], params)


def test_sort_components_z_ordering():
    # Layout [ncomp, (N,z,b) x 3]: sample with ncomp=2, unsorted z.
    row = [2.4, 13.0, 3.002, 10.0, 14.0, 3.001, 20.0, 12.0, 3.005, 30.0]
    out = sort_components(np.array([row]))
    # startind inferred as (10-1)%3 = 0; active = 2 comps, z-sorted.
    assert out[0, 0] == 2.4
    assert np.allclose(out[0, 1:4], [14.0, 3.001, 20.0])
    assert np.allclose(out[0, 4:7], [13.0, 3.002, 10.0])
    assert np.all(np.isnan(out[0, 7:]))


def test_analyze_chains_end_to_end(tmp_path):
    base = str(tmp_path / "fitrun")
    write_stats(base + ".stats", -5.5, 0.1)
    rows = np.array(
        [
            [1.0, 4.0, 1.7, 13.0, 3.002, 10.0],  # -2lnL=4 -> lnL=-2
            [1.0, 6.0, 1.2, 14.0, 3.001, 20.0],
        ]
    )
    write_equal_weights(base + "_equal_weights.txt", rows)
    lnz, err, lhood, post = analyze_chains(base)
    assert (lnz, err) == (-5.5, 0.1)
    assert np.allclose(lhood, [-2.0, -3.0])
    assert post.shape == (2, 4)
    vals, frac, mapn = ncomp_occurrence(post, startind=0)
    assert list(vals) == [1] and frac[0] == 1.0 and mapn == 1


def test_get_parnames():
    assert get_parnames(2) == ["N1", "z1", "b1", "N2", "z2", "b2"]
    assert get_parnames(1, cont=True) == ["Cont", "N1", "z1", "b1"]


def test_sort_components_preserves_fillers():
    """nfill > 0: the trailing filler triplets are always-active parameters
    and must survive the z-sort/NaN-masking (the reference blanks them --
    hires_fitter.py:737 -- which erases filler absorption from its own
    overlay plots; documented deviation in sort_components)."""
    from mcalf_tpu.analysis import sort_components

    # layout: [ncomp][3 comp triplets][1 filler triplet], startind = 0
    row = np.array(
        [2.0,
         13.0, 3.002, 20.0,   # comp A (active)
         13.5, 3.001, 10.0,   # comp B (active, lower z -> sorts first)
         12.0, 3.003, 30.0,   # comp C (inactive)
         14.0, 16.0, 25.0]    # filler (always active)
    )
    out = sort_components(row[None, :], nfill=1)[0]
    assert out[0] == 2.0
    # z-sorted actives
    assert np.allclose(out[1:4], [13.5, 3.001, 10.0])
    assert np.allclose(out[4:7], [13.0, 3.002, 20.0])
    # inactive comp NaN
    assert np.all(np.isnan(out[7:10]))
    # filler preserved verbatim
    assert np.allclose(out[10:13], [14.0, 16.0, 25.0])
    # reference-compat default (nfill=0): filler treated as a component
    # slot and blanked for ncomp=2
    ref = sort_components(row[None, :])[0]
    assert np.all(np.isnan(ref[7:13]))
