"""Native C++ table reader: correctness vs numpy, fallback, and speed."""

import time

import numpy as np
import pytest

from mcalf_tpu.io.spectra import load_spectrum, read_spectrum_table
from mcalf_tpu.native import native_available, read_table


def test_native_builds():
    # g++ is part of the environment; the native path must come up.
    assert native_available()


def test_matches_numpy_loadtxt(tmp_path, rng):
    data = rng.normal(size=(500, 7))
    path = str(tmp_path / "table.txt")
    np.savetxt(path, data, header="a b c d e f g")
    got = read_table(path)
    want = np.loadtxt(path, ndmin=2)
    assert got.shape == want.shape == (500, 7)
    assert np.array_equal(got, want)


def test_handles_comments_and_bare_header(tmp_path):
    path = str(tmp_path / "t.txt")
    with open(path, "w") as f:
        f.write("# a comment\nWave Flux Err\n1 2 3\n# mid comment\n4 5e-1 6\n")
    got = read_table(path)
    assert got.shape == (2, 3)
    assert np.allclose(got, [[1, 2, 3], [4, 0.5, 6]])
    table = read_spectrum_table(path)
    assert list(table) == ["Wave", "Flux", "Err"]


def test_ragged_rejected(tmp_path):
    path = str(tmp_path / "bad.txt")
    with open(path, "w") as f:
        f.write("1 2 3\n4 5\n")
    with pytest.raises(ValueError):
        read_table(path)


def test_corrupted_value_mid_file_raises(tmp_path):
    # A non-numeric token after data rows have started is a parse error
    # (np.loadtxt raises on the same file) -- NOT a silently dropped
    # "header" line.
    path = str(tmp_path / "corrupt.txt")
    with open(path, "w") as f:
        f.write("1.0 2.0\n3.0 nan_oops\n5.0 6.0\n")
    with pytest.raises(ValueError):
        read_table(path)
    with pytest.raises(ValueError):
        np.loadtxt(path, ndmin=2)  # fallback behaves the same


def test_missing_file():
    with pytest.raises(FileNotFoundError):
        read_table("/nonexistent/nope.txt")


def test_reference_mocks_roundtrip(testdata_dir):
    wave, flux, err = load_spectrum(f"{testdata_dir}/civ_mock_spec.txt")
    assert wave.shape == flux.shape == err.shape
    assert wave.size > 1900
    assert np.all(np.diff(wave) > 0)


def test_native_speed(tmp_path, rng):
    # The point of the native path: meaningfully faster than np.loadtxt on a
    # chain-sized file.
    data = rng.normal(size=(20000, 36))
    path = str(tmp_path / "chain.txt")
    np.savetxt(path, data)
    # best-of-3 each, interleaved: robust against transient machine load
    t_native, t_numpy = np.inf, np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        a = read_table(path)
        t_native = min(t_native, time.perf_counter() - t0)
        t0 = time.perf_counter()
        b = np.loadtxt(path, ndmin=2)
        t_numpy = min(t_numpy, time.perf_counter() - t0)
    assert np.array_equal(a, b)
    assert t_native < t_numpy, (t_native, t_numpy)


def test_write_table_byte_identical_to_savetxt(tmp_path, rng):
    """The native writer's output is BYTE-identical to np.savetxt's default
    "%.18e" format -- the chain-file compat contract (write_equal_weights
    routes through it), including special values."""
    from mcalf_tpu.native import write_table

    data = rng.normal(size=(500, 7)) * 10.0 ** rng.integers(
        -200, 200, size=(500, 7)
    )
    data[0, 0] = 0.0
    data[1, 1] = -0.0
    data[2, 2] = np.nan
    data[3, 3] = np.inf
    data[4, 4] = -np.inf
    data[5, 5] = 1.0
    a = str(tmp_path / "native.txt")
    b = str(tmp_path / "numpy.txt")
    write_table(a, data)
    np.savetxt(b, data)
    with open(a, "rb") as fa, open(b, "rb") as fb:
        assert fa.read() == fb.read()


def test_write_table_roundtrip_and_speed(tmp_path, rng):
    from mcalf_tpu.native import write_table

    data = rng.normal(size=(20000, 36))
    path = str(tmp_path / "chain_w.txt")
    t_native, t_numpy = np.inf, np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        write_table(path, data)
        t_native = min(t_native, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.savetxt(str(tmp_path / "chain_np.txt"), data)
        t_numpy = min(t_numpy, time.perf_counter() - t0)
    back = read_table(path)
    assert np.array_equal(back, data)  # %.18e is exact for float64
    assert t_native < t_numpy, (t_native, t_numpy)
