"""Pallas Voigt kernel: accuracy vs an f64-u reference, padding behavior."""

import numpy as np
import jax.numpy as jnp
import pytest

from mcalf_tpu.models import AbsorptionModel
from mcalf_tpu.models.forward import CCGS, TAU_CONST
from mcalf_tpu.models.jax_model import build_consts
from mcalf_tpu.ops.faddeeva import hjert
from mcalf_tpu.ops.voigt_pallas import precompute_dsplit, voigt_tau_pallas


@pytest.fixture(scope="module")
def problem(testdata_dir):
    m = AbsorptionModel.from_file(
        f"{testdata_dir}/civ_mock_spec.txt",
        fitrange=[(6180.0, 6220.0)],
        fitlines=["CIV 1548", "CIV 1550"],
        ncomp=(2, 3),
        nfill=1,
        specres=[8.0],
        zrange=[2.99, 3.01],
    )
    c = build_consts(m)
    tab = m.transition_table()
    nujk64 = CCGS / (tab["wrest"] / 1e8)
    cw64 = CCGS / (m.obj_wl / 1e8)
    dsplit = precompute_dsplit(nujk64, cw64)

    rng = np.random.default_rng(0)
    B = 13  # deliberately not a multiple of the 8-row tile
    lo, hi = m.bounds_lo, m.bounds_hi
    p = (lo + rng.uniform(0.1, 0.9, size=(B, m.ndim)) * (hi - lo)).astype(np.float32)
    N = p[:, c["pidx"]]
    z = p[:, c["pidx"] + 1]
    b = p[:, c["pidx"] + 2]
    dnu = (b * 1e5 * c["inv_wrest_cm"]).astype(np.float32)
    av = (c["gamma"] / (4 * np.pi * dnu)).astype(np.float32)
    nact = np.floor(p[:, m.startind])
    active = (c["comp_id"][None, :] < nact[:, None]) | c["is_fill"][None, :]
    gain = (TAU_CONST * 10.0**N * c["f"] / dnu * active).astype(np.float32)
    return z, gain, av, dnu, dsplit, nujk64, cw64


def _tau_f64_u(z, gain, av, dnu, nujk64, cw64):
    """Reference: u in float64 (the quantity the double-float kernel path
    reconstructs), H and the sum in float32."""
    u64 = (
        (1.0 + z.astype(np.float64))[:, :, None] * cw64[None, None, :]
        - nujk64[None, :, None]
    ) / dnu.astype(np.float64)[:, :, None]
    H = hjert(jnp.asarray(u64, jnp.float32), jnp.asarray(av)[..., None])
    return jnp.sum(jnp.asarray(gain)[..., None] * H, axis=-2)


def test_pallas_matches_f64_u_reference(problem):
    z, gain, av, dnu, dsplit, nujk64, cw64 = problem
    got = np.asarray(voigt_tau_pallas(z, gain, av, dnu, dsplit, interpret=True))
    want = np.asarray(_tau_f64_u(z, gain, av, dnu, nujk64, cw64))
    assert got.shape == want.shape
    # Double-float u reconstruction: agreement at f32 roundoff relative to
    # the local tau scale.
    err = np.abs(got - want) / (np.abs(want) + 1e-3)
    assert np.max(err) < 3e-5, np.max(err)


def test_pallas_padding_rows_do_not_leak(problem):
    z, gain, av, dnu, dsplit, *_ = problem

    full = np.asarray(voigt_tau_pallas(z, gain, av, dnu, dsplit, interpret=True))

    def grow(x):
        return np.concatenate([x, x[-1:]], axis=0)

    grown = np.asarray(
        voigt_tau_pallas(grow(z), grow(gain), grow(av), grow(dnu), dsplit,
                         interpret=True)
    )
    assert np.array_equal(grown[:-1], full)


def test_dsplit_reconstructs_f64(problem):
    *_, dsplit, nujk64, cw64 = (None, None, None, None) + problem[4:]
    D_hi, D_lo, cw_hi, cw_lo, cw_res = dsplit
    D = cw64[None, :] - nujk64[:, None]
    recon = D_hi.astype(np.float64) + D_lo.astype(np.float64)
    assert np.max(np.abs(recon - D) / np.abs(D)) < 2e-14
    assert np.array_equal(cw_hi + cw_lo, cw64.astype(np.float32))
    full = (cw_hi.astype(np.float64) + cw_lo.astype(np.float64)
            + cw_res.astype(np.float64))
    assert np.max(np.abs(full - cw64) / cw64) < 2e-14


def test_make_jax_forward_pallas_integration(testdata_dir):
    """Full forward model with the Pallas tau path (interpret on CPU) agrees
    with the default path."""
    m = AbsorptionModel.from_file(
        f"{testdata_dir}/civ_mock_spec.txt",
        fitrange=[(6180.0, 6220.0)],
        fitlines=["CIV 1548", "CIV 1550"],
        ncomp=(1, 2),
        specres=[8.0],
        zrange=[2.99, 3.01],
    )
    from mcalf_tpu.models import make_jax_forward

    f_ref = make_jax_forward(m, use_pallas=False)
    f_pal = make_jax_forward(m, use_pallas=True)
    rng = np.random.default_rng(3)
    u = rng.uniform(0.1, 0.9, size=(5, m.ndim)).astype(np.float32)
    p = np.asarray(f_ref.cube_to_params(u))
    a = np.asarray(f_ref.reconstruct(p))
    b = np.asarray(f_pal.reconstruct(p))
    # The two paths differ only through u-precision at line cores: the
    # Pallas path reconstructs u at ~f64 fidelity while the jnp path carries
    # the f32 product rounding (~2e-3 in u -> ~1e-3 in core flux).
    assert np.max(np.abs(a - b)) < 2e-3
    # At arbitrary (bad-fit) points chi2 is huge and a 1e-3 model difference
    # moves ll by ~1e-4 of its magnitude; at the truth the agreement is tight.
    la = np.asarray(f_ref.loglike(p))
    lb = np.asarray(f_pal.loglike(p))
    assert np.max(np.abs(la - lb) / (np.abs(la) * 1e-3 + 1.0)) < 1.0
    truth = np.array([1.0, 13.8, 3.0, 15.0, 12.0, 3.001, 15.0], np.float32)
    assert abs(float(f_ref.loglike(truth)) - float(f_pal.loglike(truth))) < 2.0
