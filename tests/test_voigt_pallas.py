"""Pallas Voigt kernel: accuracy vs an f64-u reference, padding behavior."""

import numpy as np
import jax.numpy as jnp
import pytest

from mcalf_tpu.models import AbsorptionModel
from mcalf_tpu.models.forward import CCGS, TAU_CONST
from mcalf_tpu.models.jax_model import build_consts
from mcalf_tpu.ops.faddeeva import hjert
from mcalf_tpu.ops.voigt_pallas import voigt_tau_pallas


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

    rng = np.random.default_rng(0)
    B = 13  # deliberately not a multiple of the 8-row tile
    lo, hi = m.bounds_lo, m.bounds_hi
    p = (lo + rng.uniform(0.1, 0.9, size=(B, m.ndim)) * (hi - lo)).astype(np.float32)
    N = p[:, c["pidx"]]
    z = p[:, c["pidx"] + 1]
    b = p[:, c["pidx"] + 2]
    # dz must be formed against the f64 zmid the d0 table was built with
    # (the production cube path does this implicitly: u=0.5 IS the f64
    # midpoint); differencing against the f32-rounded zmid shifts filler u
    # by ~8e-4.
    zmid64 = 0.5 * (
        np.asarray(m.bounds_lo, np.float64)[tab["pidx"] + 1]
        + np.asarray(m.bounds_hi, np.float64)[tab["pidx"] + 1]
    )
    dz = (z.astype(np.float64) - zmid64).astype(np.float32)
    dnu = (b * 1e5 * c["inv_wrest_cm"]).astype(np.float32)
    av = (c["gamma"] / (4 * np.pi * dnu)).astype(np.float32)
    nact = np.floor(p[:, m.startind])
    active = (c["comp_id"][None, :] < nact[:, None]) | c["is_fill"][None, :]
    gain = (TAU_CONST * 10.0**N * c["f"] / dnu * active).astype(np.float32)
    d0 = np.asarray(c["d0"])
    cw32 = np.asarray(c["c_over_wave"])
    return z, dz, gain, av, dnu, d0, cw32, nujk64, cw64


def _tau_f64_u(z, gain, av, dnu, nujk64, cw64):
    """Reference: u in float64 (the quantity the d0 + dz*cw path
    reconstructs), H and the sum in float32."""
    u64 = (
        (1.0 + z.astype(np.float64))[:, :, None] * cw64[None, None, :]
        - nujk64[None, :, None]
    ) / dnu.astype(np.float64)[:, :, None]
    H = hjert(jnp.asarray(u64, jnp.float32), jnp.asarray(av)[..., None])
    return jnp.sum(jnp.asarray(gain)[..., None] * H, axis=-2)


def test_pallas_matches_f64_u_reference(problem):
    z, dz, gain, av, dnu, d0, cw32, nujk64, cw64 = problem
    got = np.asarray(
        voigt_tau_pallas(dz, gain, av, dnu, d0, cw32, interpret=True)
    )
    want = np.asarray(_tau_f64_u(z, gain, av, dnu, nujk64, cw64))
    assert got.shape == want.shape
    # d0 + dz*cw u reconstruction: agreement at f32 roundoff relative to
    # the local tau scale.
    err = np.abs(got - want) / (np.abs(want) + 1e-3)
    assert np.max(err) < 3e-5, np.max(err)


def test_pallas_padding_rows_do_not_leak(problem):
    _, dz, gain, av, dnu, d0, cw32, *_ = problem

    full = np.asarray(
        voigt_tau_pallas(dz, gain, av, dnu, d0, cw32, interpret=True)
    )

    def grow(x):
        return np.concatenate([x, x[-1:]], axis=0)

    grown = np.asarray(
        voigt_tau_pallas(
            grow(dz), grow(gain), grow(av), grow(dnu), d0, cw32, interpret=True
        )
    )
    assert np.array_equal(grown[:-1], full)


def test_d0_table_reconstructs_f64_u(problem):
    """The static D0 table plus the f32 dz*cw product reproduce the f64 u to
    ~1e-4 absolute (vs ~2e-3 for a naive f32 (1+z)*cw - nu0)."""
    z, dz, gain, av, dnu, d0, cw32, nujk64, cw64 = problem
    u64 = (
        (1.0 + z.astype(np.float64))[:, :, None] * cw64[None, None, :]
        - nujk64[None, :, None]
    ) / dnu.astype(np.float64)[:, :, None]
    u32 = (
        d0[None, :, :].astype(np.float64)
        + (dz.astype(np.float64)[:, :, None] * cw32.astype(np.float64))
    ) / dnu.astype(np.float64)[:, :, None]
    assert np.max(np.abs(u32 - u64)) < 1e-3
    # and it is much better than the naive f32 assembly
    u_naive = (
        ((1.0 + z)[:, :, None] * cw32[None, None, :]).astype(np.float32)
        - (nujk64.astype(np.float32))[None, :, None]
    ) / dnu[:, :, None]
    assert np.max(np.abs(u32 - u64)) < 0.1 * max(
        np.max(np.abs(u_naive - u64)), 1e-3
    )


def test_fused_likelihood_matches_xla(testdata_dir):
    """The fully fused likelihood kernel (tau -> exp -> LSF conv -> chi^2 +
    asymmlike counts in one Pallas call) agrees with the XLA path on a
    trans-dimensional multicomp model with asymmlike on."""
    m = AbsorptionModel.from_file(
        f"{testdata_dir}/civ_mock_spec_multicomp.txt",
        fitrange=[(6180.0, 6220.0)],
        fitlines=["CIV 1548", "CIV 1550"],
        ncomp=(2, 4),
        nfill=1,
        specres=[8.0],
        Nrange=[12.0, 14.5],
        brange=[10.0, 40.0],
        zrange=[2.99, 3.01],
        Asymmlike=True,
    )
    from mcalf_tpu.models import make_jax_forward

    f_ref = make_jax_forward(m, use_pallas=False)
    f_pal = make_jax_forward(m, use_pallas=True)
    assert f_pal.static.asymmlike
    rng = np.random.default_rng(7)
    # include near-prior-edge points and a non-multiple-of-8 batch
    u = rng.uniform(0.02, 0.98, size=(21, m.ndim)).astype(np.float32)
    la = np.asarray(f_ref.loglike_cube(u))
    lb = np.asarray(f_pal.loglike_cube(u))
    # -inf rejections (asymmlike) must agree exactly; finite values to
    # f32 roundoff of the chi^2 sum
    assert np.array_equal(np.isfinite(la), np.isfinite(lb)), (la, lb)
    fin = np.isfinite(la)
    assert np.allclose(la[fin], lb[fin], rtol=1e-5, atol=0.05), (
        np.max(np.abs(la[fin] - lb[fin]))
    )
    ca = np.asarray(f_ref.chi2(np.asarray(f_ref.cube_to_params(u))))
    assert np.all(np.isfinite(ca))


def test_fused_likelihood_floating_specres_and_cont(testdata_dir):
    """Fused kernel with FLOATING specres (per-sample LSF kernels) +
    floating continuum + asymmlike agrees with the XLA path.  Evaluated at
    perturbations of the mock's generative truth so the asymmlike gate
    accepts (random cube points are all >4-sigma-rejected by BOTH paths --
    itself asserted); verified identically on the real chip (max rel.
    diff 1.1e-7 over 256 points, 2026-08-18)."""
    m = AbsorptionModel.from_file(
        f"{testdata_dir}/civ_mock_spec_multicomp.txt",
        fitrange=[(6180.0, 6220.0)],
        fitlines=["CIV 1548", "CIV 1550"],
        ncomp=(8, 11),
        specres=[6.0, 10.0],
        contval=[0.9, 1.1],
        Nrange=[12.0, 14.5],
        brange=[10.0, 40.0],
        zrange=[2.99, 3.01],
        Asymmlike=True,
    )
    from mcalf_tpu.models import make_jax_forward

    f_ref = make_jax_forward(m, use_pallas=False)
    f_pal = make_jax_forward(m, use_pallas=True)
    lo = np.asarray(f_ref.bounds_lo)
    hi = np.asarray(f_ref.bounds_hi)
    # Mock truth (testdata/generate_from_model.py:12-14); the out-of-prior
    # b=8 component is parked at 10.5, the 11th triplet mid-prior.
    zs = [2.999, 2.9995, 3.0, 3.001, 3.0005, 3.0015, 3.002, 3.0025,
          3.0035, 3.0039]
    Ns = [13.6, 13.0, 13.8, 13.6, 13.2, 13.4, 13.5, 14.0, 14.2, 13.7]
    bs = [17.5, 10.5, 20.0, 25.0, 15.0, 30.0, 10.0, 25.0, 15.0, 20.0]
    p = [8.0, 1.0, 10.5]
    for N, z, b in zip(Ns, zs, bs):
        p += [N, z, b]
    p += [13.0, 3.0, 20.0]
    u0 = (np.array(p) - lo) / (hi - lo)
    rng = np.random.default_rng(1)
    u = np.clip(
        u0[None] + rng.normal(0, 5e-4, size=(37, m.ndim)), 1e-4, 1 - 1e-4
    ).astype(np.float32)
    la = np.asarray(f_ref.loglike_cube(u))
    lb = np.asarray(f_pal.loglike_cube(u))
    assert np.array_equal(np.isfinite(la), np.isfinite(lb))
    fin = np.isfinite(la)
    assert fin.sum() > 20, fin.sum()
    assert np.allclose(la[fin], lb[fin], rtol=1e-5, atol=0.05)
    # Far-from-truth random points: both paths reject identically.
    ur = rng.uniform(0.05, 0.95, size=(16, m.ndim)).astype(np.float32)
    assert np.array_equal(
        np.isfinite(np.asarray(f_ref.loglike_cube(ur))),
        np.isfinite(np.asarray(f_pal.loglike_cube(ur))),
    )


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
    # Both paths now assemble u from the same d0 + dz*cw tables; they differ
    # only in evaluation order (f32 roundoff).
    assert np.max(np.abs(a - b)) < 1e-4
    la = np.asarray(f_ref.loglike_cube(u))
    lb = np.asarray(f_pal.loglike_cube(u))
    assert np.allclose(la, lb, rtol=1e-5, atol=0.05)


def test_resolve_use_pallas_non_tpu_auto_fallback(testdata_dir, monkeypatch):
    # The reference claims GPU support (README.md:5); our GPU path is the
    # plain XLA likelihood with the fused Pallas kernel auto-disabled.
    # Simulate a non-TPU accelerator (pallas_supported() False -- GPU and
    # CPU look identical to this policy) and check 'auto' falls back to a
    # working XLA path; on a TPU-like backend 'auto' enables the compiled
    # (non-interpret) kernel.
    import jax
    import mcalf_tpu.models.jax_model as jm
    import mcalf_tpu.ops.voigt_pallas as vp
    from mcalf_tpu.models.jax_model import make_jax_forward, resolve_use_pallas

    monkeypatch.delenv("MCALF_TPU_PALLAS", raising=False)
    m = AbsorptionModel.from_file(
        f"{testdata_dir}/civ_mock_spec.txt",
        fitrange=[(6180.0, 6220.0)],
        fitlines=["CIV 1548", "CIV 1550"],
        ncomp=(1, 1),
        specres=[8.0],
        zrange=[2.99, 3.01],
    )

    monkeypatch.setattr(vp, "pallas_supported", lambda: False)  # GPU-like
    enabled, interpret = resolve_use_pallas(m, "auto")
    assert enabled is False and interpret is False
    fwd = make_jax_forward(m, use_pallas="auto")
    assert fwd.static.use_pallas is False
    u = jnp.full((3, m.ndim), 0.5, jnp.float32)
    ll = np.asarray(fwd.loglike_cube(u))
    assert np.all(np.isfinite(ll))
    # Forcing use_pallas=True off-TPU routes through interpret mode (the
    # test escape hatch), never a hard failure.
    enabled, interpret = resolve_use_pallas(m, True)
    assert enabled is True and interpret is True

    monkeypatch.setattr(vp, "pallas_supported", lambda: True)  # TPU-like
    enabled, interpret = resolve_use_pallas(m, "auto")
    assert enabled is True and interpret is False
    # The env var overrides the policy either way.
    monkeypatch.setenv("MCALF_TPU_PALLAS", "0")
    enabled, _ = resolve_use_pallas(m, "auto")
    assert enabled is False
