"""Faddeeva/Voigt special-function accuracy vs scipy.special.wofz.

Accuracy bar from BASELINE.md: the reference's float32 hjert achieves
<= 2.4e-6 relative error over a in [1e-4, 1], u in [0, 100]; ours must meet
or beat that.
"""

import numpy as np
import scipy.special as sps

import jax
import jax.numpy as jnp

from mcalf_tpu.ops import erfcx, hjert
from mcalf_tpu.ops.faddeeva import HARRIS_A_MAX, dawsn, hjert_harris


def test_erfcx_accuracy():
    # Positive arguments (the Voigt path only ever calls erfcx(a), a > 0):
    # near float32 roundoff.
    x = np.concatenate(
        [np.linspace(0.0, 30.0, 1001), np.geomspace(1e-6, 1.0, 101)]
    ).astype(np.float32)
    got = np.asarray(erfcx(jnp.asarray(x)))
    want = sps.erfcx(x.astype(np.float64))
    rel = np.abs(got - want) / np.abs(want)
    assert np.max(rel) < 5e-7, np.max(rel)

    # Negative branch (reflection 2 exp(x^2) - f): float32-limited but finite.
    xn = np.linspace(-9.0, -0.01, 301).astype(np.float32)
    got = np.asarray(erfcx(jnp.asarray(xn)))
    want = sps.erfcx(xn.astype(np.float64))
    rel = np.abs(got - want) / np.abs(want)
    assert np.max(rel) < 2e-5, np.max(rel)


def test_hjert_accuracy_reference_domain():
    # The reference's float32 hjert measures 3.23e-6 max relative error on
    # exactly this grid (BASELINE.md quotes 2.4e-6 from a sparser grid);
    # ours measures 6.9e-7 -- 4.7x more accurate (the three-anchor
    # recurrence keeps every term within ~7 rounding steps of a small-
    # argument exponential).
    a = np.geomspace(1e-4, 1.0, 60)
    u = np.concatenate([[0.0], np.geomspace(1e-3, 100.0, 240)])
    U, A = np.meshgrid(u, a)
    want = sps.wofz(U + 1j * A).real
    got = np.asarray(hjert(jnp.asarray(U, jnp.float32), jnp.asarray(A, jnp.float32)))
    rel = np.abs(got - want) / np.abs(want)
    assert np.max(rel) < 1e-6, np.max(rel)


def test_hjert_wide_domain():
    # Wider than the reference bar: large damping and far wings.
    a = np.geomspace(1e-4, 50.0, 80)
    u = np.concatenate([[0.0], np.geomspace(1e-3, 3000.0, 300)])
    U, A = np.meshgrid(u, a)
    want = sps.wofz(U + 1j * A).real
    got = np.asarray(hjert(jnp.asarray(U, jnp.float32), jnp.asarray(A, jnp.float32)))
    rel = np.abs(got - want) / np.abs(want)
    assert np.max(rel) < 3e-5, np.max(rel)


def test_hjert_even_in_u():
    u = jnp.linspace(0.0, 50.0, 501)
    a = jnp.float32(0.01)
    assert np.array_equal(np.asarray(hjert(u, a)), np.asarray(hjert(-u, a)))


def test_hjert_vectorized_shapes_and_jit():
    f = jax.jit(hjert)
    u = jnp.ones((3, 5, 7), jnp.float32)
    a = jnp.full((5, 7), 0.1, jnp.float32)
    out = f(u, a)
    assert out.shape == (3, 5, 7)
    assert np.isfinite(np.asarray(out)).all()


def test_hjert_no_nans_near_region_switch():
    # r2 = 111 boundary: both branches must be finite and agree.
    r = np.sqrt(111.0)
    theta = np.linspace(1e-3, np.pi / 2 - 1e-3, 101)
    for eps in (-1e-3, 0.0, 1e-3):
        u = ((r + eps) * np.cos(theta)).astype(np.float32)
        a = ((r + eps) * np.sin(theta)).astype(np.float32)
        got = np.asarray(hjert(jnp.asarray(u), jnp.asarray(a)))
        want = sps.wofz(u.astype(np.float64) + 1j * a.astype(np.float64)).real
        rel = np.abs(got - want) / np.abs(want)
        assert np.isfinite(got).all()
        assert np.max(rel) < 1e-4, (eps, np.max(rel))


def test_dawsn_vs_scipy():
    # Piecewise-polynomial f32 Dawson integral: <= ~6e-7 relative everywhere,
    # including across the region boundaries (u = 1.5, 2.5, 4).
    u = np.concatenate(
        [np.linspace(-10, 10, 40001), np.linspace(10, 500, 5001)]
    ).astype(np.float32)
    got = np.asarray(dawsn(jnp.asarray(u)))
    want = sps.dawsn(u.astype(np.float64))
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-30)
    rel[np.abs(u) < 1e-6] = 0.0
    assert np.max(rel) < 1e-6, np.max(rel)
    # odd
    assert np.array_equal(
        np.asarray(dawsn(jnp.asarray(u))), -np.asarray(dawsn(jnp.asarray(-u)))
    )


def test_hjert_harris_vs_scipy():
    # The small-damping fast path must meet the reference accuracy bar
    # (<= 2.4e-6 rel, SURVEY.md 6.2) for every a below HARRIS_A_MAX,
    # including the deep far wings where H ~ a/(sqrt(pi) u^2) ~ 1e-9.
    u = np.concatenate(
        [np.linspace(0, 30, 30001), np.linspace(30, 500, 5001)]
    ).astype(np.float32)
    for a in (1e-7, 1e-5, 1e-4, 3e-4, HARRIS_A_MAX):
        got = np.asarray(hjert_harris(jnp.asarray(u), jnp.float32(a)))
        want = sps.wofz(u.astype(np.float64) + 1j * a).real
        rel = np.abs(got - want) / np.abs(want)
        assert np.max(rel) < 2.4e-6, (a, np.max(rel))


def test_hjert_harris_broadcast_column():
    # a as a per-sample scalar column against a pixel axis (the fused-tau
    # layout).
    u = np.linspace(0, 20, 2048, dtype=np.float32)[None, :].repeat(4, axis=0)
    a = np.array([[1e-4], [2e-4], [5e-4], [1e-3]], np.float32)
    got = np.asarray(hjert_harris(jnp.asarray(u), jnp.asarray(a)))
    assert got.shape == (4, 2048)
    for i in range(4):
        want = sps.wofz(u[i].astype(np.float64) + 1j * float(a[i, 0])).real
        rel = np.abs(got[i] - want) / np.abs(want)
        assert np.max(rel) < 2.4e-6
