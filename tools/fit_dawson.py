"""Regenerate the f32 Dawson-integral coefficients in ops/faddeeva.py.

Four regions (centered monomial Horner forms so f32 intermediates stay
O(1)); each validated against scipy.special.dawsn.  See faddeeva._DAWSN_P*.
"""
import numpy as np
from scipy.special import dawsn
from numpy.polynomial import chebyshev as C


def fit_region(x, y, deg, center=0.0):
    return C.cheb2poly(C.chebfit(x - center, y, deg))


def horner32(coeffs, x32):
    p = np.full_like(x32, np.float32(coeffs[-1]))
    for cc in coeffs[-2::-1]:
        p = p * x32 + np.float32(cc)
    return p


def main():
    # R1: t = x^2 in [0, 2.25]: F = x * P1(t)
    t1 = np.linspace(0, 2.25, 30001)
    u1 = np.sqrt(t1)
    f1 = np.where(u1 > 0, dawsn(u1) / np.where(u1 > 0, u1, 1), 1.0)
    f1[0] = 1.0
    P1 = fit_region(t1, f1, 10)
    r = np.abs(horner32(P1, t1.astype(np.float32)) * u1.astype(np.float32)
               - dawsn(u1)) / np.maximum(dawsn(u1), 1e-30)
    print("R1 max rel (f32):", r[1:].max())

    # R2: t in [2.25, 6.25]: F = x * P2(t - 4.25)
    t2 = np.linspace(2.25, 6.25, 30001)
    u2 = np.sqrt(t2)
    P2 = fit_region(t2, dawsn(u2) / u2, 10, center=4.25)
    r = np.abs(horner32(P2, (t2 - 4.25).astype(np.float32))
               * u2.astype(np.float32) - dawsn(u2)) / dawsn(u2)
    print("R2 max rel (f32):", r.max())

    # R3: v = 1/t in [1/16, 0.16]: 2xF - 1 = v * P3(v - 0.111)
    v3 = np.linspace(1 / 16, 0.16, 30001)
    u3 = 1 / np.sqrt(v3)
    P3 = fit_region(v3, (2 * u3 * dawsn(u3) - 1) / v3, 8, center=0.111)
    F = 0.5 * u3.astype(np.float32) * v3.astype(np.float32) * (
        1 + v3.astype(np.float32) * horner32(P3, (v3 - 0.111).astype(np.float32)))
    print("R3 max rel (f32):", (np.abs(F - dawsn(u3)) / dawsn(u3)).max())

    # R4: v in (0, 1/16]: 2xF - 1 = v * P4(v)
    v4 = np.linspace(1e-9, 1 / 16, 30001)
    u4 = 1 / np.sqrt(v4)
    P4 = fit_region(v4, (2 * u4 * dawsn(u4) - 1) / v4, 6)
    F = 0.5 * u4.astype(np.float32) * v4.astype(np.float32) * (
        1 + v4.astype(np.float32) * horner32(P4, v4.astype(np.float32)))
    print("R4 max rel (f32):", (np.abs(F - dawsn(u4)) / dawsn(u4)).max())

    np.set_printoptions(floatmode="unique")
    for name, P in (("P1", P1), ("P2", P2), ("P3", P3), ("P4", P4)):
        print(f"_DAWSN_{name} =", [float(np.float32(x)) for x in P])


if __name__ == "__main__":
    main()
