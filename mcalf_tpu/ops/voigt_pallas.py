"""Pallas TPU kernel for fused multi-transition Voigt optical-depth synthesis.

The hot loop of every fit is tau(B, P) = sum_t gain[b,t] * H(u[b,t,p],
a[b,t]).  The pure-XLA path (models/jax_model.reconstruct_core) evaluates the
Voigt-Hjerting function *branchlessly* on every pixel: the Algorithm-916
series (the expensive branch) is computed even though ~90% of pixels sit in
the far wings where the cheap asymptotic expansion is exact (|u| spans
hundreds of Doppler widths across a spectrum; the series region |z| < ~10.5
covers only the line cores).

This kernel tiles (B, P), loops over transitions in VMEM, and takes the
series branch *per tile* only when some lane of the tile is inside the
series region (`jax.lax.cond` on a tile-level predicate).  Line cores touch
a handful of pixel tiles per transition, so most (tile, transition) pairs run
pure-asymptotic -- a large reduction in transcendental work on top of the
recurrence-optimized series (ops/faddeeva.py).

Precision: u = ((1+z) c/lam - nu_0)/dnu subtracts ~1.5e15 Hz quantities to
get a ~1e11 Hz result; a naive f32 product z*(c/lam) injects an absolute
error of eps*1.5e15 ~ 9e7 Hz (=> du ~ 2e-3, 0.5% tau error at line cores).
We therefore compute  u*dnu = D + z*(c/lam)  with

* D = c/lam - nu_0 held as a static double-float (D_hi + D_lo, from f64);
* z*(c/lam) as exact Dekker split products (z and c/lam each split into
  12-bit halves; the hi*hi partial is exact in f32);

which brings u to within a few ULPs of the f64 value (validated in
tests/test_voigt_pallas.py against an f64 reference).

Correctness contract: matches ops.faddeeva.hjert-based synthesis at f64-u
fidelity; tests compare against an f64-u reference path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcalf_tpu.ops.faddeeva import wofz_real_916, wofz_real_asym

__all__ = ["voigt_tau_pallas", "precompute_dsplit", "pallas_supported"]

# Tile sizes: sublane x lane for f32.
_TB = 8
_TP = 512
_SPLIT = 4097.0  # Dekker split constant for f32 (2^12 + 1)


def precompute_dsplit(nujk_f64: np.ndarray, c_over_wave_f64: np.ndarray):
    """Static double-float tables for the u computation.

    Returns (D_hi, D_lo, cw_hi, cw_lo, cw_res):
    D = c/lam - nu_0 per (transition, pixel) as hi+lo f32 pair;
    c/lam as exact 12-bit Dekker halves of its f32 rounding (cw_hi + cw_lo)
    plus the f64 residual cw_res = cw - f32(cw) (without it, z * cw_res
    ~ 5e7 Hz is lost and u degrades to ~5e-4 absolute).
    All computed in float64 on host.
    """
    cw = np.asarray(c_over_wave_f64, np.float64)
    nu = np.asarray(nujk_f64, np.float64)
    D = cw[None, :] - nu[:, None]                     # (T, P) f64
    D_hi = D.astype(np.float32)
    D_lo = (D - D_hi.astype(np.float64)).astype(np.float32)
    cw32 = cw.astype(np.float32)
    c_big = cw32 * np.float32(_SPLIT)
    cw_hi = (c_big - (c_big - cw32)).astype(np.float32)
    cw_lo = (cw32 - cw_hi).astype(np.float32)
    cw_res = (cw - cw32.astype(np.float64)).astype(np.float32)
    return D_hi, D_lo, cw_hi, cw_lo, cw_res


def _tau_kernel(z_ref, gain_ref, av_ref, idnu_ref, dhi_ref, dlo_ref,
                cwhi_ref, cwlo_ref, cwres_ref, tau_ref):
    """One (TB, TP) output tile; loops transitions, branching per tile."""
    T = z_ref.shape[1]
    cw_hi = cwhi_ref[0, :]  # (TP,)
    cw_lo = cwlo_ref[0, :]
    cw_res = cwres_ref[0, :]
    acc = jnp.zeros((_TB, _TP), jnp.float32)
    for t in range(T):
        z = z_ref[:, t][:, None]          # (TB, 1)
        gain = gain_ref[:, t][:, None]
        a = av_ref[:, t][:, None]
        idnu = idnu_ref[:, t][:, None]
        # Dekker split of z (per sample scalar column).
        zc = z * _SPLIT
        z_hi = zc - (zc - z)
        z_lo = z - z_hi
        # u*dnu = D + z*cw with exact partial products.
        p1 = z_hi * cw_hi[None, :]                     # exact in f32
        p2 = z_hi * cw_lo[None, :] + z_lo * cw_hi[None, :]
        p3 = z_lo * cw_lo[None, :] + z * cw_res[None, :]
        s = (dhi_ref[t, :][None, :] + p1) + (dlo_ref[t, :][None, :] + (p2 + p3))
        u = s * idnu                                    # (TB, TP)
        r2 = u * u + a * a
        any_near = jnp.min(r2) < 111.0

        def near_fn(u, a, r2):
            xs = jnp.where(r2 < 111.0, u, 0.0)
            ys = jnp.where(r2 < 111.0, a, 1.0)
            return jnp.where(
                r2 < 111.0, wofz_real_916(xs, ys), wofz_real_asym(u, a)
            )

        def far_fn(u, a, r2):
            return wofz_real_asym(u, a)

        a_b = jnp.broadcast_to(a, (_TB, _TP))
        H = jax.lax.cond(any_near, near_fn, far_fn, u, a_b, r2)
        acc = acc + gain * H
    tau_ref[:, :] = acc


def pallas_supported() -> bool:
    """True when running on a TPU backend (the kernel also runs anywhere via
    interpret mode, used by tests)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=("interpret",))
def voigt_tau_pallas(z, gain, av, dnu, dsplit, interpret: bool = False):
    """tau(B, P) = sum_t gain[b,t] * H(u, a).

    Parameters (all float32):
    z, gain, av, dnu : (B, T) per-sample per-transition scalars
        (gain already includes the trans-dimensional activity mask and the
        tau amplitude TAU_CONST * 10^N * f / dnu).
    dsplit : output of :func:`precompute_dsplit` -- static (D_hi, D_lo)
        (T, P) double-float tables and the (P,) split of c/lam.
    """
    D_hi, D_lo, cw_hi, cw_lo, cw_res = (jnp.asarray(x) for x in dsplit)
    B, T = z.shape
    P = cw_hi.shape[0]
    Bp = -(-B // _TB) * _TB
    Pp = -(-P // _TP) * _TP

    def pad(x, n, axis=0, value=0.0):
        w = [(0, 0)] * x.ndim
        w[axis] = (0, n - x.shape[axis])
        return jnp.pad(x, w, constant_values=value)

    zp = pad(z, Bp)
    gainp = pad(gain, Bp)
    # Padding rows: huge damping keeps fake lanes in the (cheap, finite)
    # asymptotic branch; gain=0 keeps them out of the output.
    avp = pad(av, Bp, value=1e6)
    idnup = pad(1.0 / dnu, Bp)
    dhip = pad(D_hi, Pp, axis=1)
    dlop = pad(D_lo, Pp, axis=1)
    cwhip = pad(cw_hi[None, :], Pp, axis=1)
    cwlop = pad(cw_lo[None, :], Pp, axis=1)
    cwresp = pad(cw_res[None, :], Pp, axis=1)

    grid = (Bp // _TB, Pp // _TP)
    out = pl.pallas_call(
        _tau_kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, Pp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TB, T), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, T), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, T), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, T), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, _TP), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, _TP), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TP), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TP), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TP), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_TB, _TP), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(zp, gainp, avp, idnup, dhip, dlop, cwhip, cwlop, cwresp)
    return out[:B, :P]
