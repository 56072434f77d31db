"""Pallas TPU kernel for fused multi-transition Voigt optical-depth synthesis.

The hot loop of every fit is tau(B, P) = sum_t gain[b,t] * H(u[b,t,p],
a[b,t]).  This kernel tiles (B, P), loops over transitions in VMEM, and for
transitions whose prior-bounded damping is small (``harris`` flags, see
StaticSpec.harris) evaluates the 3-term Harris expansion with no branch at
all; otherwise it takes the Algorithm-916 series branch *per tile* only when
some lane of the tile is inside the series region (``jax.lax.cond`` on a
tile-level predicate).

Precision: u = (D0 + dz * c/lam) / dnu with D0 = (1 + zmid) c/lam - nu_0
precomputed in f64 on host (models/jax_model.build_consts) and dz = z - zmid
the high-precision redshift offset; the f32 product dz * (c/lam) carries an
absolute error of only eps * |dz| * 1.5e15 ~ 1e6 Hz => du ~ 1e-5, a few ULPs
of the f64 value.  (This supersedes the earlier Dekker-split double-float
scheme: anchoring at the static prior midpoint makes the residual small
enough for plain f32.)

Correctness contract: matches the XLA tau path (models/jax_model
.reconstruct_core) to f32 roundoff; tests/test_voigt_pallas.py compares
against an f64-u reference.

Two kernels live here.  ``voigt_tau_pallas`` (tau only) is the round-2
kernel: measured roughly speed-tied with XLA at batch >= 200 and ~20%
slower at small batches, because exp(-tau), the convolution and the chi^2
reduction all bounced back through HBM.  ``likelihood_pallas`` (round 3)
fuses the ENTIRE likelihood -- tau -> exp(-tau) -> LSF convolution (static
lane rotations) -> chi^2 partial reduction + asymmlike outlier counts --
in one VMEM-resident kernel with no HBM intermediates, and measures
+3-6% over the XLA path at the production deletion batch (BENCH_r03
``pallas_fused_vs_xla``).  It is therefore the PRODUCTION DEFAULT on TPU
(models/jax_model.resolve_use_pallas: auto-on when the (T, P) tables fit
VMEM; MCALF_TPU_PALLAS=0 overrides).  The tau-only kernel stays for the
head-to-head and as the fallback shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcalf_tpu.ops.faddeeva import hjert_harris, wofz_real_916, wofz_real_asym

__all__ = ["voigt_tau_pallas", "pallas_supported"]

# Tile sizes: sublane x lane for f32.
_TB = 8
_TP = 512


def _accum_tau(dz_ref, gain_ref, av_ref, idnu_ref, d0_ref, cw, tb, tp,
               harris):
    """Shared tau accumulation over the transition loop for one (tb, tp)
    tile (see ``_tau_kernel`` docstring for the branching scheme)."""
    T = dz_ref.shape[1]
    acc = jnp.zeros((tb, tp), jnp.float32)
    for t in range(T):
        dz = dz_ref[:, t][:, None]        # (tb, 1)
        gain = gain_ref[:, t][:, None]
        a = av_ref[:, t][:, None]
        idnu = idnu_ref[:, t][:, None]
        u = (d0_ref[t, :][None, :] + dz * cw[None, :]) * idnu   # (tb, tp)
        if harris and harris[t]:
            H = hjert_harris(u, a)
        else:
            r2 = u * u + a * a
            any_near = jnp.min(r2) < 111.0

            def near_fn(u, a, r2):
                # Clamp x only; a stays a (tb, 1) scalar column so erfcx and
                # the series denominators evaluate per sample, not per pixel
                # (see ops.faddeeva.hjert).
                xs = jnp.where(r2 < 111.0, u, 0.0)
                return jnp.where(
                    r2 < 111.0, wofz_real_916(xs, a), wofz_real_asym(u, a)
                )

            def far_fn(u, a, r2):
                return jnp.broadcast_to(wofz_real_asym(u, a), (tb, tp))

            H = jax.lax.cond(any_near, near_fn, far_fn, u, a, r2)
        acc = acc + gain * H
    return acc


def _tau_kernel(dz_ref, gain_ref, av_ref, idnu_ref, d0_ref, cw_ref, tau_ref,
                *, harris=()):
    """One (TB, TP) output tile; loops transitions, branching per tile.

    ``harris``: per-transition static flags -- when set, the transition's
    damping is bounded small by its prior and the 3-term Harris expansion
    (ops.faddeeva.hjert_harris) replaces the 916/asymptotic pair with no
    runtime branch at all."""
    cw = cw_ref[0, :]                     # (TP,)
    tau_ref[:, :] = _accum_tau(
        dz_ref, gain_ref, av_ref, idnu_ref, d0_ref, cw, _TB, _TP, harris
    )


def _ll_kernel(
    dz_ref, gain_ref, av_ref, idnu_ref, d0_ref, cw_ref, data_ref, ivar_ref,
    innoise_ref, kern_ref, cont_ref, chi2_ref, n4_ref, n5_ref,
    *, harris, half, P, Pp, asymm,
):
    """Fully fused likelihood for one block of _TB samples: tau synthesis ->
    exp(-tau) -> (2*half+1)-tap LSF convolution -> chi^2 partial reduction
    (+ the asymmetric-likelihood outlier counts), all in VMEM with no HBM
    intermediate.  The whole (padded) spectrum is one tile, so the
    convolution is ``2*half+1`` static lane-rotations and the reduction
    never leaves the kernel."""
    cw = cw_ref[0, :]                                       # (Pp,)
    tau = _accum_tau(
        dz_ref, gain_ref, av_ref, idnu_ref, d0_ref, cw, _TB, Pp, harris
    )
    flux = jnp.exp(-tau)                                    # (_TB, Pp)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_TB, Pp), 1)
    inb = lane < P
    if half > 0:
        # Zero-padded 'same' convolution via lane rotations: lanes >= P are
        # zeroed, and Pp >= P + half guarantees every wrapped-in lane comes
        # from that zero region, so circular == zero-padded here.
        fz = jnp.where(inb, flux, 0.0)
        conv = jnp.zeros((_TB, Pp), jnp.float32)
        for k in range(2 * half + 1):
            # shift 0 must bypass roll: Mosaic rejects the empty slice that
            # jnp.roll's concatenate decomposition produces at shift 0.
            shifted = fz if k == half else jnp.roll(fz, half - k, axis=1)
            conv = conv + kern_ref[:, k][:, None] * shifted
        # 'same_edge': the half edge pixels revert to the unconvolved model
        # (reference hires_fitter.py:674-681).
        edge = (lane < half) | (lane >= P - half)
        m = jnp.where(edge, flux, conv)
    else:
        m = flux
    m = m * cont_ref[:, 0][:, None]
    r = data_ref[0, :][None, :] - m
    chi2 = jnp.sum(ivar_ref[0, :][None, :] * r * r, axis=1)  # (_TB,)
    chi2_ref[:, :] = jnp.broadcast_to(chi2[:, None], (_TB, 128))
    if asymm:
        rn = r * innoise_ref[0, :][None, :]
        n4 = jnp.sum((rn > 4.0).astype(jnp.float32), axis=1)
        n5 = jnp.sum((rn > 5.0).astype(jnp.float32), axis=1)
    else:
        n4 = n5 = jnp.zeros((_TB,), jnp.float32)
    n4_ref[:, :] = jnp.broadcast_to(n4[:, None], (_TB, 128))
    n5_ref[:, :] = jnp.broadcast_to(n5[:, None], (_TB, 128))


@functools.partial(
    jax.jit, static_argnames=("interpret", "harris", "half", "asymm")
)
def likelihood_pallas(
    dz, gain, av, dnu, d0, c_over_wave, data, ivar, inv_noise, kern, cont,
    interpret: bool = False, harris: tuple = (), half: int = 0,
    asymm: bool = False,
):
    """Fused chi^2 (+ asymmlike outlier counts) for a batch of samples.

    Parameters: per-sample (B, T) tables as in :func:`voigt_tau_pallas`,
    plus the (P,) ``data`` / ``ivar`` / ``inv_noise`` spectra (inv_noise
    zeroed on invalid pixels), the per-sample normalized LSF kernel
    ``kern`` (B, 2*half+1), and the per-sample continuum ``cont`` (B,).
    Returns (chi2, n4, n5) each of shape (B,); n4/n5 are the >4 / >5 sigma
    positive-residual counts used by the asymmetric likelihood (zeros when
    ``asymm`` is False).

    Convolution semantics are exactly ``lsf_convolve(mode='same_edge')``
    (the reference's JAX-likelihood path, hires_fitter.py:666-681).
    """
    d0 = jnp.asarray(d0)
    cw = jnp.asarray(c_over_wave)
    B, T = dz.shape
    P = cw.shape[0]
    K = 2 * half + 1
    Bp = -(-B // _TB) * _TB
    # One lane-tile spectrum with room for the conv margin (see _ll_kernel).
    Pp = -(-(P + max(half, 1)) // 128) * 128

    def pad(x, n, axis=0, value=0.0):
        w = [(0, 0)] * x.ndim
        w[axis] = (0, n - x.shape[axis])
        return jnp.pad(x, w, constant_values=value)

    dzp = pad(dz, Bp)
    gainp = pad(gain, Bp)
    avp = pad(av, Bp, value=1e6)
    idnup = pad(1.0 / dnu, Bp)
    d0p = pad(d0, Pp, axis=1)
    cwp = pad(cw[None, :], Pp, axis=1)
    datap = pad(jnp.asarray(data)[None, :], Pp, axis=1)
    ivarp = pad(jnp.asarray(ivar)[None, :], Pp, axis=1)
    innp = pad(jnp.asarray(inv_noise)[None, :], Pp, axis=1)
    kernp = pad(jnp.broadcast_to(jnp.asarray(kern), (B, K)), Bp)
    contp = pad(jnp.broadcast_to(jnp.asarray(cont), (B,))[:, None], Bp)

    grid = (Bp // _TB,)
    row = lambda i: (i, 0)
    full = lambda i: (0, 0)
    chi2, n4, n5 = pl.pallas_call(
        functools.partial(
            _ll_kernel, harris=harris, half=half, P=P, Pp=Pp, asymm=asymm
        ),
        out_shape=[jax.ShapeDtypeStruct((Bp, 128), jnp.float32)] * 3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TB, T), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, T), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, T), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, T), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, Pp), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Pp), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Pp), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Pp), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Pp), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, K), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, 1), row, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TB, 128), row, memory_space=pltpu.VMEM)
        ] * 3,
        interpret=interpret,
    )(dzp, gainp, avp, idnup, d0p, cwp, datap, ivarp, innp, kernp, contp)
    return chi2[:B, 0], n4[:B, 0], n5[:B, 0]


def pallas_supported() -> bool:
    """True when running on a TPU backend (the kernel also runs anywhere via
    interpret mode, used by tests)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=("interpret", "harris"))
def voigt_tau_pallas(
    dz, gain, av, dnu, d0, c_over_wave, interpret: bool = False,
    harris: tuple = (),
):
    """tau(B, P) = sum_t gain[b,t] * H(u, a).

    Parameters (all float32):
    dz, gain, av, dnu : (B, T) per-sample per-transition scalars
        (``dz`` = z - zmid high-precision redshift offsets; ``gain``
        already includes the trans-dimensional activity mask and the tau
        amplitude TAU_CONST * 10^N * f / dnu).
    d0 : (T, P) static table (1 + zmid) c/lam - nu_0 (f64-precomputed).
    c_over_wave : (P,) static c/lam table.
    harris : per-transition static flags selecting the small-damping Harris
        fast path (see StaticSpec.harris).
    """
    d0 = jnp.asarray(d0)
    cw = jnp.asarray(c_over_wave)
    B, T = dz.shape
    P = cw.shape[0]
    Bp = -(-B // _TB) * _TB
    Pp = -(-P // _TP) * _TP

    def pad(x, n, axis=0, value=0.0):
        w = [(0, 0)] * x.ndim
        w[axis] = (0, n - x.shape[axis])
        return jnp.pad(x, w, constant_values=value)

    dzp = pad(dz, Bp)
    gainp = pad(gain, Bp)
    # Padding rows: huge damping keeps fake lanes in the (cheap, finite)
    # asymptotic branch; gain=0 keeps them out of the output.
    avp = pad(av, Bp, value=1e6)
    idnup = pad(1.0 / dnu, Bp)
    d0p = pad(d0, Pp, axis=1)
    cwp = pad(cw[None, :], Pp, axis=1)

    grid = (Bp // _TB, Pp // _TP)
    out = pl.pallas_call(
        functools.partial(_tau_kernel, harris=harris),
        out_shape=jax.ShapeDtypeStruct((Bp, Pp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TB, T), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, T), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, T), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, T), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, _TP), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TP), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_TB, _TP), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(dzp, gainp, avp, idnup, d0p, cwp)
    return out[:B, :P]
