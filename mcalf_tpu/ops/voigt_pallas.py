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

Round 4 adds the WING-WINDOW fast path (``_ll_kernel_win``): for
transitions whose prior-bounded damping admits the Harris expansion, the
full evaluation runs only on a 128-aligned ``_W``-lane dynamic slice per
(sample-block, transition) -- placed by :func:`window_offsets` -- with the
~6x-cheaper ``hjert_wing`` tail everywhere else, branching ONCE per block
(pl.when; per-chunk lax.cond designs measured 2x slower than the math they
saved -- region ops copy their operands).  Engages for posterior-clustered
batches (1.7-1.9x measured); sampling fits take the plain-Harris fallback
nearly always (cube-chord slice proposals are spatially heterogeneous) and
are window-neutral.  MCALF_TPU_WINDOW=0 disables.  The refuted design
variants and the measurement methodology are recorded in CLAUDE.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcalf_tpu.ops.faddeeva import (
    hjert_harris,
    hjert_wing,
    wofz_real_916,
    wofz_real_asym,
)

__all__ = [
    "voigt_tau_pallas",
    "likelihood_pallas",
    "window_offsets",
    "pallas_supported",
]

# Tile sizes: sublane x lane for f32.
_TB = 8
_TP = 512
#: static lane width of the per-(block, transition) wing window (see
#: ``_ll_kernel_win``): the Harris evaluation runs only on this 128-aligned
#: dynamic slice when every block sample's Harris region fits in it.
_W = 512


def _accum_tau(dz_ref, gain_ref, av_ref, idnu_ref, d0_ref, cw, tb, tp,
               harris, win_tmin=(), skip=()):
    """Shared tau accumulation over the transition loop for one (tb, tp)
    tile (see ``_tau_kernel`` docstring for the branching scheme).

    ``win_tmin``: per-transition static wing-window thresholds on u^2
    (models/jax_model.StaticSpec.win_tmin; 0.0 = windowing off for that
    transition).  Windowed transitions evaluate the per-pixel
    ``hjert_harris_win`` selection full-width here -- the window-SKIPPING
    fast path lives in the fused likelihood kernel (``_ll_kernel_win``);
    this shared accumulator keeps every production path value-identical.
    ``skip``: transitions to omit entirely (handled elsewhere)."""
    T = dz_ref.shape[1]
    acc = jnp.zeros((tb, tp), jnp.float32)
    for t in range(T):
        if skip and skip[t]:
            continue
        dz = dz_ref[:, t][:, None]        # (tb, 1)
        gain = gain_ref[:, t][:, None]
        a = av_ref[:, t][:, None]
        idnu = idnu_ref[:, t][:, None]
        u = (d0_ref[t, :][None, :] + dz * cw[None, :]) * idnu   # (tb, tp)
        if win_tmin and win_tmin[t] > 0.0:
            tmin = win_tmin[t]
            H = jnp.where(
                u * u < tmin, hjert_harris(u, a), hjert_wing(u, a)
            )
        elif harris and harris[t]:
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
                *, harris=(), win_tmin=()):
    """One (TB, TP) output tile; loops transitions, branching per tile.

    ``harris``: per-transition static flags -- when set, the transition's
    damping is bounded small by its prior and the 3-term Harris expansion
    (ops.faddeeva.hjert_harris) replaces the 916/asymptotic pair with no
    runtime branch at all.  ``win_tmin``: the windowed-Harris thresholds
    (per-pixel select only here -- the chunk-skipping flags live in the
    fused likelihood kernel; this tau-only kernel computes the identical
    hjert_harris_win VALUES so every production path agrees)."""
    cw = cw_ref[0, :]                     # (TP,)
    tau_ref[:, :] = _accum_tau(
        dz_ref, gain_ref, av_ref, idnu_ref, d0_ref, cw, _TB, _TP, harris,
        win_tmin=win_tmin,
    )


def _ll_kernel(
    dz_ref, gain_ref, av_ref, idnu_ref, d0_ref, cw_ref, data_ref, ivar_ref,
    innoise_ref, kern_ref, cont_ref, chi2_ref, n4_ref, n5_ref,
    *, harris, half, P, Pp, asymm, win_tmin=(),
):
    """Fully fused likelihood for one block of _TB samples: tau synthesis ->
    exp(-tau) -> (2*half+1)-tap LSF convolution -> chi^2 partial reduction
    (+ the asymmetric-likelihood outlier counts), all in VMEM with no HBM
    intermediate.  The whole (padded) spectrum is one tile, so the
    convolution is ``2*half+1`` static lane-rotations and the reduction
    never leaves the kernel.  ``win_tmin``: wing-window thresholds, see
    ``_accum_tau`` (the window-skipping variant is ``_ll_kernel_win``)."""
    cw = cw_ref[0, :]                                       # (Pp,)
    tau = _accum_tau(
        dz_ref, gain_ref, av_ref, idnu_ref, d0_ref, cw, _TB, Pp, harris,
        win_tmin=win_tmin,
    )
    _ll_tail(
        tau, data_ref, ivar_ref, innoise_ref, kern_ref, cont_ref,
        chi2_ref, n4_ref, n5_ref, half=half, P=P, Pp=Pp, asymm=asymm,
    )


def _ll_tail(
    tau, data_ref, ivar_ref, innoise_ref, kern_ref, cont_ref,
    chi2_ref, n4_ref, n5_ref, *, half, P, Pp, asymm,
):
    """exp(-tau) -> LSF convolution -> chi^2 (+ asymmlike counts): the
    shared back half of the fused likelihood kernels."""
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


def _ll_kernel_win(
    wins_ref, dz_ref, gain_ref, av_ref, idnu_ref, d0_ref, cw_ref, data_ref,
    ivar_ref, innoise_ref, kern_ref, cont_ref, chi2_ref, n4_ref, n5_ref,
    wtau_ref, *, harris, half, P, Pp, asymm, win_tmin,
):
    """Windowed fused likelihood: the Harris evaluation of each windowed
    transition runs only on a per-(block, transition) _W-lane dynamic slice.

    ``wins_ref`` is a scalar-prefetch SMEM (n_blocks, 2*T) int32 table of
    [window start (128-aligned lane), overflow flag] pairs from
    :func:`window_offsets`.  The branch is per BLOCK (one pl.when pair --
    per-transition conds measured 2x slower than the math they saved):

    * no window overflows -> for each windowed transition, accumulate the
      cheap wing tail full-width (registers), then add the (harris - wing)
      correction on its window slice into the ``wtau_ref`` VMEM scratch;
    * any overflow (early sampling phase, live points spread prior-wide) ->
      the full-width per-pixel hjert_harris_win selection.

    The window branch computes exactly the hjert_harris_win selection; the
    fallback computes plain hjert_harris, which differs from it only by the
    dropped exponential (amp_max e^{-tmin} < 1e-8 in tau), so the output
    depends on the window table only below physical relevance --
    tests/test_windowing.py bounds the difference and separately checks the
    placement geometry is conservative.  Non-windowed transitions
    (win_tmin[t] == 0) take their usual _accum_tau branch outside the
    when."""
    i = pl.program_id(0)
    cw = cw_ref[0, :]                                       # (Pp,)
    T = dz_ref.shape[1]
    wpairs = [t for t in range(T) if win_tmin[t] > 0.0]

    def u_row(t):
        dz = dz_ref[:, t][:, None]
        idnu = idnu_ref[:, t][:, None]
        return (d0_ref[t, :][None, :] + dz * cw[None, :]) * idnu

    anybad = jnp.int32(0)
    for t in wpairs:
        anybad = anybad + wins_ref[i, 2 * t + 1]

    @pl.when(anybad == 0)
    def _window_path():
        acc = jnp.zeros((_TB, Pp), jnp.float32)
        for t in wpairs:
            gain = gain_ref[:, t][:, None]
            a = av_ref[:, t][:, None]
            acc = acc + gain * hjert_wing(u_row(t), a)
        wtau_ref[...] = acc
        for t in wpairs:
            dz = dz_ref[:, t][:, None]
            gain = gain_ref[:, t][:, None]
            a = av_ref[:, t][:, None]
            idnu = idnu_ref[:, t][:, None]
            s = pl.multiple_of(wins_ref[i, 2 * t], 128)
            cww = cw_ref[0, pl.ds(s, _W)]
            d0w = d0_ref[t, pl.ds(s, _W)]
            uw = (d0w[None, :] + dz * cww[None, :]) * idnu
            corr = jnp.where(
                uw * uw < win_tmin[t],
                hjert_harris(uw, a) - hjert_wing(uw, a),
                0.0,
            )
            wtau_ref[:, pl.ds(s, _W)] = (
                wtau_ref[:, pl.ds(s, _W)] + gain * corr
            )

    @pl.when(anybad != 0)
    def _full_path():
        # plain full-accuracy Harris, NOT the windowed selection: this path
        # runs for nearly every block of a sampling fit (cube-chord slice
        # proposals are spatially heterogeneous), and the selection costs
        # ~15% extra (wing + where on every lane) for a value difference
        # bounded by the dropped exponential (amp_max e^{-tmin} < 1e-8 in
        # tau -- physically nil; tests/test_windowing.py bounds it).
        acc = jnp.zeros((_TB, Pp), jnp.float32)
        for t in wpairs:
            gain = gain_ref[:, t][:, None]
            a = av_ref[:, t][:, None]
            acc = acc + gain * hjert_harris(u_row(t), a)
        wtau_ref[...] = acc

    tau = wtau_ref[...]
    if len(wpairs) < T:
        # non-windowed transitions (filler/916 regimes) keep their usual
        # branchless full-width evaluation
        tau = tau + _accum_tau(
            dz_ref, gain_ref, av_ref, idnu_ref, d0_ref, cw, _TB, Pp,
            harris, skip=tuple(t in wpairs for t in range(T)),
        )
    _ll_tail(
        tau, data_ref, ivar_ref, innoise_ref, kern_ref, cont_ref,
        chi2_ref, n4_ref, n5_ref, half=half, P=P, Pp=Pp, asymm=asymm,
    )


def window_offsets(dzp, gainp, dnup, zmid, nu0, wingrid, P, win_tmin, Pp):
    """Per-(sample-block, transition) wing-window placement (int32).

    For each sample and windowed transition, the Harris region {u^2 <
    win_tmin} is a contiguous pixel interval because u is monotone along
    the pixel axis (u = ((1 + z) c/lam - nu0)/dnu with c/lam monotone
    decreasing).  Its bounds come from the two frequency thresholds
    (nu0 +/- sqrt(tmin') dnu)/(1 + z) mapped to pixel indices through the
    grid's AFFINE log-frequency fit ``wingrid = [log cw[0], alpha, dev]``
    (models/jax_model.build_consts) -- p = (log cw[0] - log thr)/alpha --
    padded by the fit's max deviation ``dev`` plus 2 pixels, so the window
    is conservative for ANY grid (an exact searchsorted against the c/lam
    table measured 3.7 us/eval on TPU from gather cost; two logs are
    ~free).  The block's window is the union over its _TB samples
    (inactive zero-gain transitions excluded); the returned [start,
    overflow] pair per transition gives the 128-aligned _W-lane slice,
    with overflow set when the union does not fit (the kernel then falls
    back to the full-width selection for that block).

    Returns (Bp/_TB, 2*T) int32.
    """
    Bp, T = dzp.shape
    q0, alpha, dev = wingrid[0], wingrid[1], wingrid[2]
    tm = jnp.sqrt(jnp.asarray(win_tmin, jnp.float32) * 1.002)  # (T,)
    one_z = (1.0 + jnp.asarray(zmid, jnp.float32))[None, :] + dzp  # (Bp, T)
    thr_hi = (nu0[None, :] + tm[None, :] * dnup) / one_z
    thr_lo = (nu0[None, :] - tm[None, :] * dnup) / one_z
    margin = dev + 2.5
    p_lo = (q0 - jnp.log(jnp.maximum(thr_hi, 1e-30))) / alpha - margin
    p_hi = (q0 - jnp.log(jnp.maximum(thr_lo, 1e-30))) / alpha + margin
    p_lo = jnp.floor(p_lo).astype(jnp.int32)
    p_hi = jnp.ceil(p_hi).astype(jnp.int32)
    active = gainp != 0.0
    empty = ~active | (p_hi < 0) | (p_lo > P - 1)
    BIG = jnp.int32(1 << 28)
    p_lo = jnp.where(empty, BIG, p_lo)
    p_hi = jnp.where(empty, -BIG, jnp.minimum(p_hi, P - 1))
    nblk = Bp // _TB
    lo_b = p_lo.reshape(nblk, _TB, T).min(axis=1)
    hi_b = p_hi.reshape(nblk, _TB, T).max(axis=1)
    lo_b = jnp.clip(lo_b, 0, max(P - 1, 0))
    start = jnp.clip((lo_b // 128) * 128, 0, Pp - _W)
    overflow = (hi_b >= start + _W) & (hi_b >= 0)
    out = jnp.stack(
        [start.astype(jnp.int32), overflow.astype(jnp.int32)], axis=-1
    )
    return out.reshape(nblk, 2 * T)


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "harris", "half", "asymm", "win_tmin"),
)
def likelihood_pallas(
    dz, gain, av, dnu, d0, c_over_wave, data, ivar, inv_noise, kern, cont,
    zmid=None, nu0=None, wingrid=None,
    interpret: bool = False, harris: tuple = (), half: int = 0,
    asymm: bool = False, win_tmin: tuple = (),
):
    """Fused chi^2 (+ asymmlike outlier counts) for a batch of samples.

    Parameters: per-sample (B, T) tables as in :func:`voigt_tau_pallas`,
    plus the (P,) ``data`` / ``ivar`` / ``inv_noise`` spectra (inv_noise
    zeroed on invalid pixels), the per-sample normalized LSF kernel
    ``kern`` (B, 2*half+1), and the per-sample continuum ``cont`` (B,).
    Returns (chi2, n4, n5) each of shape (B,); n4/n5 are the >4 / >5 sigma
    positive-residual counts used by the asymmetric likelihood (zeros when
    ``asymm`` is False).

    ``win_tmin``: per-transition wing-window thresholds (StaticSpec
    .win_tmin).  When any is set (requires the (T,) ``zmid``/``nu0``
    per-transition tables), the kernel computes :func:`window_offsets` and
    runs the Harris evaluation only on a _W-lane window per (block,
    transition) -- the dominant speedup of the converged sampling phase,
    where live points cluster and each transition's Harris region is a
    narrow slice of the spectrum.

    Convolution semantics are exactly ``lsf_convolve(mode='same_edge')``
    (the reference's JAX-likelihood path, hires_fitter.py:666-681).
    """
    d0 = jnp.asarray(d0)
    cw = jnp.asarray(c_over_wave)
    B, T = dz.shape
    P = cw.shape[0]
    K = 2 * half + 1
    Bp = -(-B // _TB) * _TB
    windowed = (
        bool(win_tmin)
        and any(v > 0.0 for v in win_tmin)
        and zmid is not None
        and nu0 is not None
        and wingrid is not None
    )
    # One lane-tile spectrum with room for the conv margin (see _ll_kernel).
    Pp = -(-(P + max(half, 1)) // 128) * 128
    # The windowed kernel's _W-lane dynamic slice must fit; degenerate to
    # the plain kernel when the spectrum is not meaningfully wider.
    if windowed and Pp <= _W:
        windowed = False

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
    # variadic: under PrefetchScalarGridSpec the index maps also receive the
    # scalar-prefetch ref
    row = lambda i, *refs: (i, 0)
    full = lambda i, *refs: (0, 0)
    in_specs = [
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
    ]
    operands = [
        dzp, gainp, avp, idnup, d0p, cwp, datap, ivarp, innp, kernp, contp
    ]
    out_specs = [pl.BlockSpec((_TB, 128), row, memory_space=pltpu.VMEM)] * 3
    out_shape = [jax.ShapeDtypeStruct((Bp, 128), jnp.float32)] * 3
    if windowed:
        wins = window_offsets(
            dzp, gainp, pad(dnu, Bp, value=1.0),
            jnp.asarray(zmid, jnp.float32), jnp.asarray(nu0, jnp.float32),
            jnp.asarray(wingrid, jnp.float32), P, win_tmin, Pp,
        )
        kernel = functools.partial(
            _ll_kernel_win, harris=harris, half=half, P=P, Pp=Pp,
            asymm=asymm, win_tmin=win_tmin,
        )
        chi2, n4, n5 = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=[pltpu.VMEM((_TB, Pp), jnp.float32)],
            ),
            interpret=interpret,
        )(wins, *operands)
    else:
        kernel = functools.partial(
            _ll_kernel, harris=harris, half=half, P=P, Pp=Pp, asymm=asymm,
            win_tmin=win_tmin,
        )
        chi2, n4, n5 = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            interpret=interpret,
        )(*operands)
    return chi2[:B, 0], n4[:B, 0], n5[:B, 0]


def pallas_supported() -> bool:
    """True when running on a TPU backend (the kernel also runs anywhere via
    interpret mode, used by tests)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@functools.partial(
    jax.jit, static_argnames=("interpret", "harris", "win_tmin")
)
def voigt_tau_pallas(
    dz, gain, av, dnu, d0, c_over_wave, interpret: bool = False,
    harris: tuple = (), win_tmin: tuple = (),
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
        functools.partial(_tau_kernel, harris=harris, win_tmin=win_tmin),
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
