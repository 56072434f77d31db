"""Fused, batched JAX forward model + likelihood (the device compute path).

Replaces the reference's ``get_jax_likelihood`` closure factory
(/root/reference/mcalf/routines/hires_fitter.py:521-695) with a TPU-first
formulation:

* tau synthesis is ONE broadcasted elementwise computation over a flattened
  (component x transition) table -- shape (..., T, P) -- instead of nested
  ``fori_loop``s over components and lines with a per-pixel ``vmap``
  (reference :628-661).  Arbitrary leading batch axes flow through, so the
  same function serves a single parameter vector, a live-point batch, or a
  sharded (sightline x model x live-point) block.
* the Gaussian LSF kernel is rebuilt per call from the (possibly sampled)
  ``specres`` against a static support (reference :666-674) and applied with
  the statically-unrolled convolution in :mod:`mcalf_tpu.ops.convolve`,
  which supports per-sample kernel widths.
* the likelihood constant term  sum(log(2 pi sigma^2))  is precomputed in
  float64 on the host, so only the chi^2 part is accumulated in float32 --
  strictly more accurate than the reference's all-f32 nansum (:689-692).
* the asymmetric-likelihood rejection (reference numpy-only, :296-302; the
  reference jax path silently ignores it -- SURVEY.md section 5.6) is
  implemented on-device here.
* optional Gaussian priors (reference's dead ``Gpriors`` path, :218-234) are
  applied on-device when configured.

The compute core is split into *static structure* (:class:`StaticSpec`,
hashable, part of the jit key) and a *data pytree* (:func:`build_consts`,
plain arrays).  Single-problem use closes over the data
(:func:`make_jax_forward`); multi-sightline use stacks the data with a
leading problem axis and shards it over the device mesh
(:mod:`mcalf_tpu.models.batched`, :mod:`mcalf_tpu.parallel`).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from mcalf_tpu.models.forward import CCGS, TAU_CONST, AbsorptionModel
from mcalf_tpu.ops.convolve import FWHM_TO_SIGMA, gaussian_kernel, lsf_convolve
from mcalf_tpu.ops.faddeeva import (
    HARRIS_A_MAX,
    HJERT_WIN_TMIN,
    hjert,
    hjert_harris,
    hjert_harris_win,
)


@dataclass(frozen=True)
class StaticSpec:
    """Hashable static structure of a fit problem (shapes + flags).

    Two problems can be stacked/sharded together iff their StaticSpec is
    identical."""

    ndim: int
    npix: int
    ntrans: int
    startind: int
    freecont: bool
    freespecres: bool
    half: int
    conv_mode: str
    asymmlike: bool
    has_gpriors: bool
    #: route tau synthesis through the Pallas TPU kernel
    use_pallas: bool = False
    #: run the Pallas kernel in interpret mode (non-TPU backends/tests)
    pallas_interpret: bool = False
    #: per-transition flag: the prior bound on the damping parameter
    #: a = gamma/(4 pi dnu) is below ops.faddeeva.HARRIS_A_MAX, so the
    #: 3-term Harris expansion (one exp + Dawson polynomial, ~1/6 the cost
    #: of the 916 series) is accurate for every sample -- a TRACE-TIME
    #: branch, decided from the static prior bounds, never at runtime.
    harris: tuple = ()
    #: per-transition wing-window threshold on u^2 (0.0 = windowing off):
    #: for u^2 >= win_tmin[t] the Voigt-Hjerting value is taken from the
    #: ~6x-cheaper hjert_wing tail instead of the full Harris evaluation
    #: (ops.faddeeva.hjert_harris_win).  The threshold is derived from the
    #: STATIC prior bound on the tau amplitude so the absolute optical-
    #: depth error of the dropped e^{-u^2} stays < 1e-8 per transition.
    #: Set only for Harris-regime transitions; the fused Pallas kernel
    #: additionally SKIPS the Harris work for whole 256-pixel chunks whose
    #: samples are all in the wing (ops/voigt_pallas window flags).
    win_tmin: tuple = ()


def static_spec(
    model: AbsorptionModel,
    conv_mode: str = "same_edge",
    gpriors: bool = False,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
) -> StaticSpec:
    tab = model.transition_table()
    # Worst-case damping per transition over the prior: a is maximal at the
    # LOWER b bound (a = gamma lambda0 / (4 pi b)).
    b_lo_kms = model.bounds_lo[tab["pidx"] + 2]
    dnu_min = b_lo_kms * 1e5 * (1e8 / tab["wrest"])
    a_max = tab["gamma"] / (4.0 * np.pi * dnu_min)
    harris = a_max < HARRIS_A_MAX
    # Wing-window threshold per transition (hjert_harris_win): require the
    # absolute tau error of the dropped exponential, amp_max * e^{-tmin},
    # below 1e-8, with amp_max the static prior bound on the tau amplitude
    # (N at its upper bound, dnu at its minimum).  Floor at HJERT_WIN_TMIN
    # (the wing polynomial's own validity).  Harris transitions only;
    # MCALF_TPU_WINDOW=0 disables (then every pixel takes the full Harris
    # evaluation, as in rounds 1-3).
    n_max = model.bounds_hi[tab["pidx"]]
    amp_max = TAU_CONST * 10.0 ** n_max * tab["f"] / dnu_min
    tmin = np.maximum(HJERT_WIN_TMIN, np.log(np.maximum(amp_max, 1e-30) * 1e8))
    window_on = os.environ.get("MCALF_TPU_WINDOW", "1") != "0"
    win_tmin = tuple(
        float(tm) if (window_on and h) else 0.0
        for tm, h in zip(tmin, harris)
    )
    return StaticSpec(
        ndim=model.ndim,
        npix=model.npix,
        ntrans=int(tab["pidx"].size),
        startind=model.startind,
        freecont=model.freecont,
        freespecres=model.freespecres,
        half=model.kernel_half_size(),
        conv_mode=conv_mode,
        asymmlike=bool(model.asymmlike),
        has_gpriors=bool(gpriors and model.gpriors is not None),
        use_pallas=bool(use_pallas),
        pallas_interpret=bool(pallas_interpret),
        harris=tuple(bool(v) for v in harris),
        win_tmin=win_tmin,
    )


def build_consts(
    model: AbsorptionModel, gpriors: bool = False, use_pallas: bool = False
) -> Dict[str, Any]:
    """Device-constant data pytree for one fit problem.  All host
    precomputation happens in float64, then casts to f32."""
    tab = model.transition_table()
    c: Dict[str, Any] = {}
    # c / lambda [Hz] precomputed on host: full precision in the static part.
    c["c_over_wave"] = (CCGS / (model.obj_wl / 1e8)).astype(np.float32)     # (P,)
    # Wing-window grid geometry (ops.voigt_pallas.window_offsets): pixel
    # index as an affine function of log(c/lam), fit in f64 on host, plus
    # the grid's max deviation from that fit (a CONSERVATIVE pixel margin
    # -- exact for log-uniform grids, graceful fallback for irregular
    # ones).  [log cw[0], alpha, dev]; searchsorted on TPU measured 3.7
    # us/eval (gathers), this analytic form is ~free.
    q = np.log(np.asarray(c["c_over_wave"], np.float64))
    P = q.size
    alpha = (q[0] - q[-1]) / max(P - 1, 1)
    if alpha > 0:
        p_pred = (q[0] - q) / alpha
        dev = float(np.max(np.abs(np.arange(P) - p_pred)))
    else:  # degenerate / non-monotone grid: windowing disabled downstream
        alpha, dev = 1.0, float(P)
    c["wingrid"] = np.array([q[0], alpha, dev], np.float32)
    c["data"] = model.obj.astype(np.float32)                                # (P,)
    c["valid"] = model.valid                                                # (P,)
    c["ivar"] = np.where(
        model.valid, 1.0 / np.where(model.valid, model.obj_noise, 1.0) ** 2, 0.0
    ).astype(np.float32)
    c["noise"] = np.where(model.valid, model.obj_noise, np.inf).astype(np.float32)
    # 1/noise with invalid pixels zeroed: multiplying residuals by this
    # excludes them from the asymmlike outlier counts (fused-kernel path).
    c["inv_noise"] = np.where(
        model.valid, 1.0 / np.where(model.valid, model.obj_noise, 1.0), 0.0
    ).astype(np.float32)

    # Per-transition tables (layout indices are static, see StaticSpec).
    c["pidx"] = tab["pidx"]                                                 # (T,)
    c["comp_id"] = tab["comp_id"].astype(np.float32)
    c["is_fill"] = tab["is_fill"]
    c["nujk"] = (CCGS / (tab["wrest"] / 1e8)).astype(np.float32)
    c["inv_wrest_cm"] = (1e8 / tab["wrest"]).astype(np.float32)
    c["gamma"] = tab["gamma"].astype(np.float32)
    c["f"] = tab["f"].astype(np.float32)

    # High-precision redshift handling: a redshift stored in f32 quantizes
    # to ~2.4e-7 steps (~1e-5 posterior sigma_z / 40), turning the
    # likelihood into a STEP function of z whose plateaus/ties measurably
    # bias nested sampling (-1.65 +/- 0.10 nats on the 1-comp CIV fit vs a
    # quadrature truth anchor).  Instead the u-argument is assembled as
    #     u * dnu = D0 + dz * (c/lam),
    # with D0 = (1 + zmid) c/lam - nu0 precomputed per (transition, pixel)
    # in float64 on host (zmid = prior midpoint, static) and dz = z - zmid
    # carried at f32 resolution of the PRIOR WIDTH (eps * 0.02 ~ 2.4e-9 in
    # z) by deriving it directly from the unit cube (loglike_cube_core).
    # Residual u error ~ 1e-5 Doppler widths vs ~ 2e-3 for naive f32 z.
    wave_cm64 = np.asarray(model.obj_wl, np.float64) / 1e8
    cw64 = CCGS / wave_cm64                                                 # (P,)
    nu0 = CCGS / (np.asarray(tab["wrest"], np.float64) / 1e8)               # (T,)
    z_lo = np.asarray(model.bounds_lo, np.float64)[tab["pidx"] + 1]
    z_hi = np.asarray(model.bounds_hi, np.float64)[tab["pidx"] + 1]
    zmid = 0.5 * (z_lo + z_hi)
    c["d0"] = ((1.0 + zmid)[:, None] * cw64[None, :] - nu0[:, None]).astype(
        np.float32
    )                                                                       # (T, P)
    c["zmid"] = zmid.astype(np.float32)                                     # (T,)
    c["zspan"] = (z_hi - z_lo).astype(np.float32)                           # (T,)
    c["u_zidx"] = (tab["pidx"] + 1).astype(np.int32)                        # (T,)

    c["contval"] = np.float32(model.contval[0])
    # Reference JAX path uses specres[0] when fixed (:572); the numpy path
    # uses max(specres).  Identical for the 1-element case; the JAX path is
    # the fit parity target.
    c["fixed_specres"] = np.float32(
        model.specres[0] if not model.freespecres else 0.0
    )
    c["velstep"] = np.float32(model.velstep)
    c["const_term"] = np.float32(
        np.sum(
            -np.log(1.0 / model.obj_noise[model.valid] ** 2) + np.log(2.0 * np.pi)
        )
    )
    c["cdf4"] = np.float32(model.gauss_cdf[1])
    c["cdf5"] = np.float32(model.gauss_cdf[2])
    c["grace"] = np.float32(model.gracenum)

    c["lo"] = model.bounds_lo.astype(np.float32)
    c["hi"] = model.bounds_hi.astype(np.float32)

    if gpriors and model.gpriors is not None:
        mu, sig = _parse_gpriors(model.gpriors, model.ndim)
        use = np.isfinite(sig)
        c["gp_mu"] = np.where(use, mu, 0.0).astype(np.float32)
        c["gp_isig2"] = np.where(use, 1.0 / sig**2, 0.0).astype(np.float32)
        c["gp_norm"] = np.float32(
            np.sum(np.where(use, np.log(2.0 * np.pi * sig**2), 0.0))
        )

    return c


# ---------------------------------------------------------------------------
# Pure compute cores: (params, consts, static) -> arrays.
# ---------------------------------------------------------------------------

def _head(p, c, s: StaticSpec):
    specres = p[..., 0] if s.freespecres else c["fixed_specres"]
    if s.freecont:
        cont = p[..., 1] if s.freespecres else p[..., 0]
    else:
        cont = c["contval"]
    return specres, cont


def reconstruct_core(p, c, s: StaticSpec, dz=None):
    """Model flux for physical parameters p of shape (..., ndim).

    ``dz``: optional (..., T) high-precision redshift offsets z - zmid (see
    build_consts); when None they are recovered from ``p`` in f32 (adequate
    for plotting / chi2-at-medians; the sampler path supplies cube-derived
    offsets through :func:`loglike_cube_core`).

    The tau synthesis accumulates over the transition table with a statically
    unrolled loop: each step is elementwise on a (..., P) block, keeping the
    working set VMEM-sized instead of materializing a (..., T, P)
    intermediate (measured 1.4x faster sustained on v5e at batch >= 200, and
    bitwise identical)."""
    p = jnp.asarray(p, jnp.float32)
    specres, cont = _head(p, c, s)
    nact = jnp.floor(p[..., s.startind])                   # (...,)

    pidx = c["pidx"]
    N = p[..., pidx]                                       # (..., T)
    b = p[..., pidx + 2]
    if dz is None:
        dz = p[..., pidx + 1] - c["zmid"]                  # (..., T)

    dnu = b * 1e5 * c["inv_wrest_cm"]                      # (..., T)
    avoigt = c["gamma"] / (4.0 * jnp.pi * dnu)
    amp = TAU_CONST * jnp.power(10.0, N) * c["f"] / dnu    # (..., T)
    active = ((c["comp_id"] < nact[..., None]) | c["is_fill"]).astype(jnp.float32)

    T = int(c["pidx"].shape[0])
    if s.use_pallas:
        from mcalf_tpu.ops.voigt_pallas import voigt_tau_pallas

        batch_shape = p.shape[:-1]
        gain = (active * amp).reshape((-1, T))
        tau = voigt_tau_pallas(
            dz.reshape((-1, T)),
            gain,
            avoigt.reshape((-1, T)),
            dnu.reshape((-1, T)),
            c["d0"],
            c["c_over_wave"],
            interpret=s.pallas_interpret,
            harris=s.harris,
            win_tmin=s.win_tmin,
        ).reshape(batch_shape + (s.npix,))
    else:
        tau = jnp.zeros(p.shape[:-1] + (s.npix,), jnp.float32)
        # Per-(sample, transition) scalars hoisted out of the pixel axis --
        # in particular the reciprocal of dnu, so the per-pixel u costs one
        # fma + one mul instead of a division.
        idnu = 1.0 / dnu
        for t in range(T):
            # u(wave) = (D0 + dz c/wave) * (1/dnu) on a (..., P) block
            u = (
                c["d0"][t] + dz[..., t : t + 1] * c["c_over_wave"]
            ) * idnu[..., t : t + 1]
            # Trace-time choice per transition: windowed Harris (wing tail
            # beyond the static u^2 threshold, see StaticSpec.win_tmin) /
            # plain Harris when the prior bound guarantees small damping
            # (s.harris) / the full 916/asymptotic evaluation otherwise.
            a_t = avoigt[..., t : t + 1]
            if s.win_tmin and s.win_tmin[t] > 0.0:
                H = hjert_harris_win(u, a_t, s.win_tmin[t])
            elif s.harris[t]:
                H = hjert_harris(u, a_t)
            else:
                H = hjert(u, a_t)
            tau = tau + (active[..., t : t + 1] * amp[..., t : t + 1]) * H

    flux_model = jnp.exp(-tau)                             # (..., P)

    if s.half > 0:
        sigma_pix = (specres / FWHM_TO_SIGMA) / c["velstep"]
        kernel = gaussian_kernel(jnp.asarray(sigma_pix, jnp.float32), s.half)
        flux_model = lsf_convolve(flux_model, kernel, mode=s.conv_mode)
    return flux_model * jnp.asarray(cont)[..., None]


def chi2_core(p, c, s: StaticSpec):
    m = reconstruct_core(p, c, s)
    r = c["data"] - m
    return jnp.sum(c["ivar"] * r * r, axis=-1)


def _loglike_pallas(p, c, s: StaticSpec, dz=None):
    """Whole-likelihood fused Pallas path: tau -> exp -> LSF conv -> chi^2
    (+ asymmlike counts) in ONE kernel with no (B, P) HBM intermediates
    (ops.voigt_pallas.likelihood_pallas); only the Gaussian-prior term (a
    (B, ndim) elementwise sum) stays in XLA.  Numerically equivalent to the
    XLA path to f32 roundoff (tests/test_voigt_pallas.py)."""
    from mcalf_tpu.ops.voigt_pallas import likelihood_pallas

    specres, cont = _head(p, c, s)
    nact = jnp.floor(p[..., s.startind])
    pidx = c["pidx"]
    N = p[..., pidx]
    b = p[..., pidx + 2]
    if dz is None:
        dz = p[..., pidx + 1] - c["zmid"]
    dnu = b * 1e5 * c["inv_wrest_cm"]
    avoigt = c["gamma"] / (4.0 * jnp.pi * dnu)
    amp = TAU_CONST * jnp.power(10.0, N) * c["f"] / dnu
    active = ((c["comp_id"] < nact[..., None]) | c["is_fill"]).astype(
        jnp.float32
    )

    batch = p.shape[:-1]
    T = int(pidx.shape[0])
    gain = (active * amp).reshape((-1, T))
    B = gain.shape[0]
    if s.half > 0:
        sigma_pix = (specres / FWHM_TO_SIGMA) / c["velstep"]
        kern = gaussian_kernel(jnp.asarray(sigma_pix, jnp.float32), s.half)
        kern = jnp.broadcast_to(kern, batch + kern.shape[-1:]).reshape(
            (B, 2 * s.half + 1)
        )
    else:
        kern = jnp.ones((B, 1), jnp.float32)
    cont_b = jnp.broadcast_to(jnp.asarray(cont, jnp.float32), batch).reshape(
        (B,)
    )

    chi2, n4, n5 = likelihood_pallas(
        dz.reshape((-1, T)),
        gain,
        avoigt.reshape((-1, T)),
        dnu.reshape((-1, T)),
        c["d0"],
        c["c_over_wave"],
        c["data"],
        c["ivar"],
        c["inv_noise"],
        kern,
        cont_b,
        # per-transition tables + grid geometry for the wing-window placement
        zmid=c["zmid"],
        nu0=CCGS * c["inv_wrest_cm"],
        wingrid=c["wingrid"],
        interpret=s.pallas_interpret,
        harris=s.harris,
        half=s.half,
        asymm=s.asymmlike,
        win_tmin=s.win_tmin,
    )
    chi2 = chi2.reshape(batch)
    ll = -0.5 * (chi2 + c["const_term"])
    if s.asymmlike:
        n4 = n4.reshape(batch)
        n5 = n5.reshape(batch)
        bad = (n5 > c["cdf5"] + c["grace"]) | (n4 > c["cdf4"] + c["grace"])
        ll = jnp.where(bad, -jnp.inf, ll)
    if s.has_gpriors:
        d = p - c["gp_mu"]
        ll = ll - 0.5 * (
            jnp.sum(d * d * c["gp_isig2"], axis=-1) + c["gp_norm"]
        )
    return ll


def loglike_core(p, c, s: StaticSpec, dz=None):
    p = jnp.asarray(p, jnp.float32)
    if s.use_pallas and s.conv_mode == "same_edge":
        return _loglike_pallas(p, c, s, dz=dz)
    m = reconstruct_core(p, c, s, dz=dz)
    r = c["data"] - m
    c2 = jnp.sum(c["ivar"] * r * r, axis=-1)
    ll = -0.5 * (c2 + c["const_term"])
    if s.asymmlike:
        resid = r / c["noise"]
        n5 = jnp.sum((resid > 5.0) & c["valid"], axis=-1)
        n4 = jnp.sum((resid > 4.0) & c["valid"], axis=-1)
        bad = (n5 > c["cdf5"] + c["grace"]) | (n4 > c["cdf4"] + c["grace"])
        ll = jnp.where(bad, -jnp.inf, ll)
    if s.has_gpriors:
        d = p - c["gp_mu"]
        ll = ll - 0.5 * (jnp.sum(d * d * c["gp_isig2"], axis=-1) + c["gp_norm"])
    return ll


def cube_to_params_core(u, c):
    lo, hi = c["lo"], c["hi"]
    return lo + jnp.asarray(u, jnp.float32) * (hi - lo)


def loglike_cube_core(u, c, s: StaticSpec):
    # dz derived straight from the unit cube: resolution eps * zspan
    # (~2.4e-9 in z) instead of the f32 redshift's eps * (1+z) ~ 2.4e-7 --
    # see the d0/zmid note in build_consts.
    u = jnp.asarray(u, jnp.float32)
    dz = (u[..., c["u_zidx"]] - 0.5) * c["zspan"]
    return loglike_core(cube_to_params_core(u, c), c, s, dz=dz)


# ---------------------------------------------------------------------------
# Single-problem convenience bundle.
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class JaxForward:
    """Bundle of jitted device functions for one fit problem.

    All functions accept arbitrary leading batch axes on ``p`` (physical
    parameters, shape (..., ndim)) or ``u`` (unit-cube coordinates).
    """

    ndim: int
    npix: int
    static: StaticSpec
    reconstruct: Callable[[Any], Any]      # p (..., ndim) -> flux (..., P)
    loglike: Callable[[Any], Any]          # p (..., ndim) -> (...)
    cube_to_params: Callable[[Any], Any]   # u (..., ndim) -> p (..., ndim)
    loglike_cube: Callable[[Any], Any]     # u (..., ndim) -> (...)
    chi2: Callable[[Any], Any]             # p (..., ndim) -> (...)
    bounds_lo: Any
    bounds_hi: Any


def resolve_use_pallas(
    model: AbsorptionModel, use_pallas: "str | bool" = "auto"
) -> "tuple[bool, bool]":
    """Resolve the ``use_pallas`` policy for one problem -> (enabled,
    interpret).  'auto' enables the fused kernel ON TPU when the (T, Pp)
    D0 table fits comfortably in VMEM (it must stay resident per grid
    step) and disables it elsewhere; the MCALF_TPU_PALLAS env var
    overrides either way; True forces it (interpret mode off-TPU, for
    tests)."""
    import os

    if use_pallas == "auto":
        env = os.environ.get("MCALF_TPU_PALLAS", "")
        if env != "":
            use_pallas = env not in ("0", "false")
        else:
            from mcalf_tpu.ops.voigt_pallas import pallas_supported

            half = model.kernel_half_size()
            Pp = -(-(model.npix + max(half, 1)) // 128) * 128
            ntrans = int(model.transition_table()["pidx"].size)
            use_pallas = pallas_supported() and ntrans * Pp * 4 <= (8 << 20)
    interpret = False
    if use_pallas:
        from mcalf_tpu.ops.voigt_pallas import pallas_supported

        interpret = not pallas_supported()
    return bool(use_pallas), interpret


def make_jax_forward(
    model: AbsorptionModel,
    conv_mode: str = "same_edge",
    gpriors: bool = False,
    use_pallas: str | bool = "auto",
) -> JaxForward:
    """Build the device forward model for an :class:`AbsorptionModel`.

    ``conv_mode='same_edge'`` reproduces the reference JAX-likelihood
    convolution semantics (parity target for fits); ``'wrap'`` reproduces the
    numpy/plot/mock path on device.

    ``use_pallas``: route the likelihood through the fused Pallas TPU
    kernel (ops/voigt_pallas.likelihood_pallas: tau -> exp -> LSF conv ->
    chi^2 in ONE kernel) and tau synthesis through voigt_tau_pallas.
    'auto' (default) enables it ON TPU when the per-tile constant tables
    fit VMEM -- measured +5-11% over the XLA path at production batches
    (BENCH_r03 pallas_fused_vs_xla) -- and disables it elsewhere
    (interpret mode is for tests only).  MCALF_TPU_PALLAS=0/1 overrides;
    True forces it (interpret mode off-TPU, for tests).
    """
    use_pallas, interpret = resolve_use_pallas(model, use_pallas)
    s = static_spec(
        model,
        conv_mode=conv_mode,
        gpriors=gpriors,
        use_pallas=bool(use_pallas),
        pallas_interpret=interpret,
    )
    c = {
        k: jnp.asarray(v)
        for k, v in build_consts(
            model, gpriors=gpriors, use_pallas=bool(use_pallas)
        ).items()
    }

    return JaxForward(
        ndim=model.ndim,
        npix=model.npix,
        static=s,
        reconstruct=jax.jit(lambda p: reconstruct_core(p, c, s)),
        loglike=jax.jit(lambda p: loglike_core(p, c, s)),
        cube_to_params=jax.jit(lambda u: cube_to_params_core(u, c)),
        loglike_cube=jax.jit(lambda u: loglike_cube_core(u, c, s)),
        chi2=jax.jit(lambda p: chi2_core(p, c, s)),
        bounds_lo=c["lo"],
        bounds_hi=c["hi"],
    )


def _parse_gpriors(gpriors, ndim: int):
    """Parse the reference's Gpriors format: a flat sequence of 2*ndim
    entries alternating (value, sigma), with 'none' marking unconstrained
    dimensions (hires_fitter.py:225-230)."""
    mu = np.zeros(ndim)
    sig = np.full(ndim, np.inf)
    g = list(gpriors)
    if len(g) != 2 * ndim:
        raise ValueError(f"Gpriors must have 2*ndim={2*ndim} entries, got {len(g)}")
    for i in range(ndim):
        v, srr = g[2 * i], g[2 * i + 1]
        if str(v).lower() != "none" and str(srr).lower() != "none":
            mu[i] = float(v)
            sig[i] = float(srr)
    return mu, sig
