"""Posterior plotting and fit reporting (the reference's ``doplot`` phase,
/root/reference/mcalf/cli.py:331-452).

Reads the chain files back (they are the checkpoint boundary between fit and
analysis, SURVEY.md section 5.4), prints the summary banner (logZ, lnL,
chi^2, AIC, ncomp occurrence fractions) and renders the multi-panel PDF:
data step plot + noise, posterior-draw overlays, per-component dotted
profiles with tick marks at (1+z) * wrest.
"""

from __future__ import annotations

import os
import warnings
from typing import Any, Dict

import numpy as np

from mcalf_tpu.analysis import analyze_chains, ncomp_occurrence
from mcalf_tpu.models import AbsorptionModel
from mcalf_tpu.runner import build_model, chain_basename

__all__ = ["run_plot", "plot_diagnostics"]


def plot_diagnostics(results, ns_config, path: str) -> str:
    """Write the sampler-diagnostics PNG (the reference's jaxns ``--debug``
    writes an equivalent figure, cli.py:288-289): logL(logX) trajectory,
    nlive(logL) from birth contours, and the insertion-rank histogram with
    its KS p-values (mcalf_tpu.sampler.diagnostics).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as pl

    from mcalf_tpu.sampler import insertion_rank_test, merge_results

    cfg = ns_config.resolved()
    fig, axes = pl.subplots(1, 3, figsize=(16, 4.2))

    logw = np.asarray(results.logw, np.float64)
    logl = np.asarray(results.logl, np.float64)
    valid = np.isfinite(logw)
    logl_v = logl[valid]
    order = np.argsort(logl_v)

    # Panel 1: logL vs logX (cumulated prior volume in death order).
    merged = merge_results([results])
    logx = np.cumsum(-1.0 / merged.nlive_at_death)
    axes[0].plot(logx, merged.logl, lw=0.8)
    axes[0].set_xlabel(r"$\ln X$")
    axes[0].set_ylabel(r"$\ln L$")
    axes[0].set_title("likelihood vs prior volume")
    axes[0].invert_xaxis()

    # Panel 2: live-point count along the run (birth-contour bookkeeping).
    axes[1].plot(merged.logl, merged.nlive_at_death, lw=0.8)
    axes[1].set_xlabel(r"$\ln L$")
    axes[1].set_ylabel("live points")
    axes[1].set_title("nlive($\\ln L$)")

    # Panel 3: insertion-rank uniformity (Fowlie et al. 2020).
    diag = insertion_rank_test(results, cfg)
    nbins = 20
    axes[2].hist(
        diag.ranks / max(diag.n_levels - 1, 1),
        bins=nbins,
        density=True,
        alpha=0.75,
    )
    axes[2].axhline(1.0, color="k", ls="--", lw=0.8)
    # bin-count band inflated by the shared-survivor-set factor kappa
    # (see sampler.diagnostics), like the p-values
    se = np.sqrt(diag.kappa * nbins / max(diag.n, 1))
    axes[2].axhspan(1 - 2 * se, 1 + 2 * se, color="k", alpha=0.1)
    axes[2].set_xlabel("insertion rank (normalized)")
    axes[2].set_ylabel("density")
    axes[2].set_title(
        f"rank uniformity: p={diag.p_value:.3f} "
        f"(blocks {diag.p_value_blocks:.3f}, $\\kappa$={diag.kappa:.2f})"
    )

    fig.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, dpi=110)
    pl.close(fig)
    print(f"Diagnostics written at: {path}")
    return path


def run_plot(
    configpars: Dict[str, Any],
    debug: bool = False,
    model: AbsorptionModel | None = None,
) -> str | None:
    """Analyze the chains and write the fit PDF.  Returns the PDF path, or
    None if no chain file exists (reference cli.py:336)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as pl

    pl.rc("text", usetex=False)
    pl.rcParams["font.size"] = 20

    base = chain_basename(configpars)
    print("Analyzing run: " + configpars["chainfmt"].format(""))
    if not os.path.exists(base + "_equal_weights.txt"):
        print(f"No chain file at {base}_equal_weights.txt; nothing to plot.")
        return None

    if model is None:
        model = build_model(configpars, debug=debug)

    lnz, dlnz, lhoodval, values = analyze_chains(
        base, return_sorted=True, nfill=int(model.nfill)
    )

    # Never-active component columns are all-NaN by construction
    # (sort_components); their median is legitimately NaN -- keep the
    # console clean of numpy's warning about it.
    with warnings.catch_warnings():
        warnings.filterwarnings(
            "ignore", message="All-NaN slice encountered"
        )
        meds = np.nanpercentile(values, 50, axis=0)

    if model.freecont:
        continuum = meds[1] if model.freespecres else meds[0]
    else:
        continuum = float(model.contval[0])
    if model.freespecres:
        specresolution = meds[0]
    else:
        specresolution = float(model.specres[0])

    ncomp_arr, ncomp_frac, map_ncomp = ncomp_occurrence(values, model.startind)

    lnlhood = np.percentile(lhoodval, 50)
    AIC = 2 * model.ndim - 2 * lnlhood
    # Columns of never-active components are all-NaN after z-sorting; fill
    # them with the prior midpoint, NOT zero: b=0 gives dnu=0 and the
    # masked tau still evaluates 0*inf = NaN (seen as "Chi2: nan" on the
    # HI-forest banner).  The reference avoids it by looping only active
    # components (cli.py:373 with hires_fitter.py:430); any finite filler
    # value is equivalent here because reconstruct masks comps beyond
    # floor(meds[startind]).
    mid = 0.5 * (model.bounds_lo + model.bounds_hi)
    meds_f = np.where(np.isnan(meds), mid, meds)
    chi2 = model.chi2(meds_f)
    # NOTE: the reference passes (AIC, chi2) into a "(chi2, AIC)" template
    # (cli.py:374), printing each under the other's label -- fixed here.
    statstring = r"$\ln(z): {0:6.3f},~\ln(L): {1:6.3f},~\chi^2: {2:6.3f},~AIC: {3:6.3f}$".format(
        lnz, lnlhood, chi2, AIC
    )

    print("________________________________________________________________")
    print(
        "| Ln(z): {0:6.3f}, Ln(L): {1:6.3f}, Chi2: {2:6.3f}, AIC: {3:6.3f}".format(
            lnz, lnlhood, chi2, AIC
        )
    )
    for cc in range(len(ncomp_arr)):
        print(
            "| Ncomp: {0:02d} Occurrence Fraction: {1:4.3f}".format(
                int(ncomp_arr[cc]), ncomp_frac[cc]
            )
        )
    print("|_______________________________________________________________")

    nmaxcols = int(configpars["nmaxcols"])
    nrows = model.numfitranges // nmaxcols + (
        1 if model.numfitranges % nmaxcols > 0 else 0
    )
    ncols = model.numfitranges if nrows == 1 else nmaxcols

    fig, ax = pl.subplots(
        nrows=int(nrows),
        ncols=int(ncols),
        sharey=True,
        figsize=(10 * ncols, 5.5 * nrows),
        squeeze=False,
    )

    nsamp = min(len(values), 100)
    if nsamp < 100:
        rsamples = np.arange(nsamp)
    else:
        rng = np.random.default_rng(0)
        rsamples = rng.integers(values.shape[0], size=nsamp)

    for waverange in range(model.numfitranges):
        colind = int(waverange % nmaxcols)
        rowind = int(waverange // nmaxcols)
        a = ax[rowind, colind]
        a.step(model.obj_wl, model.obj, color="black", where="mid", lw=1)
        a.plot(model.obj_wl, model.obj_noise, "-b", lw=0.5)
        a.set_xlim(configpars["wavefit"][waverange])
        a.set_ylim(configpars["yrange"])

        # Posterior-draw overlays (NaN-padded inactive dims are safe: the
        # reconstruction only reads the first floor(ncomp) triplets).
        for ii in rsamples:
            tsamp = np.nan_to_num(values[ii, :], nan=0.0)
            tspec = model.reconstruct_spec(tsamp)
            a.plot(
                model.obj_wl,
                tspec,
                color="red",
                alpha=max(1 - 8e-3 * nsamp, 0.05),
                lw=max(2 - 1.7e-2 * nsamp, 0.3),
                rasterized=False,
            )

        # Per-component median profiles + tick marks.
        for i in range(model.ncompmax + model.nfill):
            sl = meds[1 + 3 * i + model.startind : 4 + 3 * i + model.startind]
            if sl.size < 3 or not np.all(np.isfinite(sl)):
                continue
            _N, _z, _b = sl
            if _z < 10 and i <= map_ncomp:
                color = "dodgerblue"
                spec1 = model.reconstruct_onecomp(specresolution, continuum, _N, _z, _b)
                for line in model.lines:
                    w = line.wrest * (1 + _z)
                    a.plot([w, w], [1.06, 1.10], color="blue")
            else:
                color = "salmon"
                spec1 = model.reconstruct_onecomp_fill(
                    specresolution, continuum, _N, _z, _b
                )
                w = model.linefill.wrest * (1 + _z)
                a.plot([w, w], [1.06, 1.10], color="red")
            a.plot(model.obj_wl, spec1, color=color, ls="dotted", lw=0.8, zorder=1)

    fig.tight_layout()
    pl.subplots_adjust(top=0.91)
    pl.text(0.04, 0.93, statstring, ha="left", transform=fig.transFigure)

    os.makedirs(configpars["plotdir"], exist_ok=True)
    pdf = os.path.join(
        configpars["plotdir"],
        configpars["chainfmt"].format(model.nfill) + ".pdf",
    )
    pl.savefig(pdf)
    pl.close(fig)
    print("PDF written at: {}".format(pdf))
    print("End of Job.")
    return pdf
