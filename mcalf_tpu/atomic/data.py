"""Bundled atomic-line database (replaces the reference's linetools dependency).

The reference looks transitions up by name in ``linetools.lists.linelist
.LineList('ISM')`` (/root/reference/mcalf/routines/hires_fitter.py:90-113) and
then overrides three CrII entries with values from R. Cooke's ALIS atomic
database.  This module bundles the same information as plain data: for each
named transition we store

* ``wrest``  -- rest wavelength [Angstrom]
* ``f``      -- oscillator strength (dimensionless)
* ``gamma``  -- damping constant [s^-1]

The CIV doublet values are exact linetools/Morton-2003 values, verified
against the reference's own mock spectra to machine precision (see
BASELINE.md).  The CrII entries carry the reference's ALIS overrides
(hires_fitter.py:102-110) out of the box.  Other entries are Morton (2003)
values as distributed with common fitting codes; for precision work on those
species users can override any line via :func:`register_line` or the
``atomfile`` config option (an extension over the reference).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Iterable, List


@dataclass(frozen=True)
class LineData:
    """Atomic data for one transition (cf. linetools dict fields
    ``wrest``/``f``/``gamma`` used at hires_fitter.py:534-541)."""

    name: str
    wrest: float  # Angstrom
    f: float      # oscillator strength
    gamma: float  # s^-1

    def replace(self, **kw) -> "LineData":
        d = dict(name=self.name, wrest=self.wrest, f=self.f, gamma=self.gamma)
        d.update(kw)
        return LineData(**d)


def _L(name, wrest, f, gamma):
    return (name, LineData(name, float(wrest), float(f), float(gamma)))


# name -> LineData.  Names use the linetools "ION wrest" convention so that
# configs written for the reference work unchanged.
_LINES: Dict[str, LineData] = dict(
    [
        # --- Hydrogen Lyman series (Morton 2003) ---
        _L("HI 1215", 1215.6700, 0.416400, 6.265e8),
        _L("HI 1025", 1025.7222, 0.079120, 1.897e8),
        _L("HI 972", 972.5368, 0.029000, 8.127e7),
        _L("HI 949", 949.7431, 0.013940, 4.204e7),
        _L("HI 937", 937.8035, 0.007804, 2.450e7),
        _L("HI 930", 930.7483, 0.004817, 1.236e7),
        _L("HI 926", 926.2257, 0.003183, 8.255e6),
        # --- CIV doublet (exact linetools values; BASELINE.md parity) ---
        _L("CIV 1548", 1548.2040, 0.189900, 2.6430e8),
        _L("CIV 1550", 1550.7810, 0.094750, 2.6280e8),
        # --- Carbon ---
        _L("CII 1334", 1334.5323, 0.127800, 2.880e8),
        _L("CII 1036", 1036.3367, 0.118000, 7.380e8),
        _L("CIII 977", 977.0201, 0.757000, 1.767e9),
        # --- Magnesium ---
        _L("MgII 2796", 2796.3520, 0.612300, 2.612e8),
        _L("MgII 2803", 2803.5310, 0.305400, 2.592e8),
        _L("MgI 2852", 2852.9642, 1.810000, 4.950e8),
        # --- Silicon ---
        _L("SiII 1190", 1190.4158, 0.292000, 6.530e8),
        _L("SiII 1193", 1193.2897, 0.582000, 2.690e9),
        _L("SiII 1260", 1260.4221, 1.180000, 2.950e9),
        _L("SiII 1304", 1304.3702, 0.086300, 1.010e9),
        _L("SiII 1526", 1526.7066, 0.127000, 1.130e9),
        _L("SiII 1808", 1808.0129, 0.002080, 2.540e8),
        _L("SiIII 1206", 1206.5000, 1.630000, 2.550e9),
        _L("SiIV 1393", 1393.7550, 0.528000, 8.800e8),
        _L("SiIV 1402", 1402.7700, 0.262000, 8.630e8),
        # --- Oxygen / Nitrogen ---
        _L("OI 1302", 1302.1685, 0.048000, 5.650e8),
        _L("OVI 1031", 1031.9261, 0.132500, 4.149e8),
        _L("OVI 1037", 1037.6167, 0.065800, 4.076e8),
        _L("NV 1238", 1238.8210, 0.156000, 3.400e8),
        _L("NV 1242", 1242.8040, 0.077700, 3.370e8),
        _L("NI 1200", 1200.2233, 0.088490, 4.070e8),
        # --- Iron ---
        _L("FeII 1608", 1608.4511, 0.057700, 2.740e8),
        _L("FeII 2344", 2344.2140, 0.114200, 2.680e8),
        _L("FeII 2374", 2374.4612, 0.031300, 3.090e8),
        _L("FeII 2382", 2382.7650, 0.320000, 3.100e8),
        _L("FeII 2586", 2586.6500, 0.069180, 2.720e8),
        _L("FeII 2600", 2600.1729, 0.238700, 2.700e8),
        # --- Aluminium ---
        _L("AlII 1670", 1670.7886, 1.740000, 1.390e9),
        _L("AlIII 1854", 1854.7164, 0.559000, 5.420e8),
        _L("AlIII 1862", 1862.7895, 0.278000, 5.360e8),
        # --- Chromium: wrest Morton 2003; f/gamma carry the reference's
        # ALIS overrides (hires_fitter.py:102-110) as the *default*. ---
        _L("CrII 2056", 2056.2569, 0.103000, 4.07e8),
        _L("CrII 2062", 2062.2361, 0.075900, 4.06e8),
        _L("CrII 2066", 2066.1640, 0.051200, 4.17e8),
        # --- Zinc (often blended with CrII) ---
        _L("ZnII 2026", 2026.1370, 0.501000, 4.070e8),
        _L("ZnII 2062", 2062.6604, 0.246000, 3.860e8),
        # --- Hydrogen Lyman series continuation (Morton 2003 f-values;
        # gamma extrapolated along the measured A ~ n^-3 series, accurate
        # to a few % -- negligible for these weak high-order lines) ---
        _L("HI 923", 923.1504, 0.002216, 5.79e6),
        _L("HI 920", 920.9631, 0.001605, 4.21e6),
        _L("HI 919", 919.3514, 0.001201, 3.16e6),
        _L("HI 918", 918.1294, 0.000921, 2.43e6),
        _L("HI 917", 917.1806, 0.000723, 1.91e6),
        # --- Deuterium Ly-alpha/beta (isotope-shifted HI; same f/gamma) ---
        _L("DI 1215", 1215.3394, 0.416400, 6.265e8),
        _L("DI 1025", 1025.4433, 0.079120, 1.897e8),
        # --- Excited fine-structure carbon (shares the CII 1334 upper
        # term, hence its damping constant) ---
        _L("CII* 1335", 1335.7077, 0.114900, 2.880e8),
        # --- Nitrogen multiplet companions of NI 1200.22 ---
        _L("NI 1199", 1199.5496, 0.130000, 4.070e8),
        _L("NI 1200.2", 1200.2233, 0.088490, 4.070e8),  # alias of NI 1200
        _L("NI 1200.7", 1200.7098, 0.044230, 4.070e8),
        # --- Sulphur (Morton 2003 f; gamma = two-level A_ul from f, exact
        # when the upper level decays only through this channel -- true for
        # these resonance triplet members to ~10%) ---
        _L("SII 1250", 1250.5840, 0.005453, 4.65e7),
        _L("SII 1253", 1253.8110, 0.010880, 4.62e7),
        _L("SII 1259", 1259.5190, 0.016240, 4.55e7),
        # --- Manganese resonance triplet ---
        _L("MnII 2576", 2576.8770, 0.350800, 2.74e8),
        _L("MnII 2594", 2594.4990, 0.271000, 2.69e8),
        _L("MnII 2606", 2606.4620, 0.192700, 2.64e8),
        # --- Nickel (strongest UV lines; gamma via the same two-level
        # A_ul estimate) ---
        _L("NiII 1709", 1709.6042, 0.032400, 7.39e7),
        _L("NiII 1741", 1741.5531, 0.042700, 9.39e7),
        _L("NiII 1751", 1751.9157, 0.027700, 6.01e7),
        # --- Titanium (ground-state line redward of the Lyman forest) ---
        _L("TiII 3384", 3384.7301, 0.358000, 1.39e8),
        # --- Magnesium neutral line blended with ZnII 2026 ---
        _L("MgI 2026", 2026.4768, 0.112000, 6.06e7),
        # --- Calcium H & K (vacuum wavelengths) ---
        _L("CaII 3934", 3934.7770, 0.626700, 1.456e8),
        _L("CaII 3969", 3969.5910, 0.311600, 1.414e8),
        # --- Sodium D doublet (vacuum wavelengths) ---
        _L("NaI 5891", 5891.5833, 0.640800, 6.16e7),
        _L("NaI 5897", 5897.5581, 0.319900, 6.14e7),
    ]
)


class LineNotFoundError(KeyError):
    """Raised when a transition name is not in the database (the reference
    prints an error and returns; we raise, hires_fitter.py:97-99)."""


def get_line(name: str) -> LineData:
    """Look one transition up by its linetools-style name, e.g. 'CIV 1548'."""
    key = " ".join(str(name).split())
    try:
        return _LINES[key]
    except KeyError:
        raise LineNotFoundError(
            f"Line {name!r} not found in the bundled atomic database. "
            f"Known lines: {sorted(_LINES)}. Use register_line()/atomfile "
            f"to add custom transitions."
        ) from None


def get_lines(names: Iterable[str]) -> List[LineData]:
    return [get_line(n) for n in names]


def register_line(name: str, wrest: float, f: float, gamma: float) -> LineData:
    """Add or override a transition at runtime (also used by the ``atomfile``
    config extension)."""
    key = " ".join(str(name).split())
    line = LineData(key, float(wrest), float(f), float(gamma))
    _LINES[key] = line
    return line


def load_atomfile(path: str) -> int:
    """Load extra transitions from a whitespace-separated text file with
    columns: ion wave_label wrest f gamma  (e.g. ``CIV 1548 1548.204 0.1899
    2.643e8``).  Lines starting with '#' are comments.  Returns the number of
    transitions registered."""
    count = 0
    with open(path) as fh:
        for raw in fh:
            s = raw.strip()
            if not s or s.startswith("#"):
                continue
            parts = s.split()
            if len(parts) != 5:
                raise ValueError(f"atomfile line not understood: {raw!r}")
            ion, label, wrest, f, gamma = parts
            register_line(f"{ion} {label}", float(wrest), float(f), float(gamma))
            count += 1
    return count


def available_lines() -> List[str]:
    return sorted(_LINES)
