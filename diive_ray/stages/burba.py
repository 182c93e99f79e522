"""Open-path IRGA self-heating correction (Burba et al. 2008 "BUR08"
surface-energy formulation) with the closed-path scaling-factor
optimization.

Reference parity anchor:
/root/reference/diive/flux/.../selfheating.py (ScopPhysics BUR08 path +
ScopOptimizer). Public method: Burba et al. (2006, 2008) open-path
self-heating corrections; Kittler et al. (2017) eq. 5 aerodynamic
resistance.

Semantics:

* **FCT_UNSC (BUR08)** — sensible heat shed by the instrument's three
  key surfaces, each from a published day/night linear surface-
  temperature relation and a wind-speed-dependent boundary-layer depth:
  top window (spherical detector, radius 0.0225 m), bottom window
  (planar, source housing 0.065 m), spar (cylindrical, radius
  0.0025 m, log-profile conductance, 15% weight). The unscaled flux
  correction is ``FCT_UNSC = (S / (rho_a * c_p)) * (gas_density /
  (TA + 273.15))``.
* **Scaling factor** — per (daytime, USTAR-quantile-bin) the reference
  minimizes ``sum |cumsum(OP + SF*FCT) - cumsum(CP)|`` over SF in
  [0, 50] with a bounded scalar search. That objective is piecewise
  linear and convex in SF: with ``A_k = cumsum(OP - CP)`` and ``B_k =
  cumsum(FCT)`` it equals ``sum_k |A_k + SF*B_k|``, whose exact
  minimizer is the |B_k|-WEIGHTED MEDIAN of the breakpoints
  ``-A_k/B_k`` (clipped to the bounds). This module computes that
  closed form — same minimum the reference's numerical search finds,
  deterministic, scipy-free, and replayable in SQL (cumulative-weight
  window over sorted breakpoints).

Distribution contract: FCT_UNSC is a pure per-record map (vectorized
per batch, no shuffle). The SF optimization needs global USTAR
quantiles per daytime group, so it runs as ONE exchange on the daytime
flag with a per-group kernel (two groups; a group must fit a worker —
the optimizer consumes one campaign's overlap records, bounded by
construction). Quantile bins use the integer rank formula shared with
stages/ustar.py:quantile_bins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

R_TOP = 0.0225     # detector sphere radius (m)
L_TOP = 0.045      # detector housing diameter (m)
L_BOTTOM = 0.065   # source housing diameter (m)
R_SPAR = 0.0025    # spar cylinder radius (m)
L_SPAR = 0.005     # spar diameter (m)
SPAR_WEIGHT = 0.15
SF_LO, SF_HI = 0.0, 50.0
MIN_BIN_N = 10


def air_thermal_conductivity(ta: np.ndarray) -> np.ndarray:
    """Linear approximation, W m-1 K-1 (valid -50..100 degC)."""
    return 0.02425 + 0.00007 * ta


def bur08_sensible_heat(ta: np.ndarray, u: np.ndarray,
                        daytime: np.ndarray) -> np.ndarray:
    """BUR08 bulk sensible heat from the instrument surfaces (W m-2)."""
    k_air = air_thermal_conductivity(ta)
    day = daytime.astype(bool)

    ts_top = np.where(day, 1.005 * ta + 0.24, 1.008 * ta - 0.41)
    sigma_top = 0.0028 * np.sqrt(L_TOP / u) + (0.00025 / u) + 0.0045
    s_top = k_air * ((R_TOP + sigma_top) * (ts_top - ta)) / (R_TOP * sigma_top)

    ts_bottom = np.where(day, 0.944 * ta + 2.57, 0.883 * ta + 2.17)
    sigma_bottom = 0.004 * np.sqrt(L_BOTTOM / u) + 0.004
    s_bottom = k_air * (ts_bottom - ta) / sigma_bottom

    ts_spar = np.where(day, 1.01 * ta + 0.36, 1.01 * ta - 0.17)
    sigma_spar = 0.0058 * np.sqrt(L_SPAR / u)
    s_spar = k_air * (ts_spar - ta) / (R_SPAR * np.log((R_SPAR + sigma_spar) / R_SPAR))

    return s_bottom + s_top + SPAR_WEIGHT * s_spar


def fct_unsc_bur08(ta: np.ndarray, u: np.ndarray, daytime: np.ndarray,
                   gas_density: np.ndarray, rho_a: np.ndarray,
                   c_p: np.ndarray) -> np.ndarray:
    """Unscaled BUR08 flux correction term (umol m-2 s-1)."""
    s = bur08_sensible_heat(ta, u, daytime)
    return (s / (rho_a * c_p)) * (gas_density / (ta + 273.15))


def sf_weighted_median(op: np.ndarray, ref: np.ndarray,
                       fct: np.ndarray) -> float | None:
    """Exact minimizer of ``sum |cumsum(op + sf*fct) - cumsum(ref)|``
    over sf in [SF_LO, SF_HI]: the |B|-weighted lower median of the
    breakpoints -A/B (A = cumsum(op-ref), B = cumsum(fct)); arrays must
    be in chronological order."""
    a = np.cumsum(op - ref)
    b = np.cumsum(fct)
    nz = b != 0.0
    if not nz.any():
        return None
    r = -a[nz] / b[nz]
    w = np.abs(b[nz])
    order = np.argsort(r, kind="stable")
    r, w = r[order], w[order]
    cw = np.cumsum(w)
    half = cw[-1] / 2.0
    k = int(np.searchsorted(cw, half, side="left"))
    sf = float(r[min(k, len(r) - 1)])
    return float(min(SF_HI, max(SF_LO, sf)))


def scop_scaling_factors(
    ds,
    *,
    daytime_col: str = "daytime",
    ustar_col: str = "ustar",
    ts_col: str = "ts",
    op_col: str = "op",
    ref_col: str = "ref",
    fct_col: str = "fct_unsc",
    id_col: str = "event_id",
    n_classes: int = 5,
) -> pd.DataFrame:
    """Per-(daytime, USTAR-quantile-bin) scaling factors: ONE exchange
    on the daytime flag, per-group rank binning + chronological
    weighted-median SF. Returns (daytime, bin, n, sf, ustar_lo,
    ustar_hi)."""
    from .exchange import grouped_block_map
    from .ustar import quantile_bins

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([ustar_col, id_col], kind="stable").reset_index(drop=True)
        total = len(df)
        bins = quantile_bins(np.arange(total), total, n_classes)
        rows = []
        for b in np.unique(bins):
            sub = df[bins == b].sort_values([ts_col, id_col], kind="stable")
            if len(sub) < MIN_BIN_N:
                continue
            sf = sf_weighted_median(
                sub[op_col].to_numpy(dtype=np.float64),
                sub[ref_col].to_numpy(dtype=np.float64),
                sub[fct_col].to_numpy(dtype=np.float64),
            )
            rows.append({
                "daytime": int(df[daytime_col].iloc[0]),
                "bin": int(b),
                "n": len(sub),
                "sf": sf if sf is not None else np.nan,
                "ustar_lo": float(sub[ustar_col].min()),
                "ustar_hi": float(sub[ustar_col].max()),
            })
        return pd.DataFrame(rows)

    out = grouped_block_map(ds, [daytime_col], kernel).to_pandas()
    return out.sort_values(["daytime", "bin"]).reset_index(drop=True)
