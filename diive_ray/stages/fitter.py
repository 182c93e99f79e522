"""BinFitterCP re-derivation: quantile-binned polynomial fit with
confidence / prediction bands, distributed.

Reference: /root/reference/diive/fits/fitter.py:17-255 (BinFitterCP —
pd.qcut the predictor into ``num_bins`` quantile bins, aggregate y per
bin, ``curve_fit`` a linear / quadratic / quadratic-offset / cubic
polynomial over the bin aggregates, then 95% confidence + prediction
bands from the t distribution; the reference's band math follows the
public APMonitor regression-statistics recipe cited in its docstring).

Distributed plan (no scipy, no shuffle):

1. Bin edges = exact distributed order statistics at the qcut ranks —
   the shared 3-pass selection machinery (stages/stratified.py); the
   deterministic (value, id) tie-break makes the bins reproducible and
   SQL-expressible (``ntile(q) OVER (ORDER BY x, id)``).
2. ONE streaming pass emits per-batch per-bin partials (n, sum x,
   sum y); the driver combines (bins are few) into bin means.
3. Polynomial least squares over the bin means is a tiny driver-side
   ``lstsq`` on the Vandermonde matrix (curve_fit with a polynomial
   model IS linear least squares — same optimum, closed form).
4. Band half-widths use the two-sided t quantile, computed by bisecting
   the t CDF expressed through the regularized incomplete beta
   (stages/granger.py:betainc_reg) — no scipy dependency.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .exchange import driver_combine
from .granger import betainc_reg
from .stratified import assign_ntile, exact_ntile_boundaries


def t_sf(t: float, df: float) -> float:
    """Student-t survival P(T > t), via the incomplete beta."""
    x = df / (df + t * t)
    p = 0.5 * betainc_reg(df / 2.0, 0.5, x)
    return p if t >= 0 else 1.0 - p


def t_ppf_two_sided(conf: float, df: float) -> float:
    """Two-sided t critical value: P(|T| <= t*) = conf. Bisection on
    the monotone survival function (|t| in [0, 200])."""
    alpha = (1.0 - conf) / 2.0
    lo, hi = 0.0, 200.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if t_sf(mid, df) > alpha:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def polyfit_closed(x: np.ndarray, y: np.ndarray, degree: int) -> np.ndarray:
    """Least-squares polynomial coefficients (ascending order) via
    lstsq on the Vandermonde matrix — identical optimum to the
    reference's curve_fit with a polynomial model."""
    V = np.vander(x, degree + 1, increasing=True)
    coef, *_ = np.linalg.lstsq(V, y, rcond=None)
    return coef


def fit_bands(
    x: np.ndarray, y: np.ndarray, coef: np.ndarray, px: np.ndarray, conf: float = 0.95
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(fit_y, confband_halfwidth, predband_halfwidth) at the points
    ``px`` — the fitter.py:_predband recipe: s_err from the fit
    residuals, band = t* . s_err . sqrt([0+|1] + 1/n + (px-mean)^2 /
    sum((x-mean)^2))."""
    n, k = len(x), len(coef)
    V = np.vander(x, k, increasing=True)
    resid = y - V @ coef
    dof = max(n - k, 1)
    s_err = float(np.sqrt(np.sum(resid**2) / dof))
    tstar = t_ppf_two_sided(conf, dof)
    xm = float(x.mean())
    sxx = float(np.sum((x - xm) ** 2))
    Pv = np.vander(px, k, increasing=True)
    fit_y = Pv @ coef
    core = 1.0 / n + (px - xm) ** 2 / sxx if sxx > 0 else np.full(len(px), 1.0 / n)
    conf_hw = tstar * s_err * np.sqrt(core)
    pred_hw = tstar * s_err * np.sqrt(1.0 + core)
    return fit_y, conf_hw, pred_hw


def bin_fit(
    ds: rd.Dataset,
    *,
    x_col: str,
    y_col: str,
    id_col: str,
    num_bins: int = 10,
    degree: int = 1,
    conf: float = 0.95,
) -> dict:
    """Distributed BinFitterCP: quantile-bin x, per-bin means, degree-d
    polynomial fit over the bin means, t bands. Returns
    {"bins": DataFrame(bin, n, x_mean, y_mean, fit_y, conf_lo/hi,
    pred_lo/hi), "coef": ascending coefficients}."""
    boundaries = exact_ntile_boundaries(ds, x_col, id_col, num_bins)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[x_col].notna() & df[y_col].notna()]
        if df.empty:
            return pd.DataFrame(
                {"bin": pd.Series([], dtype=np.int64),
                 "n": pd.Series([], dtype=np.int64),
                 "sx": pd.Series([], dtype=np.float64),
                 "sy": pd.Series([], dtype=np.float64)}
            )
        b = assign_ntile(
            df[x_col].to_numpy(dtype=np.float64), df[id_col].to_numpy(), boundaries
        )
        g = pd.DataFrame(
            {"bin": b, "x": df[x_col].to_numpy(dtype=np.float64),
             "y": df[y_col].to_numpy(dtype=np.float64)}
        ).groupby("bin", sort=False)
        out = g.agg(n=("x", "size"), sx=("x", "sum"), sy=("y", "sum")).reset_index()
        out["n"] = out["n"].astype(np.int64)
        return out

    parts = driver_combine(
        ds,
        partial,
        lambda df: df.groupby("bin", as_index=False)[["n", "sx", "sy"]].sum()
        if len(df) else df,
        batch_format="pandas",
    )
    parts = parts.sort_values("bin").reset_index(drop=True)
    xm = parts["sx"].to_numpy() / parts["n"].to_numpy()
    ym = parts["sy"].to_numpy() / parts["n"].to_numpy()
    coef = polyfit_closed(xm, ym, degree)
    fit_y, chw, phw = fit_bands(xm, ym, coef, xm, conf)
    bins = pd.DataFrame(
        {
            "bin": parts["bin"].astype(np.int64),
            "n": parts["n"].astype(np.int64),
            "x_mean": xm,
            "y_mean": ym,
            "fit_y": fit_y,
            "conf_lo": fit_y - chw,
            "conf_hi": fit_y + chw,
            "pred_lo": fit_y - phw,
            "pred_hi": fit_y + phw,
        }
    )
    return {"bins": bins, "coef": coef}
