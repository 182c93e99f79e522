"""Seasonal Hybrid ESD anomaly detection (Hochenbaum, Vallis &
Kejariwal 2017, "Automatic Anomaly Detection in the Cloud Via
Statistical Learning" — Twitter's AnomalyDetection S-H-ESD).

Reference parity: completes the outlier family (diive/outliers: hampel,
zscore, localsd, lof, absolute limits) with the seasonal-aware detector
those per-window methods approximate: the reference's screening chain
flags against local stats; S-H-ESD first removes the SEASONAL component
and the series median, then applies the generalized (robust) ESD test
(Rosner 1983) on the residual — so a point that is normal for 3am but
anomalous for 3pm is caught, and up to ``max_anoms`` of the series can
be anomalous without masking (the k-sweep re-computes the median/MAD
after each removal, which plain 3-sigma rules cannot do).

Hybrid = Rosner's test statistic with median/MAD instead of mean/std
(the paper's robustness modification).

Ray shape: ONE keyed exchange co-locates each (key) series (the
engine's standard per-series partitioning contract), then the
decomposition + ESD sweep is vectorized per group — argmax over the
residual per iteration, max_anoms iterations. The series must be the
bounded REGULAR tier output (hourly/daily rollup), so n is
calendar-bounded, not corpus-bounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .decompose import loess_smooth

_MAD_K = 1.4826  # consistency constant for normal data


def periodic_seasonal(y: np.ndarray, period: int, *, n_inner: int = 2) -> np.ndarray:
    """Seasonal component with a PERIODIC seasonal (one constant per
    phase) — the s.window="periodic" STL variant Twitter's
    AnomalyDetection actually calls: iterate {detrend -> per-phase
    mean -> center -> loess trend}. Constant-per-phase seasonal has no
    loess boundary wander, so series edges are treated exactly like
    the interior (loess seasonal inflates edge residuals and floods
    the ESD sweep with boundary artifacts)."""
    n = len(y)
    trend_window = int(np.ceil(1.5 * period)) | 1
    trend = np.full(n, np.median(y))
    seasonal = np.zeros(n)
    for _ in range(max(1, n_inner)):
        detr = y - trend
        for ph in range(period):
            idx = np.arange(ph, n, period)
            seasonal[idx] = detr[idx].mean()
        seasonal = seasonal - seasonal.mean()
        trend = loess_smooth(y - seasonal, trend_window, degree=1)
    return seasonal


def _t_ppf(p: float, df: int) -> float:
    """Student-t quantile via the normal-expansion approximation
    (Cornish-Fisher / Peiser 1943): t = z + (z^3+z)/(4v) +
    (5z^5+16z^3+3z)/(96v^2) + (3z^7+19z^5+17z^3-15z)/(384v^3)
    — scipy-free, <1e-4 absolute error for df >= 5, deterministic."""
    # normal quantile (Acklam's rational approximation)
    z = _norm_ppf(p)
    v = float(df)
    g1 = (z**3 + z) / 4.0
    g2 = (5 * z**5 + 16 * z**3 + 3 * z) / 96.0
    g3 = (3 * z**7 + 19 * z**5 + 17 * z**3 - 15 * z) / 384.0
    g4 = (79 * z**9 + 776 * z**7 + 1482 * z**5 - 1920 * z**3 - 945 * z) / 92160.0
    return float(z + g1 / v + g2 / v**2 + g3 / v**3 + g4 / v**4)


def _norm_ppf(p: float) -> float:
    """Acklam's inverse-normal-CDF rational approximation (~1e-9)."""
    a = [-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00]
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = np.sqrt(-2 * np.log(p))
        return (((((c[0]*q+c[1])*q+c[2])*q+c[3])*q+c[4])*q+c[5]) / \
               ((((d[0]*q+d[1])*q+d[2])*q+d[3])*q+1)
    if p > phigh:
        q = np.sqrt(-2 * np.log(1 - p))
        return -(((((c[0]*q+c[1])*q+c[2])*q+c[3])*q+c[4])*q+c[5]) / \
               ((((d[0]*q+d[1])*q+d[2])*q+d[3])*q+1)
    q = p - 0.5
    r = q * q
    return (((((a[0]*r+a[1])*r+a[2])*r+a[3])*r+a[4])*r+a[5])*q / \
           (((((b[0]*r+b[1])*r+b[2])*r+b[3])*r+b[4])*r+1)


def esd_critical(n: int, k: int, alpha: float) -> float:
    """Rosner's lambda_k: the critical value for the k-th ESD outlier,
    lambda = (n-k) t / sqrt((n-k-1+t^2)(n-k+1)) with
    t = t_ppf(1 - alpha/(2(n-k+1)), n-k-1)."""
    df = n - k - 1
    p = 1.0 - alpha / (2.0 * (n - k + 1))
    t = _t_ppf(p, df)
    return float((n - k) * t / np.sqrt((df + t * t) * (n - k + 1)))


def shesd_frame(
    df: pd.DataFrame,
    value_col: str,
    *,
    period: int,
    max_anoms_frac: float = 0.05,
    alpha: float = 0.05,
    seasonal_window: int = 11,
    one_tail: str | None = None,
) -> pd.DataFrame:
    """S-H-ESD over ONE regular series (sorted on its grid): STL-lite
    seasonal removal, residual = y - seasonal - median(y), then the
    robust generalized ESD sweep: k = 1..max_anoms times remove the
    point with the largest |resid - median| / MAD (recomputing
    median/MAD after each removal) and mark it anomalous iff its test
    statistic exceeds Rosner's lambda_k. Appends ``anomaly`` (0/1) and
    ``anom_rank`` (1-based removal order, 0 if not anomalous).

    ``one_tail``: 'pos' / 'neg' restricts to one-sided anomalies (the
    paper's upper/lower-tail variants); default two-sided.
    ``seasonal_window`` is accepted for API symmetry but unused — the
    seasonal is the paper's periodic variant (see periodic_seasonal)."""
    y = df[value_col].to_numpy(dtype=np.float64)
    resid = y - periodic_seasonal(y, period) - np.median(y)
    n = len(resid)
    max_anoms = max(1, int(np.floor(max_anoms_frac * n)))
    alive = np.ones(n, dtype=bool)
    anom_rank = np.zeros(n, dtype=np.int64)
    n_found = 0
    for k in range(1, max_anoms + 1):
        r = resid[alive]
        med = np.median(r)
        mad = _MAD_K * np.median(np.abs(r - med))
        if mad <= 0:
            break
        if one_tail == "pos":
            dev = r - med
        elif one_tail == "neg":
            dev = med - r
        else:
            dev = np.abs(r - med)
        j_local = int(np.argmax(dev))
        stat = dev[j_local] / mad
        j = int(np.flatnonzero(alive)[j_local])
        alive[j] = False
        if stat > esd_critical(n, k, alpha):
            n_found = k  # Rosner: largest k whose stat exceeds lambda_k
        anom_rank[j] = k
    out = df.copy()
    is_anom = (anom_rank >= 1) & (anom_rank <= n_found)
    out["anomaly"] = is_anom.astype(np.int8)
    out["anom_rank"] = np.where(is_anom, anom_rank, 0)
    return out


def shesd_detect(
    ds,
    *,
    keys: list[str],
    order_by: list[str],
    value_col: str,
    period: int,
    max_anoms_frac: float = 0.05,
    alpha: float = 0.05,
    seasonal_window: int = 11,
    num_partitions: int | None = None,
):
    """Distributed S-H-ESD: ONE keyed exchange, per-series sweep in the
    block (series = bounded tier output; same per-series partitioning
    contract as the other sequential stages)."""
    from .exchange import grouped_block_map

    def gfn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_by, kind="stable", ignore_index=True)
        return shesd_frame(
            g, value_col, period=period, max_anoms_frac=max_anoms_frac,
            alpha=alpha, seasonal_window=seasonal_window)

    return grouped_block_map(ds, keys, gfn, num_partitions=num_partitions)
