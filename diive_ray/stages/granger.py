"""Granger causality — predictive-causality F-test between two series.

The reference (diive/analysis/granger.py:16-136) wraps statsmodels'
``grangercausalitytests`` (ssr F-test); statsmodels is not in this
container, so this is a clean-room implementation of the same
statistic: for each lag p, OLS of y_t on [1, y_{t-1..t-p}] (restricted)
vs [1, y_{t-1..t-p}, x_{t-1..t-p}] (unrestricted),

    F = ((RSS_r - RSS_u) / p) / (RSS_u / (n - 2p - 1)),

with p-value from the F(p, n-2p-1) survival function via the
regularized incomplete beta function (continued-fraction evaluation, a
standard published algorithm). n is the number of usable rows after
lag trimming, matching statsmodels' convention.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _betacf(a: float, b: float, x: float, max_iter: int = 200, eps: float = 3e-14) -> float:
    """Continued fraction for the incomplete beta function (Lentz)."""
    tiny = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, max_iter + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < eps:
            break
    return h


def _gammaln(z: float) -> float:
    """Lanczos log-gamma (published coefficients)."""
    g = 7
    coef = (
        0.99999999999980993, 676.5203681218851, -1259.1392167224028,
        771.32342877765313, -176.61502916214059, 12.507343278686905,
        -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7,
    )
    if z < 0.5:
        return np.log(np.pi / np.sin(np.pi * z)) - _gammaln(1.0 - z)
    z -= 1.0
    x = coef[0]
    for i in range(1, g + 2):
        x += coef[i] / (z + i)
    t = z + g + 0.5
    return 0.5 * np.log(2 * np.pi) + (z + 0.5) * np.log(t) - t + np.log(x)


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (_gammaln(a + b) - _gammaln(a) - _gammaln(b)
                + a * np.log(x) + b * np.log(1.0 - x))
    front = np.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def f_sf(f: float, d1: float, d2: float) -> float:
    """Survival function P(F > f) of the F(d1, d2) distribution."""
    if not np.isfinite(f) or f <= 0:
        return 1.0
    x = d2 / (d2 + d1 * f)
    return betainc_reg(d2 / 2.0, d1 / 2.0, x)


def _ols_rss(X: np.ndarray, y: np.ndarray) -> float:
    coef, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ coef
    return float(resid @ resid)


def granger_lag1_f(x: np.ndarray, y: np.ndarray) -> tuple[float, int, int]:
    """Lag-1 Granger F-statistic (does x Granger-cause y?) via the
    closed-form covariance algebra — the SAME formulas an independent
    SQL oracle can evaluate with covar_pop sums (restricted RSS from
    simple regression on y_{t-1}; unrestricted from the 2-regressor
    normal equations), so engine and oracle agree to summation-order
    ulps rather than lstsq-vs-algebra differences.
    Returns (f_stat, df2, n)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    yv, yl, xl = y[1:], y[:-1], x[:-1]
    n = len(yv)
    cy = yv - yv.mean()
    ca = yl - yl.mean()
    cb = xl - xl.mean()
    syy = float(cy @ cy)
    saa = float(ca @ ca)
    sbb = float(cb @ cb)
    sya = float(cy @ ca)
    syb = float(cy @ cb)
    sab = float(ca @ cb)
    rss_r = syy - sya * sya / saa
    det = saa * sbb - sab * sab
    rss_u = syy - ((sya * sbb - syb * sab) * sya + (syb * saa - sya * sab) * syb) / det
    df2 = n - 3
    f = (rss_r - rss_u) / (rss_u / df2)
    return f, df2, n


def granger_causality(
    x: pd.Series | np.ndarray,
    y: pd.Series | np.ndarray,
    max_lag: int = 5,
) -> pd.DataFrame:
    """Does x Granger-cause y? One row per lag 1..max_lag:
    (lag, f_stat, p_value, df1, df2). NaN rows are dropped pairwise
    first (the reference aligns + dropna the same way)."""
    xv = np.asarray(pd.Series(x), dtype=np.float64)
    yv = np.asarray(pd.Series(y), dtype=np.float64)
    ok = np.isfinite(xv) & np.isfinite(yv)
    xv, yv = xv[ok], yv[ok]
    if len(xv) < max_lag + 2:
        raise ValueError(f"need at least {max_lag + 2} records, got {len(xv)}")
    rows = []
    for p in range(1, max_lag + 1):
        n = len(yv) - p
        Y = yv[p:]
        ylags = np.column_stack([yv[p - j - 1: len(yv) - j - 1] for j in range(p)])
        xlags = np.column_stack([xv[p - j - 1: len(xv) - j - 1] for j in range(p)])
        ones = np.ones((n, 1))
        rss_r = _ols_rss(np.hstack([ones, ylags]), Y)
        rss_u = _ols_rss(np.hstack([ones, ylags, xlags]), Y)
        df2 = n - 2 * p - 1
        f = ((rss_r - rss_u) / p) / (rss_u / df2) if rss_u > 0 and df2 > 0 else np.inf
        rows.append((p, f, f_sf(f, p, df2), p, df2))
    return pd.DataFrame(rows, columns=["lag", "f_stat", "p_value", "df1", "df2"])
