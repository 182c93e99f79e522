"""Seasonal-trend decomposition — the reference's
``SeasonalTrendDecompositionSTL`` (statsmodels STL, used by
FeatureEngineer stage 6, diive/core/ml/feature_engineer.py) replaced by
a deterministic closed-form **harmonic regression** decomposition
(statsmodels is not in this container; the stage contract is the same:
value -> trend + seasonal + residual columns):

* trend     — centered rolling mean over ``trend_window`` buckets
              (min_periods=1),
* seasonal  — least-squares fit of ``n_harmonics`` sine/cosine pairs of
              the fundamental ``period`` to (value - trend), evaluated
              per row (closed-form normal equations, no iteration),
* residual  — value - trend - seasonal.

Runs per ordered key group (grouped block stage); deterministic, exact,
and reproducible — unlike STL's loess iterations, which is also why the
reference's own tests never pin STL outputs numerically.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
import ray.data

from ..util import ts_to_us


def loess_smooth(
    y: np.ndarray, window: int, degree: int = 1, rho: np.ndarray | None = None
) -> np.ndarray:
    """LOESS (locally weighted linear regression, tricube weights) over
    an evenly spaced series; NaNs are skipped as observations but every
    position gets a smoothed value (Cleveland 1979 — the smoother STL
    is built from). O(n * window), vectorized per point. ``rho`` are
    optional per-sample robustness weights multiplied into the tricube
    neighborhood weights (the STL outer-loop hook, Cleveland et al.
    1990 §2 / statsmodels STL robust=True)."""
    n = len(y)
    window = max(3, min(window | 1, n if n % 2 else n - 1))  # odd, <= n
    half = window // 2
    out = np.full(n, np.nan)
    pos = np.arange(n, dtype=np.float64)
    obs = np.isfinite(y)
    for i in range(n):
        lo = max(0, min(i - half, n - window))
        hi = lo + window
        sel = slice(lo, hi)
        m = obs[sel]
        if m.sum() < degree + 1:
            continue
        xs = pos[sel][m] - i
        ys = y[sel][m]
        dmax = max(np.abs(xs).max(), 1.0)
        w = (1.0 - np.minimum(np.abs(xs) / dmax, 1.0) ** 3) ** 3
        w = np.maximum(w, 1e-6)
        if rho is not None:
            w = w * np.maximum(rho[sel][m], 1e-9)
        if degree == 0:
            out[i] = np.average(ys, weights=w)
        else:
            sw = w.sum()
            sx = (w * xs).sum()
            sxx = (w * xs * xs).sum()
            sy = (w * ys).sum()
            sxy = (w * xs * ys).sum()
            det = sw * sxx - sx * sx
            out[i] = (sxx * sy - sx * sxy) / det if abs(det) > 1e-12 else sy / sw
    return out


def stl_decompose_frame(
    df: pd.DataFrame,
    value_col: str,
    *,
    period: int,
    seasonal_window: int = 7,
    trend_window: int | None = None,
    n_inner: int = 2,
    robust: bool = False,
    n_outer: int = 10,
    weights: np.ndarray | None = None,
) -> pd.DataFrame:
    """STL-lite seasonal-trend decomposition (the loess upgrade over
    the harmonic stand-in; reference uses statsmodels STL in
    SeasonalTrendDecompositionSTL / feature_engineer.py stage 6).

    Classic STL inner loop (Cleveland et al. 1990, re-derived):
      1. detrend: y - trend
      2. cycle-subseries smoothing: loess over each phase's subseries
         (seasonal_window points of the same phase)
      3. seasonal = smoothed subseries re-interleaved, de-meaned by a
         loess low-pass so seasonal sums to ~0 locally
      4. trend = loess(y - seasonal, trend_window)
    repeated n_inner times. Deterministic (no randomness).

    ``robust=True`` adds the STL OUTER loop (Cleveland 1990 §2;
    statsmodels STL robust=True): after each inner pass, residuals
    r = y - trend - seasonal set bisquare robustness weights
    rho = (1 - (|r| / (6 * median|r|))^2)^2 (0 beyond), which damp
    outliers in the cycle-subseries and trend smoothers on the next
    pass — ``n_outer`` passes (statsmodels caps at 15; inner work per
    pass is unchanged). The robust=False path is bit-identical to the
    pre-robustness implementation.

    ``weights``: optional per-sample QUALITY weights in [0, 1]
    (reference core/times/decomposition_utils.py:318-364
    ``quality_weighted_decompose`` — quality flags enter the FIT, not
    a pre-filter: low-quality samples keep their rows but lose
    influence on the trend/seasonal smoothers). They seed the loess
    robustness weights and, under ``robust=True``, multiply into each
    outer pass's bisquare weights. ``weights=None`` is bit-identical
    to the unweighted implementation.

    Input must be ONE series sorted on its regular grid. Appends
    trend/seasonal/resid columns.
    """
    y = df[value_col].astype(float).to_numpy()
    n = len(y)
    if trend_window is None:
        # STL default-ish: smallest odd >= 1.5*period/(1-1.5/seasonal_window)
        trend_window = int(np.ceil(1.5 * period / (1 - 1.5 / max(seasonal_window, 3))))
        trend_window += 1 - trend_window % 2
    trend = np.zeros(n)
    seasonal = np.zeros(n)
    qual = None if weights is None else np.clip(
        np.asarray(weights, dtype=np.float64), 0.0, 1.0)
    rho: np.ndarray | None = qual

    def inner_pass() -> None:
        nonlocal trend, seasonal
        for _ in range(max(1, n_inner)):
            detr = y - trend
            # 2) per-phase loess over each cycle-subseries
            for ph in range(period):
                idx = np.arange(ph, n, period)
                sub = detr[idx]
                seasonal[idx] = loess_smooth(
                    sub, seasonal_window, degree=1,
                    rho=None if rho is None else rho[idx],
                )
            # 3) low-pass the seasonal and remove it (centers the seasonal)
            lp = loess_smooth(seasonal, trend_window, degree=1)
            seasonal = seasonal - lp
            # 4) trend from the deseasonalized series
            trend = loess_smooth(y - seasonal, trend_window, degree=1, rho=rho)

    inner_pass()
    if robust:
        for _ in range(max(0, n_outer)):
            r = y - trend - seasonal
            absr = np.abs(r)
            h = 6.0 * np.nanmedian(absr)
            if not np.isfinite(h) or h <= 0:
                break
            u = np.clip(np.nan_to_num(absr / h, nan=1.0), 0.0, 1.0)
            rho = (1.0 - u * u) ** 2
            if qual is not None:
                rho = rho * qual
            inner_pass()
    out = df.copy()
    out[f"{value_col}_trend"] = trend
    out[f"{value_col}_seasonal"] = seasonal
    out[f"{value_col}_resid"] = y - trend - seasonal
    return out


def stl_decompose(
    ds: ray.data.Dataset,
    *,
    value_col: str,
    keys: Iterable[str] = ("event_type",),
    ts_col: str = "bucket_ts",
    period: int = 24,
    seasonal_window: int = 7,
    trend_window: int | None = None,
    robust: bool = False,
    n_outer: int = 10,
) -> ray.data.Dataset:
    """Per-key STL-lite decomposition (grouped block stage; same
    partitioning contract as harmonic_decompose)."""
    keys = list(keys)

    def gfn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(ts_col, kind="stable").reset_index(drop=True)
        return stl_decompose_frame(
            df, value_col, period=period,
            seasonal_window=seasonal_window, trend_window=trend_window,
            robust=robust, n_outer=n_outer,
        )

    from .exchange import grouped_block_map

    return grouped_block_map(ds, keys, gfn)


def harmonic_k1_fit(ts_us: np.ndarray, y: np.ndarray, period_s: int = 86_400) -> tuple[float, float, float]:
    """Single-harmonic (k=1) least-squares fit y ~ b0 + bs*sin + bc*cos
    of the given period, via the closed-form centered 2-regressor
    normal equations — the SAME covariance algebra an independent SQL
    oracle evaluates with covar_pop sums, so engine and oracle agree to
    summation-order ulps. Returns (b0, bs, bc)."""
    t = np.asarray(ts_us, dtype=np.int64) // 1_000_000
    phase = 2.0 * np.pi * ((t % period_s) / float(period_s))
    s, c = np.sin(phase), np.cos(phase)
    y = np.asarray(y, dtype=np.float64)
    cy, cs, cc = y - y.mean(), s - s.mean(), c - c.mean()
    sys_, syc = float(cy @ cs), float(cy @ cc)
    sss, scc, ssc = float(cs @ cs), float(cc @ cc), float(cs @ cc)
    det = sss * scc - ssc * ssc
    bs = (sys_ * scc - syc * ssc) / det
    bc = (syc * sss - sys_ * ssc) / det
    b0 = y.mean() - bs * s.mean() - bc * c.mean()
    return b0, bs, bc


def harmonic_decompose_frame(
    df: pd.DataFrame,
    value_col: str,
    *,
    ts_col: str = "ts",
    period_us: int,
    n_harmonics: int = 2,
    trend_window: int = 0,
) -> pd.DataFrame:
    """One ordered key frame -> + trend/seasonal/resid columns.
    ``trend_window`` 0 disables the trend (flat mean)."""
    s = df[value_col].astype(float)
    if trend_window and trend_window > 1:
        trend = s.rolling(window=trend_window, center=True, min_periods=1).mean()
    else:
        trend = pd.Series(np.full(len(s), s.mean()), index=s.index)
    detrended = (s - trend).to_numpy()
    us = ts_to_us(df[ts_col]).astype(np.float64)
    phase = 2.0 * np.pi * (us % period_us) / period_us
    cols = []
    for h in range(1, n_harmonics + 1):
        cols.append(np.sin(h * phase))
        cols.append(np.cos(h * phase))
    X = np.column_stack(cols)
    obs = ~np.isnan(detrended)
    if obs.sum() >= X.shape[1]:
        A = X[obs].T @ X[obs] + 1e-9 * np.eye(X.shape[1])
        coef = np.linalg.solve(A, X[obs].T @ detrended[obs])
        seasonal = X @ coef
    else:
        seasonal = np.zeros(len(s))
    out = df.copy()
    out[f"{value_col}_trend"] = trend.to_numpy()
    out[f"{value_col}_seasonal"] = seasonal
    out[f"{value_col}_resid"] = s.to_numpy() - trend.to_numpy() - seasonal
    return out


def harmonic_decompose(
    ds: ray.data.Dataset,
    *,
    value_col: str,
    keys: Iterable[str] = ("source",),
    ts_col: str = "ts",
    period_us: int,
    n_harmonics: int = 2,
    trend_window: int = 0,
) -> ray.data.Dataset:
    keys = list(keys)

    def gfn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(ts_col, kind="stable").reset_index(drop=True)
        return harmonic_decompose_frame(
            df, value_col, ts_col=ts_col, period_us=period_us,
            n_harmonics=n_harmonics, trend_window=trend_window,
        )

    from .exchange import grouped_block_map

    return grouped_block_map(ds, keys, gfn)


def holt_winters_frame(
    y: np.ndarray,
    *,
    period: int,
    alpha: float = 0.3,
    beta: float = 0.05,
    gamma: float = 0.2,
    horizon: int = 0,
) -> dict:
    """Additive Holt-Winters triple exponential smoothing (Holt 1957,
    Winters 1960) over ONE regular series: classical recursions
        level_t = alpha (y_t - seas_{t-p}) + (1-alpha)(level + trend)
        trend_t = beta (level_t - level_{t-1}) + (1-beta) trend
        seas_t  = gamma (y_t - level_t) + (1-gamma) seas_{t-p}
    with the standard initialization (level = mean of the first
    season, trend = per-step difference of the first two season means,
    seasonal = first-season deviations from its mean). One-step-ahead
    fitted values and an optional ``horizon``-step forecast
    level + h*trend + seas[(t+h) mod p]. Sequential by definition —
    runs per bounded tier series inside its block (the engine's
    per-series contract); deterministic."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    p = int(period)
    if n < 2 * p:
        raise ValueError(f"need >= 2 periods ({2*p}), got {n}")
    m1 = y[:p].mean()
    m2 = y[p:2*p].mean()
    level = m1
    trend = (m2 - m1) / p
    seas = list(y[:p] - m1)
    fitted = np.full(n, np.nan)
    for t in range(p, n):
        sprev = seas[t - p]
        fitted[t] = level + trend + sprev
        newlevel = alpha * (y[t] - sprev) + (1 - alpha) * (level + trend)
        trend = beta * (newlevel - level) + (1 - beta) * trend
        level = newlevel
        seas.append(gamma * (y[t] - level) + (1 - gamma) * sprev)
    # forecast: the last p seasonal states cycle forward
    fc = np.array([
        level + (h + 1) * trend + seas[n - p + (h % p)]
        for h in range(horizon)
    ]) if horizon else np.empty(0)
    return {"fitted": fitted, "level": level, "trend": trend,
            "seasonal_tail": np.asarray(seas[-p:]), "forecast": fc}


# -------------------------------------------- classical decomposition


def classical_decompose_frame(
    df: pd.DataFrame,
    *,
    key: str,
    ts_col: str,
    val_col: str,
    period: int = 24,
) -> pd.DataFrame:
    """Classical additive seasonal decomposition (reference
    core/times/decomposition_utils.py:160-211 ``classical_decompose``,
    which wraps statsmodels ``seasonal_decompose``; statsmodels is not
    in this container, so the exact positional semantics are
    re-derived):

    * trend — centered moving average; for even ``period`` p the
      2xp MA, i.e. the (p+1)-tap filter [0.5, 1, ..., 1, 0.5]/p, with
      the first and last p//2 positions undefined (the reference's
      TypeError fallback path runs WITHOUT trend extrapolation, so
      edges stay NaN — decomposition_utils.py:195-199),
    * seasonal — per-phase mean of (value - trend) where phase is the
      POSITION within the series modulo p (statsmodels convention),
      centered by subtracting the mean of the p phase means,
    * residual — value - trend - seasonal,
    * recon — trend + seasonal + residual (the ``additive`` branch of
      ``reconstruct_from_components``, decomposition_utils.py:366-424;
      NaN wherever trend is NaN, matching its trend-NaN propagation).

    Runs per key over the BOUNDED rollup-tier series (rows = buckets,
    calendar-bounded) after the distributed cascade — the same shape as
    every trend/ACF analysis in this engine; nothing here is
    corpus-sized. Expression order is shared verbatim with the SQL
    oracle (positional ROW_NUMBER window replay)."""
    if period % 2:
        raise NotImplementedError("even period only (2xp MA)")
    half = period // 2
    parts: list[pd.DataFrame] = []
    for k, g in df.groupby(key, sort=True):
        g = g.sort_values(ts_col, ignore_index=True)
        y = g[val_col].to_numpy(dtype=np.float64)
        n = len(y)
        trend = np.full(n, np.nan)
        if n >= period + 1:
            # (sum of the 25-row window - 0.5*first - 0.5*last) / period,
            # the exact arithmetic the SQL window replay uses
            csum = np.concatenate(([0.0], np.cumsum(y)))
            s = csum[period + 1:] - csum[:-(period + 1)]
            trend[half:n - half] = (
                s - 0.5 * y[:n - period] - 0.5 * y[period:]
            ) / period
        phase = np.arange(n) % period
        detr = y - trend
        ok = np.isfinite(trend)
        pm = np.full(period, np.nan)
        for ph in range(period):
            sel = ok & (phase == ph)
            if sel.any():
                pm[ph] = detr[sel].mean()
        pm = pm - np.nanmean(pm)
        seasonal = pm[phase]
        resid = y - trend - seasonal
        recon = trend + seasonal + resid
        parts.append(pd.DataFrame({
            key: k,
            ts_col: g[ts_col],
            val_col: y,
            "trend": trend,
            "seasonal": seasonal,
            "resid": resid,
            "recon": recon,
        }))
    if not parts:
        return pd.DataFrame(columns=[key, ts_col, val_col, "trend",
                                     "seasonal", "resid", "recon"])
    return pd.concat(parts, ignore_index=True)


def detect_seasonality_frame(
    df: pd.DataFrame,
    *,
    key: str,
    ts_col: str,
    val_col: str,
    max_period: int = 730,
    top_n: int = 5,
) -> pd.DataFrame:
    """Dominant-period detection via the periodogram (reference
    core/times/decomposition_utils.py:425-531 ``detect_seasonality``):
    linear detrend (least-squares line over positions — the
    scipy.signal.detrend(type='linear') semantics), rFFT power
    spectrum, candidate periods round(1/f) limited to
    [2, min(max_period, n//2)], peaks = strict local maxima of the
    power-by-period sequence (scipy find_peaks default), primary =
    highest-power peak, secondaries = next ``top_n - 1``, strength =
    sum of peak power / total candidate power clamped to [0, 1]; the
    reference's no-peak fallback (global max, no secondaries) and the
    365/[7,30] no-candidate fallback are reproduced.

    Per-key over the bounded tier series; FFT cost is
    O(buckets log buckets) per key inside the block."""
    rows = []
    for k, g in df.groupby(key, sort=True):
        g = g.sort_values(ts_col, ignore_index=True)
        y = g[val_col].to_numpy(dtype=np.float64)
        y = y[np.isfinite(y)]
        n = len(y)
        mp = min(max_period, n // 2)
        # linear detrend: subtract the OLS line over positions 0..n-1
        t = np.arange(n, dtype=np.float64)
        tm, ym = t.mean(), y.mean()
        slope = ((t - tm) * (y - ym)).sum() / ((t - tm) ** 2).sum()
        yd = y - (ym + slope * (t - tm))
        power = np.abs(np.fft.rfft(yd)) ** 2
        freqs = np.fft.rfftfreq(n)
        periods, pw = [], []
        for i in range(1, len(freqs)):
            f = freqs[i]
            if f > 0:
                per = 1.0 / f
                if 2 <= per <= mp:
                    periods.append(int(np.round(per)))
                    pw.append(power[i])
        if not periods:
            rows.append({key: k, "n_obs": n, "primary_period": 365,
                         "secondary_periods": "7,30", "n_peaks": 0,
                         "strength": 0.0})
            continue
        pw_arr = np.asarray(pw)
        # strict local maxima (find_peaks default: greater than both
        # neighbors; endpoints are never peaks)
        interior = (pw_arr[1:-1] > pw_arr[:-2]) & (pw_arr[1:-1] > pw_arr[2:])
        peaks = np.flatnonzero(interior) + 1
        if len(peaks):
            order = peaks[np.argsort(-pw_arr[peaks], kind="stable")]
            primary = periods[order[0]]
            secondary = [periods[i] for i in order[1:top_n]]
            strength = float(pw_arr[peaks].sum() / pw_arr.sum())
        else:
            primary = periods[int(np.argmax(pw_arr))]
            secondary = []
            strength = 0.0
        rows.append({
            key: k,
            "n_obs": n,
            "primary_period": int(primary),
            "secondary_periods": ",".join(str(p) for p in secondary),
            "n_peaks": int(len(peaks)),
            "strength": min(strength, 1.0),
        })
    return pd.DataFrame(rows)


# -------------------------------------------------- singular spectrum


def ssa_decompose(
    y: np.ndarray, *, window: int = 72, rank: int = 6
) -> dict:
    """Singular spectrum analysis (Broomhead & King 1986; Golyandina
    et al. 2001 'Analysis of Time Series Structure'): embed the series
    in the L x K trajectory matrix (lagged windows), eigendecompose
    the L x L lag-covariance S = X X^T, keep the top ``rank``
    eigentriples, and map the rank-r approximation back to a series by
    diagonal (Hankel) averaging. Deterministic (numpy eigh) — no
    iteration.

    Cost is O(n L) to embed + O(L^3) for the eigensolve, with L
    calendar-bounded (a window over the TIER series), so per-key
    blocks stay cheap at any corpus size. Returns dict(recon, resid,
    sv_share: ndarray[rank] — eigenvalue mass of each kept triple)."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    L = int(min(window, max(2, n // 2)))
    K = n - L + 1
    X = np.lib.stride_tricks.sliding_window_view(y, L).T  # L x K
    S = X @ X.T
    w, V = np.linalg.eigh(S)  # ascending
    order = np.argsort(w)[::-1]
    r = int(min(rank, L))
    Vr = V[:, order[:r]]
    Xr = Vr @ (Vr.T @ X)
    # diagonal averaging: z[t] = mean of Xr[i, j] over i + j == t
    sums = np.zeros(n)
    idx = np.arange(L)[:, None] + np.arange(K)[None, :]
    np.add.at(sums, idx.ravel(), Xr.ravel())
    counts = np.minimum(np.minimum(np.arange(n) + 1, n - np.arange(n)), min(L, K))
    recon = sums / counts
    total = w.sum()
    sv_share = w[order[:r]] / total if total > 0 else np.zeros(r)
    return {"recon": recon, "resid": y - recon, "sv_share": sv_share}


# ------------------------------------------------ empirical mode decomposition


def _natural_cubic_eval(xk: np.ndarray, yk: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Natural cubic spline through (xk, yk) evaluated at x — the
    classic tridiagonal second-derivative solve (Thomas algorithm),
    no scipy. xk strictly increasing, len >= 2 (linear for len == 2)."""
    n = len(xk)
    if n == 2:
        t = (x - xk[0]) / (xk[1] - xk[0])
        return yk[0] + t * (yk[1] - yk[0])
    h = np.diff(xk)
    # tridiagonal system for interior second derivatives m[1..n-2]
    a = h[:-1].copy()                    # sub-diagonal
    b = 2.0 * (h[:-1] + h[1:])           # diagonal
    c = h[1:].copy()                     # super-diagonal
    d = 6.0 * (np.diff(yk[1:]) / h[1:] - np.diff(yk[:-1]) / h[:-1])
    # Thomas forward sweep
    for i in range(1, n - 2):
        w = a[i] / b[i - 1]
        b[i] -= w * c[i - 1]
        d[i] -= w * d[i - 1]
    m_int = np.zeros(n - 2)
    m_int[-1] = d[-1] / b[-1]
    for i in range(n - 4, -1, -1):
        m_int[i] = (d[i] - c[i] * m_int[i + 1]) / b[i]
    m = np.concatenate(([0.0], m_int, [0.0]))  # natural ends
    # evaluate piecewise
    seg = np.clip(np.searchsorted(xk, x, side="right") - 1, 0, n - 2)
    hs = h[seg]
    t0 = xk[seg]
    A = (xk[seg + 1] - x) / hs
    B = (x - t0) / hs
    return (A * yk[seg] + B * yk[seg + 1]
            + ((A ** 3 - A) * m[seg] + (B ** 3 - B) * m[seg + 1]) * hs * hs / 6.0)


def _local_extrema(y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Strict interior maxima / minima positions."""
    up = np.flatnonzero((y[1:-1] > y[:-2]) & (y[1:-1] > y[2:])) + 1
    dn = np.flatnonzero((y[1:-1] < y[:-2]) & (y[1:-1] < y[2:])) + 1
    return up, dn


def emd(
    y: np.ndarray, *, max_imfs: int = 6, max_sift: int = 30,
    sd_stop: float = 0.3,
) -> list[np.ndarray]:
    """Empirical mode decomposition (Huang et al. 1998, Proc. R. Soc.
    A): iteratively sift each intrinsic mode function — upper/lower
    natural-cubic envelopes through the local maxima/minima (endpoints
    appended so envelopes span the series), subtract the envelope
    mean, stop a sift at Huang's SD criterion
    sum((h_prev - h)^2 / h_prev^2) < ``sd_stop``; extraction stops
    when fewer than 2 maxima + 2 minima remain (the residual trend).
    Returns [imf_1, imf_2, ..., residual]; sum reconstructs y exactly
    (the defining EMD identity).

    Deterministic (fixed stopping rules, no ensemble noise); runs per
    bounded tier series inside its block. The noise-assisted EEMD
    variant is intentionally out of scope — it would need seeded
    ensemble averaging and breaks exact reconstruction."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    pos = np.arange(n, dtype=np.float64)
    imfs: list[np.ndarray] = []
    resid = y.copy()
    for _ in range(max_imfs):
        up, dn = _local_extrema(resid)
        if len(up) < 2 or len(dn) < 2:
            break
        h = resid.copy()
        for _s in range(max_sift):
            up, dn = _local_extrema(h)
            if len(up) < 2 or len(dn) < 2:
                break
            xu = np.concatenate(([0.0], pos[up], [n - 1.0]))
            yu = np.concatenate(([h[up[0]]], h[up], [h[up[-1]]]))
            xd = np.concatenate(([0.0], pos[dn], [n - 1.0]))
            yd = np.concatenate(([h[dn[0]]], h[dn], [h[dn[-1]]]))
            env_mean = 0.5 * (_natural_cubic_eval(xu, yu, pos)
                              + _natural_cubic_eval(xd, yd, pos))
            h_new = h - env_mean
            denom = (h * h).sum()
            sd = ((h - h_new) ** 2).sum() / denom if denom > 0 else 0.0
            h = h_new
            if sd < sd_stop:
                break
        imfs.append(h)
        resid = resid - h
    imfs.append(resid)
    return imfs
