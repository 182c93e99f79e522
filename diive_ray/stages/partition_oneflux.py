"""ONEFlux-variant nighttime NEE partitioning (Reichstein 2005 as the
ONEFlux pipeline implements it; reference
diive/flux/partitioning/nighttime_oneflux.py:77-394).

What distinguishes this variant from the REddyProc-style one already in
``stages/partition.py``:

* the night flag combines SW_IN < 10 W m-2 with a Linacre (1992)
  true-solar-time sunrise/sunset window (``sunrise_sunset``);
* the fits are residual-TRIMMED (ONEFlux ``nlinlts1``: residuals above
  the rank-percentile cutoff are zeroed) with the idiosyncratic
  ONEFlux rank percentile (``_pct``);
* windowed fits (14-day window, 5-day step, >=6 points, >=5 degC
  temperature range) feed a representative E0 = mean of the <=3
  lowest-SE windows with E0 in (30, 350); a year stays UNPARTITIONED
  unless at least one window's E0 is well-constrained
  (se < 100, se/e0 < 0.5, 50 < e0 < 450);
* Rref is re-estimated with E0 fixed (8-day window, 4-day step,
  closed-form linear coefficient, plus a 95th-percentile
  deviation-trimmed robust twin), linearly interpolated over decimal
  julian day with edge clamping, and RECO/GPP follow from gap-filled
  TA / NEE.

From-scratch deviation (documented): the reference wraps scipy's
Levenberg-Marquardt; this container has no scipy, so the trimmed
(Rref, E0) fit is a fixed-point loop — profile Rref in closed form
given E0 (the model is linear in Rref), line-search E0 by golden
section over (0, 450), re-derive the trim set from the current fit,
repeat until the trim set is stable. Standard errors come from the
Gauss-Newton covariance at the optimum (the same
``s^2 * diag((J^T J)^-1)`` the reference extracts from leastsq).
Planted-parameter recovery and the gate behavior are pytest-pinned.

Ray shape: one exchange on (keys..., year); each year's arrays are
bounded (<= 17 568 half-hours) and every step inside the block is
vectorized except the ~73 windowed fits, each itself vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

TREF = 15.0
T0 = -46.02
STEP_SIZE = 5
WINDOW_SIZE = 14
MIN_ENTRIES = 6
MIN_TRANGE = 5.0
DAY_MIN_SW_IN = 10.0
TRIM_PERC = 10.0
REANALYSE_STEP = 4
REANALYSE_WINDOW = 8


def lloyd_taylor_c(ta_c, rref, e0) -> np.ndarray:
    """Lloyd & Taylor (1994) respiration, Celsius form
    (nighttime_oneflux.py:77-92)."""
    return rref * np.exp(e0 * ((1.0 / (TREF - T0)) - (1.0 / (np.asarray(ta_c) - T0))))


def sunrise_sunset(doy: np.ndarray, lat: float) -> tuple[np.ndarray, np.ndarray]:
    """Linacre 1992 true-solar-time sunrise/sunset decimal hours
    (ONEFlux ``sunrs``; nighttime_oneflux.py:94-121) — note the
    original's truncated pi, kept for parity."""
    pi = 3.1415926
    lat_rad = lat * pi / 180.0
    decl = (23.45 * pi / 180.0) * np.sin((2.0 * pi / 365.0) * (np.asarray(doy) - 80))
    hs = np.arccos(-np.tan(lat_rad) * np.tan(decl))
    hours_per_hs = 24.0 / (2.0 * pi)
    return 12.0 - hs * hours_per_hs, 12.0 + hs * hours_per_hs


def pct_oneflux(array: np.ndarray, percent: float) -> float:
    """ONEFlux's rank percentile (nighttime_oneflux.py:123-146): value
    at the smallest 1-based rank strictly greater than n*percent/100,
    averaged with the preceding rank when the critical rank is an
    integer; the max when no rank exceeds it."""
    nonnan = np.asarray(array)[~np.isnan(np.asarray(array))]
    n = nonnan.size
    if n <= 1:
        raise ValueError("no non-NA values")
    critical = n * percent / 100.0
    if n <= critical:
        return float(np.max(nonnan))
    s = np.sort(nonnan)
    k = int(np.floor(critical)) + 1
    if float(critical).is_integer() and (k - 1) >= 1:
        return float((s[k - 1] + s[k - 2]) / 2.0)
    return float(s[k - 1])


def _profile_rref(y, f, w):
    """Closed-form Rref given E0 (model linear in Rref), weighted by
    the 0/1 trim mask."""
    denom = float((w * f * f).sum())
    return float((w * f * y).sum()) / denom if denom > 0 else np.nan


def _sse_for_e0(e0, y, ta, w):
    f = lloyd_taylor_c(ta, 1.0, e0)
    rref = _profile_rref(y, f, w)
    if not np.isfinite(rref):
        return np.inf, np.nan
    r = y - rref * f
    return float((w * r * r).sum()), rref


def _golden_e0(y, ta, w, lo=0.0, hi=450.0, tol=1e-3):
    """Golden-section minimum of the profiled SSE over E0, seeded by a
    coarse scan (the SSE can be multi-modal on trimmed subsets)."""
    grid = np.linspace(lo, hi, 46)
    sses = [_sse_for_e0(g, y, ta, w)[0] for g in grid]
    i = int(np.argmin(sses))
    a, b = grid[max(0, i - 1)], grid[min(len(grid) - 1, i + 1)]
    phi = (np.sqrt(5.0) - 1.0) / 2.0
    c, d = b - phi * (b - a), a + phi * (b - a)
    fc, fd = _sse_for_e0(c, y, ta, w)[0], _sse_for_e0(d, y, ta, w)[0]
    while abs(b - a) > tol:
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - phi * (b - a)
            fc = _sse_for_e0(c, y, ta, w)[0]
        else:
            a, c, fc = c, d, fd
            d = a + phi * (b - a)
            fd = _sse_for_e0(d, y, ta, w)[0]
    e0 = (a + b) / 2.0
    _, rref = _sse_for_e0(e0, y, ta, w)
    return e0, rref


def fit_lloyd_taylor_trimmed(
    nee_night: np.ndarray, tair: np.ndarray, *, trim_perc: float = TRIM_PERC,
    max_rounds: int = 5,
):
    """Trimmed (Rref, E0) fit — the ONEFlux ``nlinlts1`` counterpart
    (see module docstring for the fixed-point formulation). Returns
    (rref, e0, rref_se, e0_se) or None with too few points."""
    npara = 2
    ok_ta = ~np.isnan(tair)
    if ok_ta.sum() < npara * 3:
        return None
    y = nee_night.copy()
    y[~ok_ta] = np.nan
    ok = ~np.isnan(y)
    if ok.sum() < npara * 3:
        return None
    yv, tav = y[ok], tair[ok]
    w = np.ones(len(yv))
    prev = None
    e0 = rref = np.nan
    for _ in range(max_rounds):
        e0, rref = _golden_e0(yv, tav, w)
        r = yv - lloyd_taylor_c(tav, rref, e0)
        if trim_perc == 0.0:
            break
        cutoff = pct_oneflux(np.abs(r), 100.0 - trim_perc)
        new_w = (np.abs(r) <= cutoff).astype(np.float64)
        key = new_w.tobytes()
        if key == prev:
            break
        prev = key
        w = new_w
    # Gauss-Newton SEs at the optimum, on the reference's 'entries'
    # convention (full series length, trimmed residuals zeroed)
    f = lloyd_taylor_c(tav, 1.0, e0)
    dfde0 = rref * f * ((1.0 / (TREF - T0)) - (1.0 / (tav - T0)))
    J = np.column_stack([f, dfde0]) * w[:, None]
    r = (yv - rref * f) * w
    entries = len(nee_night)
    try:
        cov = np.linalg.inv(J.T @ J)
        s2 = float((r * r).sum()) / (entries - npara)
        se = np.sqrt(np.abs(np.diag(cov * s2)))
    except np.linalg.LinAlgError:
        se = np.array([np.nan, np.nan])
    return float(rref), float(e0), float(se[0]), float(se[1])


def _interp_missing(values: np.ndarray, x: np.ndarray) -> np.ndarray:
    mask = ~np.isnan(values)
    count = mask.sum()
    if count < 2 or count == values.size:
        return values
    return np.interp(x, x[mask], values[mask])


def reanalyse_rref(nee_night, tair, tair_f, julday_dec, e0, *,
                   step: int = REANALYSE_STEP, window: int = REANALYSE_WINDOW):
    """Rref re-estimation with E0 fixed (nighttime_oneflux.py:222-271),
    ordinary + 95th-percentile-deviation-trimmed robust variants."""
    n = len(nee_night)
    rref_ord = np.full(n, np.nan)
    rref_trim = np.full(n, np.nan)
    julday_int = (julday_dec + 0.5).astype(np.int64)
    last_day = int(julday_dec[-1])
    valid = (~np.isnan(tair)) & (~np.isnan(nee_night))
    for j in range(1, last_day, step):
        mask = (julday_int >= j) & (julday_int < (j + window)) & valid
        count = int(mask.sum())
        if count <= 2:
            continue
        idx = np.where(mask)[0]
        mid = int(round(idx.mean()))
        lloyd_fac = lloyd_taylor_c(tair[mask], 1.0, e0)
        nee_sub = nee_night[mask]
        denom = float((lloyd_fac ** 2).sum())
        b = float((lloyd_fac * nee_sub).sum()) / denom if denom > 0 else np.nan
        rref_ord[mid] = b if b > 1e-6 else 1e-6
        deviation = np.abs(nee_sub - nee_sub.mean())
        cutoff = pct_oneflux(deviation, 95.0)
        trim = deviation < cutoff
        if trim.sum() > 0:
            denom_t = float((lloyd_fac[trim] ** 2).sum())
            b_t = (float((lloyd_fac[trim] * nee_sub[trim]).sum()) / denom_t
                   if denom_t > 0 else np.nan)
            rref_trim[mid] = b_t if b_t > 1e-6 else 1e-6
    rref_ord = _interp_missing(rref_ord, julday_dec)
    rref_trim = _interp_missing(rref_trim, julday_dec)
    reco = lloyd_taylor_c(tair_f, rref_ord, e0)
    reco_rob = lloyd_taylor_c(tair_f, rref_trim, e0)
    return reco, reco_rob, rref_ord


def partition_one_year(nee, tair, sw_in, nee_f, tair_f, doy, hr, lat) -> dict:
    """One year's nighttime partitioning (nighttime_oneflux.py:273-392
    orchestration on the from-scratch fitter)."""
    n = len(nee)
    out = {k: np.full(n, np.nan) for k in (
        "nee_night", "reco", "reco_rob", "gpp", "gpp_rob", "rref", "e0")}
    if lat is not None and np.isfinite(lat):
        sunrise, sunset = sunrise_sunset(doy, lat)
        daylight = (hr > sunrise) & (hr < sunset)
    else:
        daylight = np.zeros(n, dtype=bool)
    with np.errstate(invalid="ignore"):
        night = (sw_in < DAY_MIN_SW_IN) & (~daylight)
    nee_night = np.where(night, nee, np.nan)
    out["nee_night"] = nee_night

    full = fit_lloyd_taylor_trimmed(nee_night, tair)
    e0_1 = np.nan if full is None else max(0.0, min(450.0, full[1]))

    julmin, julmax = int(doy[0]), int(np.max(doy))
    win_e0, win_e0_se = [], []
    valid = (~np.isnan(nee_night)) & (~np.isnan(tair))
    for jday in range(julmin, julmax + 1, STEP_SIZE):
        m = (doy >= jday) & (doy < jday + WINDOW_SIZE) & valid
        if int(m.sum()) <= MIN_ENTRIES:
            continue
        if np.max(tair[m]) - np.min(tair[m]) < MIN_TRANGE:
            continue
        fit = fit_lloyd_taylor_trimmed(nee_night[m], tair[m])
        if fit is None:
            continue
        win_e0.append(fit[1])
        win_e0_se.append(fit[3])
    win_e0 = np.asarray(win_e0)
    win_e0_se = np.asarray(win_e0_se)

    best_e0 = np.nan
    if win_e0.size > 0:
        in_range = (win_e0 > 30.0) & (win_e0 < 350.0)
        if in_range.sum() > 1:
            idx_in = np.where(in_range)[0]
            order = np.argsort(win_e0_se[in_range], kind="stable")
            best_e0 = float(np.mean(win_e0[idx_in[order[: min(3, order.size)]]]))
    if not np.isfinite(best_e0):
        best_e0 = e0_1
    if not np.isfinite(best_e0):
        return out
    out["e0"][:] = best_e0

    with np.errstate(invalid="ignore", divide="ignore"):
        well = ((win_e0_se < 100.0) & ((win_e0_se / win_e0) < 0.5)
                & (win_e0 > 50.0) & (win_e0 < 450.0))
    if not well.any():
        return out  # ONEFlux gate: year left unpartitioned

    julday_dec = doy + (hr / 24.0)
    reco, reco_rob, rref_ord = reanalyse_rref(
        nee_night, tair, tair_f, julday_dec, best_e0)
    out["reco"] = reco
    out["reco_rob"] = reco_rob
    out["rref"] = rref_ord
    out["gpp"] = reco - nee_f
    out["gpp_rob"] = reco_rob - nee_f
    return out


def partition_nighttime_oneflux(
    ds: rd.Dataset,
    *,
    keys: list[str],
    lat: float,
    ts_col: str = "ts",
    nee_col: str = "nee",
    ta_col: str = "ta",
    swin_col: str = "sw_in",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Per-(keys, year) ONEFlux nighttime partitioning: ONE exchange;
    NEE_f / TA_f gap-fills default to the measured series (callers
    with model fills pass prefilled columns)."""
    from .exchange import grouped_block_map

    def add_year(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_year"] = pd.to_datetime(df[ts_col]).dt.year.astype(np.int64)
        return df

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="stable")
        ts = pd.to_datetime(g[ts_col])
        res = partition_one_year(
            g[nee_col].to_numpy(dtype=np.float64),
            g[ta_col].to_numpy(dtype=np.float64),
            g[swin_col].to_numpy(dtype=np.float64),
            g[nee_col].to_numpy(dtype=np.float64),
            g[ta_col].to_numpy(dtype=np.float64),
            ts.dt.dayofyear.to_numpy(dtype=np.float64),
            (ts.dt.hour + ts.dt.minute / 60.0).to_numpy(dtype=np.float64),
            lat,
        )
        out = g[keys + ["_year", ts_col]].copy()
        for k, v in res.items():
            out[k] = v
        return out

    return grouped_block_map(
        ds.map_batches(add_year, batch_format="pandas"),
        keys + ["_year"], fn, num_partitions=num_partitions)
