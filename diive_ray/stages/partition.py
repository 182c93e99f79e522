"""Nighttime NEE -> GPP + RECO flux partitioning (Reichstein et al.
2005 "MR" nighttime method, the REddyProc variant; public algorithm:
Reichstein 2005 GCB 11:1424, Wutzler 2018 BG 15:5015, Lloyd & Taylor
1994).

Reference parity anchor:
/root/reference/diive/flux/partitioning/nighttime_reddyproc.py
(constants and window geometry mirror its REddyProc defaults).

Semantics:

1. night = (SW_IN <= 10 W/m2) AND (potential radiation <= 0) using the
   REddyProc solar-time geometry (equation of time + longitude/UTC
   correction).
2. one record-wide temperature sensitivity E0: centered 15-day windows
   stepped 5 days; per window fit Lloyd-Taylor to nighttime NEE vs
   Kelvin temperature, trim the 5/95% signed-residual tails, refit;
   keep the estimate only if its +/-1 SD interval lies inside
   [30, 350] K; average the three lowest-SD estimates (rounded to 2
   decimals). Fewer than three valid windows aborts the whole record
   (REddyProc return code -111 -> everything stays NaN).
3. with E0 fixed, a time-varying reference respiration Rref: centered
   7-day windows stepped 4 days, through-origin OLS slope of night NEE
   on the Lloyd-Taylor factor (negative slopes dropped), placed at the
   window's mean record index and linearly interpolated to every
   record (constant ends).
4. RECO = LloydTaylor(TA_f, Rref, E0); GPP = RECO - NEE_f.

Fitting: the container has no scipy, so instead of 2-parameter
Levenberg-Marquardt this module fits by PROFILED least squares — for
fixed E0 the optimal Rref is the closed-form through-origin slope on
the factor exp(E0*b), so SSE(E0) is a 1-D function minimized by a
coarse grid + golden-section refinement (deterministic, no RNG). When
LM converges to the global optimum both approaches agree; planted
Lloyd-Taylor parameters are recovered to <1 K in tests. E0's standard
deviation comes from the 2-parameter Gauss-Newton covariance at the
optimum (the same quantity scipy derives from cov_x).

Distribution contract: the E0 estimate is a whole-series statistic, so
the engine partitions per series key (site/type) with one keyed
exchange and a per-series kernel — a series group must fit one worker
(a decade of 30-min records is 175k rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

TREF_K = 273.15 + 15.0
T0_K = 227.13
SOLAR_CONST = 1366.1

E0_WINDOW_HALF = 7
E0_STEP = 5
E0_MIN_ENTRIES = 6
E0_TEMP_RANGE = 5.0
E0_TRIM_PERC = 5.0
E0_NUM_BEST = 3
E0_MIN = 30.0
E0_MAX = 350.0
E0_SEARCH_LO = 5.0
E0_SEARCH_HI = 600.0

RREF_WINDOW_HALF = 3
RREF_STEP = 4
RREF_MIN_ENTRIES = 2

DAY_MAX_SW_IN = 10.0


def lloyd_taylor(ta_k: np.ndarray, rref, e0,
                 tref_k: float = TREF_K, t0_k: float = T0_K) -> np.ndarray:
    """Lloyd & Taylor (1994) respiration, Kelvin parameterization."""
    return rref * np.exp(e0 * ((1.0 / (tref_k - t0_k)) - (1.0 / (ta_k - t0_k))))


def potential_radiation(doy: np.ndarray, hour: np.ndarray, lat: float,
                        lon: float, utc_offset: float) -> np.ndarray:
    """Potential clear-sky radiation (W/m2), zero at/below the horizon
    (REddyProc fCalcPotRadiation geometry with exact solar time)."""
    fy = 2.0 * np.pi * (doy - 1.0) / 365.24
    eq_time = (0.0072 * np.cos(fy) - 0.0528 * np.cos(2 * fy)
               - 0.0012 * np.cos(3 * fy) - 0.1229 * np.sin(fy)
               - 0.1565 * np.sin(2 * fy) - 0.0041 * np.sin(3 * fy))
    solar_hour = hour + (lon / 15.0 - utc_offset) + eq_time
    ang = (solar_hour - 12.0) * np.pi / 12.0
    ang = np.where(ang < -np.pi, ang + 2 * np.pi, ang)
    decl = ((0.33281 - 22.984 * np.cos(fy) - 0.3499 * np.cos(2 * fy)
             - 0.1398 * np.cos(3 * fy) + 3.7872 * np.sin(fy)
             + 0.03205 * np.sin(2 * fy) + 0.07187 * np.sin(3 * fy))
            / 180.0 * np.pi)
    lat_r = lat / 180.0 * np.pi
    elev = np.arcsin(np.sin(decl) * np.sin(lat_r)
                     + np.cos(decl) * np.cos(lat_r) * np.cos(ang))
    ext = SOLAR_CONST * (1.00011 + 0.034221 * np.cos(fy) + 0.00128 * np.sin(fy)
                         + 0.000719 * np.cos(2 * fy) + 0.000077 * np.sin(2 * fy))
    return np.where(elev <= 0.0, 0.0, ext * np.sin(elev))


def _profiled_fit(y: np.ndarray, b: np.ndarray) -> tuple[float, float, float, np.ndarray]:
    """Least-squares (rref, e0) for y ~ rref * exp(e0 * b) by profiling:
    rref*(e0) is closed-form, SSE(e0) minimized by grid + golden
    section. Returns (rref, e0, e0_sd, residuals)."""
    def sse_of(e0: float) -> tuple[float, float]:
        f = np.exp(e0 * b)
        denom = float((f * f).sum())
        if denom <= 0 or not np.isfinite(denom):
            return np.inf, 0.0
        rref = float((f * y).sum() / denom)
        r = y - rref * f
        return float((r * r).sum()), rref

    grid = np.linspace(E0_SEARCH_LO, E0_SEARCH_HI, 64)
    sses = np.array([sse_of(g)[0] for g in grid])
    k = int(np.argmin(sses))
    lo = grid[max(k - 1, 0)]
    hi = grid[min(k + 1, len(grid) - 1)]
    # golden-section refine
    invphi = (np.sqrt(5.0) - 1.0) / 2.0
    a, c = float(lo), float(hi)
    x1 = c - invphi * (c - a)
    x2 = a + invphi * (c - a)
    f1, _ = sse_of(x1)
    f2, _ = sse_of(x2)
    for _ in range(60):
        if f1 < f2:
            c, x2, f2 = x2, x1, f1
            x1 = c - invphi * (c - a)
            f1, _ = sse_of(x1)
        else:
            a, x1, f1 = x1, x2, f2
            x2 = a + invphi * (c - a)
            f2, _ = sse_of(x2)
    e0 = (a + c) / 2.0
    sse, rref = sse_of(e0)
    f = np.exp(e0 * b)
    r = y - rref * f

    # Gauss-Newton covariance at the optimum: J = [-f, -rref*f*b]
    n = y.size
    if n > 2 and np.isfinite(sse):
        jtj = np.array([
            [float((f * f).sum()), float(rref * (f * f * b).sum())],
            [float(rref * (f * f * b).sum()), float(rref * rref * (f * f * b * b).sum())],
        ])
        s2 = sse / (n - 2)
        det = jtj[0, 0] * jtj[1, 1] - jtj[0, 1] * jtj[1, 0]
        e0_sd = float(np.sqrt(abs(s2 * jtj[0, 0] / det))) if det != 0 else np.nan
    else:
        e0_sd = np.nan
    return rref, e0, e0_sd, r


def fit_e0_window(nee_night: np.ndarray, ta_k: np.ndarray) -> tuple[float, float] | None:
    """Fit-trim-refit E0 for one window (fOptimSingleE0 semantics):
    full fit, drop signed residuals outside the [5%, 95%] quantiles,
    refit on the kept subset. Returns (e0, e0_sd) or None."""
    b = (1.0 / (TREF_K - T0_K)) - (1.0 / (ta_k - T0_K))
    _, _, _, res = _profiled_fit(nee_night, b)
    lo, hi = np.quantile(res, [E0_TRIM_PERC / 100.0, 1.0 - E0_TRIM_PERC / 100.0])
    keep = (res >= lo) & (res <= hi)
    if keep.sum() < 3:
        return None
    _, e0, e0_sd, _ = _profiled_fit(nee_night[keep], b[keep])
    return float(e0), float(e0_sd)


def _window_slices(day_counter: np.ndarray, half: int, step: int):
    last_day = int(day_counter.max())
    mids = np.arange(half + 1, last_day + 1, step)
    los = np.searchsorted(day_counter, mids - half, side="left")
    his = np.searchsorted(day_counter, mids + half, side="right")
    return los, his


def estimate_e0(nee_night: np.ndarray, ta: np.ndarray,
                day_counter: np.ndarray) -> float:
    """One record-wide E0: per-window fits, +/-SD validity inside
    [30, 350] K, mean of the 3 lowest-SD estimates rounded to 2
    decimals; NaN aborts (fewer than 3 valid windows)."""
    valid_all = ~np.isnan(nee_night) & ~np.isnan(ta)
    ta_k_all = ta + 273.15
    e0s, sds = [], []
    los, his = _window_slices(day_counter, E0_WINDOW_HALF, E0_STEP)
    for lo, hi in zip(los, his):
        m = valid_all[lo:hi]
        if int(m.sum()) <= E0_MIN_ENTRIES:
            continue
        ta_k = ta_k_all[lo:hi][m]
        if (np.max(ta_k) - np.min(ta_k)) < E0_TEMP_RANGE:
            continue
        fit = fit_e0_window(nee_night[lo:hi][m], ta_k)
        if fit is None:
            continue
        e0s.append(fit[0])
        sds.append(fit[1])
    if not e0s:
        return np.nan
    e0s = np.asarray(e0s)
    sds = np.asarray(sds)
    with np.errstate(invalid="ignore"):
        ok = (e0s - sds > E0_MIN) & (e0s + sds < E0_MAX)
    if ok.sum() < E0_NUM_BEST:
        return np.nan
    order = np.argsort(sds[ok])
    return round(float(np.mean(e0s[ok][order[:E0_NUM_BEST]])), 2)


def estimate_rref(nee_night: np.ndarray, ta: np.ndarray,
                  day_counter: np.ndarray, e0: float) -> np.ndarray:
    """Time-varying Rref with E0 fixed: per-window through-origin OLS
    slope on the Lloyd-Taylor factor at the window's mean record index,
    negative slopes dropped, linear interpolation with constant ends."""
    n = nee_night.size
    rref_at = np.full(n, np.nan)
    record_idx = np.arange(1, n + 1)
    valid_all = ~np.isnan(nee_night) & ~np.isnan(ta)
    ta_k_all = ta + 273.15
    los, his = _window_slices(day_counter, RREF_WINDOW_HALF, RREF_STEP)
    for lo, hi in zip(los, his):
        m = valid_all[lo:hi]
        if int(m.sum()) <= RREF_MIN_ENTRIES:
            continue
        mean_h = int(round(float((lo + np.nonzero(m)[0] + 1).mean())))
        factor = lloyd_taylor(ta_k_all[lo:hi][m], 1.0, e0)
        denom = float((factor ** 2).sum())
        if denom <= 0:
            continue
        rref = float((factor * nee_night[lo:hi][m]).sum() / denom)
        if rref < 0:
            continue
        rref_at[mean_h - 1] = rref
    valid = ~np.isnan(rref_at)
    if valid.sum() == 0:
        return rref_at
    if valid.sum() == 1:
        return np.full(n, rref_at[valid][0])
    return np.interp(record_idx, record_idx[valid], rref_at[valid])


def partition_series(
    nee: np.ndarray, ta: np.ndarray, sw_in: np.ndarray,
    nee_f: np.ndarray, ta_f: np.ndarray, doy: np.ndarray, hour: np.ndarray,
    day_counter: np.ndarray,
    *, lat: float, lon: float, utc_offset: float,
) -> dict[str, np.ndarray]:
    """Partition one series: returns NEE_NIGHT / RECO_NT / GPP_NT /
    RREF_NT / E0_NT arrays (all NaN on abort). ``day_counter`` is a
    monotonic elapsed-day index per record — REddyProc's
    ``(1:n) %/% DTS`` on a regular grid; for irregular series derive it
    from the timestamps instead (same window semantics)."""
    n = nee.size
    out = {k: np.full(n, np.nan) for k in
           ("NEE_NIGHT", "RECO_NT", "GPP_NT", "RREF_NT", "E0_NT")}
    potrad = potential_radiation(doy, hour, lat, lon, utc_offset)
    with np.errstate(invalid="ignore"):
        night = (sw_in <= DAY_MAX_SW_IN) & (potrad <= 0.0)
    nee_night = np.where(night & ~np.isnan(nee), nee, np.nan)
    out["NEE_NIGHT"] = nee_night

    e0 = estimate_e0(nee_night, ta, day_counter)
    if not np.isfinite(e0):
        return out
    rref = estimate_rref(nee_night, ta, day_counter, e0)
    reco = lloyd_taylor(ta_f + 273.15, rref, e0)
    out["RECO_NT"] = reco
    out["GPP_NT"] = reco - nee_f
    out["RREF_NT"] = rref
    out["E0_NT"] = np.full(n, e0)
    return out


def partition_distributed(
    ds,
    *,
    key_col: str,
    id_col: str,
    ts_col: str = "ts",
    nee_col: str = "nee",
    ta_col: str = "ta",
    swin_col: str = "sw_in",
    lat: float = 47.0,
    lon: float = 8.0,
    utc_offset: float = 1.0,
    num_partitions: int | None = None,
):
    """One keyed exchange on the series key, per-series kernel; gap-free
    inputs are assumed (NEE_f = NEE, TA_f = TA) — the engine's own
    gap-fillers run upstream when needed."""
    from .exchange import grouped_block_map

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(ts_col, kind="stable").reset_index(drop=True)
        ts = pd.to_datetime(df[ts_col])
        doy = ts.dt.dayofyear.to_numpy(dtype=np.float64)
        hour = (ts.dt.hour + ts.dt.minute / 60.0).to_numpy(dtype=np.float64)
        nee = df[nee_col].to_numpy(dtype=np.float64)
        ta = df[ta_col].to_numpy(dtype=np.float64)
        sw = df[swin_col].to_numpy(dtype=np.float64)
        us = ts.astype("datetime64[us]").astype("int64").to_numpy()
        day_counter = (us - us[0]) // 86_400_000_000 + 1
        res = partition_series(nee, ta, sw, nee, ta, doy, hour, day_counter,
                               lat=lat, lon=lon, utc_offset=utc_offset)
        return pd.DataFrame({
            key_col: df[key_col],
            id_col: df[id_col],
            "reco": res["RECO_NT"],
            "gpp": res["GPP_NT"],
            "rref": res["RREF_NT"],
            "e0": res["E0_NT"],
            "is_night": np.isfinite(res["NEE_NIGHT"]),
        })

    return grouped_block_map(ds, [key_col], kernel, num_partitions=num_partitions)


# -------------------------------------------- daytime light-response (DT)

VPD0 = 10.0  # hPa, VPD limitation onset (Lasslop 2010)


def predict_nep(rg: np.ndarray, vpd: np.ndarray, lt1: np.ndarray,
                alpha: float, beta: float, k: float, rref: float) -> np.ndarray:
    """Lasslop et al. (2010) daytime model: NEP = GPP - RECO with the
    VPD-limited rectangular hyperbola GPP = (Amax*alpha*Rg)/(alpha*Rg +
    Amax), Amax = beta*exp(-k*(VPD-VPD0)) above VPD0; RECO =
    rref * lt1 where ``lt1`` is the unit-Rref Lloyd-Taylor factor
    (E0 fixed from the nighttime pass)."""
    with np.errstate(over="ignore", invalid="ignore"):
        amax = np.where(vpd > VPD0, beta * np.exp(-k * (vpd - VPD0)), beta)
        gpp = (amax * alpha * rg) / (alpha * rg + amax)
    return gpp - rref * lt1


def fit_lrc_window(flux_nep: np.ndarray, rg: np.ndarray, vpd: np.ndarray,
                   ta: np.ndarray, e0: float) -> dict | None:
    """Deterministic profiled fit of (alpha, beta, k, rref) for one
    daytime window (simplified Lasslop: E0 fixed from nighttime, no
    priors/sd weighting — re-derivation, not a port of the reference's
    BFGS+prior machinery; planted parameters recovered in tests).

    For fixed (alpha, beta, k) the optimal rref is the closed-form
    through-origin slope of (GPP - NEP) on the Lloyd-Taylor factor, so
    SSE profiles over a coarse 3-D grid followed by golden-section
    coordinate descent. NEP sign convention: positive = uptake
    (NEP = -NEE)."""
    lt1 = lloyd_taylor(ta + 273.15, 1.0, e0)
    denom_lt = float((lt1 * lt1).sum())
    if len(flux_nep) < 10 or denom_lt <= 0:
        return None

    def sse_of(alpha: float, beta: float, k: float) -> tuple[float, float]:
        with np.errstate(over="ignore", invalid="ignore"):
            amax = np.where(vpd > VPD0, beta * np.exp(-k * (vpd - VPD0)), beta)
            gpp = (amax * alpha * rg) / (alpha * rg + amax)
        rref = float((lt1 * (gpp - flux_nep)).sum() / denom_lt)
        r = flux_nep - (gpp - rref * lt1)
        s = float((r * r).sum())
        return (s if np.isfinite(s) else np.inf), rref

    alphas = np.geomspace(0.001, 0.3, 10)
    betas = np.geomspace(1.0, 60.0, 10)
    ks = np.linspace(0.0, 0.4, 5)
    best = (np.inf, 0.05, 10.0, 0.0)
    for a in alphas:
        for b in betas:
            for kk in ks:
                s, _ = sse_of(a, b, kk)
                if s < best[0]:
                    best = (s, float(a), float(b), float(kk))

    invphi = (np.sqrt(5.0) - 1.0) / 2.0

    def golden(f, lo, hi, iters=40):
        a, c = lo, hi
        x1 = c - invphi * (c - a)
        x2 = a + invphi * (c - a)
        f1, f2 = f(x1), f(x2)
        for _ in range(iters):
            if f1 < f2:
                c, x2, f2 = x2, x1, f1
                x1 = c - invphi * (c - a)
                f1 = f(x1)
            else:
                a, x1, f1 = x1, x2, f2
                x2 = a + invphi * (c - a)
                f2 = f(x2)
        return (a + c) / 2.0

    _, alpha, beta, k = best
    for _ in range(3):  # coordinate-descent sweeps
        alpha = golden(lambda x: sse_of(x, beta, k)[0],
                       alpha / 3.0, alpha * 3.0)
        beta = golden(lambda x: sse_of(alpha, x, k)[0],
                      beta / 3.0, beta * 3.0)
        k = golden(lambda x: sse_of(alpha, beta, x)[0], 0.0, 0.6)
    sse, rref = sse_of(alpha, beta, k)
    return {"alpha": alpha, "beta": beta, "k": k, "rref": rref,
            "sse": sse, "n": int(len(flux_nep))}
