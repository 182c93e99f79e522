"""Trend and periodicity analysis over gappy time series.

Three public-literature operators the reference's analysis tier
(diive/analysis: seasonaltrend.py, harmonic.py, correlation.py) implies
but does not ship, completing the trend-analysis family:

* Mann-Kendall trend test + Sen's slope (Mann 1945, Kendall 1975,
  Sen 1968) — THE standard monotone-trend test for environmental /
  flux series (tie-corrected variance, Z statistic, Kendall tau,
  median-of-pairwise-slopes estimator).
* Lomb-Scargle periodogram (Lomb 1976, Scargle 1982) — spectral power
  on UNEVENLY sampled series, i.e. exactly the gap-riddled series the
  reference's screening chain produces; no interpolation needed.
* Multi-lag autocorrelation over a regular bucket grid with
  missing-pair dropping (pairwise-complete, the reference's
  daily_correlation convention, analysis/correlation.py).

Ray shape: every operator reduces to DECOMPOSABLE per-(key[, freq])
sufficient statistics — one vectorized ``map_batches`` partial pass
over the raw events plus a tiny driver combine (rows = keys x freqs,
never data-sized) for Lomb-Scargle, and bounded per-key series (daily /
hourly tier outputs of the distributed rollup cascade) for MK / ACF,
where the O(n^2) pair work is over CALENDAR-bounded n (days), not
corpus-bounded n. Nothing here shuffles and nothing is corpus-sized on
the driver at any scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..util import ts_to_us


# ----------------------------------------------------------- Mann-Kendall


def mann_kendall_sen(y: np.ndarray, t_days: np.ndarray) -> dict:
    """Mann-Kendall S / tie-corrected var / Z / tau plus Sen's slope
    over ONE ordered series (y at day-offsets t_days, strictly
    increasing). Vectorized over the full i<j pair triangle — n is
    calendar-bounded (days), so the O(n^2) triangle is tiny.

    Tie correction (Kendall 1975): var(S) = (n(n-1)(2n+5)
    - sum_k t_k(t_k-1)(2t_k+5)) / 18 over tie groups of y.
    Z uses the +-1 continuity correction; tau is tau-a = S / (n(n-1)/2).
    Sen's slope = median over i<j of (y_j - y_i) / (t_j - t_i).
    """
    n = len(y)
    if n < 2:
        return {"n": n, "s": 0, "var_s": 0.0, "z": 0.0, "tau": 0.0, "sen_slope": np.nan}
    iu, ju = np.triu_indices(n, k=1)
    dy = y[ju] - y[iu]
    s = int(np.sign(dy).sum())
    _, counts = np.unique(y, return_counts=True)
    ties = counts[counts > 1].astype(np.float64)
    var_s = (n * (n - 1) * (2 * n + 5) - np.sum(ties * (ties - 1) * (2 * ties + 5))) / 18.0
    if var_s > 0:
        if s > 0:
            z = (s - 1) / np.sqrt(var_s)
        elif s < 0:
            z = (s + 1) / np.sqrt(var_s)
        else:
            z = 0.0
    else:
        z = 0.0
    tau = s / (n * (n - 1) / 2.0)
    slopes = dy / (t_days[ju] - t_days[iu]).astype(np.float64)
    return {
        "n": n, "s": s, "var_s": float(var_s), "z": float(z),
        "tau": float(tau), "sen_slope": float(np.median(slopes)),
    }


def mann_kendall_frame(
    daily: pd.DataFrame,
    *,
    key: str = "event_type",
    day_col: str = "bucket_ts",
    val_col: str = "m",
) -> pd.DataFrame:
    """MK + Sen per key over a (key, day, value) daily frame (the
    distributed rollup's 1d tier output — bounded rows)."""
    rows = []
    for k, g in daily.groupby(key, sort=True):
        g = g.sort_values(day_col)
        t_days = ts_to_us(pd.to_datetime(g[day_col])) // (86_400_000_000)
        r = mann_kendall_sen(g[val_col].to_numpy(dtype=np.float64), t_days)
        rows.append((k, r["n"], r["s"], r["var_s"], r["z"], r["tau"], r["sen_slope"]))
    out = pd.DataFrame(rows, columns=[key, "n", "s", "var_s", "z", "tau", "sen_slope"])
    out["n"] = out["n"].astype("int64")
    out["s"] = out["s"].astype("int64")
    return out


# ---------------------------------------------------------- Lomb-Scargle


def lomb_scargle_power(
    ds: rd.Dataset,
    *,
    keys: list[str],
    ts_col: str = "ts",
    val_col: str = "value",
    periods_s: list[int] = (21_600, 43_200, 86_400, 172_800, 604_800),
) -> pd.DataFrame:
    """Lomb-Scargle normalized power per (key, period) over an UNEVENLY
    sampled series, fully distributed: the periodogram at angular
    frequency w depends only on the sufficient statistics
    (n, Sy, Syy, Sc, Ss, Syc, Sys, Scc, Ssc) with c=cos(wt), s=sin(wt)
    — all plain sums, so ONE vectorized map_batches partial pass and a
    driver combine over keys x periods rows. The time phase is computed
    from epoch %% period (periods are integer seconds), keeping trig
    arguments in [0, 2pi) so engine and SQL oracle agree bit-for-bit
    after rounding (the harmonic_k1_fit idiom, stages/decompose.py).

    Scargle 1982 eq. 10 with the classical variance normalization:
    tan(2wτ) = sum sin 2wt / sum cos 2wt;
    P = [ (sum (y-ybar) cos w(t-τ))^2 / sum cos^2 w(t-τ)
        + (sum (y-ybar) sin w(t-τ))^2 / sum sin^2 w(t-τ) ] / (2 s_y^2)
    with s_y^2 the (n-1)-denominator sample variance.
    """
    from .exchange import driver_combine

    pers = np.asarray(sorted(periods_s), dtype=np.int64)

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        y = df[val_col].to_numpy(dtype=np.float64)
        us = ts_to_us(df[ts_col])
        ok = ~np.isnan(y)
        parts = []
        for p in pers:
            # phase in [0, 2pi): integer us modulo integer-second period
            ph = (us % (p * 1_000_000)).astype(np.float64) * (2.0 * np.pi / (p * 1e6))
            c, s = np.cos(ph), np.sin(ph)
            g = pd.DataFrame({
                **{k: df[k] for k in keys},
                "_ok": ok.astype(np.int64),
                "_y": np.where(ok, y, 0.0),
                "_yy": np.where(ok, y * y, 0.0),
                "_c": np.where(ok, c, 0.0),
                "_s": np.where(ok, s, 0.0),
                "_yc": np.where(ok, y * c, 0.0),
                "_ys": np.where(ok, y * s, 0.0),
                "_cc": np.where(ok, c * c, 0.0),
                "_sc": np.where(ok, s * c, 0.0),
            }).groupby(keys, sort=False, as_index=False).sum()
            g["period_s"] = int(p)
            parts.append(g)
        return pd.concat(parts, ignore_index=True)

    def combine(parts: pd.DataFrame) -> pd.DataFrame:
        return parts.groupby(keys + ["period_s"], as_index=False).sum()

    g = driver_combine(ds, partial, combine)
    n = g["_ok"].to_numpy(dtype=np.float64)
    sy, syy = g["_y"].to_numpy(), g["_yy"].to_numpy()
    sc, ss = g["_c"].to_numpy(), g["_s"].to_numpy()
    syc, sys_ = g["_yc"].to_numpy(), g["_ys"].to_numpy()
    scc, ssc = g["_cc"].to_numpy(), g["_sc"].to_numpy()
    ybar = sy / n
    # tau from sum sin2wt = 2*Ssc, sum cos2wt = 2*Scc - n
    two_wtau = np.arctan2(2.0 * ssc, 2.0 * scc - n)
    ct, st = np.cos(two_wtau / 2.0), np.sin(two_wtau / 2.0)
    a = syc - ybar * sc  # sum (y-ybar) cos wt
    b = sys_ - ybar * ss  # sum (y-ybar) sin wt
    num_c = a * ct + b * st  # sum (y-ybar) cos w(t-tau)
    num_s = b * ct - a * st
    den_c = ct * ct * scc + 2.0 * ct * st * ssc + st * st * (n - scc)
    den_s = n - den_c
    var = (syy - n * ybar * ybar) / (n - 1.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        power = (num_c * num_c / den_c + num_s * num_s / den_s) / (2.0 * var)
    out = g[keys + ["period_s"]].copy()
    out["n"] = n.astype("int64")
    out["power"] = power
    return out.sort_values(keys + ["period_s"]).reset_index(drop=True)


# ------------------------------------------------------------------- ACF


def acf_lags_frame(
    hourly: pd.DataFrame,
    *,
    key: str = "event_type",
    ts_col: str = "bucket_ts",
    val_col: str = "m",
    lags: list[int] = (1, 2, 3, 6, 12, 24),
    step_us: int = 3_600_000_000,
) -> pd.DataFrame:
    """Pairwise-complete autocorrelation at each lag over a regular
    bucket grid with holes: pair (m(t), m(t + lag*step)) only where
    BOTH buckets exist (the reference's pairwise dropna convention,
    analysis/correlation.py daily_correlation). Pearson r via the
    n-product moment form — identical under sample/population variance,
    shared verbatim with the SQL oracle. Input frame is tier-sized
    (bounded), produced by the distributed rollup."""
    rows = []
    for k, g in hourly.groupby(key, sort=True):
        us = ts_to_us(pd.to_datetime(g[ts_col]))
        order = np.argsort(us, kind="stable")
        us = us[order]
        y = g[val_col].to_numpy(dtype=np.float64)[order]
        pos = {int(u): i for i, u in enumerate(us)}
        for lag in lags:
            j = np.array([pos.get(int(u + lag * step_us), -1) for u in us], dtype=np.int64)
            okm = j >= 0
            x, z = y[okm], y[j[okm]]
            npairs = len(x)
            if npairs < 2:
                rows.append((k, int(lag), npairs, np.nan))
                continue
            sx, sz = x.sum(), z.sum()
            sxx, szz, sxz = (x * x).sum(), (z * z).sum(), (x * z).sum()
            den = np.sqrt((npairs * sxx - sx * sx) * (npairs * szz - sz * sz))
            r = (npairs * sxz - sx * sz) / den if den > 0 else np.nan
            rows.append((k, int(lag), npairs, r))
    out = pd.DataFrame(rows, columns=[key, "lag", "n_pairs", "acf"])
    out["lag"] = out["lag"].astype("int64")
    out["n_pairs"] = out["n_pairs"].astype("int64")
    return out


# ---------------------------------------------------------------- Pettitt


def pettitt_test(y: np.ndarray) -> dict:
    """Pettitt (1979) single change-point test over ONE ordered series:
    U_t = sum_{i<=t, j>t} sign(y_j - y_i) via the rank recurrence
    U_t = sum_{k<=t} V_k with V_k = sum_j sign(y_j - y_k); the change
    point is the FIRST t (1-based, t < n) maximizing |U_t|, K = max|U_t|,
    and the classical approximate significance
    p ~= 2 exp(-6 K^2 / (n^3 + n^2)). Vectorized over the full sign
    matrix -- n is calendar-bounded."""
    n = len(y)
    if n < 2:
        return {"n": n, "k_stat": 0, "t_change": 0, "u_at_change": 0, "p_approx": 1.0}
    sgn = np.sign(y[None, :] - y[:, None])  # sgn[k, j] = sign(y_j - y_k)
    v = sgn.sum(axis=1)
    u = np.cumsum(v)[: n - 1]  # U_t for t = 1..n-1
    t_idx = int(np.argmax(np.abs(u)))  # first max on ties
    k = float(np.abs(u[t_idx]))
    p = min(1.0, 2.0 * np.exp(-6.0 * k * k / (n ** 3 + n ** 2)))
    return {
        "n": n, "k_stat": int(k), "t_change": t_idx + 1,
        "u_at_change": int(u[t_idx]), "p_approx": float(p),
    }


def pettitt_frame(
    daily: pd.DataFrame,
    *,
    key: str = "event_type",
    day_col: str = "bucket_ts",
    val_col: str = "m",
) -> pd.DataFrame:
    """Pettitt per key over a (key, day, value) daily frame; emits the
    change DAY (the last day of the pre-change segment)."""
    rows = []
    for k, g in daily.groupby(key, sort=True):
        g = g.sort_values(day_col).reset_index(drop=True)
        r = pettitt_test(g[val_col].to_numpy(dtype=np.float64))
        cd = g[day_col].iloc[r["t_change"] - 1] if r["n"] >= 2 else pd.NaT
        rows.append((k, r["n"], r["k_stat"], cd, r["u_at_change"], r["p_approx"]))
    out = pd.DataFrame(
        rows, columns=[key, "n", "k_stat", "change_day", "u_at_change", "p_approx"]
    )
    out["n"] = out["n"].astype("int64")
    out["k_stat"] = out["k_stat"].astype("int64")
    out["u_at_change"] = out["u_at_change"].astype("int64")
    return out


def seasonal_mann_kendall_frame(
    daily: pd.DataFrame,
    *,
    key: str = "event_type",
    day_col: str = "bucket_ts",
    val_col: str = "m",
) -> pd.DataFrame:
    """Seasonal Mann-Kendall test (Hirsch, Slack & Smith 1982; the
    seasonal Kendall test with month-of-year seasons): per season k,
    S_k over that season's i<j sign triangle and tie-corrected var_k;
    the test statistic sums seasons (S' = sum S_k, Var' = sum var_k,
    continuity-corrected Z), tau = S' / sum_k n_k(n_k-1)/2, and the
    seasonal Sen slope is the median over ALL within-season pairwise
    slopes. Removes the seasonal cycle's false-trend contribution that
    the plain MK test (mann_kendall_frame) conflates with trend.

    Input is the rollup cascade's bounded DAILY tier, so the per-season
    O(n_k^2) triangles are calendar-bounded."""
    rows = []
    for k, g in daily.groupby(key, sort=True):
        d = pd.to_datetime(g[day_col])
        g = g.assign(_month=d.dt.month.to_numpy())
        S = 0
        V = 0.0
        denom = 0.0
        n = 0
        slopes = []
        for _, gg in g.groupby("_month", sort=True):
            gg = gg.sort_values(day_col)
            y = gg[val_col].to_numpy(dtype=np.float64)
            t = ts_to_us(pd.to_datetime(gg[day_col])) // 86_400_000_000
            nk = len(y)
            n += nk
            if nk < 2:
                continue
            iu, ju = np.triu_indices(nk, k=1)
            dy = y[ju] - y[iu]
            S += int(np.sign(dy).sum())
            _, counts = np.unique(y, return_counts=True)
            ties = counts[counts > 1].astype(np.float64)
            V += (nk * (nk - 1) * (2 * nk + 5)
                  - np.sum(ties * (ties - 1) * (2 * ties + 5))) / 18.0
            denom += nk * (nk - 1) / 2.0
            slopes.append(dy / (t[ju] - t[iu]).astype(np.float64))
        if V > 0:
            z = (S - 1) / np.sqrt(V) if S > 0 else ((S + 1) / np.sqrt(V) if S < 0 else 0.0)
        else:
            z = 0.0
        tau = S / denom if denom > 0 else 0.0
        sen = float(np.median(np.concatenate(slopes))) if slopes else np.nan
        rows.append((k, n, S, float(V), float(z), float(tau), sen))
    out = pd.DataFrame(
        rows, columns=[key, "n", "s", "var_s", "z", "tau", "sen_slope"])
    out["n"] = out["n"].astype("int64")
    out["s"] = out["s"].astype("int64")
    return out


# ------------------------------------------------------------------ PELT


def pelt_mean_changepoints(
    y: np.ndarray, *, penalty: float | None = None, min_size: int = 2,
) -> list[int]:
    """PELT optimal changepoint detection (Killick, Fearnhead & Eckley
    2012) for changes in MEAN under a Gaussian cost: segment cost
    C(a, b) = sum (y - mean)^2 over y[a:b] via prefix sums, total
    objective sum C + beta * (#changepoints), exact minimization with
    the paper's pruning rule (candidates t with F(t) + C(t, s) > F(s)
    can never be optimal again). Default penalty beta = 2 * sigma_hat^2
    * log n with sigma_hat the MAD-consistent noise scale — the
    standard BIC-flavored choice.

    Returns the sorted changepoint indices (segment starts, excluding
    0). Deterministic; completes the changepoint family next to
    pettitt_test (single change, rank-based) and CUSUM (drift)."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if n < 2 * min_size:
        return []
    if penalty is None:
        dif = np.diff(y)
        sig = 1.4826 * np.median(np.abs(dif - np.median(dif))) / np.sqrt(2.0)
        penalty = 2.0 * max(sig, 1e-12) ** 2 * np.log(n)
    s1 = np.concatenate([[0.0], np.cumsum(y)])
    s2 = np.concatenate([[0.0], np.cumsum(y * y)])

    def cost(a: int, b: int) -> float:  # y[a:b]
        m = b - a
        s = s1[b] - s1[a]
        return (s2[b] - s2[a]) - s * s / m

    F = np.full(n + 1, np.inf)
    F[0] = -penalty
    last = np.zeros(n + 1, dtype=np.int64)
    # candidate last-changepoint positions: 0 plus every valid segment
    # end in [min_size, t - min_size], grown as it becomes feasible
    R = [0]
    for t in range(min_size, n + 1):
        best, barg = np.inf, 0
        for s in R:
            v = F[s] + cost(s, t) + penalty
            if v < best:
                best, barg = v, s
        F[t] = best
        last[t] = barg
        # PELT pruning: s with F[s] + C(s, t) > F(t) can never win again
        R = [s for s in R if F[s] + cost(s, t) <= F[t]]
        snew = t - min_size + 1  # becomes feasible at iteration t + 1
        if snew >= min_size:
            R.append(snew)
    cps = []
    t = n
    while t > 0:
        s = int(last[t])
        if s == 0:
            break
        cps.append(s)
        t = s
    return sorted(cps)


def pelt_frame(
    daily: pd.DataFrame,
    *,
    key: str = "event_type",
    day_col: str = "bucket_ts",
    val_col: str = "m",
    penalty: float | None = None,
    min_size: int = 2,
) -> pd.DataFrame:
    """PELT per key over a bounded daily frame: one row per detected
    changepoint (key, cp_rank, day, mean_before, mean_after)."""
    rows = []
    for k, g in daily.groupby(key, sort=True):
        g = g.sort_values(day_col, ignore_index=True)
        y = g[val_col].to_numpy(dtype=np.float64)
        cps = pelt_mean_changepoints(y, penalty=penalty, min_size=min_size)
        bounds = [0] + cps + [len(y)]
        for r, cp in enumerate(cps, start=1):
            i = bounds.index(cp)
            rows.append((
                k, r, g[day_col].iloc[cp],
                float(y[bounds[i - 1]:cp].mean()),
                float(y[cp:bounds[i + 1]].mean()),
            ))
    out = pd.DataFrame(
        rows, columns=[key, "cp_rank", "day", "mean_before", "mean_after"])
    out["cp_rank"] = out["cp_rank"].astype("int64")
    return out


# ------------------------------------------------------------- Hurst R/S


def hurst_rs(
    y: np.ndarray, *, window_sizes: tuple = (8, 16, 32, 64, 128),
) -> tuple[float, pd.DataFrame]:
    """Hurst exponent by classical rescaled-range analysis (Hurst 1951;
    Mandelbrot & Wallis 1969): for each window size w, split the series
    into floor(n/w) disjoint chunks; per chunk R = range of the
    cumulative mean-adjusted sums, S = population std; R/S averaged
    over chunks; H = OLS slope of log2(mean R/S) on log2(w). H ~ 0.5
    for iid noise, > 0.5 persistent, < 0.5 antipersistent. Vectorized
    per window size via reshape; deterministic."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    rows = []
    for w in window_sizes:
        k = n // w
        if k < 1:
            continue
        chunks = y[: k * w].reshape(k, w)
        dev = chunks - chunks.mean(axis=1, keepdims=True)
        cum = np.cumsum(dev, axis=1)
        R = cum.max(axis=1) - cum.min(axis=1)
        S = chunks.std(axis=1)
        ok = S > 0
        if not ok.any():
            continue
        rows.append((int(w), int(ok.sum()), float((R[ok] / S[ok]).mean())))
    tab = pd.DataFrame(rows, columns=["w", "n_chunks", "rs"])
    if len(tab) < 2:
        return float("nan"), tab
    lx = np.log2(tab["w"].to_numpy(np.float64))
    ly = np.log2(tab["rs"].to_numpy(np.float64))
    lx0 = lx - lx.mean()
    h = float((lx0 * (ly - ly.mean())).sum() / (lx0 * lx0).sum())
    return h, tab


# ------------------------------------------------- AR(2) Yule-Walker


def yule_walker_ar2_frame(
    hourly: pd.DataFrame,
    *,
    key: str = "event_type",
    ts_col: str = "bucket_ts",
    val_col: str = "m",
    step_us: int = 3_600_000_000,
) -> pd.DataFrame:
    """AR(2) fit via the Yule-Walker equations (Yule 1927 / Walker 1931;
    the closed 2x2 solve) over a regular bucket grid with holes, per
    key. Autocovariances use the pairwise-complete convention shared
    with acf_lags_frame — c_k averages (x_t - ybar)(x_{t+k} - ybar)
    over pairs where BOTH buckets exist, divided by the pair count
    (so r_k = c_k / c_0 with c_0 the population variance over all n
    points):

        phi1 = r1 (1 - r2) / (1 - r1^2)
        phi2 = (r2 - r1^2) / (1 - r1^2)
        sigma2 = c0 (1 - phi1 r1 - phi2 r2)

    Input frame is tier-sized (bounded), produced by the distributed
    rollup; the expression order is shared verbatim with the SQL
    oracle."""
    rows = []
    for k, g in hourly.groupby(key, sort=True):
        us = ts_to_us(pd.to_datetime(g[ts_col]))
        order = np.argsort(us, kind="stable")
        us = us[order]
        y = g[val_col].to_numpy(dtype=np.float64)[order]
        n = len(y)
        if n < 3:
            continue
        ybar = y.sum() / n
        c0 = ((y - ybar) ** 2).sum() / n
        pos = {int(u): i for i, u in enumerate(us)}
        cs = []
        for lag in (1, 2):
            j = np.array([pos.get(int(u + lag * step_us), -1) for u in us], dtype=np.int64)
            okm = j >= 0
            npairs = int(okm.sum())
            if npairs == 0 or c0 <= 0:
                cs.append(np.nan)
                continue
            cs.append((((y[okm] - ybar) * (y[j[okm]] - ybar)).sum()) / npairs)
        c1, c2 = cs
        r1, r2 = c1 / c0, c2 / c0
        den = 1.0 - r1 * r1
        phi1 = r1 * (1.0 - r2) / den
        phi2 = (r2 - r1 * r1) / den
        sigma2 = c0 * (1.0 - phi1 * r1 - phi2 * r2)
        rows.append((k, n, r1, r2, phi1, phi2, sigma2))
    out = pd.DataFrame(
        rows, columns=[key, "n", "r1", "r2", "phi1", "phi2", "sigma2"]
    )
    out["n"] = out["n"].astype("int64")
    return out


# --------------------------------------------- complexity battery


def complexity_frame(
    hourly: pd.DataFrame,
    *,
    key: str = "event_type",
    ts_col: str = "bucket_ts",
    val_col: str = "m",
    step_us: int = 3_600_000_000,
) -> pd.DataFrame:
    """Nonlinear time-series complexity battery (the tsfresh-popularized
    estimators, public formulas) over a regular bucket grid with holes,
    per key, pairwise/triplet-complete:

    * mean_abs_change = mean |x_{t+1} - x_t| over adjacent present pairs
    * cid_ce = sqrt( sum (x_{t+1} - x_t)^2 )  (Batista et al. 2014
      complexity-invariant distance core, unnormalized)
    * c3 = mean( x_t * x_{t+1} * x_{t+2} ) over present triples
      (Schreiber & Schmitz 1997 nonlinearity statistic, lag 1)
    * time_rev_asym = mean( x_{t+2}^2 * x_{t+1} - x_{t+1} * x_t^2 )
      (Fulcher & Jones 2014 time-reversal asymmetry, lag 1)
    """
    rows = []
    for k, g in hourly.groupby(key, sort=True):
        us = ts_to_us(pd.to_datetime(g[ts_col]))
        order = np.argsort(us, kind="stable")
        us = us[order]
        y = g[val_col].to_numpy(dtype=np.float64)[order]
        pos = {int(u): i for i, u in enumerate(us)}
        j1 = np.array([pos.get(int(u + step_us), -1) for u in us], dtype=np.int64)
        j2 = np.array([pos.get(int(u + 2 * step_us), -1) for u in us], dtype=np.int64)
        pair = j1 >= 0
        trip = (j1 >= 0) & (j2 >= 0)
        n_pairs = int(pair.sum())
        n_triples = int(trip.sum())
        if n_pairs == 0:
            continue
        d = y[j1[pair]] - y[pair]
        mac = np.abs(d).sum() / n_pairs
        cid = np.sqrt((d * d).sum())
        if n_triples > 0:
            x0, x1, x2 = y[trip], y[j1[trip]], y[j2[trip]]
            c3 = (x0 * x1 * x2).sum() / n_triples
            trev = (x2 * x2 * x1 - x1 * x0 * x0).sum() / n_triples
        else:
            c3 = np.nan
            trev = np.nan
        rows.append((k, n_pairs, n_triples, mac, cid, c3, trev))
    out = pd.DataFrame(
        rows,
        columns=[key, "n_pairs", "n_triples", "mean_abs_change", "cid_ce",
                 "c3", "time_rev_asym"],
    )
    out["n_pairs"] = out["n_pairs"].astype("int64")
    out["n_triples"] = out["n_triples"].astype("int64")
    return out


# ------------------------------------------- randomness / whiteness


def runs_test(y: np.ndarray) -> dict:
    """Wald-Wolfowitz runs test (1940) around the MEAN cut (the
    continuous-data variant — no ties): signs s = +1 where y > mean
    else -1, R = number of runs, E[R] = 2 n1 n2 / n + 1,
    Var[R] = 2 n1 n2 (2 n1 n2 - n) / (n^2 (n - 1)), z = (R - E)/sd.
    Exact integer run counting -> SQL-replayable via LAG."""
    y = np.asarray(y, dtype=np.float64)
    mu = y.sum() / len(y)
    s = np.where(y > mu, 1, -1)
    n1 = int((s == 1).sum())
    n2 = int((s == -1).sum())
    n = n1 + n2
    runs = 1 + int((s[1:] != s[:-1]).sum()) if n else 0
    e_r = 2.0 * n1 * n2 / n + 1.0
    var_r = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n * n * (n - 1.0))
    z = (runs - e_r) / np.sqrt(var_r) if var_r > 0 else float("nan")
    return {"n1": n1, "n2": n2, "runs": runs, "expected": e_r, "z": z}


def ljung_box_q(y: np.ndarray, m: int = 10) -> tuple[float, int]:
    """Ljung-Box portmanteau statistic (Ljung & Box 1978):
    Q = n (n+2) sum_{k=1..m} rho_k^2 / (n - k) with the BIASED
    positional autocorrelation rho_k = sum_{t>k} (y_t - ybar)
    (y_{t-k} - ybar) / sum (y_t - ybar)^2 (the standard Box-Jenkins
    estimator — denominator over ALL n terms, so rho is well defined
    and the statistic replays exactly in SQL as an offset self-join).
    Returns (Q, df=m)."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    yb = y.sum() / n
    d = y - yb
    denom = (d * d).sum()
    q = 0.0
    for k in range(1, m + 1):
        rho = (d[k:] * d[:-k]).sum() / denom
        q += rho * rho / (n - k)
    return float(n * (n + 2.0) * q), m


def hp_filter(y: np.ndarray, lam: float = 1600.0) -> tuple[np.ndarray, np.ndarray]:
    """Hodrick-Prescott trend/cycle filter (Hodrick & Prescott 1997):
    trend tau minimizes sum (y - tau)^2 + lam * sum (Delta^2 tau)^2,
    the normal equations (I + lam * D'D) tau = y with D the
    (n-2) x n second-difference operator. Solved exactly per bounded
    tier series; the system is pentadiagonal, so the documented scale
    path for very long series is a banded Cholesky — at tier lengths
    (calendar-bounded buckets) the dense solve is already trivial.
    Returns (trend, cycle = y - trend)."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if n < 3:
        return y.copy(), np.zeros(n)
    d = np.zeros((n - 2, n))
    idx = np.arange(n - 2)
    d[idx, idx] = 1.0
    d[idx, idx + 1] = -2.0
    d[idx, idx + 2] = 1.0
    a = np.eye(n) + lam * (d.T @ d)
    trend = np.linalg.solve(a, y)
    return trend, y - trend


def dfa_alpha(y: np.ndarray, scales: list[int] | None = None) -> dict:
    """Detrended fluctuation analysis (Peng et al. 1994): integrate
    the mean-removed series, split into non-overlapping windows of
    each scale n, remove the per-window OLS line, fluctuation
    F(n) = sqrt(mean squared residual); the DFA exponent alpha is the
    ln F - ln n OLS slope. alpha ~ 0.5 white noise, ~ 1 1/f,
    ~ 1.5 Brownian — the long-memory complement to Hurst R/S
    (hurst_rs above). Deterministic; per bounded tier series."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if scales is None:
        scales = [s for s in (4, 8, 16, 32, 64, 128) if s <= n // 4]
    prof = np.cumsum(y - y.sum() / n)
    xs, fs = [], []
    for s in scales:
        k = n // s
        if k < 2:
            continue
        seg = prof[:k * s].reshape(k, s)
        t = np.arange(s, dtype=np.float64)
        tm = t.mean()
        tc = t - tm
        denom = (tc * tc).sum()
        b = (seg * tc).sum(axis=1) / denom
        a = seg.mean(axis=1)
        resid = seg - (a[:, None] + b[:, None] * tc[None, :])
        fs.append(np.sqrt((resid * resid).mean()))
        xs.append(float(s))
    x = np.log(np.asarray(xs))
    f = np.log(np.asarray(fs))
    m = float(len(x))
    sx, sy = x.sum(), f.sum()
    alpha = (m * (x * f).sum() - sx * sy) / (m * (x * x).sum() - sx * sx)
    return {"alpha": float(alpha), "n_scales": len(xs),
            "scales": [int(v) for v in xs], "f": fs}


def pacf_durbin_levinson(y: np.ndarray, m: int = 10) -> np.ndarray:
    """Partial autocorrelation via the Durbin-Levinson recursion
    (Durbin 1960; Box-Jenkins ch.3) from the biased positional
    autocorrelations rho_1..rho_m (the ljung_box_q estimator): phi_kk
    is the lag-k PACF. Deterministic O(m^2); per bounded tier series.
    For an AR(p) process the PACF cuts off after lag p — the classic
    order-identification signature."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    yb = y.sum() / n
    d = y - yb
    denom = (d * d).sum()
    rho = np.array([1.0] + [(d[k:] * d[:-k]).sum() / denom
                            for k in range(1, m + 1)])
    phi = np.zeros((m + 1, m + 1))
    pacf = np.zeros(m)
    for k in range(1, m + 1):
        if k == 1:
            phi[1, 1] = rho[1]
        else:
            num = rho[k] - (phi[k - 1, 1:k] * rho[k - 1:0:-1]).sum()
            den = 1.0 - (phi[k - 1, 1:k] * rho[1:k]).sum()
            phi[k, k] = num / den
            phi[k, 1:k] = phi[k - 1, 1:k] - phi[k, k] * phi[k - 1, k - 1:0:-1]
        pacf[k - 1] = phi[k, k]
    return pacf
