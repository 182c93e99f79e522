"""Round-4 continuation statistics / relational additions, registered
alongside pipelines/queries.py (same oracle-parity conventions: 6dp
`stable_round6` outputs, identical column names, deterministic
tie-breaks, hourly means from the engine's own fused rollup cascade).

Members:

* ``arch_lm``          — Engle (1982) ARCH LM test per event_type.
* ``gpd_pot``          — peaks-over-threshold GPD fit via probability-
                         weighted moments (Hosking & Wallis 1987).
* ``hac_trend``        — OLS trend with Newey-West (1987) HAC standard
                         errors (Bartlett kernel, L = 5).
* ``ad_twosample``     — Anderson-Darling k=2-sample test, tie-adjusted
                         midrank version A2_akN (Scholz & Stephens 1987).
* ``grouping_sets_agg``— one-pass multi-level aggregate (GROUPING SETS /
                         ROLLUP): finest level from per-batch partials +
                         ONE bounded combine, coarser levels re-derived
                         from the finest partials (never a second scan).

All statistical probes run on the bounded hourly tier (cardinality =
event types x hours — the analysis-tail pattern shared with the
correlation / stationarity batteries); grouping_sets_agg scans raw
events once with pruned columns and vectorized per-batch partial
aggregation, so the exchange payload is bounded by types x 24.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd

from ..util import stable_round6

_HOURLY_CTE = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
)"""


def _hourly(sf_dir: str) -> pd.DataFrame:
    from .queries import _fused_tier

    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    return t1h[["event_type", "bucket_ts", "m"]]


# ------------------------------------------------------------------ ARCH LM


def arch_lm_kernel(m: np.ndarray) -> dict[str, float]:
    """Engle's LM statistic at lag 1 on a positional series: demean,
    square, regress z_t on z_{t-1}; LM = n_pairs * R^2."""
    n = float(len(m))
    z = (m - m.sum() / n) ** 2
    x, y = z[:-1], z[1:]
    np_ = float(len(x))
    mx, my = x.sum() / np_, y.sum() / np_
    sxx = (x * x).sum() - np_ * mx * mx
    syy = (y * y).sum() - np_ * my * my
    sxy = (x * y).sum() - np_ * mx * my
    r2 = sxy * sxy / (sxx * syy)
    return {"lm_stat": np_ * r2, "rho1_e2": sxy / np.sqrt(sxx * syy)}


def q_arch_lm(sf_dir: str):
    """ARCH LM test (Engle 1982) per event_type on the 6dp hourly
    means: squared deviations from the series mean regressed on their
    own lag (positional bucket order); LM = n * R^2 ~ chi2(1) under
    homoskedasticity. The conditional-heteroskedasticity complement to
    Breusch-Pagan (which regresses on a covariate, not the own lag)."""
    t1h = _hourly(sf_dir)
    rows = []
    for key, g in t1h.groupby("event_type", sort=True):
        m = g.sort_values("bucket_ts")["m"].to_numpy(dtype=np.float64)
        if len(m) < 10:
            continue
        r = arch_lm_kernel(m)
        rows.append({"event_type": key, "n": len(m), **r})
    out = pd.DataFrame(rows)
    out["n"] = out["n"].astype("int64")
    for c in ("lm_stat", "rho1_e2"):
        out[c] = stable_round6(out[c].astype(float))
    return out.sort_values("event_type").reset_index(drop=True)


_SQL_ARCH_LM = _HOURLY_CTE + """,
z AS (
  SELECT event_type,
         POW(m - AVG(m) OVER (PARTITION BY event_type), 2) AS z,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bts) AS p,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM hourly
),
lagd AS (
  SELECT event_type, n, z AS y,
         LAG(z) OVER (PARTITION BY event_type ORDER BY p) AS x
  FROM z
),
mom AS (
  SELECT event_type, MAX(n) AS n, COUNT(*)::DOUBLE AS np,
         SUM(x) / COUNT(*) AS mx, SUM(y) / COUNT(*) AS my,
         SUM(x * x) AS sxx_raw, SUM(y * y) AS syy_raw, SUM(x * y) AS sxy_raw
  FROM lagd WHERE x IS NOT NULL GROUP BY 1 HAVING MAX(n) >= 10
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       ROUND(ROUND(np * POW(sxy_raw - np * mx * my, 2)
             / ((sxx_raw - np * mx * mx) * (syy_raw - np * my * my)), 9), 6) AS lm_stat,
       ROUND(ROUND((sxy_raw - np * mx * my)
             / sqrt((sxx_raw - np * mx * mx) * (syy_raw - np * my * my)), 9), 6) AS rho1_e2
FROM mom ORDER BY event_type
"""


# ------------------------------------------------------------------ GPD POT


def gpd_pwm_kernel(y_sorted: np.ndarray) -> dict[str, float]:
    """GPD fit from probability-weighted moments (Hosking & Wallis
    1987, a_s = E[X (1-F)^s]): a0 = mean, a1 = sum((m-i) y_i)/(m (m-1))
    over ascending order i = 1..m; HW shape k = a0/(a0 - 2 a1) - 2, so
    modern-sign xi = -k = 2 - a0/(a0 - 2 a1); scale = 2 a0 a1/(a0-2 a1).
    a1 is invariant to tie order (tied values share position weight)."""
    m = float(len(y_sorted))
    i = np.arange(1, len(y_sorted) + 1, dtype=np.float64)
    a0 = y_sorted.sum() / m
    a1 = ((m - i) * y_sorted).sum() / (m * (m - 1.0))
    return {
        "a0": a0,
        "a1": a1,
        "shape_xi": 2.0 - a0 / (a0 - 2.0 * a1),
        "scale": 2.0 * a0 * a1 / (a0 - 2.0 * a1),
    }


def q_gpd_pot(sf_dir: str):
    """Peaks-over-threshold extreme-value fit per event_type: threshold
    = the exact ceil(0.9 n)-th ascending order statistic of the 6dp
    hourly means (a multiset rank — identical both sides regardless of
    tie order), exceedances y = m - u for m > u, GPD (shape, scale) by
    probability-weighted moments. The threshold-exceedance complement
    to the block-maxima GEV fit (gev_fit / l_moments)."""
    t1h = _hourly(sf_dir)
    rows = []
    for key, g in t1h.groupby("event_type", sort=True):
        v = np.sort(g["m"].to_numpy(dtype=np.float64))
        n = len(v)
        if n < 50:
            continue
        u = v[int(np.ceil(0.9 * n)) - 1]
        y = np.sort(v[v > u] - u)
        if len(y) < 5:
            continue
        r = gpd_pwm_kernel(y)
        rows.append({"event_type": key, "n": n, "n_exc": len(y),
                     "threshold": u, **r})
    out = pd.DataFrame(rows)
    for c in ("n", "n_exc"):
        out[c] = out[c].astype("int64")
    for c in ("threshold", "a0", "a1", "shape_xi", "scale"):
        out[c] = stable_round6(out[c].astype(float))
    return out.sort_values("event_type").reset_index(drop=True)


_SQL_GPD_POT = _HOURLY_CTE + """,
pos AS (
  SELECT event_type, m,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY m) AS r,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM hourly
),
thr AS (
  SELECT event_type, m AS u, n FROM pos
  WHERE n >= 50 AND r = CAST(CEIL(0.9 * n) AS BIGINT)
),
exc AS (
  SELECT h.event_type, h.m - t.u AS y
  FROM hourly h JOIN thr t USING (event_type) WHERE h.m > t.u
),
ord_exc AS (
  SELECT event_type, y,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY y) AS i,
         COUNT(*) OVER (PARTITION BY event_type) AS mm
  FROM exc
),
pwm AS (
  SELECT event_type, MAX(mm)::DOUBLE AS m,
         SUM(y) / MAX(mm) AS a0,
         SUM((mm - i) * y) / (MAX(mm) * (MAX(mm) - 1.0)) AS a1
  FROM ord_exc GROUP BY 1 HAVING MAX(mm) >= 5
)
SELECT t.event_type, CAST(t.n AS BIGINT) AS n, CAST(p.m AS BIGINT) AS n_exc,
       ROUND(ROUND(t.u, 9), 6) AS threshold,
       ROUND(ROUND(p.a0, 9), 6) AS a0,
       ROUND(ROUND(p.a1, 9), 6) AS a1,
       ROUND(ROUND(2.0 - p.a0 / (p.a0 - 2.0 * p.a1), 9), 6) AS shape_xi,
       ROUND(ROUND(2.0 * p.a0 * p.a1 / (p.a0 - 2.0 * p.a1), 9), 6) AS scale
FROM pwm p JOIN thr t USING (event_type) ORDER BY t.event_type
"""


# ---------------------------------------------------------------- HAC trend

_NW_LAGS = 5


def hac_trend_kernel(y: np.ndarray, nw_lags: int = _NW_LAGS) -> dict[str, float]:
    """OLS of y on centered positional index with Newey-West (1987)
    long-run variance (Bartlett weights 1 - l/(L+1))."""
    n = float(len(y))
    x = np.arange(len(y), dtype=np.float64) - (n - 1.0) / 2.0
    ybar = y.sum() / n
    sxx = (x * x).sum()
    b = (x * y).sum() / sxx
    u = y - ybar - b * x
    v = x * u
    s = (v * v).sum()
    for lag in range(1, nw_lags + 1):
        w = 1.0 - lag / (nw_lags + 1.0)
        s += 2.0 * w * (v[lag:] * v[:-lag]).sum()
    se_nw = np.sqrt(s / (sxx * sxx))
    se_iid = np.sqrt(((u * u).sum() / (n - 2.0)) / sxx)
    return {"slope": b, "se_nw": se_nw, "se_iid": se_iid,
            "t_nw": b / se_nw}


def q_hac_trend(sf_dir: str):
    """Linear trend per event_type on the 6dp hourly means with
    autocorrelation-robust (Newey-West, Bartlett L=5) standard errors —
    the HAC complement to mann_kendall (rank trend) and
    linear_regression (iid errors): with persistent series the iid se
    understates uncertainty and t_iid overstates significance."""
    t1h = _hourly(sf_dir)
    rows = []
    for key, g in t1h.groupby("event_type", sort=True):
        y = g.sort_values("bucket_ts")["m"].to_numpy(dtype=np.float64)
        if len(y) < 20:
            continue
        rows.append({"event_type": key, "n": len(y), **hac_trend_kernel(y)})
    out = pd.DataFrame(rows)
    out["n"] = out["n"].astype("int64")
    for c in ("slope", "se_nw", "se_iid", "t_nw"):
        out[c] = stable_round6(out[c].astype(float))
    return out.sort_values("event_type").reset_index(drop=True)


_SQL_HAC_TREND = _HOURLY_CTE + """,
pos AS (
  SELECT event_type, m AS y,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bts) - 1 AS p,
         COUNT(*) OVER (PARTITION BY event_type) AS n,
         AVG(m) OVER (PARTITION BY event_type) AS ybar
  FROM hourly
),
xt AS (
  SELECT event_type, y, ybar, n, p, p - (n - 1) / 2.0 AS x
  FROM pos WHERE n >= 20
),
mom AS (
  SELECT event_type, MAX(n) AS n, SUM(x * x) AS sxx,
         SUM(x * y) / SUM(x * x) AS b
  FROM xt GROUP BY 1
),
res AS (
  SELECT t.event_type, t.p, m.sxx, m.b, m.n,
         t.y - t.ybar - m.b * t.x AS u,
         t.x * (t.y - t.ybar - m.b * t.x) AS v
  FROM xt t JOIN mom m USING (event_type)
),
lv AS (
  SELECT event_type, sxx, b, n, u, v,
         LAG(v, 1) OVER w AS v1, LAG(v, 2) OVER w AS v2,
         LAG(v, 3) OVER w AS v3, LAG(v, 4) OVER w AS v4,
         LAG(v, 5) OVER w AS v5
  FROM res WINDOW w AS (PARTITION BY event_type ORDER BY p)
),
s AS (
  SELECT event_type, MAX(n) AS n, MAX(sxx) AS sxx, MAX(b) AS b,
         SUM(u * u) AS su2,
         SUM(v * v)
           + 2.0 * (1.0 - 1.0 / 6.0) * COALESCE(SUM(v * v1), 0)
           + 2.0 * (1.0 - 2.0 / 6.0) * COALESCE(SUM(v * v2), 0)
           + 2.0 * (1.0 - 3.0 / 6.0) * COALESCE(SUM(v * v3), 0)
           + 2.0 * (1.0 - 4.0 / 6.0) * COALESCE(SUM(v * v4), 0)
           + 2.0 * (1.0 - 5.0 / 6.0) * COALESCE(SUM(v * v5), 0) AS lrv
  FROM lv GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       ROUND(ROUND(b, 9), 6) AS slope,
       ROUND(ROUND(sqrt(lrv / (sxx * sxx)), 9), 6) AS se_nw,
       ROUND(ROUND(sqrt((su2 / (n - 2.0)) / sxx), 9), 6) AS se_iid,
       ROUND(ROUND(b / sqrt(lrv / (sxx * sxx)), 9), 6) AS t_nw
FROM s ORDER BY event_type
"""


# --------------------------------------------------- Anderson-Darling 2-samp


def ad_twosample_kernel(xs: np.ndarray, ys: np.ndarray) -> float:
    """Tie-adjusted two-sample Anderson-Darling statistic A2_akN
    (Scholz & Stephens 1987 eq. 7, midrank version, k = 2)."""
    n1, n2 = float(len(xs)), float(len(ys))
    nn = n1 + n2
    pooled = np.concatenate([xs, ys])
    z, counts = np.unique(pooled, return_counts=True)
    # per-distinct-value counts from sample 1
    zx, cx = np.unique(xs, return_counts=True)
    f1 = np.zeros(len(z))
    f1[np.searchsorted(z, zx)] = cx
    lj = counts.astype(np.float64)
    bj = np.cumsum(lj)
    c1 = np.cumsum(f1)
    baj = bj - lj / 2.0
    m1 = c1 - f1 / 2.0
    m2 = (bj - c1) - (lj - f1) / 2.0
    den = baj * (nn - baj) - nn * lj / 4.0
    inner1 = (lj / nn * (nn * m1 - n1 * baj) ** 2 / den).sum()
    inner2 = (lj / nn * (nn * m2 - n2 * baj) ** 2 / den).sum()
    return (nn - 1.0) / nn * (inner1 / n1 + inner2 / n2)


def q_ad_twosample(sf_dir: str):
    """Anderson-Darling two-sample test (tie-adjusted A2_akN, Scholz &
    Stephens 1987) for every unordered event-type pair over the full
    (unpaired) 6dp hourly-mean samples — tail-sensitive distributional
    comparison complementing source_ks_drift (sup-norm) and
    mann_whitney (location only)."""
    t1h = _hourly(sf_dir)
    by = {k: g["m"].to_numpy(dtype=np.float64)
          for k, g in t1h.groupby("event_type")}
    rows = []
    keys = sorted(by)
    for i, ex in enumerate(keys):
        for ey in keys[i + 1:]:
            xs, ys = by[ex], by[ey]
            if len(xs) < 5 or len(ys) < 5:
                continue
            a2 = ad_twosample_kernel(xs, ys)
            rows.append({"event_x": ex, "event_y": ey,
                         "n_x": len(xs), "n_y": len(ys), "a2_akn": a2})
    out = pd.DataFrame(rows)
    for c in ("n_x", "n_y"):
        out[c] = out[c].astype("int64")
    out["a2_akn"] = stable_round6(out["a2_akn"].astype(float))
    return out.sort_values(["event_x", "event_y"]).reset_index(drop=True)


_SQL_AD_TWOSAMPLE = _HOURLY_CTE + """,
tl AS (SELECT event_type, COUNT(*) AS n FROM hourly GROUP BY 1),
pp AS (
  SELECT a.event_type AS event_x, b.event_type AS event_y,
         a.n AS n1, b.n AS n2
  FROM tl a JOIN tl b ON a.event_type < b.event_type
  WHERE a.n >= 5 AND b.n >= 5
),
pool AS (
  SELECT pp.event_x, pp.event_y, pp.n1, pp.n2, h.m,
         CASE WHEN h.event_type = pp.event_x THEN 1 ELSE 0 END AS isx
  FROM pp JOIN hourly h
    ON h.event_type = pp.event_x OR h.event_type = pp.event_y
),
grp AS (
  SELECT event_x, event_y, MAX(n1) AS n1, MAX(n2) AS n2, m,
         COUNT(*)::DOUBLE AS lj, SUM(isx)::DOUBLE AS f1
  FROM pool GROUP BY event_x, event_y, m
),
cum AS (
  SELECT event_x, event_y, n1, n2, lj, f1,
         SUM(lj) OVER w AS bj, SUM(f1) OVER w AS c1,
         (n1 + n2)::DOUBLE AS nn
  FROM grp WINDOW w AS (PARTITION BY event_x, event_y ORDER BY m)
),
term AS (
  SELECT event_x, event_y, n1, n2, nn,
         lj / nn * POW(nn * (c1 - f1 / 2.0) - n1 * (bj - lj / 2.0), 2)
           / ((bj - lj / 2.0) * (nn - (bj - lj / 2.0)) - nn * lj / 4.0) AS t1,
         lj / nn * POW(nn * ((bj - c1) - (lj - f1) / 2.0) - n2 * (bj - lj / 2.0), 2)
           / ((bj - lj / 2.0) * (nn - (bj - lj / 2.0)) - nn * lj / 4.0) AS t2
  FROM cum
)
SELECT event_x, event_y,
       CAST(MAX(n1) AS BIGINT) AS n_x, CAST(MAX(n2) AS BIGINT) AS n_y,
       ROUND(ROUND((MAX(nn) - 1.0) / MAX(nn)
             * (SUM(t1) / MAX(n1) + SUM(t2) / MAX(n2)), 9), 6) AS a2_akn
FROM term GROUP BY event_x, event_y ORDER BY event_x, event_y
"""


# ------------------------------------------------------------ GROUPING SETS


def rollup_levels_kernel(fine: pd.DataFrame) -> pd.DataFrame:
    """Derive the (event_type) and () rollup levels from the finest
    (event_type, hod) partials — decomposable stats only, so coarser
    levels never rescan data. Sentinels: '<all>' / -1 (not SQL NULL, so
    the driver's value hash is representation-stable)."""
    lvl0 = fine.assign(grouping_id=0)
    g1 = fine.groupby("event_type", as_index=False).agg(
        n=("n", "sum"), s=("s", "sum"), mn=("mn", "min"), mx=("mx", "max"))
    lvl1 = g1.assign(hod=-1, grouping_id=1)
    lvl3 = pd.DataFrame([{
        "event_type": "<all>", "hod": -1, "grouping_id": 3,
        "n": fine["n"].sum(), "s": fine["s"].sum(),
        "mn": fine["mn"].min(), "mx": fine["mx"].max(),
    }])
    out = pd.concat([lvl0, lvl1, lvl3], ignore_index=True)
    out["mean_value"] = stable_round6(out["s"] / out["n"])
    out["sum_value"] = stable_round6(out["s"].astype(float))
    out = out.rename(columns={"mn": "min_value", "mx": "max_value"})
    for c in ("hod", "grouping_id", "n"):
        out[c] = out[c].astype("int64")
    return out[["event_type", "hod", "grouping_id", "n", "sum_value",
                "min_value", "max_value", "mean_value"]]


def q_grouping_sets(sf_dir: str):
    """Multi-level aggregate in ONE scan: GROUPING SETS
    ((event_type, hour-of-day), (event_type), ()) over raw events.
    Per-batch vectorized partials on the finest key (bounded payload:
    types x 24 per block), one driver combine of the bounded partials,
    coarser levels re-derived from the finest — the OLAP-rollup shape
    of the tier cascade (decomposable stats cascade losslessly)."""
    import os

    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["ts", "event_type", "value"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(hod=df["ts"].dt.hour.astype("int64"))
        g = df.groupby(["event_type", "hod"], as_index=False).agg(
            n=("value", "count"), s=("value", "sum"),
            mn=("value", "min"), mx=("value", "max"))
        return g

    parts = ds.map_batches(part, batch_format="pandas").to_pandas()
    fine = parts.groupby(["event_type", "hod"], as_index=False).agg(
        n=("n", "sum"), s=("s", "sum"), mn=("mn", "min"), mx=("mx", "max"))
    out = rollup_levels_kernel(fine)
    return out.sort_values(["grouping_id", "event_type", "hod"]).reset_index(drop=True)


_SQL_GROUPING_SETS = """
SELECT COALESCE(event_type, '<all>') AS event_type,
       COALESCE(hod, -1) AS hod,
       CAST(GROUPING(event_type) * 2 + GROUPING(hod) AS BIGINT) AS grouping_id,
       COUNT(value) AS n,
       ROUND(ROUND(SUM(value), 9), 6) AS sum_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value,
       ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS mean_value
FROM (SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod, value
      FROM events)
GROUP BY GROUPING SETS ((event_type, hod), (event_type), ())
ORDER BY grouping_id, event_type, hod
"""


STAT_QUERIES: dict[str, Any] = {}

STAT_ORACLE: dict[str, str] = {}


def _register(name: str, fn: Any, sql: str | None = None) -> None:
    STAT_QUERIES[name] = fn
    if sql is not None:
        STAT_ORACLE[name] = sql


_register("arch_lm", q_arch_lm, _SQL_ARCH_LM)
_register("gpd_pot", q_gpd_pot, _SQL_GPD_POT)
_register("hac_trend", q_hac_trend, _SQL_HAC_TREND)
_register("ad_twosample", q_ad_twosample, _SQL_AD_TWOSAMPLE)
_register("grouping_sets_agg", q_grouping_sets, _SQL_GROUPING_SETS)


# ------------------------------------------------------------ energy distance


def energy_distance_kernel(xs: np.ndarray, ys: np.ndarray) -> dict[str, float]:
    """Szekely & Rizzo (2004) energy distance, V-statistic form
    (n^2 / m^2 / nm normalizations, zero diagonal included):
    E = 2 A - B - C with A = mean|x_i - y_j|, B = mean|x_i - x_j|,
    C = mean|y_i - y_j|; test statistic = nm/(n+m) * E.

    O(n log n): cross terms via searchsorted + prefix sums, within
    terms from the sorted-order identity sum_{i<j}(x_(j) - x_(i)) =
    sum_j (2j - n - 1) x_(j)."""
    n, m = float(len(xs)), float(len(ys))
    sx, sy = np.sort(xs), np.sort(ys)
    px = np.concatenate([[0.0], np.cumsum(sx)])
    # A: for each y, sum_i |x_i - y| with k = #x <= y
    k = np.searchsorted(sx, sy, side="right").astype(np.float64)
    tot = px[-1]
    a_sum = ((k * sy - px[np.searchsorted(sx, sy, side="right")])
             + ((tot - px[np.searchsorted(sx, sy, side="right")])
                - (len(sx) - k) * sy)).sum()
    j = np.arange(1, len(sx) + 1, dtype=np.float64)
    b_sum = 2.0 * ((2.0 * j - n - 1.0) * sx).sum()
    j = np.arange(1, len(sy) + 1, dtype=np.float64)
    c_sum = 2.0 * ((2.0 * j - m - 1.0) * sy).sum()
    a, b, c = a_sum / (n * m), b_sum / (n * n), c_sum / (m * m)
    e = 2.0 * a - b - c
    return {"a_xy": a, "b_xx": b, "c_yy": c, "e_dist": e,
            "e_stat": n * m / (n + m) * e}


def q_energy_distance(sf_dir: str):
    """Energy-distance two-sample test (Szekely & Rizzo 2004) for every
    unordered event-type pair over the unpaired 6dp hourly-mean samples
    — the metric-space distributional comparison completing the
    KS (sup) / AD (tail-weighted quadratic) / energy (first-moment
    metric) trio. Engine side is O(n log n) via sorted prefix sums; the
    oracle replays the same V-statistics as self-join averages."""
    t1h = _hourly(sf_dir)
    by = {k: g["m"].to_numpy(dtype=np.float64)
          for k, g in t1h.groupby("event_type")}
    rows = []
    keys = sorted(by)
    for i, ex in enumerate(keys):
        for ey in keys[i + 1:]:
            xs, ys = by[ex], by[ey]
            if len(xs) < 5 or len(ys) < 5:
                continue
            rows.append({"event_x": ex, "event_y": ey,
                         "n_x": len(xs), "n_y": len(ys),
                         **energy_distance_kernel(xs, ys)})
    out = pd.DataFrame(rows)
    for c in ("n_x", "n_y"):
        out[c] = out[c].astype("int64")
    for c in ("a_xy", "b_xx", "c_yy", "e_dist", "e_stat"):
        out[c] = stable_round6(out[c].astype(float))
    return out.sort_values(["event_x", "event_y"]).reset_index(drop=True)


_SQL_ENERGY = _HOURLY_CTE + """,
tl AS (SELECT event_type, COUNT(*) AS n FROM hourly GROUP BY 1),
pp AS (
  SELECT a.event_type AS event_x, b.event_type AS event_y,
         a.n AS n1, b.n AS n2
  FROM tl a JOIN tl b ON a.event_type < b.event_type
  WHERE a.n >= 5 AND b.n >= 5
),
axy AS (
  SELECT pp.event_x, pp.event_y, AVG(ABS(hx.m - hy.m)) AS a_xy
  FROM pp
  JOIN hourly hx ON hx.event_type = pp.event_x
  JOIN hourly hy ON hy.event_type = pp.event_y
  GROUP BY 1, 2
),
self_d AS (
  SELECT a.event_type, AVG(ABS(a.m - b.m)) AS d
  FROM hourly a JOIN hourly b ON a.event_type = b.event_type
  GROUP BY 1
)
SELECT pp.event_x, pp.event_y,
       CAST(pp.n1 AS BIGINT) AS n_x, CAST(pp.n2 AS BIGINT) AS n_y,
       ROUND(ROUND(axy.a_xy, 9), 6) AS a_xy,
       ROUND(ROUND(sx.d, 9), 6) AS b_xx,
       ROUND(ROUND(sy.d, 9), 6) AS c_yy,
       ROUND(ROUND(2.0 * axy.a_xy - sx.d - sy.d, 9), 6) AS e_dist,
       ROUND(ROUND(pp.n1::DOUBLE * pp.n2 / (pp.n1 + pp.n2)
             * (2.0 * axy.a_xy - sx.d - sy.d), 9), 6) AS e_stat
FROM pp
JOIN axy USING (event_x, event_y)
JOIN self_d sx ON sx.event_type = pp.event_x
JOIN self_d sy ON sy.event_type = pp.event_y
ORDER BY pp.event_x, pp.event_y
"""


# ------------------------------------------------------------- robust scale


def robust_scale_kernel(x: np.ndarray) -> dict[str, float]:
    """Robust scale battery: MAD (median absolute deviation), Qn
    (Rousseeuw & Croux 1993 — k-th order statistic of pairwise
    distances, k = C(h,2), h = n//2 + 1), and the biweight midvariance
    (Lax 1985, c = 9)."""
    n = len(x)
    med = np.median(x)
    mad = np.median(np.abs(x - med))
    # Qn: exact k-th smallest of the n(n-1)/2 pairwise |xi - xj|, i < j
    d = np.abs(x[:, None] - x[None, :])[np.triu_indices(n, k=1)]
    h = n // 2 + 1
    k = h * (h - 1) // 2
    qn = np.partition(d, k - 1)[k - 1]
    # biweight midvariance, u = (x - med) / (9 MAD), |u| < 1
    u = (x - med) / (9.0 * mad) if mad > 0 else np.zeros(n)
    w = np.abs(u) < 1.0
    num = float(n) * ((x - med) ** 2 * (1 - u * u) ** 4)[w].sum()
    den = (((1 - u * u) * (1 - 5 * u * u))[w].sum()) ** 2
    return {"mad": mad, "mad_scaled": 1.4826 * mad,
            "qn": qn, "qn_scaled": 2.2219 * qn,
            "biweight_midvar": num / den}


def q_robust_scale(sf_dir: str):
    """Robust scale estimators per event_type on the 6dp hourly means:
    MAD (50% breakdown, 37% efficiency), Qn (50% breakdown, 82%
    efficiency, no location estimate needed — Rousseeuw & Croux 1993),
    and the biweight midvariance (Lax 1985). The robust complement to
    sstats' classical sd; Qn's pairwise order statistic replays
    exactly in SQL as an i<j self-join ROW_NUMBER rank."""
    t1h = _hourly(sf_dir)
    rows = []
    for key, g in t1h.groupby("event_type", sort=True):
        x = g["m"].to_numpy(dtype=np.float64)
        if len(x) < 10:
            continue
        rows.append({"event_type": key, "n": len(x), **robust_scale_kernel(x)})
    out = pd.DataFrame(rows)
    out["n"] = out["n"].astype("int64")
    for c in ("mad", "mad_scaled", "qn", "qn_scaled", "biweight_midvar"):
        out[c] = stable_round6(out[c].astype(float))
    return out.sort_values("event_type").reset_index(drop=True)


_SQL_ROBUST_SCALE = _HOURLY_CTE + """,
med AS (
  SELECT event_type, COUNT(*) AS n, MEDIAN(m) AS med
  FROM hourly GROUP BY 1 HAVING COUNT(*) >= 10
),
madt AS (
  SELECT h.event_type, med.n, med.med, MEDIAN(ABS(h.m - med.med)) AS mad
  FROM hourly h JOIN med USING (event_type) GROUP BY 1, 2, 3
),
pos AS (
  SELECT event_type, m,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY m) AS r
  FROM hourly
),
pd_rank AS (
  SELECT a.event_type, ABS(a.m - b.m) AS d,
         ROW_NUMBER() OVER (PARTITION BY a.event_type ORDER BY ABS(a.m - b.m)) AS rd
  FROM pos a JOIN pos b ON a.event_type = b.event_type AND a.r < b.r
),
qn AS (
  SELECT p.event_type, p.d AS qn
  FROM pd_rank p JOIN med USING (event_type)
  WHERE p.rd = ((med.n // 2 + 1) * (med.n // 2)) // 2
),
bw AS (
  SELECT h.event_type,
         MAX(mt.n)::DOUBLE
           * SUM(CASE WHEN mt.mad > 0 AND ABS((h.m - mt.med) / (9.0 * mt.mad)) < 1
                 THEN POW(h.m - mt.med, 2)
                      * POW(1 - POW((h.m - mt.med) / (9.0 * mt.mad), 2), 4)
                 ELSE 0 END)
           / POW(SUM(CASE WHEN mt.mad > 0 AND ABS((h.m - mt.med) / (9.0 * mt.mad)) < 1
                 THEN (1 - POW((h.m - mt.med) / (9.0 * mt.mad), 2))
                      * (1 - 5 * POW((h.m - mt.med) / (9.0 * mt.mad), 2))
                 ELSE 0 END), 2) AS biweight_midvar
  FROM hourly h JOIN madt mt USING (event_type) GROUP BY 1
)
SELECT mt.event_type, CAST(mt.n AS BIGINT) AS n,
       ROUND(ROUND(mt.mad, 9), 6) AS mad,
       ROUND(ROUND(1.4826 * mt.mad, 9), 6) AS mad_scaled,
       ROUND(ROUND(qn.qn, 9), 6) AS qn,
       ROUND(ROUND(2.2219 * qn.qn, 9), 6) AS qn_scaled,
       ROUND(ROUND(bw.biweight_midvar, 9), 6) AS biweight_midvar
FROM madt mt JOIN qn USING (event_type) JOIN bw USING (event_type)
ORDER BY mt.event_type
"""


# --------------------------------------------------------- isotonic (PAVA)


def pava_kernel(y: np.ndarray) -> np.ndarray:
    """Pool-adjacent-violators for an increasing isotonic fit: stack of
    (sum, count) blocks, merge while the previous block mean exceeds
    the new one; fitted value = block mean. Equals the minimax formula
    fitted_i = max_{j<=i} min_{k>=i} mean(y[j..k]) (Robertson/Wright/
    Dykstra 1988), which is what the SQL oracle replays."""
    sums: list[float] = []
    cnts: list[int] = []
    for v in y:
        s, c = float(v), 1
        while sums and sums[-1] / cnts[-1] >= s / c:
            s += sums.pop()
            c += cnts.pop()
        sums.append(s)
        cnts.append(c)
    out = np.empty(len(y), dtype=np.float64)
    pos = 0
    for s, c in zip(sums, cnts):
        out[pos:pos + c] = s / c
        pos += c
    return out


def q_isotonic_fit(sf_dir: str):
    """Increasing isotonic regression (PAVA) of the 6dp DAILY means on
    time per event_type — monotone trend extraction whose exact SQL
    oracle is the O(n^2) minimax closed form over prefix-sum range
    means (the engine runs the O(n) pool-adjacent-violators stack;
    equality of the two is the classical representation theorem)."""
    from .queries import _fused_tier

    t1d = _fused_tier(sf_dir, "1d").to_pandas()
    t1d["m"] = stable_round6(t1d["mean"].astype(float))
    rows = []
    for key, g in t1d.groupby("event_type", sort=True):
        g = g.sort_values("bucket_ts")
        y = g["m"].to_numpy(dtype=np.float64)
        fit = pava_kernel(y)
        rows.append(pd.DataFrame({
            "event_type": key,
            "bucket_ts": pd.to_datetime(g["bucket_ts"]).astype("datetime64[us]"),
            "m": y, "fitted": fit}))
    out = pd.concat(rows, ignore_index=True)
    out["fitted"] = stable_round6(out["fitted"].astype(float))
    return out.sort_values(["event_type", "bucket_ts"]).reset_index(drop=True)


_SQL_ISOTONIC = """
WITH daily AS (
  SELECT event_type, time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
pos AS (
  SELECT event_type, bts, m,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bts) AS p,
         SUM(m) OVER (PARTITION BY event_type ORDER BY bts) AS cs
  FROM daily
),
rng AS (
  SELECT a.event_type, a.p AS j, b.p AS k,
         (b.cs - a.cs + a.m) / (b.p - a.p + 1) AS rmean
  FROM pos a JOIN pos b
    ON a.event_type = b.event_type AND b.p >= a.p
),
rmin AS (
  SELECT event_type, j, k,
         MIN(rmean) OVER (PARTITION BY event_type, j
                          ORDER BY k DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS minov
  FROM rng
),
fit AS (
  SELECT event_type, k AS p, MAX(minov) AS fitted
  FROM rmin GROUP BY 1, 2
)
SELECT pos.event_type, pos.bts AS bucket_ts, pos.m,
       ROUND(ROUND(fit.fitted, 9), 6) AS fitted
FROM pos JOIN fit ON fit.event_type = pos.event_type AND fit.p = pos.p
ORDER BY pos.event_type, pos.bts
"""


# -------------------------------------------------------------- GARCH(1,1)

_GARCH_ALPHAS = np.round(np.arange(0.0, 0.32, 0.02), 2)
_GARCH_BETAS = np.round(np.arange(0.30, 0.99, 0.02), 2)


def garch11_grid_kernel(e: np.ndarray) -> dict[str, float]:
    """GARCH(1,1) by variance targeting + Gaussian quasi-likelihood
    grid search (Bollerslev 1986; Engle & Mezrich 1996 targeting):
    omega = var (1 - alpha - beta), sigma2_1 = var, recursion
    sigma2_t = omega + alpha e2_{t-1} + beta sigma2_{t-1}; pick the
    (alpha, beta) grid point maximizing the QMLE log-likelihood
    (deterministic lowest-(alpha,beta) tie-break). Iterative + grid
    semantics, hence rows-only (no SQL oracle)."""
    n = len(e)
    var = float((e * e).sum() / n)
    e2 = e * e
    aa, bb = np.meshgrid(_GARCH_ALPHAS, _GARCH_BETAS, indexing="ij")
    aa, bb = aa.ravel(), bb.ravel()
    keep = aa + bb < 0.999
    aa, bb = aa[keep], bb[keep]
    omega = var * (1.0 - aa - bb)
    # recursion sequential in t, vectorized across the whole grid
    s2 = np.full(aa.shape, var)
    ll = -0.5 * (np.log(2.0 * np.pi) + np.log(s2) + e2[0] / s2)
    for t in range(1, n):
        s2 = omega + aa * e2[t - 1] + bb * s2
        ll += -0.5 * (np.log(2.0 * np.pi) + np.log(s2) + e2[t] / s2)
    # argmax with deterministic lowest-(alpha, beta) tie-break: grid is
    # enumerated ascending, argmax takes the first maximum
    i = int(np.argmax(np.round(ll, 9)))
    return {"omega": float(omega[i]), "alpha": float(aa[i]),
            "beta": float(bb[i]), "persistence": float(aa[i] + bb[i]),
            "loglik": float(ll[i]), "uncond_var": var}


def q_garch11(sf_dir: str):
    """GARCH(1,1) volatility fit per event_type on the demeaned 6dp
    hourly means (variance-targeted Gaussian QMLE over a fixed
    (alpha, beta) grid). Volatility-clustering quantification following
    the arch_lm detection test. Rows-only by design (sequential
    recursion + argmax grid); kernels pinned by planted-parameter
    recovery tests."""
    t1h = _hourly(sf_dir)
    rows = []
    for key, g in t1h.groupby("event_type", sort=True):
        m = g.sort_values("bucket_ts")["m"].to_numpy(dtype=np.float64)
        if len(m) < 50:
            continue
        e = m - m.sum() / len(m)
        rows.append({"event_type": key, "n": len(m), **garch11_grid_kernel(e)})
    out = pd.DataFrame(rows)
    out["n"] = out["n"].astype("int64")
    for c in ("omega", "alpha", "beta", "persistence", "loglik", "uncond_var"):
        out[c] = stable_round6(out[c].astype(float))
    return out.sort_values("event_type").reset_index(drop=True)


_register("energy_distance", q_energy_distance, _SQL_ENERGY)
_register("robust_scale", q_robust_scale, _SQL_ROBUST_SCALE)
_register("isotonic_fit", q_isotonic_fit, _SQL_ISOTONIC)
_register("garch11", q_garch11)
