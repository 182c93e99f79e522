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


STAT_QUERIES: dict[str, Any] = {
    "arch_lm": q_arch_lm,
    "gpd_pot": q_gpd_pot,
    "hac_trend": q_hac_trend,
    "ad_twosample": q_ad_twosample,
    "grouping_sets_agg": q_grouping_sets,
}

STAT_ORACLE: dict[str, str] = {
    "arch_lm": _SQL_ARCH_LM,
    "gpd_pot": _SQL_GPD_POT,
    "hac_trend": _SQL_HAC_TREND,
    "ad_twosample": _SQL_AD_TWOSAMPLE,
    "grouping_sets_agg": _SQL_GROUPING_SETS,
}
