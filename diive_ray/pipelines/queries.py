"""Driver-facing query registry: one entry per implemented operator
(SURVEY.md §2), each with a DuckDB-runnable ANSI-SQL oracle where the
semantics are SQL-expressible (driver compares row count + schema +
order-insensitive value hash at sf=0.01).

Conventions shared by BOTH sides so value hashes match:
* identical lowercase column names (aggregates aliased),
* float aggregates rounded to 6 decimals (sum order differs between
  engines in the last ulps),
* deterministic tie-breaks documented per query.

The Ray side always goes through the engine's own stages (rollup
cascade, gap table, outlier kernels, QCF algebra, ...) — the SQL is the
*oracle*, not the implementation.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..schema import US_PER_DAY, US_PER_HOUR
from ..util import round6, stable_round6, ts_to_us
from ..stages import outliers as ol
from ..stages.bucket import make_bucket_assigner
from ..stages.diel import diel_cycle, monthly_matrix
from ..stages.gaps import gap_table
from ..stages.gridagg import grid_aggregate
from ..stages.qcf import qcf_frame
from ..stages.corrections import setto_threshold
from ..stages.timefeatures import add_time_features, keep_daterange
from .rollup import events_cascade_fused


def _fused_tier(sf_dir: str, tier: str, **kw) -> "rd.Dataset":
    """One tier from the single-exchange fused cascade (rollup.py)."""
    fused = events_cascade_fused(sf_dir, **kw)
    return fused.filter(expr=f"tier == '{tier}'").drop_columns(["tier", "n_child"])


def _events(sf_dir: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=columns)


def _round6(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    for c in cols:
        df[c] = round6(df[c].astype(float))
    return df


def _tier_result(ds: rd.Dataset, key: str = "event_type") -> pd.DataFrame:
    df = ds.to_pandas()
    if df.empty:
        df = pd.DataFrame(columns=[key, "bucket_ts", "count", "sum", "min", "max", "mean"])
    out = pd.DataFrame(
        {
            key: df[key],
            "bucket_ts": pd.to_datetime(df["bucket_ts"]).astype("datetime64[us]"),
            "n": df["count"].astype("int64"),
            "sum_value": df["sum"],
            "min_value": df["min"],
            "max_value": df["max"],
            "mean_value": df["mean"],
        }
    )
    # stable (9-then-6) rounding: tier means are sums-of-partials whose
    # last-ulp summation order differs from the oracle's; a mean landing
    # exactly on a 6-decimal half-boundary (observed: 56.4009375) flips
    # the driver hash under plain round6
    out["sum_value"] = stable_round6(out["sum_value"].astype(float))
    out["mean_value"] = stable_round6(out["mean_value"].astype(float))
    return out


# --------------------------------------------------------------- resampling


def q_resample_1h(sf_dir: str):
    """Tier rollup, 1-hour buckets per event_type (resampling.py:94-197
    semantics, point-event convention [start,end) labeled end) — via the
    single-exchange fused cascade (rollup.py:cascade_fused)."""
    return _tier_result(_fused_tier(sf_dir, "1h"))


def q_resample_1d(sf_dir: str):
    """1-day tier produced by CASCADING 1m->1h->1d (resample-of-resample,
    resampling.py:47-90) — oracle aggregates raw directly; equality
    proves the cascade is lossless."""
    return _tier_result(_fused_tier(sf_dir, "1d"))


def q_resample_1d_mincount(sf_dir: str):
    """1d tier keeping only days with >= 6 contributing hour-buckets
    (min-count masking on child buckets, resampling.py:161-171/47-90:
    mincounts = max(1, int(24 * 0.25)))."""
    return _tier_result(_fused_tier(sf_dir, "1d", coarse_mincounts_perc={"1d": 0.25}))


_SQL_TIER = """
SELECT event_type,
       time_bucket(INTERVAL '{iv}', ts) + INTERVAL '{iv}' AS bucket_ts,
       COUNT(value) AS n,
       ROUND(ROUND(SUM(value), 9), 6) AS sum_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value,
       ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS mean_value
FROM events
GROUP BY 1, 2
HAVING COUNT(value) > 0
"""

_SQL_TIER_1D_MINC = """
WITH h AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bucket_ts,
         COUNT(value) AS n, SUM(value) AS s, MIN(value) AS mn, MAX(value) AS mx
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
)
SELECT event_type,
       CAST(time_bucket(INTERVAL '1 day', bucket_ts - INTERVAL '1 microsecond') + INTERVAL '1 day' AS TIMESTAMP) AS bucket_ts,
       CAST(SUM(n) AS BIGINT) AS n,
       ROUND(ROUND(SUM(s), 9), 6) AS sum_value,
       MIN(mn) AS min_value,
       MAX(mx) AS max_value,
       ROUND(ROUND(SUM(s) / SUM(n), 9), 6) AS mean_value
FROM h GROUP BY 1, 2 HAVING COUNT(*) >= 6
"""


# --------------------------------------------------------------- diel cycle


def q_diel_cycle(sf_dir: str):
    """Diel cycle per event_type x hour-of-day (resampling.py:200-262):
    count/mean/std(ddof=1)/median/min/max."""
    ds = _events(sf_dir, ["event_type", "ts", "value"])
    out = diel_cycle(
        ds, value_col="value", keys=["event_type"], mincounts=1,
        quantiles=False, minmax=True, std=True, phase="hour",
    ).to_pandas()
    out = out.rename(columns={"TIME": "hour", "count": "n", "mean": "mean_value",
                              "std": "std_value", "median": "median_value",
                              "min": "min_value", "max": "max_value"})
    out = out.drop(columns=[c for c in ("mean+sd", "mean-sd") if c in out.columns])
    out["n"] = out["n"].astype("int64")
    out["hour"] = out["hour"].astype("int64")
    return _round6(out, ["mean_value", "std_value", "median_value"])


_SQL_DIEL = """
SELECT event_type,
       CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
       COUNT(value) AS n,
       ROUND(SUM(value) / COUNT(value), 6) AS mean_value,
       ROUND(STDDEV_SAMP(value), 6) AS std_value,
       ROUND(MEDIAN(value), 6) AS median_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events GROUP BY 1, 2
"""


def q_diel_cycle_monthly(sf_dir: str):
    """Diel cycle per event_type x month x hour (resampling.py:200-262
    each_month=True): count/mean/median."""
    ds = _events(sf_dir, ["event_type", "ts", "value"])
    out = diel_cycle(
        ds, value_col="value", keys=["event_type"], each_month=True, mincounts=1,
        quantiles=False, minmax=False, std=False, phase="hour",
    ).to_pandas()
    out = out.rename(columns={"TIME": "hour", "MONTH": "month", "count": "n",
                              "mean": "mean_value", "median": "median_value"})
    out["n"] = out["n"].astype("int64")
    out["hour"] = out["hour"].astype("int64")
    out["month"] = out["month"].astype("int64")
    return _round6(out, ["mean_value", "median_value"]).reset_index(drop=True)


_SQL_DIEL_MONTHLY = """
SELECT event_type,
       CAST(EXTRACT(month FROM ts) AS BIGINT) AS month,
       CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
       COUNT(value) AS n,
       ROUND(SUM(value) / COUNT(value), 6) AS mean_value,
       ROUND(MEDIAN(value), 6) AS median_value
FROM events GROUP BY 1, 2, 3
"""


def q_zscore_daynight(sf_dir: str):
    """Day/night-split z-score (zscore.py day/night variant: mean/std
    computed per daytime subset; |z| > 2.5, single pass, ddof=0) —
    daytime from the potential-radiation flag (functions/solar.py)."""
    from ..functions.solar import daytime_flag
    from ..stages.exchange import driver_combine
    from ..util import ts_to_us

    ds = _events(sf_dir, ["event_id", "event_type", "ts", "value"])

    def add_flag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["is_day"] = daytime_flag(ts_to_us(df["ts"]), 47.0, 8.5).astype(np.int64)
        return df

    flagged = ds.map_batches(add_flag, batch_format="pandas")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["value"].notna()]
        v = d["value"].astype(float)
        return (
            d.assign(_v=v, _v2=v * v)
            .groupby(["event_type", "is_day"], as_index=False)
            .agg(n=("_v", "count"), s=("_v", "sum"), s2=("_v2", "sum"))
        )

    mom = driver_combine(
        flagged, partial,
        lambda df: df.groupby(["event_type", "is_day"], as_index=False)[["n", "s", "s2"]].sum(),
        batch_format="pandas",
    )
    mom["mean"] = mom["s"] / mom["n"]
    mom["std"] = np.sqrt(np.maximum(mom["s2"] / mom["n"] - mom["mean"] ** 2, 0.0))
    import ray as _ray

    st_ref = _ray.put(mom[["event_type", "is_day", "mean", "std"]])

    class Mask:
        def __init__(self):
            self.stats = _ray.get(st_ref)  # broadcast once per actor

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            # vectorized merge (no per-row dict lookups)
            m = df.merge(self.stats, on=["event_type", "is_day"], how="left")
            v = m["value"].astype(float).to_numpy()
            with np.errstate(invalid="ignore", divide="ignore"):
                z = np.abs((v - m["mean"].to_numpy()) / m["std"].to_numpy())
            out = m[(~np.isnan(v)) & (z > 2.5)]
            return out[["event_id", "event_type", "is_day", "value"]]

    out = flagged.map_batches(Mask, batch_format="pandas", concurrency=(1, 8)).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


_SQL_ZSCORE_DAYNIGHT = """
WITH f AS (
  SELECT event_id, event_type, value,
         CASE WHEN 1367.0 * GREATEST(
           sin(radians(47.0)) * sin(radians(-23.44) * cos(2 * pi() * (((epoch(ts) / 86400.0) % 365.25) + 10.0) / 365.25))
           + cos(radians(47.0)) * cos(radians(-23.44) * cos(2 * pi() * (((epoch(ts) / 86400.0) % 365.25) + 10.0) / 365.25))
             * cos(radians(15.0 * ((((epoch(ts) % 86400) / 3600.0) + 8.5 / 15.0) - 12.0))),
           0.0) > 20.0 THEN 1 ELSE 0 END AS is_day
  FROM events
), z AS (
  SELECT *, AVG(value) OVER w AS mu, STDDEV_POP(value) OVER w AS sd
  FROM f WINDOW w AS (PARTITION BY event_type, is_day)
)
SELECT event_id, event_type, CAST(is_day AS BIGINT) AS is_day, value
FROM z WHERE value IS NOT NULL AND ABS((value - mu) / sd) > 2.5
"""


# ---------------------------------------------------------------- gap table


def q_gap_table_1h(sf_dir: str):
    """Consecutive empty 1h buckets per event_type
    (gapfinder.py:114-147 over the regularized 1h tier)."""
    t1h = _fused_tier(sf_dir, "1h")
    gt = gap_table(t1h, US_PER_HOUR, keys=("event_type",), value_col="mean").to_pandas()
    if gt.empty:
        # all groups gapless -> Ray loses the (empty) schema; rebuild it
        gt = pd.DataFrame(columns=["event_type", "GAP_START", "GAP_END", "GAP_LENGTH"])
    out = gt.rename(columns={"GAP_START": "gap_start", "GAP_END": "gap_end", "GAP_LENGTH": "gap_length"})
    out["gap_start"] = pd.to_datetime(out["gap_start"]).astype("datetime64[us]")
    out["gap_end"] = pd.to_datetime(out["gap_end"]).astype("datetime64[us]")
    out["gap_length"] = out["gap_length"].astype("int64")
    return out


_SQL_GAPS_1H = """
WITH b AS (
  SELECT DISTINCT event_type,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bucket_ts
  FROM events WHERE value IS NOT NULL
), l AS (
  SELECT event_type, bucket_ts,
         LAG(bucket_ts) OVER (PARTITION BY event_type ORDER BY bucket_ts) AS prev
  FROM b
)
SELECT event_type,
       prev + INTERVAL '1 hour' AS gap_start,
       bucket_ts - INTERVAL '1 hour' AS gap_end,
       CAST(date_diff('hour', prev, bucket_ts) - 1 AS BIGINT) AS gap_length
FROM l
WHERE prev IS NOT NULL AND date_diff('hour', prev, bucket_ts) > 1
"""


# ------------------------------------------------------------------ outliers


def q_zscore_outliers(sf_dir: str):
    """Global z-score outliers per event_type, single pass, |z| > 2,
    ddof=0 (zscore.py:164-189, funcs.py:62) — via the distributed
    two-pass aggregate+mask stage."""
    ds = _events(sf_dir, ["event_id", "event_type", "value"])
    flagged = ol.zscore_global_distributed(
        ds, value_col="value", keys=("event_type",), thres_zscore=2.0, repeat=False
    )
    out = flagged.to_pandas()
    out = out[out["FLAG_value_ZSCORE_TEST"] == 2][["event_id", "event_type", "value"]]
    return out.reset_index(drop=True)


_SQL_ZSCORE = """
WITH s AS (
  SELECT event_id, event_type, value,
         (value - AVG(value) OVER (PARTITION BY event_type))
           / STDDEV_POP(value) OVER (PARTITION BY event_type) AS z
  FROM events WHERE value IS NOT NULL
)
SELECT event_id, event_type, value FROM s WHERE ABS(z) > 2.0
"""


def q_abs_limits(sf_dir: str):
    """AbsoluteLimits: rows outside [1, 300] (absolutelimits.py:188-202)."""
    ds = _events(sf_dir, ["event_id", "event_type", "ts", "value"])
    flagged = ds.map_batches(
        lambda df: df.assign(flag=ol.abs_limits_flag(df["value"], 1.0, 300.0).to_numpy()),
        batch_format="pandas",
    )
    out = flagged.to_pandas()
    return out[out["flag"] == 2][["event_id", "event_type", "value"]].reset_index(drop=True)


_SQL_ABS_LIMITS = """
SELECT event_id, event_type, value FROM events WHERE value < 1.0 OR value > 300.0
"""


def q_trimlow(sf_dir: str):
    """TrimLow (trim.py:237-260): reject values < 5.0 plus an equal count
    of the highest values. Distributed: tiny count aggregate + global
    sort().limit(k) for the top side. Tie-break: (value DESC, event_id)
    (the reference trims by position; ties are resolved by id here)."""
    ds = _events(sf_dir, ["event_id", "value"])
    n_below = ds.map_batches(
        lambda t: pa.table({"c": [pc.sum(pc.less(t["value"], 5.0)).as_py() or 0]}),
        batch_format="pyarrow",
    ).sum("c")
    low = ds.map_batches(
        lambda t: t.filter(pc.less(t["value"], 5.0)), batch_format="pyarrow"
    ).to_pandas()
    top = (
        ds.map_batches(lambda t: t.filter(pc.is_valid(t["value"])), batch_format="pyarrow")
        .sort(["value", "event_id"], descending=[True, False])
        .limit(int(n_below))
        .to_pandas()
    )
    out = pd.concat([low, top]).drop_duplicates(subset="event_id")
    return out[["event_id", "value"]].sort_values("event_id").reset_index(drop=True)


_SQL_TRIMLOW = """
WITH below AS (SELECT COUNT(*) AS c FROM events WHERE value < 5.0),
ranked AS (
  SELECT event_id, value,
         ROW_NUMBER() OVER (ORDER BY value DESC, event_id) AS rn
  FROM events WHERE value IS NOT NULL
)
SELECT event_id, value FROM events WHERE value < 5.0
UNION
SELECT event_id, value FROM ranked WHERE rn <= (SELECT c FROM below)
"""


# ---------------------------------------------------------------- screening


def q_screening_chain(sf_dir: str):
    """The §3.1 meteoscreening lifecycle end-to-end
    (pipelines/screening.py): cap at 280 -> missing flag -> absolute
    limits [5, 270] -> single-pass z-score (|z| > 2.5) on the
    progressively cleaned series -> QCF -> 1h rollup of the
    QCF-filtered values."""
    from ..schema import US_PER_HOUR
    from .screening import ScreeningSpec, screen

    ds = _events(sf_dir, ["event_type", "ts", "value"])
    spec = ScreeningSpec(
        value_col="value",
        keys=("event_type",),
        cap_max=280.0,
        tests=[
            ("missing", {}),
            ("abs_limits", {"minval": 5.0, "maxval": 270.0}),
            ("zscore", {"thres_zscore": 2.5, "repeat": False}),
        ],
        resample_width_us=US_PER_HOUR,
        end_stamped=False,
    )
    out = screen(ds, spec).to_pandas()
    res = pd.DataFrame({
        "event_type": out["event_type"],
        "bucket_ts": pd.to_datetime(out["bucket_ts"]).astype("datetime64[us]"),
        "n": out["count"].astype("int64"),
        "mean_value": out["mean"],
        "min_value": out["min"],
        "max_value": out["max"],
    })
    return _round6(res, ["mean_value"]).reset_index(drop=True)


_SQL_SCREENING = """
WITH c AS (
  SELECT event_type, ts, LEAST(value, 280.0) AS v FROM events
), f1 AS (
  SELECT *, CASE WHEN v IS NULL THEN 2 ELSE 0 END AS f_missing,
         CASE WHEN v < 5.0 OR v > 270.0 THEN 2 ELSE 0 END AS f_abs
  FROM c
), w AS (
  SELECT *, CASE WHEN f_missing = 0 AND f_abs = 0 THEN v END AS v1 FROM f1
), z AS (
  SELECT *, AVG(v1) OVER (PARTITION BY event_type) AS mu,
         STDDEV_POP(v1) OVER (PARTITION BY event_type) AS sd
  FROM w
), f2 AS (
  SELECT *, CASE WHEN v1 IS NOT NULL AND ABS((v1 - mu) / sd) > 2.5 THEN 2 ELSE 0 END AS f_z
  FROM z
), filt AS (
  SELECT event_type, ts,
         CASE WHEN f_missing = 0 AND f_abs = 0 AND f_z = 0 THEN v END AS fv
  FROM f2
)
SELECT event_type,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bucket_ts,
       COUNT(fv) AS n,
       ROUND(SUM(fv) / COUNT(fv), 6) AS mean_value,
       MIN(fv) AS min_value,
       MAX(fv) AS max_value
FROM filt GROUP BY 1, 2 HAVING COUNT(fv) > 0
"""


# ---------------------------------------------------------------- gap-fill


def q_gapfill_linear_1h(sf_dir: str):
    """Linear interpolation with gap-length limit over the regularized 1h
    tier (interpolate.py:154-164 semantics: fill only runs <= limit,
    longer gaps stay null; stages/gaps.py:gapfill_rollup with the
    rolling-median pass disabled). fill_method: 0 observed, 1 linear."""
    from ..stages.gaps import gapfill_rollup

    filled = gapfill_rollup(
        _fused_tier(sf_dir, "1h"), US_PER_HOUR, keys=("event_type",), value_col="mean",
        interp_limit=2, rmed_window=None,
    ).to_pandas()
    out = pd.DataFrame({
        "event_type": filled["event_type"],
        "bucket_ts": pd.to_datetime(filled["bucket_ts"]).astype("datetime64[us]"),
        "value_filled": filled["mean_filled"],
        "fill_method": filled["fill_method"],
    })
    return _round6(out, ["value_filled"]).reset_index(drop=True)


_SQL_GAPFILL_1H = """
WITH t AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bucket_ts,
         SUM(value) / COUNT(value) AS v
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
), span AS (
  SELECT event_type, MIN(bucket_ts) AS lo, MAX(bucket_ts) AS hi FROM t GROUP BY 1
), grid AS (
  SELECT s.event_type, g.ts AS bucket_ts
  FROM span s, LATERAL (SELECT unnest(generate_series(s.lo, s.hi, INTERVAL '1 hour')) AS ts) g
), j AS (
  SELECT g.event_type, g.bucket_ts, t.v,
         ROW_NUMBER() OVER (PARTITION BY g.event_type ORDER BY g.bucket_ts) AS pos
  FROM grid g LEFT JOIN t ON t.event_type = g.event_type AND t.bucket_ts = g.bucket_ts
), w AS (
  SELECT *,
    last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY pos
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    last_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY pos
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp,
    first_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY pos
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY pos
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS np
  FROM j
)
SELECT event_type, bucket_ts,
       ROUND(CASE
         WHEN v IS NOT NULL THEN v
         WHEN pv IS NOT NULL AND nv IS NOT NULL AND (np - pp - 1) <= 2
           THEN pv + (nv - pv) * (pos - pp) / (np - pp)
         ELSE NULL END, 6) AS value_filled,
       CASE WHEN v IS NOT NULL THEN 0.0
            WHEN pv IS NOT NULL AND nv IS NOT NULL AND (np - pp - 1) <= 2 THEN 1.0
            ELSE NULL END AS fill_method
FROM w
"""


# ---------------------------------------------------------- hampel / rolling


def q_hampel_noniter(sf_dir: str):
    """Hampel filter, single pass (no convergence loop), window 49
    centered, min_periods=1, double-differencing on (hampel.py:199-243)
    per event_type over non-null values ordered (ts, event_id)."""
    ds = _events(sf_dir, ["event_id", "event_type", "ts", "value"])

    def gfn(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["value"].notna()].sort_values(["ts", "event_id"], kind="stable").reset_index(drop=True)
        flag = ol.hampel_flag(df["value"].astype(float), window_length=49, n_sigma=5.5,
                              use_differencing=True, repeat=False)
        df["flag"] = flag.to_numpy()
        return df[df["flag"] == 2][["event_id", "event_type", "value"]]

    from ..stages.exchange import grouped_block_map

    out = grouped_block_map(ds, ["event_type"], gfn).to_pandas()
    if out.empty:
        out = pd.DataFrame(columns=["event_id", "event_type", "value"])
        out["event_id"] = out["event_id"].astype("int64")
        out["value"] = out["value"].astype(float)
    return out.sort_values("event_id").reset_index(drop=True)


_SQL_HAMPEL = """
WITH s AS (
  SELECT event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS pos
  FROM events WHERE value IS NOT NULL
), d AS (
  SELECT *,
    COALESCE(
      (value - lag(value) OVER w) - (lead(value) OVER w - value), 0.0) AS dd
  FROM s WINDOW w AS (PARTITION BY event_type ORDER BY pos)
), m AS (
  SELECT *,
    CAST(median(dd) OVER (PARTITION BY event_type ORDER BY pos
      ROWS BETWEEN 24 PRECEDING AND 24 FOLLOWING) AS DOUBLE) AS rmed
  FROM d
), dev AS (
  SELECT *, ABS(dd - rmed) AS adev FROM m
), mad AS (
  SELECT *,
    CAST(median(adev) OVER (PARTITION BY event_type ORDER BY pos
      ROWS BETWEEN 24 PRECEDING AND 24 FOLLOWING) AS DOUBLE) + 1e-6 AS rmad
  FROM dev
)
SELECT event_id, event_type, value FROM mad
WHERE dd > rmed + (1.4826 * rmad) * 5.5 OR dd < rmed - (1.4826 * rmad) * 5.5
ORDER BY event_id
"""


def q_zscore_rolling(sf_dir: str):
    """Rolling z-score outliers, |z| > 3, iterated to convergence
    (zscore.py:247-348). Iterative rolling semantics are not
    SQL-expressible -> rows-only driver check; kernel parity is pinned
    by tests/test_outliers.py against the reference formulas."""
    ds = _events(sf_dir, ["event_id", "event_type", "ts", "value"])
    flagged = ol.flag_outliers(
        ds, "zscore_rolling", value_col="value", keys=("event_type",),
        ts_col="ts", thres_zscore=3.0,
    ).to_pandas()
    out = flagged[flagged["FLAG_value_ZSCORE_ROLLING_TEST"] == 2][["event_id", "event_type", "value"]]
    return out.sort_values("event_id").reset_index(drop=True)


def q_localsd(sf_dir: str):
    """LocalSD outliers (rolling median +- n_sd * rolling SD), iterated
    (localsd.py:46-312) — rows-only driver check (iterative)."""
    ds = _events(sf_dir, ["event_id", "event_type", "ts", "value"])
    flagged = ol.flag_outliers(
        ds, "localsd", value_col="value", keys=("event_type",),
        ts_col="ts", n_sd=4.0,
    ).to_pandas()
    out = flagged[flagged["FLAG_value_LOCALSD_TEST"] == 2][["event_id", "event_type", "value"]]
    return out.sort_values("event_id").reset_index(drop=True)


def q_zscore_increments(sf_dir: str):
    """zScoreIncrements (double-diff z-scores, all-three rule, iterated;
    incremental.py:35-158) — rows-only driver check (iterative)."""
    ds = _events(sf_dir, ["event_id", "event_type", "ts", "value"])
    flagged = ol.flag_outliers(
        ds, "zscore_increments", value_col="value", keys=("event_type",),
        ts_col="ts", thres_zscore=3.0,
    ).to_pandas()
    out = flagged[flagged["FLAG_value_ZSCORE_INCREMENTS_TEST"] == 2][["event_id", "event_type", "value"]]
    return out.sort_values("event_id").reset_index(drop=True)


def _flagged_events_noniter(sf_dir: str, kernel, **kw) -> pd.DataFrame:
    """Shared single-pass (repeat=False) flag query body: per event_type,
    order (ts, event_id), run ``kernel`` once, return flagged rows.
    Mirrors q_hampel_noniter's deterministic-ordering pattern."""
    ds = _events(sf_dir, ["event_id", "event_type", "ts", "value"])
    drop_null = kw.pop("_drop_null", True)

    def gfn(df: pd.DataFrame) -> pd.DataFrame:
        if drop_null:
            df = df[df["value"].notna()]
        df = df.sort_values(["ts", "event_id"], kind="stable").reset_index(drop=True)
        flag = kernel(df["value"].astype(float), repeat=False, **kw)
        df["flag"] = flag.to_numpy()
        return df[df["flag"] == 2][["event_id", "event_type", "value"]]

    from ..stages.exchange import grouped_block_map

    out = grouped_block_map(ds, ["event_type"], gfn).to_pandas()
    if out.empty:
        out = pd.DataFrame(columns=["event_id", "event_type", "value"])
        out["event_id"] = out["event_id"].astype("int64")
        out["value"] = out["value"].astype(float)
    return out.sort_values("event_id").reset_index(drop=True)


def q_zscore_rolling_noniter(sf_dir: str):
    """Rolling z-score, single pass (zscore.py:315-348 with repeat=False):
    centered window 49 mean/std (ddof=1, min_periods=3) over non-null
    values ordered (ts, event_id) per event_type; |z| > 3 -> flagged.
    Exact SQL-window oracle (the iterated variant stays rows-only)."""
    return _flagged_events_noniter(
        sf_dir, ol.zscore_rolling_flag, thres_zscore=3.0, winsize=49)


_SQL_ZSCORE_ROLLING_NI = """
WITH s AS (
  SELECT event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS pos
  FROM events WHERE value IS NOT NULL
), r AS (
  SELECT *,
    AVG(value) OVER w AS rmean,
    STDDEV_SAMP(value) OVER w AS rsd,
    COUNT(*) OVER w AS cnt
  FROM s WINDOW w AS (PARTITION BY event_type ORDER BY pos
                      ROWS BETWEEN 24 PRECEDING AND 24 FOLLOWING)
)
SELECT event_id, event_type, value FROM r
WHERE cnt >= 3 AND rsd > 0 AND ABS(value - rmean) / rsd > 3.0
ORDER BY event_id
"""


def q_localsd_noniter(sf_dir: str):
    """LocalSD, single pass (localsd.py:244-262 with repeat=False):
    rolling median +- n_sd * rolling SD, centered window 49,
    min_periods=3, strict inequalities. Exact SQL-window oracle."""
    return _flagged_events_noniter(
        sf_dir, ol.localsd_flag, n_sd=2.5, winsize=49)


_SQL_LOCALSD_NI = """
WITH s AS (
  SELECT event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS pos
  FROM events WHERE value IS NOT NULL
), r AS (
  SELECT *,
    CAST(median(value) OVER w AS DOUBLE) AS rmed,
    STDDEV_SAMP(value) OVER w AS rsd,
    COUNT(*) OVER w AS cnt
  FROM s WINDOW w AS (PARTITION BY event_type ORDER BY pos
                      ROWS BETWEEN 24 PRECEDING AND 24 FOLLOWING)
)
SELECT event_id, event_type, value FROM r
WHERE cnt >= 3 AND (value > rmed + rsd * 2.5 OR value < rmed - rsd * 2.5)
ORDER BY event_id
"""


def q_zscore_increments_noniter(sf_dir: str):
    """zScoreIncrements, single pass (incremental.py:103-158 with
    repeat=False): prev/next/double diffs on the UNCOMPRESSED series
    (nulls kept in place), inner global z-score (ddof=0) per diff
    series, rejected iff all three |z| > 3. Exact SQL oracle."""
    return _flagged_events_noniter(
        sf_dir, ol.zscore_increments_flag, thres_zscore=3.0,
        _drop_null=False)


_SQL_ZSCORE_INCR_NI = """
WITH s AS (
  SELECT event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS pos
  FROM events
), d AS (
  SELECT *,
    ABS(value - lag(value) OVER w) AS dp,
    ABS(value - lead(value) OVER w) AS dn
  FROM s WINDOW w AS (PARTITION BY event_type ORDER BY pos)
), dd AS (
  SELECT *, dp + dn AS d2 FROM d
), st AS (
  SELECT event_type,
    AVG(dp) AS mdp, STDDEV_POP(dp) AS sdp,
    AVG(dn) AS mdn, STDDEV_POP(dn) AS sdn,
    AVG(d2) AS md2, STDDEV_POP(d2) AS sd2
  FROM dd GROUP BY event_type
)
SELECT event_id, event_type, value
FROM dd JOIN st USING (event_type)
WHERE dp IS NOT NULL AND dn IS NOT NULL AND d2 IS NOT NULL
  AND sdp > 0 AND sdn > 0 AND sd2 > 0
  AND ABS((dp - mdp) / sdp) > 3.0
  AND ABS((dn - mdn) / sdn) > 3.0
  AND ABS((d2 - md2) / sd2) > 3.0
ORDER BY event_id
"""


# --------------------------------------------------------- dedup / keep-last


def q_dedup_keep_last(sf_dir: str):
    """Keep the last record per (user_id, event_type) by ts, tie-break
    max event_id (keep-last dedup semantics, times.py:1409-1459)."""
    ds = _events(sf_dir, ["event_id", "user_id", "event_type", "ts", "value"])

    def keep_last_block(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_type", "ts", "event_id"], kind="stable")
        return df.drop_duplicates(subset=["user_id", "event_type"], keep="last")

    from ..stages.exchange import block_map

    out = block_map(
        ds, ["user_id", "event_type"], keep_last_block,
        batch_format="pandas", zero_copy_batch=False,
    ).to_pandas()
    out["ts"] = pd.to_datetime(out["ts"]).astype("datetime64[us]")
    return out[["user_id", "event_type", "event_id", "ts", "value"]].reset_index(drop=True)


_SQL_DEDUP = """
SELECT user_id, event_type, event_id, ts, value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


# ----------------------------------------------- broadcast aggregate-as-hires


def q_day_mean_as_hires(sf_dir: str):
    """aggregated_as_hires (frames.py:255-316): daily mean per event_type
    broadcast back onto every raw row — tiny aggregate + broadcast dict
    lookup inside map_batches (no shuffle of the hires side)."""
    ds = _events(sf_dir, ["event_id", "event_type", "ts", "value"])
    bucketer = make_bucket_assigner(US_PER_DAY, end_stamped=False)
    from ..stages.exchange import driver_combine

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by(["event_type", "bucket_ts"]).aggregate(
            [("value", "sum"), ("value", "count")]
        )

    daily = driver_combine(
        ds.map_batches(bucketer, batch_format="pyarrow", zero_copy_batch=True).select_columns(
            ["event_type", "bucket_ts", "value"]
        ),
        partial,
        lambda df: df.groupby(["event_type", "bucket_ts"], as_index=False)[
            ["value_sum", "value_count"]
        ].sum(),
    )
    daily["mean(value)"] = daily["value_sum"] / daily["value_count"]
    import ray as _ray

    from ..util import ts_to_us as _tsus

    daily["day_us"] = _tsus(pd.to_datetime(daily["bucket_ts"]))
    lut_ref = _ray.put(daily[["event_type", "day_us", "mean(value)"]].rename(columns={"mean(value)": "day_mean"}))

    class Broadcast:
        def __init__(self):
            self.daily = _ray.get(lut_ref)  # broadcast once per actor

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            from ..util import ts_to_us
            from ..stages.bucket import bucket_end_us

            df = df.copy()
            df["day_us"] = bucket_end_us(ts_to_us(df["ts"]), US_PER_DAY, end_stamped=False)
            # vectorized merge (no per-row dict lookups)
            m = df.merge(self.daily, on=["event_type", "day_us"], how="left")
            return m.drop(columns=["day_us"])

    out = ds.map_batches(Broadcast, batch_format="pandas", concurrency=2).to_pandas()
    out["ts"] = pd.to_datetime(out["ts"]).astype("datetime64[us]")
    out = out[["event_id", "event_type", "ts", "value", "day_mean"]]
    return _round6(out, ["day_mean"]).reset_index(drop=True)


_SQL_DAY_MEAN = """
SELECT event_id, event_type, ts, value,
       ROUND(AVG(value) OVER (PARTITION BY event_type, date_trunc('day', ts)), 6) AS day_mean
FROM events
"""


# ----------------------------------------------------------------------- QCF


def q_qcf(sf_dir: str):
    """QCF flag algebra (qcf.py:637-696): three deterministic test flags
    -> hard/soft sums -> overall 0/1/2 flag."""
    ds = _events(sf_dir, ["event_id", "ts", "value"])

    def flags(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        v = df["value"].astype(float)
        df["FLAG_value_RANGE_TEST"] = np.where((v < 1.0) | (v > 300.0), 2, 0).astype(np.int8)
        df["FLAG_value_HI_TEST"] = np.where(v > 200.0, 1, 0).astype(np.int8)
        df["FLAG_value_NIGHT_TEST"] = np.where(pd.to_datetime(df["ts"]).dt.hour < 6, 1, 0).astype(np.int8)
        return qcf_frame(df)

    out = ds.map_batches(flags, batch_format="pandas").to_pandas()
    out = out[["event_id", "SUM_HARDFLAGS", "SUM_SOFTFLAGS", "FLAG_QCF_TEST"]]
    out.columns = ["event_id", "sum_hardflags", "sum_softflags", "flag_qcf"]
    for c in ("sum_hardflags", "sum_softflags", "flag_qcf"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


_SQL_QCF = """
WITH f AS (
  SELECT event_id,
         CASE WHEN value < 1.0 OR value > 300.0 THEN 2 ELSE 0 END AS f_range,
         CASE WHEN value > 200.0 THEN 1 ELSE 0 END AS f_hi,
         CASE WHEN EXTRACT(hour FROM ts) < 6 THEN 1 ELSE 0 END AS f_night
  FROM events
), s AS (
  SELECT event_id,
         (CASE WHEN f_range = 2 THEN 2 ELSE 0 END) AS sum_hardflags,
         (CASE WHEN f_range = 1 THEN 1 ELSE 0 END + f_hi + f_night) AS sum_softflags
  FROM f
)
SELECT event_id, CAST(sum_hardflags AS BIGINT) AS sum_hardflags,
       CAST(sum_softflags AS BIGINT) AS sum_softflags,
       CAST(CASE
         WHEN sum_hardflags + sum_softflags = 0 THEN 0
         WHEN sum_hardflags >= 2 OR sum_softflags > 3 THEN 2
         ELSE 1
       END AS BIGINT) AS flag_qcf
FROM s
"""


# --------------------------------------------------------------- timestamps


def q_time_features(sf_dir: str):
    """vectorize_timestamps + insert_season (times.py:1049-1244)."""
    ds = _events(sf_dir, ["event_id", "ts"])
    out = add_time_features(ds, cyclic=False).to_pandas()
    out = out[["event_id", "YEAR", "MONTH", "WEEK", "DOY", "HOUR", "SEASON"]]
    out.columns = ["event_id", "year", "month", "week", "doy", "hour", "season"]
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


_SQL_TIME_FEATURES = """
SELECT event_id,
       CAST(EXTRACT(year FROM ts) AS BIGINT) AS year,
       CAST(EXTRACT(month FROM ts) AS BIGINT) AS month,
       CAST(weekofyear(ts) AS BIGINT) AS week,
       CAST(EXTRACT(doy FROM ts) AS BIGINT) AS doy,
       CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
       CAST(CASE WHEN EXTRACT(month FROM ts) IN (12, 1, 2) THEN 1
                 WHEN EXTRACT(month FROM ts) IN (3, 4, 5) THEN 2
                 WHEN EXTRACT(month FROM ts) IN (6, 7, 8) THEN 3
                 ELSE 4 END AS BIGINT) AS season
FROM events
"""


def q_setto_threshold(sf_dir: str):
    """setto_threshold type='max' (setto.py:121-170): clamp above 250."""
    ds = _events(sf_dir, ["event_id", "value"])
    out = setto_threshold(ds, "value", 250.0, "max").to_pandas()
    return out.rename(columns={"value": "value_capped"}).reset_index(drop=True)


_SQL_SETTO = "SELECT event_id, LEAST(value, 250.0) AS value_capped FROM events"


def q_setto_value_range(sf_dir: str):
    """setto_value (setto.py:80-120): set records inside a closed date
    range to a constant."""
    from ..stages.corrections import setto_value

    ds = _events(sf_dir, ["event_id", "ts", "value"])
    out = setto_value(
        ds, "value", [("2024-01-05 00:00:00", "2024-01-06 23:59:59")], 42.0
    ).to_pandas()
    out = out[["event_id", "value"]].rename(columns={"value": "value_set"})
    return _round6(out, ["value_set"]).sort_values("event_id").reset_index(drop=True)


_SQL_SETTO_VALUE = """
SELECT event_id,
       ROUND(CASE WHEN ts >= TIMESTAMP '2024-01-05 00:00:00'
                   AND ts <= TIMESTAMP '2024-01-06 23:59:59'
             THEN 42.0 ELSE value END, 6) AS value_set
FROM events
"""


def q_set_exact_missing(sf_dir: str):
    """set_exact_values_to_missing (setto.py:20-79): flag-value floats
    -> null (here: the integer-valued readings, a common error code
    pattern)."""
    from ..stages.corrections import set_exact_values_to_missing

    ds = _events(sf_dir, ["event_id", "value"])
    out = set_exact_values_to_missing(ds, "value", [100.0, 200.0]).to_pandas()
    out = out[["event_id", "value"]].rename(columns={"value": "value_clean"})
    return _round6(out, ["value_clean"]).sort_values("event_id").reset_index(drop=True)


_SQL_SET_EXACT = """
SELECT event_id,
       ROUND(CASE WHEN value IN (100.0, 200.0) THEN NULL ELSE value END, 6) AS value_clean
FROM events
"""


def q_vpd(sf_dir: str):
    """VPD from TA/RH (thermodynamic.py:93-133 Magnus form). TA/RH are
    deterministic derivations of the events columns (TA = value/10-5 in
    degC, RH = 40 + event_id%60 in %) so the oracle can spell out the
    identical closed-form expression."""
    from ..functions.scalars import calc_vpd_from_ta_rh

    ds = _events(sf_dir, ["event_id", "value"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["value"].notna()]
        ta = df["value"].to_numpy(dtype=np.float64) / 10.0 - 5.0
        rh = (df["event_id"].to_numpy(dtype=np.int64) % 60 + 40).astype(np.float64)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "ta": round6(pd.Series(ta)),
                "rh": rh,
                "vpd": stable_round6(pd.Series(calc_vpd_from_ta_rh(ta, rh))),
            }
        )

    out = ds.map_batches(fn, batch_format="pandas").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


_SQL_VPD = """
SELECT event_id,
       ROUND(value / 10.0 - 5.0, 6) AS ta,
       CAST(40 + event_id % 60 AS DOUBLE) AS rh,
       ROUND(ROUND(GREATEST(
         0.61078 * EXP(17.27 * (value / 10.0 - 5.0) / ((value / 10.0 - 5.0) + 237.3))
         * (1.0 - (40 + event_id % 60) / 100.0), 0.0), 9), 6) AS vpd
FROM events WHERE value IS NOT NULL
ORDER BY event_id
"""


def q_rh_offset(sf_dir: str):
    """remove_relativehumidity_offset (offsetcorrection.py:130-199):
    daily mean exceedance above the 100% cap subtracted per (key, day),
    result clamped at the cap. RH is synthesized as 101 + event_id%10 so
    every (key, day) group has exceedances (no cross-day interpolation
    leg — that path is pytest-pinned) and all arithmetic is
    integer-exact on both sides."""
    from ..stages.corrections import offset_to_max

    ds = _events(sf_dir, ["event_id", "ts", "event_type"])

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["rh"] = (df["event_id"].to_numpy(dtype=np.int64) % 10 + 101).astype(
            np.float64
        )
        return df

    corrected = offset_to_max(
        ds.map_batches(synth, batch_format="pandas"),
        "rh", 100.0, keys=("event_type",),
    ).to_pandas()
    out = pd.DataFrame(
        {
            "event_id": corrected["event_id"].astype("int64"),
            "rh_corr": stable_round6(corrected["rh"].astype(float)),
        }
    )
    return out.sort_values("event_id").reset_index(drop=True)


_SQL_RH_OFFSET = """
WITH r AS (
  SELECT event_id, event_type, ts,
         CAST(event_id % 10 + 101 AS DOUBLE) AS rh
  FROM events
),
d AS (
  SELECT event_id, rh,
         AVG(rh) OVER (PARTITION BY event_type, CAST(ts AS DATE)) AS dm
  FROM r
)
SELECT event_id,
       ROUND(ROUND(LEAST(rh - (dm - 100.0), 100.0), 9), 6) AS rh_corr
FROM d ORDER BY event_id
"""


_MANUAL_REMOVE = [
    ("2024-01-03 00:00:00", "2024-01-04 23:59:59"),
    ("2024-02-10 12:00:00", "2024-02-11 11:59:59"),
]


def q_manual_removal(sf_dir: str):
    """ManualRemoval (manualremoval.py:42-160): hard flag 2 inside the
    configured closed timestamp ranges."""
    ds = _events(sf_dir, ["event_id", "ts", "value"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        flag = ol.manual_removal_flag(df["value"], df["ts"], _MANUAL_REMOVE)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "flag_manual": flag.astype("int64"),
            }
        )

    out = ds.map_batches(fn, batch_format="pandas").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


_SQL_MANUAL = """
SELECT event_id,
       CAST(CASE WHEN (ts >= TIMESTAMP '2024-01-03 00:00:00' AND ts <= TIMESTAMP '2024-01-04 23:59:59')
                   OR (ts >= TIMESTAMP '2024-02-10 12:00:00' AND ts <= TIMESTAMP '2024-02-11 11:59:59')
            THEN 2 ELSE 0 END AS BIGINT) AS flag_manual
FROM events ORDER BY event_id
"""


def q_csv_ingest(sf_dir: str):
    """ReadFileType/DataFileReader end-to-end (filereader.py:336-620):
    a deterministic slice of events is round-tripped through CSV (NA
    markers for nulls) and re-ingested via the config-driven CSV source
    (name sanitation, timestamp parse, numeric coercion). Floats
    round-trip bit-exactly through repr, so the oracle is the same
    slice straight off the parquet view."""
    import tempfile

    from ..sources.csvsource import CsvSpec, read_timeseries_csv

    ds = _events(sf_dir, ["event_id", "ts", "value"])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return df[(df["event_id"] % 17 == 0) & df["value"].notna()]

    slice_df = (
        ds.map_batches(keep, batch_format="pandas").to_pandas().sort_values("event_id")
    )
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(tempfile.gettempdir(), f"diive_ray_csv_ingest_{tag}.csv")
    slice_df.to_csv(path, index=False, na_rep="NA")

    spec = CsvSpec(ts_col="ts", numeric_cols=("value",), na_values=("", "NA"))
    out = read_timeseries_csv([path], spec).to_pandas()
    out = out[["event_id", "ts", "value"]]
    out["event_id"] = out["event_id"].astype("int64")
    out["ts"] = pd.to_datetime(out["ts"]).astype("datetime64[us]")
    out["value"] = out["value"].astype(float)
    return out.sort_values("event_id").reset_index(drop=True)


_SQL_CSV_INGEST = """
SELECT event_id, ts, value FROM events
WHERE event_id % 17 = 0 AND value IS NOT NULL
ORDER BY event_id
"""


def q_keep_daterange(sf_dir: str):
    """Closed-interval date-range filter (times.py:1884-1934)."""
    ds = _events(sf_dir, ["event_id", "ts"])
    out = keep_daterange(ds, "2024-01-10 00:00:00", "2024-01-20 23:59:59").to_pandas()
    out["ts"] = pd.to_datetime(out["ts"]).astype("datetime64[us]")
    return out.reset_index(drop=True)


_SQL_DATERANGE = """
SELECT event_id, ts FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts <= TIMESTAMP '2024-01-20 23:59:59'
"""


def q_monthly_matrix(sf_dir: str):
    """Monthly agg matrix, long format, with dense ranks per month across
    years (resampling.py:15-44)."""
    ds = _events(sf_dir, ["event_type", "ts", "value"])
    out = monthly_matrix(ds, value_col="value", keys=["event_type"], agg="mean", ranks=False)
    out = out.rename(columns={"YEAR": "year", "MONTH": "month", "value": "mean_value"})
    out["year"] = out["year"].astype("int64")
    out["month"] = out["month"].astype("int64")
    return _round6(out, ["mean_value"])


_SQL_MONTHLY = """
SELECT event_type,
       CAST(EXTRACT(year FROM ts) AS BIGINT) AS year,
       CAST(EXTRACT(month FROM ts) AS BIGINT) AS month,
       ROUND(SUM(value) / COUNT(value), 6) AS mean_value
FROM events GROUP BY 1, 2, 3
"""


def q_grid_agg(sf_dir: str):
    """GridAggregator (gridaggregator.py:19-330): equal-width value bins x
    hour-of-day, per-cell count + mean."""
    ds = _events(sf_dir, ["ts", "value"])
    vlo, vhi = ds.min("value"), ds.max("value")

    def add_cols(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["hourcol"] = pd.to_datetime(df["ts"]).dt.hour.astype(float)
        return df

    ds2 = ds.map_batches(add_cols, batch_format="pandas")
    cells = grid_aggregate(
        ds2, xcol="value", ycol="hourcol", value_col="value",
        binsx=10, binsy=24, x_range=(vlo, vhi), y_range=(0.0, 24.0),
    )
    out = cells.rename(columns={"value": "mean_value"})
    out["binx"] = out["binx"].astype("int64")
    out["biny"] = out["biny"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return _round6(out, ["mean_value"])


_SQL_GRID = """
WITH r AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events)
SELECT LEAST(CAST(FLOOR((value - lo) / (hi - lo) * 10) AS BIGINT), 9) AS binx,
       CAST(EXTRACT(hour FROM ts) AS BIGINT) AS biny,
       COUNT(value) AS n,
       ROUND(SUM(value) / COUNT(value), 6) AS mean_value
FROM events, r WHERE value IS NOT NULL
GROUP BY 1, 2
"""


# ----------------------------------------------------------- stats / features


def q_sstats(sf_dir: str):
    """Per-key descriptive stats incl. exact linear-interpolation
    quantiles (stats.py:12-510 sstats family; stages/features.py)."""
    from ..stages.features import sstats

    ds = _events(sf_dir, ["event_type", "value"])
    out = sstats(ds, value_col="value", keys=("event_type",), quantiles=(0.25, 0.5, 0.75))
    out["n"] = out["n"].astype("int64")
    return _round6(out, ["mean", "std", "q25", "q50", "q75"]).reset_index(drop=True)


_SQL_SSTATS = """
SELECT event_type,
       COUNT(value) AS n,
       ROUND(SUM(value) / COUNT(value), 6) AS mean,
       ROUND(STDDEV_SAMP(value), 6) AS std,
       MIN(value) AS min,
       MAX(value) AS max,
       ROUND(quantile_cont(value, 0.25), 6) AS q25,
       ROUND(quantile_cont(value, 0.50), 6) AS q50,
       ROUND(quantile_cont(value, 0.75), 6) AS q75
FROM events GROUP BY 1
"""


def q_histogram(sf_dir: str):
    """Equal-width 20-bin value histogram (driver-combined partials,
    stages/features.py:histogram; floor-binning rule shared with SQL)."""
    from ..stages.features import histogram

    ds = _events(sf_dir, ["value"])
    out = histogram(ds, value_col="value", bins=20)
    out["bin"] = out["bin"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return _round6(out, ["lo", "hi"]).reset_index(drop=True)


_SQL_HISTOGRAM = """
WITH r AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events),
b AS (
  SELECT LEAST(CAST(FLOOR((value - lo) / (hi - lo) * 20) AS BIGINT), 19) AS bin
  FROM events, r WHERE value IS NOT NULL
), g AS (SELECT generate_series AS bin FROM generate_series(0, 19))
SELECT g.bin, COUNT(b.bin) AS n,
       ROUND(r.lo + (r.hi - r.lo) * g.bin / 20, 6) AS lo,
       ROUND(r.lo + (r.hi - r.lo) * (g.bin + 1) / 20, 6) AS hi
FROM g CROSS JOIN r LEFT JOIN b ON b.bin = g.bin
GROUP BY g.bin, r.lo, r.hi
"""


def q_feature_engineer(sf_dir: str):
    """FeatureEngineer stages over the per-event_type ordered series
    (feature_engineer.py:42-805): lags +-1/+-2, trailing rolling
    mean/std/median (window 4, min_periods=1), first difference."""
    from ..stages.exchange import grouped_block_map
    from ..stages.features import engineer_features_frame

    ds = _events(sf_dir, ["event_id", "event_type", "ts", "value"])

    def gfn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"], kind="stable").reset_index(drop=True)
        out = engineer_features_frame(
            df, "value", lags=(-2, -1, 1, 2), windows=(4,), diffs=True,
            ema_spans=(), timestamp_features=False,
        )
        return out

    out = grouped_block_map(ds, ["event_type"], gfn).to_pandas()
    out = out.drop(columns=["ts"])
    out = out.rename(columns={
        "value+1": "lead1", "value+2": "lead2", "value-1": "lag1", "value-2": "lag2",
        "value_rmedian4": "rmed4", "value_rmean4": "rmean4", "value_rstd4": "rstd4",
        "value_diff": "diff1",
    })
    for c in ("lead1", "lead2", "lag1", "lag2", "rmed4", "rmean4", "rstd4", "diff1"):
        out[c] = out[c].astype(float)
    return _round6(out, ["rmean4", "rstd4", "rmed4"]).sort_values("event_id").reset_index(drop=True)


_SQL_FEATURES = """
SELECT event_id, event_type, value,
       lead(value, 1) OVER w AS lead1,
       lead(value, 2) OVER w AS lead2,
       lag(value, 1) OVER w AS lag1,
       lag(value, 2) OVER w AS lag2,
       ROUND(CAST(median(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS rmed4,
       ROUND(AVG(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS rmean4,
       ROUND(STDDEV_SAMP(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS rstd4,
       value - lag(value, 1) OVER w AS diff1
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
"""


def q_ridge_gapfill(sf_dir: str):
    """Model gap-fill (RandomForestTS translation, stages/mlfill.py):
    per-key ridge fit on harmonic time features -> broadcast coefs ->
    actor-pool predict over the 1h tier's missing buckets. Closed-form
    but model-based -> rows-only driver check; recovery quality pinned
    by tests/test_features_mlfill.py."""
    from ..stages.gaps import regularize_frame
    from ..stages.mlfill import ridge_fill
    from ..stages.exchange import grouped_block_map

    t1h = _fused_tier(sf_dir, "1h")

    def regularize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("bucket_ts", kind="stable")
        key = df["event_type"].iloc[0]
        reg = regularize_frame(df, US_PER_HOUR, "bucket_ts")
        reg["event_type"] = key
        return reg[["event_type", "bucket_ts", "mean"]]

    dense = grouped_block_map(t1h, ["event_type"], regularize)
    out = ridge_fill(dense, value_col="mean", keys=("event_type",)).to_pandas()
    out["bucket_ts"] = pd.to_datetime(out["bucket_ts"]).astype("datetime64[us]")
    out["mean_mlfilled_is_model"] = out["mean_mlfilled_is_model"].astype("int64")
    return _round6(out, ["mean", "mean_mlfilled"]).sort_values(
        ["event_type", "bucket_ts"]
    ).reset_index(drop=True)


def q_event_flag(sf_dir: str):
    """Interval events -> 0/1 flag (event.py:70-202): broadcast merged
    intervals + vectorized searchsorted stab per batch."""
    from ..stages.features import event_to_flag

    ds = _events(sf_dir, ["event_id", "ts"])
    events = pd.DataFrame({
        "start": [pd.Timestamp("2024-01-05"), pd.Timestamp("2024-01-12 06:00")],
        "end": [pd.Timestamp("2024-01-07"), pd.Timestamp("2024-01-13 18:00")],
    })
    out = event_to_flag(ds, events).to_pandas()
    out = out[["event_id", "FLAG_EVENT"]].rename(columns={"FLAG_EVENT": "flag_event"})
    out["flag_event"] = out["flag_event"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


_SQL_EVENT_FLAG = """
SELECT event_id,
       CAST(CASE WHEN (ts >= TIMESTAMP '2024-01-05' AND ts <= TIMESTAMP '2024-01-07')
              OR (ts >= TIMESTAMP '2024-01-12 06:00:00' AND ts <= TIMESTAMP '2024-01-13 18:00:00')
            THEN 1 ELSE 0 END AS BIGINT) AS flag_event
FROM events
"""


def q_freq_detect(sf_dir: str):
    """DetectFrequency voting (times.py:348-482) over the regular 1h
    tier: per-key delta mode, agreement, confidence ladder
    (1.0 / 0.95 / 0.7 / null)."""
    from ..stages.freq import detect_frequency_exact

    t1h = _fused_tier(sf_dir, "1h")
    out = detect_frequency_exact(t1h, keys=("event_type",), ts_col="bucket_ts")
    out["freq_us"] = out["freq_us"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


_SQL_FREQ = """
WITH d AS (
  SELECT event_type,
         CAST(date_diff('microsecond',
           lag(bucket_ts) OVER (PARTITION BY event_type ORDER BY bucket_ts),
           bucket_ts) AS BIGINT) AS delta
  FROM (
    SELECT DISTINCT event_type,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bucket_ts
    FROM events WHERE value IS NOT NULL
  )
), f AS (
  SELECT event_type, delta, COUNT(*) AS n FROM d
  WHERE delta IS NOT NULL AND delta > 0 GROUP BY 1, 2
), t AS (
  SELECT *, SUM(n) OVER (PARTITION BY event_type) AS total,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n DESC, delta) AS rn
  FROM f
)
SELECT event_type, delta AS freq_us,
       ROUND(n * 1.0 / total, 6) AS agreement,
       CASE WHEN n = total THEN 1.0
            WHEN n * 1.0 / total >= 0.9 THEN 0.95
            WHEN n * 1.0 / total > 0.5 THEN 0.7
            ELSE NULL END AS confidence
FROM t WHERE rn = 1
"""


def q_gap_stats_1h(sf_dir: str):
    """GapStats (gapfinder.py:361-560): monthly gap count / missing
    buckets / longest run over the 1h tier's gap table."""
    from ..stages.gaps import gap_stats

    t1h = _fused_tier(sf_dir, "1h")
    gt = gap_table(t1h, US_PER_HOUR, keys=("event_type",), value_col="mean").to_pandas()
    if gt.empty:
        gt = pd.DataFrame(columns=["event_type", "GAP_START", "GAP_END", "GAP_LENGTH"])
    out = gap_stats(gt, keys=("event_type",))
    for c in ("year", "month", "n_gaps", "missing", "longest"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["event_type", "year", "month"]).reset_index(drop=True)


_SQL_GAP_STATS = """
WITH b AS (
  SELECT DISTINCT event_type,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bucket_ts
  FROM events WHERE value IS NOT NULL
), l AS (
  SELECT event_type, bucket_ts,
         LAG(bucket_ts) OVER (PARTITION BY event_type ORDER BY bucket_ts) AS prev
  FROM b
), gaps AS (
  SELECT event_type, prev + INTERVAL '1 hour' AS gap_start,
         CAST(date_diff('hour', prev, bucket_ts) - 1 AS BIGINT) AS len
  FROM l WHERE prev IS NOT NULL AND date_diff('hour', prev, bucket_ts) > 1
)
SELECT event_type,
       CAST(EXTRACT(year FROM gap_start) AS BIGINT) AS year,
       CAST(EXTRACT(month FROM gap_start) AS BIGINT) AS month,
       COUNT(*) AS n_gaps, CAST(SUM(len) AS BIGINT) AS missing, MAX(len) AS longest
FROM gaps GROUP BY 1, 2, 3
"""


def q_monthly_ranks(sf_dir: str):
    """Monthly matrix with dense ranks per month across years
    (resampling.py:37-42), ranks over ROUND(mean, 6) for engine-stable
    tie-breaks."""
    ds = _events(sf_dir, ["event_type", "ts", "value"])
    long = monthly_matrix(ds, value_col="value", keys=["event_type"], agg="mean", ranks=False)
    long = long.rename(columns={"YEAR": "year", "MONTH": "month"})
    long["value"] = round6(long["value"].astype(float))
    long["rank"] = (
        long.groupby(["event_type", "month"])["value"]
        .rank(method="dense", ascending=False)
        .astype("int64")
    )
    long["year"] = long["year"].astype("int64")
    long["month"] = long["month"].astype("int64")
    return long[["event_type", "year", "month", "rank"]].reset_index(drop=True)


_SQL_MONTHLY_RANKS = """
WITH m AS (
  SELECT event_type,
         CAST(EXTRACT(year FROM ts) AS BIGINT) AS year,
         CAST(EXTRACT(month FROM ts) AS BIGINT) AS month,
         ROUND(SUM(value) / COUNT(value), 6) AS v
  FROM events GROUP BY 1, 2, 3
)
SELECT event_type, year, month,
       CAST(DENSE_RANK() OVER (PARTITION BY event_type, month ORDER BY v DESC) AS BIGINT) AS rank
FROM m
"""


def q_daynight_flag(sf_dir: str):
    """DaytimeNighttimeFlag from potential radiation
    (temporal.py:19-111, radiation.py:15-99 — simplified solar model,
    lat 47 / lon 8.5, threshold 20 W m^-2)."""
    from ..functions.solar import daytime_flag, potential_radiation
    from ..util import ts_to_us

    ds = _events(sf_dir, ["event_id", "ts"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        us = ts_to_us(df["ts"])
        return pd.DataFrame({
            "event_id": df["event_id"],
            "swin_pot": round6(potential_radiation(us, 47.0, 8.5)),
            "flag_daytime": daytime_flag(us, 47.0, 8.5).astype("int64"),
        })

    return ds.map_batches(fn, batch_format="pandas")


_SQL_DAYNIGHT = """
WITH s AS (
  SELECT event_id,
         epoch(ts) AS sec,
         radians(-23.44) * cos(2 * pi() * (((epoch(ts) / 86400.0) % 365.25) + 10.0) / 365.25) AS decl,
         radians(15.0 * ((((epoch(ts) % 86400) / 3600.0) + 8.5 / 15.0) - 12.0)) AS hour_angle
  FROM events
), e AS (
  SELECT event_id,
         1367.0 * GREATEST(
           sin(radians(47.0)) * sin(decl) + cos(radians(47.0)) * cos(decl) * cos(hour_angle),
           0.0) AS pot
  FROM s
)
SELECT event_id, ROUND(pot, 6) AS swin_pot,
       CAST(CASE WHEN pot > 20.0 THEN 1 ELSE 0 END AS BIGINT) AS flag_daytime
FROM e
"""


def q_lof_outliers(sf_dir: str):
    """LocalOutlierFactor outliers (lof.py:42-300; from-scratch numpy
    LOF, 1-D sorted-neighbor specialization) — model-based, rows-only
    driver check; kernel pinned vs brute-force LOF in
    tests/test_outliers_extra.py."""
    ds = _events(sf_dir, ["event_id", "event_type", "ts", "value"])
    flagged = ol.flag_outliers(
        ds, "lof", value_col="value", keys=("event_type",), ts_col="ts",
        n_neighbors=20, contamination=0.02,
    ).to_pandas()
    out = flagged[flagged["FLAG_value_LOF_TEST"] == 2][["event_id", "event_type", "value"]]
    return out.sort_values("event_id").reset_index(drop=True)


def q_lof_scores(sf_dir: str):
    """LOF scores (not flags) per event over non-null values grouped by
    event_type, k=20 — exact-checkable variant of q_lof_outliers: the
    kernel's k-NN tie-break is deterministic (smallest sorted position
    wins, outliers.py:_lof_scores_sorted), so a DuckDB self-join oracle
    (ORDER BY dist, spos) reproduces the exact neighbor sets. Scores
    via stable_round6; oracle parity holds while the largest
    duplicate-value class stays below k (sf0.01: classes of 2-3).
    Deterministic 1-in-5 subsample (event_id % 5 == 0) keeps the
    oracle's O(n^2)-pair self-join inside the driver budget."""
    def keep_1in5(t: pa.Table) -> pa.Table:
        eid = t["event_id"]
        rem = pc.subtract(eid, pc.multiply(pc.divide(eid, 5), 5))
        return t.filter(pc.equal(rem, 0))

    ds = _events(sf_dir, ["event_id", "event_type", "ts", "value"]).map_batches(
        keep_1in5, batch_format="pyarrow"
    )

    def gfn(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["value"].notna()].sort_values(["ts", "event_id"], kind="stable").reset_index(drop=True)
        if len(df) < 21:
            return None  # below k+1 rows LOF-vs-SQL parity is n<2k+1 full-pairwise; no such group at sf>=0.001
        sc = ol.lof_scores(df["value"].astype(float).to_numpy(), k=20)
        return pd.DataFrame(
            {
                "event_id": df["event_id"],
                "event_type": df["event_type"],
                "lof": stable_round6(sc),
            }
        )

    from ..stages.exchange import grouped_block_map

    out = grouped_block_map(ds, ["event_type"], gfn).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


_SQL_LOF_SCORES = """
WITH pts AS (
  SELECT event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, ts, event_id) AS spos
  FROM events WHERE value IS NOT NULL AND event_id % 5 = 0
),
d AS (
  SELECT a.event_type, a.event_id AS pid, b.event_id AS oid, b.spos AS os,
         ABS(a.value - b.value) AS dist
  FROM pts a JOIN pts b
    ON a.event_type = b.event_type AND a.event_id <> b.event_id
),
rk AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, pid ORDER BY dist, os) AS rn
  FROM d
),
nn AS (SELECT event_type, pid, oid, dist FROM rk WHERE rn <= 20),
kd AS (SELECT event_type, pid, MAX(dist) AS kdist FROM nn GROUP BY 1, 2),
reach AS (
  SELECT nn.event_type, nn.pid, nn.oid, GREATEST(nn.dist, ko.kdist) AS r
  FROM nn JOIN kd ko ON ko.event_type = nn.event_type AND ko.pid = nn.oid
),
lrd AS (SELECT event_type, pid, 1.0 / (AVG(r) + 1e-12) AS lrd FROM reach GROUP BY 1, 2),
lofs AS (
  SELECT nn.event_type, nn.pid, AVG(lo.lrd) / MAX(lp.lrd) AS lof
  FROM nn
  JOIN lrd lo ON lo.event_type = nn.event_type AND lo.pid = nn.oid
  JOIN lrd lp ON lp.event_type = nn.event_type AND lp.pid = nn.pid
  GROUP BY 1, 2
)
SELECT pid AS event_id, event_type, ROUND(ROUND(lof, 9), 6) AS lof FROM lofs
"""


def q_bootstrap_ci(sf_dir: str):
    """Seeded bootstrap CI of the mean per event_type
    (ustar_bootstrap.py:156-280 pattern) — resampling-based, rows-only
    driver check; determinism pinned by tests."""
    from ..stages.features import bootstrap_stats

    ds = _events(sf_dir, ["event_type", "value"])
    out = bootstrap_stats(ds, value_col="value", keys=("event_type",), n_boot=200)
    out["n"] = out["n"].astype("int64")
    return _round6(out, ["p2_5", "p50_0", "p97_5"]).sort_values("event_type").reset_index(drop=True)


def q_similarity_fill_1h(sf_dir: str):
    """MDS-style similarity gap-fill (similarity.py:145-350 cascade,
    single stage here): fill each missing 1h bucket with the mean of
    observed buckets within ±3 days whose hour-of-day is within ±1 h
    (cyclic) — the mean-diurnal-cycle method — min 2 donors."""
    from ..stages.exchange import grouped_block_map
    from ..stages.gaps import regularize_frame
    from ..stages.similarity_fill import FillStage, similarity_fill_frame
    from ..util import ts_to_us

    t1h = _fused_tier(sf_dir, "1h")
    stage = FillStage(
        features=(("hod", 1.0, 24.0),), window_us=3 * US_PER_DAY, min_donors=2, code=1,
    )

    def gfn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("bucket_ts", kind="stable")
        key = df["event_type"].iloc[0]
        reg = regularize_frame(df, US_PER_HOUR, "bucket_ts")
        reg["event_type"] = key
        reg["hod"] = (ts_to_us(reg["bucket_ts"]) // US_PER_HOUR) % 24
        reg = similarity_fill_frame(
            reg[["event_type", "bucket_ts", "hod", "mean"]], "mean", [stage],
            ts_col="bucket_ts",
        )
        return reg

    out = grouped_block_map(t1h, ["event_type"], gfn).to_pandas()
    res = pd.DataFrame({
        "event_type": out["event_type"],
        "bucket_ts": pd.to_datetime(out["bucket_ts"]).astype("datetime64[us]"),
        "value_filled": stable_round6(out["mean_simfilled"].astype(float)),
        "fill_flag": out["mean_simfilled_flag"],
    })
    return res.sort_values(["event_type", "bucket_ts"]).reset_index(drop=True)


_SQL_SIMFILL = """
WITH t AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bucket_ts,
         SUM(value) / COUNT(value) AS v
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
), span AS (
  SELECT event_type, MIN(bucket_ts) AS lo, MAX(bucket_ts) AS hi FROM t GROUP BY 1
), grid AS (
  SELECT s.event_type, g.ts AS bucket_ts
  FROM span s, LATERAL (SELECT unnest(generate_series(s.lo, s.hi, INTERVAL '1 hour')) AS ts) g
), j AS (
  SELECT g.event_type, g.bucket_ts, t.v
  FROM grid g LEFT JOIN t ON t.event_type = g.event_type AND t.bucket_ts = g.bucket_ts
)
SELECT a.event_type, a.bucket_ts,
       CASE WHEN a.v IS NOT NULL THEN ROUND(ROUND(a.v, 9), 6)
            ELSE (
              SELECT CASE WHEN COUNT(b.v) >= 2 THEN ROUND(ROUND(AVG(b.v), 9), 6) END
              FROM j b
              WHERE b.event_type = a.event_type AND b.v IS NOT NULL
                AND abs(date_diff('microsecond', a.bucket_ts, b.bucket_ts)) <= 259200000000
                AND LEAST(
                      abs(EXTRACT(hour FROM a.bucket_ts) - EXTRACT(hour FROM b.bucket_ts)),
                      24 - abs(EXTRACT(hour FROM a.bucket_ts) - EXTRACT(hour FROM b.bucket_ts))
                    ) <= 1
            ) END AS value_filled,
       CASE WHEN a.v IS NOT NULL THEN 0.0
            ELSE (
              SELECT CASE WHEN COUNT(b.v) >= 2 THEN 1.0 END
              FROM j b
              WHERE b.event_type = a.event_type AND b.v IS NOT NULL
                AND abs(date_diff('microsecond', a.bucket_ts, b.bucket_ts)) <= 259200000000
                AND LEAST(
                      abs(EXTRACT(hour FROM a.bucket_ts) - EXTRACT(hour FROM b.bucket_ts)),
                      24 - abs(EXTRACT(hour FROM a.bucket_ts) - EXTRACT(hour FROM b.bucket_ts))
                    ) <= 1
            ) END AS fill_flag
FROM j a
"""


def q_flux_chain(sf_dir: str):
    """Flux processing chain L2 -> L4 end-to-end on the Chain API
    (reference run_chain.py:51-530): L2 missing + absolute-limit flags
    -> L3.1 storage correction (deterministic synthesized storage term)
    -> L3.2 Hampel day/night separate (window 49, sigma 5.5,
    non-iterated variant for SQL parity; run_chain's L3.2 is
    unconditional) -> QCF combine -> L3.3 constant-USTAR nighttime
    filter -> hourly rollup of accepted corrected flux."""
    from .chain import Chain, Step

    ds = _events(sf_dir, ["event_id", "event_type", "ts", "value"])

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        # deterministic stand-ins for the storage term and USTAR columns
        # (integer-exact so the oracle reproduces them bit-for-bit)
        df = df.copy()
        eid = df["event_id"].to_numpy()
        v = df["value"].astype(float)
        df["storage"] = ((eid % 7) - 3) * 0.1
        df["ustar"] = ((eid * 13) % 100) / 100.0
        df["FLAG_MISSING"] = np.where(v.isna(), 2, 0).astype(np.int64)
        df["FLAG_ABSLIM"] = np.where((v < 0) | (v > 450), 2, 0).astype(np.int64)
        return df

    chain = Chain([
        Step("map_batches", fn=synth, batch_format="pandas"),
        Step("daynight_flag"),
        Step("storage_correction", flux_col="value", storage_col="storage", out_col="flux_corr"),
        Step("flag_outliers", method="hampel", value_col="flux_corr",
             keys=("event_type", "is_day"), ts_col=["ts", "event_id"],
             window_length=49, n_sigma=5.5, repeat=False),
        Step("qcf_combine", flag_cols=("FLAG_MISSING", "FLAG_ABSLIM", "FLAG_flux_corr_HAMPEL_TEST")),
        Step("ustar_filter", ustar_col="ustar", threshold=0.3),
        Step("rollup", width_us=US_PER_HOUR, value_col="flux_corr", keys=("event_type",)),
    ])
    out = chain.run(ds).to_pandas()
    res = pd.DataFrame({
        "event_type": out["event_type"],
        "bucket_ts": pd.to_datetime(out["bucket_ts"]).astype("datetime64[us]"),
        "n": out["count"].astype("int64"),
        "mean_flux": stable_round6(out["mean"].astype(float)),
    })
    return res.sort_values(["event_type", "bucket_ts"]).reset_index(drop=True)


_SQL_FLUX_CHAIN = """
WITH f AS (
  SELECT event_id, event_type, ts, value,
         CASE WHEN 1367.0 * GREATEST(
           sin(radians(47.0)) * sin(radians(-23.44) * cos(2 * pi() * (((epoch(ts) / 86400.0) % 365.25) + 10.0) / 365.25))
           + cos(radians(47.0)) * cos(radians(-23.44) * cos(2 * pi() * (((epoch(ts) / 86400.0) % 365.25) + 10.0) / 365.25))
             * cos(radians(15.0 * ((((epoch(ts) % 86400) / 3600.0) + 8.5 / 15.0) - 12.0))),
           0.0) > 20.0 THEN 1 ELSE 0 END AS is_day,
         ((event_id % 7) - 3) * 0.1 AS storage,
         ((event_id * 13) % 100) / 100.0 AS ustar
  FROM events
), c AS (
  SELECT *, value + storage AS flux_corr,
         CASE WHEN value IS NULL THEN 2 ELSE 0 END AS flag_missing,
         CASE WHEN value < 0 OR value > 450 THEN 2 ELSE 0 END AS flag_abslim
  FROM f
), s AS (
  SELECT event_id, event_type, is_day, flux_corr,
         ROW_NUMBER() OVER (PARTITION BY event_type, is_day ORDER BY ts, event_id) AS pos
  FROM c WHERE flux_corr IS NOT NULL
), d AS (
  SELECT *,
    COALESCE(
      (flux_corr - lag(flux_corr) OVER w) - (lead(flux_corr) OVER w - flux_corr), 0.0) AS dd
  FROM s WINDOW w AS (PARTITION BY event_type, is_day ORDER BY pos)
), m AS (
  SELECT *,
    CAST(median(dd) OVER (PARTITION BY event_type, is_day ORDER BY pos
      ROWS BETWEEN 24 PRECEDING AND 24 FOLLOWING) AS DOUBLE) AS rmed
  FROM d
), dev AS (
  SELECT *, ABS(dd - rmed) AS adev FROM m
), mad AS (
  SELECT *,
    CAST(median(adev) OVER (PARTITION BY event_type, is_day ORDER BY pos
      ROWS BETWEEN 24 PRECEDING AND 24 FOLLOWING) AS DOUBLE) + 1e-6 AS rmad
  FROM dev
), h AS (
  SELECT event_id,
         CASE WHEN dd > rmed + (1.4826 * rmad) * 5.5
                OR dd < rmed - (1.4826 * rmad) * 5.5 THEN 2 ELSE 0 END AS flag_hampel
  FROM mad
), acc AS (
  SELECT c.*, COALESCE(h.flag_hampel, 0) AS flag_hampel
  FROM c LEFT JOIN h USING (event_id)
)
SELECT event_type,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bucket_ts,
       CAST(COUNT(flux_corr) AS BIGINT) AS n,
       ROUND(ROUND(SUM(flux_corr) / COUNT(flux_corr), 9), 6) AS mean_flux
FROM acc
WHERE flag_missing <> 2 AND flag_abslim <> 2 AND flag_hampel <> 2
  AND NOT (is_day = 0 AND ustar < 0.3)
GROUP BY 1, 2
HAVING COUNT(flux_corr) >= 1
"""


def q_flux_chain_scores(sf_dir: str):
    """Per-fill score report for the flux processing chain (VERDICT r3
    #9; reference run_chain.py fill levels report per-variable
    r2/MAE/RMSE via gapfilling/scores.py:41-49): the SAME L2->L3.3
    chain as ``flux_chain`` rolled to hourly, then the terminal
    ``gapfill_score`` chain step — round the hourly means to 6dp (ULP
    canonicalization so the SQL replay matches bit-for-bit), hide every
    row with epoch-hour == 2 (mod 5), position-based linear interp
    (limit 2), and report mae/medae/mse/rmse/maxe/r2/nmae per
    event_type."""
    from .chain import Chain, Step

    ds = _events(sf_dir, ["event_id", "event_type", "ts", "value"])

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        # identical deterministic stand-ins to q_flux_chain
        df = df.copy()
        eid = df["event_id"].to_numpy()
        v = df["value"].astype(float)
        df["storage"] = ((eid % 7) - 3) * 0.1
        df["ustar"] = ((eid * 13) % 100) / 100.0
        df["FLAG_MISSING"] = np.where(v.isna(), 2, 0).astype(np.int64)
        df["FLAG_ABSLIM"] = np.where((v < 0) | (v > 450), 2, 0).astype(np.int64)
        return df

    chain = Chain([
        Step("map_batches", fn=synth, batch_format="pandas"),
        Step("daynight_flag"),
        Step("storage_correction", flux_col="value", storage_col="storage", out_col="flux_corr"),
        Step("flag_outliers", method="hampel", value_col="flux_corr",
             keys=("event_type", "is_day"), ts_col=["ts", "event_id"],
             window_length=49, n_sigma=5.5, repeat=False),
        Step("qcf_combine", flag_cols=("FLAG_MISSING", "FLAG_ABSLIM", "FLAG_flux_corr_HAMPEL_TEST")),
        Step("ustar_filter", ustar_col="ustar", threshold=0.3),
        Step("rollup", width_us=US_PER_HOUR, value_col="flux_corr", keys=("event_type",)),
        Step("gapfill_score", keys=["event_type"], value_col="mean",
             order_col="bucket_ts", hide_every=5, hide_phase=2, interp_limit=2),
    ])
    out = chain.run(ds).to_pandas()
    out = out.drop(columns=["mape"])
    for c in ["mae", "medae", "mse", "rmse", "maxe", "r2", "nmae"]:
        out[c] = stable_round6(out[c].astype(float))
    return out.reset_index(drop=True)


# Composed oracle: the flux-chain SQL verbatim as a CTE (its mean_flux
# is already ROUND(ROUND(.,9),6) = the Ray side's round6_first), then
# the gapfill-scores hide/interp/metric replay over its hourly series.
_SQL_FLUX_CHAIN_SCORES = f"""
WITH chain AS ({_SQL_FLUX_CHAIN}
), p AS (
  SELECT event_type, bucket_ts, mean_flux AS v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bucket_ts) AS pos,
         ((CAST(epoch(bucket_ts) AS BIGINT) // 3600) % 5) = 2 AS hidden
  FROM chain
), w AS (
  SELECT *,
    last_value(CASE WHEN NOT hidden THEN v END IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY pos
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    last_value(CASE WHEN NOT hidden THEN pos END IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY pos
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp,
    first_value(CASE WHEN NOT hidden THEN v END IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY pos
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN NOT hidden THEN pos END IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY pos
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS np
  FROM p
), f AS (
  SELECT event_type, v AS truth,
         pv + (nv - pv) * (pos - pp) / (np - pp) AS pred
  FROM w
  WHERE hidden AND pv IS NOT NULL AND nv IS NOT NULL AND (np - pp - 1) <= 2
), g AS (
  SELECT event_type, AVG(truth) AS tbar FROM f GROUP BY 1
)
SELECT f.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_scored,
       ROUND(ROUND(AVG(ABS(truth - pred)), 9), 6) AS mae,
       ROUND(ROUND(MEDIAN(ABS(truth - pred)), 9), 6) AS medae,
       ROUND(ROUND(AVG((truth - pred) * (truth - pred)), 9), 6) AS mse,
       ROUND(ROUND(SQRT(AVG((truth - pred) * (truth - pred))), 9), 6) AS rmse,
       ROUND(ROUND(MAX(ABS(truth - pred)), 9), 6) AS maxe,
       ROUND(ROUND(CASE WHEN SUM((truth - tbar) * (truth - tbar)) > 0
         THEN 1 - SUM((truth - pred) * (truth - pred))
                  / SUM((truth - tbar) * (truth - tbar)) END, 9), 6) AS r2,
       ROUND(ROUND(AVG(ABS(truth - pred)) / AVG(ABS(truth)), 9), 6) AS nmae
FROM f JOIN g ON f.event_type = g.event_type
GROUP BY f.event_type
ORDER BY f.event_type
"""


_MDS_PASSES = [
    # the head of the reference's 6-loop ladder (stages/mds.py:
    # oneflux_ladder), every loop represented: ALL 14,28 | SWIN 14 |
    # MDC 1,3,5 | ALL 42 | SWIN 28 | MDC 7,14
    (1, 14), (1, 28), (2, 14), (3, 1), (3, 3), (3, 5), (1, 42), (2, 28), (3, 7), (3, 14),
]


def q_mds_fill(sf_dir: str):
    """Full MDS cascade gap-fill (reference
    diive/gapfilling/similarity.py:26-42,145-350 semantics; engine
    kernel stages/mds.py): hourly series per event_type, synthesized
    integer-exact SWIN/TA/VPD drivers (deterministic functions of hour
    and grid position so the DuckDB oracle reproduces them bit-exactly),
    expanding-window passes with ONEFlux tolerances, granular
    method*1000+window flags and collapsed quality."""
    from ..stages.exchange import grouped_block_map
    from ..stages.gaps import regularize_frame
    from ..stages.mds import Pass, mds_cascade, mds_quality
    from ..util import ts_to_us

    t1h = _fused_tier(sf_dir, "1h")
    passes = [Pass(m, tw) for m, tw in _MDS_PASSES]

    def gfn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("bucket_ts", kind="stable")
        key = df["event_type"].iloc[0]
        reg = regularize_frame(df, US_PER_HOUR, "bucket_ts")
        n = len(reg)
        pos = np.arange(n, dtype=np.int64)
        hr = (ts_to_us(reg["bucket_ts"]) // US_PER_HOUR) % 24
        ta = ((hr * 7) % 24) - 10 + (pos % 5)
        swin = np.where((hr >= 6) & (hr <= 17), 50 * (12 - np.abs(hr - 12)), 0)
        vpd = np.abs(((pos * 3) % 17) - 8)
        out = mds_cascade(
            reg["mean"].to_numpy(dtype=np.float64),
            swin=swin.astype(np.float64), ta=ta.astype(np.float64),
            vpd=vpd.astype(np.float64), hr=hr.astype(np.float64),
            nperday=24, passes=passes, min_donors=2,
        )
        return pd.DataFrame({
            "event_type": key,
            "bucket_ts": reg["bucket_ts"],
            "value_filled": out["filled"],
            "fill_flag": out["flag"],
            "fill_quality": out["quality"],
            "n_donors": out["n_donors"],
        })

    out = grouped_block_map(t1h, ["event_type"], gfn).to_pandas()
    res = pd.DataFrame({
        "event_type": out["event_type"],
        "bucket_ts": pd.to_datetime(out["bucket_ts"]).astype("datetime64[us]"),
        "value_filled": stable_round6(out["value_filled"].astype(float)),
        "fill_flag": out["fill_flag"].astype("int64"),
        "fill_quality": out["fill_quality"].astype("int64"),
        "n_donors": out["n_donors"].astype("int64"),
    })
    return res.sort_values(["event_type", "bucket_ts"]).reset_index(drop=True)


def _mds_sql() -> str:
    """Generate the MDS cascade oracle: one self-join CTE per pass with
    the exact tolerance predicates, COALESCEd in ladder order."""
    from ..stages.mds import mds_quality

    ctes, sel_val, sel_flag, sel_q, sel_nd = [], [], [], [], []
    for k, (m, tw) in enumerate(_MDS_PASSES):
        h = max(1, tw * 24 // 2)
        if m == 3:
            cond = "ABS(b.hr - a.hr) < 1.1"
        else:
            cond = "ABS(b.swin - a.swin) < LEAST(GREATEST(a.swin, 20.0), 50.0)"
            if m == 1:
                cond += " AND ABS(b.ta - a.ta) < 2.5 AND ABS(b.vpd - a.vpd) < 5.0"
        ctes.append(
            f"p{k} AS (SELECT a.event_type, a.pos, AVG(b.v) AS m, COUNT(*) AS c"
            f" FROM g a JOIN g b ON b.event_type = a.event_type"
            f" AND b.pos BETWEEN a.pos - {h} AND a.pos + {h - 1}"
            f" AND b.v IS NOT NULL AND {cond}"
            f" WHERE a.v IS NULL GROUP BY 1, 2 HAVING COUNT(*) >= 2)"
        )
        q = int(mds_quality(np.array(m), np.array(tw)))
        flag = m * 1000 + int(round(tw))
        sel_val.append(f"p{k}.m")
        sel_flag.append(f"WHEN p{k}.m IS NOT NULL THEN {flag}")
        sel_q.append(f"WHEN p{k}.m IS NOT NULL THEN {q}")
        sel_nd.append(f"WHEN p{k}.m IS NOT NULL THEN p{k}.c")
    joins = "".join(
        f" LEFT JOIN p{k} ON p{k}.event_type = g.event_type AND p{k}.pos = g.pos"
        for k in range(len(_MDS_PASSES))
    )
    return f"""
WITH t AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bucket_ts,
         SUM(value) / COUNT(value) AS v
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
), span AS (
  SELECT event_type, MIN(bucket_ts) AS lo, MAX(bucket_ts) AS hi FROM t GROUP BY 1
), grid AS (
  SELECT s.event_type, gg.ts AS bucket_ts
  FROM span s, LATERAL (SELECT unnest(generate_series(s.lo, s.hi, INTERVAL '1 hour')) AS ts) gg
), base AS (
  SELECT grid.event_type, grid.bucket_ts, t.v,
         ROW_NUMBER() OVER (PARTITION BY grid.event_type ORDER BY grid.bucket_ts) - 1 AS pos,
         EXTRACT(hour FROM grid.bucket_ts)::BIGINT AS hr
  FROM grid LEFT JOIN t ON t.event_type = grid.event_type AND t.bucket_ts = grid.bucket_ts
), g AS (
  SELECT *,
         ((hr * 7) % 24) - 10 + (pos % 5) AS ta,
         CASE WHEN hr BETWEEN 6 AND 17 THEN 50 * (12 - ABS(hr - 12)) ELSE 0 END AS swin,
         ABS(((pos * 3) % 17) - 8) AS vpd
  FROM base
), {", ".join(ctes)}
SELECT g.event_type, g.bucket_ts,
       CASE WHEN g.v IS NOT NULL THEN ROUND(ROUND(g.v, 9), 6)
            ELSE ROUND(ROUND(COALESCE({", ".join(sel_val)}), 9), 6) END AS value_filled,
       CAST(CASE WHEN g.v IS NOT NULL THEN 0 {" ".join(sel_flag)} ELSE 0 END AS BIGINT) AS fill_flag,
       CAST(CASE WHEN g.v IS NOT NULL THEN 0 {" ".join(sel_q)} ELSE 0 END AS BIGINT) AS fill_quality,
       CAST(CASE WHEN g.v IS NOT NULL THEN 0 {" ".join(sel_nd)} ELSE 0 END AS BIGINT) AS n_donors
FROM g{joins}
"""


def q_harmonic_decompose(sf_dir: str):
    """Seasonal-trend decomposition (STL stand-in, stages/decompose.py):
    2-harmonic diurnal fit per event_type over the 1h tier. Closed-form
    least squares -> model-based, rows-only driver check; recovery
    pinned by tests/test_decompose_simfill.py."""
    from ..stages.decompose import harmonic_decompose

    t1h = _fused_tier(sf_dir, "1h")
    out = harmonic_decompose(
        t1h, value_col="mean", keys=("event_type",), ts_col="bucket_ts",
        period_us=US_PER_DAY, n_harmonics=2, trend_window=0,
    ).to_pandas()
    out = out[["event_type", "bucket_ts", "mean", "mean_trend", "mean_seasonal", "mean_resid"]]
    out["bucket_ts"] = pd.to_datetime(out["bucket_ts"]).astype("datetime64[us]")
    return _round6(out, ["mean", "mean_trend", "mean_seasonal", "mean_resid"]).sort_values(
        ["event_type", "bucket_ts"]
    ).reset_index(drop=True)


def q_timestamp_shifts(sf_dir: str):
    """detect_timestamp_shifts (reference
    diive/preprocessing/qaqc/detect_timestamp_shifts.py:116-186 FFT
    phase method; engine stages/shifts.py): per event_type, synthesize
    a clear-sky measured-radiation series as potential radiation
    clock-shifted by a deterministic per-type offset, then recover the
    daily shift from the k=1 Fourier phase difference. Model-based
    (FFT phase) -> rows-only driver check; planted-shift recovery is
    pinned by tests/test_granger_trees.py."""
    import zlib

    from ..functions.solar import potential_radiation
    from ..stages.exchange import grouped_block_map
    from ..stages.gaps import regularize_frame
    from ..stages.shifts import fft_phase_shift_frame
    from ..util import ts_to_us

    t1h = _fused_tier(sf_dir, "1h")

    def gfn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("bucket_ts", kind="stable")
        key = df["event_type"].iloc[0]
        reg = regularize_frame(df, US_PER_HOUR, "bucket_ts")
        us = ts_to_us(reg["bucket_ts"])
        shift_min = (zlib.crc32(str(key).encode()) % 5 - 2) * 30  # -60..+60
        reg["pot"] = potential_radiation(us, 47.0, 8.5)
        reg["meas"] = potential_radiation(us + shift_min * 60_000_000, 47.0, 8.5)
        out = fft_phase_shift_frame(reg, meas_col="meas", pot_col="pot", ts_col="bucket_ts")
        out.insert(0, "event_type", key)
        out["planted_minutes"] = shift_min
        return out

    out = grouped_block_map(t1h, ["event_type"], gfn).to_pandas()
    out["date"] = pd.to_datetime(out["date"]).astype("datetime64[us]")
    out = _round6(out, ["shift_minutes", "amplitude_meas", "clearness"])
    out["planted_minutes"] = out["planted_minutes"].astype("int64")
    return out.sort_values(["event_type", "date"]).reset_index(drop=True)


def q_percentiles101(sf_dir: str):
    """percentiles101 (reference diive/analysis/quantiles.py:20-52):
    the 0..100 percentile ladder per event_type, linear interpolation
    (pandas/numpy quantile == DuckDB quantile_cont). Runs on the
    engine's streaming exact-quantile machinery
    (``keyed_quantile_cont`` — the winsorize r4 de-skew treatment,
    VERDICT r4 #6): histogram partials + bracketing-bin resolution, so
    no key's full value set is ever shipped into one block; driver
    state is bounded by (keys x quantiles), not raw rows."""
    from ..stages.stratified import keyed_quantile_cont

    ds = _events(sf_dir, ["event_type", "value"])
    qs = [i / 100.0 for i in range(101)]
    t = keyed_quantile_cont(ds, "event_type", "value", qs)
    out = pd.DataFrame({
        "event_type": t["event_type"],
        "percentile": np.rint(t["q"].to_numpy(np.float64) * 100.0
                              ).astype("int64"),
        "value": stable_round6(t["value"].astype(float)),
    })
    return out.sort_values(["event_type", "percentile"]).reset_index(drop=True)


_SQL_PCT101 = """
WITH q AS (
  SELECT event_type, quantile_cont(value, [{pcts}]) AS qs
  FROM events WHERE value IS NOT NULL GROUP BY 1
)
SELECT event_type,
       UNNEST(range(0, 101)) AS percentile,
       ROUND(ROUND(UNNEST(qs), 9), 6) AS value
FROM q
""".format(pcts=", ".join(str(i / 100.0) for i in range(101)))


def q_stl_decompose(sf_dir: str):
    """True STL-lite decomposition (loess cycle-subseries smoothing,
    stages/decompose.py:stl_decompose — the upgrade over the harmonic
    stand-in; reference SeasonalTrendDecompositionSTL): diurnal period
    24 over the 1h tier per event_type. Iterative loess -> model-based,
    rows-only driver check; recovery pinned by
    tests/test_decompose_simfill.py."""
    from ..stages.decompose import stl_decompose

    t1h = _fused_tier(sf_dir, "1h")
    out = stl_decompose(
        t1h, value_col="mean", keys=("event_type",), ts_col="bucket_ts",
        period=24, seasonal_window=11,
    ).to_pandas()
    out = out[["event_type", "bucket_ts", "mean", "mean_trend", "mean_seasonal", "mean_resid"]]
    out["bucket_ts"] = pd.to_datetime(out["bucket_ts"]).astype("datetime64[us]")
    return _round6(out, ["mean", "mean_trend", "mean_seasonal", "mean_resid"]).sort_values(
        ["event_type", "bucket_ts"]
    ).reset_index(drop=True)


def q_profile(sf_dir: str):
    """Dataset profiling (reference diive/analysis/profile.py:
    profile_dataframe; stages/profile.py): per-column COUNT/MISSING/
    N_GAPS/N_UNIQUE/N_ZEROS/CONSTANT/MEAN/SD/MIN/MEDIAN/MAX over the
    events columns (value, user_id), row order (ts, event_id). All
    pieces streaming: moment partials, one (variable,value) exchange
    for exact distinct counts, bucket-stitched NaN-run counting, exact
    distributed median selection."""
    from ..stages.profile import profile_columns

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])
    out = profile_columns(
        ds, ["value", "user_id"], order_cols=["ts", "event_id"], id_col="event_id"
    )
    for c in ("missing_perc", "mean", "sd", "min", "median", "max"):
        out[c] = stable_round6(out[c].astype(float))
    for c in ("count", "missing", "n_gaps", "n_unique", "n_zeros"):
        out[c] = out[c].astype("int64")
    out["constant"] = out["constant"].astype(bool)
    return out.sort_values("variable").reset_index(drop=True)


_SQL_PROFILE_ONE = """
SELECT '{col}' AS variable,
       CAST(COUNT(v) AS BIGINT) AS count,
       CAST(COUNT(*) - COUNT(v) AS BIGINT) AS missing,
       ROUND(ROUND(100.0 * (COUNT(*) - COUNT(v)) / COUNT(*), 9), 6) AS missing_perc,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (
          SELECT v, rn, LAG(v) OVER (ORDER BY rn) AS pv FROM (
            SELECT {col} AS v, ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn FROM events)
        ) WHERE v IS NULL AND (pv IS NOT NULL OR rn = 1)) AS n_gaps,
       CAST(COUNT(DISTINCT v) AS BIGINT) AS n_unique,
       CAST(COUNT(*) FILTER (WHERE v = 0) AS BIGINT) AS n_zeros,
       COUNT(DISTINCT v) <= 1 AS constant,
       ROUND(ROUND(AVG(v), 9), 6) AS mean,
       ROUND(ROUND(STDDEV_SAMP(v), 9), 6) AS sd,
       ROUND(ROUND(MIN(v)::DOUBLE, 9), 6) AS min,
       ROUND(ROUND(quantile_cont(v::DOUBLE, 0.5), 9), 6) AS median,
       ROUND(ROUND(MAX(v)::DOUBLE, 9), 6) AS max
FROM (SELECT {col} AS v FROM events)
"""

_SQL_PROFILE = (
    _SQL_PROFILE_ONE.format(col="user_id")
    + " UNION ALL "
    + _SQL_PROFILE_ONE.format(col="value")
    + " ORDER BY variable"
)


def q_time_since(sf_dir: str):
    """TimeSince counter (reference diive/variables/temporal.py:139-349;
    stages/timefeatures.py:time_since_frame): per event_type ordered by
    (ts, event_id), records since the value was last inside
    [30, per-type max] (include_lim=True; NaN counts as outside so gaps
    never reset). SQL oracle = gaps-and-islands run numbering."""
    from ..stages.exchange import grouped_block_map
    from ..stages.timefeatures import time_since_frame

    ds = _events(sf_dir, ["event_id", "event_type", "ts", "value"])

    def gfn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        flag, since = time_since_frame(g["value"].to_numpy(), lower_lim=30.0)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "event_type": g["event_type"].to_numpy(),
                "flag_outside": flag,
                "timesince": since,
            }
        )

    out = grouped_block_map(ds, ["event_type"], gfn).to_pandas()
    out["flag_outside"] = out["flag_outside"].astype("int64")
    out["timesince"] = out["timesince"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


_SQL_TIME_SINCE = """
WITH f AS (
  SELECT event_id, event_type,
         CASE WHEN value IS NULL
                OR NOT (value >= 30.0
                        AND value <= MAX(value) OVER (PARTITION BY event_type))
              THEN 1 ELSE 0 END AS flag_outside,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
  FROM events
),
g AS (
  SELECT *, rn - ROW_NUMBER() OVER (PARTITION BY event_type, flag_outside ORDER BY rn) AS grp
  FROM f
)
SELECT event_id, event_type,
       CAST(flag_outside AS BIGINT) AS flag_outside,
       CAST(flag_outside * ROW_NUMBER() OVER (PARTITION BY event_type, flag_outside, grp ORDER BY rn) AS BIGINT) AS timesince
FROM g
"""


def q_stratified_analysis(sf_dir: str):
    """StratifiedAnalysis / decoupling (reference
    diive/analysis/decoupling.py:24-210; stages/stratified.py): rows
    stratified into 8 global quantile bins of z = value (exact
    distributed ntile via 3-pass histogram refinement — no whole-column
    driver materialization), each stratum binned into 4 quantile bins
    of x = hour-of-day, y = value*cos(user_id) aggregated per cell with
    median + P16/P84 error bars. Bin rule is SQL ntile ORDER BY (val,
    event_id), duplicate-safe."""
    from ..stages.stratified import stratified_analysis
    from ..util import ts_to_us as _tsus

    ds = _events(sf_dir, ["event_id", "event_type", "ts", "user_id", "value"])

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["value"].notna()]
        hours = (_tsus(df["ts"]) // US_PER_HOUR) % 24
        uid = df["user_id"].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                "event_id": df["event_id"],
                "z": df["value"],
                "x": hours.astype(np.float64),
                "y": df["value"].to_numpy() * np.cos(uid),
            }
        )

    out = stratified_analysis(
        ds.map_batches(synth, batch_format="pandas"),
        z="z", x="x", y="y", id_col="event_id", n_bins_z=8, n_bins_x=4,
    ).to_pandas()
    for c in ("x_agg", "y_agg", "x_p16", "x_p84", "y_p16", "y_p84"):
        out[c] = stable_round6(out[c].astype(float))
    out["z_bin"] = out["z_bin"].astype("int64")
    out["x_bin"] = out["x_bin"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["z_bin", "x_bin"]).reset_index(drop=True)


_SQL_STRATIFIED = """
WITH pts AS (
  SELECT event_id, value AS z,
         hour(ts) AS xh,
         value * cos(user_id) AS y
  FROM events WHERE value IS NOT NULL
),
zb AS (
  SELECT *, ntile(8) OVER (ORDER BY z, event_id) AS z_bin FROM pts
),
xb AS (
  SELECT *, ntile(4) OVER (PARTITION BY z_bin ORDER BY xh, event_id) AS x_bin FROM zb
)
SELECT z_bin::BIGINT AS z_bin, x_bin::BIGINT AS x_bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(ROUND(median(xh::DOUBLE), 9), 6) AS x_agg,
       ROUND(ROUND(median(y), 9), 6) AS y_agg,
       ROUND(ROUND(quantile_cont(xh::DOUBLE, 0.16), 9), 6) AS x_p16,
       ROUND(ROUND(quantile_cont(xh::DOUBLE, 0.84), 9), 6) AS x_p84,
       ROUND(ROUND(quantile_cont(y, 0.16), 9), 6) AS y_p16,
       ROUND(ROUND(quantile_cont(y, 0.84), 9), 6) AS y_p84
FROM xb GROUP BY 1, 2
"""


def q_compound_extremes(sf_dir: str):
    """CompoundExtremes (reference diive/analysis/compoundextremes.py,
    Wang et al. compound dry-hot pattern; stages/extremes.py): daily
    'click' vs 'error' means as the two drivers, record-standardized
    z-scores (ddof=1), var1 extreme high / var2 extreme low at |z|>=1,
    periods classified none/var1/var2/compound. Daily aggregation comes
    from the engine's own 1d cascade tier; inputs rounded 6dp on both
    sides so the z-scores agree to summation-order ulps."""
    from ..stages.extremes import compound_extremes_frame

    t1d = _fused_tier(sf_dir, "1d").to_pandas()
    t1d["m"] = stable_round6(t1d["mean"].astype(float))
    a = t1d[t1d["event_type"] == "click"][["bucket_ts", "m"]].rename(columns={"m": "v1"})
    b = t1d[t1d["event_type"] == "error"][["bucket_ts", "m"]].rename(columns={"m": "v2"})
    j = pd.merge(a, b, on="bucket_ts", how="inner").sort_values("bucket_ts")
    out = compound_extremes_frame(
        j, period_col="bucket_ts", v1="v1", v2="v2", agg="daily",
        var1_extreme="high", var2_extreme="low", threshold=1.0,
        standardize_by="record",
    )
    res = pd.DataFrame(
        {
            "day_ts": pd.to_datetime(out["bucket_ts"]).astype("datetime64[us]"),
            "v1": out["v1"],
            "v2": out["v2"],
            "z1": stable_round6(out["z1"].astype(float)),
            "z2": stable_round6(out["z2"].astype(float)),
            "var1_extreme": out["var1_extreme"].astype(bool),
            "var2_extreme": out["var2_extreme"].astype(bool),
            "category": out["category"].astype(str),
        }
    )
    return res.sort_values("day_ts").reset_index(drop=True)


_SQL_COMPOUND_EXTREMES = """
WITH d AS (
  SELECT event_type, time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
xy AS (
  SELECT a.bts, a.m AS v1, b.m AS v2
  FROM d a JOIN d b USING (bts)
  WHERE a.event_type = 'click' AND b.event_type = 'error'
),
z AS (
  SELECT bts, v1, v2,
         (v1 - AVG(v1) OVER ()) / STDDEV_SAMP(v1) OVER () AS z1,
         (v2 - AVG(v2) OVER ()) / STDDEV_SAMP(v2) OVER () AS z2
  FROM xy
)
SELECT bts AS day_ts, v1, v2,
       ROUND(ROUND(z1, 9), 6) AS z1,
       ROUND(ROUND(z2, 9), 6) AS z2,
       z1 >= 1.0 AS var1_extreme,
       z2 <= -1.0 AS var2_extreme,
       CASE WHEN z1 >= 1.0 AND z2 <= -1.0 THEN 'compound'
            WHEN z1 >= 1.0 THEN 'var1'
            WHEN z2 <= -1.0 THEN 'var2'
            ELSE 'none' END AS category
FROM z
"""


def q_max_covariance(sf_dir: str):
    """MaxCovariance lag search (reference diive/flux/hires/lag.py:24-300,
    the detect_and_remove_tlag core; stages/lag.py): per event_type,
    the lagged variable is the segment's own value lagged by 7 records
    (planted lag, synthesized identically in SQL via LAG(value, 7)), so
    the |cov| peak must land at shift=+7. Returns the full ladder for
    shifts -20..20 with the max-|cov| flag; the scipy-style auto-peak
    validation is engine-only (pytest-pinned, not SQL-expressible)."""
    from ..stages.exchange import grouped_block_map
    from ..stages.lag import max_covariance_frame

    ds = _events(sf_dir, ["event_id", "event_type", "ts", "value"])

    def gfn(g: pd.DataFrame) -> pd.DataFrame:
        # lagged synthesized AFTER the exchange: needs the whole ordered
        # segment (mirrors SQL LAG(value, 7) OVER the segment window)
        g = g.sort_values(["ts", "event_id"], kind="stable")
        g = g.assign(lagged=g["value"].shift(7))
        out = max_covariance_frame(
            g, ref_col="value", lagged_col="lagged", winsize_from=-20, winsize_to=20
        )
        out.insert(0, "event_type", g["event_type"].iloc[0])
        return out

    out = grouped_block_map(ds, ["event_type"], gfn).to_pandas()
    out = out.drop(columns=["flag_peak_auto"])
    for c in ("cov", "cov_abs"):
        out[c] = stable_round6(out[c].astype(float))
    out["shift"] = out["shift"].astype("int64")
    out["n"] = out["n"].astype("int64")
    out["flag_peak_max_cov_abs"] = out["flag_peak_max_cov_abs"].astype(bool)
    return out.sort_values(["event_type", "shift"]).reset_index(drop=True)


_SQL_MAX_COV = """
WITH s AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn,
         LAG(value, 7) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS lagged
  FROM events
),
shifts AS (SELECT unnest(generate_series(-20, 20)) AS shift),
pairs AS (
  SELECT a.event_type, sh.shift, a.value AS ref, b.lagged AS lv
  FROM shifts sh
  JOIN s a ON TRUE
  JOIN s b ON b.event_type = a.event_type AND b.rn = a.rn + sh.shift
),
cov AS (
  SELECT event_type, shift,
         CAST(COUNT(*) FILTER (WHERE ref IS NOT NULL AND lv IS NOT NULL) AS BIGINT) AS n,
         covar_samp(ref, lv) AS c
  FROM pairs GROUP BY 1, 2
)
SELECT event_type, shift::BIGINT AS shift, n,
       ROUND(ROUND(c, 9), 6) AS cov,
       ROUND(ROUND(ABS(c), 9), 6) AS cov_abs,
       ABS(c) = MAX(ABS(c)) OVER (PARTITION BY event_type) AS flag_peak_max_cov_abs
FROM cov
"""


def q_xcorr_lag_scan(sf_dir: str):
    """Exact-checkable slice of the timestamp-shift detector
    (stages/shifts.py:crosscorr_shift_frame — its candidate-lag
    correlation scan, minus the 1-min interpolation): Pearson
    correlation of the compacted hourly 'click' vs 'error' mean series
    at integer-hour lags -6..6 (x_t paired with y_{t+lag}). Returns the
    full 13-row ladder (no argmax: ladder values are rounding-robust,
    the argmax would be a knife-edge tie)."""
    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    a = t1h[t1h["event_type"] == "click"][["bucket_ts", "m"]].rename(columns={"m": "x"})
    b = t1h[t1h["event_type"] == "error"][["bucket_ts", "m"]].rename(columns={"m": "y"})
    j = pd.merge(a, b, on="bucket_ts", how="inner").sort_values("bucket_ts")
    x, y = j["x"].to_numpy(), j["y"].to_numpy()
    rows = []
    for lag in range(-6, 7):
        if lag >= 0:
            xa, yb = x[: len(x) - lag] if lag else x, y[lag:]
        else:
            xa, yb = x[-lag:], y[:lag]
        ca, cb = xa - xa.mean(), yb - yb.mean()
        r = float(ca @ cb) / np.sqrt(float(ca @ ca) * float(cb @ cb))
        rows.append((lag, len(xa), r))
    out = pd.DataFrame(rows, columns=["lag", "n", "r"])
    out["lag"] = out["lag"].astype("int64")
    out["n"] = out["n"].astype("int64")
    out["r"] = stable_round6(out["r"].astype(float))
    return out.reset_index(drop=True)


_SQL_XCORR_SCAN = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
xy AS (
  SELECT a.bts, a.m AS x, b.m AS y
  FROM hourly a JOIN hourly b USING (bts)
  WHERE a.event_type = 'click' AND b.event_type = 'error'
),
o AS (SELECT x, y, ROW_NUMBER() OVER (ORDER BY bts) AS rn FROM xy),
lags AS (SELECT unnest(generate_series(-6, 6)) AS lag),
pairs AS (
  SELECT l.lag, a.x AS xa, b.y AS yb
  FROM lags l
  JOIN o a ON TRUE
  JOIN o b ON b.rn = a.rn + l.lag
)
SELECT lag::BIGINT AS lag, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(ROUND(corr(xa, yb), 9), 6) AS r
FROM pairs GROUP BY lag ORDER BY lag
"""


def q_wind_rotation(sf_dir: str):
    """Wind double rotation (reference diive/flux/hires/windrotation.py,
    Wilczak 2001; stages/wind.py): per (event_type, 1h) averaging
    window, yaw/pitch angles from the window's mean wind applied
    sample-wise. Wind components synthesized deterministically from the
    events table (u = value, v = value*cos(user_id),
    w = value*sin(user_id)/10) identically on both sides."""
    from ..stages.wind import wind_double_rotation

    ds = _events(sf_dir, ["event_id", "event_type", "ts", "user_id", "value"])
    bucketer = make_bucket_assigner(US_PER_HOUR, end_stamped=True)

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy(dtype=np.float64)
        df = df.assign(
            u=df["value"],
            v=df["value"] * np.cos(uid),
            w=df["value"] * np.sin(uid) / 10.0,
        )
        return df.drop(columns=["user_id"])

    prepared = ds.map_batches(bucketer, batch_format="pyarrow", zero_copy_batch=True).map_batches(
        synth, batch_format="pandas"
    )
    out = wind_double_rotation(
        prepared, keys=["event_type", "bucket_ts"], order_by=["event_id"]
    ).to_pandas()
    res = out[["event_id", "event_type"]].copy()
    for c in ("u2", "v2", "w2", "theta", "phi"):
        res[c] = stable_round6(out[c].astype(float))
    return res.sort_values("event_id").reset_index(drop=True)


_SQL_WIND_ROT = """
WITH s AS (
  SELECT event_id, event_type,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bts,
         value AS u,
         value * cos(user_id) AS v,
         value * sin(user_id) / 10 AS w
  FROM events
),
m AS (
  SELECT event_type, bts, AVG(u) AS um, AVG(v) AS vm, AVG(w) AS wm
  FROM s GROUP BY 1, 2
),
ang AS (
  SELECT event_type, bts, atan2(vm, um) AS theta,
         atan2(wm, um * cos(atan2(vm, um)) + vm * sin(atan2(vm, um))) AS phi
  FROM m
)
SELECT s.event_id, s.event_type,
       ROUND(ROUND((s.u * cos(theta) + s.v * sin(theta)) * cos(phi) + s.w * sin(phi), 9), 6) + 0.0 AS u2,
       ROUND(ROUND(-s.u * sin(theta) + s.v * cos(theta), 9), 6) + 0.0 AS v2,
       ROUND(ROUND(-(s.u * cos(theta) + s.v * sin(theta)) * sin(phi) + s.w * cos(phi), 9), 6) + 0.0 AS w2,
       ROUND(ROUND(theta, 9), 6) + 0.0 AS theta,
       ROUND(ROUND(phi, 9), 6) + 0.0 AS phi
FROM s JOIN ang USING (event_type, bts)
"""


def q_flux_detection_limit(sf_dir: str):
    """Flux detection limit (reference flux/hires/fluxdetectionlimit.py
    :62-443, Langford 2015 / Striednig 2020; stages/fdl.py): per
    event_type (one averaging window per segment, the whole-group
    construction of q_max_covariance), synthesize the hires raw columns
    deterministically from events (identically in SQL), then the full
    chain: sonic->air temperature, double rotation, w'/c' primes,
    cross-covariance ladder -20..20, ideal-gas flux conversion, LAN15
    eq.9 noise RMSE over the +/-[15,20] edge windows, FDL = 3*RMSE,
    signal at the default lag (-3) and at the max-|cov| lag, SNR
    ratios. Tie-break for the max-|cov| lag: smallest shift (reference
    foundlag.index[0])."""
    from ..stages.fdl import flux_detection_limit

    ds = _events(sf_dir, ["event_id", "event_type", "ts", "user_id", "value"])

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy(dtype=np.float64)
        val = df["value"].to_numpy(dtype=np.float64)
        return df.assign(
            u=val,
            v=val * np.cos(uid),
            w=val * np.sin(uid) / 10.0,
            c=val * np.cos(uid / 7.0),
            t_sonic=295.0 + val / 100.0,
            h2o=0.01 + (df["user_id"].to_numpy() % 10) / 1000.0,
            press=96000.0 + val * 10.0,
        ).drop(columns=["user_id"])

    prepared = ds.map_batches(synth, batch_format="pandas")
    out = flux_detection_limit(
        prepared,
        segment_keys=["event_type"],
        order_cols=["ts", "event_id"],
        default_lag=3,
        noise_range=5,
        lag_from=-20,
        lag_to=20,
    ).to_pandas()
    for col in (
        "flux_noise_rmse",
        "flux_detection_limit",
        "flux_signal_at_default_lag",
        "flux_signal_at_cov_max_lag",
        "signal_to_noise",
        "signal_to_detection_limit",
    ):
        out[col] = stable_round6(out[col].astype(float))
    out["cov_max_shift"] = out["cov_max_shift"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


_SQL_FDL = """
WITH raw AS (
  SELECT event_type,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn,
         value AS u,
         value * cos(user_id) AS v,
         value * sin(user_id) / 10 AS w,
         value * cos(user_id / 7.0) AS c,
         (295.0 + value / 100.0) / (1 + 0.32 * (0.01 + (user_id % 10) / 1000.0)) AS ta,
         (96000.0 + value * 10.0) * (1 - (0.01 + (user_id % 10) / 1000.0)) AS p_dry
  FROM events
),
m AS (
  SELECT event_type, AVG(u) AS um, AVG(v) AS vm, AVG(w) AS wm,
         AVG(ta) AS ta_mean, AVG(p_dry) AS pd_mean
  FROM raw GROUP BY 1
),
ang AS (
  SELECT event_type, ta_mean, pd_mean, atan2(vm, um) AS theta,
         atan2(wm, um * cos(atan2(vm, um)) + vm * sin(atan2(vm, um))) AS phi
  FROM m
),
rot AS (
  SELECT r.event_type, r.rn, r.c,
         -(r.u * cos(theta) + r.v * sin(theta)) * sin(phi) + r.w * cos(phi) AS w2,
         ta_mean, pd_mean
  FROM raw r JOIN ang USING (event_type)
),
shifts AS (SELECT unnest(generate_series(-20, 20)) AS shift),
cov AS (
  SELECT a.event_type, sh.shift,
         covar_samp(a.w2, b.c) * a.pd_mean / (8.31446261815324 * a.ta_mean) AS cov_flux
  FROM shifts sh
  JOIN rot a ON TRUE
  JOIN rot b ON b.event_type = a.event_type AND b.rn = a.rn + sh.shift
  GROUP BY 1, 2, a.pd_mean, a.ta_mean
),
noise AS (
  SELECT event_type,
         sqrt(0.5 * (
           power(stddev_samp(cov_flux) FILTER (WHERE shift BETWEEN -20 AND -15), 2) +
           power(avg(cov_flux) FILTER (WHERE shift BETWEEN -20 AND -15), 2) +
           power(stddev_samp(cov_flux) FILTER (WHERE shift BETWEEN 15 AND 20), 2) +
           power(avg(cov_flux) FILTER (WHERE shift BETWEEN 15 AND 20), 2)
         )) AS rmse
  FROM cov GROUP BY 1
),
sig AS (
  SELECT event_type, cov_flux AS flux FROM cov WHERE shift = -3
),
peak AS (
  SELECT event_type, shift AS cov_max_shift, cov_flux AS maxcovflux
  FROM cov
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY event_type ORDER BY ABS(cov_flux) DESC, shift ASC) = 1
)
SELECT n.event_type,
       ROUND(ROUND(n.rmse, 9), 6) AS flux_noise_rmse,
       ROUND(ROUND(3 * n.rmse, 9), 6) AS flux_detection_limit,
       p.cov_max_shift::BIGINT AS cov_max_shift,
       ROUND(ROUND(s.flux, 9), 6) AS flux_signal_at_default_lag,
       ROUND(ROUND(p.maxcovflux, 9), 6) AS flux_signal_at_cov_max_lag,
       ROUND(ROUND(ABS(s.flux) / NULLIF(n.rmse, 0), 9), 6) AS signal_to_noise,
       ROUND(ROUND(ABS(s.flux) / NULLIF(3 * n.rmse, 0), 9), 6) AS signal_to_detection_limit
FROM noise n JOIN sig s USING (event_type) JOIN peak p USING (event_type)
ORDER BY n.event_type
"""


def q_harmonic_k1_fit(sf_dir: str):
    """Exact-checkable harmonic slice: per event_type, the k=1 diurnal
    harmonic fit (y ~ b0 + bs*sin + bc*cos over a 24h period) of the
    6dp-rounded hourly means, via closed-form normal equations shared
    verbatim with the SQL oracle (stages/decompose.py:harmonic_k1_fit).
    Complements the rows-only harmonic_decompose/stl_decompose."""
    from ..stages.decompose import harmonic_k1_fit
    from ..util import ts_to_us as _tsus

    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    rows = []
    for et, g in t1h.groupby("event_type", sort=True):
        g = g.sort_values("bucket_ts")
        b0, bs, bc = harmonic_k1_fit(_tsus(pd.to_datetime(g["bucket_ts"])), g["m"].to_numpy())
        rows.append((et, len(g), b0, bs, bc))
    out = pd.DataFrame(rows, columns=["event_type", "n", "b0", "bs", "bc"])
    out["n"] = out["n"].astype("int64")
    for c in ("b0", "bs", "bc"):
        out[c] = stable_round6(out[c].astype(float))
    return out.reset_index(drop=True)


_SQL_HARMONIC_K1 = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
ph AS (
  SELECT event_type, m,
         sin(2 * pi() * ((epoch(bts)::BIGINT % 86400) / 86400.0)) AS s,
         cos(2 * pi() * ((epoch(bts)::BIGINT % 86400) / 86400.0)) AS c
  FROM hourly
),
sums AS (
  SELECT event_type, COUNT(*)::DOUBLE AS n,
         AVG(m) AS my, AVG(s) AS ms, AVG(c) AS mc,
         covar_pop(m, s) * COUNT(*) AS sys_,
         covar_pop(m, c) * COUNT(*) AS syc,
         covar_pop(s, s) * COUNT(*) AS sss,
         covar_pop(c, c) * COUNT(*) AS scc,
         covar_pop(s, c) * COUNT(*) AS ssc
  FROM ph GROUP BY 1
),
calc AS (
  SELECT event_type, n, my, ms, mc,
         (sys_ * scc - syc * ssc) / (sss * scc - ssc * ssc) AS bs,
         (syc * sss - sys_ * ssc) / (sss * scc - ssc * ssc) AS bc
  FROM sums
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       ROUND(ROUND(my - bs * ms - bc * mc, 9), 6) AS b0,
       ROUND(ROUND(bs, 9), 6) AS bs,
       ROUND(ROUND(bc, 9), 6) AS bc
FROM calc ORDER BY event_type
"""


def q_granger_lag1_f(sf_dir: str):
    """Exact-checkable Granger slice: lag-1 F-statistic between the
    hourly 'click' and 'error' mean series (both directions), with the
    closed-form covariance algebra shared verbatim by the SQL oracle
    (stages/granger.py:granger_lag1_f). Inputs are 6dp-rounded hourly
    means so both sides regress over bit-identical series; the pair
    series is the inner join on hours where BOTH types have data
    (equivalent to the reference's pairwise dropna before lagging,
    granger.py:113-116)."""
    from ..stages.granger import granger_lag1_f

    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    a = t1h[t1h["event_type"] == "click"][["bucket_ts", "m"]].rename(columns={"m": "x"})
    b = t1h[t1h["event_type"] == "error"][["bucket_ts", "m"]].rename(columns={"m": "y"})
    j = pd.merge(a, b, on="bucket_ts", how="inner").sort_values("bucket_ts")
    rows = []
    for direction, (xv, yv) in {
        "x->y": (j["x"].to_numpy(), j["y"].to_numpy()),
        "y->x": (j["y"].to_numpy(), j["x"].to_numpy()),
    }.items():
        f, df2, n = granger_lag1_f(xv, yv)
        rows.append((direction, n, df2, f))
    out = pd.DataFrame(rows, columns=["direction", "n", "df2", "f_stat"])
    out["n"] = out["n"].astype("int64")
    out["df2"] = out["df2"].astype("int64")
    out["f_stat"] = stable_round6(out["f_stat"].astype(float))
    return out.sort_values("direction").reset_index(drop=True)


_SQL_GRANGER_LAG1 = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
xy AS (
  SELECT a.bts, a.m AS x, b.m AS y
  FROM hourly a JOIN hourly b USING (bts)
  WHERE a.event_type = 'click' AND b.event_type = 'error'
),
lagd AS (
  SELECT x, y, LAG(x) OVER w AS xl, LAG(y) OVER w AS yl
  FROM xy WINDOW w AS (ORDER BY bts)
),
d AS (SELECT * FROM lagd WHERE xl IS NOT NULL),
sums AS (
  SELECT 'x->y' AS direction, COUNT(*)::DOUBLE AS n,
         covar_pop(y, y) * COUNT(*) AS syy,
         covar_pop(yl, yl) * COUNT(*) AS saa,
         covar_pop(xl, xl) * COUNT(*) AS sbb,
         covar_pop(y, yl) * COUNT(*) AS sya,
         covar_pop(y, xl) * COUNT(*) AS syb,
         covar_pop(yl, xl) * COUNT(*) AS sab
  FROM d
  UNION ALL
  SELECT 'y->x', COUNT(*)::DOUBLE,
         covar_pop(x, x) * COUNT(*),
         covar_pop(xl, xl) * COUNT(*),
         covar_pop(yl, yl) * COUNT(*),
         covar_pop(x, xl) * COUNT(*),
         covar_pop(x, yl) * COUNT(*),
         covar_pop(xl, yl) * COUNT(*)
  FROM d
),
calc AS (
  SELECT direction, n,
         syy - sya * sya / saa AS rss_r,
         syy - ((sya * sbb - syb * sab) * sya + (syb * saa - sya * sab) * syb)
               / (saa * sbb - sab * sab) AS rss_u
  FROM sums
)
SELECT direction,
       CAST(n AS BIGINT) AS n,
       CAST(n - 3 AS BIGINT) AS df2,
       ROUND(ROUND((rss_r - rss_u) / (rss_u / (n - 3)), 9), 6) AS f_stat
FROM calc
"""


def q_granger(sf_dir: str):
    """GrangerCausality (reference diive/analysis/granger.py:16-136;
    from-scratch OLS F-test, stages/granger.py): does the hourly mean of
    'click' events Granger-cause the hourly mean of 'view' events (and
    vice versa), lags 1..5. Statistical test -> rows-only driver check;
    the F p-value machinery is pinned against closed forms in
    tests/test_granger_trees.py."""
    from ..stages.granger import granger_causality
    from ..stages.gaps import regularize_frame

    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    types = sorted(t1h["event_type"].unique())[:2]
    a = t1h[t1h["event_type"] == types[0]].sort_values("bucket_ts")
    b = t1h[t1h["event_type"] == types[1]].sort_values("bucket_ts")
    a = regularize_frame(a, US_PER_HOUR, "bucket_ts")
    b = regularize_frame(b, US_PER_HOUR, "bucket_ts")
    joined = pd.merge(
        a[["bucket_ts", "mean"]].rename(columns={"mean": "x"}),
        b[["bucket_ts", "mean"]].rename(columns={"mean": "y"}),
        on="bucket_ts", how="inner",
    )
    rows = []
    for direction, (xc, yc) in {"x->y": ("x", "y"), "y->x": ("y", "x")}.items():
        res = granger_causality(joined[xc], joined[yc], max_lag=5)
        res.insert(0, "direction", direction)
        rows.append(res)
    out = pd.concat(rows, ignore_index=True)
    out["lag"] = out["lag"].astype("int64")
    out["df1"] = out["df1"].astype("int64")
    out["df2"] = out["df2"].astype("int64")
    return _round6(out, ["f_stat", "p_value"])


def q_tree_gapfill(sf_dir: str):
    """Tree-ensemble gap-fill (RandomForestTS re-derivation on the
    from-scratch forest, stages/trees.py + mlfill.py:tree_fill):
    per-key forest fit on time features -> broadcast models ->
    actor-pool predict over the 1h tier's missing buckets. Seeded and
    deterministic but model-based -> rows-only driver check; recovery
    quality (beats ridge on nonlinear diurnal signal) pinned by
    tests/test_granger_trees.py."""
    from ..stages.gaps import regularize_frame
    from ..stages.mlfill import tree_fill
    from ..stages.exchange import grouped_block_map

    t1h = _fused_tier(sf_dir, "1h")

    def regularize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("bucket_ts", kind="stable")
        key = df["event_type"].iloc[0]
        reg = regularize_frame(df, US_PER_HOUR, "bucket_ts")
        reg["event_type"] = key
        return reg[["event_type", "bucket_ts", "mean"]]

    dense = grouped_block_map(t1h, ["event_type"], regularize)
    out = tree_fill(
        dense, value_col="mean", keys=("event_type",),
        model="forest", n_trees=10, max_depth=6, seed=42,
    ).to_pandas()
    out["bucket_ts"] = pd.to_datetime(out["bucket_ts"]).astype("datetime64[us]")
    out["mean_treefilled_is_model"] = out["mean_treefilled_is_model"].astype("int64")
    return _round6(out, ["mean", "mean_treefilled"]).sort_values(
        ["event_type", "bucket_ts"]
    ).reset_index(drop=True)


def _swin_pot_feature(ts_us: np.ndarray) -> np.ndarray:
    """Physics feature for the SW_IN filler: potential radiation at the
    fixture site (module-level so actor constructors can pickle it)."""
    from ..functions.solar import potential_radiation

    return potential_radiation(np.asarray(ts_us, dtype=np.int64), 47.0, 8.0).reshape(-1, 1)


def q_swin_gapfill(sf_dir: str):
    """Physics-aware SW_IN gap-filling (reference anchor
    /root/reference/diive/flux/lowres/../..//swin.py:23
    SWINGapFillerXGBoost, re-derived on the from-scratch forest):
    nighttime gaps (potential radiation below threshold) are set to the
    physically-correct zero; daytime gaps are model-filled by a forest
    trained on DAYTIME observations only, with SW_IN_POT as the
    dominant predictor (feature_fn on the tree-fill contract).
    Model-based -> rows-only; recovery quality pinned in the returned
    rmse columns (truth is synthesized) and by tests. One summary row
    per event_type."""
    from ..stages.exchange import grouped_block_map
    from ..stages.gaps import regularize_frame
    from ..stages.mlfill import tree_fill

    t1h = _fused_tier(sf_dir, "1h")

    def build(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("bucket_ts", kind="stable")
        key = df["event_type"].iloc[0]
        reg = regularize_frame(df, US_PER_HOUR, "bucket_ts")
        us = ts_to_us(reg["bucket_ts"])
        pot = _swin_pot_feature(us).ravel()
        h = ((us // 3_600_000_000) * 2_654_435_761) % 2_147_483_648
        clearness = 0.4 + 0.6 * (h / 2147483648.0)
        truth = pot * clearness
        gap = reg["mean"].isna().to_numpy()  # tier's missing buckets = gaps
        return pd.DataFrame({
            "event_type": key,
            "bucket_ts": reg["bucket_ts"],
            "sw_true": truth,
            "sw_in": np.where(gap, np.nan, truth),
            "is_night": pot < 1e-3,
        })

    dense = grouped_block_map(t1h, ["event_type"], build)

    day = dense.filter(expr="is_night == False")
    night = dense.filter(expr="is_night == True")

    filled_day = tree_fill(
        day, value_col="sw_in", keys=("event_type",),
        model="forest", n_trees=10, max_depth=6, seed=7,
        feature_fn=_swin_pot_feature,
    )

    def night_fill(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        v = df["sw_in"].astype(float)
        df["sw_in_treefilled"] = v.fillna(0.0)
        df["sw_in_treefilled_is_model"] = 0
        return df

    filled = filled_day.union(
        night.map_batches(night_fill, batch_format="pandas", zero_copy_batch=False)
    ).to_pandas()

    filled["err2"] = (filled["sw_in_treefilled"] - filled["sw_true"]) ** 2
    filled["is_model"] = filled["sw_in_treefilled_is_model"].astype(int)
    filled["night_gap"] = (filled["is_night"] & filled["sw_in"].isna()).astype(int)
    g = filled.groupby("event_type", as_index=False).agg(
        n=("bucket_ts", "count"),
        n_gaps=("sw_in", lambda s: int(s.isna().sum())),
        n_model_fill=("is_model", "sum"),
        n_night_fill=("night_gap", "sum"),
        rmse_all=("err2", "mean"),
    )
    model_rows = filled[filled["is_model"] == 1]
    mg = model_rows.groupby("event_type")["err2"].mean()
    g["rmse_model"] = g["event_type"].map(np.sqrt(mg)).fillna(-1.0)
    g["rmse_all"] = np.sqrt(g["rmse_all"])
    for c in ("rmse_all", "rmse_model"):
        g[c] = np.asarray(round6(g[c].astype(float)), dtype=np.float64)
    for c in ("n", "n_gaps", "n_model_fill", "n_night_fill"):
        g[c] = g[c].astype("int64")
    return g.sort_values("event_type").reset_index(drop=True)


def q_eddypro_vm97(sf_dir: str):
    """VM97 (Vickers & Mahrt 1997) raw-data quality-flag expansion +
    signal-strength threshold flag (reference anchors
    /root/reference/diive/preprocessing/qaqc/eddyproflags.py:31-113 and
    quality_flags.py:36). A 9-digit EddyPro-style code (leading 8, then
    8 test digits in {0,1,9}) is synthesized per event, the engine
    EXPANDS it with the shared ``extract_digit`` kernel — hard-flag
    positions map 1->2, soft positions keep 1, digit 9 (missing) -> -1
    sentinel — and a 'discard below' threshold flag covers the
    signal-strength test. All integer arithmetic; the oracle replays
    the digit extraction with // and %."""
    ds = _events(sf_dir, ["event_id", "value"])
    # positions 1..8: spike HF, amplitude HF, dropout HF, abslim HF,
    # skewkurt HF, skewkurt SF, discont HF, discont SF
    hard = {1: True, 2: True, 3: True, 4: True, 5: True, 6: False, 7: True, 8: False}
    names = {1: "spike_hf", 2: "amplitude_hf", 3: "dropout_hf", 4: "abslim_hf",
             5: "skewkurt_hf", 6: "skewkurt_sf", 7: "discont_hf", 8: "discont_sf"}
    mults = {1: 2_654_435_761, 2: 2_246_822_519, 3: 3_266_489_917,
             4: 668_265_263, 5: 374_761_393, 6: 3_119_415_889,
             7: 1_000_003, 8: 2_038_074_743}

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.scalars import extract_digit

        eid = df["event_id"].to_numpy(dtype=np.int64)
        code = np.full(len(eid), 8, dtype=np.int64)
        for p in range(1, 9):
            h = (eid * mults[p]) % 16
            digit = np.where(h < 10, 0, np.where(h < 14, 1, 9))
            code = code * 10 + digit
        out = pd.DataFrame({"event_id": eid, "vm97_code": code})
        for p in range(1, 9):
            d = extract_digit(code, p, 9)
            flag = np.where(d == 9, -1, np.where((d == 1) & hard[p], 2, d))
            out[f"flag_{names[p]}"] = flag.astype(np.int64)
        # signal-strength test: 'discard below' threshold 40 on a
        # synthesized 0..100 signal derived from value
        ss = np.abs(df["value"].to_numpy(dtype=np.float64)) % 100.0
        out["flag_signal_strength"] = np.where(ss >= 40.0, 0, 2).astype(np.int64)
        return out

    out = ds.map_batches(expand, batch_format="pandas", zero_copy_batch=False) \
        .to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


_SQL_EDDYPRO_VM97 = """
WITH code AS (
  SELECT event_id, value,
         8 * 100000000
         + (CASE WHEN (event_id * 2654435761) % 16 < 10 THEN 0
                 WHEN (event_id * 2654435761) % 16 < 14 THEN 1 ELSE 9 END) * 10000000
         + (CASE WHEN (event_id * 2246822519) % 16 < 10 THEN 0
                 WHEN (event_id * 2246822519) % 16 < 14 THEN 1 ELSE 9 END) * 1000000
         + (CASE WHEN (event_id * 3266489917) % 16 < 10 THEN 0
                 WHEN (event_id * 3266489917) % 16 < 14 THEN 1 ELSE 9 END) * 100000
         + (CASE WHEN (event_id * 668265263) % 16 < 10 THEN 0
                 WHEN (event_id * 668265263) % 16 < 14 THEN 1 ELSE 9 END) * 10000
         + (CASE WHEN (event_id * 374761393) % 16 < 10 THEN 0
                 WHEN (event_id * 374761393) % 16 < 14 THEN 1 ELSE 9 END) * 1000
         + (CASE WHEN (event_id * 3119415889) % 16 < 10 THEN 0
                 WHEN (event_id * 3119415889) % 16 < 14 THEN 1 ELSE 9 END) * 100
         + (CASE WHEN (event_id * 1000003) % 16 < 10 THEN 0
                 WHEN (event_id * 1000003) % 16 < 14 THEN 1 ELSE 9 END) * 10
         + (CASE WHEN (event_id * 2038074743) % 16 < 10 THEN 0
                 WHEN (event_id * 2038074743) % 16 < 14 THEN 1 ELSE 9 END)
           AS vm97_code
  FROM events
)
SELECT event_id, vm97_code,
       CASE WHEN (vm97_code // 10000000) % 10 = 9 THEN -1
            WHEN (vm97_code // 10000000) % 10 = 1 THEN 2
            ELSE (vm97_code // 10000000) % 10 END AS flag_spike_hf,
       CASE WHEN (vm97_code // 1000000) % 10 = 9 THEN -1
            WHEN (vm97_code // 1000000) % 10 = 1 THEN 2
            ELSE (vm97_code // 1000000) % 10 END AS flag_amplitude_hf,
       CASE WHEN (vm97_code // 100000) % 10 = 9 THEN -1
            WHEN (vm97_code // 100000) % 10 = 1 THEN 2
            ELSE (vm97_code // 100000) % 10 END AS flag_dropout_hf,
       CASE WHEN (vm97_code // 10000) % 10 = 9 THEN -1
            WHEN (vm97_code // 10000) % 10 = 1 THEN 2
            ELSE (vm97_code // 10000) % 10 END AS flag_abslim_hf,
       CASE WHEN (vm97_code // 1000) % 10 = 9 THEN -1
            WHEN (vm97_code // 1000) % 10 = 1 THEN 2
            ELSE (vm97_code // 1000) % 10 END AS flag_skewkurt_hf,
       CASE WHEN (vm97_code // 100) % 10 = 9 THEN -1
            ELSE (vm97_code // 100) % 10 END AS flag_skewkurt_sf,
       CASE WHEN (vm97_code // 10) % 10 = 9 THEN -1
            WHEN (vm97_code // 10) % 10 = 1 THEN 2
            ELSE (vm97_code // 10) % 10 END AS flag_discont_hf,
       CASE WHEN vm97_code % 10 = 9 THEN -1
            ELSE vm97_code % 10 END AS flag_discont_sf,
       CASE WHEN ABS(value) % 100.0 >= 40.0 THEN 0 ELSE 2 END AS flag_signal_strength
FROM code
ORDER BY event_id
"""


def q_selfheating_sf(sf_dir: str):
    """Open-path self-heating correction, BUR08 + scaling-factor
    optimization (Burba 2008; reference anchor selfheating.py
    ScopPhysics/ScopOptimizer) with an EXACT SQL oracle. The engine
    computes the three-surface BUR08 sensible heat and FCT_UNSC per
    batch (pure map), then per (daytime, USTAR-quantile-bin) the
    scaling factor as the closed-form |B|-weighted-median minimizer of
    the reference's L1-of-cumsums objective (stages/burba.py). Inputs
    synthesized with the shared bijective-hash IEEE scheme; a planted
    per-daytime SF is recovered (pinned in tests)."""
    from ..stages.burba import fct_unsc_bur08, scop_scaling_factors

    ds = _events(sf_dir, ["event_id", "ts"])

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        eid = df["event_id"].to_numpy(dtype=np.int64)
        ts = pd.to_datetime(df["ts"])
        hour = ts.dt.hour.to_numpy()
        day = ((hour >= 7) & (hour <= 17)).astype(np.int64)
        h = {k: ((eid * m) % 2_147_483_648) / 2147483648.0
             for k, m in [(1, 1_000_003), (2, 2_654_435_761), (3, 2_246_822_519),
                          (4, 3_266_489_917), (5, 668_265_263), (6, 374_761_393),
                          (7, 3_119_415_889)]}
        ta = -5.0 + 30.0 * h[1]
        u = 0.5 + 6.0 * h[2]
        ustar = 0.05 + 0.6 * h[3]
        gas = 15000.0 + 2000.0 * h[4]
        rho_a = 1.15 + 0.1 * h[5]
        c_p = np.full(len(eid), 1004.0)
        fct = fct_unsc_bur08(ta, u, day, gas, rho_a, c_p)
        op = -5.0 + 10.0 * h[6]
        sf_true = np.where(day == 1, 2.5, 1.0)
        ref = op + fct * sf_true + 0.05 * (h[7] - 0.5)
        return pd.DataFrame({
            "event_id": eid, "ts": ts.astype("datetime64[us]"),
            "daytime": day, "ustar": ustar,
            "op": op, "ref": ref, "fct_unsc": fct,
        })

    out = scop_scaling_factors(
        ds.map_batches(synth, batch_format="pandas", zero_copy_batch=False)
    )
    for c in ("sf", "ustar_lo", "ustar_hi"):
        v = np.asarray(stable_round6(out[c].astype(float)), dtype=np.float64)
        out[c] = np.where(np.isfinite(v), v, -1.0)
    for c in ("daytime", "bin", "n"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


_SQL_SELFHEATING = """
WITH h AS (
  SELECT event_id, ts,
         CASE WHEN hour(ts) >= 7 AND hour(ts) <= 17 THEN 1 ELSE 0 END AS daytime,
         -5.0 + 30.0 * (((event_id * 1000003) % 2147483648) / 2147483648.0) AS ta,
         0.5 + 6.0 * (((event_id * 2654435761) % 2147483648) / 2147483648.0) AS u,
         0.05 + 0.6 * (((event_id * 2246822519) % 2147483648) / 2147483648.0) AS ustar,
         15000.0 + 2000.0 * (((event_id * 3266489917) % 2147483648) / 2147483648.0) AS gas,
         1.15 + 0.1 * (((event_id * 668265263) % 2147483648) / 2147483648.0) AS rho_a,
         -5.0 + 10.0 * (((event_id * 374761393) % 2147483648) / 2147483648.0) AS op,
         (((event_id * 3119415889) % 2147483648) / 2147483648.0) AS h7
  FROM events
),
fct AS (
  SELECT *,
    (
      ((0.02425 + 0.00007 * ta) * ((CASE WHEN daytime = 1 THEN 0.944 * ta + 2.57
                                         ELSE 0.883 * ta + 2.17 END) - ta)
         / (0.004 * SQRT(0.065 / u) + 0.004))
      + ((0.02425 + 0.00007 * ta)
         * ((0.0225 + (0.0028 * SQRT(0.045 / u) + (0.00025 / u) + 0.0045))
            * ((CASE WHEN daytime = 1 THEN 1.005 * ta + 0.24
                     ELSE 1.008 * ta - 0.41 END) - ta))
         / (0.0225 * (0.0028 * SQRT(0.045 / u) + (0.00025 / u) + 0.0045)))
      + 0.15 * ((0.02425 + 0.00007 * ta)
                * ((CASE WHEN daytime = 1 THEN 1.01 * ta + 0.36
                         ELSE 1.01 * ta - 0.17 END) - ta)
                / (0.0025 * LN((0.0025 + 0.0058 * SQRT(0.005 / u)) / 0.0025)))
    ) / (rho_a * 1004.0) * (gas / (ta + 273.15)) AS fct_unsc
  FROM h
),
rec AS (
  SELECT *,
         op + fct_unsc * (CASE WHEN daytime = 1 THEN 2.5 ELSE 1.0 END)
            + 0.05 * (h7 - 0.5) AS ref
  FROM fct
),
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY daytime ORDER BY ustar, event_id) - 1 AS rn,
         COUNT(*) OVER (PARTITION BY daytime) AS cnt
  FROM rec
),
binned AS (
  SELECT *, LEAST(4, GREATEST(0, (rn * 5 - 1) // (cnt - 1))) AS bin
  FROM ranked WHERE cnt > 1
),
cums AS (
  SELECT daytime, bin, ustar,
         SUM(op - ref) OVER w AS a,
         SUM(fct_unsc) OVER w AS b,
         COUNT(*) OVER (PARTITION BY daytime, bin) AS n,
         MIN(ustar) OVER (PARTITION BY daytime, bin) AS ustar_lo,
         MAX(ustar) OVER (PARTITION BY daytime, bin) AS ustar_hi
  FROM binned
  WINDOW w AS (PARTITION BY daytime, bin ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING)
),
bp AS (
  SELECT daytime, bin, n, ustar_lo, ustar_hi,
         -a / b AS r, ABS(b) AS w
  FROM cums WHERE b != 0.0 AND n >= 10
),
wm AS (
  SELECT *,
         SUM(w) OVER (PARTITION BY daytime, bin ORDER BY r
                      ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(w) OVER (PARTITION BY daytime, bin) AS tw
  FROM bp
)
SELECT daytime, bin,
       CAST(MIN(n) AS BIGINT) AS n,
       COALESCE(ROUND(ROUND(LEAST(50.0, GREATEST(0.0,
           MIN(r) FILTER (WHERE cw >= tw / 2.0))), 9), 6), -1.0) AS sf,
       ROUND(ROUND(MIN(ustar_lo), 9), 6) AS ustar_lo,
       ROUND(ROUND(MIN(ustar_hi), 9), 6) AS ustar_hi
FROM wm
GROUP BY daytime, bin
ORDER BY daytime, bin
"""


def q_nee_partition_dt(sf_dir: str):
    """Daytime light-response partitioning (Lasslop et al. 2010 model
    family; reference anchor flux/partitioning/daytime_reddyproc.py) —
    SIMPLIFIED deterministic re-derivation: VPD-limited rectangular
    hyperbola + fixed-E0 Lloyd-Taylor respiration, fit by profiled
    grid + coordinate descent (stages/partition.py:fit_lrc_window; the
    reference's BFGS-with-priors machinery is NOT ported). Iterative
    model fit -> rows-only; planted-parameter recovery pinned in
    tests. One row per event_type with the recovered (alpha, beta, k,
    rref)."""
    from ..stages.exchange import grouped_block_map
    from ..stages.partition import fit_lrc_window, predict_nep, lloyd_taylor

    ds = _events(sf_dir, ["event_id", "ts", "event_type"])

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        eid = df["event_id"].to_numpy(dtype=np.int64)
        ts = pd.to_datetime(df["ts"])
        hour = (ts.dt.hour + ts.dt.minute / 60.0).to_numpy()
        day = (hour >= 7) & (hour <= 17)
        h1 = ((eid * 2_654_435_761) % 2_147_483_648) / 2147483648.0
        h2 = ((eid * 2_246_822_519) % 2_147_483_648) / 2147483648.0
        h3 = ((eid * 3_266_489_917) % 2_147_483_648) / 2147483648.0
        rg = np.where(day, 900.0 * np.sin(np.pi * (hour - 7.0) / 10.0) * (0.6 + 0.4 * h1), 0.0)
        vpd = 5.0 + 20.0 * h2
        ta = 12.0 + 8.0 * np.sin(2 * np.pi * (hour - 9.0) / 24.0)
        lt1 = lloyd_taylor(ta + 273.15, 1.0, 170.0)
        nep_true = predict_nep(rg, vpd, lt1, alpha=0.05, beta=22.0, k=0.15, rref=2.2)
        nep = nep_true + 0.4 * (h3 - 0.5)
        out = pd.DataFrame({
            "event_type": df["event_type"], "nep": nep,
            "rg": rg, "vpd": vpd, "ta": ta,
        })
        return out[day].reset_index(drop=True)

    def fit_block(df: pd.DataFrame) -> pd.DataFrame:
        res = fit_lrc_window(
            df["nep"].to_numpy(dtype=np.float64),
            df["rg"].to_numpy(dtype=np.float64),
            df["vpd"].to_numpy(dtype=np.float64),
            df["ta"].to_numpy(dtype=np.float64),
            e0=170.0,
        )
        if res is None:
            res = {"alpha": np.nan, "beta": np.nan, "k": np.nan,
                   "rref": np.nan, "sse": np.nan, "n": len(df)}
        res["event_type"] = df["event_type"].iloc[0]
        return pd.DataFrame([res])

    out = grouped_block_map(
        ds.map_batches(synth, batch_format="pandas", zero_copy_batch=False),
        ["event_type"], fit_block,
    ).to_pandas()
    for c in ("alpha", "beta", "k", "rref", "sse"):
        v = np.asarray(stable_round6(out[c].astype(float)), dtype=np.float64)
        out[c] = np.where(np.isfinite(v), v, -1.0)
    out["n"] = out["n"].astype("int64")
    return out[["event_type", "alpha", "beta", "k", "rref", "sse", "n"]] \
        .sort_values("event_type").reset_index(drop=True)


def q_retention_sweep(sf_dir: str):
    """Retention over the cascading tier store (the north rule's
    retention clause; stages/retention.py): per-tier maximum ages
    against the 1-minute watermark — 1m rows expire after 7 days, 1h
    after 14 days, 1d kept forever. Exact per-tier (kept, expired,
    kept_events) counts; the oracle recomputes every tier directly
    from raw (the cascade is lossless, proven by resample_1d) and
    applies the identical age predicate in integer microseconds."""
    from ..stages.exchange import driver_combine
    from ..stages.retention import retention_counts
    from .rollup import events_cascade_fused

    # watermark: END-labeled 1m bucket of the newest event
    ts_ds = _events(sf_dir, ["ts"])
    wm_df = driver_combine(
        ts_ds,
        lambda df: pd.DataFrame({"m": [pd.to_datetime(df["ts"]).max()]}),
        lambda df: pd.DataFrame({"m": [df["m"].max()]}),
        batch_format="pandas",
    )
    max_us = int(pd.Timestamp(wm_df["m"].iloc[0]).value // 1000)
    wm_us = (max_us // 60_000_000) * 60_000_000 + 60_000_000

    day_us = 86_400_000_000
    policy = {"1m": 7 * day_us, "1h": 14 * day_us, "1d": None}
    out = retention_counts(events_cascade_fused(sf_dir), policy, wm_us)
    for c in ("kept", "expired", "kept_events"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


_SQL_RETENTION = """
WITH wm AS (
  SELECT time_bucket(INTERVAL '1 minute', MAX(ts)) + INTERVAL '1 minute' AS w
  FROM events
),
m AS (
  SELECT event_type, time_bucket(INTERVAL '1 minute', ts) + INTERVAL '1 minute' AS b,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
h AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS b,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
d AS (
  SELECT event_type, time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day' AS b,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT '1d' AS tier,
       CAST(COUNT(*) AS BIGINT) AS kept,
       CAST(0 AS BIGINT) AS expired,
       CAST(SUM(n) AS BIGINT) AS kept_events
FROM d
UNION ALL
SELECT '1h',
       CAST(COUNT(*) FILTER (WHERE b >= w - INTERVAL 14 DAY) AS BIGINT),
       CAST(COUNT(*) FILTER (WHERE b < w - INTERVAL 14 DAY) AS BIGINT),
       CAST(COALESCE(SUM(n) FILTER (WHERE b >= w - INTERVAL 14 DAY), 0) AS BIGINT)
FROM h, wm
UNION ALL
SELECT '1m',
       CAST(COUNT(*) FILTER (WHERE b >= w - INTERVAL 7 DAY) AS BIGINT),
       CAST(COUNT(*) FILTER (WHERE b < w - INTERVAL 7 DAY) AS BIGINT),
       CAST(COALESCE(SUM(n) FILTER (WHERE b >= w - INTERVAL 7 DAY), 0) AS BIGINT)
FROM m, wm
ORDER BY tier
"""


def q_m4_downsample(sf_dir: str):
    """M4 visualization downsampling (Jugel et al. VLDB'14): per
    (event_type, 1h pixel bucket) the first/last/min/max values +
    count (stages/downsample.py:m4_downsample — per-batch candidate
    reduction to <= 4 rows per bucket, one keyed combine; the series
    never shuffles whole). Deterministic tie-breaks: first/last by
    (ts, value), min/max by (value, ts)."""
    from ..stages.downsample import m4_downsample

    ds = _events(sf_dir, ["event_type", "ts", "value"])
    out = m4_downsample(ds, width_us=US_PER_HOUR).to_pandas()
    out["bucket_ts"] = pd.to_datetime(out["bucket_ts"]).astype("datetime64[us]")
    out["n"] = out["n"].astype("int64")
    return _round6(out, ["v_first", "v_last", "v_min", "v_max"]) \
        .sort_values(["event_type", "bucket_ts"]).reset_index(drop=True)


_SQL_M4 = """
WITH b AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bucket_ts,
         ts, value
  FROM events
),
r AS (
  SELECT *,
    ROW_NUMBER() OVER (PARTITION BY event_type, bucket_ts ORDER BY ts, value) AS rf,
    ROW_NUMBER() OVER (PARTITION BY event_type, bucket_ts ORDER BY ts DESC, value DESC) AS rl,
    ROW_NUMBER() OVER (PARTITION BY event_type, bucket_ts ORDER BY value, ts) AS rmin,
    ROW_NUMBER() OVER (PARTITION BY event_type, bucket_ts ORDER BY value DESC, ts DESC) AS rmax
  FROM b
)
SELECT event_type, bucket_ts,
       ROUND(MIN(CASE WHEN rf = 1 THEN value END), 6) AS v_first,
       ROUND(MIN(CASE WHEN rl = 1 THEN value END), 6) AS v_last,
       ROUND(MIN(CASE WHEN rmin = 1 THEN value END), 6) AS v_min,
       ROUND(MIN(CASE WHEN rmax = 1 THEN value END), 6) AS v_max,
       CAST(COUNT(*) AS BIGINT) AS n
FROM r
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q_counter_rate(sf_dir: str):
    """Monotonic-counter rate with reset detection (Prometheus/RRDtool
    semantics; stages/downsample.py:counter_rate): a synthetic
    cumulative counter (integer increments, modular wrap = reset) per
    event_type; increase = diff, or the post-reset value after a drop;
    rate = increase / dt. Integer-exact synthesis; the oracle replays
    the window cumsum + LAG logic."""
    from ..stages.downsample import counter_rate
    from ..stages.exchange import grouped_block_map

    ds = _events(sf_dir, ["event_type", "ts", "event_id"])

    def synth_counter(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"], kind="stable").reset_index(drop=True)
        inc = (df["event_id"].to_numpy(dtype=np.int64) % 7) + 1
        s = np.cumsum(inc)
        return pd.DataFrame({
            "event_type": df["event_type"],
            "ts": pd.to_datetime(df["ts"]).astype("datetime64[us]"),
            "event_id": df["event_id"],
            "counter": (s % 1000).astype(np.float64),
        })

    withc = grouped_block_map(ds, ["event_type"], synth_counter)
    out = counter_rate(withc, id_col="event_id").to_pandas()
    out["ts"] = pd.to_datetime(out["ts"]).astype("datetime64[us]")
    out["increase"] = out["increase"].astype(np.float64)
    out["rate"] = np.asarray(round6(out["rate"].astype(float)), dtype=np.float64)
    out["is_reset"] = out["is_reset"].astype("int64")
    return out.sort_values(["event_type", "ts"]).reset_index(drop=True)


_SQL_COUNTER_RATE = """
WITH o AS (
  SELECT event_type, ts, event_id,
         SUM((event_id % 7) + 1) OVER (PARTITION BY event_type
                                       ORDER BY ts, event_id) AS s
  FROM events
),
c AS (SELECT event_type, ts, event_id, CAST(s % 1000 AS DOUBLE) AS counter FROM o),
d AS (
  SELECT event_type, ts, counter,
         LAG(counter) OVER w AS prev_c,
         LAG(ts) OVER w AS prev_ts
  FROM c WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
)
SELECT event_type, ts,
       CASE WHEN counter >= prev_c THEN counter - prev_c ELSE counter END AS increase,
       ROUND((CASE WHEN counter >= prev_c THEN counter - prev_c ELSE counter END)
             / ((epoch_us(ts) - epoch_us(prev_ts)) / 1000000.0), 6) AS rate,
       CAST(CASE WHEN counter < prev_c THEN 1 ELSE 0 END AS BIGINT) AS is_reset
FROM d WHERE prev_c IS NOT NULL
ORDER BY event_type, ts
"""


def q_daily_correlation(sf_dir: str):
    """daily_correlation (diive/analysis namespace): Pearson r between
    consecutive-day daily means per event_type — daily aggregate via
    the exchange, per-key corr in one co-located block."""
    from ..stages.exchange import driver_combine, grouped_block_map

    ds = _events(sf_dir, ["event_type", "ts", "value"])
    bucketer = make_bucket_assigner(US_PER_DAY, end_stamped=False)

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by(["event_type", "bucket_ts"]).aggregate(
            [("value", "sum"), ("value", "count")]
        )

    daily = driver_combine(
        ds.map_batches(bucketer, batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(["event_type", "bucket_ts", "value"]),
        partial,
        lambda df: df.groupby(["event_type", "bucket_ts"], as_index=False)[
            ["value_sum", "value_count"]
        ].sum(),
    )
    daily["v"] = daily["value_sum"] / daily["value_count"]
    rows = []
    for et, g in daily.groupby("event_type"):
        g = g.sort_values("bucket_ts")
        v = g["v"].to_numpy()
        if len(v) < 3:
            rows.append((et, np.nan, len(v) - 1))
            continue
        a, b = v[1:], v[:-1]
        r = np.corrcoef(a, b)[0, 1]
        rows.append((et, round(float(r), 6), len(v) - 1))
    out = pd.DataFrame(rows, columns=["event_type", "lag1_corr", "n_pairs"])
    out["n_pairs"] = out["n_pairs"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


_SQL_DAILY_CORR = """
WITH d AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         SUM(value) / COUNT(value) AS v
  FROM events GROUP BY 1, 2
), l AS (
  SELECT event_type, v,
         lag(v) OVER (PARTITION BY event_type ORDER BY day) AS pv
  FROM d
)
SELECT event_type,
       ROUND(corr(v, pv), 6) AS lag1_corr,
       CAST(COUNT(pv) AS BIGINT) AS n_pairs
FROM l GROUP BY 1
"""


def q_eddypro_flags(sf_dir: str):
    """Digit-encoded quality-flag extraction (eddyproflags.py:31-506 /
    io/binary/extract.py): derive a 3-digit flag int from value and
    explode it into per-digit flags via integer math."""
    from ..functions.scalars import eddypro_ssitc_flags

    ds = _events(sf_dir, ["event_id", "value"])

    def fn(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        flag = (np.floor(np.nan_to_num(v, nan=0.0)).astype(np.int64)) % 1000
        t2 = pa.table({"event_id": t["event_id"], "flag": pa.array(flag, pa.int64())})
        return eddypro_ssitc_flags(t2, "flag", 3)

    out = ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    for c in ("flag", "FLAG_D0_TEST", "FLAG_D1_TEST", "FLAG_D2_TEST"):
        out[c.lower()] = out.pop(c).astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


_SQL_EDDYPRO = """
WITH f AS (
  SELECT event_id, CAST(FLOOR(COALESCE(value, 0.0)) AS BIGINT) % 1000 AS flag
  FROM events
)
SELECT event_id, flag,
       (flag // 100) % 10 AS flag_d0_test,
       (flag // 10) % 10 AS flag_d1_test,
       flag % 10 AS flag_d2_test
FROM f
"""


def q_embedding_knn_lsh(sf_dir: str):
    """Approximate kNN via random-hyperplane LSH buckets
    (stages/similarity.py:knn_lsh — the scale path). Probabilistic by
    design (deterministic given the seeded planes) -> rows-only driver
    check; recall on planted near-dups pinned by
    tests/test_similarity.py."""
    from ..stages.similarity import knn_lsh

    ds = _embs(sf_dir)
    qdf = ds.filter(expr="vec_id < 5").to_pandas().sort_values("vec_id")
    Q = np.asarray([np.asarray(v, dtype=np.float64) for v in qdf["embedding"]])
    got = knn_lsh(ds, Q, k=5, query_ids=qdf["vec_id"].to_numpy(), n_planes=10, max_hamming=3)
    got["cos_sim"] = round6(got["cos_sim"])
    got["query_id"] = got["query_id"].astype("int64")
    got["vec_id"] = got["vec_id"].astype("int64")
    got["rank"] = got["rank"].astype("int64")
    return got.sort_values(["query_id", "rank"]).reset_index(drop=True)


def q_embedding_knn_ivf(sf_dir: str):
    """Approximate kNN via an IVF coarse quantizer (from-scratch seeded
    k-means, stages/similarity.py:knn_ivf — the inverted-file scale
    path: per query only n_probe centroid cells are scored).
    Deterministic given the seed but model-based -> rows-only driver
    check; recall + exactness-at-full-probe pinned by
    tests/test_similarity.py."""
    from ..stages.similarity import knn_ivf

    ds = _embs(sf_dir)
    qdf = ds.filter(expr="vec_id < 5").to_pandas().sort_values("vec_id")
    Q = np.asarray([np.asarray(v, dtype=np.float64) for v in qdf["embedding"]])
    got = knn_ivf(ds, Q, k=5, query_ids=qdf["vec_id"].to_numpy(), n_centroids=16, n_probe=6)
    got["cos_sim"] = round6(got["cos_sim"])
    got["query_id"] = got["query_id"].astype("int64")
    got["vec_id"] = got["vec_id"].astype("int64")
    got["rank"] = got["rank"].astype("int64")
    return got.sort_values(["query_id", "rank"]).reset_index(drop=True)


def q_embedding_knn_ivf_exact(sf_dir: str):
    """IVF kNN at FULL probe (n_probe == n_centroids): every cell is
    scored, so the inverted-file path must return exactly the
    brute-force cosine top-k — an exact-checkable pin of the IVF
    machinery (same ranking contract as embedding_topk: rank on
    ROUND(sim, 6) with vec_id tie-break)."""
    from ..stages.similarity import knn_ivf

    ds = _embs(sf_dir)
    qdf = ds.filter(expr="vec_id < 5").to_pandas().sort_values("vec_id")
    Q = np.asarray([np.asarray(v, dtype=np.float64) for v in qdf["embedding"]])
    got = knn_ivf(
        ds, Q, k=8, query_ids=qdf["vec_id"].to_numpy(), n_centroids=16, n_probe=16
    )
    got["cos_sim"] = round6(got["cos_sim"])
    got = got.sort_values(
        ["query_id", "cos_sim", "vec_id"], ascending=[True, False, True], kind="stable"
    )
    got["rank"] = got.groupby("query_id").cumcount() + 1
    got = got[got["rank"] <= 5]
    for c in ("query_id", "vec_id", "rank"):
        got[c] = got[c].astype("int64")
    return got[["query_id", "rank", "vec_id", "cos_sim"]].reset_index(drop=True)


def q_embedding_knn_pq(sf_dir: str):
    """Approximate kNN via product quantization with ADC lookup tables
    (stages/similarity.py:knn_pq — the memory-compression scale path:
    m uint8 codes per vector instead of d floats, queries scored by
    table gather-sums) plus exact re-rank of the ADC top candidates.
    Deterministic given the seed but quantizer-based -> rows-only;
    lossless-codebook exactness + recall pinned by
    tests/test_similarity.py."""
    from ..stages.similarity import knn_pq

    ds = _embs(sf_dir)
    qdf = ds.filter(expr="vec_id < 5").to_pandas().sort_values("vec_id")
    Q = np.asarray([np.asarray(v, dtype=np.float64) for v in qdf["embedding"]])
    got = knn_pq(
        ds, Q, k=5, query_ids=qdf["vec_id"].to_numpy(),
        m=8, ks=32, rerank_factor=4,
    )
    got["cos_sim"] = round6(got["cos_sim"])
    got["query_id"] = got["query_id"].astype("int64")
    got["vec_id"] = got["vec_id"].astype("int64")
    got["rank"] = got["rank"].astype("int64")
    return got.sort_values(["query_id", "rank"]).reset_index(drop=True)


_SQL_KNN_IVF_EXACT = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 5
), s AS (
  SELECT q.query_id, e.vec_id,
         ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 6) AS cos_sim
  FROM embeddings e, q WHERE e.vec_id <> q.query_id
), r AS (
  SELECT query_id, vec_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rank
  FROM s
)
SELECT query_id, rank, vec_id, cos_sim FROM r WHERE rank <= 5
"""


def _embs(sf_dir: str, columns=None):
    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=columns)


# ------------------------------------------------------------ generic tables


def q_lineitem_filter_project(sf_dir: str):
    """keep_records_where + keep_vars (frames.py:27-128): row filter by
    boolean expr, column projection — predicate inside map_batches."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate"],
    )

    def fn(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater(t["l_quantity"], 45.0),
            pc.less(t["l_shipdate"], pa.scalar(pd.Timestamp("1997-01-01").to_datetime64())),
        )
        return t.filter(m).select(["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"])

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_SQL_LINEITEM_FP = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem WHERE l_quantity > 45.0 AND l_shipdate < TIMESTAMP '1997-01-01'
"""


def q_lineitem_agg(sf_dir: str):
    """Partial-aggregation groupby (the pre-aggregate-before-shuffle
    pattern of stages/resample.py) on lineitem."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def partial(t: pa.Table) -> pa.Table:
        agg = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"), ("l_quantity", "count")]
        )
        return agg

    from ..stages.exchange import driver_combine

    combined = driver_combine(
        ds, partial,
        lambda df: df.groupby(["l_returnflag", "l_linestatus"], as_index=False)[
            ["l_quantity_sum", "l_extendedprice_sum", "l_quantity_count"]
        ].sum(),
    ).rename(columns={
        "l_quantity_sum": "sum_qty",
        "l_extendedprice_sum": "_sum_price",
        "l_quantity_count": "n",
    })
    combined["mean_qty"] = combined["sum_qty"] / combined["n"]
    # mean, not raw sum: a ~5e8 float sum carries ~1e-3 accumulated FP
    # error across engines, which no 1e-6 rounding can reconcile
    combined["mean_price"] = combined["_sum_price"] / combined["n"]
    combined = combined.drop(columns=["_sum_price"])
    combined["n"] = combined["n"].astype("int64")
    return _round6(combined, ["sum_qty", "mean_qty", "mean_price"])


_SQL_LINEITEM_AGG = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 6) AS sum_qty,
       COUNT(l_quantity) AS n,
       ROUND(SUM(l_quantity) / COUNT(l_quantity), 6) AS mean_qty,
       ROUND(SUM(l_extendedprice) / COUNT(l_quantity), 6) AS mean_price
FROM lineitem GROUP BY 1, 2
"""


def q_optimum_range(sf_dir: str):
    """FindOptimumRange (optimumrange.py:19-474): the 4-bin-wide
    hour-of-day window (24 equal-width bins over fractional hour) whose
    mean value is highest."""
    from ..stages.gridagg import find_optimum_range

    ds = _events(sf_dir, ["ts", "value"])

    def add_x(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.to_datetime(df["ts"])
        df = df.copy()
        df["hodf"] = t.dt.hour.astype(float) + t.dt.minute.astype(float) / 60.0
        return df

    ds2 = ds.map_batches(add_x, batch_format="pandas")
    lo, hi = ds2.min("hodf"), ds2.max("hodf")
    res = find_optimum_range(
        ds2, xcol="hodf", ycol="value", n_bins=24, win=4, mode="max", x_range=(lo, hi)
    )
    out = pd.DataFrame([res])
    out["bin_lo"] = out["bin_lo"].astype("int64")
    out["bin_hi"] = out["bin_hi"].astype("int64")
    return _round6(out, ["x_lo", "x_hi", "y_opt"])


_SQL_OPTIMUM = """
WITH x AS (
  SELECT EXTRACT(hour FROM ts) + EXTRACT(minute FROM ts) / 60.0 AS hodf, value
  FROM events WHERE value IS NOT NULL
), r AS (SELECT MIN(hodf) AS lo, MAX(hodf) AS hi FROM x),
b AS (
  SELECT LEAST(CAST(FLOOR((hodf - lo) / (hi - lo) * 24) AS BIGINT), 23) AS bin, value
  FROM x, r
), m AS (
  SELECT g.bin, COALESCE(SUM(b.value), 0.0) AS s, COUNT(b.value) AS n
  FROM (SELECT unnest(generate_series(0, 23)) AS bin) g
  LEFT JOIN b ON b.bin = g.bin GROUP BY g.bin
), w AS (
  SELECT bin AS start,
         SUM(s) OVER (ORDER BY bin ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS ws,
         SUM(n) OVER (ORDER BY bin ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wn
  FROM m
)
SELECT CAST(start AS BIGINT) AS bin_lo,
       CAST(start + 3 AS BIGINT) AS bin_hi,
       ROUND((SELECT lo FROM r) + start * ((SELECT hi FROM r) - (SELECT lo FROM r)) / 24, 6) AS x_lo,
       ROUND((SELECT lo FROM r) + (start + 4) * ((SELECT hi FROM r) - (SELECT lo FROM r)) / 24, 6) AS x_hi,
       ROUND(ws / wn, 6) AS y_opt
FROM w WHERE start <= 20 AND wn > 0
ORDER BY ws / wn DESC, start LIMIT 1
"""


# ----------------------------------------------------- tokens-corpus surface


def q_tokens_rollup_tiny(sf_dir: str):
    """The north-rule tokens pipeline over the deterministic tiny
    corpus (BASELINE.json input_hint schema; fixtures.py — ``sf_dir``
    unused, the corpus is self-generated): keep-last dedup -> fused
    1m/1h/1d ladder with min-count. Fixture-based -> rows-only driver
    check; tier values are pinned against the pandas oracle in
    tests/test_rollup.py."""
    from ..fixtures import ensure_fixture
    from .rollup import tokens_cascade_fused

    path = ensure_fixture("tiny")
    out = tokens_cascade_fused(path, mincounts_perc=0.9).to_pandas()
    out["bucket_ts"] = pd.to_datetime(out["bucket_ts"]).astype("datetime64[us]")
    out["count"] = out["count"].astype("int64")
    return _round6(out, ["sum", "mean"]).sort_values(
        ["tier", "source", "bucket_ts"]
    ).reset_index(drop=True)


def q_tokens_verify_tiny(sf_dir: str):
    """Per-row token-array equality over the tiny corpus
    (fixtures.verify_tokens_batch, the north-rule invariant): one row
    per source with (rows, tokens, rows_ok); rows_ok == rows proves
    every stored array equals its regenerable expectation."""
    from ..fixtures import ensure_fixture, verify_tokens_batch

    path = ensure_fixture("tiny")
    ds = rd.read_parquet(path)

    def verify_by_source(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, g in df.groupby("source", sort=False):
            t = pa.Table.from_pandas(g, preserve_index=False)
            r = verify_tokens_batch(t)
            rows.append((src, r["rows"][0].as_py(), r["tokens"][0].as_py(), r["rows_ok"][0].as_py()))
        return pd.DataFrame(rows, columns=["source", "rows", "tokens", "rows_ok"])

    from ..stages.exchange import driver_combine

    out = driver_combine(
        ds, verify_by_source,
        lambda df: df.groupby("source", as_index=False)[["rows", "tokens", "rows_ok"]].sum(),
        batch_format="pandas",
    )
    for c in ("rows", "tokens", "rows_ok"):
        out[c] = out[c].astype("int64")
    assert (out["rows_ok"] == out["rows"]).all(), "token-array equality violated"
    return out.sort_values("source").reset_index(drop=True)


def q_tokens_rollup_1h(sf_dir: str):
    """The north-rule tokens path with an EXACT SQL oracle: a
    ``tokens:list<int32>`` column (BASELINE.json input_hint schema) is
    synthesized deterministically from ``event_id`` with the fixture
    corpus's formula family (``tok[j] = (seed + j*KNUTH) % VOCAB``,
    fixtures.py:tokens_for), REAL Arrow list arrays are materialized
    per batch, and the 1h tier aggregates read the ACTUAL array buffers
    (``np.add.reduceat`` over the flattened values + offset-indexed
    first/last elements), never the generating formula. The DuckDB
    oracle replays the formula with a bounded ``generate_series`` cross
    join — so a single wrong token in any materialized array breaks the
    hash match. All outputs are integer-exact (no float rounding)."""
    from ..fixtures import KNUTH, VOCAB
    from ..schema import US_PER_HOUR
    from ..stages.bucket import bucket_end_us
    from ..stages.exchange import block_map

    ds = _events(sf_dir, ["event_id", "ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_tok = (eid % 257 + 1).astype(np.int64)
        seed = (eid.astype(np.uint64) * np.uint64(1_000_003)) & np.uint64(0x7FFFFFFFFFFF)
        offsets = np.zeros(len(eid) + 1, dtype=np.int64)
        np.cumsum(n_tok, out=offsets[1:])
        total = int(offsets[-1])
        j = (np.arange(total, dtype=np.uint64)
             - np.repeat(offsets[:-1], n_tok).astype(np.uint64) + np.uint64(1))
        flat = ((np.repeat(seed, n_tok) + j * np.uint64(KNUTH)) % np.uint64(VOCAB)).astype(np.int32)
        tokens = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()), pa.array(flat)
        ).cast(pa.list_(pa.int32()))

        # aggregate FROM the materialized arrays, not the formula
        vals = tokens.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        tok_sum = np.add.reduceat(vals, offsets[:-1])
        first = vals[offsets[:-1]]
        last = vals[offsets[1:] - 1]

        ts_us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        bucket = bucket_end_us(ts_us, US_PER_HOUR, end_stamped=False)
        g = pd.DataFrame({
            "event_type": t["event_type"].to_pandas(),
            "bucket_ts": bucket,
            "n": 1,
            "sum_tok": n_tok,
            "sum_tok_vals": tok_sum,
            "min_first": first,
            "max_last": last,
        }).groupby(["event_type", "bucket_ts"], as_index=False).agg(
            n=("n", "sum"), sum_tok=("sum_tok", "sum"),
            sum_tok_vals=("sum_tok_vals", "sum"),
            min_first=("min_first", "min"), max_last=("max_last", "max"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["event_type", "bucket_ts"], as_index=False).agg(
            n=("n", "sum"), sum_tok=("sum_tok", "sum"),
            sum_tok_vals=("sum_tok_vals", "sum"),
            min_first=("min_first", "min"), max_last=("max_last", "max"),
        )

    out = block_map(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "bucket_ts"], combine,
        batch_format="pandas", zero_copy_batch=False,
    ).to_pandas()
    out["bucket_ts"] = pd.to_datetime(out["bucket_ts"], unit="us").astype("datetime64[us]")
    for c in ("n", "sum_tok", "sum_tok_vals", "min_first", "max_last"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["event_type", "bucket_ts"]).reset_index(drop=True)


_SQL_TOKENS_ROLLUP_1H = """
WITH tok AS (
  SELECT event_id, event_type, ts,
         (event_id % 257) + 1 AS n_tok,
         (event_id * 1000003) % 140737488355328 AS seed
  FROM events
),
per_doc AS (
  SELECT tok.event_type, tok.ts, tok.n_tok,
         SUM((seed + j * 2654435761) % 50257) AS tok_sum,
         MIN((seed + 1 * 2654435761) % 50257) AS first_tok,
         MAX(CASE WHEN j = n_tok THEN (seed + j * 2654435761) % 50257 END) AS last_tok
  FROM tok, generate_series(1, 257) AS t(j)
  WHERE j <= n_tok
  GROUP BY tok.event_id, tok.event_type, tok.ts, tok.n_tok, tok.seed
)
SELECT event_type,
       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bucket_ts,
       COUNT(*) AS n,
       CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
       CAST(SUM(tok_sum) AS BIGINT) AS sum_tok_vals,
       CAST(MIN(first_tok) AS BIGINT) AS min_first,
       CAST(MAX(last_tok) AS BIGINT) AS max_last
FROM per_doc
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q_ustar_mpt(sf_dir: str):
    """USTAR moving-point-test threshold detection (Papale et al. 2006
    / ONEFlux MPT; reference anchor
    /root/reference/diive/flux/lowres/ustar_mp_detection.py) with an
    EXACT SQL oracle. Inputs (TA, USTAR, NEE, SW_IN) are synthesized
    from event_id with pure +,*,/,min arithmetic — every intermediate
    is an identically-rounded IEEE double on both sides, and the odd
    multiplier hashes are bijective mod 2^31 so TA/USTAR are tie-free
    (the tie-extension path is pinned separately in tests). NEE follows
    a piecewise-linear respiration curve saturating at USTAR = 0.25, so
    the detected plateau threshold is physically meaningful. Output: 4
    season rows + annual (season 0, conservative max); not-found
    thresholds are -1 sentinels (hash-stable across NULL/NaN)."""
    from ..stages.ustar import mpt_thresholds_distributed

    ds = _events(sf_dir, ["event_id", "ts"])

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        eid = df["event_id"].to_numpy(dtype=np.int64)
        h1 = (eid * 1_000_003) % 2_147_483_648
        h2 = (eid * 2_654_435_761) % 2_147_483_648
        h3 = (eid * 97_003) % 2_147_483_648
        ta = 5.0 + 15.0 * (h1 / 2147483648.0)
        ustar = 0.05 + 0.6 * (h2 / 2147483648.0)
        nee = (1.0 + 0.1 * ta) * (np.minimum(ustar, 0.25) / 0.25) \
            + 0.2 * (h3 / 2147483648.0 - 0.5)
        ts = pd.to_datetime(df["ts"])
        hour = ts.dt.hour.to_numpy()
        return pd.DataFrame({
            "ta": ta,
            "ustar": ustar,
            "nee": nee,
            "sw_in": np.where((hour >= 7) & (hour <= 17), 500.0, 0.0),
            "month": ts.dt.month.to_numpy(dtype=np.int64),
        })

    out = mpt_thresholds_distributed(
        ds.map_batches(synth, batch_format="pandas", zero_copy_batch=False)
    )
    th = np.asarray(stable_round6(out["threshold"].astype(float)), dtype=np.float64)
    out["threshold"] = np.where(np.isfinite(th), th, -1.0)
    out["season"] = out["season"].astype("int64")
    out["n_night"] = out["n_night"].astype("int64")
    return out.sort_values("season").reset_index(drop=True)


_SQL_USTAR_MPT = """
WITH base AS (
  SELECT quarter(ts) AS season,
         CASE WHEN hour(ts) >= 7 AND hour(ts) <= 17 THEN 500.0 ELSE 0.0 END AS sw_in,
         5.0 + 15.0 * (((event_id * 1000003) % 2147483648) / 2147483648.0) AS ta,
         0.05 + 0.6 * (((event_id * 2654435761) % 2147483648) / 2147483648.0) AS ustar,
         (((event_id * 97003) % 2147483648) / 2147483648.0) AS u3
  FROM events
),
night AS (
  SELECT season, ta, ustar,
         (1.0 + 0.1 * ta) * (LEAST(ustar, 0.25) / 0.25) + 0.2 * (u3 - 0.5) AS nee
  FROM base WHERE sw_in < 10.0
),
tot AS (SELECT (SELECT COUNT(*) FROM events) AS n_valid, COUNT(*) AS n_night FROM night),
scount AS (SELECT season, COUNT(*) AS n FROM night GROUP BY season),
elig AS (
  SELECT s.season, s.n FROM scount s, tot
  WHERE s.n >= 700 AND tot.n_valid >= 3000
),
ta_ranked AS (
  SELECT n.season, n.ta, n.ustar, n.nee,
         ROW_NUMBER() OVER (PARTITION BY n.season ORDER BY n.ta) - 1 AS rn,
         e.n // 7 AS npc
  FROM night n JOIN elig e USING (season)
),
ta_classed AS (SELECT *, LEAST(rn // npc, 6) AS ta_class FROM ta_ranked),
ta_valid AS (
  SELECT season, ta_class FROM ta_classed
  GROUP BY season, ta_class
  HAVING COUNT(*) >= 100 AND ABS(CORR(ta, ustar)) <= 0.5
),
u_ranked AS (
  SELECT t.season, t.ta_class, t.ustar, t.nee,
         ROW_NUMBER() OVER (PARTITION BY t.season, t.ta_class ORDER BY t.ustar) - 1 AS urn,
         COUNT(*) OVER (PARTITION BY t.season, t.ta_class) AS m
  FROM ta_classed t
  JOIN ta_valid v ON t.season = v.season AND t.ta_class = v.ta_class
),
u_classed AS (
  SELECT *, LEAST(urn // (m // 20), 19) AS u_class
  FROM u_ranked WHERE m // 20 >= 1
),
u_means AS (
  SELECT season, ta_class, u_class,
         AVG(ustar) AS ustar_mean, AVG(nee) AS fx_mean
  FROM u_classed GROUP BY season, ta_class, u_class
),
fwd AS (
  SELECT *,
         AVG(fx_mean) OVER (PARTITION BY season, ta_class ORDER BY u_class
                            ROWS BETWEEN 1 FOLLOWING AND 10 FOLLOWING) AS m1,
         AVG(fx_mean) OVER (PARTITION BY season, ta_class ORDER BY u_class
                            ROWS BETWEEN 2 FOLLOWING AND 11 FOLLOWING) AS m2,
         LEAD(fx_mean) OVER (PARTITION BY season, ta_class ORDER BY u_class) AS fx_next,
         MIN(CASE WHEN u_class = 0 THEN ustar_mean END)
             OVER (PARTITION BY season, ta_class) AS first_u
  FROM u_means
),
sel AS (
  SELECT season, ta_class, MIN(u_class) AS pick
  FROM fwd
  WHERE u_class <= 18 AND first_u <= 0.2
    AND m1 IS NOT NULL AND m2 IS NOT NULL
    AND fx_mean >= m1 AND fx_next >= m2
  GROUP BY season, ta_class
),
class_th AS (
  SELECT f.season, f.ustar_mean AS th
  FROM fwd f JOIN sel s
    ON f.season = s.season AND f.ta_class = s.ta_class AND f.u_class = s.pick
),
season_th AS (SELECT season, MEDIAN(th) AS threshold FROM class_th GROUP BY season),
seasons(season) AS (VALUES (1), (2), (3), (4)),
per_season AS (
  SELECT s.season,
         COALESCE(ROUND(ROUND(t.threshold, 9), 6), -1.0) AS threshold,
         COALESCE(c.n, 0) AS n_night
  FROM seasons s
  LEFT JOIN season_th t ON s.season = t.season
  LEFT JOIN scount c ON s.season = c.season
)
SELECT CAST(0 AS BIGINT) AS season,
       COALESCE(ROUND(ROUND(MAX(CASE WHEN threshold >= 0 THEN threshold END), 9), 6), -1.0)
         AS threshold,
       (SELECT CAST(n_night AS BIGINT) FROM tot) AS n_night
FROM per_season
UNION ALL
SELECT CAST(season AS BIGINT), threshold, CAST(n_night AS BIGINT) FROM per_season
ORDER BY season
"""


def _ustar_synth(df: pd.DataFrame) -> pd.DataFrame:
    """Shared tie-free IEEE synthesis for the USTAR detection queries
    (see q_ustar_mpt docstring)."""
    eid = df["event_id"].to_numpy(dtype=np.int64)
    h1 = (eid * 1_000_003) % 2_147_483_648
    h2 = (eid * 2_654_435_761) % 2_147_483_648
    h3 = (eid * 97_003) % 2_147_483_648
    ta = 5.0 + 15.0 * (h1 / 2147483648.0)
    ustar = 0.05 + 0.6 * (h2 / 2147483648.0)
    nee = (1.0 + 0.1 * ta) * (np.minimum(ustar, 0.25) / 0.25) \
        + 0.2 * (h3 / 2147483648.0 - 0.5)
    ts = pd.to_datetime(df["ts"])
    hour = ts.dt.hour.to_numpy()
    return pd.DataFrame({
        "ta": ta,
        "ustar": ustar,
        "nee": nee,
        "sw_in": np.where((hour >= 7) & (hour <= 17), 500.0, 0.0),
        "month": ts.dt.month.to_numpy(dtype=np.int64),
    })


def q_ustar_vekuri(sf_dir: str):
    """Vekuri quantile-based USTAR threshold detection (reference
    anchor /root/reference/diive/flux/lowres/ustar_vekuri_detection.py)
    with an EXACT SQL oracle. Quantile classes use the integer
    rank-formula ``bin = min(n-1, max(0, (r*n-1)//(N-1)))`` which
    reproduces pd.qcut membership on tie-free values (pinned in tests)
    and is replayable verbatim in SQL. Meteorological seasons
    (DJF/MAM/JJA/SON); same bijective-hash IEEE synthesis as
    ustar_mpt. Output: 4 season rows + annual (season 0, max);
    not-found thresholds are -1 sentinels."""
    from ..stages.ustar import vekuri_thresholds_distributed

    ds = _events(sf_dir, ["event_id", "ts"])
    out = vekuri_thresholds_distributed(
        ds.map_batches(_ustar_synth, batch_format="pandas", zero_copy_batch=False)
    )
    th = np.asarray(stable_round6(out["threshold"].astype(float)), dtype=np.float64)
    out["threshold"] = np.where(np.isfinite(th), th, -1.0)
    out["season"] = out["season"].astype("int64")
    out["n_night"] = out["n_night"].astype("int64")
    return out.sort_values("season").reset_index(drop=True)


_SQL_USTAR_VEKURI = """
WITH base AS (
  SELECT CASE WHEN month(ts) IN (12, 1, 2) THEN 1
              WHEN month(ts) IN (3, 4, 5) THEN 2
              WHEN month(ts) IN (6, 7, 8) THEN 3
              ELSE 4 END AS season,
         CASE WHEN hour(ts) >= 7 AND hour(ts) <= 17 THEN 500.0 ELSE 0.0 END AS sw_in,
         5.0 + 15.0 * (((event_id * 1000003) % 2147483648) / 2147483648.0) AS ta,
         0.05 + 0.6 * (((event_id * 2654435761) % 2147483648) / 2147483648.0) AS ustar,
         (((event_id * 97003) % 2147483648) / 2147483648.0) AS u3
  FROM events
),
night AS (
  SELECT season, ta, ustar,
         (1.0 + 0.1 * ta) * (LEAST(ustar, 0.25) / 0.25) + 0.2 * (u3 - 0.5) AS nee
  FROM base WHERE sw_in < 10.0
),
tot AS (SELECT COUNT(*) AS n_night FROM night),
scount AS (SELECT season, COUNT(*) AS n FROM night GROUP BY season),
elig AS (
  SELECT s.season, s.n FROM scount s, tot
  WHERE s.n >= 50 AND tot.n_night >= 100
),
ta_ranked AS (
  SELECT n.season, n.ta, n.ustar, n.nee, e.n AS cnt,
         ROW_NUMBER() OVER (PARTITION BY n.season ORDER BY n.ta) - 1 AS rn
  FROM night n JOIN elig e USING (season)
),
ta_classed AS (
  SELECT *, LEAST(5, GREATEST(0, (rn * 6 - 1) // (cnt - 1))) AS tcls
  FROM ta_ranked WHERE cnt > 1
),
ta_valid AS (
  SELECT season, tcls FROM ta_classed
  GROUP BY season, tcls
  HAVING ABS(CORR(ta, ustar)) < 0.4
),
u_ranked AS (
  SELECT t.season, t.tcls, t.ustar, t.nee,
         ROW_NUMBER() OVER (PARTITION BY t.season, t.tcls ORDER BY t.ustar) - 1 AS urn,
         COUNT(*) OVER (PARTITION BY t.season, t.tcls) AS m
  FROM ta_classed t JOIN ta_valid v ON t.season = v.season AND t.tcls = v.tcls
),
u_classed AS (
  SELECT *, LEAST(19, GREATEST(0, (urn * 20 - 1) // (m - 1))) AS ucls
  FROM u_ranked WHERE m > 1
),
u_means AS (
  SELECT season, tcls, ucls, AVG(ustar) AS um, AVG(nee) AS fm
  FROM u_classed GROUP BY season, tcls, ucls
),
pos AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY season, tcls ORDER BY ucls) - 1 AS idx,
         COUNT(*) OVER (PARTITION BY season, tcls) AS ncls
  FROM u_means
),
fwd AS (
  SELECT *,
         AVG(fm) OVER (PARTITION BY season, tcls ORDER BY idx
                       ROWS BETWEEN 1 FOLLOWING AND 10 FOLLOWING) AS wmean
  FROM pos WHERE ncls >= 3
),
sel AS (
  SELECT season, tcls, MIN(idx) AS pick
  FROM fwd
  WHERE idx <= ncls - 2 AND fm >= 0.95 * wmean
  GROUP BY season, tcls
),
class_th AS (
  SELECT f.season, f.um AS th
  FROM fwd f JOIN sel s ON f.season = s.season AND f.tcls = s.tcls AND f.idx = s.pick
),
season_th AS (SELECT season, MEDIAN(th) AS threshold FROM class_th GROUP BY season),
seasons(season) AS (VALUES (1), (2), (3), (4)),
per_season AS (
  SELECT s.season,
         COALESCE(ROUND(ROUND(t.threshold, 9), 6), -1.0) AS threshold,
         COALESCE(c.n, 0) AS n_night
  FROM seasons s
  LEFT JOIN season_th t ON s.season = t.season
  LEFT JOIN scount c ON s.season = c.season
)
SELECT CAST(0 AS BIGINT) AS season,
       COALESCE(ROUND(ROUND(MAX(CASE WHEN threshold >= 0 THEN threshold END), 9), 6), -1.0)
         AS threshold,
       (SELECT CAST(n_night AS BIGINT) FROM tot) AS n_night
FROM per_season
UNION ALL
SELECT CAST(season AS BIGINT), threshold, CAST(n_night AS BIGINT) FROM per_season
ORDER BY season
"""


def q_flux_randunc(sf_dir: str):
    """PAS20 random + joint flux uncertainty (Pastorello et al. 2020 /
    ONEFlux nee_proc; reference anchor
    /root/reference/diive/flux/lowres/uncertainty.py) with an EXACT SQL
    oracle: method 1 = sample SD of measured fluxes in a +/-7d window
    with +/-1h time-of-day band and MDS meteo similarity (>= 6
    matches); method 2 = median of method-1 SDs of flux-similar records
    in +/-14d; joint = quadrature with a synthesized scenario spread.
    Inputs are pure-IEEE bijective-hash synthesis from event_id (see
    q_ustar_mpt); the oracle replays both methods as range self-joins.
    Not-found values are -1 sentinels."""
    from ..stages.uncertainty import joint_uncertainty, random_uncertainty_pas20

    ds = _events(sf_dir, ["event_id", "ts"])

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        eid = df["event_id"].to_numpy(dtype=np.int64)
        h1 = (eid * 1_000_003) % 2_147_483_648
        h2 = (eid * 2_654_435_761) % 2_147_483_648
        h3 = (eid * 2_246_822_519) % 2_147_483_648
        h4 = (eid * 3_266_489_917) % 2_147_483_648
        h5 = (eid * 668_265_263) % 2_147_483_648
        ts = pd.to_datetime(df["ts"])
        hour = ts.dt.hour.to_numpy()
        day = (hour >= 7) & (hour <= 17)
        ta = -5.0 + 30.0 * (h1 / 2147483648.0)
        vpd = 12.0 * (h2 / 2147483648.0)
        swin = np.where(day, 600.0 * (h3 / 2147483648.0), 0.0)
        gf = 1.0 + 0.2 * ta + 0.01 * swin + 4.0 * (h5 / 2147483648.0 - 0.5)
        measured = h4 < 1_503_238_553  # ~70%
        return pd.DataFrame({
            "event_id": eid,
            "ts": ts.astype("datetime64[us]"),
            "ta": ta, "vpd": vpd, "swin": swin, "gf": gf,
            "flux": np.where(measured, gf, np.nan),
        })

    out = random_uncertainty_pas20(
        ds.map_batches(synth, batch_format="pandas", zero_copy_batch=False)
    ).to_pandas()

    # joint uncertainty from a synthesized scenario spread (h6/h7)
    eid = out["event_id"].to_numpy(dtype=np.int64)
    h6 = (eid * 374_761_393) % 2_147_483_648
    h7 = (eid * 3_119_415_889) % 2_147_483_648
    spread_lo = -0.5 - 2.0 * (h6 / 2147483648.0)
    spread_hi = 0.5 + 2.0 * (h7 / 2147483648.0)
    ru_raw = out["randunc"].to_numpy(dtype=np.float64)
    joint = joint_uncertainty(ru_raw, spread_lo, spread_hi)

    ru6 = np.asarray(stable_round6(pd.Series(ru_raw)), dtype=np.float64)
    j6 = np.asarray(stable_round6(pd.Series(joint)), dtype=np.float64)
    out["randunc"] = np.where(np.isfinite(ru6), ru6, -1.0)
    out["jointunc"] = np.where(np.isfinite(j6), j6, -1.0)
    for c in ("event_id", "n1", "n2", "method"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


_SQL_FLUX_RANDUNC = """
WITH base AS (
  SELECT event_id, ts,
         hour(ts) + minute(ts)/60.0 + second(ts)/3600.0 AS hr,
         -5.0 + 30.0 * (((event_id * 1000003) % 2147483648) / 2147483648.0) AS ta,
         12.0 * (((event_id * 2654435761) % 2147483648) / 2147483648.0) AS vpd,
         CASE WHEN hour(ts) >= 7 AND hour(ts) <= 17
              THEN 600.0 * (((event_id * 2246822519) % 2147483648) / 2147483648.0)
              ELSE 0.0 END AS swin,
         ((event_id * 3266489917) % 2147483648) < 1503238553 AS measured
  FROM events
),
recs AS (
  SELECT *,
         1.0 + 0.2 * ta + 0.01 * swin
           + 4.0 * ((((event_id * 668265263) % 2147483648) / 2147483648.0) - 0.5) AS gf,
         CASE WHEN hr - 1.0 < 0.0 THEN hr - 1.0 + 24.0 ELSE hr - 1.0 END AS sh,
         CASE WHEN hr + 1.0 >= 24.0 THEN hr + 1.0 - 24.0 ELSE hr + 1.0 END AS eh
  FROM base
),
m1 AS (
  SELECT a.event_id,
         COUNT(*) AS n1,
         CASE WHEN COUNT(*) >= 6 THEN STDDEV_SAMP(b.gf) END AS sd
  FROM recs a JOIN recs b
    ON b.ts >= a.ts - INTERVAL 7 DAY AND b.ts <= a.ts + INTERVAL 7 DAY
   AND b.measured
   AND ABS(b.ta - a.ta) < 2.5
   AND ABS(b.vpd - a.vpd) < 5.0
   AND ABS(b.swin - a.swin) < LEAST(GREATEST(a.swin, 20.0), 50.0)
   AND CASE WHEN a.sh <= a.eh THEN b.hr >= a.sh AND b.hr <= a.eh
            ELSE b.hr >= a.sh OR b.hr <= a.eh END
  WHERE a.measured
  GROUP BY a.event_id
),
m1ok AS (
  SELECT r.ts, r.gf, m1.sd FROM recs r JOIN m1 USING (event_id)
  WHERE m1.sd IS NOT NULL
),
need2 AS (
  SELECT r.event_id, r.ts, r.gf
  FROM recs r LEFT JOIN m1 USING (event_id)
  WHERE m1.sd IS NULL
),
m2 AS (
  SELECT a.event_id, COUNT(m.sd) AS n2, MEDIAN(m.sd) AS sd2
  FROM need2 a LEFT JOIN m1ok m
    ON m.ts >= a.ts - INTERVAL 14 DAY AND m.ts <= a.ts + INTERVAL 14 DAY
   AND m.gf >= a.gf - GREATEST(ABS(a.gf) * 0.2, 2.0)
   AND m.gf <= a.gf + GREATEST(ABS(a.gf) * 0.2, 2.0)
  GROUP BY a.event_id
),
joined AS (
  SELECT r.event_id,
         COALESCE(m1.sd, m2.sd2) AS ru_raw,
         COALESCE(m1.n1, 0) AS n1,
         COALESCE(m2.n2, 0) AS n2,
         CASE WHEN m1.sd IS NOT NULL THEN 1
              WHEN m2.sd2 IS NOT NULL THEN 2 ELSE 0 END AS method,
         (0.5 + 2.0 * (((r.event_id * 3119415889) % 2147483648) / 2147483648.0)
          - (-0.5 - 2.0 * (((r.event_id * 374761393) % 2147483648) / 2147483648.0)))
           / 2.0 AS sigma
  FROM recs r
  LEFT JOIN m1 ON r.event_id = m1.event_id
  LEFT JOIN m2 ON r.event_id = m2.event_id
)
SELECT event_id,
       COALESCE(ROUND(ROUND(ru_raw, 9), 6), -1.0) AS randunc,
       CAST(n1 AS BIGINT) AS n1,
       CAST(n2 AS BIGINT) AS n2,
       CAST(method AS BIGINT) AS method,
       COALESCE(ROUND(ROUND(SQRT(ru_raw * ru_raw + sigma * sigma), 9), 6), -1.0) AS jointunc
FROM joined
ORDER BY event_id
"""


def q_quantiles_tdigest(sf_dir: str):
    """Approximate per-key quantiles via the merging t-digest
    (stages/sketch.py:quantile_sketch, Dunning & Ertl) — the documented
    scale path for percentiles101: ONE combiner pass, no exchange,
    bounded O(delta) centroids per key. Rows-only: the sketch is
    approximate by design; rank-error bounds (O(q(1-q)/delta)) are
    pinned against exact quantiles in tests/test_tdigest.py."""
    from ..stages.sketch import quantile_sketch

    ds = _events(sf_dir, ["event_type", "value"])
    out = quantile_sketch(
        ds, value_col="value", keys=["event_type"],
        qs=[0.01, 0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99],
        delta=200.0,
    )
    out["q"] = stable_round6(out["q"].astype(float))
    out["value"] = stable_round6(out["value"].astype(float))
    return out.sort_values(["event_type", "q"]).reset_index(drop=True)


def q_ustar_bootstrap(sf_dir: str):
    """Multi-year bootstrap USTAR thresholds — VUT per-year + CUT
    pooled (reference flux/lowres/ustar_bootstrap.py:58-365
    ``UstarBootstrapThresholds`` around MPT; stages/ustar.py:
    ustar_bootstrap_thresholds). Inputs synthesized from event_id with
    the q_ustar_mpt arithmetic plus a hashed 4-year axis so the 3-year
    sliding windows and their edge rules are exercised. Rows-only:
    bootstrap resampling is seeded-deterministic (Philox keyed on
    (seed, year, chunk), partitioning-independent) but not
    SQL-expressible; endpoint determinism is pinned in
    tests/test_ustar_bootstrap.py."""
    from ..stages.ustar import ustar_bootstrap_thresholds

    ds = _events(sf_dir, ["event_id", "ts"])

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        eid = df["event_id"].to_numpy(dtype=np.int64)
        h1 = (eid * 1_000_003) % 2_147_483_648
        h2 = (eid * 2_654_435_761) % 2_147_483_648
        h3 = (eid * 97_003) % 2_147_483_648
        h4 = (eid * 48_271) % 2_147_483_648
        ta = 5.0 + 15.0 * (h1 / 2147483648.0)
        ustar = 0.05 + 0.6 * (h2 / 2147483648.0)
        nee = (1.0 + 0.1 * ta) * (np.minimum(ustar, 0.25) / 0.25) \
            + 0.2 * (h3 / 2147483648.0 - 0.5)
        ts = pd.to_datetime(df["ts"])
        hour = ts.dt.hour.to_numpy()
        return pd.DataFrame({
            "ta": ta,
            "ustar": ustar,
            "nee": nee,
            "sw_in": np.where((hour >= 7) & (hour <= 17), 500.0, 0.0),
            "month": ts.dt.month.to_numpy(dtype=np.int64),
            "year": (2000 + h4 % 4).astype(np.int64),
        })

    out = ustar_bootstrap_thresholds(
        ds.map_batches(synth, batch_format="pandas", zero_copy_batch=False),
        n_iter=30, seed=7,
    )
    for c in ("p16", "p50", "p84"):
        v = np.asarray(stable_round6(out[c].astype(float)), dtype=np.float64)
        out[c] = np.where(np.isfinite(v), v, -1.0)
    out["year"] = out["year"].astype("int64")
    out["n_ok"] = out["n_ok"].astype("int64")
    return out.sort_values("year").reset_index(drop=True)


def q_nee_partition_nt(sf_dir: str):
    """Nighttime NEE -> GPP+RECO partitioning (Reichstein 2005 MR /
    REddyProc; stages/partition.py). Iterative profiled least squares
    -> rows-only driver check; planted-parameter recovery is pinned in
    tests/test_partition.py. One series per event_type: TA diurnal +
    trend, NEE follows Lloyd-Taylor with slowly-varying Rref plus
    deterministic hash noise. Returns one summary row per event_type."""
    from ..stages.partition import partition_distributed, lloyd_taylor

    ds = _events(sf_dir, ["event_id", "ts", "event_type"])

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        eid = df["event_id"].to_numpy(dtype=np.int64)
        ts = pd.to_datetime(df["ts"])
        hour = (ts.dt.hour + ts.dt.minute / 60.0).to_numpy()
        doy = ts.dt.dayofyear.to_numpy(dtype=np.float64)
        h1 = (eid * 2_654_435_761) % 2_147_483_648
        h2 = (eid * 2_246_822_519) % 2_147_483_648
        ta = 8.0 + 7.0 * np.sin(2 * np.pi * (hour - 9.0) / 24.0) \
            + 3.0 * (h1 / 2147483648.0 - 0.5)
        rref_true = 2.0 + 1.0 * np.sin(2 * np.pi * doy / 60.0)
        e0_true = 180.0
        resp = lloyd_taylor(ta + 273.15, rref_true, e0_true)
        day = (hour >= 7) & (hour <= 17)
        nee = resp - np.where(day, 6.0, 0.0) + 0.3 * (h2 / 2147483648.0 - 0.5)
        return pd.DataFrame({
            "event_id": eid,
            "event_type": df["event_type"],
            "ts": ts.astype("datetime64[us]"),
            "nee": nee,
            "ta": ta,
            "sw_in": np.where(day, 400.0, 0.0),
        })

    out = partition_distributed(
        ds.map_batches(synth, batch_format="pandas", zero_copy_batch=False),
        key_col="event_type", id_col="event_id",
    ).to_pandas()
    g = out.groupby("event_type", as_index=False).agg(
        e0=("e0", "first"),
        n=("event_id", "count"),
        n_night=("is_night", "sum"),
        mean_rref=("rref", "mean"),
        mean_reco=("reco", "mean"),
        mean_gpp=("gpp", "mean"),
    )
    for c in ("e0", "mean_rref", "mean_reco", "mean_gpp"):
        g[c] = np.asarray(stable_round6(g[c].astype(float)), dtype=np.float64)
        g[c] = np.where(np.isfinite(g[c]), g[c], -1.0)
    g["n"] = g["n"].astype("int64")
    g["n_night"] = g["n_night"].astype("int64")
    return g.sort_values("event_type").reset_index(drop=True)


def q_nee_partition_nt_oneflux(sf_dir: str):
    """ONEFlux-variant nighttime partitioning
    (flux/partitioning/nighttime_oneflux.py:77-394 via
    stages/partition_oneflux.py): Linacre sunrise/sunset + SW_IN night
    flag, trimmed windowed Lloyd-Taylor fits, lowest-SE E0 selection
    with the well-constrained gate, fixed-E0 Rref reanalysis with a
    robust twin. Same planted construction as nee_partition_nt
    (Lloyd-Taylor with slowly-varying Rref); iterative fits ->
    rows-only; recovery, gate and helper parity pinned in
    tests/test_partition_oneflux.py. One summary row per event_type."""
    from ..stages.partition_oneflux import lloyd_taylor_c, partition_nighttime_oneflux
    from ..util import stable_round6

    ds = _events(sf_dir, ["event_id", "ts", "event_type"])

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        eid = df["event_id"].to_numpy(dtype=np.int64)
        ts = pd.to_datetime(df["ts"])
        hour = (ts.dt.hour + ts.dt.minute / 60.0).to_numpy()
        doy = ts.dt.dayofyear.to_numpy(dtype=np.float64)
        h1 = (eid * 2_654_435_761) % 2_147_483_648
        h2 = (eid * 2_246_822_519) % 2_147_483_648
        ta = 8.0 + 7.0 * np.sin(2 * np.pi * (hour - 9.0) / 24.0) \
            + 3.0 * (h1 / 2147483648.0 - 0.5)
        rref_true = 2.0 + 1.0 * np.sin(2 * np.pi * doy / 60.0)
        resp = lloyd_taylor_c(ta, rref_true, 180.0)
        day = (hour >= 7) & (hour <= 17)
        nee = resp - np.where(day, 6.0, 0.0) + 0.3 * (h2 / 2147483648.0 - 0.5)
        return pd.DataFrame({
            "event_type": df["event_type"],
            "ts": ts.astype("datetime64[us]"),
            "nee": nee, "ta": ta,
            "sw_in": np.where(day, 400.0, 0.0),
        })

    out = partition_nighttime_oneflux(
        ds.map_batches(synth, batch_format="pandas", zero_copy_batch=False),
        keys=["event_type"], lat=47.0,
    ).to_pandas()
    g = out.groupby("event_type", as_index=False).agg(
        e0=("e0", "first"),
        n=("ts", "count"),
        n_night=("nee_night", "count"),
        mean_rref=("rref", "mean"),
        mean_reco=("reco", "mean"),
        mean_reco_rob=("reco_rob", "mean"),
        mean_gpp=("gpp", "mean"),
    )
    for c in ("e0", "mean_rref", "mean_reco", "mean_reco_rob", "mean_gpp"):
        g[c] = np.asarray(stable_round6(g[c].astype(float)), dtype=np.float64)
        g[c] = np.where(np.isfinite(g[c]), g[c], -1.0)
    g["n"] = g["n"].astype("int64")
    g["n_night"] = g["n_night"].astype("int64")
    return g.sort_values("event_type").reset_index(drop=True)


def q_asof_join_hourly(sf_dir: str):
    """Distributed ASOF join (stages/joins.py:asof_join): attach to each
    raw event the latest COMPLETED hourly mean of its event_type —
    right side = the engine's own 1h rollup tier (END-labelled
    bucket_ts, so an event only matches hours that closed at or before
    its timestamp). One keyed exchange + per-block pd.merge_asof.
    Reference anchor: diive's point-in-time donor lookups
    (diive/gapfilling/similarity.py window searches)."""
    from ..stages.joins import asof_join

    left = _events(sf_dir, ["event_id", "ts", "event_type", "value"])

    def prep_right(df: pd.DataFrame) -> pd.DataFrame:
        ts = pd.to_datetime(df["bucket_ts"]).astype("datetime64[us]")
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "ts": ts,
                "ref_ts": ts,
                "ref_mean": stable_round6(df["mean"].astype(float)),
            }
        )

    right = _fused_tier(sf_dir, "1h").map_batches(prep_right, batch_format="pandas")
    out = asof_join(left, right, key="event_type", on="ts").to_pandas()
    out["ts"] = pd.to_datetime(out["ts"]).astype("datetime64[us]")
    out["ref_ts"] = pd.to_datetime(out["ref_ts"]).astype("datetime64[us]")
    return out.sort_values("event_id").reset_index(drop=True)


_SQL_ASOF_HOURLY = """
WITH hourly AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS ref_ts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS ref_mean
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
)
SELECT l.event_id, l.ts, l.event_type, l.value, r.ref_ts, r.ref_mean
FROM events l ASOF LEFT JOIN hourly r
  ON l.event_type = r.event_type AND l.ts >= r.ref_ts
"""


def q_sessionize(sf_dir: str):
    """Log sessionization (stages/joins.py:session_stats): per-user
    sessions split at >6 h inactivity; one keyed exchange, vectorized
    per-block diff/cumsum labeling + same-block session rollup.
    Deterministic under (user_id, ts) ties: tied rows share a session
    (gap 0) whatever their order."""
    from ..stages.joins import session_stats

    ds = _events(sf_dir, ["user_id", "ts"])
    out = session_stats(ds, key="user_id", ts="ts", timeout_us=6 * US_PER_HOUR).to_pandas()
    return out.sort_values(["user_id", "session_id"]).reset_index(drop=True)


_SQL_SESSIONIZE = """
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w > INTERVAL 6 HOUR
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o
)
SELECT user_id,
       CAST(session_id AS BIGINT) AS session_id,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(FLOOR(epoch(MAX(ts) - MIN(ts))) AS BIGINT) AS duration_s
FROM s GROUP BY 1, 2
"""


def q_bin_fitter(sf_dir: str):
    """BinFitterCP (fits/fitter.py:17-255): quantile-bin the predictor,
    per-bin means, linear least squares over the bin means, 95%
    confidence/prediction bands from the t distribution. x = value,
    y = 0.1*value + user_id%50 (deterministic linear-plus-noise
    derivation both sides can spell). Bin rule = ntile(10) OVER
    (ORDER BY x, event_id) — the engine's exact distributed ntile."""
    from ..stages.fitter import bin_fit

    ds = _events(sf_dir, ["event_id", "user_id", "value"])

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["value"].notna()]
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "x": df["value"].astype(float),
                "y": 0.1 * df["value"].astype(float)
                + (df["user_id"].to_numpy(dtype=np.int64) % 50).astype(np.float64),
            }
        )

    res = bin_fit(
        ds.map_batches(derive, batch_format="pandas"),
        x_col="x", y_col="y", id_col="event_id", num_bins=10, degree=1,
    )
    out = res["bins"].copy()
    for c in ("x_mean", "y_mean", "fit_y", "conf_lo", "conf_hi", "pred_lo", "pred_hi"):
        out[c] = stable_round6(out[c].astype(float))
    return out.sort_values("bin").reset_index(drop=True)


# t critical value for dof = 10 bins - 2 params at 95% two-sided —
# the standard published constant the SQL oracle spells literally.
_T_CRIT_DF8 = "2.30600413520417"

_SQL_BIN_FITTER = f"""
WITH src AS (
  SELECT event_id, value AS x,
         0.1 * value + CAST(user_id % 50 AS DOUBLE) AS y
  FROM events WHERE value IS NOT NULL
),
b AS (
  SELECT x, y, NTILE(10) OVER (ORDER BY x, event_id) AS bin FROM src
),
m AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) / COUNT(*) AS x_mean, SUM(y) / COUNT(*) AS y_mean
  FROM b GROUP BY bin
),
fit AS (
  SELECT regr_slope(y_mean, x_mean) AS a1, regr_intercept(y_mean, x_mean) AS a0,
         COUNT(*) AS nb, AVG(x_mean) AS xm,
         SUM((x_mean - (SELECT AVG(x_mean) FROM m)) ** 2) AS sxx
  FROM m
),
r AS (
  SELECT m.bin, m.n, m.x_mean, m.y_mean,
         f.a0 + f.a1 * m.x_mean AS fit_y,
         SQRT(SUM((m.y_mean - (f.a0 + f.a1 * m.x_mean)) ** 2)
              OVER () / (f.nb - 2)) AS s_err,
         1.0 / f.nb + (m.x_mean - f.xm) ** 2 / f.sxx AS core
  FROM m, fit f
)
SELECT CAST(bin AS BIGINT) AS bin, n,
       ROUND(ROUND(x_mean, 9), 6) AS x_mean,
       ROUND(ROUND(y_mean, 9), 6) AS y_mean,
       ROUND(ROUND(fit_y, 9), 6) AS fit_y,
       ROUND(ROUND(fit_y - {_T_CRIT_DF8} * s_err * SQRT(core), 9), 6) AS conf_lo,
       ROUND(ROUND(fit_y + {_T_CRIT_DF8} * s_err * SQRT(core), 9), 6) AS conf_hi,
       ROUND(ROUND(fit_y - {_T_CRIT_DF8} * s_err * SQRT(1.0 + core), 9), 6) AS pred_lo,
       ROUND(ROUND(fit_y + {_T_CRIT_DF8} * s_err * SQRT(1.0 + core), 9), 6) AS pred_hi
FROM r ORDER BY bin
"""


def q_combine_variables(sf_dir: str):
    """combine_variables (variables/utilities.py:24-83): element-wise
    arithmetic on two aligned hourly series (mean value of 'click' vs
    'view' events) with keep_overlap_only=False (identity fill) for
    'add' plus the 'fillgaps' coalesce mode. Alignment = one outer
    merge on the hourly bucket."""
    ds = _events(sf_dir, ["ts", "event_type", "value"])

    def hourly(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["value"].notna() & df["event_type"].isin(["click", "view"])]
        us = ts_to_us(df["ts"])
        e = ((us + US_PER_HOUR - 1) // US_PER_HOUR) * US_PER_HOUR
        g = pd.DataFrame(
            {"event_type": df["event_type"], "e": e, "v": df["value"].astype(float)}
        ).groupby(["event_type", "e"], sort=False)
        out = g.agg(n=("v", "size"), s=("v", "sum")).reset_index()
        out["n"] = out["n"].astype(np.int64)
        return out

    parts = ds.map_batches(hourly, batch_format="pandas").to_pandas()
    tot = parts.groupby(["event_type", "e"], as_index=False)[["n", "s"]].sum()
    tot["mean"] = tot["s"] / tot["n"]
    a = tot[tot["event_type"] == "click"].set_index("e")["mean"]
    b = tot[tot["event_type"] == "view"].set_index("e")["mean"]
    added = a.add(b, fill_value=0.0)       # keep_overlap_only=False, identity 0
    strict = a.add(b)                      # overlap-only (NaN where either missing)
    filled = a.combine_first(b)            # fillgaps
    out = pd.DataFrame(
        {
            "bucket_ts": pd.to_datetime(added.index, unit="us").astype("datetime64[us]"),
            "sum_means": stable_round6(added.astype(float)),
            "overlap_sum": stable_round6(strict.reindex(added.index).astype(float)),
            "filled": stable_round6(filled.reindex(added.index).astype(float)),
        }
    ).reset_index(drop=True)
    return out.sort_values("bucket_ts").reset_index(drop=True)


_SQL_COMBINE_VARS = """
WITH src AS (
  SELECT event_type,
         make_timestamp(((epoch_us(ts) + 3599999999) // 3600000000) * 3600000000) AS e,
         value
  FROM events WHERE value IS NOT NULL AND event_type IN ('click', 'view')
),
m AS (
  SELECT event_type, e, SUM(value) / COUNT(*) AS mean FROM src GROUP BY 1, 2
),
a AS (SELECT e, mean FROM m WHERE event_type = 'click'),
b AS (SELECT e, mean FROM m WHERE event_type = 'view'),
j AS (
  SELECT COALESCE(a.e, b.e) AS e, a.mean AS am, b.mean AS bm
  FROM a FULL OUTER JOIN b ON a.e = b.e
)
SELECT e AS bucket_ts,
       ROUND(ROUND(COALESCE(am, 0.0) + COALESCE(bm, 0.0), 9), 6) AS sum_means,
       ROUND(ROUND(am + bm, 9), 6) AS overlap_sum,
       ROUND(ROUND(COALESCE(am, bm), 9), 6) AS filled
FROM j ORDER BY bucket_ts
"""


# ----------------------------------------------------- range join / windows


_RJ_TYPES = ["click", "error", "purchase", "signup", "view"]


def _rj_intervals() -> pd.DataFrame:
    """Literal per-type maintenance windows inside the fixture's January
    span: 3 windows per event_type, 2 days long, disjoint per key."""
    rows = []
    for i, t in enumerate(_RJ_TYPES):
        for w in range(3):
            start = pd.Timestamp("2024-01-03") + pd.Timedelta(days=i + 8 * w)
            rows.append(
                {
                    "event_type": t,
                    "start": start,
                    "end": start + pd.Timedelta(days=2),
                    "window_id": i * 10 + w,
                }
            )
    return pd.DataFrame(rows)


def q_range_join(sf_dir: str):
    """Broadcast interval join (stages/joins.py:range_join): events
    matched to per-type half-open [start, end) windows, rolled up per
    window. The interval table is broadcast once; matching is
    searchsorted per batch (disjoint intervals) — no shuffle."""
    from ..stages.joins import range_join

    ds = _events(sf_dir, ["event_id", "ts", "event_type", "value"])
    joined = range_join(
        ds, _rj_intervals(), key="event_type", ts_col="ts", closed="left"
    )
    df = joined.to_pandas()
    df = df[df["value"].notna()]
    g = df.groupby(["event_type", "window_id"], sort=True)
    out = g.agg(n=("value", "size"), mean_value=("value", "mean")).reset_index()
    out["window_id"] = out["window_id"].astype("int64")
    out["n"] = out["n"].astype("int64")
    out["mean_value"] = stable_round6(out["mean_value"].astype(float))
    return out.sort_values(["event_type", "window_id"]).reset_index(drop=True)


def _rj_sql() -> str:
    vals = []
    for i, t in enumerate(_RJ_TYPES):
        for w in range(3):
            start = pd.Timestamp("2024-01-03") + pd.Timedelta(days=i + 8 * w)
            end = start + pd.Timedelta(days=2)
            vals.append(
                f"('{t}', TIMESTAMP '{start}', TIMESTAMP '{end}', {i * 10 + w})"
            )
    return f"""
WITH iv(etype, s, e, window_id) AS (VALUES {", ".join(vals)})
SELECT ev.event_type, CAST(iv.window_id AS BIGINT) AS window_id,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(ROUND(AVG(ev.value), 9), 6) AS mean_value
FROM events ev JOIN iv ON ev.event_type = iv.etype
                      AND ev.ts >= iv.s AND ev.ts < iv.e
WHERE ev.value IS NOT NULL
GROUP BY ev.event_type, iv.window_id
ORDER BY ev.event_type, window_id
"""


def q_sliding_window(sf_dir: str):
    """Trailing 3h window per event_type, hopping hourly
    (stages/windows.py): replicate-to-window partials, ONE exchange,
    own-slide anchoring — exact vs a SQL RANGE-frame oracle."""
    from ..stages.windows import sliding_window_agg

    ds = _events(sf_dir, ["ts", "event_type", "value"])
    out = sliding_window_agg(
        ds,
        keys=["event_type"],
        ts_col="ts",
        value_col="value",
        window_us=3 * US_PER_HOUR,
        slide_us=US_PER_HOUR,
    ).to_pandas()
    res = pd.DataFrame(
        {
            "event_type": out["event_type"],
            "window_end": pd.to_datetime(out["window_end"]).astype("datetime64[us]"),
            "n": out["n"].astype("int64"),
            "mean_value": stable_round6(out["mean"].astype(float)),
            "min_value": round6(out["min"].astype(float)),
            "max_value": round6(out["max"].astype(float)),
        }
    )
    return res.sort_values(["event_type", "window_end"]).reset_index(drop=True)


_SQL_SLIDING_WINDOW = """
WITH b AS (
  SELECT event_type,
         make_timestamp(((epoch_us(ts) + 3599999999) // 3600000000) * 3600000000) AS e,
         value
  FROM events WHERE value IS NOT NULL
),
h AS (
  SELECT event_type, e, COUNT(*) AS n, SUM(value) AS s,
         MIN(value) AS mn, MAX(value) AS mx
  FROM b GROUP BY 1, 2
),
w AS (
  SELECT event_type, e AS window_end,
         SUM(n) OVER fr AS n, SUM(s) OVER fr AS s,
         MIN(mn) OVER fr AS mn, MAX(mx) OVER fr AS mx
  FROM h
  WINDOW fr AS (PARTITION BY event_type ORDER BY e
                RANGE BETWEEN INTERVAL 2 HOURS PRECEDING AND CURRENT ROW)
)
SELECT event_type, window_end, CAST(n AS BIGINT) AS n,
       ROUND(ROUND(s / n, 9), 6) AS mean_value,
       ROUND(mn, 6) AS min_value, ROUND(mx, 6) AS max_value
FROM w ORDER BY event_type, window_end
"""


# ------------------------------------------------------- gap-fill scoring


def q_gapfill_scores(sf_dir: str):
    """Gap-fill model scoring with an exact oracle (reference
    gapfilling/scores.py:41-49 metric set): hide every 1h-tier row with
    epoch-hour ≡ 2 (mod 5), linear-interpolate over the observed-row
    sequence (limit 2), then per-event_type mae / medae / mse / rmse /
    maxe / r2 + normalized nmae of filled-vs-truth. The hide rule,
    interpolation expression, and every metric replay verbatim in SQL
    (sklearn-eps mape excluded — no SQL twin; it stays in the
    rows-only tree_gapfill_scores)."""
    from ..stages.scores import planted_gap_fill_scores

    out = planted_gap_fill_scores(
        _fused_tier(sf_dir, "1h"), ["event_type"], value_col="mean",
        order_col="bucket_ts", hide_every=5, hide_phase=2, interp_limit=2,
    )
    out = out.drop(columns=["mape"])
    for c in ["mae", "medae", "mse", "rmse", "maxe", "r2", "nmae"]:
        out[c] = stable_round6(out[c].astype(float))
    return out.reset_index(drop=True)


_SQL_GAPFILL_SCORES = """
WITH t AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bucket_ts,
         SUM(value) / COUNT(value) AS v
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
), p AS (
  SELECT event_type, bucket_ts, v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bucket_ts) AS pos,
         ((CAST(epoch(bucket_ts) AS BIGINT) // 3600) % 5) = 2 AS hidden
  FROM t
), w AS (
  SELECT *,
    last_value(CASE WHEN NOT hidden THEN v END IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY pos
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    last_value(CASE WHEN NOT hidden THEN pos END IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY pos
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp,
    first_value(CASE WHEN NOT hidden THEN v END IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY pos
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN NOT hidden THEN pos END IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY pos
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS np
  FROM p
), f AS (
  SELECT event_type, v AS truth,
         pv + (nv - pv) * (pos - pp) / (np - pp) AS pred
  FROM w
  WHERE hidden AND pv IS NOT NULL AND nv IS NOT NULL AND (np - pp - 1) <= 2
), g AS (
  SELECT event_type, AVG(truth) AS tbar FROM f GROUP BY 1
)
SELECT f.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_scored,
       ROUND(ROUND(AVG(ABS(truth - pred)), 9), 6) AS mae,
       ROUND(ROUND(MEDIAN(ABS(truth - pred)), 9), 6) AS medae,
       ROUND(ROUND(AVG((truth - pred) * (truth - pred)), 9), 6) AS mse,
       ROUND(ROUND(SQRT(AVG((truth - pred) * (truth - pred))), 9), 6) AS rmse,
       ROUND(ROUND(MAX(ABS(truth - pred)), 9), 6) AS maxe,
       ROUND(ROUND(CASE WHEN SUM((truth - tbar) * (truth - tbar)) > 0
         THEN 1 - SUM((truth - pred) * (truth - pred))
                  / SUM((truth - tbar) * (truth - tbar)) END, 9), 6) AS r2,
       ROUND(ROUND(AVG(ABS(truth - pred)) / AVG(ABS(truth)), 9), 6) AS nmae
FROM f JOIN g ON f.event_type = g.event_type
GROUP BY f.event_type
ORDER BY f.event_type
"""


def q_tree_gapfill_scores(sf_dir: str):
    """Held-out train/test scores of the forest gap-filler (reference
    scores_traintest_, core/ml/common.py:259): deterministic hash
    split, per-key forest on time features, seven metrics per
    event_type on the hidden test rows. Model-based -> rows-only."""
    from ..stages.exchange import grouped_block_map
    from ..stages.gaps import regularize_frame
    from ..stages.mlfill import tree_fill_scores

    t1h = _fused_tier(sf_dir, "1h")

    def regularize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("bucket_ts", kind="stable")
        key = df["event_type"].iloc[0]
        reg = regularize_frame(df, US_PER_HOUR, "bucket_ts")
        reg["event_type"] = key
        return reg[["event_type", "bucket_ts", "mean"]]

    dense = grouped_block_map(t1h, ["event_type"], regularize)
    out = tree_fill_scores(
        dense, value_col="mean", keys=("event_type",),
        model="forest", n_trees=10, max_depth=6, seed=42,
    )
    for c in ["mae", "medae", "mse", "rmse", "mape", "maxe", "r2"]:
        out[c] = stable_round6(out[c].astype(float))
    return out.reset_index(drop=True)


# ----------------------------------------------------------- PWB lag + PWBOPT


def q_pwb_lag(sf_dir: str):
    """PWB block-bootstrap lag detection + PWBOPT decision rule
    (reference flux/hires/lag_pwb.py:83,2345 and
    detect_and_remove_tlag.py:47-52; stages/lag_pwb.py): per event_type
    the scalar is the segment's own value delayed by a planted per-type
    lag (3 + type-hash % 5 records), chunks are UTC days; the bootstrap
    mode must recover the planted lag on well-populated chunks and
    PWBOPT carries optima across unreliable ones. Probabilistic
    (bootstrap) -> rows-only; planted-lag recovery pinned by
    tests/test_lag_pwb.py at two scales."""
    import zlib

    from ..stages.exchange import grouped_block_map
    from ..stages.lag_pwb import pwb_lag_detect

    ds = _events(sf_dir, ["event_id", "event_type", "ts", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["day"] = ts_to_us(df["ts"]) // US_PER_DAY
        return df

    prepped = ds.map_batches(prep, batch_format="pandas")

    # planted per-type lag, synthesized AFTER the exchange (needs the
    # whole ordered segment — q_max_covariance's construction)
    def plant(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable").copy()
        k = 3 + (zlib.crc32(str(g["event_type"].iloc[0]).encode()) % 5)
        g["scalar"] = g["value"].shift(k)
        return g

    planted = grouped_block_map(prepped, ["event_type"], plant)
    out = pwb_lag_detect(
        planted, segment_keys=["event_type"], chunk_col="day",
        order_cols=["ts", "event_id"], ref_col="value", scalar_col="scalar",
        lag_max=12, n_boot=99, seed=11,
    ).to_pandas()
    for c in ("tlag", "hdi_lo", "hdi_hi", "hdi_range", "pwbopt", "tlag_final"):
        out[c] = stable_round6(out[c].astype(float))
    out["day"] = out["day"].astype("int64")
    out["n_records"] = out["n_records"].astype("int64")
    out["n_boot"] = out["n_boot"].astype("int64")
    return out.sort_values(["event_type", "day"]).reset_index(drop=True)


def q_hq_flux(sf_dir: str):
    """Highest-quality flux selection (hqflux.py:126-330): day/night
    regimes from solar geometry, per-regime non-iterated Hampel
    (window 49, n_sigma 5.5, double-differencing), then the reference's
    summary per regime — SD / 1st/99th percentiles / mean rolling
    median (window 49) of the filtered series plus sign-split
    non-outlier extrema (hqflux.py:75-89). Flux = value - 50 so both
    signs are exercised. One keyed exchange; summaries are one row per
    (key, regime).

    Hot-key bound (VERDICT r3 #4 audit): the per-regime Hampel filter
    is a SEQUENTIAL rolling-median pass — it requires the key's whole
    ordered series in one block by nature, so the key must carry a
    bounded series (a station/series id over a finite time range, as
    here), never a bare low-cardinality label over raw corpus rows. At
    100 TB the partitioning contract is keys x time-chunks (the
    FileSplitter / rollup (source, day) shape), keeping every block
    a bounded time window."""
    from ..stages.exchange import grouped_block_map
    from ..stages.hqflux import hq_flux_frame

    ds = _events(sf_dir, ["event_id", "event_type", "ts", "value"])

    def gfn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["flux"] = df["value"].astype(float) - 50.0
        out = hq_flux_frame(
            df, value_col="flux", ts_col="ts", order_cols=("event_id",),
            lat=47.0, lon=8.5, window_length=49, n_sigma_daytime=5.5,
            n_sigma_nighttime=5.5, use_differencing=True,
            median_window=49, repeat=False,
        )
        out.insert(0, "event_type", df["event_type"].iloc[0])
        return out

    out = grouped_block_map(ds, ["event_type"], gfn).to_pandas()
    for c in ("flag_daytime", "n", "n_outliers", "winsize"):
        out[c] = out[c].astype("int64")
    for c in ("sd_filtered", "p01", "p99", "mean_rmedian",
              "max_nonneg", "min_nonneg", "max_neg", "min_neg"):
        out[c] = stable_round6(out[c].astype(float))
    return out.sort_values(["event_type", "flag_daytime"]).reset_index(drop=True)


_SQL_HQ_FLUX = """
WITH base AS (
  SELECT event_id, event_type, ts, value - 50.0 AS flux,
         radians(-23.44) * cos(2 * pi() * (((epoch(ts) / 86400.0) % 365.25) + 10.0) / 365.25) AS decl,
         radians(15.0 * ((((epoch(ts) % 86400) / 3600.0) + 8.5 / 15.0) - 12.0)) AS hour_angle
  FROM events WHERE value IS NOT NULL
), flagged AS (
  SELECT event_id, event_type, ts, flux,
         CASE WHEN 1367.0 * GREATEST(
           sin(radians(47.0)) * sin(decl) + cos(radians(47.0)) * cos(decl) * cos(hour_angle),
           0.0) > 20.0 THEN 1 ELSE 0 END AS dn
  FROM base
), s AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, dn ORDER BY ts, event_id) AS pos
  FROM flagged
), d AS (
  SELECT *,
    COALESCE((flux - lag(flux) OVER w) - (lead(flux) OVER w - flux), 0.0) AS dd
  FROM s WINDOW w AS (PARTITION BY event_type, dn ORDER BY pos)
), m AS (
  SELECT *,
    CAST(median(dd) OVER (PARTITION BY event_type, dn ORDER BY pos
      ROWS BETWEEN 24 PRECEDING AND 24 FOLLOWING) AS DOUBLE) AS rmed
  FROM d
), mad AS (
  SELECT *,
    CAST(median(ABS(dd - rmed)) OVER (PARTITION BY event_type, dn ORDER BY pos
      ROWS BETWEEN 24 PRECEDING AND 24 FOLLOWING) AS DOUBLE) + 1e-6 AS rmad
  FROM m
), f AS (
  SELECT *,
    (dd > rmed + (1.4826 * rmad) * 5.5 OR dd < rmed - (1.4826 * rmad) * 5.5) AS is_out,
    CASE WHEN NOT (dd > rmed + (1.4826 * rmad) * 5.5 OR dd < rmed - (1.4826 * rmad) * 5.5)
         THEN flux END AS filtered
  FROM mad
), r AS (
  SELECT *,
    CAST(median(filtered) OVER (PARTITION BY event_type, dn ORDER BY pos
      ROWS BETWEEN 24 PRECEDING AND 24 FOLLOWING) AS DOUBLE) AS rmedian
  FROM f
)
SELECT event_type,
       CAST(dn AS BIGINT) AS flag_daytime,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN is_out THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(49 AS BIGINT) AS winsize,
       ROUND(ROUND(COALESCE(stddev_samp(filtered), -9999.0), 9), 6) AS sd_filtered,
       ROUND(ROUND(COALESCE(quantile_cont(filtered, 0.01), -9999.0), 9), 6) AS p01,
       ROUND(ROUND(COALESCE(quantile_cont(filtered, 0.99), -9999.0), 9), 6) AS p99,
       ROUND(ROUND(COALESCE(AVG(rmedian), -9999.0), 9), 6) AS mean_rmedian,
       ROUND(ROUND(COALESCE(MAX(CASE WHEN NOT is_out AND flux >= 0 THEN flux END), -9999.0), 9), 6) AS max_nonneg,
       ROUND(ROUND(COALESCE(MIN(CASE WHEN NOT is_out AND flux >= 0 THEN flux END), -9999.0), 9), 6) AS min_nonneg,
       ROUND(ROUND(COALESCE(MAX(CASE WHEN NOT is_out AND flux < 0 THEN flux END), -9999.0), 9), 6) AS max_neg,
       ROUND(ROUND(COALESCE(MIN(CASE WHEN NOT is_out AND flux < 0 THEN flux END), -9999.0), 9), 6) AS min_neg
FROM r
GROUP BY event_type, dn
ORDER BY event_type, dn
"""


def q_timelag_analysis(sf_dir: str):
    """TimeLagAnalysis.analyze_gas (timelag_analysis.py:349-440) over a
    derived discrete lag column (0.05 s steps, EddyPro's grid):
    unique-value histogram (histogram.py:88-124 — np.histogram with the
    unique values as edges merges the LAST value's count into the
    preceding bin) per event_type with fringe exclusion [5, 10],
    display-range filter [0, 10], gradient-based peak range
    (threshold 0.15) and the +-0.05 EddyPro adjustment. The data never
    shuffles: per-batch partial counts combine to <= n_keys x 40 rows
    and the gradient scan runs on that tiny frame."""
    from ..stages.hqflux import timelag_analysis_frame

    ds = _events(sf_dir, ["event_type", "value"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        v = batch.column("value").to_numpy(zero_copy_only=False).astype(float)
        keep = ~np.isnan(v)
        et, v = et[keep], v[keep]
        tlag = 0.05 * (((np.floor(v).astype(np.int64) % 40) + 40) % 40)
        g = pd.DataFrame({"event_type": et, "tlag": tlag})
        out = g.groupby(["event_type", "tlag"], sort=False).size().reset_index(name="n")
        return out

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    counts = parts.groupby(["event_type", "tlag"], as_index=False)["n"].sum()
    out = timelag_analysis_frame(
        counts, "event_type", "tlag", "n",
        ignore_fringe_bins=(5, 10), histogram_startbin=0.0,
        histogram_endbin=10.0, gradient_threshold=0.15, eddypro_step=0.05,
    )
    for c in ("peak", "peak_min", "peak_max", "eddypro_min", "eddypro_max"):
        out[c] = stable_round6(out[c].astype(float))
    for c in ("n_bins_shown", "n_total"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


_SQL_TIMELAG = """
WITH t AS (
  SELECT event_type,
         0.05 * (((CAST(FLOOR(value) AS BIGINT) % 40) + 40) % 40) AS tlag
  FROM events WHERE value IS NOT NULL
), c AS (
  SELECT event_type, tlag, COUNT(*) AS n FROM t GROUP BY 1, 2
), b AS (
  SELECT event_type, tlag, n,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY tlag) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS nb,
         LEAD(n) OVER (PARTITION BY event_type ORDER BY tlag) AS lead_n
  FROM c
), merged AS (
  SELECT event_type, tlag,
         CASE WHEN rn = nb - 1 THEN n + lead_n ELSE n END AS n
  FROM b WHERE rn < nb
), fr AS (
  SELECT event_type, tlag, n,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY tlag) AS pos,
         COUNT(*) OVER (PARTITION BY event_type) AS m
  FROM merged
), hist AS (
  SELECT event_type, tlag, n FROM fr WHERE pos > 5 AND pos <= m - 10
), pk AS (
  SELECT event_type, tlag AS peak FROM (
    SELECT event_type, tlag,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n DESC, tlag) AS r
    FROM hist) WHERE r = 1
), shown AS (
  SELECT event_type, tlag, n,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY tlag) AS pos,
         COUNT(*) OVER (PARTITION BY event_type) AS m,
         MAX(n) OVER (PARTITION BY event_type) AS maxn
  FROM hist WHERE tlag >= 0.0 AND tlag <= 10.0
), gr AS (
  SELECT *, CASE
      WHEN m = 1 THEN 0.0
      WHEN pos = 1 THEN LEAD(CAST(n AS DOUBLE) / maxn) OVER w - CAST(n AS DOUBLE) / maxn
      WHEN pos = m THEN CAST(n AS DOUBLE) / maxn - LAG(CAST(n AS DOUBLE) / maxn) OVER w
      ELSE (LEAD(CAST(n AS DOUBLE) / maxn) OVER w - LAG(CAST(n AS DOUBLE) / maxn) OVER w) / 2.0
    END AS grad
  FROM shown WINDOW w AS (PARTITION BY event_type ORDER BY pos)
), pidx AS (
  SELECT event_type, pos AS peak_pos FROM (
    SELECT gr.event_type, gr.pos,
           ROW_NUMBER() OVER (PARTITION BY gr.event_type
             ORDER BY ABS(gr.tlag - pk.peak), gr.pos) AS r
    FROM gr JOIN pk USING (event_type)) WHERE r = 1
), edges AS (
  SELECT p.event_type, p.peak_pos,
    COALESCE(MAX(CASE WHEN gr.pos < p.peak_pos AND ABS(gr.grad) < 0.15 THEN gr.pos END), p.peak_pos) AS left_pos,
    COALESCE(MIN(CASE WHEN gr.pos > p.peak_pos AND ABS(gr.grad) < 0.15 THEN gr.pos END), p.peak_pos) AS right_pos
  FROM pidx p JOIN gr ON gr.event_type = p.event_type
  GROUP BY p.event_type, p.peak_pos
)
SELECT e.event_type,
       ROUND(ROUND(pk.peak, 9), 6) AS peak,
       ROUND(ROUND(gl.tlag, 9), 6) AS peak_min,
       ROUND(ROUND(gh.tlag, 9), 6) AS peak_max,
       ROUND(ROUND(gl.tlag - 0.05, 9), 6) AS eddypro_min,
       ROUND(ROUND(gh.tlag + 0.05, 9), 6) AS eddypro_max,
       CAST(gl.m AS BIGINT) AS n_bins_shown,
       CAST((SELECT SUM(s2.n) FROM shown s2 WHERE s2.event_type = e.event_type) AS BIGINT) AS n_total
FROM edges e
JOIN pk USING (event_type)
JOIN gr gl ON gl.event_type = e.event_type AND gl.pos = e.left_pos
JOIN gr gh ON gh.event_type = e.event_type AND gh.pos = e.right_pos
ORDER BY e.event_type
"""


def q_event_funnel(sf_dir: str):
    """Ordered conversion funnel view -> click -> purchase within 24 h
    of the first view (stages/joins.py:funnel_counts): per-user minima
    chained with strictly-after semantics; one exchange on user_id,
    per-block vectorized step masking, tiny driver sum of per-block
    partial counts (users are block-disjoint)."""
    from ..stages.joins import funnel_counts

    ds = _events(sf_dir, ["user_id", "event_type", "ts"])
    out = funnel_counts(
        ds, steps=["view", "click", "purchase"],
        key="user_id", ts="ts", event_col="event_type",
        window_us=24 * US_PER_HOUR,
    )
    out["step"] = out["step"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return out


_SQL_EVENT_FUNNEL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(s1.t1) AS t1, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
    AND e.ts <= s1.t1 + INTERVAL 24 HOUR
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
    AND e.ts <= s2.t1 + INTERVAL 24 HOUR
  GROUP BY e.user_id
)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
         CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users
  UNION ALL
  SELECT 2, 'click', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
  UNION ALL
  SELECT 3, 'purchase', CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
) ORDER BY step
"""


def q_hll_distinct_users(sf_dir: str):
    """Approximate COUNT(DISTINCT user_id) per event_type via mergeable
    HyperLogLog registers (stages/sketch.py:hll_distinct, p=12, ~1.6%
    std error) — the cardinality sketch for streams where an exact
    distinct would shuffle the full (key, value) projection. Rows-only
    by design (the estimate is not SQL-expressible); the error bound vs
    exact distinct is pinned by tests/test_sketch.py."""
    from ..stages.sketch import hll_distinct

    ds = _events(sf_dir, ["event_type", "user_id"])
    out = hll_distinct(ds, value_col="user_id", keys=["event_type"], p=12)
    out["n_distinct_est"] = stable_round6(out["n_distinct_est"].astype(float))
    return out.sort_values("event_type").reset_index(drop=True)


def q_event_transitions(sf_dir: str):
    """First-order event transition matrix per user
    (stages/joins.py:event_transitions): one exchange on user_id,
    per-block vectorized shift with boundary masking, driver sum of
    ≤ #event-types² partials per block; event_id tie-breaks equal
    timestamps so the sequence is a total order."""
    from ..stages.joins import event_transitions

    ds = _events(sf_dir, ["user_id", "event_type", "ts", "event_id"])
    return event_transitions(
        ds, key="user_id", ts="ts", event_col="event_type", order_col="event_id"
    )


_SQL_EVENT_TRANSITIONS = """
WITH o AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_event
  FROM events
)
SELECT prev_event, event_type AS next_event,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY prev_event), 6) AS p
FROM o WHERE prev_event IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_tokens_vocab_hist(sf_dir: str):
    """Corpus-wide vocabulary statistics over the north-rule
    ``tokens:list<int32>`` arrays (BASELINE.json input_hint): per
    token id, total occurrences (tf) and containing-doc count (df) —
    the inputs to vocab coverage / idf / BPE-merge analysis. Token
    arrays are synthesized with the fixture formula and aggregated
    FROM the materialized buffers (np.bincount over the flattened
    values; df via unique (doc, token) keys), exactly as
    q_tokens_rollup_1h. Per-batch partials are bounded by VOCAB, then
    ONE tiny exchange on token sums them — the hierarchical shape
    that holds at 100 TB (no driver-side accumulation; arrays never
    leave their read task). Oracle replays the formula with a bounded
    generate_series cross join."""
    from ..fixtures import KNUTH, VOCAB
    from ..stages.exchange import block_map

    ds = _events(sf_dir, ["event_id"])

    def partial(t: pa.Table) -> pd.DataFrame:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(eid) == 0:
            return pd.DataFrame({
                "token": pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64),
                "df": pd.Series([], dtype=np.int64),
            })
        n_tok = (eid % 257 + 1).astype(np.int64)
        seed = (eid.astype(np.uint64) * np.uint64(1_000_003)) & np.uint64(0x7FFFFFFFFFFF)
        offsets = np.zeros(len(eid) + 1, dtype=np.int64)
        np.cumsum(n_tok, out=offsets[1:])
        total = int(offsets[-1])
        j = (np.arange(total, dtype=np.uint64)
             - np.repeat(offsets[:-1], n_tok).astype(np.uint64) + np.uint64(1))
        flat = ((np.repeat(seed, n_tok) + j * np.uint64(KNUTH)) % np.uint64(VOCAB)).astype(np.int64)
        tf = np.bincount(flat, minlength=VOCAB)
        # df: unique (doc, token) pairs, then count tokens once per doc
        key = np.repeat(eid, n_tok) * np.int64(VOCAB) + flat
        df_ = np.bincount(np.unique(key) % np.int64(VOCAB), minlength=VOCAB)
        nz = np.flatnonzero(tf)
        return pd.DataFrame({
            "token": nz.astype(np.int64),
            "n": tf[nz].astype(np.int64),
            "df": df_[nz].astype(np.int64),
        })

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("token", as_index=False)[["n", "df"]].sum()
        for c in ("token", "n", "df"):
            out[c] = out[c].astype(np.int64)
        return out

    pre = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = block_map(pre, ["token"], combine, batch_format="pandas",
                    zero_copy_batch=False, weight_col="n").to_pandas()
    return out.sort_values("token").reset_index(drop=True)


_SQL_TOKENS_VOCAB = """
WITH tok AS (
  SELECT event_id, (event_id % 257) + 1 AS n_tok,
         (event_id * 1000003) % 140737488355328 AS seed
  FROM events
), flat AS (
  SELECT event_id, (seed + j * 2654435761) % 50257 AS token
  FROM tok, generate_series(1, 257) AS t(j)
  WHERE j <= n_tok
)
SELECT CAST(token AS BIGINT) AS token,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT event_id) AS BIGINT) AS df
FROM flat GROUP BY 1 ORDER BY 1
"""


def q_token_ngram_overlap(sf_dir: str):
    """Cross-source token 4-gram contamination matrix over the
    north-rule ``tokens:list<int32>`` arrays (the token-level analogue
    of the 13-gram text decontamination, Brown et al. 2020 App. C):
    per event_type, the DISTINCT set of consecutive-token 4-grams
    (packed into one int64 key, base VOCAB — 50257^4 < 2^63), then
    pairwise |A intersect B| and Jaccard. Ray shape: per-batch
    vectorized distinct (type, key) emission, ONE keyed exchange on
    the 4-gram key (types-per-key is bounded by |types|, so per-block
    pair emission is tiny), slim combine. Token arrays synthesized
    with the fixture formula identically in SQL."""
    from ..fixtures import KNUTH as _K, VOCAB as _V
    from ..stages.exchange import block_map

    ds = _events(sf_dir, ["event_id", "event_type"])

    def partial(t: pa.Table) -> pd.DataFrame:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        if len(eid) == 0:
            return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                                 "key": pd.Series([], dtype=np.int64)})
        n_tok = (eid % 257 + 1).astype(np.int64)
        seed = (eid.astype(np.uint64) * np.uint64(1_000_003)) & np.uint64(0x7FFFFFFFFFFF)
        offsets = np.zeros(len(eid) + 1, dtype=np.int64)
        np.cumsum(n_tok, out=offsets[1:])
        total = int(offsets[-1])
        j = (np.arange(total, dtype=np.uint64)
             - np.repeat(offsets[:-1], n_tok).astype(np.uint64) + np.uint64(1))
        flat = ((np.repeat(seed, n_tok) + j * np.uint64(_K)) % np.uint64(_V)).astype(np.int64)
        # in-doc 4-gram windows: start positions with j <= n_tok - 3
        jj = j.astype(np.int64)
        ntrep = np.repeat(n_tok, n_tok)
        m = jj <= ntrep - 3
        starts = np.flatnonzero(m)
        if len(starts) == 0:
            return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                                 "key": pd.Series([], dtype=np.int64)})
        V = np.int64(_V)
        key = ((flat[starts] * V + flat[starts + 1]) * V
               + flat[starts + 2]) * V + flat[starts + 3]
        df = pd.DataFrame({
            "event_type": np.repeat(et, n_tok)[starts], "key": key,
        }).drop_duplicates()
        return df

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        # block holds complete key groups: distinct types per key ->
        # per-type counts and per-pair co-occurrence counts
        df = df.drop_duplicates()
        singles = df.groupby("event_type").size().reset_index(name="cnt")
        singles["pair"] = singles["event_type"]
        g = df.groupby("key")["event_type"].agg(lambda s: sorted(set(s)))
        pairs: dict[tuple, int] = {}
        for types in g:
            for i in range(len(types)):
                for jx in range(i + 1, len(types)):
                    p = (types[i], types[jx])
                    pairs[p] = pairs.get(p, 0) + 1
        pair_df = pd.DataFrame(
            [(a + "|" + b, c) for (a, b), c in pairs.items()],
            columns=["pair", "cnt"]) if pairs else pd.DataFrame(
            {"pair": pd.Series([], dtype=object), "cnt": pd.Series([], dtype=np.int64)})
        out = pd.concat([singles[["pair", "cnt"]], pair_df], ignore_index=True)
        out["cnt"] = out["cnt"].astype(np.int64)
        return out

    pre = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = block_map(pre, ["key"], per_key, batch_format="pandas",
                    zero_copy_batch=False).to_pandas()
    tot = agg.groupby("pair", sort=True)["cnt"].sum()
    singles = {p: int(c) for p, c in tot.items() if "|" not in p}
    rows = []
    for p, c in tot.items():
        if "|" not in p:
            continue
        a, b = p.split("|")
        inter = int(c)
        rows.append((a, b, singles[a], singles[b], inter,
                     inter / (singles[a] + singles[b] - inter)))
    out = pd.DataFrame(rows, columns=[
        "type_a", "type_b", "n_a", "n_b", "n_common", "jaccard"])
    for c in ("n_a", "n_b", "n_common"):
        out[c] = out[c].astype("int64")
    out["jaccard"] = stable_round6(out["jaccard"].astype(float))
    return out.sort_values(["type_a", "type_b"]).reset_index(drop=True)


_SQL_TOKEN_NGRAM = """
WITH tok AS (
  SELECT event_id, event_type, (event_id % 257) + 1 AS n_tok,
         (event_id * 1000003) % 140737488355328 AS seed
  FROM events
), flat AS (
  SELECT event_id, event_type, n_tok, j,
         (seed + j * 2654435761) % 50257 AS token
  FROM tok, generate_series(1, 257) AS t(j)
  WHERE j <= n_tok
), grams AS (
  SELECT event_type,
         ((token * 50257
           + LEAD(token, 1) OVER w) * 50257
           + LEAD(token, 2) OVER w) * 50257
           + LEAD(token, 3) OVER w AS key,
         j, n_tok
  FROM flat
  WINDOW w AS (PARTITION BY event_id ORDER BY j)
), dk AS (
  SELECT DISTINCT event_type, key FROM grams WHERE j <= n_tok - 3
), singles AS (
  SELECT event_type, COUNT(*)::BIGINT AS n FROM dk GROUP BY 1
), inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*)::BIGINT AS n_common
  FROM dk a JOIN dk b ON a.key = b.key AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT i.type_a, i.type_b, sa.n AS n_a, sb.n AS n_b, i.n_common,
       ROUND(ROUND(CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common), 9), 6) AS jaccard
FROM inter i
JOIN singles sa ON sa.event_type = i.type_a
JOIN singles sb ON sb.event_type = i.type_b
ORDER BY type_a, type_b
"""


def q_file_split_stats(sf_dir: str):
    """FileSplitter splits-overview (reference filesplitter.py:169-240
    via sources/splitter.py): 6h time chunks over events with 2-D wind
    rotation + Reynolds *_TURB departures (u/v/w synthesized as in
    q_wind_rotation), stats-only run (the file-write path is round-trip
    pytest-pinned). Name = first record's %Y%m%d%H%M%S + '_ROT'."""
    from ..sources.splitter import split_timeseries

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy(dtype=np.float64)
        df = df.assign(
            u=df["value"],
            v=df["value"] * np.cos(uid),
            w=df["value"] * np.sin(uid) / 10.0,
        )
        return df.drop(columns=["user_id"])

    out = split_timeseries(
        ds.map_batches(synth, batch_format="pandas"),
        outdir="/tmp/diive_ray_splits", ts_col="ts", every="6h",
        rotation=True, u="u", v="v", w="w", c="value", write_files=False,
    )
    return out.reset_index(drop=True)


_SQL_FILE_SPLIT = """
WITH b AS (
  SELECT ts, (epoch_us(ts) // 21600000000) * 21600000000 AS bucket
  FROM events
)
SELECT strftime(MIN(ts), '%Y%m%d%H%M%S') || '_ROT' AS split_name,
       MIN(ts) AS "start", MAX(ts) AS "end",
       CAST(COUNT(*) AS BIGINT) AS n_records,
       CAST(13 AS BIGINT) AS n_columns,
       CAST(1 AS BIGINT) AS wind_rotation
FROM b GROUP BY bucket ORDER BY 1
"""


def q_file_inventory(sf_dir: str):
    """FileDetector expected-vs-available inventory (reference
    filedetector.py:18-153 via sources/inventory.py:file_inventory):
    file names synthesized from the events table's 6h generation grid
    (%Y%m%d%H%M%S of the slot start — the logger-naming convention the
    reference parses), with deterministic hash-dropped slots (missing
    expected files) and one-hour-shifted slots (unexpected / off-grid
    files); data_res = 60 s. Grid assembly is calendar-bounded."""
    from ..sources.inventory import file_inventory
    from ..stages.exchange import driver_combine

    ds = _events(sf_dir, ["ts"])
    width = 21_600_000_000  # 6h in us

    def buckets(t: pa.Table) -> pd.DataFrame:
        us = ts_to_us(t["ts"].to_pandas())
        return pd.DataFrame({"bk": np.unique((us // width) * width)})

    bks = np.unique(
        driver_combine(ds, buckets, lambda df: df)["bk"].to_numpy(dtype=np.int64)
    )
    slot = bks // width
    keep = slot % 7 != 3                    # dropped slots = missing files
    dt_us = np.where(slot % 11 == 5, bks + 3_600_000_000, bks)[keep]
    names = pd.Series(dt_us.astype("datetime64[us]")).dt.strftime("%Y%m%d%H%M%S")

    out = file_inventory(
        pd.DataFrame({"filename": names}),
        file_date_format="%Y%m%d%H%M%S",
        file_generation_res="6h",
        data_res=60.0,
    )
    out["expected_records"] = out["expected_records"].astype(float)
    out["expected_duration"] = out["expected_duration"].astype(float)
    return out


_SQL_FILE_INVENTORY = """
WITH b AS (
  SELECT DISTINCT (epoch_us(ts) // 21600000000) * 21600000000 AS bk FROM events
),
f AS (
  SELECT CASE WHEN (bk // 21600000000) % 11 = 5 THEN bk + 3600000000 ELSE bk END AS dt_us
  FROM b WHERE (bk // 21600000000) % 7 <> 3
),
d AS (
  SELECT make_timestamp(dt_us) AS dt,
         strftime(make_timestamp(dt_us), '%Y%m%d%H%M%S') AS filename
  FROM f
),
bounds AS (SELECT MIN(dt) AS lo, MAX(dt) AS hi FROM d),
grid AS (
  SELECT UNNEST(generate_series(lo, hi + INTERVAL 6 HOUR, INTERVAL 6 HOUR)) AS gdt
  FROM bounds
),
allrows AS (
  SELECT g.gdt AS file_dt, g.gdt AS expected_file, d.filename
  FROM grid g LEFT JOIN d ON d.dt = g.gdt
  UNION ALL
  SELECT dt, NULL, filename FROM d WHERE dt NOT IN (SELECT gdt FROM grid)
),
w AS (
  SELECT file_dt, expected_file, filename,
         CASE WHEN filename IS NULL THEN 0 ELSE 1 END AS avail,
         LEAD(file_dt) OVER (ORDER BY file_dt) AS expected_end
  FROM allrows
)
SELECT file_dt, expected_file,
       CAST(avail AS BIGINT) AS file_available, filename, expected_end,
       CASE WHEN avail = 1 THEN epoch(expected_end - file_dt) END AS expected_duration,
       CASE WHEN avail = 1 THEN epoch(expected_end - file_dt) / 60.0 END AS expected_records
FROM w ORDER BY file_dt
"""


_METEO_RENAME = {"click": "TA", "error": "RH", "purchase": "SW_IN",
                 "signup": "PPFD_IN", "view": "PA"}


def q_eddypro_meteo_format(sf_dir: str):
    """EddyPro flux-processing meteo input layout
    (io/formats/meteo.py:21-89 FormatMeteoForEddyProFluxProcessing via
    the fluxnet wide pivot): timestamp split into TIMESTAMP_1
    (yyyy-mm-dd) and TIMESTAMP_2 (HH:MM) leading columns, variables
    renamed to meteo codes, missing filled with -9999. Same ONE-bucket-
    exchange pivot as fluxnet_format; SQL replays the split + rename."""
    from ..sources.fluxnet import fluxnet_wide

    t1h = _fused_tier(sf_dir, "1h")
    wide = fluxnet_wide(t1h, variables=list(_METEO_RENAME)).to_pandas()
    s = wide["TIMESTAMP_END"]
    out = pd.DataFrame({
        "TIMESTAMP_1": s.str[0:4] + "-" + s.str[4:6] + "-" + s.str[6:8],
        "TIMESTAMP_2": s.str[8:10] + ":" + s.str[10:12],
    })
    for src, dst in _METEO_RENAME.items():
        out[dst] = round6(wide[f"{src}_1_1_1"].astype(float))
    return out.sort_values(["TIMESTAMP_1", "TIMESTAMP_2"]).reset_index(drop=True)


_SQL_METEO_FORMAT = """
WITH h AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bucket_ts,
         SUM(value) / COUNT(value) AS mean
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
)
SELECT strftime(bucket_ts, '%Y-%m-%d') AS "TIMESTAMP_1",
       strftime(bucket_ts, '%H:%M') AS "TIMESTAMP_2",
       ROUND(COALESCE(MAX(CASE WHEN event_type = 'click' THEN mean END), -9999), 6) AS "TA",
       ROUND(COALESCE(MAX(CASE WHEN event_type = 'error' THEN mean END), -9999), 6) AS "RH",
       ROUND(COALESCE(MAX(CASE WHEN event_type = 'purchase' THEN mean END), -9999), 6) AS "SW_IN",
       ROUND(COALESCE(MAX(CASE WHEN event_type = 'signup' THEN mean END), -9999), 6) AS "PPFD_IN",
       ROUND(COALESCE(MAX(CASE WHEN event_type = 'view' THEN mean END), -9999), 6) AS "PA"
FROM h GROUP BY bucket_ts ORDER BY 1, 2
"""


def q_winsorize(sf_dir: str):
    """Per-key winsorization (the outlier-capping cousin of the setto
    corrections, preprocessing/corrections/setto.py family + the exact
    distributed quantile machinery): clip each event_type's values at
    its own [p05, p95] (linear-interpolation quantiles), report
    per-key clipped counts and the post-clip mean. De-skewed two-pass
    plan (VERDICT r3 #4): exact per-key QUANTILE_CONT via the streaming
    keyed rank machinery (stratified.py:keyed_quantile_cont — no whole
    key ever occupies one block), then a STATELESS clip+aggregate pass
    with the tiny (key -> lo, hi) table broadcast in the partial fn.
    SQL replays with QUANTILE_CONT and identical clip expressions."""
    from ..stages.exchange import driver_combine
    from ..stages.stratified import keyed_quantile_cont
    from ..util import stable_round6

    ds = _events(sf_dir, ["event_type", "value"])
    qdf = keyed_quantile_cont(ds, "event_type", "value", [0.05, 0.95])
    piv = qdf.pivot(index="event_type", columns="q", values="value").sort_index()
    keys_sorted = piv.index.to_numpy()
    lo_arr = piv[0.05].to_numpy(dtype=np.float64)
    hi_arr = piv[0.95].to_numpy(dtype=np.float64)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy(dtype=np.float64, na_value=np.nan)
        ok = np.isfinite(v)
        if not ok.any():
            return pd.DataFrame({"event_type": [], "n": [], "n_clipped_low": [],
                                 "n_clipped_high": [], "s": []})
        karr, v = df["event_type"].to_numpy()[ok], v[ok]
        ki = np.searchsorted(keys_sorted, karr)
        lo, hi = lo_arr[ki], hi_arr[ki]
        g = pd.DataFrame({
            "event_type": karr,
            "n": np.int64(1),
            "n_clipped_low": (v < lo).astype(np.int64),
            "n_clipped_high": (v > hi).astype(np.int64),
            "s": np.clip(v, lo, hi),
        })
        return g.groupby("event_type", as_index=False, sort=False).sum()

    agg = driver_combine(
        ds, partial,
        lambda df: df.groupby("event_type", as_index=False).sum(),
        batch_format="pandas",
    ).set_index("event_type").reindex(keys_sorted)
    out = pd.DataFrame({
        "event_type": keys_sorted,
        "n": agg["n"].to_numpy(dtype=np.int64),
        "n_clipped_low": agg["n_clipped_low"].to_numpy(dtype=np.int64),
        "n_clipped_high": agg["n_clipped_high"].to_numpy(dtype=np.int64),
        "p05": lo_arr, "p95": hi_arr,
        "mean_winsorized": agg["s"].to_numpy() / agg["n"].to_numpy(),
    })
    for c in ("p05", "p95", "mean_winsorized"):
        out[c] = stable_round6(out[c].astype(float))
    for c in ("n", "n_clipped_low", "n_clipped_high"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


_SQL_WINSORIZE = """
WITH q AS (
  SELECT event_type, COUNT(value) AS n,
         QUANTILE_CONT(value, 0.05) AS lo, QUANTILE_CONT(value, 0.95) AS hi
  FROM events GROUP BY 1
)
SELECT e.event_type, q.n,
       CAST(SUM(CASE WHEN e.value < q.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
       CAST(SUM(CASE WHEN e.value > q.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
       ROUND(ROUND(q.lo, 9), 6) AS p05,
       ROUND(ROUND(q.hi, 9), 6) AS p95,
       ROUND(ROUND(SUM(LEAST(GREATEST(e.value, q.lo), q.hi)) / COUNT(e.value), 9), 6)
         AS mean_winsorized
FROM events e JOIN q ON q.event_type = e.event_type
WHERE e.value IS NOT NULL
GROUP BY 1, 2, q.lo, q.hi ORDER BY 1
"""


def q_cusum_drift(sf_dir: str):
    """One-sided CUSUM drift detection over the hourly means (Page
    1954 — the pipeline-monitoring counterpart of detect_timestamp
    _shifts): S_t = max(0, S_{t-1} + (x_t - mu0 - slack)). The
    recursion has the closed form S_t = P_t - min_{j<=t} P_j over the
    prefix sums P_t = sum(x_i - mu0 - slack), which is what both the
    vectorized engine kernel (np.minimum.accumulate) and the SQL
    oracle (running MIN window) compute — an EXACT oracle for a
    'sequential' algorithm. mu0 = the key's own first-week mean;
    slack = 0.5; alarm at S_t > 25. Per-key: ONE exchange."""
    from ..stages.exchange import grouped_block_map
    from ..util import stable_round6

    t1h = _fused_tier(sf_dir, "1h")

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket_ts", kind="stable")
        x = g["mean"].astype(float).to_numpy()
        ts = pd.to_datetime(g["bucket_ts"]).astype("datetime64[us]")
        t0_us = ts.astype(np.int64).iloc[0]
        week = ts.astype(np.int64) < t0_us + 7 * US_PER_DAY
        mu0 = x[week.to_numpy()].mean()
        d = x - mu0 - 0.5
        prefix = np.cumsum(d)
        run_min = np.minimum(np.minimum.accumulate(prefix), 0.0)
        s = prefix - run_min
        return pd.DataFrame({
            "event_type": g["event_type"].iloc[0],
            "bucket_ts": ts,
            "cusum": s,
            "alarm": (s > 25.0).astype(np.int64),
        })

    out = grouped_block_map(t1h, ["event_type"], fn).to_pandas()
    out["cusum"] = stable_round6(out["cusum"].astype(float))
    out["alarm"] = out["alarm"].astype("int64")
    return out.sort_values(["event_type", "bucket_ts"]).reset_index(drop=True)


def q_page_hinkley(sf_dir: str):
    """Page-Hinkley drift test over the hourly means (Page 1954 §5 —
    the running-mean variant used by streaming-ML monitors): with
    running mean xbar_t of x_1..x_t, m_t = sum_{i<=t}(x_i - xbar_i -
    delta), PH_t = m_t - min_{j<=t} m_j, alarm at PH_t > lambda.
    Everything is prefix arithmetic (cumsum / running mean / running
    min), so the 'sequential' detector has an EXACT windowed-SQL
    oracle — the cusum_drift idiom. delta = 0.1, lambda = 15.
    Per-key: ONE exchange."""
    from ..stages.exchange import grouped_block_map

    t1h = _fused_tier(sf_dir, "1h")

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket_ts", kind="stable")
        x = g["mean"].astype(float).to_numpy()
        ts = pd.to_datetime(g["bucket_ts"]).astype("datetime64[us]")
        n = len(x)
        xbar = np.cumsum(x) / np.arange(1, n + 1)
        m = np.cumsum(x - xbar - 0.1)
        ph = m - np.minimum.accumulate(m)
        return pd.DataFrame({
            "event_type": g["event_type"].iloc[0],
            "bucket_ts": ts,
            "ph": ph,
            "alarm": (ph > 15.0).astype(np.int64),
        })

    out = grouped_block_map(t1h, ["event_type"], fn).to_pandas()
    out["ph"] = stable_round6(out["ph"].astype(float))
    out["alarm"] = out["alarm"].astype("int64")
    return out.sort_values(["event_type", "bucket_ts"]).reset_index(drop=True)


_SQL_PAGE_HINKLEY = """
WITH h AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bucket_ts,
         SUM(value) / COUNT(value) AS mean
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
), t AS (
  SELECT event_type, bucket_ts,
         mean - AVG(mean) OVER w - 0.1 AS term
  FROM h
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), m AS (
  SELECT event_type, bucket_ts,
         SUM(term) OVER w AS m
  FROM t
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), p AS (
  SELECT event_type, bucket_ts,
         m - MIN(m) OVER w AS ph
  FROM m
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type, bucket_ts,
       ROUND(ROUND(ph, 9), 6) AS ph,
       CAST(ph > 15.0 AS BIGINT) AS alarm
FROM p ORDER BY event_type, bucket_ts
"""


_SQL_CUSUM = """
WITH h AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bucket_ts,
         SUM(value) / COUNT(value) AS mean
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
), m AS (
  SELECT event_type, MIN(bucket_ts) AS t0 FROM h GROUP BY 1
), mu AS (
  SELECT h.event_type, AVG(h.mean) AS mu0
  FROM h JOIN m ON m.event_type = h.event_type
  WHERE epoch_us(h.bucket_ts) < epoch_us(m.t0) + 7 * 86400000000
  GROUP BY 1
), pre AS (
  SELECT h.event_type, h.bucket_ts,
         SUM(h.mean - mu.mu0 - 0.5) OVER (PARTITION BY h.event_type
                                          ORDER BY h.bucket_ts) AS prefix
  FROM h JOIN mu ON mu.event_type = h.event_type
), p AS (
  SELECT event_type, bucket_ts, prefix,
         MIN(prefix) OVER (PARTITION BY event_type ORDER BY bucket_ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run_min
  FROM pre
)
SELECT event_type, bucket_ts,
       ROUND(ROUND(prefix - LEAST(run_min, 0.0), 9), 6) AS cusum,
       CAST(CASE WHEN prefix - LEAST(run_min, 0.0) > 25.0 THEN 1 ELSE 0 END
            AS BIGINT) AS alarm
FROM p ORDER BY event_type, bucket_ts
"""


_EWMA_LAM = 0.2  # chart smoothing constant (Roberts' classic choice)


def q_ewma_chart(sf_dir: str):
    """EWMA control chart (Roberts 1959; Lucas & Saccucci 1990 limits)
    over the 6dp-rounded hourly means, reset per (event_type, month):
    z_t = lam*x_t + (1-lam)*z_{t-1}, z_0 = the month's own mean mu0;
    UCL/LCL = mu0 +/- 3*sigma*sqrt(lam/(2-lam)*(1-(1-lam)^(2t))).
    The recursion has the scaled-prefix closed form
    z_t = lam*(1-lam)^t * cumsum(x_i*(1-lam)^(-i)) + (1-lam)^t*mu0 —
    the monthly reset bounds the exponent (t <= 744) so the scaling
    stays inside float64 and the 'sequential' chart gets an EXACT
    windowed-SQL oracle (the cusum_drift idiom). Per-key: ONE
    exchange; state is bounded by the tier (hours), not the corpus."""
    from ..stages.exchange import grouped_block_map
    from ..util import stable_round6

    lam = _EWMA_LAM
    t1h = _fused_tier(sf_dir, "1h")

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket_ts", kind="stable")
        ts = pd.to_datetime(g["bucket_ts"]).astype("datetime64[us]")
        x = np.asarray(stable_round6(g["mean"].astype(float)), dtype=np.float64)
        month = ts.dt.to_period("M").to_numpy()
        parts = []
        for mo in pd.unique(month):
            sel = month == mo
            xm, tm = x[sel], ts[sel]
            n = len(xm)
            # identical expression order to the SQL oracle
            mu0 = xm.sum() / n
            sigma = np.sqrt(np.maximum((xm * xm).sum() / n - mu0 * mu0, 0.0))
            rn = np.arange(1, n + 1, dtype=float)
            s = np.cumsum(xm * np.power(1.0 - lam, -rn))
            z = lam * np.power(1.0 - lam, rn) * s + np.power(1.0 - lam, rn) * mu0
            half = 3.0 * sigma * np.sqrt(
                lam / (2.0 - lam) * (1.0 - np.power(1.0 - lam, 2.0 * rn))
            )
            parts.append(pd.DataFrame({
                "event_type": g["event_type"].iloc[0],
                "bucket_ts": tm.to_numpy(),
                "ewma": z,
                "ucl": mu0 + half,
                "lcl": mu0 - half,
                "alarm": ((z > mu0 + half) | (z < mu0 - half)).astype(np.int64),
            }))
        return pd.concat(parts, ignore_index=True)

    out = grouped_block_map(t1h, ["event_type"], fn).to_pandas()
    for c in ("ewma", "ucl", "lcl"):
        out[c] = stable_round6(out[c].astype(float))
    out["alarm"] = out["alarm"].astype("int64")
    return out.sort_values(["event_type", "bucket_ts"]).reset_index(drop=True)


_SQL_EWMA = """
WITH h AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bucket_ts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
), k AS (
  SELECT event_type, bucket_ts, m,
         date_trunc('month', bucket_ts) AS mo,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type,
                                 date_trunc('month', bucket_ts)
                                 ORDER BY bucket_ts) AS DOUBLE) AS rn
  FROM h
), st AS (
  SELECT event_type, bucket_ts, m, mo, rn,
         SUM(m) OVER w / COUNT(m) OVER w AS mu0,
         SQRT(GREATEST(SUM(m * m) OVER w / COUNT(m) OVER w
                       - (SUM(m) OVER w / COUNT(m) OVER w)
                         * (SUM(m) OVER w / COUNT(m) OVER w), 0.0)) AS sigma,
         SUM(m * POWER(0.8, -rn)) OVER (PARTITION BY event_type, mo
                                        ORDER BY bucket_ts) AS s
  FROM k
  WINDOW w AS (PARTITION BY event_type, mo)
), z AS (
  SELECT event_type, bucket_ts,
         0.2 * POWER(0.8, rn) * s + POWER(0.8, rn) * mu0 AS ewma,
         mu0,
         3.0 * sigma * SQRT(0.2 / 1.8 * (1.0 - POWER(0.8, 2.0 * rn))) AS half
  FROM st
)
SELECT event_type, bucket_ts,
       ROUND(ROUND(ewma, 9), 6) AS ewma,
       ROUND(ROUND(mu0 + half, 9), 6) AS ucl,
       ROUND(ROUND(mu0 - half, 9), 6) AS lcl,
       CAST(CASE WHEN ewma > mu0 + half OR ewma < mu0 - half
            THEN 1 ELSE 0 END AS BIGINT) AS alarm
FROM z ORDER BY event_type, bucket_ts
"""


def q_dickey_fuller(sf_dir: str):
    """Dickey-Fuller unit-root test (Dickey & Fuller 1979, constant,
    no lag terms): OLS of dx_t = a + b*x_{t-1} on the 6dp-rounded
    hourly means per event_type; t-statistic on b against MacKinnon's
    large-n 5%% constant-case critical value (-2.86). The 2-regressor
    OLS is closed-form in raw moments (Sxx/Sxy/Syy with explicit
    n*mean*mean centering), so the SQL oracle shares the exact
    expression order. Per-key moments are decomposable; ONE exchange."""
    from ..stages.exchange import grouped_block_map
    from ..util import stable_round6

    t1h = _fused_tier(sf_dir, "1h")

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket_ts", kind="stable")
        m = np.asarray(stable_round6(g["mean"].astype(float)), dtype=np.float64)
        xl, d = m[:-1], np.diff(m)
        n = float(len(xl))
        mx, my = xl.sum() / n, d.sum() / n
        sxx = (xl * xl).sum() - n * mx * mx
        sxy = (xl * d).sum() - n * mx * my
        syy = (d * d).sum() - n * my * my
        b = sxy / sxx
        ssr = syy - b * sxy
        tstat = b / np.sqrt(ssr / (n - 2.0) / sxx)
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n_obs": [np.int64(n)],
            "beta": [b],
            "tstat": [tstat],
            "stationary": [np.int64(1 if tstat < -2.86 else 0)],
        })

    out = grouped_block_map(t1h, ["event_type"], fn).to_pandas()
    out["beta"] = stable_round6(out["beta"].astype(float))
    out["tstat"] = stable_round6(out["tstat"].astype(float))
    out["n_obs"] = out["n_obs"].astype("int64")
    out["stationary"] = out["stationary"].astype("int64")
    return out.sort_values(["event_type"]).reset_index(drop=True)


_SQL_DICKEY_FULLER = """
WITH h AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bucket_ts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
), p AS (
  SELECT event_type,
         LAG(m) OVER (PARTITION BY event_type ORDER BY bucket_ts) AS xl,
         m - LAG(m) OVER (PARTITION BY event_type ORDER BY bucket_ts) AS d
  FROM h
), s AS (
  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(xl) / COUNT(*) AS mx, SUM(d) / COUNT(*) AS my,
         SUM(xl * xl) AS rxx, SUM(xl * d) AS rxy, SUM(d * d) AS ryy
  FROM p WHERE xl IS NOT NULL GROUP BY 1
), o AS (
  SELECT event_type, n,
         (rxy - n * mx * my) / (rxx - n * mx * mx) AS b,
         (ryy - n * my * my)
           - (rxy - n * mx * my) / (rxx - n * mx * mx)
             * (rxy - n * mx * my) AS ssr,
         rxx - n * mx * mx AS sxx
  FROM s
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_obs,
       ROUND(ROUND(b, 9), 6) AS beta,
       ROUND(ROUND(b / SQRT(ssr / (n - 2.0) / sxx), 9), 6) AS tstat,
       CAST(CASE WHEN b / SQRT(ssr / (n - 2.0) / sxx) < -2.86
            THEN 1 ELSE 0 END AS BIGINT) AS stationary
FROM o ORDER BY event_type
"""


def q_stability_lumpiness(sf_dir: str):
    """Tiled-window stability / lumpiness features (Hyndman, Wang &
    Laptev 2015 'Large-scale unusual time series detection' — the
    tsfeatures battery): tile the hourly means by calendar day, then
    stability = population variance of the tile means and lumpiness =
    population variance of the tile variances. Tile stats are rounded
    to 6dp on both sides before the outer variance so the nested
    moments stay bit-comparable. Raw-moment form (SUM(x*x)/n - mean^2)
    shared verbatim with the SQL. Decomposable; ONE exchange."""
    from ..stages.exchange import grouped_block_map
    from ..util import stable_round6

    t1h = _fused_tier(sf_dir, "1h")

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket_ts", kind="stable")
        m = stable_round6(g["mean"].astype(float))
        day = pd.to_datetime(g["bucket_ts"]).dt.floor("D")
        gg = pd.DataFrame({"day": day.to_numpy(), "m": np.asarray(m, dtype=np.float64)})
        agg = gg.groupby("day", sort=True)["m"].agg(
            n="count", s="sum", ss=lambda v: (v * v).sum()
        )
        dm = stable_round6(agg["s"] / agg["n"])
        dv = stable_round6(agg["ss"] / agg["n"] - (agg["s"] / agg["n"]) ** 2)
        nd = float(len(agg))
        stability = (dm * dm).sum() / nd - (dm.sum() / nd) ** 2
        lumpiness = (dv * dv).sum() / nd - (dv.sum() / nd) ** 2
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n_days": [np.int64(nd)],
            "stability": [stability],
            "lumpiness": [lumpiness],
        })

    out = grouped_block_map(t1h, ["event_type"], fn).to_pandas()
    out["stability"] = stable_round6(out["stability"].astype(float))
    out["lumpiness"] = stable_round6(out["lumpiness"].astype(float))
    out["n_days"] = out["n_days"].astype("int64")
    return out.sort_values(["event_type"]).reset_index(drop=True)


_SQL_STABILITY = """
WITH h AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bucket_ts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
), d AS (
  SELECT event_type, date_trunc('day', bucket_ts) AS day,
         ROUND(ROUND(SUM(m) / COUNT(*), 9), 6) AS dm,
         ROUND(ROUND(SUM(m * m) / COUNT(*)
               - (SUM(m) / COUNT(*)) * (SUM(m) / COUNT(*)), 9), 6) AS dv
  FROM h GROUP BY 1, 2
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(ROUND(SUM(dm * dm) / COUNT(*)
             - (SUM(dm) / COUNT(*)) * (SUM(dm) / COUNT(*)), 9), 6) AS stability,
       ROUND(ROUND(SUM(dv * dv) / COUNT(*)
             - (SUM(dv) / COUNT(*)) * (SUM(dv) / COUNT(*)), 9), 6) AS lumpiness
FROM d GROUP BY event_type ORDER BY event_type
"""


_KPSS_MAX_LAG = 12  # Bartlett weights vanish past L; 12 covers L at any sf


def q_kpss(sf_dir: str):
    """KPSS level-stationarity test (Kwiatkowski, Phillips, Schmidt &
    Shin 1992) on the 6dp hourly means per event_type: e_t = x_t - xbar,
    S_t = cumsum(e), eta = (sum S_t^2 / n^2) / s2_lr with the
    Newey-West long-run variance s2_lr = g0 + 2*sum_l w_l*g_l,
    Bartlett w_l = max(0, 1 - l/(L+1)), L = floor(4*(n/100)^0.25)
    (the classic 'lags short' rule). Computing weights as
    GREATEST(0, .) over a FIXED lag grid 1..12 makes the
    data-dependent truncation exactly SQL-replayable. 5%% level
    critical value 0.463. Per-key state = the hourly tier, bounded by
    the time range, not the corpus; ONE exchange."""
    from ..stages.exchange import grouped_block_map

    t1h = _fused_tier(sf_dir, "1h")
    maxlag = _KPSS_MAX_LAG

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket_ts", kind="stable")
        x = np.asarray(stable_round6(g["mean"].astype(float)), dtype=np.float64)
        n = float(len(x))
        e = x - x.sum() / n
        s = np.cumsum(e)
        num = (s * s).sum() / (n * n)
        big_l = np.floor(4.0 * np.power(n / 100.0, 0.25))
        sig2 = (e * e).sum() / n
        for lag in range(1, maxlag + 1):
            w = max(0.0, 1.0 - lag / (big_l + 1.0))
            if len(e) > lag:
                sig2 += 2.0 * w * ((e[lag:] * e[:-lag]).sum() / n)
        eta = num / sig2
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n_obs": [np.int64(n)],
            "eta": [eta],
            "sigma2_lr": [sig2],
            "stationary": [np.int64(1 if eta < 0.463 else 0)],
        })

    out = grouped_block_map(t1h, ["event_type"], fn).to_pandas()
    out["eta"] = stable_round6(out["eta"].astype(float))
    out["sigma2_lr"] = stable_round6(out["sigma2_lr"].astype(float))
    out["n_obs"] = out["n_obs"].astype("int64")
    out["stationary"] = out["stationary"].astype("int64")
    return out.sort_values(["event_type"]).reset_index(drop=True)


_SQL_KPSS = """
WITH h AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bucket_ts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
), k AS (
  SELECT event_type, bucket_ts,
         m - SUM(m) OVER (PARTITION BY event_type)
             / COUNT(m) OVER (PARTITION BY event_type) AS e
  FROM h
), cs AS (
  SELECT event_type, e,
         SUM(e) OVER (PARTITION BY event_type ORDER BY bucket_ts
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
         LAG(e, 1)  OVER w AS e1,  LAG(e, 2)  OVER w AS e2,
         LAG(e, 3)  OVER w AS e3,  LAG(e, 4)  OVER w AS e4,
         LAG(e, 5)  OVER w AS e5,  LAG(e, 6)  OVER w AS e6,
         LAG(e, 7)  OVER w AS e7,  LAG(e, 8)  OVER w AS e8,
         LAG(e, 9)  OVER w AS e9,  LAG(e, 10) OVER w AS e10,
         LAG(e, 11) OVER w AS e11, LAG(e, 12) OVER w AS e12
  FROM k
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts)
), agg AS (
  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(s * s) AS sss, SUM(e * e) AS g0,
         SUM(e * e1) AS c1,  SUM(e * e2) AS c2,  SUM(e * e3) AS c3,
         SUM(e * e4) AS c4,  SUM(e * e5) AS c5,  SUM(e * e6) AS c6,
         SUM(e * e7) AS c7,  SUM(e * e8) AS c8,  SUM(e * e9) AS c9,
         SUM(e * e10) AS c10, SUM(e * e11) AS c11, SUM(e * e12) AS c12
  FROM cs GROUP BY 1
), lv AS (
  SELECT event_type, n, sss,
         FLOOR(4.0 * POWER(n / 100.0, 0.25)) AS bl
  FROM agg
), sg AS (
  SELECT a.event_type, a.n, a.sss,
         a.g0 / a.n
         + 2.0 * GREATEST(0.0, 1.0 - 1.0  / (l.bl + 1.0)) * (COALESCE(a.c1, 0) / a.n)
         + 2.0 * GREATEST(0.0, 1.0 - 2.0  / (l.bl + 1.0)) * (COALESCE(a.c2, 0) / a.n)
         + 2.0 * GREATEST(0.0, 1.0 - 3.0  / (l.bl + 1.0)) * (COALESCE(a.c3, 0) / a.n)
         + 2.0 * GREATEST(0.0, 1.0 - 4.0  / (l.bl + 1.0)) * (COALESCE(a.c4, 0) / a.n)
         + 2.0 * GREATEST(0.0, 1.0 - 5.0  / (l.bl + 1.0)) * (COALESCE(a.c5, 0) / a.n)
         + 2.0 * GREATEST(0.0, 1.0 - 6.0  / (l.bl + 1.0)) * (COALESCE(a.c6, 0) / a.n)
         + 2.0 * GREATEST(0.0, 1.0 - 7.0  / (l.bl + 1.0)) * (COALESCE(a.c7, 0) / a.n)
         + 2.0 * GREATEST(0.0, 1.0 - 8.0  / (l.bl + 1.0)) * (COALESCE(a.c8, 0) / a.n)
         + 2.0 * GREATEST(0.0, 1.0 - 9.0  / (l.bl + 1.0)) * (COALESCE(a.c9, 0) / a.n)
         + 2.0 * GREATEST(0.0, 1.0 - 10.0 / (l.bl + 1.0)) * (COALESCE(a.c10, 0) / a.n)
         + 2.0 * GREATEST(0.0, 1.0 - 11.0 / (l.bl + 1.0)) * (COALESCE(a.c11, 0) / a.n)
         + 2.0 * GREATEST(0.0, 1.0 - 12.0 / (l.bl + 1.0)) * (COALESCE(a.c12, 0) / a.n)
           AS sig2
  FROM agg a JOIN lv l USING (event_type)
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_obs,
       ROUND(ROUND((sss / (n * n)) / sig2, 9), 6) AS eta,
       ROUND(ROUND(sig2, 9), 6) AS sigma2_lr,
       CAST(CASE WHEN (sss / (n * n)) / sig2 < 0.463
            THEN 1 ELSE 0 END AS BIGINT) AS stationary
FROM sg ORDER BY event_type
"""


_VR_Q = 4  # aggregation horizon of the variance-ratio test


def q_variance_ratio(sf_dir: str):
    """Lo-MacKinlay variance-ratio test (Lo & MacKinlay 1988, q=4,
    overlapping differences with the unbiased m-normalization) on the
    6dp hourly means per event_type: mu = (x_T - x_0)/T,
    s1 = sum(x_t - x_{t-1} - mu)^2 / (T-1),
    sq = sum(x_t - x_{t-q} - q*mu)^2 / m, m = q*(T-q+1)*(1 - q/T),
    VR = sq/s1, homoskedastic z = (VR-1)*sqrt(T / (2*(2q-1)*(q-1)/(3q))).
    All prefix/LAG arithmetic — exact SQL replay. Per-key state is the
    bounded hourly tier; ONE exchange."""
    from ..stages.exchange import grouped_block_map

    q = _VR_Q
    t1h = _fused_tier(sf_dir, "1h")

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket_ts", kind="stable")
        x = np.asarray(stable_round6(g["mean"].astype(float)), dtype=np.float64)
        t = float(len(x) - 1)
        mu = (x[-1] - x[0]) / t
        d1 = np.diff(x) - mu
        dq = x[q:] - x[:-q] - q * mu
        s1 = (d1 * d1).sum() / (t - 1.0)
        m = q * (t - q + 1.0) * (1.0 - q / t)
        sq = (dq * dq).sum() / m
        vr = sq / s1
        z = (vr - 1.0) * np.sqrt(t / (2.0 * (2.0 * q - 1.0) * (q - 1.0) / (3.0 * q)))
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n_obs": [np.int64(t + 1.0)],
            "vr": [vr],
            "zstat": [z],
        })

    out = grouped_block_map(t1h, ["event_type"], fn).to_pandas()
    out["vr"] = stable_round6(out["vr"].astype(float))
    out["zstat"] = stable_round6(out["zstat"].astype(float))
    out["n_obs"] = out["n_obs"].astype("int64")
    return out.sort_values(["event_type"]).reset_index(drop=True)


_SQL_VARIANCE_RATIO = """
WITH h AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bucket_ts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
), b AS (
  SELECT event_type, bucket_ts, m,
         (LAST_VALUE(m) OVER wf - FIRST_VALUE(m) OVER wf)
           / (COUNT(m) OVER (PARTITION BY event_type) - 1.0) AS mu,
         LAG(m, 1) OVER wo AS m1,
         LAG(m, 4) OVER wo AS m4
  FROM h
  WINDOW wo AS (PARTITION BY event_type ORDER BY bucket_ts),
         wf AS (PARTITION BY event_type ORDER BY bucket_ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
), s AS (
  SELECT event_type,
         CAST(COUNT(*) - 1 AS DOUBLE) AS t,
         SUM((m - m1 - mu) * (m - m1 - mu)) AS r1,
         SUM((m - m4 - 4.0 * mu) * (m - m4 - 4.0 * mu)) AS r4
  FROM b GROUP BY 1
), v AS (
  SELECT event_type, t,
         (r4 / (4.0 * (t - 4.0 + 1.0) * (1.0 - 4.0 / t)))
           / (r1 / (t - 1.0)) AS vr
  FROM s
)
SELECT event_type,
       CAST(t + 1.0 AS BIGINT) AS n_obs,
       ROUND(ROUND(vr, 9), 6) AS vr,
       ROUND(ROUND((vr - 1.0)
             * SQRT(t / (2.0 * (2.0 * 4.0 - 1.0) * (4.0 - 1.0) / (3.0 * 4.0))),
             9), 6) AS zstat
FROM v ORDER BY event_type
"""


_HILL_K = 100  # tail order statistics entering the Hill sum


def q_hill_tail(sf_dir: str):
    """Hill tail-index estimator (Hill 1975) per event_type over the
    positive raw event values: with the k+1 largest values
    v_(1) >= ... >= v_(k+1), gamma = (1/k) * sum_{i<=k} ln(v_(i) /
    v_(k+1)) and alpha = 1/gamma. The top-(k+1) VALUE multiset is
    unique under ties, so the estimator is deterministic. Distributed
    as per-block per-key partial top-(k+1) (np.partition) + a slim
    driver combine — raw values never shuffle; scale-correct at any
    corpus size. k = 100."""
    k = _HILL_K
    ds = _events(sf_dir, ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["value"] > 0]
        rows = []
        for et, grp in df.groupby("event_type", sort=False):
            v = grp["value"].to_numpy(dtype=np.float64)
            if len(v) > k + 1:
                v = np.partition(v, len(v) - (k + 1))[-(k + 1):]
            rows.append(pd.DataFrame({"event_type": et, "value": v}))
        if not rows:
            return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                                 "value": pd.Series([], dtype=np.float64)})
        return pd.concat(rows, ignore_index=True)

    pooled = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out_rows = []
    for et, grp in pooled.groupby("event_type", sort=True):
        v = np.sort(grp["value"].to_numpy(dtype=np.float64))[::-1]
        if len(v) < k + 1:
            continue
        top = v[:k]
        thr = v[k]
        gamma = np.log(top / thr).sum() / k
        out_rows.append({
            "event_type": et,
            "k": np.int64(k),
            "threshold": thr,
            "gamma": gamma,
            "alpha": 1.0 / gamma,
        })
    out = pd.DataFrame(out_rows)
    out["threshold"] = stable_round6(out["threshold"].astype(float))
    out["gamma"] = stable_round6(out["gamma"].astype(float))
    out["alpha"] = stable_round6(out["alpha"].astype(float))
    out["k"] = out["k"].astype("int64")
    return out.sort_values(["event_type"]).reset_index(drop=True)


_SQL_HILL = """
WITH r AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value DESC) AS rn
  FROM events WHERE value > 0
), thr AS (
  SELECT event_type, value AS thr FROM r WHERE rn = 101
), g AS (
  SELECT r.event_type, thr.thr,
         SUM(LN(r.value / thr.thr)) / 100.0 AS gamma
  FROM r JOIN thr USING (event_type)
  WHERE r.rn <= 100
  GROUP BY 1, 2
)
SELECT event_type,
       CAST(100 AS BIGINT) AS k,
       ROUND(ROUND(thr, 9), 6) AS threshold,
       ROUND(ROUND(gamma, 9), 6) AS gamma,
       ROUND(ROUND(1.0 / gamma, 9), 6) AS alpha
FROM g ORDER BY event_type
"""


def q_spectral_entropy(sf_dir: str):
    """Spectral entropy over the Lomb-Scargle power grid (the
    tsfeatures 'entropy' analogue for uneven sampling): normalize the
    6dp-rounded powers at the 5 candidate periods to a distribution,
    H = -sum p*ln(p), normalized by ln(5); plus the peak period
    (highest power, smallest-period tie-break). Rounding the powers
    BEFORE the nonlinear entropy pins the trig ulp noise on both
    sides. Reuses the lomb_scargle sufficient-statistics pass —
    ONE bounded combine, no shuffle."""
    from ..stages.trend import lomb_scargle_power

    ds = _events(sf_dir, ["event_type", "ts", "value"])
    lomb = lomb_scargle_power(
        ds, keys=["event_type"], ts_col="ts", val_col="value", periods_s=list(_LS_PERIODS)
    )
    lomb["power"] = stable_round6(lomb["power"].astype(float))
    rows = []
    for et, grp in lomb.groupby("event_type", sort=True):
        pw = grp["power"].to_numpy(dtype=np.float64)
        per = grp["period_s"].to_numpy(dtype=np.int64)
        p = pw / pw.sum()
        ent = -(p[p > 0] * np.log(p[p > 0])).sum()
        order = np.lexsort((per, -pw))
        rows.append({
            "event_type": et,
            "n_periods": np.int64(len(pw)),
            "entropy": ent,
            "entropy_norm": ent / np.log(float(len(pw))),
            "peak_period_s": np.int64(per[order[0]]),
        })
    out = pd.DataFrame(rows)
    out["entropy"] = stable_round6(out["entropy"].astype(float))
    out["entropy_norm"] = stable_round6(out["entropy_norm"].astype(float))
    out["n_periods"] = out["n_periods"].astype("int64")
    out["peak_period_s"] = out["peak_period_s"].astype("int64")
    return out.sort_values(["event_type"]).reset_index(drop=True)


def q_savgol(sf_dir: str):
    """Savitzky-Golay smoothing (Savitzky & Golay 1964; window 7,
    quadratic) over the position-ordered 6dp hourly means per
    event_type, interior points only: the closed-form convolution
    weights (-2, 3, 6, 7, 6, 3, -2)/21 applied in a FIXED summation
    order shared with the SQL's LAG/LEAD expression, so the filter is
    bit-exact on both sides. Emits smooth + residual. Per-key state is
    the bounded hourly tier; ONE exchange."""
    from ..stages.exchange import grouped_block_map

    t1h = _fused_tier(sf_dir, "1h")

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket_ts", kind="stable")
        x = np.asarray(stable_round6(g["mean"].astype(float)), dtype=np.float64)
        ts = pd.to_datetime(g["bucket_ts"]).astype("datetime64[us]").to_numpy()
        n = len(x)
        if n < 7:
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=object),
                "bucket_ts": pd.Series([], dtype="datetime64[us]"),
                "smooth": pd.Series([], dtype=np.float64),
                "residual": pd.Series([], dtype=np.float64),
            })
        c = slice(3, n - 3)
        # identical term order to the SQL expression
        sm = (-2.0 * x[:-6] + 3.0 * x[1:-5] + 6.0 * x[2:-4] + 7.0 * x[3:-3]
              + 6.0 * x[4:-2] + 3.0 * x[5:-1] - 2.0 * x[6:]) / 21.0
        return pd.DataFrame({
            "event_type": g["event_type"].iloc[0],
            "bucket_ts": ts[c],
            "smooth": sm,
            "residual": x[c] - sm,
        })

    out = grouped_block_map(t1h, ["event_type"], fn).to_pandas()
    out["smooth"] = stable_round6(out["smooth"].astype(float))
    out["residual"] = stable_round6(out["residual"].astype(float))
    return out.sort_values(["event_type", "bucket_ts"]).reset_index(drop=True)


_SQL_SAVGOL = """
WITH h AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bucket_ts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
), k AS (
  SELECT event_type, bucket_ts,
         LAG(m, 3)  OVER w AS xm3, LAG(m, 2) OVER w AS xm2,
         LAG(m, 1)  OVER w AS xm1, m AS x0,
         LEAD(m, 1) OVER w AS xp1, LEAD(m, 2) OVER w AS xp2,
         LEAD(m, 3) OVER w AS xp3
  FROM h
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts)
), s AS (
  SELECT event_type, bucket_ts, x0,
         (-2.0 * xm3 + 3.0 * xm2 + 6.0 * xm1 + 7.0 * x0
          + 6.0 * xp1 + 3.0 * xp2 - 2.0 * xp3) / 21.0 AS sm
  FROM k
  WHERE xm3 IS NOT NULL AND xp3 IS NOT NULL
)
SELECT event_type, bucket_ts,
       ROUND(ROUND(sm, 9), 6) AS smooth,
       ROUND(ROUND(x0 - sm, 9), 6) AS residual
FROM s ORDER BY event_type, bucket_ts
"""


def _l_moment_frame(g: pd.DataFrame) -> pd.DataFrame:
    """Sample L-moments (Hosking 1990, unbiased PWM estimators) of the
    block-maxima column 'x' in g: b_r from ascending order statistics,
    lambda1..4, L-CV, L-skewness t3, L-kurtosis t4. Weighted sums are
    tie-safe (equal x contribute equally under any tie order)."""
    x = np.sort(g["x"].to_numpy(dtype=np.float64))
    n = float(len(x))
    j = np.arange(1, len(x) + 1, dtype=np.float64)
    b0 = x.sum() / n
    b1 = ((j - 1.0) / (n - 1.0) * x).sum() / n
    b2 = ((j - 1.0) * (j - 2.0) / ((n - 1.0) * (n - 2.0)) * x).sum() / n
    b3 = ((j - 1.0) * (j - 2.0) * (j - 3.0)
          / ((n - 1.0) * (n - 2.0) * (n - 3.0)) * x).sum() / n
    l1 = b0
    l2 = 2.0 * b1 - b0
    l3 = 6.0 * b2 - 6.0 * b1 + b0
    l4 = 20.0 * b3 - 30.0 * b2 + 12.0 * b1 - b0
    return pd.DataFrame({
        "event_type": [g["event_type"].iloc[0]],
        "n_blocks": [np.int64(n)],
        "lambda1": [l1], "lambda2": [l2],
        "lcv": [l2 / l1], "t3": [l3 / l2], "t4": [l4 / l2],
    })


def q_l_moments(sf_dir: str):
    """Sample L-moments of the daily block maxima per event_type
    (Hosking 1990 'L-moments: analysis and estimation'): order-
    statistic-weighted PWM sums — pure rank arithmetic, so the oracle
    replays them exactly with ROW_NUMBER windows. Daily maxima come
    from the distributed 1d tier (max is decomposable — no raw-row
    shuffle); the per-key L-moment reduce sees only ~days rows."""
    from ..stages.exchange import grouped_block_map

    t1d = _fused_tier(sf_dir, "1d")

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        return _l_moment_frame(g.rename(columns={"max": "x"}))

    out = grouped_block_map(t1d, ["event_type"], fn).to_pandas()
    for c in ("lambda1", "lambda2", "lcv", "t3", "t4"):
        out[c] = stable_round6(out[c].astype(float))
    out["n_blocks"] = out["n_blocks"].astype("int64")
    return out.sort_values(["event_type"]).reset_index(drop=True)


_SQL_L_MOMENTS = """
WITH d AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day' AS day,
         MAX(value) AS x
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
), r AS (
  SELECT event_type, x,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x)
              AS DOUBLE) AS j,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS DOUBLE) AS n
  FROM d
), b AS (
  SELECT event_type, ANY_VALUE(n) AS n,
         SUM(x) / ANY_VALUE(n) AS b0,
         SUM((j - 1.0) / (n - 1.0) * x) / ANY_VALUE(n) AS b1,
         SUM((j - 1.0) * (j - 2.0) / ((n - 1.0) * (n - 2.0)) * x)
           / ANY_VALUE(n) AS b2,
         SUM((j - 1.0) * (j - 2.0) * (j - 3.0)
             / ((n - 1.0) * (n - 2.0) * (n - 3.0)) * x)
           / ANY_VALUE(n) AS b3
  FROM r GROUP BY 1
), l AS (
  SELECT event_type, n, b0 AS l1, 2.0 * b1 - b0 AS l2,
         6.0 * b2 - 6.0 * b1 + b0 AS l3,
         20.0 * b3 - 30.0 * b2 + 12.0 * b1 - b0 AS l4
  FROM b
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_blocks,
       ROUND(ROUND(l1, 9), 6) AS lambda1,
       ROUND(ROUND(l2, 9), 6) AS lambda2,
       ROUND(ROUND(l2 / l1, 9), 6) AS lcv,
       ROUND(ROUND(l3 / l2, 9), 6) AS t3,
       ROUND(ROUND(l4 / l2, 9), 6) AS t4
FROM l ORDER BY event_type
"""


def q_gev_fit(sf_dir: str):
    """GEV fit to the daily block maxima per event_type via the
    Hosking, Wallis & Wood (1985) L-moment estimators: shape
    k = 7.8590c + 2.9554c^2 with c = 2/(3+t3) - ln2/ln3, scale
    sigma = lambda2*k / ((1-2^-k)*Gamma(1+k)), location
    mu = lambda1 - sigma*(1-Gamma(1+k))/k, plus the 100-block return
    level mu + sigma*(1-(-ln(1-1/100))^k)/k. k is 6dp-rounded BEFORE
    the transcendentals so both sides feed gamma/pow identical doubles
    (DuckDB tgamma vs CPython gamma agree to 1 ulp — measured; the
    stable_round6 on outputs absorbs it). Same distributed daily-max
    shape as l_moments."""
    import math

    from ..stages.exchange import grouped_block_map

    t1d = _fused_tier(sf_dir, "1d")

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        lm = _l_moment_frame(g.rename(columns={"max": "x"}))
        l1 = float(lm["lambda1"].iloc[0])
        l2 = float(lm["lambda2"].iloc[0])
        t3 = float(lm["t3"].iloc[0])
        c = 2.0 / (3.0 + t3) - np.log(2.0) / np.log(3.0)
        k = float(stable_round6(np.array([7.8590 * c + 2.9554 * c * c]))[0])
        gam = math.gamma(1.0 + k)
        sigma = l2 * k / ((1.0 - np.power(2.0, -k)) * gam)
        mu = l1 - sigma * (1.0 - gam) / k
        rl100 = mu + sigma * (1.0 - np.power(-np.log(1.0 - 1.0 / 100.0), k)) / k
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n_blocks": lm["n_blocks"],
            "shape_k": [k], "sigma": [sigma], "mu": [mu], "rl100": [rl100],
        })

    out = grouped_block_map(t1d, ["event_type"], fn).to_pandas()
    for c in ("shape_k", "sigma", "mu", "rl100"):
        out[c] = stable_round6(out[c].astype(float))
    out["n_blocks"] = out["n_blocks"].astype("int64")
    return out.sort_values(["event_type"]).reset_index(drop=True)


_SQL_GEV_FIT = """
WITH d AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day' AS day,
         MAX(value) AS x
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
), r AS (
  SELECT event_type, x,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x)
              AS DOUBLE) AS j,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS DOUBLE) AS n
  FROM d
), b AS (
  SELECT event_type, ANY_VALUE(n) AS n,
         SUM(x) / ANY_VALUE(n) AS b0,
         SUM((j - 1.0) / (n - 1.0) * x) / ANY_VALUE(n) AS b1,
         SUM((j - 1.0) * (j - 2.0) / ((n - 1.0) * (n - 2.0)) * x)
           / ANY_VALUE(n) AS b2
  FROM r GROUP BY 1
), l AS (
  SELECT event_type, n, b0 AS l1, 2.0 * b1 - b0 AS l2,
         (6.0 * b2 - 6.0 * b1 + b0) / (2.0 * b1 - b0) AS t3
  FROM b
), kk AS (
  SELECT event_type, n, l1, l2,
         ROUND(ROUND(7.8590 * (2.0 / (3.0 + t3) - LN(2.0) / LN(3.0))
               + 2.9554 * (2.0 / (3.0 + t3) - LN(2.0) / LN(3.0))
                        * (2.0 / (3.0 + t3) - LN(2.0) / LN(3.0)), 9), 6) AS k
  FROM l
), p AS (
  SELECT event_type, n, l1, k,
         l2 * k / ((1.0 - POWER(2.0, -k)) * gamma(1.0 + k)) AS sigma,
         gamma(1.0 + k) AS gam
  FROM kk
), q AS (
  SELECT event_type, n, k, sigma,
         l1 - sigma * (1.0 - gam) / k AS mu
  FROM p
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_blocks,
       ROUND(ROUND(k, 9), 6) AS shape_k,
       ROUND(ROUND(sigma, 9), 6) AS sigma,
       ROUND(ROUND(mu, 9), 6) AS mu,
       ROUND(ROUND(mu + sigma * (1.0 - POWER(-LN(1.0 - 1.0 / 100.0), k)) / k,
             9), 6) AS rl100
FROM q ORDER BY event_type
"""


def q_token_transition_entropy(sf_dir: str):
    """Token bigram transition entropy per event_type over the
    north-rule ``tokens`` arrays (Shannon 1948; the sequence-level
    redundancy probe): with global pair counts c over consecutive
    (cur, next) token pairs inside each doc, H_pair = ln(N) -
    sum(c*ln c)/N; same for the cur-position unigrams; conditional
    entropy H(next|cur) = H_pair - H_cur. Ray shape: per-batch partial
    pair/unigram counts (tokens never materialize beyond the batch),
    ONE keyed exchange each on the packed pair key / cur token, then a
    slim sum(c*ln c) combine — correct at any corpus size. Token
    arrays synthesized with the fixture formula identically in SQL."""
    from ..fixtures import KNUTH as _K, VOCAB as _V
    from ..stages.exchange import grouped_block_map

    ds = _events(sf_dir, ["event_id", "event_type"])

    def emit(t: pa.Table, pairs: bool) -> pd.DataFrame:
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        empty = pd.DataFrame({
            "event_type": pd.Series([], dtype=object),
            "key": pd.Series([], dtype=np.int64),
            "c": pd.Series([], dtype=np.int64),
        })
        if len(eid) == 0:
            return empty
        n_tok = (eid % 257 + 1).astype(np.int64)
        seed = (eid.astype(np.uint64) * np.uint64(1_000_003)) & np.uint64(0x7FFFFFFFFFFF)
        offsets = np.zeros(len(eid) + 1, dtype=np.int64)
        np.cumsum(n_tok, out=offsets[1:])
        total = int(offsets[-1])
        j = (np.arange(total, dtype=np.uint64)
             - np.repeat(offsets[:-1], n_tok).astype(np.uint64) + np.uint64(1))
        flat = ((np.repeat(seed, n_tok) + j * np.uint64(_K)) % np.uint64(_V)).astype(np.int64)
        jj = j.astype(np.int64)
        ntrep = np.repeat(n_tok, n_tok)
        starts = np.flatnonzero(jj <= ntrep - 1)   # cur positions
        if len(starts) == 0:
            return empty
        if pairs:
            key = flat[starts] * np.int64(_V) + flat[starts + 1]
        else:
            key = flat[starts]
        df = pd.DataFrame({
            "event_type": np.repeat(et, n_tok)[starts], "key": key,
        })
        out = df.groupby(["event_type", "key"], sort=False).size().reset_index(name="c")
        out["c"] = out["c"].astype(np.int64)
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        # block holds complete (type, key) groups: finalize counts,
        # emit per-type partial moments
        cc = g.groupby(["event_type", "key"], sort=False)["c"].sum()
        agg = cc.groupby(level=0).agg(
            n="sum", clnc=lambda v: (v * np.log(v.astype(np.float64))).sum(),
            d="count")
        return pd.DataFrame({
            "event_type": agg.index.to_numpy(dtype=object),
            "n": agg["n"].to_numpy(dtype=np.int64),
            "clnc": agg["clnc"].to_numpy(dtype=np.float64),
            "d": agg["d"].to_numpy(dtype=np.int64),
        })

    def moments(pairs: bool) -> pd.DataFrame:
        part = ds.map_batches(lambda t, p=pairs: emit(t, p), batch_format="pyarrow")
        red = grouped_block_map(part, ["event_type", "key"], combine).to_pandas()
        return red.groupby("event_type", sort=True).agg(
            n=("n", "sum"), clnc=("clnc", "sum"), d=("d", "sum")).reset_index()

    mp = moments(True)
    mu = moments(False)
    out = mp.merge(mu, on="event_type", suffixes=("_p", "_u"))
    n = out["n_p"].to_numpy(dtype=np.float64)
    h_pair = np.log(n) - out["clnc_p"].to_numpy() / n
    h_cur = np.log(n) - out["clnc_u"].to_numpy() / n
    res = pd.DataFrame({
        "event_type": out["event_type"],
        "n_pairs": out["n_p"].astype("int64"),
        "distinct_pairs": out["d_p"].astype("int64"),
        "pair_entropy": stable_round6(h_pair),
        "cur_entropy": stable_round6(h_cur),
        "cond_entropy": stable_round6(h_pair - h_cur),
    })
    return res.sort_values(["event_type"]).reset_index(drop=True)


_SQL_TOKEN_TRANSITION = """
WITH tok AS (
  SELECT event_id, event_type, (event_id % 257) + 1 AS n_tok,
         (event_id * 1000003) % 140737488355328 AS seed
  FROM events
), flat AS (
  SELECT event_id, event_type, n_tok, j,
         (seed + j * 2654435761) % 50257 AS token
  FROM tok, generate_series(1, 257) AS t(j)
  WHERE j <= n_tok
), pr AS (
  SELECT event_type,
         token * 50257 + LEAD(token, 1) OVER w AS pkey,
         token AS ckey, j, n_tok
  FROM flat
  WINDOW w AS (PARTITION BY event_id ORDER BY j)
), pc AS (
  SELECT event_type, pkey, COUNT(*)::DOUBLE AS c
  FROM pr WHERE j <= n_tok - 1 GROUP BY 1, 2
), uc AS (
  SELECT event_type, ckey, COUNT(*)::DOUBLE AS c
  FROM pr WHERE j <= n_tok - 1 GROUP BY 1, 2
), pm AS (
  SELECT event_type, SUM(c) AS n, SUM(c * LN(c)) AS clnc,
         COUNT(*)::BIGINT AS d
  FROM pc GROUP BY 1
), um AS (
  SELECT event_type, SUM(c) AS n, SUM(c * LN(c)) AS clnc
  FROM uc GROUP BY 1
)
SELECT pm.event_type,
       CAST(pm.n AS BIGINT) AS n_pairs,
       pm.d AS distinct_pairs,
       ROUND(ROUND(LN(pm.n) - pm.clnc / pm.n, 9), 6) AS pair_entropy,
       ROUND(ROUND(LN(um.n) - um.clnc / um.n, 9), 6) AS cur_entropy,
       ROUND(ROUND((LN(pm.n) - pm.clnc / pm.n)
             - (LN(um.n) - um.clnc / um.n), 9), 6) AS cond_entropy
FROM pm JOIN um USING (event_type)
ORDER BY event_type
"""


_SAX_BP = 0.6745  # ~Phi^-1(0.75): alphabet-4 Gaussian breakpoints (-bp, 0, bp)


def q_sax(sf_dir: str):
    """SAX symbolization (Lin, Keogh, Lonardi & Chiu 2003) of the
    hourly means per event_type: z-normalize the whole series
    (population SD, raw-moment form), PAA over position-based tiles of
    4 (complete tiles only), alphabet-4 symbols at the Gaussian
    breakpoints (-0.6745, 0, 0.6745). The PAA value is 6dp-rounded
    BEFORE the breakpoint CASE on both sides so boundary comparisons
    can't flip. Per-key state = the bounded hourly tier; ONE
    exchange."""
    from ..stages.exchange import grouped_block_map

    t1h = _fused_tier(sf_dir, "1h")
    bp = _SAX_BP

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket_ts", kind="stable")
        x = np.asarray(stable_round6(g["mean"].astype(float)), dtype=np.float64)
        n = float(len(x))
        mu = x.sum() / n
        sd = np.sqrt((x * x).sum() / n - mu * mu)
        z = (x - mu) / sd
        nt = (len(x) // 4) * 4
        if nt == 0:
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=object),
                "tile": pd.Series([], dtype=np.int64),
                "paa": pd.Series([], dtype=np.float64),
                "symbol": pd.Series([], dtype=object),
            })
        paa = z[:nt].reshape(-1, 4).sum(axis=1) / 4.0
        paa = np.asarray(stable_round6(paa), dtype=np.float64)
        sym = np.where(paa < -bp, "a",
                       np.where(paa < 0.0, "b",
                                np.where(paa < bp, "c", "d")))
        return pd.DataFrame({
            "event_type": g["event_type"].iloc[0],
            "tile": np.arange(len(paa), dtype=np.int64),
            "paa": paa,
            "symbol": sym.astype(object),
        })

    out = grouped_block_map(t1h, ["event_type"], fn).to_pandas()
    out["tile"] = out["tile"].astype("int64")
    return out.sort_values(["event_type", "tile"]).reset_index(drop=True)


_SQL_SAX = """
WITH h AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bucket_ts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
), z AS (
  SELECT event_type, bucket_ts,
         (m - SUM(m) OVER w / COUNT(m) OVER w)
           / SQRT(SUM(m * m) OVER w / COUNT(m) OVER w
                  - (SUM(m) OVER w / COUNT(m) OVER w)
                    * (SUM(m) OVER w / COUNT(m) OVER w)) AS zv,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bucket_ts) - 1
           AS pos,
         COUNT(*) OVER w AS n
  FROM h
  WINDOW w AS (PARTITION BY event_type)
), t AS (
  SELECT event_type, pos // 4 AS tile,
         ROUND(ROUND(SUM(zv) / 4.0, 9), 6) AS paa
  FROM z
  WHERE pos < (n // 4) * 4
  GROUP BY 1, 2
)
SELECT event_type, CAST(tile AS BIGINT) AS tile, paa,
       CASE WHEN paa < -0.6745 THEN 'a'
            WHEN paa < 0.0 THEN 'b'
            WHEN paa < 0.6745 THEN 'c'
            ELSE 'd' END AS symbol
FROM t ORDER BY event_type, tile
"""


def q_forecast_accuracy(sf_dir: str):
    """Seasonal-naive forecast accuracy battery (Hyndman & Koehler
    2006) per event_type on the 6dp hourly means: test = the last 48 h
    of each key's range, forecast yhat_t = y(t - 24h) where that
    calendar bucket exists (pairwise-complete, the acf convention);
    MAE / RMSE / sMAPE over the test pairs and MASE = test MAE divided
    by the in-sample seasonal-naive MAE over the train pairs. One
    calendar self-merge per key inside ONE exchange; the oracle is a
    LEFT self-join on bucket_ts - 24h."""
    from ..stages.exchange import grouped_block_map

    t1h = _fused_tier(sf_dir, "1h")

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket_ts", kind="stable")
        ts = pd.to_datetime(g["bucket_ts"])
        x = np.asarray(stable_round6(g["mean"].astype(float)), dtype=np.float64)
        f = pd.DataFrame({"ts": ts.to_numpy(), "y": x})
        lagged = f.rename(columns={"ts": "lts", "y": "yhat"})
        f = f.assign(lts=f["ts"] - pd.Timedelta(hours=24)).merge(
            lagged, on="lts", how="left")
        cutoff = f["ts"].max() - pd.Timedelta(hours=48)
        got = f[f["yhat"].notna()]
        test = got[got["ts"] > cutoff]
        train = got[got["ts"] <= cutoff]
        if len(test) == 0 or len(train) == 0:
            # mirrors the oracle's inner join: keys without both a
            # test and a train pair produce no row
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=object),
                "n_test": pd.Series([], dtype=np.int64),
                "mae": pd.Series([], dtype=np.float64),
                "rmse": pd.Series([], dtype=np.float64),
                "smape": pd.Series([], dtype=np.float64),
                "mase": pd.Series([], dtype=np.float64),
            })
        e = test["y"].to_numpy() - test["yhat"].to_numpy()
        ay, ah = np.abs(test["y"].to_numpy()), np.abs(test["yhat"].to_numpy())
        nt = float(len(e))
        mae = np.abs(e).sum() / nt
        rmse = np.sqrt((e * e).sum() / nt)
        smape = (2.0 * np.abs(e) / (ay + ah)).sum() / nt
        scale = np.abs(train["y"].to_numpy() - train["yhat"].to_numpy()).sum() / float(len(train))
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n_test": [np.int64(nt)],
            "mae": [mae], "rmse": [rmse], "smape": [smape],
            "mase": [mae / scale],
        })

    out = grouped_block_map(t1h, ["event_type"], fn).to_pandas()
    for c in ("mae", "rmse", "smape", "mase"):
        out[c] = stable_round6(out[c].astype(float))
    out["n_test"] = out["n_test"].astype("int64")
    return out.sort_values(["event_type"]).reset_index(drop=True)


_SQL_FORECAST_ACC = """
WITH h AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bucket_ts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
), j AS (
  SELECT a.event_type, a.bucket_ts, a.m AS y, b.m AS yhat,
         MAX(a.bucket_ts) OVER (PARTITION BY a.event_type)
           - INTERVAL '48 hours' AS cutoff
  FROM h a LEFT JOIN h b
    ON b.event_type = a.event_type
   AND b.bucket_ts = a.bucket_ts - INTERVAL '24 hours'
), te AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS nt,
         SUM(ABS(y - yhat)) AS sae,
         SUM((y - yhat) * (y - yhat)) AS sse,
         SUM(2.0 * ABS(y - yhat) / (ABS(y) + ABS(yhat))) AS ssm
  FROM j WHERE yhat IS NOT NULL AND bucket_ts > cutoff GROUP BY 1
), tr AS (
  SELECT event_type,
         SUM(ABS(y - yhat)) / CAST(COUNT(*) AS DOUBLE) AS scale
  FROM j WHERE yhat IS NOT NULL AND bucket_ts <= cutoff GROUP BY 1
)
SELECT te.event_type,
       CAST(te.nt AS BIGINT) AS n_test,
       ROUND(ROUND(te.sae / te.nt, 9), 6) AS mae,
       ROUND(ROUND(SQRT(te.sse / te.nt), 9), 6) AS rmse,
       ROUND(ROUND(te.ssm / te.nt, 9), 6) AS smape,
       ROUND(ROUND((te.sae / te.nt) / tr.scale, 9), 6) AS mase
FROM te JOIN tr USING (event_type)
ORDER BY event_type
"""


def q_matrix_profile(sf_dir: str):
    """Matrix profile (Yeh et al. 2016 'Matrix Profile I') of each
    event_type's hourly-mean series, window m = 24: per-window minimal
    z-normalized Euclidean distance to any non-trivially-overlapping
    window plus the nearest-neighbor index (stages/tsdist.py:
    matrix_profile — full vectorized QT matrix, right for the bounded
    hourly tier; ``matrix_profile_tiled`` is the implemented
    long-horizon path: O(tile^2) memory, optional parallel Ray tasks,
    equality pinned in tests/test_tsdist.py). The O(n^2) all-pairs
    min is not SQL-expressible at oracle cost -> rows-only; the
    kernel is brute-force-pinned in pytest."""
    from ..stages.exchange import grouped_block_map
    from ..stages.tsdist import matrix_profile

    t1h = _fused_tier(sf_dir, "1h")

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket_ts", kind="stable")
        x = np.asarray(stable_round6(g["mean"].astype(float)), dtype=np.float64)
        mp, nn = matrix_profile(x, m=24)
        return pd.DataFrame({
            "event_type": g["event_type"].iloc[0],
            "i": np.arange(len(mp), dtype=np.int64),
            "mp": mp,
            "nn": nn,
        })

    out = grouped_block_map(t1h, ["event_type"], fn).to_pandas()
    out["mp"] = stable_round6(out["mp"].astype(float))
    out["i"] = out["i"].astype("int64")
    out["nn"] = out["nn"].astype("int64")
    return out.sort_values(["event_type", "i"]).reset_index(drop=True)


def q_diel_dtw(sf_dir: str):
    """DTW distance matrix (Sakoe & Chiba 1978, band 6) between the
    24-point mean diel profiles of every event_type pair: profiles
    from one distributed hour-of-day aggregate (bounded 24 x |types|),
    the 24x24 DP on the driver. Iterative DP -> rows-only; the kernel
    is pinned against the literal recursion in pytest."""
    from ..stages.tsdist import dtw_distance

    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["hour"] = pd.to_datetime(t1h["bucket_ts"]).dt.hour
    prof = (t1h.groupby(["event_type", "hour"], sort=True)["mean"]
            .mean().unstack(level=1))
    types = sorted(prof.index)
    rows = []
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            d = dtw_distance(prof.loc[a].to_numpy(), prof.loc[b].to_numpy(), band=6)
            rows.append({"type_a": a, "type_b": b, "dtw": d})
    out = pd.DataFrame(rows)
    out["dtw"] = stable_round6(out["dtw"].astype(float))
    return out.sort_values(["type_a", "type_b"]).reset_index(drop=True)


_PR_DAMP = 0.85
_PR_ITERS = 20


def q_pagerank(sf_dir: str):
    """PageRank (Page, Brin, Motwani & Winograd 1999) over the
    first-order event-type transition graph: edge weights from the
    distributed per-user transition counts (stages/joins.py:
    event_transitions — one user_id exchange, bounded |types|^2
    combine), then 20 damped power iterations r(v) = (1-d)/N +
    d*sum_u r(u) w(u,v) on the driver's tiny matrix (dangling mass
    ignored, the common simplification — identical on both sides).
    Ranks are assigned on the 6dp-ROUNDED score (node tie-break) so
    ordering can't flip on a last-ulp. The oracle unrolls the same 20
    iterations as generated CTEs."""
    from ..stages.joins import event_transitions

    ds = _events(sf_dir, ["user_id", "event_type", "ts", "event_id"])
    edges = event_transitions(
        ds, key="user_id", ts="ts", event_col="event_type", order_col="event_id"
    )
    nodes = sorted(set(edges["prev_event"]) | set(edges["next_event"]))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    cnt = np.zeros((n, n), dtype=np.float64)
    for u, v, c in zip(edges["prev_event"], edges["next_event"], edges["n"]):
        cnt[idx[u], idx[v]] = float(c)
    w = cnt / cnt.sum(axis=1, keepdims=True)
    d = _PR_DAMP
    r = np.full(n, 1.0 / n)
    for _ in range(_PR_ITERS):
        r = (1.0 - d) / n + d * (r @ w)
    r6 = np.asarray(stable_round6(r), dtype=np.float64)
    order = np.lexsort((np.asarray(nodes, dtype=object), -r6))
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(1, n + 1)
    out = pd.DataFrame({"node": nodes, "pagerank": r6, "rank": rank})
    out["rank"] = out["rank"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def _pagerank_sql(damp: float = _PR_DAMP, iters: int = _PR_ITERS) -> str:
    head = """
WITH o AS MATERIALIZED (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_event
  FROM events
), ec AS MATERIALIZED (
  SELECT prev_event AS u, event_type AS v, COUNT(*)::DOUBLE AS n
  FROM o WHERE prev_event IS NOT NULL GROUP BY 1, 2
), w AS MATERIALIZED (
  SELECT u, v, n / SUM(n) OVER (PARTITION BY u) AS w FROM ec
), nodes AS MATERIALIZED (
  SELECT DISTINCT event_type AS node FROM events
), nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes)"""
    steps = []
    for k in range(1, iters + 1):
        steps.append(f""",
r{k} AS MATERIALIZED (
  SELECT n2.node,
         (1.0 - {damp}) / (SELECT n FROM nn)
         + {damp} * COALESCE(SUM(p.r * w.w), 0.0) AS r
  FROM nodes n2
  LEFT JOIN w ON w.v = n2.node
  LEFT JOIN r{k - 1} p ON p.node = w.u
  GROUP BY n2.node
)"""
                     )
    tail = f"""
SELECT node,
       ROUND(ROUND(r, 9), 6) AS pagerank,
       CAST(ROW_NUMBER() OVER (ORDER BY ROUND(ROUND(r, 9), 6) DESC, node)
            AS BIGINT) AS rank
FROM r{iters} ORDER BY node"""
    return head + "".join(steps) + tail


_SQL_PAGERANK = _pagerank_sql()


def q_conformal_interval(sf_dir: str):
    """Split-conformal prediction intervals (Vovk et al. 2005;
    Lei et al. 2018 §2) around the seasonal-naive forecast: per
    event_type, train = all but the last 48 h of calendar t-24h pairs,
    nonconformity = |y - yhat|, qhat = the ceil((n_train+1)*0.9)-th
    smallest score (clamped to n_train — the standard finite-sample
    quantile), intervals yhat ± qhat on the test pairs, empirical
    coverage reported. Exact order-statistic arithmetic — full SQL
    replay. Same ONE-exchange shape as forecast_accuracy."""
    from ..stages.exchange import grouped_block_map

    t1h = _fused_tier(sf_dir, "1h")

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket_ts", kind="stable")
        ts = pd.to_datetime(g["bucket_ts"])
        x = np.asarray(stable_round6(g["mean"].astype(float)), dtype=np.float64)
        f = pd.DataFrame({"ts": ts.to_numpy(), "y": x})
        lagged = f.rename(columns={"ts": "lts", "y": "yhat"})
        f = f.assign(lts=f["ts"] - pd.Timedelta(hours=24)).merge(
            lagged, on="lts", how="left")
        cutoff = f["ts"].max() - pd.Timedelta(hours=48)
        got = f[f["yhat"].notna()]
        test = got[got["ts"] > cutoff]
        train = got[got["ts"] <= cutoff]
        if len(test) == 0 or len(train) == 0:
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=object),
                "n_train": pd.Series([], dtype=np.int64),
                "n_test": pd.Series([], dtype=np.int64),
                "qhat": pd.Series([], dtype=np.float64),
                "coverage": pd.Series([], dtype=np.float64),
            })
        scores = np.sort(np.abs(train["y"].to_numpy() - train["yhat"].to_numpy()))
        k = min(int(np.ceil((len(scores) + 1) * 0.9)), len(scores))
        qhat = scores[k - 1]
        e = np.abs(test["y"].to_numpy() - test["yhat"].to_numpy())
        cov = (e <= qhat).sum() / float(len(e))
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n_train": [np.int64(len(scores))],
            "n_test": [np.int64(len(e))],
            "qhat": [qhat],
            "coverage": [cov],
        })

    out = grouped_block_map(t1h, ["event_type"], fn).to_pandas()
    out["qhat"] = stable_round6(out["qhat"].astype(float))
    out["coverage"] = stable_round6(out["coverage"].astype(float))
    out["n_train"] = out["n_train"].astype("int64")
    out["n_test"] = out["n_test"].astype("int64")
    return out.sort_values(["event_type"]).reset_index(drop=True)


_SQL_CONFORMAL = """
WITH h AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bucket_ts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
), j AS (
  SELECT a.event_type, a.bucket_ts, a.m AS y, b.m AS yhat,
         MAX(a.bucket_ts) OVER (PARTITION BY a.event_type)
           - INTERVAL '48 hours' AS cutoff
  FROM h a LEFT JOIN h b
    ON b.event_type = a.event_type
   AND b.bucket_ts = a.bucket_ts - INTERVAL '24 hours'
), tr AS (
  SELECT event_type, ABS(y - yhat) AS s,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ABS(y - yhat))
           AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM j WHERE yhat IS NOT NULL AND bucket_ts <= cutoff
), q AS (
  SELECT event_type, ANY_VALUE(n) AS n_train,
         MAX(CASE WHEN rn = LEAST(CAST(CEIL((n + 1) * 0.9) AS BIGINT), n)
             THEN s END) AS qhat
  FROM tr GROUP BY 1
), te AS (
  SELECT j.event_type,
         CAST(COUNT(*) AS DOUBLE) AS nt,
         SUM(CASE WHEN ABS(j.y - j.yhat) <= q.qhat THEN 1 ELSE 0 END)
           AS covered,
         ANY_VALUE(q.qhat) AS qhat, ANY_VALUE(q.n_train) AS n_train
  FROM j JOIN q USING (event_type)
  WHERE j.yhat IS NOT NULL AND j.bucket_ts > j.cutoff
  GROUP BY 1
)
SELECT event_type,
       CAST(n_train AS BIGINT) AS n_train,
       CAST(nt AS BIGINT) AS n_test,
       ROUND(ROUND(qhat, 9), 6) AS qhat,
       ROUND(ROUND(covered / nt, 9), 6) AS coverage
FROM te ORDER BY event_type
"""


def q_adwin_drift(sf_dir: str):
    """ADWIN adaptive-window drift detection (Bifet & Gavalda 2007,
    variance-based ADWIN2 bound) over the 6dp hourly means per
    event_type (stages/streamdetect.py:adwin_scan — the exact
    all-splits variant; the paper's exponential-histogram buckets are
    the documented log-state scale path). Sequential data-dependent
    window cuts aren't SQL-expressible -> rows-only; planted-shift and
    stationary-no-cut behavior pytest-pinned."""
    from ..stages.exchange import grouped_block_map
    from ..stages.streamdetect import adwin_scan

    t1h = _fused_tier(sf_dir, "1h")

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket_ts", kind="stable")
        x = np.asarray(stable_round6(g["mean"].astype(float)), dtype=np.float64)
        ts = pd.to_datetime(g["bucket_ts"]).astype("datetime64[us]").to_numpy()
        wlen, wmean, shrunk = adwin_scan(x)
        return pd.DataFrame({
            "event_type": g["event_type"].iloc[0],
            "bucket_ts": ts,
            "window_len": wlen,
            "window_mean": wmean,
            "shrunk": shrunk,
        })

    out = grouped_block_map(t1h, ["event_type"], fn).to_pandas()
    out["window_mean"] = stable_round6(out["window_mean"].astype(float))
    out["window_len"] = out["window_len"].astype("int64")
    out["shrunk"] = out["shrunk"].astype("int64")
    return out.sort_values(["event_type", "bucket_ts"]).reset_index(drop=True)


def q_spectral_residual_anomaly(sf_dir: str):
    """Spectral-residual saliency anomaly detection (Ren et al. 2019,
    the SR stage of SR-CNN) per event_type on the hourly means
    (stages/streamdetect.py:spectral_residual): log-amplitude
    spectrum minus its 3-point average, inverse FFT with original
    phase, score = relative saliency deviation from a 21-point local
    mean; flag score > 3. FFT isn't SQL-expressible -> rows-only;
    planted-spike saliency pinned in pytest."""
    from ..stages.exchange import grouped_block_map
    from ..stages.streamdetect import spectral_residual

    t1h = _fused_tier(sf_dir, "1h")

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket_ts", kind="stable")
        x = np.asarray(stable_round6(g["mean"].astype(float)), dtype=np.float64)
        ts = pd.to_datetime(g["bucket_ts"]).astype("datetime64[us]").to_numpy()
        s, score = spectral_residual(x)
        return pd.DataFrame({
            "event_type": g["event_type"].iloc[0],
            "bucket_ts": ts,
            "saliency": s,
            "score": score,
            "flagged": (score > 3.0).astype(np.int64),
        })

    out = grouped_block_map(t1h, ["event_type"], fn).to_pandas()
    out["saliency"] = stable_round6(out["saliency"].astype(float))
    out["score"] = stable_round6(out["score"].astype(float))
    out["flagged"] = out["flagged"].astype("int64")
    return out.sort_values(["event_type", "bucket_ts"]).reset_index(drop=True)


def q_rank_drivers(sf_dir: str):
    """Driver ranking by correlation with a target
    (analysis/correlation.py:18-104 rank_drivers): each non-target
    event_type's hourly mean vs the 'click' series, Pearson r over
    pairwise-complete buckets, ranked by |r| (ties by driver name).
    Fully decomposable: the wide pivot streams through per-batch
    (n, Sx, Sy, Sxy, Sxx, Syy) partials — ONE bucket exchange total,
    combine is a 4-row driver frame. The SQL oracle computes the SAME
    raw-moment formula (not CORR()) so both sides share the exact
    expression."""
    from ..sources.fluxnet import fluxnet_wide
    from ..util import stable_round6

    target, drivers = "click", ["error", "purchase", "signup", "view"]
    t1h = _fused_tier(sf_dir, "1h")
    wide = fluxnet_wide(t1h, variables=[target] + drivers)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        y = df[f"{target}_1_1_1"].to_numpy(dtype=np.float64)
        rows = []
        for d in drivers:
            x = df[f"{d}_1_1_1"].to_numpy(dtype=np.float64)
            m = (x != -9999.0) & (y != -9999.0)
            xs, ys = x[m], y[m]
            rows.append((d, np.int64(m.sum()), xs.sum(), ys.sum(),
                         (xs * ys).sum(), (xs * xs).sum(), (ys * ys).sum()))
        return pd.DataFrame(
            rows, columns=["driver", "n", "sx", "sy", "sxy", "sxx", "syy"])

    parts = wide.map_batches(partial, batch_format="pandas").to_pandas()
    g = parts.groupby("driver", as_index=False).sum()
    n = g["n"].to_numpy(dtype=np.float64)
    num = n * g["sxy"].to_numpy() - g["sx"].to_numpy() * g["sy"].to_numpy()
    den = np.sqrt((n * g["sxx"].to_numpy() - g["sx"].to_numpy() ** 2)
                  * (n * g["syy"].to_numpy() - g["sy"].to_numpy() ** 2))
    g["r"] = stable_round6(num / den)
    g["abs_r"] = np.abs(g["r"].to_numpy())
    g = g.sort_values(["abs_r", "driver"], ascending=[False, True],
                      kind="stable").reset_index(drop=True)
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
    g["n"] = g["n"].astype("int64")
    return g[["rank", "driver", "n", "r", "abs_r"]]


_SQL_RANK_DRIVERS = """
WITH h AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bucket_ts,
         SUM(value) / COUNT(value) AS mean
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
), pairs AS (
  SELECT d.event_type AS driver, d.mean AS x, t.mean AS y
  FROM h d JOIN h t ON t.event_type = 'click' AND t.bucket_ts = d.bucket_ts
  WHERE d.event_type <> 'click'
), s AS (
  SELECT driver, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM pairs GROUP BY 1
), r AS (
  SELECT driver, n,
         ROUND(ROUND((n * sxy - sx * sy)
               / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 9), 6) AS r
  FROM s
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY ABS(r) DESC, driver) AS BIGINT) AS rank,
       driver, n, r, ABS(r) AS abs_r
FROM r ORDER BY rank
"""


def q_thermo_battery(sf_dir: str):
    """Thermodynamic derived-variable battery
    (variables/thermodynamic.py:19-240 via functions/scalars.py):
    aerodynamic resistance u/ustar^2 (ustar <= 0 -> missing sentinel),
    dry-air density, crosswind-corrected sonic->air temperature,
    latent heat of vaporization, ET from LE. Inputs synthesized
    integer-exactly from event_id; SQL replays each closed form."""
    from ..functions.scalars import (
        aerodynamic_resistance, air_temp_from_sonic_temp, dry_air_density,
        et_from_le, latent_heat_of_vaporization,
    )
    from ..util import stable_round6

    ds = _events(sf_dir, ["event_id"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        eid = df["event_id"].to_numpy(dtype=np.int64)
        u = 0.5 + ((eid * 7) % 800) / 100.0
        ustar = ((eid * 11) % 120) / 100.0 - 0.1
        rho_a = 1.1 + ((eid * 13) % 30) / 100.0
        rho_v = ((eid * 17) % 20) / 1000.0
        sonic = 280.0 + ((eid * 19) % 400) / 10.0
        h2o = ((eid * 23) % 40) / 1000.0
        le = ((eid * 29) % 4000) / 10.0 - 50.0
        ta = -5.0 + ((eid * 31) % 350) / 10.0
        out = pd.DataFrame({
            "event_id": eid,
            "ra": aerodynamic_resistance(u, ustar),
            "rho_d": dry_air_density(rho_a, rho_v),
            "ta_sonic": air_temp_from_sonic_temp(sonic, h2o),
            "lv": latent_heat_of_vaporization(ta),
            "et": et_from_le(le, ta),
        })
        for c in ("ra", "rho_d", "ta_sonic", "lv", "et"):
            out[c] = pd.Series(stable_round6(out[c].astype(float))).fillna(-1.0)
        return out

    out = ds.map_batches(fn, batch_format="pandas").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


_SQL_THERMO = """
WITH x AS (
  SELECT event_id,
         0.5 + ((event_id * 7) % 800) / 100.0 AS u,
         ((event_id * 11) % 120) / 100.0 - 0.1 AS ustar,
         1.1 + ((event_id * 13) % 30) / 100.0 AS rho_a,
         ((event_id * 17) % 20) / 1000.0 AS rho_v,
         280.0 + ((event_id * 19) % 400) / 10.0 AS sonic,
         ((event_id * 23) % 40) / 1000.0 AS h2o,
         ((event_id * 29) % 4000) / 10.0 - 50.0 AS le,
         -5.0 + ((event_id * 31) % 350) / 10.0 AS ta
  FROM events
)
SELECT event_id,
       CASE WHEN ustar <= 0 THEN -1.0
            ELSE ROUND(ROUND(u / POWER(ustar, 2), 9), 6) END AS ra,
       ROUND(ROUND(rho_a - rho_v, 9), 6) AS rho_d,
       ROUND(ROUND(sonic / (1 + 0.32 * h2o), 9), 6) AS ta_sonic,
       ROUND(ROUND((2.501 - 0.00237 * ta) * 1000000, 9), 6) AS lv,
       ROUND(ROUND(le / ((2.501 - 0.00237 * ta) * 1000000) * 3600, 9), 6) AS et
FROM x ORDER BY event_id
"""


def q_lagged_variants(sf_dir: str):
    """Lagged feature variants (variables/temporal.py:367-440
    lagged_variants): the 1h tier mean per event_type gains the
    reference's minus-before / plus-after named shifts over the
    REGULARIZED bucket grid (lag=[-2, 1], stepsize=1 -> "mean-2",
    "mean-1", "mean+1"). ONE exchange; SQL replays with LAG/LEAD over a
    generate_series-dense grid. Missing shifts carry the -9999.0
    missing code (reference frames are NaN there — NaN is not
    hash-stable, the code is)."""
    from ..stages.exchange import grouped_block_map
    from ..stages.gaps import regularize_frame

    t1h = _fused_tier(sf_dir, "1h")

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket_ts", kind="stable")
        key = g["event_type"].iloc[0]
        reg = regularize_frame(g, US_PER_HOUR, "bucket_ts")
        out = pd.DataFrame({
            "event_type": key,
            "bucket_ts": pd.to_datetime(reg["bucket_ts"]).astype("datetime64[us]"),
            "mean": reg["mean"],
        })
        for k in (-2, -1, 1):
            name = f"mean{'-' if k < 0 else '+'}{abs(k)}"
            out[name] = out["mean"].shift(-k if k > 0 else abs(k))
        return out

    out = grouped_block_map(t1h, ["event_type"], fn).to_pandas()
    for c in ("mean", "mean-2", "mean-1", "mean+1"):
        out[c] = round6(out[c].astype(float))
        out[c] = out[c].fillna(-9999.0)
    return out.sort_values(["event_type", "bucket_ts"]).reset_index(drop=True)


_SQL_LAGGED = """
WITH h AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bucket_ts,
         SUM(value) / COUNT(value) AS mean
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
), bounds AS (
  SELECT event_type, MIN(bucket_ts) AS lo, MAX(bucket_ts) AS hi FROM h GROUP BY 1
), grid AS (
  SELECT b.event_type, UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket_ts
  FROM bounds b
), dense AS (
  SELECT g.event_type, g.bucket_ts, h.mean
  FROM grid g LEFT JOIN h ON h.event_type = g.event_type AND h.bucket_ts = g.bucket_ts
), l AS (
  SELECT event_type, bucket_ts, mean,
         LAG(mean, 2) OVER w AS m_m2,
         LAG(mean, 1) OVER w AS m_m1,
         LEAD(mean, 1) OVER w AS m_p1
  FROM dense WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts)
)
SELECT event_type, bucket_ts,
       COALESCE(ROUND(mean, 6), -9999.0) AS "mean",
       COALESCE(ROUND(m_m2, 6), -9999.0) AS "mean-2",
       COALESCE(ROUND(m_m1, 6), -9999.0) AS "mean-1",
       COALESCE(ROUND(m_p1, 6), -9999.0) AS "mean+1"
FROM l ORDER BY event_type, bucket_ts
"""


def q_series_features(sf_dir: str):
    """tsfresh-style series feature battery
    (core/dfun/stats.py:77-190 via stages/features.py:series_features):
    cv, iqr, population-moment skewness / excess kurtosis, lag-1
    autocorrelation, mean absolute change and 3-sigma outlier counts
    per event_type in (ts, event_id) order. ONE exchange; the SQL
    oracle replays the documented formulas with the identical centered
    two-pass."""
    from ..stages.features import series_features
    from ..util import stable_round6

    ds = _events(sf_dir, ["event_id", "ts", "event_type", "value"])
    out = series_features(
        ds, value_col="value", ts_col="ts", keys=("event_type",),
        order_cols=("event_id",))
    num = ["mean", "sd", "cv", "iqr", "skewness", "kurtosis", "ac1", "mac"]
    for c in num:
        out[c] = pd.Series(stable_round6(out[c].astype(float))).fillna(-1.0)
    out["n"] = out["n"].astype("int64")
    out["outliers3"] = out["outliers3"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


_SQL_SERIES_FEATURES = """
WITH v AS (
  SELECT event_type, ts, event_id, value FROM events WHERE value IS NOT NULL
), m AS (
  SELECT event_type, COUNT(*) AS n, AVG(value) AS mu, STDDEV_SAMP(value) AS sd,
         QUANTILE_CONT(value, 0.75) - QUANTILE_CONT(value, 0.25) AS iqr
  FROM v GROUP BY 1
), z AS (
  SELECT v.event_type, v.value - m.mu AS z, m.sd,
         LEAD(v.value - m.mu) OVER w AS z_next,
         v.value - LAG(v.value) OVER w AS dx
  FROM v JOIN m USING (event_type)
  WINDOW w AS (PARTITION BY v.event_type ORDER BY v.ts, v.event_id)
), g AS (
  SELECT event_type,
         AVG(z * z) AS m2, AVG(z * z * z) AS m3, AVG(z * z * z * z) AS m4,
         SUM(CASE WHEN z_next IS NOT NULL THEN z * z_next END) AS num,
         SUM(z * z) AS den,
         AVG(ABS(dx)) AS mac,
         SUM(CASE WHEN ABS(z) > 3 * sd THEN 1 ELSE 0 END) AS outliers3
  FROM z GROUP BY 1
)
SELECT m.event_type, m.n,
       ROUND(ROUND(m.mu, 9), 6) AS mean,
       ROUND(ROUND(m.sd, 9), 6) AS sd,
       ROUND(ROUND(m.sd / m.mu, 9), 6) AS cv,
       ROUND(ROUND(m.iqr, 9), 6) AS iqr,
       ROUND(ROUND(g.m3 / POWER(g.m2, 1.5), 9), 6) AS skewness,
       ROUND(ROUND(g.m4 / (g.m2 * g.m2) - 3.0, 9), 6) AS kurtosis,
       ROUND(ROUND(g.num / g.den, 9), 6) AS ac1,
       ROUND(ROUND(g.mac, 9), 6) AS mac,
       CAST(g.outliers3 AS BIGINT) AS outliers3
FROM m JOIN g USING (event_type) ORDER BY 1
"""


def q_timestamp_conventions(sf_dir: str):
    """Timestamp convention conversion (times.py:1520-1733
    insert_timestamp(convention=start/middle/end) and :1734-1820
    convert_series_timestamp_to_middle): the END-labeled 1h tier gains
    START (end - freq) and MIDDLE (end - freq/2) stamps — the
    middle-of-averaging-interval convention the reference converts
    flux files to. Pure stamp arithmetic, exact SQL replay."""
    t1h = _fused_tier(sf_dir, "1h")

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        end = pd.to_datetime(df["bucket_ts"]).astype("datetime64[us]")
        return pd.DataFrame({
            "event_type": df["event_type"],
            "timestamp_end": end,
            "timestamp_middle": end - pd.Timedelta(minutes=30),
            "timestamp_start": end - pd.Timedelta(hours=1),
            "n": df["count"].astype("int64"),
        })

    out = t1h.map_batches(fn, batch_format="pandas").to_pandas()
    for c in ("timestamp_end", "timestamp_middle", "timestamp_start"):
        out[c] = pd.to_datetime(out[c]).astype("datetime64[us]")
    return out.sort_values(["event_type", "timestamp_end"]).reset_index(drop=True)


_SQL_TS_CONVENTIONS = """
WITH h AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bucket_ts,
         COUNT(value) AS n
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
)
SELECT event_type, bucket_ts AS timestamp_end,
       bucket_ts - INTERVAL 30 MINUTE AS timestamp_middle,
       bucket_ts - INTERVAL 1 HOUR AS timestamp_start, n
FROM h ORDER BY event_type, timestamp_end
"""


_FLUXNET_VARS = ["click", "error", "purchase", "signup", "view"]


def q_fluxnet_format(sf_dir: str):
    """FLUXNET data-sharing export format (io/formats/fluxnet.py:46-260
    via sources/fluxnet.py): the 1h tier pivots to the wide upload
    layout — one ``VAR_1_1_1`` column per variable, -9999 missing
    encoding, TIMESTAMP_START/END as YYYYMMDDhhmm strings. ONE exchange
    on the bucket stamp; the pivot is one vectorized unstack per block.
    The yearly file writer is pytest-covered (round-trip)."""
    from ..sources.fluxnet import fluxnet_wide

    t1h = _fused_tier(sf_dir, "1h")
    out = fluxnet_wide(t1h, variables=_FLUXNET_VARS).to_pandas()
    for v in _FLUXNET_VARS:
        out[f"{v}_1_1_1"] = round6(out[f"{v}_1_1_1"].astype(float))
    return out.sort_values("TIMESTAMP_END").reset_index(drop=True)


_SQL_FLUXNET = """
WITH h AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bucket_ts,
         SUM(value) / COUNT(value) AS mean
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
)
SELECT strftime(bucket_ts - INTERVAL 1 HOUR, '%Y%m%d%H%M') AS "TIMESTAMP_START",
       strftime(bucket_ts, '%Y%m%d%H%M') AS "TIMESTAMP_END",
       ROUND(COALESCE(MAX(CASE WHEN event_type = 'click' THEN mean END), -9999), 6) AS click_1_1_1,
       ROUND(COALESCE(MAX(CASE WHEN event_type = 'error' THEN mean END), -9999), 6) AS error_1_1_1,
       ROUND(COALESCE(MAX(CASE WHEN event_type = 'purchase' THEN mean END), -9999), 6) AS purchase_1_1_1,
       ROUND(COALESCE(MAX(CASE WHEN event_type = 'signup' THEN mean END), -9999), 6) AS signup_1_1_1,
       ROUND(COALESCE(MAX(CASE WHEN event_type = 'view' THEN mean END), -9999), 6) AS view_1_1_1
FROM h GROUP BY bucket_ts ORDER BY 2
"""


def q_freq_groups(sf_dir: str):
    """Per-record frequency groups (times.py:515-640 detect_freq_groups
    via stages/freq.py:freq_groups_frame): each event_type gets a
    two-regime timestamp ladder (60 records at 600 s, then 60 s —
    rank-indexed by event_id, integer-exact on both sides); records
    whose prev/next deltas cancel are certain, each delta group claims
    its boundary stamps in (count DESC, delta ASC) application order.
    The SQL oracle replays the full construction including the
    boundary-override precedence; ambiguous rows carry -1.0."""
    from ..stages.exchange import grouped_block_map
    from ..stages.freq import freq_groups_frame

    ds = _events(sf_dir, ["event_id", "event_type"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_id", kind="stable")
        rn = np.arange(1, len(g) + 1, dtype=np.int64)
        # 600 s regime, a two-step irregular transition (90 s, 45 s —
        # those records are ambiguous and rn=61 stays unclaimed), 60 s
        off_sec = np.select(
            [rn <= 60, rn == 61, rn == 62],
            [(rn - 1) * 600, 59 * 600 + 90, 59 * 600 + 135],
            default=59 * 600 + 135 + (rn - 62) * 60,
        )
        frame = pd.DataFrame({
            "event_type": g["event_type"].to_numpy(),
            "rn": rn,
            "ts_us": (off_sec * 1_000_000).astype(np.int64),
        })
        out = freq_groups_frame(frame, ts_col="ts_us")
        return out[["event_type", "rn", "freq_auto_sec"]]

    out = grouped_block_map(ds, ["event_type"], fn).to_pandas()
    out["rn"] = out["rn"].astype("int64")
    out["freq_auto_sec"] = out["freq_auto_sec"].astype(float)
    return out.sort_values(["event_type", "rn"]).reset_index(drop=True)


_SQL_FREQ_GROUPS = """
WITH r AS (
  SELECT event_type, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY event_id) AS rn
  FROM events
), l AS (
  SELECT event_type, rn,
         CASE WHEN rn <= 60 THEN (rn - 1) * 600
              WHEN rn = 61 THEN 59 * 600 + 90
              WHEN rn = 62 THEN 59 * 600 + 135
              ELSE 59 * 600 + 135 + (rn - 62) * 60 END AS ts_sec
  FROM r
), d AS (
  SELECT event_type, rn, ts_sec,
         LAG(ts_sec) OVER w AS pts, LEAD(ts_sec) OVER w AS nts
  FROM l WINDOW w AS (PARTITION BY event_type ORDER BY ts_sec)
), c AS (
  SELECT event_type, rn, ts_sec,
         CAST(nts - ts_sec AS DOUBLE) AS dn,
         (pts IS NOT NULL AND nts IS NOT NULL
          AND (pts - ts_sec) + (nts - ts_sec) = 0) AS certain,
         pts, nts
  FROM d
), g AS (
  SELECT event_type, dn AS delta, COUNT(*) AS cnt,
         MIN(pts) AS first_date, MAX(nts) AS last_date
  FROM c WHERE certain GROUP BY 1, 2
), o AS (
  SELECT c.event_type, c.rn, g.delta,
         ROW_NUMBER() OVER (PARTITION BY c.event_type, c.rn
                            ORDER BY g.cnt ASC, g.delta DESC) AS pick
  FROM c JOIN g ON g.event_type = c.event_type
              AND (c.ts_sec = g.first_date OR c.ts_sec = g.last_date)
)
SELECT c.event_type, c.rn,
       COALESCE(o.delta, CASE WHEN c.certain THEN c.dn ELSE -1.0 END)
         AS freq_auto_sec
FROM c LEFT JOIN (SELECT event_type, rn, delta FROM o WHERE pick = 1) o
  ON o.event_type = c.event_type AND o.rn = c.rn
ORDER BY c.event_type, c.rn
"""


def q_potrad_eot(sf_dir: str):
    """Equation-of-time potential radiation (radiation.py:15-99
    potrad_eot via functions/solar.py:potential_radiation_eot):
    TOA and Beer-Lambert clear-sky variants per event stamp at the
    fixture site (lat 47, lon 8, UTC+1). Pure closed-form trig with
    reference-identical expression order — the SQL oracle replays every
    term."""
    from ..functions.solar import potential_radiation_eot
    from ..util import stable_round6

    ds = _events(sf_dir, ["event_id", "ts"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        return pd.DataFrame({
            "event_id": df["event_id"],
            "potrad_toa": potential_radiation_eot(ts_us, 47.0, 8.0, 1),
            "potrad_clearsky": potential_radiation_eot(
                ts_us, 47.0, 8.0, 1, use_atmospheric_transmission=True),
        })

    out = ds.map_batches(fn, batch_format="pandas").to_pandas()
    for c in ("potrad_toa", "potrad_clearsky"):
        out[c] = stable_round6(out[c].astype(float))
    return out.sort_values("event_id").reset_index(drop=True)


_SQL_POTRAD_EOT = """
WITH u AS (
  SELECT event_id, ts - INTERVAL 1 HOUR AS uts FROM events
), g AS (
  SELECT event_id,
         CAST(EXTRACT(doy FROM uts) AS DOUBLE) AS doy,
         EXTRACT(hour FROM uts) + EXTRACT(minute FROM uts) / 60.0
           + EXTRACT(second FROM uts) / 3600.0 AS utc_h
  FROM u
), s AS (
  SELECT event_id, doy,
         RADIANS(23.45) * COS(2 * PI() * (doy - 173) / 365.25) AS delta,
         (9.87 * SIN(2 * (2 * PI() * (doy - 81) / 365.0))
          - 7.53 * COS(2 * PI() * (doy - 81) / 365.0)
          - 1.5 * SIN(2 * PI() * (doy - 81) / 365.0)) / 60.0 AS eot_h,
         utc_h
  FROM g
), p AS (
  SELECT event_id, doy,
         SIN(RADIANS(47.0)) * SIN(delta)
           + COS(RADIANS(47.0)) * COS(delta)
             * COS((utc_h + 8.0 / 15.0 + eot_h - 12) * (PI() / 12)) AS sin_psi
  FROM s
), r AS (
  SELECT event_id,
         1361 * (1 + 0.033 * COS(2 * PI() * doy / 365.0)) * sin_psi AS rad,
         sin_psi
  FROM p
)
SELECT event_id,
       ROUND(ROUND(CASE WHEN rad < 0 THEN 0.0 ELSE rad END, 9), 6) AS potrad_toa,
       ROUND(ROUND(CASE WHEN rad * POWER(0.75, 1 / GREATEST(sin_psi, 0.01)) < 0
                        THEN 0.0
                        ELSE rad * POWER(0.75, 1 / GREATEST(sin_psi, 0.01)) END,
                   9), 6) AS potrad_clearsky
FROM r ORDER BY event_id
"""


_VARNAME_BATTERY = [
    "NEE_CUT_REF_f", "GPP_NT", "Reco_DT", "FCH4_gf", "FN2O", "FH2O_1",
    "LE_f", "ET_x", "Rg_1", "SW_IN_T1_2_1", "PPFD_IN", "PAR_1", "LW_IN",
    "Tair_f", "TA_F", "TA", "TAU", "VPD_f", "SWC_1_1_1", "FC", "FC_1",
    "SW_OUT", "RH_T1_2_1", "TS_1", "PREC_TOT", "PA_F", "WS_1", "WD_1",
    "G_1", "UNKNOWN_VAR",
]


def q_variable_classify(sf_dir: str):
    """Variable-name classification + measurement detection + applicable
    corrections (variables/classification.py:25-95,
    qaqc/measurements.py:123-200 via functions/classify.py): a 30-name
    battery covering every rule and edge (FC vs FCH4 word boundary,
    bare TA vs TAU vs TA_*, SWC-before-SW precedence) indexed by
    event_id; first-match-wins prefix rules vectorized with np.select.
    The SQL oracle replays the rule chains in identical order."""
    from ..functions.classify import (
        classify_variables,
        corrections_for_codes,
        detect_measurements,
    )

    ds = _events(sf_dir, ["event_id"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        eid = df["event_id"].to_numpy()
        names = np.array(_VARNAME_BATTERY, dtype=object)[eid % len(_VARNAME_BATTERY)]
        kind, cat = classify_variables(names)
        code = detect_measurements(names)
        return pd.DataFrame({
            "event_id": eid, "varname": names, "kind": kind,
            "category": cat, "measurement": code,
            "corrections": corrections_for_codes(code),
        })

    out = ds.map_batches(fn, batch_format="pandas").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


_SQL_CLASSIFY = """
WITH n AS (
  SELECT event_id,
         list_extract({names}, 1 + CAST(event_id % {n} AS INT)) AS varname
  FROM events
), k AS (
  SELECT event_id, varname,
    CASE
      WHEN varname = 'FC' OR starts_with(varname, 'FC_') THEN 'FC'
      WHEN varname = 'TA' THEN 'TA'
      WHEN starts_with(varname, 'NEE') THEN 'NEE'
      WHEN starts_with(varname, 'GPP') THEN 'GPP'
      WHEN starts_with(varname, 'Reco') THEN 'Reco'
      WHEN starts_with(varname, 'FCH4') THEN 'FCH4'
      WHEN starts_with(varname, 'FN2O') THEN 'FN2O'
      WHEN starts_with(varname, 'FH2O') THEN 'FH2O'
      WHEN starts_with(varname, 'LE_') THEN 'LE'
      WHEN starts_with(varname, 'ET_') THEN 'ET'
      WHEN starts_with(varname, 'Rg_') THEN 'Rg'
      WHEN starts_with(varname, 'SW_IN_') THEN 'SW_IN'
      WHEN starts_with(varname, 'PPFD') THEN 'PPFD'
      WHEN starts_with(varname, 'PAR_') THEN 'PAR'
      WHEN starts_with(varname, 'LW_') THEN 'LW'
      WHEN starts_with(varname, 'Tair') THEN 'TA'
      WHEN starts_with(varname, 'TA_') THEN 'TA'
      WHEN starts_with(varname, 'VPD') THEN 'VPD'
      WHEN starts_with(varname, 'SWC') THEN 'SWC'
      ELSE 'none' END AS kind,
    CASE
      WHEN varname = 'FC' OR starts_with(varname, 'FC_') THEN 'carbon'
      WHEN varname = 'TA' THEN 'meteo'
      WHEN starts_with(varname, 'NEE') THEN 'carbon'
      WHEN starts_with(varname, 'GPP') THEN 'carbon'
      WHEN starts_with(varname, 'Reco') THEN 'carbon'
      WHEN starts_with(varname, 'FCH4') THEN 'carbon'
      WHEN starts_with(varname, 'FN2O') THEN 'nitrogen'
      WHEN starts_with(varname, 'FH2O') THEN 'water'
      WHEN starts_with(varname, 'LE_') THEN 'water'
      WHEN starts_with(varname, 'ET_') THEN 'water'
      WHEN starts_with(varname, 'Rg_') THEN 'radiation'
      WHEN starts_with(varname, 'SW_IN_') THEN 'radiation'
      WHEN starts_with(varname, 'PPFD') THEN 'radiation'
      WHEN starts_with(varname, 'PAR_') THEN 'radiation'
      WHEN starts_with(varname, 'LW_') THEN 'radiation'
      WHEN starts_with(varname, 'Tair') THEN 'meteo'
      WHEN starts_with(varname, 'TA_') THEN 'meteo'
      WHEN starts_with(varname, 'VPD') THEN 'meteo'
      WHEN starts_with(varname, 'SWC') THEN 'soil'
      ELSE 'none' END AS category,
    CASE
      WHEN starts_with(varname, 'SWC') THEN 'SWC'
      WHEN starts_with(varname, 'SW_') THEN 'SW'
      WHEN starts_with(varname, 'SW') THEN 'SW'
      WHEN starts_with(varname, 'PPFD') THEN 'PPFD'
      WHEN starts_with(varname, 'LW') THEN 'LW'
      WHEN starts_with(varname, 'RH') THEN 'RH'
      WHEN starts_with(varname, 'VPD') THEN 'VPD'
      WHEN starts_with(varname, 'TA') THEN 'TA'
      WHEN starts_with(varname, 'Tair') THEN 'TA'
      WHEN starts_with(varname, 'TS') THEN 'TS'
      WHEN starts_with(varname, 'PREC') THEN 'PREC'
      WHEN starts_with(varname, 'PA') THEN 'PA'
      WHEN starts_with(varname, 'WS') THEN 'WS'
      WHEN starts_with(varname, 'WD') THEN 'WD'
      WHEN starts_with(varname, 'G_') THEN 'G'
      ELSE 'none' END AS measurement
  FROM n
)
SELECT event_id, varname, kind, category, measurement,
  CASE
    WHEN measurement IN ('SW', 'PPFD')
      THEN 'radiation_zero_offset,setto_max,setto_min,setto_value,set_exact_to_missing'
    WHEN measurement = 'RH'
      THEN 'relativehumidity_offset,setto_max,setto_min,setto_value,set_exact_to_missing'
    ELSE 'setto_max,setto_min,setto_value,set_exact_to_missing' END AS corrections
FROM k ORDER BY event_id
"""


def q_eddypro_flag_battery(sf_dir: str):
    """The remaining EddyPro flag battery (eddyproflags.py:115-506
    beyond the SSITC/VM97/signal-strength tests already covered):
    base-variable completeness (Sabbatini 2018 0.99/0.97 thresholds),
    spectral correction factor (2/4), horizontal-wind steadiness
    (VM97_NSHW_HF position-1 hard flag), angle-of-attack with
    restrict_application date windows (flags.py:19-52), and the SSITC
    setflag_timeperiod override. All inputs synthesized
    integer-exactly from event_id; every branch replays in SQL. NaN
    flags (outside application windows, digit 9) -> -1.0 sentinel."""
    from ..functions.scalars import flag_hard_digit, flag_high_good, flag_low_good

    ds = _events(sf_dir, ["event_id", "ts"])
    lo_us = int(pd.Timestamp(ds.min("ts")).value // 1000)
    aoa_lo, aoa_hi = lo_us + 5 * US_PER_DAY, lo_us + 12 * US_PER_DAY
    ssitc_lo, ssitc_hi = lo_us + 8 * US_PER_DAY, lo_us + 15 * US_PER_DAY

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        eid = df["event_id"].to_numpy()
        ts_us = df["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        expect_nr = 18_000
        basevar_nr = expect_nr - (eid * 7) % 900
        scf = 1.0 + ((eid * 13) % 600) / 100.0
        nshw = 80 + eid % 3            # digit 0/1/2 at position 1
        aoa = 80 + (eid * 3) % 2       # digit 0/1
        ssitc_raw = (eid % 3).astype(np.float64)

        completeness = flag_high_good(basevar_nr / expect_nr, 0.99, 0.97)
        scf_flag = flag_low_good(scf, 2.0, 4.0)
        nshw_flag = flag_hard_digit(nshw, 1, 2, hard=True)
        aoa_flag = flag_hard_digit(aoa, 1, 2, hard=True)
        in_aoa = (ts_us >= aoa_lo) & (ts_us <= aoa_hi)
        aoa_flag = np.where(in_aoa, aoa_flag, np.nan)
        ssitc = ssitc_raw.copy()
        in_ssitc = (ts_us >= ssitc_lo) & (ts_us <= ssitc_hi)
        ssitc[in_ssitc & (ssitc_raw == 1)] = 2.0

        out = pd.DataFrame({
            "event_id": eid,
            "flag_completeness": completeness,
            "flag_scf": scf_flag,
            "flag_nshw": nshw_flag,
            "flag_aoa": aoa_flag,
            "flag_ssitc": ssitc,
        })
        for c in out.columns[1:]:
            out[c] = out[c].fillna(-1.0)
        return out

    out = ds.map_batches(fn, batch_format="pandas").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


_SQL_EDDYPRO_BATTERY = """
WITH b AS (SELECT MIN(ts) AS lo FROM events),
x AS (
  SELECT event_id, ts, lo,
         (18000 - (event_id * 7) % 900) / 18000.0 AS pct,
         1.0 + ((event_id * 13) % 600) / 100.0 AS scf,
         (80 + event_id % 3) % 10 AS nshw_digit,
         (80 + (event_id * 3) % 2) % 10 AS aoa_digit,
         CAST(event_id % 3 AS DOUBLE) AS ssitc_raw
  FROM events, b
)
SELECT event_id,
       CASE WHEN pct >= 0.99 THEN 0.0 WHEN pct >= 0.97 THEN 1.0 ELSE 2.0 END
         AS flag_completeness,
       CASE WHEN scf < 2.0 THEN 0.0 WHEN scf < 4.0 THEN 1.0 ELSE 2.0 END
         AS flag_scf,
       CASE WHEN nshw_digit = 9 THEN -1.0 WHEN nshw_digit = 1 THEN 2.0
            ELSE CAST(nshw_digit AS DOUBLE) END AS flag_nshw,
       CASE WHEN ts < lo + INTERVAL 5 DAY OR ts > lo + INTERVAL 12 DAY THEN -1.0
            WHEN aoa_digit = 1 THEN 2.0 ELSE CAST(aoa_digit AS DOUBLE) END
         AS flag_aoa,
       CASE WHEN ts >= lo + INTERVAL 8 DAY AND ts <= lo + INTERVAL 15 DAY
                 AND ssitc_raw = 1.0 THEN 2.0 ELSE ssitc_raw END AS flag_ssitc
FROM x ORDER BY event_id
"""


def q_trim_frame(sf_dir: str):
    """Edge trimming to a variable's first/last valid record
    (core/dfun/frames.py:207-237 trim_frame via
    corrections.py:trim_to_var): mask the corpus's first 3 / last 4
    days of `value` to missing (deterministic, replayed in SQL), trim
    each event_type to its first/last surviving record — interior gaps
    ignored — and summarize. NO shuffle: per-batch bound partials +
    driver combine + broadcast filter."""
    from ..stages.corrections import trim_to_var
    from ..util import stable_round6

    ds = _events(sf_dir, ["event_id", "ts", "event_type", "value"])
    lo_us = int(pd.Timestamp(ds.min("ts")).value // 1000)
    hi_us = int(pd.Timestamp(ds.max("ts")).value // 1000)

    def mask(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df["ts"].astype("datetime64[us]").astype(np.int64)
        edge = (ts_us < lo_us + 3 * US_PER_DAY) | (ts_us > hi_us - 4 * US_PER_DAY)
        df = df.copy()
        df["v"] = df["value"].where(~edge)
        return df[["event_type", "ts", "v"]]

    masked = ds.map_batches(mask, batch_format="pandas")
    n_before = (
        masked.groupby("event_type").count().to_pandas()
        .rename(columns={"count()": "n_before"})
    )
    trimmed = trim_to_var(masked, "v", keys=["event_type"])

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("event_type", as_index=False).agg(
            n_after=("ts", "size"), first_kept_ts=("ts", "min"),
            last_kept_ts=("ts", "max"), s=("v", "sum"), c=("v", "count"))

    parts = trimmed.map_batches(agg, batch_format="pandas").to_pandas()
    out = parts.groupby("event_type", as_index=False).agg(
        n_after=("n_after", "sum"), first_kept_ts=("first_kept_ts", "min"),
        last_kept_ts=("last_kept_ts", "max"), s=("s", "sum"), c=("c", "sum"))
    out["mean_kept"] = stable_round6(out["s"] / out["c"])
    out = out.merge(n_before, on="event_type")
    out = out[["event_type", "n_before", "n_after",
               "first_kept_ts", "last_kept_ts", "mean_kept"]]
    for c in ("n_before", "n_after"):
        out[c] = out[c].astype("int64")
    for c in ("first_kept_ts", "last_kept_ts"):
        out[c] = pd.to_datetime(out[c]).astype("datetime64[us]")
    return out.sort_values("event_type").reset_index(drop=True)


_SQL_TRIM = """
WITH b AS (SELECT MIN(ts) AS lo, MAX(ts) AS hi FROM events),
m AS (
  SELECT event_type, ts,
         CASE WHEN ts < lo + INTERVAL 3 DAY OR ts > hi - INTERVAL 4 DAY
              THEN NULL ELSE value END AS v
  FROM events, b
),
t AS (
  SELECT event_type, COUNT(*) AS n_before,
         MIN(ts) FILTER (WHERE v IS NOT NULL) AS ft,
         MAX(ts) FILTER (WHERE v IS NOT NULL) AS lt
  FROM m GROUP BY 1
)
SELECT m.event_type, t.n_before, COUNT(*) AS n_after,
       t.ft AS first_kept_ts, t.lt AS last_kept_ts,
       ROUND(ROUND(SUM(m.v) / COUNT(m.v), 9), 6) AS mean_kept
FROM m JOIN t ON m.event_type = t.event_type
WHERE m.ts >= t.ft AND m.ts <= t.lt
GROUP BY 1, 2, 4, 5
ORDER BY 1
"""


def q_doy_cumulative(sf_dir: str):
    """Multi-year cumulative curves with across-year CI bands
    (times.py:1935-1996 doy_cumulatives_per_year / doy_mean_cumulative
    via stages/cumulative.py): per-(event_type, year) running sum of
    the 1h-tier means, then mean / sample-SD / ±1SD / ±1.96SD across
    years per day-of-year time. Years here are synthetic 10-day spans
    (absolute epoch-day // 10 — integer-exact on both sides) so the
    30-day corpus yields 3 full "years" and the across-year moments are
    non-degenerate. Single-year rows carry the -1.0 sentinel for SD and
    bands. Two slim exchanges; the reference's pivot never
    materializes."""
    from ..stages.cumulative import doy_cumulative_stats
    from ..util import stable_round6, ts_to_us

    t1h = _fused_tier(sf_dir, "1h")

    def add(df: pd.DataFrame) -> pd.DataFrame:
        bucket_us = ts_to_us(df["bucket_ts"])
        day_idx = bucket_us // US_PER_DAY
        return pd.DataFrame({
            "event_type": df["event_type"],
            "bucket_us": bucket_us,
            "year": day_idx // 10,
            "doy": day_idx % 10 + 1,
            "sec_of_day": (bucket_us // 1_000_000) % 86_400,
            "mean": df["mean"],
        })

    prepped = t1h.map_batches(add, batch_format="pandas")
    out = doy_cumulative_stats(
        prepped, ["event_type"], value_col="mean", order_col="bucket_us",
    ).to_pandas()
    out["doy_time"] = out["doy"] + out["sec_of_day"] / 86_400.0
    for c in ("year",) if "year" in out.columns else ():
        out = out.drop(columns=[c])
    num = ["doy_time", "mean_doy_time", "sd_doy_time", "mean_plus_sd",
           "mean_minus_sd", "mean_plus_196sd", "mean_minus_196sd"]
    for c in num:
        out[c] = stable_round6(out[c].astype(float))
        out[c] = out[c].fillna(-1.0)
    for c in ("doy", "sec_of_day", "n_years"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["event_type", "doy", "sec_of_day"]).reset_index(drop=True)


_SQL_DOY_CUM = """
WITH h AS (
  SELECT event_type,
         epoch_us(time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour') AS bucket_us,
         SUM(value) / COUNT(value) AS mean
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
), c AS (
  SELECT event_type,
         (bucket_us // 86400000000) // 10 AS yr,
         (bucket_us // 86400000000) % 10 + 1 AS doy,
         (bucket_us // 1000000) % 86400 AS sec_of_day,
         SUM(mean) OVER (PARTITION BY event_type, (bucket_us // 86400000000) // 10
                         ORDER BY bucket_us) AS cum
  FROM h
), g AS (
  SELECT event_type, doy, sec_of_day, COUNT(*) AS n_years,
         AVG(cum) AS m, STDDEV_SAMP(cum) AS sd
  FROM c GROUP BY 1, 2, 3
)
SELECT event_type, doy, sec_of_day, n_years,
       ROUND(ROUND(doy + sec_of_day / 86400.0, 9), 6) AS doy_time,
       ROUND(ROUND(m, 9), 6) AS mean_doy_time,
       COALESCE(ROUND(ROUND(sd, 9), 6), -1.0) AS sd_doy_time,
       COALESCE(ROUND(ROUND(m + sd, 9), 6), -1.0) AS mean_plus_sd,
       COALESCE(ROUND(ROUND(m - sd, 9), 6), -1.0) AS mean_minus_sd,
       COALESCE(ROUND(ROUND(m + 1.96 * sd, 9), 6), -1.0) AS mean_plus_196sd,
       COALESCE(ROUND(ROUND(m - 1.96 * sd, 9), 6), -1.0) AS mean_minus_196sd
FROM g ORDER BY event_type, doy, sec_of_day
"""


def q_winddir_agg(sf_dir: str):
    """Circular wind-direction aggregation (core/funcs/funcs.py:85-118,
    winddirection_agg_kanda via stages/wind.py): component-wise
    sin/cos mean + median + P25/P75 recombined through atan2, wrapped
    to [0, 360), per (event_type, day). Angles synthesized from
    event_id (bijective odd-multiplier hash, exact hundredths). ONE
    exchange on the group key; the SQL oracle replays the identical
    expression order."""
    from ..stages.wind import winddir_aggregate

    ds = _events(sf_dir, ["event_id", "ts", "event_type"])

    def add_cols(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        ts_us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": t["event_type"],
            "bucket_us": pa.array((ts_us // US_PER_DAY) * US_PER_DAY, pa.int64()),
            "winddir": pa.array(((eid * 40503) % 36000) / 100.0, pa.float64()),
        })

    prepped = ds.map_batches(add_cols, batch_format="pyarrow", zero_copy_batch=True)
    out = winddir_aggregate(prepped, ["event_type", "bucket_us"]).to_pandas()
    out["n"] = out["n"].astype("int64")
    from ..util import stable_round6

    for c in ("wd_mean", "wd_median", "wd_p25", "wd_p75"):
        out[c] = stable_round6(out[c].astype(float))
    return out.sort_values(["event_type", "bucket_us"]).reset_index(drop=True)


_SQL_WINDDIR = """
WITH a AS (
  SELECT event_type,
         (epoch_us(ts) // 86400000000) * 86400000000 AS bucket_us,
         ((event_id * 40503) % 36000) / 100.0 AS angle
  FROM events
), c AS (
  SELECT event_type, bucket_us,
         SIN(angle / 180 * PI()) AS s, COS(angle / 180 * PI()) AS c
  FROM a
), g AS (
  SELECT event_type, bucket_us, COUNT(*) AS n,
         180 / PI() * ATAN2(AVG(s), AVG(c)) AS m,
         180 / PI() * ATAN2(MEDIAN(s), MEDIAN(c)) AS md,
         180 / PI() * ATAN2(QUANTILE_CONT(s, 0.25), QUANTILE_CONT(c, 0.25)) AS q25,
         180 / PI() * ATAN2(QUANTILE_CONT(s, 0.75), QUANTILE_CONT(c, 0.75)) AS q75
  FROM c GROUP BY 1, 2
)
SELECT event_type, bucket_us, n,
       ROUND(ROUND(CASE WHEN m < 0 THEN m + 360 ELSE m END, 9), 6) AS wd_mean,
       ROUND(ROUND(CASE WHEN md < 0 THEN md + 360 ELSE md END, 9), 6) AS wd_median,
       ROUND(ROUND(CASE WHEN q25 < 0 THEN q25 + 360 ELSE q25 END, 9), 6) AS wd_p25,
       ROUND(ROUND(CASE WHEN q75 < 0 THEN q75 + 360 ELSE q75 END, 9), 6) AS wd_p75
FROM g ORDER BY event_type, bucket_us
"""


def q_optimize_params(sf_dir: str):
    """Hyperparameter grid search with TimeSeriesSplit CV
    (core/ml/optimization.py:28-200 via stages/optimization.py): the
    regularized 1h means of one event_type become the bounded model
    table; a forest param grid fans out as (combo x fold) Ray fits over
    the ray.put-broadcast arrays, neg-MSE CV selection, chronological
    holdout scores on the winner. Iterative/model-based -> rows-only;
    fold bounds + planted-structure recovery pinned in
    tests/test_optimization.py."""
    from ..stages.exchange import grouped_block_map
    from ..stages.gaps import regularize_frame
    from ..stages.mlfill import tree_time_features
    from ..stages.optimization import grid_search_ts

    t1h = _fused_tier(sf_dir, "1h")

    def regularize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("bucket_ts", kind="stable")
        key = df["event_type"].iloc[0]
        reg = regularize_frame(df, US_PER_HOUR, "bucket_ts")
        reg["event_type"] = key
        return reg[["event_type", "bucket_ts", "mean"]]

    dense = grouped_block_map(t1h, ["event_type"], regularize).to_pandas()
    key = sorted(dense["event_type"].unique())[0]
    g = dense[dense["event_type"] == key].sort_values("bucket_ts")
    g = g[g["mean"].notna()]
    ts_us = pd.to_datetime(g["bucket_ts"]).astype("datetime64[us]").astype(np.int64).to_numpy()
    X = tree_time_features(ts_us)
    y = g["mean"].to_numpy(dtype=np.float64)

    cv, best, scores = grid_search_ts(
        X, y, {"n_trees": [5, 15], "max_depth": [2, 6]},
        model="forest", n_splits=4, seed=42)
    cv = cv.copy()
    cv["event_type"] = key
    for k in ("rmse", "r2", "mae"):
        cv[f"holdout_{k}"] = np.where(
            cv["is_best"] == 1, np.nan_to_num(scores[k], nan=-1.0), -1.0)
    cv = cv.astype({"n_trees": "int64", "max_depth": "int64"})
    return _round6(
        cv, ["mean_cv_mse", "holdout_rmse", "holdout_r2", "holdout_mae"]
    ).sort_values(["max_depth", "n_trees"]).reset_index(drop=True)


def q_binary_extract(sf_dir: str):
    """Bit-field decoding of packed integer status words
    (io/binary/extract.py:14-128 via functions/binary.py): a 16-bit
    word synthesized from event_id (odd-multiplier hash, bijective mod
    2^16) carries three packed fields — [0,4) raw, [4,10) gain 0.25,
    [10,16) gain 6.25 — decoded with vectorized shift/mask kernels.
    SQL replays the same shifts exactly (all widths = n_bits here; the
    wider-than-n_bits and NaN edge semantics are pytest-pinned against
    a verbatim reference-semantics replica)."""
    from ..functions.binary import encoded_value

    ds = _events(sf_dir, ["event_id"])

    def fn(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        word = (eid * 40503) % 65536
        return pa.table({
            "event_id": t["event_id"],
            "status_word": pa.array(word, pa.int64()),
            "status_a": pa.array(encoded_value(word, 0, 4, n_bits=16), pa.float64()),
            "status_b": pa.array(
                encoded_value(word, 4, 10, gain=0.25, n_bits=16), pa.float64()),
            "status_c": pa.array(
                encoded_value(word, 10, 16, gain=6.25, n_bits=16), pa.float64()),
        })

    out = ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return _round6(out, ["status_a", "status_b", "status_c"]).sort_values(
        "event_id"
    ).reset_index(drop=True)


_SQL_BINARY_EXTRACT = """
WITH w AS (
  SELECT event_id, (event_id * 40503) % 65536 AS status_word FROM events
)
SELECT event_id, status_word,
       ROUND(ROUND(CAST((status_word >> 12) & 15 AS DOUBLE), 9), 6) AS status_a,
       ROUND(ROUND(CAST((status_word >> 6) & 63 AS DOUBLE) * 0.25, 9), 6) AS status_b,
       ROUND(ROUND(CAST(status_word & 63 AS DOUBLE) * 6.25, 9), 6) AS status_c
FROM w ORDER BY event_id
"""


def _dt_synth_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Shared deterministic flux synthesis for the daytime-partitioning
    queries (the nee_partition_nt_oneflux construction plus a filled
    VPD driver) — every expression SQL-replayable."""
    eid = df["event_id"].to_numpy(dtype=np.int64)
    ts = pd.to_datetime(df["ts"])
    hour = (ts.dt.hour + ts.dt.minute / 60.0).to_numpy()
    doy = ts.dt.dayofyear.to_numpy(dtype=np.float64)
    h1 = (eid * 2_654_435_761) % 2_147_483_648
    h2 = (eid * 2_246_822_519) % 2_147_483_648
    ta = 8.0 + 7.0 * np.sin(2 * np.pi * (hour - 9.0) / 24.0) \
        + 3.0 * (h1 / 2147483648.0 - 0.5)
    rref_true = 2.0 + 1.0 * np.sin(2 * np.pi * doy / 60.0)
    resp = rref_true * np.exp(180.0 * ((1.0 / (15.0 + 46.02)) - (1.0 / (ta + 46.02))))
    day = (hour >= 7) & (hour <= 17)
    sw = np.where(day, 400.0, 0.0)
    gpp_true = np.where(day, 0.05 * 20.0 * sw / (0.05 * sw + 20.0), 0.0)
    nee = resp - gpp_true + 0.3 * (h2 / 2147483648.0 - 0.5)
    vpd = np.maximum(
        0.0, 6.0 + 8.0 * np.sin(2 * np.pi * (hour - 15.0) / 24.0)
        + 2.0 * (h1 / 2147483648.0 - 0.5))
    return pd.DataFrame({
        "event_type": df["event_type"],
        "ts": ts.astype("datetime64[us]"),
        "nee": nee, "ta": ta, "sw_in": sw, "vpd": vpd,
        "doy": doy,
    })


def q_nee_partition_dt_oneflux(sf_dir: str):
    """Full ONEFlux daytime partitioning (reference
    flux/partitioning/daytime_oneflux.py:1-975, Lasslop 2010 via
    stages/partition_daytime.py): MDS-lookup per-record NEE
    uncertainty, per-4-day-window penalized LRC fits with nighttime E0
    and the degenerate-model cascade, neighbor-window interpolation,
    GPP SE propagation. Iterative fits -> rows-only; planted-parameter
    recovery + geometry oracles pinned in
    tests/test_partition_daytime.py and the dt_window_geometry query.
    One summary row per event_type."""
    from ..stages.partition_daytime import partition_daytime_oneflux
    from ..util import stable_round6

    ds = _events(sf_dir, ["event_id", "ts", "event_type"])
    out = partition_daytime_oneflux(
        ds.map_batches(_dt_synth_frame, batch_format="pandas", zero_copy_batch=False)
        .drop_columns(["doy"]),
        keys=["event_type"],
    ).to_pandas()
    g = out.groupby("event_type", as_index=False).agg(
        n=("ts", "count"),
        n_reco=("RECO_DT_OF", "count"),
        n_windows=("RREF_DT_OF", "count"),
        mean_reco=("RECO_DT_OF", "mean"),
        mean_gpp=("GPP_DT_OF", "mean"),
        mean_se_gpp=("SE_GPP_DT_OF", "mean"),
        mean_e0=("E0_DT_OF", "mean"),
        mean_rref=("RREF_DT_OF", "mean"),
    )
    for c in ("mean_reco", "mean_gpp", "mean_se_gpp", "mean_e0", "mean_rref"):
        g[c] = np.asarray(stable_round6(g[c].astype(float)), dtype=np.float64)
        g[c] = np.where(np.isfinite(g[c]), g[c], -1.0)
    for c in ("n", "n_reco", "n_windows"):
        g[c] = g[c].astype("int64")
    return g.sort_values("event_type").reset_index(drop=True)


def q_nee_partition_dt_reddyproc(sf_dir: str):
    """REddyProc daytime partitioning (reference
    flux/partitioning/daytime_reddyproc.py:1-955, partitionNEEGL via
    stages/partition_daytime.py): potential-radiation day/night split,
    per-12-day-window nighttime E0 (24/48-day extension), GP-smoothed
    E0, closed-form RRef windows, penalized LRC with the fix-VPD /
    fix-alpha cascade, mean-of-valid anchored interpolation. Nested
    optimizers -> rows-only; recovery pinned in
    tests/test_partition_daytime.py. One summary row per event_type."""
    from ..stages.partition_daytime import partition_daytime_reddyproc
    from ..util import stable_round6

    ds = _events(sf_dir, ["event_id", "ts", "event_type"])
    out = partition_daytime_reddyproc(
        ds.map_batches(_dt_synth_frame, batch_format="pandas", zero_copy_batch=False)
        .drop_columns(["doy"]),
        keys=["event_type"], lat=47.0, lon=8.0, utc_offset=1.0,
    ).to_pandas()
    g = out.groupby("event_type", as_index=False).agg(
        n=("ts", "count"),
        n_reco=("RECO_DT_RP", "count"),
        n_windows=("RREF_DT_RP", "count"),
        mean_reco=("RECO_DT_RP", "mean"),
        mean_gpp=("GPP_DT_RP", "mean"),
        mean_e0=("E0_DT_RP", "mean"),
        mean_rref=("RREF_DT_RP", "mean"),
    )
    for c in ("mean_reco", "mean_gpp", "mean_e0", "mean_rref"):
        g[c] = np.asarray(stable_round6(g[c].astype(float)), dtype=np.float64)
        g[c] = np.where(np.isfinite(g[c]), g[c], -1.0)
    for c in ("n", "n_reco", "n_windows"):
        g[c] = g[c].astype("int64")
    return g.sort_values("event_type").reset_index(drop=True)


def q_dt_window_geometry(sf_dir: str):
    """The deterministic window geometry + subset selection + beta
    prior of the ONEFlux daytime cascade (daytime_oneflux.py:398-433:
    4-day windows on a 2-day step, ~12-day surrounding night window,
    the Rg<=4 night / Rg>4 day split, the idiosyncratic index
    percentile beta guess |p03 - p97|, the night-mean rref guess),
    exact-oracle-checked per (event_type, window) for windows passing
    the n_night>10 AND n_day>10 precondition."""
    from ..stages.partition_daytime import WINSIZE, _percentiles_oneflux
    from ..util import stable_round6

    ds = _events(sf_dir, ["event_id", "ts", "event_type"])
    prepped = ds.map_batches(_dt_synth_frame, batch_format="pandas",
                             zero_copy_batch=False)

    n_parasets = (365 // WINSIZE) * 2

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        doy = g["doy"].to_numpy()
        nee = g["nee"].to_numpy()
        rg = g["sw_in"].to_numpy()
        maxdoy = float(np.max(doy))
        rows = []
        for i in range(n_parasets):
            db = i * WINSIZE / 2.0
            de = db + WINSIZE
            db2 = (i - 2) * WINSIZE / 2.0 if i > 1 else 0
            de2 = (i + 2) * WINSIZE / 2.0 + WINSIZE if i < n_parasets - 2 else maxdoy
            sub = (doy > db) & (doy <= de)
            subn = (doy > db2) & (doy <= de2) & (rg <= 4.0)
            subd = sub & (rg > 4.0)
            n_night, n_day = int(subn.sum()), int(subd.sum())
            if not (n_night > 10 and n_day > 10):
                continue
            percs = _percentiles_oneflux(nee[sub], (0.03, 0.97))
            rows.append({
                "event_type": g["event_type"].iloc[0],
                "win": np.int64(i),
                "day_begin": db, "day_end": de,
                "n_win": np.int64(int(sub.sum())),
                "n_night": np.int64(n_night), "n_day": np.int64(n_day),
                "beta_guess": abs(percs[0] - percs[1]),
                "rb": float(np.average(nee[subn])),
            })
        return pd.DataFrame(rows)

    from ..stages.exchange import grouped_block_map

    out = grouped_block_map(prepped, ["event_type"], fn).to_pandas()
    for c in ("day_begin", "day_end", "beta_guess", "rb"):
        out[c] = stable_round6(out[c].astype(float))
    for c in ("win", "n_win", "n_night", "n_day"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["event_type", "win"]).reset_index(drop=True)


# _SQL_DT_GEOMETRY replays _dt_synth_frame expression-for-expression
# (the h1/h2 odd-multiplier hashes, the Lloyd-Taylor synthesis, the
# day/night Rg step), then the ONEFlux window geometry + the index
# percentile beta prior.
_SQL_DT_GEOMETRY = """
WITH real_s AS (
  SELECT event_type,
         dayofyear(ts)::DOUBLE AS doy,
         CASE WHEN (hour(ts) + minute(ts)/60.0) >= 7
                   AND (hour(ts) + minute(ts)/60.0) <= 17
              THEN 400.0 ELSE 0.0 END AS rg,
         (2.0 + sin(2*pi()*dayofyear(ts)::DOUBLE/60.0))
           * exp(180.0*((1.0/(15.0+46.02)) - (1.0/(
               8.0 + 7.0*sin(2*pi()*((hour(ts) + minute(ts)/60.0) - 9.0)/24.0)
                 + 3.0*(((event_id * 2654435761) % 2147483648)/2147483648.0 - 0.5)
             +46.02))))
         - CASE WHEN (hour(ts) + minute(ts)/60.0) >= 7
                     AND (hour(ts) + minute(ts)/60.0) <= 17
                THEN 0.05*20.0*400.0/(0.05*400.0+20.0) ELSE 0.0 END
         + 0.3*(((event_id * 2246822519) % 2147483648)/2147483648.0 - 0.5) AS nee
  FROM events
), mx AS (SELECT event_type, MAX(doy) AS maxdoy FROM real_s GROUP BY 1),
w AS (SELECT unnest(generate_series(0, 181)) AS i),
geom AS (
  SELECT mx.event_type, w.i,
         w.i*2.0 AS db, w.i*2.0+4.0 AS de,
         CASE WHEN w.i > 1 THEN (w.i-2)*2.0 ELSE 0.0 END AS db2,
         CASE WHEN w.i < 180 THEN (w.i+2)*2.0+4.0 ELSE mx.maxdoy END AS de2
  FROM w CROSS JOIN mx
),
sub AS (
  SELECT g.event_type, g.i, g.db, g.de, r.nee, r.rg,
         ROW_NUMBER() OVER (PARTITION BY g.event_type, g.i ORDER BY r.nee) AS rn,
         COUNT(*) OVER (PARTITION BY g.event_type, g.i) AS n
  FROM geom g JOIN real_s r
    ON r.event_type = g.event_type AND r.doy > g.db AND r.doy <= g.de
),
agg AS (
  SELECT event_type, i, ANY_VALUE(db) AS day_begin, ANY_VALUE(de) AS day_end,
         COUNT(*) AS n_win,
         SUM(CASE WHEN rg > 4.0 THEN 1 ELSE 0 END) AS n_day,
         MAX(CASE WHEN rn = CAST(FLOOR(0.03*n) AS BIGINT) + 1 THEN nee END) AS v03,
         MAX(CASE WHEN rn = LEAST(CAST(FLOOR(0.97*(n+1)) AS BIGINT) + 1, n) THEN nee END) AS v97
  FROM sub GROUP BY 1, 2
),
night AS (
  SELECT g.event_type, g.i, COUNT(*) AS n_night,
         SUM(r.nee)/COUNT(*) AS rb
  FROM geom g JOIN real_s r
    ON r.event_type = g.event_type AND r.doy > g.db2 AND r.doy <= g.de2
       AND r.rg <= 4.0
  GROUP BY 1, 2
)
SELECT a.event_type, a.i::BIGINT AS win,
       ROUND(ROUND(a.day_begin, 9), 6) AS day_begin,
       ROUND(ROUND(a.day_end, 9), 6) AS day_end,
       a.n_win::BIGINT AS n_win,
       nt.n_night::BIGINT AS n_night,
       a.n_day::BIGINT AS n_day,
       ROUND(ROUND(ABS(a.v03 - a.v97), 9), 6) AS beta_guess,
       ROUND(ROUND(nt.rb, 9), 6) AS rb
FROM agg a JOIN night nt USING (event_type, i)
WHERE nt.n_night > 10 AND a.n_day > 10
ORDER BY a.event_type, win
"""


def q_mann_kendall(sf_dir: str):
    """Mann-Kendall trend test + Sen's slope (Mann 1945, Sen 1968;
    stages/trend.py) per event_type over the DAILY mean series of the
    distributed rollup cascade: S over the i<j sign triangle,
    tie-corrected variance, continuity-corrected Z, tau-a, and the
    median-of-pairwise-slopes Sen estimator. Daily means are 6dp-rounded
    on both sides so tie structure and signs agree exactly; the O(n^2)
    pair triangle is over CALENDAR-bounded n (days), not corpus rows."""
    from ..stages.trend import mann_kendall_frame

    t1d = _fused_tier(sf_dir, "1d").to_pandas()
    t1d["m"] = stable_round6(t1d["mean"].astype(float))
    out = mann_kendall_frame(t1d, key="event_type", day_col="bucket_ts", val_col="m")
    for c in ("var_s", "z", "tau", "sen_slope"):
        out[c] = stable_round6(out[c].astype(float))
    return out.sort_values("event_type").reset_index(drop=True)


_SQL_MANN_KENDALL = """
WITH daily AS (
  SELECT event_type, time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day' AS d,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
pairs AS (
  SELECT a.event_type,
         SIGN(b.m - a.m) AS sg,
         (b.m - a.m) / date_diff('day', a.d, b.d) AS slope
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.d < b.d
),
sstat AS (
  SELECT event_type, CAST(SUM(sg) AS BIGINT) AS s, MEDIAN(slope) AS sen
  FROM pairs GROUP BY 1
),
nrow AS (
  SELECT event_type, COUNT(*)::DOUBLE AS n FROM daily GROUP BY 1
),
ties AS (
  SELECT event_type,
         COALESCE(SUM(CASE WHEN t > 1 THEN t * (t - 1) * (2 * t + 5) ELSE 0 END), 0)::DOUBLE AS tsum
  FROM (SELECT event_type, m, COUNT(*)::DOUBLE AS t FROM daily GROUP BY 1, 2)
  GROUP BY 1
),
calc AS (
  SELECT n.event_type, n.n, s.s, s.sen,
         (n.n * (n.n - 1) * (2 * n.n + 5) - t.tsum) / 18 AS var_s
  FROM nrow n JOIN sstat s USING (event_type) JOIN ties t USING (event_type)
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       s,
       ROUND(ROUND(var_s, 9), 6) AS var_s,
       ROUND(ROUND(CASE WHEN var_s <= 0 THEN 0
                        WHEN s > 0 THEN (s - 1) / sqrt(var_s)
                        WHEN s < 0 THEN (s + 1) / sqrt(var_s)
                        ELSE 0 END, 9), 6) AS z,
       ROUND(ROUND(s / (n * (n - 1) / 2), 9), 6) AS tau,
       ROUND(ROUND(sen, 9), 6) AS sen_slope
FROM calc ORDER BY event_type
"""


def q_seasonal_mann_kendall(sf_dir: str):
    """Seasonal Mann-Kendall test (Hirsch, Slack & Smith 1982;
    stages/trend.py:seasonal_mann_kendall_frame) per event_type over
    the daily mean series with month-of-year seasons: within-season
    sign triangles only (S' = sum S_k, Var' = sum of tie-corrected
    var_k, continuity-corrected Z), tau = S'/sum n_k(n_k-1)/2, seasonal
    Sen slope = median over all within-season pairwise slopes."""
    from ..stages.trend import seasonal_mann_kendall_frame

    t1d = _fused_tier(sf_dir, "1d").to_pandas()
    t1d["m"] = stable_round6(t1d["mean"].astype(float))
    out = seasonal_mann_kendall_frame(
        t1d, key="event_type", day_col="bucket_ts", val_col="m")
    for c in ("var_s", "z", "tau", "sen_slope"):
        out[c] = stable_round6(out[c].astype(float))
    return out.sort_values("event_type").reset_index(drop=True)


_SQL_SEASONAL_MK = """
WITH daily AS (
  SELECT event_type, time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day' AS d,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
pairs AS (
  SELECT a.event_type,
         SIGN(b.m - a.m) AS sg,
         (b.m - a.m) / date_diff('day', a.d, b.d) AS slope
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND month(a.d) = month(b.d) AND a.d < b.d
),
sstat AS (
  SELECT event_type, CAST(SUM(sg) AS BIGINT) AS s, MEDIAN(slope) AS sen
  FROM pairs GROUP BY 1
),
seas AS (
  SELECT event_type, month(d) AS mo, COUNT(*)::DOUBLE AS nk
  FROM daily GROUP BY 1, 2
),
ties AS (
  SELECT event_type, mo,
         COALESCE(SUM(CASE WHEN t > 1 THEN t * (t - 1) * (2 * t + 5) ELSE 0 END), 0)::DOUBLE AS tsum
  FROM (SELECT event_type, month(d) AS mo, m, COUNT(*)::DOUBLE AS t
        FROM daily GROUP BY 1, 2, 3)
  GROUP BY 1, 2
),
pervar AS (
  SELECT s.event_type, s.mo,
         (s.nk * (s.nk - 1) * (2 * s.nk + 5) - t.tsum) / 18 AS var_k,
         s.nk * (s.nk - 1) / 2 AS denom_k,
         s.nk
  FROM seas s JOIN ties t ON s.event_type = t.event_type AND s.mo = t.mo
),
agg AS (
  SELECT event_type, SUM(nk) AS n, SUM(var_k) AS var_s, SUM(denom_k) AS denom
  FROM pervar GROUP BY 1
)
SELECT a.event_type,
       CAST(a.n AS BIGINT) AS n,
       s.s,
       ROUND(ROUND(a.var_s, 9), 6) AS var_s,
       ROUND(ROUND(CASE WHEN a.var_s <= 0 THEN 0
                        WHEN s.s > 0 THEN (s.s - 1) / sqrt(a.var_s)
                        WHEN s.s < 0 THEN (s.s + 1) / sqrt(a.var_s)
                        ELSE 0 END, 9), 6) AS z,
       ROUND(ROUND(CASE WHEN a.denom > 0 THEN s.s / a.denom ELSE 0 END, 9), 6) AS tau,
       ROUND(ROUND(s.sen, 9), 6) AS sen_slope
FROM agg a JOIN sstat s USING (event_type)
ORDER BY event_type
"""


def q_benford_digits(sf_dir: str):
    """Benford first-significant-digit data-quality probe (Benford
    1938, Newcomb 1881): distribution of the leading digit of
    floor(o_totalprice) per order priority vs the Benford expectation
    log10(1 + 1/d), with the per-digit chi-square contribution
    n*(share-exp)^2/exp. First digit extracted by exact integer
    division (repeated //10 — no float log10 near power-of-10
    boundaries), so both sides agree bit-for-bit. One vectorized
    partial-count pass + tiny (priority x 9) combine."""
    import pyarrow.compute as pc

    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        v = t["o_totalprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        d = np.floor(v).astype(np.int64)
        m = d > 0
        d = d[m]
        while (d >= 10).any():
            d = np.where(d >= 10, d // 10, d)
        df = pd.DataFrame({
            "priority": np.asarray(t["o_orderpriority"].to_pylist(), dtype=object)[m],
            "digit": d,
        })
        g = df.groupby(["priority", "digit"], sort=False).size().reset_index(name="cnt")
        return g

    from ..stages.exchange import driver_combine

    def combine(parts: pd.DataFrame) -> pd.DataFrame:
        g = parts.groupby(["priority", "digit"], sort=True)["cnt"].sum().reset_index()
        tot = g.groupby("priority")["cnt"].transform("sum").to_numpy(np.float64)
        share = g["cnt"].to_numpy(np.float64) / tot
        exp = np.log10(1.0 + 1.0 / g["digit"].to_numpy(np.float64))
        g["share"] = stable_round6(share)
        g["benford_exp"] = stable_round6(exp)
        g["chi2_term"] = stable_round6(tot * (share - exp) ** 2 / exp)
        g["cnt"] = g["cnt"].astype("int64")
        g["digit"] = g["digit"].astype("int64")
        return g.reset_index(drop=True)

    return driver_combine(ds, partial, combine)


_SQL_BENFORD = """
WITH d AS (
  SELECT o_orderpriority AS priority,
         CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders WHERE FLOOR(o_totalprice) > 0
),
g AS (
  SELECT priority, digit, COUNT(*)::BIGINT AS cnt FROM d GROUP BY 1, 2
),
t AS (
  SELECT priority, SUM(cnt)::DOUBLE AS tot FROM g GROUP BY 1
)
SELECT g.priority, g.digit, g.cnt,
       ROUND(ROUND(g.cnt / t.tot, 9), 6) AS share,
       ROUND(ROUND(LOG10(1.0 + 1.0 / g.digit), 9), 6) AS benford_exp,
       ROUND(ROUND(t.tot * POW(g.cnt / t.tot - LOG10(1.0 + 1.0 / g.digit), 2)
             / LOG10(1.0 + 1.0 / g.digit), 9), 6) AS chi2_term
FROM g JOIN t USING (priority)
ORDER BY priority, digit
"""


def q_shesd_anomalies(sf_dir: str):
    """Seasonal Hybrid ESD anomaly detection (Hochenbaum, Vallis &
    Kejariwal 2017; stages/shesd.py) per event_type over the hourly
    mean tier (period 24): STL-lite seasonal removal, then the robust
    generalized ESD sweep (Rosner 1983) with median/MAD statistics.
    Rows-only (loess + iterative removal isn't SQL-expressible);
    Rosner's published critical values and planted-anomaly recovery
    are pinned in tests/test_shesd.py. Returns flagged anomalies."""
    from ..stages.shesd import shesd_detect

    t1h = _fused_tier(sf_dir, "1h")
    out = shesd_detect(
        t1h, keys=["event_type"], order_by=["bucket_ts"], value_col="mean",
        period=24, max_anoms_frac=0.02, alpha=0.05,
    ).to_pandas()
    out = out[out["anomaly"] == 1][
        ["event_type", "bucket_ts", "mean", "anom_rank"]].copy()
    out["mean"] = stable_round6(out["mean"].astype(float))
    out["anom_rank"] = out["anom_rank"].astype("int64")
    return out.sort_values(["event_type", "bucket_ts"]).reset_index(drop=True)


def q_pelt_changepoints(sf_dir: str):
    """PELT optimal mean-changepoint detection (Killick, Fearnhead &
    Eckley 2012; stages/trend.py:pelt_mean_changepoints) per event_type
    over the daily mean tier: exact penalized-likelihood segmentation
    with the paper's pruning, MAD-based default penalty. Rows-only
    (the DP isn't SQL-expressible); exactness vs the unpruned O(n^2)
    DP and planted-changepoint recovery are pinned in
    tests/test_pelt.py."""
    from ..stages.trend import pelt_frame

    t1d = _fused_tier(sf_dir, "1d").to_pandas()
    t1d["m"] = stable_round6(t1d["mean"].astype(float))
    # the synthetic daily means are stationary; plant a deterministic
    # two-step level shift (at the 1/3 and 2/3 day ranks per key) so
    # the query exercises multi-changepoint recovery end-to-end
    t1d = t1d.sort_values(["event_type", "bucket_ts"], ignore_index=True)
    rk = t1d.groupby("event_type").cumcount().to_numpy()
    nn = t1d.groupby("event_type")["m"].transform("size").to_numpy()
    sig = t1d.groupby("event_type")["m"].transform("std").to_numpy()
    t1d["m"] = (t1d["m"].to_numpy()
                + 5.0 * sig * (rk >= nn // 3) + 4.0 * sig * (rk >= 2 * nn // 3))
    out = pelt_frame(t1d, key="event_type", day_col="bucket_ts", val_col="m")
    for c in ("mean_before", "mean_after"):
        out[c] = stable_round6(out[c].astype(float))
    return out.sort_values(["event_type", "cp_rank"]).reset_index(drop=True)


def q_mutual_information(sf_dir: str):
    """Mutual information + Cramer's V between event_type and
    hour-of-day over the events table (Shannon 1948; Cramer 1946):
    joint/marginal cell counts via ONE tiny combine (cells bounded at
    |types| x 24), MI = sum p_xy * ln(p_xy / (p_x p_y)), normalized MI
    = MI / min(H(x), H(y)), chi-square + V = sqrt(chi2 / (n * (min(r,c)
    - 1))). Exact SQL replay."""
    from ..stages.exchange import driver_combine

    ds = _events(sf_dir, ["event_type", "ts"])

    def partial(t: pa.Table) -> pd.DataFrame:
        hrs = pd.to_datetime(
            t["ts"].to_pandas()).dt.hour.to_numpy()
        df = pd.DataFrame({
            "x": np.asarray(t["event_type"].to_pylist(), dtype=object),
            "h": hrs,
        })
        return df.groupby(["x", "h"], sort=False).size().reset_index(name="cnt")

    def combine(parts: pd.DataFrame) -> pd.DataFrame:
        g = parts.groupby(["x", "h"], sort=True)["cnt"].sum().reset_index()
        n = float(g["cnt"].sum())
        pxy = g["cnt"].to_numpy(np.float64) / n
        px = g.groupby("x")["cnt"].transform("sum").to_numpy(np.float64) / n
        ph = g.groupby("h")["cnt"].transform("sum").to_numpy(np.float64) / n
        mi = float(np.sum(pxy * np.log(pxy / (px * ph))))
        mx = g.groupby("x")["cnt"].sum().to_numpy(np.float64) / n
        mh = g.groupby("h")["cnt"].sum().to_numpy(np.float64) / n
        hx = -float(np.sum(mx * np.log(mx)))
        hh = -float(np.sum(mh * np.log(mh)))
        # chi2 over the COMPLETE r x c grid (empty cells contribute
        # their full expected count): pivot to the full grid
        grid = g.pivot_table(index="x", columns="h", values="cnt",
                             fill_value=0, aggfunc="sum").to_numpy(np.float64)
        expg = np.outer(mx, mh) * n
        chi2 = float(np.sum((grid - expg) ** 2 / expg))
        r, c = len(mx), len(mh)
        v = float(np.sqrt(chi2 / (n * (min(r, c) - 1))))
        return pd.DataFrame({
            "n": pd.Series([int(n)], dtype="int64"),
            "mi": stable_round6(np.array([mi])),
            "nmi": stable_round6(np.array([mi / min(hx, hh)])),
            "h_type": stable_round6(np.array([hx])),
            "h_hour": stable_round6(np.array([hh])),
            "chi2": stable_round6(np.array([chi2])),
            "cramers_v": stable_round6(np.array([v])),
        })

    return driver_combine(ds, partial, combine)


_SQL_MUTUAL_INFO = """
WITH g AS (
  SELECT event_type AS x, hour(ts) AS h, COUNT(*)::DOUBLE AS cnt
  FROM events GROUP BY 1, 2
),
tot AS (SELECT SUM(cnt) AS n FROM g),
mx AS (SELECT x, SUM(cnt) AS cx FROM g GROUP BY 1),
mh AS (SELECT h, SUM(cnt) AS ch FROM g GROUP BY 1),
mi AS (
  SELECT SUM((g.cnt / t.n) * LN((g.cnt / t.n) / ((mx.cx / t.n) * (mh.ch / t.n)))) AS mi
  FROM g JOIN mx USING (x) JOIN mh USING (h) CROSS JOIN tot t
),
-- chi2 over the COMPLETE grid: cross-join marginals, missing cells = 0
chi AS (
  SELECT SUM(POW(COALESCE(g.cnt, 0) - mx.cx * mh.ch / t.n, 2)
             / (mx.cx * mh.ch / t.n)) AS chi2
  FROM mx CROSS JOIN mh CROSS JOIN tot t
  LEFT JOIN g ON g.x = mx.x AND g.h = mh.h
),
ent AS (
  SELECT (SELECT -SUM((cx / t.n) * LN(cx / t.n)) FROM mx CROSS JOIN tot t) AS hx,
         (SELECT -SUM((ch / t.n) * LN(ch / t.n)) FROM mh CROSS JOIN tot t) AS hh,
         (SELECT COUNT(*) FROM mx) AS r,
         (SELECT COUNT(*) FROM mh) AS c
)
SELECT CAST(t.n AS BIGINT) AS n,
       ROUND(ROUND(mi.mi, 9), 6) AS mi,
       ROUND(ROUND(mi.mi / LEAST(ent.hx, ent.hh), 9), 6) AS nmi,
       ROUND(ROUND(ent.hx, 9), 6) AS h_type,
       ROUND(ROUND(ent.hh, 9), 6) AS h_hour,
       ROUND(ROUND(chi.chi2, 9), 6) AS chi2,
       ROUND(ROUND(SQRT(chi.chi2 / (t.n * (LEAST(ent.r, ent.c) - 1))), 9), 6) AS cramers_v
FROM mi CROSS JOIN chi CROSS JOIN ent CROSS JOIN tot t
"""


def q_permutation_entropy(sf_dir: str):
    """Permutation entropy (Bandt & Pompe 2002), order m=3, lag 1, per
    event_type over the hourly mean tier: each window of 3 consecutive
    rows is coded by its ordinal pattern (ties ranked by time, the BP
    convention -> later-element >= comparisons), pattern distribution
    -> Shannon entropy, normalized by ln(3!). Complexity probe for the
    rollup tier series; exact SQL replay via LEAD + CASE coding."""
    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    t1h = t1h.sort_values(["event_type", "bucket_ts"], ignore_index=True)
    rows = []
    for k, g in t1h.groupby("event_type", sort=True):
        y = g["m"].to_numpy(np.float64)
        if len(y) < 3:
            continue
        a, b, c = y[:-2], y[1:-1], y[2:]
        code = (4 * (b >= a).astype(np.int64)
                + 2 * (c >= b).astype(np.int64)
                + (c >= a).astype(np.int64))
        cnt = np.bincount(code, minlength=8).astype(np.float64)
        n = cnt.sum()
        p = cnt[cnt > 0] / n
        pe = -float(np.sum(p * np.log(p)))
        rows.append((k, int(n), pe, pe / np.log(6.0)))
    out = pd.DataFrame(rows, columns=["event_type", "n_windows", "pe", "pe_norm"])
    out["n_windows"] = out["n_windows"].astype("int64")
    out["pe"] = stable_round6(out["pe"].astype(float))
    out["pe_norm"] = stable_round6(out["pe_norm"].astype(float))
    return out.reset_index(drop=True)


_SQL_PERM_ENTROPY = """
WITH h AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS b,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
w AS (
  SELECT event_type, m AS a,
         LEAD(m, 1) OVER (PARTITION BY event_type ORDER BY b) AS bb,
         LEAD(m, 2) OVER (PARTITION BY event_type ORDER BY b) AS cc
  FROM h
),
p AS (
  SELECT event_type,
         4 * CAST(bb >= a AS BIGINT) + 2 * CAST(cc >= bb AS BIGINT)
           + CAST(cc >= a AS BIGINT) AS code
  FROM w WHERE cc IS NOT NULL
),
g AS (SELECT event_type, code, COUNT(*)::DOUBLE AS cnt FROM p GROUP BY 1, 2),
t AS (SELECT event_type, SUM(cnt) AS n FROM g GROUP BY 1),
e AS (
  SELECT g.event_type, t.n,
         -SUM((g.cnt / t.n) * LN(g.cnt / t.n)) AS pe
  FROM g JOIN t USING (event_type) GROUP BY 1, 2
)
SELECT event_type, CAST(n AS BIGINT) AS n_windows,
       ROUND(ROUND(pe, 9), 6) AS pe,
       ROUND(ROUND(pe / LN(6.0), 9), 6) AS pe_norm
FROM e ORDER BY event_type
"""


def q_lttb_downsample(sf_dir: str):
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013;
    stages/downsample.py:lttb_downsample) per event_type over the
    hourly mean tier to 60 points: endpoints kept, each interior
    bucket keeps the point maximizing the triangle with the previous
    selection and the next bucket's centroid. Rows-only (the forward
    selection recursion isn't SQL-expressible); pinned vs a naive
    reference replica + invariance tests in tests/test_lttb.py."""
    from ..stages.downsample import lttb_downsample

    t1h = _fused_tier(sf_dir, "1h")
    out = lttb_downsample(
        t1h, keys=["event_type"], order_by=["bucket_ts"],
        x_col="bucket_ts", y_col="mean", n_out=60,
    ).to_pandas()
    out = out[["event_type", "bucket_ts", "mean", "lttb_rank"]].copy()
    out["mean"] = stable_round6(out["mean"].astype(float))
    out["lttb_rank"] = out["lttb_rank"].astype("int64")
    return out.sort_values(["event_type", "lttb_rank"]).reset_index(drop=True)


def q_hurst_exponent(sf_dir: str):
    """Hurst exponent by rescaled-range analysis (Hurst 1951;
    Mandelbrot & Wallis 1969; stages/trend.py:hurst_rs) per event_type
    over the hourly mean tier: disjoint-chunk R/S at window ladder
    8..128, log-log OLS slope. Rows-only (chunked cumulative ranges
    aren't SQL-expressible); iid ~ 0.5 / persistent > 0.5 /
    antipersistent < 0.5 pins in tests/test_hurst.py."""
    from ..stages.trend import hurst_rs

    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h = t1h.sort_values(["event_type", "bucket_ts"], ignore_index=True)
    rows = []
    for k, g in t1h.groupby("event_type", sort=True):
        h, tab = hurst_rs(g["mean"].to_numpy(np.float64))
        rows.append((k, len(g), h,
                     float(tab["rs"].iloc[0]) if len(tab) else np.nan,
                     float(tab["rs"].iloc[-1]) if len(tab) else np.nan))
    out = pd.DataFrame(rows, columns=["event_type", "n", "hurst", "rs_min_w", "rs_max_w"])
    out["n"] = out["n"].astype("int64")
    for c in ("hurst", "rs_min_w", "rs_max_w"):
        out[c] = stable_round6(out[c].astype(float))
    return out.reset_index(drop=True)


def q_holt_winters(sf_dir: str):
    """Additive Holt-Winters smoothing + 24-step forecast (Holt 1957,
    Winters 1960; stages/decompose.py:holt_winters_frame) per
    event_type over the hourly mean tier (period 24). Rows-only (the
    triple recursion isn't SQL-expressible); recursion pins and
    synthetic-pattern recovery in tests/test_holt_winters.py. Returns
    one row per forecast step plus the final level/trend."""
    from ..stages.decompose import holt_winters_frame

    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h = t1h.sort_values(["event_type", "bucket_ts"], ignore_index=True)
    rows = []
    for k, g in t1h.groupby("event_type", sort=True):
        y = g["mean"].to_numpy(np.float64)
        r = holt_winters_frame(y, period=24, horizon=24)
        resid = y - r["fitted"]
        mae = float(np.nanmean(np.abs(resid)))
        for h in range(24):
            rows.append((k, h + 1, r["forecast"][h], r["level"], r["trend"], mae))
    out = pd.DataFrame(rows, columns=[
        "event_type", "h", "forecast", "level", "trend", "fit_mae"])
    out["h"] = out["h"].astype("int64")
    for c in ("forecast", "level", "trend", "fit_mae"):
        out[c] = stable_round6(out[c].astype(float))
    return out.reset_index(drop=True)


def q_kalman_smooth(sf_dir: str):
    """Kalman local-level filter + RTS smoother (Kalman 1960; Rauch,
    Tung & Striebel 1965; stages/kalman.py) per event_type over the
    hourly mean tier, moment-estimated noise variances. Rows-only (the
    forward/backward recursions aren't SQL-expressible); steady-state
    gain closed form, planted-parameter recovery and NaN bridging are
    pinned in tests/test_kalman.py. Returns every 24th point to keep
    the verified frame slim."""
    from ..stages.kalman import kalman_smooth

    t1h = _fused_tier(sf_dir, "1h")
    out = kalman_smooth(
        t1h, keys=["event_type"], order_by=["bucket_ts"], value_col="mean",
    ).to_pandas()
    out = out.sort_values(["event_type", "bucket_ts"], ignore_index=True)
    out = out.groupby("event_type", group_keys=False).apply(
        lambda g: g.iloc[::24], include_groups=True)
    out = out[["event_type", "bucket_ts", "mean", "level_smooth", "var_smooth"]].copy()
    for c in ("mean", "level_smooth", "var_smooth"):
        out[c] = stable_round6(out[c].astype(float))
    return out.reset_index(drop=True)


_LS_PERIODS = (21_600, 43_200, 86_400, 172_800, 604_800)


def q_lomb_scargle(sf_dir: str):
    """Lomb-Scargle periodogram (Lomb 1976, Scargle 1982;
    stages/trend.py:lomb_scargle_power) per event_type at integer-second
    periods 6h/12h/24h/48h/168h, straight over the UNEVENLY-sampled raw
    events (no resampling): one vectorized partial pass computing the
    (n, Sy, Syy, Sc, Ss, Syc, Sys, Scc, Ssc) sufficient statistics, a
    keys-x-periods driver combine, closed-form power. Phases come from
    epoch %% period so the SQL oracle replays the trig bit-for-bit."""
    from ..stages.trend import lomb_scargle_power

    ds = _events(sf_dir, ["event_type", "ts", "value"])
    out = lomb_scargle_power(
        ds, keys=["event_type"], ts_col="ts", val_col="value", periods_s=list(_LS_PERIODS)
    )
    out["period_s"] = out["period_s"].astype("int64")
    out["power"] = stable_round6(out["power"].astype(float))
    return out.sort_values(["event_type", "period_s"]).reset_index(drop=True)


_SQL_LOMB_SCARGLE = """
WITH pers AS (SELECT UNNEST([21600, 43200, 86400, 172800, 604800]) AS p),
ph AS (
  SELECT e.event_type, p.p, e.value AS y,
         cos(CAST(epoch_us(e.ts) % (p.p::BIGINT * 1000000) AS DOUBLE)
             * (2 * pi() / (p.p * 1000000.0))) AS c,
         sin(CAST(epoch_us(e.ts) % (p.p::BIGINT * 1000000) AS DOUBLE)
             * (2 * pi() / (p.p * 1000000.0))) AS s
  FROM events e CROSS JOIN pers p
  WHERE e.value IS NOT NULL
),
sums AS (
  SELECT event_type, p,
         COUNT(*)::DOUBLE AS n,
         SUM(y) AS sy, SUM(y * y) AS syy,
         SUM(c) AS sc, SUM(s) AS ss,
         SUM(y * c) AS syc, SUM(y * s) AS sys_,
         SUM(c * c) AS scc, SUM(s * c) AS ssc
  FROM ph GROUP BY 1, 2
),
calc AS (
  SELECT event_type, p, n,
         cos(atan2(2 * ssc, 2 * scc - n) / 2) AS ct,
         sin(atan2(2 * ssc, 2 * scc - n) / 2) AS st,
         syc - (sy / n) * sc AS a,
         sys_ - (sy / n) * ss AS b,
         scc, ssc,
         (syy - n * (sy / n) * (sy / n)) / (n - 1) AS var
  FROM sums
),
calc2 AS (
  SELECT event_type, p, n, var,
         a * ct + b * st AS num_c,
         b * ct - a * st AS num_s,
         ct * ct * scc + 2 * ct * st * ssc + st * st * (n - scc) AS den_c
  FROM calc
)
SELECT event_type,
       CAST(p AS BIGINT) AS period_s,
       CAST(n AS BIGINT) AS n,
       ROUND(ROUND((num_c * num_c / den_c + num_s * num_s / (n - den_c)) / (2 * var), 9), 6) AS power
FROM calc2 ORDER BY event_type, period_s
"""


# Entropy over the SAME lomb grid: the engine rounds powers to 6dp
# BEFORE normalizing, so the oracle consumes the lomb SQL verbatim
# (its final SELECT already emits the rounded power).
_SQL_SPECTRAL_ENTROPY = f"""
WITH lomb AS ({_SQL_LOMB_SCARGLE}),
t AS (
  SELECT event_type, period_s, power,
         SUM(power) OVER (PARTITION BY event_type) AS tot,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY power DESC, period_s ASC) AS rk
  FROM lomb
), agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_periods,
         SUM(CASE WHEN power / tot > 0
             THEN -(power / tot) * LN(power / tot) ELSE 0 END) AS ent,
         MAX(CASE WHEN rk = 1 THEN period_s END) AS peak_period_s
  FROM t GROUP BY 1
)
SELECT event_type, n_periods,
       ROUND(ROUND(ent, 9), 6) AS entropy,
       ROUND(ROUND(ent / LN(CAST(n_periods AS DOUBLE)), 9), 6) AS entropy_norm,
       CAST(peak_period_s AS BIGINT) AS peak_period_s
FROM agg ORDER BY event_type
"""


_ACF_LAGS = (1, 2, 3, 6, 12, 24)


def q_acf_lags(sf_dir: str):
    """Pairwise-complete autocorrelation (stages/trend.py:acf_lags_frame;
    the reference's pairwise dropna convention, analysis/correlation.py)
    per event_type at lags 1/2/3/6/12/24 h over the 6dp-rounded hourly
    means of the distributed rollup: a pair exists only where BOTH
    buckets exist, Pearson r in the n-product-moment form shared
    verbatim with the SQL oracle's lag self-join."""
    from ..stages.trend import acf_lags_frame

    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    out = acf_lags_frame(
        t1h, key="event_type", ts_col="bucket_ts", val_col="m", lags=list(_ACF_LAGS)
    )
    out = out[out["n_pairs"] >= 2].copy()  # oracle's WHERE n >= 2
    out["acf"] = stable_round6(out["acf"].astype(float))
    return out.sort_values(["event_type", "lag"]).reset_index(drop=True)


_SQL_ACF_LAGS = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
lags AS (SELECT UNNEST([1, 2, 3, 6, 12, 24]) AS lag),
pairs AS (
  SELECT h1.event_type, l.lag, h1.m AS x, h2.m AS z
  FROM hourly h1
  CROSS JOIN lags l
  JOIN hourly h2
    ON h2.event_type = h1.event_type
   AND h2.bts = h1.bts + to_hours(l.lag::BIGINT)
),
sums AS (
  SELECT event_type, lag, COUNT(*)::DOUBLE AS n,
         SUM(x) AS sx, SUM(z) AS sz,
         SUM(x * x) AS sxx, SUM(z * z) AS szz, SUM(x * z) AS sxz
  FROM pairs GROUP BY 1, 2
)
SELECT event_type,
       CAST(lag AS BIGINT) AS lag,
       CAST(n AS BIGINT) AS n_pairs,
       ROUND(ROUND((n * sxz - sx * sz)
             / sqrt((n * sxx - sx * sx) * (n * szz - sz * sz)), 9), 6) AS acf
FROM sums WHERE n >= 2 ORDER BY event_type, lag
"""


def q_pettitt(sf_dir: str):
    """Pettitt (1979) change-point test (stages/trend.py:pettitt_test)
    per event_type over the 6dp-rounded daily means of the distributed
    rollup: U_t via the rank recurrence, K = max|U_t| with first-t tie
    break, the classical p ~= 2 exp(-6K^2/(n^3+n^2)). Complements the
    sequential CUSUM drift detector (cusum_drift) with the
    distribution-free retrospective test."""
    from ..stages.trend import pettitt_frame

    t1d = _fused_tier(sf_dir, "1d").to_pandas()
    t1d["m"] = stable_round6(t1d["mean"].astype(float))
    out = pettitt_frame(t1d, key="event_type", day_col="bucket_ts", val_col="m")
    out["change_day"] = pd.to_datetime(out["change_day"]).astype("datetime64[us]")
    out["p_approx"] = stable_round6(out["p_approx"].astype(float))
    return out.sort_values("event_type").reset_index(drop=True)


_SQL_PETTITT = """
WITH daily AS (
  SELECT event_type, time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day' AS d,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
v AS (
  SELECT a.event_type, a.d,
         SUM(SIGN(b.m - a.m)) AS vt
  FROM daily a JOIN daily b ON a.event_type = b.event_type
  GROUP BY 1, 2
),
u AS (
  SELECT event_type, d,
         SUM(vt) OVER (PARTITION BY event_type ORDER BY d
                       ROWS UNBOUNDED PRECEDING) AS ut,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM v
),
best AS (
  SELECT event_type, n, d, ut,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ABS(ut) DESC, rn) AS pick
  FROM u WHERE rn < n
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(ABS(ut) AS BIGINT) AS k_stat,
       d AS change_day,
       CAST(ut AS BIGINT) AS u_at_change,
       ROUND(ROUND(LEAST(1.0, 2 * exp(-6.0 * ut * ut / (n*n*n + n*n))), 9), 6) AS p_approx
FROM best WHERE pick = 1 ORDER BY event_type
"""


def q_storage_fill(sf_dir: str):
    """Storage correction with expanding rolling-median gap-fill
    (reference flux/lowres/storage_correction.py:230-295,
    _gapfill_storage_term; stages/gaps.py:expanding_rmedian_fill_frame):
    per event_type series, missing storage values are filled with the
    rolling median at the smallest odd centered window holding >= 3
    valid values (windows 3,5,7,... over ROW positions of the ORIGINAL
    series) — equivalently the median of valid values within the
    minimal symmetric window, h* = 3rd-smallest position distance —
    then corrected flux = flux + filled storage on flux-valid rows.
    Storage/flux series synthesized deterministically from events with
    Knuth-hash planted gaps (20% storage, 5% flux), identical in SQL."""
    from ..stages.gaps import storage_gapfill

    ds = _events(sf_dir, ["event_id", "event_type", "ts", "value"])

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["event_id"].to_numpy(np.uint64)
        with np.errstate(over="ignore"):
            h = (ids * np.uint64(2654435761)) % np.uint64(2**32)
        storage = df["value"].to_numpy(np.float64) / 10.0
        storage[(h % np.uint64(100)) < 20] = np.nan
        flux = df["value"].to_numpy(np.float64)
        flux[((h // np.uint64(7)) % np.uint64(100)) < 5] = np.nan
        return df.assign(storage=storage, flux=flux).drop(columns=["value"])

    prepared = ds.map_batches(synth, batch_format="pandas")
    out = storage_gapfill(
        prepared, keys=["event_type"], order_by=["ts", "event_id"],
    ).to_pandas()
    res = out[["event_id", "event_type", "flag_strg_isfilled"]].copy()
    res["flag_strg_isfilled"] = res["flag_strg_isfilled"].astype("int64")
    res["storage_gf"] = stable_round6(out["storage_gf"].astype(float))
    res["flux_corr"] = stable_round6(out["flux_corr"].astype(float))
    return res.sort_values("event_id").reset_index(drop=True)


_SQL_STORAGE_FILL = """
WITH base AS (
  SELECT event_id, event_type, ts,
         (CAST(event_id AS UBIGINT) * 2654435761) % 4294967296 AS h,
         value
  FROM events
), s AS (
  SELECT event_id, event_type,
         CASE WHEN h % 100 < 20 THEN NULL ELSE value / 10.0 END AS storage,
         CASE WHEN (h // 7) % 100 < 5 THEN NULL ELSE value END AS flux,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS pos
  FROM base
), v AS (
  SELECT event_type, pos, storage FROM s WHERE storage IS NOT NULL
), miss AS (
  SELECT event_type, event_id, pos FROM s WHERE storage IS NULL
), d AS (
  SELECT m.event_type, m.event_id, m.pos, v.pos AS vpos,
         ABS(v.pos - m.pos) AS dist
  FROM miss m JOIN v ON v.event_type = m.event_type
), d3 AS (
  SELECT event_type, event_id, pos, dist AS hstar FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY event_type, event_id ORDER BY dist, vpos) AS rk
    FROM d
  ) WHERE rk = 3
), fill AS (
  SELECT d3.event_type, d3.event_id, MEDIAN(v.storage) AS fillval
  FROM d3 JOIN v ON v.event_type = d3.event_type
       AND v.pos BETWEEN d3.pos - d3.hstar AND d3.pos + d3.hstar
  GROUP BY 1, 2
)
SELECT s.event_id, s.event_type,
       CAST(CASE WHEN s.storage IS NULL THEN 1 ELSE 0 END AS BIGINT)
         AS flag_strg_isfilled,
       ROUND(ROUND(COALESCE(s.storage, fill.fillval, 0.0), 9), 6) + 0.0
         AS storage_gf,
       ROUND(ROUND(s.flux + COALESCE(s.storage, fill.fillval, 0.0), 9), 6) + 0.0
         AS flux_corr
FROM s
LEFT JOIN fill ON fill.event_type = s.event_type AND fill.event_id = s.event_id
WHERE s.flux IS NOT NULL
ORDER BY s.event_id
"""


# ------------------------------------------------------------- equi-joins


def q_join_orders_customer(sf_dir: str):
    """Broadcast equi-join (stages/joins.py:broadcast_join): orders x
    customer on custkey — the bounded dimension side is ray.put ONCE
    and merged map-side per batch, zero shuffle (the reference's
    aggregated-as-hires date merge, frames.py:255-316, generalized to
    a relational dimension join). Per-market-segment order stats; means
    not raw sums (FP accumulation across engines)."""
    from ..stages.exchange import driver_combine
    from ..stages.joins import broadcast_join

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    )
    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    ).to_pandas().rename(columns={"c_custkey": "o_custkey"})
    joined = broadcast_join(orders, cust, on="o_custkey", how="inner")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("c_mktsegment", as_index=False).agg(
            n=("o_totalprice", "size"),
            s=("o_totalprice", "sum"),
            mn=("o_totalprice", "min"),
            mx=("o_totalprice", "max"),
        )

    g = driver_combine(
        joined, partial,
        lambda df: df.groupby("c_mktsegment", as_index=False).agg(
            n=("n", "sum"), s=("s", "sum"), mn=("mn", "min"), mx=("mx", "max")
        ),
        batch_format="pandas",
    )
    out = pd.DataFrame({
        "c_mktsegment": g["c_mktsegment"],
        "n_orders": g["n"].astype("int64"),
        "mean_price": stable_round6(g["s"] / g["n"]),
        "min_price": round6(g["mn"]),
        "max_price": round6(g["mx"]),
    })
    return out.sort_values("c_mktsegment").reset_index(drop=True)


_SQL_JOIN_ORDERS_CUSTOMER = """
SELECT c.c_mktsegment,
       COUNT(*)::BIGINT AS n_orders,
       ROUND(ROUND(SUM(o.o_totalprice) / COUNT(*), 9), 6) AS mean_price,
       ROUND(MIN(o.o_totalprice), 6) AS min_price,
       ROUND(MAX(o.o_totalprice), 6) AS max_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


def q_join_lineitem_orders(sf_dir: str):
    """Distributed hash equi-join (stages/joins.py:hash_join): lineitem
    x orders on orderkey — BOTH fact-sized sides hash-partitioned on
    the key in ONE exchange, per-block vectorized pandas merge (no
    broadcast: neither side is bounded at scale). Join result reduced
    per (o_orderpriority, l_returnflag) via the bounded driver
    combine."""
    from ..stages.exchange import driver_combine
    from ..stages.joins import hash_join

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity", "l_returnflag"],
    )
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
    ).map_batches(
        lambda t: t.rename_columns(["l_orderkey", "o_orderpriority"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = hash_join(li, orders, on="l_orderkey", how="inner")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["o_orderpriority", "l_returnflag"], as_index=False).agg(
            n=("l_quantity", "size"), s=("l_quantity", "sum")
        )

    g = driver_combine(
        joined, partial,
        lambda df: df.groupby(["o_orderpriority", "l_returnflag"], as_index=False).agg(
            n=("n", "sum"), s=("s", "sum")
        ),
        batch_format="pandas",
    )
    out = pd.DataFrame({
        "o_orderpriority": g["o_orderpriority"],
        "l_returnflag": g["l_returnflag"],
        "n": g["n"].astype("int64"),
        "mean_qty": stable_round6(g["s"] / g["n"]),
    })
    return out.sort_values(["o_orderpriority", "l_returnflag"]).reset_index(drop=True)


_SQL_JOIN_LINEITEM_ORDERS = """
SELECT o.o_orderpriority, l.l_returnflag,
       COUNT(*)::BIGINT AS n,
       ROUND(ROUND(SUM(l.l_quantity) / COUNT(*), 9), 6) AS mean_qty
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority, l.l_returnflag
ORDER BY o.o_orderpriority, l.l_returnflag
"""


def q_join_semi_anti(sf_dir: str):
    """Semi and anti hash joins (stages/joins.py:hash_join how=semi/
    anti): orders WITH at least one lineitem vs orders with NONE,
    counted per order status. Each variant is one keyed exchange whose
    per-block merge reduces the right side to its distinct keys first
    (existence check, never a row multiplication)."""
    from ..stages.exchange import driver_combine
    from ..stages.joins import hash_join

    def orders_ds():
        return rd.read_parquet(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_orderstatus"],
        )

    def li_keys():
        return rd.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey"]
        ).map_batches(
            lambda t: t.rename_columns(["o_orderkey"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def count_by_status(ds) -> pd.DataFrame:
        return driver_combine(
            ds,
            lambda df: df.groupby("o_orderstatus", as_index=False).agg(
                n=("o_orderkey", "size")
            ),
            lambda df: df.groupby("o_orderstatus", as_index=False).agg(n=("n", "sum")),
            batch_format="pandas",
        )

    semi = count_by_status(hash_join(orders_ds(), li_keys(), on="o_orderkey", how="semi"))
    anti = count_by_status(hash_join(orders_ds(), li_keys(), on="o_orderkey", how="anti"))
    out = semi.rename(columns={"n": "n_with_items"}).merge(
        anti.rename(columns={"n": "n_without_items"}), on="o_orderstatus", how="outer"
    )
    for c in ("n_with_items", "n_without_items"):
        out[c] = out[c].fillna(0).astype("int64")
    return out.sort_values("o_orderstatus").reset_index(drop=True)


_SQL_JOIN_SEMI_ANTI = """
WITH k AS (SELECT DISTINCT l_orderkey FROM lineitem)
SELECT o.o_orderstatus,
       (COUNT(*) FILTER (WHERE k.l_orderkey IS NOT NULL))::BIGINT AS n_with_items,
       (COUNT(*) FILTER (WHERE k.l_orderkey IS NULL))::BIGINT AS n_without_items
FROM orders o LEFT JOIN k ON o.o_orderkey = k.l_orderkey
GROUP BY o.o_orderstatus
ORDER BY o.o_orderstatus
"""


def q_retention_cohorts(sf_dir: str):
    """Daily cohort retention matrix (stages/joins.py:retention_cohorts):
    cohort = calendar day of a user's FIRST event, cell (cohort, offset)
    = distinct users active offset days later, retention = cell /
    offset-0 cell. ONE exchange on user_id (per-user first day and
    distinct active days are exact in-block), calendar-bounded driver
    combine."""
    from ..stages.joins import retention_cohorts

    ds = _events(sf_dir, ["user_id", "ts"])
    out = retention_cohorts(ds, user_col="user_id", ts_col="ts", period="D")
    out["cohort"] = pd.to_datetime(out["cohort"]).astype("datetime64[us]")
    out["retention"] = stable_round6(out["retention"].astype(float))
    return out[["cohort", "day_offset", "n_active", "cohort_size", "retention"]]


_SQL_RETENTION_COHORTS = """
WITH fu AS (
  SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS cohort
  FROM events GROUP BY user_id
),
ud AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d FROM events
),
j AS (
  SELECT f.cohort, date_diff('day', f.cohort, u.d) AS day_offset
  FROM ud u JOIN fu f ON u.user_id = f.user_id
),
act AS (
  SELECT cohort, day_offset::BIGINT AS day_offset, COUNT(*)::BIGINT AS n_active
  FROM j GROUP BY 1, 2
),
base AS (SELECT cohort, n_active AS cohort_size FROM act WHERE day_offset = 0)
SELECT a.cohort, a.day_offset, a.n_active, b.cohort_size,
       ROUND(ROUND(a.n_active * 1.0 / b.cohort_size, 9), 6) AS retention
FROM act a JOIN base b ON a.cohort = b.cohort
ORDER BY a.cohort, a.day_offset
"""


def q_ar2_yule_walker(sf_dir: str):
    """AR(2) Yule-Walker fit (stages/trend.py:yule_walker_ar2_frame)
    per event_type over the 6dp-rounded hourly means of the distributed
    rollup: pairwise-complete autocovariances at lags 1/2 h (the
    acf_lags convention), closed 2x2 solve for phi1/phi2, innovation
    variance c0(1 - phi1 r1 - phi2 r2). Expression order shared
    verbatim with the SQL oracle's lag self-joins."""
    from ..stages.trend import yule_walker_ar2_frame

    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    out = yule_walker_ar2_frame(t1h, key="event_type", ts_col="bucket_ts", val_col="m")
    for c in ("r1", "r2", "phi1", "phi2", "sigma2"):
        out[c] = stable_round6(out[c].astype(float))
    return out.sort_values("event_type").reset_index(drop=True)


_SQL_AR2_YW = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
stats AS (
  SELECT event_type, COUNT(*)::DOUBLE AS n, SUM(m) / COUNT(*) AS ybar
  FROM hourly GROUP BY 1
),
c0s AS (
  SELECT h.event_type, SUM((h.m - s.ybar) * (h.m - s.ybar)) / s.n AS c0
  FROM hourly h JOIN stats s ON s.event_type = h.event_type
  GROUP BY h.event_type, s.n
),
p1 AS (
  SELECT h1.event_type,
         SUM((h1.m - s.ybar) * (h2.m - s.ybar)) / COUNT(*) AS c1
  FROM hourly h1
  JOIN stats s ON s.event_type = h1.event_type
  JOIN hourly h2 ON h2.event_type = h1.event_type
                AND h2.bts = h1.bts + INTERVAL '1 hour'
  GROUP BY 1
),
p2 AS (
  SELECT h1.event_type,
         SUM((h1.m - s.ybar) * (h2.m - s.ybar)) / COUNT(*) AS c2
  FROM hourly h1
  JOIN stats s ON s.event_type = h1.event_type
  JOIN hourly h2 ON h2.event_type = h1.event_type
                AND h2.bts = h1.bts + INTERVAL '2 hours'
  GROUP BY 1
),
r AS (
  SELECT s.event_type, s.n, c.c0, p1.c1 / c.c0 AS r1, p2.c2 / c.c0 AS r2
  FROM stats s
  JOIN c0s c ON c.event_type = s.event_type
  JOIN p1 ON p1.event_type = s.event_type
  JOIN p2 ON p2.event_type = s.event_type
  WHERE s.n >= 3 AND c.c0 > 0
),
f AS (
  SELECT event_type, n, c0, r1, r2,
         r1 * (1.0 - r2) / (1.0 - r1 * r1) AS phi1,
         (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi2
  FROM r
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       ROUND(ROUND(r1, 9), 6) AS r1,
       ROUND(ROUND(r2, 9), 6) AS r2,
       ROUND(ROUND(phi1, 9), 6) AS phi1,
       ROUND(ROUND(phi2, 9), 6) AS phi2,
       ROUND(ROUND(c0 * (1.0 - phi1 * r1 - phi2 * r2), 9), 6) AS sigma2
FROM f ORDER BY event_type
"""


def q_ts_complexity(sf_dir: str):
    """Nonlinear complexity battery (stages/trend.py:complexity_frame;
    tsfresh-popularized public estimators — Batista 2014 CID, Schreiber
    & Schmitz 1997 C3, Fulcher & Jones 2014 time-reversal asymmetry)
    per event_type over the hourly rollup means, pairwise/triplet-
    complete on the bucket grid."""
    from ..stages.trend import complexity_frame

    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    out = complexity_frame(t1h, key="event_type", ts_col="bucket_ts", val_col="m")
    for c in ("mean_abs_change", "cid_ce", "c3", "time_rev_asym"):
        out[c] = stable_round6(out[c].astype(float))
    return out.sort_values("event_type").reset_index(drop=True)


_SQL_TS_COMPLEXITY = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
pairs AS (
  SELECT h1.event_type, h2.m - h1.m AS d
  FROM hourly h1
  JOIN hourly h2 ON h2.event_type = h1.event_type
                AND h2.bts = h1.bts + INTERVAL '1 hour'
),
pagg AS (
  SELECT event_type, COUNT(*)::BIGINT AS n_pairs,
         SUM(ABS(d)) AS sad, SUM(d * d) AS sdd
  FROM pairs GROUP BY 1
),
trips AS (
  SELECT h0.event_type, h0.m AS x0, h1.m AS x1, h2.m AS x2
  FROM hourly h0
  JOIN hourly h1 ON h1.event_type = h0.event_type
                AND h1.bts = h0.bts + INTERVAL '1 hour'
  JOIN hourly h2 ON h2.event_type = h0.event_type
                AND h2.bts = h0.bts + INTERVAL '2 hours'
),
tagg AS (
  SELECT event_type, COUNT(*)::BIGINT AS n_triples,
         SUM(x0 * x1 * x2) AS sc3,
         SUM(x2 * x2 * x1 - x1 * x0 * x0) AS st
  FROM trips GROUP BY 1
)
SELECT p.event_type, p.n_pairs,
       COALESCE(t.n_triples, 0)::BIGINT AS n_triples,
       ROUND(ROUND(p.sad / p.n_pairs, 9), 6) AS mean_abs_change,
       ROUND(ROUND(SQRT(p.sdd), 9), 6) AS cid_ce,
       ROUND(ROUND(t.sc3 / t.n_triples, 9), 6) AS c3,
       ROUND(ROUND(t.st / t.n_triples, 9), 6) AS time_rev_asym
FROM pagg p LEFT JOIN tagg t ON t.event_type = p.event_type
ORDER BY p.event_type
"""


# ------------------------------------------------------------------ registry

from .alequeries import ALE_ORACLE, ALE_QUERIES
from .docqueries import DOC_ORACLE, DOC_QUERIES
from .statqueries import STAT_ORACLE, STAT_QUERIES
from .extraqueries import EXTRA_ORACLE, EXTRA_QUERIES

def q_classical_decompose(sf_dir: str):
    """Classical additive seasonal decomposition (reference
    core/times/decomposition_utils.py:160-211 classical_decompose +
    :366-424 reconstruct_from_components;
    stages/decompose.py:classical_decompose_frame) per event_type over
    the 6dp-rounded hourly means of the distributed rollup, period 24
    positions: centered 2x24 MA trend (NaN edges — the reference's
    no-extrapolation fallback), positional phase means centered,
    residual, and the additive reconstruction. Phase = row position
    within the series modulo 24 (statsmodels convention), replayed in
    SQL as ROW_NUMBER arithmetic."""
    from ..stages.decompose import classical_decompose_frame

    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    out = classical_decompose_frame(
        t1h, key="event_type", ts_col="bucket_ts", val_col="m", period=24
    )
    out["bucket_ts"] = pd.to_datetime(out["bucket_ts"]).astype("datetime64[us]")
    for c in ("trend", "seasonal", "resid", "recon"):
        out[c] = stable_round6(out[c].astype(float))
    return out.sort_values(["event_type", "bucket_ts"]).reset_index(drop=True)


_SQL_CLASSICAL_DECOMPOSE = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
pos AS (
  SELECT event_type, bts, m,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bts) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM hourly
),
tr AS (
  SELECT *,
         SUM(m) OVER (PARTITION BY event_type ORDER BY rn
                      ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS s25,
         LAG(m, 12)  OVER (PARTITION BY event_type ORDER BY rn) AS mfirst,
         LEAD(m, 12) OVER (PARTITION BY event_type ORDER BY rn) AS mlast
  FROM pos
),
tr2 AS (
  SELECT event_type, bts, m, rn,
         CASE WHEN rn > 12 AND rn <= n - 12
              THEN (s25 - 0.5 * mfirst - 0.5 * mlast) / 24 END AS trend
  FROM tr
),
ph AS (
  SELECT event_type, (rn - 1) % 24 AS phase, AVG(m - trend) AS pm
  FROM tr2 WHERE trend IS NOT NULL GROUP BY 1, 2
),
phc AS (
  SELECT event_type, phase,
         pm - AVG(pm) OVER (PARTITION BY event_type) AS seas
  FROM ph
)
SELECT t.event_type, t.bts AS bucket_ts, t.m,
       ROUND(ROUND(t.trend, 9), 6) + 0.0 AS trend,
       ROUND(ROUND(p.seas, 9), 6) + 0.0 AS seasonal,
       ROUND(ROUND(t.m - t.trend - p.seas, 9), 6) + 0.0 AS resid,
       ROUND(ROUND(t.trend + p.seas + (t.m - t.trend - p.seas), 9), 6) + 0.0 AS recon
FROM tr2 t
LEFT JOIN phc p ON p.event_type = t.event_type AND p.phase = (t.rn - 1) % 24
ORDER BY 1, 2
"""


def q_seasonality_detect(sf_dir: str):
    """Periodogram-based dominant-period detection (reference
    core/times/decomposition_utils.py:425-531 detect_seasonality;
    stages/decompose.py:detect_seasonality_frame) per event_type over
    the 6dp-rounded hourly means: linear detrend, rFFT power, strict
    local-maxima peaks, primary/secondary periods + seasonality
    strength. FFT is not SQL-expressible -> rows-only; kernels pinned
    by planted-period pytests."""
    from ..stages.decompose import detect_seasonality_frame

    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    out = detect_seasonality_frame(
        t1h, key="event_type", ts_col="bucket_ts", val_col="m"
    )
    out["strength"] = stable_round6(out["strength"].astype(float))
    return out.sort_values("event_type").reset_index(drop=True)


def q_ustar_scenario_flags(sf_dir: str):
    """USTAR threshold scenario flags (reference
    flux/lowres/ustarthreshold.py:27-96 FlagMultipleConstantUstarThresholds,
    :98-154 FlagSingleConstantUstarThreshold, :156-219
    FlagMultipleVariableUstarThresholds, :219-372
    UstarThresholdConstantScenarios): three constant CUT scenarios
    (0.05/0.07/0.09 — the 16th/50th/84th-percentile convention) plus
    one per-record VUT threshold series, each flagging ustar < thr as
    hard-reject (flag 2) in a single pass (no iteration,
    ustarthreshold.py:139 repeat=False). ustar and the VUT series are
    synthesized deterministically from events columns identically in
    SQL. Ray shape: ONE stateless map_batches partial pass (per-batch
    group counts, 5 types x 4 scenarios) + a slim driver combine —
    nothing corpus-sized moves."""
    ds = _events(sf_dir, ["event_type", "ts", "user_id", "value"])
    scen = [("CUT16", 0.05), ("CUT50", 0.07), ("CUT84", 0.09)]

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        ustar = (df["user_id"].to_numpy() % 100) / 250.0
        flux = df["value"].to_numpy(dtype=np.float64)
        day = pd.to_datetime(df["ts"]).dt.day.to_numpy()
        out = []
        for label, thr_val in scen + [("VUT", None)]:
            thr = (0.04 + (day % 3) * 0.015) if thr_val is None else thr_val
            rej = ustar < thr
            g = pd.DataFrame({
                "event_type": df["event_type"],
                "scenario": label,
                "n_total": 1,
                "n_reject": rej.astype("int64"),
                "sum_ok": np.where(rej, 0.0, flux),
            })
            out.append(g)
        allg = pd.concat(out, ignore_index=True)
        return allg.groupby(["event_type", "scenario"], as_index=False).sum()

    parts = ds.map_batches(partials, batch_format="pandas").to_pandas()
    comb = parts.groupby(["event_type", "scenario"], as_index=False).sum()
    comb["n_ok"] = comb["n_total"] - comb["n_reject"]
    comb["mean_flux_ok"] = stable_round6(comb["sum_ok"] / comb["n_ok"])
    comb = comb.drop(columns=["sum_ok"])
    for c in ("n_total", "n_reject", "n_ok"):
        comb[c] = comb[c].astype("int64")
    return comb.sort_values(["event_type", "scenario"]).reset_index(drop=True)


_SQL_USTAR_SCENARIOS = """
WITH s AS (
  SELECT event_type, value AS flux,
         (user_id % 100) / 250.0 AS ustar,
         0.04 + (EXTRACT(day FROM ts)::BIGINT % 3) * 0.015 AS vut_thr
  FROM events
),
scen AS (
  SELECT * FROM (VALUES ('CUT16', 0.05), ('CUT50', 0.07), ('CUT84', 0.09))
           AS t(scenario, thr)
),
flagged AS (
  SELECT s.event_type, scen.scenario,
         CASE WHEN s.ustar < scen.thr THEN 1 ELSE 0 END AS rej, s.flux
  FROM s CROSS JOIN scen
  UNION ALL
  SELECT event_type, 'VUT' AS scenario,
         CASE WHEN ustar < vut_thr THEN 1 ELSE 0 END AS rej, flux
  FROM s
)
SELECT event_type, scenario,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(rej) AS BIGINT) AS n_reject,
       CAST(COUNT(*) - SUM(rej) AS BIGINT) AS n_ok,
       ROUND(ROUND(SUM(CASE WHEN rej = 0 THEN flux ELSE 0 END)
             / (COUNT(*) - SUM(rej)), 9), 6) AS mean_flux_ok
FROM flagged
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_linear_regression(sf_dir: str):
    """Simple OLS y ~ x (reference core/dfun/regression.py:1-58
    ``linear``: slope k, intercept d, R^2, adjusted R^2 on
    pairwise-complete data) for every ordered event-type pair over the
    6dp-rounded hourly means of the distributed rollup, joined on
    bucket. Closed-form n-product-moment expressions shared verbatim
    with the SQL oracle; adjusted R^2 = 1 - (1-R^2)(n-1)/(n-2) (one
    predictor — the statsmodels rsquared_adj the reference returns)."""
    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    rows = []
    types = sorted(t1h["event_type"].unique())
    by = {k: g.set_index("bucket_ts")["m"] for k, g in t1h.groupby("event_type")}
    for ex in types:
        for ey in types:
            if ex == ey:
                continue
            j = pd.concat([by[ex].rename("x"), by[ey].rename("y")],
                          axis=1, join="inner").sort_index()
            x, y = j["x"].to_numpy(), j["y"].to_numpy()
            n = float(len(j))
            if n < 3:
                continue
            sx, sy = x.sum(), y.sum()
            sxx, syy, sxy = (x * x).sum(), (y * y).sum(), (x * y).sum()
            k = (n * sxy - sx * sy) / (n * sxx - sx * sx)
            d = (sy - k * sx) / n
            r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
            r2a = 1.0 - (1.0 - r2) * (n - 1.0) / (n - 2.0)
            rows.append({"event_x": ex, "event_y": ey, "n": int(n),
                         "k": k, "d": d, "rsquared": r2, "rsquared_adj": r2a})
    out = pd.DataFrame(rows)
    for c in ("k", "d", "rsquared", "rsquared_adj"):
        out[c] = stable_round6(out[c].astype(float))
    return out.sort_values(["event_x", "event_y"]).reset_index(drop=True)


_SQL_LINREG = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
pairs AS (
  SELECT a.event_type AS event_x, b.event_type AS event_y, a.m AS x, b.m AS y
  FROM hourly a JOIN hourly b
    ON a.bts = b.bts AND a.event_type <> b.event_type
),
sums AS (
  SELECT event_x, event_y, COUNT(*)::DOUBLE AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
  FROM pairs GROUP BY 1, 2
)
SELECT event_x, event_y, CAST(n AS BIGINT) AS n,
       ROUND(ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 9), 6) AS k,
       ROUND(ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 9), 6) AS d,
       ROUND(ROUND(POW(n * sxy - sx * sy, 2)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 9), 6) AS rsquared,
       ROUND(ROUND(1.0 - (1.0 - POW(n * sxy - sx * sy, 2)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)))
             * (n - 1.0) / (n - 2.0), 9), 6) AS rsquared_adj
FROM sums WHERE n >= 3 ORDER BY event_x, event_y
"""


def year_pools(counts: "pd.Series") -> list[dict]:
    """Year-pool rows from a (year -> row count) Series, ascending
    index (reference core/times/neighbors.py:1-50: pool = year + two
    nearest years by |delta|, find_nearest_val argmin-FIRST tie-break
    -> the earlier year wins ties; bounds + closed-interval row count
    per _limit_yearpool_data)."""
    years = counts.index.to_numpy()
    rows = []
    for y in years:
        pool = [int(y)]
        rest = [int(v) for v in years if v != y]
        for _ in range(2):
            if not rest:
                break
            deltas = [abs(v - y) for v in rest]
            pick = rest[int(np.argmin(deltas))]
            pool.append(pick)
            rest.remove(pick)
        first, last = min(pool), max(pool)
        n_rows = int(counts[(counts.index >= first) & (counts.index <= last)].sum())
        rows.append({"year": int(y), "pool_first": first, "pool_last": last,
                     "n_pool_years": len(pool), "n_rows": n_rows})
    return rows


def q_year_neighbors(sf_dir: str):
    """Neighboring-year pool construction (reference
    core/times/neighbors.py:1-50 ``neighboring_years`` +
    ``_limit_yearpool_data``, the LongTermGapFilling year-pool rule,
    gapfilling/longterm.py:42-50): for each distinct order year, the
    pool is the year plus its two nearest years by |delta| with
    argmin-first tie-break (find_nearest_val semantics — ties resolve
    to the EARLIER year in the ascending unique-year list), pool bounds
    = min/max of the pool, and the row count inside the bounds
    (_limit_yearpool_data's closed interval). Ray shape: distributed
    per-batch (year -> count) partials over orders + a years-sized
    driver combine."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderdate"]
    )

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        yr = pd.to_datetime(df["o_orderdate"]).dt.year
        out = yr.value_counts().rename_axis("y").reset_index(name="cnt")
        return out

    parts = ds.map_batches(partials, batch_format="pandas").to_pandas()
    counts = parts.groupby("y")["cnt"].sum().sort_index()
    out = pd.DataFrame(year_pools(counts))
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("year").reset_index(drop=True)


_SQL_YEAR_NEIGHBORS = """
WITH u AS (
  SELECT DISTINCT EXTRACT(year FROM o_orderdate)::BIGINT AS y FROM orders
),
n1 AS (
  SELECT a.y, b.y AS cand,
         ROW_NUMBER() OVER (PARTITION BY a.y ORDER BY ABS(b.y - a.y), b.y) AS rk
  FROM u a JOIN u b ON b.y <> a.y
),
f1 AS (SELECT y, cand AS y1 FROM n1 WHERE rk = 1),
n2 AS (
  SELECT a.y, b.y AS cand,
         ROW_NUMBER() OVER (PARTITION BY a.y ORDER BY ABS(b.y - a.y), b.y) AS rk
  FROM u a JOIN u b ON b.y <> a.y JOIN f1 ON f1.y = a.y AND b.y <> f1.y1
),
f2 AS (SELECT y, cand AS y2 FROM n2 WHERE rk = 1),
pools AS (
  SELECT u.y,
         LEAST(u.y, COALESCE(f1.y1, u.y), COALESCE(f2.y2, u.y)) AS pool_first,
         GREATEST(u.y, COALESCE(f1.y1, u.y), COALESCE(f2.y2, u.y)) AS pool_last,
         1 + (f1.y1 IS NOT NULL)::BIGINT + (f2.y2 IS NOT NULL)::BIGINT AS n_pool_years
  FROM u LEFT JOIN f1 ON f1.y = u.y LEFT JOIN f2 ON f2.y = u.y
)
SELECT p.y AS year, p.pool_first, p.pool_last, p.n_pool_years,
       (SELECT COUNT(*) FROM orders o
        WHERE EXTRACT(year FROM o.o_orderdate)::BIGINT BETWEEN p.pool_first AND p.pool_last
       )::BIGINT AS n_rows
FROM pools p ORDER BY year
"""


def q_theta_forecast(sf_dir: str):
    """Theta(0,2) method forecast (Assimakopoulos & Nikolopoulos 2000;
    Hyndman & Billah 2003; stages/streamdetect.py:theta_forecast_frame)
    per event_type on the 6dp hourly means: train = all but the last
    24 positional buckets, OLS theta-0 line + closed-form SES (alpha
    0.2) of the theta-2 line, 24-step equal-weight combination forecast
    scored against the held-out buckets. The SES closed form (power
    weights, no recursion) replays verbatim in SQL — the
    forecast-accuracy companion to the seasonal-naive baseline
    (q_forecast_accuracy)."""
    from ..stages.streamdetect import theta_forecast_frame

    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    rows = []
    for k, g in t1h.groupby("event_type", sort=True):
        y = g.sort_values("bucket_ts")["m"].to_numpy(dtype=np.float64)
        if len(y) < 48:
            continue
        r = theta_forecast_frame(y[:-24], horizon=24, alpha=0.2)
        for h in range(1, 25):
            rows.append({"event_type": k, "h": h,
                         "yhat": r["yhat"][h - 1], "actual": y[-25 + h]})
    out = pd.DataFrame(rows)
    out["h"] = out["h"].astype("int64")
    out["yhat"] = stable_round6(out["yhat"].astype(float))
    return out.sort_values(["event_type", "h"]).reset_index(drop=True)


_SQL_THETA = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
pos AS (
  SELECT event_type, m,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bts) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS ntot
  FROM hourly
),
ok AS (SELECT * FROM pos WHERE ntot >= 48),
train AS (SELECT event_type, m, rn::DOUBLE AS rn, (ntot - 24)::DOUBLE AS n
          FROM ok WHERE rn <= ntot - 24),
ols AS (
  SELECT event_type, MAX(n) AS n, COUNT(*)::DOUBLE AS nn,
         SUM(rn) AS sp, SUM(m) AS sy, SUM(rn * rn) AS spp, SUM(rn * m) AS spy
  FROM train GROUP BY 1
),
ab AS (
  SELECT event_type, n,
         (nn * spy - sp * sy) / (nn * spp - sp * sp) AS b,
         (sy - (nn * spy - sp * sy) / (nn * spp - sp * sp) * sp) / nn AS a
  FROM ols
),
ses AS (
  SELECT t.event_type,
         SUM(CASE WHEN t.rn = 1
                  THEN POW(0.8, ab.n - 1) * (2 * t.m - (ab.a + ab.b * t.rn))
                  ELSE 0.2 * POW(0.8, ab.n - t.rn) * (2 * t.m - (ab.a + ab.b * t.rn))
             END) AS ln
  FROM train t JOIN ab USING (event_type) GROUP BY 1
),
test AS (
  SELECT event_type, m AS actual, (rn - (ntot - 24))::DOUBLE AS h
  FROM ok WHERE rn > ntot - 24
)
SELECT test.event_type, CAST(test.h AS BIGINT) AS h,
       ROUND(ROUND(0.5 * (ab.a + ab.b * (ab.n + test.h)) + 0.5 * ses.ln, 9), 6) AS yhat,
       test.actual
FROM test JOIN ab USING (event_type) JOIN ses USING (event_type)
ORDER BY event_type, h
"""


def q_decomp_strength(sf_dir: str):
    """Trend / seasonal strength features (Wang, Smyth & Hyndman 2006;
    the tsfeatures convention F = max(0, 1 - Var(resid)/Var(comp +
    resid))) on the classical additive decomposition
    (decomposition_utils.py:160-211; stages/decompose.py): per
    event_type over rows where trend is defined, population variances
    in the n-moment closed form shared verbatim with the SQL replay of
    the decomposition CTEs."""
    from ..stages.decompose import classical_decompose_frame

    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    dec = classical_decompose_frame(
        t1h, key="event_type", ts_col="bucket_ts", val_col="m", period=24
    )
    dec = dec[dec["trend"].notna()]
    rows = []
    for k, g in dec.groupby("event_type", sort=True):
        n = float(len(g))

        def pvar(x: np.ndarray) -> float:
            sx, sxx = x.sum(), (x * x).sum()
            return (n * sxx - sx * sx) / (n * n)

        vr = pvar(g["resid"].to_numpy())
        vtr = pvar((g["m"] - g["seasonal"]).to_numpy())
        vsr = pvar((g["m"] - g["trend"]).to_numpy())
        rows.append({
            "event_type": k, "n_used": int(n),
            "trend_strength": max(0.0, 1.0 - vr / vtr),
            "seasonal_strength": max(0.0, 1.0 - vr / vsr),
        })
    out = pd.DataFrame(rows)
    for c in ("trend_strength", "seasonal_strength"):
        out[c] = stable_round6(out[c].astype(float))
    return out.sort_values("event_type").reset_index(drop=True)


_SQL_DECOMP_STRENGTH = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
pos AS (
  SELECT event_type, bts, m,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bts) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM hourly
),
tr AS (
  SELECT *,
         SUM(m) OVER (PARTITION BY event_type ORDER BY rn
                      ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS s25,
         LAG(m, 12)  OVER (PARTITION BY event_type ORDER BY rn) AS mfirst,
         LEAD(m, 12) OVER (PARTITION BY event_type ORDER BY rn) AS mlast
  FROM pos
),
tr2 AS (
  SELECT event_type, bts, m, rn,
         CASE WHEN rn > 12 AND rn <= n - 12
              THEN (s25 - 0.5 * mfirst - 0.5 * mlast) / 24 END AS trend
  FROM tr
),
ph AS (
  SELECT event_type, (rn - 1) % 24 AS phase, AVG(m - trend) AS pm
  FROM tr2 WHERE trend IS NOT NULL GROUP BY 1, 2
),
phc AS (
  SELECT event_type, phase,
         pm - AVG(pm) OVER (PARTITION BY event_type) AS seas
  FROM ph
),
comp AS (
  SELECT t.event_type, t.m, t.trend, p.seas,
         t.m - t.trend - p.seas AS resid
  FROM tr2 t
  JOIN phc p ON p.event_type = t.event_type AND p.phase = (t.rn - 1) % 24
  WHERE t.trend IS NOT NULL
),
mom AS (
  SELECT event_type, COUNT(*)::DOUBLE AS n,
         SUM(resid) AS sr, SUM(resid * resid) AS srr,
         SUM(m - seas) AS st, SUM((m - seas) * (m - seas)) AS stt,
         SUM(m - trend) AS ss, SUM((m - trend) * (m - trend)) AS sss
  FROM comp GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_used,
       ROUND(ROUND(GREATEST(0.0, 1.0 - ((n * srr - sr * sr) / (n * n))
             / ((n * stt - st * st) / (n * n))), 9), 6) AS trend_strength,
       ROUND(ROUND(GREATEST(0.0, 1.0 - ((n * srr - sr * sr) / (n * n))
             / ((n * sss - ss * ss) / (n * n))), 9), 6) AS seasonal_strength
FROM mom ORDER BY event_type
"""


def q_threshold_crossings(sf_dir: str):
    """Hysteresis threshold-crossing counts (the Schmitt-trigger
    alerting rule of monitoring TSDBs — two thresholds so noise around
    one level does not re-fire; stages/streamdetect.py:
    hysteresis_crossings) per event_type on the 6dp hourly means:
    high/low = mean +/- 0.5 population SD (moment form), both
    6dp-rounded BEFORE comparison so the marker set is bit-identical
    on both sides; an UP crossing is a >=high marker whose most recent
    preceding marker was <=low, DOWN the reverse."""
    from ..stages.streamdetect import hysteresis_crossings

    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    rows = []
    for k, g in t1h.groupby("event_type", sort=True):
        y = g.sort_values("bucket_ts")["m"].to_numpy(dtype=np.float64)
        n = float(len(y))
        sx, sxx = y.sum(), (y * y).sum()
        sd = np.sqrt((n * sxx - sx * sx) / (n * n))
        mu = sx / n
        high = float(stable_round6(np.array([mu + 0.5 * sd]))[0])
        low = float(stable_round6(np.array([mu - 0.5 * sd]))[0])
        n_up, n_down, n_ext = hysteresis_crossings(y, low, high)
        rows.append({"event_type": k, "n_buckets": int(n), "high": high,
                     "low": low, "n_extreme": n_ext, "n_up": n_up,
                     "n_down": n_down})
    out = pd.DataFrame(rows)
    for c in ("n_buckets", "n_extreme", "n_up", "n_down"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


_SQL_CROSSINGS = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
stats AS (
  SELECT event_type, COUNT(*)::DOUBLE AS n, SUM(m) AS sx, SUM(m * m) AS sxx
  FROM hourly GROUP BY 1
),
thr AS (
  SELECT event_type, n,
         ROUND(ROUND(sx / n + 0.5 * sqrt((n * sxx - sx * sx) / (n * n)), 9), 6) AS high,
         ROUND(ROUND(sx / n - 0.5 * sqrt((n * sxx - sx * sx) / (n * n)), 9), 6) AS low
  FROM stats
),
marked AS (
  SELECT h.event_type, h.bts, t.n, t.high, t.low,
         CASE WHEN h.m >= t.high THEN 1 WHEN h.m <= t.low THEN -1 ELSE 0 END AS mk
  FROM hourly h JOIN thr t USING (event_type)
),
nz AS (
  SELECT event_type, n, high, low, mk,
         LAG(mk) OVER (PARTITION BY event_type ORDER BY bts) AS prev
  FROM marked WHERE mk <> 0
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_buckets,
       MAX(high) AS high, MAX(low) AS low,
       CAST(COUNT(*) AS BIGINT) AS n_extreme,
       CAST(SUM(CASE WHEN mk = 1 AND prev = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
       CAST(SUM(CASE WHEN mk = -1 AND prev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_down
FROM nz GROUP BY event_type ORDER BY event_type
"""


def q_croston(sf_dir: str):
    """Croston's intermittent-demand forecast (Croston 1972;
    stages/streamdetect.py:croston_forecast) per event_type over the
    DENSE 15-minute grid of event counts (zeros where no events — the
    intermittent series the method exists for): closed-form SES
    (alpha 0.1) over nonzero demand sizes and inter-arrival intervals,
    per-period forecast = z_hat / x_hat; the power-weight SES replays
    verbatim in SQL over generate_series-densified counts."""
    ds = _events(sf_dir, ["event_type", "ts"])
    us15 = 15 * 60 * 1_000_000
    bucketer = make_bucket_assigner(us15, end_stamped=True)

    def partials(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby(["event_type", "bucket_ts"], as_index=False).size()
        return pa.Table.from_pandas(g.rename(columns={"size": "cnt"}),
                                    preserve_index=False)

    parts = ds.map_batches(bucketer, batch_format="pyarrow",
                           zero_copy_batch=True).map_batches(
        partials, batch_format="pyarrow").to_pandas()
    counts = parts.groupby(["event_type", "bucket_ts"], as_index=False)["cnt"].sum()
    from ..stages.streamdetect import croston_forecast

    rows = []
    for k, g in counts.groupby("event_type", sort=True):
        g = g.sort_values("bucket_ts")
        ts = pd.to_datetime(g["bucket_ts"])
        full = pd.date_range(ts.iloc[0], ts.iloc[-1], freq="15min")
        demand = g.set_index(ts)["cnt"].reindex(full, fill_value=0).to_numpy(
            dtype=np.float64)
        z_hat, x_hat, fc, q = croston_forecast(demand, alpha=0.1)
        rows.append({"event_type": k, "n_periods": len(demand),
                     "n_nonzero": q, "z_hat": z_hat, "x_hat": x_hat,
                     "forecast": fc})
    out = pd.DataFrame(rows)
    out["n_periods"] = out["n_periods"].astype("int64")
    out["n_nonzero"] = out["n_nonzero"].astype("int64")
    for c in ("z_hat", "x_hat", "forecast"):
        out[c] = stable_round6(out[c].astype(float))
    return out.sort_values("event_type").reset_index(drop=True)


_SQL_CROSTON = """
WITH b AS (
  SELECT event_type,
         time_bucket(INTERVAL '15 minutes', ts) + INTERVAL '15 minutes' AS bts,
         COUNT(*)::DOUBLE AS cnt
  FROM events GROUP BY 1, 2
),
span AS (SELECT event_type, MIN(bts) AS lo, MAX(bts) AS hi FROM b GROUP BY 1),
grid AS (
  SELECT s.event_type, g.g AS bts
  FROM span s, LATERAL (SELECT UNNEST(generate_series(s.lo, s.hi,
                         INTERVAL '15 minutes')) AS g) g
),
dense AS (
  SELECT grid.event_type, grid.bts, COALESCE(b.cnt, 0.0) AS demand,
         ROW_NUMBER() OVER (PARTITION BY grid.event_type ORDER BY grid.bts) AS pos,
         COUNT(*) OVER (PARTITION BY grid.event_type) AS n_periods
  FROM grid LEFT JOIN b ON b.event_type = grid.event_type AND b.bts = grid.bts
),
nz AS (
  SELECT event_type, demand AS z, pos, n_periods,
         (pos - COALESCE(LAG(pos) OVER (PARTITION BY event_type ORDER BY pos), 0))::DOUBLE AS x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY pos) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS q
  FROM dense WHERE demand <> 0
),
ses AS (
  SELECT event_type, MAX(n_periods) AS n_periods, MAX(q) AS q,
         SUM(CASE WHEN rn = 1 THEN POW(0.9, q - 1) * z
                  ELSE 0.1 * POW(0.9, q - rn) * z END) AS z_hat,
         SUM(CASE WHEN rn = 1 THEN POW(0.9, q - 1) * x
                  ELSE 0.1 * POW(0.9, q - rn) * x END) AS x_hat
  FROM nz GROUP BY event_type
)
SELECT event_type, CAST(n_periods AS BIGINT) AS n_periods,
       CAST(q AS BIGINT) AS n_nonzero,
       ROUND(ROUND(z_hat, 9), 6) AS z_hat,
       ROUND(ROUND(x_hat, 9), 6) AS x_hat,
       ROUND(ROUND(z_hat / x_hat, 9), 6) AS forecast
FROM ses ORDER BY event_type
"""


def q_runs_test(sf_dir: str):
    """Wald-Wolfowitz runs test around the mean cut (1940;
    stages/trend.py:runs_test) per event_type on the 6dp hourly means:
    run count via sign changes, exact expectation/variance, z score.
    The randomness probe complementing Ljung-Box (correlation-based)
    and the drift detectors (sequential)."""
    from ..stages.trend import runs_test

    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    rows = []
    for k, g in t1h.groupby("event_type", sort=True):
        y = g.sort_values("bucket_ts")["m"].to_numpy(dtype=np.float64)
        r = runs_test(y)
        rows.append({"event_type": k, **r})
    out = pd.DataFrame(rows)
    for c in ("n1", "n2", "runs"):
        out[c] = out[c].astype("int64")
    for c in ("expected", "z"):
        out[c] = stable_round6(out[c].astype(float))
    return out.sort_values("event_type").reset_index(drop=True)


_SQL_RUNS_TEST = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
mu AS (SELECT event_type, SUM(m) / COUNT(*) AS mean_m FROM hourly GROUP BY 1),
signs AS (
  SELECT h.event_type, h.bts,
         CASE WHEN h.m > mu.mean_m THEN 1 ELSE -1 END AS s
  FROM hourly h JOIN mu USING (event_type)
),
lagged AS (
  SELECT event_type, s,
         LAG(s) OVER (PARTITION BY event_type ORDER BY bts) AS prev
  FROM signs
),
agg AS (
  SELECT event_type,
         SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END)::DOUBLE AS n1,
         SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END)::DOUBLE AS n2,
         1 + SUM(CASE WHEN prev IS NOT NULL AND s <> prev THEN 1 ELSE 0 END) AS runs
  FROM lagged GROUP BY 1
)
SELECT event_type,
       CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       CAST(runs AS BIGINT) AS runs,
       ROUND(ROUND(2.0 * n1 * n2 / (n1 + n2) + 1.0, 9), 6) AS expected,
       ROUND(ROUND((runs - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
             / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2))
                    / ((n1 + n2) * (n1 + n2) * ((n1 + n2) - 1.0))), 9), 6) AS z
FROM agg ORDER BY event_type
"""


def q_ljung_box(sf_dir: str):
    """Ljung-Box portmanteau whiteness statistic (Ljung & Box 1978;
    stages/trend.py:ljung_box_q) per event_type on the 6dp hourly
    means, m = 10 lags: Q = n(n+2) sum rho_k^2/(n-k) with the biased
    positional Box-Jenkins autocorrelation (denominator over all n
    terms), replayed in SQL as an offset self-join on ROW_NUMBER."""
    from ..stages.trend import ljung_box_q

    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    rows = []
    for k, g in t1h.groupby("event_type", sort=True):
        y = g.sort_values("bucket_ts")["m"].to_numpy(dtype=np.float64)
        q, df = ljung_box_q(y, m=10)
        rows.append({"event_type": k, "n_obs": len(y), "df": df, "q_stat": q})
    out = pd.DataFrame(rows)
    out["n_obs"] = out["n_obs"].astype("int64")
    out["df"] = out["df"].astype("int64")
    out["q_stat"] = stable_round6(out["q_stat"].astype(float))
    return out.sort_values("event_type").reset_index(drop=True)


_SQL_LJUNG_BOX = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
pos AS (
  SELECT event_type, m,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bts) AS rn
  FROM hourly
),
mu AS (
  SELECT event_type, SUM(m) / COUNT(*) AS yb, COUNT(*)::DOUBLE AS n
  FROM pos GROUP BY event_type
),
den AS (
  SELECT p.event_type, SUM((p.m - mu.yb) * (p.m - mu.yb)) AS denom
  FROM pos p JOIN mu USING (event_type) GROUP BY 1
),
lags AS (SELECT UNNEST(generate_series(1, 10)) AS k),
rho AS (
  SELECT a.event_type, l.k,
         SUM((a.m - mu.yb) * (b.m - mu.yb)) / MAX(den.denom) AS r
  FROM lags l
  JOIN pos a ON TRUE
  JOIN pos b ON b.event_type = a.event_type AND b.rn = a.rn - l.k
  JOIN mu ON mu.event_type = a.event_type
  JOIN den ON den.event_type = a.event_type
  GROUP BY 1, 2
)
SELECT rho.event_type,
       CAST(mu.n AS BIGINT) AS n_obs,
       CAST(10 AS BIGINT) AS df,
       ROUND(ROUND(mu.n * (mu.n + 2.0) * SUM(rho.r * rho.r / (mu.n - rho.k)), 9), 6) AS q_stat
FROM rho JOIN mu USING (event_type)
GROUP BY rho.event_type, mu.n
ORDER BY rho.event_type
"""


def q_bocpd(sf_dir: str):
    """Bayesian online changepoint detection (Adams & MacKay 2007;
    stages/streamdetect.py:bocpd_normal — Normal-Inverse-Gamma
    conjugate, Student-t predictive, constant hazard 1/250, MAP
    run-length-collapse changepoint rule) per event_type on the 6dp
    hourly means. The Bayesian member of the drift family (CUSUM /
    Page-Hinkley / ADWIN / EWMA are frequentist). Posterior recursion
    is not SQL-expressible -> rows-only; planted-shift pytests pin the
    kernel."""
    from ..stages.streamdetect import bocpd_normal

    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    rows = []
    for k, g in t1h.groupby("event_type", sort=True):
        g = g.sort_values("bucket_ts")
        y = g["m"].to_numpy(dtype=np.float64)
        r = bocpd_normal(y)
        cps = r["cp_positions"]
        bts = pd.to_datetime(g["bucket_ts"]).reset_index(drop=True)
        rows.append({
            "event_type": k,
            "n_obs": len(y),
            "n_cps": int(len(cps)),
            "first_cp": bts.iloc[int(cps[0])] if len(cps) else pd.NaT,
            "last_cp": bts.iloc[int(cps[-1])] if len(cps) else pd.NaT,
            "final_map_runlength": r["map_runlength_final"],
            "max_p_cp": stable_round6(np.array([r["p_cp"][1:].max()]))[0],
        })
    out = pd.DataFrame(rows)
    out["n_obs"] = out["n_obs"].astype("int64")
    out["n_cps"] = out["n_cps"].astype("int64")
    out["final_map_runlength"] = out["final_map_runlength"].astype("int64")
    for c in ("first_cp", "last_cp"):
        out[c] = pd.to_datetime(out[c]).astype("datetime64[us]")
    return out.sort_values("event_type").reset_index(drop=True)


def q_hp_filter(sf_dir: str):
    """Hodrick-Prescott trend/cycle decomposition (Hodrick & Prescott
    1997; stages/trend.py:hp_filter, lambda 1600) per event_type on
    the 6dp hourly means. The pentadiagonal normal-equation solve is
    not SQL-expressible -> rows-only; pinned by the exact invariants
    (HP of a linear series is the series; cycle sums to ~0;
    second-difference penalty balances the residual gradient)."""
    from ..stages.trend import hp_filter

    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    parts = []
    for k, g in t1h.groupby("event_type", sort=True):
        g = g.sort_values("bucket_ts")
        y = g["m"].to_numpy(dtype=np.float64)
        trend, cycle = hp_filter(y, lam=1600.0)
        parts.append(pd.DataFrame({
            "event_type": k,
            "bucket_ts": pd.to_datetime(g["bucket_ts"]).to_numpy(),
            "m": y,
            "hp_trend": stable_round6(trend),
            "hp_cycle": stable_round6(cycle),
        }))
    out = pd.concat(parts, ignore_index=True)
    out["bucket_ts"] = out["bucket_ts"].astype("datetime64[us]")
    return out.sort_values(["event_type", "bucket_ts"]).reset_index(drop=True)


def q_ssa(sf_dir: str):
    """Singular spectrum analysis (Broomhead & King 1986, Golyandina
    2001; stages/decompose.py:ssa_decompose — L=72 trajectory window,
    top-6 eigentriples, Hankel diagonal averaging) per event_type on
    the 6dp hourly means: rank-r reconstruction + residual per bucket
    and the kept eigenvalue shares. Eigendecomposition is not
    SQL-expressible -> rows-only; separability pins in pytest (a
    noiseless trend+seasonal reconstructs to 1e-10)."""
    from ..stages.decompose import ssa_decompose

    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    parts = []
    for k, g in t1h.groupby("event_type", sort=True):
        g = g.sort_values("bucket_ts")
        y = g["m"].to_numpy(dtype=np.float64)
        r = ssa_decompose(y, window=72, rank=6)
        parts.append(pd.DataFrame({
            "event_type": k,
            "bucket_ts": pd.to_datetime(g["bucket_ts"]).to_numpy(),
            "m": y,
            "ssa_recon": stable_round6(r["recon"]),
            "ssa_resid": stable_round6(r["resid"]),
            "ev1_share": stable_round6(np.full(len(y), r["sv_share"][0])),
        }))
    out = pd.concat(parts, ignore_index=True)
    out["bucket_ts"] = out["bucket_ts"].astype("datetime64[us]")
    return out.sort_values(["event_type", "bucket_ts"]).reset_index(drop=True)


def q_emd(sf_dir: str):
    """Empirical mode decomposition (Huang et al. 1998;
    stages/decompose.py:emd — natural-cubic envelope sifting, SD stop
    0.3, exact-reconstruction identity) per event_type on the 6dp
    hourly means: the first two intrinsic mode functions, the final
    residual trend, and the IMF count. Sifting is iterative and
    spline-based -> rows-only; separation and exact-reconstruction
    pins in pytest."""
    from ..stages.decompose import emd

    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    parts = []
    for k, g in t1h.groupby("event_type", sort=True):
        g = g.sort_values("bucket_ts")
        y = g["m"].to_numpy(dtype=np.float64)
        imfs = emd(y)
        z = np.zeros(len(y))
        parts.append(pd.DataFrame({
            "event_type": k,
            "bucket_ts": pd.to_datetime(g["bucket_ts"]).to_numpy(),
            "m": y,
            "imf1": stable_round6(imfs[0] if len(imfs) > 1 else z),
            "imf2": stable_round6(imfs[1] if len(imfs) > 2 else z),
            "trend_resid": stable_round6(imfs[-1]),
            "n_imfs": len(imfs) - 1,
        }))
    out = pd.concat(parts, ignore_index=True)
    out["bucket_ts"] = out["bucket_ts"].astype("datetime64[us]")
    out["n_imfs"] = out["n_imfs"].astype("int64")
    return out.sort_values(["event_type", "bucket_ts"]).reset_index(drop=True)


def q_tpch_q3_topk(sf_dir: str):
    """TPC-H Q3-shape analytical pipeline exercising the join
    primitives end-to-end (stages/joins.py:hash_join semi + inner):
    customers in one market segment -> SEMI hash join filters orders
    (date-bounded) -> INNER hash join with date-bounded lineitems ->
    per-order revenue sum(extendedprice * (1 - discount)) via
    per-batch partials + slim driver combine -> top 10 by ROUNDED
    revenue (desc, orderkey asc — both sides rank the same rounded
    value so the cut is deterministic). Each fact side moves exactly
    once; the segment filter is an existence semi-join, never a row
    multiplication."""
    from ..stages.exchange import driver_combine
    from ..stages.joins import hash_join

    cutoff = "1998-01-01"
    cust = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    ).filter(expr="c_mktsegment == 'BUILDING'").map_batches(
        lambda t: t.select(["c_custkey"]).rename_columns(["o_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(
        lambda df: df[df["o_orderdate"] < pd.Timestamp(cutoff)],
        batch_format="pandas",
    )
    o2 = hash_join(orders, cust, on="o_custkey", how="semi").map_batches(
        lambda t: t.select(["o_orderkey", "o_orderdate"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(
        lambda df: df[df["l_shipdate"] > pd.Timestamp(cutoff)].drop(
            columns=["l_shipdate"]).rename(columns={"l_orderkey": "o_orderkey"}),
        batch_format="pandas",
    )
    j = hash_join(li, o2, on="o_orderkey", how="inner")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(rev=df["l_extendedprice"] * (1.0 - df["l_discount"]))
        return df.groupby(["o_orderkey", "o_orderdate"], as_index=False).agg(
            rev=("rev", "sum"), n=("rev", "size"))

    g = driver_combine(
        j, partial,
        lambda df: df.groupby(["o_orderkey", "o_orderdate"], as_index=False).agg(
            rev=("rev", "sum"), n=("n", "sum")),
        batch_format="pandas",
    )
    g["revenue"] = stable_round6(g["rev"].astype(float))
    g = g.sort_values(["revenue", "o_orderkey"],
                      ascending=[False, True]).head(10)
    out = pd.DataFrame({
        "o_orderkey": g["o_orderkey"].astype("int64"),
        "o_orderdate": pd.to_datetime(g["o_orderdate"]).astype("datetime64[us]"),
        "n_items": g["n"].astype("int64"),
        "revenue": g["revenue"],
    })
    return out.reset_index(drop=True)


_SQL_TPCH_Q3 = """
SELECT l.l_orderkey::BIGINT AS o_orderkey,
       o.o_orderdate,
       COUNT(*)::BIGINT AS n_items,
       ROUND(ROUND(SUM(l.l_extendedprice * (1.0 - l.l_discount)), 9), 6) AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
  AND EXISTS (SELECT 1 FROM customer c
              WHERE c.c_custkey = o.o_custkey
                AND c.c_mktsegment = 'BUILDING')
GROUP BY 1, 2
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q_regression_diagnostics(sf_dir: str):
    """OLS regression diagnostics battery (Durbin & Watson 1950 serial
    correlation statistic; Cook 1977 influence distance with the exact
    simple-regression hat values h_i = 1/n + (x_i - xbar)^2 / Sxx) for
    every ordered event-type pair over the bucket-joined 6dp hourly
    means: DW = sum (e_i - e_{i-1})^2 / sum e_i^2 in bucket order,
    max Cook's D, and the count of influential points (D > 4/n). The
    residuals e = y - a - b x and all moments share expression order
    with the SQL replay (regression.py companion to
    q_linear_regression)."""
    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    by = {k: g.set_index("bucket_ts")["m"] for k, g in t1h.groupby("event_type")}
    rows = []
    for ex in sorted(by):
        for ey in sorted(by):
            if ex == ey:
                continue
            j = pd.concat([by[ex].rename("x"), by[ey].rename("y")],
                          axis=1, join="inner").sort_index()
            x, y = j["x"].to_numpy(), j["y"].to_numpy()
            n = float(len(j))
            if n < 5:
                continue
            mx, my = x.sum() / n, y.sum() / n
            sxx = (x * x).sum() - n * mx * mx
            sxy = (x * y).sum() - n * mx * my
            b = sxy / sxx
            a = my - b * mx
            e = y - a - b * x
            sse = (e * e).sum()
            dw = ((e[1:] - e[:-1]) ** 2).sum() / sse
            s2 = sse / (n - 2.0)
            h = 1.0 / n + (x - mx) ** 2 / sxx
            cooks = e * e * h / (2.0 * s2 * (1.0 - h) ** 2)
            rows.append({
                "event_x": ex, "event_y": ey, "n": int(n),
                "dw": dw, "max_cooks_d": cooks.max(),
                "n_influential": int((cooks > 4.0 / n).sum()),
            })
    out = pd.DataFrame(rows)
    for c in ("dw", "max_cooks_d"):
        out[c] = stable_round6(out[c].astype(float))
    out["n_influential"] = out["n_influential"].astype("int64")
    return out.sort_values(["event_x", "event_y"]).reset_index(drop=True)


_SQL_REG_DIAG = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
pairs AS (
  SELECT a.event_type AS event_x, b.event_type AS event_y, a.bts, a.m AS x, b.m AS y
  FROM hourly a JOIN hourly b
    ON a.bts = b.bts AND a.event_type <> b.event_type
),
mom AS (
  SELECT event_x, event_y, COUNT(*)::DOUBLE AS n,
         SUM(x) / COUNT(*) AS mx, SUM(y) / COUNT(*) AS my,
         SUM(x * x) AS sxx_raw, SUM(x * y) AS sxy_raw
  FROM pairs GROUP BY 1, 2 HAVING COUNT(*) >= 5
),
fit AS (
  SELECT event_x, event_y, n, mx, my,
         sxx_raw - n * mx * mx AS sxx,
         (sxy_raw - n * mx * my) / (sxx_raw - n * mx * mx) AS b
  FROM mom
),
resid AS (
  SELECT p.event_x, p.event_y, p.bts, f.n, f.sxx, f.mx,
         p.y - (f.my - f.b * f.mx) - f.b * p.x AS e,
         p.x
  FROM pairs p JOIN fit f USING (event_x, event_y)
),
lagged AS (
  SELECT *, LAG(e) OVER (PARTITION BY event_x, event_y ORDER BY bts) AS eprev
  FROM resid
),
agg AS (
  SELECT event_x, event_y, MAX(n) AS n, MAX(sxx) AS sxx, MAX(mx) AS mx,
         SUM(e * e) AS sse,
         SUM(CASE WHEN eprev IS NULL THEN 0 ELSE (e - eprev) * (e - eprev) END) AS sdiff
  FROM lagged GROUP BY 1, 2
),
cooks AS (
  SELECT r.event_x, r.event_y, a.n,
         r.e * r.e * (1.0 / a.n + (r.x - a.mx) * (r.x - a.mx) / a.sxx)
         / (2.0 * (a.sse / (a.n - 2.0))
            * POW(1.0 - (1.0 / a.n + (r.x - a.mx) * (r.x - a.mx) / a.sxx), 2)) AS d
  FROM resid r JOIN agg a USING (event_x, event_y)
)
SELECT agg.event_x, agg.event_y, CAST(agg.n AS BIGINT) AS n,
       ROUND(ROUND(agg.sdiff / agg.sse, 9), 6) AS dw,
       ROUND(ROUND(MAX(cooks.d), 9), 6) AS max_cooks_d,
       CAST(SUM(CASE WHEN cooks.d > 4.0 / agg.n THEN 1 ELSE 0 END) AS BIGINT) AS n_influential
FROM agg JOIN cooks USING (event_x, event_y)
GROUP BY agg.event_x, agg.event_y, agg.n, agg.sdiff, agg.sse
ORDER BY event_x, event_y
"""


def q_chow_test(sf_dir: str):
    """Chow structural-break F test (Chow 1960) per event_type: OLS of
    the 6dp hourly mean on its row position, pooled vs split at the
    midpoint n//2; F = ((RSS_p - RSS_1 - RSS_2) / k) /
    ((RSS_1 + RSS_2) / (n - 2k)) with k = 2 regressors. RSS in the
    centered-moment closed form (syy - sxy^2/sxx, explicit n*mean
    centering — the dickey_fuller convention), replayed verbatim in
    SQL over three moment groups. The parametric complement to the
    Pettitt / CUSUM / BOCPD changepoint family."""
    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    rows = []

    def rss(pos: np.ndarray, v: np.ndarray) -> float:
        n = float(len(v))
        mx, my = pos.sum() / n, v.sum() / n
        sxx = (pos * pos).sum() - n * mx * mx
        sxy = (pos * v).sum() - n * mx * my
        syy = (v * v).sum() - n * my * my
        return syy - sxy * sxy / sxx

    for k, g in t1h.groupby("event_type", sort=True):
        v = g.sort_values("bucket_ts")["m"].to_numpy(dtype=np.float64)
        n = len(v)
        m = n // 2
        if m < 3 or n - m < 3:
            continue
        pos = np.arange(1, n + 1, dtype=np.float64)
        rss_p = rss(pos, v)
        rss_1 = rss(pos[:m], v[:m])
        rss_2 = rss(pos[m:], v[m:])
        f = ((rss_p - rss_1 - rss_2) / 2.0) / ((rss_1 + rss_2) / (n - 4.0))
        rows.append({"event_type": k, "n": n, "split_at": m, "f_stat": f})
    out = pd.DataFrame(rows)
    out["n"] = out["n"].astype("int64")
    out["split_at"] = out["split_at"].astype("int64")
    out["f_stat"] = stable_round6(out["f_stat"].astype(float))
    return out.sort_values("event_type").reset_index(drop=True)


_SQL_CHOW = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
pos AS (
  SELECT event_type, m,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bts)::DOUBLE AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM hourly
),
seg AS (
  SELECT event_type, m, rn, n,
         CASE WHEN rn <= n // 2 THEN 1 ELSE 2 END AS half
  FROM pos WHERE n // 2 >= 3 AND n - n // 2 >= 3
),
smom AS (
  SELECT event_type, half, COUNT(*)::DOUBLE AS cn,
         SUM(rn) / COUNT(*) AS mx, SUM(m) / COUNT(*) AS my,
         SUM(rn * rn) AS sxx_raw, SUM(rn * m) AS sxy_raw, SUM(m * m) AS syy_raw
  FROM seg GROUP BY 1, 2
),
srss AS (
  SELECT event_type, half,
         (syy_raw - cn * my * my)
         - POW(sxy_raw - cn * mx * my, 2) / (sxx_raw - cn * mx * mx) AS rss
  FROM smom
),
pmom AS (
  SELECT event_type, COUNT(*)::DOUBLE AS cn, MAX(n) AS n, MAX(n) // 2 AS split_at,
         SUM(rn) / COUNT(*) AS mx, SUM(m) / COUNT(*) AS my,
         SUM(rn * rn) AS sxx_raw, SUM(rn * m) AS sxy_raw, SUM(m * m) AS syy_raw
  FROM seg GROUP BY 1
),
prss AS (
  SELECT event_type, n, split_at, cn,
         (syy_raw - cn * my * my)
         - POW(sxy_raw - cn * mx * my, 2) / (sxx_raw - cn * mx * mx) AS rss_p
  FROM pmom
),
halves AS (
  SELECT event_type,
         SUM(CASE WHEN half = 1 THEN rss END) AS rss_1,
         SUM(CASE WHEN half = 2 THEN rss END) AS rss_2
  FROM srss GROUP BY 1
)
SELECT p.event_type, CAST(p.n AS BIGINT) AS n, CAST(p.split_at AS BIGINT) AS split_at,
       ROUND(ROUND(((p.rss_p - h.rss_1 - h.rss_2) / 2.0)
             / ((h.rss_1 + h.rss_2) / (p.cn - 4.0)), 9), 6) AS f_stat
FROM prss p JOIN halves h USING (event_type)
ORDER BY event_type
"""


def q_cointegration_eg(sf_dir: str):
    """Engle-Granger two-step cointegration test (Engle & Granger
    1987) for every ordered event-type pair: step 1 — OLS y ~ x on the
    bucket-joined 6dp hourly means (the q_linear_regression fit);
    step 2 — Dickey-Fuller regression de_t = a + b e_{t-1} on the
    step-1 residuals in bucket order, t statistic on b (the
    q_dickey_fuller closed form), cointegrated where the ROUNDED t is
    below the Engle-Granger 5%% two-variable critical value -3.34
    (both sides threshold the same rounded value, so the flag is
    deterministic)."""
    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    by = {k: g.set_index("bucket_ts")["m"] for k, g in t1h.groupby("event_type")}
    rows = []
    for ex in sorted(by):
        for ey in sorted(by):
            if ex == ey:
                continue
            j = pd.concat([by[ex].rename("x"), by[ey].rename("y")],
                          axis=1, join="inner").sort_index()
            x, y = j["x"].to_numpy(), j["y"].to_numpy()
            n = float(len(j))
            if n < 10:
                continue
            mx, my = x.sum() / n, y.sum() / n
            sxx = (x * x).sum() - n * mx * mx
            sxy = (x * y).sum() - n * mx * my
            b = sxy / sxx
            a = my - b * mx
            e = y - a - b * x
            el, d = e[:-1], np.diff(e)
            nn = float(len(el))
            mex, mey = el.sum() / nn, d.sum() / nn
            exx = (el * el).sum() - nn * mex * mex
            exy = (el * d).sum() - nn * mex * mey
            eyy = (d * d).sum() - nn * mey * mey
            g_ = exy / exx
            ssr = eyy - g_ * exy
            t = g_ / np.sqrt(ssr / (nn - 2.0) / exx)
            rows.append({"event_x": ex, "event_y": ey, "n": int(n),
                         "beta": b, "tstat_adf": t})
    out = pd.DataFrame(rows)
    out["beta"] = stable_round6(out["beta"].astype(float))
    out["tstat_adf"] = stable_round6(out["tstat_adf"].astype(float))
    out["cointegrated"] = (out["tstat_adf"] < -3.34).astype("int64")
    return out.sort_values(["event_x", "event_y"]).reset_index(drop=True)


_SQL_COINTEGRATION = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
pairs AS (
  SELECT a.event_type AS event_x, b.event_type AS event_y, a.bts, a.m AS x, b.m AS y
  FROM hourly a JOIN hourly b
    ON a.bts = b.bts AND a.event_type <> b.event_type
),
mom AS (
  SELECT event_x, event_y, COUNT(*)::DOUBLE AS n,
         SUM(x) / COUNT(*) AS mx, SUM(y) / COUNT(*) AS my,
         SUM(x * x) AS sxx_raw, SUM(x * y) AS sxy_raw
  FROM pairs GROUP BY 1, 2 HAVING COUNT(*) >= 10
),
fit AS (
  SELECT event_x, event_y, n, mx, my,
         (sxy_raw - n * mx * my) / (sxx_raw - n * mx * mx) AS b
  FROM mom
),
resid AS (
  SELECT p.event_x, p.event_y, p.bts, f.n, f.b,
         p.y - (f.my - f.b * f.mx) - f.b * p.x AS e
  FROM pairs p JOIN fit f USING (event_x, event_y)
),
lagged AS (
  SELECT event_x, event_y, n, b,
         LAG(e) OVER (PARTITION BY event_x, event_y ORDER BY bts) AS el,
         e - LAG(e) OVER (PARTITION BY event_x, event_y ORDER BY bts) AS d
  FROM resid
),
emom AS (
  SELECT event_x, event_y, MAX(n) AS n, MAX(b) AS b, COUNT(*)::DOUBLE AS nn,
         SUM(el) / COUNT(*) AS mex, SUM(d) / COUNT(*) AS mey,
         SUM(el * el) AS exx_raw, SUM(el * d) AS exy_raw, SUM(d * d) AS eyy_raw
  FROM lagged WHERE el IS NOT NULL GROUP BY 1, 2
),
tstat AS (
  SELECT event_x, event_y, n, b,
         ((exy_raw - nn * mex * mey) / (exx_raw - nn * mex * mex))
         / sqrt(((eyy_raw - nn * mey * mey)
                 - (exy_raw - nn * mex * mey) / (exx_raw - nn * mex * mex)
                   * (exy_raw - nn * mex * mey))
                / (nn - 2.0) / (exx_raw - nn * mex * mex)) AS t
  FROM emom
)
SELECT event_x, event_y, CAST(n AS BIGINT) AS n,
       ROUND(ROUND(b, 9), 6) AS beta,
       ROUND(ROUND(t, 9), 6) AS tstat_adf,
       CAST(CASE WHEN ROUND(ROUND(t, 9), 6) < -3.34 THEN 1 ELSE 0 END AS BIGINT) AS cointegrated
FROM tstat ORDER BY event_x, event_y
"""


def q_variogram(sf_dir: str):
    """Empirical semivariogram (Matheron 1962) per event_type over the
    6dp hourly means: gamma(h) = mean((y_{t+h} - y_t)^2) / 2 at
    calendar lags 1..12 h, pairwise-complete (a pair exists only where
    BOTH buckets exist — the acf_lags convention). The geostatistics
    view of temporal structure; SQL replay is a lag self-join."""
    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    rows = []
    for k, g in t1h.groupby("event_type", sort=True):
        s = g.set_index(pd.to_datetime(g["bucket_ts"]))["m"].sort_index()
        for h in range(1, 13):
            shifted = s.copy()
            shifted.index = shifted.index - pd.Timedelta(hours=h)
            j = pd.concat([s.rename("a"), shifted.rename("b")],
                          axis=1, join="inner")
            if len(j) < 2:
                continue
            d = j["b"].to_numpy() - j["a"].to_numpy()
            rows.append({"event_type": k, "lag": h, "n_pairs": len(j),
                         "gamma": (d * d).sum() / len(j) / 2.0})
    out = pd.DataFrame(rows)
    out["lag"] = out["lag"].astype("int64")
    out["n_pairs"] = out["n_pairs"].astype("int64")
    out["gamma"] = stable_round6(out["gamma"].astype(float))
    return out.sort_values(["event_type", "lag"]).reset_index(drop=True)


_SQL_VARIOGRAM = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
lags AS (SELECT UNNEST(generate_series(1, 12)) AS lag),
pairs AS (
  SELECT a.event_type, l.lag, (b.m - a.m) AS d
  FROM lags l
  JOIN hourly a ON TRUE
  JOIN hourly b ON b.event_type = a.event_type
                AND b.bts = a.bts + to_hours(l.lag::BIGINT)
)
SELECT event_type, CAST(lag AS BIGINT) AS lag,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(ROUND(SUM(d * d) / COUNT(*) / 2.0, 9), 6) AS gamma
FROM pairs GROUP BY 1, 2 HAVING COUNT(*) >= 2
ORDER BY event_type, lag
"""


def q_effective_sample_size(sf_dir: str):
    """Autocorrelation time and effective sample size (the MCMC / time
    series ESS convention, e.g. Geyer 1992): ESS = n / (1 + 2 *
    sum_{k=1..10} rho_k) with the biased positional Box-Jenkins
    autocorrelation of q_ljung_box, per event_type on the 6dp hourly
    means. Fixed-m truncation (documented) keeps the statistic exactly
    SQL-replayable."""
    from ..stages.trend import ljung_box_q  # shares the rho estimator

    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    rows = []
    for k, g in t1h.groupby("event_type", sort=True):
        y = g.sort_values("bucket_ts")["m"].to_numpy(dtype=np.float64)
        n = len(y)
        yb = y.sum() / n
        d = y - yb
        denom = (d * d).sum()
        s = 0.0
        for kk in range(1, 11):
            s += (d[kk:] * d[:-kk]).sum() / denom
        act = 1.0 + 2.0 * s
        rows.append({"event_type": k, "n_obs": n, "act": act,
                     "ess": n / act})
    out = pd.DataFrame(rows)
    out["n_obs"] = out["n_obs"].astype("int64")
    for c in ("act", "ess"):
        out[c] = stable_round6(out[c].astype(float))
    return out.sort_values("event_type").reset_index(drop=True)


_SQL_ESS = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
pos AS (
  SELECT event_type, m,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bts) AS rn
  FROM hourly
),
mu AS (
  SELECT event_type, SUM(m) / COUNT(*) AS yb, COUNT(*)::DOUBLE AS n
  FROM pos GROUP BY event_type
),
den AS (
  SELECT p.event_type, SUM((p.m - mu.yb) * (p.m - mu.yb)) AS denom
  FROM pos p JOIN mu USING (event_type) GROUP BY 1
),
lags AS (SELECT UNNEST(generate_series(1, 10)) AS k),
rho AS (
  SELECT a.event_type,
         SUM((a.m - mu.yb) * (b.m - mu.yb)) / MAX(den.denom) AS r
  FROM lags l
  JOIN pos a ON TRUE
  JOIN pos b ON b.event_type = a.event_type AND b.rn = a.rn - l.k
  JOIN mu ON mu.event_type = a.event_type
  JOIN den ON den.event_type = a.event_type
  GROUP BY a.event_type, l.k
),
act AS (
  SELECT event_type, 1.0 + 2.0 * SUM(r) AS act FROM rho GROUP BY 1
)
SELECT act.event_type, CAST(mu.n AS BIGINT) AS n_obs,
       ROUND(ROUND(act.act, 9), 6) AS act,
       ROUND(ROUND(mu.n / act.act, 9), 6) AS ess
FROM act JOIN mu USING (event_type)
ORDER BY event_type
"""


def q_dfa(sf_dir: str):
    """Detrended fluctuation analysis (Peng et al. 1994;
    stages/trend.py:dfa_alpha) per event_type on the 6dp hourly means:
    integrated profile, per-window OLS detrend at dyadic scales,
    ln F - ln n slope = the DFA exponent. The long-memory complement
    to Hurst R/S (hurst_exponent); window regressions are not
    SQL-expressible -> rows-only, white~0.5/Brownian~1.5 pytest pins."""
    from ..stages.trend import dfa_alpha

    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    rows = []
    for k, g in t1h.groupby("event_type", sort=True):
        y = g.sort_values("bucket_ts")["m"].to_numpy(dtype=np.float64)
        r = dfa_alpha(y)
        rows.append({"event_type": k, "n_obs": len(y),
                     "n_scales": r["n_scales"],
                     "alpha": stable_round6(np.array([r["alpha"]]))[0]})
    out = pd.DataFrame(rows)
    out["n_obs"] = out["n_obs"].astype("int64")
    out["n_scales"] = out["n_scales"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def q_jarque_bera(sf_dir: str):
    """Jarque-Bera normality test (Jarque & Bera 1980) per event_type
    on the 6dp hourly means: population central moments about the
    mean, skewness S = m3 / m2^1.5, excess kurtosis K = m4 / m2^2 - 3,
    JB = n/6 * (S^2 + K^2/4). Two-pass moment expressions shared
    verbatim with the SQL replay (mean precomputed, centered powers
    summed)."""
    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    rows = []
    for k, g in t1h.groupby("event_type", sort=True):
        y = g["m"].to_numpy(dtype=np.float64)
        n = float(len(y))
        mu = y.sum() / n
        d = y - mu
        m2 = (d * d).sum() / n
        m3 = (d * d * d).sum() / n
        m4 = (d * d * d * d).sum() / n
        s = m3 / m2 ** 1.5
        kk = m4 / (m2 * m2) - 3.0
        rows.append({"event_type": k, "n": int(n), "skew": s,
                     "ex_kurtosis": kk,
                     "jb_stat": n / 6.0 * (s * s + kk * kk / 4.0)})
    out = pd.DataFrame(rows)
    out["n"] = out["n"].astype("int64")
    for c in ("skew", "ex_kurtosis", "jb_stat"):
        out[c] = stable_round6(out[c].astype(float))
    return out.sort_values("event_type").reset_index(drop=True)


_SQL_JARQUE_BERA = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
mu AS (SELECT event_type, SUM(m) / COUNT(*) AS mean_m, COUNT(*)::DOUBLE AS n
       FROM hourly GROUP BY 1),
mom AS (
  SELECT h.event_type, MAX(mu.n) AS n,
         SUM((h.m - mu.mean_m) * (h.m - mu.mean_m)) / MAX(mu.n) AS m2,
         SUM((h.m - mu.mean_m) * (h.m - mu.mean_m) * (h.m - mu.mean_m)) / MAX(mu.n) AS m3,
         SUM((h.m - mu.mean_m) * (h.m - mu.mean_m) * (h.m - mu.mean_m) * (h.m - mu.mean_m)) / MAX(mu.n) AS m4
  FROM hourly h JOIN mu USING (event_type) GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       ROUND(ROUND(m3 / POW(m2, 1.5), 9), 6) AS skew,
       ROUND(ROUND(m4 / (m2 * m2) - 3.0, 9), 6) AS ex_kurtosis,
       ROUND(ROUND(n / 6.0 * (POW(m3 / POW(m2, 1.5), 2)
             + POW(m4 / (m2 * m2) - 3.0, 2) / 4.0), 9), 6) AS jb_stat
FROM mom ORDER BY event_type
"""


def q_breusch_pagan(sf_dir: str):
    """Breusch-Pagan heteroskedasticity LM test (Breusch & Pagan 1979,
    Koenker's studentized form: LM = n * R^2 of e^2 on x) for every
    ordered event-type pair over the bucket-joined hourly means —
    completes the regression-diagnostics battery (DW/Cook's D). All
    moments closed-form and shared with the SQL replay."""
    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    by = {k: g.set_index("bucket_ts")["m"] for k, g in t1h.groupby("event_type")}
    rows = []
    for ex in sorted(by):
        for ey in sorted(by):
            if ex == ey:
                continue
            j = pd.concat([by[ex].rename("x"), by[ey].rename("y")],
                          axis=1, join="inner").sort_index()
            x, y = j["x"].to_numpy(), j["y"].to_numpy()
            n = float(len(j))
            if n < 5:
                continue
            mx, my = x.sum() / n, y.sum() / n
            sxx = (x * x).sum() - n * mx * mx
            sxy = (x * y).sum() - n * mx * my
            b = sxy / sxx
            e2 = (y - (my - b * mx) - b * x) ** 2
            me = e2.sum() / n
            sxe = (x * e2).sum() - n * mx * me
            see = (e2 * e2).sum() - n * me * me
            r2 = sxe * sxe / (sxx * see)
            rows.append({"event_x": ex, "event_y": ey, "n": int(n),
                         "lm_stat": n * r2})
    out = pd.DataFrame(rows)
    out["lm_stat"] = stable_round6(out["lm_stat"].astype(float))
    return out.sort_values(["event_x", "event_y"]).reset_index(drop=True)


_SQL_BREUSCH_PAGAN = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
pairs AS (
  SELECT a.event_type AS event_x, b.event_type AS event_y, a.bts, a.m AS x, b.m AS y
  FROM hourly a JOIN hourly b
    ON a.bts = b.bts AND a.event_type <> b.event_type
),
mom AS (
  SELECT event_x, event_y, COUNT(*)::DOUBLE AS n,
         SUM(x) / COUNT(*) AS mx, SUM(y) / COUNT(*) AS my,
         SUM(x * x) AS sxx_raw, SUM(x * y) AS sxy_raw
  FROM pairs GROUP BY 1, 2 HAVING COUNT(*) >= 5
),
fit AS (
  SELECT event_x, event_y, n, mx, my,
         sxx_raw - n * mx * mx AS sxx,
         (sxy_raw - n * mx * my) / (sxx_raw - n * mx * mx) AS b
  FROM mom
),
r AS (
  SELECT p.event_x, p.event_y, f.n, f.sxx, f.mx, p.x,
         POW(p.y - (f.my - f.b * f.mx) - f.b * p.x, 2) AS e2
  FROM pairs p JOIN fit f USING (event_x, event_y)
),
emom AS (
  SELECT event_x, event_y, MAX(n) AS n, MAX(sxx) AS sxx, MAX(mx) AS mx,
         SUM(e2) / MAX(n) AS me,
         SUM(x * e2) AS sxe_raw, SUM(e2 * e2) AS see_raw
  FROM r GROUP BY 1, 2
)
SELECT event_x, event_y, CAST(n AS BIGINT) AS n,
       ROUND(ROUND(n * POW(sxe_raw - n * mx * me, 2)
             / (sxx * (see_raw - n * me * me)), 9), 6) AS lm_stat
FROM emom ORDER BY event_x, event_y
"""


def q_kruskal_wallis(sf_dir: str):
    """Kruskal-Wallis rank ANOVA (Kruskal & Wallis 1952) across ALL
    event types on the 6dp hourly means: average ranks for ties
    (rank + (t-1)/2 on the rounded values, identical rule both sides),
    H = 12/(N(N+1)) * sum R_i^2/n_i - 3(N+1), tie correction
    C = 1 - sum(t^3 - t)/(N^3 - N), H_adj = H / C. One row —
    the nonparametric one-way ANOVA over groups."""
    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    v = t1h["m"].to_numpy(dtype=np.float64)
    grp = t1h["event_type"].to_numpy()
    order = np.argsort(v, kind="stable")
    sv = v[order]
    n_tot = len(sv)
    # average rank per distinct value: first position + (t-1)/2, 1-based
    uniq, first, counts = np.unique(sv, return_index=True, return_counts=True)
    avg_rank = first + 1 + (counts - 1) / 2.0
    rank_of = dict(zip(uniq, avg_rank))
    ranks = np.fromiter((rank_of[x] for x in v), dtype=np.float64, count=n_tot)
    nn = float(n_tot)
    h = 0.0
    k = 0
    for _, gi in pd.Series(ranks).groupby(pd.Series(grp)):
        h += gi.sum() ** 2 / len(gi)
        k += 1
    h = 12.0 / (nn * (nn + 1.0)) * h - 3.0 * (nn + 1.0)
    tie = 1.0 - ((counts.astype(np.float64) ** 3 - counts).sum()
                 / (nn ** 3 - nn))
    out = pd.DataFrame([{
        "n_total": n_tot, "n_groups": k,
        "h_stat": stable_round6(np.array([h]))[0],
        "tie_correction": stable_round6(np.array([tie]))[0],
        "h_adj": stable_round6(np.array([h / tie]))[0],
    }])
    out["n_total"] = out["n_total"].astype("int64")
    out["n_groups"] = out["n_groups"].astype("int64")
    return out


_SQL_KRUSKAL = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
ranked AS (
  SELECT event_type, m,
         RANK() OVER (ORDER BY m) AS rk,
         COUNT(*) OVER (PARTITION BY m) AS t
  FROM hourly
),
avgr AS (SELECT event_type, rk + (t - 1) / 2.0 AS r, t FROM ranked),
grp AS (
  SELECT event_type, SUM(r) AS rsum, COUNT(*)::DOUBLE AS ng
  FROM avgr GROUP BY 1
),
tot AS (SELECT COUNT(*)::DOUBLE AS n FROM hourly),
ties AS (
  SELECT SUM(tc * tc * tc - tc) AS tsum
  FROM (SELECT COUNT(*)::DOUBLE AS tc FROM hourly GROUP BY m)
),
h AS (
  SELECT tot.n,
         (SELECT COUNT(*) FROM grp) AS k,
         12.0 / (tot.n * (tot.n + 1.0))
           * (SELECT SUM(rsum * rsum / ng) FROM grp)
           - 3.0 * (tot.n + 1.0) AS h_stat,
         1.0 - ties.tsum / (tot.n * tot.n * tot.n - tot.n) AS c
  FROM tot, ties
)
SELECT CAST(n AS BIGINT) AS n_total, CAST(k AS BIGINT) AS n_groups,
       ROUND(ROUND(h_stat, 9), 6) AS h_stat,
       ROUND(ROUND(c, 9), 6) AS tie_correction,
       ROUND(ROUND(h_stat / c, 9), 6) AS h_adj
FROM h
"""


def q_levene(sf_dir: str):
    """Levene variance-homogeneity test (Levene 1960, mean-centered
    form) across event types on the 6dp hourly means:
    z_ij = |y_ij - mean_i|, W = ((N-k)/(k-1)) * sum n_i (zbar_i -
    zbar)^2 / sum sum (z_ij - zbar_i)^2. The ANOVA-on-deviations
    closed form replays exactly in SQL (group means precomputed)."""
    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    zs, nis, zbars = [], [], []
    for _, g in t1h.groupby("event_type", sort=True):
        y = g["m"].to_numpy(dtype=np.float64)
        z = np.abs(y - y.sum() / len(y))
        zs.append(z)
        nis.append(float(len(z)))
        zbars.append(z.sum() / len(z))
    k = float(len(zs))
    n_tot = sum(nis)
    zbar = sum(z.sum() for z in zs) / n_tot
    between = sum(ni * (zb - zbar) ** 2 for ni, zb in zip(nis, zbars))
    within = sum(((z - zb) ** 2).sum() for z, zb in zip(zs, zbars))
    w = (n_tot - k) / (k - 1.0) * between / within
    out = pd.DataFrame([{
        "n_total": int(n_tot), "n_groups": int(k),
        "w_stat": stable_round6(np.array([w]))[0],
    }])
    out["n_total"] = out["n_total"].astype("int64")
    out["n_groups"] = out["n_groups"].astype("int64")
    return out


_SQL_LEVENE = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
gm AS (SELECT event_type, SUM(m) / COUNT(*) AS mean_m FROM hourly GROUP BY 1),
z AS (
  SELECT h.event_type, ABS(h.m - gm.mean_m) AS z
  FROM hourly h JOIN gm USING (event_type)
),
gz AS (
  SELECT event_type, COUNT(*)::DOUBLE AS ni, SUM(z) / COUNT(*) AS zbar_i
  FROM z GROUP BY 1
),
tot AS (
  SELECT SUM(ni) AS n, COUNT(*)::DOUBLE AS k,
         SUM(ni * zbar_i) / SUM(ni) AS zbar
  FROM gz
),
between_ AS (
  SELECT SUM(gz.ni * (gz.zbar_i - tot.zbar) * (gz.zbar_i - tot.zbar)) AS b
  FROM gz, tot
),
within_ AS (
  SELECT SUM((z.z - gz.zbar_i) * (z.z - gz.zbar_i)) AS w
  FROM z JOIN gz USING (event_type)
)
SELECT CAST(tot.n AS BIGINT) AS n_total, CAST(tot.k AS BIGINT) AS n_groups,
       ROUND(ROUND((tot.n - tot.k) / (tot.k - 1.0) * between_.b / within_.w, 9), 6) AS w_stat
FROM tot, between_, within_
"""


def q_dispersion_test(sf_dir: str):
    """Poisson dispersion test (Fisher 1950 index-of-dispersion /
    variance-to-mean ratio) per event_type over the DENSE hourly event
    counts (zeros included via the calendar grid — under-dispersion is
    invisible without them): D = s^2 / mean with the ddof=1 sample
    variance in the n-moment form, chi2 = (n - 1) * D. The classic
    count-data overdispersion screen; exact SQL replay via
    generate_series densification."""
    ds = _events(sf_dir, ["event_type", "ts"])
    bucketer = make_bucket_assigner(US_PER_HOUR, end_stamped=True)

    def partials(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        return df.groupby(["event_type", "bucket_ts"], as_index=False).size(
        ).rename(columns={"size": "cnt"})

    parts = ds.map_batches(bucketer, batch_format="pyarrow",
                           zero_copy_batch=True).map_batches(
        partials, batch_format="pyarrow").to_pandas()
    counts = parts.groupby(["event_type", "bucket_ts"], as_index=False)["cnt"].sum()
    rows = []
    for k, g in counts.groupby("event_type", sort=True):
        g = g.sort_values("bucket_ts")
        ts = pd.to_datetime(g["bucket_ts"])
        full = pd.date_range(ts.iloc[0], ts.iloc[-1], freq="1h")
        c = g.set_index(ts)["cnt"].reindex(full, fill_value=0).to_numpy(
            dtype=np.float64)
        n = float(len(c))
        mu = c.sum() / n
        var = ((c * c).sum() - n * mu * mu) / (n - 1.0)
        d = var / mu
        rows.append({"event_type": k, "n_periods": int(n),
                     "mean_count": mu, "dispersion": d,
                     "chi2": (n - 1.0) * d})
    out = pd.DataFrame(rows)
    out["n_periods"] = out["n_periods"].astype("int64")
    for c in ("mean_count", "dispersion", "chi2"):
        out[c] = stable_round6(out[c].astype(float))
    return out.sort_values("event_type").reset_index(drop=True)


_SQL_DISPERSION = """
WITH b AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bts,
         COUNT(*)::DOUBLE AS cnt
  FROM events GROUP BY 1, 2
),
span AS (SELECT event_type, MIN(bts) AS lo, MAX(bts) AS hi FROM b GROUP BY 1),
grid AS (
  SELECT s.event_type, g.g AS bts
  FROM span s, LATERAL (SELECT UNNEST(generate_series(s.lo, s.hi,
                         INTERVAL '1 hour')) AS g) g
),
dense AS (
  SELECT grid.event_type, COALESCE(b.cnt, 0.0) AS c
  FROM grid LEFT JOIN b ON b.event_type = grid.event_type AND b.bts = grid.bts
),
mom AS (
  SELECT event_type, COUNT(*)::DOUBLE AS n,
         SUM(c) / COUNT(*) AS mu, SUM(c * c) AS scc
  FROM dense GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_periods,
       ROUND(ROUND(mu, 9), 6) AS mean_count,
       ROUND(ROUND((scc - n * mu * mu) / (n - 1.0) / mu, 9), 6) AS dispersion,
       ROUND(ROUND((n - 1.0) * ((scc - n * mu * mu) / (n - 1.0) / mu), 9), 6) AS chi2
FROM mom ORDER BY event_type
"""


def q_spearman_corr(sf_dir: str):
    """Spearman rank correlation (Spearman 1904) for every ordered
    event-type pair over the bucket-joined 6dp hourly means:
    average-rank ties (rank + (t-1)/2 within the JOINED sample, the
    kruskal_wallis rule), then Pearson of the ranks in the shared
    n-product-moment form. The monotone-association companion to the
    Pearson battery (linear_regression / acf)."""
    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    by = {k: g.set_index("bucket_ts")["m"] for k, g in t1h.groupby("event_type")}

    def avg_ranks(v: np.ndarray) -> np.ndarray:
        order = np.argsort(v, kind="stable")
        sv = v[order]
        uniq, first, counts = np.unique(sv, return_index=True,
                                        return_counts=True)
        ar = first + 1 + (counts - 1) / 2.0
        lut = dict(zip(uniq, ar))
        return np.fromiter((lut[x] for x in v), dtype=np.float64,
                           count=len(v))

    rows = []
    for ex in sorted(by):
        for ey in sorted(by):
            if ex == ey:
                continue
            j = pd.concat([by[ex].rename("x"), by[ey].rename("y")],
                          axis=1, join="inner").sort_index()
            if len(j) < 3:
                continue
            rx = avg_ranks(j["x"].to_numpy())
            ry = avg_ranks(j["y"].to_numpy())
            n = float(len(j))
            sx, sy = rx.sum(), ry.sum()
            sxx, syy, sxy = (rx * rx).sum(), (ry * ry).sum(), (rx * ry).sum()
            rho = (n * sxy - sx * sy) / np.sqrt(
                (n * sxx - sx * sx) * (n * syy - sy * sy))
            rows.append({"event_x": ex, "event_y": ey, "n": int(n),
                         "rho": rho})
    out = pd.DataFrame(rows)
    out["rho"] = stable_round6(out["rho"].astype(float))
    return out.sort_values(["event_x", "event_y"]).reset_index(drop=True)


_SQL_SPEARMAN = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
pairs AS (
  SELECT a.event_type AS event_x, b.event_type AS event_y, a.bts, a.m AS x, b.m AS y
  FROM hourly a JOIN hourly b
    ON a.bts = b.bts AND a.event_type <> b.event_type
),
rk AS (
  SELECT event_x, event_y, bts,
         RANK() OVER (PARTITION BY event_x, event_y ORDER BY x)
           + (COUNT(*) OVER (PARTITION BY event_x, event_y, x) - 1) / 2.0 AS rx,
         RANK() OVER (PARTITION BY event_x, event_y ORDER BY y)
           + (COUNT(*) OVER (PARTITION BY event_x, event_y, y) - 1) / 2.0 AS ry
  FROM pairs
),
mom AS (
  SELECT event_x, event_y, COUNT(*)::DOUBLE AS n,
         SUM(rx) AS sx, SUM(ry) AS sy,
         SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy, SUM(rx * ry) AS sxy
  FROM rk GROUP BY 1, 2 HAVING COUNT(*) >= 3
)
SELECT event_x, event_y, CAST(n AS BIGINT) AS n,
       ROUND(ROUND((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 9), 6) AS rho
FROM mom ORDER BY event_x, event_y
"""


def q_kendall_tau(sf_dir: str):
    """Kendall tau-b rank correlation (Kendall 1938, tie-corrected
    tau-b) for every ordered event-type pair: concordant minus
    discordant pair counts over all bucket pairs i < j,
    tau_b = (C - D) / sqrt((n0 - n1)(n0 - n2)) with the usual tie
    terms. O(n^2) pairs over the CALENDAR-bounded hourly series (the
    Pettitt/MK cost shape — never corpus-sized); the SQL replay is a
    positional self-join with SIGN products."""
    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    by = {k: g.set_index("bucket_ts")["m"] for k, g in t1h.groupby("event_type")}
    rows = []
    for ex in sorted(by):
        for ey in sorted(by):
            if ex == ey:
                continue
            j = pd.concat([by[ex].rename("x"), by[ey].rename("y")],
                          axis=1, join="inner").sort_index()
            n = len(j)
            if n < 3:
                continue
            x, y = j["x"].to_numpy(), j["y"].to_numpy()
            sx = np.sign(x[:, None] - x[None, :])
            sy = np.sign(y[:, None] - y[None, :])
            iu = np.triu_indices(n, 1)
            prod = sx[iu] * sy[iu]
            c = int((prod > 0).sum())
            d = int((prod < 0).sum())
            n0 = n * (n - 1) / 2.0
            _, tx = np.unique(x, return_counts=True)
            _, ty = np.unique(y, return_counts=True)
            n1 = float((tx * (tx - 1) / 2).sum())
            n2 = float((ty * (ty - 1) / 2).sum())
            tau = (c - d) / np.sqrt((n0 - n1) * (n0 - n2))
            rows.append({"event_x": ex, "event_y": ey, "n": n,
                         "concordant": c, "discordant": d, "tau_b": tau})
    out = pd.DataFrame(rows)
    for c_ in ("n", "concordant", "discordant"):
        out[c_] = out[c_].astype("int64")
    out["tau_b"] = stable_round6(out["tau_b"].astype(float))
    return out.sort_values(["event_x", "event_y"]).reset_index(drop=True)


_SQL_KENDALL = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
pairs AS (
  SELECT a.event_type AS event_x, b.event_type AS event_y, a.bts, a.m AS x, b.m AS y
  FROM hourly a JOIN hourly b
    ON a.bts = b.bts AND a.event_type <> b.event_type
),
pp AS (
  SELECT p.event_x, p.event_y,
         SIGN(q.x - p.x) * SIGN(q.y - p.y) AS s
  FROM pairs p JOIN pairs q
    ON q.event_x = p.event_x AND q.event_y = p.event_y AND q.bts > p.bts
),
cd AS (
  SELECT event_x, event_y,
         SUM(CASE WHEN s > 0 THEN 1 ELSE 0 END)::DOUBLE AS c,
         SUM(CASE WHEN s < 0 THEN 1 ELSE 0 END)::DOUBLE AS d
  FROM pp GROUP BY 1, 2
),
nn AS (
  SELECT event_x, event_y, COUNT(*)::DOUBLE AS n FROM pairs GROUP BY 1, 2
  HAVING COUNT(*) >= 3
),
tx AS (
  SELECT event_x, event_y, SUM(t * (t - 1) / 2.0) AS n1
  FROM (SELECT event_x, event_y, COUNT(*)::DOUBLE AS t
        FROM pairs GROUP BY event_x, event_y, x)
  GROUP BY 1, 2
),
ty AS (
  SELECT event_x, event_y, SUM(t * (t - 1) / 2.0) AS n2
  FROM (SELECT event_x, event_y, COUNT(*)::DOUBLE AS t
        FROM pairs GROUP BY event_x, event_y, y)
  GROUP BY 1, 2
)
SELECT nn.event_x, nn.event_y, CAST(nn.n AS BIGINT) AS n,
       CAST(cd.c AS BIGINT) AS concordant,
       CAST(cd.d AS BIGINT) AS discordant,
       ROUND(ROUND((cd.c - cd.d)
             / sqrt((nn.n * (nn.n - 1) / 2.0 - tx.n1)
                    * (nn.n * (nn.n - 1) / 2.0 - ty.n2)), 9), 6) AS tau_b
FROM nn JOIN cd USING (event_x, event_y)
JOIN tx USING (event_x, event_y) JOIN ty USING (event_x, event_y)
ORDER BY event_x, event_y
"""


def q_pacf(sf_dir: str):
    """Partial autocorrelation function via the Durbin-Levinson
    recursion (Durbin 1960; stages/trend.py:pacf_durbin_levinson) per
    event_type on the 6dp hourly means, lags 1..10 from the biased
    positional ACF. For AR(p) data the PACF cuts off after lag p — the
    Box-Jenkins order-identification tool completing acf_lags /
    ar2_yule_walker. The recursion is not SQL-expressible ->
    rows-only; AR(2)-cutoff pytest pins."""
    from ..stages.trend import pacf_durbin_levinson

    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    rows = []
    for k, g in t1h.groupby("event_type", sort=True):
        y = g.sort_values("bucket_ts")["m"].to_numpy(dtype=np.float64)
        p = pacf_durbin_levinson(y, m=10)
        for lag in range(1, 11):
            rows.append({"event_type": k, "lag": lag,
                         "pacf": stable_round6(np.array([p[lag - 1]]))[0]})
    out = pd.DataFrame(rows)
    out["lag"] = out["lag"].astype("int64")
    return out.sort_values(["event_type", "lag"]).reset_index(drop=True)


def q_mann_whitney(sf_dir: str):
    """Mann-Whitney U rank-sum test (Mann & Whitney 1947) with Cliff's
    delta effect size (Cliff 1993, delta = 2U/(n_a n_b) - 1) for every
    UNORDERED event-type pair, comparing the two types' hourly-mean
    DISTRIBUTIONS (not paired): combined average-rank with ties,
    U = R_a - n_a(n_a+1)/2, normal z with the tie-corrected variance.
    The nonparametric companion to source_welch_ttest."""
    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    by = {k: g["m"].to_numpy(dtype=np.float64)
          for k, g in t1h.groupby("event_type")}
    types = sorted(by)
    rows = []
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            a, b = by[ta], by[tb]
            na, nb = float(len(a)), float(len(b))
            comb = np.concatenate([a, b])
            order = np.argsort(comb, kind="stable")
            sv = comb[order]
            uniq, first, counts = np.unique(sv, return_index=True,
                                            return_counts=True)
            ar = first + 1 + (counts - 1) / 2.0
            lut = dict(zip(uniq, ar))
            ranks_a = np.fromiter((lut[x] for x in a), dtype=np.float64,
                                  count=len(a))
            u = ranks_a.sum() - na * (na + 1.0) / 2.0
            nn = na + nb
            tie = ((counts.astype(np.float64) ** 3 - counts).sum()
                   / (nn * (nn - 1.0)))
            sigma = np.sqrt(na * nb / 12.0 * ((nn + 1.0) - tie))
            z = (u - na * nb / 2.0) / sigma
            delta = 2.0 * u / (na * nb) - 1.0
            rows.append({"event_a": ta, "event_b": tb,
                         "n_a": int(na), "n_b": int(nb),
                         "u_stat": u, "z": z, "cliffs_delta": delta})
    out = pd.DataFrame(rows)
    for c in ("n_a", "n_b"):
        out[c] = out[c].astype("int64")
    for c in ("u_stat", "z", "cliffs_delta"):
        out[c] = stable_round6(out[c].astype(float))
    return out.sort_values(["event_a", "event_b"]).reset_index(drop=True)


_SQL_MANN_WHITNEY = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
tp AS (SELECT DISTINCT event_type FROM hourly),
prs AS (
  SELECT a.event_type AS event_a, b.event_type AS event_b
  FROM tp a JOIN tp b ON a.event_type < b.event_type
),
comb AS (
  SELECT p.event_a, p.event_b, h.event_type, h.m
  FROM prs p JOIN hourly h
    ON h.event_type = p.event_a OR h.event_type = p.event_b
),
rk AS (
  SELECT event_a, event_b, event_type,
         RANK() OVER (PARTITION BY event_a, event_b ORDER BY m)
           + (COUNT(*) OVER (PARTITION BY event_a, event_b, m) - 1) / 2.0 AS r,
         COUNT(*) OVER (PARTITION BY event_a, event_b, m)::DOUBLE AS t
  FROM comb
),
sums AS (
  SELECT event_a, event_b,
         SUM(CASE WHEN event_type = event_a THEN r ELSE 0 END) AS ra,
         SUM(CASE WHEN event_type = event_a THEN 1 ELSE 0 END)::DOUBLE AS na,
         SUM(CASE WHEN event_type = event_b THEN 1 ELSE 0 END)::DOUBLE AS nb
  FROM rk GROUP BY 1, 2
),
ties AS (
  SELECT event_a, event_b, SUM(tc * tc * tc - tc) AS tsum
  FROM (SELECT event_a, event_b, m, COUNT(*)::DOUBLE AS tc
        FROM comb GROUP BY 1, 2, 3)
  GROUP BY 1, 2
)
SELECT s.event_a, s.event_b,
       CAST(s.na AS BIGINT) AS n_a, CAST(s.nb AS BIGINT) AS n_b,
       ROUND(ROUND(s.ra - s.na * (s.na + 1.0) / 2.0, 9), 6) AS u_stat,
       ROUND(ROUND(((s.ra - s.na * (s.na + 1.0) / 2.0) - s.na * s.nb / 2.0)
             / sqrt(s.na * s.nb / 12.0 * ((s.na + s.nb + 1.0)
                    - t.tsum / ((s.na + s.nb) * (s.na + s.nb - 1.0)))), 9), 6) AS z,
       ROUND(ROUND(2.0 * (s.ra - s.na * (s.na + 1.0) / 2.0)
             / (s.na * s.nb) - 1.0, 9), 6) AS cliffs_delta
FROM sums s JOIN ties t USING (event_a, event_b)
ORDER BY event_a, event_b
"""


def q_friedman_test(sf_dir: str):
    """Friedman rank test (Friedman 1937) over COMPLETE daily blocks:
    days where every event type has a value are the blocks, ranks
    across the k types within each block (average ties), chi2_F =
    12/(n k (k+1)) * sum R_j^2 - 3 n (k+1). The blocked nonparametric
    ANOVA controlling for time-of-bucket, complementing Kruskal-Wallis
    (unblocked). Per-type rank sums are also emitted."""
    t1h = _fused_tier(sf_dir, "1d").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    wide = t1h.pivot_table(index="bucket_ts", columns="event_type",
                           values="m", aggfunc="first").dropna()
    k = wide.shape[1]
    n = len(wide)
    vals = wide.to_numpy(dtype=np.float64)
    # average ranks within each row
    ranks = np.empty_like(vals)
    for i in range(n):
        row = vals[i]
        order = np.argsort(row, kind="stable")
        sv = row[order]
        uniq, first, counts = np.unique(sv, return_index=True,
                                        return_counts=True)
        ar = first + 1 + (counts - 1) / 2.0
        lut = dict(zip(uniq, ar))
        ranks[i] = [lut[x] for x in row]
    rj = ranks.sum(axis=0)
    chi2 = 12.0 / (n * k * (k + 1.0)) * (rj * rj).sum() - 3.0 * n * (k + 1.0)
    rows = [{"event_type": c, "rank_sum": stable_round6(np.array([r]))[0],
             "n_blocks": n, "k": k,
             "chi2_f": stable_round6(np.array([chi2]))[0]}
            for c, r in zip(wide.columns, rj)]
    out = pd.DataFrame(rows)
    out["n_blocks"] = out["n_blocks"].astype("int64")
    out["k"] = out["k"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


_SQL_FRIEDMAN = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
k AS (SELECT COUNT(DISTINCT event_type) AS k FROM hourly),
complete AS (
  SELECT bts FROM hourly GROUP BY bts
  HAVING COUNT(DISTINCT event_type) = (SELECT k FROM k)
),
blk AS (
  SELECT h.event_type, h.bts, h.m FROM hourly h JOIN complete USING (bts)
),
rk AS (
  SELECT event_type, bts,
         RANK() OVER (PARTITION BY bts ORDER BY m)
           + (COUNT(*) OVER (PARTITION BY bts, m) - 1) / 2.0 AS r
  FROM blk
),
rj AS (SELECT event_type, SUM(r) AS rank_sum FROM rk GROUP BY 1),
nb AS (SELECT COUNT(*)::DOUBLE AS n FROM complete),
chi AS (
  SELECT 12.0 / (nb.n * k.k * (k.k + 1.0))
           * (SELECT SUM(rank_sum * rank_sum) FROM rj)
           - 3.0 * nb.n * (k.k + 1.0) AS chi2, nb.n, k.k
  FROM nb, k
)
SELECT rj.event_type,
       ROUND(ROUND(rj.rank_sum, 9), 6) AS rank_sum,
       CAST(chi.n AS BIGINT) AS n_blocks,
       CAST(chi.k AS BIGINT) AS k,
       ROUND(ROUND(chi.chi2, 9), 6) AS chi2_f
FROM rj, chi ORDER BY rj.event_type
"""


def q_haar_energy(sf_dir: str):
    """Haar discrete-wavelet energy decomposition (Haar 1910; Mallat
    1989 pyramid) per event_type on the 6dp hourly means: for levels
    k = 1..4 the detail coefficients over non-overlapping 2^k-blocks
    d = (S_firsthalf - S_secondhalf) / sqrt(2^k), energy_k = sum d^2
    (series positionally truncated to a multiple of 16 so every level
    shares the same pyramid base on both sides). Energy-by-scale is
    the wavelet complement to the FFT views (spectral_entropy,
    harmonic, Lomb-Scargle); block sums replay exactly in SQL via
    ROW_NUMBER arithmetic."""
    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    rows = []
    for key, g in t1h.groupby("event_type", sort=True):
        y = g.sort_values("bucket_ts")["m"].to_numpy(dtype=np.float64)
        n = (len(y) // 16) * 16
        y = y[:n]
        for k in range(1, 5):
            w = 1 << k
            blocks = y.reshape(n // w, w)
            half = w // 2
            d = (blocks[:, :half].sum(axis=1)
                 - blocks[:, half:].sum(axis=1)) / np.sqrt(float(w))
            rows.append({"event_type": key, "level": k,
                         "n_coeffs": n // w,
                         "energy": (d * d).sum()})
    out = pd.DataFrame(rows)
    out["level"] = out["level"].astype("int64")
    out["n_coeffs"] = out["n_coeffs"].astype("int64")
    out["energy"] = stable_round6(out["energy"].astype(float))
    return out.sort_values(["event_type", "level"]).reset_index(drop=True)


_SQL_HAAR = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
pos AS (
  SELECT event_type, m,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bts) - 1 AS p,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM hourly
),
trunc AS (SELECT * FROM pos WHERE p < (n // 16) * 16),
lv AS (SELECT UNNEST(generate_series(1, 4)) AS k),
cells AS (
  SELECT t.event_type, lv.k,
         t.p // (1 << lv.k) AS blk,
         (t.p // (1 << (lv.k - 1))) % 2 AS half,
         t.m
  FROM trunc t CROSS JOIN lv
),
coef AS (
  SELECT event_type, k, blk,
         (SUM(CASE WHEN half = 0 THEN m ELSE 0 END)
          - SUM(CASE WHEN half = 1 THEN m ELSE 0 END))
         / sqrt((1 << k)::DOUBLE) AS d
  FROM cells GROUP BY 1, 2, 3
)
SELECT event_type, CAST(k AS BIGINT) AS level,
       CAST(COUNT(*) AS BIGINT) AS n_coeffs,
       ROUND(ROUND(SUM(d * d), 9), 6) AS energy
FROM coef GROUP BY 1, 2 ORDER BY event_type, level
"""


def q_tail_dependence(sf_dir: str):
    """Empirical upper tail-dependence coefficient (the copula
    lambda_U of Joe 1997, empirical estimator): for each ordered
    event-type pair over the bucket-joined hourly means,
    lambda_U = P(y >= q_y | x >= q_x) with q = the k-th ascending
    order statistic at k = ceil(0.9 n) (an exact multiset rank, so
    both sides pick the identical threshold regardless of tie order).
    Compound-extreme risk structure that correlation misses —
    complements compound_extremes and the correlation battery."""
    t1h = _fused_tier(sf_dir, "1h").to_pandas()
    t1h["m"] = stable_round6(t1h["mean"].astype(float))
    by = {k: g.set_index("bucket_ts")["m"] for k, g in t1h.groupby("event_type")}
    rows = []
    for ex in sorted(by):
        for ey in sorted(by):
            if ex == ey:
                continue
            j = pd.concat([by[ex].rename("x"), by[ey].rename("y")],
                          axis=1, join="inner")
            n = len(j)
            if n < 10:
                continue
            k = int(np.ceil(0.9 * n))
            qx = np.sort(j["x"].to_numpy())[k - 1]
            qy = np.sort(j["y"].to_numpy())[k - 1]
            above_x = j["x"].to_numpy() >= qx
            joint = above_x & (j["y"].to_numpy() >= qy)
            rows.append({"event_x": ex, "event_y": ey, "n": n,
                         "n_above_x": int(above_x.sum()),
                         "n_joint": int(joint.sum()),
                         "lambda_u": joint.sum() / above_x.sum()})
    out = pd.DataFrame(rows)
    for c in ("n", "n_above_x", "n_joint"):
        out[c] = out[c].astype("int64")
    out["lambda_u"] = stable_round6(out["lambda_u"].astype(float))
    return out.sort_values(["event_x", "event_y"]).reset_index(drop=True)


_SQL_TAIL_DEP = """
WITH hourly AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS bts,
         ROUND(ROUND(SUM(value) / COUNT(value), 9), 6) AS m
  FROM events GROUP BY 1, 2 HAVING COUNT(value) > 0
),
pairs AS (
  SELECT a.event_type AS event_x, b.event_type AS event_y, a.bts, a.m AS x, b.m AS y
  FROM hourly a JOIN hourly b
    ON a.bts = b.bts AND a.event_type <> b.event_type
),
nn AS (
  SELECT event_x, event_y, COUNT(*) AS n,
         CAST(CEIL(0.9 * COUNT(*)) AS BIGINT) AS k
  FROM pairs GROUP BY 1, 2 HAVING COUNT(*) >= 10
),
rx AS (
  SELECT p.event_x, p.event_y, p.x,
         ROW_NUMBER() OVER (PARTITION BY p.event_x, p.event_y ORDER BY p.x) AS r
  FROM pairs p
),
ry AS (
  SELECT p.event_x, p.event_y, p.y,
         ROW_NUMBER() OVER (PARTITION BY p.event_x, p.event_y ORDER BY p.y) AS r
  FROM pairs p
),
qx AS (SELECT rx.event_x, rx.event_y, rx.x AS qx
       FROM rx JOIN nn USING (event_x, event_y) WHERE rx.r = nn.k),
qy AS (SELECT ry.event_x, ry.event_y, ry.y AS qy
       FROM ry JOIN nn USING (event_x, event_y) WHERE ry.r = nn.k)
SELECT nn.event_x, nn.event_y, CAST(nn.n AS BIGINT) AS n,
       CAST(SUM(CASE WHEN p.x >= qx.qx THEN 1 ELSE 0 END) AS BIGINT) AS n_above_x,
       CAST(SUM(CASE WHEN p.x >= qx.qx AND p.y >= qy.qy THEN 1 ELSE 0 END) AS BIGINT) AS n_joint,
       ROUND(ROUND(SUM(CASE WHEN p.x >= qx.qx AND p.y >= qy.qy THEN 1 ELSE 0 END)::DOUBLE
             / SUM(CASE WHEN p.x >= qx.qx THEN 1 ELSE 0 END), 9), 6) AS lambda_u
FROM pairs p
JOIN nn USING (event_x, event_y)
JOIN qx USING (event_x, event_y)
JOIN qy USING (event_x, event_y)
GROUP BY nn.event_x, nn.event_y, nn.n
ORDER BY nn.event_x, nn.event_y
"""


QUERIES: dict[str, Callable[[str], Any]] = {
    "ssa_decompose": q_ssa,
    "variogram": q_variogram,
    "dispersion_test": q_dispersion_test,
    "haar_energy": q_haar_energy,
    "tail_dependence": q_tail_dependence,
    "mann_whitney": q_mann_whitney,
    "friedman_test": q_friedman_test,
    "spearman_corr": q_spearman_corr,
    "kendall_tau": q_kendall_tau,
    "pacf": q_pacf,
    "jarque_bera": q_jarque_bera,
    "breusch_pagan": q_breusch_pagan,
    "kruskal_wallis": q_kruskal_wallis,
    "levene": q_levene,
    "effective_sample_size": q_effective_sample_size,
    "dfa": q_dfa,
    "emd_decompose": q_emd,
    "tpch_q3_topk": q_tpch_q3_topk,
    "regression_diagnostics": q_regression_diagnostics,
    "chow_test": q_chow_test,
    "cointegration_eg": q_cointegration_eg,
    "resample_1h": q_resample_1h,
    "resample_1d": q_resample_1d,
    "resample_1d_mincount": q_resample_1d_mincount,
    "diel_cycle": q_diel_cycle,
    "diel_cycle_monthly": q_diel_cycle_monthly,
    "zscore_daynight": q_zscore_daynight,
    "gap_table_1h": q_gap_table_1h,
    "zscore_outliers": q_zscore_outliers,
    "screening_chain": q_screening_chain,
    "gapfill_linear_1h": q_gapfill_linear_1h,
    "gapfill_scores": q_gapfill_scores,
    "tree_gapfill_scores": q_tree_gapfill_scores,
    "pwb_lag": q_pwb_lag,
    "hampel_noniter": q_hampel_noniter,
    "zscore_rolling": q_zscore_rolling,
    "zscore_rolling_noniter": q_zscore_rolling_noniter,
    "localsd": q_localsd,
    "localsd_noniter": q_localsd_noniter,
    "zscore_increments": q_zscore_increments,
    "zscore_increments_noniter": q_zscore_increments_noniter,
    "abs_limits": q_abs_limits,
    "trimlow": q_trimlow,
    "dedup_keep_last": q_dedup_keep_last,
    "day_mean_as_hires": q_day_mean_as_hires,
    "qcf": q_qcf,
    "time_features": q_time_features,
    "setto_threshold": q_setto_threshold,
    "setto_value_range": q_setto_value_range,
    "set_exact_missing": q_set_exact_missing,
    "keep_daterange": q_keep_daterange,
    "monthly_matrix": q_monthly_matrix,
    "grid_agg": q_grid_agg,
    "sstats": q_sstats,
    "percentiles101": q_percentiles101,
    "histogram": q_histogram,
    "feature_engineer": q_feature_engineer,
    "ridge_gapfill": q_ridge_gapfill,
    "event_flag": q_event_flag,
    "freq_detect": q_freq_detect,
    "gap_stats_1h": q_gap_stats_1h,
    "monthly_ranks": q_monthly_ranks,
    "daynight_flag": q_daynight_flag,
    "lof_outliers": q_lof_outliers,
    "bootstrap_ci": q_bootstrap_ci,
    "eddypro_flags": q_eddypro_flags,
    "embedding_knn_lsh": q_embedding_knn_lsh,
    "embedding_knn_ivf": q_embedding_knn_ivf,
    "embedding_knn_pq": q_embedding_knn_pq,
    "daily_correlation": q_daily_correlation,
    "similarity_fill_1h": q_similarity_fill_1h,
    "mds_fill": q_mds_fill,
    "flux_chain": q_flux_chain,
    "flux_chain_scores": q_flux_chain_scores,
    "harmonic_decompose": q_harmonic_decompose,
    "stl_decompose": q_stl_decompose,
    "timestamp_shifts": q_timestamp_shifts,
    "granger": q_granger,
    "tree_gapfill": q_tree_gapfill,
    "swin_gapfill": q_swin_gapfill,
    "nee_partition_dt": q_nee_partition_dt,
    "lineitem_filter_project": q_lineitem_filter_project,
    "lineitem_agg": q_lineitem_agg,
    "tokens_rollup_tiny": q_tokens_rollup_tiny,
    "tokens_verify_tiny": q_tokens_verify_tiny,
    "tokens_rollup_1h": q_tokens_rollup_1h,
    "ustar_mpt": q_ustar_mpt,
    "ustar_vekuri": q_ustar_vekuri,
    "eddypro_vm97": q_eddypro_vm97,
    "selfheating_sf": q_selfheating_sf,
    "retention_sweep": q_retention_sweep,
    "m4_downsample": q_m4_downsample,
    "counter_rate": q_counter_rate,
    "flux_randunc": q_flux_randunc,
    "nee_partition_nt": q_nee_partition_nt,
    "optimum_range": q_optimum_range,
    "asof_join_hourly": q_asof_join_hourly,
    "sessionize": q_sessionize,
    "lof_scores": q_lof_scores,
    "embedding_knn_ivf_exact": q_embedding_knn_ivf_exact,
    "granger_lag1_f": q_granger_lag1_f,
    "harmonic_k1_fit": q_harmonic_k1_fit,
    "wind_rotation": q_wind_rotation,
    "xcorr_lag_scan": q_xcorr_lag_scan,
    "max_covariance": q_max_covariance,
    "flux_detection_limit": q_flux_detection_limit,
    "ustar_bootstrap": q_ustar_bootstrap,
    "quantiles_tdigest": q_quantiles_tdigest,
    "compound_extremes": q_compound_extremes,
    "stratified_analysis": q_stratified_analysis,
    "time_since": q_time_since,
    "profile": q_profile,
    "vpd": q_vpd,
    "rh_offset": q_rh_offset,
    "manual_removal": q_manual_removal,
    "csv_ingest": q_csv_ingest,
    "range_join": q_range_join,
    "sliding_window": q_sliding_window,
    "bin_fitter": q_bin_fitter,
    "combine_variables": q_combine_variables,
    "hq_flux": q_hq_flux,
    "timelag_analysis": q_timelag_analysis,
    "event_funnel": q_event_funnel,
    "hll_distinct_users": q_hll_distinct_users,
    "event_transitions": q_event_transitions,
    "file_split_stats": q_file_split_stats,
    "file_inventory": q_file_inventory,
    "binary_extract": q_binary_extract,
    "winddir_agg": q_winddir_agg,
    "doy_cumulative": q_doy_cumulative,
    "trim_frame": q_trim_frame,
    "eddypro_flag_battery": q_eddypro_flag_battery,
    "variable_classify": q_variable_classify,
    "potrad_eot": q_potrad_eot,
    "freq_groups": q_freq_groups,
    "fluxnet_format": q_fluxnet_format,
    "timestamp_conventions": q_timestamp_conventions,
    "series_features": q_series_features,
    "rank_drivers": q_rank_drivers,
    "eddypro_meteo_format": q_eddypro_meteo_format,
    "winsorize": q_winsorize,
    "storage_fill": q_storage_fill,
    "seasonal_mann_kendall": q_seasonal_mann_kendall,
    "benford_digits": q_benford_digits,
    "shesd_anomalies": q_shesd_anomalies,
    "pelt_changepoints": q_pelt_changepoints,
    "mutual_information": q_mutual_information,
    "permutation_entropy": q_permutation_entropy,
    "lttb_downsample": q_lttb_downsample,
    "hurst_exponent": q_hurst_exponent,
    "token_ngram_overlap": q_token_ngram_overlap,
    "holt_winters": q_holt_winters,
    "kalman_smooth": q_kalman_smooth,
    "cusum_drift": q_cusum_drift,
    "page_hinkley": q_page_hinkley,
    "ewma_chart": q_ewma_chart,
    "dickey_fuller": q_dickey_fuller,
    "stability_lumpiness": q_stability_lumpiness,
    "kpss": q_kpss,
    "variance_ratio": q_variance_ratio,
    "hill_tail": q_hill_tail,
    "spectral_entropy": q_spectral_entropy,
    "savgol": q_savgol,
    "l_moments": q_l_moments,
    "gev_fit": q_gev_fit,
    "token_transition_entropy": q_token_transition_entropy,
    "sax": q_sax,
    "forecast_accuracy": q_forecast_accuracy,
    "matrix_profile": q_matrix_profile,
    "diel_dtw": q_diel_dtw,
    "pagerank": q_pagerank,
    "join_orders_customer": q_join_orders_customer,
    "join_lineitem_orders": q_join_lineitem_orders,
    "join_semi_anti": q_join_semi_anti,
    "retention_cohorts": q_retention_cohorts,
    "ar2_yule_walker": q_ar2_yule_walker,
    "ts_complexity": q_ts_complexity,
    "classical_decompose": q_classical_decompose,
    "seasonality_detect": q_seasonality_detect,
    "ustar_scenario_flags": q_ustar_scenario_flags,
    "linear_regression": q_linear_regression,
    "year_neighbors": q_year_neighbors,
    "theta_forecast": q_theta_forecast,
    "decomp_strength": q_decomp_strength,
    "threshold_crossings": q_threshold_crossings,
    "croston": q_croston,
    "runs_test": q_runs_test,
    "ljung_box": q_ljung_box,
    "bocpd": q_bocpd,
    "hp_filter": q_hp_filter,
    "conformal_interval": q_conformal_interval,
    "adwin_drift": q_adwin_drift,
    "spectral_residual_anomaly": q_spectral_residual_anomaly,
    "thermo_battery": q_thermo_battery,
    "lagged_variants": q_lagged_variants,
    "nee_partition_nt_oneflux": q_nee_partition_nt_oneflux,
    "nee_partition_dt_oneflux": q_nee_partition_dt_oneflux,
    "nee_partition_dt_reddyproc": q_nee_partition_dt_reddyproc,
    "dt_window_geometry": q_dt_window_geometry,
    "optimize_params": q_optimize_params,
    "tokens_vocab_hist": q_tokens_vocab_hist,
    "mann_kendall": q_mann_kendall,
    "lomb_scargle": q_lomb_scargle,
    "acf_lags": q_acf_lags,
    "pettitt": q_pettitt,
    **ALE_QUERIES,
    **DOC_QUERIES,
    **STAT_QUERIES,
    **EXTRA_QUERIES,
}

ORACLE: dict[str, str] = {
    "resample_1h": _SQL_TIER.format(iv="1 hour"),
    "resample_1d": _SQL_TIER.format(iv="1 day"),
    "resample_1d_mincount": _SQL_TIER_1D_MINC,
    "diel_cycle": _SQL_DIEL,
    "diel_cycle_monthly": _SQL_DIEL_MONTHLY,
    "zscore_daynight": _SQL_ZSCORE_DAYNIGHT,
    "gap_table_1h": _SQL_GAPS_1H,
    "zscore_outliers": _SQL_ZSCORE,
    "screening_chain": _SQL_SCREENING,
    "gapfill_linear_1h": _SQL_GAPFILL_1H,
    "gapfill_scores": _SQL_GAPFILL_SCORES,
    "hampel_noniter": _SQL_HAMPEL,
    # zscore_rolling / localsd / zscore_increments: iterative -> rows-only;
    # their single-pass variants carry exact SQL-window oracles:
    "zscore_rolling_noniter": _SQL_ZSCORE_ROLLING_NI,
    "localsd_noniter": _SQL_LOCALSD_NI,
    "zscore_increments_noniter": _SQL_ZSCORE_INCR_NI,
    "abs_limits": _SQL_ABS_LIMITS,
    "trimlow": _SQL_TRIMLOW,
    "dedup_keep_last": _SQL_DEDUP,
    "day_mean_as_hires": _SQL_DAY_MEAN,
    "qcf": _SQL_QCF,
    "time_features": _SQL_TIME_FEATURES,
    "setto_threshold": _SQL_SETTO,
    "setto_value_range": _SQL_SETTO_VALUE,
    "set_exact_missing": _SQL_SET_EXACT,
    "keep_daterange": _SQL_DATERANGE,
    "monthly_matrix": _SQL_MONTHLY,
    "grid_agg": _SQL_GRID,
    "sstats": _SQL_SSTATS,
    "percentiles101": _SQL_PCT101,
    "histogram": _SQL_HISTOGRAM,
    "feature_engineer": _SQL_FEATURES,
    # ridge_gapfill: model-based -> rows-only
    "event_flag": _SQL_EVENT_FLAG,
    "freq_detect": _SQL_FREQ,
    "gap_stats_1h": _SQL_GAP_STATS,
    "monthly_ranks": _SQL_MONTHLY_RANKS,
    "daynight_flag": _SQL_DAYNIGHT,
    # lof_outliers / bootstrap_ci: model/resampling-based -> rows-only
    "eddypro_flags": _SQL_EDDYPRO,
    # embedding_knn_lsh: probabilistic LSH -> rows-only
    "daily_correlation": _SQL_DAILY_CORR,
    "similarity_fill_1h": _SQL_SIMFILL,
    "mds_fill": _mds_sql(),
    "flux_chain": _SQL_FLUX_CHAIN,
    "flux_chain_scores": _SQL_FLUX_CHAIN_SCORES,
    # harmonic_decompose: model-based least squares -> rows-only
    "lineitem_filter_project": _SQL_LINEITEM_FP,
    "lineitem_agg": _SQL_LINEITEM_AGG,
    "optimum_range": _SQL_OPTIMUM,
    "tokens_rollup_1h": _SQL_TOKENS_ROLLUP_1H,
    "ustar_mpt": _SQL_USTAR_MPT,
    "ustar_vekuri": _SQL_USTAR_VEKURI,
    "eddypro_vm97": _SQL_EDDYPRO_VM97,
    "selfheating_sf": _SQL_SELFHEATING,
    "retention_sweep": _SQL_RETENTION,
    "m4_downsample": _SQL_M4,
    "counter_rate": _SQL_COUNTER_RATE,
    "flux_randunc": _SQL_FLUX_RANDUNC,
    "asof_join_hourly": _SQL_ASOF_HOURLY,
    "sessionize": _SQL_SESSIONIZE,
    "lof_scores": _SQL_LOF_SCORES,
    "embedding_knn_ivf_exact": _SQL_KNN_IVF_EXACT,
    "granger_lag1_f": _SQL_GRANGER_LAG1,
    "harmonic_k1_fit": _SQL_HARMONIC_K1,
    "wind_rotation": _SQL_WIND_ROT,
    "xcorr_lag_scan": _SQL_XCORR_SCAN,
    "max_covariance": _SQL_MAX_COV,
    "flux_detection_limit": _SQL_FDL,
    "compound_extremes": _SQL_COMPOUND_EXTREMES,
    "stratified_analysis": _SQL_STRATIFIED,
    "time_since": _SQL_TIME_SINCE,
    "profile": _SQL_PROFILE,
    "vpd": _SQL_VPD,
    "rh_offset": _SQL_RH_OFFSET,
    "manual_removal": _SQL_MANUAL,
    "csv_ingest": _SQL_CSV_INGEST,
    "range_join": _rj_sql(),
    "sliding_window": _SQL_SLIDING_WINDOW,
    "bin_fitter": _SQL_BIN_FITTER,
    "combine_variables": _SQL_COMBINE_VARS,
    "hq_flux": _SQL_HQ_FLUX,
    "timelag_analysis": _SQL_TIMELAG,
    "event_funnel": _SQL_EVENT_FUNNEL,
    # hll_distinct_users: sketch estimate -> rows-only (error bound pytest-pinned)
    "event_transitions": _SQL_EVENT_TRANSITIONS,
    "file_split_stats": _SQL_FILE_SPLIT,
    "file_inventory": _SQL_FILE_INVENTORY,
    "binary_extract": _SQL_BINARY_EXTRACT,
    "winddir_agg": _SQL_WINDDIR,
    "doy_cumulative": _SQL_DOY_CUM,
    "trim_frame": _SQL_TRIM,
    "eddypro_flag_battery": _SQL_EDDYPRO_BATTERY,
    "potrad_eot": _SQL_POTRAD_EOT,
    "freq_groups": _SQL_FREQ_GROUPS,
    "fluxnet_format": _SQL_FLUXNET,
    "timestamp_conventions": _SQL_TS_CONVENTIONS,
    "series_features": _SQL_SERIES_FEATURES,
    "rank_drivers": _SQL_RANK_DRIVERS,
    "eddypro_meteo_format": _SQL_METEO_FORMAT,
    "winsorize": _SQL_WINSORIZE,
    "storage_fill": _SQL_STORAGE_FILL,
    "seasonal_mann_kendall": _SQL_SEASONAL_MK,
    "benford_digits": _SQL_BENFORD,
    "mutual_information": _SQL_MUTUAL_INFO,
    "permutation_entropy": _SQL_PERM_ENTROPY,
    "token_ngram_overlap": _SQL_TOKEN_NGRAM,
    "cusum_drift": _SQL_CUSUM,
    "page_hinkley": _SQL_PAGE_HINKLEY,
    "ewma_chart": _SQL_EWMA,
    "dickey_fuller": _SQL_DICKEY_FULLER,
    "stability_lumpiness": _SQL_STABILITY,
    "kpss": _SQL_KPSS,
    "variance_ratio": _SQL_VARIANCE_RATIO,
    "hill_tail": _SQL_HILL,
    "spectral_entropy": _SQL_SPECTRAL_ENTROPY,
    "savgol": _SQL_SAVGOL,
    "l_moments": _SQL_L_MOMENTS,
    "gev_fit": _SQL_GEV_FIT,
    "token_transition_entropy": _SQL_TOKEN_TRANSITION,
    "sax": _SQL_SAX,
    "forecast_accuracy": _SQL_FORECAST_ACC,
    "pagerank": _SQL_PAGERANK,
    "join_orders_customer": _SQL_JOIN_ORDERS_CUSTOMER,
    "join_lineitem_orders": _SQL_JOIN_LINEITEM_ORDERS,
    "join_semi_anti": _SQL_JOIN_SEMI_ANTI,
    "retention_cohorts": _SQL_RETENTION_COHORTS,
    "ar2_yule_walker": _SQL_AR2_YW,
    "ts_complexity": _SQL_TS_COMPLEXITY,
    "classical_decompose": _SQL_CLASSICAL_DECOMPOSE,
    "ustar_scenario_flags": _SQL_USTAR_SCENARIOS,
    "linear_regression": _SQL_LINREG,
    "year_neighbors": _SQL_YEAR_NEIGHBORS,
    "theta_forecast": _SQL_THETA,
    "decomp_strength": _SQL_DECOMP_STRENGTH,
    "threshold_crossings": _SQL_CROSSINGS,
    "croston": _SQL_CROSTON,
    "runs_test": _SQL_RUNS_TEST,
    "ljung_box": _SQL_LJUNG_BOX,
    "tpch_q3_topk": _SQL_TPCH_Q3,
    "regression_diagnostics": _SQL_REG_DIAG,
    "chow_test": _SQL_CHOW,
    "cointegration_eg": _SQL_COINTEGRATION,
    "variogram": _SQL_VARIOGRAM,
    "effective_sample_size": _SQL_ESS,
    "jarque_bera": _SQL_JARQUE_BERA,
    "dispersion_test": _SQL_DISPERSION,
    "spearman_corr": _SQL_SPEARMAN,
    "mann_whitney": _SQL_MANN_WHITNEY,
    "haar_energy": _SQL_HAAR,
    "tail_dependence": _SQL_TAIL_DEP,
    "friedman_test": _SQL_FRIEDMAN,
    "kendall_tau": _SQL_KENDALL,
    "breusch_pagan": _SQL_BREUSCH_PAGAN,
    "kruskal_wallis": _SQL_KRUSKAL,
    "levene": _SQL_LEVENE,
    "conformal_interval": _SQL_CONFORMAL,
    "thermo_battery": _SQL_THERMO,
    "lagged_variants": _SQL_LAGGED,
    "variable_classify": _SQL_CLASSIFY.format(names="[" + ", ".join(repr(x) for x in _VARNAME_BATTERY) + "]", n=len(_VARNAME_BATTERY)),
    "tokens_vocab_hist": _SQL_TOKENS_VOCAB,
    "dt_window_geometry": _SQL_DT_GEOMETRY,
    "mann_kendall": _SQL_MANN_KENDALL,
    "lomb_scargle": _SQL_LOMB_SCARGLE,
    "acf_lags": _SQL_ACF_LAGS,
    "pettitt": _SQL_PETTITT,
    **ALE_ORACLE,
    **DOC_ORACLE,
    **STAT_ORACLE,
    **EXTRA_ORACLE,
}
