"""Diel (time-of-day) cycles and monthly matrices — the groupby-on-
bucket-phase shuffles.

Reference: ``diel_cycle`` groups by time-of-day (optionally x month)
computing count/mean/std/median/q25/q75/min/max and masking groups with
count < mincounts (diive/core/times/resampling.py:200-262);
``resample_to_monthly_agg_matrix`` aggregates per (YEAR, MONTH) with
optional dense ranks per month across years (resampling.py:15-44).

Physical plan: partial per-batch aggregation cannot compute exact
median/quantiles, so the diel cycle groups by the *phase key* directly —
group count = #distinct times-of-day (x months), each group modest, and
quantiles are computed exactly per group in pandas (matching the
reference's q25/q75 = linear-interpolation quantiles,
diive/core/dfun/stats.py).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
import ray.data


def diel_cycle(
    ds: ray.data.Dataset,
    *,
    value_col: str,
    ts_col: str = "ts",
    keys: Iterable[str] = (),
    each_month: bool = False,
    mincounts: int = 1,
    quantiles: bool = False,
    minmax: bool = False,
    std: bool = True,
    phase: str = "hour",
) -> ray.data.Dataset:
    """Aggregate by time-of-day phase. ``phase``: 'hour' (0-23) or
    'time' (exact time of day, like series.index.time in
    resampling.py:235). Groups with count < mincounts have their
    aggregate columns nulled (resampling.py:245-246)."""
    keys = list(keys)

    def add_phase(df: pd.DataFrame) -> pd.DataFrame:
        ts = pd.to_datetime(df[ts_col])
        df = df.copy()
        if phase == "hour":
            df["TIME"] = ts.dt.hour.astype(np.int32)
        else:
            df["TIME"] = ts.dt.strftime("%H:%M:%S")
        if each_month:
            df["MONTH"] = ts.dt.month.astype(np.int32)
        return df

    gkeys = keys + (["MONTH"] if each_month else []) + ["TIME"]

    def agg_group(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].astype(float)
        row = {k: df[k].iloc[0] for k in gkeys}
        row["count"] = int(v.count())
        row["mean"] = v.mean()
        if std:
            row["std"] = v.std()  # ddof=1, pandas default (resampling.py:231)
        row["median"] = v.median()
        if quantiles:
            row["q25"] = v.quantile(0.25)
            row["q75"] = v.quantile(0.75)
        if minmax:
            row["min"] = v.min()
            row["max"] = v.max()
        if std:
            row["mean+sd"] = row["mean"] + row["std"]
            row["mean-sd"] = row["mean"] - row["std"]
        out = pd.DataFrame([row])
        if row["count"] < mincounts:
            for c in out.columns:
                if c not in gkeys:
                    out[c] = np.nan
        return out

    from .exchange import grouped_block_map

    return grouped_block_map(ds.map_batches(add_phase, batch_format="pandas"), gkeys, agg_group)


def monthly_matrix(
    ds: ray.data.Dataset,
    *,
    value_col: str,
    ts_col: str = "ts",
    keys: Iterable[str] = (),
    agg: str = "mean",
    ranks: bool = False,
) -> pd.DataFrame:
    """Long-format (YEAR, MONTH, value-or-rank) per key
    (resampling.py:15-44; dense rank descending per month across years,
    resampling.py:37-42). Small result -> returns pandas."""
    keys = list(keys)

    def add_ym(df: pd.DataFrame) -> pd.DataFrame:
        ts = pd.to_datetime(df[ts_col])
        df = df.copy()
        df["YEAR"] = ts.dt.year.astype(np.int32)
        df["MONTH"] = ts.dt.month.astype(np.int32)
        return df

    gkeys = keys + ["YEAR", "MONTH"]

    def agg_group(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].astype(float)
        row = {k: df[k].iloc[0] for k in gkeys}
        row[value_col] = getattr(v, agg)()
        return pd.DataFrame([row])

    from .exchange import grouped_block_map

    long = grouped_block_map(
        ds.map_batches(add_ym, batch_format="pandas"), gkeys, agg_group
    ).to_pandas()
    if ranks:
        long[value_col] = long.groupby(keys + ["MONTH"])[value_col].rank(
            method="dense", ascending=False
        )
    return long.sort_values(gkeys).reset_index(drop=True)
