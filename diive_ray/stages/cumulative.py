"""Multi-year cumulative curves by day-of-year time — the engine
counterpart of the reference's cumulative analysis
(diive/core/times/times.py:1935-1996: calc_doy_timefraction,
doy_cumulatives_per_year, doy_mean_cumulative; consumed by
core/plotting/cumulative.py:80-111).

Reference shape: pivot the series to one column per year indexed by
DOY_TIME (day-of-year + intra-day fraction), cumsum each year's
column, then mean / SD / ±1.96·SD across years per DOY_TIME row.

Ray shape: the pivot never materializes. Exchange 1 on
(keys..., year) computes each year's running sum in its own block
(sort by timestamp + vectorized cumsum — the pivot column). Exchange 2
on (keys..., day-of-year, second-of-day) brings the per-year cumulative
values of one DOY_TIME row together for the across-year moments. Both
exchanges carry one slim row per input bucket; nothing is quadratic and
no year's series must fit anywhere whole — at 10^12 scale each
(key, year) partition streams independently.

pandas parity notes: across-year mean/SD skip missing years at a
DOY_TIME (pivot NaNs) exactly like ``DataFrame.mean/std(axis=1)``;
SD is sample SD (ddof=1), NaN for a single year.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .exchange import grouped_block_map


def doy_timefraction_frame(series: pd.Series) -> pd.DataFrame:
    """Verbatim reference semantics (times.py:1935-1946) for tests and
    driver-side use: YEAR / DOY / TIMEFRACTION / DOY_TIME columns from
    a DatetimeIndex'd series."""
    df = pd.DataFrame(series)
    df["YEAR"] = df.index.year
    df["DOY"] = df.index.dayofyear
    df["TIMEFRACTION"] = (
        df.index.hour + df.index.minute / 60 + df.index.second / 3600) / 24
    df["DOY_TIME"] = df["DOY"].add(df["TIMEFRACTION"])
    return df


def doy_cumulatives_per_year_frame(series: pd.Series) -> pd.DataFrame:
    """Reference doy_cumulatives_per_year (times.py:1948-1952): pivot
    to one column per year on DOY_TIME, cumulative sum down each
    column. Driver-side (bounded) — the distributed path is
    :func:`doy_cumulative_stats`."""
    df = doy_timefraction_frame(series)
    return df.pivot(index="DOY_TIME", columns="YEAR", values=series.name).cumsum()


def doy_mean_cumulative_frame(
    cumulatives: pd.DataFrame, excl_years_from_reference: list | None = None
) -> pd.DataFrame:
    """Reference doy_mean_cumulative (times.py:1954-1996) verbatim:
    across-year mean, sample SD and ±1SD / ±1.96SD bands per DOY_TIME."""
    ref = cumulatives.copy()
    for yr in excl_years_from_reference or ():
        if yr in ref.columns:
            ref = ref.drop(yr, axis=1)
    out = pd.DataFrame(index=ref.index)
    out["MEAN_DOY_TIME"] = ref.mean(axis=1)
    out["SD_DOY_TIME"] = ref.std(axis=1)
    out["MEAN+SD"] = out["MEAN_DOY_TIME"] + out["SD_DOY_TIME"]
    out["MEAN-SD"] = out["MEAN_DOY_TIME"] - out["SD_DOY_TIME"]
    out["1.96_SD_DOY_TIME"] = out["SD_DOY_TIME"] * 1.96
    out["MEAN+1.96_SD"] = out["MEAN_DOY_TIME"] + out["1.96_SD_DOY_TIME"]
    out["MEAN-1.96_SD"] = out["MEAN_DOY_TIME"] - out["1.96_SD_DOY_TIME"]
    return out.drop(columns=["1.96_SD_DOY_TIME"])


def doy_cumulative_stats(
    ds: rd.Dataset,
    keys: list[str],
    *,
    value_col: str,
    order_col: str,
    year_col: str = "year",
    doy_col: str = "doy",
    sec_col: str = "sec_of_day",
    excl_years: tuple = (),
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Distributed reference semantics over precomputed
    (year, doy, sec) columns: per-(keys, year) running sum ordered by
    ``order_col``, then across-year mean/SD bands per
    (keys, doy, sec). Years in ``excl_years`` still accumulate (their
    curve exists) but are dropped from the reference statistics, like
    the reference's excl_years_from_reference."""

    def cum_fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order_col, kind="stable")
        out = df[keys + [year_col, doy_col, sec_col]].copy()
        out["cum"] = df[value_col].to_numpy(dtype=np.float64).cumsum()
        return out

    cum = grouped_block_map(
        ds, keys + [year_col], cum_fn, num_partitions=num_partitions)

    def stats_fn(df: pd.DataFrame) -> pd.DataFrame:
        row = {k: df[k].iloc[0] for k in keys + [doy_col, sec_col]}
        ref = df[~df[year_col].isin(excl_years)]
        v = ref["cum"].to_numpy(dtype=np.float64)
        n = len(v)
        mean = float(v.mean()) if n else float("nan")
        sd = float(v.std(ddof=1)) if n > 1 else float("nan")
        row.update({
            "n_years": np.int64(n),
            "mean_doy_time": mean,
            "sd_doy_time": sd,
            "mean_plus_sd": mean + sd,
            "mean_minus_sd": mean - sd,
            "mean_plus_196sd": mean + 1.96 * sd,
            "mean_minus_196sd": mean - 1.96 * sd,
        })
        return pd.DataFrame([row])

    return grouped_block_map(
        cum, keys + [doy_col, sec_col], stats_fn, num_partitions=num_partitions)
