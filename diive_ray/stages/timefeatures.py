"""Timestamp-derived feature columns — stateless ``map_batches``.

Reference: ``vectorize_timestamps`` adds YEAR/SEASON/MONTH/WEEK/DOY/
HOUR plus cyclic sin/cos encodings (diive/core/times/times.py:1049-1178);
``insert_season`` maps months to season ids via DEFAULT_SEASON_MAP
(times.py:15-21, 1179-1244); ``insert_timestamp`` derives START/MIDDLE/
END stamps from the index + freq (times.py:1520-1643, 1734-1818).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..schema import DEFAULT_SEASON_MAP


def time_features_frame(
    df: pd.DataFrame,
    ts_col: str = "ts",
    *,
    cyclic: bool = True,
    season: bool = True,
) -> pd.DataFrame:
    ts = pd.to_datetime(df[ts_col])
    out = df.copy()
    out["YEAR"] = ts.dt.year.astype(np.int32)
    out["MONTH"] = ts.dt.month.astype(np.int32)
    out["WEEK"] = ts.dt.isocalendar().week.astype(np.int32)
    out["DOY"] = ts.dt.dayofyear.astype(np.int32)
    out["HOUR"] = ts.dt.hour.astype(np.int32)
    if season:
        out["SEASON"] = ts.dt.month.map(DEFAULT_SEASON_MAP).astype(np.int32)
    if cyclic:
        hour_frac = ts.dt.hour + ts.dt.minute / 60.0 + ts.dt.second / 3600.0
        out["HOUR_SIN"] = np.sin(2 * np.pi * hour_frac / 24.0)
        out["HOUR_COS"] = np.cos(2 * np.pi * hour_frac / 24.0)
        out["DOY_SIN"] = np.sin(2 * np.pi * out["DOY"] / 365.25)
        out["DOY_COS"] = np.cos(2 * np.pi * out["DOY"] / 365.25)
    return out


def add_time_features(ds: ray.data.Dataset, ts_col: str = "ts", **kw) -> ray.data.Dataset:
    return ds.map_batches(lambda df: time_features_frame(df, ts_col, **kw), batch_format="pandas")


def convert_end_to_middle(ds: ray.data.Dataset, delta_us: int, ts_col: str = "ts",
                          out_col: str | None = None) -> ray.data.Dataset:
    """TIMESTAMP_END -> TIMESTAMP_MIDDLE: subtract half the record
    interval (times.py:1734-1818). ``delta_us`` is the record interval."""
    out_col = out_col or ts_col

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ts = batch[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        if pa.types.is_timestamp(ts.type) and ts.type.unit != "us":
            ts = ts.cast(pa.timestamp("us"))
        shifted = pc.add(ts.cast(pa.int64()), pa.scalar(-delta_us // 2, type=pa.int64())).cast(pa.timestamp("us"))
        if out_col in batch.column_names:
            return batch.set_column(batch.column_names.index(out_col), out_col, shifted)
        return batch.append_column(out_col, shifted)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def keep_daterange(ds: ray.data.Dataset, start, end, ts_col: str = "ts") -> ray.data.Dataset:
    """Closed-interval time-range filter (times.py:1884-1934)."""
    lo = pd.Timestamp(start).to_datetime64()
    hi = pd.Timestamp(end).to_datetime64()

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ts = batch[ts_col]
        m = pc.and_(pc.greater_equal(ts, pa.scalar(lo)), pc.less_equal(ts, pa.scalar(hi)))
        return batch.filter(m)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def time_since_frame(
    values: np.ndarray,
    *,
    upper_lim: float | None = None,
    lower_lim: float | None = None,
    include_lim: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """TimeSince counter (reference diive/variables/temporal.py:139-349):
    flag=1 where the value is OUTSIDE [lower_lim, upper_lim] (bounds
    default to the series min/max; NaN counts as outside so gaps never
    reset the counter), then count consecutive flag=1 records, resetting
    to 0 at each inside-range record. Returns (flag, timesince), both
    int64, vectorized run-length counting (no Python loop)."""
    v = np.asarray(values, dtype=np.float64)
    n = len(v)
    if n == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    up = np.nanmax(v) if upper_lim is None else upper_lim
    lo = np.nanmin(v) if lower_lim is None else lower_lim
    with np.errstate(invalid="ignore"):
        if include_lim:
            inside = (v <= up) & (v >= lo)
        else:
            inside = (v < up) & (v > lo)
    flag = (~inside | np.isnan(v)).astype(np.int64)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = flag[1:] != flag[:-1]
    starts = np.flatnonzero(change)
    idx = np.arange(n)
    base = np.repeat(starts, np.diff(np.append(starts, n)))
    timesince = flag * (idx - base + 1)
    return flag, timesince.astype(np.int64)
