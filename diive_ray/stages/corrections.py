"""Value corrections — stateless vectorized ``map_batches`` stages.

Reference: diive/preprocessing/corrections/.

* ``setto_threshold`` (setto.py:121-170): type='max' sets values above
  the threshold TO the threshold; type='min' sets values below it.
* ``setto_value`` (setto.py:80-120): set records in single datetimes /
  closed [start, end] ranges to a constant.
* ``set_exact_values_to_missing`` (setto.py:20-79): exact matches -> null.
* ``offset_to_max`` — the engine's analogue of
  ``remove_relativehumidity_offset`` (offsetcorrection.py:130-199):
  per-day mean of the exceedance above ``cap`` (computed from values >
  cap only) is interpolated/ffilled/bfilled across days, subtracted,
  then the result clamped at ``cap``. Needs a per-(key, day) aggregate
  broadcast back onto rows (``aggregated_as_hires`` pattern,
  diive/core/dfun/frames.py:255-316) -> implemented per key group.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def setto_threshold_batch(batch: pa.Table, col: str, threshold: float, type: str = "max") -> pa.Table:
    v = batch[col]
    if type == "max":
        out = pc.min_element_wise(v, pa.scalar(float(threshold), type=pa.float64()))
    elif type == "min":
        out = pc.max_element_wise(v, pa.scalar(float(threshold), type=pa.float64()))
    else:
        raise ValueError(f"type must be 'min' or 'max', got {type!r}")
    return batch.set_column(batch.column_names.index(col), col, out)


def setto_value_batch(batch: pa.Table, col: str, dates: list, value: float, ts_col: str = "ts") -> pa.Table:
    """setto.py:80-120: ``dates`` mixes single datetimes and
    [start, end] closed ranges (inclusive both ends)."""
    ts = batch[ts_col].to_pandas()
    v = batch[col].to_pandas().astype(float)
    for d in dates:
        if isinstance(d, (list, tuple)):
            m = (ts >= pd.Timestamp(d[0])) & (ts <= pd.Timestamp(d[1]))
        else:
            m = (ts >= pd.Timestamp(d)) & (ts <= pd.Timestamp(d))
        v[m.to_numpy()] = value
    return batch.set_column(batch.column_names.index(col), col, pa.array(v, type=pa.float64()))


def set_exact_values_to_missing_batch(batch: pa.Table, col: str, values: list) -> pa.Table:
    v = batch[col].combine_chunks().cast(pa.float64())
    mask = None
    for val in values:
        eq = pc.equal(v, pa.scalar(float(val), type=pa.float64()))
        mask = eq if mask is None else pc.or_(mask, eq)
    out = pc.if_else(pc.fill_null(mask, False), pa.scalar(None, type=pa.float64()), v)
    return batch.set_column(batch.column_names.index(col), col, out)


def setto_threshold(ds: ray.data.Dataset, col: str, threshold: float, type: str = "max") -> ray.data.Dataset:
    return ds.map_batches(
        lambda b: setto_threshold_batch(b, col, threshold, type),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def setto_value(ds: ray.data.Dataset, col: str, dates: list, value: float, ts_col: str = "ts") -> ray.data.Dataset:
    return ds.map_batches(
        lambda b: setto_value_batch(b, col, dates, value, ts_col),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def set_exact_values_to_missing(ds: ray.data.Dataset, col: str, values: list) -> ray.data.Dataset:
    return ds.map_batches(
        lambda b: set_exact_values_to_missing_batch(b, col, values),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def offset_to_max_frame(df: pd.DataFrame, col: str, cap: float, ts_col: str = "ts") -> pd.DataFrame:
    """One key group (sorted by ts): offsetcorrection.py:130-199."""
    s = df[col].astype(float).reset_index(drop=True)
    ts = pd.to_datetime(df[ts_col]).reset_index(drop=True)
    exceeds = s.where(s > cap)
    day = ts.dt.floor("D")
    daily_mean = exceeds.groupby(day).transform("mean")
    offset = daily_mean - cap
    if offset.dropna().empty:
        offset[:] = 0.0
    else:
        # interpolate/ffill/bfill across days on the hires rows — same
        # effect as interpolating the daily series then broadcasting
        # (aggregated_as_hires with interpolate_missing_vals=True)
        offset = offset.interpolate().ffill().bfill()
    corr = s - offset
    corr[corr > cap] = cap
    out = df.copy()
    out[col] = corr.to_numpy()
    return out


def offset_to_max(
    ds: ray.data.Dataset, col: str, cap: float = 100.0,
    *, keys: Iterable[str] = ("source",), ts_col: str = "ts",
) -> ray.data.Dataset:
    keys = list(keys)

    def gfn(df: pd.DataFrame) -> pd.DataFrame:
        return offset_to_max_frame(df.sort_values(ts_col, kind="stable"), col, cap, ts_col)

    from .exchange import grouped_block_map

    return grouped_block_map(ds, keys, gfn)


def trim_to_var(
    ds: ray.data.Dataset,
    var: str,
    *,
    keys: list[str] | None = None,
    ts_col: str = "ts",
) -> ray.data.Dataset:
    """Trim start/end of the series to the first/last non-missing
    record of ``var`` (reference core/dfun/frames.py:207-237,
    trim_frame — interior gaps of ``var`` are ignored, only the edges
    are cut). Per key when ``keys`` given, else globally.

    Ray shape: NO shuffle — pass 1 is a per-batch partial
    (key, first/last non-null stamp) combined on the driver (bounded by
    key cardinality), pass 2 filters with the closure-shipped bounds.
    """
    import numpy as np

    keys = list(keys or [])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ok = df[df[var].notna()]
        if keys:
            g = ok.groupby(keys, as_index=False)[ts_col].agg(["min", "max"])
            return g.rename(columns={"min": "ft", "max": "lt"})
        if ok.empty:
            return pd.DataFrame({"ft": [], "lt": []})
        return pd.DataFrame({"ft": [ok[ts_col].min()], "lt": [ok[ts_col].max()]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return ds.filter(lambda row: False)
    if keys:
        bdf = parts.groupby(keys, as_index=False).agg(
            ft=("ft", "min"), lt=("lt", "max"))

        def keep(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return df
            m = df.merge(bdf, on=keys, how="left")
            mask = (m[ts_col].to_numpy() >= m["ft"].to_numpy()) & (
                m[ts_col].to_numpy() <= m["lt"].to_numpy())
            return df[np.asarray(mask)]
    else:
        ft, lt = parts["ft"].min(), parts["lt"].max()

        def keep(df: pd.DataFrame) -> pd.DataFrame:
            return df[(df[ts_col] >= ft) & (df[ts_col] <= lt)]

    return ds.map_batches(keep, batch_format="pandas")
