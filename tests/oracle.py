"""Pandas oracle mirroring the reference semantics (FIXTURES.md F2).

Implements, with pandas resample/rolling exactly as the reference does:
* END->MIDDLE shift then resample(label='right', closed='left') with
  min-count mask (diive/core/times/resampling.py:94-197),
* cascaded re-aggregation of count/sum/min/max, mean=sum/count
  (resampling.py:47-90),
* keep-last duplicate-timestamp removal (times.py:1409-1459),
* gap run table via notna().cumsum() (gapfinder.py:120-130),
* per-gap loop-based linear interpolation with limit — intentionally a
  *different* implementation than the engine's vectorized one
  (interpolate.py:154-164 semantics),
* rolling flag algebra for the outlier detectors (per-module tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def dedup_keep_last(df: pd.DataFrame, keys=("source",), ts_col="ts", order_col="doc_id") -> pd.DataFrame:
    df = df.sort_values(list(keys) + [ts_col, order_col], kind="stable")
    return df.drop_duplicates(subset=list(keys) + [ts_col], keep="last")


def mincounts_30min_rule(maxcount: int, perc: float) -> int:
    m = int(maxcount * perc)
    return 1 if m < 3 else m


def resample_first_tier(
    df: pd.DataFrame,
    freq: str,
    *,
    value_col="n_tok",
    key="source",
    ts_col="ts",
    end_stamped=True,
    raw_width_s: float | None = 1.0,
    mincounts_perc: float = 0.0,
) -> pd.DataFrame:
    """Per-key resample of raw rows to the first tier."""
    out = []
    for k, g in df.groupby(key):
        s = g.set_index(ts_col)[value_col].astype(float).sort_index()
        if end_stamped:
            s.index = s.index - pd.Timedelta(seconds=raw_width_s / 2.0)
        r = s.resample(freq, label="right", closed="left")
        agg = pd.DataFrame(
            {"count": r.count(), "sum": r.sum(), "min": r.min(), "max": r.max(), "mean": r.mean()}
        )
        mincounts = 1
        if mincounts_perc > 0:
            if raw_width_s is not None:
                maxcount = int(pd.Timedelta(freq).total_seconds() / raw_width_s)
            else:
                maxcount = int(agg["count"].max())
            mincounts = mincounts_30min_rule(maxcount, mincounts_perc)
        agg = agg[agg["count"] >= mincounts]
        agg[key] = k
        out.append(agg.rename_axis("bucket_ts").reset_index())
    return pd.concat(out, ignore_index=True)


def resample_coarser(tier: pd.DataFrame, freq: str, *, key="source") -> pd.DataFrame:
    """Cascade: re-aggregate decomposable partials of a finer tier.
    Finer bucket END stamps in (start, end] belong to coarse bucket end,
    i.e. closed='right', label='right' on the END-labeled stamps."""
    out = []
    for k, g in tier.groupby(key):
        g = g.set_index("bucket_ts").sort_index()
        r = g.resample(freq, label="right", closed="right")
        agg = pd.DataFrame(
            {
                "count": r["count"].sum(),
                "sum": r["sum"].sum(),
                "min": r["min"].min(),
                "max": r["max"].max(),
                "n_child": r["count"].count(),
            }
        )
        agg = agg[agg["n_child"] > 0]
        agg["mean"] = agg["sum"] / agg["count"]
        agg[key] = k
        out.append(agg.rename_axis("bucket_ts").reset_index())
    return pd.concat(out, ignore_index=True)


def gap_runs(s: pd.Series) -> list[tuple[int, int]]:
    """Loop-based (start_pos, length) of consecutive-NaN runs."""
    runs = []
    in_gap = False
    vals = s.isna().to_list()
    for i, na in enumerate(vals):
        if na and not in_gap:
            runs.append([i, 1])
            in_gap = True
        elif na:
            runs[-1][1] += 1
        else:
            in_gap = False
    return [tuple(r) for r in runs]


def linear_fill_limited(s: pd.Series, limit: int) -> pd.Series:
    """Loop-based per-gap linear interpolation, only gaps <= limit with
    both neighbors observed (limit_area='inside')."""
    out = s.copy()
    vals = s.to_numpy(dtype=float)
    for pos, length in gap_runs(s):
        if length > limit:
            continue
        lo, hi = pos - 1, pos + length
        if lo < 0 or hi >= len(vals):
            continue  # edge gap: no 'inside' interpolation
        a, b = vals[lo], vals[hi]
        if np.isnan(a) or np.isnan(b):
            continue
        fill = a + (b - a) * np.arange(1, length + 1) / (length + 1)
        out.iloc[pos : pos + length] = fill
    return out
