"""GridAggregator — 2-D binning + per-cell aggregation.

Reference: diive/analysis/gridaggregator.py:19-330 — bin two columns
(equal-width / quantile / custom edges), aggregate a value column per
cell (mean/min/max/median/sum/count), mask cells with count < mincounts;
long-format output.

Physical plan: global min/max (equal-width) or sampled quantile edges
are a tiny pre-pass; bin-id assignment is a stateless vectorized
map_batches; the per-cell aggregate is one small groupby (cells =
binsx * binsy rows). Bin rule: ``bin = clip(floor((v - lo) / (hi - lo)
* n), 0, n-1)`` — right-closed top edge like np.digitize on the max.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def _equal_width_edges(lo: float, hi: float, n: int) -> np.ndarray:
    return np.linspace(lo, hi, n + 1)


def assign_bins(v: np.ndarray, lo: float, hi: float, n: int) -> np.ndarray:
    with np.errstate(invalid="ignore"):
        b = np.floor((v - lo) / (hi - lo) * n)
    b = np.clip(b, 0, n - 1)
    out = np.where(np.isnan(v), -1, b).astype(np.int64)
    return out


def grid_aggregate(
    ds: ray.data.Dataset,
    *,
    xcol: str,
    ycol: str,
    value_col: str,
    binsx: int = 10,
    binsy: int = 10,
    agg: str = "mean",
    mincounts: int = 1,
    x_range: tuple[float, float] | None = None,
    y_range: tuple[float, float] | None = None,
) -> pd.DataFrame:
    """Long-format (binx, biny, n, value) per cell. Ranges default to the
    global min/max of each bin column (tiny pre-aggregate)."""
    if x_range is None:
        x_range = (ds.min(xcol), ds.max(xcol))
    if y_range is None:
        y_range = (ds.min(ycol), ds.max(ycol))
    (xlo, xhi), (ylo, yhi) = x_range, y_range

    def binner(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "binx": assign_bins(df[xcol].astype(float).to_numpy(), xlo, xhi, binsx),
                "biny": assign_bins(df[ycol].astype(float).to_numpy(), ylo, yhi, binsy),
                value_col: df[value_col].astype(float),
            }
        )
        return out[(out["binx"] >= 0) & (out["biny"] >= 0)]

    def agg_group(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col]
        row = {
            "binx": df["binx"].iloc[0],
            "biny": df["biny"].iloc[0],
            "n": int(v.count()),
            value_col: getattr(v, agg)(),
        }
        return pd.DataFrame([row])

    from .exchange import grouped_block_map

    cells = grouped_block_map(
        ds.map_batches(binner, batch_format="pandas"), ["binx", "biny"], agg_group
    ).to_pandas()
    if mincounts > 1:
        cells.loc[cells["n"] < mincounts, value_col] = np.nan
    return cells.sort_values(["binx", "biny"]).reset_index(drop=True)
