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


def find_optimum_range(
    ds: ray.data.Dataset,
    *,
    xcol: str,
    ycol: str,
    n_bins: int = 20,
    win: int = 5,
    mode: str = "max",
    x_range: tuple[float, float] | None = None,
) -> dict:
    """FindOptimumRange (diive/analysis/optimumrange.py:19-474): bin X
    equal-width, mean Y per bin, slide a ``win``-bin window over the
    bin means and return the window where the window-mean of Y is
    optimal (max/min). Per-batch vectorized partials -> driver combine
    (bin count is tiny). Returns {bin_lo, bin_hi, x_lo, x_hi, y_opt}."""
    from .exchange import driver_combine

    if x_range is None:
        lo, hi = ds.min(xcol), ds.max(xcol)
    else:
        lo, hi = x_range

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df[xcol].astype(float).to_numpy()
        y = df[ycol].astype(float).to_numpy()
        m = ~np.isnan(x) & ~np.isnan(y) & (x >= lo) & (x <= hi)
        b = np.minimum(np.floor((x[m] - lo) / (hi - lo) * n_bins), n_bins - 1).astype(np.int64)
        return pd.DataFrame({"bin": b, "s": y[m], "n": 1}).groupby("bin", as_index=False).agg(
            s=("s", "sum"), n=("n", "sum")
        )

    agg = driver_combine(
        ds, partial, lambda df: df.groupby("bin", as_index=False)[["s", "n"]].sum(),
        batch_format="pandas",
    ).set_index("bin").reindex(range(n_bins))
    s = agg["s"].fillna(0.0).to_numpy()
    n = agg["n"].fillna(0).to_numpy()
    best, best_val = None, None
    for start in range(0, n_bins - win + 1):
        ns = n[start : start + win].sum()
        if ns == 0:
            continue
        v = s[start : start + win].sum() / ns
        if best is None or (v > best_val if mode == "max" else v < best_val):
            best, best_val = start, v
    if best is None:
        return {"bin_lo": -1, "bin_hi": -1, "x_lo": np.nan, "x_hi": np.nan, "y_opt": np.nan}
    width = (hi - lo) / n_bins
    return {
        "bin_lo": best,
        "bin_hi": best + win - 1,
        "x_lo": lo + best * width,
        "x_hi": lo + (best + win) * width,
        "y_opt": best_val,
    }


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
