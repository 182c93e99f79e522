"""Compound-extreme classification of two driver series.

Reference: diive/analysis/compoundextremes.py (CompoundExtremes, after
Wang et al. compound dry-hot detection): aggregate both drivers to
monthly/daily periods, standardize to z-scores ('season' = against the
same calendar position, 'record' = whole-record mean/std, ddof=1), flag
each variable's extreme tail (z >= thr for 'high', z <= -thr for
'low'), classify periods none/var1/var2/compound.

Ray shape: the period aggregation is the engine's cascade tier (one
exchange); the classification itself is a tiny per-period frame op —
the reference's own contract is two aligned series, so the z-scoring
runs on the aggregated (small) result.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

CATEGORY_ORDER = ["none", "var1", "var2", "compound"]


def _zscore(s: pd.Series, periods: pd.Series, agg: str, standardize_by: str) -> pd.Series:
    """compoundextremes.py:162-175 semantics: 'record' = one mean/std
    (ddof=1) over the record; 'season' = per calendar-month (monthly)
    or day-of-year (daily) groups, zero/undefined-variance groups
    yield NaN (not extreme)."""
    if standardize_by == "record":
        std = s.std()
        return (s - s.mean()) / std if std else s * 0.0
    key = periods.dt.month if agg == "monthly" else periods.dt.dayofyear
    g = s.groupby(key.to_numpy())
    mean = g.transform("mean")
    std = g.transform("std")
    z = (s - mean) / std
    return z.where(std.ne(0))


def compound_extremes_frame(
    df: pd.DataFrame,
    *,
    period_col: str,
    v1: str,
    v2: str,
    agg: str = "monthly",
    var1_extreme: str = "high",
    var2_extreme: str = "low",
    threshold: float = 2.0,
    var1_threshold: float | None = None,
    var2_threshold: float | None = None,
    standardize_by: str = "season",
) -> pd.DataFrame:
    """Classify pre-aggregated periods (one row per period with both
    driver values). Appends z1/z2, var1_extreme/var2_extreme flags and
    the category code; periods missing either z are dropped
    (compoundextremes.py:190-192)."""
    t1 = threshold if var1_threshold is None else var1_threshold
    t2 = threshold if var2_threshold is None else var2_threshold
    out = df.copy()
    periods = pd.to_datetime(out[period_col])
    out["z1"] = _zscore(out[v1], periods, agg, standardize_by)
    out["z2"] = _zscore(out[v2], periods, agg, standardize_by)
    out = out.dropna(subset=["z1", "z2"]).reset_index(drop=True)
    f1 = out["z1"] >= t1 if var1_extreme == "high" else out["z1"] <= -t1
    f2 = out["z2"] >= t2 if var2_extreme == "high" else out["z2"] <= -t2
    out["var1_extreme"] = f1.to_numpy()
    out["var2_extreme"] = f2.to_numpy()
    cat = np.full(len(out), "none", dtype=object)
    cat[f1.to_numpy() & ~f2.to_numpy()] = "var1"
    cat[~f1.to_numpy() & f2.to_numpy()] = "var2"
    cat[f1.to_numpy() & f2.to_numpy()] = "compound"
    out["category"] = cat
    return out
