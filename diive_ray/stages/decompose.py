"""Seasonal-trend decomposition — the reference's
``SeasonalTrendDecompositionSTL`` (statsmodels STL, used by
FeatureEngineer stage 6, diive/core/ml/feature_engineer.py) replaced by
a deterministic closed-form **harmonic regression** decomposition
(statsmodels is not in this container; the stage contract is the same:
value -> trend + seasonal + residual columns):

* trend     — centered rolling mean over ``trend_window`` buckets
              (min_periods=1),
* seasonal  — least-squares fit of ``n_harmonics`` sine/cosine pairs of
              the fundamental ``period`` to (value - trend), evaluated
              per row (closed-form normal equations, no iteration),
* residual  — value - trend - seasonal.

Runs per ordered key group (grouped block stage); deterministic, exact,
and reproducible — unlike STL's loess iterations, which is also why the
reference's own tests never pin STL outputs numerically.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
import ray.data

from ..util import ts_to_us


def harmonic_decompose_frame(
    df: pd.DataFrame,
    value_col: str,
    *,
    ts_col: str = "ts",
    period_us: int,
    n_harmonics: int = 2,
    trend_window: int = 0,
) -> pd.DataFrame:
    """One ordered key frame -> + trend/seasonal/resid columns.
    ``trend_window`` 0 disables the trend (flat mean)."""
    s = df[value_col].astype(float)
    if trend_window and trend_window > 1:
        trend = s.rolling(window=trend_window, center=True, min_periods=1).mean()
    else:
        trend = pd.Series(np.full(len(s), s.mean()), index=s.index)
    detrended = (s - trend).to_numpy()
    us = ts_to_us(df[ts_col]).astype(np.float64)
    phase = 2.0 * np.pi * (us % period_us) / period_us
    cols = []
    for h in range(1, n_harmonics + 1):
        cols.append(np.sin(h * phase))
        cols.append(np.cos(h * phase))
    X = np.column_stack(cols)
    obs = ~np.isnan(detrended)
    if obs.sum() >= X.shape[1]:
        A = X[obs].T @ X[obs] + 1e-9 * np.eye(X.shape[1])
        coef = np.linalg.solve(A, X[obs].T @ detrended[obs])
        seasonal = X @ coef
    else:
        seasonal = np.zeros(len(s))
    out = df.copy()
    out[f"{value_col}_trend"] = trend.to_numpy()
    out[f"{value_col}_seasonal"] = seasonal
    out[f"{value_col}_resid"] = s.to_numpy() - trend.to_numpy() - seasonal
    return out


def harmonic_decompose(
    ds: ray.data.Dataset,
    *,
    value_col: str,
    keys: Iterable[str] = ("source",),
    ts_col: str = "ts",
    period_us: int,
    n_harmonics: int = 2,
    trend_window: int = 0,
) -> ray.data.Dataset:
    keys = list(keys)

    def gfn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(ts_col, kind="stable").reset_index(drop=True)
        return harmonic_decompose_frame(
            df, value_col, ts_col=ts_col, period_us=period_us,
            n_harmonics=n_harmonics, trend_window=trend_window,
        )

    from .exchange import grouped_block_map

    return grouped_block_map(ds, keys, gfn)
