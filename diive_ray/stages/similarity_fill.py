"""Similarity-based gap-filling — the reference's MDS / FluxMDS cascade
(diive/gapfilling/similarity.py:26-42,78,145-350; mds.py): fill a gap
with the mean of records that are *similar in feature space* within a
time window around the gap, escalating through a stage cascade
(narrow features + short window -> fewer features + longer window ->
mean-diurnal-cycle fallback), and record a granular quality flag
``stage_code`` (the reference encodes method*1000+window,
similarity.py:340-350).

Generic over feature columns: each stage is (features, window) where a
feature is (column, tolerance, cyclic_period_or_None). The reference's
meteo configuration maps to
``[(SWIN, 50, None), (TA, 2.5, None), (VPD, 0.5, None)]`` at ±7/±14
days; corpora without meteo columns use time-derived features (e.g.
hour-of-day with a cyclic tolerance — the fallback mean-diurnal-cycle
method is exactly that).

Physical plan: per ordered key group (grouped block stage). Donor
search per gap row is a searchsorted window slice + vectorized
tolerance mask — O(gaps x window), the same cost shape as the
reference's per-gap expanding search."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable

import numpy as np
import pandas as pd
import ray.data

from ..util import ts_to_us


@dataclass(frozen=True)
class FillStage:
    features: tuple  # ((col, tol, cyclic_period|None), ...)
    window_us: int
    min_donors: int = 2
    code: int = 0


def _feature_mask(df_vals: dict, i: int, idx: np.ndarray, features) -> np.ndarray:
    m = np.ones(len(idx), dtype=bool)
    for col, tol, cyc in features:
        v = df_vals[col]
        d = np.abs(v[idx] - v[i])
        if cyc:
            d = np.minimum(d, cyc - d)
        m &= d <= tol
        m &= ~np.isnan(v[idx])
    return m


def similarity_fill_frame(
    df: pd.DataFrame,
    value_col: str,
    stages: Iterable[FillStage],
    *,
    ts_col: str = "ts",
    out_col: str | None = None,
) -> pd.DataFrame:
    """One ordered key frame -> + filled column + stage-code flag
    (null where no stage found enough donors). Observed values are
    never modified (gap-fill contract)."""
    out_col = out_col or f"{value_col}_simfilled"
    df = df.reset_index(drop=True)
    us = ts_to_us(df[ts_col]).astype(np.int64)
    v = df[value_col].astype(float).to_numpy()
    filled = v.copy()
    code = np.full(len(df), np.nan)
    code[~np.isnan(v)] = 0
    feat_cols = {c for st in stages for (c, _, _) in st.features}
    df_vals = {c: df[c].astype(float).to_numpy() for c in feat_cols}
    observed = ~np.isnan(v)
    missing = np.flatnonzero(~observed)
    for st in stages:
        still = missing[np.isnan(code[missing])]
        if len(still) == 0:
            break
        for i in still:
            lo = np.searchsorted(us, us[i] - st.window_us, side="left")
            hi = np.searchsorted(us, us[i] + st.window_us, side="right")
            idx = np.arange(lo, hi)
            idx = idx[observed[idx]]
            if len(idx) == 0:
                continue
            m = _feature_mask(df_vals, i, idx, st.features)
            donors = idx[m]
            if len(donors) >= st.min_donors:
                filled[i] = v[donors].mean()
                code[i] = st.code
    df[out_col] = filled
    df[f"{out_col}_flag"] = code
    return df


def similarity_fill(
    ds: ray.data.Dataset,
    value_col: str,
    stages: Iterable[FillStage],
    *,
    keys: Iterable[str] = ("source",),
    ts_col: str = "ts",
    out_col: str | None = None,
) -> ray.data.Dataset:
    keys = list(keys)
    stages = list(stages)

    def gfn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(ts_col, kind="stable").reset_index(drop=True)
        return similarity_fill_frame(df, value_col, stages, ts_col=ts_col, out_col=out_col)

    from .exchange import grouped_block_map

    return grouped_block_map(ds, keys, gfn)
