"""Gap-fill model scoring — the engine's counterpart of the reference's
prediction metrics (reference: diive/gapfilling/scores.py:1-50
``prediction_scores`` — mae / medae / mse / rmse / mape / maxe / r2 —
and core/ml/common.py:259 ``scores_`` / ``scores_traintest_``).

Re-derived from the public metric definitions (sklearn formulas), no
sklearn dependency: everything is a handful of vectorized reductions.
Per-key scoring rides the exchange layer: each key's (prediction,
target) rows are co-located by one ``grouped_block_map``, so even the
non-decomposable metrics (median absolute error, max error) are exact
with no driver materialization.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
import ray.data

#: column order of a scores row (after the key columns)
SCORE_COLS = ["n_scored", "mae", "medae", "mse", "rmse", "mape", "maxe", "r2"]


def prediction_scores_np(predictions: np.ndarray, targets: np.ndarray) -> dict:
    """The reference's seven regression metrics (scores.py:41-49),
    vectorized. ``mape`` follows sklearn's definition (|t| clamped at
    float64 eps). ``r2`` is NaN when the targets are constant (sstot=0,
    undefined rather than sklearn's 0-convention) so downstream SQL
    oracles can mirror it with a NULL."""
    p = np.asarray(predictions, dtype=np.float64)
    t = np.asarray(targets, dtype=np.float64)
    n = len(t)
    if n == 0:
        return {k: float("nan") for k in SCORE_COLS[1:]} | {"n_scored": 0}
    err = t - p
    abs_err = np.abs(err)
    mse = float(np.mean(err * err))
    sstot = float(np.sum((t - t.mean()) ** 2))
    eps = np.finfo(np.float64).eps
    return {
        "n_scored": n,
        "mae": float(abs_err.mean()),
        "medae": float(np.median(abs_err)),
        "mse": mse,
        "rmse": float(np.sqrt(mse)),
        "mape": float(np.mean(abs_err / np.maximum(np.abs(t), eps))),
        "maxe": float(abs_err.max()),
        "r2": (1.0 - float(np.sum(err * err)) / sstot) if sstot > 0 else float("nan"),
    }


def scores_per_key(
    ds: ray.data.Dataset,
    keys: Iterable[str],
    *,
    pred_col: str,
    target_col: str,
) -> pd.DataFrame:
    """One scores row per key over the non-null (pred, target) rows.
    One keyed exchange; medae/maxe are exact because each key's rows
    arrive whole."""
    from .exchange import grouped_block_map

    keys = list(keys)

    def gfn(df: pd.DataFrame) -> pd.DataFrame:
        m = df[pred_col].notna() & df[target_col].notna()
        row = {k: df[k].iloc[0] for k in keys}
        row.update(
            prediction_scores_np(
                df.loc[m, pred_col].to_numpy(dtype=np.float64),
                df.loc[m, target_col].to_numpy(dtype=np.float64),
            )
        )
        return pd.DataFrame([row])

    out = grouped_block_map(ds, keys, gfn).to_pandas()
    if out.empty:
        out = pd.DataFrame(columns=keys + SCORE_COLS)
    out["n_scored"] = out["n_scored"].astype("int64")
    return out.sort_values(keys, kind="stable").reset_index(drop=True)


def planted_gap_fill_scores(
    ds: ray.data.Dataset,
    keys: Iterable[str],
    *,
    value_col: str = "mean",
    order_col: str = "bucket_ts",
    hide_every: int = 5,
    hide_phase: int = 2,
    hour_us: int = 3_600_000_000,
    interp_limit: int = 2,
) -> pd.DataFrame:
    """Deterministic, SQL-replayable gap-fill scoring: hide every row
    whose epoch-hour ≡ ``hide_phase`` (mod ``hide_every``), linearly
    interpolate the hidden rows over the *observed-row sequence*
    (position-based, runs longer than ``interp_limit`` stay unfilled —
    interpolate.py:154-164 semantics), then score filled values against
    the hidden truth per key. Exact-oracle safe: the hide rule, the
    interpolation and every metric replay verbatim in SQL (``mape``
    excluded here — sklearn's eps clamp has no SQL twin; the per-key
    normalized ``nmae`` = mae / mean|truth| stands in)."""
    from ..util import ts_to_us
    from .exchange import grouped_block_map

    keys = list(keys)

    def gfn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order_col, kind="stable").reset_index(drop=True)
        v = df[value_col].to_numpy(dtype=np.float64)
        n = len(v)
        hours = ts_to_us(df[order_col]) // hour_us
        hidden = (hours % hide_every) == hide_phase
        row = {k: df[k].iloc[0] for k in keys}
        vis_idx = np.flatnonzero(~hidden)
        hid_idx = np.flatnonzero(hidden)
        if len(vis_idx) == 0 or len(hid_idx) == 0:
            row.update(prediction_scores_np(np.zeros(0), np.zeros(0)))
            row["nmae"] = float("nan")
            return pd.DataFrame([row])
        # nearest visible neighbors by position; the arithmetic below
        # mirrors the SQL oracle's expression tree token for token
        # (pv + (nv - pv) * (pos - pp) / (np - pp)) for bit parity
        r = np.searchsorted(vis_idx, hid_idx)
        ok = (r > 0) & (r < len(vis_idx))
        i = hid_idx[ok]
        pp = vis_idx[r[ok] - 1]
        nx = vis_idx[np.minimum(r[ok], len(vis_idx) - 1)]
        fillable = (nx - pp - 1) <= interp_limit
        i, pp, nx = i[fillable], pp[fillable], nx[fillable]
        pred = v[pp] + (v[nx] - v[pp]) * (i - pp).astype(np.float64) / (
            nx - pp
        ).astype(np.float64)
        row.update(prediction_scores_np(pred, v[i]))
        abs_t = np.abs(v[i])
        row["nmae"] = (
            row["mae"] / abs_t.mean() if len(i) and abs_t.mean() > 0 else float("nan")
        )
        return pd.DataFrame([row])

    out = grouped_block_map(ds, keys, gfn).to_pandas()
    if out.empty:
        out = pd.DataFrame(columns=keys + SCORE_COLS + ["nmae"])
    out["n_scored"] = out["n_scored"].astype("int64")
    return out.sort_values(keys, kind="stable").reset_index(drop=True)
