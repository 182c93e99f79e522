"""Hyperparameter optimization with time-series cross-validation
(reference: diive/core/ml/optimization.py:28-200, OptimizeParamsTS —
GridSearchCV over a param grid with TimeSeriesSplit folds, chronological
25% holdout, neg-MSE selection, prediction scores on the holdout).

Distributed shape: the bounded model table (X, y) goes to the object
store ONCE via ``ray.put``; the (param-combo × CV-fold) grid fans out
as a Ray Dataset of slim spec rows — one model fit per row, each
reading the shared training arrays zero-copy. The score table coming
back is combos × folds rows (tiny); combine + best-pick is driver-side
over that bounded frame, then one refit on the full training span
scores the holdout. Model-fit compute dominates, so the fan-out is the
part worth distributing — exactly GridSearchCV's ``n_jobs`` axis.

Determinism: combos enumerate in sorted-key/product order (sklearn
ParameterGrid order), each fit's seed is a pure function of
(seed, combo, fold), and ties break on the lowest combo index — the
result is independent of cluster size and partitioning.
"""

from __future__ import annotations

import json
import math
from itertools import product
from typing import Any

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from .scores import prediction_scores_np
from .trees import fit_forest, fit_gbm, predict_forest, predict_gbm


def timeseries_split_bounds(n: int, n_splits: int) -> list[tuple[int, int]]:
    """sklearn ``TimeSeriesSplit(n_splits)`` fold boundaries on ``n``
    chronologically ordered rows: ``test_size = n // (n_splits + 1)``;
    fold i trains on ``[0, test_start)`` and tests on
    ``[test_start, test_start + test_size)`` with
    ``test_start = n - (n_splits - i) * test_size``."""
    test_size = n // (n_splits + 1)
    if test_size < 1:
        raise ValueError(f"n={n} too small for n_splits={n_splits}")
    out = []
    for i in range(n_splits):
        test_start = n - (n_splits - i) * test_size
        out.append((test_start, test_start + test_size))
    return out


def param_grid_combos(grid: dict[str, list]) -> list[dict[str, Any]]:
    """Sorted-key cartesian product — sklearn ParameterGrid order."""
    keys = sorted(grid)
    return [dict(zip(keys, vals)) for vals in product(*(grid[k] for k in keys))]


_MODELS = {
    "forest": (fit_forest, predict_forest),
    "gbm": (fit_gbm, predict_gbm),
}


def _fit_predict(model: str, params: dict, seed: int,
                 Xtr: np.ndarray, ytr: np.ndarray, Xte: np.ndarray) -> np.ndarray:
    fit, predict = _MODELS[model]
    return predict(fit(Xtr, ytr, seed=seed, **params), Xte)


def grid_search_ts(
    X: np.ndarray,
    y: np.ndarray,
    param_grid: dict[str, list],
    *,
    model: str = "forest",
    n_splits: int = 10,
    test_frac: float = 0.25,
    seed: int = 42,
) -> tuple[pd.DataFrame, dict[str, Any], dict]:
    """Grid search over ``param_grid`` with TimeSeriesSplit CV on the
    first ``1 - test_frac`` of the rows (chronological, like the
    reference's ``shuffle=False`` split; holdout = last
    ``ceil(n · test_frac)`` rows). Returns
    ``(cv_results, best_params, holdout_scores)`` where cv_results has
    one row per combo (params + mean_cv_mse + rank_cv + is_best)."""
    n = len(y)
    n_hold = int(math.ceil(n * test_frac))
    n_train = n - n_hold
    Xtr_all, ytr_all = X[:n_train], y[:n_train]
    folds = timeseries_split_bounds(n_train, n_splits)
    combos = param_grid_combos(param_grid)

    shared = ray.put((np.ascontiguousarray(Xtr_all, dtype=np.float64),
                      np.ascontiguousarray(ytr_all, dtype=np.float64)))

    specs = [
        {"combo": ci, "fold": fi, "params_json": json.dumps(c, sort_keys=True)}
        for ci, c in enumerate(combos)
        for fi in range(len(folds))
    ]

    def fit_batch(df: pd.DataFrame) -> pd.DataFrame:
        Xb, yb = ray.get(shared)
        rows = []
        for ci, fi, pj in zip(df["combo"], df["fold"], df["params_json"]):
            params = json.loads(pj)
            tr_end, te_end = folds[fi]
            pred = _fit_predict(
                model, params, seed * 100_003 + int(ci) * 1_009 + int(fi),
                Xb[:tr_end], yb[:tr_end], Xb[tr_end:te_end])
            err = yb[tr_end:te_end] - pred
            rows.append((int(ci), int(fi), float(np.mean(err * err))))
        return pd.DataFrame(rows, columns=["combo", "fold", "mse"])

    cv = (
        rd.from_items(specs, override_num_blocks=len(specs))
        .map_batches(fit_batch, batch_format="pandas")
        .to_pandas()
    )
    per_combo = cv.groupby("combo", as_index=False)["mse"].mean().rename(
        columns={"mse": "mean_cv_mse"}).sort_values("combo").reset_index(drop=True)
    # rank 1 = best; ties -> lowest combo index (stable kind on sorted combos)
    order = np.lexsort((per_combo["combo"].to_numpy(),
                        per_combo["mean_cv_mse"].to_numpy()))
    rank = np.empty(len(order), dtype=np.int64)
    rank[order] = np.arange(1, len(order) + 1)
    per_combo["rank_cv"] = rank
    per_combo["is_best"] = (rank == 1).astype(np.int64)
    best_idx = int(per_combo.loc[per_combo["is_best"] == 1, "combo"].iloc[0])
    best_params = combos[best_idx]

    pred_hold = _fit_predict(model, best_params, seed * 100_003 + best_idx * 1_009 + 999,
                             Xtr_all, ytr_all, X[n_train:])
    scores = prediction_scores_np(pred_hold, y[n_train:])

    params_frame = pd.DataFrame(combos)
    out = pd.concat([params_frame, per_combo.drop(columns=["combo"])], axis=1)
    return out, best_params, scores
