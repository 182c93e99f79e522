"""Grid search with TimeSeriesSplit CV (stages/optimization.py vs
reference core/ml/optimization.py). Pins: (1) fold bounds replicate
sklearn TimeSeriesSplit exactly (hand-worked cases — sklearn is not in
this container); (2) planted nonlinear structure drives the selection
to the deeper model; (3) the whole search is deterministic across
repeat runs (cluster-size-independent seeds)."""

import numpy as np
import pandas as pd
import pytest

from diive_ray.stages.optimization import (
    grid_search_ts,
    param_grid_combos,
    timeseries_split_bounds,
)


def test_fold_bounds_match_sklearn_semantics():
    # sklearn TimeSeriesSplit(n_splits=3) on 10 rows: test_size=2,
    # folds train[0:4]/test[4:6], [0:6]/[6:8], [0:8]/[8:10].
    assert timeseries_split_bounds(10, 3) == [(4, 6), (6, 8), (8, 10)]
    # n=12, n_splits=5 -> test_size=2, first train = 12 - 5*2 = 2
    assert timeseries_split_bounds(12, 5) == [
        (2, 4), (4, 6), (6, 8), (8, 10), (10, 12)]
    with pytest.raises(ValueError):
        timeseries_split_bounds(3, 5)


def test_param_grid_order_is_sklearn_parametergrid():
    got = param_grid_combos({"b": [1, 2], "a": [10, 20]})
    # sorted keys (a before b), product order
    assert got == [
        {"a": 10, "b": 1}, {"a": 10, "b": 2},
        {"a": 20, "b": 1}, {"a": 20, "b": 2},
    ]


@pytest.fixture(scope="module")
def planted_xy():
    rng = np.random.Generator(np.random.Philox(key=[5, 2026]))
    n = 600
    t = np.arange(n, dtype=np.float64)
    x1 = np.sin(2 * np.pi * t / 24.0)
    x2 = (t % 7 < 3.5).astype(np.float64)
    # Interaction: a depth-1 stump cannot represent x1*x2
    y = 3.0 * x1 * x2 + 0.05 * rng.standard_normal(n)
    X = np.column_stack([x1, x2, t / n])
    return X, y


def test_planted_interaction_prefers_depth(planted_xy, ray_session):
    X, y = planted_xy
    cv, best, scores = grid_search_ts(
        X, y, {"max_depth": [1, 5]}, model="gbm",
        n_splits=4, seed=7)
    assert best == {"max_depth": 5}
    assert set(cv.columns) >= {"max_depth", "mean_cv_mse", "rank_cv", "is_best"}
    shallow = cv.loc[cv["max_depth"] == 1, "mean_cv_mse"].iloc[0]
    deep = cv.loc[cv["max_depth"] == 5, "mean_cv_mse"].iloc[0]
    assert deep < 0.5 * shallow
    assert scores["r2"] > 0.8 and scores["n_scored"] == 150


def test_deterministic_across_runs(planted_xy, ray_session):
    X, y = planted_xy
    grid = {"n_trees": [4, 8], "max_depth": [2, 4]}
    a, best_a, sc_a = grid_search_ts(X, y, grid, model="forest", n_splits=3, seed=11)
    b, best_b, sc_b = grid_search_ts(X, y, grid, model="forest", n_splits=3, seed=11)
    pd.testing.assert_frame_equal(a, b)
    assert best_a == best_b and sc_a == sc_b
