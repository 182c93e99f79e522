"""ALE + permutation importance: distributed implementations pinned to
in-memory reference-spec implementations (ale.py:192-255 / 258-322 of
the reference) and to closed forms for linear models."""

import numpy as np
import pandas as pd
import pytest

from diive_ray.stages.ale import (
    RANDOM_COL,
    _AleDelta,
    ale_1d,
    ale_2d,
    ale_direction,
    exact_quantile_edges,
    permutation_importance,
    quantile_edges_array,
)


def _events_frame(n=4000, seed=7):
    rng = np.random.Generator(np.random.Philox(key=seed))
    x1 = rng.uniform(0, 100, n)
    x2 = rng.uniform(-5, 5, n)
    y = 3.0 * x1 + x2 * x2 + rng.standard_normal(n)
    return pd.DataFrame(
        {"rid": np.arange(n, dtype=np.int64), "x1": x1, "x2": x2, "y": y}
    )


def _reference_ale_1d(predict, X: pd.DataFrame, feature: str, edges: np.ndarray):
    """Direct port of the reference estimator's semantics (ale.py:192-255):
    per-bin Python loop, lo/hi pinning, cumsum, weighted centering."""
    x = X[feature].to_numpy(dtype=float)
    n_bins = edges.size - 1
    idx = np.clip(np.searchsorted(edges, x, side="left"), 1, n_bins)
    local_delta = np.zeros(n_bins)
    counts = np.zeros(n_bins, dtype=int)
    for k in range(1, n_bins + 1):
        mask = idx == k
        counts[k - 1] = int(mask.sum())
        if not mask.any():
            continue
        X_lo = X.loc[mask].copy()
        X_hi = X_lo.copy()
        X_lo[feature] = edges[k - 1]
        X_hi[feature] = edges[k]
        local_delta[k - 1] = float(np.mean(predict(X_hi) - predict(X_lo)))
    ale_unc = np.concatenate([[0.0], np.cumsum(local_delta)])
    seg_mid = (ale_unc[:-1] + ale_unc[1:]) / 2.0
    wm = float(np.sum(seg_mid * counts) / counts.sum()) if counts.sum() else 0.0
    return ale_unc - wm, counts


def _poly(payload, X):
    return 3.0 * X[:, 0] + X[:, 1] * X[:, 1] + 0.2 * X[:, 0] * X[:, 1]


@pytest.fixture(scope="module")
def frame_ds(ray_session):
    import ray.data as rd

    df = _events_frame()
    return df, rd.from_pandas(df).repartition(6)


def test_exact_quantile_edges_match_numpy(frame_ds):
    df, ds = frame_ds
    for gs in (5, 10, 20):
        dist = exact_quantile_edges(ds, "x1", "rid", gs)
        mem = quantile_edges_array(df["x1"].to_numpy(), gs)
        assert np.allclose(dist, mem, rtol=0, atol=1e-12), gs


def test_ale_1d_matches_reference_loop(frame_ds):
    import ray

    df, ds = frame_ds
    edges = quantile_edges_array(df["x1"].to_numpy(), 10)
    out = ale_1d(ds, ray.put(None), _poly, ["x1", "x2"], "x1", edges=edges)

    def predict_df(Xdf):
        return _poly(None, Xdf[["x1", "x2"]].to_numpy(dtype=float))

    ref_ale, ref_counts = _reference_ale_1d(predict_df, df, "x1", edges)
    assert np.allclose(out["ale"].to_numpy(), ref_ale, atol=1e-9)
    assert (out["bin_count"].to_numpy()[1:] == ref_counts).all()


def test_ale_1d_linear_model_closed_form(frame_ds):
    """ALE of a model linear in the feature is a*(edge - c): slope
    recovered exactly regardless of binning."""
    import ray

    df, ds = frame_ds

    def lin(payload, X):
        return 5.0 * X[:, 0] - 2.0 * X[:, 1]

    edges = quantile_edges_array(df["x1"].to_numpy(), 8)
    out = ale_1d(ds, ray.put(None), lin, ["x1", "x2"], "x1", edges=edges)
    d = np.diff(out["ale"].to_numpy()) / np.diff(out["bin_edge"].to_numpy())
    assert np.allclose(d, 5.0, atol=1e-9)


def test_ale_2d_matches_reference_loop(frame_ds):
    import ray

    df, ds = frame_ds
    xe = quantile_edges_array(df["x1"].to_numpy(), 5)
    ye = quantile_edges_array(df["x2"].to_numpy(), 5)
    out = ale_2d(
        ds, ray.put(None), _poly, ["x1", "x2"], "x1", "x2",
        x_edges=xe, y_edges=ye,
    )
    # reference loop (ale.py:258-322)
    x, y = df["x1"].to_numpy(), df["x2"].to_numpy()
    nx, ny = xe.size - 1, ye.size - 1
    xi = np.clip(np.searchsorted(xe, x, side="left"), 1, nx)
    yi = np.clip(np.searchsorted(ye, y, side="left"), 1, ny)
    delta = np.zeros((ny, nx))
    for a in range(1, nx + 1):
        for b in range(1, ny + 1):
            m = (xi == a) & (yi == b)
            if not m.any():
                continue
            base = df.loc[m, ["x1", "x2"]].to_numpy(dtype=float)

            def at(ex, ey):
                Z = base.copy()
                Z[:, 0] = ex
                Z[:, 1] = ey
                return _poly(None, Z)

            delta[b - 1, a - 1] = float(
                np.mean(at(xe[a], ye[b]) - at(xe[a - 1], ye[b])
                        - at(xe[a], ye[b - 1]) + at(xe[a - 1], ye[b - 1]))
            )
    acc = np.pad(np.cumsum(np.cumsum(delta, 0), 1), ((1, 0), (1, 0)))
    ref = acc - acc.mean(1, keepdims=True) - acc.mean(0, keepdims=True) + acc.mean()
    got = out["ale2"].to_numpy().reshape(ye.size, xe.size)
    assert np.allclose(got, ref, atol=1e-9)


def test_ale_2d_additive_model_is_flat(frame_ds):
    """No interaction term -> second-order ALE is (numerically) zero."""
    import ray

    df, ds = frame_ds

    def additive(payload, X):
        return 3.0 * X[:, 0] + X[:, 1] * X[:, 1]

    out = ale_2d(
        ds, ray.put(None), additive, ["x1", "x2"], "x1", "x2",
        grid_size=5, id_col="rid",
    )
    assert np.abs(out["ale2"].to_numpy()).max() < 1e-9


def test_permutation_importance_noise_floor(frame_ds):
    """Informative drivers score above .RANDOM; .RANDOM ~ 0 for a model
    that never splits on it; deterministic across invocations."""
    import ray

    df, ds = frame_ds
    df2 = df.copy()
    rng = np.random.Generator(np.random.Philox(key=11))
    df2[RANDOM_COL] = rng.uniform(0, 1, len(df2))
    import ray.data as rd

    ds2 = rd.from_pandas(df2).repartition(6)

    def lin(payload, X):
        # model uses x1 and x2 but NOT the random column
        return 3.0 * X[:, 0] + X[:, 1] * X[:, 1]

    feats = ["x1", "x2", RANDOM_COL]
    a = permutation_importance(ds2, ray.put(None), lin, feats, "y", seed=1)
    b = permutation_importance(ds2, ray.put(None), lin, feats, "y", seed=1)
    pd.testing.assert_frame_equal(a, b)
    imp = a.set_index("feature")["importance"]
    assert imp[RANDOM_COL] == 0.0  # model ignores it entirely
    assert imp["x1"] > 100 * max(imp[RANDOM_COL], 1e-9)
    rel = a.set_index("feature")["relevant"]
    assert rel["x1"] == "yes" and rel["x2"] == "yes"


def test_ale_direction_classification():
    assert ale_direction(np.array([0.0, 1.0, 2.0, 3.0]), 0.1) == "+"
    assert ale_direction(np.array([3.0, 2.0, 1.0, 0.0]), 0.1) == "-"
    assert ale_direction(np.array([0.0, 2.0, 0.0]), 0.1) == "peak"
    assert ale_direction(np.array([0.0, -2.0, 0.0]), 0.1) == "trough"
    assert ale_direction(np.array([0.0, 0.01, 0.0]), 0.1) == "flat"
    assert ale_direction(np.array([0.0, 2.0, 0.0, 2.0]), 0.1) == "nonmonotonic"


def test_ale_delta_skips_nonfinite_rows(ray_session):
    """Rows with any non-finite feature are excluded from bins and
    counts (the reference trains on complete rows only)."""
    import ray
    import ray.data as rd

    df = pd.DataFrame(
        {"x1": [1.0, np.nan, 3.0, 50.0], "x2": [0.0, 1.0, np.inf, 2.0]}
    )
    ds = rd.from_pandas(df)
    out = ale_1d(
        ds, ray.put(None), _poly, ["x1", "x2"], "x1",
        edges=np.array([0.0, 10.0, 100.0]),
    )
    assert out["bin_count"].sum() == 2  # only rows 0 and 3 survive
