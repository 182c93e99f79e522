"""Gap-fill scoring + SHAP-style feature reduction (VERDICT r2 #3).

Reference parity targets: diive/gapfilling/scores.py:41-49
(prediction_scores metric set) and core/ml/common.py:779
(reduce_features random-benchmark rule).
"""

import numpy as np
import pandas as pd
import ray.data as rd

from diive_ray.stages import mlfill
from diive_ray.stages.scores import prediction_scores_np, scores_per_key


def test_prediction_scores_metric_set():
    t = np.array([1.0, 2.0, 3.0, 4.0])
    p = np.array([1.5, 2.0, 2.0, 5.0])
    s = prediction_scores_np(p, t)
    err = t - p
    assert s["n_scored"] == 4
    assert s["mae"] == np.abs(err).mean()
    assert s["medae"] == np.median(np.abs(err))
    assert s["mse"] == np.mean(err**2)
    assert s["rmse"] == np.sqrt(np.mean(err**2))
    assert s["maxe"] == 1.0
    sstot = np.sum((t - t.mean()) ** 2)
    assert s["r2"] == 1.0 - np.sum(err**2) / sstot
    assert s["mape"] == np.mean(np.abs(err) / np.abs(t))


def test_prediction_scores_edge_cases():
    s = prediction_scores_np(np.zeros(0), np.zeros(0))
    assert s["n_scored"] == 0 and np.isnan(s["mae"])
    # constant targets -> sstot = 0 -> r2 undefined (NaN)
    s = prediction_scores_np(np.array([1.0, 2.0]), np.array([3.0, 3.0]))
    assert np.isnan(s["r2"])


def test_scores_per_key_exact_per_group(ray_session):
    rng = np.random.default_rng(0)
    df = pd.DataFrame({
        "k": np.repeat(["a", "b"], 50),
        "pred": rng.normal(size=100),
        "truth": rng.normal(size=100),
    })
    out = scores_per_key(rd.from_pandas(df), ["k"], pred_col="pred", target_col="truth")
    assert list(out["k"]) == ["a", "b"]
    for _, r in out.iterrows():
        g = df[df["k"] == r["k"]]
        exp = prediction_scores_np(g["pred"].to_numpy(), g["truth"].to_numpy())
        for c in ["mae", "medae", "rmse", "maxe", "r2"]:
            assert r[c] == exp[c], (r["k"], c)


def test_reduce_features_rejects_junk_keeps_signal():
    rng = np.random.default_rng(7)
    n = 600
    x_sig = rng.random(n) * 10
    x_const = np.zeros(n)  # importance exactly 0 -> rejected by the >0 rule
    x_noise = rng.random(n)  # statistically = the random benchmark
    y = np.sin(x_sig) * 3 + rng.normal(scale=0.05, size=n)
    X = np.column_stack([x_sig, x_const, x_noise])
    mask, imps = mlfill.reduce_features_local(
        X, y, seed=11, k_factor=0.5, n_trees=15, max_depth=6
    )
    assert mask[0], (mask, imps)  # signal kept
    assert not mask[1], (mask, imps)  # constant junk rejected
    assert imps[0] > 100 * max(imps[1], imps[2])  # signal dominates


def test_tree_fill_reduced_features_still_fills(ray_session):
    # strong diurnal signal + a junk physics feature: reduction must not
    # break the fill (observed rows untouched; gaps predicted)
    ts = pd.date_range("2024-01-01", periods=400, freq="1h").astype("datetime64[us]")
    us = ts.astype("int64") * 1000 if ts.dtype == "datetime64[ms]" else ts.astype("int64")
    rng = np.random.default_rng(3)
    sod = (np.asarray(us) // 1_000_000) % 86_400
    y = 5 + 3 * np.sin(2 * np.pi * sod / 86_400) + rng.normal(scale=0.1, size=400)
    y_gappy = y.copy()
    gaps = rng.choice(400, size=60, replace=False)
    y_gappy[gaps] = np.nan
    df = pd.DataFrame({"source": "s1", "bucket_ts": ts, "mean": y_gappy})
    out = mlfill.tree_fill(
        rd.from_pandas(df), value_col="mean", keys=("source",),
        model="forest", n_trees=10, max_depth=6, seed=42,
        reduce_features=True,
    ).to_pandas().sort_values("bucket_ts").reset_index(drop=True)
    filled = out["mean_treefilled"].to_numpy()
    obs_mask = ~np.isnan(y_gappy)
    assert np.array_equal(filled[obs_mask], y_gappy[obs_mask])  # contract
    pred_err = np.abs(filled[~obs_mask] - y[~obs_mask])
    assert np.isfinite(filled[~obs_mask]).all()
    assert pred_err.mean() < 0.8, pred_err.mean()


def test_tree_fill_scores_traintest(ray_session):
    ts = pd.date_range("2024-01-01", periods=800, freq="1h").astype("datetime64[us]")
    sod = (ts.astype("int64") // 1_000_000) % 86_400
    rng = np.random.default_rng(5)
    y = 10 + 4 * np.sin(2 * np.pi * np.asarray(sod) / 86_400) + rng.normal(scale=0.2, size=800)
    df = pd.DataFrame({"source": "s1", "bucket_ts": ts, "mean": y})
    scores = mlfill.tree_fill_scores(
        rd.from_pandas(df), value_col="mean", keys=("source",),
        model="forest", n_trees=10, max_depth=6, seed=42,
    )
    assert len(scores) == 1
    r = scores.iloc[0]
    assert r["n_scored"] > 100  # ~25% held out
    assert r["r2"] > 0.8, r["r2"]  # strong signal must be learnable
    assert r["rmse"] < 1.5
