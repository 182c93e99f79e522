"""Kalman local-level filter/smoother (stages/kalman.py)."""

import numpy as np
import pandas as pd
import ray.data as rd

from diive_ray.stages.kalman import (
    kalman_local_level, kalman_smooth, local_level_params,
)


def test_steady_state_gain_closed_form():
    """With fixed q = var_eta/var_eps the filter gain converges to
    K* = (-q + sqrt(q^2 + 4q)) / 2 (Durbin & Koopman 2.x)."""
    rng = np.random.default_rng(0)
    q = 0.5
    y = rng.normal(size=4000)
    out = kalman_local_level(y, var_eps=1.0, var_eta=q)
    # implied steady-state gain from the tail variances:
    # K = P_pred / (P_pred + var_eps), P_pred = P_filt + var_eta
    pf = out["var_filt"].iloc[-1]
    k = (pf + q) / (pf + q + 1.0)
    kstar = (-q + np.sqrt(q * q + 4 * q)) / 2
    assert abs(k - kstar) < 1e-9


def test_moment_params_recover_planted():
    rng = np.random.default_rng(1)
    n = 200_000
    mu = np.cumsum(rng.normal(0, np.sqrt(0.25), n))
    y = mu + rng.normal(0, 1.0, n)
    ve, vn = local_level_params(y)
    assert abs(ve - 1.0) < 0.05
    assert abs(vn - 0.25) < 0.05


def test_smoother_tracks_level_shifts_and_beats_filter():
    rng = np.random.default_rng(2)
    mu = np.concatenate([np.zeros(300), np.full(300, 5.0)])
    y = mu + rng.normal(0, 1.0, 600)
    out = kalman_local_level(y)
    rmse_f = np.sqrt(np.mean((out["level_filt"] - mu) ** 2))
    rmse_s = np.sqrt(np.mean((out["level_smooth"] - mu) ** 2))
    assert rmse_s < rmse_f < 1.0
    assert abs(out["level_smooth"].iloc[450] - 5.0) < 0.5


def test_nan_gaps_bridged():
    rng = np.random.default_rng(3)
    y = np.sin(np.arange(400) / 40) * 3 + rng.normal(0, 0.2, 400)
    y[100:140] = np.nan
    out = kalman_local_level(y)
    assert np.isfinite(out["level_smooth"]).all()
    # smoothed bridge stays between the gap's endpoints' levels
    assert out["var_smooth"].iloc[120] > out["var_smooth"].iloc[50]


def test_distributed_matches_frame(ray_session):
    rng = np.random.default_rng(4)
    frames = []
    for k in ("a", "b"):
        frames.append(pd.DataFrame({
            "k": k, "pos": np.arange(300),
            "v": rng.normal(size=300).cumsum() + rng.normal(0, 0.5, 300)}))
    df = pd.concat(frames, ignore_index=True)
    got = kalman_smooth(
        rd.from_pandas(df).repartition(7), keys=["k"], order_by=["pos"],
        value_col="v").to_pandas()
    for k in ("a", "b"):
        sub = df[df.k == k].sort_values("pos").reset_index(drop=True)
        exp = kalman_local_level(sub["v"].to_numpy())
        g = got[got.k == k].sort_values("pos").reset_index(drop=True)
        np.testing.assert_allclose(
            g["level_smooth"].to_numpy(), exp["level_smooth"].to_numpy())
