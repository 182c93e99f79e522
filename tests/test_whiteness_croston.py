"""Croston intermittent-demand, runs test, Ljung-Box kernels
(stages/streamdetect.py, stages/trend.py) — pure numpy."""

import numpy as np

from diive_ray.stages.streamdetect import croston_forecast
from diive_ray.stages.trend import ljung_box_q, runs_test


def test_croston_hand_worked():
    # nonzero sizes [3, 2, 1] at positions 2, 6, 8 (0-based) ->
    # intervals [3, 4, 2]; alpha 0.1 closed-form SES
    d = np.array([0, 0, 3, 0, 0, 0, 2, 0, 1, 0.0])
    z_hat, x_hat, fc, q = croston_forecast(d, alpha=0.1)
    assert q == 3
    assert abs(z_hat - (0.81 * 3 + 0.09 * 2 + 0.1 * 1)) < 1e-12
    assert abs(x_hat - (0.81 * 3 + 0.09 * 4 + 0.1 * 2)) < 1e-12
    assert abs(fc - z_hat / x_hat) < 1e-15


def test_croston_constant_demand_every_period():
    # demand every period with constant size: z_hat = size, x_hat = 1
    d = np.full(50, 4.0)
    z_hat, x_hat, fc, q = croston_forecast(d)
    assert q == 50
    assert abs(z_hat - 4.0) < 1e-12
    assert abs(x_hat - 1.0) < 1e-12
    assert abs(fc - 4.0) < 1e-12
    # all-zero series
    z, x, f, q0 = croston_forecast(np.zeros(10))
    assert q0 == 0 and f == 0.0 and np.isnan(z)


def test_runs_test_alternating_and_blocked():
    # perfectly alternating around the mean -> far MORE runs than
    # expected (z >> 0); two solid blocks -> exactly 2 runs (z << 0)
    alt = np.tile([1.0, -1.0], 50)
    r = runs_test(alt)
    assert r["runs"] == 100 and r["z"] > 5
    blocks = np.concatenate([np.full(50, 5.0), np.full(50, -5.0)])
    r2 = runs_test(blocks)
    assert r2["runs"] == 2 and r2["z"] < -5
    assert r2["n1"] == 50 and r2["n2"] == 50
    assert abs(r2["expected"] - 51.0) < 1e-12


def test_ljung_box_white_vs_correlated():
    rng = np.random.default_rng(42)
    w = rng.normal(size=800)
    qw, df = ljung_box_q(w, m=10)
    assert df == 10
    assert qw < 25  # chi2(10) 99.5th pct ~= 25.2
    # AR(1) with phi .8: rho_k ~ .8^k -> enormous Q
    ar = np.empty(800)
    ar[0] = 0.0
    e = rng.normal(size=800)
    for t in range(1, 800):
        ar[t] = 0.8 * ar[t - 1] + e[t]
    qa, _ = ljung_box_q(ar, m=10)
    assert qa > 500
