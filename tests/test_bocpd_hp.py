"""BOCPD (Adams & MacKay 2007) and Hodrick-Prescott filter kernels
(stages/streamdetect.py, stages/trend.py) — pure numpy."""

import numpy as np

from diive_ray.stages.streamdetect import bocpd_normal
from diive_ray.stages.trend import hp_filter


def test_bocpd_detects_planted_shift_exactly():
    rng = np.random.default_rng(3)
    x = np.concatenate([rng.normal(0, 1, 150), rng.normal(6, 1, 150)])
    r = bocpd_normal(x)
    assert list(r["cp_positions"]) == [150]
    assert r["map_runlength_final"] == 150  # the post-shift run


def test_bocpd_two_shifts():
    rng = np.random.default_rng(11)
    z = np.concatenate([rng.normal(0, 1, 100), rng.normal(5, 1, 100),
                        rng.normal(-4, 1, 100)])
    r = bocpd_normal(z)
    assert list(r["cp_positions"]) == [100, 200]


def test_bocpd_stationary_control_is_quiet():
    # hazard 1/250 EXPECTS ~1 cp per 250 steps even under H0; require
    # the control to stay near that rate, far below the planted case
    rng = np.random.default_rng(2)
    y = rng.normal(2.0, 1.0, 300)
    r = bocpd_normal(y)
    assert len(r["cp_positions"]) <= 2
    assert r["map_runlength_final"] >= 200


def test_hp_filter_invariants():
    # linear series passes through untouched (second differences = 0)
    y = 3.0 + 0.5 * np.arange(100)
    trend, cycle = hp_filter(y)
    assert np.abs(cycle).max() < 1e-9
    # noisy seasonal: trend is smooth (tiny second differences vs the
    # raw series) and cycle carries the seasonality, summing to ~0
    rng = np.random.default_rng(5)
    t = np.arange(400, dtype=float)
    z = 0.05 * t + 4 * np.sin(2 * np.pi * t / 24) + rng.normal(0, 0.5, 400)
    tr, cy = hp_filter(z, lam=1600.0)
    dd_raw = np.abs(np.diff(z, 2)).mean()
    dd_tr = np.abs(np.diff(tr, 2)).mean()
    assert dd_tr < dd_raw / 10
    assert abs(cy.mean()) < 0.1
    # normal equations hold: (I + lam D'D) trend == y
    n = len(z)
    d = np.zeros((n - 2, n))
    idx = np.arange(n - 2)
    d[idx, idx], d[idx, idx + 1], d[idx, idx + 2] = 1.0, -2.0, 1.0
    lhs = tr + 1600.0 * (d.T @ (d @ tr))
    assert np.allclose(lhs, z, atol=1e-7)


def test_hp_filter_short_series():
    y = np.array([1.0, 2.0])
    tr, cy = hp_filter(y)
    assert np.allclose(tr, y) and np.allclose(cy, 0.0)
