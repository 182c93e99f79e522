"""Theta(0,2) forecast and hysteresis crossing kernels
(stages/streamdetect.py) — pure numpy, no Ray."""

import numpy as np

from diive_ray.stages.streamdetect import (
    hysteresis_crossings,
    theta_forecast_frame,
)


def test_theta_linear_series_components():
    # y = pos - 1 over positions 1..50: OLS line is exact, theta-2
    # line equals y, SES(alpha) of a ramp lags (1-a)/a behind
    y = np.arange(50.0)
    r = theta_forecast_frame(y, horizon=3, alpha=0.2)
    assert abs(r["a"] - (-1.0)) < 1e-9
    assert abs(r["b"] - 1.0) < 1e-9
    assert abs(r["l_n"] - 45.0) < 1e-3  # 49 - (1-a)/a = 45, + geometric tail
    # combination: 0.5*(a + b*(n+h)) + 0.5*l_n
    assert abs(r["yhat"][0] - (0.5 * 50.0 + 0.5 * r["l_n"])) < 1e-12


def test_theta_flat_series_is_flat():
    y = np.full(40, 7.25)
    r = theta_forecast_frame(y, horizon=5, alpha=0.2)
    assert abs(r["b"]) < 1e-12
    assert np.allclose(r["yhat"], 7.25, atol=1e-9)


def test_hysteresis_no_refire_inside_band():
    # oscillation that stays above low after the first high marker
    # must count ONE up crossing only after a genuine low excursion
    v = np.array([-5.0, 5.0, 4.9, 5.0, 4.8, 5.0, -5.0, 5.0])
    n_up, n_down, n_ext = hysteresis_crossings(v, low=-4.0, high=4.5)
    assert n_up == 2          # -5 -> 5 ... and -5 -> 5 at the end
    assert n_down == 1        # 5 -> -5 once
    assert n_ext == 8 - 0     # every sample is a marker here
    # middle wobbles 4.9/4.8 are still >= high -> markers but same sign,
    # no extra crossings
    v2 = np.array([0.0, 5.0, 0.0, 5.0, 0.0])
    assert hysteresis_crossings(v2, low=-4.0, high=4.5)[:2] == (0, 0)


def test_hysteresis_short_and_empty():
    assert hysteresis_crossings(np.array([]), -1, 1) == (0, 0, 0)
    assert hysteresis_crossings(np.array([5.0]), -1, 1) == (0, 0, 1)
    assert hysteresis_crossings(np.array([0.0, 0.1]), -1, 1) == (0, 0, 0)
