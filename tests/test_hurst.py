"""Hurst R/S analysis (stages/trend.py:hurst_rs)."""

import numpy as np

from diive_ray.stages.trend import hurst_rs


def test_iid_noise_near_half():
    rng = np.random.default_rng(0)
    h, tab = hurst_rs(rng.normal(size=4096))
    assert 0.45 < h < 0.65
    assert len(tab) == 5


def test_persistent_ar1_above_half():
    rng = np.random.default_rng(1)
    n = 4096
    y = np.zeros(n)
    e = rng.normal(size=n)
    for i in range(1, n):
        y[i] = 0.9 * y[i - 1] + e[i]
    h, _ = hurst_rs(y)
    assert h > 0.65


def test_antipersistent_below_half():
    rng = np.random.default_rng(2)
    y = np.diff(rng.normal(size=4097))  # MA(1) with rho=-0.5
    h, _ = hurst_rs(y)
    assert h < 0.45


def test_short_series_nan():
    h, tab = hurst_rs(np.arange(5.0))
    assert np.isnan(h)
