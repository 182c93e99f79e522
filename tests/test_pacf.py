"""Durbin-Levinson PACF kernel (stages/trend.py:pacf_durbin_levinson)."""

import numpy as np

from diive_ray.stages.trend import pacf_durbin_levinson


def _ar(coeffs, n, seed=0):
    rng = np.random.default_rng(seed)
    p = len(coeffs)
    x = np.zeros(n)
    e = rng.normal(size=n)
    for t in range(p, n):
        x[t] = sum(c * x[t - i - 1] for i, c in enumerate(coeffs)) + e[t]
    return x


def test_pacf_ar2_cutoff():
    x = _ar([0.5, 0.3], 20000)
    p = pacf_durbin_levinson(x, 6)
    # phi_22 estimates the last AR coefficient; lags > 2 vanish
    assert abs(p[1] - 0.3) < 0.05
    assert np.abs(p[2:]).max() < 0.05


def test_pacf_ar1_single_spike():
    x = _ar([0.7], 20000, seed=3)
    p = pacf_durbin_levinson(x, 5)
    assert abs(p[0] - 0.7) < 0.05
    assert np.abs(p[1:]).max() < 0.05


def test_pacf_lag1_equals_acf1():
    rng = np.random.default_rng(1)
    y = rng.normal(size=500)
    p = pacf_durbin_levinson(y, 3)
    d = y - y.mean()
    rho1 = (d[1:] * d[:-1]).sum() / (d * d).sum()
    assert abs(p[0] - rho1) < 1e-12
