"""Additive Holt-Winters (stages/decompose.py:holt_winters_frame)."""

import numpy as np
import pytest

from diive_ray.stages.decompose import holt_winters_frame


def _pattern(n_per=24, n_cycles=20, trend=0.05, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n_per * n_cycles)
    seas = 5 * np.sin(2 * np.pi * t / n_per)
    return 10 + trend * t + seas + (rng.normal(0, noise, len(t)) if noise else 0)


def test_clean_pattern_near_perfect_fit_and_forecast():
    y = _pattern()
    r = holt_winters_frame(y, period=24, horizon=48)
    # after burn-in the one-step fit tracks closely
    resid = (y - r["fitted"])[200:]
    assert np.nanmean(np.abs(resid)) < 0.3
    # forecast continues trend + cycle
    t = np.arange(len(y), len(y) + 48)
    expected = 10 + 0.05 * t + 5 * np.sin(2 * np.pi * t / 24)
    assert np.abs(r["forecast"] - expected).max() < 1.0
    assert abs(r["trend"] - 0.05) < 0.01


def test_recursion_hand_worked():
    """Tiny p=2 series, hand-replayable recursions."""
    y = np.array([1.0, 3.0, 2.0, 4.0])
    a, b, g = 0.5, 0.5, 0.5
    r = holt_winters_frame(y, period=2, alpha=a, beta=b, gamma=g)
    # init: level=2, trend=(3-2)/2=0.5, seas=[-1, 1]
    lvl, tr, seas = 2.0, 0.5, [-1.0, 1.0]
    fitted = []
    for t in range(2, 4):
        sprev = seas[t - 2]
        fitted.append(lvl + tr + sprev)
        nl = a * (y[t] - sprev) + (1 - a) * (lvl + tr)
        tr = b * (nl - lvl) + (1 - b) * tr
        lvl = nl
        seas.append(g * (y[t] - lvl) + (1 - g) * sprev)
    np.testing.assert_allclose(r["fitted"][2:], fitted)
    assert r["level"] == lvl and r["trend"] == tr
    np.testing.assert_allclose(r["seasonal_tail"], seas[-2:])


def test_too_short_raises():
    with pytest.raises(ValueError):
        holt_winters_frame(np.arange(10.0), period=8)


def test_noise_robustness():
    y = _pattern(noise=0.5, seed=3)
    r = holt_winters_frame(y, period=24, horizon=24)
    t = np.arange(len(y), len(y) + 24)
    expected = 10 + 0.05 * t + 5 * np.sin(2 * np.pi * t / 24)
    assert np.abs(r["forecast"] - expected).mean() < 1.0
