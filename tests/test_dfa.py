"""Detrended fluctuation analysis kernel (stages/trend.py:dfa_alpha)."""

import numpy as np

from diive_ray.stages.trend import dfa_alpha


def test_dfa_white_noise_half():
    rng = np.random.default_rng(0)
    r = dfa_alpha(rng.normal(size=4000))
    assert 0.4 < r["alpha"] < 0.65


def test_dfa_brownian_three_halves():
    rng = np.random.default_rng(0)
    r = dfa_alpha(np.cumsum(rng.normal(size=4000)))
    assert 1.3 < r["alpha"] < 1.7


def test_dfa_ordering_white_below_brownian():
    rng = np.random.default_rng(7)
    w = rng.normal(size=2000)
    assert dfa_alpha(w)["alpha"] < dfa_alpha(np.cumsum(w))["alpha"]


def test_dfa_short_series_scale_clamp():
    y = np.sin(np.arange(64) / 3.0)
    r = dfa_alpha(y)
    # scales capped at n//4 = 16 -> 4, 8, 16 usable
    assert r["scales"] == [4, 8, 16]
    assert np.isfinite(r["alpha"])
