"""Empirical mode decomposition kernel (stages/decompose.py:emd)."""

import numpy as np

from diive_ray.stages.decompose import _natural_cubic_eval, emd


def test_spline_interpolates_knots_and_linear_case():
    xk = np.array([0.0, 2.0, 5.0, 9.0])
    yk = np.array([1.0, -1.0, 4.0, 0.0])
    out = _natural_cubic_eval(xk, yk, xk)
    assert np.allclose(out, yk, atol=1e-12)
    # a spline through collinear points IS the line
    xl = np.linspace(0, 9, 40)
    lin = _natural_cubic_eval(np.array([0.0, 9.0]),
                              np.array([2.0, 20.0]), xl)
    assert np.allclose(lin, 2.0 + 2.0 * xl, atol=1e-12)


def test_emd_exact_reconstruction_and_separation():
    t = np.arange(600.0)
    fast = np.sin(2 * np.pi * t / 20)
    slow = 3 * np.sin(2 * np.pi * t / 200)
    y = fast + slow + 0.002 * t
    imfs = emd(y)
    # defining identity: the IMFs + residual sum back exactly
    assert np.abs(sum(imfs) - y).max() < 1e-12
    # interior separation (edges suffer the usual envelope end effect)
    mid = slice(50, -50)
    c1 = np.corrcoef(imfs[0][mid], fast[mid])[0, 1]
    assert c1 > 0.99
    assert len(imfs) >= 3
    c2 = np.corrcoef(imfs[1][mid], slow[mid])[0, 1]
    assert c2 > 0.9


def test_emd_monotone_series_is_pure_residual():
    y = np.linspace(0, 10, 50)
    imfs = emd(y)
    assert len(imfs) == 1  # no extrema -> nothing to sift
    assert np.allclose(imfs[0], y)


def test_emd_imf_count_bounded():
    rng = np.random.default_rng(4)
    y = rng.normal(size=500)
    imfs = emd(y, max_imfs=4)
    assert len(imfs) <= 5
    assert np.abs(sum(imfs) - y).max() < 1e-10
