"""Closed-form pins for the round-4 monitoring/stationarity batch:

* Page-Hinkley (Page 1954 §5 running-mean variant): the prefix
  arithmetic the exact oracle relies on equals the literal streaming
  recursion.
* EWMA control chart (Roberts 1959): the scaled-prefix closed form
  z_t = lam*(1-lam)^t * cumsum(x_i*(1-lam)^(-i)) + (1-lam)^t * z_0
  equals the textbook recursion z_t = lam*x_t + (1-lam)*z_{t-1}, and
  the Lucas-Saccucci time-varying limits converge to the asymptotic
  band.
* Dickey-Fuller (1979, constant, no lags): the raw-moment OLS shared
  with the SQL oracle equals numpy lstsq; a random walk is not flagged
  stationary while white noise is.
* stability / lumpiness (Hyndman, Wang & Laptev 2015 tsfeatures):
  tiled-variance features match a direct per-tile computation and a
  constant series scores zero on both.
"""

import numpy as np


# --------------------------------------------------------------- Page-Hinkley

def _ph_closed(x, delta):
    n = len(x)
    xbar = np.cumsum(x) / np.arange(1, n + 1)
    m = np.cumsum(x - xbar - delta)
    return m - np.minimum.accumulate(m)


def _ph_loop(x, delta):
    out = np.empty(len(x))
    s = 0.0
    m = 0.0
    mn = np.inf
    for i, v in enumerate(x):
        s += v
        xbar = s / (i + 1)
        m += v - xbar - delta
        mn = min(mn, m)
        out[i] = m - mn
    return out


def test_page_hinkley_closed_form_equals_stream():
    rng = np.random.Generator(np.random.Philox(key=[101, 2026]))
    for _ in range(15):
        x = rng.normal(5, 2, size=int(rng.integers(3, 500)))
        np.testing.assert_allclose(
            _ph_closed(x, 0.1), _ph_loop(x, 0.1), rtol=0, atol=1e-9)


def test_page_hinkley_planted_shift_alarms():
    rng = np.random.Generator(np.random.Philox(key=[103, 2026]))
    x = np.concatenate([rng.normal(10, 1, 400), rng.normal(13, 1, 150)])
    ph = _ph_closed(x, 0.1)
    quiet_max = ph[:380].max()
    # the shift drives PH an order of magnitude past anything the
    # quiet period produced, and it latches
    assert (ph[470:] > 3.0 * quiet_max).all()
    assert ph[-1] > 10.0 * quiet_max


# ----------------------------------------------------------------- EWMA chart

def _ewma_closed(x, lam, z0):
    rn = np.arange(1, len(x) + 1, dtype=float)
    s = np.cumsum(x * np.power(1.0 - lam, -rn))
    return lam * np.power(1.0 - lam, rn) * s + np.power(1.0 - lam, rn) * z0


def test_ewma_closed_form_equals_recursion():
    rng = np.random.Generator(np.random.Philox(key=[107, 2026]))
    lam = 0.2
    for _ in range(15):
        # 744 = the longest month in hours — the exponent bound the
        # query's monthly reset guarantees
        x = rng.normal(50, 10, size=int(rng.integers(2, 744)))
        z0 = float(x.mean())
        z = np.empty(len(x))
        acc = z0
        for i, v in enumerate(x):
            acc = lam * v + (1 - lam) * acc
            z[i] = acc
        np.testing.assert_allclose(
            _ewma_closed(x, lam, z0), z, rtol=1e-12, atol=1e-9)


def test_ewma_limits_converge_to_asymptote():
    lam, sigma = 0.2, 3.0
    rn = np.arange(1, 745, dtype=float)
    half = 3.0 * sigma * np.sqrt(lam / (2 - lam) * (1 - (1 - lam) ** (2 * rn)))
    asym = 3.0 * sigma * np.sqrt(lam / (2 - lam))
    assert half[0] < half[5] < half[-1] <= asym + 1e-12
    assert abs(half[-1] - asym) < 1e-9


# -------------------------------------------------------------- Dickey-Fuller

def _df_moments(m):
    xl, d = m[:-1], np.diff(m)
    n = float(len(xl))
    mx, my = xl.sum() / n, d.sum() / n
    sxx = (xl * xl).sum() - n * mx * mx
    sxy = (xl * d).sum() - n * mx * my
    syy = (d * d).sum() - n * my * my
    b = sxy / sxx
    ssr = syy - b * sxy
    t = b / np.sqrt(ssr / (n - 2.0) / sxx)
    return b, t


def test_dickey_fuller_matches_lstsq():
    rng = np.random.Generator(np.random.Philox(key=[109, 2026]))
    x = np.cumsum(rng.normal(0, 1, 300)) + 5.0
    b, t = _df_moments(x)
    X = np.column_stack([np.ones(len(x) - 1), x[:-1]])
    y = np.diff(x)
    coef, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ coef
    dof = len(y) - 2
    cov = resid @ resid / dof * np.linalg.inv(X.T @ X)
    np.testing.assert_allclose(b, coef[1], rtol=1e-10)
    np.testing.assert_allclose(t, coef[1] / np.sqrt(cov[1, 1]), rtol=1e-9)


def test_dickey_fuller_classifies_walk_vs_noise():
    rng = np.random.Generator(np.random.Philox(key=[113, 2026]))
    walk = np.cumsum(rng.normal(0, 1, 600))
    noise = rng.normal(10, 2, 600)
    _, t_walk = _df_moments(walk)
    _, t_noise = _df_moments(noise)
    assert t_walk > -2.86          # unit root: fail to reject
    assert t_noise < -2.86         # stationary: reject


# ------------------------------------------------------- stability/lumpiness

def test_stability_lumpiness_match_direct_tiles():
    rng = np.random.Generator(np.random.Philox(key=[127, 2026]))
    x = rng.normal(20, 5, 24 * 30)
    tiles = x.reshape(30, 24)
    dm = tiles.mean(axis=1)
    dv = tiles.var(axis=1)            # population variance, as the query
    stability = dm.var()
    lumpiness = dv.var()
    # raw-moment form shared with the SQL oracle
    nd = float(len(dm))
    s2 = (dm * dm).sum() / nd - (dm.sum() / nd) ** 2
    l2 = (dv * dv).sum() / nd - (dv.sum() / nd) ** 2
    np.testing.assert_allclose(stability, s2, rtol=1e-10)
    np.testing.assert_allclose(lumpiness, l2, rtol=1e-10)


def test_stability_lumpiness_zero_on_constant():
    x = np.full(24 * 10, 7.5)
    tiles = x.reshape(10, 24)
    assert tiles.mean(axis=1).var() == 0.0
    assert tiles.var(axis=1).var() == 0.0
