"""Property pins for the KPSS / variance-ratio / Hill / spectral-entropy
/ Savitzky-Golay batch (kernels as implemented in
pipelines/queries.py — prefix/LAG arithmetic shared with the SQL
oracles)."""

import numpy as np


def _kpss_eta(x, maxlag=12):
    n = float(len(x))
    e = x - x.sum() / n
    s = np.cumsum(e)
    num = (s * s).sum() / (n * n)
    big_l = np.floor(4.0 * np.power(n / 100.0, 0.25))
    sig2 = (e * e).sum() / n
    for lag in range(1, maxlag + 1):
        w = max(0.0, 1.0 - lag / (big_l + 1.0))
        if len(e) > lag:
            sig2 += 2.0 * w * ((e[lag:] * e[:-lag]).sum() / n)
    return num / sig2


def test_kpss_classifies_noise_vs_walk():
    rng = np.random.Generator(np.random.Philox(key=[131, 2026]))
    noise = rng.normal(10, 2, 600)
    walk = np.cumsum(rng.normal(0, 1, 600))
    assert _kpss_eta(noise) < 0.463          # level-stationary
    assert _kpss_eta(walk) > 0.463           # unit root rejected


def test_kpss_bartlett_truncation_matches_greatest_form():
    # the GREATEST(0, 1 - l/(L+1)) trick over a fixed grid equals the
    # classic truncated sum for every n where L <= 12
    rng = np.random.Generator(np.random.Philox(key=[137, 2026]))
    x = rng.normal(0, 1, 400)
    n = float(len(x))
    e = x - x.mean()
    big_l = int(np.floor(4.0 * (n / 100.0) ** 0.25))
    assert big_l <= 12
    truncated = (e * e).sum() / n
    for lag in range(1, big_l + 1):
        w = 1.0 - lag / (big_l + 1.0)
        truncated += 2.0 * w * ((e[lag:] * e[:-lag]).sum() / n)
    fixed_grid = (e * e).sum() / n
    for lag in range(1, 13):
        w = max(0.0, 1.0 - lag / (big_l + 1.0))
        fixed_grid += 2.0 * w * ((e[lag:] * e[:-lag]).sum() / n)
    np.testing.assert_allclose(truncated, fixed_grid, rtol=0, atol=0)


def _vr(x, q=4):
    t = float(len(x) - 1)
    mu = (x[-1] - x[0]) / t
    d1 = np.diff(x) - mu
    dq = x[q:] - x[:-q] - q * mu
    s1 = (d1 * d1).sum() / (t - 1.0)
    m = q * (t - q + 1.0) * (1.0 - q / t)
    return (dq * dq).sum() / m / s1


def test_variance_ratio_detects_autocorrelation():
    rng = np.random.Generator(np.random.Philox(key=[139, 2026]))
    # random walk with iid increments: VR ~ 1
    walk = np.cumsum(rng.normal(0, 1, 3000))
    assert abs(_vr(walk) - 1.0) < 0.15
    # positively autocorrelated increments: VR > 1
    eps = rng.normal(0, 1, 3000)
    ar = np.empty_like(eps)
    acc = 0.0
    for i, v in enumerate(eps):
        acc = 0.6 * acc + v
        ar[i] = acc
    assert _vr(np.cumsum(ar)) > 1.6
    # mean-reverting level series: VR < 1
    level = rng.normal(10, 1, 3000)
    assert _vr(level) < 0.6


def test_hill_recovers_pareto_alpha():
    rng = np.random.Generator(np.random.Philox(key=[149, 2026]))
    alpha = 2.5
    u = rng.uniform(size=20000)
    v = (1.0 - u) ** (-1.0 / alpha)          # Pareto(alpha), xm=1
    k = 100
    vs = np.sort(v)[::-1]
    gamma = np.log(vs[:k] / vs[k]).sum() / k
    assert abs(1.0 / gamma - alpha) < 0.5


def test_spectral_entropy_sine_vs_noise():
    # concentrated spectrum -> low normalized entropy; flat -> high
    p_sine = np.array([0.001, 0.002, 0.99, 0.004, 0.003])
    p_flat = np.full(5, 0.2)
    def ent(p):
        p = p / p.sum()
        return -(p[p > 0] * np.log(p[p > 0])).sum() / np.log(len(p))
    assert ent(p_sine) < 0.25
    np.testing.assert_allclose(ent(p_flat), 1.0, rtol=1e-12)


def test_savgol_reproduces_quadratics_exactly():
    # a degree-2 LS filter is exact on degree-<=2 polynomials
    t = np.arange(50, dtype=float)
    x = 3.0 + 0.5 * t - 0.02 * t * t
    sm = (-2.0 * x[:-6] + 3.0 * x[1:-5] + 6.0 * x[2:-4] + 7.0 * x[3:-3]
          + 6.0 * x[4:-2] + 3.0 * x[5:-1] - 2.0 * x[6:]) / 21.0
    np.testing.assert_allclose(sm, x[3:-3], rtol=0, atol=1e-9)


def test_savgol_weights_are_projection_row():
    # the window-7 quadratic weights are the center row of the
    # polynomial LS projection matrix A(A'A)^{-1}A'
    j = np.arange(-3, 4, dtype=float)
    A = np.column_stack([np.ones(7), j, j * j])
    H = A @ np.linalg.inv(A.T @ A) @ A.T
    np.testing.assert_allclose(
        H[3], np.array([-2, 3, 6, 7, 6, 3, -2]) / 21.0, atol=1e-12)
