"""Pins for stages/tsdist.py (matrix profile + DTW) and the SAX /
forecast-accuracy query kernels."""

import numpy as np

from diive_ray.stages.tsdist import dtw_distance, matrix_profile


def _znorm(w):
    return (w - w.mean()) / w.std()


def _mp_brute(x, m, excl):
    n = len(x) - m + 1
    mp = np.full(n, np.inf)
    nn = np.full(n, -1, dtype=np.int64)
    for i in range(n):
        wi = _znorm(x[i:i + m])
        for j in range(n):
            if abs(i - j) <= excl:
                continue
            wj = _znorm(x[j:j + m])
            d = np.sqrt(((wi - wj) ** 2).sum())
            if d < mp[i] - 1e-12:
                mp[i], nn[i] = d, j
    return mp, nn


def test_matrix_profile_matches_brute_force():
    rng = np.random.Generator(np.random.Philox(key=[179, 2026]))
    x = rng.normal(0, 1, 80)
    mp, nn = matrix_profile(x, m=8)
    bmp, bnn = _mp_brute(x, 8, excl=4)
    np.testing.assert_allclose(mp, bmp, rtol=1e-8, atol=1e-8)
    # argmins agree wherever the minimum is unique at tolerance
    disagree = nn != bnn
    if disagree.any():
        i = np.flatnonzero(disagree)
        np.testing.assert_allclose(mp[i], bmp[i], rtol=1e-8)


def test_matrix_profile_tiled_equals_full_multi_tile():
    # VERDICT r4 #9: a length spanning MANY tiles (n=493 windows,
    # tile=64 -> 8x8 tile grid) must reproduce the full-QT version
    from diive_ray.stages.tsdist import matrix_profile_tiled

    rng = np.random.Generator(np.random.Philox(key=[191, 2026]))
    x = rng.normal(0, 1, 500)
    mp, nn = matrix_profile(x, m=8)
    tmp, tnn = matrix_profile_tiled(x, m=8, tile=64)
    np.testing.assert_allclose(tmp, mp, rtol=1e-9, atol=1e-9)
    np.testing.assert_array_equal(tnn, nn)


def test_matrix_profile_tiled_parallel_equals_sequential():
    from diive_ray.stages.tsdist import matrix_profile_tiled

    rng = np.random.Generator(np.random.Philox(key=[193, 2026]))
    x = rng.normal(0, 1, 400)
    smp, snn = matrix_profile_tiled(x, m=12, tile=50)
    pmp, pnn = matrix_profile_tiled(x, m=12, tile=50, parallel=True)
    np.testing.assert_allclose(pmp, smp, rtol=0, atol=0)
    np.testing.assert_array_equal(pnn, snn)


def test_matrix_profile_tiled_planted_motif_across_tiles():
    # the planted pair sits in DIFFERENT tiles (40 vs 200, tile=64)
    from diive_ray.stages.tsdist import matrix_profile_tiled

    rng = np.random.Generator(np.random.Philox(key=[197, 2026]))
    x = rng.normal(0, 1, 300)
    motif = np.sin(np.linspace(0, 4 * np.pi, 24))
    x[40:64] = motif + 0.01 * rng.normal(0, 1, 24)
    x[200:224] = motif + 0.01 * rng.normal(0, 1, 24)
    mp, nn = matrix_profile_tiled(x, m=24, tile=64)
    assert nn[40] == 200 and nn[200] == 40
    assert mp[40] < 0.25 * np.median(mp)


def test_matrix_profile_finds_planted_motif():
    rng = np.random.Generator(np.random.Philox(key=[181, 2026]))
    x = rng.normal(0, 1, 300)
    motif = np.sin(np.linspace(0, 4 * np.pi, 24))
    x[40:64] = motif + 0.01 * rng.normal(0, 1, 24)
    x[200:224] = motif + 0.01 * rng.normal(0, 1, 24)
    mp, nn = matrix_profile(x, m=24)
    # the two motif windows are each other's nearest neighbors with a
    # far smaller distance than the noise floor
    assert nn[40] == 200 and nn[200] == 40
    assert mp[40] < 0.25 * np.median(mp)


def _dtw_recursive(a, b):
    from functools import lru_cache

    @lru_cache(maxsize=None)
    def rec(i, j):
        if i == 0 and j == 0:
            return 0.0
        if i == 0 or j == 0:
            return np.inf
        c = (a[i - 1] - b[j - 1]) ** 2
        return c + min(rec(i - 1, j - 1), rec(i - 1, j), rec(i, j - 1))

    return np.sqrt(rec(len(a), len(b)))


def test_dtw_matches_literal_recursion():
    rng = np.random.Generator(np.random.Philox(key=[191, 2026]))
    a = rng.normal(0, 1, 12)
    b = rng.normal(0, 1, 15)
    np.testing.assert_allclose(
        dtw_distance(a, b), _dtw_recursive(tuple(a), tuple(b)), rtol=1e-12)


def test_dtw_identity_symmetry_and_shift_tolerance():
    rng = np.random.Generator(np.random.Philox(key=[193, 2026]))
    a = rng.normal(0, 1, 30)
    assert dtw_distance(a, a) == 0.0
    b = rng.normal(0, 1, 30)
    np.testing.assert_allclose(dtw_distance(a, b), dtw_distance(b, a), rtol=1e-12)
    # a small time shift costs DTW far less than Euclidean
    t = np.linspace(0, 6 * np.pi, 60)
    s1, s2 = np.sin(t), np.sin(t + 0.3)
    eu = np.sqrt(((s1 - s2) ** 2).sum())
    assert dtw_distance(s1, s2, band=6) < 0.35 * eu


def test_dtw_band_none_equals_wide_band():
    rng = np.random.Generator(np.random.Philox(key=[197, 2026]))
    a = rng.normal(0, 1, 20)
    b = rng.normal(0, 1, 20)
    np.testing.assert_allclose(
        dtw_distance(a, b), dtw_distance(a, b, band=20), rtol=1e-12)


def test_sax_breakpoints_partition_gaussian_quartiles():
    # the alphabet-4 breakpoints split N(0,1) into ~equal quarters
    rng = np.random.Generator(np.random.Philox(key=[199, 2026]))
    z = rng.normal(0, 1, 200000)
    shares = np.array([
        (z < -0.6745).mean(),
        ((z >= -0.6745) & (z < 0)).mean(),
        ((z >= 0) & (z < 0.6745)).mean(),
        (z >= 0.6745).mean(),
    ])
    np.testing.assert_allclose(shares, 0.25, atol=0.01)


def test_mase_is_one_for_seasonal_naive_on_equal_errors():
    # if test errors equal train errors in magnitude, MASE == 1
    e = np.array([1.0, -1.0, 1.0, -1.0])
    mae = np.abs(e).mean()
    scale = np.abs(e).mean()
    assert mae / scale == 1.0
