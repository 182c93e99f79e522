"""Pins for the L-moments/GEV + int8-quantize + Morton + token
transition entropy batch."""

import math

import numpy as np


def _lmoms(x):
    x = np.sort(np.asarray(x, dtype=np.float64))
    n = float(len(x))
    j = np.arange(1, len(x) + 1, dtype=np.float64)
    b0 = x.sum() / n
    b1 = ((j - 1.0) / (n - 1.0) * x).sum() / n
    b2 = ((j - 1.0) * (j - 2.0) / ((n - 1.0) * (n - 2.0)) * x).sum() / n
    b3 = ((j - 1.0) * (j - 2.0) * (j - 3.0)
          / ((n - 1.0) * (n - 2.0) * (n - 3.0)) * x).sum() / n
    l1, l2 = b0, 2 * b1 - b0
    l3 = 6 * b2 - 6 * b1 + b0
    l4 = 20 * b3 - 30 * b2 + 12 * b1 - b0
    return l1, l2, l3, l4


def test_l2_equals_u_statistic():
    # lambda2 = (1/2) * E|X_i - X_j| over all pairs — the PWM form must
    # equal the direct U-statistic on any sample
    rng = np.random.Generator(np.random.Philox(key=[151, 2026]))
    x = rng.normal(3, 2, 60)
    _, l2, _, _ = _lmoms(x)
    n = len(x)
    tot = sum(abs(x[i] - x[j]) for i in range(n) for j in range(i + 1, n))
    direct = 0.5 * tot / (n * (n - 1) / 2)
    np.testing.assert_allclose(l2, direct, rtol=1e-10)


def test_lmoments_symmetry_gives_zero_t3():
    rng = np.random.Generator(np.random.Philox(key=[157, 2026]))
    z = rng.normal(0, 1, 4001)
    x = np.concatenate([z, -z])           # exactly symmetric sample
    _, l2, l3, _ = _lmoms(x)
    assert abs(l3 / l2) < 1e-12


def _gev_from_lmoms(l1, l2, t3):
    c = 2.0 / (3.0 + t3) - math.log(2.0) / math.log(3.0)
    k = 7.8590 * c + 2.9554 * c * c
    gam = math.gamma(1.0 + k)
    sigma = l2 * k / ((1.0 - 2.0 ** (-k)) * gam)
    mu = l1 - sigma * (1.0 - gam) / k
    return k, sigma, mu


def test_gev_lmoment_fit_recovers_planted_params():
    # sample GEV(mu=10, sigma=2, k=0.2) by inverse CDF, fit via the
    # Hosking-Wallis-Wood estimators
    rng = np.random.Generator(np.random.Philox(key=[163, 2026]))
    mu0, s0, k0 = 10.0, 2.0, 0.2
    u = rng.uniform(1e-9, 1 - 1e-9, 50000)
    x = mu0 + s0 * (1.0 - (-np.log(u)) ** k0) / k0
    l1, l2, l3, _ = _lmoms(x)
    k, sigma, mu = _gev_from_lmoms(l1, l2, l3 / l2)
    assert abs(k - k0) < 0.03
    assert abs(sigma - s0) < 0.1
    assert abs(mu - mu0) < 0.1


def _spread(v):
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x33333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x55555555)
    return v


def test_morton_magic_spread_matches_per_bit_loop():
    rng = np.random.Generator(np.random.Philox(key=[167, 2026]))
    gx = rng.integers(0, 65536, 500).astype(np.uint64)
    gy = rng.integers(0, 65536, 500).astype(np.uint64)
    morton = _spread(gx) | (_spread(gy) << np.uint64(1))
    for t in range(0, 500, 97):
        direct = 0
        for b in range(16):
            direct |= ((int(gx[t]) >> b) & 1) << (2 * b)
            direct |= ((int(gy[t]) >> b) & 1) << (2 * b + 1)
        assert int(morton[t]) == direct


def test_morton_locality_neighbors_share_bucket_prefix():
    # two points in the same 256x256 grid cell share morton >> 24
    gx = np.array([1000, 1255], dtype=np.uint64)   # same high byte (3)
    gy = np.array([2000, 2255], dtype=np.uint64)
    m = _spread(gx) | (_spread(gy) << np.uint64(1))
    assert (m[0] >> np.uint64(24)) == (m[1] >> np.uint64(24))


def test_int8_quantize_error_bounded_by_half_step():
    rng = np.random.Generator(np.random.Philox(key=[173, 2026]))
    x = rng.normal(0, 1, (1000, 8))
    mn, mx = x.min(axis=0), x.max(axis=0)
    rngs = mx - mn
    q = np.clip(np.floor((x - mn) / rngs * 255.0 + 0.5), 0, 255)
    xr = mn + q * rngs / 255.0
    half_step = rngs / 255.0 / 2.0
    assert (np.abs(x - xr) <= half_step + 1e-12).all()


def test_transition_entropy_hand_worked():
    # doc tokens [a, b, a, b, a]: pairs ab, ba, ab, ba -> counts {ab:2, ba:2}
    # H_pair = ln4 - (2ln2 + 2ln2)/4 = ln4 - ln2 = ln2
    # cur tokens [a, b, a, b]: counts {a:2, b:2} -> H_cur = ln2
    # conditional = 0 (fully deterministic transitions)
    counts_pair = np.array([2.0, 2.0])
    counts_cur = np.array([2.0, 2.0])
    n = counts_pair.sum()
    h_pair = np.log(n) - (counts_pair * np.log(counts_pair)).sum() / n
    h_cur = np.log(n) - (counts_cur * np.log(counts_cur)).sum() / n
    np.testing.assert_allclose(h_pair, np.log(2.0), rtol=1e-12)
    np.testing.assert_allclose(h_pair - h_cur, 0.0, atol=1e-12)
