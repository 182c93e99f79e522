"""CUSUM closed form vs the literal Page recursion (the prefix-min
identity the exact oracle relies on), planted level-shift detection,
and winsorize clip-rule sanity."""

import numpy as np


def _closed_form(x, mu0, slack):
    d = x - mu0 - slack
    prefix = np.cumsum(d)
    run_min = np.minimum(np.minimum.accumulate(prefix), 0.0)
    return prefix - run_min


def _recursion(x, mu0, slack):
    s = np.zeros(len(x))
    acc = 0.0
    for i, v in enumerate(x):
        acc = max(0.0, acc + (v - mu0 - slack))
        s[i] = acc
    return s


def test_closed_form_equals_recursion():
    rng = np.random.Generator(np.random.Philox(key=[71, 2026]))
    for _ in range(20):
        x = rng.normal(10, 3, size=rng.integers(5, 400))
        a = _closed_form(x, 10.0, 0.5)
        b = _recursion(x, 10.0, 0.5)
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-9)
        assert (a >= 0).all()


def test_planted_level_shift_alarms():
    rng = np.random.Generator(np.random.Philox(key=[73, 2026]))
    x = np.concatenate([rng.normal(10, 1, 300), rng.normal(14, 1, 100)])
    s = _closed_form(x, 10.0, 0.5)
    assert (s[:280] > 25.0).sum() == 0       # quiet before the shift
    assert (s[320:] > 25.0).all()            # latched after it


def test_winsorize_clip_rules():
    rng = np.random.Generator(np.random.Philox(key=[79, 2026]))
    v = rng.normal(50, 10, 1000)
    lo, hi = np.quantile(v, 0.05), np.quantile(v, 0.95)
    w = np.clip(v, lo, hi)
    assert w.min() == lo and w.max() == hi
    assert (v < lo).sum() + (v > hi).sum() == (w != v).sum()
    # clipping pulls tails in: winsorized SD strictly smaller
    assert w.std() < v.std()
