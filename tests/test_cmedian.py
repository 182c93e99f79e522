"""Bit-exactness pins for functions/cmedian.py — the compiled
counting-histogram rolling median must be a drop-in for
``pd.Series(x).rolling(w, center=True, min_periods=m).median()`` on
every input it accepts, and must FALL BACK (not err) on everything
else."""

import numpy as np
import pandas as pd

from diive_ray.functions.cmedian import (MAX_RANGE,
                                         rolling_median_centered_exact)


def _ref(x, w, mp):
    return pd.Series(x).rolling(w, center=True,
                                min_periods=mp).median().to_numpy()


def test_exact_across_windows_and_min_periods():
    rng = np.random.Generator(np.random.Philox(key=[233, 2026]))
    for n in (1, 2, 7, 50, 999, 20000):
        x = rng.integers(-300, 500, n).astype(float)
        for w in (2, 3, 5, 6, 48, 624):
            for mp in (1, 3):
                if mp > w:      # pandas itself rejects this combo
                    continue
                got = rolling_median_centered_exact(x, w, mp)
                np.testing.assert_array_equal(got, _ref(x, w, mp))


def test_exact_on_half_integral_values():
    rng = np.random.Generator(np.random.Philox(key=[239, 2026]))
    x = rng.integers(0, 1000, 5000) / 2.0
    got = rolling_median_centered_exact(x, 624, 1)
    np.testing.assert_array_equal(got, _ref(x, 624, 1))


def test_exact_on_constant_and_alternating():
    x = np.full(1000, 7.0)
    np.testing.assert_array_equal(
        rolling_median_centered_exact(x, 10, 1), _ref(x, 10, 1))
    x = np.tile([0.0, 900.0], 2000)
    np.testing.assert_array_equal(
        rolling_median_centered_exact(x, 624, 1), _ref(x, 624, 1))


def test_fallback_on_non_integral_nan_and_wide_range():
    rng = np.random.Generator(np.random.Philox(key=[241, 2026]))
    # non-half-integral floats -> pandas path, still exact
    x = rng.normal(0, 1, 500)
    np.testing.assert_array_equal(
        rolling_median_centered_exact(x, 48, 3), _ref(x, 48, 3))
    # NaNs -> pandas path (windows skip NaN)
    x = rng.integers(0, 50, 500).astype(float)
    x[::7] = np.nan
    np.testing.assert_array_equal(
        rolling_median_centered_exact(x, 48, 1), _ref(x, 48, 1))
    # range beyond the histogram cap -> pandas path
    x = rng.integers(0, MAX_RANGE * 2, 500).astype(float)
    np.testing.assert_array_equal(
        rolling_median_centered_exact(x, 48, 1), _ref(x, 48, 1))


def test_hampel_flag_unchanged_on_integer_series():
    # the consumer-level pin: hampel over an integer series (the
    # flagship's n_tok shape) produces IDENTICAL flags through the
    # compiled path as through pandas (force-compared by perturbing
    # the input into the fallback path with a tiny irrational offset
    # that cannot change any median comparison outcome is NOT sound —
    # instead replicate the pandas computation verbatim here)
    from diive_ray.stages.outliers import hampel_flag

    rng = np.random.Generator(np.random.Philox(key=[251, 2026]))
    x = rng.integers(50, 450, 6000).astype(float)
    x[100] = 5000.0
    x[4000] = -900.0
    s = pd.Series(x)
    got = hampel_flag(s, window_length=624, n_sigma=5.5)

    def pandas_hampel(s):
        filtered = s.copy()
        flag = pd.Series(0, index=s.index, dtype=np.int8)
        for _ in range(100):
            st = filtered.dropna()
            d = st.diff() - st.diff().shift(-1)
            d = d.fillna(0)
            rm = d.rolling(624, center=True, min_periods=1).median()
            dev = np.abs(d - rm)
            mad = dev.rolling(624, center=True,
                              min_periods=1).median() + 1e-6
            lim = 1.4826 * mad * 5.5
            bad = (d > rm + lim) | (d < rm - lim)
            idx = bad[bad].index
            if len(idx) == 0:
                break
            flag.loc[idx] = 2
            filtered.loc[idx] = np.nan
        return flag

    exp = pandas_hampel(s)
    pd.testing.assert_series_equal(got, exp)
    assert got.loc[100] == 2 and got.loc[4000] == 2
