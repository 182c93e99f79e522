"""EddyPro flag-battery kernels (functions/scalars.py) vs verbatim
replicas of the reference semantics (eddyproflags.py:31-58 string
digit extraction with NaN/9 handling, :341-454 threshold flags)."""

import numpy as np
import pandas as pd

from diive_ray.functions.scalars import (
    flag_hard_digit,
    flag_high_good,
    flag_low_good,
)


def _ref_digit(series: pd.Series, position: int, is_hard_flag: bool) -> pd.Series:
    """Verbatim _extract_and_convert_flag_from_multidigit (the
    string-indexing path)."""
    flag = series.apply(pd.to_numeric, errors="coerce").astype(float)
    flag = flag.fillna(899999999)
    flag = flag.astype(int).astype(str)  # int cast: our codes are integral
    flag = flag.str[int(position)]
    flag = flag.apply(pd.to_numeric, errors="coerce")
    flag = flag.replace(9, np.nan)
    if is_hard_flag:
        flag = flag.replace(1, 2)
    return flag


def test_hard_digit_matches_reference():
    codes = pd.Series([80.0, 81.0, 82.0, 89.0, np.nan, 10.0, 91.0])
    got = flag_hard_digit(codes.to_numpy(), 1, 2, hard=True)
    want = _ref_digit(codes, 1, True).to_numpy()
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    np.testing.assert_array_equal(got[~np.isnan(got)], want[~np.isnan(want)])


def test_soft_digit_keeps_one():
    got = flag_hard_digit(np.array([81.0]), 1, 2, hard=False)
    assert got.tolist() == [1.0]


def test_threshold_flags_match_reference_branches():
    # completeness (higher better, 0.99/0.97) — eddyproflags.py:397-400
    pct = np.array([1.0, 0.99, 0.985, 0.97, 0.9699, 0.5, np.nan])
    got = flag_high_good(pct, 0.99, 0.97)
    want = np.full_like(pct, np.nan)
    want[pct >= 0.99] = 0
    want[(pct >= 0.97) & (pct < 0.99)] = 1
    want[pct < 0.97] = 2
    np.testing.assert_array_equal(np.nan_to_num(got, nan=-9), np.nan_to_num(want, nan=-9))

    # SCF (lower better, 2/4) — eddyproflags.py:441-444
    scf = np.array([1.0, 1.999, 2.0, 3.999, 4.0, 10.0, np.nan])
    got = flag_low_good(scf, 2.0, 4.0)
    want = np.full_like(scf, np.nan)
    want[scf < 2.0] = 0
    want[(scf >= 2.0) & (scf < 4.0)] = 1
    want[scf >= 4.0] = 2
    np.testing.assert_array_equal(np.nan_to_num(got, nan=-9), np.nan_to_num(want, nan=-9))
