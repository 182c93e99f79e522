"""MaxCovariance lag search (stages/lag.py): planted-lag recovery,
from-scratch find_peaks props vs hand-computed values, auto-peak flag."""

import numpy as np
import pandas as pd

from diive_ray.stages.lag import (
    find_local_maxima,
    max_covariance_frame,
    peak_prominences,
    peak_widths,
)


def test_find_local_maxima_plateaus():
    x = np.array([0, 2, 0, 1, 1, 1, 0, 3, 3, 0, 1], dtype=float)
    # simple peak at 1; plateau 3..5 -> midpoint 4; plateau 7..8 -> 7
    assert find_local_maxima(x).tolist() == [1, 4, 7]


def test_prominences_and_widths_hand_case():
    #       0  1  2  3  4  5  6  7  8
    x = np.array([0, 5, 2, 4, 1, 6, 0, 3, 0], dtype=float)
    peaks = find_local_maxima(x)
    assert peaks.tolist() == [1, 3, 5, 7]
    proms, lb, rb = peak_prominences(x, peaks)
    # peak 5 (global): bases at boundaries, min 0 both sides -> prom 6
    # peak 1: left base 0 (val 0), right stretch to 4 (min 1) -> 5 - 1 = 4
    # peak 3: bounded by higher points both sides, mins 2 and 1 -> 4 - 2 = 2
    # peak 7: mins 0 both sides -> 3
    np.testing.assert_allclose(proms, [4, 2, 6, 3])
    widths, wh = peak_widths(x, peaks, proms, lb, rb)
    np.testing.assert_allclose(wh, [3.0, 3.0, 3.0, 1.5])
    assert (widths > 0).all()


def test_planted_lag_recovered_and_auto_flagged():
    rng = np.random.Generator(np.random.Philox(key=21))
    n = 1500
    sig = np.cumsum(rng.normal(size=n))  # smooth random walk
    df = pd.DataFrame({"ref": sig, "lagged": pd.Series(sig).shift(9)})
    out = max_covariance_frame(
        df, ref_col="ref", lagged_col="lagged", winsize_from=-30, winsize_to=30
    )
    best = out.loc[out["flag_peak_max_cov_abs"]]
    assert best["shift"].tolist() == [9]
    # a clean strong peak must also survive the auto-peak validation
    assert bool(out.loc[out["shift"] == 9, "flag_peak_auto"].iloc[0])


def test_nan_pairs_skipped():
    rng = np.random.Generator(np.random.Philox(key=22))
    a = rng.normal(size=400)
    b = np.roll(a, 3)
    b[:3] = np.nan
    a[50:60] = np.nan
    out = max_covariance_frame(
        pd.DataFrame({"ref": a, "lagged": b}),
        ref_col="ref", lagged_col="lagged", winsize_from=-6, winsize_to=6,
    )
    assert out.loc[out["flag_peak_max_cov_abs"], "shift"].tolist() == [3]
    assert (out["n"] < 400).all() and (out["n"] > 300).all()
