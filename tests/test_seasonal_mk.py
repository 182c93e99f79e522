"""Seasonal Mann-Kendall (stages/trend.py:seasonal_mann_kendall_frame,
Hirsch, Slack & Smith 1982)."""

import numpy as np
import pandas as pd

from diive_ray.stages.trend import (
    mann_kendall_frame, seasonal_mann_kendall_frame,
)


def _daily(values, start="2020-01-01"):
    d = pd.date_range(start, periods=len(values), freq="D")
    return pd.DataFrame({"event_type": "x", "bucket_ts": d, "m": values})


def test_seasonal_removes_cycle_false_trend():
    """Two years of a pure seasonal sawtooth with a tiny superimposed
    uptrend: within-season pairs see only the trend, so seasonal MK is
    strongly positive; sen slope recovers the planted daily slope."""
    days = pd.date_range("2020-01-01", periods=730, freq="D")
    cycle = np.sin(2 * np.pi * days.dayofyear / 365.25) * 50
    slope = 0.01
    y = cycle + slope * np.arange(730)
    df = pd.DataFrame({"event_type": "x", "bucket_ts": days, "m": y})
    out = seasonal_mann_kendall_frame(df)
    assert out.loc[0, "z"] > 3  # detected
    # within-month pairs one year apart: slope per day ~= planted
    assert abs(out.loc[0, "sen_slope"] - slope) < 0.002
    assert out.loc[0, "s"] > 0
    assert out.loc[0, "n"] == 730


def test_agrees_with_plain_mk_single_season():
    """All data inside one month -> seasonal == plain MK exactly."""
    rng = np.random.default_rng(4)
    df = _daily(rng.normal(0, 1, 25), start="2021-03-01")
    a = seasonal_mann_kendall_frame(df)
    b = mann_kendall_frame(df)
    for c in ("n", "s", "var_s", "z", "tau", "sen_slope"):
        assert a.loc[0, c] == b.loc[0, c], c


def test_tie_correction_and_small_seasons():
    # constant series: S=0, var uses tie correction -> z=0, tau=0
    df = _daily([5.0] * 40)
    out = seasonal_mann_kendall_frame(df)
    assert out.loc[0, "s"] == 0
    assert out.loc[0, "z"] == 0.0
    assert out.loc[0, "tau"] == 0.0


def test_multiple_keys_sorted():
    rng = np.random.default_rng(8)
    frames = []
    for k in ("b", "a"):
        f = _daily(rng.normal(size=30))
        f["event_type"] = k
        frames.append(f)
    out = seasonal_mann_kendall_frame(pd.concat(frames))
    assert out["event_type"].tolist() == ["a", "b"]
