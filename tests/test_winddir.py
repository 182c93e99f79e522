"""Circular wind-direction aggregation (stages/wind.py
winddir_agg_kanda vs a verbatim replica of reference
core/funcs/funcs.py:85-118), including the wrap-negative branch and
the cross-north case where a linear mean is badly wrong."""

import numpy as np
import pandas as pd
import pytest

from diive_ray.stages.wind import winddir_agg_kanda


def _ref(angles: pd.Series, agg: str) -> float:
    ph = angles / 180 * np.pi
    Ds, Dc = np.sin(ph), np.cos(ph)
    if agg == "mean":
        wd0 = 180 / np.pi * np.arctan2(Ds.mean(), Dc.mean())
    elif agg == "median":
        wd0 = 180 / np.pi * np.arctan2(Ds.median(), Dc.median())
    elif agg == "P25":
        wd0 = 180 / np.pi * np.arctan2(Ds.quantile(0.25), Dc.quantile(0.25))
    elif agg == "P75":
        wd0 = 180 / np.pi * np.arctan2(Ds.quantile(0.75), Dc.quantile(0.75))
    if wd0 < 0:
        wd0 += 360
    return wd0


@pytest.mark.parametrize("agg", ["mean", "median", "P25", "P75"])
def test_matches_reference_bitwise(agg):
    rng = np.random.Generator(np.random.Philox(key=[17, 2026]))
    for _ in range(20):
        a = pd.Series(rng.uniform(0, 360, size=rng.integers(2, 40)))
        assert winddir_agg_kanda(a, agg) == _ref(a, agg)


def test_cross_north_mean():
    # 350° and 10° average to 0°/360° circularly — never 180°.
    a = pd.Series([350.0, 10.0])
    got = winddir_agg_kanda(a, "mean")
    assert got == pytest.approx(0.0, abs=1e-9) or got == pytest.approx(360.0, abs=1e-9)


def test_wrap_negative_branch():
    # all angles in (180, 360) -> atan2 negative -> +360 wrap applies
    a = pd.Series([190.0, 200.0, 210.0])
    got = winddir_agg_kanda(a, "mean")
    assert 180.0 < got < 360.0
    assert got == pytest.approx(200.0, abs=1e-9)


def test_unknown_agg_raises():
    with pytest.raises(ValueError):
        winddir_agg_kanda(pd.Series([1.0]), "max")
