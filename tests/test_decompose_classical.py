"""Classical decomposition + periodogram seasonality detection
(reference core/times/decomposition_utils.py:160-211, 425-531;
stages/decompose.py kernels). Pure frame kernels — no Ray needed."""

import numpy as np
import pandas as pd
import pytest

from diive_ray.pipelines.queries import year_pools
from diive_ray.stages.decompose import (
    classical_decompose_frame,
    detect_seasonality_frame,
)


def _frame(y: np.ndarray, key: str = "a") -> pd.DataFrame:
    ts = pd.date_range("2024-01-01", periods=len(y), freq="1h")
    return pd.DataFrame({"k": key, "ts": ts, "v": y})


def test_classical_recovers_planted_components():
    # planted: linear trend + pure period-24 seasonal, no noise
    n, p = 480, 24
    t = np.arange(n, dtype=float)
    seas_true = 5.0 * np.sin(2 * np.pi * t / p)
    y = 0.25 * t + 10.0 + seas_true
    out = classical_decompose_frame(
        _frame(y), key="k", ts_col="ts", val_col="v", period=p
    )
    assert len(out) == n
    # edges: first/last p//2 trend values NaN (no extrapolation)
    assert out["trend"].head(12).isna().all()
    assert out["trend"].tail(12).isna().all()
    mid = out.iloc[12:-12]
    # the 2xp MA of a linear trend is the trend itself; seasonal sums
    # to zero over a full period so it vanishes from the MA
    assert np.allclose(mid["trend"], 0.25 * t[12:-12] + 10.0, atol=1e-8)
    # seasonal: recovered phase means match the planted wave (phase 0 =
    # first row position)
    assert np.allclose(out["seasonal"].to_numpy(), seas_true, atol=1e-8)
    # residual ~ 0 where defined; additive identity recon == value
    assert np.nanmax(np.abs(mid["resid"].to_numpy())) < 1e-8
    ok = out["recon"].notna()
    assert np.allclose(out.loc[ok, "recon"], out.loc[ok, "v"], atol=1e-12)


def test_classical_seasonal_centered_and_tiled():
    rng = np.random.default_rng(7)
    y = rng.normal(size=240) + np.tile(np.arange(24, dtype=float), 10)
    out = classical_decompose_frame(
        _frame(y), key="k", ts_col="ts", val_col="v", period=24
    )
    seas = out["seasonal"].to_numpy()
    # tiled: position i and i+24 share the seasonal value
    assert np.allclose(seas[:-24], seas[24:], atol=0)
    # centered: the 24 phase values sum to ~0
    assert abs(seas[:24].sum()) < 1e-9


def test_classical_odd_period_rejected():
    with pytest.raises(NotImplementedError):
        classical_decompose_frame(
            _frame(np.arange(100.0)), key="k", ts_col="ts", val_col="v", period=7
        )


def test_detect_seasonality_planted_period():
    n = 960
    t = np.arange(n, dtype=float)
    y = (10.0 * np.sin(2 * np.pi * t / 24)
         + 3.0 * np.sin(2 * np.pi * t / 96)
         + 0.01 * t)
    out = detect_seasonality_frame(
        _frame(y), key="k", ts_col="ts", val_col="v"
    )
    row = out.iloc[0]
    assert row["primary_period"] == 24
    secs = [int(s) for s in row["secondary_periods"].split(",") if s]
    assert 96 in secs
    assert 0.5 < row["strength"] <= 1.0
    assert row["n_obs"] == n


def test_detect_seasonality_no_peak_fallback():
    # strictly monotone series: after detrend it is ~0 -> whatever
    # power remains has no strict interior local maximum pattern is not
    # guaranteed, so use a 2-candidate series (n=8 -> periods {2,..4})
    y = np.array([1.0, 2.0, 1.0, 2.0, 1.0, 2.0, 1.0, 2.0])
    out = detect_seasonality_frame(
        _frame(y), key="k", ts_col="ts", val_col="v"
    )
    row = out.iloc[0]
    # period-2 alternation dominates; with <3 candidates there can be
    # no strict interior peak -> global-max fallback, no secondaries
    assert row["primary_period"] == 2
    assert row["secondary_periods"] == ""


def test_year_pools_nearest_tie_prefers_earlier_year():
    counts = pd.Series([10, 20, 30], index=[2000, 2002, 2004])
    rows = {r["year"]: r for r in year_pools(counts)}
    # 2002: |2000-2002| == |2004-2002| -> argmin-first picks 2000,
    # then 2004 -> pool spans all three
    assert rows[2002]["pool_first"] == 2000
    assert rows[2002]["pool_last"] == 2004
    assert rows[2002]["n_rows"] == 60
    # 2000: nearest 2002 then 2004
    assert (rows[2000]["pool_first"], rows[2000]["pool_last"]) == (2000, 2004)
    # single-year degenerate pool
    solo = year_pools(pd.Series([5], index=[1999]))[0]
    assert solo["n_pool_years"] == 1 and solo["n_rows"] == 5
