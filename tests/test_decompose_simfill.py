"""Harmonic decomposition recovers a planted signal; similarity fill
matches a per-gap pandas oracle and honors the stage cascade."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from diive_ray.stages.decompose import harmonic_decompose
from diive_ray.stages.similarity_fill import FillStage, similarity_fill_frame, similarity_fill


@pytest.fixture(scope="module")
def hourly():
    n = 24 * 60
    ts = pd.date_range("2024-03-01", periods=n, freq="h")
    rows = []
    rng = np.random.Generator(np.random.Philox(key=41))
    for src in ("a", "b"):
        hod = ts.hour.to_numpy()
        v = 50 + 20 * np.sin(2 * np.pi * hod / 24) + 5 * np.cos(4 * np.pi * hod / 24)
        v = v + rng.standard_normal(n) * 0.5
        rows.append(pd.DataFrame({"source": src, "ts": ts, "v": v}))
    return pd.concat(rows, ignore_index=True)


def test_harmonic_decompose_recovers_signal(hourly, ray_session):
    ds = rd.from_pandas(hourly).repartition(4)
    out = harmonic_decompose(
        ds, value_col="v", keys=("source",), ts_col="ts",
        period_us=86_400_000_000, n_harmonics=2, trend_window=0,
    ).to_pandas()
    # residual should be ~noise (sigma 0.5), seasonal captures the harmonics
    assert out["v_resid"].abs().mean() < 1.0
    assert out["v_seasonal"].std() > 10
    # exact recomposition
    np.testing.assert_allclose(
        out["v_trend"] + out["v_seasonal"] + out["v_resid"], out["v"], rtol=0, atol=1e-9
    )


def test_similarity_fill_matches_pandas_oracle(hourly):
    df = hourly[hourly["source"] == "a"].copy().reset_index(drop=True)
    gap = (np.arange(len(df)) % 131) < 4
    df.loc[gap, "v"] = np.nan
    df["hod"] = pd.to_datetime(df["ts"]).dt.hour.astype(float)
    stage = FillStage(features=(("hod", 1.0, 24.0),), window_us=2 * 86_400_000_000, min_donors=2, code=7)
    out = similarity_fill_frame(df.copy(), "v", [stage], ts_col="ts")

    us = df["ts"].astype("int64").to_numpy() // 1000
    v = df["v"].to_numpy()
    hod = df["hod"].to_numpy()
    for i in np.flatnonzero(gap):
        in_win = np.abs(us - us[i]) <= 2 * 86_400_000_000
        d = np.abs(hod - hod[i])
        sim = np.minimum(d, 24 - d) <= 1.0
        donors = in_win & sim & ~np.isnan(v)
        if donors.sum() >= 2:
            assert abs(out["v_simfilled"].iloc[i] - v[donors].mean()) < 1e-12
            assert out["v_simfilled_flag"].iloc[i] == 7
        else:
            assert np.isnan(out["v_simfilled"].iloc[i])
    # observed untouched
    obs = ~gap
    np.testing.assert_array_equal(out.loc[obs, "v_simfilled"], df.loc[obs, "v"])


def test_similarity_fill_cascade_codes(hourly, ray_session):
    df = hourly.copy()
    df.loc[(np.arange(len(df)) % 97) < 3, "v"] = np.nan
    df["hod"] = pd.to_datetime(df["ts"]).dt.hour.astype(float)
    stages = [
        FillStage(features=(("hod", 0.0, 24.0),), window_us=86_400_000_000, min_donors=2, code=1),
        FillStage(features=(("hod", 2.0, 24.0),), window_us=7 * 86_400_000_000, min_donors=2, code=2),
    ]
    ds = rd.from_pandas(df).repartition(4)
    out = similarity_fill(ds, "v", stages, keys=("source",), ts_col="ts").to_pandas()
    flags = out["v_simfilled_flag"].dropna().unique()
    assert set(flags) <= {0.0, 1.0, 2.0}
    assert (out["v_simfilled_flag"] == 1.0).sum() > 0  # stage 1 fills most
    filled = out[out["v_simfilled_flag"] > 0]
    assert filled["v_simfilled"].notna().all()
