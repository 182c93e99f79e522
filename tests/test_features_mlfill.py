"""FeatureEngineer stage vs pandas oracle; event interval flags;
sstats/histogram; ridge gap-fill recovers the planted diurnal signal."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from diive_ray.stages.features import (
    engineer_features,
    engineer_features_frame,
    event_to_flag,
    histogram,
    sstats,
)
from diive_ray.stages.mlfill import ridge_fill


@pytest.fixture(scope="module")
def series_df():
    rng = np.random.Generator(np.random.Philox(key=5))
    n = 2000
    ts = pd.date_range("2024-01-01", periods=n, freq="min")
    rows = []
    for src in ("a", "b"):
        hour = ts.hour + ts.minute / 60.0
        v = 100 + 50 * np.sin(2 * np.pi * hour / 24.0) + rng.standard_normal(n)
        rows.append(pd.DataFrame({"source": src, "ts": ts, "v": v}))
    return pd.concat(rows, ignore_index=True)


def test_engineer_features_matches_pandas_oracle(series_df, ray_session):
    ds = rd.from_pandas(series_df).repartition(4)
    got = (
        engineer_features(ds, value_col="v", keys=("source",))
        .to_pandas()
        .sort_values(["source", "ts"])
        .reset_index(drop=True)
    )
    exp = pd.concat(
        [
            engineer_features_frame(g.sort_values("ts").reset_index(drop=True), "v")
            for _, g in series_df.groupby("source")
        ],
        ignore_index=True,
    ).sort_values(["source", "ts"]).reset_index(drop=True)
    for c in exp.columns:
        np.testing.assert_allclose(
            got[c].to_numpy(dtype=float) if exp[c].dtype.kind in "fc" else got[c].to_numpy(dtype=np.float64),
            exp[c].to_numpy(dtype=np.float64),
            equal_nan=True,
            err_msg=c,
        ) if exp[c].dtype.kind in "fci" else None


def test_event_to_flag(series_df, ray_session):
    ds = rd.from_pandas(series_df[series_df["source"] == "a"]).repartition(3)
    events = pd.DataFrame({
        "start": [pd.Timestamp("2024-01-01 01:00"), pd.Timestamp("2024-01-01 02:30")],
        "end": [pd.Timestamp("2024-01-01 01:30"), pd.Timestamp("2024-01-01 03:00")],
    })
    out = event_to_flag(ds, events).to_pandas()
    ts = pd.to_datetime(out["ts"])
    inside = ((ts >= "2024-01-01 01:00") & (ts <= "2024-01-01 01:30")) | (
        (ts >= "2024-01-01 02:30") & (ts <= "2024-01-01 03:00")
    )
    assert (out["FLAG_EVENT"].to_numpy() == inside.to_numpy().astype(np.int8)).all()


def test_sstats_and_histogram(series_df, ray_session):
    ds = rd.from_pandas(series_df).repartition(4)
    st = sstats(ds, value_col="v", keys=("source",)).set_index("source")
    for src, g in series_df.groupby("source"):
        v = g["v"]
        assert st.loc[src, "n"] == v.count()
        assert abs(st.loc[src, "mean"] - v.mean()) < 1e-9
        assert abs(st.loc[src, "q25"] - v.quantile(0.25)) < 1e-9
    h = histogram(ds, value_col="v", bins=10)
    assert h["n"].sum() == len(series_df)
    v = series_df["v"].to_numpy()
    lo, hi = v.min(), v.max()
    b = np.minimum(np.floor((v - lo) / (hi - lo) * 10), 9).astype(int)
    c = np.bincount(b, minlength=10)
    assert (h.sort_values("bin")["n"].to_numpy() == c).all()


def test_ridge_fill_recovers_diurnal_signal(series_df, ray_session):
    df = series_df.rename(columns={"ts": "bucket_ts", "v": "mean"}).copy()
    # punch deterministic gaps
    gap = (np.arange(len(df)) % 97) < 8
    truth = df["mean"].copy()
    df.loc[gap, "mean"] = np.nan
    ds = rd.from_pandas(df).repartition(4)
    out = ridge_fill(ds, value_col="mean", keys=("source",)).to_pandas()
    out = out.sort_values(["source", "bucket_ts"]).reset_index(drop=True)
    ref = df.sort_values(["source", "bucket_ts"]).reset_index(drop=True)
    truth = truth[ref.index]
    filled = out["mean_mlfilled"]
    # observed rows untouched
    obs = ref["mean"].notna()
    assert np.allclose(filled[obs], ref.loc[obs, "mean"])
    # gap rows filled and close to the planted harmonic (noise sigma=1)
    gaps = ~obs
    assert filled[gaps].notna().all()
    rmse = float(np.sqrt(np.mean((filled[gaps] - truth[gaps]) ** 2)))
    assert rmse < 3.0, rmse
    assert (out.loc[gaps.to_numpy(), "mean_mlfilled_is_model"] == 1).all()
