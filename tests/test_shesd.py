"""Seasonal Hybrid ESD (stages/shesd.py, Hochenbaum et al. 2017 /
Rosner 1983 generalized ESD)."""

import numpy as np
import pandas as pd
import ray.data as rd

from diive_ray.stages.shesd import esd_critical, shesd_detect, shesd_frame


def test_rosner_published_critical_values():
    """Rosner 1983 Table: n=54, alpha=0.05 -> lambda_1 = 3.158,
    lambda_2 = 3.151; Grubbs n=10 one-outlier lambda_1 ~ 2.29."""
    assert abs(esd_critical(54, 1, 0.05) - 3.158) < 5e-3
    assert abs(esd_critical(54, 2, 0.05) - 3.151) < 5e-3
    assert abs(esd_critical(10, 1, 0.05) - 2.290) < 2e-2


def _series(n_days=30, seed=5, spikes=()):
    rng = np.random.default_rng(seed)
    n = n_days * 24
    t = np.arange(n)
    y = 10 + 5 * np.sin(2 * np.pi * t / 24) + rng.normal(0, 0.3, n)
    for pos, delta in spikes:
        y[pos] += delta
    ts = pd.date_range("2021-06-01", periods=n, freq="h")
    return pd.DataFrame({"bucket_ts": ts, "mean": y})


def test_planted_spikes_recovered():
    spikes = ((100, 8.0), (333, -7.0), (555, 9.0))
    df = _series(spikes=spikes)
    out = shesd_frame(df, "mean", period=24, max_anoms_frac=0.02)
    flagged = set(np.flatnonzero(out["anomaly"].to_numpy()))
    assert {100, 333, 555} <= flagged
    assert len(flagged) <= 6  # no mass false-positives


def test_seasonal_awareness():
    """A value normal at the daily PEAK but placed at the TROUGH is
    anomalous only after seasonal removal: plain |y - median| ranks it
    below the peak values, S-H-ESD flags it."""
    df = _series(seed=7)
    trough = 12 + 24 * 10  # hour 12 = sin minimum in this phase
    y = df["mean"].to_numpy()
    peak_level = np.percentile(y, 98)
    df.loc[trough, "mean"] = peak_level  # unremarkable globally
    out = shesd_frame(df, "mean", period=24, max_anoms_frac=0.02)
    assert out.loc[trough, "anomaly"] == 1


def test_no_anomalies_on_clean_series():
    df = _series(seed=9)
    out = shesd_frame(df, "mean", period=24, max_anoms_frac=0.02)
    assert out["anomaly"].sum() <= 2  # alpha=0.05 false-positive slack


def test_distributed_matches_frame(ray_session):
    df = _series(spikes=((50, 10.0),))
    df2 = df.copy(); df2["k"] = "a"
    df3 = _series(seed=11, spikes=((200, -9.0),)); df3["k"] = "b"
    alldf = pd.concat([df2, df3], ignore_index=True)
    got = shesd_detect(
        rd.from_pandas(alldf).repartition(7), keys=["k"],
        order_by=["bucket_ts"], value_col="mean", period=24,
        max_anoms_frac=0.02).to_pandas()
    for k, base in (("a", df), ("b", df3.drop(columns="k"))):
        exp = shesd_frame(base.sort_values("bucket_ts").reset_index(drop=True),
                          "mean", period=24, max_anoms_frac=0.02)
        sub = got[got.k == k].sort_values("bucket_ts").reset_index(drop=True)
        np.testing.assert_array_equal(
            sub["anomaly"].to_numpy(), exp["anomaly"].to_numpy())
        np.testing.assert_array_equal(
            sub["anom_rank"].to_numpy(), exp["anom_rank"].to_numpy())
