"""Retention layer: metadata-only chunk expiry, row-level tier sweep,
filter/counts consistency, coverage invariant."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from diive_ray.stages import retention as rt

DAY_US = 86_400_000_000


def test_expired_chunk_paths_metadata_only():
    # chunks of 6h; watermark at day 30; max age 7 days
    chunk_s = 21_600
    manifest = pd.DataFrame({
        "path": [f"/lake/src-a/chunk-{lo:010d}.parquet"
                 for lo in range(0, 30 * 86_400, chunk_s)],
        "source": "a",
        "chunk_lo": list(range(0, 30 * 86_400, chunk_s)),
    })
    wm = 30 * DAY_US
    drops = rt.expired_chunk_paths(manifest, max_age_us=7 * DAY_US,
                                   watermark_us=wm, chunk_seconds=chunk_s)
    # a chunk survives iff any part of it is within the last 7 days
    keep_lo = (wm - 7 * DAY_US) // 1_000_000 - chunk_s
    assert all(int(p.split("chunk-")[1].split(".")[0]) <= keep_lo for p in drops)
    assert len(drops) == sum(
        1 for lo in manifest["chunk_lo"]
        if (lo + chunk_s) * 1_000_000 <= wm - 7 * DAY_US
    )
    # boundary chunk (straddles the cutoff) must NOT be dropped
    cutoff_lo = (wm - 7 * DAY_US) // 1_000_000
    straddler = f"/lake/src-a/chunk-{(cutoff_lo - chunk_s // 2):010d}.parquet"
    assert all(straddler not in p for p in drops)


def test_retention_filter_and_counts_agree(ray_session):
    rng = np.random.Generator(np.random.Philox(key=41))
    n = 2000
    bucket = pd.to_datetime(rng.integers(0, 30 * DAY_US, n), unit="us")
    tier = rng.choice(["1m", "1h", "1d"], n)
    cnt = rng.integers(1, 50, n)
    df = pd.DataFrame({"tier": tier, "bucket_ts": bucket, "count": cnt})
    wm = 30 * DAY_US
    policy = {"1m": 7 * DAY_US, "1h": 14 * DAY_US, "1d": None}

    ds = rd.from_pandas(df).repartition(4)
    kept_rows = rt.retention_filter(ds, policy, wm).to_pandas()
    counts = rt.retention_counts(ds, policy, wm)

    for t, max_age in policy.items():
        sub = df[df["tier"] == t]
        age = wm - sub["bucket_ts"].astype("datetime64[us]").astype("int64")
        exp_kept = len(sub) if max_age is None else int((age <= max_age).sum())
        row = counts[counts["tier"] == t].iloc[0]
        assert row["kept"] == exp_kept
        assert row["expired"] == len(sub) - exp_kept
        assert (kept_rows["tier"] == t).sum() == exp_kept
        kept_sub = sub if max_age is None else sub[(age <= max_age).to_numpy()]
        assert row["kept_events"] == int(kept_sub["count"].sum())

    # coverage invariant: 1d is keep-forever, so every expired fine row's
    # window is still represented at the 1d tier (here trivially all rows)
    assert counts.loc[counts["tier"] == "1d", "expired"].iloc[0] == 0


def test_m4_candidates_cross_batch(ray_session):
    """M4 must find the true bucket extremes even when a bucket's rows
    split across batches (candidate reduction + keyed combine)."""
    from diive_ray.stages.downsample import m4_downsample

    rng = np.random.Generator(np.random.Philox(key=51))
    n = 4000
    ts = pd.to_datetime(np.sort(rng.integers(0, 4 * 3600 * 10**6, n)), unit="us")
    v = rng.normal(0, 10, n)
    df = pd.DataFrame({"event_type": "a", "ts": ts, "value": v})
    out = m4_downsample(rd.from_pandas(df).repartition(7),
                        width_us=3600 * 10**6).to_pandas()
    exp = df.copy()
    exp["bucket_ts"] = (exp["ts"].astype("int64") // (3600 * 10**9) + 1) * 3600 * 10**9
    exp["bucket_ts"] = pd.to_datetime(exp["bucket_ts"])
    for b, g in exp.groupby("bucket_ts"):
        row = out[out["bucket_ts"] == b].iloc[0]
        assert row["v_min"] == pytest.approx(g["value"].min())
        assert row["v_max"] == pytest.approx(g["value"].max())
        assert row["v_first"] == pytest.approx(g.sort_values("ts")["value"].iloc[0])
        assert row["v_last"] == pytest.approx(g.sort_values("ts")["value"].iloc[-1])
        assert row["n"] == len(g)


def test_counter_rate_reset_semantics(ray_session):
    from diive_ray.stages.downsample import counter_rate

    df = pd.DataFrame({
        "k": "a",
        "ts": pd.to_datetime([0, 10, 20, 30, 40], unit="s"),
        "counter": [5.0, 15.0, 3.0, 3.0, 13.0],  # reset at t=20
        "rid": range(5),
    })
    out = counter_rate(rd.from_pandas(df), keys=("k",), value_col="counter",
                       id_col="rid").to_pandas().sort_values("ts")
    np.testing.assert_allclose(out["increase"], [10.0, 3.0, 0.0, 10.0])
    np.testing.assert_allclose(out["rate"], [1.0, 0.3, 0.0, 1.0])
    np.testing.assert_array_equal(out["is_reset"], [0, 1, 0, 0])
