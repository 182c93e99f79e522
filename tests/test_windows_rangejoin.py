"""range_join + sliding_window_agg vs in-memory pandas oracles."""

import numpy as np
import pandas as pd
import ray.data as rd

US_H = 3_600_000_000


def _events_frame(n=4000, seed=7):
    rng = np.random.Generator(np.random.Philox(key=seed))
    ts = pd.Timestamp("2024-03-01") + pd.to_timedelta(
        np.sort(rng.integers(0, 10 * 24 * 3600, n)), unit="s"
    )
    return pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "k": rng.choice(["a", "b", "c"], n),
            "ts": ts.astype("datetime64[us]"),
            "v": np.where(rng.random(n) < 0.05, np.nan, rng.random(n) * 100),
        }
    )


def test_range_join_disjoint_matches_pandas(ray_session):
    from diive_ray.stages.joins import range_join

    df = _events_frame()
    iv = pd.DataFrame(
        {
            "k": ["a", "a", "b", "c"],
            "start": pd.to_datetime(
                ["2024-03-02", "2024-03-05", "2024-03-03", "2024-03-08"]
            ),
            "end": pd.to_datetime(
                ["2024-03-03", "2024-03-06", "2024-03-04 12:00", "2024-03-09"],
                format="mixed",
            ),
            "wid": [0, 1, 2, 3],
        }
    )
    got = (
        range_join(rd.from_pandas(df).repartition(6), iv, key="k", ts_col="ts")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # pandas oracle: cross join + filter
    exp = df.merge(iv, on="k")
    exp = exp[(exp["ts"] >= exp["start"]) & (exp["ts"] < exp["end"])]
    exp = exp[["id", "k", "ts", "v", "wid"]].sort_values("id").reset_index(drop=True)
    assert len(got) == len(exp) > 0
    assert (got["id"].to_numpy() == exp["id"].to_numpy()).all()
    assert (got["wid"].to_numpy() == exp["wid"].to_numpy()).all()


def test_range_join_overlapping_fan_out(ray_session):
    from diive_ray.stages.joins import range_join

    df = _events_frame(1500, seed=11)
    iv = pd.DataFrame(
        {
            "k": ["a", "a", "b"],
            "start": pd.to_datetime(
                ["2024-03-02", "2024-03-02 12:00", "2024-03-01"], format="mixed"
            ),
            "end": pd.to_datetime(
                ["2024-03-04", "2024-03-03 12:00", "2024-03-11"], format="mixed"
            ),
            "wid": [0, 1, 2],
        }
    )
    got = (
        range_join(rd.from_pandas(df).repartition(4), iv, key="k", ts_col="ts",
                   closed="both")
        .to_pandas()
        .sort_values(["id", "wid"])
        .reset_index(drop=True)
    )
    exp = df.merge(iv, on="k")
    exp = exp[(exp["ts"] >= exp["start"]) & (exp["ts"] <= exp["end"])]
    exp = exp.sort_values(["id", "wid"]).reset_index(drop=True)
    # rows in both overlapping 'a' windows appear twice
    dup_ids = exp.groupby("id").size()
    assert (dup_ids > 1).any()
    assert len(got) == len(exp)
    assert (got["id"].to_numpy() == exp["id"].to_numpy()).all()
    assert (got["wid"].to_numpy() == exp["wid"].to_numpy()).all()


def test_range_join_no_match_empty(ray_session):
    from diive_ray.stages.joins import range_join

    df = _events_frame(200, seed=3)
    iv = pd.DataFrame(
        {
            "k": ["a"],
            "start": pd.to_datetime(["2030-01-01"]),
            "end": pd.to_datetime(["2030-01-02"]),
            "wid": [9],
        }
    )
    got = range_join(rd.from_pandas(df), iv, key="k", ts_col="ts").to_pandas()
    # all-empty pandas-block datasets lose their schema in Ray Data
    # (documented engine-wide convention) — assert emptiness only
    assert len(got) == 0


def test_sliding_window_agg_matches_pandas(ray_session):
    from diive_ray.stages.windows import sliding_window_agg

    df = _events_frame()
    got = (
        sliding_window_agg(
            rd.from_pandas(df).repartition(8),
            keys=["k"], ts_col="ts", value_col="v",
            window_us=6 * US_H, slide_us=2 * US_H,
        )
        .to_pandas()
        .sort_values(["k", "window_end"])
        .reset_index(drop=True)
    )
    # oracle: assign each non-null row to its slide bucket END; windows
    # anchored at non-empty buckets; trailing 3-bucket aggregate
    d = df[df["v"].notna()].copy()
    us = d["ts"].astype("datetime64[us]").astype("int64")
    d["e"] = ((us + 2 * US_H - 1) // (2 * US_H)) * (2 * US_H)
    rows = []
    for (k, e), _ in d.groupby(["k", "e"]):
        w = d[(d["k"] == k) & (d["e"] > e - 6 * US_H) & (d["e"] <= e)]
        rows.append((k, pd.Timestamp(e, unit="us"), len(w), w["v"].sum(),
                     w["v"].min(), w["v"].max()))
    exp = (
        pd.DataFrame(rows, columns=["k", "window_end", "n", "sum", "min", "max"])
        .sort_values(["k", "window_end"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()
    np.testing.assert_allclose(got["sum"], exp["sum"], rtol=1e-12)
    np.testing.assert_allclose(got["min"], exp["min"], rtol=0)
    np.testing.assert_allclose(got["max"], exp["max"], rtol=0)
    np.testing.assert_allclose(got["mean"], exp["sum"] / exp["n"], rtol=1e-12)


def test_sliding_window_rejects_nonmultiple(ray_session):
    import pytest

    from diive_ray.stages.windows import sliding_window_agg

    df = _events_frame(50)
    with pytest.raises(ValueError):
        sliding_window_agg(
            rd.from_pandas(df), keys=["k"], ts_col="ts", value_col="v",
            window_us=5 * US_H, slide_us=2 * US_H,
        )
