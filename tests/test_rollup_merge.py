"""merge_tier_datasets: incremental continuous-aggregate maintenance ==
full recompute, point-for-point (the north rule's late-data path)."""

import numpy as np
import pandas as pd
import ray.data as rd

from diive_ray.pipelines.rollup import cascade_fused, merge_tier_datasets


def _events(n=5000, seed=7):
    rng = np.random.Generator(np.random.Philox(key=[seed, 2026]))
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        np.sort(rng.integers(0, 86400 * 10, n)), unit="s")
    return pd.DataFrame({
        "event_type": rng.choice(["a", "b", "c"], n),
        "ts": ts.astype("datetime64[us]"),
        "value": rng.normal(5, 2, n),
        "event_id": np.arange(n, dtype=np.int64),
    })


def _tier(df, tier="1h"):
    ds = rd.from_pandas(df[["event_type", "ts", "value"]])
    fused = cascade_fused(ds, value_col="value", keys=("event_type",),
                          ts_col="ts", end_stamped=False, raw_width_us=None)
    return fused.filter(expr=f"tier == '{tier}'").drop_columns(
        ["tier", "n_child"])


def _canon(ds):
    df = ds.to_pandas().sort_values(["event_type", "bucket_ts"]).reset_index(
        drop=True)
    df["bucket_ts"] = pd.to_datetime(df["bucket_ts"]).astype("datetime64[us]")
    return df[["event_type", "bucket_ts", "count", "sum", "min", "max", "mean"]]


def test_merge_of_split_equals_full_recompute():
    df = _events()
    late_mask = (df["event_id"] * 48271) % (2 ** 31) % 7 == 0
    merged = merge_tier_datasets(
        _tier(df[~late_mask]), _tier(df[late_mask]), keys=["event_type"])
    full = _tier(df)
    got, exp = _canon(merged), _canon(full)
    pd.testing.assert_frame_equal(
        got.drop(columns=["sum", "mean"]), exp.drop(columns=["sum", "mean"]))
    np.testing.assert_allclose(got["sum"], exp["sum"], rtol=1e-12)
    np.testing.assert_allclose(got["mean"], exp["mean"], rtol=1e-12)


def test_merge_with_empty_delta_is_identity_modulo_mean_rederive():
    df = _events(800, seed=11)
    base = _tier(df)
    empty = _tier(df.head(0))
    merged = merge_tier_datasets(base, empty, keys=["event_type"])
    got, exp = _canon(merged), _canon(base)
    pd.testing.assert_frame_equal(got, exp)


def test_merge_counts_conserved_and_minmax_fold():
    df = _events(3000, seed=13)
    m = df["event_id"] % 2 == 0
    merged = _canon(merge_tier_datasets(
        _tier(df[m]), _tier(df[~m]), keys=["event_type"]))
    assert merged["count"].sum() == len(df)
    assert merged["min"].min() == df["value"].min()
    assert merged["max"].max() == df["value"].max()
