"""series_features (stages/features.py): documented-formula pins on a
hand-checkable series, null handling, and partitioning invariance."""

import numpy as np
import pandas as pd
import ray.data as rd

from diive_ray.stages.features import series_features


def _frame(with_nulls=False):
    rng = np.random.Generator(np.random.Philox(key=[37, 2026]))
    n = 400
    ts = pd.date_range("2024-01-01", periods=n, freq="30min")
    x = rng.normal(10.0, 2.0, n)
    x[5] = 40.0  # a clear 3-sigma outlier
    if with_nulls:
        x[::7] = np.nan
    return pd.DataFrame({"k": "a", "ts": ts, "eid": np.arange(n), "v": x})


def _expected(x):
    x = x[~np.isnan(x)]
    mu = x.mean()
    z = x - mu
    m2 = (z ** 2).mean()
    sd = x.std(ddof=1)
    return {
        "mean": mu, "sd": sd, "cv": sd / mu,
        "iqr": np.quantile(x, 0.75) - np.quantile(x, 0.25),
        "skewness": (z ** 3).mean() / m2 ** 1.5,
        "kurtosis": (z ** 4).mean() / m2 ** 2 - 3.0,
        "ac1": (z[:-1] * z[1:]).sum() / (z ** 2).sum(),
        "mac": np.abs(np.diff(x)).mean(),
        "outliers3": int((np.abs(z) > 3 * sd).sum()),
    }


def test_formulas_and_outlier(ray_session):
    df = _frame()
    got = series_features(
        rd.from_pandas(df).repartition(4), value_col="v", ts_col="ts",
        keys=("k",), order_cols=("eid",)).iloc[0]
    want = _expected(df["v"].to_numpy())
    for key, val in want.items():
        assert got[key] == val or abs(got[key] - val) < 1e-12, key
    assert got["outliers3"] >= 1
    # the planted 40.0 outlier skews the normal data hard right
    assert want["skewness"] > 1.0


def test_nulls_skipped_in_sequence(ray_session):
    df = _frame(with_nulls=True)
    got = series_features(
        rd.from_pandas(df).repartition(3), value_col="v", ts_col="ts",
        keys=("k",), order_cols=("eid",)).iloc[0]
    want = _expected(df["v"].to_numpy())
    assert got["n"] == (~df["v"].isna()).sum()
    for key, val in want.items():
        assert got[key] == val or abs(got[key] - val) < 1e-12, key


def test_partitioning_invariant(ray_session):
    df = pd.concat([
        _frame().assign(k="a"),
        _frame(with_nulls=True).assign(k="b"),
    ], ignore_index=True)
    one = series_features(rd.from_pandas(df).repartition(1), value_col="v",
                          ts_col="ts", keys=("k",), order_cols=("eid",))
    many = series_features(rd.from_pandas(df).repartition(9), value_col="v",
                           ts_col="ts", keys=("k",), order_cols=("eid",),
                           num_partitions=5)
    pd.testing.assert_frame_equal(
        one.sort_values("k").reset_index(drop=True),
        many.sort_values("k").reset_index(drop=True))
