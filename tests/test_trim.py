"""trim_to_var (stages/corrections.py) vs a verbatim replica of the
reference trim_frame (core/dfun/frames.py:207-237): edges cut to the
var's first/last valid record, interior gaps ignored; all-missing var
-> empty result; per-key bounds independent."""

import numpy as np
import pandas as pd
import ray.data as rd

from diive_ray.stages.corrections import trim_to_var


def _ref_trim(df: pd.DataFrame, var: str) -> pd.DataFrame:
    records = df.set_index("ts")[var].dropna()
    if records.empty:
        return df.iloc[0:0]
    keep = (df["ts"] >= records.index[0]) & (df["ts"] <= records.index[-1])
    return df[keep]


def _frame(seed: int, n: int = 200) -> pd.DataFrame:
    rng = np.random.Generator(np.random.Philox(key=[seed, 2026]))
    ts = pd.date_range("2024-01-01", periods=n, freq="37min")
    v = rng.normal(size=n)
    v[: rng.integers(5, 30)] = np.nan          # leading gap
    v[-rng.integers(5, 30):] = np.nan          # trailing gap
    v[rng.integers(40, 60)] = np.nan           # interior gap — ignored
    return pd.DataFrame({"ts": ts, "x": v, "other": np.arange(n)})


def test_global_trim_matches_reference(ray_session):
    df = _frame(31)
    got = (
        trim_to_var(rd.from_pandas(df).repartition(5), "x")
        .to_pandas().sort_values("ts").reset_index(drop=True)
    )
    want = _ref_trim(df, "x").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert len(got) < len(df)
    assert got["x"].isna().any()  # interior gap survives


def test_all_missing_var_empty(ray_session):
    df = _frame(32)
    df["x"] = np.nan
    got = trim_to_var(rd.from_pandas(df).repartition(3), "x").to_pandas()
    assert len(got) == 0


def test_per_key_bounds_independent(ray_session):
    a, b = _frame(33), _frame(34)
    a["k"], b["k"] = "a", "b"
    df = pd.concat([a, b], ignore_index=True)
    got = (
        trim_to_var(rd.from_pandas(df).repartition(7), "x", keys=["k"])
        .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
    )
    want = pd.concat(
        [_ref_trim(a, "x"), _ref_trim(b, "x")], ignore_index=True
    ).sort_values(["k", "ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
