"""Scalar functions (digit flags, name sanitizer, numeric coercion,
VPD), CSV source, salted aggregation equivalence."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from diive_ray.functions import scalars as sc


def test_extract_digit():
    f = np.array([812, 70, 5, 999])
    assert (sc.extract_digit(f, 0, 3) == [8, 0, 0, 9]).all()
    assert (sc.extract_digit(f, 1, 3) == [1, 7, 0, 9]).all()
    assert (sc.extract_digit(f, 2, 3) == [2, 0, 5, 9]).all()


def test_eddypro_flags_batch():
    t = pa.table({"flag": pa.array([812, 100], pa.int64())})
    out = sc.eddypro_ssitc_flags(t, "flag", 3)
    assert out["FLAG_D0_TEST"].to_pylist() == [8, 1]
    assert out["FLAG_D2_TEST"].to_pylist() == [2, 0]


def test_sanitize_column_names():
    assert sc.sanitize_column_names(["a", "b", "a", "a", "b"]) == ["a", "b", "a_1", "a_2", "b_1"]


def test_convert_to_numeric():
    t = pa.table({"x": pa.array(["1.5", "nope", "3"]), "y": pa.array([1, 2, 3])})
    out = sc.convert_to_numeric(t)
    assert out["x"].to_pylist() == [1.5, None, 3.0]
    assert out["y"].to_pylist() == [1, 2, 3]


def test_vpd():
    # es(20C) ~ 2.3388 kPa; at RH 50% -> ~1.169 kPa
    vpd = sc.calc_vpd_from_ta_rh(np.array([20.0]), np.array([50.0]))
    assert abs(vpd[0] - 1.1694) < 1e-3
    assert sc.calc_vpd_from_ta_rh(np.array([20.0]), np.array([110.0]))[0] == 0.0


def test_csv_source_roundtrip(ray_session, tmp_path):
    from diive_ray.sources.csvsource import CsvSpec, read_timeseries_csv

    df = pd.DataFrame({
        "TIMESTAMP_END": ["2024-01-01 00:30:00", "2024-01-01 01:00:00", "2024-01-01 01:30:00"],
        "VAL": ["1.5", "-9999", "2.5"],
        "VAL2": [1, 2, 3],
    })
    p = tmp_path / "f.csv"
    df.to_csv(p, index=False)
    spec = CsvSpec(ts_col="ts", rename={"TIMESTAMP_END": "ts"}, numeric_cols=("VAL",))
    got = read_timeseries_csv([str(p)], spec).to_pandas().sort_values("ts").reset_index(drop=True)
    assert pd.api.types.is_datetime64_any_dtype(got["ts"])
    assert got["VAL"].tolist()[0] == 1.5 and pd.isna(got["VAL"].tolist()[1])
    assert len(got) == 3


def test_salted_aggregate_equals_plain(ray_session):
    from diive_ray.stages.exchange import salted_aggregate

    rng = np.random.Generator(np.random.Philox(key=31))
    # skewed: 'hot' holds 80% of rows
    n = 50_000
    keys = np.where(rng.random(n) < 0.8, "hot", rng.choice(["a", "b", "c"], n))
    df = pd.DataFrame({"k": keys, "v": rng.standard_normal(n)})
    ds = rd.from_pandas(df).repartition(8)

    def partial(d, gkeys):
        return d.groupby(gkeys, as_index=False).agg(s=("v", "sum"), n=("v", "count"))

    def combine(d, keys):
        out = d.groupby(keys, as_index=False).agg(s=("s", "sum"), n=("n", "sum"))
        out["mean"] = out["s"] / out["n"]
        return out

    got = salted_aggregate(ds, ["k"], partial, combine, salt=8).to_pandas()
    exp = df.groupby("k", as_index=False).agg(s=("v", "sum"), n=("v", "count"))
    exp["mean"] = exp["s"] / exp["n"]
    got = got.sort_values("k").reset_index(drop=True)
    exp = exp.sort_values("k").reset_index(drop=True)
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()
    np.testing.assert_allclose(got["mean"], exp["mean"], rtol=1e-12)


def test_offset_to_max_interpolation_leg():
    """offsetcorrection.py:130-199 semantics on a group where the middle
    day has NO exceedance: its offset comes from linear interpolation
    between the neighbor days' offsets (positional, matching the
    reference's interpolate-then-broadcast), ends ffill/bfill."""
    from diive_ray.stages.corrections import offset_to_max_frame

    ts = pd.date_range("2024-01-01", periods=6, freq="12h")
    # day1: rh 104/102 -> daily exceedance mean 103, offset 3
    # day2: 90/95 (no exceedance) -> interpolated offset
    # day3: 106/102 -> mean 104, offset 4
    df = pd.DataFrame({"ts": ts, "rh": [104.0, 102.0, 90.0, 95.0, 106.0, 102.0]})
    out = offset_to_max_frame(df, "rh", 100.0)
    # day1 rows: minus offset 3, clamped at 100
    assert out["rh"].tolist()[0] == 100.0 and out["rh"].tolist()[1] == 99.0
    # day2 offsets interpolate positionally between 3 (row1) and 4 (row4):
    # rows 2,3 get 3 + 1/3, 3 + 2/3
    np.testing.assert_allclose(out["rh"].iloc[2], 90.0 - (3 + 1 / 3))
    np.testing.assert_allclose(out["rh"].iloc[3], 95.0 - (3 + 2 / 3))
    # day3: minus 4, clamped
    assert out["rh"].tolist()[4] == 100.0 and out["rh"].tolist()[5] == 98.0


def test_offset_to_max_no_exceedance_noop():
    from diive_ray.stages.corrections import offset_to_max_frame

    ts = pd.date_range("2024-01-01", periods=4, freq="6h")
    df = pd.DataFrame({"ts": ts, "rh": [90.0, 95.0, 80.0, 99.0]})
    out = offset_to_max_frame(df, "rh", 100.0)
    assert out["rh"].tolist() == [90.0, 95.0, 80.0, 99.0]
