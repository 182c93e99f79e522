"""FileSplitter (sources/splitter.py) — split/rotate/trim/write vs
reference semantics (diive/core/io/filesplitter.py:169-240)."""

import glob
import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def _hires(n=2880, freq="1min", seed=7):
    rng = np.random.default_rng(seed)
    ts = pd.date_range("2024-03-01", periods=n, freq=freq).astype("datetime64[us]")
    return pd.DataFrame({
        "ts": ts,
        "u": rng.normal(2.0, 0.5, n),
        "v": rng.normal(0.5, 0.5, n),
        "w": rng.normal(0.0, 0.2, n),
        "c": rng.normal(400.0, 5.0, n),
    })


def test_split_write_roundtrip_and_stats(ray_session, tmp_path):
    from diive_ray.sources.splitter import split_timeseries

    df = _hires()
    out = str(tmp_path / "splits")
    stats = split_timeseries(
        rd.from_pandas(df).repartition(4), outdir=out, ts_col="ts",
        every="6h", rotation=True, c="c",
    )
    # 2 days / 6h = 8 splits, names START-stamped with _ROT suffix
    assert len(stats) == 8
    assert stats["split_name"].tolist() == sorted(stats["split_name"])
    assert stats["split_name"].iloc[0] == "20240301000000_ROT"
    assert stats["n_records"].sum() == len(df)
    assert (stats["wind_rotation"] == 1).all()

    files = sorted(glob.glob(os.path.join(out, "*.parquet")))
    assert len(files) == 8
    back = pd.concat([pd.read_parquet(f) for f in files]).sort_values("ts")
    assert len(back) == len(df)
    # original payload survives byte-exact
    assert np.array_equal(back["u"].to_numpy(), df["u"].to_numpy())
    # per-split Reynolds invariants: mean(w2) == 0 (pitch zeroes it),
    # every *_TURB departure has zero split mean
    lab = back["ts"].dt.floor("6h")
    g = back.groupby(lab)
    for col in ("w2", "u_TURB", "v_TURB", "w_TURB", "c_TURB"):
        assert np.allclose(g[col].mean().to_numpy(), 0.0, atol=1e-9), col
    # yaw rotation: mean(v1)=0 per split => var preserved in (u2,v2,w2)
    raw = g[["u", "v", "w"]].var(ddof=0).sum(axis=1).to_numpy()
    rot = g[["u2", "v2", "w2"]].var(ddof=0).sum(axis=1).to_numpy()
    assert np.allclose(raw, rot, rtol=1e-9)


def test_split_stats_match_pandas_replay(ray_session):
    from diive_ray.sources.splitter import split_timeseries

    df = _hires(n=700, freq="7min", seed=11)  # uneven chunk boundaries
    stats = split_timeseries(
        rd.from_pandas(df).repartition(3), outdir="/tmp/_unused",
        ts_col="ts", every="6h", write_files=False,
    )
    exp = (
        df.groupby(df["ts"].dt.floor("6h"))
        .agg(start=("ts", "min"), end=("ts", "max"), n_records=("ts", "size"))
        .reset_index(drop=True)
    )
    assert stats["n_records"].tolist() == exp["n_records"].tolist()
    assert stats["start"].tolist() == exp["start"].tolist()
    assert stats["end"].tolist() == exp["end"].tolist()
    assert (stats["wind_rotation"] == 0).all()
    assert (stats["n_columns"] == 5).all()


def test_split_trim_and_row_limit(ray_session, tmp_path):
    from diive_ray.sources.splitter import split_timeseries, trim_frame

    df = _hires(n=720, freq="1min")
    # first 30 and last 20 rows of each 6h split have missing c
    lab = df["ts"].dt.floor("6h")
    pos = df.groupby(lab).cumcount()
    size = df.groupby(lab)["c"].transform("size")
    df.loc[(pos < 30) | (pos >= size - 20), "c"] = np.nan

    stats = split_timeseries(
        rd.from_pandas(df).repartition(2), outdir=str(tmp_path), ts_col="ts",
        every="6h", trim_var="c", write_files=False,
    )
    assert (stats["n_records"] == 360 - 50).all()
    assert stats["split_name"].str.endswith("_TRIM").all()
    # trim_frame keeps interior NaNs
    tf = pd.DataFrame({"c": [np.nan, 1.0, np.nan, 2.0, np.nan]})
    assert trim_frame(tf, "c")["c"].tolist()[0] == 1.0 and len(trim_frame(tf, "c")) == 3
    # all-NaN split vanishes entirely
    assert trim_frame(tf.assign(c=np.nan), "c").empty

    limited = split_timeseries(
        rd.from_pandas(df).repartition(2), outdir=str(tmp_path), ts_col="ts",
        every="6h", limit_n_rows=100, write_files=False,
    )
    assert (limited["n_records"] == 100).all()


def test_csv_gz_roundtrip(ray_session, tmp_path):
    """compress_splits=True -> .csv.gz, re-ingested through the
    config-driven CSV reader (reference unzip, files.py:211-254)."""
    from diive_ray.sources.csvsource import CsvSpec, read_timeseries_csv
    from diive_ray.sources.splitter import split_timeseries

    df = _hires(n=360, freq="2min")
    out = str(tmp_path / "gz")
    split_timeseries(
        rd.from_pandas(df).repartition(2), outdir=out, ts_col="ts",
        every="6h", output_format="csv", compress=True,
    )
    files = sorted(glob.glob(os.path.join(out, "*.csv.gz")))
    assert len(files) == 2
    back = (
        read_timeseries_csv(files, CsvSpec(ts_col="ts"))
        .to_pandas().sort_values("ts").reset_index(drop=True)
    )
    assert len(back) == len(df)
    assert back["ts"].astype("datetime64[us]").equals(df["ts"])
    assert np.allclose(back["u"].to_numpy(), df["u"].to_numpy())
