"""FLUXNET export (sources/fluxnet.py): wide pivot semantics
(reference io/formats/fluxnet.py steps — _1_1_1 suffix, -9999 missing,
YYYYMMDDhhmm START/END interval stamps) and the yearly file writer
round trip."""

import glob
import os

import numpy as np
import pandas as pd
import ray.data as rd

from diive_ray.sources.fluxnet import fluxnet_wide, write_fluxnet_yearly


def _tier_frame() -> pd.DataFrame:
    buckets = pd.date_range("2023-12-30 01:00", periods=100, freq="h")
    rows = []
    for i, b in enumerate(buckets):
        rows.append({"event_type": "TA", "bucket_ts": b, "mean": 10.0 + i})
        if i % 3 != 0:  # SW has gaps -> -9999 cells
            rows.append({"event_type": "SW_IN", "bucket_ts": b, "mean": 400.0 - i})
    return pd.DataFrame(rows)


def test_wide_layout_and_missing_encoding(ray_session):
    df = _tier_frame()
    wide = (
        fluxnet_wide(rd.from_pandas(df).repartition(6),
                     variables=["TA", "SW_IN", "ABSENT"])
        .to_pandas().sort_values("TIMESTAMP_END").reset_index(drop=True)
    )
    assert list(wide.columns) == [
        "TIMESTAMP_START", "TIMESTAMP_END",
        "TA_1_1_1", "SW_IN_1_1_1", "ABSENT_1_1_1"]
    assert len(wide) == 100
    # END - START = 1h, formatted YYYYMMDDhhmm
    assert wide.loc[0, "TIMESTAMP_START"] == "202312300000"
    assert wide.loc[0, "TIMESTAMP_END"] == "202312300100"
    # never-present variable all -9999; gapped variable partly
    assert (wide["ABSENT_1_1_1"] == -9999.0).all()
    n_missing = (wide["SW_IN_1_1_1"] == -9999.0).sum()
    assert n_missing == sum(1 for i in range(100) if i % 3 == 0)
    assert (wide["TA_1_1_1"] == 10.0 + np.arange(100)).all()


def test_yearly_writer_roundtrip(ray_session, tmp_path):
    df = _tier_frame()  # spans 2023-12-30 .. 2024-01-03 -> two files
    wide = fluxnet_wide(rd.from_pandas(df).repartition(4),
                        variables=["TA", "SW_IN"])
    paths = write_fluxnet_yearly(wide, str(tmp_path), site="CH-Tst")
    assert [os.path.basename(p) for p in paths] == [
        "CH-Tst_2023.csv", "CH-Tst_2024.csv"]
    back = pd.concat([pd.read_csv(p, dtype={"TIMESTAMP_START": str,
                                            "TIMESTAMP_END": str})
                      for p in paths], ignore_index=True)
    assert len(back) == 100
    want = (fluxnet_wide(rd.from_pandas(df).repartition(1),
                         variables=["TA", "SW_IN"])
            .to_pandas().sort_values("TIMESTAMP_END").reset_index(drop=True))
    back = back.sort_values("TIMESTAMP_END").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, want)
    assert glob.glob(str(tmp_path / "*.csv")) != []
