"""file_inventory pins (reference filedetector.py semantics): expected
grid construction, missing + unexpected rows, expected duration /
records, files_how_many trim, Dataset-input parse path."""

import numpy as np
import pandas as pd


def _names(dts):
    return pd.DataFrame({"filename": [d.strftime("%Y%m%d%H%M%S") for d in dts]})


def test_grid_missing_and_unexpected():
    from diive_ray.sources.inventory import file_inventory

    base = pd.Timestamp("2024-03-01 00:00")
    h6 = pd.Timedelta("6h")
    # slots 0,1,3 on-grid (slot 2 missing), plus one off-grid file
    dts = [base, base + h6, base + 3 * h6, base + 2 * h6 + pd.Timedelta("1h")]
    inv = file_inventory(_names(dts), file_generation_res="6h", data_res=60.0)

    # grid = 5 slots (0..4 incl. last+res) + 1 unexpected row
    assert len(inv) == 6
    assert inv["file_available"].tolist() == [1, 1, 0, 1, 1, 0]
    # unexpected row: expected_file is NaT, filename present
    unexp = inv[inv["expected_file"].isna()]
    assert len(unexp) == 1 and unexp["filename"].iloc[0] == dts[3].strftime("%Y%m%d%H%M%S")
    # missing expected slot: filename None, duration NaN
    miss = inv[(inv["file_available"] == 0) & inv["expected_file"].notna()]
    assert miss["filename"].iloc[0] is None
    assert np.isnan(miss["expected_duration"].iloc[0])


def test_expected_end_duration_records():
    from diive_ray.sources.inventory import file_inventory

    base = pd.Timestamp("2024-03-01 00:00")
    h6 = pd.Timedelta("6h")
    dts = [base, base + h6, base + 2 * h6]
    inv = file_inventory(_names(dts), file_generation_res="6h", data_res=0.05)
    # every row's expected_end is the next row's file_dt
    assert (inv["expected_end"].iloc[:-1].to_numpy()
            == inv["file_dt"].iloc[1:].to_numpy()).all()
    assert pd.isna(inv["expected_end"].iloc[-1])          # last grid slot
    # 6h at 20 Hz = 432000 expected records
    assert inv["expected_records"].iloc[0] == 21600 / 0.05


def test_files_how_many_trims_at_nth_available():
    from diive_ray.sources.inventory import file_inventory

    base = pd.Timestamp("2024-03-01 00:00")
    h6 = pd.Timedelta("6h")
    dts = [base + k * h6 for k in (0, 2, 3, 4)]          # slot 1 missing
    inv = file_inventory(_names(dts), file_generation_res="6h", files_how_many=2)
    # rows up to and including the 2nd available file (slots 0,1,2)
    assert len(inv) == 3 and int(inv["file_available"].sum()) == 2


def test_dataset_input_with_sizes():
    import ray.data as rd
    from diive_ray.sources.inventory import file_inventory

    base = pd.Timestamp("2024-03-01 00:00")
    df = _names([base, base + pd.Timedelta("6h")])
    df["bytes"] = [100, 200]
    inv = file_inventory(
        rd.from_pandas(df).repartition(2), file_generation_res="6h",
        size_col="bytes",
    )
    got = inv[inv["file_available"] == 1]["filesize"].astype(int).tolist()
    assert got == [100, 200]
