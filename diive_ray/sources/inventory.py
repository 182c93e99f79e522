"""FileDetector — expected-vs-available data-file inventory.

Reference: diive/core/io/filedetector.py:18-153 (FileDetector): parse
the timestamp each file name encodes, build the EXPECTED file grid
(date_range from the first file's timestamp to the last's + one
generation interval, at the file-generation resolution), mark which
expected slots have a file, append files with irregular (off-grid)
start times as "unexpected" rows, then derive per-row expected end
(next row's timestamp), expected duration and expected record count
(duration / data resolution), optionally trimming to the first
``files_how_many`` available files.

Ray shape (the 100-TB story): a cluster-scale file listing parses
per-batch (vectorized strptime partials -> (dt, name, size) rows);
the inventory itself is calendar-bounded — one row per generation
slot plus one per irregular file — so the grid assembly is a bounded
driver combine, the same scope as the engine's other overview frames
(GapStats, splits-overview).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def file_inventory(
    files: rd.Dataset | pd.DataFrame,
    *,
    file_date_format: str = "%Y%m%d%H%M%S",
    file_generation_res: str = "6h",
    data_res: float = 60.0,
    files_how_many: int | None = None,
    name_col: str = "filename",
    size_col: str | None = None,
) -> pd.DataFrame:
    """Inventory frame over a listing of data-file names.

    Returns one row per expected generation slot (plus one per
    off-grid file), sorted by ``file_dt``:

    * ``file_dt`` — the slot / file timestamp,
    * ``expected_file`` — the slot timestamp for on-grid rows, NaT for
      unexpected (irregular) files (filedetector.py:113-114),
    * ``file_available`` — 1 if a file with that exact timestamp
      exists, else 0 (missing expected file),
    * ``filename`` — the file's name (None when missing),
    * ``expected_end`` — the NEXT row's timestamp (NaT on the last
      row; filedetector.py:144-146),
    * ``expected_duration`` — seconds from an AVAILABLE file's start
      to its expected end (NaN when the file is missing, matching the
      reference where 'start' is only set for available files),
    * ``expected_records`` — expected_duration / ``data_res``.
    """
    if isinstance(files, rd.Dataset):
        def parse(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({
                "dt": pd.to_datetime(df[name_col], format=file_date_format),
                "filename": df[name_col],
            })
            out["filesize"] = (
                df[size_col].astype("int64") if size_col else np.int64(0)
            )
            return out

        listing = files.map_batches(parse, batch_format="pandas").to_pandas()
    else:
        listing = pd.DataFrame({
            "dt": pd.to_datetime(files[name_col], format=file_date_format),
            "filename": files[name_col],
            "filesize": files[size_col].astype("int64") if size_col else 0,
        })
    if listing.empty:
        raise ValueError("file listing must not be empty")
    listing = listing.sort_values("dt", kind="stable").reset_index(drop=True)

    res = pd.Timedelta(file_generation_res)
    first, last = listing["dt"].iloc[0], listing["dt"].iloc[-1]
    grid = pd.date_range(first, last + res, freq=res)

    inv = pd.DataFrame({
        "file_dt": grid.astype("datetime64[us]"),
        "expected_file": grid.astype("datetime64[us]"),
    })
    on_grid = listing[listing["dt"].isin(set(grid))]
    off_grid = listing[~listing["dt"].isin(set(grid))]
    inv = inv.merge(
        on_grid.rename(columns={"dt": "file_dt"}), on="file_dt", how="left"
    )
    if len(off_grid):
        extra = pd.DataFrame({
            "file_dt": off_grid["dt"].to_numpy().astype("datetime64[us]"),
            "expected_file": pd.NaT,
            "filename": off_grid["filename"].to_numpy(),
            "filesize": off_grid["filesize"].to_numpy(),
        })
        inv = pd.concat([inv, extra], ignore_index=True)
    inv = inv.sort_values("file_dt", kind="stable").reset_index(drop=True)
    inv["file_available"] = inv["filename"].notna().astype(np.int64)

    inv["filename"] = inv["filename"].astype(object).where(inv["filename"].notna(), None)
    inv["expected_end"] = inv["file_dt"].shift(-1)
    dur = (inv["expected_end"] - inv["file_dt"]).dt.total_seconds()
    dur = dur.mask(inv["file_available"] == 0)  # no 'start' for missing files
    inv["expected_duration"] = dur
    inv["expected_records"] = dur / float(data_res)

    if files_how_many:
        cum = inv["file_available"].cumsum()
        stop = np.flatnonzero(cum.to_numpy() >= files_how_many)
        if len(stop):
            inv = inv.iloc[: stop[0] + 1]

    if not (isinstance(files, rd.Dataset) and size_col) and "filesize" in inv:
        if size_col is None:
            inv = inv.drop(columns=["filesize"])
    return inv.reset_index(drop=True)
