"""FileSplitter — split a large high-res stream into time-based chunk
files, optional 2-D wind rotation with Reynolds turbulent departures.

Reference: diive/core/io/filesplitter.py:19-572 (FileSplitter /
FileSplitterMulti): group by pd.Grouper(freq=data_split_duration),
per split optionally rotate (WindDoubleRotation) and append *_TURB
Reynolds departures (x - split mean), optionally trim leading/trailing
rows where a variable is missing, then write each split as its own
csv / csv.gz / parquet file named from the split's FIRST record
timestamp (%Y%m%d%H%M%S), and return a splits-overview stats frame
(filesplitter.py:169-240).

Ray shape (the 100-TB story): ONE hash exchange on the split label
co-locates each chunk, rotation/departures are vectorized across the
whole block with groupby transforms (no per-group math loop), and the
per-split file writes fan out inside the blocks — the cluster writes
thousands of chunk files concurrently, one per split, which is exactly
the resumable partitioned layout the rest of the engine consumes
(a failed run reruns only the splits whose files are missing). Only
the tiny stats rows return to the driver.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import ray.data as rd

from ..util import ts_to_us


def trim_frame(df: pd.DataFrame, var: str) -> pd.DataFrame:
    """Drop rows before the first and after the last non-missing value
    of ``var`` (filesplitter split_trim / core.times.trim_frame)."""
    ok = df[var].notna().to_numpy()
    if not ok.any():
        return df.iloc[0:0]
    idx = np.flatnonzero(ok)
    return df.iloc[idx[0]: idx[-1] + 1]


def _rotate_block(
    df: pd.DataFrame, label: np.ndarray, u: str, v: str, w: str, c: str | None
) -> pd.DataFrame:
    """Double rotation + Reynolds departures for EVERY split in the
    block in one vectorized pass: angles from split means
    (windrotation.py semantics, see stages/wind.py), departures
    x2 - mean(x2) per split; appends {u,v,w}_TURB (+ c_TURB)."""
    g = df.groupby(label, sort=False)
    um = g[u].transform("mean").to_numpy()
    vm = g[v].transform("mean").to_numpy()
    wm = g[w].transform("mean").to_numpy()
    theta = np.arctan2(vm, um)
    ct, st = np.cos(theta), np.sin(theta)
    u1m = um * ct + vm * st
    phi = np.arctan2(wm, u1m)
    cp, sp = np.cos(phi), np.sin(phi)
    u1 = df[u].to_numpy() * ct + df[v].to_numpy() * st
    v1 = -df[u].to_numpy() * st + df[v].to_numpy() * ct
    w1 = df[w].to_numpy()
    out = df.copy()
    out["u2"] = u1 * cp + w1 * sp
    out["v2"] = v1
    out["w2"] = -u1 * sp + w1 * cp
    g2 = out.groupby(label, sort=False)
    for col, src in ((f"{u}_TURB", "u2"), (f"{v}_TURB", "v2"), (f"{w}_TURB", "w2")):
        out[col] = out[src] - g2[src].transform("mean")
    if c is not None:
        out[f"{c}_TURB"] = out[c] - g2[c].transform("mean")
    return out


def split_timeseries(
    ds: rd.Dataset,
    *,
    outdir: str,
    ts_col: str = "ts",
    every: str = "30min",
    output_format: str = "parquet",
    compress: bool = False,
    rotation: bool = False,
    u: str = "u",
    v: str = "v",
    w: str = "w",
    c: str | None = None,
    trim_var: str | None = None,
    prefix: str = "",
    suffix: str = "",
    limit_n_rows: int | None = None,
    write_files: bool = True,
    num_partitions: int | None = None,
) -> pd.DataFrame:
    """Split ``ds`` into ``every``-sized time chunks, write one file
    per chunk under ``outdir`` and return the splits-overview frame
    (split_name, start, end, n_records, n_columns, wind_rotation)
    sorted by split_name — the reference's splitstats_df
    (filesplitter.py:230-240) minus driver-local paths.

    ``write_files=False`` computes stats without touching disk (used
    by the SQL-oracle registry query; the write path is round-trip
    tested in pytest)."""
    from ..stages.exchange import block_map

    width_us = int(pd.Timedelta(every).value // 1000)
    sfx = suffix + ("_ROT" if rotation else "") + ("_TRIM" if trim_var else "")
    if write_files:
        os.makedirs(outdir, exist_ok=True)

    def add_label(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__split_us"] = ((ts_to_us(df[ts_col]) // width_us) * width_us).astype(np.int64)
        return df

    def per_block(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "split_name": pd.Series([], dtype=object),
            "start": pd.Series([], dtype="datetime64[us]"),
            "end": pd.Series([], dtype="datetime64[us]"),
            "n_records": pd.Series([], dtype=np.int64),
            "n_columns": pd.Series([], dtype=np.int64),
            "wind_rotation": pd.Series([], dtype=np.int64),
        })
        if df.empty:
            return empty
        df = df.sort_values(ts_col, kind="stable")
        label = df.pop("__split_us").to_numpy()  # START-floor split key
        if rotation:
            df = _rotate_block(df, label, u, v, w, c)
        rows = []
        for _, sdf in df.groupby(label, sort=True):
            if trim_var is not None:
                sdf = trim_frame(sdf, trim_var)
                if sdf.empty:
                    continue
            if limit_n_rows:
                sdf = sdf.iloc[0:limit_n_rows]
            start = sdf[ts_col].iloc[0]
            name = f"{prefix}{start.strftime('%Y%m%d%H%M%S')}{sfx}"
            if write_files:
                if output_format == "csv":
                    ext = ".csv.gz" if compress else ".csv"
                    sdf.to_csv(
                        os.path.join(outdir, name + ext),
                        index=False, compression="gzip" if compress else None,
                    )
                elif output_format == "parquet":
                    sdf.to_parquet(os.path.join(outdir, name + ".parquet"), index=False)
                else:
                    raise ValueError(f"unknown output_format {output_format!r}")
            rows.append((name, start, sdf[ts_col].iloc[-1], len(sdf), sdf.shape[1], int(rotation)))
        if not rows:
            return empty
        out = pd.DataFrame(rows, columns=[
            "split_name", "start", "end", "n_records", "n_columns", "wind_rotation"])
        out["start"] = out["start"].astype("datetime64[us]")
        out["end"] = out["end"].astype("datetime64[us]")
        for cn in ("n_records", "n_columns", "wind_rotation"):
            out[cn] = out[cn].astype(np.int64)
        return out

    labeled = ds.map_batches(add_label, batch_format="pandas")
    stats = block_map(
        labeled, ["__split_us"], per_block, batch_format="pandas",
        num_partitions=num_partitions, zero_copy_batch=False,
    ).to_pandas()
    return stats.sort_values("split_name").reset_index(drop=True)
