"""FLUXNET data-sharing export — the upload format required by the
FLUXNET network (reference diive/io/formats/fluxnet.py:46-260,
FormatEddyProFluxnetFileForUpload):

* wide variable layout with the FLUXNET position suffix ``_1_1_1``,
* missing values encoded as ``-9999``,
* TIMESTAMP_START / TIMESTAMP_END string columns in ``YYYYMMDDhhmm``
  denoting the averaging interval,
* output split into yearly files.

Ray shape: the long (key, bucket, value) tier pivots to wide via ONE
exchange on the bucket stamp (each bucket's rows meet in one block; the
pivot inside a block is a vectorized unstack over the bounded variable
set). The yearly writer fans file writes out of a per-year exchange —
at 10^12 scale each year streams independently; nothing driver-side
ever holds more than the bounded variable list."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import ray.data as rd

MISSING = -9999.0


def fluxnet_wide(
    ds: rd.Dataset,
    *,
    variables: list[str],
    key_col: str = "event_type",
    bucket_col: str = "bucket_ts",
    value_col: str = "mean",
    interval_us: int = 3_600_000_000,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Pivot the long END-labeled tier to the FLUXNET wide layout:
    one row per bucket, one ``VAR_1_1_1`` column per variable (missing
    -> -9999), TIMESTAMP_START/END as YYYYMMDDhhmm strings
    (fluxnet.py's insert-two-timestamps + format steps)."""
    from ..stages.exchange import block_map

    cols = {v: f"{v}_1_1_1" for v in variables}

    def pivot_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"TIMESTAMP_START": pd.Series([], dtype=object),
                 "TIMESTAMP_END": pd.Series([], dtype=object)}
                | {c: pd.Series([], dtype=np.float64) for c in cols.values()})
        # one vectorized unstack for EVERY bucket in the block
        wide = df.pivot_table(index=bucket_col, columns=key_col,
                              values=value_col, aggfunc="first")
        wide = wide.reindex(columns=variables).rename(columns=cols)
        wide = wide.fillna(MISSING)
        end = pd.to_datetime(wide.index)
        start = end - pd.Timedelta(microseconds=interval_us)
        out = pd.DataFrame({
            "TIMESTAMP_START": start.strftime("%Y%m%d%H%M"),
            "TIMESTAMP_END": end.strftime("%Y%m%d%H%M"),
        })
        for c in cols.values():
            out[c] = wide[c].to_numpy(dtype=np.float64)
        return out

    return block_map(ds, [bucket_col], pivot_block, batch_format="pandas",
                     num_partitions=num_partitions, zero_copy_batch=False)


def write_fluxnet_yearly(
    wide: rd.Dataset, outdir: str, *, site: str = "XX-Site"
) -> list[str]:
    """Yearly CSV files named like the reference's upload artifacts
    (``{site}_{year}.csv``): ONE exchange on the year label, each
    year's block sorts and writes its own file (resumable layout — a
    rerun overwrites per-year files independently)."""
    from ..stages.exchange import grouped_block_map

    os.makedirs(outdir, exist_ok=True)

    def add_year(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_year"] = df["TIMESTAMP_END"].str[:4]
        return df

    def write(df: pd.DataFrame) -> pd.DataFrame:
        year = df["_year"].iloc[0]
        path = os.path.join(outdir, f"{site}_{year}.csv")
        df.drop(columns=["_year"]).sort_values("TIMESTAMP_END").to_csv(
            path, index=False)
        return pd.DataFrame([{"year": year, "path": path,
                              "n_rows": np.int64(len(df))}])

    wide2 = wide.map_batches(add_year, batch_format="pandas")
    manifest = grouped_block_map(wide2, ["_year"], write).to_pandas()
    return sorted(manifest["path"].tolist())
