"""Whole-dataset profiling — per-column summary table.

Reference: diive/analysis/profile.py (profile_dataframe): one row per
variable with COUNT / MISSING / MISSING_PERC / N_GAPS / N_UNIQUE /
N_ZEROS / CONSTANT / MEAN / SD / MIN / MEDIAN / MAX; N_GAPS counts
maximal runs of consecutive missing values in row order
(profile.py:26-33 — a run start is a NaN whose predecessor is non-NaN,
or a NaN first row).

Distributed plan (each piece streaming, bounded driver memory):
* moments/zeros/min/max — one pass of tiny per-batch partials;
* N_UNIQUE — ONE hash exchange on (variable, value) over melted pairs:
  each distinct value lands in exactly one block, per-block nunique,
  driver sums per variable (exact, no distinct-set materialization);
* MEDIAN — exact distributed selection (stages/stratified.py:
  exact_rank_values, 3 streaming passes per column);
* N_GAPS — one keyed exchange on a coarse time bucket: interior run
  starts counted per bucket, bucket-boundary (last-null, first-null)
  pairs stitched on the driver (one tiny row per bucket).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ..util import ts_to_us
from .exchange import block_map, driver_combine
from .stratified import exact_medians


def _n_gaps_distributed(
    ds: rd.Dataset, columns: list[str], order_cols: list[str], bucket_us: int
) -> dict[str, int]:
    """Exact NaN-run-start counts per column: per-bucket interior counts
    + driver stitching of adjacent-bucket null edges."""

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order_cols, kind="stable")
        rows = []
        for b, g in df.groupby("_gap_bucket", sort=False):
            rec = {"_gap_bucket": b}
            for c in columns:
                isna = g[c].isna().to_numpy()
                starts = isna & ~np.concatenate([[False], isna[:-1]])
                rec[f"{c}__starts"] = int(starts.sum())  # first-row NaN counts
                rec[f"{c}__first_null"] = bool(isna[0]) if len(isna) else False
                rec[f"{c}__last_null"] = bool(isna[-1]) if len(isna) else False
            rows.append(rec)
        return pd.DataFrame(rows)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        us = ts_to_us(df[order_cols[0]])
        return df.assign(_gap_bucket=(us // bucket_us).astype(np.int64))

    parts = (
        block_map(
            ds.map_batches(add_bucket, batch_format="pandas"),
            ["_gap_bucket"],
            per_bucket,
            batch_format="pandas",
            zero_copy_batch=False,
        )
        .to_pandas()
        .sort_values("_gap_bucket")
        .reset_index(drop=True)
    )
    out = {}
    b = parts["_gap_bucket"].to_numpy()
    adjacent = np.concatenate([b[1:] == b[:-1] + 1, [False]])
    for c in columns:
        total = int(parts[f"{c}__starts"].sum())
        # a run spanning buckets d, d+1 was counted as a start in d+1 too
        spans = (
            parts[f"{c}__last_null"].to_numpy()[:-1]
            & parts[f"{c}__first_null"].to_numpy()[1:]
            & adjacent[:-1]
        )
        out[c] = total - int(spans.sum())
    return out


def _n_unique_distributed(ds: rd.Dataset, columns: list[str]) -> dict[str, int]:
    """Exact distinct counts, one exchange on (variable, value)."""

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        frames = [
            pd.DataFrame({"variable": c, "v": df[c].dropna().unique()}) for c in columns
        ]
        return pd.concat(frames, ignore_index=True)

    def per_block(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["variable", "v"]).groupby("variable", as_index=False).agg(
            nu=("v", "size")
        )

    parts = block_map(
        ds.map_batches(melt, batch_format="pandas"),
        ["variable", "v"],
        per_block,
        batch_format="pandas",
        zero_copy_batch=False,
    ).to_pandas()
    agg = parts.groupby("variable")["nu"].sum()
    return {c: int(agg.get(c, 0)) for c in columns}


def profile_columns(
    ds: rd.Dataset,
    columns: list[str],
    *,
    order_cols: list[str],
    id_col: str,
    bucket_us: int = 86_400_000_000,
) -> pd.DataFrame:
    """Per-column profile table (reference PROFILE_COLUMNS order, minus
    DTYPE which is engine-dependent)."""

    def p_moments(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in columns:
            v = df[c].to_numpy(dtype=np.float64)
            ok = np.isfinite(v)
            vv = v[ok]
            rows.append(
                {
                    "variable": c,
                    "total": len(v),
                    "cnt": int(ok.sum()),
                    "s": float(vv.sum()),
                    "s2": float((vv * vv).sum()),
                    "mn": float(vv.min()) if len(vv) else np.inf,
                    "mx": float(vv.max()) if len(vv) else -np.inf,
                    "zeros": int((vv == 0).sum()),
                }
            )
        return pd.DataFrame(rows)

    mom = driver_combine(
        ds,
        p_moments,
        lambda df: df.groupby("variable", as_index=False).agg(
            total=("total", "sum"), cnt=("cnt", "sum"), s=("s", "sum"),
            s2=("s2", "sum"), mn=("mn", "min"), mx=("mx", "max"),
            zeros=("zeros", "sum"),
        ),
        batch_format="pandas",
    ).set_index("variable")

    uniq = _n_unique_distributed(ds, columns)
    gaps = _n_gaps_distributed(ds, columns, order_cols, bucket_us)
    medians = exact_medians(ds, columns, id_col)

    rows = []
    for c in columns:
        m = mom.loc[c]
        n, cnt = int(m["total"]), int(m["cnt"])
        mean = m["s"] / cnt if cnt else np.nan
        var = (m["s2"] - m["s"] * m["s"] / cnt) / (cnt - 1) if cnt > 1 else np.nan
        med = medians[c]
        rows.append(
            {
                "variable": c,
                "count": cnt,
                "missing": n - cnt,
                "missing_perc": 100.0 * (n - cnt) / n if n else np.nan,
                "n_gaps": gaps[c],
                "n_unique": uniq[c],
                "n_zeros": int(m["zeros"]),
                "constant": uniq[c] <= 1,
                "mean": mean,
                "sd": float(np.sqrt(var)) if np.isfinite(var) and var >= 0 else np.nan,
                "min": m["mn"] if cnt else np.nan,
                "median": med,
                "max": m["mx"] if cnt else np.nan,
            }
        )
    return pd.DataFrame(rows)
