"""Sliding (hopping) time-window aggregates over a keyed event stream.

The reference's rolling statistics (zScoreRolling / LocalSD window
means, diive/preprocessing/outlier_detection/*.py) are count-based
rolling windows over one in-memory series; the engine generalizes to
TIME-based sliding windows over an unbounded keyed stream — the shape a
training-data pipeline needs for rate/recency features at 100 TB.

Design (single exchange, shuffle carries only partials):

1. Per input batch, each row is assigned to every window that covers
   it: windows are END-labeled multiples of ``slide_us`` and the window
   ending at ``e`` covers ``(e - window_us, e]``, so a row at ``ts``
   belongs to the ``window_us / slide_us`` consecutive window ends
   starting at ``ceil(ts / slide_us) * slide_us``. The replication is a
   vectorized repeat/tile, and the batch is immediately pre-aggregated
   to per-(key, window_end) partials (count / sum / min / max + the
   own-slide count), so the exchange moves one small row per window a
   batch touches — NOT one row per event per window.
2. ONE hash exchange on (keys, window_end) + per-block combine of the
   decomposable partials; mean is re-derived (engine-wide tier rule).
3. Windows whose final slide bucket ``(e - slide_us, e]`` holds no data
   (``own_n == 0``) are dropped, which anchors the output to observed
   buckets — the same frame a SQL ``RANGE BETWEEN <window> PRECEDING``
   over the per-slide aggregate series produces, giving an exact
   oracle.

``window_us`` must be an integer multiple of ``slide_us``; the
replication factor k = window/slide is the write amplification — keep
it small (3-24 in practice) and widen ``slide_us`` rather than shipping
hundreds of copies.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
import ray.data as rd

from ..util import ts_to_us
from .exchange import block_map


def _emit_partials(
    df: pd.DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    window_us: int,
    slide_us: int,
) -> pd.DataFrame:
    k = window_us // slide_us
    v = df[value_col].astype(float)
    ok = v.notna().to_numpy()
    df = df[ok]
    v = v[ok]
    if df.empty:
        return pd.DataFrame(
            {
                **{c: pd.Series([], dtype=object) for c in keys},
                "window_end_us": pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64),
                "s": pd.Series([], dtype=np.float64),
                "mn": pd.Series([], dtype=np.float64),
                "mx": pd.Series([], dtype=np.float64),
                "own_n": pd.Series([], dtype=np.int64),
            }
        )
    tsv = ts_to_us(df[ts_col])
    base = ((tsv + slide_us - 1) // slide_us) * slide_us
    n = len(df)
    offs = np.arange(k, dtype=np.int64) * slide_us
    rep = pd.DataFrame(
        {
            **{c: np.repeat(df[c].to_numpy(), k) for c in keys},
            "window_end_us": (base[:, None] + offs[None, :]).ravel(),
            "v": np.repeat(v.to_numpy(), k),
            "own": np.tile(offs == 0, n),
        }
    )
    g = rep.groupby(keys + ["window_end_us"], sort=False)
    out = g.agg(
        n=("v", "size"), s=("v", "sum"), mn=("v", "min"), mx=("v", "max"),
        own_n=("own", "sum"),
    ).reset_index()
    out["n"] = out["n"].astype(np.int64)
    out["own_n"] = out["own_n"].astype(np.int64)
    return out


def sliding_window_agg(
    ds: rd.Dataset,
    *,
    keys: Iterable[str],
    ts_col: str,
    value_col: str,
    window_us: int,
    slide_us: int,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Trailing time-window stats per key: one output row per
    (key, window_end) whose final slide bucket has data, with
    n / sum / min / max / mean over ``(window_end - window_us,
    window_end]``. END-labeled ``window_end`` (timestamp[us])."""
    keys = list(keys)
    if window_us % slide_us != 0:
        raise ValueError("window_us must be a multiple of slide_us")

    partials = ds.map_batches(
        lambda df: _emit_partials(df, keys, ts_col, value_col, window_us, slide_us),
        batch_format="pandas",
    )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys + ["window_end_us"], sort=False)
        out = g.agg(
            n=("n", "sum"), s=("s", "sum"), mn=("mn", "min"), mx=("mx", "max"),
            own_n=("own_n", "sum"),
        ).reset_index()
        out = out[out["own_n"] > 0]
        out["mean"] = out["s"] / out["n"]
        out["window_end"] = pd.to_datetime(
            out["window_end_us"], unit="us"
        ).astype("datetime64[us]")
        out["n"] = out["n"].astype(np.int64)
        return out[keys + ["window_end", "n", "s", "mn", "mx", "mean"]].rename(
            columns={"s": "sum", "mn": "min", "mx": "max"}
        )

    return block_map(
        partials,
        keys + ["window_end_us"],
        combine,
        batch_format="pandas",
        num_partitions=num_partitions,
        zero_copy_batch=False,
    )
