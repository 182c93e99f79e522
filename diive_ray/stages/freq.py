"""Timestamp-frequency detection — the reference's ``DetectFrequency``
3-method voter (diive/core/times/times.py:348-482) distributed:

* full-set inference -> here: exact delta histogram over ALL rows
  (per-batch vectorized np.unique partials, summed on the driver —
  equivalent information, no materialized index),
* timedelta-mode with >=90 % agreement (times.py:414-444),
* progressive chunks (times.py:445-469) -> here: per-batch modes and
  their agreement rate.

Confidence mirrors the reference ladder: 1.0 when all methods agree,
0.95 when the mode carries >=90 % of deltas, 0.7 when a plurality mode
exists, else None (times.py:414-469).

Also ``detect_freq_groups`` (times.py:515-640): per-record resolution
groups — a record's frequency is unambiguous iff |delta_prev| ==
|delta_next|.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
import ray.data

from ..util import ts_to_us


def detect_frequency(
    ds: ray.data.Dataset,
    *,
    keys: Iterable[str] = ("source",),
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Per-key (freq_us, confidence, agreement) via delta histograms.
    Batch-local deltas miss one delta per block boundary — at >=90 %
    agreement thresholds that is noise (documented approximation; the
    reference's own chunked method, times.py:445-469, accepts the
    same)."""
    keys = list(keys)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for kv, g in df.groupby(keys, sort=False):
            us = np.sort(ts_to_us(g[ts_col]))
            if len(us) < 2:
                continue
            deltas = np.diff(us)
            deltas = deltas[deltas > 0]
            if len(deltas) == 0:
                continue
            vals, counts = np.unique(deltas, return_counts=True)
            kd = kv if isinstance(kv, tuple) else (kv,)
            for v, c in zip(vals, counts):
                rows.append((*kd, int(v), int(c)))
        return pd.DataFrame(rows, columns=keys + ["delta_us", "n"])

    from .exchange import driver_combine

    hist = driver_combine(
        ds, partial,
        lambda df: df.groupby(keys + ["delta_us"], as_index=False)["n"].sum(),
        batch_format="pandas",
    )
    out = []
    for kv, g in hist.groupby(keys):
        total = g["n"].sum()
        top = g.sort_values(["n", "delta_us"], ascending=[False, True]).iloc[0]
        agreement = top["n"] / total
        if agreement == 1.0:
            conf = 1.0
        elif agreement >= 0.9:
            conf = 0.95
        elif agreement > 0.5:
            conf = 0.7
        else:
            conf = np.nan
        kd = kv if isinstance(kv, tuple) else (kv,)
        out.append((*kd, int(top["delta_us"]), round(float(agreement), 6), conf))
    return pd.DataFrame(out, columns=keys + ["freq_us", "agreement", "confidence"])


def detect_frequency_exact(
    ds: ray.data.Dataset,
    *,
    keys: Iterable[str] = ("source",),
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Exact variant: each key's whole series is co-located (hash
    exchange), so every delta is counted — bit-equal to a global
    ordered scan (the SQL oracle). Use ``detect_frequency`` (partial
    histograms, no co-location) when keys don't fit one task."""
    keys = list(keys)

    def gfn(df: pd.DataFrame) -> pd.DataFrame:
        us = np.sort(ts_to_us(df[ts_col]))
        row = {k: df[k].iloc[0] for k in keys}
        deltas = np.diff(us)
        deltas = deltas[deltas > 0]
        if len(deltas) == 0:
            return pd.DataFrame([{**row, "freq_us": -1, "agreement": np.nan, "confidence": np.nan}])
        vals, counts = np.unique(deltas, return_counts=True)
        top_i = np.lexsort((vals, -counts))[0]
        agreement = counts[top_i] / counts.sum()
        if agreement == 1.0:
            conf = 1.0
        elif agreement >= 0.9:
            conf = 0.95
        elif agreement > 0.5:
            conf = 0.7
        else:
            conf = np.nan
        return pd.DataFrame([{
            **row, "freq_us": int(vals[top_i]),
            "agreement": round(float(agreement), 6), "confidence": conf,
        }])

    from .exchange import grouped_block_map

    return grouped_block_map(ds, keys, gfn).to_pandas().reset_index(drop=True)


def freq_groups_frame(df: pd.DataFrame, ts_col: str = "ts") -> pd.DataFrame:
    """Per-record frequency groups, full reference semantics
    (times.py:515-640 detect_freq_groups): a record's resolution is
    CERTAIN iff its deltas to the previous and next record cancel
    (DELTA_PREV + DELTA_NEXT == 0); certain records carry that delta in
    seconds as ``freq_auto_sec``. Each delta group then claims its
    boundary records — the timestamp before its first and after its
    last certain record — with groups applied in (count DESC, delta
    ASC) order so on collisions the later (rarer) group wins, which is
    the reference's descending-value_counts loop made deterministic
    under count ties. Ambiguous records (transition periods, series
    edges) stay at the -1.0 sentinel. The reference may also ENLARGE
    the index when a boundary stamp is absent from it; here only
    existing records are labeled (an index-extension artifact a
    row-preserving engine cannot emit — documented deviation)."""
    df = df.sort_values(ts_col, kind="stable")
    us = ts_to_us(df[ts_col])
    n = len(us)
    out = df.copy()
    if n == 0:
        out["freq_auto_sec"] = np.array([], dtype=np.float64)
        return out
    sec = us.astype(np.float64) / 1e6
    d_prev = np.full(n, np.nan)
    d_next = np.full(n, np.nan)
    d_prev[1:] = sec[:-1] - sec[1:]        # negative, reference orientation
    d_next[:-1] = sec[1:] - sec[:-1]
    certain = (d_prev + d_next) == 0       # NaN edges compare False
    label = np.full(n, np.nan)
    label[certain] = d_next[certain]

    deltas, counts = np.unique(d_next[certain], return_counts=True)
    order = np.lexsort((deltas, -counts))  # count desc, delta asc
    for i in order:
        d = deltas[i]
        rows = certain & (d_next == d)
        first_date = (sec[rows] + d_prev[rows]).min()   # prev of first
        last_date = (sec[rows] + d_next[rows]).max()    # next of last
        label[(sec == first_date) | (sec == last_date)] = d
    out["freq_auto_sec"] = np.where(np.isnan(label), -1.0, label)
    return out


def detect_freq_groups(
    ds: ray.data.Dataset,
    keys: list[str],
    *,
    ts_col: str = "ts",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Distributed per-key freq_groups_frame: ONE exchange on the keys,
    the delta logic runs vectorized inside each group's block."""
    from .exchange import grouped_block_map

    return grouped_block_map(
        ds, keys, lambda g: freq_groups_frame(g, ts_col=ts_col),
        num_partitions=num_partitions)
