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
    """Per-record frequency group (times.py:515-640): resolution =
    |delta_prev| when |delta_prev| == |delta_next| else ambiguous (-1)."""
    us = ts_to_us(df[ts_col])
    d_prev = np.diff(us, prepend=us[0])
    d_next = np.diff(us, append=us[-1])
    d_prev[0] = d_next[0]
    d_next[-1] = d_prev[-1]
    res = np.where(np.abs(d_prev) == np.abs(d_next), np.abs(d_prev), -1)
    out = df.copy()
    out["FREQ_GROUP_US"] = res
    return out
