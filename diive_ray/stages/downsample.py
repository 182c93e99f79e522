"""TSDB-native series operators: M4 visualization downsampling and
monotonic-counter rate with reset detection.

Engine additions (north-rule "rollup + downsample" surface; no
reference counterpart — the reference downsamples implicitly through
matplotlib). Both are public, standard semantics:

* **M4** (Jugel et al., VLDB 2014 "M4: A Visualization-Oriented Time
  Series Data Aggregation"): per pixel-column time bucket keep the
  first, last, min and max points — the smallest aggregation that
  renders a pixel-perfect line plot. Pure per-batch partials (each
  batch reduces its buckets to <= 4 candidate rows each) + one tiny
  keyed combine: the exchange carries candidates only, never the
  series.
* **Counter rate** (Prometheus/RRDtool semantics): for a monotonic
  cumulative counter, per-interval rate = increase / dt where a value
  DROP is a counter reset — the post-reset value counts as the
  increase from zero. Pure per-key ordered kernel (one keyed
  exchange), vectorized diff arithmetic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def m4_downsample(
    ds,
    *,
    width_us: int,
    keys: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
):
    """M4 aggregation: per (keys, bucket) the (first, last, min, max)
    VALUES plus their count, END-labeled buckets (point-event floor +
    width, matching the tier convention). Ties on the bucket edge
    resolve by (ts, value) order — deterministic and SQL-replayable
    (min/max by ts with value tiebreak)."""
    from .bucket import bucket_end_us
    from .exchange import block_map

    keys = list(keys)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = pd.to_datetime(df[ts_col]).astype("datetime64[us]") \
            .astype("int64").to_numpy()
        b = bucket_end_us(ts_us, width_us, end_stamped=False)
        g = pd.DataFrame({
            **{k: df[k].to_numpy() for k in keys},
            "bucket_ts": b,
            "_ts": ts_us,
            "v": df[value_col].to_numpy(dtype=np.float64),
        })
        # candidate reduction inside the batch: per bucket keep the rows
        # achieving first/last (by ts, value) and min/max (by value, ts)
        g = g.sort_values(["_ts", "v"], kind="stable")
        gb = g.groupby(keys + ["bucket_ts"], sort=False)
        firsts = gb.head(1)
        lasts = gb.tail(1)
        g2 = g.sort_values(["v", "_ts"], kind="stable")
        gb2 = g2.groupby(keys + ["bucket_ts"], sort=False)
        mins = gb2.head(1)
        maxs = gb2.tail(1)
        cnt = gb.size().rename("n").reset_index()
        cand = pd.concat([firsts, lasts, mins, maxs]).drop_duplicates()
        cand = cand.merge(cnt, on=keys + ["bucket_ts"])
        # the bucket's batch count rides on exactly ONE candidate row
        # (the others carry 0) so the final combine can sum them
        dup = cand.groupby(keys + ["bucket_ts"], sort=False).cumcount() > 0
        cand.loc[dup, "n"] = 0
        return cand

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key_vals, g in df.groupby(keys + ["bucket_ts"], sort=False):
            g1 = g.sort_values(["_ts", "v"], kind="stable")
            g2 = g.sort_values(["v", "_ts"], kind="stable")
            rec = dict(zip(keys + ["bucket_ts"], key_vals if isinstance(key_vals, tuple) else (key_vals,)))
            rec.update({
                "v_first": float(g1["v"].iloc[0]),
                "v_last": float(g1["v"].iloc[-1]),
                "v_min": float(g2["v"].iloc[0]),
                "v_max": float(g2["v"].iloc[-1]),
                "n": int(g["n"].sum()),
            })
            rows.append(rec)
        out = pd.DataFrame(rows)
        out["bucket_ts"] = pd.to_datetime(out["bucket_ts"], unit="us")
        return out

    return block_map(
        ds.map_batches(partial, batch_format="pandas", zero_copy_batch=False),
        keys + ["bucket_ts"], combine,
        batch_format="pandas", zero_copy_batch=False,
    )


def counter_rate(
    ds,
    *,
    keys: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "counter",
    id_col: str | None = None,
):
    """Per-interval rate of a monotonic cumulative counter with reset
    detection: for consecutive samples (t0, c0) -> (t1, c1) of a key,
    increase = c1 - c0 if c1 >= c0 else c1 (reset: count from zero),
    rate = increase / ((t1 - t0) in seconds). One keyed exchange, then
    a vectorized per-key diff. The first sample of each key emits no
    row."""
    from .exchange import grouped_block_map

    keys = list(keys)
    sort_cols = [ts_col] + ([id_col] if id_col else [])

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(sort_cols, kind="stable").reset_index(drop=True)
        if len(df) < 2:
            return pd.DataFrame(columns=keys + ["ts", "increase", "rate", "is_reset"])
        ts_us = pd.to_datetime(df[ts_col]).astype("datetime64[us]") \
            .astype("int64").to_numpy()
        c = df[value_col].to_numpy(dtype=np.float64)
        d = np.diff(c)
        reset = d < 0
        inc = np.where(reset, c[1:], d)
        dt_s = np.diff(ts_us) / 1_000_000.0
        with np.errstate(divide="ignore", invalid="ignore"):
            rate = np.where(dt_s > 0, inc / dt_s, np.nan)
        out = pd.DataFrame({
            **{k: df[k].to_numpy()[1:] for k in keys},
            "ts": df[ts_col].to_numpy()[1:],
            "increase": inc,
            "rate": rate,
            "is_reset": reset.astype(np.int64),
        })
        return out

    return grouped_block_map(ds, keys, kernel)


def lttb_frame(
    x: np.ndarray, y: np.ndarray, n_out: int
) -> np.ndarray:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013)
    over ONE series: first/last points always kept; the interior is
    split into n_out-2 equal-count buckets and each bucket keeps the
    point forming the largest triangle with the PREVIOUSLY SELECTED
    point and the NEXT bucket's centroid. Sequential by construction
    (selection feeds forward), but each step is a vectorized argmax
    over one bucket — O(n) total. Returns selected row indices."""
    n = len(x)
    if n_out >= n or n_out < 3:
        return np.arange(n)
    # bucket boundaries over the interior points 1..n-2 (Steinarsson's
    # even split of n-2 points into n_out-2 buckets)
    bounds = (np.arange(n_out - 1, dtype=np.float64)
              * (n - 2) / (n_out - 2) + 1).astype(np.int64)
    bounds = np.append(bounds, n - 1)
    sel = np.empty(n_out, dtype=np.int64)
    sel[0] = 0
    a = 0
    for i in range(n_out - 2):
        lo, hi = int(bounds[i]), int(bounds[i + 1])           # this bucket
        # next-bucket centroid; for the last interior bucket the next
        # "bucket" is exactly the final point (canonical LTTB)
        nlo = int(bounds[i + 1])
        nhi = n if i == n_out - 3 else int(bounds[i + 2])
        cx, cy = x[nlo:nhi].mean(), y[nlo:nhi].mean()
        ax, ay = x[a], y[a]
        # triangle area * 2 = |(ax-cx)(y-ay) - (ax-x)(cy-ay)|
        area = np.abs((ax - cx) * (y[lo:hi] - ay) - (ax - x[lo:hi]) * (cy - ay))
        a = lo + int(np.argmax(area))
        sel[i + 1] = a
    sel[n_out - 1] = n - 1
    return sel


def lttb_downsample(
    ds,
    *,
    keys: list[str],
    order_by: list[str],
    x_col: str,
    y_col: str,
    n_out: int = 100,
    num_partitions: int | None = None,
):
    """Distributed LTTB: ONE keyed exchange co-locates each series
    (bounded tier output — the same per-series contract as the other
    sequential stages), then the vectorized forward sweep per group.
    The selection recursion cannot split across blocks; for
    pixel-bounded rendering of unbounded series run M4 first (exact
    per-bucket, shuffle-free) and LTTB on its bounded output."""
    from .exchange import grouped_block_map
    from ..util import ts_to_us

    def gfn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_by, kind="stable", ignore_index=True)
        xs = g[x_col]
        x = ts_to_us(xs).astype(np.float64) if str(xs.dtype).startswith("datetime") \
            else xs.to_numpy(dtype=np.float64)
        idx = lttb_frame(x, g[y_col].to_numpy(dtype=np.float64), n_out)
        out = g.iloc[idx].copy()
        out["lttb_rank"] = np.arange(len(idx), dtype=np.int64)
        return out

    return grouped_block_map(ds, keys, gfn, num_partitions=num_partitions)
