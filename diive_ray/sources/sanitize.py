"""Timestamp sanitizer — Ray-Data translation of the reference's
``TimestampSanitizer`` pipeline (diive/core/times/times.py:24-345, steps
listed at times.py:33-43): validate -> sort -> **dedup keep-last**
(times.py:284-286, 1409-1459) -> regularize (gaps become null rows,
times.py:1500-1517; regularization lives in stages/gaps.py).

In a distributed setting "keep last" needs an explicit order: file/row
order is not stable across a shuffle. We therefore define keep-last as
"max over ``order_col``" per (keys, ts); ``order_col`` defaults to
``doc_id``, which in the fixture corpus encodes arrival order (the
later duplicate carries a lexically greater id). Callers with a real
arrival-order column pass it instead.

Physical plan (scale-aware): a cheap vectorized per-batch pre-dedup
(duplicates are overwhelmingly adjacent — same file, same block),
then a hash-shuffle on a **coarse** key (source + 1h time bucket) so the
group count stays bounded (sources x hours, each group a decent-size
frame) and the per-group dedup is one vectorized ``drop_duplicates`` —
never a per-(source,ts) micro-group. Skewed sources are no problem: the
coarse bucket splits a hot source across its time range.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
import ray.data

from ..schema import US_PER_HOUR


def _dedup_batch_pd(df: pd.DataFrame, subset: list[str], order_col: str) -> pd.DataFrame:
    if len(df) == 0:
        return df
    df = df.sort_values(subset + [order_col], kind="stable")
    return df.drop_duplicates(subset=subset, keep="last")


def dedup_keep_last(
    ds: ray.data.Dataset,
    keys: Iterable[str] = ("source",),
    ts_col: str = "ts",
    order_col: str = "doc_id",
    *,
    assume_partitioned: bool = False,
    coarse_us: int = US_PER_HOUR,
    batch_size: int | None = 128 * 1024,
) -> ray.data.Dataset:
    """Exact duplicate-timestamp removal per (keys, ts), keep last
    (times.py:1409-1459; sanitizer step 5 times.py:284-286).

    assume_partitioned=True skips the shuffle and dedups only within
    each batch — correct iff duplicates never straddle a block boundary
    (true when each (source, time-chunk) file is generated with the dup
    adjacent to its original and read whole). Only the shuffle path is
    exact in general.
    """
    keys = list(keys)
    subset = keys + [ts_col]

    def batch_fn(df: pd.DataFrame) -> pd.DataFrame:
        return _dedup_batch_pd(df, subset, order_col)

    pre = ds.map_batches(batch_fn, batch_format="pandas", batch_size=batch_size)
    if assume_partitioned:
        return pre

    def add_coarse(df: pd.DataFrame) -> pd.DataFrame:
        us = df[ts_col].astype("int64").to_numpy()
        df = df.copy()
        df["_coarse"] = us // coarse_us
        return df

    def block_fn(df: pd.DataFrame) -> pd.DataFrame:
        # hash exchange co-located all rows of a (keys, coarse-bucket)
        # group in this block; one vectorized drop_duplicates finishes
        out = _dedup_batch_pd(df, subset, order_col)
        return out.drop(columns=["_coarse"])

    from ..stages.exchange import block_map

    coarse_keys = keys + ["_coarse"]
    # validate=False: the per-batch pre-dedup makes per-label row
    # counts at the exchange batch-boundary-dependent (the split
    # tripwire would false-positive across executions). block_fn
    # re-dedups each whole group, so pre's reduction never affects
    # the result — only the guard is relaxed.
    return block_map(
        pre.map_batches(add_coarse, batch_format="pandas", batch_size=batch_size),
        coarse_keys,
        block_fn,
        batch_format="pandas",
        zero_copy_batch=False,
        validate=False,
    )


def sort_within_groups(ds: ray.data.Dataset, keys: list[str]) -> ray.data.Dataset:
    """Global sort by keys (times.py:641-668 ``sort_timestamp_ascending``).
    Ray's sort is a range-partitioned shuffle; downstream per-partition
    stages then see contiguous, ordered key ranges."""
    return ds.sort(keys)
