"""Time-bucket assignment — the engine-wide timestamp convention.

Reference semantics (diive/core/times/resampling.py:94-197):
input timestamps mark the END of each record's interval
(TIMESTAMP_END, diive/core/times/times.py:1647-1651); resampling first
converts END -> MIDDLE so bucket boundaries align with calendar periods
(resampling.py:100-104,156-157), aggregates with ``label='right',
closed='left'`` (resampling.py:174), and labels output buckets with the
right/END edge (resampling.py:179-181).

For END-stamped records with data interval shorter than the bucket, the
shift-then-floor composition reduces to a pure **ceiling** on the END
stamp: every stamp in ``(start, end]`` belongs to the bucket labeled
``end``. The ceiling composes across tiers (ceil_W2 . ceil_W1 = ceil_W2
when W2 is a multiple of W1), which is what makes the raw->1m->1h->1d
cascade re-aggregation exactly equal to direct aggregation.

For plain point events (no interval semantics) we use the raw pandas
convention ``closed='left', label='right'``: stamps in ``[start, end)``
labeled ``end``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def bucket_end_us(ts_us: np.ndarray, width_us: int, *, end_stamped: bool = True) -> np.ndarray:
    """END-labeled bucket timestamp (microseconds) for each input stamp.

    end_stamped=True : stamps in (start, end] -> end   (ceiling)
    end_stamped=False: stamps in [start, end) -> end   (floor + width)
    """
    if end_stamped:
        return ((ts_us - 1) // width_us + 1) * width_us
    return (ts_us // width_us) * width_us + width_us


def assign_bucket(
    batch: pa.Table,
    width_us: int,
    *,
    ts_col: str = "ts",
    out_col: str = "bucket_ts",
    end_stamped: bool = True,
) -> pa.Table:
    """Append an END-labeled bucket timestamp column (zero-copy int64 view
    of the timestamp column; vectorized numpy arithmetic)."""
    ts = batch[ts_col]
    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    if pa.types.is_timestamp(ts.type) and ts.type.unit != "us":
        # upstream aggregates may hand back second-resolution timestamps
        ts = ts.cast(pa.timestamp("us"))
    ts_us = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
    bucket = bucket_end_us(ts_us, width_us, end_stamped=end_stamped)
    arr = pa.array(bucket).cast(pa.timestamp("us"))
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    return batch.append_column(out_col, arr)


def make_bucket_assigner(width_us: int, **kw):
    """A map_batches-ready stateless fn."""

    def fn(batch: pa.Table) -> pa.Table:
        return assign_bucket(batch, width_us, **kw)

    return fn
