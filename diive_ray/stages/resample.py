"""Tiered rollup (downsample) aggregation — the heart of the cascade.

Semantics mirror the reference's resampling family:

* ``resample_series_to_30MIN`` (diive/core/times/resampling.py:94-197):
  END-labeled buckets, per-bucket count always computed, bucket kept only
  if ``count >= mincounts`` where ``mincounts = int(maxcount *
  mincounts_perc)`` with the floor rule ``mincounts = 1 if mincounts < 3``
  (resampling.py:161-171).
* ``resample_to_daily_agg`` (resampling.py:47-90): maxcount = the
  fullest bucket's observed count; ``mincounts = max(1, int(maxcount *
  mincounts_perc))``.

Physical plan (Ray-Data-first, designed for the 100-TB case):

1. ``map_batches`` assigns bucket ids and computes **partial aggregates
   per (keys, bucket) within each Arrow batch** (pa.Table.group_by —
   vectorized, zero-copy in). This collapses raw rows (e.g. 60x for
   1-second data into 1-minute buckets) *before* any data moves.
2. One ``groupby(keys + bucket).aggregate(Sum, Sum, Min, Max)`` over the
   much smaller partials — the only all-to-all exchange. Because higher
   tiers' bucket ids are functions of lower tiers' (ceiling composes),
   every later tier re-aggregates the previous tier's *output* (1440
   rows/source/day at 1m) — re-shuffles touch trivially small data.
3. A final stateless ``map_batches`` derives mean = sum/count and applies
   the min-count mask.

Sum/count/min/max are decomposable; mean is always re-derived from
sum/count so cascading loses nothing (FIXTURES.md F3 tier conservation).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .bucket import assign_bucket


def _partial_rollup_fn(
    width_us: int,
    value_col: str,
    keys: tuple[str, ...],
    ts_col: str,
    end_stamped: bool,
    count_col: str | None,
    sum_col: str | None,
    min_col: str | None,
    max_col: str | None,
):
    """Build the per-batch partial aggregator.

    When ``count_col``/... are given, the batch is already a partial
    rollup (a finer tier) and we combine its partials; otherwise the batch
    is raw rows and we aggregate ``value_col`` directly.
    """

    empty = pa.table(
        {
            **{k: pa.array([], type=pa.string()) for k in keys},
            "bucket_ts": pa.array([], type=pa.timestamp("us")),
            "count": pa.array([], type=pa.int64()),
            "sum": pa.array([], type=pa.float64()),
            "min": pa.array([], type=pa.float64()),
            "max": pa.array([], type=pa.float64()),
            **({"n_child": pa.array([], type=pa.int64())} if count_col else {}),
        }
    )

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        batch = assign_bucket(batch, width_us, ts_col=ts_col, end_stamped=end_stamped)
        gkeys = list(keys) + ["bucket_ts"]
        if count_col is None:
            # raw rows -> first-level partials; null values contribute
            # nothing (pandas .count()/.sum() skipna semantics,
            # resampling.py:176-177)
            sub = batch.select(gkeys + [value_col])
            agg = sub.group_by(gkeys).aggregate(
                [(value_col, "count"), (value_col, "sum"), (value_col, "min"), (value_col, "max")]
            )
            names = {
                "count": f"{value_col}_count",
                "sum": f"{value_col}_sum",
                "min": f"{value_col}_min",
                "max": f"{value_col}_max",
            }
        else:
            # cascaded tier: combine the previous tier's decomposable
            # partials; n_child counts contributing child buckets (the
            # row count the reference's resample-of-resample would see,
            # resampling.py:79-87)
            sub = batch.select(gkeys + [count_col, sum_col, min_col, max_col])
            agg = sub.group_by(gkeys).aggregate(
                [
                    (count_col, "sum"),
                    (sum_col, "sum"),
                    (min_col, "min"),
                    (max_col, "max"),
                    (count_col, "count"),
                ]
            )
            names = {
                "count": f"{count_col}_sum",
                "sum": f"{sum_col}_sum",
                "min": f"{min_col}_min",
                "max": f"{max_col}_max",
                "n_child": f"{count_col}_count",
            }
        cols = {k: agg[k] for k in gkeys}
        cols["count"] = agg[names["count"]].cast(pa.int64())
        cols["sum"] = agg[names["sum"]].cast(pa.float64())
        cols["min"] = agg[names["min"]].cast(pa.float64())
        cols["max"] = agg[names["max"]].cast(pa.float64())
        if count_col is not None:
            cols["n_child"] = agg[names["n_child"]].cast(pa.int64())
        return pa.table(cols)

    return fn


def finalize_rollup(
    batch: pa.Table,
    *,
    mincounts: int = 1,
    with_mean: bool = True,
) -> pa.Table:
    """Derive mean = sum/count and drop buckets with count < mincounts
    (reference keeps aggregates only where count >= mincounts,
    resampling.py:183-185)."""
    # count==0 buckets (all-null values) are always dropped, like pandas'
    # post-resample count>=mincounts filter with mincounts>=1.
    batch = batch.filter(pc.greater_equal(batch["count"], pa.scalar(max(1, mincounts))))
    if with_mean:
        mean = pc.divide(batch["sum"].cast(pa.float64()), batch["count"].cast(pa.float64()))
        if "mean" in batch.column_names:
            batch = batch.drop_columns(["mean"])
        batch = batch.append_column("mean", mean)
    return batch


def mincounts_30min_rule(maxcount: int, mincounts_perc: float) -> int:
    """resampling.py:167-171: int(maxcount*perc), then 1 if < 3."""
    m = int(maxcount * mincounts_perc)
    return 1 if m < 3 else m


def mincounts_daily_rule(maxcount: int, mincounts_perc: float) -> int:
    """resampling.py:86: max(1, int(maxcount*perc))."""
    return max(1, int(maxcount * mincounts_perc)) if maxcount else 1


def rollup(
    ds: ray.data.Dataset,
    width_us: int,
    *,
    value_col: str = "n_tok",
    keys: Iterable[str] = ("source",),
    ts_col: str = "ts",
    end_stamped: bool = True,
    from_rollup: bool = False,
    mincounts: int = 1,
    batch_size: int | None = 64 * 1024,
) -> ray.data.Dataset:
    """One rollup tier: Dataset of rows -> Dataset with ROLLUP_SCHEMA.

    ``from_rollup=True`` consumes a previous tier's output (combines its
    count/sum/min/max partials) — the resample-of-resample pattern of
    resampling.py:47-90. The output's ``bucket_ts`` is END-labeled.
    """
    keys = tuple(keys)
    partial = _partial_rollup_fn(
        width_us,
        value_col,
        keys,
        ts_col if not from_rollup else "bucket_ts",
        end_stamped,
        "count" if from_rollup else None,
        "sum" if from_rollup else None,
        "min" if from_rollup else None,
        "max" if from_rollup else None,
    )
    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    gkeys = list(keys) + ["bucket_ts"]

    def combine(block: pa.Table) -> pa.Table:
        # all partials of a key are co-located in this block (hash
        # exchange); one vectorized pyarrow group_by finishes them
        if block.num_rows == 0:
            return finalize_rollup(block, mincounts=mincounts)
        spec = [("count", "sum"), ("sum", "sum"), ("min", "min"), ("max", "max")]
        if from_rollup:
            spec.append(("n_child", "sum"))
        agg = block.group_by(gkeys).aggregate(spec)
        cols = {k: agg[k] for k in gkeys}
        cols["count"] = agg["count_sum"].cast(pa.int64())
        cols["sum"] = agg["sum_sum"]
        cols["min"] = agg["min_min"]
        cols["max"] = agg["max_max"]
        if from_rollup:
            cols["n_child"] = agg["n_child_sum"].cast(pa.int64())
        return finalize_rollup(pa.table(cols), mincounts=mincounts)

    from .exchange import block_map

    # combiner-fed exchange: per-label ROW counts depend on upstream
    # batch boundaries, but the per-label sum of `count` (total raw
    # contributing rows) is execution-invariant — validate on that
    return block_map(partials, gkeys, combine, weight_col="count")


def observed_maxcount(rollup_ds: ray.data.Dataset, keys: Iterable[str] = ()) -> "int | dict":
    """Fullest-bucket count (resample_to_daily_agg semantics,
    resampling.py:85). With ``keys``, returns {key_tuple: maxcount}.
    The result is tiny (one row per key) — safe to materialize."""
    from .exchange import driver_combine

    keys = list(keys)
    if not keys:
        return driver_combine(
            rollup_ds,
            lambda t: pa.table({"m": [pc.max(t["count"]).as_py() or 0]}),
            lambda df: df,
        )["m"].max()

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by(keys).aggregate([("count", "max")])

    out = driver_combine(
        rollup_ds, partial,
        lambda df: df.groupby(keys, as_index=False)["count_max"].max(),
    )
    if len(keys) == 1:
        return {r[keys[0]]: int(r["count_max"]) for _, r in out.iterrows()}
    return {tuple(r[k] for k in keys): int(r["count_max"]) for _, r in out.iterrows()}


def apply_mincount_mask(
    rollup_ds: ray.data.Dataset,
    mincounts: "int | dict",
    keys: Iterable[str] = ("source",),
) -> ray.data.Dataset:
    """Drop buckets below the (possibly per-key) min-count threshold."""
    keys = list(keys)

    def fn(batch: pa.Table) -> pa.Table:
        if isinstance(mincounts, dict):
            if len(keys) == 1:
                kcol = batch[keys[0]].to_numpy(zero_copy_only=False)
                thr = np.array([mincounts.get(k, 1) for k in kcol], dtype=np.int64)
            else:
                kcols = [batch[k].to_numpy(zero_copy_only=False) for k in keys]
                thr = np.array(
                    [mincounts.get(t, 1) for t in zip(*kcols)], dtype=np.int64
                )
            keep = batch["count"].to_numpy(zero_copy_only=False) >= thr
            return batch.filter(pa.array(keep))
        return batch.filter(pc.greater_equal(batch["count"], pa.scalar(int(mincounts))))

    return rollup_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
