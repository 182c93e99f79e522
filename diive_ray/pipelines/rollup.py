"""Flagship pipeline: the raw -> 1m -> 1h -> 1d rollup cascade.

Mirrors the reference lifecycle (SURVEY.md §3.1,
diive/preprocessing/qaqc/meteoscreening.py:37-658): sanitize ->
[screen/correct] -> resample — re-expressed as one lazy Ray Data plan:

    read_parquet (column-pruned)
      -> dedup keep-last            (times.py:1409-1459)
      -> tier 1m  groupby-aggregate (resampling.py:94-197 semantics)
      -> min-count mask             (resampling.py:161-171)
      -> gap-fill over missing 1m buckets   (north rule: BEFORE
         further downsampling; interpolate.py:154-164 + rolling median)
      -> tier 1h, tier 1d  (cascade: decomposable partials only —
         resample-of-resample, resampling.py:47-90)
      -> write_parquet per tier (partitioned by source, resumable)

Scale notes: the only all-to-all exchanges are the dedup hash-shuffle
(skippable when the input layout guarantees duplicate adjacency) and
the tier-1m groupby over **pre-aggregated partials** (60x smaller than
raw for 1-second data). Tiers 1h/1d shuffle 60x and 1440x less again.
``tokens`` arrays are never read by the cascade (column pruning at the
read) — they ride only through the raw-tier compress/verify path
(state/blockstore.py).
"""

from __future__ import annotations

import os
from typing import Iterable

import pyarrow.compute as pc
import ray.data

from ..schema import TIERS, US_PER_MIN, US_PER_SEC
from ..sources.sanitize import dedup_keep_last
from ..stages.gaps import gapfill_rollup
from ..stages.resample import (
    mincounts_30min_rule,
    mincounts_daily_rule,
    observed_maxcount,
    apply_mincount_mask,
    rollup,
)

TIER_ORDER = ("1m", "1h", "1d")


def rollup_cascade(
    ds: ray.data.Dataset,
    *,
    value_col: str,
    keys: Iterable[str] = ("source",),
    ts_col: str = "ts",
    end_stamped: bool = True,
    raw_width_us: int | None = US_PER_SEC,
    mincounts_perc: float = 0.0,
    coarse_mincounts_perc: "float | dict" = 0.0,
    gapfill: bool = False,
    interp_limit: int = 5,
    rmed_window: int | None = 60,
    dedup: bool = False,
    dedup_order_col: str = "doc_id",
    dedup_exact: bool = False,
) -> dict[str, ray.data.Dataset]:
    """Build the lazy cascade; returns {'1m': ds, '1h': ds, '1d': ds,
    ['1m_filled': ds]}. Nothing executes until a tier is consumed.

    * First tier min-count: ``mincounts = int(maxcount*perc)``, floor
      rule ``1 if < 3`` (resampling.py:167-171), where maxcount =
      bucket_width / raw_width (the fullest possible bucket) when
      ``raw_width_us`` is given, else the observed fullest bucket per
      key (resample_to_daily_agg semantics, resampling.py:85-86).
    * Coarse tiers: mask on ``n_child`` (contributing child buckets) with
      the daily rule ``max(1, int(maxcount*perc))`` (resampling.py:86).
    """
    keys = tuple(keys)
    if dedup:
        ds = dedup_keep_last(
            ds, keys=keys, ts_col=ts_col, order_col=dedup_order_col,
            assume_partitioned=not dedup_exact,
        )

    out: dict[str, ray.data.Dataset] = {}

    w1m = TIERS["1m"]
    t1m = rollup(
        ds, w1m, value_col=value_col, keys=keys, ts_col=ts_col,
        end_stamped=end_stamped, from_rollup=False,
    )
    if mincounts_perc > 0:
        if raw_width_us is not None:
            maxcount = w1m // raw_width_us
            t1m = apply_mincount_mask(t1m, mincounts_30min_rule(maxcount, mincounts_perc), keys)
        else:
            per_key_max = observed_maxcount(t1m, keys)
            minc = {k: mincounts_30min_rule(v, mincounts_perc) for k, v in per_key_max.items()}
            t1m = apply_mincount_mask(t1m, minc, keys)
    out["1m"] = t1m

    if gapfill:
        out["1m_filled"] = gapfill_rollup(
            t1m, w1m, keys=keys, value_col="mean",
            interp_limit=interp_limit, rmed_window=rmed_window,
        )

    prev = t1m
    for tier in ("1h", "1d"):
        width = TIERS[tier]
        t = rollup(prev, width, keys=keys, ts_col="bucket_ts", end_stamped=True, from_rollup=True)
        perc = (
            coarse_mincounts_perc.get(tier, 0.0)
            if isinstance(coarse_mincounts_perc, dict)
            else coarse_mincounts_perc
        )
        if perc > 0:
            maxchild = width // TIERS["1m"] if tier == "1h" else 24
            minc = mincounts_daily_rule(maxchild, perc)
            t = t.map_batches(
                lambda b, m=minc: b.filter(pc.greater_equal(b["n_child"], m)),
                batch_format="pyarrow",
            )
        out[tier] = t
        prev = t
    return out


def write_tiers(
    tiers: dict[str, ray.data.Dataset],
    out_dir: str,
    *,
    partition_key: str = "source",
) -> dict[str, str]:
    """Write each tier as partitioned Parquet under ``out_dir/tier=NAME``
    (one directory per tier, files per block; resumable layout — a rerun
    can skip tiers whose directory already exists)."""
    paths = {}
    for name, ds in tiers.items():
        path = os.path.join(out_dir, f"tier={name}")
        ds.write_parquet(path)
        paths[name] = path
    return paths


def tokens_cascade(path: str, **kw) -> dict[str, ray.data.Dataset]:
    """Cascade over the north-rule tokens corpus: column-pruned read
    (never loads the heavy ``tokens`` arrays), keep-last dedup, 1-second
    END-stamped records."""
    ds = ray.data.read_parquet(path, columns=["doc_id", "source", "ts", "n_tok"])
    kw.setdefault("dedup", True)
    return rollup_cascade(
        ds, value_col="n_tok", keys=("source",), ts_col="ts",
        end_stamped=True, raw_width_us=US_PER_SEC, **kw,
    )


def events_cascade(sf_dir: str, **kw) -> dict[str, ray.data.Dataset]:
    """Cascade over the TPC-H-ish ``events`` table (point events keyed by
    event_type; irregular arrivals -> observed-maxcount min-count rule)."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts", "value"]
    )
    return rollup_cascade(
        ds, value_col="value", keys=("event_type",), ts_col="ts",
        end_stamped=False, raw_width_us=None, **kw,
    )
