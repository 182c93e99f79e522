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

from ..schema import TIERS, US_PER_SEC
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
    """Write each tier as hive-partitioned Parquet under
    ``out_dir/tier=NAME/<partition_key>=.../`` (resumable layout — a
    rerun can skip tiers whose directory already exists; per-key
    subdirectories let a consumer prune by source)."""
    paths = {}
    for name, ds in tiers.items():
        path = os.path.join(out_dir, f"tier={name}")
        cols = [c for (c, _) in zip(ds.schema().names, ds.schema().types)]
        if partition_key and partition_key in cols:
            ds.write_parquet(path, partition_cols=[partition_key])
        else:
            ds.write_parquet(path)
        paths[name] = path
    return paths


def cascade_fused(
    ds: ray.data.Dataset,
    *,
    value_col: str,
    keys: Iterable[str] = ("source",),
    ts_col: str = "ts",
    end_stamped: bool = True,
    mincounts_perc: float = 0.0,
    coarse_mincounts_perc: "float | dict" = 0.0,
    raw_width_us: int | None = US_PER_SEC,
    dedup: bool = False,
    order_col: str = "doc_id",
) -> ray.data.Dataset:
    """Single-exchange cascade.

    THE scale design for the tier ladder: hash-partition ONCE on
    (keys, 1d-bucket) — the coarsest tier's key — then every stage runs
    vectorized inside the block with no further data movement:

      * exact keep-last dedup (1m/1h/1d buckets never cross a 1d
        bucket, and neither do timestamp duplicates),
      * 1m aggregate of raw rows, 1h from 1m partials, 1d from 1h —
        each one pandas groupby within the block,
      * all three min-count masks (fixed-grid rule when raw_width_us is
        given, else per-key observed-maxcount is NOT supported here —
        callers needing it use the generic rollup_cascade).

    One exchange, one pass, all tiers: output has a ``tier`` column
    ('1m'|'1h'|'1d') over ROLLUP_SCHEMA (+ n_child for coarse tiers).
    Equality with the multi-exchange ``rollup_cascade`` is pinned by
    tests/test_rollup.py::test_fused_cascade_equals_generic.
    """
    import numpy as np
    import pandas as pd

    from ..stages.bucket import bucket_end_us
    from ..stages.exchange import block_map
    from ..stages.resample import mincounts_30min_rule, mincounts_daily_rule
    from ..util import ts_to_us

    keys = list(keys)

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        if dedup:
            df = df.sort_values(keys + [ts_col, order_col], kind="stable")
            df = df.drop_duplicates(subset=keys + [ts_col], keep="last")
        us = ts_to_us(df[ts_col])
        return df.assign(_day=bucket_end_us(us, TIERS["1d"], end_stamped=end_stamped))

    def block_fn(df: pd.DataFrame) -> pd.DataFrame:
        return _fused_block_fn_pandas(
            df, value_col=value_col, keys=keys, ts_col=ts_col,
            end_stamped=end_stamped, dedup=dedup, order_col=order_col,
            mincounts_perc=mincounts_perc,
            coarse_mincounts_perc=coarse_mincounts_perc,
            raw_width_us=raw_width_us,
        )

    pre_ds = ds.map_batches(pre, batch_format="pandas")
    # dedup=True makes `pre` drop within-batch duplicates, so per-label
    # row counts at the exchange depend on upstream batch boundaries —
    # the split tripwire would false-positive across executions. The
    # final block_fn re-dedups whole groups, so correctness never
    # depends on pre's reduction; only the guard is relaxed.
    return block_map(
        pre_ds, keys + ["_day"], block_fn,
        batch_format="pandas", zero_copy_batch=False, validate=not dedup,
    )


def _fused_block_fn_pandas(
    df,
    *,
    value_col: str,
    keys: list,
    ts_col: str,
    end_stamped: bool,
    dedup: bool,
    order_col: str,
    mincounts_perc: float,
    coarse_mincounts_perc,
    raw_width_us: int | None,
):
    """The tier ladder over one co-located frame (all rows of each
    (keys, 1d-bucket) present) — shared by cascade_fused (post-exchange
    block) and tokens_cascade_partitioned (per file group)."""
    import numpy as np
    import pandas as pd

    from ..stages.bucket import bucket_end_us
    from ..stages.resample import mincounts_30min_rule, mincounts_daily_rule
    from ..util import ts_to_us

    out_cols = ["tier"] + keys + ["bucket_ts", "count", "sum", "min", "max", "mean", "n_child"]
    if df.empty:
        return pd.DataFrame(columns=out_cols)

    if mincounts_perc > 0:
        if raw_width_us is None:
            raise ValueError("fused cascade needs raw_width_us for the first-tier min-count")
        minc_1m = mincounts_30min_rule(TIERS["1m"] // raw_width_us, mincounts_perc)
    else:
        minc_1m = 1

    def coarse_minc(tier: str, maxchild: int) -> int:
        perc = (
            coarse_mincounts_perc.get(tier, 0.0)
            if isinstance(coarse_mincounts_perc, dict)
            else coarse_mincounts_perc
        )
        return mincounts_daily_rule(maxchild, perc) if perc > 0 else 1

    minc_1h, minc_1d = coarse_minc("1h", 60), coarse_minc("1d", 24)

    if dedup:
        df = df.sort_values(keys + [ts_col, order_col], kind="stable")
        df = df.drop_duplicates(subset=keys + [ts_col], keep="last")
    us = ts_to_us(df[ts_col])

    base = {k: df[k].to_numpy() for k in keys}
    base["b"] = bucket_end_us(us, TIERS["1m"], end_stamped=end_stamped)
    base["v"] = df[value_col].astype(float).to_numpy()
    t1m = (
        pd.DataFrame(base)
        .groupby(keys + ["b"], as_index=False, sort=False)
        .agg(count=("v", "count"), sum=("v", "sum"), min=("v", "min"), max=("v", "max"))
    )
    t1m = t1m[t1m["count"] >= max(1, minc_1m)]

    def coarser(t: pd.DataFrame, width: int, minc: int) -> pd.DataFrame:
        g = (
            t.assign(b2=bucket_end_us(t["b"].to_numpy(), width, end_stamped=True))
            .groupby(keys + ["b2"], as_index=False, sort=False)
            .agg(count=("count", "sum"), sum=("sum", "sum"), min=("min", "min"),
                 max=("max", "max"), n_child=("b", "count"))
            .rename(columns={"b2": "b"})
        )
        return g[g["n_child"] >= minc]

    t1h = coarser(t1m, TIERS["1h"], minc_1h)
    t1d = coarser(t1h.drop(columns=["n_child"]), TIERS["1d"], minc_1d)

    frames = []
    for tier, t in (("1m", t1m), ("1h", t1h), ("1d", t1d)):
        f = t.copy()
        f.insert(0, "tier", tier)
        if "n_child" not in f.columns:
            f["n_child"] = np.nan
        frames.append(f)
    out = pd.concat(frames, ignore_index=True)
    out["bucket_ts"] = pd.to_datetime(out.pop("b"), unit="us")
    out["mean"] = out["sum"] / out["count"]
    return out[out_cols]


def tokens_cascade_fused(
    path: str,
    *,
    mincounts_perc: float = 0.0,
    coarse_mincounts_perc: "float | dict" = 0.0,
    dedup: bool = True,
    order_col: str = "doc_id",
    raw_width_us: int = US_PER_SEC,
) -> ray.data.Dataset:
    """Fused cascade over the north-rule tokens corpus (column-pruned
    read — tokens never loaded)."""
    ds = ray.data.read_parquet(path, columns=["doc_id", "source", "ts", "n_tok"])
    return cascade_fused(
        ds, value_col="n_tok", keys=("source",), ts_col="ts", end_stamped=True,
        mincounts_perc=mincounts_perc, coarse_mincounts_perc=coarse_mincounts_perc,
        raw_width_us=raw_width_us, dedup=dedup, order_col=order_col,
    )


def events_cascade_fused(
    sf_dir: str, *, coarse_mincounts_perc: "float | dict" = 0.0
) -> ray.data.Dataset:
    """Fused cascade over the events table (point events, no min-count
    on the first tier)."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts", "value"]
    )
    return cascade_fused(
        ds, value_col="value", keys=("event_type",), ts_col="ts", end_stamped=False,
        coarse_mincounts_perc=coarse_mincounts_perc, raw_width_us=None,
    )


def file_group_dataset(path: str, day_seconds: int) -> ray.data.Dataset:
    """Distributed (source, day) file-group discovery for the
    partition-aligned cascades — replaces the former driver-side glob
    (at 100 TB that is millions of paths on the driver).

    * If ``_manifest.parquet`` (columns path/source/chunk_lo) exists at
      the root — our own write pipelines and any sane lake writer emit
      one — it is read directly: no listing at all.
    * Otherwise the driver lists ONLY the per-source directories
      (bounded by the source count); per-directory file listing fans
      out as Ray tasks; group assembly is one exchange on path strings.
    Returns a Dataset of {source, day, files: list[str]} rows.
    """
    import re as _re

    import pandas as pd

    man = os.path.join(path, "_manifest.parquet")
    if os.path.exists(man):
        # manifest = metadata, not data: grouping a few million rows in
        # pandas on the driver is ~100 ms — no exchange topology needed
        # (the round-1 objection was driver FILESYSTEM globbing, which
        # the manifest eliminates). The distributed-listing path below
        # remains for manifest-less layouts.
        import numpy as _np
        import pyarrow as _pa
        import pyarrow.parquet as _pq

        mdf = _pq.read_table(man, columns=["path", "source", "chunk_lo"]).to_pandas()
        mdf["day"] = (mdf["chunk_lo"] // day_seconds).astype(_np.int64)
        # vectorized group assembly: one sort, then the (source, day)
        # run boundaries become the offsets of an Arrow list<string>
        # column — no Python loop over groups (millions of groups at
        # 100 TB; the former iterrows build was the one row loop here)
        mdf = mdf.sort_values(["source", "day", "path"], kind="stable")
        if mdf.empty:
            return ray.data.from_arrow(_pa.table({
                "source": _pa.array([], type=_pa.string()),
                "day": _pa.array([], type=_pa.int64()),
                "files": _pa.array([], type=_pa.large_list(_pa.string())),
            }))
        src = mdf["source"].to_numpy()
        day = mdf["day"].to_numpy()
        change = _np.empty(len(mdf), dtype=bool)
        change[0] = True
        change[1:] = (src[1:] != src[:-1]) | (day[1:] != day[:-1])
        starts = _np.flatnonzero(change)
        offsets = _np.append(starts, len(mdf)).astype(_np.int64)
        tbl = _pa.table({
            "source": _pa.array(src[starts]),
            "day": _pa.array(day[starts], type=_pa.int64()),
            "files": _pa.LargeListArray.from_arrays(
                _pa.array(offsets), _pa.array(mdf["path"].to_numpy())
            ),
        })
        # MANY blocks, not one: from_arrow(tbl) yields a single block,
        # and a single block is a single map task — the whole
        # per-group pipeline would run serially at any cluster size
        # (caught by the flat 2/8/32-CPU scaling run, round 3). Slice
        # to ~8 blocks per core; slices are zero-copy.
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        n_groups = tbl.num_rows
        g = max(1, -(-n_groups // max(8 * cpus, 1)))
        return ray.data.from_arrow(
            [tbl.slice(i, g) for i in range(0, n_groups, g)]
        )
    else:
        dirs = sorted(d for d in os.listdir(path) if d.startswith("src-"))

        def list_dir(row: dict) -> list[dict]:
            import glob as _glob

            out = []
            for f in sorted(_glob.glob(os.path.join(path, row["dir"], "*.parquet"))):
                m = _re.search(r"chunk-(\d+)\.parquet$", f)
                if m is None:
                    raise ValueError(f"non-aligned file name: {f} — use cascade_fused")
                out.append({
                    "path": f,
                    "source": row["dir"].removeprefix("src-"),
                    "chunk_lo": int(m.group(1)),
                })
            return out

        files_ds = ray.data.from_items([{"dir": d} for d in dirs]).flat_map(list_dir)

    def add_day(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(day=df["chunk_lo"] // day_seconds)

    def group_fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("path")
        return pd.DataFrame({
            "source": [df["source"].iloc[0]],
            "day": [df["day"].iloc[0]],
            "files": [df["path"].tolist()],
        })

    from ..stages.exchange import grouped_block_map

    return grouped_block_map(
        files_ds.map_batches(add_day, batch_format="pandas"), ["source", "day"], group_fn
    )



def tokens_cascade_partitioned(
    path: str,
    *,
    mincounts_perc: float = 0.0,
    coarse_mincounts_perc: "float | dict" = 0.0,
    dedup: bool = True,
    order_col: str = "doc_id",
    raw_width_us: int = US_PER_SEC,
) -> ray.data.Dataset:
    """SHUFFLE-FREE cascade for partition-aligned lake layouts.

    When the input layout already guarantees (source, day) locality —
    one directory per source, one file per aligned time chunk, as any
    partitioned 100-TB lake write produces (and as our own
    ``write_tiers``/fixture layout does) — the exchange in
    ``cascade_fused`` is redundant: the driver groups files by
    (source, day) from the path structure, and one Ray task per group
    reads its own files and emits all three tiers. Zero bytes move
    between workers; scaling is limited only by group count.

    Falls back conceptually to ``cascade_fused`` for non-aligned
    inputs (callers choose; equality of the two paths is pinned by
    tests/test_rollup.py::test_partitioned_cascade_equals_fused).
    """
    import pandas as pd

    day_seconds = TIERS["1d"] // US_PER_SEC
    groups_ds = file_group_dataset(path, day_seconds)

    def process(batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.parquet as pq

        frames = []
        for files in batch["files"]:
            tbl = pa.concat_tables([
                pq.read_table(f, columns=["doc_id", "source", "ts", "n_tok"]) for f in files
            ])
            frames.append(_fused_block_fn_pandas(
                tbl.to_pandas(), value_col="n_tok", keys=["source"], ts_col="ts",
                end_stamped=True, dedup=dedup, order_col=order_col,
                mincounts_perc=mincounts_perc,
                coarse_mincounts_perc=coarse_mincounts_perc,
                raw_width_us=raw_width_us,
            ))
        return pd.concat(frames, ignore_index=True)

    return groups_ds.map_batches(process, batch_format="pandas", batch_size=1)


def screen_rollup_compress_partitioned(
    path: str,
    *,
    hampel_window: int = 624,
    hampel_n_sigma: float = 5.5,
    mincounts_perc: float = 0.1,
    gorilla: bool = True,
) -> ray.data.Dataset:
    """The flagship north-star pipeline, shuffle-free partitioned form:
    per (source, day) file group — keep-last dedup -> Hampel outlier
    screening (reference defaults: window 48*13=624, sigma 5.5,
    double-differencing, iterate-to-convergence; hampel.py:63,
    run_chain.py:85-100) -> masked tier ladder 1m/1h/1d with min-count
    -> Gorilla delta-of-delta + XOR compression of the screened raw
    series (state/gorilla.py). Emits tier rows plus one ``tier='gor'``
    row per group carrying (count=points, sum=packed_bytes).

    Compute-dominated per group (rolling medians + bit packing), so
    throughput scales with cores — this is the scaling-evidence job
    (BASELINE.md)."""
    import numpy as np
    import pandas as pd

    from ..stages.outliers import hampel_flag
    from ..state import gorilla as _g
    from ..util import ts_to_us

    day_seconds = TIERS["1d"] // US_PER_SEC
    groups_ds = file_group_dataset(path, day_seconds)

    def process(batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        out = []
        for files in batch["files"]:
            tbl = pa.concat_tables([
                pq.read_table(f, columns=["doc_id", "source", "ts", "n_tok"]) for f in files
            ])
            srcs = pc.unique(tbl["source"])
            if len(srcs) == 1:
                # the common layout: a (source, day) file group holds ONE
                # source, so sorting/deduping on the string column is
                # wasted work — numeric lexsort on (ts, doc_id) + a
                # keep-last adjacency mask is equivalent (profiled: the
                # pandas 3-key stable sort + drop_duplicates was the
                # biggest per-group cost once the median/pack kernels
                # landed) and the constant source broadcasts back as a
                # scalar column
                ts_np = tbl["ts"].combine_chunks().to_numpy(
                    zero_copy_only=False)
                doc_np = tbl["doc_id"].to_numpy(zero_copy_only=False)
                tok_np = tbl["n_tok"].to_numpy(zero_copy_only=False)
                order = np.lexsort((doc_np, ts_np.view(np.int64)))
                ts_s = ts_np[order]
                keep = np.ones(len(ts_s), dtype=bool)
                keep[:-1] = ts_s[1:] != ts_s[:-1]     # keep LAST per ts
                df = pd.DataFrame({
                    "doc_id": doc_np[order][keep],
                    "source": srcs[0].as_py(),
                    "ts": ts_s[keep],
                    "n_tok": tok_np[order][keep].astype(np.float64),
                })
            else:
                df = tbl.to_pandas().sort_values(
                    ["source", "ts", "doc_id"], kind="stable")
                df = df.drop_duplicates(
                    subset=["source", "ts"],
                    keep="last").reset_index(drop=True)
            flag = hampel_flag(
                df["n_tok"].astype(float), window_length=hampel_window,
                n_sigma=hampel_n_sigma, use_differencing=True, repeat=True,
            )
            df.loc[flag.to_numpy() == 2, "n_tok"] = np.nan
            tiers = _fused_block_fn_pandas(
                df, value_col="n_tok", keys=["source"], ts_col="ts",
                end_stamped=True, dedup=False, order_col="doc_id",
                mincounts_perc=mincounts_perc, coarse_mincounts_perc=0.0,
                raw_width_us=US_PER_SEC,
            )
            out.append(tiers)
            if gorilla:
                obs = df[df["n_tok"].notna()]
                ts_blob = _g.encode_timestamps(ts_to_us(obs["ts"]))
                val_blob = _g.encode_values(obs["n_tok"].to_numpy(dtype=np.float64))
                out.append(pd.DataFrame([{
                    "tier": "gor", "source": df["source"].iloc[0],
                    "bucket_ts": pd.to_datetime(ts_to_us(df["ts"]).max(), unit="us"),
                    "count": len(obs), "sum": float(len(ts_blob) + len(val_blob)),
                    "min": np.nan, "max": np.nan, "mean": np.nan, "n_child": np.nan,
                }]))
        return pd.concat(out, ignore_index=True)

    return groups_ds.map_batches(process, batch_format="pandas", batch_size=1)


def tokens_cascade(path: str, **kw) -> dict[str, ray.data.Dataset]:
    """Cascade over the north-rule tokens corpus: column-pruned read
    (never loads the heavy ``tokens`` arrays), keep-last dedup, 1-second
    END-stamped records."""
    ds = ray.data.read_parquet(path, columns=["doc_id", "source", "ts", "n_tok"])
    kw.setdefault("dedup", True)
    # EXACT dedup (coarse-bucket exchange on the slim 4-column
    # projection), not assume_partitioned: Ray's dynamic block
    # splitting can cut a duplicate run across batches, making
    # within-batch dedup depend on runtime block boundaries — observed
    # as run-to-run tier-row drift under memory pressure (round 3; the
    # per-label exchange checker caught it). The north rule requires
    # byte-stable rolled-up points; the partitioned flagship
    # (screen_rollup_compress_partitioned) keeps its shuffle-free dedup
    # because it reads each (source, day) file group WHOLE.
    kw.setdefault("dedup_exact", True)
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


def merge_tier_datasets(
    a: ray.data.Dataset,
    b: ray.data.Dataset,
    *,
    keys: "Iterable[str]" = ("source",),
) -> ray.data.Dataset:
    """Incremental continuous-aggregate maintenance: merge two tier
    datasets of the SAME tier (e.g. a base rollup and a late-arrival
    delta rollup) by combining their decomposable partials — count/sum
    add, min/max fold, mean re-derived from the merged sum/count. ONE
    keyed exchange on (keys, bucket); only buckets present in the delta
    move new data, untouched buckets pass through the combine verbatim.

    This is the timescale-style late-data path of the north rule: a
    late batch is rolled up on its own (tiny) and folded into the
    standing tiers without re-reading the base corpus. Equality with a
    full recompute over base+delta is pinned by the
    ``rollup_late_merge`` oracle query and tests/test_rollup_merge.py.

    Column contract (ADVICE r4): the decomposable partials
    count/sum/min/max merge, ``mean`` is re-derived, and ``n_child``
    (present on the coarse 1h/1d tiers' mincount masks) is ADDITIVE
    across base/delta and is summed when present. Any other column
    raises instead of being silently dropped — a tier schema this
    function doesn't understand must not lose data quietly. Null-keyed
    rows merge like any other group (``dropna=False``), matching the
    pyarrow ``group_by`` in the cascade that keeps null keys.
    """
    import pandas as pd

    from ..stages.exchange import block_map
    from ..util import ts_to_us

    keys = list(keys)
    known = {"bucket_ts", "count", "sum", "min", "max", "mean",
             "n_child"}
    # an EMPTY side has no schema (Dataset.schema() -> None): nothing
    # to validate or drop there
    sides = [s.names for s in (a.schema(), b.schema()) if s is not None]
    for names in sides:
        extra = [c for c in names if c not in known and c not in keys]
        if extra:
            raise ValueError(
                f"merge_tier_datasets: unexpected tier column(s) "
                f"{extra}; refusing to merge a schema whose partials "
                f"this combine would silently drop")
    child_flags = ["n_child" in names for names in sides]
    has_child = any(child_flags)
    if len(child_flags) == 2 and child_flags[0] != child_flags[1]:
        raise ValueError(
            "merge_tier_datasets: n_child present on only one side — "
            "base and delta must come from the same tier")

    def add_key(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(_b=ts_to_us(df["bucket_ts"]))

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        aggs = dict(
            bucket_ts=("bucket_ts", "first"),
            count=("count", "sum"),
            sum=("sum", "sum"),
            min=("min", "min"),
            max=("max", "max"),
        )
        if has_child:
            aggs["n_child"] = ("n_child", "sum")
        g = df.groupby(keys + ["_b"], as_index=False,
                       dropna=False).agg(**aggs)
        g["mean"] = g["sum"] / g["count"]
        return g.drop(columns=["_b"])

    u = a.map_batches(add_key, batch_format="pandas").union(
        b.map_batches(add_key, batch_format="pandas"))
    return block_map(u, keys + ["_b"], combine, batch_format="pandas",
                     zero_copy_batch=False)
