"""Resumable partitioned runs: per-partition checkpoints with lineage
and metrics manifests.

Modeled on the reference's per-chunk checkpoint design
(diive/flux/hires/detect_and_remove_tlag.py:78-94: checkpoint CSV per
phase, resume skips completed chunks, log survives crashes), raised to
the engine's partition granularity:

* work unit = one input shard (a ``src-*`` directory of the corpus, or
  any caller-supplied shard -> file-list mapping),
* each shard runs the full cascade (and optionally the Gorilla block
  compress) as its own internally-parallel Ray Data pipeline, writes
  tier Parquet under ``out/<shard>/tier=*`` to a temp dir renamed into
  place (idempotent), then writes ``_manifests/<shard>.json`` holding
  lineage (input files, stage-config hash, engine version) + metrics
  (rows in/out per tier, wall seconds, points/s),
* resume = skip shards whose manifest exists AND matches the current
  stage-config hash (a config change invalidates old outputs).

At cluster scale each shard would be its own ``ray job submit``
invocation sharing the manifest directory; in-process we loop shards on
the driver (each pipeline is parallel inside). Crash-safety contract is
pinned by tests/test_checkpointed.py (kill between shards -> rerun
recomputes only missing shards; outputs byte-stable).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import time

import ray.data

from ..schema import US_PER_SEC
from .rollup import rollup_cascade

ENGINE_VERSION = "diive_ray-0.1"


def _config_hash(cfg: dict) -> str:
    return hashlib.sha256(json.dumps(cfg, sort_keys=True).encode()).hexdigest()[:16]


def discover_shards(input_root: str) -> dict[str, list[str]]:
    """Default sharding: one shard per src-* directory."""
    shards = {}
    for d in sorted(glob.glob(os.path.join(input_root, "src-*"))):
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        if files:
            shards[os.path.basename(d)] = files
    return shards


def run_resumable(
    input_root: str,
    out_root: str,
    *,
    shards: dict[str, list[str]] | None = None,
    cascade_kwargs: dict | None = None,
    compress_span_us: int | None = None,
) -> dict:
    """Run the rollup cascade shard-by-shard with manifest checkpoints.
    Returns {'done': [...], 'skipped': [...], 'metrics': {...}}."""
    cascade_kwargs = dict(cascade_kwargs or {})
    cascade_kwargs.setdefault("mincounts_perc", 0.0)
    cascade_kwargs.setdefault("dedup", True)
    shards = shards if shards is not None else discover_shards(input_root)
    cfg = {
        "engine": ENGINE_VERSION,
        "cascade": {k: str(v) for k, v in sorted(cascade_kwargs.items())},
        "compress_span_us": compress_span_us,
    }
    chash = _config_hash(cfg)
    man_dir = os.path.join(out_root, "_manifests")
    os.makedirs(man_dir, exist_ok=True)

    done, skipped, metrics = [], [], {}
    for shard, files in shards.items():
        man_path = os.path.join(man_dir, f"{shard}.json")
        if os.path.exists(man_path):
            with open(man_path) as f:
                man = json.load(f)
            if man.get("config_hash") == chash:
                skipped.append(shard)
                continue
        t0 = time.perf_counter()
        ds = ray.data.read_parquet(files, columns=["doc_id", "source", "ts", "n_tok"])
        tiers = rollup_cascade(
            ds, value_col="n_tok", keys=("source",), ts_col="ts",
            end_stamped=True, raw_width_us=US_PER_SEC, **cascade_kwargs,
        )
        shard_tmp = os.path.join(out_root, f".tmp-{shard}")
        shard_out = os.path.join(out_root, shard)
        shutil.rmtree(shard_tmp, ignore_errors=True)
        tier_rows = {}
        for name, tds in tiers.items():
            path = os.path.join(shard_tmp, f"tier={name}")
            tds.write_parquet(path)
            tier_rows[name] = ray.data.read_parquet(path).count()
        if compress_span_us:
            from ..state.blockstore import compress_blocks

            blocks = compress_blocks(
                ray.data.read_parquet(files, columns=["source", "ts", "n_tok"]),
                block_span_us=compress_span_us,
            )
            blocks.write_parquet(os.path.join(shard_tmp, "blocks"))
            tier_rows["blocks"] = ray.data.read_parquet(os.path.join(shard_tmp, "blocks")).count()
        shutil.rmtree(shard_out, ignore_errors=True)
        os.replace(shard_tmp, shard_out)
        secs = time.perf_counter() - t0
        n_points = sum(v for k, v in tier_rows.items() if k in ("1m", "1h", "1d"))
        man = {
            "shard": shard,
            "config_hash": chash,
            "config": cfg,
            "lineage": {"input_files": files, "engine": ENGINE_VERSION},
            "metrics": {
                "tier_rows": tier_rows,
                "wall_sec": round(secs, 3),
                "rolled_points_per_sec": round(n_points / secs, 1) if secs else None,
            },
            "completed_at": time.time(),
        }
        tmp = man_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f, indent=1)
        os.replace(tmp, man_path)
        metrics[shard] = man["metrics"]
        done.append(shard)
    return {"done": done, "skipped": skipped, "metrics": metrics, "config_hash": chash}


def apply_late_batch(
    out_root: str,
    shard: str,
    late_files: list[str],
    *,
    cascade_kwargs: dict | None = None,
) -> dict:
    """Fold a late-arriving batch into a completed shard's standing
    tiers WITHOUT re-reading the shard's base corpus (the
    timescale-style continuous-aggregate maintenance leg, VERDICT r4
    #8): roll up the late batch alone (tiny), fold its 1m tier into
    the standing 1m tier with ``merge_tier_datasets`` (ONE keyed
    exchange over tier rows — base raw data never moves), then
    re-derive 1h/1d from the merged 1m. Coarse tiers are re-derived
    rather than merged because ``n_child`` (contributing child-bucket
    count, feeding coarse mincount masks) is not mergeable from coarse
    rows alone when base and delta touch the same child bucket — and
    the 1m tier is ~60x smaller than raw, so the re-derive is cheap.

    Constraints (raise otherwise): tiers must be unmasked
    (``mincounts_perc == 0`` — a masked tier has already dropped the
    partials a late row would need to merge with), and the late batch
    is assumed append-only w.r.t. the base (dedup applies within the
    late batch only; base raw rows are gone by design).

    Equality with a full recompute over base+delta is pinned at the
    pipeline level by tests/test_round5_scale.py. Updates the shard
    manifest in place with the late-batch lineage. Returns
    {'tier_rows': {...}}."""
    from .rollup import TIERS, merge_tier_datasets
    from .rollup import rollup as rollup_tier

    cascade_kwargs = dict(cascade_kwargs or {})
    cascade_kwargs.setdefault("mincounts_perc", 0.0)
    cascade_kwargs.setdefault("dedup", True)
    if cascade_kwargs.get("mincounts_perc") or cascade_kwargs.get(
            "coarse_mincounts_perc"):
        raise ValueError(
            "apply_late_batch: masked tiers are not incrementally "
            "maintainable (the mask already dropped partials); run "
            "with mincounts_perc=0 and mask at read time instead")
    man_path = os.path.join(out_root, "_manifests", f"{shard}.json")
    if not os.path.exists(man_path):
        raise FileNotFoundError(
            f"apply_late_batch: no manifest for shard {shard!r} — "
            "the base run must complete first")
    shard_out = os.path.join(out_root, shard)

    delta = ray.data.read_parquet(
        late_files, columns=["doc_id", "source", "ts", "n_tok"])
    dt = rollup_cascade(
        delta, value_col="n_tok", keys=("source",), ts_col="ts",
        end_stamped=True, raw_width_us=US_PER_SEC, **cascade_kwargs)
    base_1m = ray.data.read_parquet(os.path.join(shard_out, "tier=1m"))
    if "tier" in (base_1m.schema().names or []):
        # the tier=1m directory name is parsed as a hive partition
        # column on read; it is path metadata, not a tier partial
        base_1m = base_1m.drop_columns(["tier"])
    merged_1m = merge_tier_datasets(base_1m, dt["1m"], keys=["source"])

    tiers = {"1m": merged_1m}
    prev = merged_1m
    for tier in ("1h", "1d"):
        prev = rollup_tier(
            prev, TIERS[tier], keys=("source",), ts_col="bucket_ts",
            end_stamped=True, from_rollup=True)
        tiers[tier] = prev

    shard_tmp = os.path.join(out_root, f".tmp-late-{shard}")
    shutil.rmtree(shard_tmp, ignore_errors=True)
    tier_rows = {}
    for name, tds in tiers.items():
        path = os.path.join(shard_tmp, f"tier={name}")
        tds.write_parquet(path)
        tier_rows[name] = ray.data.read_parquet(path).count()
    blocks_src = os.path.join(shard_out, "blocks")
    if os.path.isdir(blocks_src):
        shutil.copytree(blocks_src, os.path.join(shard_tmp, "blocks"))
    shutil.rmtree(shard_out, ignore_errors=True)
    os.replace(shard_tmp, shard_out)

    with open(man_path) as f:
        man = json.load(f)
    man.setdefault("late_batches", []).append({
        "input_files": list(late_files),
        "applied_at": time.time(),
        "tier_rows": tier_rows,
    })
    man["metrics"]["tier_rows"] = tier_rows
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1)
    os.replace(tmp, man_path)
    return {"tier_rows": tier_rows}
