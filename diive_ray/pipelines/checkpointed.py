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
