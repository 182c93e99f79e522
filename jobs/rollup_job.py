#!/usr/bin/env python
"""`ray job submit` entry point for the flagship rollup (north rule:
"launched via ray job submit on fixed multi-node clusters").

    ray job submit --working-dir . -- \
        python jobs/rollup_job.py --input /data/corpus --out /data/tiers \
        [--resume] [--compress-span-us 3600000000]

On a cluster the job connects to the running Ray (RAY_ADDRESS); locally
it falls back to a local session. Resumable: per-shard manifests under
--out (pipelines/checkpointed.py); a rerun skips completed shards."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="corpus root (src-*/ parquet layout)")
    ap.add_argument("--out", required=True, help="output root (tiers + _manifests)")
    ap.add_argument("--mincounts-perc", type=float, default=0.0)
    ap.add_argument("--compress-span-us", type=int, default=None,
                    help="also write Gorilla blocks at this span")
    ap.add_argument("--no-dedup", action="store_true")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, ignore_reinit_error=True)

    from diive_ray.pipelines.checkpointed import run_resumable

    t0 = time.perf_counter()
    result = run_resumable(
        args.input, args.out,
        cascade_kwargs={"mincounts_perc": args.mincounts_perc, "dedup": not args.no_dedup},
        compress_span_us=args.compress_span_us,
    )
    result["wall_sec"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(result))
    ray.shutdown()


if __name__ == "__main__":
    main()
