#!/usr/bin/env python
"""Benchmark harness (driver contract + scaling evidence).

Default mode: ``ray.init(address='local', num_cpus=$RAY_GRAFT_CPUS)``,
run the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) plus the north-rule tokens corpus (deterministic
fixture, cached under /tmp), print ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

``--scaling``: run the SAME headline tokens job twice in FRESH
subprocesses at N=8 and 4N=32 CPUs on the same input and report both
throughputs plus scaling efficiency = (thr_4N / thr_N) / 4 (the
sandbox substitute for the N-vs-4N-node criterion, BASELINE.md).

Owns its Ray session (the only scripts allowed to: bench.py, CLI
entry points, the test fixture)."""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

DEFAULT_SF_DIR = "/root/testdata/sf0.1"
FIXTURE_ROOT = "/tmp/diive_ray_fixtures"


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


# ------------------------------------------------------------- workloads


def run_tokens_rollup(fixture_path: str) -> dict:
    """Headline: keep-last dedup -> 1m (mincount) -> 1h -> 1d in ONE
    fused pass (single hash exchange on (source, 1d-bucket)), then
    gap-fill the materialized 1m tier. Column-pruned read: tokens never
    loaded."""
    import ray.data

    from diive_ray.pipelines.rollup import tokens_cascade_fused
    from diive_ray.schema import TIERS
    from diive_ray.stages.gaps import gapfill_rollup

    fused = tokens_cascade_fused(fixture_path, mincounts_perc=0.1).materialize()
    counts = {
        tier: fused.filter(expr=f"tier == '{tier}'").count() for tier in ("1m", "1h", "1d")
    }
    t1m = fused.filter(expr="tier == '1m'").drop_columns(["tier", "n_child"])
    filled = gapfill_rollup(
        t1m, TIERS["1m"], keys=("source",), value_col="mean",
        interp_limit=5, rmed_window=60,
    )
    counts["1m_filled"] = filled.count()
    return {"tier_rows": counts, "rolled_points": sum(counts.values())}


def run_tokens_ingest(fixture_path: str) -> dict:
    """Tokens/sec ingest: full-schema read (tokens included), per-row
    token-array length validation vs n_tok + token checksum — the
    verify leg of the north rule's per-row token-array equality."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    ds = ray.data.read_parquet(fixture_path)

    def verify(t: pa.Table) -> pa.Table:
        lens = pc.list_value_length(t["tokens"]).cast(pa.int32())
        ok = pc.all(pc.equal(lens, t["n_tok"])).as_py()
        flat = t["tokens"].combine_chunks()
        n_tokens = len(flat.values) if isinstance(flat, pa.ListArray) else int(pc.sum(lens).as_py())
        return pa.table({
            "rows": pa.array([t.num_rows], pa.int64()),
            "tokens": pa.array([n_tokens], pa.int64()),
            "len_ok": pa.array([1 if ok else 0], pa.int64()),
        })

    res = ds.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)
    import pandas as pd  # noqa: F401
    agg = res.sum(["rows", "tokens"])
    return {"rows": int(agg["sum(rows)"]), "tokens": int(agg["sum(tokens)"])}


def run_sf_queries(sf_dir: str, names: list[str]) -> dict:
    """Per-query wall seconds for a representative registry subset."""
    import __ray_entry__ as e

    qs = e.queries()
    out = {}
    for name in names:
        t0 = time.perf_counter()
        res = qs[name](sf_dir)
        # consume lazily-returned datasets
        if hasattr(res, "count") and not hasattr(res, "shape"):
            res.count()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


SF_QUERY_SET = [
    "resample_1h",
    "resample_1d",
    "diel_cycle",
    "gap_table_1h",
    "zscore_outliers",
    "dedup_keep_last",
    "day_mean_as_hires",
    "qcf",
    "lineitem_agg",
]


# ----------------------------------------------------------------- modes


def headline(num_cpus: int, sf_dir: str, *, scaling_job_only: bool = False) -> dict:
    import ray

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from diive_ray.fixtures import ensure_fixture

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    try:
        fixture = ensure_fixture("bench", FIXTURE_ROOT)

        queries: dict[str, float] = {}
        extras: dict = {}

        t0 = time.perf_counter()
        roll = run_tokens_rollup(fixture)
        t_roll = time.perf_counter() - t0
        queries["tokens_rollup_cascade"] = round(t_roll, 3)
        extras["rolled_points"] = roll["rolled_points"]
        extras["rolled_points_per_sec"] = round(roll["rolled_points"] / t_roll, 1)

        t0 = time.perf_counter()
        ing = run_tokens_ingest(fixture)
        t_ing = time.perf_counter() - t0
        queries["tokens_ingest_verify"] = round(t_ing, 3)
        extras["ingest_rows"] = ing["rows"]
        extras["ingest_tokens"] = ing["tokens"]
        extras["tokens_per_sec"] = round(ing["tokens"] / t_ing, 1)

        if not scaling_job_only:
            queries.update(run_sf_queries(sf_dir, SF_QUERY_SET))

        total = round(sum(queries.values()), 3)
        return {
            "metric": "diive_ray headline pipelines wall time (tokens rollup cascade + ingest verify + registry queries)",
            "value": total,
            "unit": "sec",
            "queries": queries,
            "sf": _sf_of(sf_dir),
            "num_cpus": num_cpus,
            **extras,
        }
    finally:
        ray.shutdown()


def scaling(cpus_lo: int, cpus_hi: int, sf_dir: str) -> dict:
    """Fresh-process N vs 4N runs of the same tokens job on the same
    cached fixture (generation happens once, before timing)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from diive_ray.fixtures import ensure_fixture

    ensure_fixture("bench", FIXTURE_ROOT)  # pre-generate so runs only measure the job

    results = {}
    for n in (cpus_lo, cpus_hi):
        env = dict(os.environ)
        env["RAY_GRAFT_CPUS"] = str(n)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", "--sf-dir", sf_dir],
            capture_output=True, text=True, env=env, cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        if proc.returncode != 0:
            raise RuntimeError(f"scaling worker (num_cpus={n}) failed:\n{proc.stderr[-4000:]}")
        results[n] = json.loads(proc.stdout.strip().splitlines()[-1])

    lo, hi = results[cpus_lo], results[cpus_hi]
    thr = {n: r["rolled_points"] / r["queries"]["tokens_rollup_cascade"] for n, r in results.items()}
    tok = {n: r["ingest_tokens"] / r["queries"]["tokens_ingest_verify"] for n, r in results.items()}
    factor = cpus_hi / cpus_lo
    eff_points = (thr[cpus_hi] / thr[cpus_lo]) / factor
    eff_tokens = (tok[cpus_hi] / tok[cpus_lo]) / factor
    return {
        "metric": "scaling efficiency, rolled-up points/s (and tokens/s ingest), fresh ray sessions",
        "value": round(eff_points, 3),
        "unit": "efficiency",
        "sf": _sf_of(sf_dir),
        "num_cpus": cpus_hi,
        "runs": {
            str(n): {
                "rollup_sec": results[n]["queries"]["tokens_rollup_cascade"],
                "points_per_sec": round(thr[n], 1),
                "ingest_sec": results[n]["queries"]["tokens_ingest_verify"],
                "tokens_per_sec": round(tok[n], 1),
            }
            for n in (cpus_lo, cpus_hi)
        },
        "scaling_efficiency_points": round(eff_points, 3),
        "scaling_efficiency_tokens_ingest": round(eff_tokens, 3),
        "cpu_factor": factor,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--worker", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", DEFAULT_SF_DIR))
    ap.add_argument("--cpus-lo", type=int, default=8)
    ap.add_argument("--cpus-hi", type=int, default=32)
    args = ap.parse_args()

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if args.scaling:
        out = scaling(args.cpus_lo, args.cpus_hi, args.sf_dir)
    elif args.worker:
        out = headline(num_cpus, args.sf_dir, scaling_job_only=True)
    else:
        out = headline(num_cpus, args.sf_dir)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
