#!/usr/bin/env python
"""Six-pair scaling sweep with steal-probe hygiene (VERDICT r4 #5).

Runs ``bench.py --scaling --pair-only`` N times back-to-back, keeps
each pair's per-leg probe fields, and reports:

* every pair's efficiency + contamination verdict (bench.py's
  probe_ratio / probe_spread thresholds),
* the median over ALL pairs and over the CLEAN pairs only — the
  number BASELINE.md records.

Usage:
    python jobs/scaling_sweep.py [--pairs 6] [--cpus-lo 2]
        [--cpus-hi 8] [--scale-fixture scale128] [--out sweep.json]

Run on a quiet host: any concurrent load lands in the probe fields and
flags the pair instead of silently skewing the median.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=6)
    ap.add_argument("--cpus-lo", type=int, default=2)
    ap.add_argument("--cpus-hi", type=int, default=8)
    ap.add_argument("--scale-fixture", default="scale128")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    pairs = []
    for i in range(args.pairs):
        cmd = [sys.executable, os.path.join(REPO, "bench.py"),
               "--scaling", "--pair-only",
               "--cpus-lo", str(args.cpus_lo),
               "--cpus-hi", str(args.cpus_hi),
               "--scale-fixture", args.scale_fixture]
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              cwd=REPO)
        if proc.returncode != 0:
            raise RuntimeError(
                f"sweep pair {i} failed:\n{proc.stderr[-3000:]}")
        d = json.loads(proc.stdout.strip().splitlines()[-1])
        pairs.append({
            "eff_points": d["value"],
            "eff_tokens": d[
                f"scaling_efficiency_tokens_ingest_"
                f"{args.cpus_lo}to{args.cpus_hi}"],
            "contaminated": d["contaminated"],
            "probe_spread": d["probe_spread"],
            "runs": {n: {"rollup_sec": r["rollup_sec"],
                         "probe_ratio": r["probe_ratio"]}
                     for n, r in d["runs"].items()},
        })
        print(json.dumps({"pair": i, **{k: pairs[-1][k] for k in
                                        ("eff_points", "contaminated",
                                         "probe_spread")}}),
              flush=True)

    effs = [p["eff_points"] for p in pairs]
    clean = [p["eff_points"] for p in pairs if not p["contaminated"]]
    out = {
        "metric": (f"scaling sweep {args.cpus_lo}->{args.cpus_hi} "
                   f"({args.pairs} pairs, {args.scale_fixture})"),
        "pairs": pairs,
        "median_all": round(statistics.median(effs), 3),
        "median_clean": (round(statistics.median(clean), 3)
                         if clean else None),
        "n_clean": len(clean),
        "value": (round(statistics.median(clean), 3)
                  if clean else round(statistics.median(effs), 3)),
        "unit": "efficiency",
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
