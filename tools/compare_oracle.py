"""Driver-style correctness compare, stricter than the driver itself.

Runs every ``queries()`` entry against its ``oracle_sql()`` DuckDB oracle
at a given sf dir and compares:

* row count,
* column-name set,
* per-column dtype KIND after a canonical pandas conversion (int vs
  float vs datetime vs object — the driver's value hash is sensitive to
  representation, e.g. DuckDB SUM(BIGINT) -> HUGEINT -> float64),
* null masks,
* exact values (bit-level for floats after both sides' ROUND(.,6)).

Usage:
    python tools/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_canonical(obj) -> pd.DataFrame:
    """Canonical pandas frame: the conversion path the driver plausibly
    uses (Dataset/Table/DataFrame -> pandas), columns sorted by name,
    rows sorted by every column."""
    import pyarrow as pa
    import ray.data as rd

    if isinstance(obj, rd.Dataset):
        df = obj.to_pandas()
    elif isinstance(obj, pa.Table):
        df = obj.to_pandas()
    elif isinstance(obj, pd.DataFrame):
        df = obj
    else:
        raise TypeError(type(obj))
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


def _kind(s: pd.Series) -> str:
    k = s.dtype.kind
    return {"i": "int", "u": "int", "f": "float", "M": "ts", "O": "obj", "b": "bool"}.get(k, k)


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    problems = []
    if len(got) != len(exp):
        return [f"rows {len(got)} != {len(exp)}"]
    if list(got.columns) != list(exp.columns):
        return [f"cols {list(got.columns)} != {list(exp.columns)}"]
    for c in got.columns:
        g, e = got[c], exp[c]
        if _kind(g) != _kind(e):
            problems.append(f"dtype[{c}] {g.dtype} vs {e.dtype}")
            continue
        gn, en = g.isna().to_numpy(), e.isna().to_numpy()
        if not np.array_equal(gn, en):
            problems.append(f"nullmask[{c}] differs ({gn.sum()} vs {en.sum()})")
            continue
        if _kind(g) == "float":
            gv, ev = g.to_numpy(float), e.to_numpy(float)
            bad = ~(np.isclose(gv, ev, rtol=0, atol=0, equal_nan=True))
            if bad.any():
                i = int(np.argmax(bad))
                problems.append(
                    f"values[{c}] {int(bad.sum())} differ bit-level; first row {i}: "
                    f"{gv[i]!r} vs {ev[i]!r}"
                )
        else:
            if not g.astype(str).equals(e.astype(str)):
                neq = (g.astype(str) != e.astype(str)).to_numpy()
                i = int(np.argmax(neq))
                problems.append(
                    f"values[{c}] {int(neq.sum())} differ; first row {i}: "
                    f"{g.iloc[i]!r} vs {e.iloc[i]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
                 include_dashboard=False, logging_level="ERROR")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as mod

    qs, oracles = mod.queries(), mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = n_noracle = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_canonical(fn(sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: query raised {exc!r}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            n_noracle += 1
            print(f"rows  {name}: {len(got)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            exp = to_canonical(con.execute(sql).df())
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: oracle raised {exc!r}")
            n_fail += 1
            continue
        problems = compare(name, got, exp)
        if problems:
            n_fail += 1
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            n_pass += 1
            print(f"pass  {name}: {len(got)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
