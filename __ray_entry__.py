"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash ->
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in diive_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: the raw->1m->1h->1d
    rollup cascade over the events table via the single-exchange fused
    plan (diive_ray/pipelines/rollup.py:cascade_fused), returning the
    1h tier."""
    from diive_ray.pipelines.rollup import events_cascade_fused

    fused = events_cascade_fused("/root/testdata/sf0.001")
    return fused.filter(expr="tier == '1h'").drop_columns(["tier", "n_child"])


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2.
    See diive_ray/pipelines/queries.py. Oracle-bearing queries are
    listed FIRST (rows-only entries last) so a driver that bounds the
    number of recorded rows still exercises every exact-checkable
    operator."""
    from diive_ray.pipelines.queries import ORACLE, QUERIES

    ordered = {k: v for k, v in QUERIES.items() if k in ORACLE}
    ordered.update({k: v for k, v in QUERIES.items() if k not in ORACLE})
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted for ops whose
    semantics are not SQL-expressible -> driver records rows-only)."""
    from diive_ray.pipelines.queries import ORACLE

    return dict(ORACLE)
