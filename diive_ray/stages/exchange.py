"""The engine's exchange layer: explicit hash-partitioned shuffles with
vectorized per-block combines.

Why this exists (measured on this container, Ray 2.49, 32 CPUs):
``Dataset.groupby().aggregate()`` and ``.map_groups()`` pay per-group
Python accumulator costs — a 17k-group aggregate over 80k rows took
42-100 s, and 1.5M groups over 2M rows took 341 s. The same result via
*(vectorized pyarrow partial) -> repartition(keys=...) (hash exchange)
-> (vectorized per-block final)* runs in ~12 s for the 1.5M-group case
(28x) because no Python ever touches an individual group.

The engine therefore standardizes on three primitives:

* ``keyed_blocks(ds, keys)`` — hash-partition rows so every row of a
  key lands in exactly one block (``repartition(n, keys=...)``;
  requires the HASH_SHUFFLE strategy enabled in diive_ray.__init__).
* ``block_map(ds, keys, fn)`` — keyed_blocks + ``map_batches(fn,
  batch_size=None)``: ``fn`` sees each whole block (= all rows of its
  keys) and does vectorized pandas/pyarrow group work inside.
* ``driver_combine(ds, partial_fn, ...)`` — for aggregates whose
  *output* is tiny (per-key moments, spans, maxcounts): vectorized
  per-batch partials, collected and combined on the driver with pandas.
  No shuffle at all; the collected size is bounded by
  (#batches x #keys-per-batch), which the caller asserts is small.

Partition-count default: 2 x available CPUs (enough parallelism for
the final combine without flooding the hash-shuffle aggregator pool).
"""

from __future__ import annotations

from typing import Callable, Iterable

import pandas as pd
import ray
import ray.data


def default_partitions(lo: int = 8, hi: int = 32) -> int:
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(lo, min(hi, cpus))


def keyed_blocks(
    ds: ray.data.Dataset, keys: Iterable[str], num_partitions: int | None = None
) -> ray.data.Dataset:
    """Hash-partition so all rows of a key share one block."""
    n = num_partitions or default_partitions()
    return ds.repartition(n, keys=list(keys))


@ray.remote(num_cpus=0)
class _KeyDisjointnessChecker:
    """Debug-mode guard for block_map's correctness contract.

    block_map relies on ``repartition(n, keys=...)`` producing exactly
    one block per output partition and ``map_batches(batch_size=None)``
    receiving it whole. If Ray Data ever split a large/hot partition
    into multiple blocks (e.g. target_max_block_size at scales beyond
    the tested ones), every consumer (keep-last dedup, fused cascade,
    grouped_block_map) would silently emit duplicate per-group rows.
    This actor records, per distinct key hash, which batch first saw it
    and raises in the mapping task if a second batch sees the same key.
    """

    def __init__(self):
        self.owner: dict = {}

    def check(self, batch_id: str, key_hashes: list) -> list:
        bad = []
        for h in key_hashes:
            prev = self.owner.setdefault(h, batch_id)
            if prev != batch_id:
                bad.append(h)
        return bad


def _validation_enabled() -> bool:
    import os

    return os.environ.get("DIIVE_RAY_VALIDATE_EXCHANGE", "") not in ("", "0")


def _with_disjointness_check(fn: Callable, keys: list, batch_format: str) -> Callable:
    """Wrap fn so each batch registers its distinct key-hash set with a
    shared checker actor and fails loudly if any key appears in two
    batches (debug mode only: DIIVE_RAY_VALIDATE_EXCHANGE=1)."""
    import uuid

    import numpy as np
    import pandas as pd  # noqa: F811 (worker-side import)

    checker = _KeyDisjointnessChecker.remote()

    def wrapped(batch):
        if isinstance(batch, pd.DataFrame):
            kdf = batch[keys]
        else:
            kdf = batch.select(keys).to_pandas()
        hashes = pd.util.hash_pandas_object(kdf, index=False).to_numpy(dtype=np.uint64)
        distinct = np.unique(hashes).tolist()
        bad = ray.get(checker.check.remote(uuid.uuid4().hex, distinct))
        if bad:
            raise RuntimeError(
                f"block_map invariant violated: {len(bad)} key(s) of {keys} "
                "appear in more than one batch after the keyed exchange "
                "(a partition was split into multiple blocks)"
            )
        return fn(batch)

    return wrapped


def block_map(
    ds: ray.data.Dataset,
    keys: Iterable[str],
    fn: Callable,
    *,
    batch_format: str = "pyarrow",
    num_partitions: int | None = None,
    zero_copy_batch: bool = True,
) -> ray.data.Dataset:
    """fn(whole_block) -> block, with key co-location guaranteed.

    Contract: ``repartition(n, keys=...)`` hash-partitions rows so that
    all rows of a key land in ONE output partition, and
    ``map_batches(batch_size=None)`` maps each whole block. Set
    DIIVE_RAY_VALIDATE_EXCHANGE=1 to assert (per run, via a shared
    checker actor) that no key is ever seen by two batches."""
    keys = list(keys)
    if _validation_enabled():
        fn = _with_disjointness_check(fn, keys, batch_format)
    return keyed_blocks(ds, keys, num_partitions).map_batches(
        fn, batch_format=batch_format, batch_size=None, zero_copy_batch=zero_copy_batch
    )


def grouped_block_map(
    ds: ray.data.Dataset,
    keys: Iterable[str],
    group_fn: Callable[[pd.DataFrame], pd.DataFrame],
    *,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Drop-in replacement for ``groupby(keys).map_groups(group_fn)``:
    one hash exchange, then a per-block pandas groupby-apply (pandas'
    per-group overhead is ~us, vs Ray's ~ms)."""
    keys = list(keys)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        def empty_out() -> pd.DataFrame:
            try:
                out = group_fn(df.iloc[0:0])
                if out is not None:
                    return out.iloc[0:0]
            except Exception:
                pass
            return df.iloc[0:0]

        if df.empty:
            return empty_out()
        outs = [group_fn(g) for _, g in df.groupby(keys, sort=False, dropna=False)]
        outs = [o for o in outs if o is not None and len(o)]
        if not outs:
            return empty_out()
        return pd.concat(outs, ignore_index=True)

    return block_map(
        ds, keys, fn, batch_format="pandas", num_partitions=num_partitions, zero_copy_batch=False
    )


def salted_aggregate(
    ds: ray.data.Dataset,
    keys: Iterable[str],
    partial_fn: Callable,
    combine_fn: Callable,
    *,
    salt: int = 8,
    salt_from: str | None = None,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Two-stage aggregation for SKEWED keys (north-rule clause: salted
    keys for hot sources): stage 1 exchanges on (keys + _salt) — a hot
    key spreads over ``salt`` partitions — and combines per block;
    stage 2 exchanges the (salt x keys)-sized partials on the bare keys
    and combines again. Only valid for algebraic aggregates (the
    partial/combine pair must be associative).

    ``salt_from``: column whose stable hash provides the salt (e.g.
    ``doc_id``); default is a row-position salt (round-robin within
    batch), which balances perfectly but is arrival-order dependent —
    fine for algebraic combines.

    partial_fn(df, gkeys) -> partial rows grouped by gkeys;
    combine_fn(df, keys) -> final rows grouped by keys.
    """
    import zlib

    import numpy as np

    keys = list(keys)

    def add_salt(df: pd.DataFrame) -> pd.DataFrame:
        if salt_from is not None:
            s = np.array([zlib.crc32(str(v).encode()) % salt for v in df[salt_from]], dtype=np.int64)
        else:
            s = np.arange(len(df), dtype=np.int64) % salt
        return df.assign(_salt=s)

    stage1 = block_map(
        ds.map_batches(add_salt, batch_format="pandas"),
        keys + ["_salt"],
        lambda df: partial_fn(df, keys + ["_salt"]),
        batch_format="pandas",
        num_partitions=num_partitions,
        zero_copy_batch=False,
    )
    return block_map(
        stage1,
        keys,
        lambda df: combine_fn(df.drop(columns=["_salt"], errors="ignore"), keys),
        batch_format="pandas",
        num_partitions=num_partitions,
        zero_copy_batch=False,
    )


def driver_combine(
    ds: ray.data.Dataset,
    partial_fn: Callable,
    combine_fn: Callable[[pd.DataFrame], pd.DataFrame],
    *,
    batch_format: str = "pyarrow",
) -> pd.DataFrame:
    """Tiny-result aggregate: per-batch vectorized partials -> driver
    pandas combine. Collected volume = partial rows per batch x batches
    (caller guarantees small, e.g. one row per key per batch)."""
    parts = ds.map_batches(partial_fn, batch_format=batch_format).to_pandas()
    return combine_fn(parts)
