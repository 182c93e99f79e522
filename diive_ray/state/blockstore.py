"""Raw-tier compressed block store: Gorilla blocks keyed by
(source, time-bucket).

North-rule component (BASELINE.json): per-partition state holding
delta-of-delta timestamp blocks + XOR value blocks. The physical plan
is Ray-Data-first:

* ``compress_blocks`` — assign block_id = ts // span per batch, then
  ``groupby(keys + block_id).map_groups(compress)``: one hash shuffle
  of (ts, value) pairs only (tokens and other wide columns are pruned
  upstream), each group compresses independently, output is one row
  per block (binary blobs + count + checksum) — ~10-50x smaller than
  raw, written as partitioned Parquet.
* ``decompress_blocks`` — stateless map_batches decode (each block row
  expands back to its points; exactness pinned by tests).
* ``BlockLookupActor`` — the one genuinely non-Dataset piece: a shared
  point-lookup index over a written block store (raw @ray.remote actor,
  per SURVEY.md §2.9: "incremental state appears only as the
  per-partition compressed block store").

Checksum = int64 sum of raw value bits per block, so a resumed /
recompressed run can be verified block-by-block without decoding.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..util import ts_to_us
from . import gorilla


def compress_blocks(
    ds: ray.data.Dataset,
    *,
    block_span_us: int,
    keys: Iterable[str] = ("source",),
    ts_col: str = "ts",
    value_col: str = "n_tok",
) -> ray.data.Dataset:
    """One row per (keys..., block_start) with compressed ts/value blobs."""
    keys = list(keys)

    def assign(t: pa.Table) -> pa.Table:
        us = ts_to_us(t[ts_col])
        block = (us // block_span_us) * block_span_us
        return t.append_column("block_start", pa.array(block, pa.int64()))

    def compress(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(ts_col, kind="stable")
        us = ts_to_us(df[ts_col])
        vals = df[value_col].to_numpy(dtype=np.float64)
        ts_blob = gorilla.encode_timestamps(us)
        val_blob = gorilla.encode_values(vals)
        checksum = int(vals.view(np.uint64).astype(np.int64).sum())  # wraps mod 2^64
        row = {k: [df[k].iloc[0]] for k in keys}
        row.update({
            "block_start": [int(df["block_start"].iloc[0])],
            "n": [len(df)],
            "ts_blob": [ts_blob],
            "val_blob": [val_blob],
            "checksum": [checksum],
            "raw_bytes": [len(df) * 16],
            "packed_bytes": [len(ts_blob) + len(val_blob)],
        })
        return pd.DataFrame(row)

    pruned = ds.map_batches(
        lambda t: t.select(keys + [ts_col, value_col]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    from ..stages.exchange import grouped_block_map

    return grouped_block_map(
        pruned.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True),
        keys + ["block_start"],
        compress,
    )


def decompress_blocks(
    block_ds: ray.data.Dataset,
    *,
    keys: Iterable[str] = ("source",),
    ts_col: str = "ts",
    value_col: str = "n_tok",
) -> ray.data.Dataset:
    """Inverse of compress_blocks: expand each block row to its points."""
    keys = list(keys)

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, r in df.iterrows():
            ts = gorilla.decode_timestamps(r["ts_blob"])
            vals = gorilla.decode_values(r["val_blob"])
            f = pd.DataFrame({ts_col: pd.to_datetime(ts, unit="us"), value_col: vals})
            for k in keys:
                f[k] = r[k]
            frames.append(f)
        if not frames:
            return pd.DataFrame(columns=keys + [ts_col, value_col])
        return pd.concat(frames, ignore_index=True)

    return block_ds.map_batches(expand, batch_format="pandas")


@ray.remote
class BlockLookupActor:
    """Shared point-lookup index over a written block-store Parquet dir:
    loads the (key, block_start) -> blobs index once, serves
    ``lookup(source, ts_us)`` point reads by decoding only the one
    block that covers the timestamp. The Dataset API cannot express a
    low-latency point lookup — this is the documented raw-actor
    escape hatch."""

    def __init__(self, block_dir: str, block_span_us: int, key_col: str = "source"):
        import pyarrow.parquet as pq

        self.span = block_span_us
        t = pq.read_table(block_dir)
        self.index = {}
        for i in range(t.num_rows):
            key = (t[key_col][i].as_py(), t["block_start"][i].as_py())
            self.index[key] = (t["ts_blob"][i].as_py(), t["val_blob"][i].as_py())

    def lookup(self, source: str, ts_us: int):
        block = (ts_us // self.span) * self.span
        blobs = self.index.get((source, block))
        if blobs is None:
            return None
        ts = gorilla.decode_timestamps(blobs[0])
        pos = np.searchsorted(ts, ts_us)
        if pos >= len(ts) or ts[pos] != ts_us:
            return None
        return float(gorilla.decode_values(blobs[1])[pos])

    def n_blocks(self) -> int:
        return len(self.index)
