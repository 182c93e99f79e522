"""Training-data assembly tier: sequence packing, deterministic
source-weighted sampling, and benchmark decontamination.

Engine additions beyond holukas/diive (driver-brief training-data
operators). The packing rule is the standard GPT-style concat-and-chunk:
documents are concatenated in ``doc_id`` order into one token stream and
the stream is cut into fixed-length sequences of ``seq_len`` tokens
(documents may span sequence boundaries). The distributed problem is the
ordered prefix sum over a dataset whose blocks arrive unordered:

1. token counts are computed once (vectorized Arrow kernel) and
   materialized as a tiny 3-int-column dataset — the text payload is
   read exactly once and never shuffled;
2. docs are bucketed by ``doc_id // bucket_width``; per-bucket token
   sums are combined on the driver (one row per bucket — bounded, and
   at 100 TB still ~millions of int rows, a driver-side cumsum) into
   exclusive bucket base offsets, broadcast via ``ray.put``;
3. ONE keyed exchange co-locates each bucket; within a block the
   in-bucket exclusive cumsum plus the broadcast base gives every doc
   its exact global offset, and each doc's per-sequence contributions
   (token overlap with each seq window it spans) are emitted fully
   vectorized (repeat/arange, no Python loop) and pre-aggregated per
   sequence before leaving the block;
4. a second keyed exchange on ``seq_id`` merges the (at most
   blocks-per-seq) partials into final per-sequence stats.

Deterministic sampling uses the Knuth multiplicative hash
``(id * 2654435761) mod 2^32 mod 100 < rate`` — stable across cluster
sizes and spellable verbatim in SQL.

Decontamination flags documents sharing any k-word-gram with a
broadcast benchmark set. Membership is tested on the 64-bit mixed gram
hashes from functions/text.py:batch_shingle_hashes (np.isin against the
sorted benchmark array); with G total grams the probability any
collision perturbs the result is < G^2/2^64 (~1e-11 at test scale),
the same argument as the MinHash oracle-parity note.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions import text as tx
from .ale import _get_broadcast
from .exchange import block_map, driver_combine


# ------------------------------------------------------------- packing


def pack_sequences(
    ds: rd.Dataset,
    *,
    count_fn: Callable[[pa.Array], pa.Array] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 512,
    bucket_width: int = 4096,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Per-sequence packing stats for GPT-style concat-and-chunk.

    Returns a Dataset with one row per packed sequence: ``seq_id``,
    ``n_docs`` (docs contributing >= 1 token), ``n_tokens`` (== seq_len
    except for the final partial sequence), ``n_starts`` (docs whose
    first token lands in this sequence). Zero-token docs are skipped,
    matching the SQL oracle's ``WHERE n > 0``.
    """
    cfn = count_fn or tx.word_counts

    def counts(t: pa.Table) -> pd.DataFrame:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.asarray(cfn(t[text_col].combine_chunks()), dtype=np.int64)
        keep = n > 0
        ids, n = ids[keep], n[keep]
        return pd.DataFrame(
            {"id": ids, "bucket": ids // bucket_width, "n": n}
        )

    cnt = ds.map_batches(counts, batch_format="pyarrow").materialize()

    # per-bucket token sums -> exclusive global base offsets (driver)
    totals = driver_combine(
        cnt,
        lambda df: df.groupby("bucket", as_index=False)["n"].sum(),
        lambda df: df.groupby("bucket", as_index=False)["n"].sum()
        if len(df)
        else df,
        batch_format="pandas",
    ).sort_values("bucket")
    buckets = totals["bucket"].to_numpy(dtype=np.int64)
    sums = totals["n"].to_numpy(dtype=np.int64)
    bases = np.cumsum(sums) - sums
    base_ref = ray.put((buckets, bases))

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "seq_id": pd.Series([], dtype=np.int64),
                    "n_docs": pd.Series([], dtype=np.int64),
                    "n_tokens": pd.Series([], dtype=np.int64),
                    "n_starts": pd.Series([], dtype=np.int64),
                }
            )
        df = df.sort_values(["bucket", "id"])
        b = df["bucket"].to_numpy(dtype=np.int64)
        n = df["n"].to_numpy(dtype=np.int64)
        cs = np.cumsum(n) - n
        seg = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        seg_base = np.repeat(cs[seg], np.diff(np.r_[seg, len(b)]))
        bk, bb = _get_broadcast(base_ref)
        s = bb[np.searchsorted(bk, b)] + (cs - seg_base)
        e = s + n
        first = s // seq_len
        cntv = (e - 1) // seq_len - first + 1
        tot = int(cntv.sum())
        off = np.repeat(np.cumsum(cntv) - cntv, cntv)
        seq = np.repeat(first, cntv) + (np.arange(tot, dtype=np.int64) - off)
        srep = np.repeat(s, cntv)
        erep = np.repeat(e, cntv)
        tok = np.minimum(erep, (seq + 1) * seq_len) - np.maximum(srep, seq * seq_len)
        started = (srep >= seq * seq_len).astype(np.int64)
        g = pd.DataFrame(
            {"seq_id": seq, "n_docs": 1, "n_tokens": tok, "n_starts": started}
        ).groupby("seq_id", as_index=False).sum()
        return g.astype(np.int64)

    partials = block_map(
        cnt, ["bucket"], emit, batch_format="pandas",
        num_partitions=num_partitions, zero_copy_batch=False,
    )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        return (
            df.groupby("seq_id", as_index=False)[["n_docs", "n_tokens", "n_starts"]]
            .sum()
            .astype(np.int64)
        )

    return block_map(
        partials, ["seq_id"], combine, batch_format="pandas",
        num_partitions=num_partitions, zero_copy_batch=False,
    )


# ------------------------------------------------- deterministic sample


KNUTH = np.uint64(2654435761)


def keep_mask(ids: np.ndarray, rates_pct: np.ndarray) -> np.ndarray:
    """Deterministic per-row sampling: keep row i iff
    ``(ids[i] * 2654435761) mod 2^32 mod 100 < rates_pct[i]``.
    Stable under any partitioning / cluster size; SQL-identical."""
    with np.errstate(over="ignore"):
        h = (ids.astype(np.uint64) * KNUTH) % np.uint64(2**32) % np.uint64(100)
    return h < rates_pct.astype(np.uint64)


def sample_by_source(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    source_col: str = "source",
    rate_fn: Callable[[np.ndarray], np.ndarray] | None = None,
) -> rd.Dataset:
    """Source-weighted mixing filter: per-source keep rate (percent)
    from ``rate_fn(source_array) -> int array``, deterministic hash
    sampling on the id. One streaming map_batches, no shuffle."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.asarray(t[source_col].to_pylist(), dtype=object)
        rates = rate_fn(src)
        return t.filter(pa.array(keep_mask(ids, rates)))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------ decontamination


def collect_benchmark_grams(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    bench_mod: int = 101,
) -> np.ndarray:
    """Sorted distinct k-gram hashes of the benchmark subset
    (``doc_id % bench_mod == 0``). The benchmark set is small by
    construction (real decontamination sets are eval suites, a few MB)
    — collected to the driver and broadcast, never shuffled."""

    def grams(t: pa.Table) -> pd.DataFrame:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = ids % bench_mod == 0
        if not m.any():
            return pd.DataFrame({"h": pd.Series([], dtype=np.uint64)})
        texts = [x or "" for x in t.filter(pa.array(m))[text_col].to_pylist()]
        sets = tx.batch_shingle_hashes(texts, k=k)
        allh = np.unique(np.concatenate(sets)) if sets else np.array([], dtype=np.uint64)
        return pd.DataFrame({"h": allh})

    parts = ds.map_batches(grams, batch_format="pyarrow").to_pandas()
    return np.unique(parts["h"].to_numpy(dtype=np.uint64))


def decontaminate(
    ds: rd.Dataset,
    bench_hashes: np.ndarray,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    bench_mod: int = 101,
) -> rd.Dataset:
    """Per-doc contamination: number of distinct k-grams shared with the
    broadcast benchmark set (benchmark docs themselves excluded).
    Vectorized per batch: one dictionary-encoded gram-hash pass, one
    np.isin against the sorted benchmark array."""
    ref = ray.put(np.sort(bench_hashes))

    def fn(t: pa.Table) -> pd.DataFrame:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = ids % bench_mod != 0
        ids = ids[m]
        if len(ids) == 0:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype=np.int64),
                 "n_hits": pd.Series([], dtype=np.int64)}
            )
        texts = [x or "" for x in t.filter(pa.array(m))[text_col].to_pylist()]
        bh = _get_broadcast(ref)
        sets = tx.batch_shingle_hashes(texts, k=k)
        lens = np.array([len(s) for s in sets], dtype=np.int64)
        if lens.sum():
            flat = np.concatenate([s for s in sets if len(s)])
            hits = np.isin(flat, bh)
            doc_idx = np.repeat(np.arange(len(ids)), lens)
            n_hits = np.bincount(doc_idx[hits], minlength=len(ids))
        else:
            n_hits = np.zeros(len(ids), dtype=np.int64)
        return pd.DataFrame({"doc_id": ids, "n_hits": n_hits.astype(np.int64)})

    return ds.map_batches(fn, batch_format="pyarrow")


def hash_sample_topk(
    ds,
    *,
    k: int,
    id_col: str = "doc_id",
    keys: "list[str] | None" = None,
    num_partitions: int | None = None,
) -> "pd.DataFrame":
    """Deterministic uniform k-sample [per keys] without randomness:
    rank rows by a Knuth multiplicative hash of ``id_col`` and keep the
    k smallest per group — reproducible across runs, cluster sizes and
    partitionings (the property plain reservoir sampling lacks: its
    result depends on arrival order), and SQL-replayable (the hash is
    plain integer arithmetic, so the oracle can spell it verbatim).

    Distribution: per-batch vectorized partial top-k (each batch emits
    ≤ k rows per group it touches), ONE tiny exchange on keys combining
    partials — the corpus never moves, only candidate ids. Output:
    (keys..., id_col, h, rk)."""
    import numpy as np
    import pandas as pd

    from .exchange import block_map

    gkeys = list(keys or [])

    def _hash(ids: np.ndarray) -> np.ndarray:
        return ((ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(4294967296)).astype(np.int64)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.assign(h=pd.Series([], dtype=np.int64))
        df = df.assign(h=_hash(df[id_col].to_numpy(dtype=np.int64)))
        df = df.sort_values(gkeys + ["h", id_col], kind="stable")
        return df.groupby(gkeys, sort=False).head(k) if gkeys else df.head(k)

    pre = ds.map_batches(partial, batch_format="pandas")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.assign(rk=pd.Series([], dtype=np.int64))
        df = df.sort_values(gkeys + ["h", id_col], kind="stable")
        df = df.groupby(gkeys, sort=False).head(k) if gkeys else df.head(k)
        df = df.copy()
        df["rk"] = (df.groupby(gkeys).cumcount() + 1).astype(np.int64) if gkeys else np.arange(1, len(df) + 1, dtype=np.int64)
        return df

    if gkeys:
        out = block_map(pre, gkeys, combine, batch_format="pandas",
                        num_partitions=num_partitions, zero_copy_batch=False).to_pandas()
    else:
        from .exchange import driver_combine
        out = driver_combine(pre, lambda d: d, combine, batch_format="pandas")
    return out.sort_values(gkeys + ["rk"]).reset_index(drop=True)


def global_shuffle_order(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    n_buckets: int | None = None,
    num_partitions: int | None = None,
    payload: bool = False,
) -> rd.Dataset:
    """Deterministic global training-order shuffle: rank every row by
    the Knuth multiplicative hash of ``id_col`` — a reproducible
    pseudorandom permutation of the corpus (identical at any cluster
    size / partitioning / arrival order), i.e. the "global shuffle
    before training" step of an LLM data pipeline, without the
    random_shuffle() nondeterminism that breaks resumability.

    Distributed shape: h is uniform on [0, 2^32), so FIXED hash ranges
    are already balanced buckets — no sampling pass, unlike a generic
    distributed sort. (1) one slim counting pass over (id) -> per-bucket
    counts, driver exclusive cumsum (n_buckets rows, bounded), offsets
    broadcast via ray.put; (2) ONE keyed exchange on the bucket label;
    in-block sort by (h, id) + broadcast base offset assigns every row
    its exact global position, fully vectorized. Output: a streaming
    Dataset of (id, h, pos, bucket) — writing it partitioned by
    ``bucket`` yields shard files that concatenate in global order
    (each bucket owns the contiguous range [offset_b, offset_b+n_b)).

    ``payload=True`` carries ALL input columns through the exchange
    (for shard writing — the payload moves exactly once); the counting
    pass stays id-only either way."""
    from .exchange import default_partitions

    nb = int(n_buckets or default_partitions())
    width = -(-(1 << 32) // nb)  # ceil(2^32 / nb)

    def _hash(ids: np.ndarray) -> np.ndarray:
        return ((ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)).astype(np.int64)

    def counts(t: pa.Table) -> pd.DataFrame:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        b = _hash(ids) // width
        ub, c = np.unique(b, return_counts=True)
        return pd.DataFrame({"bucket": ub.astype(np.int64), "n": c.astype(np.int64)})

    def combine(df: pd.DataFrame) -> np.ndarray:
        per = df.groupby("bucket")["n"].sum().reindex(range(nb), fill_value=0).to_numpy()
        off = np.zeros(nb, dtype=np.int64)
        np.cumsum(per[:-1], out=off[1:])
        return off

    slim = ds.map_batches(lambda t: t.select([id_col]), batch_format="pyarrow",
                          zero_copy_batch=True)
    offsets_ref = ray.put(driver_combine(slim, counts, combine))

    def label(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        h = _hash(ids)
        t = t.append_column("h", pa.array(h, type=pa.int64()))
        return t.append_column("bucket", pa.array(h // width, type=pa.int64()))

    def position(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.assign(pos=pd.Series([], dtype=np.int64))
        offsets = _get_broadcast(offsets_ref)
        df = df.sort_values(["bucket", "h", id_col], kind="stable").reset_index(drop=True)
        b = df["bucket"].to_numpy()
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        in_bucket = np.arange(len(b)) - np.repeat(starts, np.diff(np.r_[starts, len(b)]))
        df["pos"] = offsets[b] + in_bucket
        return df

    src = ds if payload else slim
    labeled = src.map_batches(label, batch_format="pyarrow", zero_copy_batch=True)
    return block_map(labeled, ["bucket"], position, batch_format="pandas",
                     num_partitions=num_partitions, zero_copy_batch=False)


def write_training_shards(
    ds: rd.Dataset,
    outdir: str,
    *,
    id_col: str = "doc_id",
    n_buckets: int | None = None,
    num_partitions: int | None = None,
) -> pd.DataFrame:
    """Materialize the deterministic global shuffle as training shards:
    one parquet file per hash bucket, rows in global order inside each
    file, shard files concatenating (by shard_id) to the full shuffled
    corpus. The payload moves through exactly ONE exchange; each block
    writes its buckets' files independently (resumable: a rerun can
    skip shard files that already exist). Returns the shard manifest
    (shard_id, n_rows, pos_min, pos_max, path), sorted."""
    import os

    ordered = global_shuffle_order(
        ds, id_col=id_col, n_buckets=n_buckets,
        num_partitions=num_partitions, payload=True,
    )
    os.makedirs(outdir, exist_ok=True)

    def write_block(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["shard_id", "n_rows", "pos_min", "pos_max", "path"]
        if df.empty:
            return pd.DataFrame({c: pd.Series([], dtype=np.int64 if c != "path" else object)
                                 for c in cols})
        rows = []
        for b, sdf in df.groupby("bucket", sort=True):
            sdf = sdf.sort_values("pos")
            path = os.path.join(outdir, f"shard_{int(b):06d}.parquet")
            sdf.drop(columns=["bucket"]).to_parquet(path, index=False)
            rows.append((int(b), len(sdf), int(sdf["pos"].iloc[0]),
                         int(sdf["pos"].iloc[-1]), path))
        out = pd.DataFrame(rows, columns=cols)
        for c in cols[:-1]:
            out[c] = out[c].astype(np.int64)
        return out

    # batch_size=None maps WHOLE blocks, so each bucket's rows arrive
    # together (block_map's one-block-per-key contract upstream).
    manifest = ordered.map_batches(
        write_block, batch_format="pandas", batch_size=None
    ).to_pandas()
    return manifest.sort_values("shard_id").reset_index(drop=True)


# --------------------------------------------- temperature source mixing


def temperature_mix(
    ds: rd.Dataset,
    *,
    source_col: str = "source",
    text_col: str = "text",
    tau: float = 0.7,
    budget_tokens: int = 100_000,
) -> pd.DataFrame:
    """Temperature-scaled multinomial source mixing (the multilingual /
    multi-source sampling rule of Arivazhagan et al. 2019
    arXiv:1907.05019, used for LM corpus mixing e.g. in XLM-R and
    mT5): per-source token counts n_s -> sampling weight
    w_s = n_s^tau / sum n^tau, plus the sampled token allocation at a
    token budget and the implied epochs over each source
    (allocation / n_s; tau < 1 upsamples small sources).

    100-TB shape: per-batch vectorized (source x token-count) partials,
    driver combine bounded by the source count — the text never
    shuffles and nothing materializes."""

    def partial(t: pa.Table) -> pd.DataFrame:
        n_tok = tx.word_counts(t[text_col]).to_numpy(zero_copy_only=False)
        g = pd.DataFrame({
            source_col: t[source_col].to_numpy(zero_copy_only=False),
            "n_tokens": n_tok,
        }).groupby(source_col, as_index=False)["n_tokens"].sum()
        return g

    tot = driver_combine(
        ds, partial,
        lambda df: df.groupby(source_col, as_index=False)["n_tokens"].sum(),
    ).sort_values(source_col).reset_index(drop=True)
    n = tot["n_tokens"].to_numpy(dtype=np.float64)
    pw = np.power(n, tau)
    w = pw / pw.sum()
    alloc = w * float(budget_tokens)
    return pd.DataFrame({
        source_col: tot[source_col],
        "n_tokens": tot["n_tokens"].astype(np.int64),
        "weight": w,
        "sampled_tokens": alloc,
        "epochs": alloc / n,
    })


def neyman_sample(
    ds,
    *,
    total: int,
    strat_col: str = "source",
    var_col: str = "n_chars",
    id_col: str = "doc_id",
) -> "pd.DataFrame":
    """Neyman-allocation stratified sampling (Neyman 1934): a budget of
    ``total`` rows is split across strata proportionally to N_s * sigma_s
    (stratum size x stddev of ``var_col``), which minimizes the variance
    of the stratified mean estimator; selection within a stratum is the
    deterministic Knuth-hash ranking of ``hash_sample_topk``.

    Allocation is EXACT INTEGER arithmetic so the SQL oracle replays it
    bit-for-bit: with integer moment partials n_s, sum_s, sumsq_s,

        S2_s    = n_s * sumsq_s - sum_s^2       (= n_s^2 * popvar, exact)
        w_s     = floor(sqrt(S2_s))             (~ n_s * sigma_s)
        alloc_s = total * w_s // sum_t w_t      (floor division)

    IEEE-754 sqrt is correctly rounded, so floor(sqrt(int)) matches
    DuckDB's FLOOR(SQRT(..)) exactly while S2_s < 2^53 (holds to ~1e8
    rows x 1e3 values per stratum; shard strata beyond that). Constant
    strata (sigma = 0) get no allocation, the rounding shortfall
    (sum alloc_s <= total) is by design, and an allocation exceeding a
    stratum's population simply keeps the whole stratum (no
    redistribution pass — n_alloc reports the raw allocation).

    Distribution: ONE column-pruned partials pass (3 ints per
    (batch, stratum)) + bounded driver combine for the allocation; ONE
    partial-top-k pass + keyed exchange for selection — the corpus
    never moves. Output: (strat_col, id_col, h, rk, n_alloc)."""
    import math

    import numpy as np
    import pandas as pd

    from .exchange import block_map, driver_combine

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                strat_col: pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
                "s1": pd.Series([], dtype=np.int64),
                "s2": pd.Series([], dtype=np.int64),
            })
        x = df[var_col].to_numpy(dtype=np.int64)
        g = df.assign(n=1, s1=x, s2=x * x).groupby(strat_col, sort=False)
        return g[["n", "s1", "s2"]].sum().reset_index()

    def alloc_combine(parts: pd.DataFrame) -> pd.DataFrame:
        g = parts.groupby(strat_col, sort=True)[["n", "s1", "s2"]].sum()
        # exact ints via Python bignum (pandas sum stays int64-safe at
        # the documented bound; .astype(object) guards the product)
        s2 = (g["n"].astype(object) * g["s2"].astype(object)
              - g["s1"].astype(object) ** 2)
        w = np.array([math.floor(math.sqrt(float(v))) for v in s2], dtype=np.int64)
        wsum = int(w.sum())
        alloc = (total * w) // max(wsum, 1)
        return pd.DataFrame({
            strat_col: g.index.to_numpy(),
            "n_alloc": alloc.astype(np.int64),
        })

    alloc_df = driver_combine(
        ds.map_batches(moments, batch_format="pandas"),
        lambda df: df, alloc_combine, batch_format="pandas",
    )
    alloc = dict(zip(alloc_df[strat_col], alloc_df["n_alloc"]))
    kmax = int(max(alloc.values(), default=0))
    if kmax == 0:
        return pd.DataFrame({
            strat_col: pd.Series([], dtype=object),
            id_col: pd.Series([], dtype=np.int64),
            "h": pd.Series([], dtype=np.int64),
            "rk": pd.Series([], dtype=np.int64),
            "n_alloc": pd.Series([], dtype=np.int64),
        })

    def _hash(ids: np.ndarray) -> np.ndarray:
        return ((ids.astype(np.uint64) * np.uint64(2654435761))
                % np.uint64(4294967296)).astype(np.int64)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                strat_col: pd.Series([], dtype=object),
                id_col: pd.Series([], dtype=np.int64),
                "h": pd.Series([], dtype=np.int64),
            })
        df = df[[strat_col, id_col]].copy()
        df["h"] = _hash(df[id_col].to_numpy(dtype=np.int64))
        df = df.sort_values([strat_col, "h", id_col], kind="stable")
        # per-batch partial top-k at each stratum's own allocation
        df["__rk"] = df.groupby(strat_col, sort=False).cumcount()
        df["__k"] = df[strat_col].map(alloc).fillna(0).astype(np.int64)
        return df[df["__rk"] < df["__k"]][[strat_col, id_col, "h"]]

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                strat_col: pd.Series([], dtype=object),
                id_col: pd.Series([], dtype=np.int64),
                "h": pd.Series([], dtype=np.int64),
                "rk": pd.Series([], dtype=np.int64),
            })
        df = df.sort_values([strat_col, "h", id_col], kind="stable").copy()
        df["rk"] = (df.groupby(strat_col, sort=False).cumcount() + 1).astype(np.int64)
        df["__k"] = df[strat_col].map(alloc).fillna(0).astype(np.int64)
        return df[df["rk"] <= df["__k"]][[strat_col, id_col, "h", "rk"]]

    out = block_map(
        ds.select_columns([strat_col, id_col]).map_batches(partial, batch_format="pandas"),
        [strat_col], combine, batch_format="pandas", zero_copy_batch=False,
    ).to_pandas()
    out["n_alloc"] = out[strat_col].map(alloc).astype(np.int64)
    return out.sort_values([strat_col, "rk"]).reset_index(drop=True)
