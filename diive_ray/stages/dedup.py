"""Deduplication stages for the documents corpus — exact, MinHash+LSH,
SimHash, blocked n-gram Jaccard, and embedding-cosine near-dup.

Engine additions for the training-data mission (no reference
counterpart; the reference's only dedup is exact keep-last on
timestamps, diive/core/times/times.py:1409-1459 — reused here as the
hash-partition + per-group-first pattern).

Scale design (the partitioning assumptions each stage relies on):

* ``exact_dedup`` — digest computed per batch (vectorized polynomial
  fingerprint x 2 seeds -> 62-bit key), then hash-shuffle
  ``groupby(digest)`` + per-group keep-min-id. One all-to-all on a
  16-byte key per doc, never on the text payload.
* ``minhash_lsh_*`` — per-batch vectorized shingle->minhash signatures;
  band buckets emitted as (band, band_hash, doc_id) rows (b x n small
  rows); ``groupby(band, band_hash)`` yields candidate groups; exact
  Jaccard verification joins shingle sets back ONLY for candidate docs
  (broadcast candidate-id set; shingles recomputed per batch — cheaper
  than shuffling shingle sets for the whole corpus). Candidate volume
  is assumed << corpus (true for dedup-grade thresholds); verified
  pairs and the union-find over them are driver-side (tiny).
* ``simhash_*`` — 64-bit signature per doc; candidates = equal 16-bit
  band (4 bands => Hamming distance <= 3 is always caught).
* ``ngram_jaccard_pairs_blocked`` — exact pairwise Jaccard *within
  blocking-key groups* (e.g. lang): the deterministic non-probabilistic
  dedup path; cost O(sum of group^2), so the blocking key must bound
  group size.
* ``embedding_near_dup`` — see stages/similarity.py (cosine blocks).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions import text as tx


# ----------------------------------------------------------- exact dedup


def add_text_digest(ds: ray.data.Dataset, text_col: str = "text", out_col: str = "digest") -> ray.data.Dataset:
    """Append a 62-bit content digest (two independent 31-bit polynomial
    fingerprints) — collision probability ~n^2/2^62, and exact-equality
    groups are re-checked by the keep rule anyway."""

    def fn(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        h1 = tx.polynomial_fingerprint(texts)
        h2 = tx.polynomial_fingerprint([s[::-1] for s in texts])
        digest = (h1.astype(np.int64) << 31) | h2.astype(np.int64)
        return t.append_column(out_col, pa.array(digest, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def exact_dedup(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: str = "min",
) -> ray.data.Dataset:
    """Exact dedup: hash-partition on content digest, keep the min (or
    max) id per group — the distributed form of keep-first/keep-last
    (times.py:1409-1459 keeps last by position; here position is the
    stable ``id_col``)."""
    with_digest = add_text_digest(ds, text_col)

    def keep_block(df: pd.DataFrame) -> pd.DataFrame:
        # all rows of a digest are in this block (hash exchange): one
        # vectorized sort + drop_duplicates keeps min/max id per digest
        df = df.sort_values([ "digest", id_col], kind="stable")
        return df.drop_duplicates(subset=["digest"], keep="first" if keep == "min" else "last")

    from .exchange import block_map

    return block_map(
        with_digest, ["digest"], keep_block, batch_format="pandas", zero_copy_batch=False
    ).drop_columns(["digest"])


# ------------------------------------------------------------ MinHash/LSH


DEFAULT_NUM_PERM = 128
DEFAULT_BANDS = 64  # r = num_perm // bands = 2: P(candidate | J=0.5) ~ 1-1e-8


def signature_dataset(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = DEFAULT_NUM_PERM,
    shingle_k: int = 3,
    seed: int = 7,
) -> ray.data.Dataset:
    """(id, sig: list<uint64 as int64>) per doc, vectorized per batch."""
    a, b = tx.minhash_params(num_perm, seed)

    def fn(t: pa.Table) -> pa.Table:
        ids = t[id_col]
        shingle_sets = tx.batch_shingle_hashes(t[text_col].to_pylist(), shingle_k, seed)
        sigs = [tx.minhash_signature(sh, a, b).view(np.int64) for sh in shingle_sets]
        return pa.table({id_col: ids, "sig": pa.array([s.tolist() for s in sigs], pa.list_(pa.int64()))})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def lsh_candidate_pairs(
    sig_ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
) -> list[tuple]:
    """Candidate id pairs from banded LSH: emit (band, band_hash, id)
    rows, groupby band bucket, pair up within buckets. Returns the
    deduplicated driver-side pair list (assumed small; see module doc)."""
    r = num_perm // bands

    def emit(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        sigs = t["sig"].to_pylist()
        out_band, out_hash, out_id = [], [], []
        for i, sig in enumerate(sigs):
            s = np.asarray(sig, dtype=np.int64).view(np.uint64).reshape(bands, r)
            with np.errstate(over="ignore"):
                bh = np.zeros(bands, dtype=np.uint64)
                for j in range(r):
                    bh = bh * np.uint64(0x9E3779B97F4A7C15) + s[:, j]
            out_band.extend(range(bands))
            out_hash.extend(bh.view(np.int64).tolist())
            out_id.extend([ids[i]] * bands)
        return pa.table({
            "band": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.int64()),
            id_col: pa.array(out_id),
        })

    def pairs_of_group(df: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(df[id_col].tolist())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        left, right = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                left.append(ids[i])
                right.append(ids[j])
        return pd.DataFrame({"id_a": left, "id_b": right})

    from .exchange import grouped_block_map

    pairs = grouped_block_map(
        sig_ds.map_batches(emit, batch_format="pyarrow"), ["band", "band_hash"], pairs_of_group
    ).to_pandas()
    if pairs.empty:
        return []
    return sorted(set(zip(pairs["id_a"], pairs["id_b"])))


def verify_pairs_exact_jaccard(
    ds: ray.data.Dataset,
    pairs: list[tuple],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    seed: int = 7,
    threshold: float = 0.5,
) -> pd.DataFrame:
    """Exact-Jaccard verification of candidate pairs: shingle sets are
    recomputed per batch for candidate docs only (broadcast id set) and
    collected (bounded by candidate volume), then each pair is scored.
    Returns (id_a, id_b, jaccard) for pairs >= threshold."""
    if not pairs:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
    import ray as _ray

    involved = set()
    for a_, b_ in pairs:
        involved.add(a_)
        involved.add(b_)
    inv_ref = _ray.put(involved)

    class CollectShingles:
        def __init__(self):
            self.involved = _ray.get(inv_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t[id_col].to_pylist()
            texts = t[text_col].to_pylist()
            keep_ids, blobs = [], []
            for i, d in enumerate(ids):
                if d in self.involved:
                    keep_ids.append(d)
                    blobs.append(tx.shingle_hashes(texts[i], shingle_k, seed).view(np.int64).tolist())
            return pa.table({id_col: pa.array(keep_ids, t[id_col].type), "sh": pa.array(blobs, pa.list_(pa.int64()))})

    got = ds.map_batches(CollectShingles, batch_format="pyarrow", concurrency=2).to_pandas()
    sh = {r[id_col]: np.asarray(r["sh"], dtype=np.int64).view(np.uint64) for _, r in got.iterrows()}
    rows = []
    for a_, b_ in pairs:
        if a_ in sh and b_ in sh:
            j = tx.exact_jaccard(sh[a_], sh[b_])
            if j >= threshold:
                rows.append((a_, b_, j))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])


def minhash_dup_pairs(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    shingle_k: int = 3,
    seed: int = 7,
) -> pd.DataFrame:
    """Full MinHash+LSH near-dup pipeline: signatures -> banded buckets
    -> candidate pairs -> exact-Jaccard verification >= threshold."""
    sig = signature_dataset(ds, text_col=text_col, id_col=id_col, num_perm=num_perm, shingle_k=shingle_k, seed=seed)
    cands = lsh_candidate_pairs(sig, id_col=id_col, num_perm=num_perm, bands=bands)
    return verify_pairs_exact_jaccard(
        ds, cands, text_col=text_col, id_col=id_col, shingle_k=shingle_k, seed=seed, threshold=threshold
    )


def union_find_keep(pairs: Iterable[tuple], all_ids: Iterable) -> dict:
    """Driver-side union-find over verified dup pairs; returns
    {id: representative (min id of its component)}."""
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if str(ra) <= str(rb) else (rb, ra)
            parent[hi] = lo
    return {i: find(i) for i in all_ids}


# --------------------------------------------------------------- SimHash


def simhash_dataset(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    seed: int = 7,
) -> ray.data.Dataset:
    def fn(t: pa.Table) -> pa.Table:
        shingle_sets = tx.batch_shingle_hashes(t[text_col].to_pylist(), shingle_k, seed)
        sigs = [
            np.int64(np.uint64(tx.simhash64(sh)).view(np.int64)) for sh in shingle_sets
        ]
        return pa.table({id_col: t[id_col], "simhash": pa.array(sigs, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def simhash_dup_pairs(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    shingle_k: int = 3,
    seed: int = 7,
) -> pd.DataFrame:
    """SimHash near-dup: 4 x 16-bit band buckets (any pair at Hamming
    distance <= 3 shares at least one exact band), candidates verified
    by full 64-bit Hamming distance."""
    sig = simhash_dataset(ds, text_col=text_col, id_col=id_col, shingle_k=shingle_k, seed=seed)

    def emit(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        h = np.asarray(t["simhash"].to_pylist(), dtype=np.int64).view(np.uint64)
        out_band, out_key, out_id, out_sig = [], [], [], []
        for bnum in range(4):
            band = ((h >> np.uint64(16 * bnum)) & np.uint64(0xFFFF)).astype(np.int64)
            out_band.extend([bnum] * len(ids))
            out_key.extend(band.tolist())
            out_id.extend(ids)
            out_sig.extend(h.view(np.int64).tolist())
        return pa.table({
            "band": pa.array(out_band, pa.int32()),
            "key": pa.array(out_key, pa.int64()),
            id_col: pa.array(out_id),
            "simhash": pa.array(out_sig, pa.int64()),
        })

    def pairs_of_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="stable")
        ids = df[id_col].tolist()
        sigs = df["simhash"].to_numpy(dtype=np.int64).view(np.uint64)
        rows = []
        for i in range(len(ids)):
            d = tx.hamming64(sigs[i + 1 :], sigs[i])
            for off in np.flatnonzero(d <= max_hamming):
                rows.append((ids[i], ids[i + 1 + off], int(d[off])))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"])

    from .exchange import grouped_block_map

    pairs = grouped_block_map(
        sig.map_batches(emit, batch_format="pyarrow"), ["band", "key"], pairs_of_group
    ).to_pandas()
    if pairs.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
    return (
        pairs.drop_duplicates(subset=["id_a", "id_b"])
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )


# ------------------------------------------------- blocked exact Jaccard


def ngram_jaccard_pairs_blocked(
    ds: ray.data.Dataset,
    *,
    block_keys: Iterable[str] = ("lang",),
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    shingle_k: int = 3,
    seed: int = 7,
) -> pd.DataFrame:
    """Exact pairwise word-k-gram Jaccard within blocking-key groups.
    Deterministic (non-probabilistic) near-dup path; O(group^2) per
    block, so the blocking key must bound group sizes (documented
    contract)."""
    block_keys = list(block_keys)

    def gfn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="stable").reset_index(drop=True)
        shingles = [tx.shingle_hashes(s, shingle_k, seed) for s in df[text_col]]
        rows = []
        for i in range(len(df)):
            for j in range(i + 1, len(df)):
                jac = tx.exact_jaccard(shingles[i], shingles[j])
                if jac >= threshold:
                    rows.append((df[id_col].iloc[i], df[id_col].iloc[j], jac))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])

    from .exchange import grouped_block_map

    out = grouped_block_map(ds, block_keys, gfn).to_pandas()
    if out.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
