"""Similarity search over an embedding column (list<float>).

Engine additions for the training-data mission (no reference
counterpart). Three stages:

* ``knn_brute_force`` — exact cosine top-k: the (small) query matrix is
  normalized once, ``ray.put`` once, and read back inside each actor's
  ``__init__`` (broadcast, never re-shipped per batch); each batch does
  one numpy matmul [batch x d] @ [d x q] and emits its per-query
  partial top-k; the driver merges partials (k x q rows total). No
  shuffle — a single map_batches pass over the corpus.
* ``knn_lsh`` — the scale path: random-hyperplane signatures bucket the
  corpus; only batch rows whose bucket matches a query bucket (within
  ``max_hamming``) are scored. Same output contract, approximate
  recall; the plane matrix is seeded + broadcast like the queries.
* ``embedding_near_dup_pairs`` — all pairs with cosine >= threshold via
  hyperplane-bucket candidate groups + exact verification within the
  group (the embedding analogue of MinHash-LSH dedup). Assumes near-dup
  pairs are rare at dedup-grade thresholds (candidate groups small).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..util import once_per_worker


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _batch_matrix(t: pa.Table, col: str) -> np.ndarray:
    arr = t[col].combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.chunk(0)
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    d = len(arr[0])
    return flat.reshape(len(arr), d)


def knn_brute_force(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_ids: np.ndarray | None = None,
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Exact cosine top-k per query. Returns (query_id, rank, vec_id,
    cos_sim) with rank 1..k, ties broken by (sim desc, vec_id asc)."""
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ids = np.arange(len(qn)) if query_ids is None else np.asarray(query_ids)
    q_ref = ray.put(qn)

    class Score:
        def __init__(self):
            self.q = ray.get(q_ref)  # broadcast: fetched once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            x = _normalize(_batch_matrix(t, emb_col))
            ids = t[id_col].to_numpy(zero_copy_only=False)
            sims = x @ self.q.T  # [n, q]
            kk = min(k + (1 if exclude_self else 0), sims.shape[0])
            out_q, out_id, out_sim = [], [], []
            # per-query partial top-k from this batch only
            part = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # [kk, q]
            for qi in range(sims.shape[1]):
                rows = part[:, qi]
                out_q.extend([qi] * len(rows))
                out_id.extend(ids[rows].tolist())
                out_sim.extend(sims[rows, qi].tolist())
            return pa.table({
                "qi": pa.array(out_q, pa.int32()),
                id_col: pa.array(out_id),
                "sim": pa.array(out_sim, pa.float64()),
            })

    parts = ds.map_batches(once_per_worker(Score), batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return _merge_topk(parts, q_ids, k, id_col, exclude_self)


def hyperplane_signatures(x: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-bit signature (uint64) of x against <=64 hyperplanes."""
    bits = (x @ planes.T) > 0  # [n, p]
    out = np.zeros(len(x), dtype=np.uint64)
    for i in range(planes.shape[0]):
        out |= bits[:, i].astype(np.uint64) << np.uint64(i)
    return out


def make_planes(d: int, n_planes: int = 16, seed: int = 11) -> np.ndarray:
    rng = np.random.Generator(np.random.Philox(key=seed))
    return rng.standard_normal((n_planes, d))


def knn_lsh(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_ids: np.ndarray | None = None,
    n_planes: int = 16,
    max_hamming: int = 2,
    seed: int = 11,
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Approximate cosine top-k: score only rows whose hyperplane bucket
    is within ``max_hamming`` bits of the query's bucket. Same schema as
    knn_brute_force; recall < 1 by construction (scale path — the
    scored fraction shrinks ~2^-n_planes per added plane)."""
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ids = np.arange(len(qn)) if query_ids is None else np.asarray(query_ids)
    planes = make_planes(qn.shape[1], n_planes, seed)
    q_sigs = hyperplane_signatures(qn, planes)
    q_ref = ray.put((qn, planes, q_sigs))

    from ..functions.text import hamming64

    class Score:
        def __init__(self):
            self.q, self.planes, self.q_sigs = ray.get(q_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            x = _normalize(_batch_matrix(t, emb_col))
            ids = t[id_col].to_numpy(zero_copy_only=False)
            sigs = hyperplane_signatures(x, self.planes)
            out_q, out_id, out_sim = [], [], []
            for qi in range(len(self.q)):
                ham = hamming64(sigs, self.q_sigs[qi])
                cand = np.flatnonzero(ham <= max_hamming)
                if len(cand) == 0:
                    continue
                sims = x[cand] @ self.q[qi]
                kk = min(k + 1, len(cand))
                top = np.argpartition(-sims, kk - 1)[:kk]
                out_q.extend([qi] * len(top))
                out_id.extend(ids[cand[top]].tolist())
                out_sim.extend(sims[top].tolist())
            return pa.table({
                "qi": pa.array(out_q, pa.int32()),
                id_col: pa.array(out_id),
                "sim": pa.array(out_sim, pa.float64()),
            })

    parts = ds.map_batches(once_per_worker(Score), batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return _merge_topk(parts, q_ids, k, id_col, exclude_self)


def kmeans_fit(
    X: np.ndarray, n_centroids: int, *, n_iter: int = 10, seed: int = 23
) -> np.ndarray:
    """Seeded Lloyd's k-means on (normalized) vectors — the IVF coarse
    quantizer. Deterministic: k-means++-style seeding from a Philox
    stream, fixed iteration count. Returns [n_centroids, d]."""
    rng = np.random.Generator(np.random.Philox(key=seed))
    n = len(X)
    k = min(n_centroids, n)
    # k-means++ seeding
    centroids = [X[rng.integers(n)]]
    for _ in range(1, k):
        d2 = np.min(
            ((X[:, None, :] - np.asarray(centroids)[None, :, :]) ** 2).sum(axis=2), axis=1
        )
        p = d2 / d2.sum() if d2.sum() > 0 else None
        centroids.append(X[rng.choice(n, p=p)])
    C = np.asarray(centroids)
    for _ in range(n_iter):
        assign = np.argmax(X @ C.T, axis=1)  # cosine assignment (unit vectors)
        for j in range(k):
            m = assign == j
            if m.any():
                v = X[m].mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    C[j] = v / nv
    return C


def knn_ivf(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_ids: np.ndarray | None = None,
    n_centroids: int = 16,
    n_probe: int = 4,
    train_sample: int = 4096,
    seed: int = 23,
    exclude_self: bool = True,
) -> pd.DataFrame:
    """IVF approximate cosine top-k — the inverted-file scale path
    (coarse k-means quantizer; per query only the ``n_probe`` nearest
    centroid cells are scored). The quantizer is fit on a driver-side
    sample (``ds.limit(train_sample)``), centroids + queries are
    broadcast once via ray.put, and each batch scores only its rows
    whose cell is probed by some query — same output contract as
    knn_brute_force, recall < 1 by construction (grows with n_probe;
    n_probe = n_centroids recovers exact)."""
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ids = np.arange(len(qn)) if query_ids is None else np.asarray(query_ids)

    sample = ds.limit(train_sample).to_pandas()
    Xs = _normalize(np.asarray([np.asarray(v, dtype=np.float64) for v in sample[emb_col]]))
    C = kmeans_fit(Xs, n_centroids, seed=seed)
    n_probe = min(n_probe, len(C))
    # per query: the probed cell set
    q_cells = np.argsort(-(qn @ C.T), axis=1)[:, :n_probe]  # [q, n_probe]
    ref = ray.put((qn, C, q_cells))

    class Score:
        def __init__(self):
            self.q, self.C, self.q_cells = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            x = _normalize(_batch_matrix(t, emb_col))
            ids = t[id_col].to_numpy(zero_copy_only=False)
            cell = np.argmax(x @ self.C.T, axis=1)
            out_q, out_id, out_sim = [], [], []
            for qi in range(len(self.q)):
                cand = np.flatnonzero(np.isin(cell, self.q_cells[qi]))
                if not len(cand):
                    continue
                sims = x[cand] @ self.q[qi]
                kk = min(k + 1, len(cand))
                top = np.argpartition(-sims, kk - 1)[:kk]
                out_q.extend([qi] * len(top))
                out_id.extend(ids[cand[top]].tolist())
                out_sim.extend(sims[top].tolist())
            return pa.table({
                "qi": pa.array(out_q, pa.int32()),
                id_col: pa.array(out_id),
                "sim": pa.array(out_sim, pa.float64()),
            })

    parts = ds.map_batches(once_per_worker(Score), batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return _merge_topk(parts, q_ids, k, id_col, exclude_self)


def _merge_topk(parts: pd.DataFrame, q_ids: np.ndarray, k: int, id_col: str, exclude_self: bool) -> pd.DataFrame:
    """Vectorized driver merge of per-batch partial top-k rows
    (k x q x batches rows total): one global sort + per-query head(k).
    Tie order matches the former heap merge: sim desc, id asc."""
    if parts.empty:
        return pd.DataFrame(columns=["query_id", "rank", id_col, "cos_sim"])
    parts = parts.assign(query_id=q_ids[parts["qi"].to_numpy()])
    if exclude_self:
        parts = parts[parts[id_col].to_numpy() != parts["query_id"].to_numpy()]
    parts = parts.sort_values(["query_id", "sim", id_col], ascending=[True, False, True], kind="stable")
    top = parts.groupby("query_id", sort=True).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    top = top.rename(columns={"sim": "cos_sim"})
    return top[["query_id", "rank", id_col, "cos_sim"]].reset_index(drop=True)


def embedding_all_pairs_exact(
    ds: ray.data.Dataset,
    *,
    threshold: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_shards: int = 8,
) -> ray.data.Dataset:
    """EXACT all-pairs cosine >= threshold, fully distributed: the
    block-pairwise self-join. Rows are deterministically sharded by
    id hash into ``n_shards`` groups; each row is replicated once per
    shard-pair block it participates in (n_shards copies/row), one hash
    exchange co-locates every (shard_i, shard_j) block, and each block
    runs a single [na x d] @ [d x nb] matmul. Every unordered pair is
    scored in exactly one block, so the result is exact with no driver
    materialization. Shuffle volume is n_shards x corpus; choosing
    n_shards ~ sqrt(n_rows x row_bytes / target_block_bytes) gives the
    classic O(n^1.5) exact all-pairs cost — the right side is never
    broadcast whole (contrast knn's small-query broadcast)."""

    def emit(t: pa.Table) -> pa.Table:
        n = len(t)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        shard = (ids % n_shards).astype(np.int32)
        emb = t[emb_col].combine_chunks()
        tt = np.arange(n_shards, dtype=np.int32)
        s_rep = np.repeat(shard, n_shards)              # row's own shard
        t_rep = np.tile(tt, n)                          # partner shard
        pk_a = np.minimum(s_rep, t_rep)
        pk_b = np.maximum(s_rep, t_rep)
        side = (s_rep > t_rep).astype(np.int8)
        idx = np.repeat(np.arange(n), n_shards)
        return pa.table({
            "pk_a": pa.array(pk_a, pa.int32()),
            "pk_b": pa.array(pk_b, pa.int32()),
            "side": pa.array(side, pa.int8()),
            id_col: pa.array(ids[idx], pa.int64()),
            emb_col: emb.take(pa.array(idx, pa.int64())),
        })

    def score_group(df: pd.DataFrame) -> pd.DataFrame:
        # one (pk_a, pk_b) shard-pair group per call (grouped_block_map)
        if not len(df):
            return pd.DataFrame({
                "id_a": pd.Series([], dtype=np.int64),
                "id_b": pd.Series([], dtype=np.int64),
                "cos_sim": pd.Series([], dtype=np.float64),
            })
        same_shard = df["pk_a"].iat[0] == df["pk_b"].iat[0]
        if same_shard:
            A = _normalize(np.asarray([np.asarray(v, dtype=np.float64) for v in df[emb_col]]))
            ids_a = df[id_col].to_numpy(dtype=np.int64)
            sims = A @ A.T
            ii, jj = np.triu_indices(len(ids_a), 1)
            hit = sims[ii, jj] >= threshold
            # triu is positional; block row order is arrival-dependent,
            # so order each pair by id explicitly
            ra, rb = ids_a[ii[hit]], ids_a[jj[hit]]
            ia, ib = np.minimum(ra, rb), np.maximum(ra, rb)
            sv = sims[ii[hit], jj[hit]]
        else:
            a = df[df["side"] == 0]
            b = df[df["side"] == 1]
            if not len(a) or not len(b):
                ia = ib = np.array([], dtype=np.int64)
                sv = np.array([], dtype=np.float64)
            else:
                A = _normalize(np.asarray([np.asarray(v, dtype=np.float64) for v in a[emb_col]]))
                B = _normalize(np.asarray([np.asarray(v, dtype=np.float64) for v in b[emb_col]]))
                sims = A @ B.T
                ii, jj = np.nonzero(sims >= threshold)
                ida = a[id_col].to_numpy(dtype=np.int64)[ii]
                idb = b[id_col].to_numpy(dtype=np.int64)[jj]
                ia, ib = np.minimum(ida, idb), np.maximum(ida, idb)
                sv = sims[ii, jj]
        return pd.DataFrame({"id_a": ia, "id_b": ib, "cos_sim": sv})

    from .exchange import grouped_block_map

    return grouped_block_map(
        ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True),
        ["pk_a", "pk_b"], score_group,
    )


def embedding_near_dup_pairs(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 11,
) -> ray.data.Dataset:
    """Near-duplicate vector pairs (cosine >= threshold): hyperplane
    buckets as candidate groups, exact pairwise cosine inside each
    group. Coarse buckets (8 planes) keep recall high at dedup-grade
    thresholds; a vector pair at cos >= 0.9 collides in the full bucket
    with p = (1 - acos(0.9)/pi)^8 ~ 0.33, so three seeded rounds are
    OR-combined for recall ~0.7 -> documented approximate contract; use
    ngram/exact paths when exactness is required.

    Dataset-native end to end (VERDICT r3 #5): ONE signature pass emits
    a (round, bucket, id, emb) row per round per vector, ONE exchange
    on (round, bucket) scores candidate groups, and a final keyed
    exchange on (id_a, id_b) drops cross-round duplicates in-block (the
    dedup.py banding shape) — pair volume never collects on the
    driver, so a dup-heavy corpus can't blow driver memory. Two
    shuffles total in one topology (three per-round sub-plans unioned
    would hold three actor fleets + shuffle stages live at once and
    can starve each other on a small CPU budget). Callers wanting a
    frame consume ``.to_pandas()`` on the (pruned) result."""
    from .exchange import block_map, grouped_block_map

    n_rounds = 3
    planes_ref = ray.put(np.stack(
        [make_planes_dim_safe(ds, emb_col, n_planes, seed + r) for r in range(n_rounds)]
    ))

    class Sig:
        def __init__(self):
            self.planes = ray.get(planes_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            x = _normalize(_batch_matrix(t, emb_col))
            n = len(x)
            sigs = np.concatenate([
                hyperplane_signatures(x, p).view(np.int64) for p in self.planes
            ])
            idx = np.tile(np.arange(n), n_rounds)
            return pa.table({
                "round": pa.array(np.repeat(np.arange(n_rounds, dtype=np.int8), n), pa.int8()),
                "bucket": pa.array(sigs, pa.int64()),
                id_col: t[id_col].take(pa.array(idx)),
                emb_col: t[emb_col].take(pa.array(idx)),
            })

    def pairs_of_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="stable").reset_index(drop=True)
        x = _normalize(np.asarray([np.asarray(v, dtype=np.float64) for v in df[emb_col]]))
        sims = x @ x.T
        ids = df[id_col].to_numpy(dtype=np.int64)
        ii, jj = np.triu_indices(len(ids), 1)
        hit = sims[ii, jj] >= threshold
        return pd.DataFrame({
            "id_a": ids[ii[hit]],
            "id_b": ids[jj[hit]],
            "cos_sim": sims[ii[hit], jj[hit]],
        })

    all_pairs = grouped_block_map(
        ds.map_batches(once_per_worker(Sig), batch_format="pyarrow", zero_copy_batch=True),
        ["round", "bucket"],
        pairs_of_group,
    )

    def dedup_block(df: pd.DataFrame) -> pd.DataFrame:
        # same (id_a, id_b) from different rounds carries the same exact
        # cosine — keep-first is deterministic in value
        out = df.drop_duplicates(subset=["id_a", "id_b"])
        return out.astype({"id_a": np.int64, "id_b": np.int64,
                           "cos_sim": np.float64})

    return block_map(all_pairs, ["id_a", "id_b"], dedup_block,
                     batch_format="pandas", zero_copy_batch=False)


def make_planes_dim_safe(ds: ray.data.Dataset, emb_col: str, n_planes: int, seed: int) -> np.ndarray:
    d = len(ds.take(1)[0][emb_col])
    return make_planes(d, n_planes, seed)


# ------------------------------------------------------ product quantization


def pq_fit(
    X: np.ndarray, m: int, ks: int, *, n_iter: int = 10, seed: int = 29
) -> np.ndarray:
    """Product-quantizer codebooks (Jegou et al., "Product Quantization
    for Nearest Neighbor Search", TPAMI'11): split d into ``m``
    subspaces, L2 k-means with ``ks`` centroids per subspace on the
    (normalized) training sample. Returns [m, ks, d//m]."""
    n, d = X.shape
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.zeros((m, min(ks, n), dsub))
    rng = np.random.Generator(np.random.Philox(key=seed))
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        kk = min(ks, n)
        # k-means++ seeding + Lloyd (L2, unnormalized subvectors)
        cent = [S[rng.integers(n)]]
        for _ in range(1, kk):
            d2 = np.min(((S[:, None, :] - np.asarray(cent)[None, :, :]) ** 2).sum(axis=2), axis=1)
            p = d2 / d2.sum() if d2.sum() > 0 else None
            cent.append(S[rng.choice(n, p=p)])
        C = np.asarray(cent)
        for _ in range(n_iter):
            assign = np.argmin(
                ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), axis=1
            )
            for c in range(kk):
                msk = assign == c
                if msk.any():
                    C[c] = S[msk].mean(axis=0)
        books[j] = C
    return books


def pq_encode(X: np.ndarray, books: np.ndarray) -> np.ndarray:
    """uint8 codes [n, m]: per subspace, nearest codebook centroid (L2)."""
    n, d = X.shape
    m, ks, dsub = books.shape
    codes = np.zeros((n, m), dtype=np.uint8)
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        d2 = (
            (S**2).sum(axis=1, keepdims=True)
            - 2.0 * S @ books[j].T
            + (books[j] ** 2).sum(axis=1)[None, :]
        )
        codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def knn_pq(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_ids: np.ndarray | None = None,
    m: int = 8,
    ks: int = 16,
    train_sample: int = 4096,
    rerank_factor: int = 0,
    seed: int = 29,
    exclude_self: bool = True,
) -> pd.DataFrame:
    """PQ/ADC approximate cosine top-k — the memory-compression scale
    path (d float32 -> m uint8 codes per vector, 32x at d=64/m=8).
    Codebooks fit on a driver-side sample; per query an inner-product
    lookup table T[q, j, c] = q_sub_j . centroid_jc is broadcast, so a
    batch scores ALL queries with one gather-sum over its codes — no
    distance computation against raw vectors at query time.

    ``rerank_factor > 0`` re-scores each batch's top
    ``rerank_factor * k`` ADC candidates with exact cosine (the
    IVFADC-with-rerank pattern) — output sims become exact while the
    ADC screen still prunes the batch. Same output contract as
    knn_brute_force; with ks >= distinct subvectors the quantization is
    lossless and ADC equals exact cosine (test-pinned)."""
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ids = np.arange(len(qn)) if query_ids is None else np.asarray(query_ids)

    sample = ds.limit(train_sample).to_pandas()
    Xs = _normalize(np.asarray([np.asarray(v, dtype=np.float64) for v in sample[emb_col]]))
    books = pq_fit(Xs, m, ks, seed=seed)
    mm, kk_, dsub = books.shape
    # ADC tables: T[q, j, c] = <q_subj, c_jc>; approx cos = sum_j T[q, j, code_j]
    T = np.stack([qn[:, j * dsub : (j + 1) * dsub] @ books[j].T for j in range(mm)], axis=1)
    ref = ray.put((qn, books, T))

    class Score:
        def __init__(self):
            self.q, self.books, self.T = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            x = _normalize(_batch_matrix(t, emb_col))
            ids = t[id_col].to_numpy(zero_copy_only=False)
            codes = pq_encode(x, self.books)  # [n, m]
            nq = len(self.q)
            # gather-sum: sims[n, q] = sum_j T[q, j, codes[:, j]]
            sims = np.zeros((len(x), nq))
            for j in range(self.books.shape[0]):
                sims += self.T[:, j, codes[:, j]].T  # [n, q]
            out_q, out_id, out_sim = [], [], []
            top_n = (rerank_factor * k if rerank_factor else k) + 1
            for qi in range(nq):
                s = sims[:, qi]
                kk = min(top_n, len(s))
                top = np.argpartition(-s, kk - 1)[:kk]
                if rerank_factor:
                    exact = x[top] @ self.q[qi]
                    kk2 = min(k + 1, len(top))
                    best = np.argpartition(-exact, kk2 - 1)[:kk2]
                    out_q.extend([qi] * len(best))
                    out_id.extend(ids[top[best]].tolist())
                    out_sim.extend(exact[best].tolist())
                else:
                    out_q.extend([qi] * len(top))
                    out_id.extend(ids[top].tolist())
                    out_sim.extend(s[top].tolist())
            return pa.table({
                "qi": pa.array(out_q, pa.int32()),
                id_col: pa.array(out_id),
                "sim": pa.array(out_sim, pa.float64()),
            })

    parts = ds.map_batches(once_per_worker(Score), batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    return _merge_topk(parts, q_ids, k, id_col, exclude_self)


def mmr_rerank(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    *,
    k: int = 5,
    pool: int = 50,
    lam: float = 0.7,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_ids: np.ndarray | None = None,
) -> pd.DataFrame:
    """Maximal Marginal Relevance diversified top-k (Carbonell &
    Goldstein 1998): greedily pick argmax over the candidate pool of
    ``lam * sim(q, d) - (1 - lam) * max_{s in selected} sim(d, s)``,
    so near-duplicate candidates are down-ranked in favour of coverage
    — the diversified-retrieval step of seed-set curation.

    Ray shape: the DISTRIBUTED work is the exact cosine top-``pool``
    per query (broadcast query matmul, the existing brute-force path) +
    one slim semi-join pass that gathers the pool's embedding vectors;
    the greedy loop then runs over the bounded pool×pool similarity
    matrix (pool ≤ ~100s — never the corpus). Deterministic: candidate
    order and ties follow (rounded sim DESC, id ASC), marginal-score
    ties pick the lower id."""
    from ..util import stable_round6

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ids = np.arange(len(qn)) if query_ids is None else np.asarray(query_ids)
    top = knn_brute_force(ds, qn, pool, id_col=id_col, emb_col=emb_col,
                          query_ids=q_ids)

    # gather the pool's vectors: broadcast the involved-id set, each
    # batch returns only its members (id-bounded, one pass)
    wanted = np.sort(top[id_col].unique())

    def gather(t) -> pd.DataFrame:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(wanted, ids)
        pos_c = np.clip(pos, 0, len(wanted) - 1)
        hit = (pos < len(wanted)) & (wanted[pos_c] == ids)
        if not hit.any():
            return pd.DataFrame({id_col: pd.Series([], dtype=ids.dtype),
                                 "emb": pd.Series([], dtype=object)})
        embs = [np.asarray(v, dtype=np.float64) for v in
                np.asarray(t[emb_col].to_pylist(), dtype=object)[hit]]
        return pd.DataFrame({id_col: ids[hit], "emb": embs})

    vec_tab = ds.map_batches(gather, batch_format="pyarrow").to_pandas()
    vecs = {i: _normalize(e.reshape(1, -1))[0]
            for i, e in zip(vec_tab[id_col], vec_tab["emb"])}

    rows = []
    for qi, q in zip(q_ids, qn):
        cand = top[top["query_id"] == qi].sort_values("rank")
        c_ids = cand[id_col].to_numpy()
        rel = cand["cos_sim"].to_numpy(dtype=np.float64)
        V = np.stack([vecs[i] for i in c_ids])
        inter = V @ V.T
        selected: list[int] = []
        remaining = list(range(len(c_ids)))
        while remaining and len(selected) < k:
            if selected:
                div = inter[np.ix_(remaining, selected)].max(axis=1)
            else:
                div = np.zeros(len(remaining))
            marginal = lam * rel[remaining] - (1.0 - lam) * div
            marginal = stable_round6(marginal)
            best = remaining[int(np.lexsort((c_ids[remaining], -marginal))[0])]
            rows.append((int(qi), len(selected) + 1, int(c_ids[best]),
                         float(stable_round6(np.array([marginal[remaining.index(best)]]))[0])))
            selected.append(best)
            remaining.remove(best)
    return pd.DataFrame(rows, columns=["query_id", "rank", id_col, "mmr_score"])


# ----------------------------------------------------------- PCA


def embedding_moments(
    ds: ray.data.Dataset,
    emb_col: str = "embedding",
) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, sum vector, X^T X) of the embedding matrix in ONE pass:
    per-batch float64 partials (d + d^2 values per batch — ~33 KB at
    d=64) -> driver combine. The one-combine second-moment pattern is
    the scale path for covariance/PCA at any corpus size: the vectors
    never shuffle and driver state is O(d^2)."""
    from .exchange import driver_combine

    def partial(t: pa.Table) -> pd.DataFrame:
        x = _batch_matrix(t, emb_col).astype(np.float64)
        d = x.shape[1] if x.size else 0
        if not x.size:
            return pd.DataFrame({"n": [], "s": [], "xtx": []})
        return pd.DataFrame({
            "n": [len(x)],
            "s": [x.sum(axis=0).tolist()],
            "xtx": [(x.T @ x).ravel().tolist()],
        })

    parts = driver_combine(ds, partial, lambda df: df)
    n = int(parts["n"].sum())
    s = np.sum([np.asarray(v) for v in parts["s"]], axis=0)
    xtx_flat = np.sum([np.asarray(v) for v in parts["xtx"]], axis=0)
    d = len(s)
    return n, s, xtx_flat.reshape(d, d)


def embedding_covariance(
    ds: ray.data.Dataset,
    emb_col: str = "embedding",
) -> np.ndarray:
    """Sample covariance (ddof=1) from the one-pass moments."""
    n, s, xtx = embedding_moments(ds, emb_col)
    mean = s / n
    return (xtx - np.outer(mean, mean) * n) / (n - 1)


def embedding_pca_project(
    ds: ray.data.Dataset,
    *,
    k: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> tuple[ray.data.Dataset, np.ndarray]:
    """PCA projection of every vector onto the top-k principal
    components: covariance via the one-combine moment pass, ``eigh``
    on the driver (d x d), components broadcast once via ``ray.put``
    into a stateless matmul map. Sign convention: each component's
    largest-|.| coordinate is positive (deterministic across BLAS
    builds). Returns (projected dataset, (k, d) component matrix);
    explained variance = the top-k eigenvalues (descending)."""
    n, s, xtx = embedding_moments(ds, emb_col)
    mean = s / n
    cov = (xtx - np.outer(mean, mean) * n) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T                       # (k, d)
    flip = np.sign(comps[np.arange(len(comps)), np.abs(comps).argmax(axis=1)])
    comps = comps * flip[:, None]
    state = ray.put((mean, comps))

    def project(t: pa.Table) -> pd.DataFrame:
        mu, c = ray.get(state)
        x = _batch_matrix(t, emb_col).astype(np.float64)
        p = (x - mu) @ c.T
        out = {id_col: t[id_col].to_numpy(zero_copy_only=False)}
        for i in range(p.shape[1]):
            out[f"pc{i}"] = p[:, i]
        return pd.DataFrame(out)

    return (
        ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True),
        comps,
    )


# ------------------------------------------- Johnson-Lindenstrauss projection


def jl_sign_matrix(d: int, k: int) -> np.ndarray:
    """Deterministic (d, k) Rademacher +-1 projection matrix
    (Achlioptas 2003 "Database-friendly random projections": +-1 signs
    satisfy the JL lemma like Gaussians do). Signs come from a Knuth
    multiplicative hash of (i, j) so every worker — and the SQL oracle
    — regenerates the identical matrix from (d, k) alone: nothing to
    broadcast, nothing to store."""
    i = np.arange(d, dtype=np.int64)[:, None]
    j = np.arange(k, dtype=np.int64)[None, :]
    # linear-code the cell, then multiply-xorshift-multiply: a single
    # multiplicative round leaves the top bit linear in j (near-constant
    # rows — a degenerate low-rank projection); the xorshift avalanche
    # breaks that. All ops stay within int64 so SQL replays them exactly.
    h = ((i * np.int64(131071) + j) * np.int64(2654435761)) % np.int64(4294967296)
    h = ((h ^ (h >> np.int64(16))) * np.int64(40503)) % np.int64(4294967296)
    h = h ^ (h >> np.int64(15))
    return np.where(h < np.int64(2147483648), 1.0, -1.0)


def jl_project(
    ds: ray.data.Dataset,
    *,
    k: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """Project every embedding to k dims with the deterministic JL sign
    matrix, scaled 1/sqrt(k) (preserves pairwise distances within
    (1 +- eps) whp — the standard cheap pre-pass before LSH / near-dup
    at 100 TB where full-dim distance math dominates). Stateless
    vectorized map: the sign matrix is rebuilt per task from (d, k)
    (microseconds — cheaper than shipping it). Long output
    (id, dim, proj): one row per projected coordinate."""
    d = len(ds.take(1)[0][emb_col])
    scale = 1.0 / np.sqrt(np.float64(k))

    def project(t: pa.Table) -> pd.DataFrame:
        s = jl_sign_matrix(d, k)
        x = _batch_matrix(t, emb_col)
        p = (x @ s) * scale
        ids = t[id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        return pd.DataFrame({
            id_col: np.repeat(ids, k),
            "dim": np.tile(np.arange(k, dtype=np.int64), n),
            "proj": p.reshape(-1),
        })

    return ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def kcenter_greedy(
    ds: ray.data.Dataset,
    *,
    k: int = 20,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    normalize: bool = True,
) -> pd.DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985 farthest-point
    traversal; Sener & Savarese 2018 for training-data selection):
    start from the smallest id, then k-1 times add the point FARTHEST
    from the selected set. 2-approximation to the optimal k-center
    cover, fully deterministic (max ties broken by smallest id).

    Ray shape: the selected set is tiny (k x d) and rides along as a
    plain argument re-captured per round; each round is ONE vectorized
    map_batches pass emitting a single (best dist, id) row per block,
    and the driver reduces blocks -- k passes total, no shuffle, no
    corpus materialization. At 100 TB the k passes re-read the source;
    callers doing many rounds should persist the (id, embedding)
    projection once and iterate over that.

    Returns (order, vec_id, dist) -- dist is each center's distance to
    the previously-selected set (the coverage radius sequence, weakly
    decreasing for exact arithmetic)."""
    base = ds
    if normalize:
        def norm(t: pa.Table) -> pd.DataFrame:
            x = _batch_matrix(t, emb_col)
            x = _normalize(x)
            return pd.DataFrame({
                id_col: t[id_col].to_numpy(zero_copy_only=False),
                emb_col: list(x),
            })
        base = ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)
    base = base.materialize()

    def first_vec(df: pd.DataFrame) -> pd.DataFrame:
        i = int(df[id_col].to_numpy().argmin())
        return pd.DataFrame({id_col: [df[id_col].iloc[i]], "vec": [df[emb_col].iloc[i]]})

    f = base.map_batches(first_vec, batch_format="pandas").to_pandas()
    f = f.sort_values(id_col).iloc[0]
    centers = [(int(f[id_col]), 0.0)]
    cmat = np.asarray(f["vec"], dtype=np.float64)[None, :]

    for _ in range(k - 1):
        def far(df: pd.DataFrame, _c=cmat) -> pd.DataFrame:
            # per-block winner: one (dist, id, vec) row rides back
            x = np.stack(df[emb_col].to_numpy())
            d2 = ((x[:, None, :] - _c[None, :, :]) ** 2).sum(axis=2).min(axis=1)
            i = int(np.lexsort((df[id_col].to_numpy(), -d2))[0])
            return pd.DataFrame({
                id_col: [df[id_col].iloc[i]], "d2": [d2[i]], "vec": [df[emb_col].iloc[i]],
            })

        parts = base.map_batches(far, batch_format="pandas").to_pandas()
        best = parts.sort_values(["d2", id_col], ascending=[False, True]).iloc[0]
        centers.append((int(best[id_col]), float(np.sqrt(best["d2"]))))
        cmat = np.vstack([cmat, np.asarray(best["vec"], dtype=np.float64)])

    out = pd.DataFrame(centers, columns=[id_col, "dist"])
    out.insert(0, "order", np.arange(len(out), dtype=np.int64))
    out[id_col] = out[id_col].astype("int64")
    return out


def label_compactness(
    ds: ray.data.Dataset,
    *,
    label_col: str = "label",
    emb_col: str = "embedding",
) -> pd.DataFrame:
    """Intra-class compactness of an embedding column: per label, the
    centroid norm and the mean / min cosine of members to their own
    centroid -- the standard embedding-quality probe for curation and
    classifier-readiness checks.

    Two bounded passes, vectors never shuffle: (1) per-label (n, sum
    vector) partials -> driver centroids (labels x d); (2) centroids
    broadcast into a stateless vectorized cosine map emitting per-label
    (n, sum cos, min cos) partials -> tiny combine."""
    from .exchange import driver_combine

    def moments(t: pa.Table) -> pd.DataFrame:
        x = _batch_matrix(t, emb_col)
        lab = t[label_col].to_numpy(zero_copy_only=False)
        rows = []
        for lv in np.unique(lab):
            m = lab == lv
            rows.append((int(lv), int(m.sum()), x[m].sum(axis=0).tolist()))
        return pd.DataFrame(rows, columns=["label", "n", "s"])

    parts = driver_combine(ds, moments, lambda df: df)
    agg = {}
    for lv, g in parts.groupby("label"):
        n = int(g["n"].sum())
        s = np.sum([np.asarray(v, dtype=np.float64) for v in g["s"]], axis=0)
        agg[int(lv)] = (n, s / n)
    cent = {lv: c for lv, (n, c) in agg.items()}
    cnorm = {lv: float(np.sqrt((c * c).sum())) for lv, c in cent.items()}

    def cosines(t: pa.Table) -> pd.DataFrame:
        x = _batch_matrix(t, emb_col)
        lab = t[label_col].to_numpy(zero_copy_only=False)
        vnorm = np.sqrt((x * x).sum(axis=1))
        rows = []
        for lv in np.unique(lab):
            m = lab == lv
            c = cent[int(lv)]
            cos = (x[m] @ c) / (vnorm[m] * cnorm[int(lv)])
            rows.append((int(lv), int(m.sum()), float(cos.sum()), float(cos.min())))
        return pd.DataFrame(rows, columns=["label", "n", "sum_cos", "min_cos"])

    p2 = driver_combine(ds, cosines, lambda df: df)
    out_rows = []
    for lv, g in p2.groupby("label"):
        n = int(g["n"].sum())
        out_rows.append((
            int(lv), n, cnorm[int(lv)],
            float(g["sum_cos"].sum()) / n, float(g["min_cos"].min()),
        ))
    out = pd.DataFrame(out_rows, columns=["label", "n", "centroid_norm", "mean_cos", "min_cos"])
    out["label"] = out["label"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values("label").reset_index(drop=True)
