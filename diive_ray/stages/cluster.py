"""Distributed Lloyd's k-means over an embedding Dataset.

Engine addition (training-data ops; the reference has no clustering —
its nearest analogue is the binned-means optimum-range search,
/root/reference/diive/analysis/optimumrange.py). The sample-fit k-means
in stages/similarity.py:kmeans_fit is the IVF coarse quantizer; THIS is
the full-corpus scale path:

* each iteration is ONE streaming, column-pruned ``map_batches`` pass
  emitting k x (d+1) per-batch partials (per-cluster sum vector +
  count) — the classic combiner shape, no shuffle anywhere;
* the driver combine is O(k*d) and the updated centroids ride back to
  the workers in the task closure (k*d floats, far below any broadcast
  threshold);
* total cost = ``n_iter + 2`` passes over the corpus (init min-k ids,
  n_iter partial passes, one final assignment pass).

Oracle parity: centroids are ``stable_round6``-ed after every update
and the assignment distance is squared L2, so a generated DuckDB
oracle (same init = embeddings of the k smallest ids, same iteration
count, ROUND(ROUND(AVG(..),9),6) centroid updates) reproduces the
assignments exactly. Ties broken by lowest cluster id on both sides
(np.argmin first-min == ORDER BY dist, cid LIMIT 1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..util import stable_round6
from .similarity import _batch_matrix


def _cluster_partials(X: np.ndarray, C: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Assignments + per-cluster (sum vector, count) for one batch."""
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    assign = np.argmin(d2, axis=1)
    k, d = C.shape
    sums = np.zeros((k, d), dtype=np.float64)
    counts = np.zeros(k, dtype=np.int64)
    for j in np.unique(assign):
        m = assign == j
        sums[j] = X[m].sum(axis=0)
        counts[j] = int(m.sum())
    return assign, sums, counts


def kmeans_init_min_ids(
    ds: ray.data.Dataset, k: int, *, id_col: str = "vec_id", emb_col: str = "embedding"
) -> np.ndarray:
    """Deterministic init: embeddings of the k smallest ids. Per-batch
    partial min-k (each block ships at most k rows to the driver), so
    the corpus never materializes."""

    def part(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        keep = np.argsort(ids, kind="stable")[:k]
        return t.take(np.sort(keep))

    parts = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    parts = parts.sort_values(id_col, kind="stable").head(k)
    return np.stack([np.asarray(v, dtype=np.float64) for v in parts[emb_col]])


def kmeans_lloyd(
    ds: ray.data.Dataset,
    k: int,
    *,
    n_iter: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> tuple[np.ndarray, ray.data.Dataset]:
    """Full-corpus Lloyd's iterations; returns (centroids, assignment
    Dataset with columns id_col + 'cluster'). Empty clusters keep their
    previous centroid (same COALESCE rule as the oracle)."""
    C = kmeans_init_min_ids(ds, k, id_col=id_col, emb_col=emb_col)
    kk, d = C.shape

    def partial_pass(C: np.ndarray):
        def fn(t: pa.Table) -> pd.DataFrame:
            X = _batch_matrix(t, emb_col)
            _, sums, counts = _cluster_partials(X, C)
            return pd.DataFrame(
                {"cid": np.arange(kk, dtype=np.int64), "count": counts, "sums": list(sums)}
            )

        return fn

    for _ in range(n_iter):
        parts = ds.map_batches(
            partial_pass(C), batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()
        counts = np.zeros(kk, dtype=np.int64)
        sums = np.zeros((kk, d), dtype=np.float64)
        for cid, grp in parts.groupby("cid"):
            counts[cid] = int(grp["count"].sum())
            sums[cid] = np.sum(np.stack(grp["sums"].to_numpy()), axis=0)
        newC = C.copy()
        nz = counts > 0
        newC[nz] = sums[nz] / counts[nz, None]
        C = stable_round6(newC)

    Cf = C

    def assign_fn(t: pa.Table) -> pa.Table:
        X = _batch_matrix(t, emb_col)
        assign, _, _ = _cluster_partials(X, Cf)
        return pa.table(
            {
                id_col: t[id_col],
                "cluster": pa.array(assign.astype(np.int64), pa.int64()),
            }
        )

    out = ds.map_batches(assign_fn, batch_format="pyarrow", zero_copy_batch=True)
    return C, out


def semdedup_flags(
    ds: ray.data.Dataset,
    C: np.ndarray,
    *,
    threshold: float = 0.55,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """SemDeDup (Abbas et al. 2023 arXiv:2303.09540): semantic
    deduplication by clustering then intra-cluster cosine screening.
    Assign every vector to its nearest centroid (one map_batches pass,
    argmin squared L2, ties to lowest cid — same rule as kmeans_lloyd),
    then ONE keyed exchange on ``cluster``: inside each cluster block a
    single normalized matmul scores all pairs and a row is a duplicate
    when some LOWER-id member of its cluster has cosine >= threshold
    (the deterministic keep-lowest-id variant of the paper's
    keep-one-per-group rule).

    Scale contract: the quadratic cost is *per cluster* — that bound is
    the point of SemDeDup (pick k so n/k fits a block; for clusters
    beyond block size, shard the matmul block-pairwise like
    similarity.py:embedding_all_pairs_exact)."""
    from .exchange import grouped_block_map

    Cf = C

    def assign_fn(t: pa.Table) -> pa.Table:
        X = _batch_matrix(t, emb_col)
        assign, _, _ = _cluster_partials(X, Cf)
        return t.append_column("cluster", pa.array(assign.astype(np.int64), pa.int64()))

    with_c = ds.map_batches(assign_fn, batch_format="pyarrow", zero_copy_batch=True)

    def gfn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="stable").reset_index(drop=True)
        X = np.stack(df[emb_col].to_numpy()).astype(np.float64)
        norms = np.sqrt((X * X).sum(axis=1))
        norms[norms == 0] = 1.0
        N = X / norms[:, None]
        S = N @ N.T
        lower = np.tril(np.ones(S.shape, dtype=bool), -1)  # pairs j < i
        mx = np.where(lower, S, -np.inf).max(axis=1)
        mx = np.where(np.isfinite(mx), mx, -2.0)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "cluster": df["cluster"].to_numpy(),
            "is_dup": (mx >= threshold).astype(np.int64),
            "max_cos_lower": mx,
        })

    return grouped_block_map(with_c, ["cluster"], gfn)
