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


# ------------------------------------------------------------------ DBSCAN


def euclidean_pairs_within(
    ds: ray.data.Dataset,
    *,
    eps2: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_shards: int = 8,
) -> ray.data.Dataset:
    """EXACT all pairs with squared L2 distance <= ``eps2`` — the
    euclidean twin of similarity.py:embedding_all_pairs_exact (same
    deterministic shard-pair self-join: each row replicated n_shards
    times, every unordered pair scored in exactly ONE co-located block
    via ||a||^2 + ||b||^2 - 2ab matmuls; O(n^1.5) exact all-pairs
    shape, nothing on the driver). Returns (id_a < id_b) pairs."""
    from .exchange import grouped_block_map

    def emit(t: pa.Table) -> pa.Table:
        n = len(t)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        shard = (ids % n_shards).astype(np.int32)
        emb = t[emb_col].combine_chunks()
        tt = np.arange(n_shards, dtype=np.int32)
        s_rep = np.repeat(shard, n_shards)
        t_rep = np.tile(tt, n)
        idx = np.repeat(np.arange(n), n_shards)
        return pa.table({
            "pk_a": pa.array(np.minimum(s_rep, t_rep), pa.int32()),
            "pk_b": pa.array(np.maximum(s_rep, t_rep), pa.int32()),
            "side": pa.array((s_rep > t_rep).astype(np.int8), pa.int8()),
            id_col: pa.array(ids[idx], pa.int64()),
            emb_col: emb.take(pa.array(idx, pa.int64())),
        })

    def _mat(rows) -> np.ndarray:
        return np.asarray([np.asarray(v, dtype=np.float64) for v in rows])

    def score_group(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "id_a": pd.Series([], dtype=np.int64),
            "id_b": pd.Series([], dtype=np.int64),
        })
        if not len(df):
            return empty
        if df["pk_a"].iat[0] == df["pk_b"].iat[0]:
            A = _mat(df[emb_col])
            ids = df[id_col].to_numpy(dtype=np.int64)
            sq = (A * A).sum(axis=1)
            d2 = sq[:, None] + sq[None, :] - 2.0 * (A @ A.T)
            ii, jj = np.triu_indices(len(ids), 1)
            hit = d2[ii, jj] <= eps2
            ra, rb = ids[ii[hit]], ids[jj[hit]]
        else:
            a = df[df["side"] == 0]
            b = df[df["side"] == 1]
            if not len(a) or not len(b):
                return empty
            A, B = _mat(a[emb_col]), _mat(b[emb_col])
            d2 = ((A * A).sum(1)[:, None] + (B * B).sum(1)[None, :]
                  - 2.0 * (A @ B.T))
            ii, jj = np.nonzero(d2 <= eps2)
            ra = a[id_col].to_numpy(dtype=np.int64)[ii]
            rb = b[id_col].to_numpy(dtype=np.int64)[jj]
        return pd.DataFrame({
            "id_a": np.minimum(ra, rb), "id_b": np.maximum(ra, rb),
        })

    return grouped_block_map(
        ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True),
        ["pk_a", "pk_b"], score_group,
    )


def dbscan_embeddings(
    ds: ray.data.Dataset,
    *,
    eps2: float,
    min_pts: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_shards: int = 8,
) -> ray.data.Dataset:
    """DBSCAN (Ester, Kriegel, Sander, Xu 1996, KDD) over an embedding
    column, fully distributed and deterministic:

    1. eps-neighbor pairs via the exact sharded all-pairs self-join
       (``euclidean_pairs_within``; at corpus scale swap in an LSH/IVF
       bucket prefilter to bound candidate pairs — same contract);
    2. degree per point (one keyed exchange) -> core iff
       |N_eps(p)| >= min_pts (count includes the point itself);
    3. clusters = connected components of the core-core eps graph
       (dedup.py:connected_components min-label propagation), so a
       cluster id is the min core id in it; isolated cores keep their
       own id;
    4. border points (non-core with >= 1 core eps-neighbor) join the
       cluster of their MINIMUM-ID core neighbor. Classic DBSCAN gives
       borders to whichever core claims them first (scan-order
       dependent); the min-id rule is the deterministic refinement
       that makes an exact SQL oracle possible;
    5. everything else is noise (cluster -1).

    Every step is a keyed exchange or a streaming map over
    schema-aligned union legs — no driver-side materialization.
    Returns (id_col, role, cluster); role in {core, border, noise}."""
    from .dedup import connected_components
    from .exchange import block_map

    I64, I8, B = pa.int64(), pa.int8(), pa.bool_()

    pairs = euclidean_pairs_within(
        ds, eps2=eps2, id_col=id_col, emb_col=emb_col, n_shards=n_shards
    ).materialize()

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t["id_a"].combine_chunks().cast(I64)
        b = t["id_b"].combine_chunks().cast(I64)
        return pa.table({
            "node": pa.concat_arrays([a, b]),
            "nbr": pa.concat_arrays([b, a]),
        })

    dirs = pairs.map_batches(both_dirs, batch_format="pyarrow").materialize()

    # ---- exchange A: core flag for EVERY id (ids + directed edges)
    def id_emit(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t[id_col].combine_chunks().cast(I64),
            "nbr": pa.nulls(len(t), I64),
        })

    def core_flags(df: pd.DataFrame) -> pd.DataFrame:
        ids_here = df.loc[df["nbr"].isna(), "node"].to_numpy(dtype=np.int64)
        deg = df[df["nbr"].notna()].groupby("node", sort=False).size()
        d = deg.reindex(ids_here, fill_value=0).to_numpy(dtype=np.int64)
        return pd.DataFrame({"node": ids_here, "is_core": (d + 1 >= min_pts)})

    core = block_map(
        ds.map_batches(id_emit, batch_format="pyarrow").union(dirs),
        ["node"], core_flags, batch_format="pandas", zero_copy_batch=False,
    ).materialize()

    # ---- exchange B: attach nbr_core (key = nbr), then C: node_core
    def edge_leg_b(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"], "nbr": t["nbr"],
            "is_core": pa.nulls(len(t), B),
            "side": pa.array(np.zeros(len(t), dtype=np.int8), I8),
        })

    def core_leg_b(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.nulls(len(t), I64),
            "nbr": t["node"].combine_chunks().cast(I64),
            "is_core": t["is_core"],
            "side": pa.array(np.ones(len(t), dtype=np.int8), I8),
        })

    def attach_nbr(df: pd.DataFrame) -> pd.DataFrame:
        # nulls in union legs promote int64 to float64: cast back so
        # every downstream union leg keeps an int64 arrow schema
        flags = df[df["side"] == 1].set_index("nbr")["is_core"]
        e = df[df["side"] == 0][["node", "nbr"]].astype(np.int64)
        e["nbr_core"] = e["nbr"].map(flags).eq(True)  # NaN -> False
        return e

    dirs_nbr = block_map(
        dirs.map_batches(edge_leg_b, batch_format="pyarrow").union(
            core.map_batches(core_leg_b, batch_format="pyarrow")),
        ["nbr"], attach_nbr, batch_format="pandas", zero_copy_batch=False,
    )

    def edge_leg_c(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"], "nbr": t["nbr"], "nbr_core": t["nbr_core"],
            "is_core": pa.nulls(len(t), B),
            "side": pa.array(np.zeros(len(t), dtype=np.int8), I8),
        })

    def core_leg_c(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"].combine_chunks().cast(I64),
            "nbr": pa.nulls(len(t), I64),
            "nbr_core": pa.nulls(len(t), B),
            "is_core": t["is_core"],
            "side": pa.array(np.ones(len(t), dtype=np.int8), I8),
        })

    def attach_node(df: pd.DataFrame) -> pd.DataFrame:
        flags = df[df["side"] == 1].set_index("node")["is_core"]
        e = df[df["side"] == 0][["node", "nbr", "nbr_core"]].copy()
        e["node"] = e["node"].astype(np.int64)
        e["nbr"] = e["nbr"].astype(np.int64)
        e["node_core"] = e["node"].map(flags).eq(True)
        return e

    dirs_full = block_map(
        dirs_nbr.map_batches(edge_leg_c, batch_format="pyarrow").union(
            core.map_batches(core_leg_c, batch_format="pyarrow")),
        ["node"], attach_node, batch_format="pandas", zero_copy_batch=False,
    ).materialize()

    # ---- connected components over core-core edges
    def core_edges(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["node_core"] & df["nbr_core"] & (df["node"] < df["nbr"])]
        return pd.DataFrame({
            "id_a": e["node"].to_numpy(dtype=np.int64),
            "id_b": e["nbr"].to_numpy(dtype=np.int64),
        })

    comp = connected_components(
        dirs_full.map_batches(core_edges, batch_format="pandas")
    )

    # ---- exchange D: border -> min-id core neighbor -> that core's label
    def border_min(df: pd.DataFrame) -> pd.DataFrame:
        e = df[(~df["node_core"]) & df["nbr_core"]]
        if not len(e):
            return pd.DataFrame({
                "node": pd.Series([], dtype=np.int64),
                "core_nbr": pd.Series([], dtype=np.int64),
            })
        m = e.groupby("node", sort=False)["nbr"].min().reset_index()
        return m.rename(columns={"nbr": "core_nbr"}).astype(np.int64)

    borders = block_map(
        dirs_full, ["node"], border_min,
        batch_format="pandas", zero_copy_batch=False,
    )

    def border_leg_d(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"], "core_nbr": t["core_nbr"],
            "label": pa.nulls(len(t), I64),
            "side": pa.array(np.zeros(len(t), dtype=np.int8), I8),
        })

    def comp_leg_d(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.nulls(len(t), I64),
            "core_nbr": t["node"].combine_chunks().cast(I64),
            "label": t["label"].combine_chunks().cast(I64),
            "side": pa.array(np.ones(len(t), dtype=np.int8), I8),
        })

    def label_join(df: pd.DataFrame) -> pd.DataFrame:
        lab = df[df["side"] == 1].set_index("core_nbr")["label"]
        b = df[df["side"] == 0][["node", "core_nbr"]].astype(np.int64)
        b["cluster"] = b["core_nbr"].map(lab)
        # a core with no core-core edge is its own (isolated) cluster
        b["cluster"] = b["cluster"].fillna(b["core_nbr"]).astype(np.int64)
        return b[["node", "cluster"]]

    border_lab = block_map(
        borders.map_batches(border_leg_d, batch_format="pyarrow").union(
            comp.map_batches(comp_leg_d, batch_format="pyarrow")),
        ["core_nbr"], label_join, batch_format="pandas", zero_copy_batch=False,
    )

    # ---- exchange E: every id gets (role, cluster)
    def leg_e(kind: int):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            return pa.table({
                "node": t["node"].combine_chunks().cast(I64),
                "is_core": (t["is_core"] if kind == 1 else pa.nulls(n, B)),
                "cluster": (t["cluster"].combine_chunks().cast(I64)
                            if kind in (2, 3) else pa.nulls(n, I64)),
                "kind": pa.array(np.full(n, kind, dtype=np.int8), I8),
            })
        return fn

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df[df["kind"] == 0][["node"]].copy()
        flags = df[df["kind"] == 1].set_index("node")["is_core"]
        comp_l = df[df["kind"] == 2].set_index("node")["cluster"]
        bord_l = df[df["kind"] == 3].set_index("node")["cluster"]
        out["is_core"] = out["node"].map(flags).eq(True)
        out["comp"] = out["node"].map(comp_l)
        out["bord"] = out["node"].map(bord_l)
        role = np.where(
            out["is_core"], "core",
            np.where(out["bord"].notna(), "border", "noise"),
        )
        cluster = np.where(
            out["is_core"],
            out["comp"].fillna(out["node"].astype(np.float64)),  # isolated core
            out["bord"].fillna(-1.0),
        ).astype(np.int64)
        return pd.DataFrame({
            id_col: out["node"].to_numpy(dtype=np.int64),
            "role": role,
            "cluster": cluster,
        })

    ids_only = ds.map_batches(
        lambda t: pa.table({"node": t[id_col].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow",
    )
    comp_ren = comp.map_batches(
        lambda df: df.rename(columns={"label": "cluster"}), batch_format="pandas"
    )
    u = (ids_only.map_batches(leg_e(0), batch_format="pyarrow")
         .union(core.map_batches(leg_e(1), batch_format="pyarrow"))
         .union(comp_ren.map_batches(leg_e(2), batch_format="pyarrow"))
         .union(border_lab.map_batches(leg_e(3), batch_format="pyarrow")))
    return block_map(
        u, ["node"], final, batch_format="pandas", zero_copy_batch=False,
    )
