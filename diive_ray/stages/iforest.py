"""Isolation Forest anomaly scoring (Liu, Ting & Zhou 2008, ICDM).

Reference parity: diive's outlier family (LocalOutlierFactor,
outlierdetection/lof.py; zscore/hampel in core/outlierdetection/) is a
per-series screening toolkit; Isolation Forest is the standard
unsupervised complement for MULTIVARIATE anomaly scoring over an
embedding / feature column — each tree isolates points by random
axis-aligned splits, anomalies sit at short average path lengths.

From-scratch and deterministic (no sklearn in this container): the
subsampling is a Knuth-hash sample (reproducible across cluster sizes
and partitionings — the property random/reservoir sampling lacks), the
per-tree subsets and split choices come from a seeded Philox stream.

100-TB shape:
* TRAIN — ONE `driver_combine` pass: each batch emits its <= S
  smallest-hash (id, vector) rows, the driver keeps the global S
  smallest (S*d floats of driver state, S=1024 default; the corpus
  never moves) and grows `n_trees` iTrees over psi-subsamples of the
  pool. Forest size ~ n_trees * 2*psi nodes of int32/float64 — a few
  hundred KB.
* SCORE — forest `ray.put` once; one stateless vectorized map_batches:
  per tree the whole batch descends level-synchronously (max-depth
  ~ log2(psi) fancy-indexing steps, no Python per row), path lengths
  average across trees, s = 2^(-E[h]/c(psi)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .packing import KNUTH


def _c(n) -> np.ndarray | float:
    """Average unsuccessful-search path length in a BST of n points
    (Liu 2008 eq. 1): c(n) = 2 H(n-1) - 2 (n-1)/n, c(<=1) = 0."""
    n = np.asarray(n, dtype=np.float64)
    out = np.zeros_like(n)
    out[np.abs(n - 2.0) < 0.5] = 1.0  # exact H(1)=1; ln+gamma undershoots
    m = n > 2.5
    nm = n[m]
    out[m] = 2.0 * (np.log(nm - 1.0) + np.euler_gamma) - 2.0 * (nm - 1.0) / nm
    return out if out.ndim else float(out)


class IsolationForest:
    """Flat-array forest: per node feature (-1 = leaf), threshold,
    left/right child index, leaf size. Built on the driver over the
    bounded sample pool; shipped to workers via one ray.put."""

    def __init__(self, feat, thresh, left, right, size, roots, psi):
        self.feat, self.thresh = feat, thresh
        self.left, self.right, self.size = left, right, size
        self.roots, self.psi = roots, psi

    def path_lengths(self, X: np.ndarray) -> np.ndarray:
        """Mean path length per row, level-synchronous descent — one
        fancy-indexed step per depth level per tree, vectorized over
        the whole batch."""
        n = X.shape[0]
        total = np.zeros(n)
        for root in self.roots:
            node = np.full(n, root, dtype=np.int64)
            depth = np.zeros(n)
            while True:
                f = self.feat[node]
                active = f >= 0
                if not active.any():
                    break
                idx = np.flatnonzero(active)
                nf = f[idx]
                go_left = X[idx, nf] < self.thresh[node[idx]]
                node[idx] = np.where(
                    go_left, self.left[node[idx]], self.right[node[idx]])
                depth[idx] += 1.0
            total += depth + _c(self.size[node])
        return total / len(self.roots)

    def scores(self, X: np.ndarray) -> np.ndarray:
        """Anomaly score s(x) = 2^(-E[h(x)] / c(psi)) in (0, 1]."""
        return 2.0 ** (-self.path_lengths(X) / max(_c(self.psi), 1e-12))


def build_iforest(
    pool: np.ndarray, *, n_trees: int = 100, psi: int = 256, seed: int = 7,
) -> IsolationForest:
    """Grow ``n_trees`` iTrees, each over a psi-subsample of ``pool``
    drawn without replacement from a seeded Philox stream; splits are
    uniform in the node's [min, max) of a uniformly-chosen feature.
    Depth cap ceil(log2(psi)) per the paper."""
    rng = np.random.Generator(np.random.Philox(seed))
    n, d = pool.shape
    psi = min(psi, n)
    hlim = int(np.ceil(np.log2(max(psi, 2))))
    feat, thresh, left, right, size = [], [], [], [], []

    def new_node():
        feat.append(-1); thresh.append(0.0)
        left.append(-1); right.append(-1); size.append(0)
        return len(feat) - 1

    def grow(rows: np.ndarray, depth: int) -> int:
        i = new_node()
        size[i] = len(rows)
        if depth >= hlim or len(rows) <= 1:
            return i
        sub = pool[rows]
        lo, hi = sub.min(axis=0), sub.max(axis=0)
        usable = np.flatnonzero(hi > lo)
        if usable.size == 0:  # all duplicates
            return i
        q = int(usable[rng.integers(usable.size)])
        p = float(rng.uniform(lo[q], hi[q]))
        m = sub[:, q] < p
        feat[i], thresh[i] = q, p
        left[i] = grow(rows[m], depth + 1)
        right[i] = grow(rows[~m], depth + 1)
        return i

    roots = [grow(rng.permutation(n)[:psi], 0) for _ in range(n_trees)]
    return IsolationForest(
        np.asarray(feat, dtype=np.int32), np.asarray(thresh, dtype=np.float64),
        np.asarray(left, dtype=np.int64), np.asarray(right, dtype=np.int64),
        np.asarray(size, dtype=np.int64), roots, psi)


def sample_pool(
    ds: rd.Dataset, *, id_col: str, vec_col: str, pool_size: int = 1024,
) -> np.ndarray:
    """Deterministic bounded training pool: the ``pool_size`` rows with
    the smallest Knuth id-hash (partitioning/cluster-size invariant).
    Each batch ships <= pool_size (id, vector) candidates; driver keeps
    the global smallest, sorted by (hash, id) so pool ROW ORDER — and
    hence every Philox subsample — is bit-stable."""
    from .exchange import driver_combine
    from .similarity import _batch_matrix

    def partial(t: pa.Table) -> pd.DataFrame:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            h = ((ids.astype(np.uint64) * KNUTH) % np.uint64(2**32)).astype(np.int64)
        keep = np.argsort(h, kind="stable")[:pool_size]
        X = _batch_matrix(t, vec_col)
        return pd.DataFrame({
            "_id": ids[keep], "_h": h[keep], "_v": list(X[keep]),
        })

    def combine(df: pd.DataFrame) -> np.ndarray:
        df = df.sort_values(["_h", "_id"], kind="stable").head(pool_size)
        return np.ascontiguousarray(np.stack(df["_v"].to_numpy()))

    return driver_combine(ds, partial, combine)


def iforest_scores(
    ds: rd.Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_trees: int = 100,
    psi: int = 256,
    pool_size: int = 1024,
    seed: int = 7,
    keep_cols: tuple = (),
    out_col: str = "iforest_score",
) -> rd.Dataset:
    """End-to-end: bounded-pool train on the driver, broadcast once,
    stateless vectorized scoring pass. Output: (id_col, keep_cols...,
    out_col)."""
    pool = sample_pool(ds, id_col=id_col, vec_col=vec_col, pool_size=pool_size)
    forest = build_iforest(pool, n_trees=n_trees, psi=psi, seed=seed)
    ref = ray.put(forest)

    def fn(t: pa.Table) -> pa.Table:
        from .ale import _get_broadcast
        from .similarity import _batch_matrix

        f: IsolationForest = _get_broadcast(ref)
        X = _batch_matrix(t, vec_col)
        cols = {id_col: t[id_col]}
        cols.update({c: t[c] for c in keep_cols})
        cols[out_col] = pa.array(f.scores(X), type=pa.float64())
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
