"""From-scratch decision-tree / random-forest / gradient-boosting
regressors for model-based gap-filling.

The reference's flagship gap-fillers are sklearn RandomForestRegressor
and XGBRegressor (diive/gapfilling/randomforest_ts.py:163,
xgboost_ts.py); neither library ships in this container, so this is a
clean-room numpy CART implementation behind the same stage contract as
stages/mlfill.py (train per key -> broadcast -> actor-pool predict).

Design notes:

* trees are stored as flat int/float arrays (feature, threshold,
  left, right, leaf value) — ray.put-friendly and predict is a
  vectorized level-by-level descent (no per-sample Python recursion);
* split search is exact: per feature one argsort + prefix sums of
  (y, y^2) give every candidate split's variance reduction in O(n)
  after the sort;
* determinism: every random choice (bootstrap rows, feature
  subsampling) comes from a Philox generator seeded by the caller, so
  a per-key model is reproducible across runs and cluster sizes.
"""

from __future__ import annotations

import numpy as np

# flat-tree column indices
_F, _T, _L, _R, _V = 0, 1, 2, 3, 4


def _best_split(X: np.ndarray, y: np.ndarray, feat_idx: np.ndarray, min_leaf: int):
    """Exact best (feature, threshold) by variance reduction; None if
    no split beats the parent."""
    n = len(y)
    best = (None, 0.0, 0.0)  # (feature, threshold, score)
    y_sum = y.sum()
    y2_sum = (y * y).sum()
    parent_sse = y2_sum - y_sum * y_sum / n
    best_gain = 1e-12
    for f in feat_idx:
        order = np.argsort(X[:, f], kind="stable")
        xs = X[order, f]
        ys = y[order]
        cy = np.cumsum(ys)
        cy2 = np.cumsum(ys * ys)
        # candidate split after position i (left = [0..i]), i in [min_leaf-1, n-min_leaf-1]
        i = np.arange(min_leaf - 1, n - min_leaf)
        if not len(i):
            continue
        nl = i + 1.0
        nr = n - nl
        sse_l = cy2[i] - cy[i] * cy[i] / nl
        sse_r = (y2_sum - cy2[i]) - (y_sum - cy[i]) * (y_sum - cy[i]) / nr
        gain = parent_sse - (sse_l + sse_r)
        # a split must separate distinct x values
        valid = xs[i] < xs[i + 1]
        gain = np.where(valid, gain, -np.inf)
        j = int(np.argmax(gain))
        if gain[j] > best_gain:
            best_gain = gain[j]
            thr = 0.5 * (xs[i[j]] + xs[i[j] + 1])
            best = (int(f), float(thr), float(gain[j]))
    return best if best[0] is not None else None


def fit_tree(
    X: np.ndarray,
    y: np.ndarray,
    *,
    max_depth: int = 6,
    min_leaf: int = 3,
    feature_frac: float = 1.0,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """CART regression tree -> flat [n_nodes, 5] float64 array
    (feature, threshold, left, right, value); feature == -1 marks a
    leaf holding the mean."""
    n_feat = X.shape[1]
    k = max(1, int(round(feature_frac * n_feat)))
    nodes: list[list[float]] = []

    def grow(idx: np.ndarray, depth: int) -> int:
        node_id = len(nodes)
        nodes.append([-1.0, 0.0, -1.0, -1.0, float(y[idx].mean())])
        if depth >= max_depth or len(idx) < 2 * min_leaf:
            return node_id
        feat_idx = (
            np.arange(n_feat)
            if k == n_feat or rng is None
            else np.sort(rng.choice(n_feat, size=k, replace=False))
        )
        found = _best_split(X[idx], y[idx], feat_idx, min_leaf)
        if found is None:
            return node_id
        f, thr, _ = found
        mask = X[idx, f] <= thr
        left = grow(idx[mask], depth + 1)
        right = grow(idx[~mask], depth + 1)
        nodes[node_id][_F] = float(f)
        nodes[node_id][_T] = thr
        nodes[node_id][_L] = float(left)
        nodes[node_id][_R] = float(right)
        return node_id

    grow(np.arange(len(y)), 0)
    return np.asarray(nodes, dtype=np.float64)


def predict_tree(tree: np.ndarray, X: np.ndarray) -> np.ndarray:
    """Vectorized level-by-level descent: one gather per depth level
    across all samples (no per-sample Python)."""
    n = len(X)
    node = np.zeros(n, dtype=np.int64)
    out = np.empty(n, dtype=np.float64)
    active = np.arange(n)
    while len(active):
        cur = node[active]
        feat = tree[cur, _F].astype(np.int64)
        is_leaf = feat < 0
        leaf_rows = active[is_leaf]
        out[leaf_rows] = tree[node[leaf_rows], _V]
        active = active[~is_leaf]
        if not len(active):
            break
        cur = node[active]
        feat = tree[cur, _F].astype(np.int64)
        go_left = X[active, feat] <= tree[cur, _T]
        node[active] = np.where(go_left, tree[cur, _L], tree[cur, _R]).astype(np.int64)
    return out


def fit_forest(
    X: np.ndarray,
    y: np.ndarray,
    *,
    n_trees: int = 20,
    max_depth: int = 6,
    min_leaf: int = 3,
    feature_frac: float = 0.7,
    seed: int = 42,
) -> list[np.ndarray]:
    """Random forest: bootstrap rows + per-split feature subsampling
    (the reference's RandomForestTS model class, re-derived)."""
    rng = np.random.Generator(np.random.Philox(key=seed))
    n = len(y)
    trees = []
    for _ in range(n_trees):
        rows = rng.integers(0, n, size=n)
        trees.append(
            fit_tree(X[rows], y[rows], max_depth=max_depth, min_leaf=min_leaf,
                     feature_frac=feature_frac, rng=rng)
        )
    return trees


def predict_forest(trees: list[np.ndarray], X: np.ndarray) -> np.ndarray:
    acc = np.zeros(len(X), dtype=np.float64)
    for t in trees:
        acc += predict_tree(t, X)
    return acc / len(trees)


def fit_gbm(
    X: np.ndarray,
    y: np.ndarray,
    *,
    n_estimators: int = 50,
    learning_rate: float = 0.1,
    max_depth: int = 3,
    min_leaf: int = 3,
    seed: int = 42,
) -> tuple[float, float, list[np.ndarray]]:
    """Least-squares gradient boosting (the XGBoostTS stand-in): each
    stage fits a shallow CART to the residual. Returns
    (base_prediction, learning_rate, trees)."""
    rng = np.random.Generator(np.random.Philox(key=seed))
    base = float(y.mean())
    resid = y - base
    trees: list[np.ndarray] = []
    for _ in range(n_estimators):
        t = fit_tree(X, resid, max_depth=max_depth, min_leaf=min_leaf, rng=rng)
        resid = resid - learning_rate * predict_tree(t, X)
        trees.append(t)
    return base, learning_rate, trees


def predict_gbm(model: tuple[float, float, list[np.ndarray]], X: np.ndarray) -> np.ndarray:
    base, lr, trees = model
    acc = np.full(len(X), base, dtype=np.float64)
    for t in trees:
        acc += lr * predict_tree(t, X)
    return acc
