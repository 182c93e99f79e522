"""Accumulated Local Effects + driver-importance analysis, Ray-Data-native.

Re-derivation of the reference's dependency-free driver analysis
(/root/reference/diive/analysis/driveranalysis/ale.py:192-255 for the 1D
ALE estimator, ale.py:258-322 for the second-order surface,
driveranalysis.py:388-402 for the noise-floor relevance rule). The
reference evaluates the model per quantile bin in a Python loop over
bins; here each streaming batch makes exactly TWO model evaluations
(feature pinned to its bin's lower / upper edge for every row at once)
and emits sparse per-bin (delta_sum, count) partials, so the whole curve
costs one pass over the Dataset with a broadcast model and no shuffle.

Quantile bin edges are exact distributed order statistics with linear
interpolation (numpy ``np.quantile`` parity), computed via the shared
3-pass histogram-refinement selector (stages/stratified.py) — bounded
driver memory at any scale.

Importance: the reference attributes drivers with SHAP
(driveranalysis.py:92-105; the shap package is absent from this
container), so the noise-floor contract is carried by *permutation
importance* instead: MSE increase when a feature column is permuted,
measured against the same ``.RANDOM`` synthetic noise feature the
reference uses as its relevance floor (driveranalysis.py:49-66).
Permutation is within-block with a deterministic content-seeded RNG:
blocks hold thousands of rows, so within-block permutation breaks the
feature/target association exactly as a global permutation does while
keeping the op single-pass and shuffle-free.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from .exchange import driver_combine
from .stratified import exact_rank_values

RANDOM_COL = ".RANDOM"

# Per-worker broadcast cache for task-mode stages: ray.get is zero-copy
# for numpy but model unpickling is not free, so each worker process
# resolves a given ObjectRef once. Bounded: cleared when it outgrows a
# handful of refs (stages here broadcast one model + one edge array).
_PAYLOAD_CACHE: dict = {}


def _get_broadcast(ref):
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _PAYLOAD_CACHE:
        if len(_PAYLOAD_CACHE) > 8:
            _PAYLOAD_CACHE.clear()
        _PAYLOAD_CACHE[key] = ray.get(ref) if hasattr(ref, "hex") else ref
    return _PAYLOAD_CACHE[key]


# --------------------------------------------------------------- edges


def quantile_edges_array(values: np.ndarray, grid_size: int) -> np.ndarray:
    """In-memory quantile edge rule (ale.py:175-184 parity): linspace
    probs, np.quantile, dedup, degenerate-span guard. Shared by tests as
    the oracle for the distributed path."""
    probs = np.linspace(0, 1, grid_size + 1)
    edges = np.unique(np.quantile(values, probs))
    if edges.size < 2:
        lo = float(values.min())
        edges = np.array([lo, lo + 1e-9])
    return edges


def exact_quantile_values(
    ds: rd.Dataset, value_col: str, id_col: str, probs: np.ndarray
) -> np.ndarray:
    """Distributed np.quantile (linear interpolation): exact order
    statistics at floor/ceil of h = p*(n-1) via the 3-pass selector,
    interpolated driver-side. Returns one value per prob."""
    probs = np.asarray(probs, dtype=np.float64)
    state: dict = {}

    def ranks_fn(n: int) -> np.ndarray:
        h = probs * (n - 1)
        state["h"] = h
        return np.unique(
            np.concatenate([np.floor(h), np.ceil(h)]).astype(np.int64)
        )

    n, vals = exact_rank_values(ds, value_col, id_col, ranks_fn)
    if n == 0:
        return np.full(len(probs), np.nan)
    ranks = ranks_fn(n)
    by_rank = dict(zip(ranks.tolist(), [v for v, _ in vals]))
    h = state["h"]
    lo_r = np.floor(h).astype(np.int64)
    hi_r = np.ceil(h).astype(np.int64)
    lo_v = np.array([by_rank[r] for r in lo_r])
    hi_v = np.array([by_rank[r] for r in hi_r])
    frac = h - lo_r
    return lo_v + frac * (hi_v - lo_v)


def exact_quantile_edges(
    ds: rd.Dataset, value_col: str, id_col: str, grid_size: int
) -> np.ndarray:
    """Distributed quantile_edges_array: same dedup + degenerate guard."""
    probs = np.linspace(0, 1, grid_size + 1)
    edges = np.unique(exact_quantile_values(ds, value_col, id_col, probs))
    edges = edges[np.isfinite(edges)]
    if edges.size < 2:
        lo = float(edges[0]) if edges.size else 0.0
        edges = np.array([lo, lo + 1e-9])
    return edges


# --------------------------------------------------------------- 1D ALE


def _ale_delta_batch(payload, predict, features, j, edges, df: pd.DataFrame) -> pd.DataFrame:
    """Two vectorized predictions + a sparse bincount partial per batch."""
    X = df[features].to_numpy(dtype=np.float64)
    X = X[np.isfinite(X).all(axis=1)]
    n_bins = edges.size - 1
    if X.shape[0] == 0:
        return pd.DataFrame({"bin": [], "dsum": [], "c": []}).astype(
            {"bin": np.int64, "dsum": np.float64, "c": np.int64}
        )
    # ale.py:219-220 bin rule: searchsorted left, clipped to [1, n_bins]
    idx = np.clip(np.searchsorted(edges, X[:, j], side="left"), 1, n_bins)
    X_lo = X.copy()
    X_lo[:, j] = edges[idx - 1]
    X_hi = X.copy()
    X_hi[:, j] = edges[idx]
    d = predict(payload, X_hi) - predict(payload, X_lo)
    dsum = np.bincount(idx - 1, weights=d, minlength=n_bins)
    c = np.bincount(idx - 1, minlength=n_bins)
    nz = np.flatnonzero(c)
    return pd.DataFrame(
        {"bin": nz.astype(np.int64), "dsum": dsum[nz], "c": c[nz].astype(np.int64)}
    )


class _AleDelta:
    """Actor-pool batch stage: model unpickled once per actor in
    __init__ — use for heavy models (use_actors=True)."""

    def __init__(self, model_ref, predict_fn, features, feature, edges):
        self.payload = ray.get(model_ref)
        self.predict = predict_fn
        self.features = list(features)
        self.j = self.features.index(feature)
        self.edges = np.asarray(edges, dtype=np.float64)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return _ale_delta_batch(
            self.payload, self.predict, self.features, self.j, self.edges, df
        )


def ale_1d(
    ds: rd.Dataset,
    model_ref,
    predict_fn: Callable[[object, np.ndarray], np.ndarray],
    features: Iterable[str],
    feature: str,
    *,
    grid_size: int = 20,
    edges: np.ndarray | None = None,
    id_col: str | None = None,
    concurrency=(1, 8),
    use_actors: bool = False,
) -> pd.DataFrame:
    """1D ALE curve (ale.py:192-255 semantics) over a Dataset.

    Returns a frame with one row per bin edge: ``edge_idx``,
    ``bin_edge``, ``ale`` (centered, data-weighted mean zero),
    ``bin_count`` (count of the bin ENDING at this edge; 0 for the
    first edge). ``edges`` may be precomputed; otherwise exact
    distributed quantile edges are derived (requires ``id_col``).
    ``use_actors=True`` runs the delta stage as an actor pool (model
    resolved once per actor) — worth the pool spin-up only for heavy
    models; task mode resolves the broadcast once per worker process."""
    features = list(features)
    if edges is None:
        if id_col is None:
            raise ValueError("id_col required when edges are not precomputed")
        edges = exact_quantile_edges(ds, feature, id_col, grid_size)
    edges = np.asarray(edges, dtype=np.float64)
    n_bins = edges.size - 1

    if use_actors:
        mapped = ds.map_batches(
            _AleDelta,
            batch_format="pandas",
            concurrency=concurrency,
            fn_constructor_args=(model_ref, predict_fn, features, feature, edges),
        )
    else:
        j = features.index(feature)

        def delta(df: pd.DataFrame) -> pd.DataFrame:
            return _ale_delta_batch(
                _get_broadcast(model_ref), predict_fn, features, j, edges, df
            )

        mapped = ds.map_batches(delta, batch_format="pandas")

    parts = driver_combine(
        mapped,
        lambda t: t.to_pandas() if not isinstance(t, pd.DataFrame) else t,
        lambda df: df.groupby("bin", as_index=False)[["dsum", "c"]].sum(),
        batch_format="pandas",
    )
    dsum = np.zeros(n_bins)
    counts = np.zeros(n_bins, dtype=np.int64)
    if len(parts):
        dsum[parts["bin"].to_numpy(dtype=np.int64)] = parts["dsum"].to_numpy()
        counts[parts["bin"].to_numpy(dtype=np.int64)] = parts["c"].to_numpy()
    local_delta = np.divide(
        dsum, counts, out=np.zeros(n_bins), where=counts > 0
    )
    # ale.py:243-252: accumulate from the zero reference edge, then center
    # to data-weighted zero mean over segment midpoints.
    ale_unc = np.concatenate([[0.0], np.cumsum(local_delta)])
    if counts.sum() > 0:
        seg_mid = (ale_unc[:-1] + ale_unc[1:]) / 2.0
        ale = ale_unc - float(np.sum(seg_mid * counts) / counts.sum())
    else:
        ale = ale_unc
    return pd.DataFrame(
        {
            "edge_idx": np.arange(edges.size, dtype=np.int64),
            "bin_edge": edges,
            "ale": ale,
            "bin_count": np.concatenate([[0], counts]).astype(np.int64),
        }
    )


def ale_direction(ale: np.ndarray, flat_threshold: float) -> str:
    """Curve-shape classification (ale.py:64-91 rule re-derivation):
    '+', '-', 'peak', 'trough', 'flat', or 'nonmonotonic' (ASCII labels
    for the unimodal glyphs)."""
    ale = np.asarray(ale, dtype=np.float64)
    rng = float(np.nanmax(ale) - np.nanmin(ale)) if ale.size else 0.0
    if ale.size < 2 or rng <= flat_threshold:
        return "flat"
    diffs = np.diff(ale)
    tol = 0.02 * rng
    up = diffs > tol
    down = diffs < -tol
    if not down.any():
        return "+"
    if not up.any():
        return "-"
    sign = np.sign(diffs[np.abs(diffs) > tol])
    n_changes = int((np.diff(sign) != 0).sum()) if sign.size else 0
    if n_changes == 1:
        return "peak" if sign[0] > 0 else "trough"
    return "nonmonotonic"


# --------------------------------------------------------------- 2D ALE


def _ale2d_delta_batch(payload, predict, features, j1, j2, xe, ye, df) -> pd.DataFrame:
    """Four corner predictions per batch -> sparse per-cell second
    differences (ale.py:289-309, vectorized across the whole batch)."""
    X = df[features].to_numpy(dtype=np.float64)
    X = X[np.isfinite(X).all(axis=1)]
    nx, ny = xe.size - 1, ye.size - 1
    if X.shape[0] == 0:
        return pd.DataFrame({"cell": [], "dsum": [], "c": []}).astype(
            {"cell": np.int64, "dsum": np.float64, "c": np.int64}
        )
    xi = np.clip(np.searchsorted(xe, X[:, j1], side="left"), 1, nx)
    yi = np.clip(np.searchsorted(ye, X[:, j2], side="left"), 1, ny)

    def at(ex, ey):
        Z = X.copy()
        Z[:, j1] = ex
        Z[:, j2] = ey
        return predict(payload, Z)

    second = (
        at(xe[xi], ye[yi])
        - at(xe[xi - 1], ye[yi])
        - at(xe[xi], ye[yi - 1])
        + at(xe[xi - 1], ye[yi - 1])
    )
    cell = (yi - 1) * nx + (xi - 1)
    dsum = np.bincount(cell, weights=second, minlength=nx * ny)
    c = np.bincount(cell, minlength=nx * ny)
    nz = np.flatnonzero(c)
    return pd.DataFrame(
        {"cell": nz.astype(np.int64), "dsum": dsum[nz], "c": c[nz].astype(np.int64)}
    )


def ale_2d(
    ds: rd.Dataset,
    model_ref,
    predict_fn: Callable[[object, np.ndarray], np.ndarray],
    features: Iterable[str],
    f1: str,
    f2: str,
    *,
    grid_size: int = 10,
    x_edges: np.ndarray | None = None,
    y_edges: np.ndarray | None = None,
    id_col: str | None = None,
) -> pd.DataFrame:
    """Second-order (interaction) ALE surface (ale.py:258-322). Returns
    long-form rows (x_edge_idx, y_edge_idx, x_edge, y_edge, ale2)."""
    features = list(features)
    if x_edges is None or y_edges is None:
        if id_col is None:
            raise ValueError("id_col required when edges are not precomputed")
        x_edges = exact_quantile_edges(ds, f1, id_col, grid_size) if x_edges is None else x_edges
        y_edges = exact_quantile_edges(ds, f2, id_col, grid_size) if y_edges is None else y_edges
    xe = np.asarray(x_edges, dtype=np.float64)
    ye = np.asarray(y_edges, dtype=np.float64)
    nx, ny = xe.size - 1, ye.size - 1
    j1, j2 = features.index(f1), features.index(f2)

    def delta(df: pd.DataFrame) -> pd.DataFrame:
        return _ale2d_delta_batch(
            _get_broadcast(model_ref), predict_fn, features, j1, j2, xe, ye, df
        )

    parts = driver_combine(
        ds.map_batches(delta, batch_format="pandas"),
        lambda t: t.to_pandas() if not isinstance(t, pd.DataFrame) else t,
        lambda df: df.groupby("cell", as_index=False)[["dsum", "c"]].sum(),
        batch_format="pandas",
    )
    dsum = np.zeros(nx * ny)
    counts = np.zeros(nx * ny, dtype=np.int64)
    if len(parts):
        dsum[parts["cell"].to_numpy(dtype=np.int64)] = parts["dsum"].to_numpy()
        counts[parts["cell"].to_numpy(dtype=np.int64)] = parts["c"].to_numpy()
    delta = np.divide(dsum, counts, out=np.zeros(nx * ny), where=counts > 0)
    delta = delta.reshape(ny, nx)
    acc = np.cumsum(np.cumsum(delta, axis=0), axis=1)
    acc = np.pad(acc, ((1, 0), (1, 0)), mode="constant")
    # double-center (ale.py:316-320): remove main effects, restore grand mean
    row_mean = acc.mean(axis=1, keepdims=True)
    col_mean = acc.mean(axis=0, keepdims=True)
    ale = acc - row_mean - col_mean + float(acc.mean())
    yy, xx = np.meshgrid(np.arange(ye.size), np.arange(xe.size), indexing="ij")
    return pd.DataFrame(
        {
            "x_edge_idx": xx.ravel().astype(np.int64),
            "y_edge_idx": yy.ravel().astype(np.int64),
            "x_edge": xe[xx.ravel()],
            "y_edge": ye[yy.ravel()],
            "ale2": ale.ravel(),
        }
    )


# ------------------------------------------------- permutation importance


def add_random_feature(df: pd.DataFrame, id_col: str, seed: int = 42) -> pd.DataFrame:
    """Deterministic `.RANDOM` noise column from a content hash of the id
    column (driveranalysis.py:49-66's noise floor, reproducible across
    cluster sizes because it depends only on row identity)."""
    import zlib

    ids = df[id_col].astype(str)
    h = np.array(
        [zlib.crc32((s + f"|{seed}").encode()) for s in ids], dtype=np.uint64
    )
    df = df.copy()
    df[RANDOM_COL] = (h % 1_000_003).astype(np.float64) / 1_000_003.0
    return df


def _perm_sse_batch(payload, predict, features, target_col, seed, df) -> pd.DataFrame:
    """Per-batch baseline SSE + per-feature permuted SSE partials.

    Permutation is within the batch with a deterministic RNG seeded by
    (seed, feature index, batch content hash) so results are independent
    of scheduling order given identical blocks."""
    import zlib

    X = df[features].to_numpy(dtype=np.float64)
    y = df[target_col].to_numpy(dtype=np.float64)
    ok = np.isfinite(X).all(axis=1) & np.isfinite(y)
    X, y = X[ok], y[ok]
    n = X.shape[0]
    if n == 0:
        return pd.DataFrame({"feature": [], "sse": [], "n": []}).astype(
            {"feature": str, "sse": np.float64, "n": np.int64}
        )
    base = predict(payload, X)
    rows = [("__base__", float(np.sum((base - y) ** 2)), n)]
    content = zlib.crc32(np.ascontiguousarray(y).tobytes())
    for j, f in enumerate(features):
        rng = np.random.default_rng((seed, j, content))
        Z = X.copy()
        Z[:, j] = Z[rng.permutation(n), j]
        pred = predict(payload, Z)
        rows.append((f, float(np.sum((pred - y) ** 2)), n))
    return pd.DataFrame(rows, columns=["feature", "sse", "n"])


def permutation_importance(
    ds: rd.Dataset,
    model_ref,
    predict_fn: Callable[[object, np.ndarray], np.ndarray],
    features: Iterable[str],
    target_col: str,
    *,
    seed: int = 42,
) -> pd.DataFrame:
    """Distributed permutation importance with noise-floor relevance.

    Returns per-feature rows sorted by importance (MSE increase over the
    unpermuted baseline) with the ternary ``relevant`` label measured
    against the ``.RANDOM`` feature's importance — the
    driveranalysis.py:388-402 rule (yes >= floor, weak >= floor/2)."""
    features = list(features)

    def perm(df: pd.DataFrame) -> pd.DataFrame:
        return _perm_sse_batch(
            _get_broadcast(model_ref), predict_fn, features, target_col, seed, df
        )

    parts = driver_combine(
        ds.map_batches(perm, batch_format="pandas"),
        lambda t: t.to_pandas() if not isinstance(t, pd.DataFrame) else t,
        lambda df: df.groupby("feature", as_index=False)[["sse", "n"]].sum(),
        batch_format="pandas",
    )
    tot = parts.set_index("feature")
    n = float(tot["n"].max())
    base_mse = float(tot.loc["__base__", "sse"]) / n
    rows = []
    for f in features:
        mse = float(tot.loc[f, "sse"]) / n
        rows.append((f, mse - base_mse))
    out = pd.DataFrame(rows, columns=["feature", "importance"])
    floor = float(
        out.loc[out["feature"] == RANDOM_COL, "importance"].iloc[0]
    ) if (out["feature"] == RANDOM_COL).any() else 0.0
    floor = max(floor, 1e-12)

    def rel(v: float) -> str:
        if v >= floor:
            return "yes"
        if v >= 0.5 * floor:
            return "weak"
        return "no"

    out["relevant"] = [rel(v) for v in out["importance"]]
    out["baseline_mse"] = base_mse
    return out.sort_values("importance", ascending=False).reset_index(drop=True)
