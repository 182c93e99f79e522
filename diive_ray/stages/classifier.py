"""Trained quality classifier — the CCNet / GPT-3-style learned quality
filter (Wenzek et al. 2020 §4.3; Brown et al. 2020 App. A): a linear
classifier over cheap per-doc features, weakly supervised by a
"reference corpus" label (docs from a trusted high-quality source = 1,
rest = 0), then applied corpus-wide to score every document.

Model: logistic regression on the Gopher/C4 feature vector
(functions/text.py:quality_features, log-scaled counts), fit by
Newton-IRLS with a small ridge — deterministic, from scratch (no
sklearn in this container), converges in a handful of iterations at
d = 7.

100-TB shape: the fit uses a DETERMINISTIC bounded hash-sample (the
same Knuth keep rule as stages/packing.py — reproducible at any
cluster size / partitioning, unlike reservoir or random sampling);
only (features, label) rows of the sample reach the driver — ~7
float64s per sampled doc, never text. The corpus-wide pass is scoring
only: weights broadcast once, one vectorized map_batches. Sample rows
are sorted by id before the fit so float summation order — and hence
the fitted weights — is bit-stable across arrival orders.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.text import quality_features

FEATURES = ("log_chars", "log_words", "mean_word_len",
            "punct_ratio", "digit_ratio", "stopword_ratio")


def feature_matrix(texts: pa.Array) -> np.ndarray:
    """[n, 1+d] design matrix (intercept first), float64."""
    f = quality_features(texts)
    n = len(f["n_chars"])
    return np.column_stack([
        np.ones(n),
        np.log1p(f["n_chars"]),
        np.log1p(f["n_words"]),
        f["mean_word_len"],
        f["punct_ratio"],
        f["digit_ratio"],
        f["stopword_ratio"],
    ])


def fit_logistic_irls(
    X: np.ndarray, y: np.ndarray, *, iters: int = 25, ridge: float = 1e-6
) -> np.ndarray:
    """Newton-IRLS for logistic regression, fixed iteration count (no
    data-dependent stopping -> deterministic), ridge keeps the Hessian
    invertible under separable samples."""
    w = np.zeros(X.shape[1])
    I = np.eye(X.shape[1])
    for _ in range(iters):
        z = X @ w
        p = 1.0 / (1.0 + np.exp(-z))
        g = X.T @ (y - p) - ridge * w
        s = np.maximum(p * (1.0 - p), 1e-9)
        H = (X.T * s) @ X + ridge * I
        w = w + np.linalg.solve(H, g)
    return w


def train_quality_classifier(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str | None = None,
    pos_source: str | None = None,
    source_col: str = "source",
    sample_pct: int = 100,
    iters: int = 25,
    ridge: float = 1e-6,
) -> np.ndarray:
    """Fit the classifier on a deterministic hash-sample and return the
    weight vector (1 + len(FEATURES) float64s). Label: ``label_col``
    (0/1 ints) if given, else ``source == pos_source``."""
    from .exchange import driver_combine
    from .packing import keep_mask

    def partial(t: pa.Table) -> pd.DataFrame:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = keep_mask(ids, np.full(len(ids), sample_pct, dtype=np.float64))
        if not m.any():
            return pd.DataFrame({"_id": pd.Series([], dtype=np.int64)})
        t = t.filter(pa.array(m))
        X = feature_matrix(t[text_col])
        if label_col is not None:
            y = t[label_col].to_numpy(zero_copy_only=False).astype(np.float64)
        else:
            y = pa.compute.equal(t[source_col], pos_source).to_numpy(
                zero_copy_only=False).astype(np.float64)
        out = pd.DataFrame(X, columns=["b"] + list(FEATURES))
        out["_y"] = y
        out["_id"] = ids[m]
        return out

    def combine(df: pd.DataFrame) -> np.ndarray:
        df = df.sort_values("_id", kind="stable")  # bit-stable fit
        # force one memory layout: to_numpy may hand back C- or
        # F-ordered storage depending on the concat's internal blocks,
        # and BLAS picks stride-dependent kernels whose reductions
        # differ at the ulp level — the sort alone is not enough for
        # bit-stable weights
        X = np.ascontiguousarray(
            df[["b"] + list(FEATURES)].to_numpy(dtype=np.float64))
        y = np.ascontiguousarray(df["_y"].to_numpy(dtype=np.float64))
        return fit_logistic_irls(X, y, iters=iters, ridge=ridge)

    return driver_combine(ds, partial, combine)


def score_quality(
    ds: rd.Dataset,
    weights: np.ndarray,
    *,
    text_col: str = "text",
    keep_cols: tuple = ("doc_id",),
    out_col: str = "qc_prob",
) -> rd.Dataset:
    """Corpus-wide scoring pass: broadcast weights, one vectorized
    map_batches emitting keep_cols + sigmoid(X @ w)."""
    w_ref = ray.put(np.asarray(weights, dtype=np.float64))

    def fn(t: pa.Table) -> pa.Table:
        from .ale import _get_broadcast

        w = _get_broadcast(w_ref)
        z = feature_matrix(t[text_col]) @ w
        prob = 1.0 / (1.0 + np.exp(-z))
        cols = {c: t[c] for c in keep_cols}
        cols[out_col] = pa.array(prob, type=pa.float64())
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
