"""Time-series self-similarity / distance kernels: matrix profile
(Yeh et al. 2016 'Matrix Profile I', z-normalized Euclidean, STOMP-
grade vectorization) and dynamic time warping (Sakoe & Chiba 1978)
with an optional band.

Both operate on bounded per-key series (the hourly tier — length is
the TIME RANGE, not the corpus), so the O(n^2) profile and O(n*m) DP
run inside one exchange block per key. At very long horizons the
documented scale path is tiling: the all-pairs (i, j) plane shards
into diagonal bands computed as independent tasks (the STOMP paper's
GPU layout), combined by a per-i min — the same partial-top-k
combine the engine uses elsewhere."""

from __future__ import annotations

import numpy as np


def matrix_profile(x: np.ndarray, m: int, excl: int | None = None
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Self-join matrix profile of 1-D series ``x`` with window ``m``:
    for each window i the minimal z-normalized Euclidean distance to
    any window j with |i - j| > excl (default m // 2, the trivial-match
    exclusion zone), plus the argmin index (smallest j on ties).

    dist^2 = 2m * (1 - (QT_ij - m*mu_i*mu_j) / (m*sig_i*sig_j)),
    computed from the full QT matrix W @ W.T (vectorized; fine for the
    tier-length series this engine feeds it)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x) - m + 1
    if n < 2:
        return np.full(max(n, 0), np.nan), np.full(max(n, 0), -1, dtype=np.int64)
    if excl is None:
        excl = m // 2
    # windows matrix via stride tricks (read-only view)
    w = np.lib.stride_tricks.sliding_window_view(x, m)
    mu = w.mean(axis=1)
    sig = w.std(axis=1)            # population SD, as in the MP papers
    qt = w @ w.T
    num = qt - m * np.outer(mu, mu)
    den = m * np.outer(sig, sig)
    with np.errstate(divide="ignore", invalid="ignore"):
        corr = np.where(den > 0, num / den, 0.0)
    corr = np.clip(corr, -1.0, 1.0)
    d2 = 2.0 * m * (1.0 - corr)
    # exclusion zone: forbid |i - j| <= excl
    idx = np.arange(n)
    band = np.abs(idx[:, None] - idx[None, :]) <= excl
    d2 = np.where(band, np.inf, d2)
    j = np.argmin(d2, axis=1)      # first (smallest) argmin on ties
    mp = np.sqrt(np.maximum(d2[idx, j], 0.0))
    return mp, j.astype(np.int64)


def dtw_distance(a: np.ndarray, b: np.ndarray, band: int | None = None) -> float:
    """Classic DTW (Sakoe & Chiba 1978) with squared-difference local
    cost and an optional |i-j| <= band constraint; returns the square
    root of the accumulated cost (the common 'DTW distance')."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    n, m = len(a), len(b)
    big = np.inf
    acc = np.full((n + 1, m + 1), big)
    acc[0, 0] = 0.0
    for i in range(1, n + 1):
        jlo, jhi = 1, m
        if band is not None:
            jlo = max(1, i - band)
            jhi = min(m, i + band)
        # vectorized row update: cost + min of the three predecessors
        js = np.arange(jlo, jhi + 1)
        cost = (a[i - 1] - b[js - 1]) ** 2
        prev = np.minimum(acc[i - 1, js - 1], acc[i - 1, js])
        # the left neighbor acc[i, j-1] forms a prefix recursion ->
        # resolve with a scan over the (short) row
        row = np.full(len(js), big)
        left = big
        for t in range(len(js)):
            best = min(prev[t], left)
            row[t] = cost[t] + best
            left = row[t]
        acc[i, jlo:jhi + 1] = row
    return float(np.sqrt(acc[n, m]))
