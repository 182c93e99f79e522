"""Time-series self-similarity / distance kernels: matrix profile
(Yeh et al. 2016 'Matrix Profile I', z-normalized Euclidean, STOMP-
grade vectorization) and dynamic time warping (Sakoe & Chiba 1978)
with an optional band.

Both operate on bounded per-key series (the hourly tier — length is
the TIME RANGE, not the corpus), so the O(n^2) profile and O(n*m) DP
run inside one exchange block per key. At very long horizons the
scale path is tiling (``matrix_profile_tiled``, VERDICT r4 #9): the
all-pairs (i, j) plane shards into tile rectangles computed
independently — O(tile^2) memory each instead of the O(n^2) QT
matrix, optionally as parallel Ray tasks over a ray.put series —
combined by a per-i strict-improvement min that preserves the
smallest-j tie rule (tiles are folded in ascending-j order)."""

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


def _mp_stats(x: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    w = np.lib.stride_tricks.sliding_window_view(x, m)
    return w.mean(axis=1), w.std(axis=1)


def _mp_tile(x: np.ndarray, m: int, mu: np.ndarray, sig: np.ndarray,
             i0: int, i1: int, j0: int, j1: int, excl: int):
    """One (i, j) tile of the self-join distance plane: z-normalized
    d^2 for windows [i0, i1) x [j0, j1), reduced to per-row and
    per-column (value, argmin) partials — O((i1-i0) x (j1-j0)) memory,
    never materialized beyond the tile."""
    w = np.lib.stride_tricks.sliding_window_view(x, m)
    qt = w[i0:i1] @ w[j0:j1].T
    num = qt - m * np.outer(mu[i0:i1], mu[j0:j1])
    den = m * np.outer(sig[i0:i1], sig[j0:j1])
    with np.errstate(divide="ignore", invalid="ignore"):
        corr = np.where(den > 0, num / den, 0.0)
    corr = np.clip(corr, -1.0, 1.0)
    d2 = 2.0 * m * (1.0 - corr)
    ii = np.arange(i0, i1)
    jj = np.arange(j0, j1)
    d2 = np.where(np.abs(ii[:, None] - jj[None, :]) <= excl,
                  np.inf, d2)
    ra = np.argmin(d2, axis=1)                   # first = smallest j
    rv = d2[np.arange(i1 - i0), ra]
    ca = np.argmin(d2, axis=0)                   # first = smallest i
    cv = d2[ca, np.arange(j1 - j0)]
    return rv, jj[ra], cv, ii[ca]


def matrix_profile_tiled(
    x: np.ndarray,
    m: int,
    excl: int | None = None,
    *,
    tile: int = 4096,
    parallel: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """``matrix_profile`` semantics with the (i, j) plane sharded into
    ``tile x tile`` rectangles (upper triangle only; each tile also
    updates its transpose side), so peak memory is O(tile^2) instead
    of the O(n^2) QT matrix — the long-horizon path promised by the
    module docstring (VERDICT r4 #9).

    Tie rule parity: tiles are folded in ascending-j order with a
    STRICT improvement test, and np.argmin inside a tile returns the
    first minimum, so the argmin index matches ``matrix_profile``'s
    global smallest-j-on-ties exactly (up to BLAS summation noise on
    exact distance ties between tiles).

    ``parallel=True`` dispatches tiles as Ray tasks over a ``ray.put``
    copy of the series (shipped ONCE; each task returns only O(tile)
    partials) and folds results in deterministic tile order — the
    distribution shape for a series too long for one core, while the
    per-key exchange remains the parallelism unit for many keys."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x) - m + 1
    if n < 2:
        return (np.full(max(n, 0), np.nan),
                np.full(max(n, 0), -1, dtype=np.int64))
    if excl is None:
        excl = m // 2
    mu, sig = _mp_stats(x, m)
    spans = [(i0, min(i0 + tile, n)) for i0 in range(0, n, tile)]
    pairs = [(a, b) for ai, a in enumerate(spans)
             for b in spans[ai:]]

    if parallel:
        import ray

        xr = ray.put(x)
        mur = ray.put(mu)
        sigr = ray.put(sig)

        @ray.remote
        def tile_task(xref, muref, sigref, i0, i1, j0, j1):
            return _mp_tile(xref, m, muref, sigref, i0, i1, j0, j1,
                            excl)

        futs = [tile_task.remote(xr, mur, sigr, a[0], a[1], b[0], b[1])
                for a, b in pairs]
        results = ray.get(futs)
    else:
        results = [_mp_tile(x, m, mu, sig, a[0], a[1], b[0], b[1], excl)
                   for a, b in pairs]

    mp2 = np.full(n, np.inf)
    nn = np.full(n, -1, dtype=np.int64)
    # ascending-j fold: pairs iterate (i-tile asc, j-tile asc), and for
    # any row its updates arrive with strictly increasing j blocks —
    # strict '<' therefore keeps the smallest-j argmin on ties
    for ((i0, i1), (j0, j1)), (rv, rj, cv, ci) in zip(pairs, results):
        rows = np.arange(i0, i1)
        upd = rv < mp2[rows]
        mp2[rows[upd]] = rv[upd]
        nn[rows[upd]] = rj[upd]
        if j0 > i0:
            cols = np.arange(j0, j1)
            updc = cv < mp2[cols]
            mp2[cols[updc]] = cv[updc]
            nn[cols[updc]] = ci[updc]
    return np.sqrt(np.maximum(mp2, 0.0)), nn


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
