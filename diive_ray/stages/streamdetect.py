"""Streaming-monitor detectors over bounded per-key series: ADWIN
(Bifet & Gavalda 2007 'Learning from time-changing data with adaptive
windowing', the variance-based ADWIN2 bound) and the spectral-residual
saliency detector (Ren et al. 2019, KDD 'Time-Series Anomaly Detection
Service at Microsoft').

Both kernels run inside one exchange block per key; the series length
is the TIER length (time range), not the corpus, so the O(n^2) exact
ADWIN sweep and the FFT are bounded. For unbounded horizons
``adwin_bucketed`` (VERDICT r4 #10) carries the paper's actual
exponential-histogram state — O(M log n) buckets of (count, sum,
sum-of-squares), split checks at bucket boundaries only — and matches
the exact variant's cuts on the pinned fixtures
(tests/test_streamdetect.py)."""

from __future__ import annotations

import numpy as np


def adwin_scan(x: np.ndarray, delta: float = 0.002, min_sub: int = 5
               ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact ADWIN sweep over ``x``: maintain the adaptive window
    [start, t]; after each arrival, while some split W = W0 · W1 (both
    halves >= min_sub) has |mean(W0) - mean(W1)| > eps_cut, drop W0.

    eps_cut is the Bernstein-style ADWIN2 bound
        sqrt(2/m * var(W) * ln(2/dp)) + 2/(3m) * ln(2/dp),
    m = harmonic mean of the half sizes, dp = delta / n.

    Returns (window_len, window_mean, shrunk_flag) per index."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    wlen = np.zeros(n, dtype=np.int64)
    wmean = np.zeros(n, dtype=np.float64)
    shrunk = np.zeros(n, dtype=np.int64)
    start = 0
    for t in range(n):
        while True:
            w = x[start:t + 1]
            m_ = len(w)
            if m_ < 2 * min_sub:
                break
            cs = np.cumsum(w)
            n0 = np.arange(min_sub, m_ - min_sub + 1, dtype=np.float64)
            n1 = m_ - n0
            i0 = n0.astype(np.int64) - 1
            mu0 = cs[i0] / n0
            mu1 = (cs[-1] - cs[i0]) / n1
            hm = 1.0 / (1.0 / n0 + 1.0 / n1)
            dp = delta / m_
            var = w.var()
            ln = np.log(2.0 / dp)
            eps = np.sqrt(2.0 / hm * var * ln) + 2.0 / (3.0 * hm) * ln
            viol = np.abs(mu0 - mu1) > eps
            if not viol.any():
                break
            start += int(n0[np.argmax(viol)])
            shrunk[t] = 1
        w = x[start:t + 1]
        wlen[t] = len(w)
        wmean[t] = w.mean()
    return wlen, wmean, shrunk


def adwin_bucketed(x: np.ndarray, delta: float = 0.002,
                   min_sub: int = 5, max_buckets: int = 32
                   ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """ADWIN2 with the paper's exponential-histogram window state
    (Bifet & Gavalda 2007 §3.2): the window is a list of buckets, each
    holding (count, sum, sum of squares); every arrival appends a
    capacity-1 bucket, and whenever more than ``max_buckets`` buckets
    share a capacity the two OLDEST of that capacity merge into one of
    double capacity — so state is O(max_buckets · log n) regardless of
    the window length, the property that makes ADWIN viable on an
    unbounded stream where ``adwin_scan``'s O(n) window replay is not.

    Split checks run at bucket boundaries only (the paper's
    approximation; boundary spacing at age a is a / max_buckets, so a
    larger ``max_buckets`` converges to the exact sweep — the default
    32 reproduces the exact variant's cuts on the pinned fixtures).
    The cut bound is the same Bernstein form as ``adwin_scan``, with
    window variance derived from the bucket moments.

    Returns (window_len, window_mean, shrunk_flag) per index, same
    contract as ``adwin_scan``."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    wlen = np.zeros(n, dtype=np.int64)
    wmean = np.zeros(n, dtype=np.float64)
    shrunk = np.zeros(n, dtype=np.int64)
    # bucket lists, oldest first: parallel arrays of (cnt, s, ss)
    cnts: list[int] = []
    sums: list[float] = []
    sqs: list[float] = []

    def compress() -> None:
        # merge the two oldest buckets of any over-populated capacity
        while True:
            from collections import Counter

            per_cap = Counter(cnts)
            cap = next((c for c in sorted(per_cap)
                        if per_cap[c] > max_buckets), None)
            if cap is None:
                return
            i = cnts.index(cap)           # oldest of this capacity
            j = cnts.index(cap, i + 1)    # second oldest
            cnts[i] += cnts[j]
            sums[i] += sums[j]
            sqs[i] += sqs[j]
            del cnts[j], sums[j], sqs[j]

    for t in range(n):
        cnts.append(1)
        sums.append(float(x[t]))
        sqs.append(float(x[t] * x[t]))
        compress()
        while True:
            W = sum(cnts)
            if W < 2 * min_sub:
                break
            S = sum(sums)
            Q = sum(sqs)
            var = max(Q / W - (S / W) ** 2, 0.0)
            # candidate splits: after each bucket boundary
            c = np.cumsum(np.array(cnts, dtype=np.float64))
            s = np.cumsum(np.array(sums, dtype=np.float64))
            n0 = c[:-1]
            n1 = W - n0
            ok = (n0 >= min_sub) & (n1 >= min_sub)
            if not ok.any():
                break
            mu0 = s[:-1] / n0
            mu1 = (S - s[:-1]) / n1
            hm = 1.0 / (1.0 / n0 + 1.0 / n1)
            ln = np.log(2.0 / (delta / W))
            eps = np.sqrt(2.0 / hm * var * ln) + 2.0 / (3.0 * hm) * ln
            viol = ok & (np.abs(mu0 - mu1) > eps)
            if not viol.any():
                break
            # drop the oldest bucket (the paper drops buckets one at a
            # time from the tail until no split violates)
            del cnts[0], sums[0], sqs[0]
            shrunk[t] = 1
        W = sum(cnts)
        wlen[t] = int(W)
        wmean[t] = sum(sums) / W if W else 0.0
    return wlen, wmean, shrunk


def spectral_residual(x: np.ndarray, q: int = 3, local: int = 21
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Spectral-residual saliency map (Ren et al. 2019 §3.1): log
    amplitude spectrum minus its q-point moving average, exponentiate
    back, inverse FFT with the original phase; anomaly score =
    relative deviation of the saliency from its ``local``-point moving
    average. Returns (saliency, score)."""
    x = np.asarray(x, dtype=np.float64)
    eps = 1e-8
    f = np.fft.fft(x)
    amp = np.abs(f)
    la = np.log(amp + eps)
    ala = np.convolve(la, np.ones(q) / q, mode="same")
    sr = np.exp(la - ala)
    f2 = f / (amp + eps) * sr
    s = np.abs(np.fft.ifft(f2))
    loc = np.convolve(s, np.ones(local) / local, mode="same")
    score = (s - loc) / (loc + eps)
    return s, score


def hysteresis_crossings(
    v: np.ndarray, low: float, high: float
) -> tuple[int, int, int]:
    """Schmitt-trigger threshold-crossing counter — the hysteresis
    alerting rule every monitoring TSDB ships (two thresholds so noise
    around a single level does not re-fire): a row is an extreme
    marker when v >= high (+1) or v <= low (-1); an UP crossing is a
    +1 marker whose most recent preceding marker was -1, a DOWN
    crossing the reverse. The first marker of a series starts state
    without counting. Returns (n_up, n_down, n_extreme).

    Vectorized: filter to nonzero markers, compare against the shifted
    marker sequence — O(n), no Python loop."""
    m = np.where(v >= high, 1, np.where(v <= low, -1, 0))
    mk = m[m != 0]
    if len(mk) < 2:
        return 0, 0, int(len(mk))
    prev = mk[:-1]
    cur = mk[1:]
    n_up = int(((cur == 1) & (prev == -1)).sum())
    n_down = int(((cur == -1) & (prev == 1)).sum())
    return n_up, n_down, int(len(mk))


def theta_forecast_frame(
    y: np.ndarray, *, horizon: int, alpha: float = 0.2
) -> dict:
    """Theta(0,2) method forecast (Assimakopoulos & Nikolopoulos 2000;
    Hyndman & Billah 2003 showed it equals SES-with-drift): fit the
    OLS line a + b*(pos) over train positions 1..n (the theta=0 line);
    the theta=2 line z = 2y - fit keeps curvature; SES with fixed
    ``alpha`` and l1 = z1 smooths z to a flat forecast l_n, computed
    via the CLOSED FORM

        l_n = (1-a)^(n-1) z_1 + a * sum_{i=2..n} (1-a)^(n-i) z_i

    (exactly SQL-replayable — no recursion); the h-step forecast is
    the equal-weight combination of the extrapolated theta-0 line and
    the flat SES of theta-2:

        yhat_{n+h} = 0.5 * (a + b*(n+h)) + 0.5 * l_n

    Returns dict(a, b, l_n, yhat: ndarray[horizon])."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    pos = np.arange(1, n + 1, dtype=np.float64)
    sp, sy = pos.sum(), y.sum()
    spp, spy = (pos * pos).sum(), (pos * y).sum()
    b = (n * spy - sp * sy) / (n * spp - sp * sp)
    a = (sy - b * sp) / n
    z = 2.0 * y - (a + b * pos)
    w = np.empty(n)
    w[0] = (1.0 - alpha) ** (n - 1)
    w[1:] = alpha * (1.0 - alpha) ** (n - pos[1:])
    l_n = float((w * z).sum())
    h = np.arange(1, horizon + 1, dtype=np.float64)
    yhat = 0.5 * (a + b * (n + h)) + 0.5 * l_n
    return {"a": float(a), "b": float(b), "l_n": l_n, "yhat": yhat}


def croston_forecast(
    demand: np.ndarray, *, alpha: float = 0.1
) -> tuple[float, float, float, int]:
    """Croston's method for intermittent demand (Croston 1972): SES
    with the same closed power-weight form as theta_forecast_frame
    over (a) the nonzero demand sizes z_i and (b) the inter-arrival
    intervals x_i (periods between nonzero demands, first interval =
    position of the first demand); the flat forecast per period is
    z_hat / x_hat. Returns (z_hat, x_hat, forecast, n_nonzero);
    all-zero series -> (nan, nan, 0.0, 0)."""
    demand = np.asarray(demand, dtype=np.float64)
    nzpos = np.flatnonzero(demand != 0)
    q = len(nzpos)
    if q == 0:
        return float("nan"), float("nan"), 0.0, 0
    z = demand[nzpos]
    x = np.diff(np.concatenate(([-1], nzpos))).astype(np.float64)

    def ses_flat(v: np.ndarray) -> float:
        n = len(v)
        w = np.empty(n)
        w[0] = (1.0 - alpha) ** (n - 1)
        if n > 1:
            w[1:] = alpha * (1.0 - alpha) ** (n - 1 - np.arange(1, n))
        return float((w * v).sum())

    z_hat, x_hat = ses_flat(z), ses_flat(x)
    return z_hat, x_hat, z_hat / x_hat, q


def bocpd_normal(
    x: np.ndarray,
    *,
    hazard: float = 1.0 / 250.0,
    mu0: float = 0.0,
    kappa0: float = 1.0,
    alpha0: float = 1.0,
    beta0: float = 1.0,
    min_drop: int = 10,
) -> dict:
    """Bayesian online changepoint detection (Adams & MacKay 2007)
    with the Normal-Inverse-Gamma conjugate model (unknown mean AND
    variance -> Student-t predictive), constant hazard. The classic
    exact recursion over the run-length posterior:

        growth:  p(r_t = r+1) ∝ p(r_{t-1} = r) * pred_r(x_t) * (1-h)
        change:  p(r_t = 0)   ∝ sum_r p(r_{t-1} = r) * pred_r(x_t) * h

    O(n^2) exact over the BOUNDED tier series per key (the documented
    scale path for unbounded horizons is run-length truncation at
    negligible posterior mass). Deterministic — no sampling. A
    changepoint is flagged where the MAP run length DROPS by at least
    ``min_drop`` (a reset of the most-probable run — the practical
    detection rule; the raw P(r_t = 0) trace is also returned).
    Returns dict(cp_positions, p_cp, rl_map, map_runlength_final)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    h = hazard
    # sufficient-statistic vectors per candidate run length
    mu = np.array([mu0])
    kappa = np.array([kappa0])
    alpha = np.array([alpha0])
    beta = np.array([beta0])
    r = np.array([1.0])  # run-length posterior (normalized)
    p_cp = np.zeros(n)
    rl_map = np.zeros(n, dtype=np.int64)
    for t in range(n):
        # Student-t predictive per run-length hypothesis
        df = 2.0 * alpha
        scale2 = beta * (kappa + 1.0) / (alpha * kappa)
        z2 = (x[t] - mu) ** 2 / scale2
        # log pdf of standardized t with df, up to exactness via gammaln
        from math import lgamma
        lg = np.vectorize(lgamma)
        logpred = (lg(0.5 * (df + 1.0)) - lg(0.5 * df)
                   - 0.5 * np.log(np.pi * df * scale2)
                   - 0.5 * (df + 1.0) * np.log1p(z2 / df))
        pred = np.exp(logpred)
        growth = r * pred * (1.0 - h)
        cp = float((r * pred).sum() * h)
        r = np.concatenate(([cp], growth))
        r /= r.sum()
        p_cp[t] = r[0]
        rl_map[t] = int(np.argmax(r))
        # posterior updates: run 0 restarts from the prior
        kappa_n = kappa + 1.0
        mu_n = (kappa * mu + x[t]) / kappa_n
        alpha_n = alpha + 0.5
        beta_n = beta + 0.5 * kappa * (x[t] - mu) ** 2 / kappa_n
        mu = np.concatenate(([mu0], mu_n))
        kappa = np.concatenate(([kappa0], kappa_n))
        alpha = np.concatenate(([alpha0], alpha_n))
        beta = np.concatenate(([beta0], beta_n))
    # a changepoint = the MAP run collapses: drop of at least min_drop
    # AND at least half the previous run (transient argmax flickers
    # between comparable hypotheses are not resets)
    prev = rl_map[:-1].astype(np.int64)
    drops = prev - rl_map[1:].astype(np.int64)
    cp_positions = np.flatnonzero((drops >= min_drop) & (drops * 2 >= prev)) + 1
    return {
        "cp_positions": cp_positions,
        "p_cp": p_cp,
        "rl_map": rl_map,
        "map_runlength_final": int(np.argmax(r)),
    }
