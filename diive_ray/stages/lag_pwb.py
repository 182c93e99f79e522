"""PWB time-lag detection: pre-whitening + moving-block bootstrap, with
the PWBOPT S1/S2/S3 decision rule over the chunk sequence.

Reference: diive/flux/hires/lag_pwb.py (Vitale et al. 2024 procedure;
``PreWhiteningBootstrap`` detection at :83, ``apply_pwbopt`` at :2345,
``fill_tlag_gaps`` at :2403) and detect_and_remove_tlag.py:47-52 (the
two-phase detect-all-chunks -> PWBOPT -> remove pipeline shape).

Engine re-derivation (R/statsmodels absent; everything numpy):

* **Pre-whitening** — AR(p) fit by Levinson-Durbin on the sample
  autocovariance with AIC order selection (reference max order
  ``floor(100*log10(N))``; capped here so the per-chunk cost stays
  O(order^2)); the SCALAR's AR filter is applied to both series (the
  reference's ``cw`` combination — its default and the one RFlux
  reports when T_SONIC is absent).
* **Moving-block bootstrap** — overlapping blocks of length L
  (reference ``l = LAG.MAX*2``), rows resampled JOINTLY so the
  cross-correlation structure survives; each replicate's |CCF| peak is
  searched inside the lag window; the replicate distribution is
  summarised by its mode and 95% HDI. A mode pinned to the window edge
  is a failed detection (NaN), matching the reference's edge rejection.
* **PWBOPT** — S1 (HDI < hdi_thresh: accept), S2 (within dev_thresh of
  the previous optimal: accept), S3 (carry the last optimal forward),
  then fill_tlag_gaps (bfill -> median-of-raw -> explicit fallback).

Distributed shape: ONE hash exchange on the segment key; each key's
chunks arrive whole and ordered, so the sequential PWBOPT carry-forward
(which needs the full temporal sequence — the reason the reference
splits its pipeline in two phases) runs inside the block with no extra
topology. Chunks are the parallelism axis across keys.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import ray.data as rd

from .exchange import grouped_block_map


# ------------------------------------------------------------ pre-whitening

def ar_prewhiten(
    x: np.ndarray, *, max_order: int | None = None
) -> tuple[np.ndarray, float]:
    """Fit AR(p) by Levinson-Durbin + AIC and return (phi, sigma2).

    NaN are linearly interpolated first (reference: na.approx), the
    series demeaned. Returns the coefficient vector of the selected
    order (possibly empty = white already)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if np.isnan(x).any():
        idx = np.arange(n)
        ok = ~np.isnan(x)
        if ok.sum() < 8:
            return np.zeros(0), float(np.nanvar(x)) if ok.any() else 0.0
        x = np.interp(idx, idx[ok], x[ok])
    x = x - x.mean()
    if max_order is None:
        max_order = int(100 * np.log10(max(n, 10)))
    max_order = max(1, min(max_order, n // 4, 60))
    # sample autocovariance r[0..max_order]
    acf = np.correlate(x, x, mode="full")[n - 1 : n + max_order] / n
    if acf[0] <= 0:
        return np.zeros(0), 0.0
    # Levinson-Durbin recursion, tracking AIC per order
    phi = np.zeros(max_order + 1)
    prev = np.zeros(max_order + 1)
    sigma2 = acf[0]
    best_aic = n * np.log(sigma2) + 2 * 0
    best_p, best_phi = 0, np.zeros(0)
    for k in range(1, max_order + 1):
        acc = acf[k] - phi[1:k] @ acf[1:k][::-1]
        rho = acc / sigma2
        prev[: k + 1] = phi[: k + 1]
        phi[k] = rho
        phi[1:k] = prev[1:k] - rho * prev[1:k][::-1]
        sigma2 = sigma2 * (1.0 - rho * rho)
        if sigma2 <= 0:
            break
        aic = n * np.log(sigma2) + 2 * k
        if aic < best_aic - 1e-12:
            best_aic, best_p, best_phi = aic, k, phi[1 : k + 1].copy()
    return best_phi, float(sigma2)


def ar_filter(x: np.ndarray, phi: np.ndarray) -> np.ndarray:
    """Residuals e_t = x_t - sum_i phi_i x_{t-i} (first p rows dropped);
    NaN linearly interpolated, series demeaned — the same treatment the
    filter was fitted on."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if np.isnan(x).any():
        idx = np.arange(n)
        ok = ~np.isnan(x)
        x = np.interp(idx, idx[ok], x[ok]) if ok.any() else np.zeros(n)
    x = x - x.mean()
    p = len(phi)
    if p == 0:
        return x
    e = x[p:].copy()
    for i in range(1, p + 1):
        e -= phi[i - 1] * x[p - i : n - i]
    return e


# ------------------------------------------------------- bootstrap detection

def _ccf_ladder(a: np.ndarray, b: np.ndarray, lag_max: int) -> np.ndarray:
    """|cov| ladder for shifts -lag_max..lag_max over zero-mean series."""
    n = len(a)
    covs = np.full(2 * lag_max + 1, np.nan)
    for k, s in enumerate(range(-lag_max, lag_max + 1)):
        lo, hi = max(0, -s), min(n, n - s)
        m = hi - lo
        if m < 2:
            continue
        covs[k] = (a[lo:hi] @ b[lo + s : hi + s]) / (m - 1)
    return covs


def hdi_discrete(samples: np.ndarray, cred: float = 0.95) -> tuple[float, float]:
    """Highest-density interval of a discrete sample: the narrowest
    window containing ceil(cred*n) sorted values."""
    s = np.sort(samples)
    n = len(s)
    w = int(np.ceil(cred * n))
    if w >= n:
        return float(s[0]), float(s[-1])
    widths = s[w - 1 :] - s[: n - w + 1]
    i = int(np.argmin(widths))
    return float(s[i]), float(s[i + w - 1])


def pwb_bootstrap_lag(
    ref: np.ndarray,
    scalar: np.ndarray,
    *,
    lag_max: int = 20,
    block_len: int | None = None,
    n_boot: int = 199,
    seed: int = 7,
    prewhiten: bool = True,
    lws: int | None = None,
    uws: int | None = None,
) -> dict:
    """One chunk's PWB detection: returns mode lag (records, NaN if
    edge-pinned or degenerate), 95% HDI bounds + range, and the number
    of usable replicates. ``lws``/``uws`` optionally restrict the peak
    SEARCH window (the ladder is still computed symmetrically —
    lag_pwb.py's lws/uws semantics)."""
    block_len = block_len or 2 * lag_max
    if prewhiten:
        phi, _ = ar_prewhiten(scalar)
        a = ar_filter(scalar, phi)
        b = ar_filter(ref, phi)
    else:
        a = np.nan_to_num(np.asarray(scalar, dtype=np.float64))
        a = a - a.mean()
        b = np.nan_to_num(np.asarray(ref, dtype=np.float64))
        b = b - b.mean()
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    if n < max(4 * lag_max, 2 * block_len) or n <= block_len:
        return {"tlag": np.nan, "hdi_lo": np.nan, "hdi_hi": np.nan,
                "hdi_range": np.nan, "n_boot": 0}
    shifts = np.arange(-lag_max, lag_max + 1)
    in_window = np.ones(len(shifts), dtype=bool)
    if lws is not None:
        in_window &= shifts >= lws
    if uws is not None:
        in_window &= shifts <= uws
    rng = np.random.default_rng(seed)
    n_blocks = int(np.ceil(n / block_len))
    lags = np.empty(n_boot)
    for r in range(n_boot):
        starts = rng.integers(0, n - block_len + 1, size=n_blocks)
        idx = (starts[:, None] + np.arange(block_len)[None, :]).ravel()[:n]
        covs = np.abs(_ccf_ladder(b[idx], a[idx], lag_max))
        covs[~in_window] = -np.inf
        lags[r] = shifts[int(np.nanargmax(np.nan_to_num(covs, nan=-np.inf)))]
    vals, counts = np.unique(lags, return_counts=True)
    mode = float(vals[np.argmax(counts)])
    lo, hi = hdi_discrete(lags)
    win_lo = shifts[in_window][0]
    win_hi = shifts[in_window][-1]
    edge_pinned = mode <= win_lo or mode >= win_hi
    return {
        "tlag": np.nan if edge_pinned else mode,
        "hdi_lo": lo,
        "hdi_hi": hi,
        "hdi_range": hi - lo,
        "n_boot": n_boot,
    }


# ------------------------------------------------------------------ PWBOPT

def apply_pwbopt(
    tlag: np.ndarray,
    hdi_range: np.ndarray,
    *,
    hdi_thresh: float = 0.5,
    dev_thresh: float = 0.5,
) -> pd.DataFrame:
    """The reference's S1/S2/S3 carry-forward (lag_pwb.py:2345-2400),
    verbatim semantics: S1 accept (HDI < hdi_thresh), S2 accept
    (|lag - last optimal| <= dev_thresh), S3 carry forward."""
    tlag = np.asarray(tlag, dtype=float)
    hdi_range = np.asarray(hdi_range, dtype=float)
    n = len(tlag)
    flags = ["S3_unreliable"] * n
    optimal = np.full(n, np.nan)
    last = np.nan
    for i in range(n):
        tl, hdi = tlag[i], hdi_range[i]
        if np.isnan(tl) or np.isnan(hdi):
            optimal[i] = last
            continue
        if hdi < hdi_thresh:
            flags[i] = "S1_optimal"
            optimal[i] = tl
            last = tl
        elif not np.isnan(last) and abs(tl - last) <= dev_thresh:
            flags[i] = "S2_optimal"
            optimal[i] = tl
            last = tl
        else:
            optimal[i] = last
    return pd.DataFrame({"pwbopt": optimal, "flag": flags})


def fill_tlag_gaps(
    pwbopt: np.ndarray,
    tlag_raw: np.ndarray | None = None,
    fallback: float | None = None,
) -> np.ndarray:
    """bfill -> median of raw detections -> explicit fallback
    (lag_pwb.py:2403-2448)."""
    result = pd.Series(np.asarray(pwbopt, dtype=float)).bfill()
    if result.isna().any() and tlag_raw is not None:
        raw = np.asarray(tlag_raw, dtype=float)
        med = np.nanmedian(raw) if np.any(~np.isnan(raw)) else np.nan
        if np.isfinite(med):
            result = result.fillna(med)
    if result.isna().any() and fallback is not None:
        result = result.fillna(fallback)
    return result.to_numpy()


def apply_hdi_prefilter(
    tlag: np.ndarray, hdi_range: np.ndarray, threshold: float = 1.0
) -> np.ndarray:
    """Discard wide-HDI detections before PWBOPT (lag_pwb.py:2450+)."""
    out = np.asarray(tlag, dtype=float).copy()
    out[np.asarray(hdi_range, dtype=float) > threshold] = np.nan
    return out


# ------------------------------------------------------ distributed stage

def pwb_lag_detect(
    ds: rd.Dataset,
    *,
    segment_keys: list[str],
    chunk_col: str,
    order_cols: list[str],
    ref_col: str,
    scalar_col: str,
    lag_max: int = 20,
    block_len: int | None = None,
    n_boot: int = 199,
    seed: int = 7,
    prewhiten: bool = True,
    hdi_thresh: float = 0.5,
    dev_thresh: float = 0.5,
    hdi_prefilter: float | None = None,
    fallback: float | None = None,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Distributed PWB + PWBOPT: one exchange on the segment keys; per
    key, every chunk's bootstrap detection runs in temporal order and
    PWBOPT + gap-fill are applied to the whole sequence in-block
    (detect_and_remove_tlag.py's two-phase requirement satisfied by key
    co-location instead of a second pass). Output: one row per
    (key, chunk) with tlag/hdi/flag/tlag_final (all in record units)."""

    def gfn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([chunk_col] + order_cols, kind="stable")
        rows = []
        base = zlib.crc32("|".join(str(g[k].iloc[0]) for k in segment_keys).encode())
        for chunk, cdf in g.groupby(chunk_col, sort=True):
            det = pwb_bootstrap_lag(
                cdf[ref_col].to_numpy(dtype=np.float64),
                cdf[scalar_col].to_numpy(dtype=np.float64),
                lag_max=lag_max, block_len=block_len, n_boot=n_boot,
                seed=seed ^ base ^ zlib.crc32(str(chunk).encode()),
                prewhiten=prewhiten,
            )
            det[chunk_col] = chunk
            det["n_records"] = len(cdf)
            rows.append(det)
        out = pd.DataFrame(rows)
        raw = out["tlag"].to_numpy()
        pre = (
            apply_hdi_prefilter(raw, out["hdi_range"].to_numpy(), hdi_prefilter)
            if hdi_prefilter is not None
            else raw
        )
        opt = apply_pwbopt(
            pre, out["hdi_range"].to_numpy(),
            hdi_thresh=hdi_thresh, dev_thresh=dev_thresh,
        )
        out["flag"] = opt["flag"].to_numpy()
        out["pwbopt"] = opt["pwbopt"].to_numpy()
        out["tlag_final"] = fill_tlag_gaps(out["pwbopt"].to_numpy(), raw, fallback)
        for k in segment_keys:
            out.insert(0, k, g[k].iloc[0])
        cols = segment_keys + [chunk_col, "n_records", "n_boot", "tlag",
                               "hdi_lo", "hdi_hi", "hdi_range", "flag",
                               "pwbopt", "tlag_final"]
        return out[cols]

    return grouped_block_map(ds, segment_keys, gfn, num_partitions=num_partitions)


def apply_tlag(
    ds: rd.Dataset,
    lags: pd.DataFrame,
    *,
    segment_keys: list[str],
    chunk_col: str,
    order_cols: list[str],
    scalar_col: str,
    lag_col: str = "tlag_final",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Remove the PWBOPT lag: shift the scalar column backward by
    ``round(tlag_final)`` records within each (key, chunk)
    (apply_tlag.py / detect_and_remove_tlag.py phase 2:
    ``Series.shift(periods=-n)``). ``lags`` is the small per-chunk
    table from pwb_lag_detect (broadcast via closure)."""
    lut = {
        tuple(list(r[k] for k in segment_keys) + [r[chunk_col]]): r[lag_col]
        for _, r in lags.iterrows()
    }

    def gfn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([chunk_col] + order_cols, kind="stable").copy()
        parts = []
        for chunk, cdf in g.groupby(chunk_col, sort=True):
            key = tuple(list(cdf[k].iloc[0] for k in segment_keys) + [chunk])
            lag = lut.get(key, np.nan)
            cdf = cdf.copy()
            if np.isfinite(lag):
                cdf[scalar_col] = cdf[scalar_col].shift(-int(round(lag)))
            parts.append(cdf)
        return pd.concat(parts, ignore_index=True)

    return grouped_block_map(ds, segment_keys, gfn, num_partitions=num_partitions)
