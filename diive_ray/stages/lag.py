"""Time-lag detection by maximum covariance (reference
diive/flux/hires/lag.py:24-300 ``MaxCovariance``, the core of the
3.2k-LoC detect_and_remove_tlag tool).

Semantics mirrored from the reference:

* covariance ladder: for each shift s in [from, to], the SAMPLE
  covariance of (reference[i], lagged[i+s]) over the valid overlap
  (null pairs skipped) — the reference computes this as
  ``pl.cov(reference, lagged.shift(-s))`` (lag.py:230-255);
* ``flag_peak_max_cov_abs`` marks the shift(s) with maximum |cov|
  (lag.py:264-267; we flag ALL argmax ties — deterministic, and what a
  SQL oracle computes);
* auto-peak validation (lag.py:164-219): peaks of the |cov| ladder via
  a from-scratch scipy-compatible ``find_peaks`` (local maxima with
  plateau handling, prominences, widths at rel_height 0.5 — published
  algorithms), peak_score = sqrt(prominence * width_height * height),
  keep scores >= 90th percentile, flag the max-cov peak iff it is in
  the top set.

Distributed shape: one hash exchange on the segment key, then the
whole ladder is vectorized per segment (numpy dot products per shift;
shifts are a small constant, segments are many — the parallelism axis).
sklearn/scipy are not in this container; everything below is
from-scratch numpy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .exchange import grouped_block_map


# ------------------------------------------------------------ find_peaks

def find_local_maxima(x: np.ndarray) -> np.ndarray:
    """Indices of local maxima; a flat plateau whose edges drop on both
    sides yields its midpoint floor((l+r)/2) (scipy convention)."""
    peaks = []
    n = len(x)
    i = 1
    while i < n - 1:
        if x[i - 1] < x[i]:
            j = i
            while j < n - 1 and x[j + 1] == x[i]:
                j += 1
            if j < n - 1 and x[j + 1] < x[i]:
                peaks.append((i + j) // 2)
            i = j + 1
        else:
            i += 1
    return np.asarray(peaks, dtype=np.int64)


def peak_prominences(x: np.ndarray, peaks: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Prominence of each peak (standard topographic definition, as
    published for scipy.signal.peak_prominences): extend from the peak
    in each direction until a strictly higher point or the boundary;
    the base is the minimum of that stretch; prominence = height -
    max(left_base_value, right_base_value)."""
    proms = np.empty(len(peaks))
    lbases = np.empty(len(peaks), dtype=np.int64)
    rbases = np.empty(len(peaks), dtype=np.int64)
    for k, p in enumerate(peaks):
        h = x[p]
        i, lmin, lpos = p, h, p
        while i > 0 and x[i - 1] <= h:
            i -= 1
            if x[i] < lmin:
                lmin, lpos = x[i], i
        i, rmin, rpos = p, h, p
        while i < len(x) - 1 and x[i + 1] <= h:
            i += 1
            if x[i] < rmin:
                rmin, rpos = x[i], i
        proms[k] = h - max(lmin, rmin)
        lbases[k], rbases[k] = lpos, rpos
    return proms, lbases, rbases


def peak_widths(
    x: np.ndarray, peaks: np.ndarray, proms: np.ndarray,
    lbases: np.ndarray, rbases: np.ndarray, rel_height: float = 0.5,
) -> tuple[np.ndarray, np.ndarray]:
    """Widths at ``height - prominence * rel_height`` with linear
    interpolation of the crossings, bounded by the prominence bases
    (scipy.signal.peak_widths contract). Returns (widths, width_heights)."""
    widths = np.empty(len(peaks))
    wh = np.empty(len(peaks))
    for k, p in enumerate(peaks):
        h_eval = x[p] - proms[k] * rel_height
        wh[k] = h_eval
        i = p
        while i > lbases[k] and x[i - 1] >= h_eval:
            i -= 1
        if i > lbases[k] and x[i - 1] < h_eval:
            lip = i - (h_eval - x[i - 1]) / (x[i] - x[i - 1])
        else:
            lip = float(i)
        i = p
        while i < rbases[k] and x[i + 1] >= h_eval:
            i += 1
        if i < rbases[k] and x[i + 1] < h_eval:
            rip = i + (h_eval - x[i + 1]) / (x[i] - x[i + 1])
        else:
            rip = float(i)
        widths[k] = rip - lip
    return widths, wh


# -------------------------------------------------------- MaxCovariance

def max_covariance_frame(
    df: pd.DataFrame,
    *,
    ref_col: str,
    lagged_col: str,
    winsize_from: int = -20,
    winsize_to: int = 20,
    shift_stepsize: int = 1,
) -> pd.DataFrame:
    """Covariance ladder for ONE segment (rows already ordered by the
    caller). Returns one row per shift: (shift, n, cov, cov_abs,
    flag_peak_max_cov_abs, flag_peak_auto)."""
    ref = df[ref_col].to_numpy(dtype=np.float64)
    lag = df[lagged_col].to_numpy(dtype=np.float64)
    n = len(ref)
    shifts = np.arange(winsize_from, winsize_to + shift_stepsize, shift_stepsize)
    covs = np.full(len(shifts), np.nan)
    ns = np.zeros(len(shifts), dtype=np.int64)
    for k, s in enumerate(shifts):
        # pair (ref[i], lag[i+s]) over the valid index overlap
        lo, hi = max(0, -s), min(n, n - s)
        if hi - lo < 2:
            continue
        a, b = ref[lo:hi], lag[lo + s: hi + s]
        ok = np.isfinite(a) & np.isfinite(b)
        m = int(ok.sum())
        ns[k] = m
        if m < 2:
            continue
        av, bv = a[ok], b[ok]
        covs[k] = float((av - av.mean()) @ (bv - bv.mean())) / (m - 1)
    cov_abs = np.abs(covs)
    out = pd.DataFrame(
        {
            "shift": shifts.astype(np.int64),
            "n": ns,
            "cov": covs,
            "cov_abs": cov_abs,
            "flag_peak_max_cov_abs": np.zeros(len(shifts), dtype=bool),
            "flag_peak_auto": np.zeros(len(shifts), dtype=bool),
        }
    )
    if np.isfinite(cov_abs).any():
        mx = np.nanmax(cov_abs)
        out["flag_peak_max_cov_abs"] = cov_abs == mx
        # auto-peak validation (lag.py:164-219)
        ladder = np.nan_to_num(cov_abs, nan=-np.inf)
        peaks = find_local_maxima(ladder)
        if len(peaks):
            proms, lb, rb = peak_prominences(ladder, peaks)
            _, wh = peak_widths(ladder, peaks, proms, lb, rb)
            heights = ladder[peaks]
            score = np.sqrt(np.clip(proms * wh * heights, 0, None))
            thr = float(pd.Series(score).quantile(0.9))
            top = peaks[score >= thr]
            argmaxes = np.flatnonzero(cov_abs == mx)
            hit = np.intersect1d(argmaxes, top)
            if len(hit):
                out.loc[hit, "flag_peak_auto"] = True
    return out


def max_covariance(
    ds: rd.Dataset,
    *,
    segment_keys: list[str],
    order_cols: list[str],
    ref_col: str,
    lagged_col: str,
    winsize_from: int = -20,
    winsize_to: int = 20,
    shift_stepsize: int = 1,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Distributed MaxCovariance: one exchange on the segment key(s),
    per-segment ordered ladder scan (segments are the parallelism
    axis; the ladder itself is a small constant per segment)."""

    def gfn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="stable")
        out = max_covariance_frame(
            g, ref_col=ref_col, lagged_col=lagged_col,
            winsize_from=winsize_from, winsize_to=winsize_to,
            shift_stepsize=shift_stepsize,
        )
        for k in segment_keys:
            out.insert(0, k, g[k].iloc[0])
        return out

    return grouped_block_map(ds, segment_keys, gfn, num_partitions=num_partitions)
