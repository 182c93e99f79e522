"""Highest-quality flux selection and time-lag distribution analysis.

Reference: ``analyze_highest_quality_flux``
(diive/flux/lowres/hqflux.py:126-330) — day/night regimes from solar
geometry, per-regime Hampel (MAD) outlier removal with optional
double-differencing, rolling median + SD of the filtered series, and
the summary statistics the reference prints (percentiles, largest /
smallest outliers and non-outliers split by sign,
hqflux.py:75-89,300-320).

Reference: ``TimeLagAnalysis`` (diive/flux/lowres/timelag_analysis.py:
73-440) — unique-value lag histogram (analysis/histogram.py:88-124)
with fringe-bin exclusion, display-range filter, gradient-based peak
range detection (timelag_analysis.py:267-346) and the EddyPro discrete
0.05 s step adjustment (timelag_analysis.py:221-264).

Scale notes: the flux summary runs one keyed exchange (one block per
series key, the per-regime Hampel window is sequential state); the lag
analysis is the canonical bounded-cardinality pattern — per-batch
partial counts combine to <= (n_keys x n_lag_steps) rows, the data
never shuffles, and the gradient scan runs on that tiny combined frame.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.solar import daytime_flag
from ..util import ts_to_us
from .outliers import hampel_flag

SENTINEL = -9999.0


def _regime_summary(
    sub: pd.DataFrame,
    value_col: str,
    *,
    window_length: int,
    n_sigma: float,
    use_differencing: bool,
    median_window: int | None,
    repeat: bool,
) -> dict:
    """Summary row for one (key, regime) subseries of non-null values
    in time order (hqflux.py:232-320 loop body)."""
    v = sub[value_col].astype(float).reset_index(drop=True)
    flag = hampel_flag(
        v, window_length=window_length, n_sigma=n_sigma,
        use_differencing=use_differencing, repeat=repeat,
    ).to_numpy()
    filtered = v.where(flag != 2)
    n_filtered = int(filtered.notna().sum())
    # reference: winsize = int(s_filtered.count() / 10) with a floor
    # (hqflux.py:68; the new API floors at 13, hqflux.py:262)
    winsize = median_window if median_window is not None else max(n_filtered // 10, 13)
    from ..functions.cmedian import rolling_median_centered_exact
    rmedian = pd.Series(
        rolling_median_centered_exact(filtered.to_numpy(), winsize, 1),
        index=filtered.index)
    non_out = v[flag != 2]
    pos = non_out[non_out >= 0]
    neg = non_out[non_out < 0]

    def _f(x) -> float:
        return SENTINEL if (x is None or (isinstance(x, float) and np.isnan(x))) else float(x)

    return {
        "n": int(len(v)),
        "n_outliers": int((flag == 2).sum()),
        "winsize": int(winsize),
        "sd_filtered": _f(filtered.std()),
        "p01": _f(filtered.quantile(0.01)),
        "p99": _f(filtered.quantile(0.99)),
        "mean_rmedian": _f(rmedian.mean()),
        "max_nonneg": _f(pos.max() if len(pos) else np.nan),
        "min_nonneg": _f(pos.min() if len(pos) else np.nan),
        "max_neg": _f(neg.max() if len(neg) else np.nan),
        "min_neg": _f(neg.min() if len(neg) else np.nan),
    }


def hq_flux_frame(
    df: pd.DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = (),
    *,
    lat: float = 47.0,
    lon: float = 8.5,
    window_length: int = 49,
    n_sigma_daytime: float = 5.5,
    n_sigma_nighttime: float = 5.5,
    use_differencing: bool = True,
    median_window: int | None = None,
    repeat: bool = False,
) -> pd.DataFrame:
    """Per-regime highest-quality flux summary for ONE series group
    (hqflux.py:analyze_highest_quality_flux). Returns one row per
    daytime regime present: the Hampel-filtered series' SD, 1st/99th
    percentiles, mean rolling median, and the reference's sign-split
    outlier extrema. ``median_window=None`` uses the reference's
    auto rule (10% of filtered count, floor 13)."""
    df = df[df[value_col].notna()]
    df = df.sort_values([ts_col, *order_cols], kind="stable").reset_index(drop=True)
    dn = daytime_flag(ts_to_us(df[ts_col]), lat, lon)
    rows = []
    for d in (0, 1):
        sub = df[dn == d]
        if not len(sub):
            continue
        n_sigma = n_sigma_daytime if d == 1 else n_sigma_nighttime
        row = _regime_summary(
            sub, value_col, window_length=window_length, n_sigma=n_sigma,
            use_differencing=use_differencing, median_window=median_window,
            repeat=repeat,
        )
        row["flag_daytime"] = d
        rows.append(row)
    out = pd.DataFrame(rows)
    cols = ["flag_daytime", "n", "n_outliers", "winsize", "sd_filtered", "p01",
            "p99", "mean_rmedian", "max_nonneg", "min_nonneg", "max_neg", "min_neg"]
    return out[cols] if len(out) else pd.DataFrame(columns=cols)


# ---------------------------------------------------------------------------
# Time lag analysis (timelag_analysis.py)
# ---------------------------------------------------------------------------


def uniques_histogram(values: np.ndarray, counts: np.ndarray,
                      ignore_fringe_bins: tuple[int, int] | None = None) -> pd.DataFrame:
    """Reference 'uniques' histogram from pre-aggregated (value, count)
    pairs (analysis/histogram.py:88-124): bins are the sorted unique
    values; ``np.histogram`` with explicit edges merges the LAST unique
    value's count into the preceding bin (closed last interval), then
    the first ``i`` / last ``j`` fringe bins are dropped."""
    order = np.argsort(values, kind="stable")
    u = np.asarray(values, dtype=float)[order]
    c = np.asarray(counts, dtype=np.int64)[order]
    if len(u) >= 2:
        c = c.copy()
        c[-2] += c[-1]
        u, c = u[:-1], c[:-1]
    elif len(u) == 1:
        # single unique value: np.histogram needs >= 2 edges; the
        # reference would raise — keep the one bin with its count
        pass
    if ignore_fringe_bins is not None:
        i, j = ignore_fringe_bins
        u = u[i:len(u) - j]
        c = c[i:len(c) - j]
    return pd.DataFrame({"BIN_START_INCL": u, "COUNTS": c})


def detect_peak_range(hist: pd.DataFrame, peak: float,
                      gradient_threshold: float = 0.15) -> tuple[float, float]:
    """Gradient-based peak range over a (filtered) histogram frame
    (timelag_analysis.py:267-346): normalize counts, np.gradient
    (central differences, one-sided edges), scan left/right from the
    bin closest to ``peak`` for the first |gradient| < threshold."""
    bins = hist["BIN_START_INCL"].to_numpy(dtype=float)
    counts = hist["COUNTS"].to_numpy(dtype=float)
    max_count = counts.max()
    norm = counts / max_count if max_count > 0 else counts
    grad = np.gradient(norm) if len(norm) >= 2 else np.zeros_like(norm)
    peak_idx = int(np.argmin(np.abs(bins - peak)))
    left_idx = peak_idx
    for i in range(peak_idx - 1, -1, -1):
        if abs(grad[i]) < gradient_threshold:
            left_idx = i
            break
    right_idx = peak_idx
    for i in range(peak_idx + 1, len(grad)):
        if abs(grad[i]) < gradient_threshold:
            right_idx = i
            break
    return float(bins[left_idx]), float(bins[right_idx])


def adjust_range_for_eddypro(min_lag: float, max_lag: float,
                             step: float = 0.05) -> tuple[float, float]:
    """EddyPro discrete-step range expansion
    (timelag_analysis.py:221-264): one step on each side."""
    return min_lag - step, max_lag + step


def timelag_analysis_frame(
    counts_df: pd.DataFrame,
    key_col: str,
    lag_col: str,
    count_col: str,
    *,
    ignore_fringe_bins: tuple[int, int] = (5, 10),
    histogram_startbin: float = 0.0,
    histogram_endbin: float = 10.0,
    gradient_threshold: float = 0.15,
    eddypro_step: float = 0.05,
) -> pd.DataFrame:
    """Full TimeLagAnalysis.analyze_gas over pre-aggregated per-key lag
    counts (timelag_analysis.py:349-440): uniques histogram + fringe
    exclusion, peak = top-count bin (stable tie-break: smallest bin,
    histogram.py:79-83 head(5) on a stable sort), display-range filter,
    gradient peak range, EddyPro adjustment. One output row per key."""
    rows = []
    for key, g in counts_df.groupby(key_col, sort=True):
        hist = uniques_histogram(
            g[lag_col].to_numpy(), g[count_col].to_numpy(),
            ignore_fringe_bins=ignore_fringe_bins,
        )
        if not len(hist):
            continue
        # peakbins[0]: max count over the post-fringe histogram; pandas'
        # stable descending sort keeps bin-ascending order among ties
        top = hist.sort_values("COUNTS", ascending=False, kind="stable").iloc[0]
        peak = float(top["BIN_START_INCL"])
        shown = hist[(hist["BIN_START_INCL"] >= histogram_startbin)
                     & (hist["BIN_START_INCL"] <= histogram_endbin)].reset_index(drop=True)
        if not len(shown):
            continue
        peak_min, peak_max = detect_peak_range(shown, peak, gradient_threshold)
        ep_min, ep_max = adjust_range_for_eddypro(peak_min, peak_max, eddypro_step)
        rows.append({
            key_col: key,
            "peak": peak,
            "peak_min": peak_min,
            "peak_max": peak_max,
            "eddypro_min": ep_min,
            "eddypro_max": ep_max,
            "n_bins_shown": int(len(shown)),
            "n_total": int(shown["COUNTS"].sum()),
        })
    cols = [key_col, "peak", "peak_min", "peak_max", "eddypro_min",
            "eddypro_max", "n_bins_shown", "n_total"]
    return pd.DataFrame(rows, columns=cols)
