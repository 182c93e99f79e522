"""Timestamp/clock-shift detection via radiation phase analysis.

Re-expresses the reference's ``DetectTimestampShifts``
(diive/preprocessing/qaqc/detect_timestamp_shifts.py:52-350) as
per-series-group kernels for ``grouped_block_map`` — the per-day
detections are embarrassingly parallel over (series key), and each
day's math is a handful of vectorized numpy ops:

* ``fft_phase_shift_frame`` — project each day's measured and
  potential radiation onto the k=1 (24-hour) Fourier basis; the phase
  angle difference converts to a shift in minutes
  (Delta_t = Delta_phi / 2pi * 1440; detect_timestamp_shifts.py:116-186).
  Days below ``min_clearness`` (measured/potential daily energy) or
  with < 90% of their samples are reported NaN.
* ``crosscorr_shift_frame`` — candidate-lag scan maximizing Pearson
  correlation between measured and potential radiation after linear
  upsampling to 1-minute resolution
  (detect_timestamp_shifts.py:187-286; numpy implementation — scipy
  is not in this container).
* ``noon_shift_frame`` — per-day peak-time difference
  (detect_timestamp_shifts.py:287-320).

Plot methods of the reference are out of scope (no display surface).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..util import ts_to_us

US_PER_DAY = 86_400_000_000


def _day_matrix(df: pd.DataFrame, value_col: str, ts_col: str):
    """Split a regular single-series frame into per-day arrays.
    Returns (dates, list of value arrays, dt_minutes)."""
    us = ts_to_us(df[ts_col])
    if len(us) >= 2:
        dt_min = float(np.median(np.diff(us)) / 60e6)
    else:
        raise ValueError("need at least 2 rows to infer sampling frequency")
    day = us // US_PER_DAY
    vals = df[value_col].to_numpy(dtype=np.float64)
    out_dates, out_vals = [], []
    for d in np.unique(day):
        m = day == d
        out_dates.append(pd.Timestamp(int(d) * US_PER_DAY * 1000))
        out_vals.append(vals[m])
    return out_dates, out_vals, dt_min


def _interp_limited(y: np.ndarray, limit: int) -> np.ndarray:
    """Linear interpolation of interior NaN runs of length <= limit
    (pandas interpolate(method='linear', limit=limit) inner semantics,
    then remaining NaN -> 0 is done by the caller)."""
    s = pd.Series(y)
    return s.interpolate(method="linear", limit=limit).to_numpy()


def fft_phase_shift_frame(
    df: pd.DataFrame,
    *,
    meas_col: str,
    pot_col: str,
    ts_col: str = "bucket_ts",
    min_clearness: float = 0.6,
) -> pd.DataFrame:
    """One series -> per-day (date, shift_minutes, amplitude_meas,
    clearness). Positive shift = measured peak earlier than potential."""
    us = ts_to_us(df[ts_col])
    dt_min = float(np.median(np.diff(us)) / 60e6) if len(us) >= 2 else np.nan
    ppd = int(round(1440.0 / dt_min)) if np.isfinite(dt_min) else 0
    day = us // US_PER_DAY
    meas = df[meas_col].to_numpy(dtype=np.float64)
    pot = df[pot_col].to_numpy(dtype=np.float64)
    rows = []
    for d in np.unique(day):
        m = day == d
        date = pd.Timestamp(int(d) * US_PER_DAY * 1000)
        if ppd <= 0 or m.sum() < ppd * 0.9:
            rows.append((date, np.nan, 0.0, np.nan))
            continue
        y_meas = np.nan_to_num(_interp_limited(meas[m], 4), nan=0.0)
        y_pot = np.nan_to_num(pot[m], nan=0.0)
        pot_sum = y_pot.sum()
        clearness = y_meas.sum() / pot_sum if pot_sum > 0 else np.nan
        if not (pot_sum > 0) or clearness < min_clearness:
            rows.append((date, np.nan, 0.0, clearness))
            continue
        n = len(y_meas)
        basis = np.exp(-1j * 2 * np.pi * np.arange(n) / n)
        x_meas = (y_meas * basis).sum()
        x_pot = (y_pot * basis).sum()
        dphi = np.angle(x_meas) - np.angle(x_pot)
        dphi = (dphi + np.pi) % (2 * np.pi) - np.pi
        rows.append((date, dphi / (2 * np.pi) * 1440.0, float(np.abs(x_meas)), clearness))
    return pd.DataFrame(rows, columns=["date", "shift_minutes", "amplitude_meas", "clearness"])


def crosscorr_shift_frame(
    df: pd.DataFrame,
    *,
    meas_col: str,
    pot_col: str,
    ts_col: str = "bucket_ts",
    max_lag_minutes: int = 180,
) -> pd.DataFrame:
    """Whole-series shift estimate at 1-minute precision: upsample both
    signals linearly to 1-min, scan candidate lags, report the lag
    maximizing Pearson correlation. Returns one row
    (shift_minutes, best_corr, n_minutes)."""
    us = ts_to_us(df[ts_col]).astype(np.float64)
    meas = df[meas_col].to_numpy(dtype=np.float64)
    pot = df[pot_col].to_numpy(dtype=np.float64)
    ok = np.isfinite(meas) & np.isfinite(pot)
    if ok.sum() < 10:
        return pd.DataFrame({"shift_minutes": [np.nan], "best_corr": [np.nan], "n_minutes": [0]})
    us, meas, pot = us[ok], meas[ok], pot[ok]
    grid = np.arange(us[0], us[-1], 60e6)
    m1 = np.interp(grid, us, meas)
    p1 = np.interp(grid, us, pot)
    m1 = m1 - m1.mean()
    p1 = p1 - p1.mean()
    best = (np.nan, -np.inf)
    for lag in range(-max_lag_minutes, max_lag_minutes + 1):
        if lag < 0:
            a, b = m1[-lag:], p1[: len(p1) + lag]
        elif lag > 0:
            a, b = m1[: len(m1) - lag], p1[lag:]
        else:
            a, b = m1, p1
        denom = np.sqrt((a * a).sum() * (b * b).sum())
        if denom <= 0:
            continue
        c = (a * b).sum() / denom
        if c > best[1]:
            best = (float(lag), c)
    return pd.DataFrame({
        "shift_minutes": [best[0]], "best_corr": [best[1]], "n_minutes": [len(grid)],
    })


def noon_shift_frame(
    df: pd.DataFrame,
    *,
    meas_col: str,
    pot_col: str,
    ts_col: str = "bucket_ts",
    clearness_threshold: float = 0.7,
) -> pd.DataFrame:
    """Per-day peak-time difference in minutes (measured peak minus
    potential peak); cloudy days (clearness < threshold) NaN."""
    us = ts_to_us(df[ts_col])
    day = us // US_PER_DAY
    meas = df[meas_col].to_numpy(dtype=np.float64)
    pot = df[pot_col].to_numpy(dtype=np.float64)
    rows = []
    for d in np.unique(day):
        m = day == d
        date = pd.Timestamp(int(d) * US_PER_DAY * 1000)
        y_meas = np.nan_to_num(meas[m], nan=0.0)
        y_pot = np.nan_to_num(pot[m], nan=0.0)
        pot_sum = y_pot.sum()
        if pot_sum <= 0 or y_meas.sum() / pot_sum < clearness_threshold:
            rows.append((date, np.nan))
            continue
        t = us[m]
        # positive = measured peak EARLIER than potential (same sign
        # convention as the FFT phase method)
        shift = (t[int(np.argmax(y_pot))] - t[int(np.argmax(y_meas))]) / 60e6
        rows.append((date, float(shift)))
    return pd.DataFrame(rows, columns=["date", "shift_minutes"])


def detect_timestamp_shifts(
    ds,
    *,
    meas_col: str,
    pot_col: str,
    keys=("event_type",),
    ts_col: str = "bucket_ts",
    method: str = "fft",
    **kw,
):
    """Per-key shift detection over a Dataset (grouped block stage;
    one series per group, sorted inside)."""
    keys = list(keys)
    frame_fn = {
        "fft": fft_phase_shift_frame,
        "crosscorr": crosscorr_shift_frame,
        "noon": noon_shift_frame,
    }[method]

    def gfn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(ts_col, kind="stable").reset_index(drop=True)
        out = frame_fn(df, meas_col=meas_col, pot_col=pot_col, ts_col=ts_col, **kw)
        for k in keys:
            out.insert(0, k, df[k].iloc[0])
        return out

    from .exchange import grouped_block_map

    return grouped_block_map(ds, keys, gfn)
