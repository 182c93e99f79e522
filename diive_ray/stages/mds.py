"""MDS (marginal distribution sampling) gap-filling cascade.

Re-expresses the reference's ONEFlux-style 6-loop expanding-window
meteorological-similarity gap-fill
(diive/gapfilling/similarity.py:26-42,145-350, mds.py) as a
per-series-group kernel for ``grouped_block_map``: each series (one
key) is processed whole inside one block, positions on a regular
time grid, donors = originally-measured records only (fills never
become donors, matching the reference), first successful pass wins.

Differences from the reference, by design (the reference tells WHAT to
compute, not HOW):

* window semantics are a clean centered positional range
  ``[i - h, i + h - 1]`` with ``h = tw * nperday // 2`` intersected
  with the series bounds — the reference clips out-of-range offsets to
  the series edge, which double-counts edge donors (a faithfulness
  wart of the ONEFlux port we do not reproduce); this makes every pass
  exactly SQL-expressible for the driver oracle.
* the diurnal (MDC) hour match is the reference's plain
  ``|hr_d - hr_t| < hr_tol`` (no midnight wrap), hr_tol 1.1.

Tolerances mirror the reference's ONEFlux constants: SWIN tolerance =
clamp(target SWIN, 20, 50) W m-2, TA 2.5 degC, VPD 5.0 hPa, all
strict ``<`` on the absolute difference with finite-donor-driver
requirements (similarity.py:100-117). Quality flags collapse
(method, window) by the reference's formula (similarity.py:119-128)
and the granular flag is ``method * 1000 + round(window_days)``
(similarity.py:131-143).

Partitioning assumption (documented contract): one series group per
block — the cascade's longest window (427 days) spans essentially the
whole series, so MDS is inherently a per-key-grouped operator. At 100
TB the key must be the (site, variable) series id, of which there are
millions — ample parallelism without intra-series distribution.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np
import pandas as pd

SWIN_TOL_MIN = 20.0
SWIN_TOL_MAX = 50.0
TA_TOL = 2.5
VPD_TOL = 5.0
HR_TOL = 1.1

METHOD_ALL = 1   # SWIN + TA + VPD similar
METHOD_SWIN = 2  # SWIN only
METHOD_MDC = 3   # mean diurnal cycle (same time of day)

_TW_BASE = 14  # base window width, days


class Pass(NamedTuple):
    method: int
    tw_days: float


def oneflux_ladder() -> list[Pass]:
    """The reference's full 6-loop pass ladder
    (similarity.py:305-336): ALL 14,28 | SWIN 14 | MDC 1,3,5 |
    ALL 42..154 | SWIN 28..154 | MDC 7..427."""
    passes: list[Pass] = []
    passes += [Pass(METHOD_ALL, (it + 1) * _TW_BASE) for it in range(2)]
    passes += [Pass(METHOD_SWIN, _TW_BASE)]
    passes += [Pass(METHOD_MDC, 2 * it + 1) for it in range(3)]
    passes += [Pass(METHOD_ALL, (it + 1) * _TW_BASE) for it in range(2, 11)]
    passes += [Pass(METHOD_SWIN, (it + 1) * _TW_BASE) for it in range(1, 11)]
    passes += [Pass(METHOD_MDC, (it + 1) * (_TW_BASE * 0.5)) for it in range(61)]
    return passes


def mds_quality(method: np.ndarray, tw: np.ndarray) -> np.ndarray:
    """Collapse (method, window_days) to the 0/1/2/3 quality flag
    (reference similarity.py:119-128)."""
    m = np.asarray(method)
    t = np.asarray(tw)
    q = (m > 0).astype(np.int64)
    q += (((m == METHOD_ALL) & (t > 14)) | ((m == METHOD_SWIN) & (t > 14))
          | ((m == METHOD_MDC) & (t > 1))).astype(np.int64)
    q += (((m == METHOD_ALL) & (t > 56)) | ((m == METHOD_SWIN) & (t > 28))
          | ((m == METHOD_MDC) & (t > 5))).astype(np.int64)
    return q


def mds_granular_flag(method: np.ndarray, tw: np.ndarray) -> np.ndarray:
    """method * 1000 + round(window_days); 0 for measured
    (reference similarity.py:131-143)."""
    m = np.asarray(method)
    t = np.asarray(tw)
    return np.where(m > 0, m * 1000 + np.rint(t).astype(np.int64), 0)


def mds_cascade(
    values: np.ndarray,
    *,
    swin: np.ndarray,
    ta: np.ndarray,
    vpd: np.ndarray,
    hr: np.ndarray,
    nperday: int,
    passes: Sequence[Pass] | None = None,
    min_donors: int = 2,
    ddof: int = 1,
    predict_all: bool = False,
) -> dict[str, np.ndarray]:
    """Run the MDS cascade over one regular series. Returns per-record
    arrays: filled (measured value where present, else donor mean or
    NaN), sd, n_donors, method, window_days, quality, flag.

    ``predict_all``: look up donors at EVERY position, not just gaps —
    the ONEFlux uncertainty variant (daytime_oneflux.py:344-369,
    uncert_via_gapFill with fill_all), where the donor standard
    deviation at each record becomes the per-record NEE uncertainty.
    Measured values keep their own value in ``filled``; a measured
    record is its own donor (zero distance always passes the
    tolerances), matching the reference.

    Donor rule per pass at gap position i with window half-width
    h = tw * nperday // 2 (min 1): candidate positions
    p in [i-h, i+h-1] (series-clipped range, no duplicate counting),
    value measured, and
      METHOD_ALL : |swin_p - swin_i| < clamp(swin_i,20,50) AND
                   |ta_p - ta_i| < 2.5 AND |vpd_p - vpd_i| < 5.0
                   (all donor drivers finite; NaN target driver -> no match)
      METHOD_SWIN: the SWIN clause only
      METHOD_MDC : |hr_p - hr_i| < 1.1
    Fill = mean of donors if count >= min_donors; first pass wins.
    """
    v = np.asarray(values, dtype=np.float64)
    n = len(v)
    measured = np.isfinite(v)
    filled = v.copy()
    sd = np.full(n, np.nan)
    n_donors = np.zeros(n, dtype=np.int64)
    method = np.zeros(n, dtype=np.int64)
    window = np.zeros(n, dtype=np.float64)

    swin = np.asarray(swin, dtype=np.float64)
    ta = np.asarray(ta, dtype=np.float64)
    vpd = np.asarray(vpd, dtype=np.float64)
    hr = np.asarray(hr, dtype=np.float64)

    open_gaps = np.arange(n) if predict_all else np.flatnonzero(~measured)
    for m, tw in (passes if passes is not None else oneflux_ladder()):
        if not len(open_gaps):
            break
        h = max(1, int(tw * nperday) // 2)
        still_open = []
        for i in open_gaps:
            lo, hi = max(0, i - h), min(n, i + h)  # [lo, hi): i-h .. i+h-1
            win = slice(lo, hi)
            ok = measured[win].copy()
            if m == METHOD_MDC:
                ok &= np.abs(hr[win] - hr[i]) < HR_TOL
            else:
                tol = min(max(swin[i], SWIN_TOL_MIN), SWIN_TOL_MAX)
                ok &= np.isfinite(swin[win]) & (np.abs(swin[win] - swin[i]) < tol)
                if m == METHOD_ALL:
                    ok &= np.isfinite(ta[win]) & (np.abs(ta[win] - ta[i]) < TA_TOL)
                    ok &= np.isfinite(vpd[win]) & (np.abs(vpd[win] - vpd[i]) < VPD_TOL)
            cnt = int(ok.sum())
            if cnt >= min_donors:
                donors = v[win][ok]
                if not measured[i]:
                    filled[i] = donors.mean()
                sd[i] = donors.std(ddof=ddof) if cnt > ddof else np.nan
                n_donors[i] = cnt
                method[i] = m
                window[i] = tw
            else:
                still_open.append(i)
        open_gaps = np.asarray(still_open, dtype=np.int64)

    return dict(
        filled=filled,
        sd=sd,
        n_donors=n_donors,
        method=method,
        window_days=window,
        quality=mds_quality(method, window),
        flag=mds_granular_flag(method, window),
    )


def mds_fill_frame(
    df: pd.DataFrame,
    value_col: str,
    *,
    swin_col: str = "swin",
    ta_col: str = "ta",
    vpd_col: str = "vpd",
    hr_col: str = "hr",
    nperday: int = 24,
    passes: Sequence[Pass] | None = None,
    min_donors: int = 2,
) -> pd.DataFrame:
    """Frame adapter for grouped_block_map: df must be one series on a
    regular time grid, sorted by time. Appends value_col + '_mds',
    '_mds_flag', '_mds_quality', '_mds_ndonors' columns."""
    out = mds_cascade(
        df[value_col].to_numpy(dtype=np.float64),
        swin=df[swin_col].to_numpy(dtype=np.float64),
        ta=df[ta_col].to_numpy(dtype=np.float64),
        vpd=df[vpd_col].to_numpy(dtype=np.float64),
        hr=df[hr_col].to_numpy(dtype=np.float64),
        nperday=nperday,
        passes=passes,
        min_donors=min_donors,
    )
    df = df.copy()
    df[f"{value_col}_mds"] = out["filled"]
    df[f"{value_col}_mds_flag"] = out["flag"]
    df[f"{value_col}_mds_quality"] = out["quality"]
    df[f"{value_col}_mds_ndonors"] = out["n_donors"]
    return df
