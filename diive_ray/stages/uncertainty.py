"""Random flux-measurement uncertainty, PAS20 hierarchy (Pastorello et
al. 2020 / ONEFlux ``nee_proc`` random uncertainty, methods 1+2), plus
the ONEFlux joint-uncertainty quadrature.

Reference parity anchor:
/root/reference/diive/flux/lowres/uncertainty.py (RandomUncertaintyPAS20
methods 1-2 and joint_uncertainty_pas20; tolerances shared with the MDS
gap-filler, /root/reference/diive/gapfilling/similarity.py:32).

Semantics:

* **Method 1** (measured records): the random uncertainty is the
  sample SD (ddof=1) of measured fluxes inside a +/-7-day window,
  restricted to +/-1 h time-of-day (wrap-aware) and MDS meteorological
  similarity — |dTA| < 2.5 degC, |dVPD| < 5 hPa, |dSWIN| < clamp(own
  SWIN, 20, 50) W/m2 — requiring at least 6 matches (ONEFlux "more
  than 5"); the record itself participates in its own window.
* **Method 2** (everything method 1 left undefined): the median of the
  method-1 uncertainties of records whose gap-filled flux lies within
  +/-max(0.2*|flux|, 2.0) in a +/-14-day window (no time-of-day
  restriction; the C reference's window, not the paper's +/-5 days).
* **Joint uncertainty**: sqrt(randunc^2 + ((scenario_hi -
  scenario_lo)/2)^2), the ONEFlux ``compute_join`` quadrature with the
  16th/84th-percentile divisor.

Distribution contract — two keyed exchanges, each with its own halo
chunking sized to its window (finer chunks = more parallel tasks; the
method-2 exchange carries only the slim (id, ts, gf, sd, home)
projection, never the meteo columns):

* **method-1 stage**: records replicate into ``m1_chunk_days`` chunks
  (default 7 d) with a 7-day halo; per chunk, SDs are evaluated in
  blocks of 256 centers — boolean condition matrices against the
  contiguous time window, counts/sums via matmul (no per-record
  Python in the measured path);
* **method-2 stage**: the per-record method-1 results replicate into
  ``m2_chunk_days`` chunks (default 14 d) with a 14-day halo; the
  (minority) leftover centers get the median fill — a bounded loop
  with vectorized window selection per center (medians do not
  matmul).

Only home-chunk rows are emitted by each stage, so the output is
exactly one row per input record.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

US_PER_DAY = 86_400_000_000

TA_TOL = 2.5
VPD_TOL = 5.0
SWIN_TOL_MIN = 20.0
SWIN_TOL_MAX = 50.0
M1_WIN_DAYS = 7
M1_WIN_HOURS = 1.0
M1_MIN_N = 6
M2_WIN_DAYS = 14
M1_CHUNK_DAYS = 7
M2_CHUNK_DAYS = 14


def _tod_band(hr_center: np.ndarray, win_hours: float) -> tuple[np.ndarray, np.ndarray]:
    """Wrap-aware [start, end] hour band; no float %, so the expression
    is reproducible verbatim in SQL (DuckDB's % is fmod-signed)."""
    sh = hr_center - win_hours
    sh = np.where(sh < 0.0, sh + 24.0, sh)
    eh = hr_center + win_hours
    eh = np.where(eh >= 24.0, eh - 24.0, eh)
    return sh, eh


def m1_block(
    centers: np.ndarray,
    ts_us: np.ndarray,
    hr: np.ndarray,
    flux: np.ndarray,
    ta: np.ndarray,
    vpd: np.ndarray,
    swin: np.ndarray,
    *,
    block: int = 256,
) -> tuple[np.ndarray, np.ndarray]:
    """Method-1 SD + match count for each center position (all arrays
    sorted by ts_us). Vectorized and band-compressed: centers are
    processed in blocks SORTED BY TIME-OF-DAY, so each block's union
    +/-1h band keeps only ~2-3/24 of the candidate columns — the
    boolean condition matrices and matmuls run over the compressed
    column set (typically ~10x fewer elements than the raw +/-7-day
    span). SD via matmul sums of mean-centered fluxes (centering
    removes the cancellation in the sum-of-squares form)."""
    out_sd = np.full(len(centers), np.nan)
    out_n = np.zeros(len(centers), dtype=np.int64)
    meas = np.isfinite(flux)
    win = M1_WIN_DAYS * US_PER_DAY
    hr_order = np.argsort(hr[centers], kind="stable")
    for b0 in range(0, len(centers), block):
        sel = hr_order[b0:b0 + block]
        ci = centers[sel]
        lo = np.searchsorted(ts_us, ts_us[ci] - win, side="left")
        hi = np.searchsorted(ts_us, ts_us[ci] + win, side="right")
        glo, ghi = int(lo.min()), int(hi.max())
        span = slice(glo, ghi)
        # union time-of-day band of the (hr-sorted) block: [hr_min-1,
        # hr_max+1] wrap-aware; candidate columns outside it can never
        # match any center in the block
        hr_blk = hr[ci]
        u_sh = hr_blk.min() - M1_WIN_HOURS
        u_eh = hr_blk.max() + M1_WIN_HOURS
        hw_full = hr[span]
        if u_eh - u_sh >= 24.0:
            # sparse block: the union band covers the whole clock face
            umask = np.ones(len(hw_full), dtype=bool)
        elif u_sh < 0.0 or u_eh >= 24.0:
            u_sh2 = u_sh + 24.0 if u_sh < 0.0 else u_sh
            u_eh2 = u_eh - 24.0 if u_eh >= 24.0 else u_eh
            if u_sh2 <= u_eh2:
                umask = (hw_full >= u_sh2) & (hw_full <= u_eh2)
            else:
                umask = (hw_full >= u_sh2) | (hw_full <= u_eh2)
        else:
            umask = (hw_full >= u_sh) & (hw_full <= u_eh)
        umask &= meas[span]
        cols = np.flatnonzero(umask) + glo
        if len(cols) == 0:
            out_n[sel] = 0
            continue
        # per-center conditions over the compressed columns
        m = (cols[None, :] >= lo[:, None]) & (cols[None, :] < hi[:, None])
        sh, eh = _tod_band(hr_blk, M1_WIN_HOURS)
        hw = hr[cols][None, :]
        m &= np.where((sh <= eh)[:, None],
                      (hw >= sh[:, None]) & (hw <= eh[:, None]),
                      (hw >= sh[:, None]) | (hw <= eh[:, None]))
        m &= np.abs(ta[cols][None, :] - ta[ci][:, None]) < TA_TOL
        m &= np.abs(vpd[cols][None, :] - vpd[ci][:, None]) < VPD_TOL
        tol = np.clip(swin[ci], SWIN_TOL_MIN, SWIN_TOL_MAX)
        m &= np.abs(swin[cols][None, :] - swin[ci][:, None]) < tol[:, None]
        fcols = flux[cols]
        center = float(fcols.mean()) if len(fcols) else 0.0
        f0 = fcols - center
        mf = m.astype(np.float64)
        n = m.sum(axis=1)
        s = mf @ f0
        ss = mf @ (f0 * f0)
        with np.errstate(invalid="ignore", divide="ignore"):
            var = (ss - s * s / np.maximum(n, 1)) / np.maximum(n - 1, 1)
            sd = np.sqrt(np.maximum(var, 0.0))
        out_sd[sel] = np.where(n >= M1_MIN_N, sd, np.nan)
        out_n[sel] = n
    return out_sd, out_n


def m2_fill(
    todo: np.ndarray,
    ts_us: np.ndarray,
    gf: np.ndarray,
    m1_sd: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Method-2 median fill for the leftover center positions ``todo``:
    median of finite method-1 SDs of gap-filled-flux-similar records in
    +/-14 days. Bounded per-center loop (medians over ragged
    selections); windows located by searchsorted on the shared sorted
    timestamp array."""
    out_sd = np.full(len(todo), np.nan)
    out_n = np.zeros(len(todo), dtype=np.int64)
    win = M2_WIN_DAYS * US_PER_DAY
    ok = np.isfinite(m1_sd)
    for j, i in enumerate(todo):
        lo = int(np.searchsorted(ts_us, ts_us[i] - win, side="left"))
        hi = int(np.searchsorted(ts_us, ts_us[i] + win, side="right"))
        add = abs(gf[i]) * 0.2
        if add < 2.0:
            add = 2.0
        gw = gf[lo:hi]
        sel = ok[lo:hi] & (gw >= gf[i] - add) & (gw <= gf[i] + add)
        vals = m1_sd[lo:hi][sel]
        out_n[j] = int(vals.size)
        if vals.size:
            out_sd[j] = float(np.median(vals))
    return out_sd, out_n


def random_uncertainty_pas20(
    ds,
    *,
    ts_col: str = "ts",
    flux_col: str = "flux",
    gf_col: str = "gf",
    ta_col: str = "ta",
    vpd_col: str = "vpd",
    swin_col: str = "swin",
    id_col: str = "event_id",
    num_partitions: int | None = None,
):
    """Distributed PAS20 random uncertainty: two halo-chunked keyed
    exchanges (module docstring). Returns a Dataset with one row per
    input record: (id, randunc, n1, n2, method) where method is 1, 2
    or 0 (undefined) and randunc is NaN for method 0."""
    from .exchange import grouped_block_map

    def _replicate(df: pd.DataFrame, cols: list[str], chunk_days: int,
                   halo_days: int) -> pd.DataFrame:
        ts = pd.to_datetime(df[ts_col]).astype("datetime64[us]")
        us = ts.astype("int64").to_numpy()
        d = us // US_PER_DAY
        span = chunk_days
        home = d // span
        c_lo = (d - halo_days) // span
        c_hi = (d + halo_days) // span
        counts = (c_hi - c_lo + 1).astype(np.int64)
        rep = df.loc[df.index.repeat(counts), cols].reset_index(drop=True)
        chunk = np.concatenate([np.arange(a, b + 1) for a, b in zip(c_lo, c_hi)]) \
            if len(df) else np.empty(0, dtype=np.int64)
        rep["_chunk"] = chunk
        rep["_home"] = np.repeat(home, counts) == chunk
        rep["_ts_us"] = np.repeat(us, counts)
        return rep

    # ---- stage 1: method-1 SDs (7-day chunks, 7-day halo)
    m1_cols = [id_col, ts_col, flux_col, gf_col, ta_col, vpd_col, swin_col]
    rep1 = ds.map_batches(
        lambda df: _replicate(df, m1_cols, M1_CHUNK_DAYS, M1_WIN_DAYS),
        batch_format="pandas", zero_copy_batch=False,
    )

    def kernel1(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("_ts_us", kind="stable").reset_index(drop=True)
        ts_us = df["_ts_us"].to_numpy()
        ts = pd.to_datetime(df[ts_col])
        hr = (ts.dt.hour + ts.dt.minute / 60.0 + ts.dt.second / 3600.0).to_numpy()
        flux = df[flux_col].to_numpy(dtype=np.float64)
        home = df["_home"].to_numpy(dtype=bool)
        m1_sd = np.full(len(df), np.nan)
        n1 = np.zeros(len(df), dtype=np.int64)
        centers = np.flatnonzero(home & np.isfinite(flux))
        if len(centers):
            sd, n = m1_block(
                centers, ts_us, hr, flux,
                df[ta_col].to_numpy(dtype=np.float64),
                df[vpd_col].to_numpy(dtype=np.float64),
                df[swin_col].to_numpy(dtype=np.float64),
            )
            m1_sd[centers] = sd
            n1[centers] = n
        hm = home
        return pd.DataFrame({
            id_col: df.loc[hm, id_col].to_numpy(),
            ts_col: df.loc[hm, ts_col].to_numpy(),
            gf_col: df.loc[hm, gf_col].to_numpy(),
            "sd1": m1_sd[hm],
            "n1": n1[hm],
        })

    stage1 = grouped_block_map(rep1, ["_chunk"], kernel1, num_partitions=num_partitions)

    # ---- stage 2: method-2 median fill (14-day chunks, 14-day halo)
    # carries only (id, ts, gf, sd1, n1) — the meteo columns never move twice
    s2_cols = [id_col, ts_col, gf_col, "sd1", "n1"]
    rep2 = stage1.map_batches(
        lambda df: _replicate(df, s2_cols, M2_CHUNK_DAYS, M2_WIN_DAYS),
        batch_format="pandas", zero_copy_batch=False,
    )

    def kernel2(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("_ts_us", kind="stable").reset_index(drop=True)
        ts_us = df["_ts_us"].to_numpy()
        gf = df[gf_col].to_numpy(dtype=np.float64)
        sd1 = df["sd1"].to_numpy(dtype=np.float64)
        home = df["_home"].to_numpy(dtype=bool)
        sd2 = np.full(len(df), np.nan)
        n2 = np.zeros(len(df), dtype=np.int64)
        todo = np.flatnonzero(home & ~np.isfinite(sd1))
        if len(todo):
            s, n = m2_fill(todo, ts_us, gf, sd1)
            sd2[todo] = s
            n2[todo] = n
        hm = home
        randunc = np.where(np.isfinite(sd1[hm]), sd1[hm], sd2[hm])
        method = np.where(np.isfinite(sd1[hm]), 1,
                          np.where(np.isfinite(sd2[hm]), 2, 0))
        return pd.DataFrame({
            id_col: df.loc[hm, id_col].to_numpy(),
            "randunc": randunc,
            "n1": df.loc[hm, "n1"].to_numpy(dtype=np.int64),
            "n2": n2[hm],
            "method": method.astype(np.int64),
        })

    return grouped_block_map(rep2, ["_chunk"], kernel2, num_partitions=num_partitions)


def joint_uncertainty(randunc: np.ndarray, lo: np.ndarray, hi: np.ndarray,
                      divisor: float = 2.0) -> np.ndarray:
    """ONEFlux compute_join quadrature: sqrt(randunc^2 +
    ((hi-lo)/divisor)^2); NaN propagates."""
    sigma = (hi - lo) / divisor
    return np.sqrt(randunc * randunc + sigma * sigma)
