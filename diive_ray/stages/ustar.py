"""USTAR moving-point-test threshold detection (Papale et al. 2006,
the ONEFlux "moving point" friction-velocity threshold; public
algorithm, Biogeosciences 3:571-583).

Reference parity anchor:
/root/reference/diive/flux/lowres/ustar_mp_detection.py (the
reference's ONEFlux port; the constants below mirror ONEFlux types.h
via that file's documented defaults: forward-mode-2, calendar-quarter
seasons, 7 TA x 20 USTAR classes). The kernel here is re-derived from
the published algorithm with a value-based tie-extension formulation
(class end = last position of the nominal boundary's tie run) rather
than the C port's sequential boundary loop — equivalent on all
non-degenerate inputs and pinned against a directly-coded sequential
oracle in tests.

Semantics: nighttime records (SW_IN < 10 W/m2) are stratified by
season -> 7 temperature classes (tie-aware equal-count bins) -> 20
USTAR classes; per TA class the threshold is the mean USTAR of the
first class whose NEE, and its successor's NEE, are each >= the mean
NEE of the following 10 classes (respiration plateau); season
threshold = median over valid TA classes, annual = max over seasons
(conservative). TA classes failing the |corr(TA, USTAR)| <= 0.5
independence check or the 100-sample minimum are skipped; a season
needs 700 night samples; if every season is below that but the pooled
night data has >= 160 samples, one pooled "big season" is detected and
broadcast to all season slots.

Distribution contract: the detection is a global sort within a season,
so the engine runs ONE keyed exchange on the season key and a
per-season numpy kernel (``grouped_block_map``) — a season group must
fit one worker, which holds for any realistic flux cadence (a year of
30-min records is 17.5k rows; even 1 Hz is ~8M rows/season). The
night filter and column projection run per batch BEFORE the exchange,
so only (season, TA, USTAR, NEE) night rows are ever shuffled.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

NIGHT_SWIN = 10.0        # W/m2: nighttime = SW_IN below this
MIN_PERIOD = 3000        # minimum total valid records
MIN_SEASON = 160         # pooled one-big-season eligibility
MIN_TA_CLASS = 100       # minimum records per temperature class
CORR_MAX = 0.5           # max |corr(TA, USTAR)| for a valid TA class
FIRST_USTAR_MAX = 0.2    # first USTAR class must be low-turbulence
WS_FWD = 10              # forward-mode window size
TA_CLASSES = 7
USTAR_CLASSES = 20
SEASON_GROUPS = ((1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12))


def tie_class_ends(vals_sorted: np.ndarray, n_classes: int, npc: int) -> np.ndarray:
    """Equal-count class end positions (inclusive) with tie extension:
    the nominal end ``npc*(i+1)-1`` extends to the last position holding
    the same value, so equal values never split across classes. Ends are
    non-decreasing; a class swallowed by a tie run is empty
    (ends[i] == ends[i-1]). The final class takes the remainder."""
    n = len(vals_sorted)
    ends = np.empty(n_classes, dtype=np.int64)
    prev = -1
    for i in range(n_classes - 1):
        nominal = min(npc * (i + 1) - 1, n - 1)
        e = int(np.searchsorted(vals_sorted, vals_sorted[nominal], side="right")) - 1
        prev = max(e, prev)
        ends[i] = prev
    ends[n_classes - 1] = n - 1
    return ends


def _class_means(sorted_arr: np.ndarray, ends: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-class means via one cumsum; empty classes -> 0.0 (the ONEFlux
    reset value). Returns (means, sizes)."""
    starts = np.concatenate(([0], ends[:-1] + 1))
    sizes = ends - starts + 1
    cs = np.concatenate(([0.0], np.cumsum(sorted_arr, dtype=np.float64)))
    means = np.where(sizes > 0, (cs[ends + 1] - cs[starts]) / np.maximum(sizes, 1), 0.0)
    return means, sizes


def forward_mode2(ustar_mean: np.ndarray, fx_mean: np.ndarray) -> float | None:
    """Forward mode with n=2: the first class i where NEE of classes i
    and i+1 are each >= the mean NEE of the following WS_FWD classes
    (windows starting at i+1 and i+2; an empty window invalidates the
    candidate). Vectorized over all candidates at once."""
    k = len(fx_mean)
    if k - 2 <= 0:
        return None
    cs = np.concatenate(([0.0], np.cumsum(fx_mean, dtype=np.float64)))

    def win_means(lo: np.ndarray) -> np.ndarray:
        hi = np.minimum(lo + WS_FWD, k)
        cnt = hi - lo
        with np.errstate(invalid="ignore"):
            return np.where(cnt > 0, (cs[hi] - cs[lo]) / np.maximum(cnt, 1), np.nan)

    i = np.arange(k - 1)  # candidates 0 .. k-2 (inclusive, as in ONEFlux)
    m1 = win_means(i + 1)
    m2 = win_means(i + 2)
    ok = (np.isfinite(m1) & np.isfinite(m2)
          & (fx_mean[i] >= m1) & (fx_mean[i + 1] >= m2))
    hits = np.flatnonzero(ok)
    if len(hits) == 0:
        return None
    return float(ustar_mean[hits[0]])


def detect_ta_class(ustar: np.ndarray, nee: np.ndarray) -> float | None:
    """Threshold for one temperature class via USTAR stratification."""
    m = len(ustar)
    npc = m // USTAR_CLASSES
    if npc < 1:
        return None
    order = np.argsort(ustar, kind="stable")
    us = ustar[order]
    ns = nee[order]
    ends = tie_class_ends(us, USTAR_CLASSES, npc)
    umeans, _ = _class_means(us, ends)
    fmeans, _ = _class_means(ns, ends)
    if umeans[0] > FIRST_USTAR_MAX:
        return None
    return forward_mode2(umeans, fmeans)


def _pearson(x: np.ndarray, y: np.ndarray) -> float:
    dx = x - x.mean()
    dy = y - y.mean()
    denom = float(np.sqrt((dx * dx).sum()) * np.sqrt((dy * dy).sum()))
    if denom == 0.0:
        return np.nan
    return float((dx * dy).sum() / denom)


def detect_season(ta: np.ndarray, ustar: np.ndarray, nee: np.ndarray) -> float | None:
    """Season threshold = median over valid TA classes."""
    n = len(ta)
    npc = n // TA_CLASSES
    if npc < MIN_TA_CLASS:
        return None
    order = np.argsort(ta, kind="stable")
    ta_s, us_s, ne_s = ta[order], ustar[order], nee[order]
    ends = tie_class_ends(ta_s, TA_CLASSES, npc)
    starts = np.concatenate(([0], ends[:-1] + 1))
    found = []
    for s, e in zip(starts, ends):
        if e - s + 1 < MIN_TA_CLASS:
            continue
        corr = _pearson(ta_s[s:e + 1], us_s[s:e + 1])
        if not np.isfinite(corr) or abs(corr) > CORR_MAX:
            continue
        th = detect_ta_class(us_s[s:e + 1], ne_s[s:e + 1])
        if th is not None:
            found.append(th)
    return float(np.median(found)) if found else None


def seasonal_thresholds(
    ta: np.ndarray, ustar: np.ndarray, nee: np.ndarray, month: np.ndarray
) -> list[float]:
    """Per-season thresholds (NaN where not detectable), including the
    ONEFlux one-big-season fallback when every season is undersampled."""
    counts = [int(np.isin(month, g).sum()) for g in SEASON_GROUPS]
    min_per_season = MIN_TA_CLASS * TA_CLASSES
    if all(c < min_per_season for c in counts):
        if len(nee) < MIN_SEASON:
            return [np.nan] * len(SEASON_GROUPS)
        th = detect_season(ta, ustar, nee)
        v = th if th is not None else np.nan
        return [v] * len(SEASON_GROUPS)
    out = []
    for g, c in zip(SEASON_GROUPS, counts):
        if c < min_per_season:
            out.append(np.nan)
            continue
        m = np.isin(month, g)
        th = detect_season(ta[m], ustar[m], nee[m])
        out.append(th if th is not None else np.nan)
    return out


def mpt_thresholds_distributed(
    ds,
    *,
    ta_col: str = "ta",
    ustar_col: str = "ustar",
    nee_col: str = "nee",
    swin_col: str = "sw_in",
    month_col: str = "month",
) -> pd.DataFrame:
    """Distributed MPT over a Dataset with (ta, ustar, nee, sw_in,
    month) columns. Two passes:

    1. a tiny counting aggregate (per-batch partials, driver combine of
       a <= 5-row frame) resolves the global decisions — the
       total-valid MIN_PERIOD gate and whether the one-big-season
       fallback applies;
    2. the night rows (projected to 4 columns per batch, never the
       full input) go through ONE exchange on the season key (or a
       constant pooled key in fallback mode) and ``detect_season`` runs
       INSIDE each block — per-season arrays never reach the driver;
       only (season, threshold, n_night) rows come back.

    Returns 4 season rows + 1 annual row (season 0 = conservative max
    across seasons)."""
    from .exchange import driver_combine, grouped_block_map

    season_of = {m: i + 1 for i, g in enumerate(SEASON_GROUPS) for m in g}

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        cols = [nee_col, ta_col, ustar_col, swin_col]
        valid = np.ones(len(df), dtype=bool)
        for c in cols:
            valid &= np.isfinite(df[c].to_numpy(dtype=np.float64))
        night = valid & (df[swin_col].to_numpy(dtype=np.float64) < NIGHT_SWIN)
        out = df.loc[night, [ta_col, ustar_col, nee_col, month_col]].copy()
        out["season"] = out[month_col].map(season_of).astype(np.int64)
        return out

    # pass 1: global counts (valid total + night count per season)
    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = [nee_col, ta_col, ustar_col, swin_col]
        valid = np.ones(len(df), dtype=bool)
        for c in cols:
            valid &= np.isfinite(df[c].to_numpy(dtype=np.float64))
        night = valid & (df[swin_col].to_numpy(dtype=np.float64) < NIGHT_SWIN)
        season = df.loc[night, month_col].map(season_of)
        p = season.value_counts().rename_axis("season").reset_index(name="n_night")
        p["n_valid"] = 0
        if len(p):
            p.iloc[0, p.columns.get_loc("n_valid")] = int(valid.sum())
        else:
            p = pd.DataFrame({"season": [0], "n_night": [0], "n_valid": [int(valid.sum())]})
        return p

    counts = driver_combine(
        ds, count_partial,
        lambda df: df.groupby("season", as_index=False)[["n_night", "n_valid"]].sum(),
        batch_format="pandas",
    )
    n_valid = int(counts["n_valid"].sum())
    night_per_season = {
        int(r["season"]): int(r["n_night"]) for _, r in counts.iterrows() if r["season"] > 0
    }
    n_night_total = sum(night_per_season.values())
    min_per_season = MIN_TA_CLASS * TA_CLASSES

    def result_frame(per_season_th: list[float]) -> pd.DataFrame:
        finite = [t for t in per_season_th if np.isfinite(t)]
        annual = float(np.max(finite)) if finite else np.nan
        rows = [{"season": 0, "threshold": annual, "n_night": n_night_total}]
        for i, th in enumerate(per_season_th):
            rows.append({"season": i + 1, "threshold": th,
                         "n_night": night_per_season.get(i + 1, 0)})
        return pd.DataFrame(rows)

    if n_valid < MIN_PERIOD:
        return result_frame([np.nan] * len(SEASON_GROUPS))

    fallback = all(
        night_per_season.get(i + 1, 0) < min_per_season for i in range(len(SEASON_GROUPS))
    )
    if fallback and n_night_total < MIN_SEASON:
        return result_frame([np.nan] * len(SEASON_GROUPS))

    # pass 2: detection inside the exchanged season blocks
    night_ds = ds.map_batches(prep, batch_format="pandas", zero_copy_batch=False)
    key = "season"
    if fallback:
        night_ds = night_ds.map_batches(
            lambda df: df.assign(_pool=0), batch_format="pandas", zero_copy_batch=False
        )
        key = "_pool"

    def detect_block(df: pd.DataFrame) -> pd.DataFrame:
        th = detect_season(
            df[ta_col].to_numpy(dtype=np.float64),
            df[ustar_col].to_numpy(dtype=np.float64),
            df[nee_col].to_numpy(dtype=np.float64),
        )
        return pd.DataFrame({
            "season": [int(df[key].iloc[0])],
            "threshold": [th if th is not None else np.nan],
        })

    detected = grouped_block_map(night_ds, [key], detect_block).to_pandas()
    th_by_season = dict(zip(detected["season"], detected["threshold"]))

    if fallback:
        v = th_by_season.get(0, np.nan)
        return result_frame([v] * len(SEASON_GROUPS))
    per_season_th = [
        th_by_season.get(i + 1, np.nan)
        if night_per_season.get(i + 1, 0) >= min_per_season else np.nan
        for i in range(len(SEASON_GROUPS))
    ]
    return result_frame(per_season_th)


# --------------------------------------------------- Vekuri quantile method

VEKURI_SEASONS = ((12, 1, 2), (3, 4, 5), (6, 7, 8), (9, 10, 11))
VEKURI_TA_CLASSES = 6
VEKURI_USTAR_CLASSES = 20
VEKURI_CORR_MAX = 0.4       # skip TA class when |corr| >= this (strict)
VEKURI_STABILITY = 0.95
VEKURI_WINDOW = 10
VEKURI_MIN_VALID = 100
VEKURI_MIN_SEASON = 50


def quantile_bins(r: np.ndarray, total: int, n: int) -> np.ndarray:
    """Quantile-class index for 0-based ranks ``r`` of ``total`` tie-free
    values split into ``n`` classes: ``min(n-1, max(0, (r*n-1) //
    (total-1)))``. For distinct values this reproduces ``pd.qcut(x, n)``
    membership (the interpolated quantile break between order stats
    floor/ceil((total-1)*j/n) separates ranks at the same boundary) —
    except at ranks where a break lands EXACTLY on an order statistic,
    which qcut tie-breaks by float rounding of j/n; this formula
    deterministically keeps those in the lower class. Pinned against
    pd.qcut (boundary ranks excluded) in tests; pure integer
    arithmetic, so the SQL oracle replays it verbatim."""
    if total <= 1:
        return np.zeros_like(r)
    return np.minimum(n - 1, np.maximum(0, (r * n - 1) // (total - 1)))


def vekuri_detect_season(ta: np.ndarray, ustar: np.ndarray,
                         nee: np.ndarray) -> float | None:
    """One season's Vekuri threshold: 6 TA quantile classes ->
    |corr| < 0.4 gate -> 20 USTAR quantile classes -> class means ->
    ascending positional scan (first class whose NEE >= 0.95x the mean
    of the next <=10 classes, excluding the last class) -> median over
    TA classes."""
    m = len(ta)
    order = np.argsort(ta, kind="stable")
    ta_s, us_s, ne_s = ta[order], ustar[order], nee[order]
    tcls = quantile_bins(np.arange(m), m, VEKURI_TA_CLASSES)
    found = []
    for t in np.unique(tcls):
        sel = tcls == t
        ta_c, us_c, ne_c = ta_s[sel], us_s[sel], ne_s[sel]
        corr = _pearson(ta_c, us_c)
        if not np.isfinite(corr) or abs(corr) >= VEKURI_CORR_MAX:
            continue
        k = len(us_c)
        o2 = np.argsort(us_c, kind="stable")
        us_o, ne_o = us_c[o2], ne_c[o2]
        ucls = quantile_bins(np.arange(k), k, VEKURI_USTAR_CLASSES)
        labels = np.unique(ucls)
        if len(labels) < 3:
            continue
        umeans = np.array([us_o[ucls == u].mean() for u in labels])
        fmeans = np.array([ne_o[ucls == u].mean() for u in labels])
        th = None
        for i in range(len(labels) - 1):
            end = min(i + 1 + VEKURI_WINDOW, len(labels))
            wmean = float(fmeans[i + 1:end].mean())
            if fmeans[i] >= VEKURI_STABILITY * wmean:
                th = float(umeans[i])
                break
        if th is not None:
            found.append(th)
    return float(np.median(found)) if found else None


def vekuri_thresholds_distributed(
    ds,
    *,
    ta_col: str = "ta",
    ustar_col: str = "ustar",
    nee_col: str = "nee",
    swin_col: str = "sw_in",
    month_col: str = "month",
) -> pd.DataFrame:
    """Distributed Vekuri quantile-based USTAR detection (reference
    anchor /root/reference/diive/flux/lowres/ustar_vekuri_detection.py):
    same two-pass shape as ``mpt_thresholds_distributed`` — a tiny
    counting pass resolves the global >=100-valid gate, then detection
    runs INSIDE the per-season exchange blocks. Seasons are
    meteorological (DJF/MAM/JJA/SON). Returns 4 season rows + annual
    (season 0, max)."""
    from .exchange import driver_combine, grouped_block_map

    season_of = {mth: i + 1 for i, g in enumerate(VEKURI_SEASONS) for mth in g}

    def night_valid(df: pd.DataFrame) -> pd.DataFrame:
        valid = np.ones(len(df), dtype=bool)
        for c in (nee_col, ta_col, ustar_col):
            valid &= np.isfinite(df[c].to_numpy(dtype=np.float64))
        night = valid & (df[swin_col].to_numpy(dtype=np.float64) < NIGHT_SWIN)
        out = df.loc[night, [ta_col, ustar_col, nee_col, month_col]].copy()
        out["season"] = out[month_col].map(season_of).astype(np.int64)
        return out

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        nv = night_valid(df)
        p = nv["season"].value_counts().rename_axis("season").reset_index(name="n_night")
        if not len(p):
            p = pd.DataFrame({"season": [0], "n_night": [0]})
        return p

    counts = driver_combine(
        ds, count_partial,
        lambda df: df.groupby("season", as_index=False)["n_night"].sum(),
        batch_format="pandas",
    )
    per_season_n = {int(r["season"]): int(r["n_night"])
                    for _, r in counts.iterrows() if r["season"] > 0}
    n_total = sum(per_season_n.values())

    def result_frame(ths: list[float]) -> pd.DataFrame:
        finite = [t for t in ths if np.isfinite(t)]
        annual = float(np.max(finite)) if finite else np.nan
        rows = [{"season": 0, "threshold": annual, "n_night": n_total}]
        for i, t in enumerate(ths):
            rows.append({"season": i + 1, "threshold": t,
                         "n_night": per_season_n.get(i + 1, 0)})
        return pd.DataFrame(rows)

    if n_total < VEKURI_MIN_VALID:
        return result_frame([np.nan] * len(VEKURI_SEASONS))

    night_ds = ds.map_batches(night_valid, batch_format="pandas", zero_copy_batch=False)

    def detect_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < VEKURI_MIN_SEASON:
            th = None
        else:
            th = vekuri_detect_season(
                df[ta_col].to_numpy(dtype=np.float64),
                df[ustar_col].to_numpy(dtype=np.float64),
                df[nee_col].to_numpy(dtype=np.float64),
            )
        return pd.DataFrame({
            "season": [int(df["season"].iloc[0])],
            "threshold": [th if th is not None else np.nan],
        })

    detected = grouped_block_map(night_ds, ["season"], detect_block).to_pandas()
    th_by = dict(zip(detected["season"], detected["threshold"]))
    return result_frame([th_by.get(i + 1, np.nan) for i in range(len(VEKURI_SEASONS))])


# ------------------------------------------- multi-year bootstrap (VUT/CUT)

def annual_threshold_from_window(
    ta: np.ndarray, ustar: np.ndarray, nee: np.ndarray, month: np.ndarray
) -> float:
    """Annual MPT threshold of one (pooled multi-year) window: max over
    the finite per-season thresholds (the conservative ONEFlux annual,
    reference ustar_mp_detection.py get_annual_thresholds)."""
    ths = seasonal_thresholds(ta, ustar, nee, month)
    finite = [t for t in ths if np.isfinite(t)]
    return float(np.max(finite)) if finite else float("nan")


def ustar_bootstrap_thresholds(
    ds,
    *,
    ta_col: str = "ta",
    ustar_col: str = "ustar",
    nee_col: str = "nee",
    swin_col: str = "sw_in",
    month_col: str = "month",
    year_col: str = "year",
    n_iter: int = 100,
    percentiles: tuple[int, ...] = (16, 50, 84),
    iter_chunks: int = 4,
    seed: int = 0,
) -> pd.DataFrame:
    """Multi-year bootstrap USTAR thresholds — VUT (per-year) and CUT
    (pooled), reference flux/lowres/ustar_bootstrap.py:58-310
    ``UstarBootstrapThresholds`` around the MPT detector.

    Reference semantics mirrored:

    * 3-year sliding window per central year with the edge rules
      (ustar_bootstrap.py:182-196 ``_get_window_years``: n<=3 years ->
      all years; first year -> years[0:3]; last -> years[-3:]);
    * per window, ``n_iter`` resamples with replacement -> annual
      threshold each (the bootstrap worker, :20-56); NaN results are
      dropped, not retried;
    * VUT = per-year percentiles of that year's sample distribution
      (:293-300); CUT = percentiles of ALL samples pooled (:340-365).

    Deliberate deviation (documented): resampling is over the VALID
    NIGHT rows — the only rows the detector consumes — not the raw
    window rows; equivalent up to binomial jitter in the per-resample
    night count, and it means only the 5-column night projection is
    ever shuffled.

    Distributed shape: the parallelism axis is (central_year,
    iter_chunk). Each night row is replicated to every window that
    contains its year (<= 3) x ``iter_chunks`` — bounded, because the
    projection is 5 float columns. ONE exchange co-locates each
    (window, chunk); every block runs its seeded share of the
    resamples locally (Philox keyed on (seed, year, chunk) — the
    sample set is independent of partitioning and cluster size). The
    per-year percentile combine sees years x n_iter scalar samples.
    """
    from .exchange import driver_combine, grouped_block_map

    # tiny pass: distinct years (driver sees <= decades of scalars)
    years_df = driver_combine(
        ds,
        lambda df: pd.DataFrame({"y": df[year_col].unique()}),
        lambda df: df.drop_duplicates(),
        batch_format="pandas",
    )
    years = sorted(int(y) for y in years_df["y"].dropna())
    n_years = len(years)

    def window_years(idx: int) -> list[int]:
        if n_years <= 3:
            return years[:]
        if idx == 0:
            return years[0:3]
        if idx == n_years - 1:
            return years[n_years - 3:]
        return years[idx - 1: idx + 2]

    # invert: year -> central years whose window contains it
    centrals_of: dict[int, list[int]] = {y: [] for y in years}
    for i, cy in enumerate(years):
        for wy in window_years(i):
            centrals_of[wy].append(cy)

    iters_of_chunk = [
        n_iter // iter_chunks + (1 if c < n_iter % iter_chunks else 0)
        for c in range(iter_chunks)
    ]

    def replicate_night(df: pd.DataFrame) -> pd.DataFrame:
        cols = [nee_col, ta_col, ustar_col, swin_col]
        valid = np.ones(len(df), dtype=bool)
        for c in cols:
            valid &= np.isfinite(df[c].to_numpy(dtype=np.float64))
        night = valid & (df[swin_col].to_numpy(dtype=np.float64) < NIGHT_SWIN)
        base = df.loc[night, [ta_col, ustar_col, nee_col, month_col, year_col]]
        outs = []
        for cy in years:
            m = base[year_col].isin(
                [y for y in years if cy in centrals_of.get(y, [])]
            )
            w = base.loc[m]
            if w.empty:
                continue
            for chunk in range(iter_chunks):
                outs.append(w.assign(central_year=cy, chunk=chunk))
        if not outs:
            return pd.DataFrame(
                columns=[*base.columns, "central_year", "chunk"]
            ).astype({month_col: np.int64})
        return pd.concat(outs, ignore_index=True)

    night_ds = ds.map_batches(replicate_night, batch_format="pandas",
                              zero_copy_batch=False)

    def boot_block(g: pd.DataFrame) -> pd.DataFrame:
        cy = int(g["central_year"].iloc[0])
        chunk = int(g["chunk"].iloc[0])
        ta = g[ta_col].to_numpy(dtype=np.float64)
        us = g[ustar_col].to_numpy(dtype=np.float64)
        ne = g[nee_col].to_numpy(dtype=np.float64)
        mo = g[month_col].to_numpy(dtype=np.int64)
        # the intra-block row order depends on block arrival order —
        # impose a total order on the DATA so the seeded resamples are
        # partitioning- and cluster-size-independent
        order = np.lexsort((mo, ne, us, ta))
        ta, us, ne, mo = ta[order], us[order], ne[order], mo[order]
        n = len(g)
        rng = np.random.Generator(
            np.random.Philox(key=[seed, (cy << 16) | chunk])
        )
        samples = []
        for _ in range(iters_of_chunk[chunk]):
            idx = rng.integers(0, n, n)
            th = annual_threshold_from_window(ta[idx], us[idx], ne[idx], mo[idx])
            if np.isfinite(th):
                samples.append(th)
        return pd.DataFrame({"year": cy, "sample": samples})

    samples = grouped_block_map(
        night_ds, ["central_year", "chunk"], boot_block
    ).to_pandas()
    if samples.empty or "year" not in samples.columns:
        # tiny corpora can leave EVERY bootstrap threshold non-finite:
        # all blocks emit empty frames and the collected frame loses
        # its schema — restore it so the percentile sweep degrades to
        # the documented n_ok=0 / NaN rows instead of a KeyError
        samples = pd.DataFrame({
            "year": pd.Series([], dtype=np.int64),
            "sample": pd.Series([], dtype=np.float64)})

    rows = []
    for y in years:
        s = samples.loc[samples["year"] == y, "sample"].to_numpy()
        row = {"year": y, "scope": "vut", "n_ok": len(s)}
        for p in sorted(percentiles):
            row[f"p{p}"] = float(np.percentile(s, p)) if len(s) else float("nan")
        rows.append(row)
    pooled = samples["sample"].to_numpy()
    cut = {"year": -1, "scope": "cut", "n_ok": len(pooled)}
    for p in sorted(percentiles):
        cut[f"p{p}"] = float(np.percentile(pooled, p)) if len(pooled) else float("nan")
    rows.append(cut)
    return pd.DataFrame(rows)
