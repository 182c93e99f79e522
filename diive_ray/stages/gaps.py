"""Gap machinery: dense-grid regularization, gap tables, gap-filling.

Reference semantics:

* Regularization — irregular/missing buckets materialize as null rows on
  a continuous grid (diive/core/times/times.py:1460-1517
  ``continuous_timestamp_freq``; reindex at times.py:1500-1517).
* Gap table — consecutive-null runs found with the ``notna().cumsum()``
  trick, columns GAP_START/GAP_END/GAP_LENGTH
  (diive/analysis/gapfinder.py:114-147).
* Linear interpolation with limit — interpolate *all* inside gaps, then
  keep fills only where the gap run length is <= limit; longer gaps stay
  null (diive/gapfilling/interpolate.py:154-164; tests pin exact
  remaining-null counts, tests/test_gapfilling.py:176-185).
* Rolling-median fill — the reference uses centered rolling medians both
  as LocalSD's baseline (localsd.py:244) and as gap-fill features
  (diive/gapfilling/swin.py:147-149); here it is the fallback filler for
  gaps the linear pass skipped. Gap-fill never modifies observed values
  (tests/test_gapfilling.py:186-214).

Physical plan: gap-fill runs on **rollup-tier series** (one row per
(source, bucket)), 60-1440x smaller than raw. Each source's tier series
is an ordered group via ``groupby(source).map_groups`` — at 1m
resolution a year of one source is ~525k rows, one comfortable task; the
parallelism axis at corpus scale is the number of sources. For
single-source series longer than that, ``chunk_span_buckets`` switches
to (source, chunk) groups with a ``halo``-bucket overlap: rows within
``halo`` of a chunk edge are duplicated into the neighbor chunk before
the shuffle, each chunk regularizes/fills its own grid slice against the
broadcast global span, and emits only its own buckets. Exact whenever
the fill reach (interp_limit, rmed_window/2) is <= halo.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
import ray.data

from ..util import ts_to_us


# --------------------------------------------------------------- pandas kernels


def regularize_frame(
    df: pd.DataFrame,
    width_us: int,
    bucket_col: str = "bucket_ts",
    start_us: int | None = None,
    stop_us: int | None = None,
) -> pd.DataFrame:
    """Reindex one key's tier frame onto the dense bucket grid
    (times.py:1500-1517): missing buckets become all-null rows."""
    us = pd.Series(ts_to_us(df[bucket_col]))
    lo = int(us.min()) if start_us is None else start_us
    hi = int(us.max()) if stop_us is None else stop_us
    grid = np.arange(lo, hi + width_us, width_us, dtype=np.int64)
    out = df.set_index(us.to_numpy()).reindex(grid)
    out[bucket_col] = pd.to_datetime(grid, unit="us")
    return out.reset_index(drop=True)


def find_gap_runs(isna: np.ndarray) -> list[tuple[int, int]]:
    """(start_pos, length) of consecutive-True runs — vectorized
    equivalent of the gapfinder.py:120-130 cumsum trick."""
    if len(isna) == 0 or not isna.any():
        return []
    padded = np.concatenate(([False], isna, [False]))
    d = np.diff(padded.astype(np.int8))
    starts = np.flatnonzero(d == 1)
    ends = np.flatnonzero(d == -1)
    return list(zip(starts.tolist(), (ends - starts).tolist()))


def gap_run_lengths(isna: np.ndarray) -> np.ndarray:
    """Per-position gap-run length (0 where observed) — vectorized."""
    out = np.zeros(len(isna), dtype=np.int64)
    for pos, length in find_gap_runs(isna):
        out[pos : pos + length] = length
    return out


def linear_interpolation_limited(s: pd.Series, limit: int) -> pd.Series:
    """Reference interpolate.py:154-164: interpolate every inside gap
    linearly, then keep fills only in gaps with run length <= limit."""
    if limit < 1:
        raise ValueError(f"Gap size limit must be >= 1, got {limit}")
    isna = s.isna().to_numpy()
    if not isna.any():
        return s.copy()
    all_interp = s.interpolate(method="linear", limit=None, limit_area="inside", limit_direction="both")
    runlen = gap_run_lengths(isna)
    fillable = isna & (runlen <= limit)
    out = s.copy()
    out[fillable] = all_interp[fillable]
    return out


def rolling_median_fill(s: pd.Series, window: int, min_periods: int = 3) -> pd.Series:
    """Fill nulls with the centered rolling median of observed values
    (rolling(center=True, min_periods) per localsd.py:244-248). Observed
    values are never modified."""
    from ..functions.cmedian import rolling_median_centered_exact
    rmed = pd.Series(
        rolling_median_centered_exact(s.to_numpy(), window, min_periods),
        index=s.index)
    return s.where(s.notna(), rmed)


def forward_fill_limited(s: pd.Series, limit: int) -> pd.Series:
    """Forward-fill gaps up to ``limit`` buckets (north-rule forward fill)."""
    return s.ffill(limit=limit)


def _fill_frame(
    reg: pd.DataFrame,
    value_col: str,
    interp_limit: int,
    rmed_window: int | None,
    rmed_min_periods: int,
) -> pd.DataFrame:
    s = reg[value_col]
    observed = s.notna().to_numpy()
    filled = linear_interpolation_limited(s, interp_limit)
    after_linear = filled.notna().to_numpy()
    if rmed_window is not None:
        filled = rolling_median_fill(filled, rmed_window, rmed_min_periods)
    method = np.full(len(reg), np.nan)
    method[observed] = 0
    method[~observed & after_linear] = 1
    method[~after_linear & filled.notna().to_numpy()] = 2
    reg[f"{value_col}_filled"] = filled
    reg["fill_method"] = method
    return reg


# --------------------------------------------------------------- Dataset stages


def key_spans(
    ds: ray.data.Dataset, keys: list[str], bucket_col: str = "bucket_ts"
) -> dict:
    """Per-key (min_us, max_us) of the bucket column — per-batch partials
    combined on the driver (no shuffle; one row per key per batch)."""
    from .exchange import driver_combine

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = ts_to_us(df[bucket_col])
        return (
            df.assign(_us=us)
            .groupby(keys, as_index=False)["_us"]
            .agg(lo="min", hi="max")
        )

    m = driver_combine(
        ds,
        partial,
        lambda df: df.groupby(keys, as_index=False).agg(lo=("lo", "min"), hi=("hi", "max")),
        batch_format="pandas",
    )
    out = {}
    for _, r in m.iterrows():
        k = r[keys[0]] if len(keys) == 1 else tuple(r[kk] for kk in keys)
        out[k] = (int(r["lo"]), int(r["hi"]))
    return out


def gap_table(
    ds: ray.data.Dataset,
    width_us: int,
    *,
    keys: Iterable[str] = ("source",),
    value_col: str = "mean",
    bucket_col: str = "bucket_ts",
    min_length: int | None = None,
    max_length: int | None = None,
) -> ray.data.Dataset:
    """Gap table over a rollup tier: one row per consecutive run of
    missing/null buckets, columns keys + GAP_START/GAP_END/GAP_LENGTH
    (gapfinder.py:114-147; size filters gapfinder.py:138-142). GAP_START/
    GAP_END are the END-labeled stamps of the first/last missing bucket."""
    keys = list(keys)

    def gfn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(bucket_col, kind="stable")
        key_vals = {k: df[k].iloc[0] for k in keys}
        reg = regularize_frame(df, width_us, bucket_col)
        isna = reg[value_col].isna().to_numpy()
        runs = find_gap_runs(isna)
        buckets = reg[bucket_col].to_numpy()
        rows = [
            {**key_vals, "GAP_START": buckets[pos], "GAP_END": buckets[pos + length - 1], "GAP_LENGTH": length}
            for pos, length in runs
        ]
        out = pd.DataFrame(rows, columns=keys + ["GAP_START", "GAP_END", "GAP_LENGTH"])
        if max_length is not None:
            out = out[out["GAP_LENGTH"] <= max_length]
        if min_length is not None:
            out = out[out["GAP_LENGTH"] >= min_length]
        return out

    from .exchange import grouped_block_map

    return grouped_block_map(ds, keys, gfn)


def gap_stats(
    gap_tbl: pd.DataFrame,
    *,
    keys: Iterable[str] = ("source",),
    long_gap_length: int | None = None,
) -> pd.DataFrame:
    """Monthly gap coverage from a gap table (GapStats,
    gapfinder.py:361-560): per (keys, year, month of GAP_START) the gap
    count, total missing buckets, and longest run; plus the long-gap
    listing when ``long_gap_length`` is given. Driver-side — the gap
    table is already tiny relative to the corpus."""
    keys = list(keys)
    if gap_tbl.empty:
        return pd.DataFrame(columns=keys + ["year", "month", "n_gaps", "missing", "longest"])
    t = gap_tbl.copy()
    start = pd.to_datetime(t["GAP_START"])
    t["year"] = start.dt.year.astype(np.int64)
    t["month"] = start.dt.month.astype(np.int64)
    out = (
        t.groupby(keys + ["year", "month"], as_index=False)
        .agg(n_gaps=("GAP_LENGTH", "count"), missing=("GAP_LENGTH", "sum"), longest=("GAP_LENGTH", "max"))
    )
    if long_gap_length is not None:
        out.attrs["long_gaps"] = t[t["GAP_LENGTH"] >= long_gap_length]
    return out


def gapfill_rollup(
    ds: ray.data.Dataset,
    width_us: int,
    *,
    keys: Iterable[str] = ("source",),
    value_col: str = "mean",
    bucket_col: str = "bucket_ts",
    interp_limit: int = 5,
    rmed_window: int | None = 60,
    rmed_min_periods: int = 3,
    chunk_span_buckets: int | None = None,
) -> ray.data.Dataset:
    """Regularize each key's tier series onto the dense bucket grid and
    gap-fill ``value_col`` (north rule: fill BEFORE further
    downsampling): pass 1 linear interpolation for gaps <= interp_limit
    (interpolate.py:154-164), pass 2 centered rolling-median fill for the
    remainder (window=rmed_window; skipped when None).

    Adds ``{value_col}_filled`` (float) and ``fill_method``
    (0 observed, 1 linear, 2 rolling-median; null = still missing).
    Observed values are never modified (tests/test_gapfilling.py:186-214).

    ``chunk_span_buckets`` enables the scalable halo-chunked layout
    (module docstring); the halo is sized interp_limit + rmed_window//2
    + 1, the full fill reach, so results are identical to whole-series
    mode (pinned by tests).
    """
    keys = list(keys)

    from .exchange import grouped_block_map

    if chunk_span_buckets is None:
        def gfn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(bucket_col, kind="stable")
            key_vals = {k: df[k].iloc[0] for k in keys}
            reg = regularize_frame(df, width_us, bucket_col)
            for k in keys:
                reg[k] = key_vals[k]
            return _fill_frame(reg, value_col, interp_limit, rmed_window, rmed_min_periods)

        return grouped_block_map(ds, keys, gfn)

    # Halo must cover the full fill reach: the rolling median at an owned
    # position reads linear-filled values up to window//2 away, and those
    # in turn depend on observed values up to interp_limit further.
    halo = interp_limit + (rmed_window or 0) // 2 + 1
    span_us = chunk_span_buckets * width_us
    halo_us = halo * width_us
    spans = key_spans(ds, keys, bucket_col)

    def emit_chunks(df: pd.DataFrame) -> pd.DataFrame:
        us = ts_to_us(df[bucket_col])
        own = us // span_us
        frames = [df.assign(_chunk=own)]
        left = (us % span_us) < halo_us
        right = (us % span_us) >= span_us - halo_us
        if left.any():
            frames.append(df[left].assign(_chunk=own[left] - 1))
        if right.any():
            frames.append(df[right].assign(_chunk=own[right] + 1))
        return pd.concat(frames, ignore_index=True)

    def gfn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(bucket_col, kind="stable")
        key_vals = {k: df[k].iloc[0] for k in keys}
        key = key_vals[keys[0]] if len(keys) == 1 else tuple(key_vals[k] for k in keys)
        span_lo, span_hi = spans[key]
        chunk = int(df["_chunk"].iloc[0])
        emit_lo = max(span_lo, chunk * span_us)
        emit_hi = min(span_hi, (chunk + 1) * span_us - width_us)
        if emit_lo > emit_hi:
            # pure-halo chunk outside the key's span
            return pd.DataFrame(columns=list(df.columns.drop("_chunk")) + [f"{value_col}_filled", "fill_method"])
        grid_lo = max(span_lo, emit_lo - halo_us)
        grid_hi = min(span_hi, emit_hi + halo_us)
        reg = regularize_frame(df.drop(columns=["_chunk"]), width_us, bucket_col, grid_lo, grid_hi)
        for k in keys:
            reg[k] = key_vals[k]
        out = _fill_frame(reg, value_col, interp_limit, rmed_window, rmed_min_periods)
        us = ts_to_us(out[bucket_col])
        return out[(us >= emit_lo) & (us <= emit_hi)]

    with_chunks = ds.map_batches(emit_chunks, batch_format="pandas")
    return grouped_block_map(with_chunks, keys + ["_chunk"], gfn)


def expanding_rmedian_fill_frame(
    df: pd.DataFrame,
    *,
    strg_col: str = "storage",
    flux_col: str = "flux",
) -> pd.DataFrame:
    """Storage-term gap-fill with an EXPANDING centered rolling median
    (reference flux/lowres/storage_correction.py:230-295,
    _gapfill_storage_term): windows 3, 5, 7, ... until every gap is
    covered; each pass's median is computed on the ORIGINAL series, so
    the fill at a missing position equals the rolling median at the
    SMALLEST odd window holding >= 3 valid values there — i.e. the
    median of the valid values within the minimal symmetric position
    window [p-h*, p+h*] with >= 3 valid (h* = 3rd-smallest position
    distance to a valid value). Fewer than 3 valid values in the whole
    series -> fallback 0.0 (flagged). Output keeps only rows where the
    flux is non-null (the reference's dropna(subset=fluxcol)) and
    appends ``{strg_col}_gf`` + ``flag_strg_isfilled`` (0 original /
    1 filled) + ``flux_corr`` = flux + filled storage.

    The frame must arrive in series order (sort by timestamp first);
    positions are ROW positions as in the reference's integer-window
    rolling. O(n_missing) candidate scan + per-missing median over the
    minimal window — the cold path of a storage series (gaps are rare).
    """
    s = df[strg_col].to_numpy(dtype=np.float64)
    n = len(s)
    out = s.copy()
    flag = np.zeros(n, dtype=np.int8)
    valid = np.flatnonzero(~np.isnan(s))
    missing = np.flatnonzero(np.isnan(s))
    if len(valid) < 3:
        out[missing] = 0.0
        flag[missing] = 1
    else:
        V = valid
        sv = s[V]
        for p in missing:
            i = int(np.searchsorted(V, p))
            # minimal symmetric window with >=3 valid: best triple of
            # consecutive valid positions around p
            best = None
            for k in range(max(0, i - 3), min(len(V) - 3, i) + 1):
                h = max(abs(int(V[k]) - int(p)), abs(int(V[k + 2]) - int(p)))
                if best is None or h < best:
                    best = h
            lo = int(np.searchsorted(V, p - best))
            hi = int(np.searchsorted(V, p + best, side="right"))
            out[p] = float(np.median(sv[lo:hi]))
            flag[p] = 1
    res = df.copy()
    res[f"{strg_col}_gf"] = out
    res["flag_strg_isfilled"] = flag
    res = res[res[flux_col].notna()].copy()
    res["flux_corr"] = res[flux_col].to_numpy(dtype=np.float64) + res[
        f"{strg_col}_gf"].to_numpy(dtype=np.float64)
    return res


def storage_gapfill(
    ds,
    *,
    keys: list[str],
    order_by: list[str],
    strg_col: str = "storage",
    flux_col: str = "flux",
    num_partitions: int | None = None,
):
    """Distributed storage correction with rolling-median gap-fill:
    ONE keyed exchange co-locates each series, rows sorted into series
    order, then the frame op above per group. Window growth is
    unbounded like the reference's (cap 2n+1), so a series must fit
    its block — the same per-series partitioning assumption as the
    other sequential per-key stages (document/shard very long series
    by (key, year) if needed)."""
    from .exchange import grouped_block_map

    def gfn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order_by, kind="stable", ignore_index=True)
        return expanding_rmedian_fill_frame(
            df, strg_col=strg_col, flux_col=flux_col)

    return grouped_block_map(ds, keys, gfn, num_partitions=num_partitions)
