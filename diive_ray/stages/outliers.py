"""Outlier-detection flags over time series — reference-parity kernels +
Ray Data wrappers.

Flag convention (diive/core/base/flagbase.py:112-120): per-record integer
flag, 0 = ok, 2 = hard reject; the *filtered* series is derived by
masking flag==2 to null (flagbase.py:122-129). Every iterative detector
repeats until an iteration finds 0 new outliers (flagbase.py:155-187 —
rejected values are removed from the working series between iterations;
the overall flag is 2 iff rejected in any iteration).

Kernels (exact reference semantics, pinned by tests vs seeded fixtures):

* ``zscore_flag`` — global z-score, mean/std with ddof=0
  (diive/core/funcs/funcs.py:54-67), reject |z| > thres (default 4)
  (diive/preprocessing/outlier_detection/zscore.py:164-189).
* ``zscore_rolling_flag`` — centered rolling mean/std, window default
  len/20 computed on the first iteration's non-null count, min_periods=3
  (zscore.py:315-348).
* ``zscore_increments_flag`` — z-score each of {|dprev|+|dnext|,
  |dprev|, |dnext|} (diive/core/dfun/stats.py:526-538); outlier only if
  all three flag (sum==6) (incremental.py:103-158).
* ``hampel_flag`` — optional double-differencing d=(x_t-x_{t-1})-
  (x_{t+1}-x_t) fillna(0), rolling median +- n_sigma*k*MAD (window 624
  centered, min_periods=1, k=1.4826, MAD+1e-6) (hampel.py:199-243).
* ``localsd_flag`` — rolling median +- n_sd * SD (rolling or whole-
  series-constant SD), min_periods=3; strict inequalities: values
  exactly on the limit are neither ok nor rejected (localsd.py:244-262).
* ``abs_limits_flag`` — reject outside [min, max], single pass
  (absolutelimits.py:188-202).
* ``trimlow_flag`` — reject values < lower_limit plus an equal COUNT of
  the highest values (positional, stable sort; ties at the boundary
  resolved by position) (trim.py:237-260).
* ``missing_flag`` — 2 where null (diive/preprocessing/qaqc/flags.py:54-110).
* ``manual_removal_flag`` — explicit timestamps / closed ranges
  (manualremoval.py:42-160).

Ray wrappers: ``flag_outliers`` runs a kernel per ordered key group
(``groupby(keys).map_groups`` — the reference's own scope is one whole
series in memory, so per-source groups reproduce it exactly; the
parallelism axis is the key count). ``zscore_global_distributed`` is the
scalable two-pass variant for the plain global z-score: per-batch
partial (count, sum, sumsq) -> tiny combine -> broadcast mask, a driver
loop per iteration (SURVEY.md §2.3: aggregate->flag rounds).
"""

from __future__ import annotations

from typing import Callable, Iterable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

FLAG_DTYPE = np.int8


# ------------------------------------------------------------- core helpers


def _iterate(
    s: pd.Series,
    flagtest: Callable[[pd.Series, int], pd.Index],
    repeat: bool = True,
    max_iter: int = 100,
) -> pd.Series:
    """flagbase.repeat loop (flagbase.py:155-187): run ``flagtest`` on the
    current filtered series, remove rejected, until none found. Returns
    int8 flag over s.index: 2 = rejected in any iteration, else 0."""
    filtered = s.copy()
    flag = pd.Series(0, index=s.index, dtype=FLAG_DTYPE)
    for iteration in range(1, max_iter + 1):
        rejected = flagtest(filtered, iteration)
        if len(rejected) == 0:
            break
        flag.loc[rejected] = 2
        filtered.loc[rejected] = np.nan
        if not repeat:
            break
    return flag


# ------------------------------------------------------------------ kernels


def zscore_flag(s: pd.Series, thres_zscore: float = 4, repeat: bool = True) -> pd.Series:
    """Global z-score (zscore.py:164-189); mean/std ddof=0 (funcs.py:62)."""

    def test(filtered: pd.Series, _i: int) -> pd.Index:
        st = filtered.dropna()
        if len(st) == 0:
            return st.index
        mean = st.mean()
        std = st.std(ddof=0)
        z = np.abs((st - mean) / std)
        return z[z > thres_zscore].index

    return _iterate(s, test, repeat)


def zscore_rolling_flag(
    s: pd.Series, thres_zscore: float = 4, winsize: int | None = None, repeat: bool = True
) -> pd.Series:
    """Rolling z-score (zscore.py:315-348). The default window len/20 is
    computed once, from the first iteration's non-null count
    (zscore.py:321-322 mutates self.winsize)."""
    state = {"win": winsize}

    def test(filtered: pd.Series, _i: int) -> pd.Index:
        st = filtered.dropna()
        if len(st) == 0:
            return st.index
        if not state["win"]:
            state["win"] = int(len(st) / 20)
        rmean = st.rolling(window=state["win"], center=True, min_periods=3).mean()
        rsd = st.rolling(window=state["win"], center=True, min_periods=3).std()
        rz = np.abs((st - rmean) / rsd)
        return rz[rz > thres_zscore].index

    return _iterate(s, test, repeat)


def zscore_increments_flag(s: pd.Series, thres_zscore: float = 4, repeat: bool = True) -> pd.Series:
    """zScoreIncrements (incremental.py:103-158): inner zScore runs with
    repeat=False on each diff series; rejected iff all three flags == 2
    (sum == 6). Note the diffs are computed on the *uncompressed* series
    (nulls kept, incremental.py:106)."""

    def test(filtered: pd.Series, _i: int) -> pd.Index:
        shifted_prev = filtered.shift(1)
        diff_to_prev_abs = (filtered - shifted_prev).abs()
        shifted_next = filtered.shift(-1)
        diff_to_next_abs = (filtered - shifted_next).abs()
        doublediff_abs = diff_to_prev_abs + diff_to_next_abs

        flag_sum = None
        for diff in (doublediff_abs, diff_to_prev_abs, diff_to_next_abs):
            f = zscore_flag(diff, thres_zscore=thres_zscore, repeat=False).astype(float)
            f[diff.isna()] = np.nan
            flag_sum = f if flag_sum is None else flag_sum.add(f)
        return flag_sum[flag_sum == 6].index

    return _iterate(s, test, repeat)


def rolling_median_centered(x: np.ndarray, window: int, chunk_rows: int = 4096) -> np.ndarray:
    """Exact replacement for
    ``pd.Series(x).rolling(window, center=True, min_periods=1).median()``
    on a NaN-free array, built on chunked ``np.partition`` over
    ``sliding_window_view`` windows.

    MEASURED VERDICT (this VM, n=86400): pandas' O(n log w) skiplist
    beats this O(n*w) kernel at every window tried — 0.08 s vs 2.3 s at
    w=624, 0.036 s vs 0.071 s at w=49 — so ``hampel_flag`` stays on
    pandas. Kept (with its bit-exactness test) as the documented
    negative result for the ROUND_NOTES "cache-friendly rolling median"
    candidate: the total-work inflation of per-window partitions
    dwarfs any cache-locality win; a real improvement needs a
    compiled incremental structure — which round 5 added as
    ``functions.cmedian.rolling_median_centered_exact`` (counting-
    histogram C kernel, ~20x pandas on half-integral bounded data,
    pandas fallback otherwise).

    pandas centered-window contract (verified empirically on distinct
    values, even and odd windows): output i covers positions
    [i - w//2, i + (w-1)//2] clipped to the series — even windows put
    the extra point on the LEFT; truncated edge windows use all
    available points (min_periods=1). Even-count medians are the mean
    of the two middle order statistics.
    """
    n = len(x)
    left = window // 2
    right = (window - 1) // 2
    out = np.empty(n, dtype=np.float64)
    full_lo = left                 # first index with a full window
    full_hi = n - right            # one past the last full-window index
    if full_hi > full_lo and n >= window:
        sw = np.lib.stride_tricks.sliding_window_view(x, window)
        k2 = window // 2
        ks = (k2 - 1, k2) if window % 2 == 0 else (k2, k2)
        for lo in range(0, full_hi - full_lo, chunk_rows):
            hi = min(lo + chunk_rows, full_hi - full_lo)
            part = np.partition(sw[lo:hi], ks, axis=1)
            out[full_lo + lo: full_lo + hi] = 0.5 * (part[:, ks[0]] + part[:, ks[1]])
    else:
        full_lo, full_hi = 0, 0
    # truncated edge windows (at most window-1 on each side): per-row
    # partition over the clipped range
    for i in list(range(0, min(full_lo, n))) + list(range(max(full_hi, 0), n)):
        lo, hi = max(0, i - left), min(n, i + right + 1)
        seg = x[lo:hi]
        m = len(seg)
        k2 = m // 2
        if m % 2 == 0:
            part = np.partition(seg, (k2 - 1, k2))
            out[i] = 0.5 * (part[k2 - 1] + part[k2])
        else:
            out[i] = np.partition(seg, k2)[k2]
    return out


def hampel_flag(
    s: pd.Series,
    window_length: int = 48 * 13,
    n_sigma: float = 5.5,
    k: float = 1.4826,
    use_differencing: bool = True,
    repeat: bool = True,
) -> pd.Series:
    """Hampel filter, global mode (hampel.py:199-243). Rolling medians
    route through ``functions.cmedian.rolling_median_centered_exact``:
    the compiled counting-histogram kernel (bit-exact, ~20x pandas'
    skiplist and near-zero memory traffic) when the tested values are
    half-integral and range-bounded — true for the flagship's integer
    n_tok and its double-differences — else pandas' O(n log w)
    skiplist (itself measured 30x faster than the partition kernel at
    the flagship window; see rolling_median_centered's verdict)."""
    from ..functions.cmedian import rolling_median_centered_exact

    def test(filtered: pd.Series, _i: int) -> pd.Index:
        st = filtered.dropna()
        if len(st) == 0:
            return st.index
        if use_differencing:
            s_to_test = st.diff() - st.diff().shift(-1)
            s_to_test = s_to_test.fillna(0)
        else:
            s_to_test = st
        rolling_median = pd.Series(
            rolling_median_centered_exact(
                s_to_test.to_numpy(), window_length, 1),
            index=s_to_test.index)
        deviations = np.abs(s_to_test - rolling_median)
        rolling_mad = pd.Series(
            rolling_median_centered_exact(
                deviations.to_numpy(), window_length, 1),
            index=deviations.index) + 1e-6
        limit = k * rolling_mad * n_sigma
        upper = rolling_median + limit
        lower = rolling_median - limit
        is_outlier = (s_to_test > upper) | (s_to_test < lower)
        return is_outlier[is_outlier].index

    return _iterate(s, test, repeat)


def localsd_flag(
    s: pd.Series,
    n_sd: float = 7,
    winsize: int | None = None,
    constant_sd: bool = False,
    repeat: bool = True,
) -> pd.Series:
    """LocalSD (localsd.py:244-262). Strict inequalities: a value exactly
    on the limit is neither ok nor rejected -> stays unflagged (0 here,
    consistent with flagbase's 2-sum overall flag)."""
    state = {"win": winsize}

    def test(filtered: pd.Series, _i: int) -> pd.Index:
        st = filtered.dropna()
        if len(st) == 0:
            return st.index
        if not state["win"]:
            state["win"] = int(len(st) / 20)
        from ..functions.cmedian import rolling_median_centered_exact
        rmedian = pd.Series(
            rolling_median_centered_exact(st.to_numpy(), state["win"], 3),
            index=st.index)
        if constant_sd:
            sd = st.std()  # pandas default ddof=1 (localsd.py:246)
        else:
            sd = st.rolling(window=state["win"], center=True, min_periods=3).std()
        upper = rmedian + sd * n_sd
        lower = rmedian - sd * n_sd
        rejected = (st > upper) | (st < lower)
        return rejected[rejected].index

    return _iterate(s, test, repeat)


def abs_limits_flag(s: pd.Series, minval: float, maxval: float) -> pd.Series:
    """AbsoluteLimits, global single pass (absolutelimits.py:188-202)."""
    flag = pd.Series(0, index=s.index, dtype=FLAG_DTYPE)
    rejected = (s < minval) | (s > maxval)
    flag[rejected] = 2
    return flag


def trimlow_flag(s: pd.Series, lower_limit: float) -> pd.Series:
    """TrimLow, whole-series subset (trim.py:237-260): reject values below
    lower_limit plus an equal count of the highest values, positional."""
    st = s.dropna()
    flag = pd.Series(0, index=s.index, dtype=FLAG_DTYPE)
    s_sorted = st.sort_values(ascending=False, kind="stable")
    n_below = int((s_sorted < lower_limit).sum())
    if n_below == 0:
        return flag
    low_idx = st.index[st < lower_limit]
    high_idx = s_sorted.iloc[0:n_below].index
    flag.loc[low_idx.union(high_idx)] = 2
    return flag


def missing_flag(s: pd.Series) -> pd.Series:
    """flag=2 where value is missing (diive/preprocessing/qaqc/flags.py:54-110)."""
    flag = pd.Series(0, index=s.index, dtype=FLAG_DTYPE)
    flag[s.isna()] = 2
    return flag


def manual_removal_flag(
    s: pd.Series,
    ts_col_values: pd.Series,
    remove: list,
) -> pd.Series:
    """ManualRemoval (manualremoval.py:42-160): ``remove`` holds single
    timestamps and/or (start, end) closed ranges over the row timestamps."""
    ts = pd.to_datetime(ts_col_values)
    mask = np.zeros(len(s), dtype=bool)
    for item in remove:
        if isinstance(item, (tuple, list)) and len(item) == 2:
            lo, hi = pd.Timestamp(item[0]), pd.Timestamp(item[1])
            mask |= ((ts >= lo) & (ts <= hi)).to_numpy()
        else:
            mask |= (ts == pd.Timestamp(item)).to_numpy()
    flag = pd.Series(0, index=s.index, dtype=FLAG_DTYPE)
    flag[mask] = 2
    return flag


def _lof_scores_sorted(x: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """LOF scores over 1-D ``x``: returns (lof in SORTED-value order,
    the stable sort order). k-NN by |value distance| with a
    DETERMINISTIC tie-break — among equal distances the neighbor with
    the smaller sorted position wins (stable argsort over the
    position-increasing candidate window) — so an independent oracle
    (SQL: ORDER BY dist, sorted_pos) reproduces the exact neighbor
    sets. Caveat: with a duplicate-value class wider than the 2k+1
    candidate window, window-external tied candidates are unreachable;
    callers needing oracle parity should keep k above the largest
    duplicate class size."""
    n = len(x)
    order = np.argsort(x, kind="stable")
    xs = x[order]
    idx = np.arange(n)
    if n < 2 * k + 1:
        # group too small for a distinct sorted window: exact full
        # pairwise distances (n is tiny here, O(n^2) is cheap) so no
        # neighbor is ever double-counted
        cand = np.broadcast_to(idx, (n, n)).copy()
        d = np.abs(xs[None, :] - xs[:, None])
        np.fill_diagonal(d, np.inf)  # self
    else:
        # distances to the 2k sorted neighbors per point -> k nearest
        # 2k+1 DISTINCT sorted candidates per point: window shifted
        # (not clipped) at the edges, so edge points never
        # double-count a neighbor
        start = np.clip(idx - k, 0, n - (2 * k + 1))
        cand = start[:, None] + np.arange(2 * k + 1)[None, :]
        d = np.abs(xs[cand] - xs[:, None])
        d[cand == idx[:, None]] = np.inf  # self
    # stable sort: candidate columns are position-increasing, so ties on
    # distance resolve to the smallest sorted position — deterministic
    part = np.argsort(d, axis=1, kind="stable")[:, :k]
    rows = np.repeat(idx, k)
    nbr = cand[rows, part.ravel()].reshape(n, k)
    nd = d[rows, part.ravel()].reshape(n, k)
    kdist = nd.max(axis=1)
    reach = np.maximum(nd, kdist[nbr])  # reach-dist(p, o) = max(kdist(o), d(p,o))
    lrd = 1.0 / (reach.mean(axis=1) + 1e-12)
    lof = (lrd[nbr].mean(axis=1)) / lrd
    return lof, order


def lof_scores(x: np.ndarray, k: int) -> np.ndarray:
    """LOF score per element of ``x`` (input order)."""
    lof_sorted, order = _lof_scores_sorted(np.asarray(x, dtype=float), k)
    out = np.empty(len(x), dtype=float)
    out[order] = lof_sorted
    return out


def lof_flag(
    s: pd.Series,
    n_neighbors: int | None = None,
    contamination: float | str = "auto",
    repeat: bool = False,
) -> pd.Series:
    """LocalOutlierFactor on the 1-D value vector
    (diive/preprocessing/outlier_detection/lof.py:42-300; sklearn is not
    in this container, so this is a from-scratch numpy LOF with the
    classic definition: k-distance -> reachability -> lrd -> LOF ratio).
    1-D specialization: neighbors come from the sorted order (the k
    nearest values of x are among its 2k sorted neighbors), so the
    whole computation is O(n k) instead of O(n^2).

    n_neighbors defaults to len/200 (stepwiseoutlierdetection.py:357);
    threshold: contamination='auto' rejects LOF > 1.5 (the sklearn
    offset_ default), a float rejects the top ``contamination``
    fraction by LOF score."""

    def test(filtered: pd.Series, _i: int) -> pd.Index:
        st = filtered.dropna()
        n = len(st)
        if n < 4:
            return st.index[:0]
        k = n_neighbors or max(2, int(n / 200))
        k = min(k, n - 1)
        lof, order = _lof_scores_sorted(st.to_numpy(dtype=float), k)
        bad_sorted = np.zeros(n, dtype=bool)
        if contamination == "auto":
            bad_sorted = lof > 1.5
        else:
            nbad = int(np.ceil(float(contamination) * n))
            thr = np.partition(lof, n - nbad)[n - nbad] if nbad else np.inf
            bad_sorted = lof >= thr
        bad_orig = np.zeros(n, dtype=bool)
        bad_orig[order] = bad_sorted
        return st.index[bad_orig]

    return _iterate(s, test, repeat)


KERNELS = {
    "zscore": zscore_flag,
    "zscore_rolling": zscore_rolling_flag,
    "zscore_increments": zscore_increments_flag,
    "hampel": hampel_flag,
    "localsd": localsd_flag,
    "abs_limits": abs_limits_flag,
    "trimlow": trimlow_flag,
    "missing": missing_flag,
    "lof": lof_flag,
}


# -------------------------------------------------------------- Ray wrappers


def flag_outliers(
    ds: ray.data.Dataset,
    method: str,
    *,
    value_col: str,
    keys: Iterable[str] = ("source",),
    ts_col: str = "ts",
    flag_col: str | None = None,
    mask_values: bool = False,
    **kernel_kwargs,
) -> ray.data.Dataset:
    """Append flag column ``FLAG_{value_col}_{METHOD}_TEST``
    (naming per flagbase.py:136-148) computed per ordered key group.
    ``mask_values=True`` additionally nulls value_col where flag==2
    (the stepwise ``addflag`` behavior,
    stepwiseoutlierdetection.py:416-424)."""
    kernel = KERNELS[method]
    keys = list(keys)
    flag_col = flag_col or f"FLAG_{value_col}_{method.upper()}_TEST"

    def gfn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(ts_col, kind="stable").reset_index(drop=True)
        flag = kernel(df[value_col].astype(float), **kernel_kwargs)
        df[flag_col] = flag.to_numpy()
        if mask_values:
            df.loc[df[flag_col] == 2, value_col] = np.nan
        return df

    from .exchange import grouped_block_map

    return grouped_block_map(ds, keys, gfn)


def zscore_global_distributed(
    ds: ray.data.Dataset,
    *,
    value_col: str,
    keys: Iterable[str] = ("source",),
    thres_zscore: float = 4,
    repeat: bool = True,
    max_iter: int = 100,
    flag_col: str | None = None,
) -> ray.data.Dataset:
    """Scalable global z-score: no key group ever materializes in one
    task. Driver loop of (tiny per-key aggregate of count/sum/sumsq over
    rows not yet rejected -> broadcast thresholds -> vectorized batch
    mask). Matches ``zscore_flag`` exactly (same ddof=0 moments; pinned
    by tests) while streaming arbitrary key sizes.
    """
    keys = list(keys)
    flag_col = flag_col or f"FLAG_{value_col}_ZSCORE_TEST"

    def init_flag(batch: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(batch.num_rows, dtype=FLAG_DTYPE))
        if flag_col in batch.column_names:
            batch = batch.drop_columns([flag_col])
        return batch.append_column(flag_col, z)

    current = ds.map_batches(init_flag, batch_format="pyarrow", zero_copy_batch=True)

    for _ in range(max_iter):
        # pass 1: per-key moments over still-accepted, non-null rows
        def partial(batch: pa.Table) -> pd.DataFrame:
            df = batch.select(keys + [value_col, flag_col]).to_pandas()
            ok = (df[flag_col] != 2) & df[value_col].notna()
            d = df[ok]
            v = d[value_col].astype(float)
            g = d.assign(_v=v, _v2=v * v).groupby(keys)
            out = g.agg(n=("_v", "count"), s=("_v", "sum"), s2=("_v2", "sum")).reset_index()
            return out

        from .exchange import driver_combine

        moments = driver_combine(
            current, partial,
            lambda df: df.groupby(keys, as_index=False)[["n", "s", "s2"]].sum(),
        )
        moments = moments.rename(columns={"n": "sum(n)", "s": "sum(s)", "s2": "sum(s2)"})
        if len(moments) == 0 or moments["sum(n)"].sum() == 0:
            break
        moments["mean"] = moments["sum(s)"] / moments["sum(n)"]
        moments["var"] = moments["sum(s2)"] / moments["sum(n)"] - moments["mean"] ** 2
        moments["std"] = np.sqrt(np.maximum(moments["var"], 0.0))
        stats = {
            (tuple(r[k] for k in keys) if len(keys) > 1 else r[keys[0]]): (r["mean"], r["std"])
            for _, r in moments.iterrows()
        }

        # pass 2: flag rows beyond the threshold
        def mask(batch: pa.Table, stats=stats) -> pa.Table:
            df = batch.to_pandas()
            kv = df[keys[0]] if len(keys) == 1 else list(zip(*[df[k] for k in keys]))
            mean = np.array([stats.get(k, (np.nan, np.nan))[0] for k in kv])
            std = np.array([stats.get(k, (np.nan, np.nan))[1] for k in kv])
            v = df[value_col].astype(float).to_numpy()
            with np.errstate(invalid="ignore", divide="ignore"):
                z = np.abs((v - mean) / std)
            newly = (df[flag_col].to_numpy() != 2) & ~np.isnan(v) & (z > thres_zscore)
            df.loc[newly, flag_col] = 2
            df["_newly"] = newly.astype(np.int8)
            return pa.Table.from_pandas(df, preserve_index=False)

        # materialize to pin this round's flags (the driver loop would
        # otherwise re-execute the whole lazy plan every iteration)
        current = current.map_batches(mask, batch_format="pyarrow").materialize()
        n_new = current.sum("_newly")
        current = current.drop_columns(["_newly"])
        if not repeat or not n_new:
            break
    return current
