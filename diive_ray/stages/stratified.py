"""Stratified binning analysis + exact distributed ntile.

Reference: diive/analysis/decoupling.py (StratifiedAnalysis): stratify
rows into quantile bins of z, bin each stratum by quantiles of x, and
aggregate y per (z-bin, x-bin) cell with counts and 16th/84th
percentile error bars.

The reference uses pandas ``qcut`` on an in-memory frame. Distributed,
the z-stratification needs GLOBAL rank boundaries; this module
implements them exactly with bounded driver memory:

``exact_ntile_boundaries`` — 3 streaming passes, no whole-column
materialization:
  1. global (count, min, max) of the key column (tiny partials);
  2. a fixed-width value histogram per batch (2^17 bins, combined on
     the driver) -> for each target rank, the bin that contains it;
  3. collect ONLY the rows falling in those boundary bins (expected
     n / 2^17 rows per bin; a cap guards degenerate distributions) and
     resolve the exact (value, id) order statistic with id tie-break.

The resulting boundaries reproduce SQL ``ntile(q) OVER (ORDER BY value,
id)`` exactly: deterministic under duplicate values (id tie-break),
first (n % q) buckets one element larger. Rows are then assigned
vectorized (q-1 lexicographic comparisons) and the per-stratum x-binning
runs INSIDE the z-bin exchange (whole stratum per block -> exact
in-block ntile + quantile aggregates, no further shuffle).

Degenerate-distribution cap: if one histogram bin holds a huge
duplicate class, pass 3 would collect it all; ``collect_cap`` bounds
that and raises with guidance (at 100 TB: pre-dedup the key or accept
approximate edges).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .exchange import driver_combine, grouped_block_map

N_HIST_BINS = 1 << 17


def _ntile_cut_ranks(n: int, q: int) -> np.ndarray:
    """0-based start ranks of buckets 1..q-1 under SQL ntile semantics
    (first n%q buckets hold floor(n/q)+1 rows)."""
    size, rem = divmod(n, q)
    sizes = np.array([size + 1] * rem + [size] * (q - rem), dtype=np.int64)
    return np.cumsum(sizes)[:-1]


def _bin_of(z: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """Histogram bin index in [0, N_HIST_BINS-1]; identical math in the
    counting and the collection pass."""
    if hi <= lo:
        return np.zeros(len(z), dtype=np.int64)
    idx = ((z - lo) / (hi - lo) * N_HIST_BINS).astype(np.int64)
    return np.clip(idx, 0, N_HIST_BINS - 1)


def exact_rank_values(
    ds: rd.Dataset,
    value_col: str,
    id_col: str,
    ranks_fn,
    *,
    collect_cap: int = 2_000_000,
) -> tuple[int, list[tuple[float, int]]]:
    """Exact (value, id) order statistics at arbitrary 0-based ranks
    (``ranks_fn(n) -> int array``) over the non-null values ordered by
    (value, id). 3 streaming passes, bounded driver memory (see module
    docstring). Returns (n_non_null, [(value, id), ...])."""

    def p_stats(t):
        import pyarrow.compute as pc

        col = t[value_col]
        ok = pc.is_valid(col)
        col = col.filter(ok)
        if len(col) == 0:
            return pd.DataFrame({"n": [0], "lo": [np.inf], "hi": [-np.inf]})
        return pd.DataFrame(
            {"n": [len(col)], "lo": [pc.min(col).as_py()], "hi": [pc.max(col).as_py()]}
        )

    stats = driver_combine(
        ds, p_stats,
        lambda df: pd.DataFrame(
            {"n": [df["n"].sum()], "lo": [df["lo"].min()], "hi": [df["hi"].max()]}
        ),
    )
    n, lo, hi = int(stats["n"][0]), float(stats["lo"][0]), float(stats["hi"][0])
    if n == 0:
        return 0, []
    cuts = np.asarray(ranks_fn(n), dtype=np.int64)
    if len(cuts) == 0:
        return n, []

    def p_hist(t):
        z = np.asarray(t[value_col].to_numpy(zero_copy_only=False), dtype=np.float64)
        z = z[np.isfinite(z)]
        # sparse partial: only non-empty bins leave the task (a dense
        # 2^17 vector per batch would swamp the driver at scale)
        bins, counts = np.unique(_bin_of(z, lo, hi), return_counts=True)
        return pd.DataFrame({"bin": bins.astype(np.int64), "c": counts.astype(np.int64)})

    hist = driver_combine(
        ds, p_hist, lambda df: df.groupby("bin", as_index=False)["c"].sum()
    ).sort_values("bin")
    counts = np.zeros(N_HIST_BINS, dtype=np.int64)
    counts[hist["bin"].to_numpy()] = hist["c"].to_numpy()
    cum_before = np.concatenate([[0], np.cumsum(counts)[:-1]])
    # the bin containing each cut rank + the remaining rank inside it
    bin_of_cut = np.searchsorted(np.cumsum(counts), cuts, side="right")
    want_bins = np.unique(bin_of_cut)
    expected = int(counts[want_bins].sum())
    if expected > collect_cap:
        raise RuntimeError(
            f"exact_ntile_boundaries: boundary bins hold {expected} rows "
            f"(> cap {collect_cap}) — a duplicate class dominates the key; "
            "pre-aggregate duplicates or use approximate edges"
        )
    want_sorted = np.sort(want_bins)

    def p_collect(t):
        z = np.asarray(t[value_col].to_numpy(zero_copy_only=False), dtype=np.float64)
        ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False))
        okm = np.isfinite(z)
        z, ids = z[okm], ids[okm]
        b = _bin_of(z, lo, hi)
        keep = np.isin(b, want_sorted)
        return pd.DataFrame({"bin": b[keep], "v": z[keep], "id": ids[keep]})

    window = driver_combine(ds, p_collect, lambda df: df)
    out: list[tuple[float, int]] = []
    for cut, b in zip(cuts, bin_of_cut):
        rows = window[window["bin"] == b].sort_values(["v", "id"], kind="mergesort")
        k = int(cut - cum_before[b])
        r = rows.iloc[k]
        out.append((float(r["v"]), r["id"]))
    return n, out


def exact_ntile_boundaries(
    ds: rd.Dataset,
    value_col: str,
    id_col: str,
    q: int,
    *,
    collect_cap: int = 2_000_000,
) -> list[tuple[float, int]]:
    """Exact (value, id) order statistics at the ntile(q) bucket starts."""
    _, out = exact_rank_values(
        ds, value_col, id_col, lambda n: _ntile_cut_ranks(n, q), collect_cap=collect_cap
    )
    return out


def exact_median(
    ds: rd.Dataset, value_col: str, id_col: str, *, collect_cap: int = 2_000_000
) -> float:
    """Exact distributed median with linear interpolation (matches
    pandas quantile(0.5) / SQL quantile_cont(0.5)): the mean of the two
    middle order statistics for even n."""
    n, vals = exact_rank_values(
        ds, value_col, id_col,
        lambda n: np.unique([(n - 1) // 2, n // 2]),
        collect_cap=collect_cap,
    )
    if n == 0:
        return float("nan")
    vs = [v for v, _ in vals]
    return float((vs[0] + vs[-1]) / 2.0)


def exact_medians(
    ds: rd.Dataset, cols: list[str], id_col: str, *, collect_cap: int = 2_000_000
) -> dict[str, float]:
    """Multi-column exact_median sharing the 3 streaming passes across
    all columns (each extra Ray topology costs seconds of fixed
    overhead on small inputs; at scale it is an extra full scan)."""

    def p_stats(t):
        rows = []
        for c in cols:
            z = np.asarray(t[c].to_numpy(zero_copy_only=False), dtype=np.float64)
            z = z[np.isfinite(z)]
            rows.append(
                {
                    "c": c,
                    "n": len(z),
                    "lo": float(z.min()) if len(z) else np.inf,
                    "hi": float(z.max()) if len(z) else -np.inf,
                }
            )
        return pd.DataFrame(rows)

    stats = driver_combine(
        ds, p_stats,
        lambda df: df.groupby("c", as_index=False).agg(
            n=("n", "sum"), lo=("lo", "min"), hi=("hi", "max")
        ),
    ).set_index("c")
    meta = {
        c: (int(stats.loc[c, "n"]), float(stats.loc[c, "lo"]), float(stats.loc[c, "hi"]))
        for c in cols
    }
    ranks = {
        c: np.unique([(n - 1) // 2, n // 2]) for c, (n, _, _) in meta.items() if n > 0
    }

    def p_hist(t):
        frames = []
        for c in cols:
            if c not in ranks:
                continue
            _, lo, hi = meta[c]
            z = np.asarray(t[c].to_numpy(zero_copy_only=False), dtype=np.float64)
            z = z[np.isfinite(z)]
            bins, counts = np.unique(_bin_of(z, lo, hi), return_counts=True)
            frames.append(pd.DataFrame({"c": c, "bin": bins, "cn": counts}))
        return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
            {"c": [], "bin": [], "cn": []}
        )

    hist = driver_combine(
        ds, p_hist, lambda df: df.groupby(["c", "bin"], as_index=False)["cn"].sum()
    )
    want: dict[str, np.ndarray] = {}
    cuts_info: dict[str, tuple] = {}
    for c in ranks:
        h = hist[hist["c"] == c].sort_values("bin")
        counts = np.zeros(N_HIST_BINS, dtype=np.int64)
        counts[h["bin"].to_numpy(dtype=np.int64)] = h["cn"].to_numpy(dtype=np.int64)
        cum_before = np.concatenate([[0], np.cumsum(counts)[:-1]])
        boc = np.searchsorted(np.cumsum(counts), ranks[c], side="right")
        want[c] = np.unique(boc)
        cuts_info[c] = (cum_before, boc)
        if int(counts[want[c]].sum()) > collect_cap:
            raise RuntimeError(f"exact_medians: boundary bins over cap for {c}")

    def p_collect(t):
        frames = []
        for c in want:
            _, lo, hi = meta[c]
            z = np.asarray(t[c].to_numpy(zero_copy_only=False), dtype=np.float64)
            ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False))
            okm = np.isfinite(z)
            z, ids = z[okm], ids[okm]
            b = _bin_of(z, lo, hi)
            keep = np.isin(b, want[c])
            frames.append(pd.DataFrame({"c": c, "bin": b[keep], "v": z[keep], "id": ids[keep]}))
        return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
            {"c": [], "bin": [], "v": [], "id": []}
        )

    window = driver_combine(ds, p_collect, lambda df: df)
    out: dict[str, float] = {}
    for c in cols:
        if c not in ranks:
            out[c] = float("nan")
            continue
        cum_before, boc = cuts_info[c]
        vs = []
        for cut, b in zip(ranks[c], boc):
            rows = window[(window["c"] == c) & (window["bin"] == b)].sort_values(
                ["v", "id"], kind="mergesort"
            )
            vs.append(float(rows.iloc[int(cut - cum_before[b])]["v"]))
        out[c] = float((vs[0] + vs[-1]) / 2.0)
    return out


def keyed_quantile_cont(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    qs: list[float],
    *,
    collect_cap: int = 2_000_000,
    max_keys: int = 100_000,
) -> pd.DataFrame:
    """Exact per-key QUANTILE_CONT (linear-interpolation quantiles,
    pandas ``quantile`` / SQL ``QUANTILE_CONT`` semantics) with bounded
    driver memory — the de-skewed quantile pre-pass for per-key clip /
    winsorize plans (VERDICT r3 #4: a ``grouped_block_map`` on a
    low-cardinality key ships each key's FULL value set into one block;
    this keeps every pass streaming).

    Same 3-pass shape as ``exact_rank_values``, keyed:
      1. per-batch ``groupby(key)`` (n, lo, hi) partials -> driver
         combine (bounded by batches x keys-per-batch; asserted
         <= ``max_keys`` distinct keys);
      2. per-batch per-key SPARSE value histogram (only non-empty
         (key, bin) cells leave the task) -> for each key x quantile,
         the bins holding the two bracketing order statistics;
      3. collect ONLY rows in wanted (key, bin) cells (expected
         n_key / 2^17 rows per cell, ``collect_cap`` guards degenerate
         duplicate-heavy distributions) and resolve exactly.

    Returns a tidy frame (key_col, q, value), one row per key per
    requested quantile; keys whose non-null count is 0 are omitted.
    NaN values are ignored (pandas/SQL convention)."""
    qs = sorted(set(float(q) for q in qs))

    def p_stats(df: pd.DataFrame) -> pd.DataFrame:
        v = pd.to_numeric(df[value_col], errors="coerce")
        ok = np.isfinite(v.to_numpy(dtype=np.float64, na_value=np.nan))
        g = pd.DataFrame({key_col: df[key_col].to_numpy()[ok],
                          "v": v.to_numpy(dtype=np.float64)[ok]})
        if g.empty:
            return pd.DataFrame({key_col: [], "n": [], "lo": [], "hi": []})
        agg = g.groupby(key_col, as_index=False, sort=False)["v"].agg(
            ["size", "min", "max"]
        )
        agg.columns = [key_col, "n", "lo", "hi"]
        return agg

    stats = driver_combine(
        ds, p_stats,
        lambda df: df.groupby(key_col, as_index=False).agg(
            n=("n", "sum"), lo=("lo", "min"), hi=("hi", "max")
        ),
        batch_format="pandas",
    )
    stats = stats[stats["n"] > 0].sort_values(key_col).reset_index(drop=True)
    if len(stats) > max_keys:
        raise RuntimeError(
            f"keyed_quantile_cont: {len(stats)} distinct keys (> max_keys "
            f"{max_keys}) — driver combine would not be tiny; pre-bucket "
            "the key or raise max_keys deliberately"
        )
    if stats.empty:
        return pd.DataFrame({key_col: [], "q": [], "value": []})

    keys_sorted = stats[key_col].to_numpy()
    n_by_key = stats["n"].to_numpy(dtype=np.int64)
    lo_by_key = stats["lo"].to_numpy(dtype=np.float64)
    hi_by_key = stats["hi"].to_numpy(dtype=np.float64)

    def _key_ix(karr: np.ndarray) -> np.ndarray:
        return np.searchsorted(keys_sorted, karr)

    def p_hist(df: pd.DataFrame) -> pd.DataFrame:
        v = pd.to_numeric(df[value_col], errors="coerce").to_numpy(
            dtype=np.float64, na_value=np.nan
        )
        ok = np.isfinite(v)
        if not ok.any():
            return pd.DataFrame({"ki": [], "bin": [], "c": []})
        karr, v = df[key_col].to_numpy()[ok], v[ok]
        ki = _key_ix(karr)
        b = np.empty(len(v), dtype=np.int64)
        for i in np.unique(ki):
            m = ki == i
            b[m] = _bin_of(v[m], lo_by_key[i], hi_by_key[i])
        cell = ki * N_HIST_BINS + b
        cells, counts = np.unique(cell, return_counts=True)
        return pd.DataFrame({
            "ki": (cells // N_HIST_BINS).astype(np.int64),
            "bin": (cells % N_HIST_BINS).astype(np.int64),
            "c": counts.astype(np.int64),
        })

    hist = driver_combine(
        ds, p_hist,
        lambda df: df.groupby(["ki", "bin"], as_index=False)["c"].sum(),
        batch_format="pandas",
    ).sort_values(["ki", "bin"]).reset_index(drop=True)

    # per (key, q): fractional rank h=(n-1)q -> order statistics at
    # floor(h), ceil(h); locate their bins via the key's sparse cumsum
    want_bins: dict[int, np.ndarray] = {}
    plan: list[tuple[int, float, int, int, float]] = []  # ki, q, k0, k1, frac
    rank_bin: dict[tuple[int, int], int] = {}
    cum_before_bin: dict[tuple[int, int], int] = {}
    for i in range(len(keys_sorted)):
        h = hist[hist["ki"] == i]
        bins = h["bin"].to_numpy(dtype=np.int64)
        cnts = h["c"].to_numpy(dtype=np.int64)
        cum = np.cumsum(cnts)
        n = int(n_by_key[i])
        ranks = set()
        for q in qs:
            fh = (n - 1) * q
            k0, k1 = int(np.floor(fh)), int(np.ceil(fh))
            plan.append((i, q, k0, k1, fh - k0))
            ranks.update((k0, k1))
        rk = np.array(sorted(ranks), dtype=np.int64)
        pos = np.searchsorted(cum, rk, side="right")
        for r, p in zip(rk, pos):
            rank_bin[(i, int(r))] = int(bins[p])
            cum_before_bin[(i, int(bins[p]))] = int(cum[p - 1]) if p > 0 else 0
        want_bins[i] = np.unique(bins[pos])

    expected = sum(
        int(hist[(hist["ki"] == i) & (hist["bin"].isin(wb))]["c"].sum())
        for i, wb in want_bins.items()
    )
    if expected > collect_cap:
        raise RuntimeError(
            f"keyed_quantile_cont: boundary bins hold {expected} rows "
            f"(> cap {collect_cap}) — a duplicate class dominates some key; "
            "pre-aggregate duplicates or use t-digest (stages/sketch.py)"
        )

    def p_collect(df: pd.DataFrame) -> pd.DataFrame:
        v = pd.to_numeric(df[value_col], errors="coerce").to_numpy(
            dtype=np.float64, na_value=np.nan
        )
        ok = np.isfinite(v)
        if not ok.any():
            return pd.DataFrame({"ki": [], "bin": [], "v": []})
        karr, v = df[key_col].to_numpy()[ok], v[ok]
        ki = _key_ix(karr)
        frames = []
        for i in np.unique(ki):
            wb = want_bins.get(int(i))
            if wb is None or not len(wb):
                continue
            m = ki == i
            b = _bin_of(v[m], lo_by_key[i], hi_by_key[i])
            keep = np.isin(b, wb)
            if keep.any():
                frames.append(pd.DataFrame(
                    {"ki": np.int64(i), "bin": b[keep], "v": v[m][keep]}
                ))
        return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
            {"ki": [], "bin": [], "v": []}
        )

    window = driver_combine(ds, p_collect, lambda df: df, batch_format="pandas")

    def order_stat(i: int, k: int) -> float:
        b = rank_bin[(i, k)]
        rows = np.sort(
            window[(window["ki"] == i) & (window["bin"] == b)]["v"].to_numpy()
        )
        return float(rows[k - cum_before_bin[(i, b)]])

    out_rows = []
    for i, q, k0, k1, frac in plan:
        v0 = order_stat(i, k0)
        v1 = v0 if k1 == k0 else order_stat(i, k1)
        out_rows.append((keys_sorted[i], q, v0 + frac * (v1 - v0)))
    return pd.DataFrame(out_rows, columns=[key_col, "q", "value"])


def assign_ntile(
    z: np.ndarray, ids: np.ndarray, boundaries: list[tuple[float, int]]
) -> np.ndarray:
    """1-based bucket per row: 1 + #{boundaries <= (z, id) lexicographic}
    — reproduces ntile(q) OVER (ORDER BY z, id)."""
    bucket = np.ones(len(z), dtype=np.int64)
    for bv, bid in boundaries:
        bucket += (z > bv) | ((z == bv) & (ids >= bid))
    return bucket


def ntile_in_block(x: np.ndarray, ids: np.ndarray, q: int) -> np.ndarray:
    """Exact in-memory ntile(q) by (x, id) order, 1-based."""
    n = len(x)
    order = np.lexsort((ids, x))
    cuts = _ntile_cut_ranks(n, q)
    ranks = np.empty(n, dtype=np.int64)
    ranks[order] = np.arange(n)
    return 1 + np.searchsorted(cuts, ranks, side="right").astype(np.int64)


def stratified_analysis(
    ds: rd.Dataset,
    *,
    z: str,
    x: str,
    y: str,
    id_col: str,
    n_bins_z: int = 8,
    n_bins_x: int = 4,
    agg: str = "median",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Distributed StratifiedAnalysis (decoupling.py:24-210 semantics,
    ntile bin rule): exact global z-bins via exact_ntile_boundaries,
    ONE exchange on z_bin, then per-stratum x-ntile + quantile
    aggregates inside the block. Returns one row per (z_bin, x_bin)
    with agg/count and P16/P84 of x and y."""
    import ray

    bounds = exact_ntile_boundaries(ds, z, id_col, n_bins_z)
    bref = ray.put(bounds)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(bref)
        return df.assign(
            z_bin=assign_ntile(
                df[z].to_numpy(dtype=np.float64), df[id_col].to_numpy(), b
            )
        )

    def per_stratum(g: pd.DataFrame) -> pd.DataFrame:
        xb = ntile_in_block(g[x].to_numpy(dtype=np.float64), g[id_col].to_numpy(), n_bins_x)
        g = g.assign(x_bin=xb)
        gr = g.groupby("x_bin", sort=True)
        out = pd.DataFrame(
            {
                "z_bin": g["z_bin"].iloc[0],
                "x_bin": gr.size().index.to_numpy(dtype=np.int64),
                "n": gr.size().to_numpy(dtype=np.int64),
                f"{x}_agg": gr[x].agg(agg).to_numpy(),
                f"{y}_agg": gr[y].agg(agg).to_numpy(),
                f"{x}_p16": gr[x].quantile(0.16).to_numpy(),
                f"{x}_p84": gr[x].quantile(0.84).to_numpy(),
                f"{y}_p16": gr[y].quantile(0.16).to_numpy(),
                f"{y}_p84": gr[y].quantile(0.84).to_numpy(),
            }
        )
        return out

    tagged = ds.map_batches(tag, batch_format="pandas")
    return grouped_block_map(tagged, ["z_bin"], per_stratum, num_partitions=num_partitions)
