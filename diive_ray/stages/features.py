"""Feature engineering + interval-event flags.

* ``engineer_features`` — the reference's FeatureEngineer stages
  (diive/core/ml/feature_engineer.py:42-805; stage list at
  feature_engineer.py:7-15): lagged copies, rolling mean/median/std,
  first differences, EMA, timestamp features. Ordered per-key work ->
  grouped block stage (halo requirements bounded by max lag/window).
  STL decomposition is out of scope (statsmodels not in container).
* ``event_to_flag`` — interval events -> 0/1 flag over rows
  (diive/events/event.py:70-202): the small event table is broadcast
  (ray.put once, read in each actor's __init__) and each batch does a
  vectorized searchsorted interval stab — no shuffle.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
import ray
import ray.data

from ..util import once_per_worker, ts_to_us


def engineer_features_frame(
    df: pd.DataFrame,
    value_col: str,
    *,
    lags: Iterable[int] = (-2, -1, 1, 2),
    windows: Iterable[int] = (4, 12, 48),
    diffs: bool = True,
    ema_spans: Iterable[int] = (12,),
    ts_col: str = "ts",
    timestamp_features: bool = True,
) -> pd.DataFrame:
    """One ordered key frame -> frame + feature columns (reference
    naming: .+1/.-1 lag suffixes, feature_engineer.py lag stage;
    rolling median/std windows 4/12/48 are the L4.1 defaults,
    run_chain.py:124-127)."""
    s = df[value_col].astype(float)
    for lag in lags:
        df[f"{value_col}{'+' if lag > 0 else ''}{lag}"] = s.shift(-lag)
    for w in windows:
        r = s.rolling(window=w, min_periods=1)
        df[f"{value_col}_rmedian{w}"] = r.median()
        df[f"{value_col}_rmean{w}"] = r.mean()
        df[f"{value_col}_rstd{w}"] = r.std()
    if diffs:
        df[f"{value_col}_diff"] = s.diff()
    for span in ema_spans:
        df[f"{value_col}_ema{span}"] = s.ewm(span=span, adjust=False).mean()
    if timestamp_features:
        ts = pd.to_datetime(df[ts_col])
        df["YEAR"] = ts.dt.year.astype(np.int32)
        df["DOY"] = ts.dt.dayofyear.astype(np.int32)
        df["HOUR"] = ts.dt.hour.astype(np.int32)
    return df


def engineer_features(
    ds: ray.data.Dataset,
    *,
    value_col: str,
    keys: Iterable[str] = ("source",),
    ts_col: str = "ts",
    **kw,
) -> ray.data.Dataset:
    keys = list(keys)

    def gfn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(ts_col, kind="stable").reset_index(drop=True)
        return engineer_features_frame(df, value_col, ts_col=ts_col, **kw)

    from .exchange import grouped_block_map

    return grouped_block_map(ds, keys, gfn)


def event_to_flag(
    ds: ray.data.Dataset,
    events: pd.DataFrame,
    *,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    flag_col: str = "FLAG_EVENT",
) -> ray.data.Dataset:
    """0/1 flag for rows inside any [start, end] event interval
    (event.py:164-202). Intervals are merged + broadcast once; each
    batch stabs with one searchsorted (vectorized, no shuffle)."""
    iv = events[[start_col, end_col]].copy()
    iv[start_col] = pd.to_datetime(iv[start_col]).astype("datetime64[us]").astype("int64")
    iv[end_col] = pd.to_datetime(iv[end_col]).astype("datetime64[us]").astype("int64")
    iv = iv.sort_values(start_col)
    # merge overlaps so one searchsorted decides membership
    merged: list[list[int]] = []
    for s, e in iv.itertuples(index=False):
        if merged and s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    starts = np.array([m[0] for m in merged], dtype=np.int64)
    ends = np.array([m[1] for m in merged], dtype=np.int64)
    ref = ray.put((starts, ends))

    class Stab:
        def __init__(self):
            self.starts, self.ends = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            us = ts_to_us(df[ts_col])
            idx = np.searchsorted(self.starts, us, side="right") - 1
            inside = (idx >= 0) & (us <= self.ends[np.clip(idx, 0, None)])
            df = df.copy()
            df[flag_col] = inside.astype(np.int8)
            return df

    return ds.map_batches(once_per_worker(Stab), batch_format="pandas")


def sstats(
    ds: ray.data.Dataset,
    *,
    value_col: str,
    keys: Iterable[str] = (),
    quantiles: Iterable[float] = (0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99),
) -> pd.DataFrame:
    """Descriptive stats per key (diive/core/dfun/stats.py:12-510
    ``sstats`` family): count/mean/std/min/max + exact linear-
    interpolation quantiles, computed per co-located key block."""
    keys = list(keys) or ["_all"]

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        if "_all" in keys and "_all" not in df.columns:
            df = df.assign(_all=0)
        return df

    def gfn(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].astype(float)
        row = {k: df[k].iloc[0] for k in keys}
        row.update({
            "n": int(v.count()), "mean": v.mean(), "std": v.std(),
            "min": v.min(), "max": v.max(),
        })
        for q in quantiles:
            row[f"q{int(q * 100):02d}"] = v.quantile(q)
        return pd.DataFrame([row])

    from .exchange import grouped_block_map

    out = grouped_block_map(ds.map_batches(prep, batch_format="pandas"), keys, gfn).to_pandas()
    if "_all" in out.columns:
        out = out.drop(columns=["_all"])
    return out.reset_index(drop=True)


def bootstrap_stats(
    ds: ray.data.Dataset,
    *,
    value_col: str,
    keys: Iterable[str] = (),
    n_boot: int = 100,
    seed: int = 17,
    percentiles: Iterable[float] = (2.5, 50.0, 97.5),
) -> pd.DataFrame:
    """Bootstrap CI of the mean per key (UstarBootstrapThresholds
    pattern, ustar_bootstrap.py:156-280: joblib bootstrap draws -> here
    seeded per-group numpy resampling inside one grouped block stage).
    Deterministic given ``seed`` (Philox keyed by seed x group hash)."""
    keys = list(keys) or ["_all"]

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        if "_all" in keys and "_all" not in df.columns:
            df = df.assign(_all=0)
        return df

    def gfn(df: pd.DataFrame) -> pd.DataFrame:
        # sort: shuffle arrival order is nondeterministic, and seeded
        # index draws must address a deterministic arrangement
        v = np.sort(df[value_col].dropna().to_numpy(dtype=float))
        row = {k: df[k].iloc[0] for k in keys}
        if len(v) == 0:
            for p in percentiles:
                row[f"p{str(p).replace('.', '_')}"] = np.nan
            return pd.DataFrame([row])
        import zlib

        gh = zlib.crc32("|".join(sorted(str(row[k]) for k in keys)).encode())
        rng = np.random.Generator(np.random.Philox(key=[seed, gh]))
        means = np.empty(n_boot)
        for b in range(n_boot):
            means[b] = v[rng.integers(0, len(v), len(v))].mean()
        for p in percentiles:
            row[f"p{str(p).replace('.', '_')}"] = np.percentile(means, p)
        row["n"] = len(v)
        return pd.DataFrame([row])

    from .exchange import grouped_block_map

    out = grouped_block_map(ds.map_batches(prep, batch_format="pandas"), keys, gfn).to_pandas()
    if "_all" in out.columns:
        out = out.drop(columns=["_all"])
    return out.reset_index(drop=True)


def histogram(
    ds: ray.data.Dataset,
    *,
    value_col: str,
    bins: int = 20,
    v_range: tuple[float, float] | None = None,
) -> pd.DataFrame:
    """Equal-width histogram (diive/analysis Histogram): per-batch
    vectorized floor-binning partials summed on the driver. Bin rule:
    ``min(floor((v - lo) / (hi - lo) * bins), bins - 1)`` over
    [lo, hi] — deterministic and exactly reproducible in SQL (the
    np.histogram edge convention differs only in float edge rounding)."""
    from .exchange import driver_combine

    if v_range is None:
        lo, hi = ds.min(value_col), ds.max(value_col)
    else:
        lo, hi = v_range
    edges = np.linspace(lo, hi, bins + 1)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].astype(float).dropna().to_numpy()
        v = v[(v >= lo) & (v <= hi)]
        b = np.minimum(np.floor((v - lo) / (hi - lo) * bins), bins - 1).astype(np.int64)
        c = np.bincount(b, minlength=bins)
        return pd.DataFrame({"bin": np.arange(bins), "n": c})

    out = driver_combine(
        ds, partial, lambda df: df.groupby("bin", as_index=False)["n"].sum(),
        batch_format="pandas",
    )
    out["lo"] = edges[out["bin"]]
    out["hi"] = edges[out["bin"] + 1]
    return out.sort_values("bin").reset_index(drop=True)


def series_features(
    ds: ray.data.Dataset,
    *,
    value_col: str,
    ts_col: str,
    keys: Iterable[str] = (),
    order_cols: Iterable[str] = (),
    num_partitions: int | None = None,
) -> pd.DataFrame:
    """tsfresh-style per-series feature battery (reference
    diive/core/dfun/stats.py:77-190: series_sd_over_mean /
    coefficient_of_variation, interquartile_range,
    autocorrelation_lag1, series_skewness, series_kurtosis,
    mean_absolute_change, outlier_count) — the per-variable descriptors
    the reference feeds into screening and ML feature selection.

    Formulas (documented so the SQL oracle replays them exactly):
    sample SD (ddof=1), cv = sd / mean, iqr = q75 - q25 (linear
    interpolation), skewness = m3 / m2^1.5 and excess kurtosis =
    m4 / m2^2 - 3 from POPULATION central moments (centered two-pass —
    no raw-moment cancellation), ac1 = sum(z_t * z_{t+1}) / sum(z^2)
    over the non-null series in (ts, *order_cols) order, mac =
    mean(|x_t - x_{t-1}|), outliers3 = #{|x - mean| > 3 * sd}.

    One exchange on the keys; every feature is vectorized inside the
    group's block (the series-order features need the key's rows
    co-located — the same contract as every sequential per-key op
    here)."""
    keys = list(keys) or ["_all"]
    order = [ts_col] + list(order_cols)

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        if "_all" in keys and "_all" not in df.columns:
            df = df.assign(_all=0)
        return df

    def gfn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order, kind="stable")
        x = df[value_col].astype(float).to_numpy()
        x = x[~np.isnan(x)]
        row = {k: df[k].iloc[0] for k in keys}
        n = len(x)
        row["n"] = np.int64(n)
        if n == 0:
            for c in ("mean", "sd", "cv", "iqr", "skewness", "kurtosis",
                      "ac1", "mac"):
                row[c] = np.nan
            row["outliers3"] = np.int64(0)
            return pd.DataFrame([row])
        mu = x.mean()
        z = x - mu
        m2 = (z ** 2).mean()
        sd = x.std(ddof=1) if n > 1 else np.nan
        row["mean"] = mu
        row["sd"] = sd
        row["cv"] = sd / mu if mu != 0 else np.nan
        row["iqr"] = np.quantile(x, 0.75) - np.quantile(x, 0.25)
        row["skewness"] = (z ** 3).mean() / m2 ** 1.5 if m2 > 0 else np.nan
        row["kurtosis"] = (z ** 4).mean() / m2 ** 2 - 3.0 if m2 > 0 else np.nan
        row["ac1"] = (float((z[:-1] * z[1:]).sum() / (z ** 2).sum())
                      if n > 1 and m2 > 0 else np.nan)
        row["mac"] = float(np.abs(np.diff(x)).mean()) if n > 1 else np.nan
        row["outliers3"] = np.int64((np.abs(z) > 3 * sd).sum()) if n > 1 else np.int64(0)
        return pd.DataFrame([row])

    from .exchange import grouped_block_map

    return grouped_block_map(
        ds.map_batches(prep, batch_format="pandas"), keys, gfn,
        num_partitions=num_partitions).to_pandas()
