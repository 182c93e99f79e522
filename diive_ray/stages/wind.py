"""Wind double rotation — sonic anemometer tilt correction.

Reference: diive/flux/hires/windrotation.py (WindDoubleRotation,
Wilczak et al. 2001 double rotation): per averaging window, the yaw
angle theta = atan2(mean v, mean u) aligns the x-axis with the mean
wind, then the pitch angle phi = atan2(mean w, mean u1) zeroes the mean
vertical wind; the angles are computed from WINDOW MEANS but applied
SAMPLE-WISE to every high-resolution record of the window.

Ray shape: one keyed exchange on (key, window bucket) co-locates each
averaging window, then the rotation is vectorized per group — the same
aggregate-then-broadcast-within-block pattern as the rest of the engine
(no second shuffle; the window means never leave the block).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .exchange import grouped_block_map


def wind_double_rotation_frame(
    df: pd.DataFrame, u: str = "u", v: str = "v", w: str = "w"
) -> pd.DataFrame:
    """Rotate ONE averaging window (all rows of the frame share the
    window): appends u2/v2/w2 (+ the window's theta/phi, constant per
    frame). NaN samples are skipped by the means and pass through as
    NaN rotated components (windrotation.py:124-171 semantics)."""
    um, vm, wm = df[u].mean(), df[v].mean(), df[w].mean()
    theta = np.arctan2(vm, um)
    u1m = um * np.cos(theta) + vm * np.sin(theta)
    phi = np.arctan2(wm, u1m)
    u1 = df[u] * np.cos(theta) + df[v] * np.sin(theta)
    v1 = -df[u] * np.sin(theta) + df[v] * np.cos(theta)
    w1 = df[w]
    out = df.copy()
    out["u2"] = u1 * np.cos(phi) + w1 * np.sin(phi)
    out["v2"] = v1
    out["w2"] = -u1 * np.sin(phi) + w1 * np.cos(phi)
    out["theta"] = theta
    out["phi"] = phi
    return out


def wind_double_rotation(
    ds: rd.Dataset,
    *,
    keys: list[str],
    u: str = "u",
    v: str = "v",
    w: str = "w",
    num_partitions: int | None = None,
    order_by: list[str] | None = None,
) -> rd.Dataset:
    """Distributed double rotation: ``keys`` identifies one averaging
    window (e.g. [site, bucket_ts]); one hash exchange, then ONE
    vectorized pass per block — window means via groupby().transform
    (Cython), angles and rotation applied to the whole block at once
    (no per-group Python).

    ``order_by``: optional columns imposing a canonical row order inside
    each block BEFORE the window means are accumulated. Intra-block row
    order depends on block arrival, and a float mean is
    accumulation-order-sensitive at the ULP level — enough to flip a
    round-6 half-boundary between runs with different partitioning.
    Pass the natural record id to make results partitioning-invariant
    bit-for-bit."""
    from .exchange import block_map

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return wind_double_rotation_frame(df, u=u, v=v, w=w)
        if order_by:
            df = df.sort_values(keys + order_by, kind="stable", ignore_index=True)
        g = df.groupby(keys, sort=False)
        um = g[u].transform("mean").to_numpy()
        vm = g[v].transform("mean").to_numpy()
        wm = g[w].transform("mean").to_numpy()
        theta = np.arctan2(vm, um)
        u1m = um * np.cos(theta) + vm * np.sin(theta)
        phi = np.arctan2(wm, u1m)
        u1 = df[u].to_numpy() * np.cos(theta) + df[v].to_numpy() * np.sin(theta)
        v1 = -df[u].to_numpy() * np.sin(theta) + df[v].to_numpy() * np.cos(theta)
        w1 = df[w].to_numpy()
        return df.assign(
            u2=u1 * np.cos(phi) + w1 * np.sin(phi),
            v2=v1,
            w2=-u1 * np.sin(phi) + w1 * np.cos(phi),
            theta=theta,
            phi=phi,
        )

    return block_map(
        ds, keys, fn, batch_format="pandas", num_partitions=num_partitions, zero_copy_batch=False
    )


def winddir_agg_kanda(angles: pd.Series, agg: str = "mean") -> float:
    """Circular wind-direction aggregation (reference
    core/funcs/funcs.py:85-118, winddirection_agg_kanda): aggregate the
    sine and cosine components separately (mean / median / P25 / P75),
    recombine via atan2, wrap negatives to [0, 360). Expression order
    matches the reference exactly (a / 180 * pi, 180 / pi * atan2) so
    SQL oracles can replay it bit-for-bit."""
    ph = angles / 180 * np.pi
    ds_, dc = np.sin(ph), np.cos(ph)
    if agg == "mean":
        wd0 = 180 / np.pi * np.arctan2(ds_.mean(), dc.mean())
    elif agg == "median":
        wd0 = 180 / np.pi * np.arctan2(ds_.median(), dc.median())
    elif agg == "P25":
        wd0 = 180 / np.pi * np.arctan2(ds_.quantile(0.25), dc.quantile(0.25))
    elif agg == "P75":
        wd0 = 180 / np.pi * np.arctan2(ds_.quantile(0.75), dc.quantile(0.75))
    else:
        raise ValueError(f"unknown agg {agg!r}")
    if wd0 < 0:
        wd0 += 360
    return float(wd0)


def winddir_aggregate(
    ds: rd.Dataset,
    keys: list[str],
    *,
    angle_col: str = "winddir",
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Per-key circular direction summary (mean/median/P25/P75 + n):
    ONE exchange on the keys, then each group reduces vectorized inside
    its block. Mean alone would decompose into (sum sin, sum cos)
    partials with no full exchange; the quantile aggs need the group's
    full component distributions, so the grouped form is the honest
    shape for all four at once.

    Hot-key bound (VERDICT r3 #4 audit): one block must hold a key's
    full angle set. That is safe when the key includes a time bucket
    (bounded rows/key) but NOT for a bare low-cardinality key over raw
    records at corpus scale. The de-skewed alternative for that case:
    decompose the mean into (sum sin, sum cos) streaming partials and
    compute the component quantiles with
    ``stratified.keyed_quantile_cont`` (exact, bounded driver memory)
    — at the cost of the canonical in-block summation order that keeps
    the mean bit-stable across partitionings (why this grouped form
    remains the default for driver-hash-compared outputs)."""
    from .exchange import grouped_block_map

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        a = df[angle_col].dropna()
        row = {k: df[k].iloc[0] for k in keys}
        row["n"] = np.int64(len(a))
        row["wd_mean"] = winddir_agg_kanda(a, "mean")
        row["wd_median"] = winddir_agg_kanda(a, "median")
        row["wd_p25"] = winddir_agg_kanda(a, "P25")
        row["wd_p75"] = winddir_agg_kanda(a, "P75")
        return pd.DataFrame([row])

    return grouped_block_map(ds, keys, fn, num_partitions=num_partitions)
