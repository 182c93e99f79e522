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
) -> rd.Dataset:
    """Distributed double rotation: ``keys`` identifies one averaging
    window (e.g. [site, bucket_ts]); one hash exchange, then ONE
    vectorized pass per block — window means via groupby().transform
    (Cython), angles and rotation applied to the whole block at once
    (no per-group Python)."""
    from .exchange import block_map

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return wind_double_rotation_frame(df, u=u, v=v, w=w)
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
