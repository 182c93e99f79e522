"""Small shared helpers."""

from __future__ import annotations

import numpy as np
import pandas as pd


def round6(x, decimals: int = 6) -> np.ndarray:
    """Round half AWAY FROM ZERO, matching DuckDB/ANSI-SQL ``ROUND``.

    ``np.round`` is half-to-even (banker's rounding): on values that land
    exactly on a rounding boundary (e.g. 68.4715625 -> 68.471562 vs
    DuckDB's 68.471563) it diverges from the oracle and flips the driver's
    value hash. Every float column a query returns must go through this.
    NaN propagates (sign(nan)=nan).
    """
    x = np.asarray(x, dtype=np.float64)
    factor = 10.0 ** decimals
    a = np.abs(x) * factor
    fl = np.floor(a)
    # frac >= 0.5 comparison (not floor(a + 0.5)) matches std::round /
    # DuckDB exactly, including a = k + nextafter(0.5, 0) where the
    # addition a + 0.5 would round up to k + 1.
    r = np.where(a - fl >= 0.5, fl + 1.0, fl)
    return np.sign(x) * r / factor


def stable_round6(x) -> np.ndarray:
    """round6 preceded by a 9-decimal round: collapses sub-5e-10
    engine-vs-oracle summation-order noise BEFORE the 6-decimal round so
    values landing exactly on a 6-decimal half-boundary (donor means of
    6-decimal inputs do) round identically on both sides. The oracle SQL
    must use ROUND(ROUND(x, 9), 6) wherever the engine uses this.

    ``+ 0.0`` normalizes -0.0 to +0.0: a mathematically-zero residual
    (e.g. v2 = -u*sin(theta) + v*cos(theta) of a single-sample window)
    computes as +-1e-17 with a sign that depends on summation order, so
    engine and oracle would disagree on the SIGN of zero — invisible to
    numeric compares but fatal to the driver's value hash. Any oracle
    whose SQL can emit -0.0 must normalize with ``+ 0.0`` as well
    (wind_rotation is the only one; audited over all oracles at
    sf0.01)."""
    return round6(round6(x, 9), 6) + 0.0


def once_per_worker(cls):
    """Adapt a callable CLASS whose ``__init__`` is only a cheap
    broadcast fetch (``ray.get`` of a plasma ref — zero-copy shared
    memory) into a stateless-task UDF: the instance is constructed
    lazily on first use and cached in the closure, which Ray's
    function manager deserializes ONCE per worker process and reuses
    across that operator's tasks — so ``map_batches`` schedules plain
    TASKS (no actor-pool spin-up, which dominated small-input stages:
    round-5 profile cut the minhash verify tier from 5.1 s to <1 s)
    while the setup still runs once per worker. Use ONLY for
    broadcast-fetch init; real per-worker setup cost (model builds,
    regex compilation) stays on actor pools where the once-per-actor
    guarantee is contractual, not a cache property."""
    holder = []

    def fn(batch):
        if not holder:
            holder.append(cls())
        return holder[0](batch)

    return fn


def ts_to_us(x) -> np.ndarray:
    """int64 microseconds-since-epoch from any datetime64 resolution.

    Different stages hand back different datetime64 units (Arrow
    timestamp[us] -> pandas may surface as datetime64[s]/[us]/[ns]
    depending on the conversion path); a bare ``astype(int64)`` silently
    yields unit-dependent integers, so always normalize first.
    """
    if isinstance(x, pd.Series):
        x = x.to_numpy()
    x = np.asarray(x)
    if not np.issubdtype(x.dtype, np.datetime64):
        return x.astype(np.int64)
    return x.astype("datetime64[us]").astype(np.int64)
