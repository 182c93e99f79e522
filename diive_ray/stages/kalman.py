"""Kalman filter + RTS smoother for the local-level model (Durbin &
Koopman 2012 ch. 2; Kalman 1960; Rauch, Tung & Striebel 1965).

Reference parity: a state-space smoother complements the engine's
gap-fill family (linear interpolation, rolling median, MDS, trees) —
the local-level model y_t = mu_t + eps, mu_t = mu_{t-1} + eta is the
canonical "smooth a noisy level" tool, handles NaN observations
natively (the prediction step just runs without an update), and emits
per-point state variance (uncertainty the interpolators can't give).

Parameters: the signal-to-noise ratio q = var(eta)/var(eps) and
var(eps) estimated robustly from first differences — for the local
level model var(diff y) = 2 var(eps) + var(eta), and lag-1
autocovariance of diff y = -var(eps): both moment equations are
decomposable sums, so the fit needs no likelihood iteration and stays
deterministic.

Sequential by definition — runs per bounded tier series inside its
block (the engine's per-series partitioning contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def local_level_params(y: np.ndarray) -> tuple[float, float]:
    """Moment estimates (var_eps, var_eta) from first differences:
    cov(d_t, d_{t-1}) = -var_eps, var(d) = 2 var_eps + var_eta;
    clipped at tiny positives to keep the filter proper."""
    d = np.diff(y[~np.isnan(y)])
    if len(d) < 3:
        return 1.0, 1.0
    d0 = d - d.mean()
    var_d = float((d0 * d0).mean())
    acov1 = float((d0[1:] * d0[:-1]).mean())
    var_eps = max(-acov1, 1e-12)
    var_eta = max(var_d - 2.0 * var_eps, 1e-12)
    return var_eps, var_eta


def kalman_local_level(
    y: np.ndarray,
    *,
    var_eps: float | None = None,
    var_eta: float | None = None,
) -> pd.DataFrame:
    """Filter + RTS smooth one series (NaNs = missing observations).
    Returns columns: level_filt, var_filt, level_smooth, var_smooth.
    Steady-state gain matches the closed form K = (-q+sqrt(q^2+4q))/2
    (pinned in tests)."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if var_eps is None or var_eta is None:
        ve, vn = local_level_params(y)
        var_eps = ve if var_eps is None else var_eps
        var_eta = vn if var_eta is None else var_eta
    # init: diffuse-ish prior at the first observation
    first = np.flatnonzero(~np.isnan(y))
    a = y[first[0]] if len(first) else 0.0
    p = var_eps * 1e6
    af = np.empty(n); pf = np.empty(n)          # filtered
    ap = np.empty(n); pp = np.empty(n)          # one-step predictions
    for t in range(n):
        ap[t], pp[t] = a, p + var_eta            # predict
        if np.isnan(y[t]):
            a, p = ap[t], pp[t]
        else:
            f = pp[t] + var_eps
            k = pp[t] / f
            a = ap[t] + k * (y[t] - ap[t])
            p = pp[t] * (1.0 - k)
        af[t], pf[t] = a, p
    asm = np.empty(n); psm = np.empty(n)         # RTS backward pass
    asm[-1], psm[-1] = af[-1], pf[-1]
    for t in range(n - 2, -1, -1):
        c = pf[t] / pp[t + 1]
        asm[t] = af[t] + c * (asm[t + 1] - ap[t + 1])
        psm[t] = pf[t] + c * c * (psm[t + 1] - pp[t + 1])
    return pd.DataFrame({
        "level_filt": af, "var_filt": pf,
        "level_smooth": asm, "var_smooth": psm,
    })


def kalman_smooth(
    ds,
    *,
    keys: list[str],
    order_by: list[str],
    value_col: str,
    num_partitions: int | None = None,
):
    """Distributed local-level smoothing: ONE keyed exchange, one
    sequential pass per bounded series in its block."""
    from .exchange import grouped_block_map

    def gfn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_by, kind="stable", ignore_index=True)
        out = kalman_local_level(g[value_col].to_numpy(dtype=np.float64))
        return pd.concat([g, out], axis=1)

    return grouped_block_map(ds, keys, gfn, num_partitions=num_partitions)
