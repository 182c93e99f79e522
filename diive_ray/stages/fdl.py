"""Flux detection limit — Langford et al. (2015) measurement
sensitivity assessment (reference diive/flux/hires/fluxdetectionlimit.py
:62-443 ``FluxDetectionLimit``; noise RMSE per Striednig et al. 2020
innFLUX, flux conversion per Sabbatini et al. 2018 eq. 16).

Per averaging window (one half-hour raw file in the reference; one
segment key group here):

1. e = h2o * press (Pa); pd = press - e (fluxdetectionlimit.py:242-253);
2. air temperature from sonic temperature, Ta = Ts / (1 + 0.32 * h2o)
   (variables/thermodynamic.py:134-170, innFLUX step1.m:329);
3. double wind rotation -> w2, then Reynolds decomposition w' and c'
   (fluxdetectionlimit.py:337-346);
4. full cross-covariance ladder of (w', c') over the lag range
   (stages/lag.py:max_covariance_frame — the MaxCovariance port);
5. cov_flux = cov / (R * mean(Ta) / mean(pd))
   (fluxdetectionlimit.py:382-406, R = 8.31446261815324);
6. noise RMSE from the two edge windows of the ladder,
   rmse = sqrt(0.5 * (std_l^2 + mean_l^2 + std_r^2 + mean_r^2))
   (fluxdetectionlimit.py:408-443, LAN15 eq. 9 / innFLUX step1.m:435;
   sample std, ddof=1);
7. flux_detection_limit = 3 * rmse; signal at the default lag and at
   the max-|cov| lag; signal_to_noise and signal_to_detection_limit
   ratios (fluxdetectionlimit.py:279-302).

Distributed shape: windows are the parallelism axis — ONE hash
exchange on the segment keys, then each window's ladder + statistics
are computed vectorized inside its block (the ladder is a small
constant per window; nothing about a window ever leaves its block).
At 100 TB of 20 Hz raw data that is millions of half-hour windows
fanned out over the cluster with zero further shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .exchange import grouped_block_map
from .lag import max_covariance_frame
from .wind import wind_double_rotation_frame

R_GAS = 8.31446261815324  # universal gas constant, m3 Pa K-1 mol-1


def air_temp_from_sonic(sonic_temp: np.ndarray, h2o: np.ndarray) -> np.ndarray:
    """Air temperature (K) from sonic temperature (K) and H2O mole
    fraction (mol mol-1): Ta = Ts / (1 + 0.32 * h2o)
    (reference variables/thermodynamic.py:134-170, innFLUX)."""
    return np.asarray(sonic_temp, dtype=np.float64) / (
        1.0 + 0.32 * np.asarray(h2o, dtype=np.float64)
    )


def flux_detection_limit_frame(
    df: pd.DataFrame,
    *,
    u_col: str = "u",
    v_col: str = "v",
    w_col: str = "w",
    c_col: str = "c",
    ts_col: str = "t_sonic",
    h2o_col: str = "h2o",
    press_col: str = "press",
    default_lag: int = 3,
    noise_range: int = 5,
    lag_from: int = -20,
    lag_to: int = 20,
    lag_stepsize: int = 1,
) -> pd.DataFrame:
    """FDL for ONE averaging window (rows already ordered by the
    caller). All lag parameters are in RECORDS (the reference takes
    seconds x sampling_rate and converts at __init__,
    fluxdetectionlimit.py:237-240 — callers with Hz data multiply).

    Returns a single-row frame: (flux_noise_rmse, flux_detection_limit,
    cov_max_shift, flux_signal_at_default_lag, flux_signal_at_cov_max_lag,
    signal_to_noise, signal_to_detection_limit).
    """
    h2o = df[h2o_col].to_numpy(dtype=np.float64)
    press = df[press_col].to_numpy(dtype=np.float64)
    e = h2o * press
    p_dry = press - e
    ta = air_temp_from_sonic(df[ts_col].to_numpy(dtype=np.float64), h2o)

    rot = wind_double_rotation_frame(df, u=u_col, v=v_col, w=w_col)
    w2 = rot["w2"].to_numpy(dtype=np.float64)
    c = df[c_col].to_numpy(dtype=np.float64)
    primes = pd.DataFrame(
        {"w_turb": w2 - np.nanmean(w2), "c_turb": c - np.nanmean(c)}
    )

    cov_df = max_covariance_frame(
        primes,
        ref_col="w_turb",
        lagged_col="c_turb",
        winsize_from=lag_from,
        winsize_to=lag_to,
        shift_stepsize=lag_stepsize,
    )

    # SAB18 eq.(16): cov -> flux units via the dry-air molar density
    fcf = 1.0 / ((R_GAS * float(np.nanmean(ta))) / float(np.nanmean(p_dry)))
    cov_df["cov_flux"] = cov_df["cov"] * fcf

    # LAN15 eq.(9) noise windows at the ladder edges
    # (fluxdetectionlimit.py:425-428: right window uses abs(lag_to))
    sh = cov_df["shift"].to_numpy()
    left = cov_df.loc[(sh >= lag_from) & (sh <= lag_from + noise_range), "cov_flux"]
    right = cov_df.loc[
        (sh >= abs(lag_to) - noise_range) & (sh <= abs(lag_to)), "cov_flux"
    ]
    rmse = float(
        np.sqrt(
            0.5
            * (
                left.std() ** 2
                + left.mean() ** 2
                + right.std() ** 2
                + right.mean() ** 2
            )
        )
    )
    fdl = 3.0 * rmse

    # signal at the default lag (fluxdetectionlimit.py:285: shift ==
    # -default_lag * sampling_rate; record-based here)
    at_default = cov_df.loc[cov_df["shift"] == -default_lag, "cov_flux"]
    flux = float(at_default.iloc[0]) if len(at_default) else float("nan")

    # signal at the max-|cov| lag: first flagged ladder row
    # (fluxdetectionlimit.py:373-378: foundlag.index[0])
    peak = cov_df.loc[cov_df["flag_peak_max_cov_abs"]]
    if len(peak):
        cov_max_shift = int(peak.iloc[0]["shift"])
        maxcovflux = float(peak.iloc[0]["cov_flux"])
    else:
        cov_max_shift, maxcovflux = 0, float("nan")

    return pd.DataFrame(
        [
            {
                "flux_noise_rmse": rmse,
                "flux_detection_limit": fdl,
                "cov_max_shift": cov_max_shift,
                "flux_signal_at_default_lag": flux,
                "flux_signal_at_cov_max_lag": maxcovflux,
                "signal_to_noise": abs(flux) / rmse if flux else float("nan"),
                "signal_to_detection_limit": abs(flux) / fdl if flux else float("nan"),
            }
        ]
    )


def flux_detection_limit(
    ds: rd.Dataset,
    *,
    segment_keys: list[str],
    order_cols: list[str],
    num_partitions: int | None = None,
    **frame_kwargs,
) -> rd.Dataset:
    """Distributed FDL: one exchange on the segment keys (= averaging
    windows), then one vectorized single-pass per window. Returns one
    row per window."""

    def gfn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="stable")
        out = flux_detection_limit_frame(g, **frame_kwargs)
        for k in reversed(segment_keys):
            out.insert(0, k, g[k].iloc[0])
        return out

    return grouped_block_map(ds, segment_keys, gfn, num_partitions=num_partitions)
