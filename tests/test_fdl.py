"""Flux detection limit (stages/fdl.py, reference
flux/hires/fluxdetectionlimit.py): planted-lag signal recovery, noise
RMSE vs a hand-rolled oracle, sonic->air temperature conversion, and a
detectability contrast (strong signal >> FDL, pure noise < FDL)."""

import numpy as np
import pandas as pd

from diive_ray.stages.fdl import (
    R_GAS,
    air_temp_from_sonic,
    flux_detection_limit_frame,
)


def _window(rng, n=6000, lag=4, amp=1.0):
    """One synthetic averaging window: w carries a smooth turbulent
    series; c = amp * roll(w, -lag) + independent noise, planted so the
    |cov| ladder (ref[i] paired with lagged[i+s], the reference's
    polars shift(-s) convention, lag.py:247) peaks at shift = -lag —
    the reference's default-lag lookup position
    (fluxdetectionlimit.py:285: shift == -default_lag)."""
    w_sig = np.convolve(rng.normal(size=n + 50), np.ones(25) / 25, mode="same")[:n]
    c = amp * np.roll(w_sig, -lag) + rng.normal(scale=0.2, size=n)
    return pd.DataFrame(
        {
            "u": 2.0 + rng.normal(scale=0.3, size=n),
            "v": 0.5 + rng.normal(scale=0.3, size=n),
            "w": w_sig + rng.normal(scale=0.05, size=n),
            "c": c,
            "t_sonic": 295.0 + rng.normal(scale=0.1, size=n),
            "h2o": np.full(n, 0.012),
            "press": np.full(n, 96000.0),
        }
    )


def test_air_temp_from_sonic():
    ts = np.array([300.0, 280.0])
    h2o = np.array([0.0, 0.02])
    ta = air_temp_from_sonic(ts, h2o)
    np.testing.assert_allclose(ta, [300.0, 280.0 / (1 + 0.32 * 0.02)])


def test_planted_lag_detected_with_high_snr():
    rng = np.random.Generator(np.random.Philox(key=31))
    df = _window(rng, lag=4, amp=2.0)
    out = flux_detection_limit_frame(
        df, default_lag=4, noise_range=5, lag_from=-30, lag_to=30
    )
    r = out.iloc[0]
    # planted peak at shift -4 == -default_lag: the default-lag signal
    # IS the peak signal
    assert r["cov_max_shift"] == -4
    assert r["flux_signal_at_default_lag"] == r["flux_signal_at_cov_max_lag"]
    # a strong planted flux must clear the detection limit comfortably
    assert r["signal_to_detection_limit"] > 5
    assert r["signal_to_noise"] == 3 * r["signal_to_detection_limit"]


def test_pure_noise_below_detection_limit():
    rng = np.random.Generator(np.random.Philox(key=32))
    n = 6000
    df = _window(rng, lag=0, amp=0.0)  # c is pure noise, independent of w
    out = flux_detection_limit_frame(
        df, default_lag=4, noise_range=5, lag_from=-30, lag_to=30
    )
    r = out.iloc[0]
    # no real flux: the default-lag "signal" is itself noise -> below FDL
    assert r["signal_to_detection_limit"] < 1.0


def test_noise_rmse_matches_hand_oracle():
    """RMSE re-derived by hand from the ladder the stage itself built:
    LAN15 eq.9 over the two edge windows (ddof=1 std), flux conversion
    via mean Ta / mean dry-air pressure (SAB18 eq.16)."""
    from diive_ray.stages.lag import max_covariance_frame
    from diive_ray.stages.wind import wind_double_rotation_frame

    rng = np.random.Generator(np.random.Philox(key=33))
    df = _window(rng, lag=3)
    out = flux_detection_limit_frame(
        df, default_lag=3, noise_range=4, lag_from=-25, lag_to=25
    )

    rot = wind_double_rotation_frame(df, u="u", v="v", w="w")
    w2 = rot["w2"].to_numpy()
    primes = pd.DataFrame(
        {"wt": w2 - w2.mean(), "ct": df["c"].to_numpy() - df["c"].mean()}
    )
    lad = max_covariance_frame(
        primes, ref_col="wt", lagged_col="ct", winsize_from=-25, winsize_to=25
    )
    ta = df["t_sonic"].to_numpy() / (1 + 0.32 * df["h2o"].to_numpy())
    p_dry = df["press"].to_numpy() * (1 - df["h2o"].to_numpy())
    fcf = p_dry.mean() / (R_GAS * ta.mean())
    cf = lad["cov"].to_numpy() * fcf
    sh = lad["shift"].to_numpy()
    left = cf[(sh >= -25) & (sh <= -21)]
    right = cf[(sh >= 21) & (sh <= 25)]
    rmse = np.sqrt(
        0.5
        * (
            np.std(left, ddof=1) ** 2
            + left.mean() ** 2
            + np.std(right, ddof=1) ** 2
            + right.mean() ** 2
        )
    )
    np.testing.assert_allclose(out["flux_noise_rmse"].iloc[0], rmse, rtol=1e-12)
    np.testing.assert_allclose(
        out["flux_detection_limit"].iloc[0], 3 * rmse, rtol=1e-12
    )


def test_distributed_matches_frame(ray_session):
    """flux_detection_limit over 3 keyed windows == per-window frame calls."""
    import ray.data as rd

    from diive_ray.stages.fdl import flux_detection_limit

    rng = np.random.Generator(np.random.Philox(key=34))
    frames = []
    for i, lag in enumerate((2, 5, 8)):
        f = _window(rng, n=3000, lag=lag)
        f["site"] = f"s{i}"
        f["seq"] = np.arange(len(f))
        frames.append(f)
    big = pd.concat(frames, ignore_index=True)

    got = (
        flux_detection_limit(
            rd.from_pandas(big),
            segment_keys=["site"],
            order_cols=["seq"],
            default_lag=3,
            noise_range=5,
            lag_from=-20,
            lag_to=20,
        )
        .to_pandas()
        .sort_values("site")
        .reset_index(drop=True)
    )
    for i, f in enumerate(frames):
        want = flux_detection_limit_frame(
            f, default_lag=3, noise_range=5, lag_from=-20, lag_to=20
        ).iloc[0]
        row = got.iloc[i]
        assert row["site"] == f"s{i}"
        for col in want.index:
            np.testing.assert_allclose(row[col], want[col], rtol=1e-12)
