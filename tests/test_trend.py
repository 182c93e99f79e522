"""Trend-analysis stage pins: Mann-Kendall/Sen planted-trend recovery
and tie handling, Lomb-Scargle planted-period peak + partitioning
invariance, pairwise-complete ACF on a gappy diurnal grid."""

import numpy as np
import pandas as pd
import pytest


# ----------------------------------------------------------- Mann-Kendall


def test_mk_planted_monotone_trend():
    from diive_ray.stages.trend import mann_kendall_sen

    rng = np.random.Generator(np.random.Philox(key=[101, 2026]))
    t = np.arange(60, dtype=np.int64)
    y = 2.0 + 0.5 * t + rng.normal(0, 1.0, 60)
    r = mann_kendall_sen(y, t)
    assert r["z"] > 3.0                      # decisively increasing
    assert r["tau"] > 0.8
    assert abs(r["sen_slope"] - 0.5) < 0.05  # slope recovered
    rd_ = mann_kendall_sen(y[::-1].copy(), t)
    assert rd_["s"] == -r["s"]               # antisymmetric under reversal


def test_mk_no_trend_and_ties():
    from diive_ray.stages.trend import mann_kendall_sen

    # constant series: all pairs tied -> S=0, var collapses to 0, z=0
    t = np.arange(10, dtype=np.int64)
    r = mann_kendall_sen(np.full(10, 3.0), t)
    assert r["s"] == 0 and r["z"] == 0.0 and r["var_s"] == 0.0
    # alternating series: no monotone trend
    y = np.tile([1.0, 2.0], 30)
    r2 = mann_kendall_sen(y, np.arange(60, dtype=np.int64))
    assert abs(r2["tau"]) < 0.1


def test_mk_tie_correction_matches_literature():
    from diive_ray.stages.trend import mann_kendall_sen

    # n=5 with one tie group of size 2: var = (5*4*15 - 2*1*9)/18 = 282/18
    y = np.array([1.0, 2.0, 2.0, 3.0, 4.0])
    r = mann_kendall_sen(y, np.arange(5, dtype=np.int64))
    assert r["var_s"] == pytest.approx((5 * 4 * 15 - 2 * 1 * 9) / 18.0)
    # S: 9 increasing pairs, 1 tied of 10 total
    assert r["s"] == 9


# ---------------------------------------------------------- Lomb-Scargle


def _uneven_sine_ds(n=4000, period_s=86_400, seed=11):
    import ray.data as rd

    rng = np.random.Generator(np.random.Philox(key=[seed, 2026]))
    # uneven sampling with gaps: cumulative exponential steps + a big hole
    steps = rng.exponential(600.0, n).astype(np.int64) + 1
    us = np.cumsum(steps) * 1_000_000
    us = us[(us < 20 * 86_400_000_000) | (us > 25 * 86_400_000_000)]
    ts = pd.to_datetime(us, unit="us")
    y = 3.0 + 2.0 * np.sin(2 * np.pi * (us / 1e6) / period_s) + rng.normal(0, 0.3, len(us))
    return rd.from_pandas(pd.DataFrame({"k": "a", "ts": ts, "value": y}))


def test_lomb_scargle_planted_period_peak():
    from diive_ray.stages.trend import lomb_scargle_power

    ds = _uneven_sine_ds(period_s=86_400)
    out = lomb_scargle_power(
        ds, keys=["k"], periods_s=[21_600, 43_200, 86_400, 172_800]
    )
    p = out.set_index("period_s")["power"]
    assert p.idxmax() == 86_400              # peak at the planted period
    assert p[86_400] > 5 * max(p[21_600], p[43_200], p[172_800])


def test_lomb_scargle_partitioning_invariant():
    from diive_ray.stages.trend import lomb_scargle_power

    ds = _uneven_sine_ds(n=2000, period_s=43_200, seed=17)
    a = lomb_scargle_power(ds.repartition(2), keys=["k"], periods_s=[43_200, 86_400])
    b = lomb_scargle_power(ds.repartition(13), keys=["k"], periods_s=[43_200, 86_400])
    np.testing.assert_allclose(
        a["power"].to_numpy(), b["power"].to_numpy(), rtol=0, atol=1e-8
    )
    assert (a["n"].to_numpy() == b["n"].to_numpy()).all()


# ------------------------------------------------------------------- ACF


def test_acf_diurnal_with_holes():
    from diive_ray.stages.trend import acf_lags_frame

    # hourly diurnal series over 20 days with a 30% random hole pattern
    rng = np.random.Generator(np.random.Philox(key=[131, 2026]))
    hrs = np.arange(480)
    keep = rng.random(480) > 0.3
    ts = pd.Timestamp("2024-03-01") + pd.to_timedelta(hrs[keep], unit="h")
    m = np.sin(2 * np.pi * hrs[keep] / 24.0)
    df = pd.DataFrame({"event_type": "x", "bucket_ts": ts, "m": m})
    out = acf_lags_frame(df, lags=[1, 12, 24])
    by = out.set_index("lag")
    assert by.loc[24, "acf"] > 0.99          # period-aligned lag: ~1
    assert by.loc[12, "acf"] < -0.99         # antiphase lag: ~-1
    assert 0 < by.loc[1, "acf"] < 1
    # pairwise-complete: pair counts reflect the holes, not the grid
    assert by.loc[24, "n_pairs"] < keep.sum()


def test_acf_short_series_guard():
    from diive_ray.stages.trend import acf_lags_frame

    df = pd.DataFrame({
        "event_type": ["x", "x"],
        "bucket_ts": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 05:00"]),
        "m": [1.0, 2.0],
    })
    out = acf_lags_frame(df, lags=[1])       # no lag-1h pair exists
    assert out["n_pairs"].iloc[0] == 0 and np.isnan(out["acf"].iloc[0])


# -------------------------------------------------------------- Pettitt


def test_pettitt_planted_step_change():
    from diive_ray.stages.trend import pettitt_test

    rng = np.random.Generator(np.random.Philox(key=[303, 2026]))
    y = np.concatenate([rng.normal(0, 1, 50), rng.normal(4, 1, 50)])
    r = pettitt_test(y)
    assert abs(r["t_change"] - 50) <= 2      # change point recovered
    assert r["p_approx"] < 1e-6              # decisively significant
    # shift-invariance of the rank statistic
    r2 = pettitt_test(y + 100.0)
    assert r2["k_stat"] == r["k_stat"] and r2["t_change"] == r["t_change"]


def test_pettitt_analytic_tiny_series():
    from diive_ray.stages.trend import pettitt_test

    # y = [1, 2, 10, 11]: U_1 = 3, U_2 = 3 + 3 = ... hand-derived below
    y = np.array([1.0, 2.0, 10.0, 11.0])
    # V_k = sum_j sign(y_j - y_k): V_1=3, V_2=1, V_3=-1, V_4=-3
    # U = cumsum(V)[:3] = [3, 4, 3]; K=4 at t=2 (1-based)
    r = pettitt_test(y)
    assert r["k_stat"] == 4 and r["t_change"] == 2 and r["u_at_change"] == 4
    n = 4
    assert r["p_approx"] == pytest.approx(2 * np.exp(-6 * 16 / (n**3 + n**2)))


def test_pettitt_constant_and_tie_break():
    from diive_ray.stages.trend import pettitt_test

    r = pettitt_test(np.full(20, 5.0))
    assert r["k_stat"] == 0 and r["p_approx"] == 1.0
    # symmetric two-level series: |U| plateaus; FIRST t wins the tie
    y = np.array([0.0, 0.0, 1.0, 1.0])
    # V = [2, 2, -2, -2]; U = [2, 4, 2]; max at t=2 uniquely here
    assert pettitt_test(y)["t_change"] == 2


def test_pettitt_frame_change_day_mapping():
    from diive_ray.stages.trend import pettitt_frame

    days = pd.date_range("2024-01-01", periods=30, freq="D")
    rng = np.random.Generator(np.random.Philox(key=[304, 2026]))
    m = np.concatenate([rng.normal(0, 0.1, 12), rng.normal(3, 0.1, 18)])
    df = pd.DataFrame({"event_type": "a", "bucket_ts": days, "m": m})
    out = pettitt_frame(df)
    assert len(out) == 1
    # change day = LAST day of the pre-change segment (12th day)
    assert out["change_day"].iloc[0] == days[11]
