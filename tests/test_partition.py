"""Nighttime partitioning (Reichstein MR / REddyProc): planted
Lloyd-Taylor parameter recovery, GPP identity, abort path, solar
geometry sanity, profiled-fit correctness."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from diive_ray.stages import partition as pt


def _make_series(n_days=40, per_day=48, e0=185.0, seed=3):
    rng = np.random.Generator(np.random.Philox(key=seed))
    n = n_days * per_day
    ts = pd.date_range("2023-03-01", periods=n, freq="30min")
    hour = (ts.hour + ts.minute / 60.0).to_numpy()
    doy = ts.dayofyear.to_numpy(dtype=float)
    ta = 8.0 + 7.0 * np.sin(2 * np.pi * (hour - 9.0) / 24.0) \
        + 3.0 * rng.normal(size=n)
    rref = 2.0 + 0.8 * np.sin(2 * np.pi * np.arange(n) / (per_day * 20))
    resp = pt.lloyd_taylor(ta + 273.15, rref, e0)
    day = (hour >= 7) & (hour <= 17)
    nee = resp - np.where(day, 6.0, 0.0) + 0.2 * rng.normal(size=n)
    sw_in = np.where(day, 400.0, 0.0)
    return ts, hour, doy, ta, nee, sw_in, rref


def test_profiled_fit_recovers_planted_params():
    rng = np.random.Generator(np.random.Philox(key=4))
    ta_k = 273.15 + rng.uniform(-5, 25, 500)
    b = (1.0 / (pt.TREF_K - pt.T0_K)) - (1.0 / (ta_k - pt.T0_K))
    y = 2.5 * np.exp(170.0 * b) + 0.05 * rng.normal(size=500)
    rref, e0, e0_sd, _ = pt._profiled_fit(y, b)
    assert rref == pytest.approx(2.5, abs=0.05)
    assert e0 == pytest.approx(170.0, abs=3.0)
    assert 0 < e0_sd < 20


def test_potential_radiation_daynight():
    doy = np.full(24, 172.0)  # summer solstice, mid-latitude
    hour = np.arange(24, dtype=float)
    pr = pt.potential_radiation(doy, hour, lat=47.0, lon=8.0, utc_offset=1.0)
    assert pr[12] > 800.0          # noon: strong
    assert pr[0] == 0.0 and pr[23] == 0.0  # night: zero
    assert (pr >= 0).all()


def test_partition_series_recovery():
    ts, hour, doy, ta, nee, sw_in, rref_true = _make_series()
    us = ts.astype("int64").to_numpy() // 1000
    day_counter = (us - us[0]) // 86_400_000_000 + 1
    res = pt.partition_series(nee, ta, sw_in, nee, ta, doy, hour, day_counter,
                              lat=47.0, lon=8.0, utc_offset=1.0)
    e0 = res["E0_NT"][0]
    assert np.isfinite(e0) and abs(e0 - 185.0) < 15.0
    # Rref tracks the slowly varying truth
    m = np.isfinite(res["RREF_NT"])
    assert np.corrcoef(res["RREF_NT"][m], rref_true[m])[0, 1] > 0.8
    # GPP identity and daytime positivity
    np.testing.assert_allclose(res["GPP_NT"], res["RECO_NT"] - nee, equal_nan=True)
    day = (hour >= 7) & (hour <= 17)
    assert np.nanmean(res["GPP_NT"][day]) > 3.0
    # night GPP should hover near zero (NEE ~ RECO at night)
    assert abs(np.nanmean(res["GPP_NT"][~day])) < 0.5


def test_partition_aborts_on_short_record():
    ts, hour, doy, ta, nee, sw_in, _ = _make_series(n_days=6)
    us = ts.astype("int64").to_numpy() // 1000
    day_counter = (us - us[0]) // 86_400_000_000 + 1
    res = pt.partition_series(nee, ta, sw_in, nee, ta, doy, hour, day_counter,
                              lat=47.0, lon=8.0, utc_offset=1.0)
    assert np.isnan(res["RECO_NT"]).all()
    assert np.isnan(res["E0_NT"]).all()


def test_partition_distributed_matches_series(ray_session):
    ts, hour, doy, ta, nee, sw_in, _ = _make_series(n_days=30, seed=8)
    df = pd.DataFrame({
        "site": "a", "rid": np.arange(len(ts)), "ts": ts,
        "nee": nee, "ta": ta, "sw_in": sw_in,
    })
    got = pt.partition_distributed(
        rd.from_pandas(df).repartition(4),
        key_col="site", id_col="rid",
    ).to_pandas().sort_values("rid").reset_index(drop=True)

    us = ts.astype("int64").to_numpy() // 1000
    day_counter = (us - us[0]) // 86_400_000_000 + 1
    exp = pt.partition_series(nee, ta, sw_in, nee, ta, doy, hour, day_counter,
                              lat=47.0, lon=8.0, utc_offset=1.0)
    np.testing.assert_allclose(got["reco"].to_numpy(), exp["RECO_NT"],
                               rtol=0, atol=1e-10, equal_nan=True)
    np.testing.assert_allclose(got["gpp"].to_numpy(), exp["GPP_NT"],
                               rtol=0, atol=1e-10, equal_nan=True)
    np.testing.assert_array_equal(got["is_night"].to_numpy(),
                                  np.isfinite(exp["NEE_NIGHT"]))


def test_lrc_fit_recovers_planted_params():
    """Daytime LRC profiled fit recovers planted (alpha, beta, k, rref)
    on a realistic daytime sample."""
    rng = np.random.Generator(np.random.Philox(key=17))
    n = 2000
    hour = rng.uniform(7, 17, n)
    rg = 900.0 * np.sin(np.pi * (hour - 7.0) / 10.0) * rng.uniform(0.5, 1.0, n)
    vpd = rng.uniform(2, 30, n)
    ta = 12.0 + 8.0 * np.sin(2 * np.pi * (hour - 9.0) / 24.0) + rng.normal(0, 2, n)
    lt1 = pt.lloyd_taylor(ta + 273.15, 1.0, 170.0)
    truth = dict(alpha=0.05, beta=22.0, k=0.15, rref=2.2)
    nep = pt.predict_nep(rg, vpd, lt1, **truth) + 0.3 * rng.normal(size=n)
    res = pt.fit_lrc_window(nep, rg, vpd, ta, e0=170.0)
    assert res is not None
    assert res["alpha"] == pytest.approx(truth["alpha"], rel=0.3)
    assert res["beta"] == pytest.approx(truth["beta"], rel=0.2)
    assert res["k"] == pytest.approx(truth["k"], abs=0.06)
    assert res["rref"] == pytest.approx(truth["rref"], rel=0.2)


def test_lrc_fit_too_small_returns_none():
    x = np.ones(5)
    assert pt.fit_lrc_window(x, x, x, x, e0=170.0) is None
