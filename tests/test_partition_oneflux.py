"""ONEFlux nighttime partitioning (stages/partition_oneflux.py):
helper parity vs verbatim reference replicas (pct rank rule, Linacre
sunrise/sunset), planted-parameter recovery through the distributed
path, and the leave-year-unpartitioned gate."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from diive_ray.stages.partition_oneflux import (
    fit_lloyd_taylor_trimmed,
    lloyd_taylor_c,
    partition_nighttime_oneflux,
    pct_oneflux,
    sunrise_sunset,
)


def _ref_pct(array, percent):
    nonnan = array[~np.isnan(array)]
    n = nonnan.size
    critical_rank = n * percent / 100.0
    if n <= critical_rank:
        return float(np.max(nonnan))
    s = np.sort(nonnan)
    k = int(np.floor(critical_rank)) + 1
    val_k = s[k - 1]
    if float(critical_rank).is_integer() and (k - 1) >= 1:
        return float((val_k + s[k - 2]) / 2.0)
    return float(val_k)


def test_pct_matches_reference_rank_rule():
    rng = np.random.Generator(np.random.Philox(key=[41, 2026]))
    for n in (2, 3, 10, 20, 100, 101):
        x = rng.normal(size=n)
        x[rng.random(n) < 0.1] = np.nan
        if (~np.isnan(x)).sum() <= 1:
            continue
        for p in (50.0, 90.0, 95.0, 99.0, 100.0):
            assert pct_oneflux(x, p) == _ref_pct(x, p), (n, p)
    with pytest.raises(ValueError):
        pct_oneflux(np.array([np.nan, 1.0])[:1], 95.0)


def test_sunrise_sunset_linacre():
    # verbatim math replica
    doy = np.array([80.0, 172.0, 355.0])
    pi = 3.1415926
    decl = (23.45 * pi / 180.0) * np.sin((2.0 * pi / 365.0) * (doy - 80))
    hs = np.arccos(-np.tan(47.0 * pi / 180.0) * np.tan(decl))
    want_rise = 12.0 - hs * 24.0 / (2.0 * pi)
    rise, sset = sunrise_sunset(doy, 47.0)
    np.testing.assert_allclose(rise, want_rise, rtol=1e-12)
    # physical: equinox ~6/18, summer long, winter short days
    assert abs(rise[0] - 6.0) < 0.1 and abs(sset[0] - 18.0) < 0.1
    assert rise[1] < 5.0 and sset[1] > 19.0
    assert rise[2] > 7.0 and sset[2] < 17.0


@pytest.fixture(scope="module")
def planted():
    rng = np.random.Generator(np.random.Philox(key=[43, 2026]))
    ts = pd.date_range("2023-03-01", periods=120 * 48, freq="30min")
    hr = (ts.hour + ts.minute / 60.0).to_numpy()
    doy = ts.dayofyear.to_numpy(dtype=float)
    ta = (10.0 + 8.0 * np.sin(2 * np.pi * (hr - 9.0) / 24.0)
          + 5.0 * np.sin(2 * np.pi * doy / 365.0)
          + rng.normal(0, 1.5, len(ts)))
    e0_true, rref_true = 150.0, 2.5 + 0.8 * np.sin(2 * np.pi * doy / 90.0)
    resp = lloyd_taylor_c(ta, rref_true, e0_true)
    day = (hr >= 7) & (hr <= 17)
    sw_in = np.where(day, 500.0, 0.0)
    nee = resp - np.where(day, 8.0, 0.0) + rng.normal(0, 0.25, len(ts))
    return pd.DataFrame({"site": "s1", "ts": ts, "nee": nee, "ta": ta,
                         "sw_in": sw_in}), e0_true, rref_true


def test_planted_recovery_distributed(planted, ray_session):
    df, e0_true, rref_true = planted
    out = (
        partition_nighttime_oneflux(
            rd.from_pandas(df).repartition(6), keys=["site"], lat=47.0)
        .to_pandas().sort_values("ts").reset_index(drop=True)
    )
    assert len(out) == len(df)
    e0 = out["e0"].dropna().unique()
    assert len(e0) == 1 and abs(e0[0] - e0_true) < 25.0
    # RECO tracks the planted respiration where defined
    resp_true = lloyd_taylor_c(df["ta"].to_numpy(), rref_true, e0_true)
    got = out["reco"].to_numpy()
    m = ~np.isnan(got)
    assert m.sum() > 0.9 * len(df)
    err = np.abs(got[m] - resp_true[m])
    assert np.median(err) < 0.5
    # GPP = RECO - NEE and is ~0 at night, strongly positive midday
    night = df["sw_in"].to_numpy() == 0
    gpp = out["gpp"].to_numpy()
    assert np.nanmedian(np.abs(gpp[night & m])) < 1.0
    assert np.nanmedian(gpp[~night & m]) > 5.0


def test_gate_leaves_noise_year_unpartitioned(ray_session):
    rng = np.random.Generator(np.random.Philox(key=[47, 2026]))
    ts = pd.date_range("2023-03-01", periods=60 * 48, freq="30min")
    df = pd.DataFrame({
        "site": "s1", "ts": ts,
        "nee": rng.normal(0, 5.0, len(ts)),      # no temperature signal
        "ta": rng.normal(10, 6.0, len(ts)),
        "sw_in": np.where((ts.hour >= 7) & (ts.hour <= 17), 500.0, 0.0),
    })
    out = partition_nighttime_oneflux(
        rd.from_pandas(df).repartition(3), keys=["site"], lat=47.0).to_pandas()
    assert out["reco"].isna().all() and out["gpp"].isna().all()


def test_trimmed_fit_resists_contamination():
    rng = np.random.Generator(np.random.Philox(key=[53, 2026]))
    ta = rng.uniform(-5, 25, 600)
    y = lloyd_taylor_c(ta, 3.0, 180.0) + rng.normal(0, 0.1, 600)
    y[:30] += 25.0  # gross contamination in 5% of points
    rref, e0, _, e0_se = fit_lloyd_taylor_trimmed(y, ta)
    assert abs(e0 - 180.0) < 20.0 and abs(rref - 3.0) < 0.4
    untrimmed = fit_lloyd_taylor_trimmed(y, ta, trim_perc=0.0)
    assert abs(untrimmed[1] - 180.0) > abs(e0 - 180.0)
