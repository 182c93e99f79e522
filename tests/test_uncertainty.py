"""PAS20 random uncertainty: band-compressed method-1 kernel vs a
per-record brute-force oracle (wrap-aware time-of-day band, meteo
similarity, >= 6 rule), method-2 median fill, and the distributed
two-stage path vs the in-memory kernels."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from diive_ray.stages import uncertainty as un


def _brute_m1(i, ts_us, hr, flux, ta, vpd, swin):
    win = un.M1_WIN_DAYS * un.US_PER_DAY
    sh = hr[i] - 1.0
    sh = sh + 24.0 if sh < 0 else sh
    eh = hr[i] + 1.0
    eh = eh - 24.0 if eh >= 24.0 else eh
    tol = min(max(swin[i], 20.0), 50.0)
    vals = []
    for j in range(len(ts_us)):
        if not (ts_us[i] - win <= ts_us[j] <= ts_us[i] + win):
            continue
        if sh <= eh:
            if not (sh <= hr[j] <= eh):
                continue
        elif not (hr[j] >= sh or hr[j] <= eh):
            continue
        if not np.isfinite(flux[j]):
            continue
        if abs(ta[j] - ta[i]) >= 2.5 or abs(vpd[j] - vpd[i]) >= 5.0:
            continue
        if abs(swin[j] - swin[i]) >= tol:
            continue
        vals.append(flux[j])
    n = len(vals)
    sd = float(np.std(vals, ddof=1)) if n >= 6 else np.nan
    return sd, n


@pytest.fixture(scope="module")
def synthetic():
    rng = np.random.Generator(np.random.Philox(key=21))
    n = 3000
    # dense timestamps over 10 days incl. records near midnight (band wrap)
    ts_us = np.sort(rng.integers(0, 10 * un.US_PER_DAY, n))
    ts = pd.to_datetime(ts_us, unit="us")
    hr = (ts.hour + ts.minute / 60.0 + ts.second / 3600.0).to_numpy()
    ta = rng.normal(10, 6, n)
    vpd = rng.uniform(0, 12, n)
    swin = np.where(rng.random(n) < 0.5, 0.0, rng.uniform(0, 600, n))
    flux = rng.normal(3, 2, n)
    flux[rng.random(n) < 0.35] = np.nan  # unmeasured
    return ts_us, hr, flux, ta, vpd, swin


def test_m1_kernel_matches_bruteforce(synthetic):
    ts_us, hr, flux, ta, vpd, swin = synthetic
    centers = np.flatnonzero(np.isfinite(flux))[:120]
    sd, n = un.m1_block(centers, ts_us, hr, flux, ta, vpd, swin, block=32)
    for k, i in enumerate(centers):
        esd, en = _brute_m1(i, ts_us, hr, flux, ta, vpd, swin)
        assert n[k] == en, f"count mismatch at {i}"
        if np.isnan(esd):
            assert np.isnan(sd[k])
        else:
            assert sd[k] == pytest.approx(esd, abs=1e-10)


def test_m2_median_fill(synthetic):
    ts_us, hr, flux, ta, vpd, swin = synthetic
    gf = np.where(np.isfinite(flux), flux, 1.0)
    centers = np.flatnonzero(np.isfinite(flux))
    sd1_c, _ = un.m1_block(centers, ts_us, hr, flux, ta, vpd, swin)
    m1_sd = np.full(len(flux), np.nan)
    m1_sd[centers] = sd1_c
    todo = np.flatnonzero(~np.isfinite(m1_sd))[:50]
    sd2, n2 = un.m2_fill(todo, ts_us, gf, m1_sd)
    win = un.M2_WIN_DAYS * un.US_PER_DAY
    for k, i in enumerate(todo):
        add = max(abs(gf[i]) * 0.2, 2.0)
        sel = [j for j in range(len(ts_us))
               if ts_us[i] - win <= ts_us[j] <= ts_us[i] + win
               and np.isfinite(m1_sd[j])
               and gf[i] - add <= gf[j] <= gf[i] + add]
        assert n2[k] == len(sel)
        if sel:
            assert sd2[k] == pytest.approx(float(np.median(m1_sd[sel])), abs=1e-12)
        else:
            assert np.isnan(sd2[k])


def test_distributed_matches_inmemory(synthetic, ray_session):
    ts_us, hr, flux, ta, vpd, swin = synthetic
    gf = np.where(np.isfinite(flux), flux, 1.0)
    df = pd.DataFrame({
        "event_id": np.arange(len(ts_us)),
        "ts": pd.to_datetime(ts_us, unit="us"),
        "flux": flux, "gf": gf, "ta": ta, "vpd": vpd, "swin": swin,
    })
    got = un.random_uncertainty_pas20(rd.from_pandas(df).repartition(4)) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(df)

    centers = np.flatnonzero(np.isfinite(flux))
    sd1_c, n1_c = un.m1_block(centers, ts_us, hr, flux, ta, vpd, swin)
    m1_sd = np.full(len(flux), np.nan)
    n1 = np.zeros(len(flux), dtype=np.int64)
    m1_sd[centers] = sd1_c
    n1[centers] = n1_c
    todo = np.flatnonzero(~np.isfinite(m1_sd))
    sd2_t, n2_t = un.m2_fill(todo, ts_us, gf, m1_sd)
    exp_ru = m1_sd.copy()
    exp_ru[todo] = np.where(np.isfinite(sd2_t), sd2_t, np.nan)
    exp_method = np.where(np.isfinite(m1_sd), 1, 0)
    exp_method[todo[np.isfinite(sd2_t)]] = 2

    np.testing.assert_array_equal(got["method"].to_numpy(), exp_method)
    np.testing.assert_array_equal(got["n1"].to_numpy(), n1)
    gr = got["randunc"].to_numpy()
    mask = np.isfinite(exp_ru)
    assert (np.isfinite(gr) == mask).all()
    np.testing.assert_allclose(gr[mask], exp_ru[mask], rtol=0, atol=1e-10)


def test_joint_uncertainty_quadrature():
    ru = np.array([1.0, np.nan, 0.0])
    lo = np.array([-1.0, -1.0, -2.0])
    hi = np.array([1.0, 1.0, 2.0])
    j = un.joint_uncertainty(ru, lo, hi)
    assert j[0] == pytest.approx(np.sqrt(1.0 + 1.0))
    assert np.isnan(j[1])
    assert j[2] == pytest.approx(2.0)


def test_m1_kernel_fullcircle_block(synthetic):
    """Regression: a block whose centers span (almost) all hours — the
    union time-of-day band covers the whole clock face and must not
    collapse to the wrap ends. One giant block must equal many small
    blocks."""
    ts_us, hr, flux, ta, vpd, swin = synthetic
    centers = np.flatnonzero(np.isfinite(flux))[::7]  # sparse, all hours
    sd_big, n_big = un.m1_block(centers, ts_us, hr, flux, ta, vpd, swin,
                                block=len(centers))
    sd_small, n_small = un.m1_block(centers, ts_us, hr, flux, ta, vpd, swin,
                                    block=16)
    np.testing.assert_array_equal(n_big, n_small)
    np.testing.assert_allclose(sd_big, sd_small, rtol=0, atol=1e-10,
                               equal_nan=True)
