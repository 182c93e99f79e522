"""Daytime NEE partitioning (stages/partition_daytime.py) — planted
Lasslop-parameter recovery for both variants at two scales, plus pinned
parity of the vectorized geometry helpers against naive reference-shaped
loops."""

import numpy as np
import pandas as pd
import pytest

from diive_ray.stages.partition_daytime import (
    NAN,
    _coverage,
    _percentiles_oneflux,
    daytime_oneflux_one_year,
    daytime_reddyproc_one_year,
    gpp_lasslop,
    lm_least_squares,
    replace_missing_sd,
    rp_associate_rows,
)
from diive_ray.stages.partition_oneflux import lloyd_taylor_c

ALPHA, BETA, K, RREF, E0 = 0.05, 20.0, 0.05, 3.0, 150.0


def _planted(ndays: int, seed: int = 42, gap_frac: float = 0.1):
    rng = np.random.Generator(np.random.Philox(key=seed))
    nper = 48
    n = ndays * nper
    doy = np.repeat(np.arange(1, ndays + 1), nper).astype(float)
    hr = np.tile((np.arange(nper) + 1) * 0.5, ndays)
    ta = (10.0 + 10.0 * np.sin(2 * np.pi * (doy - 100) / 365)
          + 5.0 * np.sin(2 * np.pi * (hr - 14) / 24) + rng.normal(0, 0.5, n))
    sw = np.maximum(0.0, 700.0 * np.sin(np.pi * (hr - 6) / 12))
    sw = np.where((hr > 6) & (hr < 18), sw, 0.0)
    vpd = np.maximum(0.0, 5.0 + 8.0 * np.sin(2 * np.pi * (hr - 15) / 24)
                     + rng.normal(0, 0.3, n))
    gpp_true = gpp_lasslop(sw, vpd, ALPHA, BETA, K)
    reco_true = lloyd_taylor_c(ta, RREF, E0)
    nee = -gpp_true + reco_true + rng.normal(0, 0.5, n)
    nee_meas = np.where(rng.random(n) < gap_frac, np.nan, nee)
    return dict(nee=nee_meas, ta=ta, sw=sw, vpd=vpd, doy=doy, hr=hr,
                nper=nper, gpp_true=gpp_true, reco_true=reco_true)


@pytest.mark.parametrize("ndays", [60, 365])
def test_oneflux_daytime_planted_recovery(ndays):
    d = _planted(ndays)
    out = daytime_oneflux_one_year(d["nee"], d["ta"], d["sw"], d["ta"],
                                   d["sw"], d["vpd"], d["doy"], d["hr"],
                                   d["nper"])
    fin = np.isfinite(out["RECO_DT_OF"])
    assert fin.mean() > 0.9
    # RECO tracks the planted Lloyd-Taylor respiration (the 60-day
    # frame has little seasonal TA range, so the bar is lower there)
    assert np.corrcoef(out["RECO_DT_OF"][fin], d["reco_true"][fin])[0, 1] > (
        0.85 if ndays >= 180 else 0.6)
    assert abs(np.nanmean(out["RECO_DT_OF"][fin] - d["reco_true"][fin])) < 0.3
    # GPP within a few percent where light is meaningful
    g = np.isfinite(out["GPP_DT_OF"]) & (d["gpp_true"] > 1)
    rel = np.abs(out["GPP_DT_OF"][g] - d["gpp_true"][g]) / d["gpp_true"][g]
    assert np.median(rel) < 0.1
    # per-window parameters recover the planted values
    assert abs(np.nanmedian(out["ALPHA_DT_OF"]) - ALPHA) < 0.02
    assert abs(np.nanmedian(out["BETA_DT_OF"]) - BETA) / BETA < 0.2
    assert abs(np.nanmedian(out["E0_DT_OF"]) - E0) < 40
    # SE is produced and positive where defined
    se = out["SE_GPP_DT_OF"]
    assert np.isfinite(se).any() and np.nanmin(se) >= 0


@pytest.mark.parametrize("ndays", [60, 365])
def test_reddyproc_daytime_planted_recovery(ndays):
    d = _planted(ndays, seed=7)
    sd = replace_missing_sd(np.full(d["nee"].size, np.nan), d["nee"])
    out = daytime_reddyproc_one_year(d["nee"], sd, d["ta"], d["vpd"], d["sw"],
                                     d["doy"], d["hr"], 47.0, 8.0, 1.0,
                                     d["nper"])
    fin = np.isfinite(out["RECO_DT_RP"])
    assert fin.mean() > 0.9
    assert np.corrcoef(out["RECO_DT_RP"][fin], d["reco_true"][fin])[0, 1] > (
        0.85 if ndays >= 180 else 0.6)
    g = np.isfinite(out["GPP_DT_RP"]) & (d["gpp_true"] > 1)
    rel = np.abs(out["GPP_DT_RP"][g] - d["gpp_true"][g]) / d["gpp_true"][g]
    assert np.median(rel) < 0.1
    assert abs(np.nanmedian(out["ALPHA_DT_RP"]) - ALPHA) < 0.02
    assert abs(np.nanmedian(out["BETA_DT_RP"]) - BETA) / BETA < 0.2


def test_reddyproc_gate_no_night_data():
    """With no usable nighttime records the E0 pass fails everywhere
    and the year is left unpartitioned (daytime_reddyproc.py:722-726)."""
    d = _planted(60, seed=9)
    nee = np.where(d["sw"] <= 4.0, np.nan, d["nee"])  # erase all night NEE
    sd = replace_missing_sd(np.full(nee.size, np.nan), nee)
    out = daytime_reddyproc_one_year(nee, sd, d["ta"], d["vpd"], d["sw"],
                                     d["doy"], d["hr"], 47.0, 8.0, 1.0,
                                     d["nper"])
    assert not np.isfinite(out["RECO_DT_RP"]).any()
    assert not np.isfinite(out["GPP_DT_RP"]).any()


def test_lm_recovers_exact_exponential():
    rng = np.random.Generator(np.random.Philox(key=3))
    x = np.linspace(0.0, 1.0, 80)
    y = 2.5 * np.exp(1.7 * x)

    res = lm_least_squares(lambda p: p[0] * np.exp(p[1] * x),
                           [1.0, 1.0], y, 1.0)
    np.testing.assert_allclose(res["params"], [2.5, 1.7], rtol=1e-6)
    assert res["cov"] is not None
    # with noise: parameters near truth, SEs finite
    yn = y + rng.normal(0, 0.05, x.size)
    res = lm_least_squares(lambda p: p[0] * np.exp(p[1] * x), [1.0, 1.0], yn, 0.05)
    np.testing.assert_allclose(res["params"], [2.5, 1.7], rtol=0.05)
    assert np.isfinite(res["std"]).all()


def test_lm_prior_pull():
    """A tight prior dominates weak data — the penalized objective is
    actually active."""
    x = np.linspace(0, 1, 5)
    y = np.full(5, 10.0)
    res = lm_least_squares(lambda p: np.full(5, p[0]), [5.0], y,
                           100.0,  # data nearly uninformative
                           prior=np.array([5.0]), sigm=np.array([1e-3]))
    assert abs(res["params"][0] - 5.0) < 0.01


def test_percentiles_oneflux_indexing():
    """The ONEFlux index percentile (daytime_oneflux.py:323-338):
    int(v*n) below the median, int(v*(n+1)) clipped above it."""
    v = np.arange(100, dtype=float)  # sorted 0..99
    p = _percentiles_oneflux(v, (0.03, 0.5, 0.97))
    assert p[0] == 3.0          # int(0.03*100)=3
    assert p[1] == 50.0         # int(0.5*100)=50
    assert p[2] == 97.0         # int(0.97*101)=97
    v5 = np.array([10.0, 0.0, 30.0, 20.0, 40.0])
    p5 = _percentiles_oneflux(v5, (0.03, 0.97))
    assert p5[0] == 0.0 and p5[2 - 1] == 40.0  # int(.03*5)=0, min(int(.97*6),4)=4


def _coverage_naive(central, n):
    """The reference coverage masks (daytime_oneflux.py:598-640),
    verbatim window-by-window."""
    nwin = central.size
    mat = np.full((nwin, n), False)
    ind = np.arange(n)
    for i in range(nwin):
        if i == 0:
            sub = (ind >= 0) & (ind < central[i + 1])
        elif i == nwin - 1:
            sub = (ind >= central[i - 1]) & (ind <= np.max(ind))
        else:
            sub = (ind >= central[i - 1]) & (ind < central[i + 1])
        mat[i, sub] = True
    return mat


def test_coverage_matches_reference_masks():
    rng = np.random.Generator(np.random.Philox(key=5))
    for _ in range(10):
        nwin = int(rng.integers(2, 12))
        central = np.sort(rng.choice(np.arange(10, 490), nwin, replace=False))
        n = 500
        mat = _coverage_naive(central, n)
        cov0, cov1, w1, w2 = _coverage(central, n)
        for j in range(n):
            covering = np.where(mat[:, j])[0]
            if covering.size == 0:
                assert cov0[j] == -1
            elif covering.size == 1:
                assert cov0[j] == covering[0] and cov1[j] == -1
                assert w1[j] == 1.0 and w2[j] == 0.0
            else:
                assert cov0[j] == covering[0] and cov1[j] == covering[1]
                c0, c1 = central[covering[0]], central[covering[1]]
                np.testing.assert_allclose(w1[j], (c1 - j) / (c1 - c0))
                np.testing.assert_allclose(w2[j], (j - c0) / (c1 - c0))


def _associate_naive(special, nrec):
    """Reference .partGPAssociateSpecialRows loops
    (daytime_reddyproc.py:620-650), verbatim."""
    nS = special.size
    i_before = np.zeros(nrec, int)
    i_after = np.zeros(nrec, int)
    w_before = np.zeros(nrec)
    w_after = np.zeros(nrec)
    for s in range(nS):
        r = special[s] - 1
        i_before[r] = i_after[r] = special[s]
        w_before[r] = w_after[r] = 0.5
    for s in range(nS):
        curr = special[s]
        prev = special[s] if s == 0 else special[s - 1]
        nxt = special[s] if s == nS - 1 else special[s + 1]
        dist_prev = curr - prev
        if dist_prev > 1:
            rows = np.arange(prev + 1, curr)
            i_after[rows - 1] = curr
            w_after[rows - 1] = np.arange(1, dist_prev) / dist_prev
        dist_next = nxt - curr
        if dist_next > 1:
            rows = np.arange(curr + 1, nxt)
            i_before[rows - 1] = curr
            w_before[rows - 1] = np.arange(dist_next - 1, 0, -1) / dist_next
    first, last = special[0], special[nS - 1]
    i_before[:first] = i_after[:first] = first
    w_before[:first] = w_after[:first] = 0.5
    i_before[last - 1:] = i_after[last - 1:] = last
    w_before[last - 1:] = w_after[last - 1:] = 0.5
    return i_before, i_after, w_before, w_after


def test_associate_rows_matches_reference_loops():
    rng = np.random.Generator(np.random.Philox(key=6))
    for _ in range(10):
        nrec = int(rng.integers(20, 200))
        ns = int(rng.integers(1, 8))
        special = np.sort(rng.choice(np.arange(1, nrec + 1), ns, replace=False))
        exp = _associate_naive(special, nrec)
        got = rp_associate_rows(special, nrec)
        for a, b in zip(got, exp):
            np.testing.assert_allclose(a, b)


def test_distributed_matches_single_kernel(ray_session):
    """The Ray wrapper (one exchange on (key, year)) reproduces the
    per-year kernel bit-for-bit, at any partitioning."""
    import ray.data as rd

    from diive_ray.stages.partition_daytime import partition_daytime_oneflux

    d = _planted(60, seed=11)
    n = d["nee"].size
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        (np.arange(n) + 1) * 30, unit="m")
    df = pd.DataFrame({"site": "a", "ts": ts, "nee": d["nee"], "ta": d["ta"],
                       "sw_in": d["sw"], "vpd": d["vpd"]})
    got = (partition_daytime_oneflux(rd.from_pandas(df), keys=["site"],
                                     num_partitions=7)
           .to_pandas().sort_values("ts", ignore_index=True))
    # the wrapper derives julday/hr from the stamps (midnight belongs
    # to the next day) — feed the kernel the same convention
    doy_w = ts.dayofyear.to_numpy(dtype=np.float64)
    hr_w = (ts.hour + np.where(ts.minute == 0, 0.0, 0.5)).to_numpy()
    exp = daytime_oneflux_one_year(d["nee"], d["ta"], d["sw"], d["ta"],
                                   d["sw"], d["vpd"], doy_w, hr_w,
                                   d["nper"])
    for c in ("RECO_DT_OF", "GPP_DT_OF", "SE_GPP_DT_OF"):
        np.testing.assert_array_equal(
            got[c].to_numpy().view(np.uint64),
            np.asarray(exp[c]).view(np.uint64), err_msg=c)
