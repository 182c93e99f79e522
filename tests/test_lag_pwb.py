"""PWB block-bootstrap lag + PWBOPT (VERDICT r2 #4).

Reference parity: flux/hires/lag_pwb.py:83 (PreWhiteningBootstrap),
:2345 (apply_pwbopt), :2403 (fill_tlag_gaps);
detect_and_remove_tlag.py:47-52 (two-phase detect -> PWBOPT -> remove).
"""

import numpy as np
import pandas as pd
import ray.data as rd

from diive_ray.stages import lag_pwb as lp


def _ar1_series(n, rho, rng):
    x = np.zeros(n)
    e = rng.normal(size=n)
    for i in range(1, n):
        x[i] = rho * x[i - 1] + e[i]
    return x


def test_apply_pwbopt_reference_semantics():
    tlag = np.array([5.0, 5.2, 9.0, np.nan, 5.1])
    hdi = np.array([0.2, 0.8, 0.8, np.nan, 0.3])
    out = lp.apply_pwbopt(tlag, hdi, hdi_thresh=0.5, dev_thresh=0.5)
    assert list(out["flag"]) == [
        "S1_optimal",   # narrow HDI -> accept
        "S2_optimal",   # wide HDI but within 0.5 of last optimal
        "S3_unreliable",  # wide HDI, far from optimal -> carry forward
        "S3_unreliable",  # NaN -> carry forward
        "S1_optimal",
    ]
    assert list(out["pwbopt"]) == [5.0, 5.2, 5.2, 5.2, 5.1]


def test_fill_tlag_gaps_strategies():
    # leading NaN -> bfill (trailing NaN is PWBOPT's carry-forward job);
    # all-NaN -> median of raw; then fallback
    got = lp.fill_tlag_gaps([np.nan, 4.0, np.nan])
    assert got[0] == 4.0 and got[1] == 4.0 and np.isnan(got[2])
    got = lp.fill_tlag_gaps([np.nan, 4.0, np.nan], tlag_raw=[4.0, 4.0, np.nan])
    assert list(got) == [4.0, 4.0, 4.0]
    got = lp.fill_tlag_gaps([np.nan, np.nan], tlag_raw=[3.0, 5.0, np.nan])
    assert list(got) == [4.0, 4.0]
    got = lp.fill_tlag_gaps([np.nan], tlag_raw=[np.nan], fallback=2.5)
    assert list(got) == [2.5]


def test_hdi_discrete():
    s = np.array([5] * 96 + [1, 2, 20, 30])
    lo, hi = lp.hdi_discrete(s, 0.95)
    assert lo == 5 and hi == 5


def test_ar_prewhiten_whitens_ar1():
    rng = np.random.default_rng(0)
    x = _ar1_series(3000, 0.8, rng)
    phi, _ = lp.ar_prewhiten(x)
    assert len(phi) >= 1 and abs(phi[0] - 0.8) < 0.1
    e = lp.ar_filter(x, phi)
    # residual lag-1 autocorrelation near zero
    r1 = np.corrcoef(e[:-1], e[1:])[0, 1]
    assert abs(r1) < 0.1


def test_planted_lag_recovery_two_scales():
    # the S1 path: strong cross-correlation at lag 5 in an autocorrelated
    # series must be recovered with a narrow HDI at both scales
    for n, seed in [(800, 1), (4000, 2)]:
        rng = np.random.default_rng(seed)
        w = _ar1_series(n + 5, 0.7, rng)
        ref = w[5:]                      # wind
        scalar = w[:-5] + rng.normal(scale=0.1, size=n)  # arrives 5 later
        det = lp.pwb_bootstrap_lag(ref, scalar, lag_max=12, n_boot=99, seed=3)
        assert det["tlag"] == 5.0, (n, det)
        assert det["hdi_range"] <= 1.0, (n, det)


def test_pwbopt_carries_over_noise_chunk(ray_session):
    # 3 chunks: good, pure-noise (unreliable), good -> the noise chunk's
    # final lag must be the carried-forward optimum
    rng = np.random.default_rng(4)
    frames = []
    for chunk, good in [(0, True), (1, False), (2, True)]:
        n = 900
        w = _ar1_series(n + 4, 0.7, rng)
        ref = w[4:]
        scalar = (w[:-4] + rng.normal(scale=0.1, size=n)) if good else rng.normal(size=n)
        frames.append(pd.DataFrame({
            "seg": "a", "chunk": chunk, "pos": np.arange(n),
            "ref": ref, "scalar": scalar,
        }))
    ds = rd.from_pandas(pd.concat(frames, ignore_index=True))
    out = lp.pwb_lag_detect(
        ds, segment_keys=["seg"], chunk_col="chunk", order_cols=["pos"],
        ref_col="ref", scalar_col="scalar", lag_max=10, n_boot=99, seed=5,
    ).to_pandas().sort_values("chunk").reset_index(drop=True)
    assert out.loc[0, "flag"] == "S1_optimal" and out.loc[0, "tlag"] == 4.0
    assert out.loc[2, "flag"] == "S1_optimal" and out.loc[2, "tlag"] == 4.0
    assert out.loc[1, "tlag_final"] == 4.0  # carried forward / filled
    assert np.isfinite(out["tlag_final"]).all()


def test_apply_tlag_shifts_scalar(ray_session):
    n = 50
    df = pd.DataFrame({
        "seg": "a", "chunk": 0, "pos": np.arange(n),
        "ref": np.arange(n, dtype=float),
        "scalar": np.arange(n, dtype=float) - 3.0,
    })
    lags = pd.DataFrame({"seg": ["a"], "chunk": [0], "tlag_final": [3.0]})
    out = lp.apply_tlag(
        rd.from_pandas(df), lags, segment_keys=["seg"], chunk_col="chunk",
        order_cols=["pos"], scalar_col="scalar",
    ).to_pandas().sort_values("pos").reset_index(drop=True)
    shifted = out["scalar"].to_numpy()
    assert np.array_equal(shifted[: n - 3], df["scalar"].to_numpy()[3:])
    assert np.isnan(shifted[n - 3:]).all()


def test_pwb_lag_query_sf0001(ray_session):
    from diive_ray.pipelines.queries import QUERIES

    out = QUERIES["pwb_lag"]("/root/testdata/sf0.001")
    assert len(out) > 0
    assert {"event_type", "day", "tlag", "hdi_range", "flag", "pwbopt",
            "tlag_final"} <= set(out.columns)
    # every chunk ends with a usable final lag wherever any detection
    # succeeded for that event_type
    for et, g in out.groupby("event_type"):
        if np.isfinite(g["tlag"]).any():
            assert np.isfinite(g["tlag_final"]).all(), et
