"""Property pins for the round-4 continuation batch: ARCH LM, GPD POT
(PWM), Newey-West HAC trend, Anderson-Darling two-sample, GROUPING SETS
rollup, and the per-domain quota combine (kernels shared verbatim with
the SQL oracles — see pipelines/statqueries.py / docqueries.py)."""

import numpy as np
import pandas as pd

from diive_ray.pipelines.statqueries import (
    ad_twosample_kernel,
    arch_lm_kernel,
    gpd_pwm_kernel,
    hac_trend_kernel,
    rollup_levels_kernel,
)
from diive_ray.pipelines.docqueries import quota_combine_kernel


def _rng(key):
    return np.random.Generator(np.random.Philox(key=[key, 2026]))


# ------------------------------------------------------------------ ARCH LM


def test_arch_lm_detects_planted_volatility_clustering():
    rng = _rng(11)
    n = 2000
    # ARCH(1): sigma_t^2 = 0.2 + 0.7 e_{t-1}^2
    e = np.zeros(n)
    for t in range(1, n):
        e[t] = np.sqrt(0.2 + 0.7 * e[t - 1] ** 2) * rng.normal()
    arch = arch_lm_kernel(e + 5.0)["lm_stat"]
    iid = arch_lm_kernel(rng.normal(5, 1, n))["lm_stat"]
    assert arch > 50.0          # chi2(1) 99.9% point is 10.8
    assert iid < 15.0
    assert arch > 10 * iid


def test_arch_lm_rho_is_corr_of_squared_deviations():
    rng = _rng(13)
    x = rng.normal(0, 1, 500)
    r = arch_lm_kernel(x)
    z = (x - x.mean()) ** 2
    expect = np.corrcoef(z[:-1], z[1:])[0, 1]
    np.testing.assert_allclose(r["rho1_e2"], expect, rtol=1e-10)
    np.testing.assert_allclose(r["lm_stat"], (len(x) - 1) * expect ** 2,
                               rtol=1e-10)


# ------------------------------------------------------------------ GPD PWM


def test_gpd_pwm_recovers_exponential_shape():
    # exponential excesses = GPD with xi = 0, scale = 1/lambda
    rng = _rng(17)
    y = np.sort(rng.exponential(2.0, 20000))
    r = gpd_pwm_kernel(y)
    assert abs(r["shape_xi"]) < 0.05
    np.testing.assert_allclose(r["scale"], 2.0, rtol=0.05)


def test_gpd_pwm_recovers_uniform_shape():
    # uniform(0, b) = GPD with xi = -1, scale = b
    rng = _rng(19)
    y = np.sort(rng.uniform(0, 3.0, 20000))
    r = gpd_pwm_kernel(y)
    np.testing.assert_allclose(r["shape_xi"], -1.0, atol=0.05)
    np.testing.assert_allclose(r["scale"], 3.0, rtol=0.05)


def test_gpd_pwm_b1_tie_order_invariant():
    rng = _rng(23)
    y = np.sort(np.round(rng.exponential(1.0, 500), 1))  # heavy ties
    base = gpd_pwm_kernel(y)
    # shuffle within tie runs: stable sort of a permuted copy gives a
    # different intra-tie order but identical values per position
    perm = rng.permutation(y)
    again = gpd_pwm_kernel(np.sort(perm, kind="stable"))
    np.testing.assert_allclose(base["a1"], again["a1"], rtol=0, atol=0)


# ---------------------------------------------------------------- HAC trend


def test_hac_widens_se_under_ar1_errors():
    rng = _rng(29)
    n = 3000
    u = np.zeros(n)
    for t in range(1, n):
        u[t] = 0.8 * u[t - 1] + rng.normal()
    y = 0.01 * np.arange(n) + u
    r = hac_trend_kernel(y)
    np.testing.assert_allclose(r["slope"], 0.01, atol=0.005)
    assert r["se_nw"] > 1.5 * r["se_iid"]   # persistence inflates the LRV


def test_hac_matches_iid_se_on_white_noise():
    rng = _rng(31)
    y = rng.normal(0, 1, 5000)
    r = hac_trend_kernel(y)
    assert 0.7 < r["se_nw"] / r["se_iid"] < 1.3


def test_hac_exact_on_pure_line():
    y = 2.5 * np.arange(100) + 7.0
    r = hac_trend_kernel(y)
    np.testing.assert_allclose(r["slope"], 2.5, rtol=1e-12)
    assert r["se_nw"] < 1e-10


# ------------------------------------------------------ Anderson-Darling k=2


def test_ad_shifted_samples_score_higher_than_identical():
    rng = _rng(37)
    a = rng.normal(0, 1, 400)
    b = rng.normal(0.8, 1, 400)
    same = ad_twosample_kernel(a, rng.normal(0, 1, 400))
    diff = ad_twosample_kernel(a, b)
    assert diff > 20.0
    assert same < 5.0


def test_ad_detects_pure_scale_difference():
    # equal medians, different tails — the case location tests miss
    rng = _rng(41)
    a = rng.normal(0, 1, 500)
    b = rng.normal(0, 3, 500)
    assert ad_twosample_kernel(a, b) > 10.0


def test_ad_tie_adjusted_handles_discrete_data():
    rng = _rng(43)
    a = rng.integers(0, 5, 300).astype(float)
    b = rng.integers(0, 5, 300).astype(float)
    c = rng.integers(2, 7, 300).astype(float)
    assert np.isfinite(ad_twosample_kernel(a, b))
    assert ad_twosample_kernel(a, c) > ad_twosample_kernel(a, b)


def test_ad_symmetric_in_samples():
    rng = _rng(47)
    a, b = rng.normal(0, 1, 200), rng.normal(0.3, 1.2, 250)
    np.testing.assert_allclose(ad_twosample_kernel(a, b),
                               ad_twosample_kernel(b, a), rtol=1e-12)


# ------------------------------------------------------------ GROUPING SETS


def test_rollup_levels_match_direct_aggregation():
    rng = _rng(53)
    df = pd.DataFrame({
        "event_type": rng.choice(["a", "b", "c"], 5000),
        "hod": rng.integers(0, 24, 5000),
        "value": rng.normal(10, 3, 5000),
    })
    fine = df.groupby(["event_type", "hod"], as_index=False).agg(
        n=("value", "count"), s=("value", "sum"),
        mn=("value", "min"), mx=("value", "max"))
    out = rollup_levels_kernel(fine)
    # level 1 equals a direct per-type aggregate
    lvl1 = out[out["grouping_id"] == 1].set_index("event_type")
    direct = df.groupby("event_type")["value"]
    for k in ["a", "b", "c"]:
        assert lvl1.loc[k, "n"] == direct.count()[k]
        np.testing.assert_allclose(lvl1.loc[k, "min_value"], direct.min()[k])
        np.testing.assert_allclose(lvl1.loc[k, "max_value"], direct.max()[k])
        np.testing.assert_allclose(lvl1.loc[k, "mean_value"],
                                   direct.mean()[k], atol=2e-6)
    # grand total row
    lvl3 = out[out["grouping_id"] == 3]
    assert len(lvl3) == 1 and int(lvl3["n"].iloc[0]) == 5000
    # count conservation across every level
    for gid in (0, 1, 3):
        assert out[out["grouping_id"] == gid]["n"].sum() == 5000


# -------------------------------------------------------------- domain quota


def test_quota_partial_topk_combine_equals_global():
    rng = _rng(59)
    ids = rng.permutation(20000)[:8000]
    df = pd.DataFrame({"doc_id": np.sort(ids),
                       "n_chars": rng.integers(10, 500, 8000)})
    df["dom"] = ((df["doc_id"] * 2654435761) % 2147483648) % 97

    def batch_part(b):
        top = (b.sort_values(["dom", "doc_id"], kind="stable")
               .groupby("dom").head(50))
        cnt = b.groupby("dom").size().rename("n_docs_part")
        top = top.merge(cnt, left_on="dom", right_index=True)
        top.loc[top["dom"].duplicated(), "n_docs_part"] = 0
        return top[["dom", "doc_id", "n_chars", "n_docs_part"]]

    # simulate arbitrary partitioning into 7 blocks
    blocks = np.array_split(df.sample(frac=1, random_state=1), 7)
    cand = pd.concat([batch_part(b) for b in blocks], ignore_index=True)
    got = quota_combine_kernel(cand)

    # global truth
    kept = (df.sort_values(["dom", "doc_id"]).groupby("dom").head(50))
    truth = df.groupby("dom").agg(n_docs=("doc_id", "size")).join(
        kept.groupby("dom").agg(n_kept=("doc_id", "size"),
                                kept_min_id=("doc_id", "min"),
                                kept_max_id=("doc_id", "max"),
                                kept_chars=("n_chars", "sum"))
    ).reset_index().rename(columns={"dom": "domain"}).sort_values("domain")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        truth.astype("int64").reset_index(drop=True))


# ------------------------------------------------------------ energy distance

from diive_ray.pipelines.statqueries import (  # noqa: E402
    energy_distance_kernel,
    garch11_grid_kernel,
    pava_kernel,
    robust_scale_kernel,
)


def test_energy_distance_matches_naive_pairwise():
    rng = _rng(61)
    xs, ys = rng.normal(0, 1, 120), rng.normal(0.5, 2, 150)
    r = energy_distance_kernel(xs, ys)
    a = np.abs(xs[:, None] - ys[None, :]).mean()
    b = np.abs(xs[:, None] - xs[None, :]).mean()
    c = np.abs(ys[:, None] - ys[None, :]).mean()
    np.testing.assert_allclose(r["a_xy"], a, rtol=1e-10)
    np.testing.assert_allclose(r["b_xx"], b, rtol=1e-10)
    np.testing.assert_allclose(r["c_yy"], c, rtol=1e-10)
    np.testing.assert_allclose(r["e_dist"], 2 * a - b - c, rtol=1e-9)


def test_energy_distance_zero_for_identical_and_positive_for_shift():
    rng = _rng(67)
    xs = rng.normal(0, 1, 300)
    same = energy_distance_kernel(xs, xs.copy())
    assert abs(same["e_dist"]) < 1e-12
    shifted = energy_distance_kernel(xs, xs + 2.0)
    assert shifted["e_dist"] > 1.0


# -------------------------------------------------------------- robust scale


def test_robust_scale_consistency_on_gaussian():
    rng = _rng(71)
    x = rng.normal(0, 2.0, 20000)
    r = robust_scale_kernel(x[:2000])   # Qn is O(n^2), keep n modest
    np.testing.assert_allclose(r["mad_scaled"], 2.0, rtol=0.08)
    np.testing.assert_allclose(r["qn_scaled"], 2.0, rtol=0.08)
    np.testing.assert_allclose(np.sqrt(r["biweight_midvar"]), 2.0, rtol=0.08)


def test_robust_scale_immune_to_outliers():
    rng = _rng(73)
    x = rng.normal(0, 1.0, 1000)
    x[:100] = 1000.0   # 10% contamination
    r = robust_scale_kernel(x)
    assert r["mad_scaled"] < 2.0
    assert r["qn_scaled"] < 2.5
    assert np.std(x) > 100     # classical sd is destroyed


# ---------------------------------------------------------------- PAVA


def test_pava_equals_minimax_formula():
    rng = _rng(79)
    y = rng.normal(0, 1, 60)
    fit = pava_kernel(y)
    cs = np.concatenate([[0.0], np.cumsum(y)])
    n = len(y)
    expect = np.empty(n)
    for i in range(n):
        best = -np.inf
        for j in range(i + 1):
            mn = min((cs[k + 1] - cs[j]) / (k - j + 1) for k in range(i, n))
            best = max(best, mn)
        expect[i] = best
    np.testing.assert_allclose(fit, expect, rtol=1e-10, atol=1e-12)


def test_pava_is_monotone_and_mean_preserving():
    rng = _rng(83)
    y = np.sort(rng.normal(0, 1, 500))[::-1] + rng.normal(0, 0.1, 500)
    fit = pava_kernel(y)
    assert (np.diff(fit) >= -1e-12).all()
    np.testing.assert_allclose(fit.mean(), y.mean(), rtol=1e-12)


def test_pava_identity_on_already_increasing():
    y = np.array([1.0, 2.0, 5.0, 9.0])
    np.testing.assert_array_equal(pava_kernel(y), y)


# ---------------------------------------------------------------- GARCH(1,1)


def test_garch_grid_recovers_planted_parameters():
    rng = _rng(89)
    n = 6000
    a_true, b_true = 0.10, 0.82
    omega = 1.0 * (1 - a_true - b_true)
    e = np.zeros(n)
    s2 = 1.0
    for t in range(1, n):
        s2 = omega + a_true * e[t - 1] ** 2 + b_true * s2
        e[t] = np.sqrt(s2) * rng.normal()
    r = garch11_grid_kernel(e)
    assert abs(r["alpha"] - a_true) <= 0.04
    assert abs(r["beta"] - b_true) <= 0.06
    assert abs(r["persistence"] - (a_true + b_true)) <= 0.05


def test_garch_grid_white_noise_has_low_persistence_gain():
    rng = _rng(97)
    e = rng.normal(0, 1, 3000)
    r = garch11_grid_kernel(e)
    # on iid data the volatility forecast cannot beat the flat variance
    # by much: alpha stays at the small end of the grid
    assert r["alpha"] <= 0.06
