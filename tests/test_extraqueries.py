"""Property pins for the round-4 batch-2 robust/ECDF estimators:
Theil-Sen, Hodges-Lehmann, Wasserstein-1 and Cramér-von Mises (kernels
shared verbatim with the SQL oracles — pipelines/extraqueries.py)."""

import numpy as np

from diive_ray.pipelines.extraqueries import (
    ecdf_distance_kernel,
    hodges_lehmann_kernel,
    theil_sen_kernel,
)


def _rng(key):
    return np.random.Generator(np.random.Philox(key=[key, 2026]))


# ---------------------------------------------------------------- Theil-Sen


def test_theil_sen_exact_on_clean_line():
    x = np.arange(50, dtype=float)
    y = 3.25 * x - 7.0
    r = theil_sen_kernel(y)
    np.testing.assert_allclose(r["slope"], 3.25, rtol=0, atol=1e-12)
    np.testing.assert_allclose(r["intercept"], -7.0, rtol=0, atol=1e-12)
    assert r["n_pairs"] == 50 * 49 / 2


def test_theil_sen_resists_30pct_outliers_where_ols_breaks():
    rng = _rng(3)
    n = 400
    x = np.arange(n, dtype=float)
    y = 0.5 * x + 10.0 + rng.normal(0, 0.1, n)
    # contaminate the top 30% of x positions only — a one-sided leverage
    # pattern that drags the OLS slope but not the pairwise-slope median
    bad = np.arange(n - n * 3 // 10, n)
    y[bad] += rng.normal(500, 100, len(bad))
    sen = theil_sen_kernel(y)["slope"]
    ols = np.polyfit(x, y, 1)[0]
    assert abs(sen - 0.5) < 0.05                   # robust: still the line
    assert abs(ols - 0.5) > 0.5                    # OLS dragged off


def test_theil_sen_median_of_all_pairwise_slopes():
    rng = _rng(5)
    y = rng.normal(0, 1, 30)
    slopes = [(y[j] - y[i]) / (j - i)
              for i in range(30) for j in range(i + 1, 30)]
    np.testing.assert_allclose(theil_sen_kernel(y)["slope"],
                               np.median(slopes), rtol=1e-12)


# ----------------------------------------------------------- Hodges-Lehmann


def test_hodges_lehmann_location_of_shifted_symmetric_sample():
    rng = _rng(7)
    x = rng.standard_t(3, 20000) + 42.0            # heavy tails, center 42
    hl, nw = hodges_lehmann_kernel(x)
    assert abs(hl - 42.0) < 0.05
    assert nw == len(x) * (len(x) + 1) // 2


def test_hodges_lehmann_is_median_of_walsh_averages():
    rng = _rng(9)
    x = rng.normal(5, 2, 25)
    walsh = [(x[i] + x[j]) / 2 for i in range(25) for j in range(i, 25)]
    hl, _ = hodges_lehmann_kernel(x)
    np.testing.assert_allclose(hl, np.median(walsh), rtol=1e-12)


def test_hodges_lehmann_beats_mean_under_asymmetric_outliers():
    rng = _rng(11)
    x = np.concatenate([rng.normal(0, 1, 900), np.full(100, 50.0)])
    hl, _ = hodges_lehmann_kernel(x)
    assert abs(hl) < 0.5
    assert abs(x.mean()) > 4.0


# --------------------------------------------------------- ECDF distances


def test_w1_between_point_masses_is_their_distance():
    d = ecdf_distance_kernel(np.full(10, 1.0), np.full(7, 4.5))
    np.testing.assert_allclose(d["w1"], 3.5, rtol=0, atol=1e-12)
    np.testing.assert_allclose(d["ks"], 1.0)


def test_w1_hand_case_two_points_each():
    # F_x steps at 0 and 2; F_y steps at 1 and 3; |Fx-Fy| = 0.5 on each
    # unit gap -> W1 = 1.5... compute: grid 0,1,2,3; Fx = .5,.5,1,1;
    # Fy = 0,.5,.5,1; |diff| on gaps (0-1):.5, (1-2):0, (2-3):.5 -> 1.0
    d = ecdf_distance_kernel(np.array([0.0, 2.0]), np.array([1.0, 3.0]))
    np.testing.assert_allclose(d["w1"], 1.0, atol=1e-12)


def test_w1_shift_invariance_equals_shift():
    rng = _rng(13)
    x = rng.normal(0, 1, 5000)
    d = ecdf_distance_kernel(x, x + 2.0)
    np.testing.assert_allclose(d["w1"], 2.0, rtol=0.05)


def test_w1_matches_sorted_sample_formula_equal_sizes():
    # for equal n, W1 = mean |x_(i) - y_(i)| over order statistics
    rng = _rng(15)
    x, y = rng.normal(0, 1, 800), rng.normal(0.5, 2, 800)
    d = ecdf_distance_kernel(x, y)
    expect = np.mean(np.abs(np.sort(x) - np.sort(y)))
    np.testing.assert_allclose(d["w1"], expect, rtol=1e-10)


def test_cvm_zero_on_identical_samples_positive_on_shift():
    rng = _rng(17)
    x = rng.normal(0, 1, 1000)
    same = ecdf_distance_kernel(x, x.copy())
    assert same["cvm"] < 1e-12 and same["ks"] < 1e-12
    shifted = ecdf_distance_kernel(x, x + 1.0)
    assert shifted["cvm"] > 10.0                  # ~n/4 * integral scale


def test_cvm_hand_case():
    # x = {0}, y = {1}: grid 0,1; Fx = 1,1; Fy = 0,1; diffs 1,0;
    # weights 1,1 -> sum w*diff^2 = 1; T = (1*1/4)*1 = 0.25
    d = ecdf_distance_kernel(np.array([0.0]), np.array([1.0]))
    np.testing.assert_allclose(d["cvm"], 0.25, atol=1e-12)


def test_cvm_detects_variance_change_ks_less_sensitive():
    # equal means, different spread: CvM picks up both tails
    rng = _rng(19)
    x = rng.normal(0, 1, 4000)
    y = rng.normal(0, 3, 4000)
    d = ecdf_distance_kernel(x, y)
    assert d["cvm"] > 50.0
    assert d["ks"] < 0.5        # sup-norm comparatively modest


# ------------------------------------------------------------------ ROC AUC


def _auc(counts):
    import pandas as pd
    from diive_ray.pipelines.extraqueries import auc_from_counts
    df = pd.DataFrame(counts, columns=["group", "score", "n_pos", "n_neg"])
    return auc_from_counts(df)


def test_auc_perfect_separation_is_one():
    r = _auc([("g", 1, 0, 10), ("g", 2, 0, 5), ("g", 3, 7, 0)])
    assert r["auc"].iloc[0] == 1.0 and r["gini"].iloc[0] == 1.0


def test_auc_all_tied_is_half():
    r = _auc([("g", 5, 10, 20)])
    assert r["auc"].iloc[0] == 0.5


def test_auc_matches_pairwise_probability_definition():
    rng = _rng(23)
    pos = rng.integers(0, 40, 300)
    neg = rng.integers(0, 40, 500)
    import collections
    cnt = collections.Counter()
    for v in pos:
        cnt[(int(v), "p")] += 1
    for v in neg:
        cnt[(int(v), "n")] += 1
    rows = []
    for v in sorted({int(x) for x in np.concatenate([pos, neg])}):
        rows.append(("g", v, cnt[(v, "p")], cnt[(v, "n")]))
    got = _auc(rows)["auc"].iloc[0]
    # brute-force P(pos > neg) + 0.5 P(tie)
    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    expect = (wins + 0.5 * ties) / (len(pos) * len(neg))
    np.testing.assert_allclose(got, expect, rtol=1e-12)


# ----------------------------------------------------------------- KDE grid


def test_kde_density_integrates_to_one_over_wide_grid():
    from diive_ray.pipelines.extraqueries import kde_gaussian_kernel
    rng = _rng(29)
    m = rng.normal(10, 2, 5000)
    d = kde_gaussian_kernel(m, n_grid=201)
    # trapezoid over the sample range covers ~all mass for a normal
    area = np.trapz(d["density"], d["x"])
    assert 0.95 < area < 1.01


def test_kde_peak_at_mode_and_silverman_bandwidth_positive():
    from diive_ray.pipelines.extraqueries import kde_gaussian_kernel
    rng = _rng(31)
    m = rng.normal(0, 1, 4000)
    d = kde_gaussian_kernel(m, n_grid=101)
    peak_x = d.loc[d["density"].idxmax(), "x"]
    assert abs(peak_x) < 0.3
    assert 0 < d["bandwidth"].iloc[0] < 1.0


# ------------------------------------------------------------- ARIMA(1,1,1)


def test_arima111_recovers_planted_parameters():
    from diive_ray.pipelines.extraqueries import arima111_css_kernel
    rng = _rng(37)
    n = 4000
    phi, theta = 0.6, -0.3
    z = np.zeros(n)
    e_prev = 0.0
    for t in range(1, n):
        e = rng.normal(0, 1)
        z[t] = phi * z[t - 1] + e + theta * e_prev
        e_prev = e
    y = np.cumsum(z) + 100.0              # integrate -> ARIMA(1,1,1) level
    r = arima111_css_kernel(y)
    assert abs(r["phi"] - phi) <= 0.1
    assert abs(r["theta"] - theta) <= 0.1
    assert 0.8 < r["sigma2"] < 1.2


def test_arima111_white_noise_prefers_near_zero_coeffs():
    from diive_ray.pipelines.extraqueries import arima111_css_kernel
    rng = _rng(41)
    y = np.cumsum(rng.normal(0, 1, 3000))
    r = arima111_css_kernel(y)
    # phi and theta near-cancel for white-noise differences
    assert abs(r["phi"] + r["theta"]) < 0.25


# ------------------------------------------------------------ median polish


def test_median_polish_recovers_planted_additive_structure():
    from diive_ray.pipelines.extraqueries import median_polish_kernel
    row_true = np.array([0.0, 1.0, -2.0, 3.0])
    col_true = np.array([0.0, 5.0, -5.0])
    mat = 10.0 + row_true[:, None] + col_true[None, :]
    overall, row, col, resid = median_polish_kernel(mat)
    np.testing.assert_allclose(np.abs(resid).max(), 0.0, atol=1e-12)
    # reconstruction identity regardless of effect-centering convention
    recon = overall + row[:, None] + col[None, :]
    np.testing.assert_allclose(recon, mat, atol=1e-12)


def test_median_polish_robust_to_single_cell_outlier():
    from diive_ray.pipelines.extraqueries import median_polish_kernel
    rng = _rng(43)
    row_true = rng.normal(0, 1, 10)
    col_true = rng.normal(0, 1, 8)
    mat = 5.0 + row_true[:, None] + col_true[None, :]
    mat[3, 4] += 100.0                     # one gross outlier
    overall, row, col, resid = median_polish_kernel(mat)
    # outlier lands in the residual, effects barely move
    assert resid[3, 4] > 90.0
    clean = np.delete(np.delete(resid, 3, axis=0), 4, axis=1)
    assert np.abs(clean).max() < 1.0


def test_median_polish_handles_nan_cells():
    from diive_ray.pipelines.extraqueries import median_polish_kernel
    mat = np.arange(12, dtype=float).reshape(3, 4)
    mat[1, 2] = np.nan
    overall, row, col, resid = median_polish_kernel(mat)
    assert np.isnan(resid[1, 2])
    assert np.isfinite(overall)
    assert np.isfinite(row).all() and np.isfinite(col).all()


# --------------------------------------------------------------- Sinkhorn


def test_sinkhorn_approaches_exact_w1_at_small_eps():
    from diive_ray.pipelines.extraqueries import sinkhorn_kernel
    # two point masses one bin apart: exact W1 = cost of moving all mass
    nb = 10
    centers = (np.arange(nb) + 0.5) / nb
    cost = np.abs(centers[:, None] - centers[None, :])
    p = np.zeros(nb); p[2] = 1.0
    q = np.zeros(nb); q[7] = 1.0
    got = sinkhorn_kernel(p, q, cost, eps=0.01, n_iter=2000)
    np.testing.assert_allclose(got, 0.5, atol=0.01)   # |c2 - c7| = 0.5


def test_sinkhorn_self_distance_near_zero_and_symmetry():
    from diive_ray.pipelines.extraqueries import sinkhorn_kernel
    rng = _rng(47)
    nb = 20
    centers = (np.arange(nb) + 0.5) / nb
    cost = np.abs(centers[:, None] - centers[None, :])
    p = rng.random(nb); p /= p.sum()
    q = rng.random(nb); q /= q.sum()
    self_d = sinkhorn_kernel(p, p.copy(), cost)
    assert self_d < 0.05                   # entropic blur only
    ab = sinkhorn_kernel(p, q, cost)
    ba = sinkhorn_kernel(q, p, cost)
    np.testing.assert_allclose(ab, ba, rtol=1e-8)


def test_sinkhorn_monotone_in_shift():
    from diive_ray.pipelines.extraqueries import sinkhorn_kernel
    nb = 20
    centers = (np.arange(nb) + 0.5) / nb
    cost = np.abs(centers[:, None] - centers[None, :])
    base = np.exp(-0.5 * ((centers - 0.3) / 0.08) ** 2); base /= base.sum()
    near = np.exp(-0.5 * ((centers - 0.4) / 0.08) ** 2); near /= near.sum()
    far = np.exp(-0.5 * ((centers - 0.7) / 0.08) ** 2); far /= far.sum()
    assert sinkhorn_kernel(base, near, cost) < sinkhorn_kernel(base, far, cost)


# ------------------------------------------------- distance correlation


def test_dcor_detects_nonmonotone_dependence_pearson_misses():
    from diive_ray.pipelines.extraqueries import distance_correlation_kernel
    rng = _rng(53)
    x = rng.uniform(-3, 3, 1500)
    y = x ** 2 + rng.normal(0, 0.1, 1500)      # symmetric parabola
    r = distance_correlation_kernel(x, y)
    pearson = abs(np.corrcoef(x, y)[0, 1])
    assert r["dcor"] > 0.45
    assert pearson < 0.1


def test_dcor_near_zero_for_independent_samples():
    from diive_ray.pipelines.extraqueries import distance_correlation_kernel
    rng = _rng(59)
    r = distance_correlation_kernel(rng.normal(0, 1, 2000),
                                    rng.normal(0, 1, 2000))
    assert r["dcor"] < 0.1


def test_dcor_one_for_perfect_linear():
    from diive_ray.pipelines.extraqueries import distance_correlation_kernel
    x = np.linspace(0, 1, 300)
    r = distance_correlation_kernel(x, 2.0 * x + 1.0)
    np.testing.assert_allclose(r["dcor"], 1.0, atol=1e-9)


# ------------------------------------------------------------- LOESS grid


def test_loess_grid_recovers_linear_trend_exactly():
    from diive_ray.pipelines.extraqueries import loess_grid_kernel
    m = 0.7 * np.arange(200, dtype=float) + 3.0
    d = loess_grid_kernel(m)
    np.testing.assert_allclose(d["slope"], 0.7, atol=1e-9)
    np.testing.assert_allclose(d["fit"], 0.7 * d["x_pos"] + 3.0, atol=1e-9)


def test_loess_grid_tracks_smooth_curvature():
    from diive_ray.pipelines.extraqueries import loess_grid_kernel
    i = np.arange(400, dtype=float)
    m = np.sin(i / 80.0)
    d = loess_grid_kernel(m)
    # local-linear smoothing flattens extrema a little at 20% span:
    # bounded bias at the peak, near-perfect shape agreement overall
    np.testing.assert_allclose(d["fit"], np.sin(d["x_pos"] / 80.0),
                               atol=0.08)
    assert np.corrcoef(d["fit"], np.sin(d["x_pos"] / 80.0))[0, 1] > 0.999


# --------------------------------------------------------------- VAR(1)


def test_var1_recovers_planted_coefficient_matrix():
    from diive_ray.pipelines.extraqueries import var1_kernel
    rng = _rng(61)
    A = np.array([[0.5, 0.2], [-0.1, 0.3]])
    n = 20000
    z = np.zeros((2, n))
    for t in range(1, n):
        z[:, t] = A @ z[:, t - 1] + rng.normal(0, 1, 2)
    r = var1_kernel(z[0], z[1])
    np.testing.assert_allclose(
        [[r["a_xx"], r["a_xy"]], [r["a_yx"], r["a_yy"]]], A, atol=0.03)
    A2 = A @ A
    np.testing.assert_allclose(r["irf2_xy"], A2[0, 1], atol=0.03)
    eig = np.max(np.abs(np.linalg.eigvals(A)))
    np.testing.assert_allclose(r["spectral_radius"], eig, atol=0.05)


def test_var1_spectral_radius_complex_pair_branch():
    from diive_ray.pipelines.extraqueries import var1_kernel
    rng = _rng(67)
    # rotation-like dynamics -> complex eigenvalues
    th = 0.5
    A = 0.8 * np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    n = 30000
    z = np.zeros((2, n))
    for t in range(1, n):
        z[:, t] = A @ z[:, t - 1] + rng.normal(0, 1, 2)
    r = var1_kernel(z[0], z[1])
    np.testing.assert_allclose(r["spectral_radius"], 0.8, atol=0.03)


# ------------------------------------------------------- quintile parity


def test_quintile_tuple_assignment_matches_ntile_semantics():
    # replicate the boundary-tuple assignment rule used by rfm_segments
    rng = _rng(71)
    n = 137
    v = np.round(rng.normal(0, 1, n), 2)       # force ties
    uid = np.arange(n, dtype=np.int64)
    order = np.lexsort((uid, v))
    base, extra = divmod(n, 5)
    sizes = [base + (1 if d < extra else 0) for d in range(5)]
    starts = np.cumsum(sizes)[:-1]
    expect = np.empty(n, dtype=np.int64)
    pos = 0
    for d, sz in enumerate(sizes):
        expect[order[pos:pos + sz]] = d + 1
        pos += sz
    bounds = [(v[order[s]], uid[order[s]]) for s in starts]
    q = np.ones(n, dtype=np.int64)
    for bv, bid in bounds:
        q += (v > bv) | ((v == bv) & (uid >= bid))
    np.testing.assert_array_equal(q, expect)


# ------------------------------------------------- histogram_quantile


def test_histogram_quantile_interpolation_hand_case():
    from diive_ray.pipelines.extraqueries import histogram_quantile_kernel
    # buckets (0,10],(10,25],... counts: 40 in first, 60 in second
    counts = np.array([40.0, 60.0, 0, 0, 0, 0, 0])
    # p50: rank 50 -> 10 into second bucket of 60 -> 10 + 15*(10/60)
    got = histogram_quantile_kernel(counts, 0.5)
    np.testing.assert_allclose(got, 10.0 + 15.0 * 10.0 / 60.0, atol=1e-12)


def test_histogram_quantile_inf_bucket_returns_top_bound():
    from diive_ray.pipelines.extraqueries import histogram_quantile_kernel
    counts = np.zeros(7); counts[6] = 100.0     # all in +Inf
    assert histogram_quantile_kernel(counts, 0.9) == 400.0


def test_histogram_quantile_brackets_true_quantile():
    from diive_ray.pipelines.extraqueries import (_HQ_BUCKETS,
                                                  histogram_quantile_kernel)
    rng = _rng(73)
    x = rng.exponential(60, 20000)
    bounds = np.array(_HQ_BUCKETS)
    counts = np.zeros(7)
    for v in x:
        counts[int(np.searchsorted(bounds, v, side="right"))] += 1
    for q in (0.5, 0.9):
        est = histogram_quantile_kernel(counts, q)
        true = np.quantile(x, q)
        # estimate must land inside the true value's bucket
        assert abs(est - true) < 40.0


# ------------------------------------------------------ Kleinberg bursts


def test_kleinberg_detects_planted_burst():
    from diive_ray.pipelines.extraqueries import kleinberg_kernel
    rng = _rng(79)
    base = np.cumsum(rng.exponential(10.0, 400))        # quiet stream
    burst = base[200] + np.cumsum(rng.exponential(0.5, 80))
    t = np.sort(np.concatenate([base, burst]))
    r = kleinberg_kernel(t)
    assert r["n_bursts"] >= 1
    assert r["longest_burst_gaps"] >= 50                # covers the injection


def test_kleinberg_quiet_on_uniform_stream():
    from diive_ray.pipelines.extraqueries import kleinberg_kernel
    rng = _rng(83)
    t = np.cumsum(rng.exponential(5.0, 600))
    r = kleinberg_kernel(t)
    # memoryless stream: at most incidental micro-bursts
    assert r["gaps_in_burst"] < 60
    assert r["frac_time_burst"] < 0.05


# ---------------------------------------------------------- RAKE scores


def test_rake_degree_over_frequency_identity():
    import pandas as pd
    from diive_ray.pipelines.extraqueries import rake_scores
    cnt = pd.DataFrame({"phrase": ["deep learning", "deep", "learning rate"],
                        "n": [2, 3, 1]})
    out = rake_scores(cnt)
    # deg(deep) = 2*2 + 1*3 = 7, freq = 5 -> 1.4
    # deg(learning) = 2*2 + 2*1 = 6, freq = 3 -> 2.0
    # deg(rate) = 2*1 = 2, freq = 1 -> 2.0
    s = dict(zip(out["phrase"], out["score"]))
    np.testing.assert_allclose(s["deep learning"], 1.4 + 2.0)
    np.testing.assert_allclose(s["deep"], 1.4)
    np.testing.assert_allclose(s["learning rate"], 4.0)
    # ranking: ties broken by phrase asc, scores desc first
    assert list(out["phrase"])[0] == "learning rate"


# ---------------------------------------------------------- P2 quantile


def test_p2_quantile_tracks_exact_on_normal_stream():
    from diive_ray.pipelines.extraqueries import p2_quantile_kernel
    rng = _rng(89)
    x = rng.normal(100, 15, 50000)
    for q in (0.5, 0.9, 0.99):
        est = p2_quantile_kernel(x, q)
        exact = np.quantile(x, q)
        assert abs(est - exact) < 1.0          # « sd; O(1) memory


def test_p2_quantile_heavy_tail_median():
    from diive_ray.pipelines.extraqueries import p2_quantile_kernel
    rng = _rng(97)
    x = rng.lognormal(0, 2, 30000)
    est = p2_quantile_kernel(x, 0.5)
    exact = np.quantile(x, 0.5)
    assert abs(est - exact) / exact < 0.1


def test_p2_quantile_small_n_exact_fallback():
    from diive_ray.pipelines.extraqueries import p2_quantile_kernel
    x = np.array([3.0, 1.0, 2.0])
    np.testing.assert_allclose(p2_quantile_kernel(x, 0.5), 2.0)


# ----------------------------------------------------------- drawdown


def test_max_drawdown_shape():
    # monotone rise has zero drawdown; a dip shows peak-to-trough
    from diive_ray.pipelines.statqueries import _HOURLY_CTE  # noqa: F401
    m = np.array([1.0, 2.0, 3.0, 2.5, 1.5, 2.8])
    peak = np.maximum.accumulate(m)
    dd = peak - m
    assert dd.max() == 1.5 and int(np.argmax(dd)) == 4


# ----------------------------------------------------------------- ALS


def test_als_recovers_planted_rank2_structure():
    from diive_ray.pipelines.extraqueries import als_iterate
    rng = _rng(101)
    U0 = np.abs(rng.normal(1, 0.5, (200, 2)))
    V0 = np.abs(rng.normal(1, 0.5, (6, 2)))
    R = U0 @ V0.T
    _, _, rmse = als_iterate(R, n_iter=15)
    assert rmse < 0.05 * R.mean()              # near-exact rank-2 fit


def test_als_rmse_monotone_in_iterations():
    from diive_ray.pipelines.extraqueries import als_iterate
    rng = _rng(103)
    R = np.abs(rng.normal(2, 1, (50, 5)))
    rmses = [als_iterate(R, n_iter=k)[2] for k in (1, 3, 8)]
    assert rmses[0] >= rmses[1] >= rmses[2] - 1e-12


# -------------------------------------------------------- Bayesian A/B


def test_bayes_prob_half_under_identical_arms():
    from diive_ray.pipelines.extraqueries import bayes_prob_b_beats_a
    p = bayes_prob_b_beats_a(50, 100, 50, 100)
    assert abs(p - 0.5) < 0.01


def test_bayes_prob_near_one_for_strong_difference():
    from diive_ray.pipelines.extraqueries import bayes_prob_b_beats_a
    assert bayes_prob_b_beats_a(10, 100, 60, 100) > 0.999
    assert bayes_prob_b_beats_a(60, 100, 10, 100) < 0.001


def test_bayes_prob_matches_z_direction_moderate():
    from diive_ray.pipelines.extraqueries import bayes_prob_b_beats_a
    # z ~ 1.4 one-sided p ~ 0.92
    p = bayes_prob_b_beats_a(40, 200, 55, 200)
    assert 0.8 < p < 0.99


# -------------------------------------------------------------- Hawkes


def test_hawkes_alpha_near_zero_on_poisson_stream():
    from diive_ray.pipelines.extraqueries import hawkes_em_kernel
    rng = _rng(107)
    t = np.cumsum(rng.exponential(2.0, 600))
    r = hawkes_em_kernel(t)
    assert r["alpha"] < 0.25


def test_hawkes_recovers_planted_excitation():
    from diive_ray.pipelines.extraqueries import hawkes_em_kernel
    rng = _rng(109)
    # simulate Hawkes by clusters: background Poisson + offspring
    mu_true, alpha_true, beta_true = 0.2, 0.5, 1.0
    bg = np.cumsum(rng.exponential(1.0 / mu_true, 300))
    events = list(bg)
    queue = list(bg)
    while queue:
        parent = queue.pop()
        n_kids = rng.poisson(alpha_true)
        for _ in range(n_kids):
            child = parent + rng.exponential(1.0 / beta_true)
            events.append(child)
            queue.append(child)
    t = np.sort(np.array(events))
    r = hawkes_em_kernel(t)
    assert 0.3 < r["alpha"] < 0.7              # branching ratio recovered
    poisson_alpha = hawkes_em_kernel(
        np.cumsum(rng.exponential(1.0, len(t))))["alpha"]
    assert r["alpha"] > poisson_alpha + 0.1


# ------------------------------------------------------ BCa bootstrap


def test_bca_brackets_true_mean_and_orders_endpoints():
    from diive_ray.pipelines.extraqueries import bca_interval
    rng = _rng(113)
    x = rng.normal(10, 2, 2000)
    r = bca_interval(x)
    assert r["lo"] < 10.0 < r["hi"]
    assert r["lo"] < r["mean"] < r["hi"]
    assert r["hi"] - r["lo"] < 0.5             # ~4 se


def test_bca_shifts_interval_for_skewed_data():
    from diive_ray.pipelines.extraqueries import bca_interval
    rng = _rng(127)
    x = rng.lognormal(0, 1.2, 800)
    r = bca_interval(x)
    # acceleration positive for right-skew; interval asymmetric upward
    assert r["accel"] > 0
    assert (r["hi"] - r["mean"]) > (r["mean"] - r["lo"])


def test_norm_ppf_matches_cdf_roundtrip():
    from diive_ray.pipelines.extraqueries import _norm_cdf, _norm_ppf
    for p in (0.01, 0.2, 0.5, 0.8, 0.975):
        np.testing.assert_allclose(_norm_cdf(_norm_ppf(p)), p, atol=1e-8)


# ------------------------------------------------------- Procrustes


def test_procrustes_recovers_planted_rotation():
    from diive_ray.pipelines.extraqueries import procrustes_kernel
    rng = _rng(131)
    A = rng.normal(0, 1, (12, 8))
    Q, _ = np.linalg.qr(rng.normal(0, 1, (8, 8)))   # random rotation
    B = A @ Q
    r = procrustes_kernel(A, B)
    assert r["residual"] < 1e-10               # perfect alignment
    assert r["baseline"] > 0.5                 # unaligned far apart


def test_procrustes_noise_floor():
    from diive_ray.pipelines.extraqueries import procrustes_kernel
    rng = _rng(137)
    A = rng.normal(0, 1, (12, 8))
    B = A + rng.normal(0, 0.05, (12, 8))
    r = procrustes_kernel(A, B)
    assert r["residual"] < 0.1


# ------------------------------------------------------------ GMM-2


def test_gmm2_recovers_planted_mixture():
    from diive_ray.pipelines.extraqueries import gmm2_kernel
    rng = _rng(139)
    x = np.concatenate([rng.normal(0, 1, 3000), rng.normal(8, 1.5, 1000)])
    r = gmm2_kernel(x)
    assert abs(r["mu1"]) < 0.3 and abs(r["mu2"] - 8.0) < 0.5
    assert abs(r["w2"] - 0.25) < 0.05
    assert abs(r["sd1"] - 1.0) < 0.2 and abs(r["sd2"] - 1.5) < 0.4


# --------------------------------------------------------------- AMS F2


def test_ams_f2_within_error_bound():
    from diive_ray.pipelines.extraqueries import ams_f2_kernel
    rng = _rng(149)
    f = rng.integers(1, 100, 500).astype(np.float64)
    exact = float((f * f).sum())
    est = ams_f2_kernel(f)
    assert abs(est - exact) / exact < 0.35     # median-of-means bound


def test_ams_f2_exact_on_single_item():
    from diive_ray.pipelines.extraqueries import ams_f2_kernel
    f = np.array([7.0])
    np.testing.assert_allclose(ams_f2_kernel(f), 49.0)


# ----------------------------------------------------------------- DGIM


def test_dgim_error_bound_and_bucket_count():
    from diive_ray.pipelines.extraqueries import dgim_count
    rng = _rng(151)
    bits = (rng.random(20000) < 0.3).astype(np.int64)
    W = 1000
    est, nb = dgim_count(bits, W)
    exact = bits[-W:].sum()
    assert abs(est - exact) / exact <= 0.5     # DGIM guarantee
    assert nb <= 2 * (int(np.log2(W)) + 2)     # O(log W) buckets


def test_dgim_all_ones_half_bucket_rule():
    from diive_ray.pipelines.extraqueries import dgim_count
    bits = np.ones(64, dtype=np.int64)
    est, _ = dgim_count(bits, 64)
    assert abs(est - 64) <= 32                 # within the 50% rule


# ----------------------------------------------------------------- HITS


def test_hits_bipartite_hand_case():
    from diive_ray.pipelines.extraqueries import hits_kernel
    # 0 and 1 both point at 2: 2 is the authority, 0/1 equal hubs
    adj = np.array([[0, 0, 1.0], [0, 0, 1.0], [0, 0, 0]])
    h, a = hits_kernel(adj)
    assert a[2] > 0.99
    np.testing.assert_allclose(h[0], h[1], rtol=1e-9)
    assert h[2] < 1e-6


# ----------------------------------------------------- Markov absorption


def test_absorption_two_state_closed_form():
    from diive_ray.pipelines.extraqueries import absorption_kernel
    # state 0: stays with prob 1-p, absorbs with p -> E steps = 1/p
    for p in (0.2, 0.5, 0.9):
        P = np.array([[1.0 - p, p], [0.0, 1.0]])
        t = absorption_kernel(P, 1)
        np.testing.assert_allclose(t[0], 1.0 / p, rtol=1e-10)


def test_absorption_chain_monotone_in_distance():
    from diive_ray.pipelines.extraqueries import absorption_kernel
    # 0 -> 1 -> 2 (absorbing), deterministic: 2 steps from 0, 1 from 1
    P = np.array([[0, 1.0, 0], [0, 0, 1.0], [0, 0, 1.0]])
    t = absorption_kernel(P, 2)
    np.testing.assert_allclose(t[:2], [2.0, 1.0])


# ------------------------------------------------------ ANN recall@k


def test_recall_at_k_monotone_and_exact_at_full_probe(ray_session):
    from diive_ray.pipelines.extraqueries import q_embedding_recall_at_k
    r = q_embedding_recall_at_k("/root/testdata/sf0.001")
    rec = r.sort_values("n_probe")["recall"].to_numpy()
    assert (np.diff(rec) >= -1e-9).all()       # monotone in probes
    assert rec[-1] == 1.0                      # n_probe = n_centroids


# --------------------------------------------------------- Fisher exact


def test_fisher_exact_matches_hand_case():
    from diive_ray.pipelines.extraqueries import fisher_exact_kernel
    # classic tea-tasting 3/1/1/3: two-sided p = 0.4857142857
    r = fisher_exact_kernel(3, 1, 1, 3)
    np.testing.assert_allclose(r["p_two_sided"], 0.4857142857, atol=1e-9)


def test_fisher_exact_no_association_p_one():
    from diive_ray.pipelines.extraqueries import fisher_exact_kernel
    r = fisher_exact_kernel(10, 10, 10, 10)
    np.testing.assert_allclose(r["p_two_sided"], 1.0, atol=1e-9)
    np.testing.assert_allclose(r["odds_ratio"], 1.0, atol=1e-9)


def test_fisher_exact_strong_association_small_p():
    from diive_ray.pipelines.extraqueries import fisher_exact_kernel
    r = fisher_exact_kernel(20, 2, 3, 25)
    assert r["p_two_sided"] < 1e-6
    assert r["or_lo"] > 1.0                    # CI excludes 1


# --------------------------------------------------------------- HMM-2


def test_hmm2_recovers_planted_regimes():
    from diive_ray.pipelines.extraqueries import hmm2_gaussian_kernel
    rng = _rng(157)
    # persistent two-regime chain: means 0 and 6, stay prob 0.95
    n = 3000
    s = np.zeros(n, dtype=int)
    for t in range(1, n):
        s[t] = s[t - 1] if rng.random() < 0.95 else 1 - s[t - 1]
    x = np.where(s == 0, rng.normal(0, 1, n), rng.normal(6, 1, n))
    r = hmm2_gaussian_kernel(x)
    assert abs(r["mu_lo"] - 0.0) < 0.5
    assert abs(r["mu_hi"] - 6.0) < 0.5
    assert r["stay_lo"] > 0.9 and r["stay_hi"] > 0.9


def test_hmm2_iid_gives_weak_persistence_structure():
    from diive_ray.pipelines.extraqueries import hmm2_gaussian_kernel
    rng = _rng(163)
    x = rng.normal(5, 1, 2000)                  # no regimes
    r = hmm2_gaussian_kernel(x)
    # single population: state means collapse toward each other
    assert abs(r["mu_hi"] - r["mu_lo"]) < 3.0


# ------------------------------------------------------------ silhouette


def test_silhouette_high_for_separated_blobs_low_for_random():
    from diive_ray.pipelines.extraqueries import silhouette_kernel
    rng = _rng(167)
    X = np.concatenate([rng.normal(0, 0.5, (100, 4)),
                        rng.normal(10, 0.5, (100, 4))])
    lab = np.repeat([0, 1], 100)
    assert silhouette_kernel(X, lab) > 0.9
    rand = rng.integers(0, 2, 200)
    assert silhouette_kernel(X, rand) < 0.3


def test_silhouette_singletons_zero_convention():
    from diive_ray.pipelines.extraqueries import silhouette_kernel
    X = np.array([[0.0], [5.0], [5.1]])
    lab = np.array([0, 1, 1])
    s = silhouette_kernel(X, lab)
    assert 0.0 < s <= 1.0                      # singleton contributes 0


# --------------------------------------------------------------- skyline


def test_skyline_dominance_brute_force_parity():
    import pandas as pd
    from diive_ray.pipelines.extraqueries import q_skyline_parts  # noqa
    rng = _rng(173)
    n = 300
    df = pd.DataFrame({
        "p_partkey": np.arange(n),
        "p_retailprice": np.round(rng.uniform(1, 100, n), 2),
        "p_size": rng.integers(1, 50, n),
    })
    # brute force dominance
    pr = df["p_retailprice"].to_numpy()
    sz = df["p_size"].to_numpy()
    dominated = np.zeros(n, dtype=bool)
    for i in range(n):
        dom = (pr <= pr[i]) & (sz >= sz[i]) & ((pr < pr[i]) | (sz > sz[i]))
        dominated[i] = dom.any()
    expect = set(df.loc[~dominated, "p_partkey"])
    # replicate the local scan used by the query
    d = df.sort_values(["p_retailprice", "p_size"],
                       ascending=[True, False]).reset_index(drop=True)
    prices = d["p_retailprice"].to_numpy()
    sizes = d["p_size"].to_numpy()
    keep = np.zeros(len(d), dtype=bool)
    best_size, best_price = -np.inf, np.nan
    for i in range(len(d)):
        if sizes[i] > best_size:
            keep[i] = True
            best_size, best_price = sizes[i], prices[i]
        elif sizes[i] == best_size and prices[i] == best_price:
            keep[i] = True
    got = set(d.loc[keep, "p_partkey"])
    assert got == expect


# ----------------------------------------------------------------- LSA


def test_lsa_rank_recovery_on_block_structure():
    # two disjoint topic blocks -> first two components separate them
    rng = _rng(179)
    M = np.zeros((60, 10))
    M[:30, :5] = rng.integers(1, 5, (30, 5))       # topic A terms 0-4
    M[30:, 5:] = rng.integers(1, 5, (30, 5))       # topic B terms 5-9
    X = M - M.mean(axis=0, keepdims=True)
    U, s, Vt = np.linalg.svd(X, full_matrices=False)
    var = s ** 2 / (s ** 2).sum()
    assert var[0] > 0.5                            # block structure found
    # after centering, component 0 is the block CONTRAST: the two term
    # blocks load with opposite signs
    v0 = Vt[0]
    assert np.sign(v0[:5].mean()) == -np.sign(v0[5:].mean())
    assert np.abs(v0[:5]).min() > 0.0 and np.abs(v0[5:]).min() > 0.0


# ----------------------------------------------------------------- SPRT


def test_sprt_stops_fast_under_strong_effect():
    from diive_ray.pipelines.extraqueries import sprt_kernel
    rng = _rng(181)
    s = (rng.random(5000) < 0.45).astype(int)   # true rate 0.45
    dec, n_at, _ = sprt_kernel(None, s, p0=0.3, p1=0.45)
    assert dec == "h1"
    assert n_at < 1000                          # sequential early stop


def test_sprt_accepts_null_under_null():
    from diive_ray.pipelines.extraqueries import sprt_kernel
    rng = _rng(191)
    s = (rng.random(5000) < 0.3).astype(int)    # true rate = p0
    dec, n_at, _ = sprt_kernel(None, s, p0=0.3, p1=0.45)
    assert dec == "h0"


def test_sprt_llr_steps_hand_case():
    from diive_ray.pipelines.extraqueries import sprt_kernel
    # all successes with p1 >> p0 crosses upper bound almost at once
    s = np.ones(100, dtype=int)
    dec, n_at, llr = sprt_kernel(None, s, p0=0.1, p1=0.5)
    assert dec == "h1" and n_at <= 3


# ------------------------------------------------------- Allan variance


def test_allan_variance_white_noise_scales_inverse_tau():
    rng = _rng(193)
    m = rng.normal(0, 1, 8192)
    avars = {}
    for tau in (1, 4, 16):
        nblk = len(m) // tau
        yb = m[:nblk * tau].reshape(nblk, tau).sum(axis=1) / tau
        d = np.diff(yb)
        avars[tau] = 0.5 * (d * d).sum() / len(d)
    # white noise: AVAR(tau) ~ sigma^2 / tau
    np.testing.assert_allclose(avars[1] / avars[4], 4.0, rtol=0.3)
    np.testing.assert_allclose(avars[4] / avars[16], 4.0, rtol=0.4)


# --------------------------------------------------- string similarity


def test_jaro_winkler_canonical_battery():
    from diive_ray.pipelines.extraqueries import jaro_winkler_kernel
    np.testing.assert_allclose(
        jaro_winkler_kernel("MARTHA", "MARHTA"), 0.9611111111, atol=1e-9)
    np.testing.assert_allclose(
        jaro_winkler_kernel("DWAYNE", "DUANE"), 0.84, atol=0.01)
    assert jaro_winkler_kernel("abc", "abc") == 1.0
    assert jaro_winkler_kernel("abc", "xyz") == 0.0


def test_levenshtein_classic_cases():
    from diive_ray.pipelines.extraqueries import levenshtein_kernel
    assert levenshtein_kernel("kitten", "sitting") == 3
    assert levenshtein_kernel("", "abc") == 3
    assert levenshtein_kernel("same", "same") == 0
    assert levenshtein_kernel("ab", "ba") == 2


# ------------------------------------------------------------------ RBO


def test_rbo_identical_rankings_is_near_one():
    from diive_ray.pipelines.extraqueries import rbo_kernel
    a = list("abcdefghij")
    # truncated base RBO at depth 10, p=0.9: 1 - p^d residual missing
    val = rbo_kernel(a, a)
    assert 0.6 < val <= 1.0
    assert val == rbo_kernel(a, a)             # deterministic


def test_rbo_disjoint_rankings_zero():
    from diive_ray.pipelines.extraqueries import rbo_kernel
    assert rbo_kernel(list("abcde"), list("vwxyz")) == 0.0


def test_rbo_top_weighted():
    from diive_ray.pipelines.extraqueries import rbo_kernel
    base = list("abcdefghij")
    swap_top = ["b", "a"] + base[2:]           # disturb head
    swap_tail = base[:8] + ["j", "i"]          # disturb tail
    assert rbo_kernel(base, swap_tail) > rbo_kernel(base, swap_top)


# ----------------------------------------------------------------- MTLD


def test_mtld_length_robust_ttr_not():
    from diive_ray.pipelines.extraqueries import mtld_kernel
    rng = _rng(197)
    vocab = [f"w{i}" for i in range(50)]
    short = [vocab[i] for i in rng.integers(0, 50, 100)]
    long = [vocab[i] for i in rng.integers(0, 50, 2000)]
    ttr_short = len(set(short)) / len(short)
    ttr_long = len(set(long)) / len(long)
    assert ttr_long < 0.3 * ttr_short          # raw TTR collapses
    m_short = mtld_kernel(short)
    m_long = mtld_kernel(long)
    assert 0.5 < m_long / m_short < 2.0        # MTLD stays level


def test_mtld_higher_for_more_diverse_text():
    from diive_ray.pipelines.extraqueries import mtld_kernel
    rng = _rng(199)
    rich = [f"w{i}" for i in rng.integers(0, 500, 1000)]
    poor = [f"w{i}" for i in rng.integers(0, 5, 1000)]
    assert mtld_kernel(rich) > 3 * mtld_kernel(poor)


# ------------------------------------------------- bipartite components


def test_bipartite_components_two_cliques(ray_session):
    import pandas as pd
    import ray.data as rd
    from diive_ray.stages.dedup import connected_components
    OFFSET = 1 << 40
    # users 1-3 share hour A; users 10-12 share hour B: 2 components
    edges = pd.DataFrame({
        "id_a": [1, 2, 3, 10, 11, 12],
        "id_b": [OFFSET + 1] * 3 + [OFFSET + 2] * 3,
    })
    lab = connected_components(rd.from_pandas(edges)).to_pandas()
    users = lab[lab["node"] < OFFSET]
    comps = users.groupby("label")["node"].apply(set).tolist()
    assert sorted(map(len, comps)) == [3, 3]
    assert {1, 2, 3} in comps and {10, 11, 12} in comps


# -------------------------------------------------------------- Huber


def test_huber_matches_ols_on_clean_data():
    from diive_ray.pipelines.extraqueries import huber_irls_kernel
    rng = _rng(211)
    x = np.arange(500, dtype=float)
    y = 0.8 * x + 4.0 + rng.normal(0, 0.5, 500)
    r = huber_irls_kernel(x, y)
    assert abs(r["slope"] - 0.8) < 0.01
    assert abs(r["intercept"] - 4.0) < 0.5


def test_huber_resists_contamination_ols_fails():
    from diive_ray.pipelines.extraqueries import huber_irls_kernel
    rng = _rng(223)
    n = 500
    x = np.arange(n, dtype=float)
    y = 0.8 * x + 4.0 + rng.normal(0, 0.5, n)
    y[-n // 10:] += 500.0                      # one-sided tail shift
    r = huber_irls_kernel(x, y)
    ols = np.polyfit(x, y, 1)[0]
    assert abs(r["slope"] - 0.8) < 0.05
    assert abs(ols - 0.8) > 0.3


# ------------------------------------------------- Bradley-Terry / Elo


def test_bradley_terry_recovers_planted_strengths():
    from diive_ray.pipelines.extraqueries import bradley_terry_kernel
    rng = _rng(227)
    true_p = np.array([0.4, 0.3, 0.2, 0.1])
    k = 4
    wins = np.zeros((k, k))
    for i in range(k):
        for j in range(k):
            if i != j:
                n = 500
                pw = true_p[i] / (true_p[i] + true_p[j])
                wins[i, j] = rng.binomial(n, pw)
    p = bradley_terry_kernel(wins)
    assert (np.argsort(-p) == np.argsort(-true_p)).all()
    np.testing.assert_allclose(p, true_p, atol=0.05)


def test_elo_stronger_player_ends_higher():
    from diive_ray.pipelines.extraqueries import elo_kernel
    rng = _rng(229)
    # player 0 beats everyone 80% of the time
    seq = []
    for _ in range(2000):
        opp = int(rng.integers(1, 5))
        if rng.random() < 0.8:
            seq.append((0, opp))
        else:
            seq.append((opp, 0))
    r = elo_kernel(np.array(seq, dtype=np.int64))
    assert r[0] > r[1:].max() + 50


# ----------------------------------------------- Shapley attribution


def test_shapley_efficiency_and_symmetry():
    from diive_ray.pipelines.extraqueries import (
        shapley_from_subset_values)
    rng = _rng(233)
    # random monotone game
    v = np.zeros(16)
    for S in range(1, 16):
        v[S] = max(v[S & (S - 1)], 0) + rng.random()
    # enforce monotone by cumulative max over subsets
    for S in range(16):
        for i in range(4):
            if S & (1 << i):
                v[S] = max(v[S], v[S ^ (1 << i)])
    phi = shapley_from_subset_values(v)
    np.testing.assert_allclose(phi.sum(), v[15] - v[0], rtol=1e-12)
    # symmetric players get equal shares: additive game test
    v2 = np.array([float(bin(S).count("1")) for S in range(16)])
    phi2 = shapley_from_subset_values(v2)
    np.testing.assert_allclose(phi2, 1.0, rtol=1e-12)


def test_shapley_dummy_player_gets_zero():
    from diive_ray.pipelines.extraqueries import (
        shapley_from_subset_values)
    # value depends only on player 0 membership
    v = np.array([10.0 if S & 1 else 0.0 for S in range(16)])
    phi = shapley_from_subset_values(v)
    np.testing.assert_allclose(phi[0], 10.0, rtol=1e-12)
    np.testing.assert_allclose(phi[1:], 0.0, atol=1e-12)


# ---------------------------------------------------------------- UCB1


def test_ucb1_converges_to_best_arm():
    from diive_ray.pipelines.extraqueries import ucb1_replay_kernel
    rng = _rng(239)
    T, K = 5000, 4
    means = np.array([0.3, 0.5, 0.7, 0.4])
    R = rng.random((T, K)) < means[None, :]
    r = ucb1_replay_kernel(R.astype(np.float64))
    # sublinear regret: far below the worst-case linear baseline
    assert r["regret"] < 0.1 * r["best_fixed"]
    assert r["regret"] >= 0.0


def test_ucb1_zero_regret_when_one_arm_dominates_every_round():
    from diive_ray.pipelines.extraqueries import ucb1_replay_kernel
    T, K = 200, 3
    R = np.zeros((T, K))
    R[:, 1] = 1.0                              # arm 1 always best
    r = ucb1_replay_kernel(R)
    # UCB1 keeps probing suboptimal arms ~2 ln T / gap^2 times each:
    # with gap 1 and T = 200 that is ~11 pulls per bad arm
    assert r["regret"] <= 2 * 2 * np.log(200) + 10


# -------------------------------------------- correspondence / CCA


def test_correspondence_inertia_equals_chi2_over_n():
    from diive_ray.pipelines.extraqueries import correspondence_kernel
    rng = _rng(241)
    O = rng.integers(1, 50, (6, 4)).astype(np.float64)
    s, _, _ = correspondence_kernel(O)
    n = O.sum()
    E = O.sum(1)[:, None] * O.sum(0)[None, :] / n
    chi2 = ((O - E) ** 2 / E).sum()
    np.testing.assert_allclose((s ** 2).sum(), chi2 / n, rtol=1e-10)


def test_correspondence_block_structure_separates_rows():
    from diive_ray.pipelines.extraqueries import correspondence_kernel
    O = np.array([[50.0, 2, 1], [45, 3, 2], [2, 40, 1], [1, 38, 2]])
    _, row0, _ = correspondence_kernel(O)
    # rows 0-1 vs 2-3 land on opposite sides of axis 1
    assert np.sign(row0[0]) == np.sign(row0[1])
    assert np.sign(row0[2]) == np.sign(row0[3])
    assert np.sign(row0[0]) != np.sign(row0[2])


def test_cca_planted_shared_factor():
    from diive_ray.pipelines.extraqueries import cca_first_kernel
    rng = _rng(251)
    n = 2000
    z = rng.normal(0, 1, n)
    X = np.column_stack([z + rng.normal(0, 0.3, n) for _ in range(4)])
    Y = np.column_stack([z + rng.normal(0, 0.3, n) for _ in range(4)])
    assert cca_first_kernel(X, Y) > 0.9
    X2 = rng.normal(0, 1, (n, 4))
    Y2 = rng.normal(0, 1, (n, 4))
    assert cca_first_kernel(X2, Y2) < 0.2


# ------------------------------------------------- cluster evaluation


def test_cluster_eval_perfect_and_random():
    from diive_ray.pipelines.extraqueries import cluster_eval_kernel
    rng = _rng(257)
    b = rng.integers(0, 5, 2000)
    perfect = cluster_eval_kernel(b.copy(), b)
    assert perfect["ari"] == 1.0 and abs(perfect["nmi"] - 1.0) < 1e-9
    assert perfect["purity"] == 1.0 and abs(perfect["v_measure"] - 1.0) < 1e-9
    rand = cluster_eval_kernel(rng.integers(0, 5, 2000), b)
    assert abs(rand["ari"]) < 0.05
    assert rand["nmi"] < 0.05


def test_cluster_eval_label_permutation_invariant():
    from diive_ray.pipelines.extraqueries import cluster_eval_kernel
    rng = _rng(263)
    b = rng.integers(0, 4, 500)
    a = (b + 2) % 4                            # relabeled perfect match
    r = cluster_eval_kernel(a, b)
    assert r["ari"] == 1.0 and r["purity"] == 1.0


# ------------------------------------------- sample entropy / LZ76


def test_sampen_separates_sine_from_noise():
    from diive_ray.pipelines.extraqueries import sample_entropy_kernel
    rng = _rng(269)
    noise = rng.normal(0, 1, 600)
    sine = np.sin(np.arange(600) / 5.0)
    assert sample_entropy_kernel(noise) > 3 * sample_entropy_kernel(sine)


def test_lz76_constant_low_random_high():
    from diive_ray.pipelines.extraqueries import lz76_kernel
    rng = _rng(271)
    const = np.zeros(512, dtype=bool)
    rand = rng.random(512) < 0.5
    assert lz76_kernel(const) <= 3
    # random binary: complexity near n / log2 n
    assert lz76_kernel(rand) > 0.5 * 512 / np.log2(512)
