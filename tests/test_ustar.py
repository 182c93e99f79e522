"""USTAR moving-point-test kernel: tie-extended binning vs a directly
coded sequential oracle, planted-plateau recovery, forward-mode edge
cases, and the one-big-season fallback."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from diive_ray.stages import ustar as us


def _sequential_bounds(vals_sorted, n_classes, npc):
    """Directly coded ONEFlux-style sequential boundary loop (the
    documented rule: nominal end npc*(i+1)-1 extended across ties;
    last class takes the remainder)."""
    n = len(vals_sorted)
    ends = []
    prev = -1
    for i in range(n_classes - 1):
        nominal = min(npc * (i + 1) - 1, n - 1)
        e = nominal
        while e + 1 < n and vals_sorted[e + 1] == vals_sorted[nominal]:
            e += 1
        prev = max(e, prev)
        ends.append(prev)
    ends.append(n - 1)
    return np.array(ends, dtype=np.int64)


def test_tie_class_ends_matches_sequential():
    rng = np.random.Generator(np.random.Philox(key=5))
    for trial in range(20):
        # heavy ties: quantized values
        vals = np.sort(rng.integers(0, 12, size=rng.integers(40, 200)).astype(float))
        n_classes = 7
        npc = len(vals) // n_classes
        if npc < 1:
            continue
        got = us.tie_class_ends(vals, n_classes, npc)
        exp = _sequential_bounds(vals, n_classes, npc)
        np.testing.assert_array_equal(got, exp)
        # invariant: equal values never split across classes
        starts = np.concatenate(([0], got[:-1] + 1))
        for s, e in zip(starts, got):
            if s > 0 and e >= s:
                assert vals[s] != vals[s - 1]


def test_tie_free_equals_rownumber_bins():
    rng = np.random.Generator(np.random.Philox(key=6))
    vals = np.sort(rng.random(140))
    ends = us.tie_class_ends(vals, 7, 20)
    np.testing.assert_array_equal(ends, np.array([19, 39, 59, 79, 99, 119, 139]))


def test_forward_mode2_planted_plateau():
    # NEE rises through classes 0..9 then plateaus: detection picks the
    # first class whose own and next NEE are >= the next-10-class means
    u = np.linspace(0.05, 0.6, 20)
    fx = np.concatenate([np.linspace(0.1, 1.0, 10), np.full(10, 1.0)])
    th = us.forward_mode2(u, fx)
    assert th is not None
    # plateau starts at class 9 -> first satisfying class must be at the
    # plateau boundary (classes before it fail against the higher means)
    assert th == pytest.approx(u[9])


def test_forward_mode2_monotone_rise_not_found():
    u = np.linspace(0.05, 0.6, 20)
    fx = np.linspace(0.1, 5.0, 20)  # keeps rising: no plateau
    assert us.forward_mode2(u, fx) is None


def test_detect_ta_class_first_class_check():
    rng = np.random.Generator(np.random.Philox(key=7))
    # all ustar values high -> first class mean > 0.2 -> invalid
    ustar = 0.5 + 0.4 * rng.random(400)
    nee = rng.random(400)
    assert us.detect_ta_class(ustar, nee) is None


def test_distributed_matches_inmemory(ray_session):
    """The distributed path (counting pass + per-season exchange) must
    equal the in-memory seasonal_thresholds on the same synthesized
    frame, including the annual max row."""
    rng = np.random.Generator(np.random.Philox(key=8))
    n = 8000
    month = rng.integers(1, 13, n)
    ta = rng.normal(10, 8, n)
    ustar = 0.05 + 0.6 * rng.random(n)
    nee = (1 + 0.1 * ta) * np.minimum(ustar, 0.3) / 0.3 + 0.1 * rng.normal(size=n)
    sw_in = np.where(rng.random(n) < 0.7, 0.0, 500.0)
    df = pd.DataFrame({"ta": ta, "ustar": ustar, "nee": nee,
                       "sw_in": sw_in, "month": month})

    got = us.mpt_thresholds_distributed(rd.from_pandas(df).repartition(5))

    night = df[df["sw_in"] < us.NIGHT_SWIN]
    exp = us.seasonal_thresholds(
        night["ta"].to_numpy(), night["ustar"].to_numpy(),
        night["nee"].to_numpy(), night["month"].to_numpy(),
    )
    for i, e in enumerate(exp):
        g = got.loc[got["season"] == i + 1, "threshold"].iloc[0]
        if np.isnan(e):
            assert np.isnan(g)
        else:
            assert g == pytest.approx(e, abs=1e-12)
    finite = [t for t in exp if np.isfinite(t)]
    annual = got.loc[got["season"] == 0, "threshold"].iloc[0]
    if finite:
        assert annual == pytest.approx(max(finite), abs=1e-12)
    else:
        assert np.isnan(annual)
    # the planted saturation at 0.3 must be recovered within 2 class widths
    det = [t for t in finite]
    assert det and all(0.25 <= t <= 0.45 for t in det)


def test_one_big_season_fallback(ray_session):
    """Every season under 700 night rows but pooled >= 160: one pooled
    detection broadcast to all seasons."""
    rng = np.random.Generator(np.random.Philox(key=9))
    n = 6000  # total valid >= 3000, but only ~600 night rows per season
    month = np.repeat([1, 4, 7, 10], n // 4)
    ustar = 0.05 + 0.6 * rng.random(n)
    ta = rng.normal(10, 8, n)
    nee = np.minimum(ustar, 0.3) / 0.3 + 0.05 * rng.normal(size=n)
    sw_in = np.where(rng.random(n) < 0.4, 0.0, 500.0)  # ~40% night
    df = pd.DataFrame({"ta": ta, "ustar": ustar, "nee": nee,
                       "sw_in": sw_in, "month": month})
    night = df["sw_in"] < us.NIGHT_SWIN
    assert all(df.loc[night, "month"].isin(g).sum() < 700 for g in us.SEASON_GROUPS)
    got = us.mpt_thresholds_distributed(rd.from_pandas(df).repartition(3))
    th = got.loc[got["season"] > 0, "threshold"]
    assert th.nunique(dropna=False) == 1  # broadcast to all seasons
    pooled = us.detect_season(
        ta[night.to_numpy()], ustar[night.to_numpy()], nee[night.to_numpy()]
    )
    if pooled is None:
        assert th.isna().all()
    else:
        assert th.iloc[0] == pytest.approx(pooled, abs=1e-12)


def test_min_period_gate(ray_session):
    df = pd.DataFrame({
        "ta": np.random.default_rng(1).random(500),
        "ustar": np.random.default_rng(2).random(500),
        "nee": np.random.default_rng(3).random(500),
        "sw_in": 0.0,
        "month": 1,
    })
    got = us.mpt_thresholds_distributed(rd.from_pandas(df))
    assert got["threshold"].isna().all()


def test_quantile_bins_match_pdqcut():
    """The integer rank formula reproduces pd.qcut membership on
    tie-free values across divisible and non-divisible sizes."""
    rng = np.random.Generator(np.random.Philox(key=12))
    for n_classes in (6, 20):
        for total in (120, 123, 157, 20, 21, 35):
            vals = np.sort(rng.random(total))
            got = us.quantile_bins(np.arange(total), total, n_classes)
            qc = pd.qcut(vals, n_classes, labels=False, duplicates="drop")
            # same PARTITION: group boundaries agree (labels may be
            # renumbered by qcut after duplicate drops). Ranks where a
            # quantile break lands EXACTLY on an order statistic
            # ((total-1)*j % n_classes == 0) are tie-broken by qcut's
            # float arithmetic and are excluded from the claim — the
            # engine and its SQL oracle share the integer formula, so
            # they always agree with each other.
            boundary = np.array([
                r for r in range(total)
                if any((total - 1) * j == r * n_classes
                       for j in range(1, n_classes))
            ], dtype=int)
            keep = np.ones(total, dtype=bool)
            keep[boundary] = False
            _, g_inv = np.unique(got, return_inverse=True)
            _, q_inv = np.unique(qc, return_inverse=True)
            np.testing.assert_array_equal(
                g_inv[keep], q_inv[keep],
                err_msg=f"n={n_classes} total={total}")


def test_vekuri_detects_planted_plateau(ray_session):
    """Saturating respiration at USTAR=0.25 -> Vekuri threshold lands
    near the plateau onset; seasons without data come back NaN."""
    import ray.data as rd

    rng = np.random.Generator(np.random.Philox(key=13))
    n = 4000
    month = np.full(n, 1)  # all DJF -> season 1
    ta = 5.0 + 15.0 * rng.random(n)
    ustar = 0.05 + 0.6 * rng.random(n)
    nee = (1.0 + 0.1 * ta) * np.minimum(ustar, 0.25) / 0.25 \
        + 0.2 * (rng.random(n) - 0.5)
    df = pd.DataFrame({"ta": ta, "ustar": ustar, "nee": nee,
                       "sw_in": 0.0, "month": month})
    got = us.vekuri_thresholds_distributed(rd.from_pandas(df).repartition(3))
    th1 = got.loc[got["season"] == 1, "threshold"].iloc[0]
    assert np.isfinite(th1) and 0.2 <= th1 <= 0.45
    assert got.loc[got["season"] == 2, "threshold"].isna().all()
    annual = got.loc[got["season"] == 0, "threshold"].iloc[0]
    assert annual == th1  # only one season detected -> max == it
