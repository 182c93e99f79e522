"""Cohort retention (stages/joins.py:retention_cohorts), AR(2)
Yule-Walker (stages/trend.py:yule_walker_ar2_frame) and the complexity
battery (complexity_frame): pandas-oracle equality, partitioning
invariance, planted-parameter recovery, and closed-form pins."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from diive_ray.stages.joins import retention_cohorts
from diive_ray.stages.trend import complexity_frame, yule_walker_ar2_frame


@pytest.fixture(scope="module")
def event_log():
    rng = np.random.Generator(np.random.Philox(key=21))
    n = 3000
    base = pd.Timestamp("2024-02-01")
    users = rng.integers(0, 120, size=n)
    # stagger user first-activity so cohorts spread over ~3 weeks
    start_day = users % 20
    ts = (
        base
        + pd.to_timedelta(start_day, unit="D")
        + pd.to_timedelta(rng.integers(0, 86_400 * 25, size=n), unit="s")
    )
    return pd.DataFrame({"user_id": users.astype(np.int64), "ts": ts.astype("datetime64[us]")})


def _pd_retention(df: pd.DataFrame, period: str) -> pd.DataFrame:
    step = 1 if period == "D" else 7
    p = df["ts"].dt.normalize()
    if period == "W":
        p = p - pd.to_timedelta(df["ts"].dt.dayofweek, unit="D")
    sub = pd.DataFrame({"u": df["user_id"], "p": p})
    sub["cohort"] = sub.groupby("u")["p"].transform("min")
    uniq = sub.drop_duplicates(["u", "p"])
    name = "week_offset" if period == "W" else "day_offset"
    off = ((uniq["p"] - uniq["cohort"]).dt.days // step).astype(np.int64)
    act = (
        pd.DataFrame({"cohort": uniq["cohort"], name: off})
        .groupby(["cohort", name], as_index=False)
        .size()
        .rename(columns={"size": "n_active"})
    )
    base = act[act[name] == 0][["cohort", "n_active"]].rename(columns={"n_active": "cohort_size"})
    out = act.merge(base, on="cohort")
    out["retention"] = out["n_active"] / out["cohort_size"]
    return out.sort_values(["cohort", name]).reset_index(drop=True)


@pytest.mark.parametrize("period", ["D", "W"])
def test_retention_matches_pandas(ray_session, event_log, period):
    got = retention_cohorts(
        rd.from_pandas(event_log).repartition(9), user_col="user_id", ts_col="ts", period=period
    )
    exp = _pd_retention(event_log, period)
    got = got.astype({"n_active": np.int64, "cohort_size": np.int64})
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        exp.astype({c: got[c].dtype for c in exp.columns}),
        check_dtype=False,
    )


def test_retention_partitioning_invariant(ray_session, event_log):
    a = retention_cohorts(rd.from_pandas(event_log).repartition(2), period="D")
    b = retention_cohorts(rd.from_pandas(event_log).repartition(17), period="D")
    pd.testing.assert_frame_equal(a, b)


def test_retention_offset0_is_cohort_size(ray_session, event_log):
    out = retention_cohorts(rd.from_pandas(event_log), period="D")
    z = out[out["day_offset"] == 0]
    assert (z["n_active"] == z["cohort_size"]).all()
    assert (z["retention"] == 1.0).all()
    # total distinct users conserved across cohort sizes
    assert z["cohort_size"].sum() == event_log["user_id"].nunique()


def _grid_frame(y: np.ndarray, key: str = "a") -> pd.DataFrame:
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(np.arange(len(y)), unit="h")
    return pd.DataFrame({"event_type": key, "bucket_ts": ts.astype("datetime64[us]"), "m": y})


def test_ar2_recovers_planted_coefficients():
    rng = np.random.Generator(np.random.Philox(key=5))
    phi1, phi2 = 0.55, -0.25
    n = 40_000
    y = np.zeros(n)
    eps = rng.normal(0, 1.0, size=n)
    for t in range(2, n):
        y[t] = phi1 * y[t - 1] + phi2 * y[t - 2] + eps[t]
    out = yule_walker_ar2_frame(_grid_frame(y))
    assert len(out) == 1
    assert abs(out["phi1"].iloc[0] - phi1) < 0.02
    assert abs(out["phi2"].iloc[0] - phi2) < 0.02
    assert abs(out["sigma2"].iloc[0] - 1.0) < 0.05


def test_ar2_white_noise_has_tiny_phi():
    rng = np.random.Generator(np.random.Philox(key=6))
    out = yule_walker_ar2_frame(_grid_frame(rng.normal(size=20_000)))
    assert abs(out["phi1"].iloc[0]) < 0.03
    assert abs(out["phi2"].iloc[0]) < 0.03


def test_ar2_pairwise_skips_missing_buckets():
    # drop one bucket: pairs spanning it disappear, function still runs
    y = np.sin(np.arange(200) / 5.0)
    f = _grid_frame(y)
    f = f.drop(index=[50, 51, 52]).reset_index(drop=True)
    out = yule_walker_ar2_frame(f)
    assert out["n"].iloc[0] == 197
    assert np.isfinite(out[["r1", "r2", "phi1", "phi2", "sigma2"]].to_numpy()).all()


def test_complexity_closed_form_pins():
    # x = [0, 1, 3, 6]: diffs [1, 2, 3] -> mac = 2, cid = sqrt(14)
    # triples (0,1,3), (1,3,6):
    #   c3 = (0*1*3 + 1*3*6)/2 = 9
    #   trev = ((9*1 - 1*0) + (36*3 - 3*1))/2 = (9 + 105)/2 = 57
    out = complexity_frame(_grid_frame(np.array([0.0, 1.0, 3.0, 6.0])))
    r = out.iloc[0]
    assert r["n_pairs"] == 3 and r["n_triples"] == 2
    assert r["mean_abs_change"] == pytest.approx(2.0)
    assert r["cid_ce"] == pytest.approx(np.sqrt(14.0))
    assert r["c3"] == pytest.approx(9.0)
    assert r["time_rev_asym"] == pytest.approx(57.0)


def test_complexity_time_reversal_symmetry_of_reversible_series():
    # a symmetric triangle wave is time-reversible: trev ~ 0
    y = np.abs(((np.arange(5000) % 100) - 50).astype(float))
    fwd = complexity_frame(_grid_frame(y))
    rev = complexity_frame(_grid_frame(y[::-1].copy()))
    assert abs(fwd["time_rev_asym"].iloc[0] + rev["time_rev_asym"].iloc[0]) < 1e-9
