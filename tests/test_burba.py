"""Burba self-heating: weighted-median SF vs a brute-force scan of the
reference's L1-of-cumsums objective; BUR08 term sanity; distributed
scaling factors recover planted values."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from diive_ray.stages import burba as bb


def _objective(sf, op, ref, fct):
    return np.abs(np.cumsum(op + fct * sf) - np.cumsum(ref)).sum()


def test_sf_weighted_median_minimizes_objective():
    rng = np.random.Generator(np.random.Philox(key=31))
    for trial in range(20):
        n = rng.integers(20, 200)
        fct = rng.uniform(0.01, 1.0, n)
        op = rng.normal(0, 3, n)
        ref = op + fct * rng.uniform(0.2, 6.0) + 0.1 * rng.normal(size=n)
        sf = bb.sf_weighted_median(op, ref, fct)
        assert sf is not None
        f_star = _objective(sf, op, ref, fct)
        # no grid point beats the closed form (convex piecewise-linear)
        grid = np.linspace(0.0, 50.0, 2001)
        f_grid = min(_objective(g, op, ref, fct) for g in grid)
        assert f_star <= f_grid + 1e-9 * abs(f_grid)


def test_sf_weighted_median_clipping_and_degenerate():
    op = np.array([0.0, 0.0])
    ref = np.array([100.0, 100.0])
    fct = np.array([0.001, 0.001])
    assert bb.sf_weighted_median(op, ref, fct) == 50.0  # clipped high
    ref2 = np.array([-100.0, -100.0])
    assert bb.sf_weighted_median(op, ref2, fct) == 0.0  # clipped low
    assert bb.sf_weighted_median(op, ref, np.zeros(2)) is None  # no signal


def test_bur08_sensible_heat_positive_daytime():
    ta = np.full(48, 10.0)
    u = np.full(48, 2.0)
    day = np.concatenate([np.zeros(24), np.ones(24)])
    s = bb.bur08_sensible_heat(ta, u, day)
    assert np.isfinite(s).all()
    # surfaces are warmer than air in both regimes at TA=10 -> positive S,
    # and daytime heating exceeds nighttime
    assert (s > 0).all()
    assert s[day == 1].mean() > s[day == 0].mean()


def test_scop_recovers_planted_sf(ray_session):
    rng = np.random.Generator(np.random.Philox(key=32))
    n = 3000
    ta = rng.uniform(-5, 25, n)
    u = rng.uniform(0.5, 6, n)
    ustar = rng.uniform(0.05, 0.65, n)
    day = (rng.random(n) < 0.5).astype(np.int64)
    fct = bb.fct_unsc_bur08(ta, u, day, np.full(n, 16000.0),
                            np.full(n, 1.2), np.full(n, 1004.0))
    op = rng.normal(0, 3, n)
    sf_true = np.where(day == 1, 3.0, 1.5)
    ref = op + fct * sf_true + 0.02 * rng.normal(size=n)
    df = pd.DataFrame({
        "event_id": np.arange(n),
        "ts": pd.date_range("2023-01-01", periods=n, freq="30min"),
        "daytime": day, "ustar": ustar, "op": op, "ref": ref, "fct_unsc": fct,
    })
    out = bb.scop_scaling_factors(rd.from_pandas(df).repartition(4))
    assert len(out) == 10  # 2 daytimes x 5 bins
    for _, r in out.iterrows():
        want = 3.0 if r["daytime"] == 1 else 1.5
        assert r["sf"] == pytest.approx(want, abs=0.1)
