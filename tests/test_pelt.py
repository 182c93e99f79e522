"""PELT changepoint detection (stages/trend.py:pelt_mean_changepoints,
Killick, Fearnhead & Eckley 2012)."""

import numpy as np
import pandas as pd
import pytest

from diive_ray.stages.trend import pelt_frame, pelt_mean_changepoints


def _optimal_dp(y, penalty, min_size=2):
    """O(n^2) exact optimal-partitioning DP — the unpruned objective
    PELT must match exactly (the paper's exactness guarantee)."""
    n = len(y)
    s1 = np.concatenate([[0.0], np.cumsum(y)])
    s2 = np.concatenate([[0.0], np.cumsum(y * y)])

    def cost(a, b):
        m = b - a
        s = s1[b] - s1[a]
        return (s2[b] - s2[a]) - s * s / m

    F = np.full(n + 1, np.inf)
    F[0] = -penalty
    last = np.zeros(n + 1, dtype=int)
    for t in range(min_size, n + 1):
        for s in [0] + list(range(min_size, t - min_size + 1)):
            v = F[s] + cost(s, t) + penalty
            if v < F[t]:
                F[t], last[t] = v, s
    cps, t = [], n
    while t > 0:
        s = last[t]
        if s == 0:
            break
        cps.append(s)
        t = s
    return sorted(cps), F[n]


@pytest.mark.parametrize("seed", [0, 3, 7, 11])
def test_pelt_equals_exact_dp(seed):
    rng = np.random.default_rng(seed)
    segs = rng.integers(5, 30, size=4)
    means = rng.normal(0, 3, size=4)
    y = np.concatenate([rng.normal(m, 1.0, s) for m, s in zip(means, segs)])
    pen = 2.0 * np.log(len(y)) * 1.0
    got = pelt_mean_changepoints(y, penalty=pen)
    exp, _ = _optimal_dp(y, pen)
    assert got == exp


def test_planted_changepoints_recovered():
    rng = np.random.default_rng(5)
    y = np.concatenate([
        rng.normal(0, 0.5, 50), rng.normal(6, 0.5, 40), rng.normal(-3, 0.5, 60)])
    cps = pelt_mean_changepoints(y)
    assert len(cps) == 2
    assert abs(cps[0] - 50) <= 2 and abs(cps[1] - 90) <= 2


def test_no_change_no_cps():
    rng = np.random.default_rng(9)
    assert pelt_mean_changepoints(rng.normal(0, 1, 120)) == []


def test_frame_output_means():
    rng = np.random.default_rng(1)
    y = np.concatenate([rng.normal(0, 0.3, 30), rng.normal(5, 0.3, 30)])
    days = pd.date_range("2022-01-01", periods=60, freq="D")
    df = pd.DataFrame({"event_type": "x", "bucket_ts": days, "m": y})
    out = pelt_frame(df)
    assert len(out) == 1
    assert abs(out.loc[0, "mean_before"] - 0.0) < 0.3
    assert abs(out.loc[0, "mean_after"] - 5.0) < 0.3
    assert out.loc[0, "day"] == days[pelt_mean_changepoints(y)[0]]
