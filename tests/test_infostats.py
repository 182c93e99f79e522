"""Mutual information / Cramer's V and permutation entropy pins."""

import numpy as np
import pandas as pd


def test_mi_hand_worked_independent_and_dependent():
    """Independent 2x2 -> MI = 0, V = 0; perfectly dependent -> MI =
    ln 2, V = 1 (hand-computable)."""
    # emulate the combine path directly
    def mi_of(counts):
        g = pd.DataFrame(counts, columns=["x", "h", "cnt"])
        n = float(g["cnt"].sum())
        pxy = g["cnt"].to_numpy(np.float64) / n
        px = g.groupby("x")["cnt"].transform("sum").to_numpy(np.float64) / n
        ph = g.groupby("h")["cnt"].transform("sum").to_numpy(np.float64) / n
        mi = float(np.sum(pxy * np.log(pxy / (px * ph))))
        mx = g.groupby("x")["cnt"].sum().to_numpy(np.float64) / n
        mh = g.groupby("h")["cnt"].sum().to_numpy(np.float64) / n
        grid = g.pivot_table(index="x", columns="h", values="cnt",
                             fill_value=0, aggfunc="sum").to_numpy(np.float64)
        expg = np.outer(mx, mh) * n
        chi2 = float(np.sum((grid - expg) ** 2 / expg))
        r, c = len(mx), len(mh)
        v = float(np.sqrt(chi2 / (n * (min(r, c) - 1))))
        return mi, v

    mi, v = mi_of([("a", 0, 25), ("a", 1, 25), ("b", 0, 25), ("b", 1, 25)])
    assert abs(mi) < 1e-12 and abs(v) < 1e-12
    mi, v = mi_of([("a", 0, 50), ("b", 1, 50)])
    assert abs(mi - np.log(2)) < 1e-12
    assert abs(v - 1.0) < 1e-12


def test_permutation_entropy_codes():
    """Monotone series -> one pattern -> PE = 0; a period-3 sawtooth
    cycles 3 distinct patterns equally -> PE = ln 3."""
    def pe_of(y):
        y = np.asarray(y, float)
        a, b, c = y[:-2], y[1:-1], y[2:]
        code = (4 * (b >= a).astype(int) + 2 * (c >= b).astype(int)
                + (c >= a).astype(int))
        cnt = np.bincount(code, minlength=8).astype(float)
        p = cnt[cnt > 0] / cnt.sum()
        return -float(np.sum(p * np.log(p)))

    assert pe_of(np.arange(50)) == 0.0
    saw = np.tile([0.0, 2.0, 1.0], 30)
    assert abs(pe_of(saw[: 3 * 30]) - np.log(3)) < 1e-2
    # white noise approaches ln 6
    rng = np.random.default_rng(3)
    assert pe_of(rng.normal(size=20000)) > 0.99 * np.log(6)
