"""rank_drivers partial-sum correlation (pipelines/queries.py): the
decomposable (n, Sx, Sy, Sxy, Sxx, Syy) combine must equal pandas
Pearson r, and planted correlations must rank correctly."""

import numpy as np
import pandas as pd


def _r_from_partials(x, y):
    n = float(len(x))
    sx, sy = x.sum(), y.sum()
    sxy, sxx, syy = (x * y).sum(), (x * x).sum(), (y * y).sum()
    return (n * sxy - sx * sy) / np.sqrt((n * sxx - sx ** 2) * (n * syy - sy ** 2))


def test_partials_equal_pandas_pearson():
    rng = np.random.Generator(np.random.Philox(key=[61, 2026]))
    x = rng.normal(size=500)
    y = 0.6 * x + rng.normal(0, 0.5, 500)
    got = _r_from_partials(x, y)
    want = pd.Series(x).corr(pd.Series(y))
    assert abs(got - want) < 1e-12


def test_planted_ranking_through_query_shape():
    rng = np.random.Generator(np.random.Philox(key=[67, 2026]))
    t = rng.normal(size=800)
    drivers = {
        "strong_pos": 0.9 * t + rng.normal(0, 0.2, 800),
        "strong_neg": -0.9 * t + rng.normal(0, 0.2, 800),
        "weak": 0.2 * t + rng.normal(0, 1.0, 800),
        "none": rng.normal(size=800),
    }
    rows = []
    for name, x in drivers.items():
        rows.append((name, round(_r_from_partials(np.asarray(x), t), 6)))
    g = pd.DataFrame(rows, columns=["driver", "r"])
    g["abs_r"] = g["r"].abs()
    g = g.sort_values(["abs_r", "driver"], ascending=[False, True])
    ranked = g["driver"].tolist()
    assert set(ranked[:2]) == {"strong_pos", "strong_neg"}
    assert ranked[2] == "weak" and ranked[3] == "none"
    assert g.iloc[0]["abs_r"] > 0.9 and g.iloc[3]["abs_r"] < 0.15
