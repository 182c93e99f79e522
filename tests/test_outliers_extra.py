"""LOF kernel vs brute-force O(n^2) oracle; frequency detection;
gap stats; bootstrap determinism."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from diive_ray.stages.outliers import lof_flag


def _brute_lof(x: np.ndarray, k: int) -> np.ndarray:
    """Textbook O(n^2) LOF on 1-D values."""
    n = len(x)
    d = np.abs(x[:, None] - x[None, :])
    np.fill_diagonal(d, np.inf)
    nbr = np.argsort(d, axis=1, kind="stable")[:, :k]
    nd = np.take_along_axis(d, nbr, axis=1)
    kdist = nd.max(axis=1)
    reach = np.maximum(nd, kdist[nbr])
    lrd = 1.0 / (reach.mean(axis=1) + 1e-12)
    return lrd[nbr].mean(axis=1) / lrd


def test_lof_matches_bruteforce():
    rng = np.random.Generator(np.random.Philox(key=21))
    x = np.concatenate([rng.standard_normal(400), [8.0, -7.5, 9.1]])
    s = pd.Series(x)
    flag = lof_flag(s, n_neighbors=10, contamination="auto", repeat=False)
    lof = _brute_lof(x, 10)
    expected = lof > 1.5
    got = (flag == 2).to_numpy()
    assert (got == expected).all()
    # the planted extremes are flagged
    assert got[-3:].all()


def test_lof_contamination_fraction():
    rng = np.random.Generator(np.random.Philox(key=22))
    x = rng.standard_normal(500)
    s = pd.Series(x)
    flag = lof_flag(s, n_neighbors=10, contamination=0.05, repeat=False)
    assert (flag == 2).sum() == int(np.ceil(0.05 * 500))


def test_detect_frequency(ray_session):
    from diive_ray.stages.freq import detect_frequency, detect_frequency_exact

    ts = pd.date_range("2024-01-01", periods=1000, freq="min")
    df = pd.concat([
        pd.DataFrame({"source": "a", "ts": ts}),
        pd.DataFrame({"source": "b", "ts": ts[::2]}),  # 2-min grid
    ], ignore_index=True)
    # a gap in source a
    df = df[~((df["source"] == "a") & (df.index % 997 == 0))]
    ds = rd.from_pandas(df).repartition(3)
    out = detect_frequency_exact(ds, keys=("source",)).set_index("source")
    assert out.loc["a", "freq_us"] == 60_000_000
    assert out.loc["b", "freq_us"] == 120_000_000
    assert out.loc["a", "confidence"] >= 0.95
    approx = detect_frequency(ds, keys=("source",)).set_index("source")
    assert approx.loc["a", "freq_us"] == 60_000_000


def test_gap_stats():
    from diive_ray.stages.gaps import gap_stats

    gt = pd.DataFrame({
        "source": ["a", "a", "a"],
        "GAP_START": pd.to_datetime(["2024-01-05", "2024-01-20", "2024-02-01"]),
        "GAP_END": pd.to_datetime(["2024-01-05", "2024-01-21", "2024-02-01"]),
        "GAP_LENGTH": [3, 10, 1],
    })
    out = gap_stats(gt, keys=("source",)).set_index(["year", "month"])
    assert out.loc[(2024, 1), "n_gaps"] == 2
    assert out.loc[(2024, 1), "missing"] == 13
    assert out.loc[(2024, 1), "longest"] == 10
    assert out.loc[(2024, 2), "n_gaps"] == 1


def test_bootstrap_deterministic(ray_session):
    from diive_ray.stages.features import bootstrap_stats

    rng = np.random.Generator(np.random.Philox(key=23))
    df = pd.DataFrame({"k": np.repeat(["a", "b"], 500), "v": rng.standard_normal(1000)})
    ds = rd.from_pandas(df).repartition(3)
    a = bootstrap_stats(ds, value_col="v", keys=("k",), n_boot=50)
    b = bootstrap_stats(ds, value_col="v", keys=("k",), n_boot=50)
    pd.testing.assert_frame_equal(
        a.sort_values("k").reset_index(drop=True), b.sort_values("k").reset_index(drop=True)
    )
    row = a.set_index("k").loc["a"]
    assert row["p2_5"] < row["p50_0"] < row["p97_5"]


def test_lof_small_group_matches_bruteforce():
    """n < 2k+1 fallback: full pairwise distances, no repeated-neighbor
    double counting (the round-1 clipped-window bug)."""
    rng = np.random.Generator(np.random.Philox(key=23))
    for n in (5, 8, 12, 25, 40):
        x = np.concatenate([rng.standard_normal(n - 1), [9.0]])
        s = pd.Series(x)
        k = min(20, n - 1)
        flag = lof_flag(s, n_neighbors=k, contamination="auto", repeat=False)
        expected = _brute_lof(x, k) > 1.5
        assert ((flag == 2).to_numpy() == expected).all(), f"n={n}"


def test_rolling_median_centered_matches_pandas():
    """The partition kernel must be bit-identical to pandas'
    rolling(center=True, min_periods=1).median() for odd/even windows,
    short series, and all edge windows."""
    from diive_ray.stages.outliers import rolling_median_centered

    rng = np.random.Generator(np.random.Philox(key=31))
    for n in (1, 2, 5, 48, 1000):
        x = rng.standard_normal(n)
        for w in (1, 2, 3, 4, 5, 48, 49, 624):
            exp = pd.Series(x).rolling(window=w, center=True, min_periods=1).median().to_numpy()
            got = rolling_median_centered(x, w)
            assert np.array_equal(got, exp), (n, w)
