"""Misra-Gries heavy hitters: decrement algebra, superset guarantee,
exactness of the recount pass vs a pandas oracle."""

import numpy as np
import pandas as pd
import ray.data as rd


def test_mg_decrement_bound_and_error():
    from diive_ray.stages.sketch import mg_decrement

    rng = np.random.Generator(np.random.Philox(key=5))
    tokens = np.array([f"t{i}" for i in range(1000)], dtype=object)
    counts = rng.integers(1, 1000, size=1000).astype(np.int64)
    t, c = mg_decrement(tokens, counts, capacity=50)
    assert len(t) <= 50
    # every surviving count is an undercount by exactly the kth value
    kth = np.partition(counts, len(counts) - 51)[len(counts) - 51]
    orig = dict(zip(tokens, counts))
    for tok, cnt in zip(t, c):
        assert cnt == orig[tok] - kth
        assert cnt > 0


def test_mg_no_decrement_under_capacity():
    from diive_ray.stages.sketch import mg_decrement

    tokens = np.array(["b", "a", "c"], dtype=object)
    counts = np.array([5, 3, 9], dtype=np.int64)
    t, c = mg_decrement(tokens, counts, capacity=10)
    assert list(t) == ["a", "b", "c"]
    assert list(c) == [3, 5, 9]


def test_heavy_hitters_exact_on_zipf(ray_session):
    from diive_ray.stages.sketch import heavy_hitters

    rng = np.random.Generator(np.random.Philox(key=9))
    vocab = np.array([f"w{i:04d}" for i in range(2000)], dtype=object)
    probs = 1.0 / np.arange(1, 2001)
    probs /= probs.sum()
    docs = []
    for _ in range(300):
        words = rng.choice(vocab, size=rng.integers(20, 120), p=probs)
        docs.append(" ".join(words))
    df = pd.DataFrame({"text": docs})
    got = heavy_hitters(
        rd.from_pandas(df).repartition(6), text_col="text", k=15, capacity=512
    )
    tok = pd.Series(docs).str.lower().str.split().explode()
    exp = (
        tok.value_counts()
        .rename_axis("token")
        .reset_index(name="cnt")
        .sort_values(["cnt", "token"], ascending=[False, True], kind="stable")
        .head(15)
        .reset_index(drop=True)
    )
    assert got["token"].tolist() == exp["token"].tolist()
    assert got["cnt"].tolist() == exp["cnt"].tolist()


def test_heavy_hitters_tiny_capacity_still_superset(ray_session):
    """With capacity barely above k the MG guarantee still holds for a
    heavily skewed corpus: the top tokens' counts far exceed
    N/(capacity+1)."""
    from diive_ray.stages.sketch import heavy_hitters

    docs = ["the the the cat sat"] * 50 + ["a dog ran far away"] * 5
    got = heavy_hitters(
        rd.from_pandas(pd.DataFrame({"text": docs})).repartition(3),
        text_col="text", k=3, capacity=8,
    )
    assert got["token"].tolist()[0] == "the"
    assert got["cnt"].tolist()[0] == 150


# ------------------------------------------------------------- HyperLogLog


def test_hll_error_bound_across_cardinalities():
    """p=12 standard error is ~1.6%; pin < 5% (3 sigma) at several
    cardinalities, including the linear-counting small range."""
    from diive_ray.stages.sketch import hll_estimate, hll_partial

    for n in (50, 1_000, 50_000, 1_000_000):
        vals = np.arange(n, dtype=np.int64) * 1_000_003 + 7
        est = hll_estimate(hll_partial(vals, p=12))
        assert abs(est - n) / n < 0.05, (n, est)


def test_hll_registers_mergeable():
    """max-merge of two register arrays == registers of the union —
    the property that makes per-batch partials exact to combine."""
    from diive_ray.stages.sketch import hll_partial

    a = np.arange(0, 80_000, dtype=np.int64)
    b = np.arange(40_000, 140_000, dtype=np.int64)
    merged = np.maximum(hll_partial(a), hll_partial(b))
    direct = hll_partial(np.union1d(a, b))
    assert (merged == direct).all()


def test_hll_distinct_distributed_vs_exact(ray_session):
    """Grouped hll_distinct over a Dataset lands within the error bound
    of the exact per-group distinct, independent of partitioning."""
    from diive_ray.stages.sketch import hll_distinct

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "g": np.repeat(["a", "b"], 60_000),
        "v": np.concatenate([rng.integers(0, 20_000, 60_000),
                             rng.integers(0, 3_000, 60_000)]),
    })
    exact = df.groupby("g")["v"].nunique()
    for parts in (2, 7):
        got = hll_distinct(rd.from_pandas(df).repartition(parts),
                           value_col="v", keys=["g"])
        got = got.set_index("g")["n_distinct_est"]
        for g in ("a", "b"):
            assert abs(got[g] - exact[g]) / exact[g] < 0.05
