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
