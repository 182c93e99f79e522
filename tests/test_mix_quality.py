"""Gopher rule battery, temperature source mixing, CCNet perplexity
buckets — planted-parameter and partitioning-invariance pins."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from diive_ray.functions import text as tx


def test_gopher_rules_each_rule_discriminates():
    """One doc per rule violation; every other rule passes for it."""
    good = "the cat sat on the mat with a very fine hat and that was that be have to of " \
           "sun moon star tree rock lake bird fish wind rain snow leaf root stem"
    docs = [
        good,                                          # all pass
        "the of and that be have with to",             # too few words
        "aaaaaaaaaaaaaaaa " * 40 + "the of and that",  # mean word len too big
        good + " " + "# " * 20,                        # symbol ratio > 0.1
        good + " " + "123 456 789 " * 10,              # alpha frac < 0.8
        good.replace("the", "xx").replace("of", "yy").replace("that", "zz")
            .replace("with", "ww").replace("be", "qq").replace("have", "hh")
            .replace("and", "nn").replace("to", "tt"),  # stopwords < 2
    ]
    feat = tx.gopher_rules(pa.array(docs), min_words=10, max_words=80)
    assert bool(feat["keep"][0])
    assert not feat["rule_word_count"][1]
    assert not feat["rule_mean_word_len"][2]
    assert not feat["rule_symbol_ratio"][3]
    assert not feat["rule_alpha_words"][4]
    assert not feat["rule_stopwords"][5]
    # each violating doc fails exactly its own rule's keep
    for i in range(1, 6):
        assert not feat["keep"][i]


def test_temperature_mix_limits(ray_session):
    """tau=1 -> weights proportional to token counts; tau->0 -> uniform.
    Exact two-source check at tau=0.5."""
    from diive_ray.stages.packing import temperature_mix

    docs = pd.DataFrame({
        "source": ["a"] * 8 + ["b"] * 2,
        "text": ["w x y z"] * 8 + ["w x y z"] * 2,   # 32 vs 8 tokens
    })
    ds = rd.from_pandas(docs).repartition(3)

    t1 = temperature_mix(ds, tau=1.0, budget_tokens=1000)
    np.testing.assert_allclose(t1["weight"].to_numpy(), [0.8, 0.2])
    np.testing.assert_allclose(t1["sampled_tokens"].to_numpy(), [800.0, 200.0])

    t0 = temperature_mix(ds, tau=0.0, budget_tokens=1000)
    np.testing.assert_allclose(t0["weight"].to_numpy(), [0.5, 0.5])

    th = temperature_mix(ds, tau=0.5, budget_tokens=1000)
    z = np.sqrt(32.0) + np.sqrt(8.0)
    np.testing.assert_allclose(th["weight"].to_numpy(),
                               [np.sqrt(32.0) / z, np.sqrt(8.0) / z])
    # epochs = alloc / n: tau<1 upsamples the small source
    assert th["epochs"].iloc[1] > th["epochs"].iloc[0]


def test_ccnet_buckets_partition_invariant_and_ordered(ray_session):
    """Bucket assignment is invariant to input partitioning, buckets are
    ordered by perplexity within each lang, and tertiles are ~n/3."""
    from diive_ray.pipelines.docqueries import q_doc_ccnet_buckets

    sf = "/root/testdata/sf0.001"
    out = q_doc_ccnet_buckets(sf)
    assert set(out["bucket"]) == {"head", "middle", "tail"}
    for lang, g in out.groupby("lang"):
        h = g[g["bucket"] == "head"]["perplexity"]
        m = g[g["bucket"] == "middle"]["perplexity"]
        t = g[g["bucket"] == "tail"]["perplexity"]
        if len(h) and len(m):
            assert h.max() <= m.min()
        if len(m) and len(t):
            assert m.max() <= t.min()
        # tertile split: each bucket holds between 1/6 and 1/2 of the lang
        n = len(g)
        for part in (h, m, t):
            assert n / 6 <= len(part) <= n / 2 + 1
