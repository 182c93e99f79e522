"""BM25 (stages/bm25.py) — hand-computed Okapi scores on a tiny corpus
and partitioning invariance of the two-pass top-k."""

import math

import numpy as np
import pandas as pd
import ray.data as rd

from diive_ray.stages.bm25 import bm25_topk, corpus_stats


DOCS = pd.DataFrame({
    "doc_id": [1, 2, 3, 4],
    "text": [
        "cat dog cat",
        "dog fish",
        "cat cat cat cat",
        "bird",
    ],
})


def _hand_score(tf, df, dl, n=4, avgdl=10 / 4, k1=1.2, b=0.75):
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_corpus_stats(ray_session):
    n, avgdl, df = corpus_stats(rd.from_pandas(DOCS).repartition(3),
                                ["cat", "dog", "bird", "absent"])
    assert n == 4 and avgdl == 10 / 4
    assert df.to_dict() == {"absent": 0, "bird": 1, "cat": 2, "dog": 2}


def test_hand_computed_scores(ray_session):
    out = bm25_topk(rd.from_pandas(DOCS).repartition(2),
                    {"q": ["cat"]}, k=4)
    assert out["doc_id"].tolist()[:2] in ([3, 1], [1, 3])
    got = dict(zip(out["doc_id"], out["score"]))
    want3 = _hand_score(tf=4, df=2, dl=4)
    want1 = _hand_score(tf=2, df=2, dl=3)
    assert got[3] == round(round(want3, 9), 6) or abs(got[3] - want3) < 1e-6
    assert abs(got[1] - want1) < 1e-6
    assert want3 > want1            # more occurrences wins here
    assert 2 not in got and 4 not in got  # no 'cat' -> no row


def test_multi_term_and_partitioning_invariance(ray_session):
    queries = {"a": ["cat", "dog"], "b": ["bird", "fish"]}
    one = bm25_topk(rd.from_pandas(DOCS).repartition(1), queries, k=3)
    many = bm25_topk(rd.from_pandas(DOCS).repartition(4), queries, k=3)
    pd.testing.assert_frame_equal(one, many)
    # doc 2 matches both dog(q a) and fish(q b)
    a = one[one["query_id"] == "a"]
    assert set(a["doc_id"]) <= {1, 2, 3}
    b = one[one["query_id"] == "b"]
    assert set(b["doc_id"]) == {2, 4}


def test_rare_term_outscores_common(ray_session):
    out = bm25_topk(rd.from_pandas(DOCS).repartition(2),
                    {"q": ["bird", "cat"]}, k=4)
    got = dict(zip(out["doc_id"], out["score"]))
    # df(bird)=1 < df(cat)=2 and dl(4)=1 is short -> bird doc tops
    assert out.iloc[0]["doc_id"] == 4
    assert got[4] > got[3]
