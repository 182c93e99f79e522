"""MMR rerank (similarity.py:mmr_rerank): near-duplicate suppression,
the lambda=1 reduction to plain top-k, and partitioning invariance."""

import numpy as np
import pandas as pd
import ray.data as rd

from diive_ray.stages import similarity as sim


def _corpus():
    rng = np.random.Generator(np.random.Philox(key=[29, 2026]))
    # cluster A: 3 near-duplicates highly similar to the query;
    # B, C: distinct directions, moderately relevant
    q = np.array([1.0, 0.0, 0.0, 0.0])
    a = np.array([0.98, 0.1, 0.0, 0.0])
    dup1 = a + rng.normal(0, 0.005, 4)
    dup2 = a + rng.normal(0, 0.005, 4)
    b = np.array([0.7, 0.7, 0.0, 0.0])
    c = np.array([0.7, 0.0, 0.7, 0.0])
    far = np.array([0.0, 0.0, 0.0, 1.0])
    embs = [a, dup1, dup2, b, c, far]
    df = pd.DataFrame({"vec_id": np.arange(10, 16),
                       "embedding": [e.tolist() for e in embs]})
    return q.reshape(1, -1), df


def test_mmr_suppresses_near_duplicates(ray_session):
    q, df = _corpus()
    ds = rd.from_pandas(df).repartition(3)
    out = sim.mmr_rerank(ds, q, k=3, pool=6, lam=0.5, query_ids=np.array([0]))
    picked = out["vec_id"].tolist()
    # first pick = most relevant (one of the dup cluster); the other
    # two near-duplicates must be suppressed in favour of diverse
    # directions (b/c/far), even though they out-rank those on raw sim
    assert picked[0] in (10, 11, 12)
    assert len(set(picked) & {10, 11, 12}) == 1
    assert len(set(picked) & {13, 14, 15}) == 2
    # plain top-3 by relevance would have been all three dups
    top = sim.knn_brute_force(ds, q, 3, query_ids=np.array([0]),
                              exclude_self=False)
    assert set(top["vec_id"]) == {10, 11, 12}


def test_lambda_one_is_plain_topk(ray_session):
    q, df = _corpus()
    ds = rd.from_pandas(df).repartition(2)
    mmr = sim.mmr_rerank(ds, q, k=4, pool=6, lam=1.0, query_ids=np.array([0]))
    top = sim.knn_brute_force(ds, q, 4, query_ids=np.array([0]),
                              exclude_self=False)
    assert mmr["vec_id"].tolist() == top.sort_values("rank")["vec_id"].tolist()


def test_partitioning_invariant(ray_session):
    q, df = _corpus()
    a = sim.mmr_rerank(rd.from_pandas(df).repartition(1), q, k=4, pool=6,
                       lam=0.7, query_ids=np.array([0]))
    b = sim.mmr_rerank(rd.from_pandas(df).repartition(6), q, k=4, pool=6,
                       lam=0.7, query_ids=np.array([0]))
    pd.testing.assert_frame_equal(a, b)
