"""Bigram-LM perplexity (stages/lm.py) and SemDeDup
(stages/cluster.py:semdedup_flags): hand-computed model counts, scoring
sanity, sentinel paths, planted semantic duplicates, partitioning
invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from diive_ray.stages.lm import SENTINEL, BigramScorer, score_perplexity, train_bigram_lm


def test_train_bigram_lm_counts(ray_session):
    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["a b a b", "b a"],
    })
    model = train_bigram_lm(rd.from_pandas(docs), "text")
    assert list(model["vocab"]) == ["a", "b"]
    assert model["vocab_size"] == 2
    # bigrams: (a,b)x2, (b,a)x1 from doc1; (b,a)x1 from doc2
    # pair codes with nv=2: a->0, b->1 => (0,1)=1 count 2; (1,0)=2 count 2
    assert list(model["pair_codes"]) == [1, 2]
    assert list(model["pair_counts"]) == [2, 2]
    # contexts: a starts 2 bigrams, b starts 2
    assert list(model["ctx_counts"]) == [2, 2]


def test_score_perplexity_hand_computed(ray_session):
    docs = pd.DataFrame({"doc_id": [1, 2], "text": ["a b a b", "b a"]})
    ds = rd.from_pandas(docs)
    model = train_bigram_lm(ds, "text")
    out = score_perplexity(ds, model).to_pandas().sort_values("doc_id")
    # P(b|a) = (2+0.5)/(2+0.5*2) = 2.5/3, P(a|b) = 2.5/3 as well
    lp = np.log2(2.5 / 3.0)
    exp1 = np.mean([lp, lp, lp])
    assert out["n_bigrams"].tolist() == [3, 1]
    np.testing.assert_allclose(out["avg_logprob"].to_numpy(), [exp1, lp], rtol=1e-12)
    np.testing.assert_allclose(out["perplexity"].to_numpy(),
                               [2.0 ** -exp1, 2.0 ** -lp], rtol=1e-12)


def test_score_perplexity_repeated_phrase_scores_lower(ray_session):
    rng = np.random.default_rng(5)
    words = np.array([f"w{i}" for i in range(50)])
    random_docs = [" ".join(rng.choice(words, size=60)) for _ in range(40)]
    repeated = " ".join(["the quick brown fox"] * 15)
    docs = pd.DataFrame({
        "doc_id": np.arange(41),
        "text": random_docs + [repeated],
    })
    ds = rd.from_pandas(docs)
    model = train_bigram_lm(ds, "text")
    out = score_perplexity(ds, model).to_pandas()
    rep = out.loc[out["doc_id"] == 40, "perplexity"].iloc[0]
    rand_med = out.loc[out["doc_id"] < 40, "perplexity"].median()
    assert rep < rand_med / 3  # predictable text is far less perplexing


def test_score_perplexity_sentinels_and_oov(ray_session):
    train = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["a b a"]}))
    model = train_bigram_lm(train, "text")
    score = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b", "solo", "zz qq"],  # known pair / 1 word / OOV pair
    }))
    out = score_perplexity(score, model).to_pandas().sort_values("doc_id")
    assert out.loc[out["doc_id"] == 2, "n_bigrams"].iloc[0] == 0
    assert out.loc[out["doc_id"] == 2, "avg_logprob"].iloc[0] == SENTINEL
    # OOV pair: cb=0, c1=0 -> pure smoothing P = 0.5/(0.5*V)= 1/V
    V = model["vocab_size"]
    np.testing.assert_allclose(
        out.loc[out["doc_id"] == 3, "avg_logprob"].iloc[0], np.log2(1.0 / V), rtol=1e-12)


def _planted_embeddings(tmp_path=None):
    """3 well-separated direction groups; in each group vectors 0/1/2
    are near-identical (cos > 0.99), vector 3 is same cluster but
    farther. Written as list<float32> parquet — the production
    embeddings schema (ray tensor extension cells would not match
    the engine's list-array batch path)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(9)
    base = np.eye(3, 8, dtype=np.float64) + 0.01
    rows, ids = [], []
    vid = 0
    for g in range(3):
        for j in range(4):
            v = base[g].copy()
            v += 0.004 * rng.standard_normal(8) if j < 3 else 0.55 * rng.standard_normal(8)
            rows.append(v.astype(np.float32))
            ids.append(vid)
            vid += 1
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([r.tolist() for r in rows], pa.list_(pa.float32())),
    })
    path = "/tmp/diive_ray_test_semdedup.parquet"
    pq.write_table(t, path)
    return path


def test_semdedup_flags_planted_dups(ray_session):
    from diive_ray.stages.cluster import kmeans_lloyd, semdedup_flags

    path = _planted_embeddings()
    ds = rd.read_parquet(path)
    C, _ = kmeans_lloyd(ds, 3, n_iter=3)
    out = semdedup_flags(ds, C, threshold=0.95).to_pandas().sort_values("vec_id")
    by_id = out.set_index("vec_id")
    for g in range(3):
        first = 4 * g
        assert by_id.loc[first, "is_dup"] == 0  # lowest id in its group survives
        assert by_id.loc[first + 1, "is_dup"] == 1
        assert by_id.loc[first + 2, "is_dup"] == 1
    # near-identical triplet shares a cluster
    assert out.groupby("cluster")["vec_id"].count().max() >= 3


def test_semdedup_flags_partitioning_invariant(ray_session):
    from diive_ray.stages.cluster import kmeans_lloyd, semdedup_flags

    path = _planted_embeddings()
    C, _ = kmeans_lloyd(rd.read_parquet(path), 3, n_iter=3)
    a = semdedup_flags(rd.read_parquet(path), C, threshold=0.95).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    b = semdedup_flags(rd.read_parquet(path).repartition(7), C, threshold=0.95) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_train_bigram_lm_open_vocab_mg(ray_session):
    """VERDICT r3 #7: max_entries bounds driver state via Misra-Gries
    pruning + exact recount. On a Zipf-ish long-tail corpus (few head
    words, many singletons) the head words/pairs must survive with
    EXACT counts and the model vocab stays within the cap."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    rng = np.random.Generator(np.random.Philox(key=[97, 2026]))
    head = [f"h{i}" for i in range(8)]
    texts = []
    for i in range(600):
        words = list(rng.choice(head, size=6)) + [f"tail{i}"]  # unique tail word per doc
        texts.append(" ".join(words))
    docs = pd.DataFrame({"doc_id": np.arange(600), "text": texts})
    ds = rd.from_pandas(docs).repartition(6)

    capped = train_bigram_lm(ds, "text", max_entries=64)
    exact = train_bigram_lm(ds, "text")

    # vocab bounded by the cap (608 true distinct words)
    assert capped["vocab_size"] <= 64
    # every head word survives (true count ~450 >> N/(cap+1) ~ 65)
    assert set(head) <= set(capped["vocab"].tolist())
    # surviving counts are EXACT (recount pass), matching the full model
    exact_ix = {w: i for i, w in enumerate(exact["vocab"])}
    for w in head:
        ci = int(np.searchsorted(capped["vocab"], w))
        # context counts may differ (pairs into dropped tail words are
        # pruned), but each surviving PAIR count must equal the exact one
        assert capped["vocab"][ci] == w
    cap_pairs = dict(zip(capped["pair_codes"].tolist(), capped["pair_counts"].tolist()))
    nv_c, nv_e = capped["vocab_size"], exact["vocab_size"]
    for code_c, cnt_c in cap_pairs.items():
        w1 = capped["vocab"][code_c // nv_c]
        w2 = capped["vocab"][code_c % nv_c]
        code_e = exact_ix[w1] * nv_e + exact_ix[w2]
        j = int(np.searchsorted(exact["pair_codes"], code_e))
        assert exact["pair_codes"][j] == code_e
        assert cnt_c == exact["pair_counts"][j], (w1, w2)


def test_train_bigram_lm_capped_equals_exact_when_vocab_fits(ray_session):
    """With max_entries >= true distinct counts the MG path never
    decrements: the pruned model must equal the exact one bit-for-bit."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a b a c", "b a b", "c a b a"],
    })
    ds = rd.from_pandas(docs).repartition(3)
    exact = train_bigram_lm(ds, "text")
    capped = train_bigram_lm(ds, "text", max_entries=1000)
    np.testing.assert_array_equal(exact["vocab"], capped["vocab"])
    np.testing.assert_array_equal(exact["ctx_counts"], capped["ctx_counts"])
    np.testing.assert_array_equal(exact["pair_codes"], capped["pair_codes"])
    np.testing.assert_array_equal(exact["pair_counts"], capped["pair_counts"])
