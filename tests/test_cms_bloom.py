"""Count-min sketch + Bloom filter (stages/sketch.py) and the
vectorized per-word polynomial hash (functions/text.py)."""

import numpy as np
import pandas as pd
import ray.data as rd


def _ds(texts, ids=None, parallelism=4):
    n = len(texts)
    return rd.from_pandas(pd.DataFrame({
        "doc_id": ids if ids is not None else np.arange(n, dtype=np.int64),
        "text": texts,
    })).repartition(parallelism)


def test_word_poly_hashes_match_fingerprint():
    from diive_ray.functions.text import polynomial_fingerprint, word_poly_hashes

    words = np.array(["a", "abc", "", "hello", "Zz9", "longer-word-here"],
                     dtype=object)
    got = word_poly_hashes(words)
    exp = polynomial_fingerprint(list(words))
    assert np.array_equal(got, exp)


def test_cms_never_underestimates_and_exact_when_sparse(ray_session):
    from diive_ray.stages.sketch import cms_build, cms_estimate

    rng = np.random.Generator(np.random.Philox(key=21))
    vocab = np.array([f"w{i:03d}" for i in range(50)], dtype=object)
    words = rng.choice(vocab, size=4000)
    texts = [" ".join(words[i::16]) for i in range(16)]
    cms = cms_build(_ds(texts))
    true = pd.Series(words).value_counts()
    est = cms_estimate(cms, true.index.to_numpy(dtype=object))
    assert (est >= true.to_numpy()).all()
    # 50 distinct words in 4 x 1024 buckets: collisions in ALL 4 rows
    # for the same word are essentially impossible -> exact estimates
    assert (est == true.to_numpy()).all()


def test_cms_mergeable(ray_session):
    """CMS(A ++ B) == CMS(A) + CMS(B): the combine the driver pass
    relies on."""
    from diive_ray.stages.sketch import cms_build

    a = ["x y z x", "p q"]
    b = ["x p p", "z z q"]
    whole = cms_build(_ds(a + b, parallelism=3))
    parts = cms_build(_ds(a, parallelism=2)) + cms_build(_ds(b, parallelism=2))
    assert np.array_equal(whole, parts)


def test_bloom_no_false_negatives(ray_session):
    from diive_ray.stages.sketch import bloom_build, bloom_probe

    corpus = [f"document number {i} content" for i in range(200)]
    probe_hit = corpus[:50]                      # seen texts
    probe_miss = [f"unseen text {i}" for i in range(50)]
    bits = bloom_build(_ds(corpus))
    out = bloom_probe(_ds(probe_hit + probe_miss), bits).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (out["in_bloom"].to_numpy()[:50] == 1).all()
    # ~800 set bits in 131072: false-positive rate is ~(0.006)^4
    assert (out["in_bloom"].to_numpy()[50:] == 0).all()


def test_bloom_positions_int64_safe():
    from diive_ray.stages.sketch import BLOOM_BITS, BLOOM_K, bloom_positions

    fp = np.array([0, 1, 2**31 - 2], dtype=np.int64)
    pos = bloom_positions(fp)
    assert pos.shape == (3, BLOOM_K)
    assert (pos >= 0).all() and (pos < BLOOM_BITS).all()


def test_vocab_jaccard_matches_pandas(ray_session, tmp_path):
    """source_vocab_jaccard vs a direct pandas set computation, and
    invariance to input partitioning."""
    import pyarrow.parquet as pq
    import pyarrow as pa
    from diive_ray.pipelines.docqueries import q_source_vocab_jaccard

    rng = np.random.Generator(np.random.Philox(key=23))
    vocab = np.array([f"w{i}" for i in range(40)], dtype=object)
    srcs = [f"s{i % 3}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=25)) for _ in range(30)]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(30, dtype=np.int64)),
        "text": texts, "source": srcs,
    }), str(tmp_path / "documents.parquet"))
    got = q_source_vocab_jaccard(str(tmp_path))
    sets = {}
    for s, t in zip(srcs, texts):
        sets.setdefault(s, set()).update(t.split())
    for _, r in got.iterrows():
        a, b = sets[r["source_a"]], sets[r["source_b"]]
        inter = len(a & b)
        assert r["inter"] == inter
        assert abs(r["jaccard"] - inter / len(a | b)) < 1e-6


def test_split_assign_deterministic_and_proportional(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import pyarrow as pa
    from diive_ray.pipelines.docqueries import q_doc_split_assign

    n = 5000
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": ["x"] * n,
        "source": ["s"] * n,
    }), str(tmp_path / "documents.parquet"))
    a = q_doc_split_assign(str(tmp_path))
    b = q_doc_split_assign(str(tmp_path))
    pd.testing.assert_frame_equal(a, b)
    by = dict(zip(a["split"], a["share"]))
    assert abs(by["train"] - 0.8) < 0.02
    assert abs(by["val"] - 0.1) < 0.02
    assert abs(by["test"] - 0.1) < 0.02
    assert a["n_docs"].sum() == n
