"""Corpus text statistics (stages/textstats.py) + Kneser-Ney bigram
scoring (stages/lm.py:KneserNeyScorer) + JL projection
(stages/similarity.py:jl_project): planted-parameter recovery,
hand-worked probability pins, partitioning invariance."""

import numpy as np
import pandas as pd
import ray.data as rd


def _docs_ds(texts, sources=None, ids=None, parallelism=4):
    n = len(texts)
    return rd.from_pandas(pd.DataFrame({
        "doc_id": ids if ids is not None else np.arange(n, dtype=np.int64),
        "source": sources if sources is not None else ["s0"] * n,
        "text": texts,
    })).repartition(parallelism)


# ------------------------------------------------------------ zipf_fit


def test_zipf_fit_recovers_planted_slope(ray_session):
    """A corpus whose word frequencies are exactly freq(r) = C * r^-s
    must fit slope -s (log-log OLS is exact on exact power-law
    points)."""
    from diive_ray.stages.textstats import zipf_fit

    s = 1.3
    ranks = np.arange(1, 101)
    freqs = np.round(5000.0 * ranks ** (-s)).astype(np.int64)
    words = []
    for r, f in zip(ranks, freqs):
        words.extend([f"w{r:03d}"] * int(f))
    rng = np.random.Generator(np.random.Philox(key=3))
    words = np.array(words, dtype=object)
    rng.shuffle(words)
    texts = [" ".join(words[i::40]) for i in range(40)]
    out = zipf_fit(_docs_ds(texts), key_col="source", top_n=100)
    assert len(out) == 1
    # rounding of freq(r) to integers bends the tail slightly
    assert abs(out["zipf_slope"].iloc[0] - (-s)) < 0.02
    assert out["r2"].iloc[0] > 0.999
    assert out["n_ranks"].iloc[0] == 100


def test_zipf_fit_partitioning_invariant(ray_session):
    from diive_ray.stages.textstats import zipf_fit

    rng = np.random.Generator(np.random.Philox(key=7))
    vocab = np.array([f"t{i:03d}" for i in range(300)], dtype=object)
    p = 1.0 / np.arange(1, 301)
    p /= p.sum()
    texts = [" ".join(rng.choice(vocab, size=200, p=p)) for _ in range(30)]
    srcs = ["a"] * 15 + ["b"] * 15
    a = zipf_fit(_docs_ds(texts, srcs, parallelism=1), top_n=50)
    b = zipf_fit(_docs_ds(texts, srcs, parallelism=9), top_n=50)
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


# ------------------------------------------------------------ top n-grams


def test_top_ngrams_counts_and_ties(ray_session):
    from diive_ray.stages.textstats import keyed_term_counts, top_terms

    texts = [
        "click here now click here now click here",  # "click here now" x2
        "buy it now buy it now",                      # "buy it now" x2
        "one two three",                              # singleton
    ]
    counts = keyed_term_counts(_docs_ds(texts), key_col="source", ngram=3)
    top = top_terms(counts, key_col="source", k=3)
    assert list(top["term"]) == [
        "buy it now", "click here now", "here now click"]
    assert list(top["freq"]) == [2, 2, 2]      # tie -> ngram ASC
    assert list(top["rnk"]) == [1, 2, 3]


def test_ngram_respects_doc_boundaries(ray_session):
    """No trigram may span two docs; docs shorter than n contribute
    nothing."""
    from diive_ray.stages.textstats import keyed_term_counts

    texts = ["a b", "c d e", "  "]
    counts = keyed_term_counts(_docs_ds(texts), key_col="source",
                               ngram=3).to_pandas()
    assert list(counts["term"]) == ["c d e"]
    assert list(counts["freq"]) == [1]


def test_keyed_word_counts_match_pandas(ray_session):
    from diive_ray.stages.textstats import keyed_term_counts

    rng = np.random.Generator(np.random.Philox(key=11))
    vocab = np.array(list("abcdefgh"), dtype=object)
    texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(20)]
    srcs = [f"s{i % 3}" for i in range(20)]
    got = keyed_term_counts(_docs_ds(texts, srcs), key_col="source") \
        .to_pandas().sort_values(["source", "term"]).reset_index(drop=True)
    rows = []
    for t, s in zip(texts, srcs):
        rows.extend((s, w) for w in t.split())
    exp = pd.DataFrame(rows, columns=["source", "term"]) \
        .groupby(["source", "term"]).size().reset_index(name="freq")
    exp["freq"] = exp["freq"].astype(np.int64)
    pd.testing.assert_frame_equal(got, exp)


# ------------------------------------------------------------ Kneser-Ney


def test_kneser_ney_hand_worked(ray_session):
    """Single doc 'a b a b c': bigrams ab, ba, ab, bc.
    c(a b)=2 c(b a)=1 c(b c)=1; c(a .)=2 c(b .)=2;
    N1+(a,.)=1 N1+(b,.)=2; N1+(.,a)=1 N1+(.,b)=1 N1+(.,c)=1; B=3.
    D=0.75:
      P(b|a) = (2-.75)/2 + .75*1/2*(1/3) = 0.625 + 0.125 = 0.75
      P(a|b) = (1-.75)/2 + .75*2/2*(1/3) = 0.125 + 0.25  = 0.375
      P(c|b) = same as P(a|b) = 0.375
    """
    from diive_ray.stages.lm import score_kneser_ney, train_bigram_lm

    ds = _docs_ds(["a b a b c"], parallelism=1)
    model = train_bigram_lm(ds, "text")
    out = score_kneser_ney(ds, model).to_pandas()
    expected_lp = np.mean(np.log([0.75, 0.375, 0.75, 0.375]))
    assert out["n_bigrams"].iloc[0] == 4
    assert abs(out["kn_avg_logprob"].iloc[0] - expected_lp) < 1e-12
    assert abs(out["kn_perplexity"].iloc[0] - np.exp(-expected_lp)) < 1e-12


def test_kneser_ney_probabilities_normalize(ray_session):
    """For any seen context w1, sum over the TRAINING vocab of
    P_KN(w2|w1) must be <= 1 + tiny (equality when every w2 was seen
    after some context, which holds here since every vocab word occurs
    in non-initial position)."""
    from diive_ray.stages.lm import KneserNeyScorer, train_bigram_lm

    rng = np.random.Generator(np.random.Philox(key=13))
    vocab = np.array(list("abcdef"), dtype=object)
    texts = [" ".join(rng.choice(vocab, size=50)) for _ in range(10)]
    model = train_bigram_lm(_docs_ds(texts), "text")
    sc = KneserNeyScorer.__new__(KneserNeyScorer)
    KneserNeyScorer.__init__(sc, model)
    V = model["vocab_size"]
    for c1 in range(V):
        if sc.ctx_counts[c1] == 0:
            continue
        codes = c1 * np.int64(V) + np.arange(V, dtype=np.int64)
        ix = np.searchsorted(sc.pair_codes, codes)
        ixc = np.clip(ix, 0, len(sc.pair_codes) - 1)
        hit = (ix < len(sc.pair_codes)) & (sc.pair_codes[ixc] == codes)
        cb = np.where(hit, sc.pair_counts[ixc], 0).astype(float)
        c1n = float(sc.ctx_counts[c1])
        p = np.maximum(cb - 0.75, 0) / c1n \
            + 0.75 * sc.fwd_types[c1] / c1n * (sc.bwd_types / sc.n_pair_types)
        assert abs(p.sum() - 1.0) < 1e-9


def test_kneser_ney_sentinel_short_docs(ray_session):
    from diive_ray.stages.lm import score_kneser_ney, train_bigram_lm

    ds = _docs_ds(["a b c d", "solo"], parallelism=1)
    model = train_bigram_lm(ds, "text")
    out = score_kneser_ney(ds, model).to_pandas().sort_values("doc_id")
    assert out["n_bigrams"].tolist() == [3, 0]
    assert out["kn_perplexity"].iloc[1] == -9999.0


# ------------------------------------------------------------ JL projection


def test_jl_sign_matrix_deterministic_and_balanced():
    from diive_ray.stages.similarity import jl_sign_matrix

    a = jl_sign_matrix(64, 8)
    b = jl_sign_matrix(64, 8)
    assert np.array_equal(a, b)
    assert set(np.unique(a)) == {-1.0, 1.0}
    # hash signs are near-balanced, not degenerate
    assert 0.3 < (a > 0).mean() < 0.7
    # rows are not all identical (the parity-pattern failure mode)
    assert len(np.unique(a, axis=0)) > 32


def test_jl_projection_preserves_distances(ray_session):
    """JL lemma sanity: with k=32 on unit-ish vectors, projected
    pairwise squared distances stay within a loose (0.4, 1.6) factor
    for the vast majority of pairs."""
    from diive_ray.stages.similarity import jl_project

    import pyarrow as pa

    rng = np.random.Generator(np.random.Philox(key=17))
    X = rng.normal(size=(60, 128))
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(60, dtype=np.int64)),
        "embedding": pa.array([row.astype(np.float32).tolist() for row in X],
                              type=pa.list_(pa.float32())),
    })).repartition(4)
    out = jl_project(ds, k=32).to_pandas()
    P = out.pivot(index="vec_id", columns="dim", values="proj") \
        .sort_index().to_numpy()
    Xf = X.astype(np.float64)
    d_orig = ((Xf[:, None, :] - Xf[None, :, :]) ** 2).sum(-1)
    d_proj = ((P[:, None, :] - P[None, :, :]) ** 2).sum(-1)
    iu = np.triu_indices(60, 1)
    ratio = d_proj[iu] / d_orig[iu]
    assert (np.abs(ratio - 1) < 0.6).mean() > 0.95
    assert 0.8 < np.median(ratio) < 1.2
