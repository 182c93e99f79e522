"""Unigram-LM tokenizer pins: Viterbi segmentation semantics and
tie-break, full-coverage invariant, frequent-substring survival under
pruning, partitioning invariance, encoder fertility arithmetic."""

import numpy as np
import pandas as pd
import pytest


def _logp(d):
    tot = sum(d.values())
    return {k: float(np.log(v / tot)) for k, v in d.items()}


def test_viterbi_prefers_probable_pieces():
    from diive_ray.stages.unigram import viterbi_segment

    # 'ab' so likely that 'abab' -> ['ab','ab'] beats char-by-char
    lp = _logp({"a": 1, "b": 1, "ab": 50})
    assert viterbi_segment("abab", lp, 4) == ["ab", "ab"]
    # without 'ab' it must fall back to chars (full coverage)
    lp2 = _logp({"a": 1, "b": 1})
    assert viterbi_segment("abab", lp2, 4) == ["a", "b", "a", "b"]


def test_viterbi_tie_prefers_longer_piece():
    from diive_ray.stages.unigram import viterbi_segment

    # 'ab' has EXACTLY the product prob of 'a'+'b' -> tie; the pin is
    # the longer piece wins (logp['ab'] == logp['a'] + logp['b'])
    lp = {"a": np.log(0.25), "b": np.log(0.25), "ab": np.log(0.0625)}
    assert viterbi_segment("ab", lp, 4) == ["ab"]


def test_train_recovers_planted_unit(ray_session):
    import ray.data as rd
    from diive_ray.stages.unigram import train_unigram

    # corpus where 'spark' is a high-frequency word: the 5-gram piece
    # 'spark' must survive pruning and words segment through it
    rng = np.random.Generator(np.random.Philox(key=[41, 2026]))
    fillers = ["xq", "zj", "vw", "kp", "mh"]
    texts = [
        " ".join(["spark"] * 5 + [fillers[int(rng.integers(5))] for _ in range(3)])
        for _ in range(40)
    ]
    ds = rd.from_pandas(pd.DataFrame({"text": texts}))
    pieces = train_unigram(ds, vocab_size=24, max_piece_len=5, seed_size=64, n_iters=3)
    assert "spark" in set(pieces["piece"])
    # coverage: every single character of the corpus stays in the vocab
    chars = set("".join(texts).replace(" ", ""))
    assert chars <= set(pieces["piece"])


def test_train_partitioning_invariant(ray_session):
    import ray.data as rd
    from diive_ray.stages.unigram import train_unigram

    rng = np.random.Generator(np.random.Philox(key=[43, 2026]))
    words = ["alpha", "beta", "gamma", "delta", "aa", "ab"]
    texts = [" ".join(words[int(i)] for i in rng.integers(0, 6, 12)) for _ in range(60)]
    df = pd.DataFrame({"text": texts})
    a = train_unigram(rd.from_pandas(df).repartition(2), vocab_size=32,
                      max_piece_len=5, seed_size=128, n_iters=2)
    b = train_unigram(rd.from_pandas(df).repartition(9), vocab_size=32,
                      max_piece_len=5, seed_size=128, n_iters=2)
    pd.testing.assert_frame_equal(a, b)


def test_fertility_arithmetic(ray_session):
    import ray
    import ray.data as rd
    from diive_ray.stages.unigram import UnigramEncoder, unigram_fertility

    # vocab of chars only -> pieces per word == word length
    lp = _logp({c: 1 for c in "abcde"})
    pieces = pd.DataFrame({"piece": list(lp), "logp": list(lp.values())})
    ds = rd.from_pandas(pd.DataFrame({
        "source": ["s1", "s1", "s2"],
        "text": ["ab cde", "e", "abcde abcde"],
    }))
    out = unigram_fertility(ds, pieces, keys=["source"], max_piece_len=3)
    by = out.set_index("source")
    assert by.loc["s1", "n_words"] == 3 and by.loc["s1", "n_pieces"] == 6
    assert by.loc["s2", "pieces_per_word"] == pytest.approx(5.0)
