"""BPE merge learning (stages/bpe.py, Sennrich et al. 2016).

Pins: (1) the paper's worked vocabulary example — first merges must be
e+s -> es, es+t -> est (the published sequence); (2) an independent
naive O(k·vocab) rescan implementation agrees on a random corpus;
(3) the distributed word count + merge table is partitioning-invariant.
"""

import numpy as np
import pandas as pd

from diive_ray.stages.bpe import bpe_train, learn_bpe, word_freqs


PAPER_FREQS = pd.DataFrame({
    "word": ["low", "lower", "newest", "widest"],
    "freq": [5, 2, 6, 3],
})


def _naive_learn(freqs: pd.DataFrame, k: int, end: str = "</w>"):
    """Independent reference: full pair rescan every iteration."""
    words = {i: tuple(w) + (end,) for i, w in enumerate(freqs["word"])}
    wf = freqs["freq"].to_numpy(dtype=np.int64)
    merges = []
    for rank in range(k):
        counts: dict = {}
        for i, sym in words.items():
            for a, b in zip(sym[:-1], sym[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + int(wf[i])
        if not counts:
            break
        best_f = max(counts.values())
        best = min(p for p, f in counts.items() if f == best_f)
        merged = best[0] + best[1]
        merges.append((rank, best[0], best[1], merged, best_f))
        for i, sym in words.items():
            out, j = [], 0
            while j < len(sym):
                if j + 1 < len(sym) and (sym[j], sym[j + 1]) == best:
                    out.append(merged)
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            words[i] = tuple(out)
    return pd.DataFrame(
        merges, columns=["rank", "left", "right", "merged", "pair_freq"]
    ).astype({"rank": np.int64, "pair_freq": np.int64})


def test_paper_worked_example():
    got = learn_bpe(PAPER_FREQS, k=5)
    # Sennrich 2016 fig.1: es (9), est (9); then est</w> closes the
    # suffix, then the 'low' stem merges at freq 7.
    assert list(got.loc[0, ["left", "right", "pair_freq"]]) == ["e", "s", 9]
    assert list(got.loc[1, ["left", "right", "pair_freq"]]) == ["es", "t", 9]
    assert list(got.loc[2, ["left", "right", "pair_freq"]]) == ["est", "</w>", 9]
    assert list(got.loc[3, ["left", "right", "pair_freq"]]) == ["l", "o", 7]
    assert list(got.loc[4, ["left", "right", "pair_freq"]]) == ["lo", "w", 7]


def test_matches_naive_rescan_on_random_corpus():
    rng = np.random.Generator(np.random.Philox(key=[7, 2026]))
    alphabet = list("abcdef")
    words = sorted({
        "".join(rng.choice(alphabet, size=rng.integers(1, 8)))
        for _ in range(80)
    })
    freqs = pd.DataFrame({
        "word": words,
        "freq": rng.integers(1, 50, size=len(words)),
    })
    got = learn_bpe(freqs, k=25)
    want = _naive_learn(freqs, k=25)
    pd.testing.assert_frame_equal(got, want)


def test_exhausts_cleanly():
    got = learn_bpe(pd.DataFrame({"word": ["ab"], "freq": [3]}), k=100)
    # a+b, ab+</w> — then no pairs remain.
    assert len(got) == 2
    assert got["merged"].tolist() == ["ab", "ab</w>"]


def test_encode_word_rank_order():
    from diive_ray.stages.bpe import encode_word

    merges = learn_bpe(PAPER_FREQS, k=5)
    ranks = {(l, r): int(rk) for rk, l, r in
             zip(merges["rank"], merges["left"], merges["right"])}
    # es -> est -> est</w> -> lo -> low, then no merge applies
    assert encode_word("lowest", ranks) == ["low", "est</w>"]
    assert encode_word("newest", ranks) == ["n", "e", "w", "est</w>"]
    assert encode_word("low", ranks) == ["low", "</w>"]
    assert encode_word("zzz", ranks) == ["z", "z", "z", "</w>"]


def test_encode_replays_training_symbols():
    """Encoding a training word under the full rank table reproduces
    the trainer's final symbol sequence for that word."""
    rng = np.random.Generator(np.random.Philox(key=[13, 2026]))
    words = sorted({
        "".join(rng.choice(list("abcd"), size=rng.integers(1, 7)))
        for _ in range(40)
    })
    freqs = pd.DataFrame({
        "word": words, "freq": rng.integers(1, 30, size=len(words))})
    merges = learn_bpe(freqs, k=40)
    ranks = {(l, r): int(rk) for rk, l, r in
             zip(merges["rank"], merges["left"], merges["right"])}

    # trainer-side final states via the naive replay
    final = {i: tuple(w) + ("</w>",) for i, w in enumerate(freqs["word"])}
    for _, row in merges.iterrows():
        best = (row["left"], row["right"])
        merged = row["merged"]
        for i, sym in final.items():
            out, j = [], 0
            while j < len(sym):
                if j + 1 < len(sym) and (sym[j], sym[j + 1]) == best:
                    out.append(merged)
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            final[i] = tuple(out)

    from diive_ray.stages.bpe import encode_word

    for i, w in enumerate(freqs["word"]):
        assert tuple(encode_word(w, ranks)) == final[i], w


def test_encode_counts_dataset(ray_session):
    import ray.data as rd

    from diive_ray.stages.bpe import bpe_encode_counts

    merges = learn_bpe(PAPER_FREQS, k=5)
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["lowest newest", "  low  ", ""],
    })
    out = (
        bpe_encode_counts(rd.from_pandas(df).repartition(3), merges)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # lowest->2, newest->4 | low->2 | empty->0
    assert out["n_words"].tolist() == [2, 1, 0]
    assert out["n_bpe_tokens"].tolist() == [6, 2, 0]


def test_distributed_partitioning_invariant(ray_session):
    import ray.data as rd

    rng = np.random.Generator(np.random.Philox(key=[11, 2026]))
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 20)))
        for _ in range(400)
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})

    wf = word_freqs(rd.from_pandas(df).repartition(7), num_partitions=5)
    exact = (
        pd.Series(" ".join(texts).split()).value_counts().rename_axis("word")
        .reset_index(name="freq").sort_values("word").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        wf.astype({"freq": np.int64}), exact.astype({"freq": np.int64})
    )

    one = bpe_train(rd.from_pandas(df).repartition(1), k=20, num_partitions=2)
    many = bpe_train(rd.from_pandas(df).repartition(9), k=20, num_partitions=6)
    pd.testing.assert_frame_equal(one, many)
    want = learn_bpe(exact, k=20)
    pd.testing.assert_frame_equal(one, want)
