"""BPE tokenizer training — byte-pair-encoding merge learning
(Sennrich et al. 2016) over a distributed corpus.

The classic algorithm trains on the WORD-FREQUENCY table, not the raw
stream: count words corpus-wide, then run the merge loop over the
(word, freq) vocabulary. That split is exactly the right distributed
shape: the counting pass is a per-batch vectorized partial + ONE tiny
exchange on the word (bounded by vocab size, not corpus size — the
text never moves), and the merge loop runs driver-side over the
bounded vocab (GPT-2's BPE was trained the same way: the pair-count
update per merge touches only words containing the merged pair).

Determinism: pair ties broken lexicographically, so the learned merge
table is a pure function of the word-frequency table — identical at
any cluster size / partitioning (pytest-pinned).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def word_freqs(
    ds: rd.Dataset, *, text_col: str = "text", num_partitions: int | None = None
) -> pd.DataFrame:
    """Corpus-wide word frequencies: per-batch split + value_counts
    partial (rows bounded by the batch's distinct words), ONE exchange
    on word, per-block sum. Returns (word, freq) sorted by word."""
    from .exchange import block_map

    def partial(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        words = pc.list_flatten(pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t[text_col]), pattern=r"\s+"))
        words = words.filter(pc.not_equal(words, ""))
        if len(words) == 0:
            return pd.DataFrame({"word": pd.Series([], dtype=object),
                                 "freq": pd.Series([], dtype=np.int64)})
        vc = words.to_pandas().value_counts()
        return pd.DataFrame({"word": vc.index.to_numpy(dtype=object),
                             "freq": vc.to_numpy(dtype=np.int64)})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("word", as_index=False)["freq"].sum()
        out["freq"] = out["freq"].astype(np.int64)
        return out

    out = block_map(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["word"], combine, batch_format="pandas",
        num_partitions=num_partitions, zero_copy_batch=False, weight_col="freq",
    ).to_pandas()
    return out.sort_values("word").reset_index(drop=True)


def learn_bpe(freqs: pd.DataFrame, k: int, *, end_of_word: str = "</w>") -> pd.DataFrame:
    """Sennrich merge loop over the (word, freq) table: each word is a
    symbol sequence (chars + end-of-word marker); k times, merge the
    most frequent adjacent symbol pair (ties broken lexicographically).
    Returns (rank, left, right, merged, pair_freq). Driver-side by
    design — the vocab table is the bounded object, and each merge
    touches only words containing the pair (indexed, not a full
    rescan)."""
    words = [tuple(w) + (end_of_word,) for w in freqs["word"]]
    wf = freqs["freq"].to_numpy(dtype=np.int64)

    # pair -> total freq, and pair -> set of word indexes containing it
    pair_freq: dict = {}
    pair_words: dict = {}

    def add_word(i: int, sym: tuple, sign: int) -> None:
        for a, b in zip(sym[:-1], sym[1:]):
            p = (a, b)
            pair_freq[p] = pair_freq.get(p, 0) + sign * int(wf[i])
            if sign > 0:
                pair_words.setdefault(p, set()).add(i)

    for i, sym in enumerate(words):
        add_word(i, sym, +1)

    merges = []
    for rank in range(k):
        live = [(f, p) for p, f in pair_freq.items() if f > 0]
        if not live:
            break
        best_f = max(f for f, _ in live)
        best = min(p for f, p in live if f == best_f)  # lexicographic tie-break
        merged = best[0] + best[1]
        merges.append((rank, best[0], best[1], merged, int(best_f)))
        for i in sorted(pair_words.get(best, ())):
            sym = words[i]
            add_word(i, sym, -1)
            out = []
            j = 0
            while j < len(sym):
                if j + 1 < len(sym) and (sym[j], sym[j + 1]) == best:
                    out.append(merged)
                    j += 2
                else:
                    out.append(sym[j])
                    j += 1
            words[i] = tuple(out)
            add_word(i, words[i], +1)

    return pd.DataFrame(
        merges, columns=["rank", "left", "right", "merged", "pair_freq"]
    ).astype({"rank": np.int64, "pair_freq": np.int64})


def bpe_train(
    ds: rd.Dataset, k: int, *, text_col: str = "text",
    num_partitions: int | None = None,
) -> pd.DataFrame:
    """Distributed word count -> driver merge loop. See module doc."""
    return learn_bpe(word_freqs(ds, text_col=text_col,
                                num_partitions=num_partitions), k)
