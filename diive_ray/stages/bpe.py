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


def encode_word(word: str, ranks: dict, *, end_of_word: str = "</w>") -> list[str]:
    """Classic BPE encoding: repeatedly merge the LOWEST-RANK adjacent
    pair present (all its occurrences, left to right) until none of the
    learned merges applies. Replays training exactly for in-vocab
    words."""
    sym: list = list(word) + [end_of_word]
    while len(sym) > 1:
        best_rank, best = None, None
        for a, b in zip(sym[:-1], sym[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, (a, b)
        if best is None:
            break
        merged = best[0] + best[1]
        out, j = [], 0
        while j < len(sym):
            if j + 1 < len(sym) and (sym[j], sym[j + 1]) == best:
                out.append(merged)
                j += 2
            else:
                out.append(sym[j])
                j += 1
        sym = out
    return sym


class BpeEncoder:
    """Actor-pool batch encoder: the merge table (k rows, closure-tiny)
    builds the rank dict once per actor in ``__init__``; each batch
    splits docs to words, encodes only the batch's DISTINCT words
    (Zipf: distinct << total; an LRU-less per-actor cache carries hot
    words across batches), and maps token counts back per doc. Emits
    (doc_id, n_words, n_bpe_tokens) — the fertility inputs."""

    def __init__(self, merges: pd.DataFrame, *, id_col: str = "doc_id",
                 text_col: str = "text") -> None:
        self.ranks = {
            (l, r): int(rank)
            for rank, l, r in zip(merges["rank"], merges["left"], merges["right"])
        }
        self.id_col, self.text_col = id_col, text_col
        self.cache: dict[str, int] = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lists = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t[self.text_col]), pattern=r"\s+")
        flat = pc.list_flatten(lists)
        words = flat.to_pylist()
        for w in set(words):
            if w and w not in self.cache:
                self.cache[w] = len(encode_word(w, self.ranks))
        tok = np.fromiter((self.cache.get(w, 0) for w in words),
                          dtype=np.int64, count=len(words))
        is_word = np.fromiter((1 if w else 0 for w in words),
                              dtype=np.int64, count=len(words))
        offsets = np.asarray(pc.list_value_length(lists)).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(t)), offsets)
        n_words = np.bincount(doc_idx, weights=is_word, minlength=len(t)).astype(np.int64)
        n_tok = np.bincount(doc_idx, weights=tok, minlength=len(t)).astype(np.int64)
        return pa.table({
            self.id_col: t[self.id_col],
            "n_words": pa.array(n_words, pa.int64()),
            "n_bpe_tokens": pa.array(n_tok, pa.int64()),
        })


def bpe_encode_counts(
    ds: rd.Dataset, merges: pd.DataFrame, *, id_col: str = "doc_id",
    text_col: str = "text", concurrency: tuple[int, int] | int = (1, 8),
) -> rd.Dataset:
    """Per-doc BPE token counts under a learned merge table (actor
    pool; merges are bounded so they ship in the constructor)."""
    return ds.map_batches(
        BpeEncoder, fn_constructor_kwargs={
            "merges": merges, "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow", zero_copy_batch=True, concurrency=concurrency,
    )
