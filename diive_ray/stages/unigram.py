"""Unigram-LM tokenizer training (Kudo 2018, arXiv:1804.10959 — the
SentencePiece unigram model) over a distributed corpus, completing the
tokenizer family next to BPE (stages/bpe.py).

Same distributed shape as BPE training: the corpus-scale work is ONE
word-frequency pass (per-batch vectorized partials + a vocab-bounded
exchange — the text never moves, stages/bpe.py:word_freqs); training
then runs over the bounded (word, freq) table. The E-step is itself
distributed: the candidate piece table is broadcast once via
``ray.put``, each batch of distinct words Viterbi-segments its words
and emits piece-count partials (rows bounded by the piece vocab), and
a tiny driver combine re-estimates the probabilities — the
bounded-state broadcast + vocab-bounded-partials pattern that survives
any corpus size.

Determinism (pytest-pinned): hard-EM (Viterbi counts, not full
forward-backward) with an explicit DP tie-break — on equal score,
prefer the LONGER final piece — and count-then-lexicographic pruning
order, so the learned vocabulary is a pure function of the word
frequency table (identical at any partitioning / cluster size).
Single-character pieces are never pruned, so every word always has a
segmentation (full coverage, the SentencePiece invariant).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def seed_pieces(freqs: pd.DataFrame, *, max_piece_len: int = 6, seed_size: int = 512) -> pd.DataFrame:
    """Candidate seed vocabulary: all substrings (length 1..L) of the
    distinct words, scored by freq-weighted occurrence count; keep the
    ``seed_size`` best multi-char pieces (count desc, piece asc) plus
    ALL single characters. Runs over the bounded word table."""
    counts: dict = {}
    for w, f in zip(freqs["word"], freqs["freq"].to_numpy(dtype=np.int64)):
        n = len(w)
        for i in range(n):
            for l in range(1, min(max_piece_len, n - i) + 1):
                p = w[i : i + l]
                counts[p] = counts.get(p, 0) + int(f)
    items = pd.DataFrame({"piece": list(counts), "count": list(counts.values())})
    chars = items[items["piece"].str.len() == 1]
    multi = items[items["piece"].str.len() > 1].sort_values(
        ["count", "piece"], ascending=[False, True]
    ).head(seed_size)
    out = pd.concat([chars, multi], ignore_index=True)
    return out.sort_values("piece").reset_index(drop=True)


def viterbi_segment(word: str, logp: dict, max_piece_len: int) -> list[str]:
    """Best segmentation of one word under piece log-probs; ties prefer
    the longer final piece. Assumes every single char is in ``logp``."""
    n = len(word)
    best = np.full(n + 1, -np.inf)
    back = np.full(n + 1, -1, dtype=np.int64)
    best[0] = 0.0
    for i in range(1, n + 1):
        # j ascending => the smallest j (longest final piece) is tried
        # first, and strict > keeps it on score ties
        for j in range(max(0, i - max_piece_len), i):
            lp = logp.get(word[j:i])
            if lp is None or best[j] == -np.inf:
                continue
            sc = best[j] + lp
            if sc > best[i]:
                best[i] = sc
                back[i] = j
    pieces = []
    i = n
    while i > 0:
        j = int(back[i])
        pieces.append(word[j:i])
        i = j
    return pieces[::-1]


def _estep_counts(
    freq_ds: rd.Dataset, logp_ref, max_piece_len: int
) -> pd.DataFrame:
    """Distributed E-step: per-batch Viterbi over DISTINCT words with
    the broadcast piece table, emitting freq-weighted piece-count
    partials (bounded by the piece vocab); one driver combine."""
    from .exchange import driver_combine

    def partial(t: pa.Table) -> pd.DataFrame:
        logp = ray.get(logp_ref)
        cnt: dict = {}
        for w, f in zip(t["word"].to_pylist(), t["freq"].to_numpy(zero_copy_only=False)):
            for p in viterbi_segment(w, logp, max_piece_len):
                cnt[p] = cnt.get(p, 0) + int(f)
        return pd.DataFrame({"piece": list(cnt), "count": list(cnt.values())})

    def combine(parts: pd.DataFrame) -> pd.DataFrame:
        out = parts.groupby("piece", as_index=False)["count"].sum()
        out["count"] = out["count"].astype(np.int64)
        return out

    return driver_combine(freq_ds, partial, combine, batch_format="pyarrow")


def train_unigram(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    vocab_size: int = 64,
    max_piece_len: int = 6,
    seed_size: int = 512,
    n_iters: int = 4,
    shrink: float = 0.75,
) -> pd.DataFrame:
    """Train the unigram tokenizer: distributed word counts, seed
    substring vocab, then EM rounds of (distributed Viterbi E-step,
    driver M-step + pruning) shrinking the multi-char piece set by
    ``shrink`` per round until ``vocab_size`` total pieces. Returns
    (piece, count, logp) sorted by piece."""
    from .bpe import word_freqs

    freqs = word_freqs(ds, text_col=text_col)
    pieces = seed_pieces(freqs, max_piece_len=max_piece_len, seed_size=seed_size)
    # initial probs from seed counts
    total = float(pieces["count"].sum())
    logp = {p: float(np.log(c / total)) for p, c in zip(pieces["piece"], pieces["count"])}

    freq_ds = rd.from_pandas(freqs)
    counts = pd.DataFrame({"piece": list(logp), "count": 0})
    for _ in range(n_iters):
        logp_ref = ray.put(logp)
        counts = _estep_counts(freq_ds, logp_ref, max_piece_len)
        used = dict(zip(counts["piece"], counts["count"].to_numpy(dtype=np.int64)))
        # chars are never pruned (coverage); floor their count at 1
        chars = sorted({p for p in logp if len(p) == 1})
        multi = pd.DataFrame({
            "piece": [p for p in used if len(p) > 1],
            "count": [used[p] for p in used if len(p) > 1],
        })
        n_multi_target = max(0, vocab_size - len(chars))
        if len(multi) > n_multi_target:
            keep_n = max(n_multi_target, int(len(multi) * shrink))
            multi = multi.sort_values(["count", "piece"], ascending=[False, True]).head(keep_n)
        kept = {p: int(c) for p, c in zip(multi["piece"], multi["count"])}
        for c in chars:
            kept[c] = max(int(used.get(c, 0)), 1)
        tot = float(sum(kept.values()))
        logp = {p: float(np.log(c / tot)) for p, c in kept.items()}

    out = pd.DataFrame({
        "piece": list(logp),
        "count": [int(counts.set_index("piece")["count"].get(p, 0)) for p in logp],
        "logp": [logp[p] for p in logp],
    })
    return out.sort_values("piece").reset_index(drop=True)


class UnigramEncoder:
    """Actor-pool encoder: piece table broadcast once (``ray.put`` ref
    in ``__init__``), per-batch segmentation with a per-actor distinct-
    word cache — the BPE-encoder shape (stages/bpe.py)."""

    def __init__(self, logp_ref, max_piece_len: int = 6, text_col: str = "text"):
        self.logp = ray.get(logp_ref) if not isinstance(logp_ref, dict) else logp_ref
        self.max_piece_len = max_piece_len
        self.text_col = text_col
        self._cache: dict = {}

    def segment_word(self, w: str) -> list[str]:
        got = self._cache.get(w)
        if got is None:
            got = viterbi_segment(w, self.logp, self.max_piece_len)
            self._cache[w] = got
        return got

    def __call__(self, t: pa.Table) -> pa.Table:
        n_pieces = np.zeros(len(t), dtype=np.int64)
        n_words = np.zeros(len(t), dtype=np.int64)
        for i, txt in enumerate(t[self.text_col].to_pylist()):
            ws = txt.split()
            n_words[i] = len(ws)
            n_pieces[i] = sum(len(self.segment_word(w)) for w in ws)
        cols = {c: t[c] for c in t.column_names if c != self.text_col}
        cols["n_words"] = pa.array(n_words, pa.int64())
        cols["n_pieces"] = pa.array(n_pieces, pa.int64())
        return pa.table(cols)


def unigram_fertility(
    ds: rd.Dataset, pieces: pd.DataFrame, *, text_col: str = "text",
    keys: list[str] = ("source",), max_piece_len: int = 6,
) -> pd.DataFrame:
    """Per-key tokenizer fertility (pieces per word) under a trained
    unigram vocab: encoder actor pool + a tiny keyed combine."""
    logp_ref = ray.put(dict(zip(pieces["piece"], pieces["logp"])))
    enc = ds.map_batches(
        UnigramEncoder,
        fn_constructor_args=(logp_ref, max_piece_len, text_col),
        batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8),
    )
    agg = enc.map_batches(
        lambda df: df.groupby(list(keys), as_index=False)[["n_words", "n_pieces"]].sum(),
        batch_format="pandas",
    ).to_pandas()
    out = agg.groupby(list(keys), as_index=False)[["n_words", "n_pieces"]].sum()
    out["pieces_per_word"] = out["n_pieces"] / out["n_words"]
    out["n_words"] = out["n_words"].astype("int64")
    out["n_pieces"] = out["n_pieces"].astype("int64")
    return out.sort_values(list(keys)).reset_index(drop=True)
