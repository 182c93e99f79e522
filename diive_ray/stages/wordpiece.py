"""WordPiece greedy max-match tokenization (Schuster & Nakajima 2012;
the BERT tokenizer of Devlin et al. 2019, whose reference
implementation popularized greedy longest-match-first with ``##``
continuation marking and whole-word UNK fallback).

Completes the engine's tokenizer family alongside BPE (merge-order
replay, stages/bpe.py) and the unigram LM (Viterbi segmentation,
stages/unigram.py) — three genuinely different segmentation
algorithms over one shared vocabulary-learning pass. The vocabulary
here is derived deterministically from the BPE merge table (every
merge product and its parts, plus their characters); BERT's trained
position-aware vocab needs likelihood training that is out of scope,
and the divergence is documented: our pieces match position-agnostic,
the ``##`` mark is applied mechanically to non-initial pieces.

Ray shape: the same actor-pool contract as BpeEncoder — vocab built
once per actor in ``__init__``, per-batch distinct-word encoding with
a per-actor cache, token/UNK counts mapped back per doc. Text never
shuffles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def wordpiece_vocab(merges: pd.DataFrame, *, end_of_word: str = "</w>") -> set[str]:
    """Deterministic piece vocabulary from a BPE merge table: every
    merge product and both its parts (end-of-word marker stripped),
    plus every character appearing in them (so any in-alphabet word
    can always fall back to character pieces)."""
    pieces: set[str] = set()
    for left, right in zip(merges["left"], merges["right"]):
        for p in (left + right, left, right):
            p = p.replace(end_of_word, "")
            if p:
                pieces.add(p)
    for p in list(pieces):
        pieces.update(p)
    return pieces


def wordpiece_segment(
    word: str, vocab: set[str], *, max_piece_len: int = 32
) -> list[str] | None:
    """Greedy longest-match-first segmentation: at each position take
    the LONGEST substring (capped at ``max_piece_len``) present in
    ``vocab``; non-initial pieces are emitted with the ``##`` mark.
    Returns None when no piece matches at some position — the BERT
    whole-word [UNK] rule."""
    out: list[str] = []
    i, n = 0, len(word)
    while i < n:
        j = min(n, i + max_piece_len)
        piece = None
        while j > i:
            cand = word[i:j]
            if cand in vocab:
                piece = cand
                break
            j -= 1
        if piece is None:
            return None
        out.append(piece if i == 0 else "##" + piece)
        i = j
    return out


class WordPieceEncoder:
    """Actor-pool batch encoder (the BpeEncoder contract,
    stages/bpe.py:150): vocab from the broadcast merge table once per
    actor; per-batch distinct-word segmentation with a per-actor
    cache; emits (doc_id, source, n_words, n_pieces, n_unk_words)."""

    def __init__(self, merges: pd.DataFrame, *, id_col: str = "doc_id",
                 text_col: str = "text", source_col: str = "source") -> None:
        self.vocab = wordpiece_vocab(merges)
        self.id_col, self.text_col, self.source_col = id_col, text_col, source_col
        # cache: word -> (n_pieces, is_unk)
        self.cache: dict[str, tuple[int, int]] = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lists = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t[self.text_col]), pattern=r"\s+")
        flat = pc.list_flatten(lists)
        words = flat.to_pylist()
        for w in set(words):
            if w and w not in self.cache:
                seg = wordpiece_segment(w, self.vocab)
                self.cache[w] = (0, 1) if seg is None else (len(seg), 0)
        n_p = np.fromiter((self.cache.get(w, (0, 0))[0] for w in words),
                          dtype=np.int64, count=len(words))
        n_u = np.fromiter((self.cache.get(w, (0, 0))[1] for w in words),
                          dtype=np.int64, count=len(words))
        is_w = np.fromiter((1 if w else 0 for w in words),
                           dtype=np.int64, count=len(words))
        sizes = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        doc_ix = np.repeat(np.arange(len(t)), sizes)
        n_docs = len(t)
        return pa.table({
            self.id_col: t[self.id_col],
            self.source_col: t[self.source_col],
            "n_words": pa.array(np.bincount(doc_ix, weights=is_w,
                                            minlength=n_docs).astype(np.int64)),
            "n_pieces": pa.array(np.bincount(doc_ix, weights=n_p,
                                             minlength=n_docs).astype(np.int64)),
            "n_unk_words": pa.array(np.bincount(doc_ix, weights=n_u,
                                                minlength=n_docs).astype(np.int64)),
        })


def wordpiece_counts(
    ds, merges: pd.DataFrame, *, id_col: str = "doc_id",
    text_col: str = "text", source_col: str = "source",
    concurrency: tuple[int, int] | int = (1, 8),
):
    """Per-doc WordPiece piece/UNK counts under a BPE-derived vocab
    (actor pool; the merge table is bounded so it ships in the
    constructor — the bpe_encode_counts contract)."""
    return ds.map_batches(
        WordPieceEncoder, fn_constructor_kwargs={
            "merges": merges, "id_col": id_col, "text_col": text_col,
            "source_col": source_col},
        batch_format="pyarrow", zero_copy_batch=True, concurrency=concurrency,
    )
