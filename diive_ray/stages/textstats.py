"""Corpus-level text statistics: keyed word / n-gram frequency tables,
Zipf rank-frequency fits and top-n-gram boilerplate detection.

Reference scope: the diive reference has no corpus-text counterpart;
these are driver-brief training-data operators (text-analysis family,
companions to stages/bpe.py:word_freqs and functions/text.py). The
Zipf fit is the classic rank-frequency power law (Zipf 1935; Piantadosi
2014 review); repeated-trigram top-k is the standard boilerplate probe
(C4, Raffel et al. 2020 arXiv:1910.10683, removed boilerplate lines by
exactly this kind of frequent-n-gram census).

Design for 100 TB:
* Counting: one ``map_batches`` pass emits per-batch (key, term, n)
  value_counts partials — the corpus text never shuffles; ONE hash
  exchange on (key, term) sums the partials, so no block ever holds
  more than its hash-share of the vocabulary (hot SOURCES are fine:
  the exchange key includes the term, so a single source's vocabulary
  spreads over all partitions — the VERDICT r3 hot-key rule).
* Top-k: global top-k per key is the union of per-block top-k once
  counts are final (each block holds complete (key, term) groups), so
  a second stateless pass emits bounded (blocks x keys x k) candidate
  rows and the driver keeps the true top-k. No full sort, no
  whole-vocab driver state.
* Fit: the OLS runs over <= top_n points per key on the driver —
  bounded by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def _split_words(texts: pa.ChunkedArray | pa.Array):
    """Whitespace-tokenize a text column: returns (flat word array,
    per-doc word counts) with empty fragments removed — identical
    semantics to DuckDB ``list_filter(regexp_split_to_array(text,
    '\\s+'), x -> x <> '')`` (both Arrow and DuckDB run RE2)."""
    lists = pc.split_pattern_regex(texts, pattern=r"\s+")
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    words = flat.to_numpy(zero_copy_only=False)[keep]
    parents = parents[keep]
    lengths = np.bincount(parents, minlength=len(texts)).astype(np.int64)
    return words, lengths


def _ngram_join(words: np.ndarray, lengths: np.ndarray, n: int) -> np.ndarray:
    """Space-joined word n-grams within doc boundaries (vectorized:
    object-array concat, no per-row Python)."""
    total = int(lengths.sum())
    if total < n:
        return np.empty(0, dtype=object)
    doc_ix = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
    pos = np.arange(total - n + 1, dtype=np.int64)
    same = doc_ix[pos] == doc_ix[pos + n - 1]
    pos = pos[same]
    if not len(pos):
        return np.empty(0, dtype=object)
    out = pd.Series(words[pos], dtype=object)
    for j in range(1, n):
        out = out + " " + pd.Series(words[pos + j], dtype=object)
    return out.to_numpy(dtype=object)


def keyed_term_counts(
    ds: rd.Dataset,
    *,
    key_col: str = "source",
    text_col: str = "text",
    ngram: int = 1,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """(key, term, freq) Dataset: per-batch value_counts partials +
    ONE exchange on (key, term). ``ngram=1`` counts words; ``ngram=n``
    counts space-joined word n-grams (within-doc adjacency)."""
    from .exchange import block_map

    def partial(t: pa.Table) -> pd.DataFrame:
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        words, lengths = _split_words(t.column(text_col))
        if ngram == 1:
            terms = words
            term_key = np.repeat(keys, lengths)
        else:
            terms = _ngram_join(words, lengths, ngram)
            per_doc = np.maximum(lengths - (ngram - 1), 0)
            # docs shorter than n contribute 0 n-grams
            per_doc = np.where(lengths >= ngram, per_doc, 0)
            term_key = np.repeat(keys, per_doc)
        if not len(terms):
            return pd.DataFrame({key_col: pd.Series([], dtype=object),
                                 "term": pd.Series([], dtype=object),
                                 "freq": pd.Series([], dtype=np.int64)})
        vc = pd.DataFrame({key_col: term_key, "term": terms}) \
            .groupby([key_col, "term"], sort=False).size().reset_index(name="freq")
        vc["freq"] = vc["freq"].astype(np.int64)
        return vc

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby([key_col, "term"], as_index=False)["freq"].sum()
        out["freq"] = out["freq"].astype(np.int64)
        return out

    return block_map(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        [key_col, "term"], combine, batch_format="pandas",
        num_partitions=num_partitions, zero_copy_batch=False, weight_col="freq",
    )


def top_terms(
    counts: rd.Dataset,
    *,
    key_col: str = "source",
    k: int = 20,
) -> pd.DataFrame:
    """Exact global top-k terms per key from a final (key, term, freq)
    counts Dataset: per-block partial top-k (correct because each block
    holds complete groups after the exchange), bounded driver merge.
    Ties: freq DESC, term ASC. Returns (key, rnk, term, freq)."""

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        df = df.sort_values([key_col, "freq", "term"],
                            ascending=[True, False, True], kind="mergesort")
        return df.groupby(key_col, sort=False).head(k)

    cand = counts.map_batches(
        partial_topk, batch_format="pandas", batch_size=None).to_pandas()
    if not len(cand):
        return pd.DataFrame({key_col: [], "rnk": pd.Series([], dtype=np.int64),
                             "term": [], "freq": pd.Series([], dtype=np.int64)})
    cand = cand.sort_values([key_col, "freq", "term"],
                            ascending=[True, False, True], kind="mergesort")
    out = cand.groupby(key_col, sort=False).head(k).reset_index(drop=True)
    out["rnk"] = out.groupby(key_col, sort=False).cumcount().to_numpy() + 1
    out["rnk"] = out["rnk"].astype(np.int64)
    return out[[key_col, "rnk", "term", "freq"]]


def zipf_fit(
    ds: rd.Dataset,
    *,
    key_col: str = "source",
    text_col: str = "text",
    top_n: int = 200,
) -> pd.DataFrame:
    """Per-key Zipf rank-frequency fit: OLS of ln(freq) on ln(rank)
    over the top ``top_n`` ranks (rank ties freq DESC, word ASC).
    Returns (key, n_ranks, zipf_slope, intercept, r2) with the
    closed-form moment expressions — the SQL oracle replays the same
    formulas term-for-term. English text lands near slope -1 (Zipf's
    law); a strongly flatter/steeper slope is a classic corpus-health
    probe (synthetic or template-heavy text)."""
    counts = keyed_term_counts(ds, key_col=key_col, text_col=text_col, ngram=1)
    top = top_terms(counts, key_col=key_col, k=top_n)
    rows = []
    for key, g in top.groupby(key_col, sort=True):
        g = g.sort_values("rnk", kind="mergesort")
        x = np.log(g["rnk"].to_numpy(dtype=np.float64))
        y = np.log(g["freq"].to_numpy(dtype=np.float64))
        n = np.float64(len(g))
        mx, my = x.mean(), y.mean()
        sxy, sxx, syy = (x * y).sum(), (x * x).sum(), (y * y).sum()
        num = sxy - n * mx * my
        den = sxx - n * mx * mx
        slope = num / den
        intercept = my - num / den * mx
        r2 = num * num / (den * (syy - n * my * my))
        rows.append((key, int(n), slope, intercept, r2))
    return pd.DataFrame(rows, columns=[key_col, "n_ranks", "zipf_slope",
                                       "intercept", "r2"])
