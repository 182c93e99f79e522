"""BM25 retrieval scoring over the document corpus — the ranking
function behind seed-set curation / similar-document pulls in
training-data pipelines (Robertson & Zaragoza 2009, the Okapi BM25
formulation: idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)),
score(q, d) = sum_t idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b +
b * dl / avgdl))).

Distributed shape (same two-pass skeleton as the TF-IDF stage):

* pass 1 — per-batch partials for doc count, total length, and the
  document frequencies of the QUERY terms only (the broadcast query
  vocabulary bounds the partial at |query terms| rows per batch);
* pass 2 — each batch scores its docs against every query with one
  dictionary-encode + pair-code unique (tf per (doc, query-term)
  without per-row Python) and emits only its partial top-k per query;
  the driver keeps the global top-k of the bounded
  (#queries × k × #batches) candidate rows.

Ranking is on stable_round6 scores with doc_id ascending ties, so the
result is partitioning- and summation-order independent and replays
exactly in SQL."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..util import stable_round6


def _tokenize(texts: list) -> tuple[np.ndarray, np.ndarray]:
    words_per_doc = [s.split(" ") if s else [] for s in texts]
    lens = np.array([len(w) for w in words_per_doc], dtype=np.int64)
    flat = np.array([w for ws in words_per_doc for w in ws], dtype=object)
    return flat, lens


def corpus_stats(
    ds: rd.Dataset, terms: list[str], *, text_col: str = "text"
) -> tuple[int, float, pd.Series]:
    """(n_docs, avg_doc_len, df-per-query-term) in ONE partial pass."""
    term_set = sorted(set(terms))

    def partial(t: pa.Table) -> pd.DataFrame:
        flat, lens = _tokenize(t[text_col].to_pylist())
        rows = {"__n_docs__": np.int64(len(lens)),
                "__n_words__": np.int64(lens.sum())}
        if len(flat):
            doc_idx = np.repeat(np.arange(len(lens)), lens)
            uniq, inv = np.unique(flat, return_inverse=True)
            pair = np.unique(doc_idx * len(uniq) + inv)
            w_i, cnt = np.unique(pair % len(uniq), return_counts=True)
            df_ser = pd.Series(cnt, index=uniq[w_i])
            for term in term_set:
                rows[term] = np.int64(df_ser.get(term, 0))
        else:
            for term in term_set:
                rows[term] = np.int64(0)
        return pd.DataFrame([rows])

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n_docs = int(parts["__n_docs__"].sum())
    avgdl = float(parts["__n_words__"].sum()) / n_docs if n_docs else 0.0
    df = parts[term_set].sum().astype(np.int64)
    return n_docs, avgdl, df


def bm25_topk(
    ds: rd.Dataset,
    queries: dict[str, list[str]],
    *,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Top-k docs per query: (query_id, rank, doc_id, score)."""
    all_terms = sorted({t for ts in queries.values() for t in ts})
    n_docs, avgdl, df = corpus_stats(ds, all_terms, text_col=text_col)
    idf = pd.Series(
        np.log(1.0 + (n_docs - df.to_numpy(dtype=np.float64) + 0.5)
               / (df.to_numpy(dtype=np.float64) + 0.5)),
        index=df.index,
    )
    term_arr = np.array(all_terms, dtype=object)

    def score_batch(t: pa.Table) -> pd.DataFrame:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        flat, lens = _tokenize(t[text_col].to_pylist())
        empty = pd.DataFrame({
            "query_id": pd.Series([], dtype=object),
            "doc_id": pd.Series([], dtype=ids.dtype),
            "score": pd.Series([], dtype=np.float64)})
        if not len(flat):
            return empty
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        pos = np.searchsorted(term_arr, flat)
        pos_ok = (pos < len(term_arr))
        pos_c = np.where(pos_ok, pos, 0)
        keep = pos_ok & (term_arr[pos_c] == flat)
        if not keep.any():
            return empty
        d_i, t_i = doc_idx[keep], pos_c[keep]
        pair, tf = np.unique(d_i * len(term_arr) + t_i, return_counts=True)
        pd_i, pt_i = pair // len(term_arr), pair % len(term_arr)
        dl = lens[pd_i].astype(np.float64)
        tf = tf.astype(np.float64)
        contrib = (idf.to_numpy()[pt_i] * tf * (k1 + 1.0)
                   / (tf + k1 * (1.0 - b + b * dl / avgdl)))
        rows = []
        for qid, terms in queries.items():
            q_pos = np.searchsorted(term_arr, np.array(sorted(set(terms)), dtype=object))
            mask = np.isin(pt_i, q_pos)
            if not mask.any():
                continue
            score = np.bincount(pd_i[mask], weights=contrib[mask],
                                minlength=len(ids))
            hit = score > 0
            part = pd.DataFrame({
                "query_id": qid,
                "doc_id": ids[hit],
                "score": stable_round6(score[hit]),
            })
            part = part.sort_values(["score", "doc_id"],
                                    ascending=[False, True]).head(k)
            rows.append(part)
        return pd.concat(rows, ignore_index=True) if rows else empty

    cand = ds.map_batches(score_batch, batch_format="pyarrow").to_pandas()
    out = (
        cand.sort_values(["query_id", "score", "doc_id"],
                         ascending=[True, False, True], kind="stable")
        .groupby("query_id", as_index=False).head(k).copy()
    )
    out["rank"] = out.groupby("query_id").cumcount().to_numpy() + 1
    out["rank"] = out["rank"].astype(np.int64)
    return out[["query_id", "rank", "doc_id", "score"]].reset_index(drop=True)
