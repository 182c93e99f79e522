"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): score every document by the log-likelihood ratio of
a TARGET bag-of-ngram-buckets distribution vs the RAW corpus
distribution, then keep the top-k raw documents by weight.

Reference scope: no diive counterpart; driver-brief training-data
operator (data-mixing / quality family, alongside packing.py's
source-weighted sampling and decontamination).

Design for 100 TB:
* Bucketing: token -> global-vocab rank -> ``rank % n_buckets``. The
  rank path keeps the whole operator exactly SQL-replayable (DENSE_RANK
  over the distinct vocabulary); at open-vocabulary scale you swap the
  rank for the FNV word hash (functions/text.py:word_hashes) — same
  asymptotics, identical downstream code, but no longer
  oracle-replayable (FNV's mod-2^64 wrap has no DuckDB counterpart).
* FIT: one ``map_batches`` pass emits per-batch bucket-count partials
  for (target, raw) — 2 x n_buckets ints per batch; the text never
  shuffles and the model is n_buckets log-ratios, broadcast by closure.
* SCORE: second pass, per-doc ``logw = sum_b count_b * (ln p_b - ln
  q_b)`` with add-1 smoothing over buckets — one bincount matmul per
  batch.
* SELECT: exact distributed top-k — per-block partial top-k, one
  combine of <= k x n_blocks slim rows, broadcast id set for the flag
  pass. No full-corpus driver materialization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .lm import _split_batch


def _vocab_codes(vocab: np.ndarray, flat: np.ndarray) -> np.ndarray:
    """Global-vocab rank per token (-1 = out of vocab); searchsorted on
    the batch's DISTINCT words only."""
    if not len(flat):
        return np.empty(0, dtype=np.int64)
    uniq, inv = np.unique(flat, return_inverse=True)
    ix = np.searchsorted(vocab, uniq)
    ixc = np.clip(ix, 0, max(len(vocab) - 1, 0))
    found = (ix < len(vocab)) & (vocab[ixc] == uniq) if len(vocab) else np.zeros(len(uniq), bool)
    return np.where(found, ixc, -1).astype(np.int64)[inv]


def collect_vocab(ds: ray.data.Dataset, text_col: str = "text") -> np.ndarray:
    """Sorted distinct vocabulary (per-batch distinct partials ->
    driver union; bounded by vocab size — see module docstring for the
    open-vocab hash variant)."""

    def partial(t: pa.Table) -> pd.DataFrame:
        flat, _ = _split_batch(t.column(text_col).to_numpy(zero_copy_only=False))
        return pd.DataFrame({"w": np.unique(flat)})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return np.sort(parts["w"].unique())


def fit_dsir(
    ds: ray.data.Dataset,
    vocab: np.ndarray,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_mod: int = 101,
    n_buckets: int = 64,
) -> np.ndarray:
    """Per-bucket log importance ratios ``ln p_target - ln q_raw``
    (add-1 smoothing). Target set = docs with ``id % target_mod == 0``
    (the decontaminate convention); raw = the whole corpus."""

    def partial(t: pa.Table) -> pd.DataFrame:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        flat, lengths = _split_batch(t.column(text_col).to_numpy(zero_copy_only=False))
        codes = _vocab_codes(vocab, flat)
        buckets = codes % n_buckets
        doc_ix = np.repeat(np.arange(len(ids), dtype=np.int64), lengths)
        is_t = (ids[doc_ix] % target_mod) == 0
        raw = np.bincount(buckets[codes >= 0], minlength=n_buckets)
        tgt = np.bincount(buckets[(codes >= 0) & is_t], minlength=n_buckets)
        return pd.DataFrame({"bucket": np.arange(n_buckets, dtype=np.int64),
                             "tgt": tgt.astype(np.int64), "raw": raw.astype(np.int64)})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("bucket").sum()
    tgt = np.zeros(n_buckets, dtype=np.int64)
    raw = np.zeros(n_buckets, dtype=np.int64)
    tgt[agg.index.to_numpy()] = agg["tgt"].to_numpy()
    raw[agg.index.to_numpy()] = agg["raw"].to_numpy()
    p = (tgt + 1.0) / (tgt.sum() + n_buckets)
    q = (raw + 1.0) / (raw.sum() + n_buckets)
    return np.log(p) - np.log(q)


def dsir_weights(
    ds: ray.data.Dataset,
    vocab: np.ndarray,
    log_ratio: np.ndarray,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_mod: int = 101,
) -> ray.data.Dataset:
    """Per-doc DSIR log importance weight (one scoring pass; the
    n_buckets log-ratio vector ships by closure)."""
    n_buckets = len(log_ratio)

    def score(t: pa.Table) -> pd.DataFrame:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        flat, lengths = _split_batch(t.column(text_col).to_numpy(zero_copy_only=False))
        codes = _vocab_codes(vocab, flat)
        doc_ix = np.repeat(np.arange(len(ids), dtype=np.int64), lengths)
        keep = codes >= 0
        contrib = log_ratio[codes[keep] % n_buckets]
        logw = np.bincount(doc_ix[keep], weights=contrib, minlength=len(ids))
        return pd.DataFrame({
            id_col: ids,
            "is_target": ((ids % target_mod) == 0).astype(np.int64),
            "logw": logw,
        })

    return ds.map_batches(score, batch_format="pyarrow")


def select_top_k(
    scores: ray.data.Dataset,
    k: int,
    *,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Exact distributed top-k of NON-target docs by (logw desc, id
    asc): per-block partial top-k, one <= k x n_blocks combine, then a
    broadcast flag pass. Adds ``selected`` (0/1)."""

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        cand = df[df["is_target"] == 0]
        cand = cand.sort_values(["logw", id_col], ascending=[False, True], kind="stable")
        return cand.head(k)[[id_col, "logw"]]

    parts = scores.map_batches(partial_topk, batch_format="pandas").to_pandas()
    parts = parts.sort_values(["logw", id_col], ascending=[False, True], kind="stable")
    chosen = set(parts.head(k)[id_col].to_numpy().tolist())

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["selected"] = df[id_col].isin(chosen).astype(np.int64)
        return df

    return scores.map_batches(flag, batch_format="pandas")
