"""N-gram language-model perplexity scoring (CCNet-style quality
filter; Wenzek et al. 2020 arXiv:1911.00359 score documents with a
KenLM n-gram model — here a from-scratch add-k bigram LM trained on the
corpus itself, the public-algorithm equivalent).

Reference scope: the diive reference has no LM counterpart; this is one
of the driver-brief training-data operators (quality scoring family,
alongside functions/text.py:quality_features).

Design for 100 TB:
* TRAIN: one ``map_batches`` pass emits per-batch (w1, w2, n) partial
  count frames — the corpus text never shuffles; partials combine to a
  model bounded by vocabulary size. An n-gram LM used for scoring must
  fit on every worker *by definition*, so the combine targets the
  driver and the model is ``ray.put`` once (broadcast), never re-shipped
  per batch. For vocabularies beyond driver memory the standard move is
  count pruning (drop n < threshold) inside the partial pass — exposed
  via ``min_count``.
* SCORE: stateful actor pool — the model arrays are decoded once per
  actor in ``__init__``; each batch dictionary-encodes its words ONCE
  (np.unique) and resolves all lookups through integer vocab codes
  (searchsorted on the distinct words only + composite int64 pair
  codes) — no Python loop and no string building in the hot path.

Smoothing: add-k over observed contexts,
``P(w2 | w1) = (c(w1 w2) + k) / (c(w1 ·) + k * V)`` with V = unigram
vocabulary size; per-doc score = mean log2 P over the doc's bigrams and
``perplexity = 2 ** (-score)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

SENTINEL = -9999.0


def _split_batch(texts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Flatten a batch of space-separated texts into one word array +
    per-doc lengths (one C-level str.split per doc, no per-word
    Python)."""
    s = pd.Series(texts, dtype=object).str.split(" ")
    lists = [x for x in s if isinstance(x, list) and len(x)]
    lengths = s.map(lambda x: len(x) if isinstance(x, list) else 0).to_numpy(dtype=np.int64)
    flat = np.concatenate([np.asarray(x, dtype=object) for x in lists]) \
        if lists else np.empty(0, dtype=object)
    return flat, lengths


def _bigram_indices(lengths: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(first-word flat positions, doc index) of all within-doc
    adjacent pairs."""
    n = int(lengths.sum())
    if n < 2:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    doc_ix = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
    pos = np.arange(n - 1, dtype=np.int64)
    same = doc_ix[:-1] == doc_ix[1:]
    return pos[same], doc_ix[:-1][same]


def _mg_pruned_counts(
    ds: ray.data.Dataset,
    parts_ds: ray.data.Dataset,
    text_col: str,
    max_entries: int,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Open-vocab combine: stream the partial count frames through a
    driver-side Misra-Gries merge bounded at ``max_entries`` unigrams
    and ``max_entries`` bigram pairs (composite 'w1 w2' keys — words
    are space-split so the separator is unambiguous), then one exact
    recount pass restricted to the surviving candidates. Driver state
    never exceeds O(max_entries) entries per stream."""
    from .exchange import driver_combine
    from .sketch import mg_decrement

    uni_t = np.empty(0, dtype=object)
    uni_c = np.empty(0, dtype=np.int64)
    big_t = np.empty(0, dtype=object)
    big_c = np.empty(0, dtype=np.int64)
    for b in parts_ds.iter_batches(batch_format="pandas", batch_size=65536):
        kind = b["kind"].to_numpy()
        u, g = b[kind == 0], b[kind == 1]
        if len(u):
            merged = pd.concat([
                pd.DataFrame({"t": uni_t, "n": uni_c}),
                pd.DataFrame({"t": u["w1"].to_numpy(dtype=object),
                              "n": u["n"].to_numpy(dtype=np.int64)}),
            ]).groupby("t", sort=False, as_index=False)["n"].sum()
            uni_t, uni_c = mg_decrement(
                merged["t"].to_numpy(dtype=object),
                merged["n"].to_numpy(dtype=np.int64), max_entries,
            )
        if len(g):
            comp = (g["w1"].astype(str) + " " + g["w2"].astype(str)).to_numpy(dtype=object)
            merged = pd.concat([
                pd.DataFrame({"t": big_t, "n": big_c}),
                pd.DataFrame({"t": comp, "n": g["n"].to_numpy(dtype=np.int64)}),
            ]).groupby("t", sort=False, as_index=False)["n"].sum()
            big_t, big_c = mg_decrement(
                merged["t"].to_numpy(dtype=object),
                merged["n"].to_numpy(dtype=np.int64), max_entries,
            )

    uni_cand = set(uni_t.tolist())
    big_cand = set(big_t.tolist())

    def recount(t: pa.Table) -> pd.DataFrame:
        texts = t.column(text_col).to_numpy(zero_copy_only=False)
        flat, lengths = _split_batch(texts)
        p1, _ = _bigram_indices(lengths)
        frames = []
        if len(flat):
            u = pd.Series(flat, dtype=object)
            u = u[u.isin(uni_cand)].value_counts()
            frames.append(pd.DataFrame({
                "w1": u.index.to_numpy(dtype=object), "w2": "",
                "n": u.to_numpy(np.int64), "kind": np.int8(0),
            }))
        if len(p1):
            comp = pd.Series(flat[p1], dtype=object) + " " + pd.Series(flat[p1 + 1], dtype=object)
            comp = comp[comp.isin(big_cand)].value_counts()
            if len(comp):
                wsplit = comp.index.to_series().str.split(" ", n=1, expand=True)
                frames.append(pd.DataFrame({
                    "w1": wsplit[0].to_numpy(dtype=object),
                    "w2": wsplit[1].to_numpy(dtype=object),
                    "n": comp.to_numpy(np.int64), "kind": np.int8(1),
                }))
        if not frames:
            return pd.DataFrame({"w1": [], "w2": [], "n": [], "kind": []})
        out = pd.concat(frames, ignore_index=True)
        out["n"] = out["n"].astype(np.int64)
        return out

    exact = driver_combine(
        ds, recount,
        lambda df: df.groupby(["w1", "w2", "kind"], as_index=False)["n"].sum(),
    )
    big = exact[exact["kind"] == 1][["w1", "w2", "n"]].reset_index(drop=True)
    uni = exact[exact["kind"] == 0][["w1", "n"]].reset_index(drop=True)
    return big, uni


def train_bigram_lm(
    ds: ray.data.Dataset,
    text_col: str = "text",
    *,
    min_count: int = 0,
    max_entries: int | None = None,
) -> dict:
    """Distributed bigram count training: per-batch partial frames ->
    driver combine (bounded by vocab; see module docstring). Returns a
    plain-array model dict ready for ``ray.put``: sorted ``vocab``,
    vocab-aligned context counts, sorted composite int64 pair codes +
    counts.

    ``max_entries`` (VERDICT r3 #7, open-vocab path): when set, the
    driver never materializes the full vocabulary. Partial count
    frames stream through a Misra-Gries merge (sketch.py:mg_decrement;
    Agarwal et al. "Mergeable Summaries") bounded at ``max_entries``
    unigrams + ``max_entries`` bigram pairs, then ONE exact recount
    pass over the surviving candidates — so kept entries carry EXACT
    counts (the sketch only bounds which entries get recounted, the
    same contract as sketch.py:heavy_hitters). Guarantee: any word /
    pair with true count > N/(max_entries+1) survives. ``None`` keeps
    the exact full-vocab combine (valid whenever the vocab fits the
    driver — an n-gram LM used for scoring must fit every worker
    anyway)."""

    def partial(t: pa.Table) -> pd.DataFrame:
        texts = t.column(text_col).to_numpy(zero_copy_only=False)
        flat, lengths = _split_batch(texts)
        p1, _ = _bigram_indices(lengths)
        pairs = (
            pd.DataFrame({"w1": flat[p1], "w2": flat[p1 + 1]})
            .groupby(["w1", "w2"], sort=False).size().reset_index(name="n")
        ) if len(p1) else pd.DataFrame({"w1": [], "w2": [], "n": []})
        uni = pd.Series(flat, dtype=object).value_counts()
        out_u = pd.DataFrame({"w1": uni.index.to_numpy(dtype=object), "w2": "", "n": uni.to_numpy()})
        out_u["kind"] = np.int8(0)
        pairs["kind"] = np.int8(1)
        out = pd.concat([pairs, out_u], ignore_index=True)
        out["n"] = out["n"].astype(np.int64)
        return out

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    if max_entries is None:
        parts = parts_ds.to_pandas()
        big = parts[parts["kind"] == 1].groupby(["w1", "w2"], as_index=False)["n"].sum()
        uni = parts[parts["kind"] == 0].groupby("w1", as_index=False)["n"].sum()
    else:
        big, uni = _mg_pruned_counts(ds, parts_ds, text_col, max_entries)
    if min_count > 0:
        big = big[big["n"] >= min_count]
    # pruned vocab: a pair may reference a word the unigram sketch
    # dropped — restrict pairs to the surviving vocabulary so the
    # model's searchsorted lookups stay well-defined
    if max_entries is not None:
        vs = set(uni["w1"].tolist())
        big = big[big["w1"].isin(vs) & big["w2"].isin(vs)]
    vocab = np.sort(uni["w1"].to_numpy(dtype=object))
    nv = np.int64(len(vocab))
    # context counts c(w1 .) from the bigram table (contexts, not raw
    # unigrams: the last word of a doc is never a context)
    ctx = big.groupby("w1", as_index=False)["n"].sum()
    ctx_counts = np.zeros(len(vocab), dtype=np.int64)
    ctx_counts[np.searchsorted(vocab, ctx["w1"].to_numpy(dtype=object))] = \
        ctx["n"].to_numpy(dtype=np.int64)
    c1 = np.searchsorted(vocab, big["w1"].to_numpy(dtype=object)).astype(np.int64)
    c2 = np.searchsorted(vocab, big["w2"].to_numpy(dtype=object)).astype(np.int64)
    pair_codes = c1 * nv + c2
    order = np.argsort(pair_codes, kind="stable")
    return {
        "vocab": vocab,
        "ctx_counts": ctx_counts,
        "pair_codes": pair_codes[order],
        "pair_counts": big["n"].to_numpy(dtype=np.int64)[order],
        "vocab_size": int(nv),
    }


class BigramScorer:
    """Actor-pool scoring stage: model decoded once per actor in
    ``__init__`` (broadcast via ``ray.put`` ref)."""

    def __init__(self, model_ref, text_col: str = "text", id_col: str = "doc_id",
                 add_k: float = 0.5, keep_cols: tuple = ()):
        model = ray.get(model_ref) if isinstance(model_ref, ray.ObjectRef) else model_ref
        self.vocab = model["vocab"]
        self.ctx_counts = model["ctx_counts"]
        self.pair_codes = model["pair_codes"]
        self.pair_counts = model["pair_counts"]
        self.V = model["vocab_size"]
        self.text_col = text_col
        self.id_col = id_col
        self.add_k = add_k
        self.keep_cols = tuple(keep_cols)

    def _word_codes(self, flat: np.ndarray) -> np.ndarray:
        """Vocab code per token, -1 for out-of-vocab; searchsorted runs
        on the batch's DISTINCT words only."""
        if not len(flat):
            return np.empty(0, dtype=np.int64)
        uniq, inv = np.unique(flat, return_inverse=True)
        ix = np.searchsorted(self.vocab, uniq)
        ixc = np.clip(ix, 0, max(len(self.vocab) - 1, 0))
        found = (ix < len(self.vocab)) & (self.vocab[ixc] == uniq) \
            if len(self.vocab) else np.zeros(len(uniq), bool)
        codes = np.where(found, ixc, -1).astype(np.int64)
        return codes[inv]

    def __call__(self, t: pa.Table) -> pd.DataFrame:
        ids = t.column(self.id_col).to_numpy(zero_copy_only=False)
        texts = t.column(self.text_col).to_numpy(zero_copy_only=False)
        flat, lengths = _split_batch(texts)
        p1, doc_ix = _bigram_indices(lengths)
        codes = self._word_codes(flat)
        code1, code2 = codes[p1], codes[p1 + 1]
        in_vocab = (code1 >= 0) & (code2 >= 0)
        pc = code1 * np.int64(self.V) + code2
        cb = np.zeros(len(pc), dtype=np.int64)
        if len(pc) and len(self.pair_codes):
            ix = np.searchsorted(self.pair_codes, pc)
            ixc = np.clip(ix, 0, len(self.pair_codes) - 1)
            hit = in_vocab & (ix < len(self.pair_codes)) & (self.pair_codes[ixc] == pc)
            cb[hit] = self.pair_counts[ixc[hit]]
        c1 = np.where(code1 >= 0, self.ctx_counts[np.maximum(code1, 0)], 0)
        k = self.add_k
        logp = np.log2((cb + k) / (c1 + k * self.V)) if len(pc) else np.zeros(0)
        n_pairs = np.bincount(doc_ix, minlength=len(ids)).astype(np.int64)
        sums = np.bincount(doc_ix, weights=logp, minlength=len(ids))
        avg = sums / np.maximum(n_pairs, 1)
        ppl = np.power(2.0, -avg)
        has = n_pairs > 0
        out = {self.id_col: ids}
        for c in self.keep_cols:
            out[c] = t.column(c).to_numpy(zero_copy_only=False)
        out.update({
            "n_bigrams": n_pairs,
            "avg_logprob": np.where(has, avg, SENTINEL),
            "perplexity": np.where(has, ppl, SENTINEL),
        })
        return pd.DataFrame(out)


def score_perplexity(
    ds: ray.data.Dataset,
    model: dict,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 0.5,
    concurrency: int = 4,
    keep_cols: tuple = (),
) -> ray.data.Dataset:
    """Score every doc against a trained bigram model (actor pool,
    model broadcast once). ``concurrency`` is the pool MAX — the pool
    starts at 1 and grows, so a small local session can't deadlock on
    reserved CPUs (the repo's aggregator-starvation rule).
    ``keep_cols``: input columns copied through to the scored output
    (e.g. a language key for downstream per-lang bucketing)."""
    model_ref = ray.put(model)
    return ds.map_batches(
        BigramScorer,
        fn_constructor_kwargs={"model_ref": model_ref, "text_col": text_col,
                               "id_col": id_col, "add_k": add_k,
                               "keep_cols": keep_cols},
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    )


class KneserNeyScorer(BigramScorer):
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; Chen
    & Goodman 1999 empirical study — the KenLM default smoothing):

        P(w2|w1) = (c(w1 w2) - D) / c(w1 .)
                   + D * N1+(w1, .) / c(w1 .) * N1+(., w2) / N1+(., .)

    with a fixed absolute discount D. All KN tables derive from the
    broadcast model's sorted pair codes in ``__init__`` (once per
    actor): N1+(w1, .) / N1+(., w2) are bincounts of the pair-code
    rows/columns, N1+(., .) is the pair-type count. Backoff for pairs
    unseen in training: the continuation probability alone (for OOV
    w2, the uniform floor 1 / N1+(., .)). Scores use natural log;
    kn_perplexity = exp(-mean ln P)."""

    def __init__(self, model_ref, text_col: str = "text", id_col: str = "doc_id",
                 discount: float = 0.75, keep_cols: tuple = ()):
        super().__init__(model_ref, text_col=text_col, id_col=id_col,
                         keep_cols=keep_cols)
        self.discount = float(discount)
        V = max(self.V, 1)
        c1 = self.pair_codes // V
        c2 = self.pair_codes % V
        self.fwd_types = np.bincount(c1, minlength=V).astype(np.float64)
        self.bwd_types = np.bincount(c2, minlength=V).astype(np.float64)
        self.n_pair_types = np.float64(max(len(self.pair_codes), 1))

    def __call__(self, t: pa.Table) -> pd.DataFrame:
        ids = t.column(self.id_col).to_numpy(zero_copy_only=False)
        texts = t.column(self.text_col).to_numpy(zero_copy_only=False)
        flat, lengths = _split_batch(texts)
        p1, doc_ix = _bigram_indices(lengths)
        codes = self._word_codes(flat)
        code1, code2 = codes[p1], codes[p1 + 1]
        in_vocab = (code1 >= 0) & (code2 >= 0)
        pc_codes = code1 * np.int64(self.V) + code2
        cb = np.zeros(len(pc_codes), dtype=np.float64)
        if len(pc_codes) and len(self.pair_codes):
            ix = np.searchsorted(self.pair_codes, pc_codes)
            ixc = np.clip(ix, 0, len(self.pair_codes) - 1)
            hit = in_vocab & (ix < len(self.pair_codes)) & (self.pair_codes[ixc] == pc_codes)
            cb[hit] = self.pair_counts[ixc[hit]].astype(np.float64)
        c1n = np.where(code1 >= 0,
                       self.ctx_counts[np.maximum(code1, 0)], 0).astype(np.float64)
        D = self.discount
        B = self.n_pair_types
        pcont = np.where(code2 >= 0,
                         self.bwd_types[np.maximum(code2, 0)] / B, 1.0 / B)
        fwd = np.where(code1 >= 0, self.fwd_types[np.maximum(code1, 0)], 0.0)
        # seen-context branch: expression order mirrors the SQL oracle
        # term-for-term so stable_round6 closes the remaining FP gap
        safe_c1 = np.maximum(c1n, 1.0)
        p_seen = np.maximum(cb - D, 0.0) / safe_c1 + D * fwd / safe_c1 * pcont
        p = np.where(c1n > 0, p_seen, pcont)
        logp = np.log(np.maximum(p, 1e-300)) if len(pc_codes) else np.zeros(0)
        n_pairs = np.bincount(doc_ix, minlength=len(ids)).astype(np.int64)
        sums = np.bincount(doc_ix, weights=logp, minlength=len(ids))
        avg = sums / np.maximum(n_pairs, 1)
        ppl = np.exp(-avg)
        has = n_pairs > 0
        out = {self.id_col: ids}
        for c in self.keep_cols:
            out[c] = t.column(c).to_numpy(zero_copy_only=False)
        out.update({
            "n_bigrams": n_pairs,
            "kn_avg_logprob": np.where(has, avg, SENTINEL),
            "kn_perplexity": np.where(has, ppl, SENTINEL),
        })
        return pd.DataFrame(out)


def score_kneser_ney(
    ds: ray.data.Dataset,
    model: dict,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
    concurrency: int = 4,
    keep_cols: tuple = (),
) -> ray.data.Dataset:
    """Kneser-Ney twin of ``score_perplexity``: same broadcast-model
    actor pool, KN tables derived once per actor."""
    model_ref = ray.put(model)
    return ds.map_batches(
        KneserNeyScorer,
        fn_constructor_kwargs={"model_ref": model_ref, "text_col": text_col,
                               "id_col": id_col, "discount": discount,
                               "keep_cols": keep_cols},
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    )
