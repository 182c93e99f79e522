"""Driver-facing queries over the ``documents`` / ``embeddings`` tables:
the training-data pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing). Registered alongside the time-series
registry in pipelines/queries.py.

Oracle-parity conventions (same as queries.py): identical column names,
float outputs rounded to 6 decimals, deterministic tie-breaks. Where an
operator is probabilistic-by-design (SimHash buckets, MinHash LSH
recall), the exact-verification step makes the *output* deterministic
and — for MinHash with r=2/b=64 at threshold 0.5 (miss probability
<= (1-J^2)^64 <= 1e-8 per pair) — equal to the exact-Jaccard SQL
oracle on this corpus (recall pinned by tests)."""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions import text as tx
from ..util import round6
from ..stages import dedup as dd
from ..stages import multimodal as mm
from ..stages import similarity as sim


def _docs(sf_dir: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def _embs(sf_dir: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=columns)


def _round6(df: pd.DataFrame, cols) -> pd.DataFrame:
    for c in cols:
        df[c] = round6(df[c].astype(float))
    return df


# ------------------------------------------------------------ text analysis


def q_doc_token_count(sf_dir: str):
    """Token counting: whitespace tokens + BPE-ish regex tokens
    (functions/text.py kernels, Arrow count_substring_regex)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "n_ws": tx.word_counts(t["text"]),
            "n_bpe": tx.bpe_token_counts(t["text"]),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_SQL_TOKEN_COUNT = r"""
SELECT doc_id,
       CASE WHEN len(trim(text)) = 0 THEN 0
            ELSE len(string_split_regex(trim(text), '\s+')) END AS n_ws,
       len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_bpe
FROM documents
"""


def q_doc_quality(sf_dir: str):
    """Quality scoring: length/punct/digit/stopword ratios + composite
    0..1 score (Gopher/C4-style heuristics)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        feat = tx.quality_features(t["text"])
        score = tx.quality_score(feat)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_chars_calc": pa.array(feat["n_chars"], pa.int64()),
            "n_words": pa.array(feat["n_words"], pa.int64()),
            "mean_word_len": pa.array(round6(feat["mean_word_len"])),
            "punct_ratio": pa.array(round6(feat["punct_ratio"])),
            "digit_ratio": pa.array(round6(feat["digit_ratio"])),
            "stopword_ratio": pa.array(round6(feat["stopword_ratio"])),
            "quality": pa.array(round6(score)),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_SQL_QUALITY = r"""
WITH f AS (
  SELECT doc_id,
         length(text) AS n_chars_calc,
         CASE WHEN len(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n_words,
         len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS n_punct,
         len(regexp_extract_all(text, '[0-9]')) AS n_digit,
         len(regexp_extract_all(text, '\b(?i:(?:the|a|of|and|to|in|is|that|it|for))\b')) AS n_stop
  FROM documents
), r AS (
  SELECT doc_id, n_chars_calc, n_words,
         CASE WHEN n_words > 0
              THEN (n_chars_calc - greatest(n_words - 1, 0)) * 1.0 / greatest(n_words, 1)
              ELSE 0.0 END AS mean_word_len,
         CASE WHEN n_chars_calc > 0 THEN n_punct * 1.0 / greatest(n_chars_calc, 1) ELSE 0.0 END AS punct_ratio,
         CASE WHEN n_chars_calc > 0 THEN n_digit * 1.0 / greatest(n_chars_calc, 1) ELSE 0.0 END AS digit_ratio,
         CASE WHEN n_words > 0 THEN n_stop * 1.0 / greatest(n_words, 1) ELSE 0.0 END AS stopword_ratio
  FROM f
)
SELECT doc_id, n_chars_calc, n_words,
       ROUND(mean_word_len, 6) AS mean_word_len,
       ROUND(punct_ratio, 6) AS punct_ratio,
       ROUND(digit_ratio, 6) AS digit_ratio,
       ROUND(stopword_ratio, 6) AS stopword_ratio,
       ROUND(
         (least(n_words / 5.0, 1.0) * least(greatest((10000 - n_words) / 5000.0, 0.0), 1.0))
         * (CASE WHEN mean_word_len >= 2.0 AND mean_word_len <= 12.0 THEN 1.0 ELSE 0.0 END)
         * least(greatest((0.2 - punct_ratio) / 0.2, 0.0), 1.0)
         * least(stopword_ratio / 0.01, 1.0), 6) AS quality
FROM r
"""


def q_doc_langid(sf_dir: str):
    """Language ID by stopword-profile ratio (argmax over en/es/de/fr,
    first-max tie-break, 'und' below 0.05). An n-gram profile model
    would slot into the same stage signature."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        lang, score = tx.langid_best(t["text"])
        return pa.table({
            "doc_id": t["doc_id"],
            "lang_pred": pa.array(lang.tolist(), pa.string()),
            "lang_score": pa.array(round6(score)),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_STOP_SQL = {
    "en": "the|a|of|and|to|in|is|that|it|for",
    "es": "el|la|de|y|que|en|un|una|es|por",
    "de": "der|die|das|und|zu|den|von|ist|mit|nicht",
    "fr": "le|la|de|et|les|des|un|une|est|que",
}

_SQL_LANGID = r"""
WITH f AS (
  SELECT doc_id,
         greatest(CASE WHEN len(trim(text)) = 0 THEN 0
                       ELSE len(string_split_regex(trim(text), '\s+')) END, 1) AS nw,
         len(regexp_extract_all(text, '\b(?i:(?:__EN__))\b')) AS h_en,
         len(regexp_extract_all(text, '\b(?i:(?:__ES__))\b')) AS h_es,
         len(regexp_extract_all(text, '\b(?i:(?:__DE__))\b')) AS h_de,
         len(regexp_extract_all(text, '\b(?i:(?:__FR__))\b')) AS h_fr
  FROM documents
), r AS (
  SELECT doc_id,
         h_en * 1.0 / nw AS r_en, h_es * 1.0 / nw AS r_es,
         h_de * 1.0 / nw AS r_de, h_fr * 1.0 / nw AS r_fr
  FROM f
), p AS (
  SELECT doc_id,
         CASE WHEN r_en >= r_es AND r_en >= r_de AND r_en >= r_fr THEN 'en'
              WHEN r_es >= r_de AND r_es >= r_fr THEN 'es'
              WHEN r_de >= r_fr THEN 'de'
              ELSE 'fr' END AS best_lang,
         greatest(r_en, r_es, r_de, r_fr) AS best
  FROM r
)
SELECT doc_id,
       CASE WHEN best >= 0.05 THEN best_lang ELSE 'und' END AS lang_pred,
       ROUND(best, 6) AS lang_score
FROM p
""".replace("__EN__", _STOP_SQL["en"]).replace("__ES__", _STOP_SQL["es"]).replace(
    "__DE__", _STOP_SQL["de"]
).replace("__FR__", _STOP_SQL["fr"])


def q_doc_fingerprint(sf_dir: str):
    """Document fingerprinting: rolling polynomial hash over code points
    mod 2^31-1 (functions/text.py:polynomial_fingerprint)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        fp = tx.polynomial_fingerprint(t["text"].to_pylist())
        return pa.table({"doc_id": t["doc_id"], "fp": pa.array(fp, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_SQL_FINGERPRINT = r"""
SELECT doc_id,
       list_reduce(
         list_prepend(0::BIGINT, list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
         (h, c) -> (h * 31 + c) % 2147483647
       ) AS fp
FROM documents
"""


def q_doc_winnowing(sf_dir: str):
    """Winnowing fingerprints (Schleimer-Wilkerson-Aiken 2003 via
    functions/text.py:winnow_fingerprints): char 8-gram polynomial
    hashes, window w=4 selects the rightmost minimal hash; emits the
    distinct (doc_id, pos, fp) fingerprint rows — the MOSS copy-
    detection selection, guaranteed to share a fingerprint with any
    match of length >= w + k - 1 = 11 chars. Stateless vectorized
    map; fingerprints (not text) are what downstream dedup ships."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        di, pos, h = tx.winnow_fingerprints(t["text"].to_pylist(), k=8, w=4)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)[di]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "pos": pa.array(pos, pa.int64()),
            "fp": pa.array(h, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_SQL_WINNOWING = r"""
WITH c AS (
  SELECT doc_id,
         list_transform(string_split(text, ''), ch -> ascii(ch)::BIGINT) AS cp
  FROM documents
),
kg AS (
  SELECT doc_id, i,
         list_reduce(
           list_prepend(0::BIGINT, cp[i : i + 7]),
           (h, ch) -> (h * 31 + ch) % 2147483647
         ) AS h
  FROM c, UNNEST(range(1, len(cp) - 8 + 2)) AS t(i)
),
mx AS (SELECT doc_id, MAX(i) AS m FROM kg GROUP BY 1),
j AS (
  SELECT doc_id, UNNEST(range(1, m - 4 + 2)) AS j FROM mx WHERE m >= 4
),
p AS (
  SELECT kg.doc_id, j.j, kg.i, kg.h
  FROM kg JOIN j ON kg.doc_id = j.doc_id AND kg.i BETWEEN j.j AND j.j + 3
),
g1 AS (SELECT doc_id, j, MIN(h) AS minh FROM p GROUP BY 1, 2),
sel AS (
  SELECT p.doc_id, MAX(p.i) AS pos, g1.minh AS fp
  FROM p JOIN g1 ON p.doc_id = g1.doc_id AND p.j = g1.j AND p.h = g1.minh
  GROUP BY p.doc_id, p.j, g1.minh
)
SELECT DISTINCT doc_id, CAST(pos AS BIGINT) AS pos, CAST(fp AS BIGINT) AS fp
FROM sel ORDER BY doc_id, pos
"""


def q_doc_lexical_stats(sf_dir: str):
    """Lexical-statistics battery (functions/text.py:lexical_stats):
    Shannon char/word entropy in nats, type-token ratio, Yule's K
    (Yule 1944), hapax-legomenon ratio — classic corpus-quality and
    authorship signals. Stateless vectorized map; entropies are
    summation-order-sensitive -> stable_round6 / ROUND(ROUND(.,9),6)
    on both sides."""
    from ..util import stable_round6

    ds = _docs(sf_dir, ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        s = tx.lexical_stats(t["text"].to_pylist())
        return pa.table({
            "doc_id": t["doc_id"],
            "h_char": pa.array(stable_round6(s["h_char"])),
            "h_word": pa.array(stable_round6(s["h_word"])),
            "ttr": pa.array(round6(s["ttr"])),
            "yule_k": pa.array(stable_round6(s["yule_k"])),
            "hapax_ratio": pa.array(round6(s["hapax_ratio"])),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_SQL_LEXICAL_STATS = r"""
WITH ch AS (
  SELECT doc_id, c, COUNT(*)::DOUBLE AS cnt
  FROM (SELECT doc_id, UNNEST(string_split(text, '')) AS c FROM documents)
  GROUP BY 1, 2
),
chn AS (SELECT doc_id, SUM(cnt) AS n FROM ch GROUP BY 1),
hc AS (
  SELECT ch.doc_id, SUM(-(cnt / n) * ln(cnt / n)) AS h_char
  FROM ch JOIN chn USING (doc_id) GROUP BY 1
),
w AS (
  SELECT doc_id, wd, COUNT(*)::DOUBLE AS cnt
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS wd
        FROM documents WHERE len(text) > 0)
  GROUP BY 1, 2
),
wn AS (SELECT doc_id, SUM(cnt) AS n FROM w GROUP BY 1),
hw AS (
  SELECT w.doc_id,
         SUM(-(cnt / n) * ln(cnt / n)) AS h_word,
         COUNT(*)::DOUBLE AS v,
         SUM(cnt * cnt) AS sum_c2,
         SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)::DOUBLE AS v1,
         ANY_VALUE(n) AS n
  FROM w JOIN wn USING (doc_id) GROUP BY 1
)
SELECT d.doc_id,
       ROUND(ROUND(COALESCE(hc.h_char, 0.0), 9), 6) AS h_char,
       ROUND(ROUND(COALESCE(hw.h_word, 0.0), 9), 6) AS h_word,
       ROUND(COALESCE(hw.v / hw.n, 0.0), 6) AS ttr,
       ROUND(ROUND(COALESCE(1e4 * (hw.sum_c2 - hw.n) / (hw.n * hw.n), 0.0), 9), 6) AS yule_k,
       ROUND(COALESCE(hw.v1 / hw.n, 0.0), 6) AS hapax_ratio
FROM documents d
LEFT JOIN hc ON d.doc_id = hc.doc_id
LEFT JOIN hw ON d.doc_id = hw.doc_id
"""


# ------------------------------------------------------------------- dedup


def q_doc_exact_dedup(sf_dir: str):
    """Exact dedup: hash-partition on content digest, keep min doc_id
    per identical text (stages/dedup.py:exact_dedup)."""
    ds = _docs(sf_dir, ["doc_id", "text", "source"])
    out = dd.exact_dedup(ds).to_pandas()
    return (
        out[["doc_id", "source", "text"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


_SQL_EXACT_DEDUP = """
SELECT doc_id, source, text FROM (
  SELECT doc_id, source, text,
         ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1
"""


def q_doc_minhash_dups(sf_dir: str):
    """MinHash+LSH near-dup pairs at Jaccard >= 0.5 over word-3-gram
    shingles, exact-verified (stages/dedup.py:minhash_dup_pairs). The
    oracle computes the exact all-pairs Jaccard — equality proves LSH
    recall 1.0 on this corpus (b=64, r=2: miss prob <= 1e-8/pair)."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    out = dd.minhash_dup_pairs(ds, threshold=0.5)
    out["id_a"] = out["id_a"].astype("int64")
    out["id_b"] = out["id_b"].astype("int64")
    return _round6(out, ["jaccard"]).reset_index(drop=True)


_SQL_MINHASH = r"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(len(w) - 2), i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS s
  FROM w WHERE len(w) >= 3
), p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.s, b.s)) * 1.0
           / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, ROUND(jaccard, 6) AS jaccard FROM p WHERE jaccard >= 0.5
"""


def q_doc_minhash_dedup(sf_dir: str):
    """End-to-end near-dup DEDUP (stages/dedup.py:minhash_dedup):
    MinHash+LSH candidates -> distributed exact-Jaccard verify ->
    distributed connected components (min-label propagation) -> keep
    component representatives. The oracle recomputes the same thing in
    SQL: exact all-pairs Jaccard >= 0.5 edges, transitive closure via a
    recursive CTE, keep doc_id == min reachable id."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    out = dd.minhash_dedup(ds, threshold=0.5).to_pandas()
    return (
        out[["doc_id"]]
        .astype({"doc_id": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


_SQL_MINHASH_DEDUP = r"""
WITH RECURSIVE w AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(len(w) - 2), i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS s
  FROM w WHERE len(w) >= 3
), p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s, b.s)) * 1.0
          / len(list_distinct(list_concat(a.s, b.s))) >= 0.5
), edges AS (
  SELECT id_a AS a, id_b AS b FROM p
  UNION ALL
  SELECT id_b, id_a FROM p
), reach(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.b, r.label FROM reach r JOIN edges e ON e.a = r.node
), rep AS (
  SELECT node, MIN(label) AS label FROM reach GROUP BY node
)
SELECT node AS doc_id FROM rep WHERE node = label
"""


def q_doc_jaccard_blocked(sf_dir: str):
    """Blocked exact n-gram Jaccard dedup (within-lang blocking; the
    deterministic non-probabilistic path,
    stages/dedup.py:ngram_jaccard_pairs_blocked)."""
    ds = _docs(sf_dir, ["doc_id", "lang", "text"])
    out = dd.ngram_jaccard_pairs_blocked(ds, block_keys=("lang",), threshold=0.5)
    out["id_a"] = out["id_a"].astype("int64")
    out["id_b"] = out["id_b"].astype("int64")
    return _round6(out, ["jaccard"]).reset_index(drop=True)


_SQL_JACCARD_BLOCKED = r"""
WITH w AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS w FROM documents
), sh AS (
  SELECT doc_id, lang,
         list_distinct(list_transform(range(len(w) - 2), i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS s
  FROM w WHERE len(w) >= 3
), p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.s, b.s)) * 1.0
           / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id AND a.lang = b.lang
)
SELECT id_a, id_b, ROUND(jaccard, 6) AS jaccard FROM p WHERE jaccard >= 0.5
"""


def q_doc_simhash_dups(sf_dir: str):
    """SimHash near-dup pairs (64-bit signature, 4x16-bit band buckets,
    Hamming <= 3). Probabilistic-by-design signature — no SQL
    equivalent; the driver records a rows-only check, and LSH/planted
    recall is pinned by tests/test_dedup.py."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    out = dd.simhash_dup_pairs(ds, max_hamming=3)
    out["id_a"] = out["id_a"].astype("int64")
    out["id_b"] = out["id_b"].astype("int64")
    out["hamming"] = out["hamming"].astype("int64")
    return out.reset_index(drop=True)


def q_doc_simhash_weighted(sf_dir: str):
    """Term-weighted SimHash near-dup pairs: log1p(tf)-weighted votes
    (batch_simhash64_weighted), same 4x16-bit banding + Hamming verify.
    Rows-only like the unweighted variant; equality-to-unweighted on
    tf==1 corpora and the boilerplate separation case are pinned by
    tests/test_dedup.py."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    out = dd.simhash_dup_pairs(ds, max_hamming=3, weighted=True)
    out["id_a"] = out["id_a"].astype("int64")
    out["id_b"] = out["id_b"].astype("int64")
    out["hamming"] = out["hamming"].astype("int64")
    return out.reset_index(drop=True)


def q_doc_heavy_hitters(sf_dir: str):
    """Exact top-20 tokens via the Misra-Gries sketch + exact recount
    (stages/sketch.py): the sketch bounds WHICH tokens get recounted
    (no token-space shuffle), the recount makes the answer exact — so a
    plain SQL top-k oracle applies."""
    from ..stages.sketch import heavy_hitters

    ds = _docs(sf_dir, ["text"])
    out = heavy_hitters(ds, text_col="text", k=20, capacity=4096)
    out["cnt"] = out["cnt"].astype("int64")
    return out.reset_index(drop=True)


_SQL_HEAVY_HITTERS = r"""
WITH tok AS (
  SELECT unnest(string_split_regex(lower(text), '\s+')) AS token FROM documents
),
c AS (SELECT token, COUNT(*) AS cnt FROM tok WHERE token <> '' GROUP BY token)
SELECT token, CAST(cnt AS BIGINT) AS cnt FROM c
ORDER BY cnt DESC, token ASC LIMIT 20
"""


# -------------------------------------------------------------- similarity


def q_embedding_topk(sf_dir: str):
    """Brute-force cosine top-5 for query vectors vec_id < 10 (broadcast
    query matrix, one matmul per batch; stages/similarity.py). Ranks on
    ROUND(sim, 6) with vec_id tie-break (engine-stable ordering)."""
    ds = _embs(sf_dir)
    qdf = ds.filter(expr="vec_id < 10").to_pandas().sort_values("vec_id")
    Q = np.asarray([np.asarray(v, dtype=np.float64) for v in qdf["embedding"]])
    got = sim.knn_brute_force(ds, Q, k=8, query_ids=qdf["vec_id"].to_numpy())
    got["cos_sim"] = round6(got["cos_sim"])
    got = got.sort_values(["query_id", "cos_sim", "vec_id"], ascending=[True, False, True], kind="stable")
    got["rank"] = got.groupby("query_id").cumcount() + 1
    got = got[got["rank"] <= 5]
    got["query_id"] = got["query_id"].astype("int64")
    got["vec_id"] = got["vec_id"].astype("int64")
    got["rank"] = got["rank"].astype("int64")
    return got[["query_id", "rank", "vec_id", "cos_sim"]].reset_index(drop=True)


def q_embedding_mmr_topk(sf_dir: str):
    """MMR diversified retrieval (similarity.py:mmr_rerank, Carbonell &
    Goldstein 1998): distributed exact top-50 pool per query (vec_id <
    5), id-bounded vector gather, then the greedy
    relevance-vs-diversity loop over the bounded pool (lambda 0.7,
    k=5). Iterative/greedy -> rows-only; duplicate-suppression and the
    lambda=1 == plain-top-k reduction are pytest-pinned."""
    ds = _embs(sf_dir)
    qdf = ds.filter(expr="vec_id < 5").to_pandas().sort_values("vec_id")
    Q = np.asarray([np.asarray(v, dtype=np.float64) for v in qdf["embedding"]])
    out = sim.mmr_rerank(ds, Q, k=5, pool=50, lam=0.7,
                         query_ids=qdf["vec_id"].to_numpy())
    for c in ("query_id", "rank", "vec_id"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


_SQL_TOPK = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 10
), s AS (
  SELECT q.query_id, e.vec_id,
         ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 6) AS cos_sim
  FROM embeddings e, q WHERE e.vec_id <> q.query_id
), r AS (
  SELECT query_id, vec_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rank
  FROM s
)
SELECT query_id, rank, vec_id, cos_sim FROM r WHERE rank <= 5
"""


def q_embedding_near_dup(sf_dir: str):
    """All vector pairs with cosine >= 0.45 via the EXACT sharded
    block-pairwise self-join (stages/similarity.py:
    embedding_all_pairs_exact — deterministic id-hash shards, one
    matmul per shard-pair block, every unordered pair scored exactly
    once, no driver-side corpus materialization). Threshold chosen off
    any pair's margin (no pair within 1e-4)."""
    ds = _embs(sf_dir)
    out = sim.embedding_all_pairs_exact(ds, threshold=0.45, n_shards=8).to_pandas()
    out["cos_sim"] = round6(out["cos_sim"])
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


_SQL_NEAR_DUP = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.45
"""


def q_embedding_cov(sf_dir: str):
    """Distributed covariance of the embedding matrix (the PCA
    pre-pass; stages/similarity.py:embedding_moments): per-batch
    (n, sum, X^T X) float64 partials -> ONE driver combine of O(d^2)
    state — vectors never shuffle at any corpus size. Output: the
    upper triangle of the first 8 dims (i <= j), ddof=1, computed as
    (XtX_ij - s_i s_j / n) / (n - 1) on both sides."""
    from ..stages.similarity import embedding_moments
    from ..util import stable_round6 as _sr6

    ds = _embs(sf_dir, ["vec_id", "embedding"])
    n, s, xtx = embedding_moments(ds)
    ii, jj = np.triu_indices(8)
    cov = (xtx[ii, jj] - s[ii] * s[jj] / n) / (n - 1)
    return pd.DataFrame({
        "i": ii.astype(np.int64),
        "j": jj.astype(np.int64),
        "cov": _sr6(cov),
    })


_SQL_EMBEDDING_COV = """
WITH d AS (SELECT UNNEST(generate_series(1, 8)) AS i),
p AS (SELECT a.i AS i, b.i AS j FROM d a JOIN d b ON a.i <= b.i),
s AS (
  SELECT p.i, p.j,
         COUNT(*) AS n,
         SUM(CAST(e.embedding[p.i] AS DOUBLE) * CAST(e.embedding[p.j] AS DOUBLE)) AS sxy,
         SUM(CAST(e.embedding[p.i] AS DOUBLE)) AS sx,
         SUM(CAST(e.embedding[p.j] AS DOUBLE)) AS sy
  FROM embeddings e CROSS JOIN p
  GROUP BY p.i, p.j
)
SELECT CAST(i - 1 AS BIGINT) AS i, CAST(j - 1 AS BIGINT) AS j,
       ROUND(ROUND((sxy - sx * sy / n) / (n - 1), 9), 6) AS cov
FROM s ORDER BY i, j
"""


def q_embedding_label_compactness(sf_dir: str):
    """Intra-class compactness probe over the labeled embedding column
    (stages/similarity.py:label_compactness): per label, member count,
    centroid L2 norm, and the mean / min cosine of members to their own
    centroid. Two bounded passes — (labels x d) centroid partials, then
    a broadcast cosine map — vectors never shuffle."""
    from ..util import stable_round6 as _sr6

    ds = _embs(sf_dir, ["label", "embedding"])
    out = sim.label_compactness(ds)
    for c in ("centroid_norm", "mean_cos", "min_cos"):
        out[c] = _sr6(out[c].astype(float))
    return out


_SQL_LABEL_COMPACT = """
WITH u AS (
  SELECT label, vec_id,
         UNNEST(embedding::DOUBLE[]) AS x,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
cent AS (SELECT label, i, AVG(x) AS c FROM u GROUP BY 1, 2),
cn AS (SELECT label, SQRT(SUM(c * c)) AS cnorm FROM cent GROUP BY 1),
dotp AS (
  SELECT u.label, u.vec_id,
         SUM(u.x * cent.c) AS dp,
         SQRT(SUM(u.x * u.x)) AS vnorm
  FROM u JOIN cent ON u.label = cent.label AND u.i = cent.i
  GROUP BY 1, 2
),
cosv AS (
  SELECT d.label, d.dp / (d.vnorm * cn.cnorm) AS cs
  FROM dotp d JOIN cn ON d.label = cn.label
)
SELECT CAST(c.label AS BIGINT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(ROUND(ANY_VALUE(n2.cnorm), 9), 6) AS centroid_norm,
       ROUND(ROUND(AVG(c.cs), 9), 6) AS mean_cos,
       ROUND(ROUND(MIN(c.cs), 9), 6) AS min_cos
FROM cosv c JOIN cn n2 ON c.label = n2.label
GROUP BY c.label ORDER BY label
"""


def q_embedding_pca(sf_dir: str):
    """Top-4 PCA projection of every embedding (stages/similarity.py:
    embedding_pca_project): one-combine covariance moments, driver
    eigh on the d x d matrix, components broadcast into a stateless
    matmul map. Rows-only (eigenvectors aren't SQL-expressible);
    pinned against local numpy in tests/test_pca.py."""
    from ..stages.similarity import embedding_pca_project
    from ..util import stable_round6 as _sr6

    ds = _embs(sf_dir, ["vec_id", "embedding"])
    proj, comps = embedding_pca_project(ds, k=4)
    out = proj.to_pandas()
    out["vec_id"] = out["vec_id"].astype("int64")
    for c in ("pc0", "pc1", "pc2", "pc3"):
        out[c] = _sr6(out[c].astype(float))
    return out.sort_values("vec_id").reset_index(drop=True)


# -------------------------------------------------------------- multimodal


def q_media_decode(sf_dir: str):
    """Multimodal plumbing: binary payload column + actor-pool decode
    stage (stages/multimodal.py, deterministic stub decode). The oracle
    recomputes the fake header/checksum from the source text."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    with_payload = mm.attach_payload_from_text(ds)
    out = mm.decode_features(with_payload, strict=False).to_pandas()
    out = out[["doc_id", "media_bytes", "width", "height", "byte_sum"]]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


_SQL_MEDIA = """
SELECT doc_id,
       octet_length(encode(text)) AS media_bytes,
       ascii(substr(text, 1, 1)) * 256 + ascii(substr(text, 2, 1)) AS width,
       ascii(substr(text, 3, 1)) * 256 + ascii(substr(text, 4, 1)) AS height,
       list_reduce(
         list_prepend(0::BIGINT, list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
         (a, b) -> (a + b) % 2147483647
       ) AS byte_sum
FROM documents
"""


def q_doc_pack_sequences(sf_dir: str):
    """GPT-style sequence packing (stages/packing.py:pack_sequences):
    docs concatenated in doc_id order, stream cut into 512-token
    sequences; per-seq doc/token/start counts. Distributed ordered
    prefix sum: bucketed driver cumsum + one keyed exchange."""
    from ..stages.packing import pack_sequences

    ds = _docs(sf_dir, ["doc_id", "text"])
    out = pack_sequences(ds, seq_len=512, bucket_width=256).to_pandas()
    return out.sort_values("seq_id").reset_index(drop=True)


_SQL_PACK = r"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN len(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n
  FROM documents
),
c AS (
  SELECT doc_id, n, CAST(SUM(n) OVER (ORDER BY doc_id) - n AS BIGINT) AS s
  FROM t WHERE n > 0
),
spans AS (
  SELECT doc_id, n, s, s + n AS e,
         UNNEST(generate_series(CAST(s // 512 AS BIGINT),
                                CAST((s + n - 1) // 512 AS BIGINT))) AS seq
  FROM c
)
SELECT CAST(seq AS BIGINT) AS seq_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(LEAST(e, (seq+1)*512) - GREATEST(s, seq*512)) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN s >= seq*512 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts
FROM spans GROUP BY 1 ORDER BY 1
"""


def q_doc_source_mix(sf_dir: str):
    """Source-weighted data mixing (stages/packing.py:sample_by_source):
    per-source keep rate 5*(1 + src_num % 10) percent, deterministic
    Knuth-hash sampling on doc_id — stable under any partitioning.
    Output: per-source kept counts + mean doc length of the sample."""
    from ..stages.packing import sample_by_source

    ds = _docs(sf_dir, ["doc_id", "source", "n_chars"])

    def rates(src: np.ndarray) -> np.ndarray:
        nums = np.array([int(s[3:]) for s in src], dtype=np.int64)
        return 5 * (1 + nums % 10)

    kept = sample_by_source(ds, rate_fn=rates)

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        g = df.groupby("source", as_index=False).agg(
            n_kept=("doc_id", "size"), sum_chars=("n_chars", "sum")
        )
        return g

    parts = kept.map_batches(partial, batch_format="pyarrow").to_pandas()
    tot = parts.groupby("source", as_index=False)[["n_kept", "sum_chars"]].sum()
    tot["rate"] = 5 * (1 + tot["source"].str[3:].astype(np.int64) % 10)
    out = pd.DataFrame(
        {
            "source": tot["source"],
            "rate": tot["rate"].astype(np.int64),
            "n_kept": tot["n_kept"].astype(np.int64),
            "mean_chars": round6(tot["sum_chars"] / tot["n_kept"]),
        }
    )
    return out.sort_values("source").reset_index(drop=True)


_SQL_SOURCE_MIX = """
WITH r AS (
  SELECT doc_id, source, n_chars,
         5 * (1 + CAST(substr(source, 4) AS BIGINT) % 10) AS rate
  FROM documents
),
s AS (
  SELECT * FROM r
  WHERE (doc_id * 2654435761) % 4294967296 % 100 < rate
)
SELECT source, rate, CAST(COUNT(*) AS BIGINT) AS n_kept,
       ROUND(SUM(n_chars) / COUNT(*), 6) AS mean_chars
FROM s GROUP BY source, rate
HAVING COUNT(*) > 0
ORDER BY source
"""


def q_doc_decontaminate(sf_dir: str):
    """Benchmark decontamination (stages/packing.py:decontaminate):
    benchmark set = distinct 4-word-grams of docs with doc_id % 101 == 0
    (collected + broadcast, never shuffled); every other doc counts its
    distinct grams shared with the set. Hash-membership parity with the
    string-join oracle holds up to 64-bit collisions (< 1e-11 here).
    k=4 exercises the planted-duplicate overlaps in the fixture corpus;
    real decontamination runs use k=8..13."""
    from ..stages.packing import collect_benchmark_grams, decontaminate

    ds = _docs(sf_dir, ["doc_id", "text"])
    bench = collect_benchmark_grams(ds, k=4, bench_mod=101)
    hits = decontaminate(ds, bench, k=4, bench_mod=101).to_pandas()
    out = hits[hits["n_hits"] > 0].copy()
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_hits"] = out["n_hits"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


_SQL_DECONTAM = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id, UNNEST(generate_series(1, CAST(len(ws) - 3 AS BIGINT))) AS i, ws
  FROM w WHERE len(ws) >= 4
),
grams AS (SELECT doc_id, array_to_string(ws[i:i+3], ' ') AS gram FROM g),
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 101 = 0)
SELECT g.doc_id, CAST(COUNT(DISTINCT g.gram) AS BIGINT) AS n_hits
FROM grams g JOIN bench b USING (gram)
WHERE g.doc_id % 101 <> 0
GROUP BY g.doc_id ORDER BY g.doc_id
"""


def q_doc_repetition(sf_dir: str):
    """Gopher-style repetition filters (Rae et al. 2021, public): per
    doc the most-frequent-word / most-frequent-2-gram coverage and the
    fraction of 3-gram positions inside duplicated 3-grams
    (functions/text.py:repetition_features, batch-dictionary-encoded)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        feat = tx.repetition_features(texts)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_words_sp": pa.array(feat["n_words_sp"], pa.int64()),
            "top_word_frac": pa.array(round6(feat["top_word_frac"])),
            "top2gram_frac": pa.array(round6(feat["top2gram_frac"])),
            "dup3gram_frac": pa.array(round6(feat["dup3gram_frac"])),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_SQL_REPETITION = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
p AS (SELECT doc_id, ws, UNNEST(generate_series(1, len(ws))) AS i FROM w),
c1 AS (
  SELECT doc_id, SUM(c) AS n, MAX(c) AS mx FROM (
    SELECT doc_id, ws[i] AS g, COUNT(*) AS c FROM p GROUP BY 1, 2) GROUP BY doc_id
),
c2 AS (
  SELECT doc_id, SUM(c) AS n, MAX(c) AS mx FROM (
    SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g, COUNT(*) AS c
    FROM p WHERE i <= len(ws) - 1 GROUP BY 1, 2) GROUP BY doc_id
),
c3 AS (
  SELECT doc_id, SUM(c) AS n,
         SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup FROM (
    SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g, COUNT(*) AS c
    FROM p WHERE i <= len(ws) - 2 GROUP BY 1, 2) GROUP BY doc_id
)
SELECT w.doc_id,
       CAST(len(w.ws) AS BIGINT) AS n_words_sp,
       ROUND(COALESCE(c1.mx * 1.0 / c1.n, 0), 6) AS top_word_frac,
       ROUND(COALESCE(c2.mx * 1.0 / c2.n, 0), 6) AS top2gram_frac,
       ROUND(COALESCE(c3.dup * 1.0 / c3.n, 0), 6) AS dup3gram_frac
FROM w
LEFT JOIN c1 USING (doc_id) LEFT JOIN c2 USING (doc_id) LEFT JOIN c3 USING (doc_id)
"""


def q_doc_pii(sf_dir: str):
    """PII detection + redaction (functions/text.py PII kernels: RE2
    email/phone/IPv4 patterns, Arrow count + replace kernels). The word
    -salad corpus carries no natural PII, so the query first SYNTHESIZES
    it deterministically from doc_id (pure Arrow string algebra, same
    CASE expression as the oracle), then counts matches and verifies
    redaction via the redacted length."""
    import pyarrow.compute as pc

    ds = _docs(sf_dir, ["doc_id", "text"])

    def pmod(a, m):
        # pyarrow.compute has no modulo kernel; ids are non-negative so
        # truncated integer division is exact
        return pc.subtract(a, pc.multiply(pc.divide(a, m), m))

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        id_str = pc.cast(ids, pa.string())
        txt = t["text"]
        j = pc.binary_join_element_wise
        m0 = j(txt, " contact user", id_str, "@example.com now", "")
        m1 = j(
            txt, " call 555-",
            pc.utf8_lpad(pc.cast(pmod(ids, 1000), pa.string()), 3, "0"), "-",
            pc.utf8_lpad(pc.cast(pmod(pc.multiply(ids, 7), 10000), pa.string()), 4, "0"),
            "",
        )
        m2 = j(
            txt, " from 10.",
            pc.cast(pmod(ids, 256), pa.string()), ".",
            pc.cast(pmod(pc.multiply(ids, 3), 256), pa.string()), ".",
            pc.cast(pmod(pc.multiply(ids, 7), 256), pa.string()),
            "",
        )
        mod3 = pmod(ids, 3)
        pii_text = pc.if_else(pc.equal(mod3, 0), m0, pc.if_else(pc.equal(mod3, 1), m1, m2))
        counts = tx.pii_counts(pii_text)
        red = tx.pii_redact(pii_text)
        return pa.table({
            "doc_id": ids,
            "n_email": counts["n_email"],
            "n_phone": counts["n_phone"],
            "n_ipv4": counts["n_ipv4"],
            "src_len": pc.utf8_length(pii_text).cast(pa.int64()),
            "red_len": pc.utf8_length(red).cast(pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_SQL_PII = r"""
WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
                THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
              WHEN doc_id % 3 = 1
                THEN text || ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                     || '-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
              ELSE text || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                   || '.' || CAST((doc_id * 3) % 256 AS VARCHAR)
                   || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
         END AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(t, '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b')) AS BIGINT) AS n_phone,
       CAST(len(regexp_extract_all(t, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ipv4,
       CAST(length(t) AS BIGINT) AS src_len,
       CAST(length(
         regexp_replace(regexp_replace(regexp_replace(t,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<PII>', 'g'),
           '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '<PII>', 'g'),
           '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<PII>', 'g')
       ) AS BIGINT) AS red_len
FROM p
"""


def q_doc_chunk(sf_dir: str):
    """Document chunking for training-context assembly: fixed 32-word
    windows at stride 24 (8-word overlap), last window ragged. Pure
    per-batch transform (flat_map shape, no shuffle); window starts are
    vectorized arithmetic, only the final chunk-text join runs per
    OUTPUT row (string assembly is the result payload, not index
    math)."""
    ds = _docs(sf_dir, ["doc_id", "text"])
    W, S = 32, 24

    def fn(t: pa.Table) -> pd.DataFrame:
        texts = t["text"].to_pylist()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        words = [s.split(" ") if s else [] for s in texts]
        n = np.array([len(w) for w in words], dtype=np.int64)
        n_chunks = np.where(n > 0, (np.maximum(n, 1) - 1) // S + 1, 0)
        doc_i = np.repeat(np.arange(len(texts)), n_chunks)
        chunk_id = np.concatenate([np.arange(c) for c in n_chunks]) if len(doc_i) else np.zeros(0, np.int64)
        start = chunk_id * S
        end = np.minimum(start + W, n[doc_i])
        chunk_text = [" ".join(words[d][s:e]) for d, s, e in zip(doc_i, start, end)]
        return pd.DataFrame(
            {
                "doc_id": ids[doc_i],
                "chunk_id": chunk_id.astype(np.int64),
                "n_words_chunk": (end - start).astype(np.int64),
                "chunk_text": chunk_text,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


_SQL_CHUNK = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
c AS (
  SELECT doc_id, ws,
         UNNEST(generate_series(0, CAST(len(ws) - 1 AS BIGINT), 24)) AS s
  FROM w WHERE len(ws) > 0
)
SELECT doc_id,
       CAST(s / 24 AS BIGINT) AS chunk_id,
       CAST(LEAST(s + 32, len(ws)) - s AS BIGINT) AS n_words_chunk,
       array_to_string(ws[s + 1 : LEAST(s + 32, len(ws))], ' ') AS chunk_text
FROM c
"""


def q_source_vocab_divergence(sf_dir: str):
    """Per-source vocabulary statistics + pairwise Jaccard divergence
    between source vocabularies (corpus-mixing diagnostics). Distributed
    shape: per-batch DISTINCT (source, term) partials (bounded by
    sources x vocab) -> driver dedup -> vectorized pairwise intersection
    via sorted-code set ops. Open-vocab corpora would swap the driver
    combine for a term-keyed exchange with per-partition pair counts."""
    from ..stages.exchange import driver_combine

    ds = _docs(sf_dir, ["source", "text"])

    def partial(t: pa.Table) -> pd.DataFrame:
        src = t["source"].to_pylist()
        texts = t["text"].to_pylist()
        words = [s.split(" ") if s else [] for s in texts]
        lens = np.array([len(w) for w in words], dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"source": pd.Series([], dtype=object),
                                 "term": pd.Series([], dtype=object)})
        src_rep = np.repeat(np.array(src, dtype=object), lens)
        flat = np.array([w for ws in words for w in ws], dtype=object)
        df = pd.DataFrame({"source": src_rep, "term": flat})
        return df.drop_duplicates(ignore_index=True)

    v = driver_combine(ds, partial, lambda p: p.drop_duplicates(ignore_index=True))
    terms, codes = np.unique(v["term"].to_numpy(), return_inverse=True)
    sets = {s: np.unique(codes[(v["source"] == s).to_numpy()]) for s in v["source"].unique()}
    srcs = sorted(sets)
    rows = []
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            inter = len(np.intersect1d(sets[sa], sets[sb], assume_unique=True))
            union = len(sets[sa]) + len(sets[sb]) - inter
            rows.append((sa, sb, len(sets[sa]), len(sets[sb]),
                         round6(np.float64(inter) / union if union else 0.0)))
    return pd.DataFrame(rows, columns=["sa", "sb", "n_terms_a", "n_terms_b", "jaccard"])


_SQL_VOCAB_DIV = """
WITH v AS (
  SELECT DISTINCT source, UNNEST(string_split(text, ' ')) AS term FROM documents
),
sz AS (SELECT source, COUNT(*) AS n FROM v GROUP BY 1),
ix AS (
  SELECT v1.source AS sa, v2.source AS sb, COUNT(*) AS inter
  FROM v v1 JOIN v v2 USING (term)
  WHERE v1.source < v2.source
  GROUP BY 1, 2
)
SELECT a.source AS sa, b.source AS sb,
       CAST(a.n AS BIGINT) AS n_terms_a, CAST(b.n AS BIGINT) AS n_terms_b,
       ROUND(COALESCE(ix.inter, 0) * 1.0 / (a.n + b.n - COALESCE(ix.inter, 0)), 6) AS jaccard
FROM sz a JOIN sz b ON a.source < b.source
LEFT JOIN ix ON ix.sa = a.source AND ix.sb = b.source
ORDER BY sa, sb
"""


def q_doc_tfidf_top(sf_dir: str):
    """TF-IDF top-3 terms per doc. Distributed shape: pass 1 computes
    document frequencies as per-batch vectorized partials (one row per
    DISTINCT term per batch — bounded by vocabulary, the right shape
    for a closed vocab; an open-vocab corpus would swap the driver
    combine + broadcast for one term-keyed exchange join), pass 2
    broadcasts the idf table and scores each batch with one
    dictionary-encode + pair-code unique (tf per (doc, term) without
    per-row Python). idf = ln((1+N)/(1+df)); ties broken by term asc
    on both sides; scores stable_round6-ed (ln ulp noise between libm
    and DuckDB collapses at the 9-decimal pre-round)."""
    from ..stages.exchange import driver_combine
    from ..util import stable_round6

    ds = _docs(sf_dir, ["doc_id", "text"])
    n_docs = ds.count()  # parquet metadata, no data pass

    def df_partial(t: pa.Table) -> pd.DataFrame:
        texts = t["text"].to_pylist()
        words_per_doc = [s.split(" ") if s else [] for s in texts]
        lens = np.array([len(w) for w in words_per_doc], dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"term": pd.Series([], dtype=object),
                                 "df": pd.Series([], dtype=np.int64)})
        doc_idx = np.repeat(np.arange(len(texts)), lens)
        all_words = np.array([w for ws in words_per_doc for w in ws], dtype=object)
        uniq, inv = np.unique(all_words, return_inverse=True)
        pair = np.unique(doc_idx * len(uniq) + inv)
        w_i, cnt = np.unique(pair % len(uniq), return_counts=True)
        return pd.DataFrame({"term": uniq[w_i], "df": cnt})

    df_tab = driver_combine(
        ds, df_partial, lambda p: p.groupby("term", as_index=False)["df"].sum()
    )
    idf = pd.Series(
        np.log((1.0 + n_docs) / (1.0 + df_tab["df"].to_numpy(dtype=np.float64))),
        index=df_tab["term"].to_numpy(),
    )

    def score_batch(t: pa.Table) -> pd.DataFrame:
        texts = t["text"].to_pylist()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        words_per_doc = [s.split(" ") if s else [] for s in texts]
        lens = np.array([len(w) for w in words_per_doc], dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=ids.dtype),
                                 "rank": pd.Series([], dtype=np.int64),
                                 "term": pd.Series([], dtype=object),
                                 "score": pd.Series([], dtype=np.float64)})
        doc_idx = np.repeat(np.arange(len(texts)), lens)
        all_words = np.array([w for ws in words_per_doc for w in ws], dtype=object)
        uniq, inv = np.unique(all_words, return_inverse=True)
        pair, cnt = np.unique(doc_idx * len(uniq) + inv, return_counts=True)
        d_i = pair // len(uniq)
        w_i = pair % len(uniq)
        score = cnt.astype(np.float64) * idf.reindex(uniq[w_i]).to_numpy()
        out = pd.DataFrame({"doc_id": ids[d_i], "term": uniq[w_i], "score": score})
        out = out.sort_values(
            ["doc_id", "score", "term"], ascending=[True, False, True], kind="stable"
        )
        out["rank"] = out.groupby("doc_id").cumcount() + 1
        out = out[out["rank"] <= 3].copy()
        out["score"] = stable_round6(out["score"])
        out["rank"] = out["rank"].astype(np.int64)
        return out[["doc_id", "rank", "term", "score"]]

    res = ds.map_batches(score_batch, batch_format="pyarrow").to_pandas()
    return res.sort_values(["doc_id", "rank"]).reset_index(drop=True)


_SQL_TFIDF = """
WITH w AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY 1, 2),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY 1),
n AS (SELECT COUNT(*) AS n FROM documents),
s AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * ln((1.0 + n.n) / (1.0 + df.df)) AS score
  FROM tf JOIN df USING (term) CROSS JOIN n
),
r AS (
  SELECT doc_id, term, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
  FROM s
)
SELECT doc_id, CAST(rnk AS BIGINT) AS rank, term, ROUND(ROUND(score, 9), 6) AS score
FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk
"""


def q_doc_bm25_topk(sf_dir: str):
    """Okapi BM25 retrieval (stages/bm25.py, Robertson & Zaragoza
    2009): three queries derived deterministically from the corpus's
    own DF ranking (head / mid / tail terms), scored in two passes —
    slim query-term DF partials, then per-batch pair-code scoring with
    partial top-k. k1=1.2, b=0.75, k=5; ranks on stable_round6 scores
    with doc_id ties. The SQL oracle replays term selection, idf, and
    the saturation formula exactly."""
    from ..stages.bm25 import bm25_topk
    from ..stages.exchange import driver_combine

    ds = _docs(sf_dir, ["doc_id", "text"])

    def df_partial(t: pa.Table) -> pd.DataFrame:
        texts = t["text"].to_pylist()
        words_per_doc = [s.split(" ") if s else [] for s in texts]
        lens = np.array([len(w) for w in words_per_doc], dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"term": pd.Series([], dtype=object),
                                 "df": pd.Series([], dtype=np.int64)})
        doc_idx = np.repeat(np.arange(len(texts)), lens)
        flat = np.array([w for ws in words_per_doc for w in ws], dtype=object)
        uniq, inv = np.unique(flat, return_inverse=True)
        pair = np.unique(doc_idx * len(uniq) + inv)
        w_i, cnt = np.unique(pair % len(uniq), return_counts=True)
        return pd.DataFrame({"term": uniq[w_i], "df": cnt})

    df_tab = driver_combine(
        ds, df_partial, lambda p: p.groupby("term", as_index=False)["df"].sum()
    ).sort_values(["df", "term"], ascending=[False, True]).reset_index(drop=True)
    ranked = df_tab["term"].tolist()
    queries = {
        "q_top": ranked[0:2],
        "q_mid": ranked[4:6],
        "q_rare": ranked[9:12],
    }
    out = bm25_topk(ds, queries, k=5)
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


_SQL_BM25 = """
WITH w AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY 1),
sel AS (SELECT term, df, ROW_NUMBER() OVER (ORDER BY df DESC, term) AS r FROM df),
q AS (
  SELECT 'q_top' AS query_id, term, df FROM sel WHERE r IN (1, 2)
  UNION ALL SELECT 'q_mid', term, df FROM sel WHERE r IN (5, 6)
  UNION ALL SELECT 'q_rare', term, df FROM sel WHERE r IN (10, 11, 12)
),
stats AS (
  SELECT (SELECT COUNT(*) FROM documents) AS n,
         (SELECT COUNT(*) FROM w) * 1.0
           / (SELECT COUNT(*) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY 1, 2),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM w GROUP BY 1),
s AS (
  SELECT q.query_id, tf.doc_id,
         SUM(ln(1 + (stats.n - q.df + 0.5) / (q.df + 0.5))
             * tf.tf * (1.2 + 1.0)
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))) AS raw
  FROM tf JOIN q USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY 1, 2
),
r AS (
  SELECT query_id, doc_id, ROUND(ROUND(raw, 9), 6) AS score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY ROUND(ROUND(raw, 9), 6) DESC, doc_id) AS rnk
  FROM s
)
SELECT query_id, CAST(rnk AS BIGINT) AS rank, doc_id, score
FROM r WHERE rnk <= 5 ORDER BY query_id, rnk
"""


def q_embedding_kmeans(sf_dir: str):
    """Distributed Lloyd's k-means (stages/cluster.py): k=8 centroids
    initialised from the 8 smallest vec_ids, 3 full update iterations
    (one combiner-shaped map_batches pass each, stable_round6-ed
    centroids), final assignment pass. Oracle = generated chained-CTE
    SQL replaying the identical iterations."""
    from ..stages.cluster import kmeans_lloyd

    ds = _embs(sf_dir, ["vec_id", "embedding"])
    _, out = kmeans_lloyd(ds, 8, n_iter=3)
    df = out.to_pandas()
    df["vec_id"] = df["vec_id"].astype("int64")
    df["cluster"] = df["cluster"].astype("int64")
    return df.sort_values("vec_id").reset_index(drop=True)


def _sql_kmeans(k: int = 8, d: int = 64, n_iter: int = 3, tail: str | None = None) -> str:
    """Generate the chained-CTE k-means oracle: c0 = k smallest-id
    embeddings; per iteration an assignment CTE (argmin of squared L2,
    ties to lowest cid) and a centroid-update CTE with
    ROUND(ROUND(AVG,9),6) per dim (== engine stable_round6) and
    COALESCE to the previous centroid for empty clusters. ``tail``
    replaces the default final SELECT (it sees the ``afinal``
    assignment CTE and the raw ``e`` embeddings) — used by the
    SemDeDup oracle."""
    dist = (
        "list_sum(list_transform(range(1, {dp1}), i -> "
        "(CAST(e.embedding[i] AS DOUBLE) - c.c[i]) * "
        "(CAST(e.embedding[i] AS DOUBLE) - c.c[i])))"
    ).format(dp1=d + 1)
    sql = [
        f"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
c0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c
  FROM (SELECT vec_id, embedding FROM e ORDER BY vec_id LIMIT {k})
)"""
    ]
    for it in range(1, n_iter + 1):
        sql.append(f""",
a{it} AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY {dist}, c.cid) AS rn
    FROM e CROSS JOIN c{it - 1} c) WHERE rn = 1
),
c{it} AS (
  SELECT p.cid, COALESCE(n.c, p.c) AS c
  FROM c{it - 1} p LEFT JOIN (
    SELECT cid, list(v ORDER BY dim) AS c FROM (
      SELECT a.cid AS cid, t.dim AS dim,
             ROUND(ROUND(AVG(CAST(e.embedding[t.dim] AS DOUBLE)), 9), 6) AS v
      FROM a{it} a JOIN e USING (vec_id) CROSS JOIN range(1, {d + 1}) t(dim)
      GROUP BY a.cid, t.dim) GROUP BY cid) n USING (cid)
)""")
    sql.append(f""",
afinal AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY {dist}, c.cid) AS rn
    FROM e CROSS JOIN c{n_iter} c) WHERE rn = 1
)
{tail or "SELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM afinal ORDER BY vec_id"}""")
    return "".join(sql)


_SQL_KMEANS = _sql_kmeans()

_SEMDEDUP_THRESHOLD = 0.55

_SQL_SEMDEDUP = _sql_kmeans(tail=f""",
pair AS (
  SELECT a.vec_id AS id,
         MAX(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[])) AS mx
  FROM afinal a
  JOIN afinal b ON a.cid = b.cid AND b.vec_id < a.vec_id
  JOIN e ea ON ea.vec_id = a.vec_id
  JOIN e eb ON eb.vec_id = b.vec_id
  GROUP BY a.vec_id
)
SELECT a.vec_id,
       CAST(a.cid AS BIGINT) AS cluster,
       CAST(CASE WHEN p.mx >= {_SEMDEDUP_THRESHOLD} THEN 1 ELSE 0 END AS BIGINT) AS is_dup,
       ROUND(COALESCE(p.mx, -2.0), 6) AS max_cos_lower
FROM afinal a LEFT JOIN pair p ON p.id = a.vec_id
ORDER BY a.vec_id""".lstrip())


def q_embedding_dbscan(sf_dir: str):
    """DBSCAN (Ester et al. 1996; stages/cluster.py:dbscan_embeddings)
    over the embedding column: squared-L2 eps-graph (eps^2 = 1.3,
    min_pts = 4 incl. self), core = connected components via min-label
    propagation, border = min-id core neighbor's cluster (the
    deterministic refinement of the scan-order-dependent classic),
    noise = -1. Pairs come from the exact sharded all-pairs self-join;
    the threshold margin (no pair within 5e-5 of eps^2 at sf0.001/0.01)
    is pinned by tests, so engine matmul vs oracle sequential-sum FP
    order cannot flip a membership."""
    from ..stages.cluster import dbscan_embeddings

    ds = _embs(sf_dir, ["vec_id", "embedding"])
    out = dbscan_embeddings(ds, eps2=1.3, min_pts=4).to_pandas()
    return (
        out.astype({"vec_id": "int64", "cluster": "int64"})
        .sort_values("vec_id")
        .reset_index(drop=True)
    )


_SQL_DBSCAN = r"""
WITH RECURSIVE e AS (
  SELECT vec_id, embedding FROM embeddings
), d AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib
  FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE list_reduce(
          list_transform(range(1, len(a.embedding) + 1),
            i -> (a.embedding[i]::DOUBLE - b.embedding[i]::DOUBLE)
               * (a.embedding[i]::DOUBLE - b.embedding[i]::DOUBLE)),
          (x, y) -> x + y) <= 1.3
), dirs AS (
  SELECT ia AS node, ib AS nbr FROM d
  UNION ALL
  SELECT ib, ia FROM d
), deg AS (
  SELECT node, COUNT(*) AS deg FROM dirs GROUP BY 1
), core AS (
  SELECT e.vec_id, COALESCE(deg.deg, 0) + 1 >= 4 AS is_core
  FROM e LEFT JOIN deg ON e.vec_id = deg.node
), cdirs AS (
  SELECT dirs.node, dirs.nbr
  FROM dirs
  JOIN core ca ON dirs.node = ca.vec_id AND ca.is_core
  JOIN core cb ON dirs.nbr = cb.vec_id AND cb.is_core
), reach(node, lbl) AS (
  SELECT vec_id, vec_id FROM core WHERE is_core
  UNION
  SELECT c.nbr, reach.lbl FROM reach JOIN cdirs c ON c.node = reach.node
), comp AS (
  SELECT node, MIN(lbl) AS cluster FROM reach GROUP BY 1
), border AS (
  SELECT dirs.node, MIN(dirs.nbr) AS core_nbr
  FROM dirs
  JOIN core cn ON dirs.node = cn.vec_id AND NOT cn.is_core
  JOIN core cb ON dirs.nbr = cb.vec_id AND cb.is_core
  GROUP BY 1
)
SELECT e.vec_id,
       CASE WHEN c.is_core THEN 'core'
            WHEN b.node IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role,
       CASE WHEN c.is_core THEN comp.cluster
            WHEN b.node IS NOT NULL THEN comp2.cluster
            ELSE -1 END AS cluster
FROM e
JOIN core c ON e.vec_id = c.vec_id
LEFT JOIN comp ON e.vec_id = comp.node
LEFT JOIN border b ON e.vec_id = b.node
LEFT JOIN comp comp2 ON b.core_nbr = comp2.node
ORDER BY e.vec_id
"""


def q_embedding_semdedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023 arXiv:2303.09540,
    stages/cluster.py:semdedup_flags): k-means clusters (the
    embedding_kmeans configuration: k=8, 3 iterations, smallest-id
    init), then intra-cluster cosine screening — a vector is a
    duplicate when a LOWER-id member of its cluster has cosine >=
    0.55. One assignment pass + one keyed exchange; quadratic cost is
    per cluster (the paper's design point). Oracle replays the k-means
    iterations via the chained-CTE generator, then an in-cluster
    self-join."""
    from ..stages.cluster import kmeans_lloyd, semdedup_flags

    ds = _embs(sf_dir, ["vec_id", "embedding"])
    C, _ = kmeans_lloyd(ds, 8, n_iter=3)
    out = semdedup_flags(ds, C, threshold=_SEMDEDUP_THRESHOLD).to_pandas()
    out["vec_id"] = out["vec_id"].astype("int64")
    out["cluster"] = out["cluster"].astype("int64")
    out["is_dup"] = out["is_dup"].astype("int64")
    out["max_cos_lower"] = round6(out["max_cos_lower"].astype(float))
    return out.sort_values("vec_id").reset_index(drop=True)


def q_doc_lm_perplexity(sf_dir: str):
    """Bigram-LM perplexity scoring (CCNet-style quality filter,
    Wenzek et al. 2020 arXiv:1911.00359; stages/lm.py): train add-k
    bigram counts over the corpus in one partial-count pass (text
    never shuffles), broadcast the model once via ray.put, score every
    doc in an actor pool (model decoded per actor in __init__,
    integer-coded vectorized lookups). avg_logprob = mean log2
    P(w2|w1), perplexity = 2^-avg; docs with < 2 words carry the
    -9999 sentinel."""
    from ..stages.lm import score_perplexity, train_bigram_lm
    from ..util import stable_round6

    ds = _docs(sf_dir, ["doc_id", "text"])
    model = train_bigram_lm(ds, "text")
    out = score_perplexity(ds, model).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_bigrams"] = out["n_bigrams"].astype("int64")
    out["avg_logprob"] = stable_round6(out["avg_logprob"].astype(float))
    out["perplexity"] = stable_round6(out["perplexity"].astype(float))
    return out.sort_values("doc_id").reset_index(drop=True)


_SQL_LM_PPL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tok AS (SELECT UNNEST(ws) AS wd FROM w),
uni AS (SELECT CAST(COUNT(DISTINCT wd) AS DOUBLE) AS V FROM tok),
g AS (
  SELECT doc_id, UNNEST(generate_series(1, CAST(len(ws) - 1 AS BIGINT))) AS i, ws
  FROM w WHERE len(ws) >= 2
),
pairs AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2 FROM g),
bc AS (SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS cb FROM pairs GROUP BY 1, 2),
ctx AS (SELECT w1, CAST(SUM(cb) AS DOUBLE) AS c1 FROM bc GROUP BY 1),
scored AS (
  SELECT p.doc_id, log2((bc.cb + 0.5) / (ctx.c1 + 0.5 * uni.V)) AS lp
  FROM pairs p JOIN bc USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN uni
),
agg AS (
  SELECT doc_id, COUNT(*) AS n, AVG(lp) AS avg_lp FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(a.n, 0) AS BIGINT) AS n_bigrams,
       ROUND(ROUND(COALESCE(a.avg_lp, -9999.0), 9), 6) AS avg_logprob,
       ROUND(ROUND(COALESCE(POWER(2.0, -a.avg_lp), -9999.0), 9), 6) AS perplexity
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""


def q_doc_gopher_rules(sf_dir: str):
    """Gopher quality-rule battery (Rae et al. 2021 Table A1;
    functions/text.py:gopher_rules, Arrow-regex vectorized): per-doc
    word count / mean word length / symbol ratio / alphabetic-word
    fraction / distinct-required-stopword count, one boolean per rule,
    AND-combined keep. Thresholds tuned so every rule discriminates on
    this corpus (word count [30, 70], the rest at paper defaults)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        feat = tx.gopher_rules(t["text"], min_words=30, max_words=70)
        cols = {"doc_id": t["doc_id"]}
        cols["n_words"] = pa.array(feat["n_words"], pa.int64())
        cols["mean_word_len"] = pa.array(round6(feat["mean_word_len"]))
        cols["symbol_ratio"] = pa.array(round6(feat["symbol_ratio"]))
        cols["alpha_word_frac"] = pa.array(round6(feat["alpha_word_frac"]))
        cols["n_stop_distinct"] = pa.array(feat["n_stop_distinct"], pa.int64())
        for r in ("rule_word_count", "rule_mean_word_len", "rule_symbol_ratio",
                  "rule_alpha_words", "rule_stopwords", "keep"):
            cols[r] = pa.array(feat[r].astype(np.int64), pa.int64())
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_SQL_GOPHER_RULES = r"""
WITH f AS (
  SELECT doc_id,
         length(text) AS n_chars,
         CASE WHEN len(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n_words,
         len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\.\.\.')) AS n_sym,
         len(regexp_extract_all(text, '[^ ]*[a-zA-Z][^ ]*')) AS n_alpha,
         (CASE WHEN regexp_matches(text, '\bthe\b') THEN 1 ELSE 0 END
        + CASE WHEN regexp_matches(text, '\bbe\b') THEN 1 ELSE 0 END
        + CASE WHEN regexp_matches(text, '\bto\b') THEN 1 ELSE 0 END
        + CASE WHEN regexp_matches(text, '\bof\b') THEN 1 ELSE 0 END
        + CASE WHEN regexp_matches(text, '\band\b') THEN 1 ELSE 0 END
        + CASE WHEN regexp_matches(text, '\bthat\b') THEN 1 ELSE 0 END
        + CASE WHEN regexp_matches(text, '\bhave\b') THEN 1 ELSE 0 END
        + CASE WHEN regexp_matches(text, '\bwith\b') THEN 1 ELSE 0 END) AS n_stop
  FROM documents
), r AS (
  SELECT doc_id, n_words, n_stop,
         CASE WHEN n_words > 0
              THEN (n_chars - greatest(n_words - 1, 0)) * 1.0 / greatest(n_words, 1)
              ELSE 0.0 END AS mwl,
         CASE WHEN n_words > 0 THEN n_sym * 1.0 / greatest(n_words, 1) ELSE 0.0 END AS symr,
         CASE WHEN n_words > 0 THEN n_alpha * 1.0 / greatest(n_words, 1) ELSE 0.0 END AS alphaf
  FROM f
), b AS (
  SELECT doc_id, n_words, n_stop, mwl, symr, alphaf,
         CASE WHEN n_words >= 30 AND n_words <= 70 THEN 1 ELSE 0 END AS r_wc,
         CASE WHEN mwl >= 3.0 AND mwl <= 10.0 THEN 1 ELSE 0 END AS r_mwl,
         CASE WHEN symr <= 0.1 THEN 1 ELSE 0 END AS r_sym,
         CASE WHEN alphaf >= 0.8 THEN 1 ELSE 0 END AS r_alpha,
         CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS r_stop
  FROM r
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       ROUND(mwl, 6) AS mean_word_len,
       ROUND(symr, 6) AS symbol_ratio,
       ROUND(alphaf, 6) AS alpha_word_frac,
       CAST(n_stop AS BIGINT) AS n_stop_distinct,
       CAST(r_wc AS BIGINT) AS rule_word_count,
       CAST(r_mwl AS BIGINT) AS rule_mean_word_len,
       CAST(r_sym AS BIGINT) AS rule_symbol_ratio,
       CAST(r_alpha AS BIGINT) AS rule_alpha_words,
       CAST(r_stop AS BIGINT) AS rule_stopwords,
       CAST(r_wc * r_mwl * r_sym * r_alpha * r_stop AS BIGINT) AS keep
FROM b
"""


def q_doc_mix_temperature(sf_dir: str):
    """Temperature-scaled source mixing (Arivazhagan et al. 2019
    arXiv:1907.05019; stages/packing.py:temperature_mix): per-source
    token counts -> w_s = n_s^0.7 / sum n^0.7, token allocation at a
    100k budget, implied epochs. One bounded driver combine; text
    never shuffles."""
    from ..stages.packing import temperature_mix
    from ..util import stable_round6

    ds = _docs(sf_dir, ["source", "text"])
    out = temperature_mix(ds, tau=0.7, budget_tokens=100_000)
    for c in ("weight", "sampled_tokens", "epochs"):
        out[c] = stable_round6(out[c].astype(float))
    return out.reset_index(drop=True)


_SQL_MIX_TEMPERATURE = r"""
WITH n AS (
  SELECT source,
         SUM(CASE WHEN len(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END) AS n_tokens
  FROM documents GROUP BY source
), p AS (
  SELECT source, n_tokens, POWER(n_tokens, 0.7) AS pw FROM n
), s AS (SELECT SUM(pw) AS z FROM p)
SELECT p.source,
       CAST(p.n_tokens AS BIGINT) AS n_tokens,
       ROUND(ROUND(p.pw / s.z, 9), 6) AS weight,
       ROUND(ROUND(p.pw / s.z * 100000.0, 9), 6) AS sampled_tokens,
       ROUND(ROUND(p.pw / s.z * 100000.0 / p.n_tokens, 9), 6) AS epochs
FROM p CROSS JOIN s
ORDER BY p.source
"""


def q_doc_ccnet_buckets(sf_dir: str):
    """CCNet perplexity bucketing (Wenzek et al. 2020 arXiv:1911.00359
    §4.3: per-language head/middle/tail split at perplexity tertiles):
    bigram-LM scored perplexity (stages/lm.py, model broadcast once),
    rounded to 6dp for rank stability, per-lang EXACT tertile cuts via
    the streaming keyed quantile pass (stages/stratified.py:
    keyed_quantile_cont — 3 bounded passes, no whole-lang block), cuts
    broadcast into a stateless assignment map. Text never shuffles."""
    from ..stages.lm import score_perplexity, train_bigram_lm
    from ..stages.stratified import keyed_quantile_cont
    from ..util import stable_round6

    ds = _docs(sf_dir, ["doc_id", "text", "lang"])
    model = train_bigram_lm(ds, "text")
    scored = score_perplexity(ds, model, keep_cols=("lang",))

    def rnd(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n_bigrams"] > 0].copy()
        df["perplexity"] = stable_round6(df["perplexity"].astype(float))
        return df[["doc_id", "lang", "perplexity"]]

    scored_r = scored.map_batches(rnd, batch_format="pandas")
    cuts = keyed_quantile_cont(scored_r, "lang", "perplexity", [1.0 / 3.0, 2.0 / 3.0])
    lo = dict(zip(cuts[cuts["q"] == cuts["q"].min()]["lang"],
                  cuts[cuts["q"] == cuts["q"].min()]["value"]))
    hi = dict(zip(cuts[cuts["q"] == cuts["q"].max()]["lang"],
                  cuts[cuts["q"] == cuts["q"].max()]["value"]))
    lo_ref, hi_ref = ray.put(lo), ray.put(hi)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _r
        lo_m, hi_m = _r.get(lo_ref), _r.get(hi_ref)
        df = df.copy()
        c1 = df["lang"].map(lo_m).to_numpy(dtype=np.float64)
        c2 = df["lang"].map(hi_m).to_numpy(dtype=np.float64)
        p = df["perplexity"].to_numpy(dtype=np.float64)
        df["bucket"] = np.where(p <= c1, "head", np.where(p <= c2, "middle", "tail"))
        return df

    out = scored_r.map_batches(assign, batch_format="pandas").to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


_SQL_CCNET_BUCKETS = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tok AS (SELECT UNNEST(ws) AS wd FROM w),
uni AS (SELECT CAST(COUNT(DISTINCT wd) AS DOUBLE) AS V FROM tok),
g AS (
  SELECT doc_id, UNNEST(generate_series(1, CAST(len(ws) - 1 AS BIGINT))) AS i, ws
  FROM w WHERE len(ws) >= 2
),
pairs AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2 FROM g),
bc AS (SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS cb FROM pairs GROUP BY 1, 2),
ctx AS (SELECT w1, CAST(SUM(cb) AS DOUBLE) AS c1 FROM bc GROUP BY 1),
scored AS (
  SELECT p.doc_id, log2((bc.cb + 0.5) / (ctx.c1 + 0.5 * uni.V)) AS lp
  FROM pairs p JOIN bc USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN uni
),
agg AS (
  SELECT doc_id, COUNT(*) AS n, AVG(lp) AS avg_lp FROM scored GROUP BY doc_id
),
ppl AS (
  SELECT d.doc_id, d.lang,
         ROUND(ROUND(POWER(2.0, -a.avg_lp), 9), 6) AS perplexity
  FROM documents d JOIN agg a USING (doc_id) WHERE a.n > 0
),
cuts AS (
  SELECT lang,
         QUANTILE_CONT(perplexity, 1.0/3.0) AS c1,
         QUANTILE_CONT(perplexity, 2.0/3.0) AS c2
  FROM ppl GROUP BY lang
)
SELECT p.doc_id, p.lang, p.perplexity,
       CASE WHEN p.perplexity <= c.c1 THEN 'head'
            WHEN p.perplexity <= c.c2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM ppl p JOIN cuts c USING (lang)
ORDER BY p.doc_id
"""


def q_doc_dsir(sf_dir: str):
    """DSIR data selection (Xie et al. 2023 arXiv:2302.03169,
    stages/dsir.py): bag-of-ngram-bucket importance weights — target
    set = docs with doc_id % 101 == 0 (decontaminate convention), 64
    vocab-rank buckets, add-1 smoothing; exact distributed top-50 of
    non-target docs by (rounded logw desc, doc_id). Two passes over the
    text (fit partials + score), one slim top-k combine; the text
    never shuffles. Selection compares stable_round6(logw) on BOTH
    sides so FP summation-order noise cannot flip the rank-50
    boundary."""
    from ..stages.dsir import collect_vocab, dsir_weights, fit_dsir, select_top_k
    from ..util import stable_round6 as _sr6

    ds = _docs(sf_dir, ["doc_id", "text"])
    vocab = collect_vocab(ds)
    lr = fit_dsir(ds, vocab, target_mod=101, n_buckets=64)
    scores = dsir_weights(ds, vocab, lr, target_mod=101)

    def _round(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["logw"] = _sr6(df["logw"].astype(float))
        return df

    out = select_top_k(scores.map_batches(_round, batch_format="pandas"), 50).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    out["is_target"] = out["is_target"].astype("int64")
    out["selected"] = out["selected"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


_SQL_DSIR = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tok AS (SELECT doc_id, UNNEST(ws) AS wd FROM w),
vocab AS (
  SELECT wd, CAST(DENSE_RANK() OVER (ORDER BY wd) - 1 AS BIGINT) AS code
  FROM (SELECT DISTINCT wd FROM tok)
),
b AS (SELECT t.doc_id, v.code % 64 AS bucket FROM tok t JOIN vocab v USING (wd)),
tc AS (SELECT bucket, COUNT(*) AS n FROM b WHERE doc_id % 101 = 0 GROUP BY 1),
rc AS (SELECT bucket, COUNT(*) AS n FROM b GROUP BY 1),
tot AS (SELECT (SELECT CAST(COALESCE(SUM(n), 0) AS DOUBLE) FROM tc) AS T,
               (SELECT CAST(SUM(n) AS DOUBLE) FROM rc) AS R),
lr AS (
  SELECT g.bucket,
         ln((COALESCE(tc.n, 0) + 1.0) / (tot.T + 64.0))
       - ln((COALESCE(rc.n, 0) + 1.0) / (tot.R + 64.0)) AS lw
  FROM (SELECT UNNEST(generate_series(0, 63)) AS bucket) g
  LEFT JOIN tc USING (bucket) LEFT JOIN rc USING (bucket) CROSS JOIN tot
),
docw AS (SELECT b.doc_id, SUM(lr.lw) AS logw FROM b JOIN lr USING (bucket) GROUP BY 1),
allw AS (
  SELECT d.doc_id,
         CAST(CASE WHEN d.doc_id % 101 = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_target,
         ROUND(ROUND(COALESCE(dw.logw, 0.0), 9), 6) AS logw
  FROM documents d LEFT JOIN docw dw USING (doc_id)
),
sel AS (
  SELECT doc_id FROM allw WHERE is_target = 0
  ORDER BY logw DESC, doc_id LIMIT 50
)
SELECT a.doc_id, a.is_target, a.logw,
       CAST(CASE WHEN s.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS selected
FROM allw a LEFT JOIN sel s USING (doc_id)
ORDER BY a.doc_id
"""


def q_doc_dup_spans(sf_dir: str):
    """Exact duplicated-span coverage (ExactSubstr family, Lee et al.
    2021 arXiv:2107.06499 at fixed k=4 word grams): per doc, how many
    of its 4-word grams occur >= 2 times anywhere in the corpus
    (stages/dedup.py:duplicated_span_stats — gram-string exchange, no
    hashing, text payload never shuffled). Oracle replays the gram
    construction with list_slice over split words."""
    out = dd.duplicated_span_stats(
        _docs(sf_dir, ["doc_id", "text"]), k=4
    ).to_pandas()
    for c in ("n_grams", "dup_grams"):
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


_SQL_DUP_SPANS = r"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
  FROM documents
),
g AS (
  SELECT doc_id, array_to_string(list_slice(words, j, j + 3), ' ') AS gram
  FROM w, generate_series(1, 4096) AS t(j)
  WHERE j + 3 <= len(words)
),
c AS (SELECT gram, COUNT(*) AS cnt FROM g GROUP BY gram)
SELECT doc_id,
       COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN c.cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_grams
FROM g JOIN c USING (gram)
GROUP BY doc_id
ORDER BY doc_id
"""


def q_source_ks_drift(sf_dir: str):
    """Exact two-sample Kolmogorov-Smirnov distribution-drift statistic
    for every source pair over the n_chars grid
    (stages/drift.py:ks_pairwise — per-batch count partials, tiny
    driver ECDF sweep; corpus never collected). Oracle: windowed
    cumulative ECDFs on a dense source x value grid, max |dF| per
    pair."""
    from ..stages.drift import ks_pairwise

    out = ks_pairwise(_docs(sf_dir, ["source", "n_chars"]), "n_chars")
    out["ks"] = np.asarray(round6(out["ks"].astype(float)), dtype=np.float64)
    for c in ("n_a", "n_b"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


_SQL_KS_DRIFT = """
WITH c AS (
  SELECT source, n_chars AS v, COUNT(*) AS n FROM documents GROUP BY 1, 2
),
tot AS (SELECT source, COUNT(*) AS t FROM documents GROUP BY 1),
grid AS (
  SELECT s.source, g.v, COALESCE(c.n, 0) AS n
  FROM (SELECT DISTINCT source FROM documents) s
  CROSS JOIN (SELECT DISTINCT v FROM c) g
  LEFT JOIN c ON c.source = s.source AND c.v = g.v
),
ecdf AS (
  SELECT grid.source, grid.v,
         (SUM(grid.n) OVER (PARTITION BY grid.source ORDER BY grid.v)) * 1.0 / tot.t AS f,
         tot.t
  FROM grid JOIN tot ON tot.source = grid.source
)
SELECT a.source AS key_a, b.source AS key_b,
       CAST(MIN(a.t) AS BIGINT) AS n_a, CAST(MIN(b.t) AS BIGINT) AS n_b,
       ROUND(MAX(ABS(a.f - b.f)), 6) AS ks
FROM ecdf a JOIN ecdf b ON a.v = b.v AND a.source < b.source
GROUP BY 1, 2
ORDER BY 1, 2
"""


def q_doc_segment_dedup(sf_dir: str):
    """Segment-level exact dedup stats (CCNet/RefinedWeb line-dedup
    shape at 16-word windows; stages/dedup.py:segment_dedup_stats).
    Only 32 B/segment digests move through the two exchanges — the
    text never leaves the reading stage."""
    from ..stages.dedup import segment_dedup_stats

    out = segment_dedup_stats(_docs(sf_dir, ["doc_id", "text"]), width=16).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    for c in ("n_seg", "n_dup_seg"):
        out[c] = out[c].astype("int64")
    out["dup_frac"] = np.asarray(round6(out["dup_frac"].astype(float)), dtype=np.float64)
    return out.sort_values("doc_id").reset_index(drop=True)


_SQL_SEGMENT_DEDUP = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
c AS (
  SELECT doc_id, CAST(s / 16 AS BIGINT) AS seg_id,
         array_to_string(ws[s + 1 : LEAST(s + 16, len(ws))], ' ') AS seg
  FROM (SELECT doc_id, ws,
               UNNEST(generate_series(0, CAST(len(ws) - 1 AS BIGINT), 16)) AS s
        FROM w WHERE len(ws) > 0)
),
m AS (
  SELECT doc_id, seg_id,
         CASE WHEN ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, seg_id) = 1
              THEN 0 ELSE 1 END AS is_dup
  FROM c
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_seg,
       CAST(SUM(is_dup) AS BIGINT) AS n_dup_seg,
       ROUND(SUM(is_dup) * 1.0 / COUNT(*), 6) AS dup_frac
FROM m GROUP BY doc_id ORDER BY doc_id
"""


def q_jsonl_ingest(sf_dir: str):
    """JSONL source coverage: documents parquet -> distributed JSONL
    write (one file per block) -> ray.data.read_json -> per-source
    aggregate. Proves the engine round-trips a second wire format with
    schema intact; the oracle aggregates the original parquet, so any
    type or value drift through JSON fails the hash."""
    import hashlib
    import shutil

    out_dir = os.path.join(
        "/tmp", "diive_ray_jsonl_" + hashlib.blake2b(sf_dir.encode(), digest_size=6).hexdigest()
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    _docs(sf_dir).write_json(out_dir)
    back = rd.read_json(out_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.select(["source", "lang", "n_chars"]).to_pandas()
        return df.groupby(["source", "lang"], as_index=False).agg(
            n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum")
        )

    from ..stages.exchange import driver_combine

    out = driver_combine(
        back, partial,
        lambda p: p.groupby(["source", "lang"], as_index=False)[["n_docs", "sum_chars"]].sum(),
    )
    for c in ("n_docs", "sum_chars"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["source", "lang"]).reset_index(drop=True)


_SQL_JSONL_INGEST = """
SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_doc_sample_hash(sf_dir: str):
    """Deterministic per-source uniform 20-sample via Knuth
    multiplicative hash ranking (stages/packing.py:hash_sample_topk):
    reproducible across runs/partitionings/cluster sizes where plain
    reservoir sampling is arrival-order dependent; per-batch partial
    top-k means only ≤ k rows per (batch, source) ever move."""
    from ..stages.packing import hash_sample_topk

    out = hash_sample_topk(
        _docs(sf_dir, ["source", "doc_id"]), k=20, id_col="doc_id", keys=["source"]
    )
    for c in ("doc_id", "h", "rk"):
        out[c] = out[c].astype("int64")
    return out[["source", "doc_id", "h", "rk"]].reset_index(drop=True)


_SQL_SAMPLE_HASH = """
WITH h AS (
  SELECT source, doc_id,
         CAST((CAST(doc_id AS UBIGINT) * 2654435761) % 4294967296 AS BIGINT) AS h
  FROM documents
)
SELECT source, doc_id, h, CAST(rk AS BIGINT) AS rk FROM (
  SELECT source, doc_id, h,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
  FROM h
) WHERE rk <= 20 ORDER BY source, rk
"""


def q_doc_sample_neyman(sf_dir: str):
    """Neyman-allocation stratified sampling (Neyman 1934;
    stages/packing.py:neyman_sample): a 100-row budget split across
    sources proportionally to N_s * sigma_s of n_chars via EXACT
    integer arithmetic (w_s = floor(sqrt(n*sumsq - sum^2)), alloc =
    total*w // sum w — IEEE sqrt is correctly rounded so the SQL
    replays it bit-for-bit), then the deterministic Knuth-hash
    selection within each stratum."""
    from ..stages.packing import neyman_sample

    out = neyman_sample(
        _docs(sf_dir, ["source", "doc_id", "n_chars"]),
        total=100, strat_col="source", var_col="n_chars", id_col="doc_id",
    )
    for c in ("doc_id", "h", "rk", "n_alloc"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


_SQL_SAMPLE_NEYMAN = """
WITH m AS (
  SELECT source, COUNT(*)::BIGINT AS n, SUM(n_chars)::BIGINT AS s1,
         SUM(n_chars * n_chars)::BIGINT AS s2
  FROM documents GROUP BY 1
), w AS (
  SELECT source,
         CAST(FLOOR(SQRT(CAST(n * s2 - s1 * s1 AS DOUBLE))) AS BIGINT) AS w
  FROM m
), a AS (
  SELECT source, CAST((100 * w) // (SELECT SUM(w) FROM w) AS BIGINT) AS n_alloc
  FROM w
), h AS (
  SELECT source, doc_id,
         CAST((CAST(doc_id AS UBIGINT) * 2654435761) % 4294967296 AS BIGINT) AS h
  FROM documents
), r AS (
  SELECT source, doc_id, h,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
  FROM h
)
SELECT r.source, r.doc_id, r.h, CAST(r.rk AS BIGINT) AS rk, a.n_alloc
FROM r JOIN a ON r.source = a.source
WHERE r.rk <= a.n_alloc
ORDER BY r.source, r.rk
"""


def q_embedding_iforest(sf_dir: str):
    """Isolation Forest anomaly scoring over the embedding column
    (Liu, Ting & Zhou 2008; stages/iforest.py): deterministic
    Knuth-hash bounded training pool, driver-built forest of 100
    psi=256 iTrees, broadcast once, level-synchronous vectorized
    scoring pass. Top-20 most anomalous vectors. Rows-only (random
    axis-aligned trees aren't SQL-expressible); planted-anomaly
    recovery, determinism and partitioning invariance are pinned in
    tests/test_iforest.py."""
    from ..stages.iforest import iforest_scores
    from ..util import stable_round6 as _sr6

    ds = _embs(sf_dir, ["vec_id", "embedding"])
    out = iforest_scores(ds, id_col="vec_id", vec_col="embedding").to_pandas()
    out["vec_id"] = out["vec_id"].astype("int64")
    out["iforest_score"] = _sr6(out["iforest_score"].astype(float))
    out = out.sort_values(
        ["iforest_score", "vec_id"], ascending=[False, True]).head(20)
    return out.reset_index(drop=True)


def q_source_welch_ttest(sf_dir: str):
    """Welch's unequal-variance t-test + Cohen's d between every
    source pair on document length (Welch 1947; Satterthwaite 1946;
    Cohen 1988): per-source moment partials (n, sum, sumsq) in ONE
    vectorized pass + a tiny pair combine — t = (m1-m2)/sqrt(v1/n1 +
    v2/n2), Welch-Satterthwaite df, d = (m1-m2)/s_pooled. Sample
    variance via the exact integer moments so the SQL replays it
    bit-for-bit."""
    from ..stages.exchange import driver_combine
    from ..util import stable_round6 as _sr6

    ds = _docs(sf_dir, ["source", "n_chars"])

    def partial(t: pa.Table) -> pd.DataFrame:
        x = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({
            "source": np.asarray(t["source"].to_pylist(), dtype=object),
            "n": 1, "s1": x, "s2": x * x,
        })
        return df.groupby("source", sort=False)[["n", "s1", "s2"]].sum().reset_index()

    def combine(parts: pd.DataFrame) -> pd.DataFrame:
        g = parts.groupby("source", sort=True)[["n", "s1", "s2"]].sum()
        src = g.index.to_numpy()
        n = g["n"].to_numpy(np.float64)
        m = g["s1"].to_numpy(np.float64) / n
        # exact integer sum-of-squares -> sample variance
        ss = g["s2"].to_numpy(np.float64) - g["s1"].to_numpy(np.float64) ** 2 / n
        v = ss / (n - 1)
        rows = []
        for i in range(len(src)):
            for j in range(i + 1, len(src)):
                se2 = v[i] / n[i] + v[j] / n[j]
                tstat = (m[i] - m[j]) / np.sqrt(se2)
                df_w = se2 ** 2 / (
                    (v[i] / n[i]) ** 2 / (n[i] - 1)
                    + (v[j] / n[j]) ** 2 / (n[j] - 1))
                sp = np.sqrt(((n[i] - 1) * v[i] + (n[j] - 1) * v[j])
                             / (n[i] + n[j] - 2))
                rows.append((src[i], src[j], int(n[i]), int(n[j]),
                             tstat, df_w, (m[i] - m[j]) / sp))
        out = pd.DataFrame(rows, columns=[
            "src_a", "src_b", "n_a", "n_b", "t_welch", "df_welch", "cohens_d"])
        out["n_a"] = out["n_a"].astype("int64")
        out["n_b"] = out["n_b"].astype("int64")
        for c in ("t_welch", "df_welch", "cohens_d"):
            out[c] = _sr6(out[c].astype(float))
        return out

    return driver_combine(ds, partial, combine)


_SQL_WELCH = """
WITH g AS (
  SELECT source, COUNT(*)::DOUBLE AS n, SUM(n_chars)::BIGINT AS s1,
         SUM(n_chars * n_chars)::BIGINT AS s2
  FROM documents GROUP BY 1
),
m AS (
  SELECT source, n, s1 / n AS mean,
         (s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1) AS var
  FROM g
)
SELECT a.source AS src_a, b.source AS src_b,
       CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
       ROUND(ROUND((a.mean - b.mean) / SQRT(a.var / a.n + b.var / b.n), 9), 6) AS t_welch,
       ROUND(ROUND(POW(a.var / a.n + b.var / b.n, 2) /
             (POW(a.var / a.n, 2) / (a.n - 1) + POW(b.var / b.n, 2) / (b.n - 1)), 9), 6) AS df_welch,
       ROUND(ROUND((a.mean - b.mean) /
             SQRT(((a.n - 1) * a.var + (b.n - 1) * b.var) / (a.n + b.n - 2)), 9), 6) AS cohens_d
FROM m a JOIN m b ON a.source < b.source
ORDER BY src_a, src_b
"""


def q_doc_global_shuffle(sf_dir: str):
    """Deterministic global training-order shuffle
    (stages/packing.py:global_shuffle_order): every doc ranked by the
    Knuth hash of its id — balanced fixed hash-range buckets, slim
    counting pass + driver cumsum, ONE keyed exchange assigning exact
    global positions in-block. Reproducible at any cluster size."""
    from ..stages.packing import global_shuffle_order

    out = global_shuffle_order(_docs(sf_dir, ["doc_id"]), id_col="doc_id").to_pandas()
    for c in ("doc_id", "h", "pos"):
        out[c] = out[c].astype("int64")
    return out[["doc_id", "h", "pos"]].sort_values("pos").reset_index(drop=True)


_SQL_GLOBAL_SHUFFLE = """
WITH h AS (
  SELECT doc_id,
         CAST((CAST(doc_id AS UBIGINT) * 2654435761) % 4294967296 AS BIGINT) AS h
  FROM documents
)
SELECT doc_id, h,
       CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
FROM h ORDER BY pos
"""


def q_doc_normalize(sf_dir: str):
    """Canonical text normalization (functions/text.py:normalize_text):
    NFC -> lower -> collapse whitespace -> trim, pure Arrow kernels per
    batch, no shuffle. Returns the normalized text + its length so the
    oracle compares the actual strings, not a summary."""
    import pyarrow.compute as pc

    from ..functions.text import normalize_text

    def fn(t):
        import pyarrow as pa

        norm = normalize_text(t["text"])
        return pa.table({
            "doc_id": t["doc_id"],
            "norm_text": norm,
            "norm_chars": pc.cast(pc.utf8_length(norm), pa.int64()),
        })

    out = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_SQL_NORMALIZE = """
SELECT doc_id,
       trim(regexp_replace(lower(nfc_normalize(text)),
                           '[ \t\n\r\f\v]+', ' ', 'g'), ' ') AS norm_text,
       CAST(length(trim(regexp_replace(lower(nfc_normalize(text)),
                        '[ \t\n\r\f\v]+', ' ', 'g'), ' ')) AS BIGINT) AS norm_chars
FROM documents ORDER BY doc_id
"""


def q_doc_dedup_normalized(sf_dir: str):
    """Normalization-aware exact dedup: normalize_text per batch (pure
    Arrow kernels), then exact_dedup's broadcast-digest path — case /
    whitespace / unicode-form variants collapse to one kept doc. The
    normalized text never shuffles (only 24-byte digests move)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.text import normalize_text

    def norm(t: pa.Table) -> pa.Table:
        nt = normalize_text(t["text"])
        return pa.table({
            "doc_id": t["doc_id"],
            "text": nt,
            "norm_chars": pc.cast(pc.utf8_length(nt), pa.int64()),
        })

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        norm, batch_format="pyarrow", zero_copy_batch=True
    )
    out = dd.exact_dedup(ds).to_pandas()
    return out[["doc_id", "norm_chars"]].sort_values("doc_id").reset_index(drop=True)


_SQL_DEDUP_NORMALIZED = """
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(lower(nfc_normalize(text)),
                             '[ \t\n\r\f\v]+', ' ', 'g'), ' ') AS nt
  FROM documents
)
SELECT doc_id, CAST(length(nt) AS BIGINT) AS norm_chars FROM (
  SELECT doc_id, nt, ROW_NUMBER() OVER (PARTITION BY nt ORDER BY doc_id) AS rn
  FROM n
) WHERE rn = 1 ORDER BY doc_id
"""


def q_doc_quality_classifier(sf_dir: str):
    """CCNet-style trained quality filter (stages/classifier.py):
    logistic regression (from-scratch Newton-IRLS) on the Gopher
    feature vector; fit on a deterministic hash-sample (only feature
    rows reach the driver), scored corpus-wide via one
    broadcast-weights map_batches. The corpus text is uniform word
    salad, so — as with doc_pii — the low-quality population is
    SYNTHESIZED deterministically: odd doc_ids get digit/punct junk
    appended, and the classifier must recover that split from the
    features alone. Rows-only: IRLS is not SQL-expressible;
    separation + bit-stable weights are pytest-pinned."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.classifier import score_quality, train_quality_classifier
    from ..util import round6

    def degrade(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_clean = (ids % 2 == 0)
        junk = pc.binary_join_element_wise(
            t["text"], " $$$ 0123456789 !!! ### 777777 %%% 0x1f9 ???", "")
        text = pc.if_else(pa.array(is_clean), t["text"], junk)
        return pa.table({
            "doc_id": t["doc_id"],
            "text": text,
            "is_clean": pa.array(is_clean.astype(np.int64)),
        })

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        degrade, batch_format="pyarrow", zero_copy_batch=True)
    w = train_quality_classifier(ds, label_col="is_clean")
    out = score_quality(ds, w, keep_cols=("doc_id", "is_clean")).to_pandas()
    out["qc_prob"] = round6(out["qc_prob"])
    out["doc_id"] = out["doc_id"].astype("int64")
    out["is_clean"] = out["is_clean"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q_doc_bpe_merges(sf_dir: str):
    """BPE tokenizer training (stages/bpe.py, Sennrich 2016): k=30
    merges learned from the distributed word-frequency table (per-batch
    value_counts partials, ONE vocab-bounded exchange — text never
    moves; merge loop driver-side over the bounded vocab, ties broken
    lexicographically). Rows-only: the merge loop is iterative; the
    kernel is pinned against the paper's worked example and a pandas
    replay in pytest."""
    from ..stages.bpe import bpe_train

    return bpe_train(_docs(sf_dir, ["doc_id", "text"]), k=30)


def q_doc_word_freqs(sf_dir: str):
    """Corpus-wide word-frequency table (stages/bpe.py:word_freqs —
    the BPE trainer's counting pass): per-batch regex split +
    value_counts partials, ONE exchange bounded by vocab size (the
    text never moves). Exact oracle: DuckDB's regexp functions are
    RE2, the same engine as Arrow's split_pattern_regex, so the \\s+
    tokenization replays verbatim; empty fragments from leading /
    trailing whitespace are filtered on both sides."""
    from ..stages.bpe import word_freqs

    out = word_freqs(_docs(sf_dir, ["doc_id", "text"]))
    out["freq"] = out["freq"].astype("int64")
    return out


_SQL_WORD_FREQS = r"""
SELECT word, COUNT(*) AS freq
FROM (SELECT UNNEST(regexp_split_to_array(text, '\s+')) AS word FROM documents)
WHERE word <> ''
GROUP BY word ORDER BY word
"""


def q_doc_bpe_encode(sf_dir: str):
    """BPE encoding fertility (stages/bpe.py BpeEncoder): train k=50
    merges on the corpus, then an actor-pool pass encodes every doc's
    DISTINCT words (per-actor cache) and reports per-doc word / BPE
    token counts. Rows-only: the encode loop is iterative; greedy
    rank-order semantics and the train->encode replay property are
    pytest-pinned."""
    from ..stages.bpe import bpe_encode_counts, bpe_train

    docs = _docs(sf_dir, ["doc_id", "text"])
    merges = bpe_train(docs, k=50)
    out = bpe_encode_counts(docs, merges).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_doc_zipf_fit(sf_dir: str):
    """Per-source Zipf rank-frequency fit (Zipf 1935; Piantadosi 2014
    review; stages/textstats.py:zipf_fit): distributed (source, word)
    counts — ONE exchange keyed on (source, word) so hot sources
    spread over all partitions — then exact per-source top-200 via
    per-block partial top-k + bounded driver merge, then OLS of
    ln(freq) on ln(rank). Slope near -1 is healthy natural text; the
    fit is the classic synthetic/template-corpus probe."""
    from ..stages.textstats import zipf_fit
    from ..util import stable_round6 as _sr6

    out = zipf_fit(_docs(sf_dir, ["source", "text"]), key_col="source",
                   top_n=200)
    out["n_ranks"] = out["n_ranks"].astype("int64")
    for c in ("zipf_slope", "intercept", "r2"):
        out[c] = _sr6(out[c].astype(float))
    return out.sort_values("source").reset_index(drop=True)


_SQL_ZIPF_FIT = r"""
WITH tok AS (
  SELECT source, UNNEST(regexp_split_to_array(text, '\s+')) AS word
  FROM documents),
c AS (SELECT source, word, COUNT(*) AS freq FROM tok
      WHERE word <> '' GROUP BY source, word),
r AS (SELECT source, word, freq,
        ROW_NUMBER() OVER (PARTITION BY source ORDER BY freq DESC, word ASC)
          AS rnk FROM c),
top AS (SELECT source, LN(CAST(rnk AS DOUBLE)) AS x,
               LN(CAST(freq AS DOUBLE)) AS y
        FROM r WHERE rnk <= 200),
f AS (SELECT source, CAST(COUNT(*) AS DOUBLE) AS n, AVG(x) AS mx,
             AVG(y) AS my, SUM(x*y) AS sxy, SUM(x*x) AS sxx,
             SUM(y*y) AS syy
      FROM top GROUP BY source)
SELECT source, CAST(n AS BIGINT) AS n_ranks,
  ROUND(ROUND((sxy - n*mx*my) / (sxx - n*mx*mx), 9), 6) AS zipf_slope,
  ROUND(ROUND(my - (sxy - n*mx*my) / (sxx - n*mx*mx) * mx, 9), 6) AS intercept,
  ROUND(ROUND((sxy - n*mx*my) * (sxy - n*mx*my)
              / ((sxx - n*mx*mx) * (syy - n*my*my)), 9), 6) AS r2
FROM f ORDER BY source
"""


def q_doc_top_ngrams(sf_dir: str):
    """Per-source top-20 word trigrams (the C4 boilerplate probe,
    Raffel et al. 2020 arXiv:1910.10683; stages/textstats.py): counts
    exchange keyed on (source, ngram), exact top-k via per-block
    partial top-k (each block holds complete groups after the
    exchange) + bounded driver merge. Ties freq DESC, ngram ASC."""
    from ..stages.textstats import keyed_term_counts, top_terms

    counts = keyed_term_counts(_docs(sf_dir, ["source", "text"]),
                               key_col="source", ngram=3)
    out = top_terms(counts, key_col="source", k=20)
    out = out.rename(columns={"term": "ngram"})
    out["rnk"] = out["rnk"].astype("int64")
    out["freq"] = out["freq"].astype("int64")
    return out.sort_values(["source", "rnk"]).reset_index(drop=True)


_SQL_TOP_NGRAMS = r"""
WITH w AS (
  SELECT source,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS ws
  FROM documents),
g AS (SELECT source,
             UNNEST(generate_series(1, CAST(len(ws) - 2 AS BIGINT))) AS i, ws
      FROM w WHERE len(ws) >= 3),
tg AS (SELECT source, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS ngram
       FROM g),
c AS (SELECT source, ngram, COUNT(*) AS freq FROM tg GROUP BY source, ngram),
r AS (SELECT source, ngram, freq,
        ROW_NUMBER() OVER (PARTITION BY source ORDER BY freq DESC, ngram ASC)
          AS rnk FROM c)
SELECT source, CAST(rnk AS BIGINT) AS rnk, ngram, CAST(freq AS BIGINT) AS freq
FROM r WHERE rnk <= 20 ORDER BY source, rnk
"""


def q_doc_lm_kneser_ney(sf_dir: str):
    """Interpolated Kneser-Ney bigram perplexity (Kneser & Ney 1995,
    Chen & Goodman 1999 — the KenLM default smoothing;
    stages/lm.py:KneserNeyScorer): same broadcast-model actor pool as
    doc_lm_perplexity; the KN continuation/context-type tables derive
    from the model's sorted pair codes once per actor. Natural-log
    scores; kn_perplexity = exp(-mean ln P)."""
    from ..stages.lm import score_kneser_ney, train_bigram_lm
    from ..util import stable_round6

    ds = _docs(sf_dir, ["doc_id", "text"])
    model = train_bigram_lm(ds, "text")
    out = score_kneser_ney(ds, model, discount=0.75).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_bigrams"] = out["n_bigrams"].astype("int64")
    out["kn_avg_logprob"] = stable_round6(out["kn_avg_logprob"].astype(float))
    out["kn_perplexity"] = stable_round6(out["kn_perplexity"].astype(float))
    return out.sort_values("doc_id").reset_index(drop=True)


_SQL_LM_KN = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id, UNNEST(generate_series(1, CAST(len(ws) - 1 AS BIGINT))) AS i, ws
  FROM w WHERE len(ws) >= 2
),
pairs AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2 FROM g),
bc AS (SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS cb FROM pairs GROUP BY 1, 2),
ctx AS (SELECT w1, SUM(cb) AS c1, CAST(COUNT(*) AS DOUBLE) AS fwd
        FROM bc GROUP BY 1),
bwd AS (SELECT w2, CAST(COUNT(*) AS DOUBLE) AS nb FROM bc GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS B FROM bc),
scored AS (
  SELECT p.doc_id,
         LN((bc.cb - 0.75) / ctx.c1 + 0.75 * ctx.fwd / ctx.c1 * (bwd.nb / tot.B))
           AS lp
  FROM pairs p JOIN bc USING (w1, w2) JOIN ctx USING (w1)
       JOIN bwd USING (w2) CROSS JOIN tot
),
agg AS (SELECT doc_id, COUNT(*) AS n, AVG(lp) AS avg_lp FROM scored GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(a.n, 0) AS BIGINT) AS n_bigrams,
       ROUND(ROUND(COALESCE(a.avg_lp, -9999.0), 9), 6) AS kn_avg_logprob,
       ROUND(ROUND(COALESCE(EXP(-a.avg_lp), -9999.0), 9), 6) AS kn_perplexity
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""


def q_embedding_jl(sf_dir: str):
    """Johnson-Lindenstrauss sign projection to 8 dims (Achlioptas
    2003 database-friendly random projections; stages/similarity.py:
    jl_project): deterministic hash-seeded Rademacher matrix rebuilt
    per task from (d, k) — nothing broadcast, stateless vectorized
    matmul, the standard cheap pre-pass before LSH / near-dup when
    full-dim distance math dominates. Long output (vec_id, dim,
    proj)."""
    from ..stages.similarity import jl_project
    from ..util import stable_round6

    out = jl_project(_embs(sf_dir, ["vec_id", "embedding"]), k=8).to_pandas()
    out["vec_id"] = out["vec_id"].astype("int64")
    out["dim"] = out["dim"].astype("int64")
    out["proj"] = stable_round6(out["proj"].astype(float))
    return out.sort_values(["vec_id", "dim"]).reset_index(drop=True)


_SQL_EMBEDDING_JL = """
WITH e AS (
  SELECT vec_id,
         UNNEST(generate_series(1, CAST(len(embedding) AS BIGINT))) AS i,
         embedding AS emb
  FROM embeddings),
dims AS (SELECT UNNEST(generate_series(0, 7)) AS j),
h1 AS (
  SELECT vec_id, i, j, emb,
         (((CAST(i AS BIGINT) - 1) * 131071 + j) * 2654435761)
           % 4294967296 AS h
  FROM e CROSS JOIN dims),
h3 AS (
  SELECT vec_id, i, j, emb,
         xor((xor(h, h >> 16) * 40503) % 4294967296,
             ((xor(h, h >> 16) * 40503) % 4294967296) >> 15) AS h
  FROM h1),
p AS (
  SELECT vec_id, j,
         SUM(CASE WHEN h < 2147483648
                  THEN CAST(emb[i] AS DOUBLE)
                  ELSE -CAST(emb[i] AS DOUBLE) END) AS s
  FROM h3 GROUP BY vec_id, j)
SELECT vec_id, CAST(j AS BIGINT) AS dim,
       ROUND(ROUND(s * (1.0 / SQRT(8.0)), 9), 6) AS proj
FROM p ORDER BY vec_id, dim
"""


def q_doc_cms_counts(sf_dir: str):
    """Count-min sketch word-frequency estimates (Cormode &
    Muthukrishnan 2005; stages/sketch.py:cms_build): fixed O(R*W)
    per-batch bincount partials, ONE mergeable driver combine — the
    sketch completes the repo's mergeable family (Misra-Gries, HLL,
    t-digest). Output: the top-20 true words with true freq and CMS
    estimate; min-over-rows never under-estimates (test-pinned)."""
    from ..stages.bpe import word_freqs
    from ..stages.sketch import cms_build, cms_estimate

    cms = cms_build(_docs(sf_dir, ["doc_id", "text"]))
    wf = word_freqs(_docs(sf_dir, ["doc_id", "text"]))
    top = wf.sort_values(["freq", "word"], ascending=[False, True],
                         kind="mergesort").head(20)
    est = cms_estimate(cms, top["word"].to_numpy(dtype=object))
    out = pd.DataFrame({
        "word": top["word"].to_numpy(dtype=object),
        "freq": top["freq"].to_numpy().astype("int64"),
        "cms_est": est.astype("int64"),
    })
    return out.sort_values("word").reset_index(drop=True)


_SQL_CMS_COUNTS = r"""
WITH tok AS (
  SELECT UNNEST(regexp_split_to_array(text, '\s+')) AS word FROM documents),
c AS (SELECT word, COUNT(*) AS freq FROM tok WHERE word <> '' GROUP BY word),
h AS (SELECT word, freq,
        list_reduce(
          list_prepend(0::BIGINT,
            list_transform(string_split(word, ''), x -> ascii(x)::BIGINT)),
          (a, b) -> (a * 31 + b) % 2147483647) AS hh
      FROM c),
params AS (SELECT * FROM (VALUES (0, 131, 0), (1, 8191, 17),
                                 (2, 524287, 1009), (3, 1299709, 65537))
           t(r, a, b)),
buckets AS (SELECT h.word, h.freq, p.r,
                   ((h.hh * p.a + p.b) % 2147483647) % 1024 AS bkt
            FROM h CROSS JOIN params p),
cms AS (SELECT r, bkt, SUM(freq) AS n FROM buckets GROUP BY r, bkt),
top AS (SELECT word, freq FROM (
          SELECT word, freq,
                 ROW_NUMBER() OVER (ORDER BY freq DESC, word ASC) AS rnk
          FROM c) WHERE rnk <= 20),
est AS (SELECT t.word, t.freq, MIN(cms.n) AS cms_est
        FROM top t JOIN buckets b ON b.word = t.word
             JOIN cms ON cms.r = b.r AND cms.bkt = b.bkt
        GROUP BY t.word, t.freq)
SELECT word, CAST(freq AS BIGINT) AS freq, CAST(cms_est AS BIGINT) AS cms_est
FROM est ORDER BY word
"""


def q_doc_bloom_probe(sf_dir: str):
    """Bloom-filter incremental dedup probe (Bloom 1970; Kirsch &
    Mitzenmacher 2006 double hashing; stages/sketch.py): build a
    16 KiB bitmap over the even-doc_id half's content fingerprints
    (per-batch distinct positions, ONE driver union), broadcast once,
    probe the odd half with a stateless vectorized map — the standard
    new-shard-vs-existing-corpus dedup pre-pass at 100 TB (no shuffle
    touches the corpus). Deterministic: the fingerprint and both bloom
    hashes replay exactly in SQL, so even the false POSITIVES match
    the oracle bit-for-bit."""
    from ..stages.sketch import bloom_build, bloom_probe

    ds = _docs(sf_dir, ["doc_id", "text"])

    def half(parity: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(ids % 2 == parity))
        return fn

    corpus = ds.map_batches(half(0), batch_format="pyarrow",
                            zero_copy_batch=True)
    probe = ds.map_batches(half(1), batch_format="pyarrow",
                           zero_copy_batch=True)
    bits = bloom_build(corpus)
    out = bloom_probe(probe, bits).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    out["in_bloom"] = out["in_bloom"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


_SQL_BLOOM_PROBE = r"""
WITH fp AS (
  SELECT doc_id,
         list_reduce(
           list_prepend(0::BIGINT,
             list_transform(string_split(text, ''), c -> ascii(c)::BIGINT)),
           (h, c) -> (h * 31 + c) % 2147483647) AS h1
  FROM documents),
hh AS (SELECT doc_id, h1, (h1 * 2654435761) % 2147483647 AS h2 FROM fp),
ks AS (SELECT UNNEST(generate_series(0, 3)) AS i),
corpus AS (SELECT DISTINCT (h1 + i * h2) % 131072 AS pos
           FROM hh CROSS JOIN ks WHERE doc_id % 2 = 0),
probe AS (SELECT doc_id, (h1 + i * h2) % 131072 AS pos
          FROM hh CROSS JOIN ks WHERE doc_id % 2 = 1),
hits AS (SELECT p.doc_id, COUNT(*) AS k_in
         FROM probe p JOIN corpus c ON p.pos = c.pos GROUP BY p.doc_id)
SELECT d.doc_id,
       CAST(CASE WHEN COALESCE(h.k_in, 0) = 4 THEN 1 ELSE 0 END AS BIGINT)
         AS in_bloom
FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
LEFT JOIN hits h USING (doc_id)
ORDER BY d.doc_id
"""


def q_source_vocab_jaccard(sf_dir: str):
    """Pairwise source-vocabulary Jaccard (cross-source contamination
    / similarity matrix): per-batch DISTINCT (source, word) partials,
    ONE exchange on word (all copies of a word co-locate; a block
    dedups then self-joins its words across sources), bounded per-block
    (word x source-pair) counts, driver sum over C(S,2) pairs. The
    word-keyed exchange keeps hot sources spread across partitions."""
    from ..stages.exchange import block_map
    from ..stages.textstats import _split_words
    from ..util import stable_round6

    def partial(t: pa.Table) -> pd.DataFrame:
        srcs = t["source"].to_numpy(zero_copy_only=False)
        words, lengths = _split_words(t["text"])
        if not len(words):
            return pd.DataFrame({"source": pd.Series([], dtype=object),
                                 "word": pd.Series([], dtype=object)})
        return pd.DataFrame({
            "source": np.repeat(srcs, lengths),
            "word": words,
        }).drop_duplicates(ignore_index=True)

    def per_block(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["source", "word"])
        sizes = df.groupby("source").size().reset_index(name="n")
        sizes["kind"], sizes["sb"] = np.int8(0), ""
        m = df.merge(df, on="word")
        m = m[m["source_x"] < m["source_y"]]
        inter = m.groupby(["source_x", "source_y"]).size().reset_index(name="n")
        inter = inter.rename(columns={"source_x": "source", "source_y": "sb"})
        inter["kind"] = np.int8(1)
        out = pd.concat([sizes[["source", "sb", "kind", "n"]],
                         inter[["source", "sb", "kind", "n"]]], ignore_index=True)
        out["n"] = out["n"].astype(np.int64)
        return out

    parts = block_map(
        _docs(sf_dir, ["source", "text"]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True),
        ["word"], per_block, batch_format="pandas", zero_copy_batch=False,
    ).to_pandas()
    agg = parts.groupby(["source", "sb", "kind"], as_index=False)["n"].sum()
    sizes = dict(zip(agg[agg["kind"] == 0]["source"], agg[agg["kind"] == 0]["n"]))
    inter = agg[agg["kind"] == 1]
    na = inter["source"].map(sizes).to_numpy(dtype=np.float64)
    nb = inter["sb"].map(sizes).to_numpy(dtype=np.float64)
    iv = inter["n"].to_numpy(dtype=np.float64)
    out = pd.DataFrame({
        "source_a": inter["source"].to_numpy(dtype=object),
        "source_b": inter["sb"].to_numpy(dtype=object),
        "inter": inter["n"].to_numpy().astype("int64"),
        "jaccard": stable_round6(iv / (na + nb - iv)),
    })
    return out.sort_values(["source_a", "source_b"]).reset_index(drop=True)


_SQL_VOCAB_JACCARD = r"""
WITH sw AS (
  SELECT DISTINCT source, word FROM (
    SELECT source, UNNEST(regexp_split_to_array(text, '\s+')) AS word
    FROM documents)
  WHERE word <> ''),
sizes AS (SELECT source, COUNT(*) AS n FROM sw GROUP BY source),
pairs AS (SELECT a.source AS sa, b.source AS sb, COUNT(*) AS inter
          FROM sw a JOIN sw b ON a.word = b.word AND a.source < b.source
          GROUP BY 1, 2)
SELECT p.sa AS source_a, p.sb AS source_b,
       CAST(p.inter AS BIGINT) AS inter,
       ROUND(ROUND(CAST(p.inter AS DOUBLE)
                   / (x.n + y.n - p.inter), 9), 6) AS jaccard
FROM pairs p JOIN sizes x ON x.source = p.sa JOIN sizes y ON y.source = p.sb
ORDER BY source_a, source_b
"""


def q_doc_split_assign(sf_dir: str):
    """Deterministic hash-based train/val/test split (80/10/10 on a
    Knuth-hash bucket of doc_id — cluster-size- and partitioning-
    independent, the property a resumable 100-TB ingest needs):
    stateless vectorized assignment + bounded per-(source, split)
    count partials, ONE driver combine. Output: counts + share per
    source and split."""
    from ..stages.exchange import driver_combine
    from ..util import stable_round6

    def partial(t: pa.Table) -> pd.DataFrame:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        srcs = t["source"].to_numpy(zero_copy_only=False)
        bucket = (ids * np.int64(2654435761)) % np.int64(4294967296) % np.int64(100)
        split = np.where(bucket < 80, "train",
                         np.where(bucket < 90, "val", "test"))
        out = pd.DataFrame({"source": srcs, "split": split}) \
            .groupby(["source", "split"], sort=False).size().reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return out

    def combine(parts: pd.DataFrame) -> pd.DataFrame:
        return parts.groupby(["source", "split"], as_index=False)["n"].sum()

    out = driver_combine(_docs(sf_dir, ["doc_id", "source"]), partial, combine)
    totals = out.groupby("source")["n"].transform("sum").to_numpy(dtype=np.float64)
    out = out.rename(columns={"n": "n_docs"})
    out["n_docs"] = out["n_docs"].astype("int64")
    out["share"] = stable_round6(out["n_docs"].to_numpy(dtype=np.float64) / totals)
    return out.sort_values(["source", "split"]).reset_index(drop=True)


_SQL_SPLIT_ASSIGN = """
WITH a AS (
  SELECT source,
         CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 < 80 THEN 'train'
              WHEN (doc_id * 2654435761) % 4294967296 % 100 < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM documents),
c AS (SELECT source, split, COUNT(*) AS n_docs FROM a GROUP BY source, split),
t AS (SELECT source, SUM(n_docs) AS total FROM c GROUP BY source)
SELECT c.source, c.split, CAST(c.n_docs AS BIGINT) AS n_docs,
       ROUND(ROUND(CAST(c.n_docs AS DOUBLE) / t.total, 9), 6) AS share
FROM c JOIN t USING (source)
ORDER BY source, split
"""


def q_doc_reservoir_sample(sf_dir: str):
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006): each doc gets key = ln(u) / w with w = n_chars and
    u a Knuth-hash uniform in (0,1) derived from doc_id — the top-k by
    key IS an exact weighted sample, and because u is a pure function
    of doc_id the draw is partitioning- and cluster-size-independent
    (the resumable-ingest property). Distributed as per-block partial
    top-k (each block keeps its best k rows) + one bounded driver
    combine — no shuffle, no full sort; the SQL oracle replays the hash
    and the key bit-for-bit."""
    from ..stages.exchange import driver_combine
    from ..util import stable_round6

    K = 50

    def partial(t: pa.Table) -> pd.DataFrame:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        u = (((ids * np.int64(2654435761)) % np.int64(4294967296)).astype(np.float64) + 0.5) / 4294967296.0
        key = np.log(u) / w
        df = pd.DataFrame({"doc_id": ids, "source": t["source"].to_numpy(zero_copy_only=False),
                           "n_chars": w.astype(np.int64), "key": key})
        # (key desc, doc_id asc) — the oracle's ROW_NUMBER tie order
        return df.sort_values(["key", "doc_id"], ascending=[False, True]).head(K)

    def combine(parts: pd.DataFrame) -> pd.DataFrame:
        return parts.sort_values(["key", "doc_id"], ascending=[False, True]).head(K)

    out = driver_combine(_docs(sf_dir, ["doc_id", "source", "n_chars"]), partial, combine)
    out = out.sort_values(["key", "doc_id"], ascending=[False, True]).reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    out["key"] = stable_round6(out["key"].astype(float))
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_chars"] = out["n_chars"].astype("int64")
    return out[["rank", "doc_id", "source", "n_chars", "key"]]


_SQL_RESERVOIR = """
WITH k AS (
  SELECT doc_id, source, n_chars,
         ln((CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE) + 0.5) / 4294967296.0)
           / CAST(n_chars AS DOUBLE) AS key
  FROM documents
),
r AS (
  SELECT doc_id, source, n_chars, key,
         ROW_NUMBER() OVER (ORDER BY key DESC, doc_id) AS rank
  FROM k
)
SELECT CAST(rank AS BIGINT) AS rank, doc_id, source,
       CAST(n_chars AS BIGINT) AS n_chars,
       ROUND(ROUND(key, 9), 6) AS key
FROM r WHERE rank <= 50 ORDER BY rank
"""


def q_doc_unigram_tokenizer(sf_dir: str):
    """Unigram-LM tokenizer training (Kudo 2018, the SentencePiece
    model; stages/unigram.py): distributed word counts -> substring
    seed vocab -> EM rounds of distributed Viterbi E-step (broadcast
    piece table, vocab-bounded count partials) + driver M-step with
    count-ordered pruning, single chars never pruned (full coverage).
    Deterministic at any partitioning (pytest-pinned), so rows-only
    with a stable result; model-based training is not SQL-expressible."""
    from ..stages.unigram import train_unigram
    from ..util import stable_round6

    pieces = train_unigram(
        _docs(sf_dir, ["text"]), vocab_size=48, max_piece_len=5,
        seed_size=256, n_iters=3,
    )
    pieces["count"] = pieces["count"].astype("int64")
    pieces["logp"] = stable_round6(pieces["logp"].astype(float))
    return pieces.sort_values("piece").reset_index(drop=True)


def q_doc_unigram_fertility(sf_dir: str):
    """Tokenizer fertility per source (pieces per word) under the
    trained unigram vocab — the standard tokenizer-health probe for a
    multi-source corpus (encoder actor pool with the piece table
    broadcast once, per-actor distinct-word cache; rows-only, training
    is model-based)."""
    from ..stages.unigram import train_unigram, unigram_fertility
    from ..util import stable_round6

    docs = _docs(sf_dir, ["source", "text"])
    pieces = train_unigram(docs, vocab_size=48, max_piece_len=5, seed_size=256, n_iters=3)
    out = unigram_fertility(docs, pieces, keys=["source"], max_piece_len=5)
    out["pieces_per_word"] = stable_round6(out["pieces_per_word"].astype(float))
    return out


def q_embedding_kcenter(sf_dir: str):
    """Greedy k-center coreset over the embedding column (Gonzalez
    1985 farthest-point; Sener & Savarese 2018 data selection;
    stages/similarity.py:kcenter_greedy): k vectorized full passes,
    one (dist, id, vec) row per block per pass, no shuffle. Iterative
    farthest-point selection is not SQL-expressible -> rows-only; the
    2-approximation and determinism are pytest-pinned."""
    from ..stages.similarity import kcenter_greedy
    from ..util import stable_round6

    out = kcenter_greedy(_embs(sf_dir, ["vec_id", "embedding"]), k=16)
    out["dist"] = stable_round6(out["dist"].astype(float))
    return out


def q_embedding_quantize_int8(sf_dir: str):
    """Scalar int8 quantization of the embedding column (the
    vector-store compression baseline; Jegou et al. 2011 §2 scalar
    quantizer): pass 1 = per-dim global min/max partials (bounded O(d)
    driver combine), pass 2 = affine code floor((x-mn)/(mx-mn)*255+0.5)
    clamped to [0,255], reconstruction x' = mn + q*(mx-mn)/255, per-dim
    MSE + max-abs reconstruction error partials. Vectors never shuffle;
    both passes stream. The integer code rule is branch-exact in SQL."""
    from ..stages.exchange import driver_combine
    from ..stages.similarity import _batch_matrix
    from ..util import stable_round6

    ds = _embs(sf_dir, ["vec_id", "embedding"])

    def mm_partial(t: pa.Table) -> pd.DataFrame:
        x = _batch_matrix(t, "embedding").astype(np.float64)
        if not x.size:
            return pd.DataFrame({"mn": [], "mx": []})
        return pd.DataFrame({"mn": [x.min(axis=0).tolist()],
                             "mx": [x.max(axis=0).tolist()]})

    parts = driver_combine(ds, mm_partial, lambda df: df)
    mn = np.min([np.asarray(v) for v in parts["mn"]], axis=0)
    mx = np.max([np.asarray(v) for v in parts["mx"]], axis=0)
    rng = mx - mn

    def err_partial(t: pa.Table) -> pd.DataFrame:
        x = _batch_matrix(t, "embedding").astype(np.float64)
        if not x.size:
            return pd.DataFrame({"n": [], "sse": [], "mae": []})
        qf = np.floor((x - mn) / rng * 255.0 + 0.5)
        q = np.clip(qf, 0.0, 255.0)
        xr = mn + q * rng / 255.0
        e = x - xr
        return pd.DataFrame({
            "n": [len(x)],
            "sse": [(e * e).sum(axis=0).tolist()],
            "mae": [np.abs(e).max(axis=0).tolist()],
        })

    eparts = driver_combine(ds, err_partial, lambda df: df)
    n = int(np.sum(eparts["n"]))
    sse = np.sum([np.asarray(v) for v in eparts["sse"]], axis=0)
    mae = np.max([np.asarray(v) for v in eparts["mae"]], axis=0)
    out = pd.DataFrame({
        "i": np.arange(len(mn), dtype=np.int64),
        "n": np.int64(n),
        "mn": stable_round6(mn),
        "mx": stable_round6(mx),
        "mse": stable_round6(sse / n),
        "max_abs_err": stable_round6(mae),
    })
    out["i"] = out["i"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values("i").reset_index(drop=True)


_SQL_QUANTIZE_INT8 = """
WITH u AS (
  SELECT vec_id,
         CAST(UNNEST(embedding) AS DOUBLE) AS x,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
), mm AS (
  SELECT i, MIN(x) AS mn, MAX(x) AS mx FROM u GROUP BY 1
), e AS (
  SELECT u.i, mm.mn, mm.mx,
         u.x - (mm.mn + LEAST(GREATEST(FLOOR((u.x - mm.mn)
                / (mm.mx - mm.mn) * 255.0 + 0.5), 0.0), 255.0)
                * (mm.mx - mm.mn) / 255.0) AS err
  FROM u JOIN mm USING (i)
)
SELECT CAST(i - 1 AS BIGINT) AS i,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(ROUND(ANY_VALUE(mn), 9), 6) AS mn,
       ROUND(ROUND(ANY_VALUE(mx), 9), 6) AS mx,
       ROUND(ROUND(SUM(err * err) / COUNT(*), 9), 6) AS mse,
       ROUND(ROUND(MAX(ABS(err)), 9), 6) AS max_abs_err
FROM e GROUP BY i ORDER BY i
"""


def q_embedding_morton(sf_dir: str):
    """Morton (Z-order) locality codes over the first two embedding
    dims (Morton 1966; the space-filling-curve bucketing used to
    co-locate nearby vectors without a learned index): 16-bit grid
    coordinates floor((x-mn)/(mx-mn)*65535+0.5) from global per-dim
    min/max, bit interleave via the classic 4-step magic-mask
    spreading, bucket = morton >> 24 (256 contiguous Z-ranges). All
    integer arithmetic — exact in SQL. At scale the bucket becomes the
    repartition key: one bounded min/max pass + a stateless map."""
    from ..stages.exchange import driver_combine
    from ..stages.similarity import _batch_matrix

    ds = _embs(sf_dir, ["vec_id", "embedding"])

    def mm_partial(t: pa.Table) -> pd.DataFrame:
        x = _batch_matrix(t, "embedding").astype(np.float64)[:, :2]
        if not x.size:
            return pd.DataFrame({"mn": [], "mx": []})
        return pd.DataFrame({"mn": [x.min(axis=0).tolist()],
                             "mx": [x.max(axis=0).tolist()]})

    parts = driver_combine(ds, mm_partial, lambda df: df)
    mn = np.min([np.asarray(v) for v in parts["mn"]], axis=0)
    mx = np.max([np.asarray(v) for v in parts["mx"]], axis=0)
    rng = mx - mn

    def spread(v: np.ndarray) -> np.ndarray:
        v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF)
        v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F)
        v = (v | (v << np.uint64(2))) & np.uint64(0x33333333)
        v = (v | (v << np.uint64(1))) & np.uint64(0x55555555)
        return v

    def code(t: pa.Table) -> pd.DataFrame:
        x = _batch_matrix(t, "embedding").astype(np.float64)[:, :2]
        vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not x.size:
            return pd.DataFrame({
                "vec_id": pd.Series([], dtype=np.int64),
                "gx": pd.Series([], dtype=np.int64),
                "gy": pd.Series([], dtype=np.int64),
                "morton": pd.Series([], dtype=np.int64),
                "bucket": pd.Series([], dtype=np.int64),
            })
        g = np.clip(np.floor((x - mn) / rng * 65535.0 + 0.5), 0.0, 65535.0)
        gx = g[:, 0].astype(np.uint64)
        gy = g[:, 1].astype(np.uint64)
        morton = spread(gx) | (spread(gy) << np.uint64(1))
        return pd.DataFrame({
            "vec_id": vid,
            "gx": gx.astype(np.int64),
            "gy": gy.astype(np.int64),
            "morton": morton.astype(np.int64),
            "bucket": (morton >> np.uint64(24)).astype(np.int64),
        })

    out = ds.map_batches(code, batch_format="pyarrow").to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("vec_id").reset_index(drop=True)


_SQL_MORTON = """
WITH u AS (
  SELECT vec_id,
         CAST(embedding[1] AS DOUBLE) AS x1,
         CAST(embedding[2] AS DOUBLE) AS x2
  FROM embeddings
), mm AS (
  SELECT MIN(x1) AS mn1, MAX(x1) AS mx1, MIN(x2) AS mn2, MAX(x2) AS mx2
  FROM u
), g AS (
  SELECT u.vec_id,
         CAST(LEAST(GREATEST(FLOOR((u.x1 - mm.mn1) / (mm.mx1 - mm.mn1)
              * 65535.0 + 0.5), 0.0), 65535.0) AS BIGINT) AS gx,
         CAST(LEAST(GREATEST(FLOOR((u.x2 - mm.mn2) / (mm.mx2 - mm.mn2)
              * 65535.0 + 0.5), 0.0), 65535.0) AS BIGINT) AS gy
  FROM u CROSS JOIN mm
), s1 AS (
  SELECT vec_id, gx, gy,
         (gx | (gx << 8)) & 16711935 AS ax,
         (gy | (gy << 8)) & 16711935 AS ay
  FROM g
), s2 AS (
  SELECT vec_id, gx, gy,
         (ax | (ax << 4)) & 252645135 AS ax,
         (ay | (ay << 4)) & 252645135 AS ay
  FROM s1
), s3 AS (
  SELECT vec_id, gx, gy,
         (ax | (ax << 2)) & 858993459 AS ax,
         (ay | (ay << 2)) & 858993459 AS ay
  FROM s2
), s4 AS (
  SELECT vec_id, gx, gy,
         (ax | (ax << 1)) & 1431655765 AS ax,
         (ay | (ay << 1)) & 1431655765 AS ay
  FROM s3
)
SELECT vec_id, gx, gy,
       ax | (ay << 1) AS morton,
       (ax | (ay << 1)) >> 24 AS bucket
FROM s4 ORDER BY vec_id
"""


def q_doc_wordpiece(sf_dir: str):
    """WordPiece greedy max-match tokenization fertility (Schuster &
    Nakajima 2012; the BERT tokenizer rule; stages/wordpiece.py):
    train k=50 BPE merges (the shared vocabulary-learning pass of
    doc_bpe_merges), derive the piece vocab deterministically, then an
    actor-pool pass segments every doc's DISTINCT words longest-match-
    first with whole-word UNK fallback; per-source word/piece/UNK
    totals + fertility. Rows-only: the greedy loop is iterative;
    hand-worked segmentations and the longest-match property are
    pytest-pinned."""
    from ..stages.bpe import bpe_train
    from ..stages.wordpiece import wordpiece_counts
    from ..util import stable_round6 as _sr6

    docs = _docs(sf_dir, ["doc_id", "source", "text"])
    merges = bpe_train(docs, k=50)
    per_doc = wordpiece_counts(docs, merges).to_pandas()
    g = per_doc.groupby("source", as_index=False).agg(
        n_docs=("doc_id", "size"), n_words=("n_words", "sum"),
        n_pieces=("n_pieces", "sum"), n_unk_words=("n_unk_words", "sum"))
    seg_words = g["n_words"] - g["n_unk_words"]
    g["fertility"] = _sr6(g["n_pieces"] / seg_words)
    g["unk_rate"] = _sr6(g["n_unk_words"] / g["n_words"])
    for c in ("n_docs", "n_words", "n_pieces", "n_unk_words"):
        g[c] = g[c].astype("int64")
    return g.sort_values("source").reset_index(drop=True)


def q_doc_good_turing(sf_dir: str):
    """Good-Turing frequency smoothing (Good 1953; the Katz-backoff /
    KenLM discounting foundation): frequency-of-frequencies N_r over
    the corpus word counts (the doc_word_freqs distributed pass —
    per-batch value_counts partials, ONE vocab-bounded exchange), the
    classic adjusted counts r* = (r+1) N_{r+1} / N_r for r = 1..10,
    and the unseen-mass estimate p0 = N_1 / T. Exact SQL replay on the
    same tokenization."""
    from ..stages.bpe import word_freqs
    from ..util import stable_round6 as _sr6

    wf = word_freqs(_docs(sf_dir, ["text"]))
    ff = wf["freq"].value_counts()
    t_total = int(wf["freq"].sum())
    n1 = int(ff.get(1, 0))
    rows = []
    for r in range(1, 11):
        n_r = int(ff.get(r, 0))
        n_r1 = int(ff.get(r + 1, 0))
        r_star = (r + 1) * n_r1 / n_r if n_r > 0 else np.nan
        rows.append({"r": r, "n_r": n_r, "r_star": r_star})
    out = pd.DataFrame(rows)
    out["r"] = out["r"].astype("int64")
    out["n_r"] = out["n_r"].astype("int64")
    out["r_star"] = _sr6(out["r_star"].astype(float))
    out["p0"] = _sr6(pd.Series(np.full(len(out), n1 / t_total)))
    out["t_total"] = t_total
    return out.sort_values("r").reset_index(drop=True)


_SQL_GOOD_TURING = r"""
WITH wf AS (
  SELECT word, COUNT(*) AS freq
  FROM (SELECT UNNEST(regexp_split_to_array(text, '\s+')) AS word FROM documents)
  WHERE word <> '' GROUP BY word
),
ff AS (SELECT freq AS r, COUNT(*) AS n FROM wf GROUP BY freq),
tot AS (SELECT SUM(freq) AS t, SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS n1 FROM wf),
ks AS (SELECT UNNEST(generate_series(1, 10)) AS r)
SELECT ks.r::BIGINT AS r,
       COALESCE(fr.n, 0)::BIGINT AS n_r,
       CASE WHEN fr.n > 0
            THEN ROUND(ROUND((ks.r + 1) * COALESCE(fr1.n, 0) / fr.n::DOUBLE, 9), 6)
       END AS r_star,
       ROUND(ROUND(tot.n1 / tot.t::DOUBLE, 9), 6) AS p0,
       tot.t::BIGINT AS t_total
FROM ks
LEFT JOIN ff fr ON fr.r = ks.r
LEFT JOIN ff fr1 ON fr1.r = ks.r + 1
CROSS JOIN tot
ORDER BY r
"""


def q_doc_heaps_law(sf_dir: str):
    """Heaps'-law vocabulary-growth fit (Heaps 1978, Herdan 1960:
    V = K * T^beta) per source: docs ordered by doc_id, vocabulary size
    V(n) = words whose FIRST document rank <= n (first occurrence =
    MIN(doc_id) per word — decomposable, one keyed exchange), token
    count T(n) = cumulative words through rank n, sampled at the ten
    decile checkpoints n_k = (k*N)//10, then the ln-ln OLS slope/
    intercept/r2 in the shared n-moment form. Ray shape: two slim
    distributed passes (per-doc word counts; per-(source,word) min
    doc_id) + a driver combine over doc-granularity rows — the same
    per-doc result granularity as the encode queries; at open scale
    the decile boundaries come from distributed rank selection
    (stratified.py:exact_rank_values) instead of a doc list."""
    from ..stages.exchange import driver_combine
    from ..util import stable_round6 as _sr6

    docs = _docs(sf_dir, ["doc_id", "source", "text"])

    def per_doc(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        lists = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t["text"]), pattern=r"\s+")
        flat = pc.list_flatten(lists)
        nonempty = pc.not_equal(flat, "")
        sizes = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        doc_ix = np.repeat(np.arange(len(t)), sizes)
        good = nonempty.to_numpy(zero_copy_only=False)
        n_words = np.bincount(doc_ix[good], minlength=len(t)).astype(np.int64)
        return pd.DataFrame({"source": t["source"].to_pandas(),
                             "doc_id": t["doc_id"].to_pandas(),
                             "n_words": n_words})

    doc_tbl = docs.map_batches(per_doc, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()

    def first_partial(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        lists = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t["text"]), pattern=r"\s+")
        flat = pc.list_flatten(lists)
        sizes = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        doc_ix = np.repeat(np.arange(len(t)), sizes)
        df = pd.DataFrame({"source": t["source"].to_pandas().to_numpy()[doc_ix],
                           "doc_id": t["doc_id"].to_pandas().to_numpy()[doc_ix],
                           "word": flat.to_pandas()})
        df = df[df["word"] != ""]
        return df.groupby(["source", "word"], as_index=False)["doc_id"].min()

    firsts = driver_combine(
        docs, first_partial,
        lambda df: df.groupby(["source", "word"], as_index=False)["doc_id"].min(),
        batch_format="pyarrow",
    )

    rows = []
    for src, g in doc_tbl.groupby("source", sort=True):
        g = g.sort_values("doc_id", ignore_index=True)
        nd = len(g)
        cumtok = g["n_words"].to_numpy(dtype=np.int64).cumsum()
        ids = g["doc_id"].to_numpy()
        fw = firsts[firsts["source"] == src]
        franks = np.searchsorted(ids, fw["doc_id"].to_numpy()) + 1
        vcum = np.bincount(franks, minlength=nd + 1).cumsum()
        xs, ys = [], []
        for k in range(1, 11):
            nk = (k * nd) // 10
            if nk < 1:
                continue
            xs.append(np.log(float(cumtok[nk - 1])))
            ys.append(np.log(float(vcum[nk])))
        x = np.asarray(xs)
        y = np.asarray(ys)
        n = float(len(x))
        sx, sy = x.sum(), y.sum()
        sxx, syy, sxy = (x * x).sum(), (y * y).sum(), (x * y).sum()
        if y.max() == y.min():
            # vocab saturated before the first checkpoint: the fit is
            # the flat line (guarded EXPLICITLY on both sides — the
            # moment-form denominator is 0 here in exact arithmetic
            # but accumulation order decides whether a given engine
            # sees exactly 0 or 1 ULP of noise)
            beta, ln_k, r2 = 0.0, sy / n, 0.0
        else:
            beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
            ln_k = (sy - beta * sx) / n
            r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
        rows.append({"source": src, "n_docs": nd,
                     "t_total": int(cumtok[-1]), "v_total": int(len(fw)),
                     "beta": beta, "ln_k": ln_k, "r2": r2})
    out = pd.DataFrame(rows)
    for c in ("n_docs", "t_total", "v_total"):
        out[c] = out[c].astype("int64")
    for c in ("beta", "ln_k", "r2"):
        out[c] = _sr6(out[c].astype(float))
    return out.sort_values("source").reset_index(drop=True)


_SQL_HEAPS_LAW = r"""
WITH tok AS (
  SELECT source, doc_id,
         len(list_filter(regexp_split_to_array(text, '\s+'),
                         w -> w <> '')) AS n_words
  FROM documents
),
ranked AS (
  SELECT source, doc_id, n_words,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rnk,
         COUNT(*) OVER (PARTITION BY source) AS nd,
         SUM(n_words) OVER (PARTITION BY source ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS cumtok
  FROM tok
),
words AS (
  SELECT source, word, MIN(doc_id) AS fd
  FROM (SELECT source, doc_id,
               UNNEST(regexp_split_to_array(text, '\s+')) AS word
        FROM documents)
  WHERE word <> '' GROUP BY 1, 2
),
wrank AS (
  SELECT w.source, r.rnk AS frnk
  FROM words w JOIN ranked r ON r.source = w.source AND r.doc_id = w.fd
),
src AS (SELECT source, MAX(nd) AS nd, MAX(cumtok) AS t_total FROM ranked GROUP BY 1),
vtot AS (SELECT source, COUNT(*) AS v_total FROM words GROUP BY 1),
ks AS (SELECT UNNEST(generate_series(1, 10)) AS k),
cps AS (
  SELECT src.source, ks.k, (ks.k * src.nd) // 10 AS nk
  FROM src CROSS JOIN ks
  WHERE (ks.k * src.nd) // 10 >= 1
),
points AS (
  SELECT c.source,
         ln(r.cumtok::DOUBLE) AS x,
         ln((SELECT COUNT(*) FROM wrank w
             WHERE w.source = c.source AND w.frnk <= c.nk)::DOUBLE) AS y
  FROM cps c JOIN ranked r ON r.source = c.source AND r.rnk = c.nk
),
mom AS (
  SELECT source, COUNT(*)::DOUBLE AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy,
         MAX(y) AS ymax, MIN(y) AS ymin
  FROM points GROUP BY 1
)
SELECT mom.source,
       src.nd::BIGINT AS n_docs,
       src.t_total::BIGINT AS t_total,
       vtot.v_total::BIGINT AS v_total,
       CASE WHEN ymax = ymin THEN 0.0 ELSE
       ROUND(ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 9), 6) END AS beta,
       CASE WHEN ymax = ymin THEN ROUND(ROUND(sy / n, 9), 6) ELSE
       ROUND(ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 9), 6) END AS ln_k,
       CASE WHEN ymax = ymin THEN 0.0 ELSE
       ROUND(ROUND(POW(n * sxy - sx * sy, 2)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 9), 6) END AS r2
FROM mom JOIN src USING (source) JOIN vtot USING (source)
ORDER BY source
"""


def unimax_alloc(
    n: "np.ndarray", *, budget: float, cap: float
) -> tuple["np.ndarray", int]:
    """UniMax waterfilling over ASCENDING-sorted source sizes ``n``:
    rank k is epoch-capped iff cap*n_k*(M-k+1) <= budget - prefix_{k-1}
    applied as a running AND (the capped set is a prefix); the rest
    split the remaining budget equally. All quantities are
    integer-valued floats below 2^53, so the comparisons are EXACT and
    partitioning/accumulation-order independent. Returns
    (alloc, k_cap)."""
    m = len(n)
    prefix = np.concatenate(([0.0], (cap * n).cumsum()))
    k_cap = 0
    for k in range(1, m + 1):
        if cap * n[k - 1] * (m - k + 1) <= budget - prefix[k - 1]:
            k_cap = k
        else:
            break
    alloc = np.empty(m)
    alloc[:k_cap] = cap * n[:k_cap]
    if k_cap < m:
        alloc[k_cap:] = (budget - prefix[k_cap]) / (m - k_cap)
    return alloc, k_cap


def q_doc_mix_unimax(sf_dir: str):
    """UniMax budget-capped uniform source sampling (Chung et al.
    2023, 'UniMax: Fairer and More Effective Language Sampling for
    Large-Scale Multilingual Pretraining'): given per-source word
    counts n_i, a total budget B = 0.5 * total words, and an epoch cap
    c = 3, waterfill — sources small enough that c * n_i fits their
    fair share of the remaining budget are capped at c epochs, the
    rest split the remainder equally. Since sources are processed in
    ascending size the capped set is a PREFIX of the sorted order, so
    the allocation has a closed form over prefix sums (rank k capped
    iff c * n_k * (M - k + 1) <= B - prefix_{k-1}, applied as a
    running AND) — exactly SQL-replayable. Third mixing policy next to
    proportional (doc_source_mix) and temperature
    (doc_mix_temperature). Ray shape: one per-batch word-count partial
    pass, sources-sized driver combine."""
    from ..stages.exchange import driver_combine
    from ..util import stable_round6 as _sr6

    docs = _docs(sf_dir, ["source", "text"])

    def partial(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        lists = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t["text"]), pattern=r"\s+")
        flat = pc.list_flatten(lists)
        good = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        sizes = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        doc_ix = np.repeat(np.arange(len(t)), sizes)
        n_words = np.bincount(doc_ix[good], minlength=len(t))
        return pd.DataFrame({"source": t["source"].to_pandas(),
                             "n_words": n_words.astype(np.int64)}
                            ).groupby("source", as_index=False).sum()

    g = driver_combine(
        docs, partial,
        lambda df: df.groupby("source", as_index=False)["n_words"].sum(),
        batch_format="pyarrow",
    ).sort_values(["n_words", "source"], ignore_index=True)

    c = 3.0
    n = g["n_words"].to_numpy(dtype=np.float64)
    budget = 0.5 * n.sum()
    m = len(n)
    alloc, k_cap = unimax_alloc(n, budget=budget, cap=c)
    out = pd.DataFrame({
        "source": g["source"],
        "n_words": g["n_words"].astype("int64"),
        "capped": np.arange(1, m + 1) <= k_cap,
        "alloc": _sr6(alloc),
        "epochs": _sr6(alloc / n),
        "share": _sr6(alloc / budget),
    })
    out["capped"] = out["capped"].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


_SQL_UNIMAX = r"""
WITH tok AS (
  SELECT source,
         SUM(len(list_filter(regexp_split_to_array(text, '\s+'),
                             w -> w <> ''))) AS n_words
  FROM documents GROUP BY 1
),
ranked AS (
  SELECT source, n_words::DOUBLE AS n,
         ROW_NUMBER() OVER (ORDER BY n_words, source) AS k,
         COUNT(*) OVER () AS m,
         SUM(n_words::DOUBLE) OVER () AS total
  FROM tok
),
pref AS (
  SELECT *,
         0.5 * total AS budget,
         COALESCE(SUM(3.0 * n) OVER (ORDER BY k
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS prefix_prev,
         SUM(3.0 * n) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS prefix_incl
  FROM ranked
),
flags AS (
  SELECT *,
         CASE WHEN 3.0 * n * (m - k + 1) <= budget - prefix_prev
              THEN 1 ELSE 0 END AS ok
  FROM pref
),
runall AS (
  SELECT *,
         MIN(ok) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS capped
  FROM flags
),
kc AS (
  SELECT COALESCE(MAX(CASE WHEN capped = 1 THEN k END), 0) AS k_cap,
         COALESCE(MAX(CASE WHEN capped = 1 THEN prefix_incl END), 0.0) AS prefix_cap
  FROM runall
)
SELECT r.source,
       CAST(r.n AS BIGINT) AS n_words,
       CAST(r.capped AS BIGINT) AS capped,
       ROUND(ROUND(CASE WHEN r.capped = 1 THEN 3.0 * r.n
                        ELSE (r.budget - kc.prefix_cap) / (r.m - kc.k_cap) END, 9), 6) AS alloc,
       ROUND(ROUND(CASE WHEN r.capped = 1 THEN 3.0
                        ELSE (r.budget - kc.prefix_cap) / (r.m - kc.k_cap) / r.n END, 9), 6) AS epochs,
       ROUND(ROUND(CASE WHEN r.capped = 1 THEN 3.0 * r.n / r.budget
                        ELSE (r.budget - kc.prefix_cap) / (r.m - kc.k_cap) / r.budget END, 9), 6) AS share
FROM runall r CROSS JOIN kc
ORDER BY source
"""


def q_embedding_label_sim(sf_dir: str):
    """Inter-label centroid cosine matrix (the between-class companion
    to embedding_label_compactness): per-label centroid = mean vector
    from (label x d) sum partials — labels are bounded, vectors never
    shuffle — then pairwise cosine of the centroids (ordered pairs
    la < lb). Exact SQL replay via the UNNEST/generate_subscripts
    pattern of the compactness oracle."""
    from ..stages.exchange import driver_combine
    from ..util import stable_round6 as _sr6

    ds = _embs(sf_dir, ["label", "embedding"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        rows = []
        for lab, g in df.groupby("label"):
            x = np.stack(g["embedding"].to_numpy()).astype(np.float64)
            rows.append({"label": int(lab), "n": len(x),
                         "s": x.sum(axis=0).tolist()})
        return pd.DataFrame(rows)

    parts = driver_combine(ds, partial, lambda df: df, batch_format="pyarrow")
    agg: dict[int, tuple[int, np.ndarray]] = {}
    for _, r in parts.iterrows():
        n0, s0 = agg.get(int(r["label"]), (0, 0.0))
        agg[int(r["label"])] = (n0 + int(r["n"]), s0 + np.asarray(r["s"]))
    cents = {lab: s / n for lab, (n, s) in agg.items()}
    rows = []
    for la in sorted(cents):
        for lb in sorted(cents):
            if la >= lb:
                continue
            a, b = cents[la], cents[lb]
            cos = (a * b).sum() / (np.sqrt((a * a).sum()) * np.sqrt((b * b).sum()))
            rows.append({"label_a": la, "label_b": lb,
                         "n_a": agg[la][0], "n_b": agg[lb][0], "cos": cos})
    out = pd.DataFrame(rows)
    for c in ("label_a", "label_b", "n_a", "n_b"):
        out[c] = out[c].astype("int64")
    out["cos"] = _sr6(out["cos"].astype(float))
    return out.sort_values(["label_a", "label_b"]).reset_index(drop=True)


_SQL_LABEL_SIM = """
WITH u AS (
  SELECT label, vec_id,
         UNNEST(embedding::DOUBLE[]) AS x,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
cent AS (
  SELECT label, i, SUM(x) / COUNT(*) AS c,
         COUNT(DISTINCT vec_id) AS n
  FROM u GROUP BY 1, 2
),
nlab AS (SELECT label, MAX(n) AS n FROM cent GROUP BY 1),
pairs AS (
  SELECT a.label AS label_a, b.label AS label_b,
         SUM(a.c * b.c) AS dot,
         SQRT(SUM(a.c * a.c)) AS na, SQRT(SUM(b.c * b.c)) AS nb
  FROM cent a JOIN cent b ON a.i = b.i AND a.label < b.label
  GROUP BY 1, 2
)
SELECT p.label_a::BIGINT AS label_a, p.label_b::BIGINT AS label_b,
       la.n::BIGINT AS n_a, lb.n::BIGINT AS n_b,
       ROUND(ROUND(p.dot / (p.na * p.nb), 9), 6) AS cos
FROM pairs p
JOIN nlab la ON la.label = p.label_a
JOIN nlab lb ON lb.label = p.label_b
ORDER BY label_a, label_b
"""


def q_doc_vocab_chi2(sf_dir: str):
    """Chi-square homogeneity test of word distributions between
    source pairs (Pearson 1900; the classic categorical drift test,
    complementing KS on values, JS vocabulary divergence and the
    Jaccard matrix): the global top-20 words by corpus frequency are
    the categories plus one rest bucket; for each ordered source pair
    chi2 = sum (O - E)^2 / E with expectations from the 2 x 21 table
    margins. Counts ride the one vocab-bounded word exchange; the
    pair stage is a bounded driver combine over (source, top-word)
    counts. Integer counts make both sides exact."""
    from ..stages.exchange import driver_combine
    from ..util import stable_round6 as _sr6

    docs = _docs(sf_dir, ["source", "text"])

    def partial(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        lists = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t["text"]), pattern=r"\s+")
        flat = pc.list_flatten(lists)
        sizes = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        doc_ix = np.repeat(np.arange(len(t)), sizes)
        df = pd.DataFrame({"source": t["source"].to_pandas().to_numpy()[doc_ix],
                           "word": flat.to_pandas()})
        df = df[df["word"] != ""]
        return df.groupby(["source", "word"], as_index=False).size().rename(
            columns={"size": "cnt"})

    counts = driver_combine(
        docs, partial,
        lambda df: df.groupby(["source", "word"], as_index=False)["cnt"].sum(),
        batch_format="pyarrow",
    )
    tot = counts.groupby("word")["cnt"].sum().sort_values(ascending=False)
    # deterministic top-20: frequency desc, word asc on ties
    top = sorted(tot.index[tot.to_numpy() >= 0],
                 key=lambda w: (-int(tot[w]), w))[:20]
    topset = set(top)
    counts["cat"] = np.where(counts["word"].isin(topset),
                             counts["word"], "__rest__")
    cat = counts.groupby(["source", "cat"])["cnt"].sum()
    sources = sorted(counts["source"].unique())
    cats = top + ["__rest__"]
    mat = {s: np.array([float(cat.get((s, c), 0)) for c in cats])
           for s in sources}
    rows = []
    for i, sa in enumerate(sources):
        for sb in sources[i + 1:]:
            oa, ob = mat[sa], mat[sb]
            ta, tb = oa.sum(), ob.sum()
            col = oa + ob
            n = ta + tb
            ea = col * ta / n
            eb = col * tb / n
            ok = col > 0
            chi2 = (((oa - ea) ** 2 / ea)[ok].sum()
                    + (((ob - eb) ** 2 / eb)[ok]).sum())
            rows.append({"source_a": sa, "source_b": sb,
                         "n_a": int(ta), "n_b": int(tb),
                         "df": int(ok.sum()) - 1, "chi2": chi2})
    out = pd.DataFrame(rows)
    for c in ("n_a", "n_b", "df"):
        out[c] = out[c].astype("int64")
    out["chi2"] = _sr6(out["chi2"].astype(float))
    return out.sort_values(["source_a", "source_b"]).reset_index(drop=True)


_SQL_VOCAB_CHI2 = r"""
WITH wc AS (
  SELECT source, word, COUNT(*) AS cnt
  FROM (SELECT source, UNNEST(regexp_split_to_array(text, '\s+')) AS word
        FROM documents)
  WHERE word <> '' GROUP BY 1, 2
),
top AS (
  SELECT word FROM (
    SELECT word, SUM(cnt) AS f FROM wc GROUP BY 1
    ORDER BY f DESC, word ASC LIMIT 20)
),
catd AS (
  SELECT wc.source,
         CASE WHEN top.word IS NOT NULL THEN wc.word ELSE '__rest__' END AS cat,
         SUM(wc.cnt)::DOUBLE AS o
  FROM wc LEFT JOIN top ON top.word = wc.word
  GROUP BY 1, 2
),
srcs AS (SELECT DISTINCT source FROM catd),
prs AS (
  SELECT a.source AS source_a, b.source AS source_b
  FROM srcs a JOIN srcs b ON a.source < b.source
),
cats AS (SELECT DISTINCT cat FROM catd),
cells AS (
  SELECT p.source_a, p.source_b, c.cat,
         COALESCE(ca.o, 0.0) AS oa, COALESCE(cb.o, 0.0) AS ob
  FROM prs p CROSS JOIN cats c
  LEFT JOIN catd ca ON ca.source = p.source_a AND ca.cat = c.cat
  LEFT JOIN catd cb ON cb.source = p.source_b AND cb.cat = c.cat
),
tots AS (
  SELECT source_a, source_b, SUM(oa) AS ta, SUM(ob) AS tb
  FROM cells GROUP BY 1, 2
),
chi AS (
  SELECT c.source_a, c.source_b, t.ta, t.tb,
         SUM(CASE WHEN c.oa + c.ob > 0 THEN
             POW(c.oa - (c.oa + c.ob) * t.ta / (t.ta + t.tb), 2)
               / ((c.oa + c.ob) * t.ta / (t.ta + t.tb))
           + POW(c.ob - (c.oa + c.ob) * t.tb / (t.ta + t.tb), 2)
               / ((c.oa + c.ob) * t.tb / (t.ta + t.tb))
             ELSE 0 END) AS chi2,
         SUM(CASE WHEN c.oa + c.ob > 0 THEN 1 ELSE 0 END) - 1 AS df
  FROM cells c JOIN tots t USING (source_a, source_b)
  GROUP BY 1, 2, t.ta, t.tb
)
SELECT source_a, source_b,
       CAST(ta AS BIGINT) AS n_a, CAST(tb AS BIGINT) AS n_b,
       CAST(df AS BIGINT) AS df,
       ROUND(ROUND(chi2, 9), 6) AS chi2
FROM chi ORDER BY source_a, source_b
"""


def q_doc_gini_length(sf_dir: str):
    """Gini coefficient of document length inequality per source
    (Gini 1912, rank closed form G = (2 sum i*x_(i)) / (n sum x)
    - (n+1)/n over ascending-sorted word counts, ties broken by
    doc_id so the rank assignment is identical on both sides) — the
    corpus-curation balance probe: a source dominated by a few huge
    documents trains differently from a uniform one. One per-batch
    word-count partial pass; per-source sort over doc-granularity
    rows."""
    from ..stages.exchange import driver_combine
    from ..util import stable_round6 as _sr6

    docs = _docs(sf_dir, ["doc_id", "source", "text"])

    def partial(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        lists = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t["text"]), pattern=r"\s+")
        flat = pc.list_flatten(lists)
        good = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        sizes = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        doc_ix = np.repeat(np.arange(len(t)), sizes)
        n_words = np.bincount(doc_ix[good], minlength=len(t))
        return pd.DataFrame({"source": t["source"].to_pandas(),
                             "doc_id": t["doc_id"].to_pandas(),
                             "n_words": n_words.astype(np.int64)})

    per_doc = driver_combine(docs, partial, lambda df: df,
                             batch_format="pyarrow")
    rows = []
    for src, g in per_doc.groupby("source", sort=True):
        g = g.sort_values(["n_words", "doc_id"], ignore_index=True)
        x = g["n_words"].to_numpy(dtype=np.float64)
        n = float(len(x))
        i = np.arange(1, len(x) + 1, dtype=np.float64)
        gini = 2.0 * (i * x).sum() / (n * x.sum()) - (n + 1.0) / n
        rows.append({"source": src, "n_docs": int(n),
                     "total_words": int(x.sum()), "gini": gini})
    out = pd.DataFrame(rows)
    out["n_docs"] = out["n_docs"].astype("int64")
    out["total_words"] = out["total_words"].astype("int64")
    out["gini"] = _sr6(out["gini"].astype(float))
    return out.sort_values("source").reset_index(drop=True)


_SQL_GINI_LENGTH = r"""
WITH tok AS (
  SELECT source, doc_id,
         len(list_filter(regexp_split_to_array(text, '\s+'),
                         w -> w <> ''))::DOUBLE AS x
  FROM documents
),
ranked AS (
  SELECT source, x,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY x, doc_id)::DOUBLE AS i
  FROM tok
)
SELECT source,
       COUNT(*)::BIGINT AS n_docs,
       CAST(SUM(x) AS BIGINT) AS total_words,
       ROUND(ROUND(2.0 * SUM(i * x) / (COUNT(*) * SUM(x))
             - (COUNT(*) + 1.0) / COUNT(*), 9), 6) AS gini
FROM ranked GROUP BY source ORDER BY source
"""


def q_doc_ngram_commonality(sf_dir: str):
    """Bigram-commonality diversity probe (the Self-BLEU intuition of
    Zhu et al. 2018 'Texygen', made set-exact instead of
    BLEU-weighted): per source, the mean over docs of the fraction of
    a doc's DISTINCT bigrams that also occur in at least one OTHER doc
    of the same source — 1.0 means every doc re-uses corpus bigrams
    (template degeneracy), low values mean diverse text. Decomposable:
    distinct (source, doc, bigram) rows -> bigram doc-frequencies ->
    per-doc fraction with df >= 2; integer counts keep both sides
    exact."""
    from ..stages.exchange import driver_combine
    from ..util import stable_round6 as _sr6

    docs = _docs(sf_dir, ["doc_id", "source", "text"])

    def partial(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        lists = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t["text"]), pattern=r"\s+")
        out = []
        for i in range(len(t)):
            words = [w for w in lists[i].as_py() if w]
            grams = {(words[j], words[j + 1]) for j in range(len(words) - 1)}
            if not grams:
                continue
            out.append(pd.DataFrame({
                "source": t["source"][i].as_py(),
                "doc_id": t["doc_id"][i].as_py(),
                "w1": [g[0] for g in grams],
                "w2": [g[1] for g in grams],
            }))
        if not out:
            return pd.DataFrame({"source": [], "doc_id": [],
                                 "w1": [], "w2": []})
        return pd.concat(out, ignore_index=True)

    tri = driver_combine(docs, partial, lambda df: df,
                         batch_format="pyarrow")
    df_counts = tri.groupby(["source", "w1", "w2"])["doc_id"].nunique()
    tri = tri.merge(df_counts.rename("df").reset_index(),
                    on=["source", "w1", "w2"])
    per_doc = tri.groupby(["source", "doc_id"]).agg(
        n_grams=("df", "size"),
        n_common=("df", lambda s: int((s >= 2).sum())))
    per_doc["frac"] = per_doc["n_common"] / per_doc["n_grams"]
    g = per_doc.groupby("source").agg(
        n_docs=("frac", "size"), mean_commonality=("frac", "mean"),
        total_distinct_grams=("n_grams", "sum"))
    out = g.reset_index()
    out["n_docs"] = out["n_docs"].astype("int64")
    out["total_distinct_grams"] = out["total_distinct_grams"].astype("int64")
    out["mean_commonality"] = _sr6(out["mean_commonality"].astype(float))
    return out.sort_values("source").reset_index(drop=True)


_SQL_NGRAM_COMMONALITY = r"""
WITH w AS (
  SELECT source, doc_id, word, rn
  FROM (SELECT source, doc_id,
               UNNEST(list_filter(regexp_split_to_array(text, '\s+'),
                                  x -> x <> '')) AS word,
               generate_subscripts(list_filter(
                   regexp_split_to_array(text, '\s+'), x -> x <> ''), 1) AS rn
        FROM documents)
),
grams AS (
  SELECT DISTINCT a.source, a.doc_id, a.word AS w1, b.word AS w2
  FROM w a JOIN w b
    ON b.source = a.source AND b.doc_id = a.doc_id AND b.rn = a.rn + 1
),
dfreq AS (
  SELECT source, w1, w2, COUNT(DISTINCT doc_id) AS df
  FROM grams GROUP BY 1, 2, 3
),
per_doc AS (
  SELECT g.source, g.doc_id,
         COUNT(*)::DOUBLE AS n_grams,
         SUM(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END)::DOUBLE AS n_common
  FROM grams g JOIN dfreq d USING (source, w1, w2)
  GROUP BY 1, 2
)
SELECT source,
       COUNT(*)::BIGINT AS n_docs,
       ROUND(ROUND(SUM(n_common / n_grams) / COUNT(*), 9), 6) AS mean_commonality,
       CAST(SUM(n_grams) AS BIGINT) AS total_distinct_grams
FROM per_doc GROUP BY source ORDER BY source
"""


def q_interarrival_expfit(sf_dir: str):
    """Exponential inter-arrival fit with an exact KS distance (the
    queueing-theory Poisson-process check): per event_type, sorted
    event timestamps give inter-arrival gaps (seconds, positive only),
    MLE rate lambda = 1/mean, and the one-sample KS statistic against
    F(x) = 1 - exp(-lambda x) via the order-statistic form
    D = max_i max(i/n - F(x_(i)), F(x_(i)) - (i-1)/n). Every quantity
    (ranks, exp expression) replays exactly in SQL."""
    import os as _os

    import ray.data as rd

    from ..util import stable_round6 as _sr6

    ev = rd.read_parquet(_os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "ts"]).to_pandas()

    from ..util import ts_to_us

    rows = []
    for k, g in ev.groupby("event_type", sort=True):
        ts = np.sort(ts_to_us(g["ts"]))
        gaps = np.diff(ts) / 1e6  # microseconds -> seconds
        gaps = gaps[gaps > 0]
        n = float(len(gaps))
        if n < 10:
            continue
        lam = n / gaps.sum()
        x = np.sort(gaps)
        f = 1.0 - np.exp(-lam * x)
        i = np.arange(1, len(x) + 1, dtype=np.float64)
        d = np.maximum(i / n - f, f - (i - 1.0) / n).max()
        rows.append({"event_type": k, "n_gaps": int(n),
                     "rate_per_s": lam, "ks_d": d})
    out = pd.DataFrame(rows)
    out["n_gaps"] = out["n_gaps"].astype("int64")
    for c in ("rate_per_s", "ks_d"):
        out[c] = _sr6(out[c].astype(float))
    return out.sort_values("event_type").reset_index(drop=True)


_SQL_EXPFIT = """
WITH ordered AS (
  SELECT event_type, ts,
         LAG(ts) OVER (PARTITION BY event_type ORDER BY ts) AS prev
  FROM events
),
gaps AS (
  SELECT event_type,
         EXTRACT(epoch FROM ts - prev) AS gap
  FROM ordered WHERE prev IS NOT NULL
    AND EXTRACT(epoch FROM ts - prev) > 0
),
lam AS (
  SELECT event_type, COUNT(*)::DOUBLE AS n,
         COUNT(*) / SUM(gap) AS lambda
  FROM gaps GROUP BY 1 HAVING COUNT(*) >= 10
),
rk AS (
  SELECT g.event_type, g.gap, lam.n, lam.lambda,
         ROW_NUMBER() OVER (PARTITION BY g.event_type ORDER BY g.gap)::DOUBLE AS i
  FROM gaps g JOIN lam USING (event_type)
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_gaps,
       ROUND(ROUND(MAX(lambda), 9), 6) AS rate_per_s,
       ROUND(ROUND(MAX(GREATEST(
           i / n - (1.0 - exp(-lambda * gap)),
           (1.0 - exp(-lambda * gap)) - (i - 1.0) / n)), 9), 6) AS ks_d
FROM rk GROUP BY event_type ORDER BY event_type
"""


# ------------------------------------------------------- domain quota cap


_QUOTA_K = 50
_QUOTA_DOMS = 97


def quota_combine_kernel(cand: pd.DataFrame, k: int = _QUOTA_K) -> pd.DataFrame:
    """Combine per-batch candidate partials: global per-domain counts
    from the attached partial counts, kept set = the k smallest doc_ids
    among candidates (each batch contributed its own k smallest, so the
    union contains the global k smallest — the partial-top-k argument)."""
    cnt = cand.groupby("dom", as_index=False).agg(n_docs=("n_docs_part", "sum"))
    kept = (cand.sort_values(["dom", "doc_id"], kind="stable")
            .groupby("dom").head(k))
    ks = kept.groupby("dom", as_index=False).agg(
        n_kept=("doc_id", "size"), kept_min_id=("doc_id", "min"),
        kept_max_id=("doc_id", "max"), kept_chars=("n_chars", "sum"))
    out = cnt.merge(ks, on="dom")
    out = out.rename(columns={"dom": "domain"})
    for c in ("domain", "n_docs", "n_kept", "kept_min_id", "kept_max_id",
              "kept_chars"):
        out[c] = out[c].astype("int64")
    return out.sort_values("domain").reset_index(drop=True)


def q_doc_domain_quota(sf_dir: str):
    """C4/CommonCrawl-style per-domain quota sampling: docs are keyed
    to a synthetic domain (bijective odd-multiplier hash of doc_id mod
    97 — the corpus has no URL column), each domain keeps its K=50
    lowest doc_ids (deterministic order), and the query reports
    per-domain totals vs kept stats. Scale shape: ONE pruned scan of
    (doc_id, n_chars) — text never moves — with per-batch vectorized
    per-domain partial top-K + counts; the combine payload is bounded
    by domains x K x blocks, domains x K after the final head-K."""
    ds = _docs(sf_dir, ["doc_id", "n_chars"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        dom = ((df["doc_id"] * 2654435761) % 2147483648) % _QUOTA_DOMS
        df = df.assign(dom=dom.astype("int64"))
        top = (df.sort_values(["dom", "doc_id"], kind="stable")
               .groupby("dom").head(_QUOTA_K))
        cnt = df.groupby("dom").size().rename("n_docs_part")
        top = top.merge(cnt, left_on="dom", right_index=True)
        # attach the batch's count to ONE row per dom so sums stay exact
        first = ~top["dom"].duplicated()
        top.loc[~first, "n_docs_part"] = 0
        return top[["dom", "doc_id", "n_chars", "n_docs_part"]]

    cand = ds.map_batches(part, batch_format="pandas").to_pandas()
    return quota_combine_kernel(cand)


_SQL_DOMAIN_QUOTA = """
WITH d AS (
  SELECT doc_id, n_chars,
         ((doc_id * 2654435761) % 2147483648) % 97 AS dom
  FROM documents
),
r AS (
  SELECT dom, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY dom ORDER BY doc_id) AS rn
  FROM d
),
agg AS (SELECT dom, COUNT(*) AS n_docs FROM d GROUP BY 1),
k AS (
  SELECT dom, COUNT(*) AS n_kept, MIN(doc_id) AS kept_min_id,
         MAX(doc_id) AS kept_max_id, CAST(SUM(n_chars) AS BIGINT) AS kept_chars
  FROM r WHERE rn <= 50 GROUP BY 1
)
SELECT agg.dom AS domain, agg.n_docs, k.n_kept, k.kept_min_id,
       k.kept_max_id, k.kept_chars
FROM agg JOIN k USING (dom) ORDER BY domain
"""


# ------------------------------------------------------------------ registry

DOC_QUERIES: dict[str, Any] = {
    "doc_domain_quota": q_doc_domain_quota,
    "doc_ngram_commonality": q_doc_ngram_commonality,
    "interarrival_expfit": q_interarrival_expfit,
    "doc_gini_length": q_doc_gini_length,
    "doc_mix_unimax": q_doc_mix_unimax,
    "embedding_label_sim": q_embedding_label_sim,
    "doc_vocab_chi2": q_doc_vocab_chi2,
    "doc_wordpiece": q_doc_wordpiece,
    "doc_good_turing": q_doc_good_turing,
    "doc_heaps_law": q_doc_heaps_law,
    "doc_token_count": q_doc_token_count,
    "doc_quality": q_doc_quality,
    "doc_langid": q_doc_langid,
    "doc_fingerprint": q_doc_fingerprint,
    "doc_winnowing": q_doc_winnowing,
    "doc_lexical_stats": q_doc_lexical_stats,
    "doc_exact_dedup": q_doc_exact_dedup,
    "doc_minhash_dups": q_doc_minhash_dups,
    "doc_minhash_dedup": q_doc_minhash_dedup,
    "doc_jaccard_blocked": q_doc_jaccard_blocked,
    "doc_simhash_dups": q_doc_simhash_dups,
    "doc_simhash_weighted": q_doc_simhash_weighted,
    "doc_heavy_hitters": q_doc_heavy_hitters,
    "embedding_topk": q_embedding_topk,
    "embedding_near_dup": q_embedding_near_dup,
    "media_decode": q_media_decode,
    "doc_pack_sequences": q_doc_pack_sequences,
    "doc_source_mix": q_doc_source_mix,
    "doc_decontaminate": q_doc_decontaminate,
    "doc_repetition": q_doc_repetition,
    "doc_pii": q_doc_pii,
    "doc_tfidf_top": q_doc_tfidf_top,
    "doc_bm25_topk": q_doc_bm25_topk,
    "embedding_mmr_topk": q_embedding_mmr_topk,
    "doc_chunk": q_doc_chunk,
    "source_vocab_divergence": q_source_vocab_divergence,
    "embedding_kmeans": q_embedding_kmeans,
    "embedding_dbscan": q_embedding_dbscan,
    "embedding_semdedup": q_embedding_semdedup,
    "doc_lm_perplexity": q_doc_lm_perplexity,
    "doc_gopher_rules": q_doc_gopher_rules,
    "doc_mix_temperature": q_doc_mix_temperature,
    "doc_ccnet_buckets": q_doc_ccnet_buckets,
    "embedding_cov": q_embedding_cov,
    "embedding_label_compactness": q_embedding_label_compactness,
    "embedding_pca": q_embedding_pca,
    "doc_dsir": q_doc_dsir,
    "doc_dup_spans": q_doc_dup_spans,
    "source_ks_drift": q_source_ks_drift,
    "doc_segment_dedup": q_doc_segment_dedup,
    "jsonl_ingest": q_jsonl_ingest,
    "doc_sample_hash": q_doc_sample_hash,
    "doc_sample_neyman": q_doc_sample_neyman,
    "embedding_iforest": q_embedding_iforest,
    "source_welch_ttest": q_source_welch_ttest,
    "doc_global_shuffle": q_doc_global_shuffle,
    "doc_normalize": q_doc_normalize,
    "doc_dedup_normalized": q_doc_dedup_normalized,
    "doc_quality_classifier": q_doc_quality_classifier,
    "doc_bpe_merges": q_doc_bpe_merges,
    "doc_word_freqs": q_doc_word_freqs,
    "doc_bpe_encode": q_doc_bpe_encode,
    "doc_zipf_fit": q_doc_zipf_fit,
    "doc_top_ngrams": q_doc_top_ngrams,
    "doc_lm_kneser_ney": q_doc_lm_kneser_ney,
    "embedding_jl": q_embedding_jl,
    "doc_cms_counts": q_doc_cms_counts,
    "doc_bloom_probe": q_doc_bloom_probe,
    "source_vocab_jaccard": q_source_vocab_jaccard,
    "doc_split_assign": q_doc_split_assign,
    "doc_reservoir_sample": q_doc_reservoir_sample,
    "doc_unigram_tokenizer": q_doc_unigram_tokenizer,
    "doc_unigram_fertility": q_doc_unigram_fertility,
    "embedding_kcenter": q_embedding_kcenter,
    "embedding_quantize_int8": q_embedding_quantize_int8,
    "embedding_morton": q_embedding_morton,
}

DOC_ORACLE: dict[str, str] = {
    "doc_domain_quota": _SQL_DOMAIN_QUOTA,
    "doc_word_freqs": _SQL_WORD_FREQS,
    "doc_good_turing": _SQL_GOOD_TURING,
    "doc_mix_unimax": _SQL_UNIMAX,
    "embedding_label_sim": _SQL_LABEL_SIM,
    "doc_vocab_chi2": _SQL_VOCAB_CHI2,
    "doc_gini_length": _SQL_GINI_LENGTH,
    "doc_ngram_commonality": _SQL_NGRAM_COMMONALITY,
    "interarrival_expfit": _SQL_EXPFIT,
    "doc_heaps_law": _SQL_HEAPS_LAW,
    "doc_heavy_hitters": _SQL_HEAVY_HITTERS,
    "doc_token_count": _SQL_TOKEN_COUNT,
    "doc_quality": _SQL_QUALITY,
    "doc_langid": _SQL_LANGID,
    "doc_fingerprint": _SQL_FINGERPRINT,
    "doc_winnowing": _SQL_WINNOWING,
    "doc_lexical_stats": _SQL_LEXICAL_STATS,
    "doc_exact_dedup": _SQL_EXACT_DEDUP,
    "doc_minhash_dups": _SQL_MINHASH,
    "doc_minhash_dedup": _SQL_MINHASH_DEDUP,
    "doc_jaccard_blocked": _SQL_JACCARD_BLOCKED,
    # doc_simhash_dups: probabilistic signature — rows-only check
    "embedding_topk": _SQL_TOPK,
    "embedding_near_dup": _SQL_NEAR_DUP,
    "media_decode": _SQL_MEDIA,
    "doc_pack_sequences": _SQL_PACK,
    "doc_source_mix": _SQL_SOURCE_MIX,
    "doc_decontaminate": _SQL_DECONTAM,
    "doc_repetition": _SQL_REPETITION,
    "doc_pii": _SQL_PII,
    "doc_tfidf_top": _SQL_TFIDF,
    "doc_bm25_topk": _SQL_BM25,
    "doc_chunk": _SQL_CHUNK,
    "source_vocab_divergence": _SQL_VOCAB_DIV,
    "embedding_kmeans": _SQL_KMEANS,
    "embedding_dbscan": _SQL_DBSCAN,
    "embedding_semdedup": _SQL_SEMDEDUP,
    "doc_lm_perplexity": _SQL_LM_PPL,
    "doc_gopher_rules": _SQL_GOPHER_RULES,
    "doc_mix_temperature": _SQL_MIX_TEMPERATURE,
    "doc_ccnet_buckets": _SQL_CCNET_BUCKETS,
    "embedding_cov": _SQL_EMBEDDING_COV,
    "embedding_label_compactness": _SQL_LABEL_COMPACT,
    "doc_dsir": _SQL_DSIR,
    "doc_dup_spans": _SQL_DUP_SPANS,
    "source_ks_drift": _SQL_KS_DRIFT,
    "doc_segment_dedup": _SQL_SEGMENT_DEDUP,
    "jsonl_ingest": _SQL_JSONL_INGEST,
    "doc_sample_hash": _SQL_SAMPLE_HASH,
    "doc_sample_neyman": _SQL_SAMPLE_NEYMAN,
    "source_welch_ttest": _SQL_WELCH,
    "doc_global_shuffle": _SQL_GLOBAL_SHUFFLE,
    "doc_normalize": _SQL_NORMALIZE,
    "doc_dedup_normalized": _SQL_DEDUP_NORMALIZED,
    "doc_zipf_fit": _SQL_ZIPF_FIT,
    "doc_top_ngrams": _SQL_TOP_NGRAMS,
    "doc_lm_kneser_ney": _SQL_LM_KN,
    "embedding_jl": _SQL_EMBEDDING_JL,
    "doc_cms_counts": _SQL_CMS_COUNTS,
    "doc_bloom_probe": _SQL_BLOOM_PROBE,
    "source_vocab_jaccard": _SQL_VOCAB_JACCARD,
    "doc_split_assign": _SQL_SPLIT_ASSIGN,
    "doc_reservoir_sample": _SQL_RESERVOIR,
    "embedding_quantize_int8": _SQL_QUANTIZE_INT8,
    "embedding_morton": _SQL_MORTON,
}
