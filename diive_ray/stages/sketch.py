"""Heavy hitters over a 100-TB text/token stream: Misra-Gries sketch
with an exact second pass.

The exchange-based exact word count (one all-to-all on the token key)
is the obvious plan and is what the SQL oracle does — but at corpus
scale the token key space is huge and the full exchange moves one row
per DISTINCT token per block. The sketch path never shuffles the token
space at all:

1. **Per-batch Misra-Gries summary** (bounded ``capacity`` entries):
   vectorized token counts for the batch, then the classic decrement —
   subtract the smallest delta that brings the summary under capacity
   and drop non-positive entries. Each batch emits <= capacity
   (token, cnt) rows.
2. **Hierarchical merge**: the summary rows are a Dataset; repartition
   to a few blocks and MG-merge each block (sum counts per token, then
   decrement to capacity), then one driver-side final merge of the
   per-block summaries. MG summaries are mergeable (Agarwal et al.,
   "Mergeable Summaries", PODS'12): the merged summary keeps the
   guarantee that any token with true count > N/(capacity+1) survives,
   so with capacity >> k * (N / count_of_kth) the true top-k is a
   subset of the candidates.
3. **Exact verify pass**: broadcast the candidate set (<= capacity
   tokens), count ONLY candidates per batch (vectorized isin), sum the
   per-batch partials driver-side (bounded by capacity rows), exact
   top-k with a deterministic (count DESC, token ASC) tie-break.

The final counts are EXACT (pass 3 recounts), which is why the op can
carry a plain SQL oracle despite using a sketch: the sketch only
bounds which tokens get recounted.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import ray.data as rd

from .exchange import driver_combine


def tokenize_batch(texts: pd.Series) -> pd.Series:
    """Lowercase whitespace tokens, exploded (the oracle's
    string_split_regex(lower(text), '\\s+') minus empties)."""
    toks = texts.astype(str).str.lower().str.split()
    return toks.explode().dropna()


def mg_decrement(tokens: np.ndarray, counts: np.ndarray, capacity: int):
    """Classic Misra-Gries shrink: if more than ``capacity`` entries,
    subtract the (capacity+1)-th largest count from all and drop
    non-positive entries. Returns (tokens, counts) sorted by token."""
    if len(tokens) <= capacity:
        order = np.argsort(tokens, kind="stable")
        return tokens[order], counts[order]
    kth = np.partition(counts, len(counts) - capacity - 1)[len(counts) - capacity - 1]
    keep = counts > kth
    tokens, counts = tokens[keep], counts[keep] - kth
    order = np.argsort(tokens, kind="stable")
    return tokens[order], counts[order]


def _mg_of_frame(tok: pd.Series, capacity: int) -> pd.DataFrame:
    vc = tok.value_counts()
    t, c = mg_decrement(
        vc.index.to_numpy(dtype=object), vc.to_numpy(dtype=np.int64), capacity
    )
    return pd.DataFrame({"token": t, "cnt": c})


def _mg_merge_frame(df: pd.DataFrame, capacity: int) -> pd.DataFrame:
    g = df.groupby("token", sort=False, as_index=False)["cnt"].sum()
    t, c = mg_decrement(
        g["token"].to_numpy(dtype=object), g["cnt"].to_numpy(dtype=np.int64), capacity
    )
    return pd.DataFrame({"token": t, "cnt": c})


def heavy_hitters(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    k: int = 20,
    capacity: int = 4096,
    merge_blocks: int = 4,
    tokenizer: Callable[[pd.Series], pd.Series] = tokenize_batch,
) -> pd.DataFrame:
    """Exact top-k tokens via MG candidates + exact recount. Returns a
    k-row frame (token, cnt) ordered by (cnt DESC, token ASC). Exact
    whenever every true top-k token has count > N/(capacity+1) — the
    caller sizes capacity for its corpus shape (Zipfian text needs only
    capacity >> k)."""

    def pass1(df: pd.DataFrame) -> pd.DataFrame:
        return _mg_of_frame(tokenizer(df[text_col]), capacity)

    summaries = ds.map_batches(pass1, batch_format="pandas")
    merged = summaries.repartition(merge_blocks).map_batches(
        lambda df: _mg_merge_frame(df, capacity), batch_format="pandas"
    )
    final = _mg_merge_frame(merged.to_pandas(), capacity)
    candidates = set(final["token"].tolist())

    def pass2(df: pd.DataFrame) -> pd.DataFrame:
        tok = tokenizer(df[text_col])
        tok = tok[tok.isin(candidates)]
        vc = tok.value_counts()
        return pd.DataFrame(
            {"token": vc.index.to_numpy(dtype=object), "cnt": vc.to_numpy(np.int64)}
        )

    exact = driver_combine(
        ds,
        pass2,
        lambda df: df.groupby("token", as_index=False)["cnt"].sum(),
        batch_format="pandas",
    )
    exact = exact.sort_values(
        ["cnt", "token"], ascending=[False, True], kind="stable"
    ).head(k)
    exact["cnt"] = exact["cnt"].astype(np.int64)
    return exact.reset_index(drop=True)


# ----------------------------------------------------------- t-digest

"""Mergeable quantile sketch: merging t-digest (Dunning & Ertl,
"Computing extremely accurate quantiles using t-digests", public
algorithm). Closes the scale path documented on q_percentiles101: the
exact per-key percentile ladder needs the whole key group on one
worker; the digest path keeps a bounded O(delta) summary per key that
merges associatively — per-batch partials, no shuffle of the value
space, driver combine sees keys x O(delta) centroids."""


def _k1(q: np.ndarray | float, delta: float) -> np.ndarray | float:
    """k1 scale function: k(q) = delta/(2*pi) * asin(2q - 1) — tight
    centroids at the tails, coarse at the median."""
    return delta / (2.0 * np.pi) * np.arcsin(2.0 * np.clip(q, 0.0, 1.0) - 1.0)


def _k1_inv(k: float, delta: float) -> float:
    return float((np.sin(2.0 * np.pi * k / delta) + 1.0) / 2.0)


def tdigest_compress(
    means: np.ndarray, weights: np.ndarray, delta: float = 100.0
) -> tuple[np.ndarray, np.ndarray]:
    """Merge (means, weights) centroids (or raw values with unit
    weights) into <= ~2*delta centroids respecting the k1 size bound.
    O(n log n) sort + O(delta) searchsorted steps — no per-value
    Python. Deterministic."""
    if len(means) == 0:
        return means.astype(np.float64), weights.astype(np.float64)
    order = np.argsort(means, kind="stable")
    m = means[order].astype(np.float64)
    w = weights[order].astype(np.float64)
    cw = np.cumsum(w)
    cwm = np.cumsum(w * m)
    total = cw[-1]
    q_right = cw / total
    out_m, out_w = [], []
    idx = 0
    q0 = 0.0
    n = len(m)
    while idx < n:
        q1 = _k1_inv(_k1(q0, delta) + 1.0, delta)
        j = int(np.searchsorted(q_right, q1, side="right")) - 1
        j = max(j, idx)  # always make progress (>= one value)
        lo_cw = cw[idx - 1] if idx else 0.0
        lo_cwm = cwm[idx - 1] if idx else 0.0
        cw_j = cw[j] - lo_cw
        out_m.append((cwm[j] - lo_cwm) / cw_j)
        out_w.append(cw_j)
        q0 = cw[j] / total
        idx = j + 1
    return np.asarray(out_m), np.asarray(out_w)


def tdigest_quantile(
    means: np.ndarray, weights: np.ndarray, vmin: float, vmax: float,
    qs: np.ndarray,
) -> np.ndarray:
    """Quantile estimates from a compressed digest: linear
    interpolation between centroid midpoints in cumulative-weight
    space, clamped by the exact (vmin, vmax)."""
    qs = np.asarray(qs, dtype=np.float64)
    if len(means) == 0:
        return np.full(len(qs), np.nan)
    total = weights.sum()
    # centroid midpoints in cumulative weight
    cum = np.cumsum(weights) - weights / 2.0
    xs = np.concatenate(([0.0], cum, [total]))
    ys = np.concatenate(([vmin], means, [vmax]))
    return np.interp(qs * total, xs, ys)


def quantile_sketch(
    ds: rd.Dataset,
    *,
    value_col: str,
    keys: list[str],
    qs: list[float],
    delta: float = 200.0,
) -> pd.DataFrame:
    """Per-key approximate quantiles via ONE combiner pass (no
    exchange): each batch emits its keys' compressed digests as
    (key..., means, weights, vmin, vmax, n) rows; the driver merges the
    bounded partials (concat centroids -> one more compress) and
    evaluates ``qs``. Returns one row per (key, q). Rank error is
    O(q(1-q)/delta) (Dunning & Ertl) — pinned in tests against exact
    quantiles."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for kv, g in df.groupby(keys, sort=False):
            v = g[value_col].astype(float).dropna().to_numpy()
            if not len(v):
                continue
            m, w = tdigest_compress(v, np.ones(len(v)), delta)
            kd = dict(zip(keys, kv if isinstance(kv, tuple) else (kv,)))
            rows.append({**kd, "means": m, "weights": w,
                         "vmin": float(v.min()), "vmax": float(v.max()),
                         "n": len(v)})
        if not rows:
            return pd.DataFrame(columns=[*keys, "means", "weights", "vmin", "vmax", "n"])
        return pd.DataFrame(rows)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df  # merge happens once, below (partials are bounded)

    partials = driver_combine(ds, partial, combine, batch_format="pandas")
    out_rows = []
    for kv, g in partials.groupby(keys, sort=True):
        m = np.concatenate([np.asarray(x, dtype=np.float64) for x in g["means"]])
        w = np.concatenate([np.asarray(x, dtype=np.float64) for x in g["weights"]])
        m, w = tdigest_compress(m, w, delta)
        vals = tdigest_quantile(
            m, w, float(g["vmin"].min()), float(g["vmax"].max()),
            np.asarray(qs),
        )
        kd = dict(zip(keys, kv if isinstance(kv, tuple) else (kv,)))
        for q, v in zip(qs, vals):
            out_rows.append({**kd, "q": float(q), "value": float(v)})
    return pd.DataFrame(out_rows)


# ------------------------------------------------------------- HyperLogLog
# (Flajolet et al. 2007, "HyperLogLog: the analysis of a near-optimal
# cardinality estimation algorithm"; small-range correction via linear
# counting as in the original paper / Heule 2013 practical notes.)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — a public-domain 64-bit mixer
    (Steele/Lea/Flajolet lineage) with full avalanche; good enough for
    HLL register assignment."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def hll_partial(values: np.ndarray, p: int = 12) -> np.ndarray:
    """One batch -> uint8 register array of size 2**p (max rho per
    register). Fully vectorized: hash, split into (register index,
    leading-zero rank of the remaining 64-p bits), np.maximum.at."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = _splitmix64(np.asarray(values).astype(np.uint64))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad low bits with 1s
    # rho = leading zeros of `rest` + 1, in [1, 64-p+1]
    nbits = 64 - np.floor(np.log2(rest.astype(np.float64)) + 1e-15).astype(np.int64) - 1
    # float log2 is exact for leading-bit position (value >= 2^52 here)
    rho = (nbits + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected estimate with the original small/large range
    corrections (linear counting below 2.5m; 64-bit hashes make the
    large-range correction unnecessary in practice)."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}[m]
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        return float(m * np.log(m / zeros))
    return float(est)


def hll_distinct(
    ds,
    *,
    value_col: str,
    keys: "list[str] | None" = None,
    p: int = 12,
) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT value_col) [per keys] via mergeable
    HyperLogLog registers — the 100-TB path for cardinality: each batch
    emits one (keys, 2**p-byte register row); the driver combine is an
    elementwise max over ≤ #batches x #key-combos tiny rows. NO shuffle
    touches the value space (an exact distinct is an all-to-all on the
    full key+value projection). Standard error ~1.04/sqrt(2**p)
    (~1.6% at p=12). Returns (keys..., n_distinct_est)."""
    from .exchange import driver_combine

    gkeys = list(keys or [])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vals = df[value_col].to_numpy()
        if gkeys:
            rows = []
            for kv, g in df.groupby(gkeys, sort=False):
                kv = kv if isinstance(kv, tuple) else (kv,)
                regs = hll_partial(g[value_col].to_numpy(), p)
                rows.append({**dict(zip(gkeys, kv)), "regs": regs.tobytes()})
            return pd.DataFrame(rows)
        return pd.DataFrame([{"regs": hll_partial(vals, p).tobytes()}])

    def combine(parts: pd.DataFrame) -> pd.DataFrame:
        if parts.empty:
            return pd.DataFrame({**{k: [] for k in gkeys}, "n_distinct_est": []})
        def merge(group: pd.DataFrame) -> float:
            regs = np.zeros(1 << p, dtype=np.uint8)
            for b in group["regs"]:
                np.maximum(regs, np.frombuffer(b, dtype=np.uint8), out=regs)
            return hll_estimate(regs)
        if gkeys:
            out = parts.groupby(gkeys, sort=True).apply(merge, include_groups=False).rename("n_distinct_est").reset_index()
        else:
            out = pd.DataFrame({"n_distinct_est": [merge(parts)]})
        return out

    return driver_combine(ds, partial, combine, batch_format="pandas")


# --------------------------------------------------------- count-min sketch

CMS_ROWS = ((131, 0), (8191, 17), (524287, 1009), (1299709, 65537))
CMS_WIDTH = 1024
_CMS_MOD = 2**31 - 1  # functions/text.py FP_MOD


def cms_buckets(hashes: np.ndarray) -> np.ndarray:
    """(n, R) bucket indices from word hashes via the pairwise-
    independent family ((a*h + b) mod p) mod W (Cormode & Muthukrishnan
    2005). All int64-safe (a < 2^21, h < 2^31) so the SQL oracle
    replays bit-for-bit."""
    h = np.asarray(hashes, dtype=np.int64)[:, None]
    a = np.array([r[0] for r in CMS_ROWS], dtype=np.int64)[None, :]
    b = np.array([r[1] for r in CMS_ROWS], dtype=np.int64)[None, :]
    return ((h * a + b) % np.int64(_CMS_MOD)) % np.int64(CMS_WIDTH)


def cms_build(ds: rd.Dataset, *, text_col: str = "text") -> np.ndarray:
    """Count-min sketch of corpus word frequencies: per-batch distinct
    words -> vectorized hash (functions/text.py:word_poly_hashes) ->
    per-row bincount partials of FIXED O(R*W) size; ONE driver combine
    sums them (CMS is mergeable by construction — the 100-TB path is
    this exact pass at any scale). Returns the (R, W) int64 table."""
    from ..functions.text import word_poly_hashes
    from .textstats import _split_words

    def partial(t) -> pd.DataFrame:
        words, _ = _split_words(t[text_col])
        if not len(words):
            return pd.DataFrame({"r": pd.Series([], dtype=np.int64),
                                 "bkt": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64)})
        uniq, counts = np.unique(words, return_counts=True)
        buckets = cms_buckets(word_poly_hashes(uniq))
        frames = []
        for r in range(len(CMS_ROWS)):
            acc = np.bincount(buckets[:, r], weights=counts, minlength=CMS_WIDTH)
            nz = np.nonzero(acc)[0]
            frames.append(pd.DataFrame({
                "r": np.full(len(nz), r, dtype=np.int64),
                "bkt": nz.astype(np.int64),
                "n": acc[nz].astype(np.int64),
            }))
        return pd.concat(frames, ignore_index=True)

    def combine(parts: pd.DataFrame) -> pd.DataFrame:
        return parts.groupby(["r", "bkt"], as_index=False)["n"].sum()

    flat = driver_combine(ds, partial, combine)
    cms = np.zeros((len(CMS_ROWS), CMS_WIDTH), dtype=np.int64)
    cms[flat["r"].to_numpy(), flat["bkt"].to_numpy()] = flat["n"].to_numpy()
    return cms


def cms_estimate(cms: np.ndarray, words: np.ndarray) -> np.ndarray:
    """Point estimates: min over rows (never under-estimates)."""
    from ..functions.text import word_poly_hashes

    buckets = cms_buckets(word_poly_hashes(np.asarray(words, dtype=object)))
    rows = np.arange(len(CMS_ROWS), dtype=np.int64)[None, :]
    return cms[rows, buckets].min(axis=1).astype(np.int64)


# ------------------------------------------------------------- Bloom filter

BLOOM_BITS = 1 << 17
BLOOM_K = 4


def bloom_positions(fp: np.ndarray) -> np.ndarray:
    """(n, K) bit positions by Kirsch-Mitzenmacher double hashing
    pos_i = (h1 + i*h2) mod M with h2 a second multiplicative hash of
    the fingerprint — int64-safe and SQL-replayable."""
    h1 = np.asarray(fp, dtype=np.int64)[:, None]
    h2 = (h1 * np.int64(2654435761)) % np.int64(_CMS_MOD)
    i = np.arange(BLOOM_K, dtype=np.int64)[None, :]
    return (h1 + i * h2) % np.int64(BLOOM_BITS)


def bloom_build(ds: rd.Dataset, *, text_col: str = "text") -> np.ndarray:
    """Bloom filter over document content fingerprints: per-batch
    DISTINCT bit positions (bounded by M) -> ONE driver union -> a
    16 KiB bitmap. The standard incremental-dedup primitive: build on
    the existing corpus once, broadcast, probe every new shard with a
    stateless vectorized map — no shuffle touches the corpus."""
    from ..functions.text import polynomial_fingerprint

    def partial(t) -> pd.DataFrame:
        texts = t[text_col].to_pylist()
        if not texts:
            return pd.DataFrame({"pos": pd.Series([], dtype=np.int64)})
        pos = bloom_positions(polynomial_fingerprint(texts)).ravel()
        return pd.DataFrame({"pos": np.unique(pos)})

    def combine(parts: pd.DataFrame) -> pd.DataFrame:
        return parts.drop_duplicates("pos")

    pos = driver_combine(ds, partial, combine)["pos"].to_numpy()
    bits = np.zeros(BLOOM_BITS, dtype=bool)
    bits[pos] = True
    return bits


def bloom_probe(
    ds: rd.Dataset,
    bits: np.ndarray,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Membership probe: in_bloom = every one of the K positions set.
    No false negatives by construction; the false-positive rate at
    load n/M follows the standard (1 - e^(-Kn/M))^K curve. The bitmap
    ships once via ``ray.put``."""
    import ray

    from ..functions.text import polynomial_fingerprint

    bits_ref = ray.put(bits)

    def probe(t) -> pd.DataFrame:
        bm = ray.get(bits_ref)
        texts = t[text_col].to_pylist()
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if not texts:
            return pd.DataFrame({id_col: ids,
                                 "in_bloom": pd.Series([], dtype=np.int64)})
        pos = bloom_positions(polynomial_fingerprint(texts))
        return pd.DataFrame({
            id_col: ids,
            "in_bloom": bm[pos].all(axis=1).astype(np.int64),
        })

    return ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
