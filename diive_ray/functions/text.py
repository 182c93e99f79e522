"""Vectorized text-analysis kernels for the documents pipeline.

These are the per-batch functions used by the large-scale training-data
stages (dedup, quality filtering, language ID, fingerprinting). The
reference has no text processing — these are engine additions required
by the 100 TB training-data mission (driver brief) — but they follow the
reference's *flag/score column* convention (parallel derived columns,
cf. diive/core/base/flagbase.py:87-94) and its deterministic seeded-test
strategy (SURVEY.md §5).

Design rules:
* every kernel is batch-vectorized (pyarrow.compute regex kernels or
  numpy over dictionary-encoded words) — no per-row Python in hot paths
  except bounded per-doc numpy reductions,
* every hash is an explicit, seeded, portable function (no builtin
  ``hash``), so results are reproducible across processes and match the
  DuckDB oracle SQL where one exists.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# BPE-ish token regex: letter runs | digit runs | single non-space symbol
# (same class expression used in the DuckDB oracle).
BPE_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"
PUNCT_RE = r"[^a-zA-Z0-9\s]"
DIGIT_RE = r"[0-9]"
WS_SPLIT_RE = r"\s+"

# Tiny embedded stopword profiles for the n-gram/stopword language
# heuristic (public common-word lists; heuristic only — a real deploy
# would swap in fastText & friends behind the same stage signature).
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "y", "que", "en", "un", "una", "es", "por"),
    "de": ("der", "die", "das", "und", "zu", "den", "von", "ist", "mit", "nicht"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "est", "que"),
}

FP_MOD = 2**31 - 1  # Mersenne prime modulus of the polynomial fingerprint
FP_BASE = 31

MINHASH_PRIME = (1 << 61) - 1


def word_counts(texts: pa.Array) -> pa.Array:
    """Whitespace token count per doc (int64), Arrow-kernel vectorized."""
    trimmed = pc.utf8_trim_whitespace(texts)
    n_ws = pc.count_substring_regex(trimmed, WS_SPLIT_RE)
    nonempty = pc.greater(pc.utf8_length(trimmed), 0)
    return pc.if_else(nonempty, pc.add(n_ws, 1), pa.scalar(0, pa.int32())).cast(pa.int64())


def bpe_token_counts(texts: pa.Array) -> pa.Array:
    """BPE-ish token count per doc (regex token classes, int64)."""
    return pc.count_substring_regex(texts, BPE_TOKEN_RE).cast(pa.int64())


def regex_match_counts(texts: pa.Array, pattern: str) -> pa.Array:
    return pc.count_substring_regex(texts, pattern).cast(pa.int64())


def stopword_hit_counts(texts: pa.Array, words: tuple[str, ...]) -> pa.Array:
    """Count of whole-word stopword hits (case-insensitive)."""
    pat = r"\b(?i:(?:" + "|".join(words) + r"))\b"
    return pc.count_substring_regex(texts, pat).cast(pa.int64())


def quality_features(texts: pa.Array) -> dict[str, np.ndarray]:
    """Length / punctuation / digit / stopword ratios + mean word length
    (the classic Gopher/C4-style quality heuristics, computed with Arrow
    regex kernels)."""
    n_chars = pc.utf8_length(texts).cast(pa.int64()).to_numpy(zero_copy_only=False)
    n_words = word_counts(texts).to_numpy(zero_copy_only=False)
    n_punct = regex_match_counts(texts, PUNCT_RE).to_numpy(zero_copy_only=False)
    n_digit = regex_match_counts(texts, DIGIT_RE).to_numpy(zero_copy_only=False)
    n_stop = stopword_hit_counts(texts, STOPWORDS["en"]).to_numpy(zero_copy_only=False)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean_word_len = np.where(n_words > 0, (n_chars - (n_words - 1).clip(min=0)) / np.maximum(n_words, 1), 0.0)
        punct_ratio = np.where(n_chars > 0, n_punct / np.maximum(n_chars, 1), 0.0)
        digit_ratio = np.where(n_chars > 0, n_digit / np.maximum(n_chars, 1), 0.0)
        stop_ratio = np.where(n_words > 0, n_stop / np.maximum(n_words, 1), 0.0)
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "punct_ratio": punct_ratio,
        "digit_ratio": digit_ratio,
        "stopword_ratio": stop_ratio,
    }


#: Gopher's required-stopword list (Rae et al. 2021 "Scaling Language
#: Models" Table A1: a doc must contain >= 2 of these 8 words).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    texts: pa.Array,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stopwords: int = 2,
) -> dict[str, np.ndarray]:
    """Gopher document-quality rule battery (Rae et al. 2021 Table A1),
    Arrow-regex vectorized. Returns per-doc features, one boolean per
    rule, and the AND-combined ``keep``. Line-level rules (bullet /
    ellipsis line fractions) are omitted: the engine's documents are
    single-line word streams; they'd slot in as two more regex counts.
    Defaults are the paper's thresholds; callers tune them per corpus."""
    n_chars = pc.utf8_length(texts).cast(pa.int64()).to_numpy(zero_copy_only=False)
    n_words = word_counts(texts).to_numpy(zero_copy_only=False)
    # '#' occurrences + '...' runs per word (Gopher's symbol-to-word ratio)
    n_sym = pc.add(
        regex_match_counts(texts, r"#"), regex_match_counts(texts, r"\.\.\.")
    ).cast(pa.int64()).to_numpy(zero_copy_only=False)
    # words containing at least one alphabetic character
    n_alpha_words = regex_match_counts(
        texts, r"[^ ]*[a-zA-Z][^ ]*"
    ).to_numpy(zero_copy_only=False)
    # how many DISTINCT required stopwords appear at least once
    n_stop_distinct = np.zeros(len(n_words), dtype=np.int64)
    for w in GOPHER_STOPWORDS:
        hit = pc.greater(
            pc.count_substring_regex(texts, rf"\b{w}\b"), 0
        ).to_numpy(zero_copy_only=False)
        n_stop_distinct += hit.astype(np.int64)
    with np.errstate(invalid="ignore", divide="ignore"):
        mean_word_len = np.where(
            n_words > 0,
            (n_chars - (n_words - 1).clip(min=0)) / np.maximum(n_words, 1), 0.0,
        )
        symbol_ratio = np.where(n_words > 0, n_sym / np.maximum(n_words, 1), 0.0)
        alpha_frac = np.where(n_words > 0, n_alpha_words / np.maximum(n_words, 1), 0.0)
    r_words = (n_words >= min_words) & (n_words <= max_words)
    r_mwl = (mean_word_len >= min_mean_word_len) & (mean_word_len <= max_mean_word_len)
    r_sym = symbol_ratio <= max_symbol_ratio
    r_alpha = alpha_frac >= min_alpha_word_frac
    r_stop = n_stop_distinct >= min_stopwords
    return {
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "symbol_ratio": symbol_ratio,
        "alpha_word_frac": alpha_frac,
        "n_stop_distinct": n_stop_distinct,
        "rule_word_count": r_words,
        "rule_mean_word_len": r_mwl,
        "rule_symbol_ratio": r_sym,
        "rule_alpha_words": r_alpha,
        "rule_stopwords": r_stop,
        "keep": r_words & r_mwl & r_sym & r_alpha & r_stop,
    }


def quality_score(feat: dict[str, np.ndarray]) -> np.ndarray:
    """Deterministic 0..1 quality score from the feature dict: product of
    clamped sub-scores (word count in [5, 10000], mean word len in
    [2, 12], punct ratio <= 0.2, stopword ratio >= 0.01)."""
    s_len = np.clip(feat["n_words"] / 5.0, 0.0, 1.0) * np.clip((10_000 - feat["n_words"]) / 5_000.0, 0.0, 1.0)
    s_wl = ((feat["mean_word_len"] >= 2.0) & (feat["mean_word_len"] <= 12.0)).astype(np.float64)
    s_punct = np.clip((0.2 - feat["punct_ratio"]) / 0.2, 0.0, 1.0)
    s_stop = np.clip(feat["stopword_ratio"] / 0.01, 0.0, 1.0)
    return s_len * s_wl * s_punct * s_stop


def langid_scores(texts: pa.Array) -> dict[str, np.ndarray]:
    """Per-language stopword-hit ratio (hits / words)."""
    n_words = np.maximum(word_counts(texts).to_numpy(zero_copy_only=False), 1)
    return {
        lang: stopword_hit_counts(texts, words).to_numpy(zero_copy_only=False) / n_words
        for lang, words in STOPWORDS.items()
    }


def langid_best(texts: pa.Array, min_ratio: float = 0.05) -> tuple[np.ndarray, np.ndarray]:
    """(lang, score): argmax language by stopword ratio; 'und' when the
    best ratio < min_ratio. Ties resolved by fixed language order."""
    scores = langid_scores(texts)
    langs = list(scores.keys())
    mat = np.stack([scores[l] for l in langs])  # [lang, doc]
    best_idx = np.argmax(mat, axis=0)  # first max wins -> fixed order tie-break
    best_score = mat[best_idx, np.arange(mat.shape[1])]
    lang_arr = np.array(langs, dtype=object)[best_idx]
    lang_arr = np.where(best_score >= min_ratio, lang_arr, "und")
    return lang_arr, best_score


# ------------------------------------------------------------ fingerprints


def polynomial_fingerprint(texts: list[str] | np.ndarray) -> np.ndarray:
    """Rolling polynomial hash of the full text: h = sum(codepoint_i *
    BASE^(n-1-i)) mod (2^31-1). Horner-equivalent, computed vectorized
    per doc via precomputed powers over Unicode CODE POINTS, exactly
    matching the DuckDB oracle ``list_reduce(list_prepend(0,
    list_transform(string_split(text, ''), c -> ascii(c))),
    (h, c) -> (h*31 + c) % 2147483647)`` (ascii() = code point)."""
    arrs = [np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.int64) for t in texts]
    maxlen = max((len(a) for a in arrs), default=0)
    pows = np.ones(maxlen, dtype=np.int64)
    for i in range(1, maxlen):
        pows[i] = (pows[i - 1] * FP_BASE) % FP_MOD
    out = np.zeros(len(arrs), dtype=np.int64)
    for i, a in enumerate(arrs):
        n = len(a)
        if n == 0:
            continue
        # mod each term first (term < 2^21 * 2^31 = 2^52), then the sum
        # of n terms each < 2^31 stays in int64 for any realistic n
        out[i] = int(np.sum((a * pows[:n][::-1]) % FP_MOD) % FP_MOD)
    return out


def word_poly_hashes(words: np.ndarray) -> np.ndarray:
    """Per-WORD rolling polynomial hash, fully vectorized across the
    word array: the words are viewed as one fixed-width padded Unicode
    code-point matrix (numpy 'U' dtype layout, zero padding) and the
    Horner recursion runs column-wise with a pad mask (real chars are
    never NUL). Value-identical to ``polynomial_fingerprint`` applied
    word-by-word (test-pinned) and to the DuckDB char-list_reduce
    oracle — but O(max_word_len) vector ops instead of a Python loop
    per word."""
    words = np.asarray(words, dtype="U")
    if not len(words):
        return np.empty(0, dtype=np.int64)
    width = words.dtype.itemsize // 4
    mat = words.view(np.uint32).reshape(len(words), width).astype(np.int64)
    h = np.zeros(len(words), dtype=np.int64)
    for c in range(width):
        cp = mat[:, c]
        upd = (h * FP_BASE + cp) % FP_MOD
        h = np.where(cp > 0, upd, h)
    return h


def _fnv1a_bytes(data: bytes) -> np.uint64:
    h = np.uint64(0xCBF29CE484222325)
    prime = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for b in data:
            h = (h ^ np.uint64(b)) * prime
    return h


def word_hashes(words: np.ndarray, seed: int = 0) -> np.ndarray:
    """uint64 hash per word, via dictionary-encoding: FNV-1a runs once
    per *distinct* word, then scatters — the vectorization strategy for
    shingle hashing at scale."""
    uniq, inv = np.unique(words, return_inverse=True)
    with np.errstate(over="ignore"):
        uh = np.array(
            [_fnv1a_bytes(w.encode("utf-8")) ^ np.uint64(seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF) for w in uniq],
            dtype=np.uint64,
        )
    return uh[inv]


def shingle_hashes(text: str, k: int = 3, seed: int = 0) -> np.ndarray:
    """Distinct uint64 hashes of the k-word shingles of ``text``.
    Shingle hash = mixed combination of the k word hashes (vectorized
    over all shingles at once). Docs with fewer than k words have an
    EMPTY shingle set (matching the SQL oracle's
    ``list_transform(range(len(w)-k+1), ...)`` semantics)."""
    words = np.array(text.split(), dtype=object)
    if len(words) < k:
        return np.array([], dtype=np.uint64)
    wh = word_hashes(words, seed)
    n = len(wh) - k + 1
    with np.errstate(over="ignore"):
        acc = np.zeros(n, dtype=np.uint64)
        mult = np.uint64(0xC2B2AE3D27D4EB4F)
        for j in range(k):
            end = j + n
            acc = (acc * mult) ^ wh[j:end]
        acc ^= acc >> np.uint64(33)
        acc = acc * np.uint64(0xFF51AFD7ED558CCD)
        acc ^= acc >> np.uint64(33)
    return np.unique(acc)


def batch_shingle_hashes(texts: list[str], k: int = 3, seed: int = 0) -> list[np.ndarray]:
    """Shingle-hash sets for a whole batch at once: one global
    dictionary-encode over every word in the batch (FNV runs once per
    DISTINCT word in the batch, not per word per doc), then the
    vectorized k-gram mix per doc. Identical output to
    ``[shingle_hashes(t, k, seed) for t in texts]`` (test-pinned)."""
    words_per_doc = [t.split() for t in texts]
    all_words = np.array([w for ws in words_per_doc for w in ws], dtype=object)
    if len(all_words) == 0:
        return [np.array([], dtype=np.uint64) for _ in texts]
    uniq, inv = np.unique(all_words, return_inverse=True)
    with np.errstate(over="ignore"):
        uh = np.array(
            [_fnv1a_bytes(w.encode("utf-8")) ^ np.uint64(seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF) for w in uniq],
            dtype=np.uint64,
        )
    flat = uh[inv]
    out = []
    pos = 0
    mult = np.uint64(0xC2B2AE3D27D4EB4F)
    for ws in words_per_doc:
        n_w = len(ws)
        wh = flat[pos : pos + n_w]
        pos += n_w
        if n_w < k:
            out.append(np.array([], dtype=np.uint64))
            continue
        n = n_w - k + 1
        with np.errstate(over="ignore"):
            acc = np.zeros(n, dtype=np.uint64)
            for j in range(k):
                acc = (acc * mult) ^ wh[j : j + n]
            acc ^= acc >> np.uint64(33)
            acc = acc * np.uint64(0xFF51AFD7ED558CCD)
            acc ^= acc >> np.uint64(33)
        out.append(np.unique(acc))
    return out


def minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """num_perm (a, b) pairs for the multiply-shift permutation family
    sig_i(s) = (a_i * s + b_i) mod 2^64 with a_i odd (a bijection on
    uint64, the standard practical min-wise-independent family)."""
    rng = np.random.Generator(np.random.Philox(key=seed))
    a = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) of a shingle-hash set:
    sig_i = min over s of (a_i * s + b_i) mod 2^64 — one vectorized
    outer product per doc (num_perm x |shingles|, both small)."""
    if len(shingles) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        perm = a[:, None] * shingles[None, :] + b[:, None]
    return perm.min(axis=1)


def batch_minhash_signatures(
    shingle_sets: list[np.ndarray], a: np.ndarray, b: np.ndarray,
    max_chunk_elems: int = 8_000_000,
) -> np.ndarray:
    """MinHash signatures for a whole batch at once: concatenate every
    doc's shingle hashes, one (total_shingles x num_perm) multiply-shift
    pass, then ``np.minimum.reduceat`` per doc — no per-doc Python in
    the permutation loop. Chunked so the temporary stays under
    ``max_chunk_elems`` (x8 bytes). Identical output to
    ``[minhash_signature(s, a, b) for s in shingle_sets]`` (test-pinned).
    """
    num_perm = len(a)
    n = len(shingle_sets)
    out = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    lens = np.array([len(s) for s in shingle_sets], dtype=np.int64)
    nonempty = np.flatnonzero(lens > 0)
    if len(nonempty) == 0:
        return out
    max_sh = max(1, max_chunk_elems // num_perm)
    start = 0
    while start < len(nonempty):
        end = start
        tot = 0
        while end < len(nonempty) and (tot == 0 or tot + lens[nonempty[end]] <= max_sh):
            tot += lens[nonempty[end]]
            end += 1
        idx = nonempty[start:end]
        vals = np.concatenate([shingle_sets[i] for i in idx])
        with np.errstate(over="ignore"):
            perm = vals[:, None] * a[None, :] + b[None, :]
        offs = np.zeros(len(idx), dtype=np.int64)
        np.cumsum(lens[idx][:-1], out=offs[1:])
        out[idx] = np.minimum.reduceat(perm, offs, axis=0)
        start = end
    return out


def batch_simhash64(shingle_sets: list[np.ndarray]) -> np.ndarray:
    """64-bit SimHash per doc, batched: unpack bits of every shingle
    hash in the batch once, ``np.add.reduceat`` the votes per doc, pack
    the signs. Identical to ``[simhash64(s) for s in shingle_sets]``
    (empty set -> 0)."""
    n = len(shingle_sets)
    out = np.zeros(n, dtype=np.uint64)
    lens = np.array([len(s) for s in shingle_sets], dtype=np.int64)
    nonempty = np.flatnonzero(lens > 0)
    if len(nonempty) == 0:
        return out
    vals = np.concatenate([shingle_sets[i] for i in nonempty])
    bits = np.unpackbits(vals.view(np.uint8).reshape(len(vals), 8), axis=1, bitorder="little")
    offs = np.zeros(len(nonempty), dtype=np.int64)
    np.cumsum(lens[nonempty][:-1], out=offs[1:])
    votes = np.add.reduceat(bits.astype(np.int64), offs, axis=0) * 2 - lens[nonempty][:, None]
    sig_bits = (votes > 0).astype(np.uint64)
    packed = (sig_bits << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)
    out[nonempty] = packed
    return out


def simhash64(shingles: np.ndarray) -> np.uint64:
    """64-bit SimHash of a shingle-hash set (unweighted): sign of the
    per-bit sum of +-1 votes."""
    if len(shingles) == 0:
        return np.uint64(0)
    bits = np.unpackbits(shingles.view(np.uint8).reshape(len(shingles), 8), axis=1, bitorder="little")
    # signed accumulation: uint8 sums promote unsigned and would wrap
    # negative vote totals around to huge positives
    votes = bits.sum(axis=0, dtype=np.int64) * 2 - len(shingles)  # [64]
    out = np.uint64(0)
    for i in np.flatnonzero(votes > 0):
        out |= np.uint64(1) << np.uint64(i)
    return out


def hamming64(a: np.ndarray, b: np.uint64 | np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


def exact_jaccard(sh_a: np.ndarray, sh_b: np.ndarray) -> float:
    inter = len(np.intersect1d(sh_a, sh_b, assume_unique=True))
    union = len(sh_a) + len(sh_b) - inter
    return inter / union if union else 0.0


def exact_jaccard_batch(
    a_vals: np.ndarray,
    a_offsets: np.ndarray,
    b_vals: np.ndarray,
    b_offsets: np.ndarray,
) -> np.ndarray:
    """Vectorized exact Jaccard for n pairs in one pass (VERDICT r2 #5:
    replaces the per-pair ``exact_jaccard`` zip loop in the MinHash
    verification tiers). Pair i's sets are
    ``a_vals[a_offsets[i]:a_offsets[i+1]]`` and the b-side slice; each
    slice must be duplicate-free (shingle_hashes output), order
    irrelevant. One lexsort over all (pair, value) entries; a value in
    both sides of a pair appears exactly twice adjacently, so adjacent
    duplicates count the intersection. O(M log M) for M total shingles,
    no Python per pair."""
    n = len(a_offsets) - 1
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    la = np.diff(a_offsets).astype(np.int64)
    lb = np.diff(b_offsets).astype(np.int64)
    pid = np.concatenate([
        np.repeat(np.arange(n, dtype=np.int64), la),
        np.repeat(np.arange(n, dtype=np.int64), lb),
    ])
    val = np.concatenate([np.asarray(a_vals), np.asarray(b_vals)])
    order = np.lexsort((val, pid))
    p, v = pid[order], val[order]
    dup = (p[1:] == p[:-1]) & (v[1:] == v[:-1])
    inter = np.bincount(p[1:][dup], minlength=n).astype(np.int64)
    union = la + lb - inter
    return np.divide(
        inter, union, out=np.zeros(n, dtype=np.float64), where=union > 0
    )


def gather_slices(
    vals: np.ndarray, starts: np.ndarray, lens: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Gather variable-length slices ``vals[starts[i]:starts[i]+lens[i]]``
    into one flat array + (n+1,) offsets, fully vectorized."""
    lens = lens.astype(np.int64)
    offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    tot = int(offs[-1])
    if tot == 0:
        return vals[:0], offs
    idx = np.arange(tot, dtype=np.int64) - np.repeat(offs[:-1], lens) + np.repeat(
        starts.astype(np.int64), lens
    )
    return vals[idx], offs


def batch_shingle_hashes_counted(
    texts: list[str], k: int = 3, seed: int = 0
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Like batch_shingle_hashes but keeps the per-doc multiplicity of
    each distinct shingle: returns (hashes, counts) per doc. Used by the
    weighted SimHash (term-frequency voting)."""
    words_per_doc = [t.split() for t in texts]
    all_words = np.array([w for ws in words_per_doc for w in ws], dtype=object)
    if len(all_words) == 0:
        return [(np.array([], dtype=np.uint64), np.array([], dtype=np.int64)) for _ in texts]
    uniq, inv = np.unique(all_words, return_inverse=True)
    with np.errstate(over="ignore"):
        uh = np.array(
            [_fnv1a_bytes(w.encode("utf-8")) ^ np.uint64(seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF) for w in uniq],
            dtype=np.uint64,
        )
    flat = uh[inv]
    out = []
    pos = 0
    mult = np.uint64(0xC2B2AE3D27D4EB4F)
    for ws in words_per_doc:
        n_w = len(ws)
        wh = flat[pos : pos + n_w]
        pos += n_w
        if n_w < k:
            out.append((np.array([], dtype=np.uint64), np.array([], dtype=np.int64)))
            continue
        n = n_w - k + 1
        with np.errstate(over="ignore"):
            acc = np.zeros(n, dtype=np.uint64)
            for j in range(k):
                acc = (acc * mult) ^ wh[j : j + n]
            acc ^= acc >> np.uint64(33)
            acc = acc * np.uint64(0xFF51AFD7ED558CCD)
            acc ^= acc >> np.uint64(33)
        h, c = np.unique(acc, return_counts=True)
        out.append((h, c.astype(np.int64)))
    return out


def batch_simhash64_weighted(
    shingle_sets: list[np.ndarray], weight_sets: list[np.ndarray]
) -> np.ndarray:
    """Charikar SimHash with per-term weights (weighted +-w votes per
    bit) — the standard fix for the unweighted variant's boilerplate
    sensitivity: rare informative shingles outvote repeated template
    text when weights are tf-damped (log1p) or idf-like. Batched with
    one unpackbits + one reduceat like batch_simhash64; with all-ones
    weights the output is IDENTICAL to batch_simhash64 (test-pinned)."""
    n = len(shingle_sets)
    out = np.zeros(n, dtype=np.uint64)
    lens = np.array([len(s) for s in shingle_sets], dtype=np.int64)
    nonempty = np.flatnonzero(lens > 0)
    if len(nonempty) == 0:
        return out
    vals = np.concatenate([shingle_sets[i] for i in nonempty])
    w = np.concatenate([np.asarray(weight_sets[i], dtype=np.float64) for i in nonempty])
    bits = np.unpackbits(vals.view(np.uint8).reshape(len(vals), 8), axis=1, bitorder="little")
    offs = np.zeros(len(nonempty), dtype=np.int64)
    np.cumsum(lens[nonempty][:-1], out=offs[1:])
    wbits = bits.astype(np.float64) * w[:, None]
    wsum_doc = np.add.reduceat(w, offs)
    votes = np.add.reduceat(wbits, offs, axis=0) * 2.0 - wsum_doc[:, None]
    sig_bits = (votes > 0).astype(np.uint64)
    packed = (sig_bits << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)
    out[nonempty] = packed
    return out


# --------------------------------------------------- repetition filters

def repetition_features(texts: list[str]) -> dict[str, np.ndarray]:
    """Gopher-style repetition statistics per doc (Rae et al. 2021
    'Scaling Language Models: ... Gopher' repetition filters, public):
    fraction of word positions covered by the most frequent word /
    2-gram, and fraction of 3-gram positions whose gram occurs more
    than once. Batched: ONE np.unique dictionary-encode over every word
    in the batch; grams are built arithmetically on per-doc compacted
    int codes (codes fit n_words**3 < 2**63 for any realistic doc), so
    the per-doc tail is a bounded numpy unique over small int arrays —
    no per-gram strings, no Python loop over grams.

    Split convention is single-space (``text.split(' ')``) to match the
    DuckDB oracle's ``string_split(text, ' ')`` exactly."""
    n_docs = len(texts)
    words_per_doc = [t.split(" ") if t else [] for t in texts]
    n_words = np.array([len(ws) for ws in words_per_doc], dtype=np.int64)
    top_word = np.zeros(n_docs, dtype=np.float64)
    top2 = np.zeros(n_docs, dtype=np.float64)
    dup3 = np.zeros(n_docs, dtype=np.float64)
    all_words = np.array([w for ws in words_per_doc for w in ws], dtype=object)
    if len(all_words):
        _, inv = np.unique(all_words, return_inverse=True)
    else:
        inv = np.zeros(0, dtype=np.int64)
    pos = 0
    for i, ws in enumerate(words_per_doc):
        n = len(ws)
        codes = inv[pos : pos + n]
        pos += n
        if n == 0:
            continue
        # compact to per-doc code space so gram arithmetic can't overflow
        _, c = np.unique(codes, return_inverse=True)
        c = c.astype(np.int64)
        v = int(c.max()) + 1
        _, counts1 = np.unique(c, return_counts=True)
        top_word[i] = counts1.max() / n
        if n >= 2:
            g2 = c[:-1] * v + c[1:]
            _, counts2 = np.unique(g2, return_counts=True)
            top2[i] = counts2.max() / (n - 1)
        if n >= 3:
            g3 = (c[:-2] * v + c[1:-1]) * v + c[2:]
            _, inv3, counts3 = np.unique(g3, return_inverse=True, return_counts=True)
            dup3[i] = float((counts3[inv3] >= 2).sum()) / (n - 2)
    return {
        "n_words_sp": n_words,
        "top_word_frac": top_word,
        "top2gram_frac": top2,
        "dup3gram_frac": dup3,
    }


# ------------------------------------------------------- PII detect/redact

# RE2-compatible patterns (pyarrow and DuckDB both use RE2, so counts
# and replacements agree byte-for-byte between engine and oracle).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PATTERNS = (PII_EMAIL_RE, PII_PHONE_RE, PII_IPV4_RE)
PII_TOKEN = "<PII>"


def pii_counts(texts: pa.Array) -> dict[str, pa.Array]:
    """Per-doc counts of email / phone / IPv4 matches (Arrow regex
    kernels, non-overlapping left-to-right — same as regexp_extract_all)."""
    return {
        "n_email": pc.count_substring_regex(texts, PII_EMAIL_RE).cast(pa.int64()),
        "n_phone": pc.count_substring_regex(texts, PII_PHONE_RE).cast(pa.int64()),
        "n_ipv4": pc.count_substring_regex(texts, PII_IPV4_RE).cast(pa.int64()),
    }


def pii_redact(texts: pa.Array, token: str = PII_TOKEN) -> pa.Array:
    """Replace every PII match with ``token``, patterns applied in the
    fixed order email -> phone -> ipv4 (the patterns are mutually
    non-overlapping, so order only matters for determinism)."""
    out = texts
    for pat in PII_PATTERNS:
        out = pc.replace_substring_regex(out, pat, token)
    return out


def nfc(texts: pa.Array) -> pa.Array:
    """Unicode NFC with an Arrow fast path: this container's pyarrow
    (16.1) utf8_normalize does NOT recompose (NFC and NFD both emit
    e+U+0301 — verified), so true composition needs Python
    unicodedata. Pure-ASCII strings are NFC by definition, so the
    vectorized regex mask short-circuits them; only the non-ASCII
    minority pays the per-string C call (is_normalized fast-path
    first, normalize only when it reports False)."""
    import unicodedata

    import pyarrow.compute as pc

    ascii_mask = pc.match_substring_regex(texts, r"^[\x00-\x7F]*$")
    if pc.all(ascii_mask).as_py() in (True, None):
        return texts
    vals = texts.to_pylist()
    out = [
        v if v is None or m or unicodedata.is_normalized("NFC", v)
        else unicodedata.normalize("NFC", v)
        for v, m in zip(vals, ascii_mask.to_pylist())
    ]
    return pa.array(out, type=pa.string())


def normalize_text(texts: pa.Array) -> pa.Array:
    """Canonical text normalization for dedup/filter pipelines:
    Unicode NFC -> lowercase -> collapse ASCII whitespace runs to one
    space -> trim. Lower/collapse/trim are Arrow compute kernels; NFC
    is the hybrid above. The whitespace class is spelled explicitly
    ([ \\t\\n\\r\\f\\v]) because RE2's \\s is ASCII-only while Python's is
    Unicode-aware — pinning the ASCII class keeps the kernel, the SQL
    oracle (regexp_replace) and any RE2-based reimplementation
    identical."""
    import pyarrow.compute as pc

    out = pc.utf8_lower(nfc(texts))
    out = pc.replace_substring_regex(out, pattern="[ \t\n\r\f\v]+", replacement=" ")
    return pc.utf8_trim(out, " ")


def winnow_fingerprints(
    texts: list[str], k: int = 8, w: int = 4
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken
    2003, SIGMOD): per text, character k-gram polynomial hashes (the
    FP_BASE/FP_MOD Horner scheme of ``polynomial_fingerprint``), then
    every length-``w`` window of consecutive k-gram hashes selects its
    RIGHTMOST minimal hash; the distinct selected (position, hash)
    pairs are the fingerprints. Guarantees a shared fingerprint for
    any match of length >= w + k - 1. Texts with fewer than w k-grams
    (len < k + w - 1) emit nothing, matching the windowed SQL replay.

    Returns (doc_index, pos, hash) arrays — pos is the 1-based k-gram
    start. Inner math is vectorized per text (sliding-window matmul +
    reversed-argmin); the per-text loop carries only bounded numpy
    calls, the same shape as batch_shingle_hashes."""
    from numpy.lib.stride_tricks import sliding_window_view

    pows = np.ones(k, dtype=np.int64)
    for i in range(1, k):
        pows[i] = (pows[i - 1] * FP_BASE) % FP_MOD
    pows = pows[::-1].copy()  # [B^(k-1) .. B^0] mod P

    di, pi, hi = [], [], []
    for idx, t in enumerate(texts):
        a = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
        m = len(a) - k + 1
        if m < w:
            continue
        kg = ((sliding_window_view(a, k) % FP_MOD) * pows).sum(axis=1) % FP_MOD
        win = sliding_window_view(kg, w)             # (m - w + 1, w)
        right_argmin = (w - 1) - np.argmin(win[:, ::-1], axis=1)
        pos = np.arange(m - w + 1, dtype=np.int64) + right_argmin
        sel = np.unique(pos)
        di.append(np.full(len(sel), idx, dtype=np.int64))
        pi.append(sel + 1)                           # 1-based k-gram start
        hi.append(kg[sel])
    if not di:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    return np.concatenate(di), np.concatenate(pi), np.concatenate(hi)


def lexical_stats(texts: list[str]) -> dict[str, np.ndarray]:
    """Per-doc lexical-statistics battery (public corpus-quality
    signals): Shannon character entropy and word entropy in nats
    (Shannon 1948), type-token ratio, Yule's characteristic K
    (Yule 1944: K = 1e4 * (sum_t c_t^2 - N) / N^2 over type counts
    c_t), and hapax-legomenon ratio V1/N. Batched: ONE np.unique
    dictionary-encode over every word in the batch, ONE unique over
    packed (doc, codepoint) keys; per-doc reductions are np.bincount
    segment sums — no Python loop over tokens.

    Split convention is single-space (``text.split(' ')``), matching
    DuckDB ``string_split(text, ' ')``; empty texts yield 0.0 rows.
    Entropy terms are the oracle's elementwise -(c/N)*ln(c/N), so only
    summation order differs -> stable_round6 / ROUND(ROUND(.,9),6)."""
    n_docs = len(texts)
    h_char = np.zeros(n_docs, dtype=np.float64)
    h_word = np.zeros(n_docs, dtype=np.float64)
    ttr = np.zeros(n_docs, dtype=np.float64)
    yule_k = np.zeros(n_docs, dtype=np.float64)
    hapax = np.zeros(n_docs, dtype=np.float64)

    cps = [np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32) for t in texts]
    nch = np.array([len(c) for c in cps], dtype=np.int64)
    if nch.sum():
        di = np.repeat(np.arange(n_docs, dtype=np.int64), nch)
        cp = np.concatenate(cps).astype(np.int64)
        key = (di << 21) | cp  # codepoints < 2**21 by Unicode
        uk, counts = np.unique(key, return_counts=True)
        kdoc = uk >> 21
        p = counts / nch[kdoc]
        h_char = np.bincount(kdoc, weights=-(p * np.log(p)), minlength=n_docs)

    words_per_doc = [t.split(" ") if t else [] for t in texts]
    nw = np.array([len(ws) for ws in words_per_doc], dtype=np.int64)
    all_words = np.array([w for ws in words_per_doc for w in ws], dtype=object)
    if len(all_words):
        _, inv = np.unique(all_words, return_inverse=True)
        v_total = int(inv.max()) + 1
        di = np.repeat(np.arange(n_docs, dtype=np.int64), nw)
        uk, counts = np.unique(di * v_total + inv, return_counts=True)
        kdoc = uk // v_total
        n = nw[kdoc].astype(np.float64)
        p = counts / n
        h_word = np.bincount(kdoc, weights=-(p * np.log(p)), minlength=n_docs)
        v = np.bincount(kdoc, minlength=n_docs).astype(np.float64)
        sum_c2 = np.bincount(
            kdoc, weights=counts.astype(np.float64) ** 2, minlength=n_docs
        )
        v1 = np.bincount(
            kdoc, weights=(counts == 1).astype(np.float64), minlength=n_docs
        )
        pos = nw > 0
        nwf = nw.astype(np.float64)
        ttr[pos] = v[pos] / nwf[pos]
        yule_k[pos] = 1e4 * (sum_c2[pos] - nwf[pos]) / (nwf[pos] * nwf[pos])
        hapax[pos] = v1[pos] / nwf[pos]
    return {
        "h_char": h_char,
        "h_word": h_word,
        "ttr": ttr,
        "yule_k": yule_k,
        "hapax_ratio": hapax,
    }
