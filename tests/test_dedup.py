"""Dedup stages over a planted-duplicate corpus: exact, MinHash LSH
recall, SimHash, blocked Jaccard, union-find keep rule."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from diive_ray.functions import text as tx
from diive_ray.stages import dedup as dd

WORDS = np.array(
    "the quick brown fox jumps over lazy dog data table query scan row batch value key merge".split()
)


def _mk_text(rng, n):
    return " ".join(rng.choice(WORDS, size=n))


@pytest.fixture(scope="module")
def corpus():
    """60 base docs + planted dups: 3 exact copies, 4 near-dups (1-2
    word edits of a base doc), all deterministic."""
    rng = np.random.Generator(np.random.Philox(key=123))
    rows = []
    for i in range(60):
        rows.append({"doc_id": i, "lang": "en" if i % 2 == 0 else "es", "text": _mk_text(rng, 40)})
    # exact dups of docs 0..2
    for j, src in enumerate((0, 1, 2)):
        rows.append({"doc_id": 100 + j, "lang": rows[src]["lang"], "text": rows[src]["text"]})
    # near dups of docs 3..6: change one word in the middle
    for j, src in enumerate((3, 4, 5, 6)):
        w = rows[src]["text"].split()
        w[20] = "REPLACED"
        rows.append({"doc_id": 200 + j, "lang": rows[src]["lang"], "text": " ".join(w)})
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def ds(corpus, ray_session):
    return rd.from_pandas(corpus).repartition(4)


def _exact_jaccard_pairs(corpus, threshold):
    sh = {r.doc_id: tx.shingle_hashes(r.text) for r in corpus.itertuples()}
    ids = sorted(sh)
    out = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            j = tx.exact_jaccard(sh[a], sh[b])
            if j >= threshold:
                out.append((a, b, j))
    return out


def test_exact_dedup_keeps_min_id(ds, corpus):
    kept = dd.exact_dedup(ds).to_pandas()
    assert len(kept) == len(corpus) - 3
    assert not set(kept["doc_id"]) & {100, 101, 102}
    assert {0, 1, 2} <= set(kept["doc_id"])


def test_minhash_matches_bruteforce_oracle(ds, corpus):
    got = dd.minhash_dup_pairs(ds, threshold=0.5)
    exp = _exact_jaccard_pairs(corpus, 0.5)
    got_pairs = set(zip(got["id_a"], got["id_b"]))
    assert got_pairs == {(a, b) for a, b, _ in exp}
    # jaccard values exact vs oracle
    exp_map = {(a, b): j for a, b, j in exp}
    for _, r in got.iterrows():
        assert abs(r["jaccard"] - exp_map[(r["id_a"], r["id_b"])]) < 1e-12
    # planted exact + near dups all found
    found = got_pairs
    assert {(0, 100), (1, 101), (2, 102)} <= found
    assert {(3, 200), (4, 201), (5, 202), (6, 203)} <= found


def test_simhash_finds_exact_dups(ds):
    got = dd.simhash_dup_pairs(ds, max_hamming=3)
    pairs = set(zip(got["id_a"], got["id_b"]))
    assert {(0, 100), (1, 101), (2, 102)} <= pairs
    for _, r in got[got["hamming"] == 0].iterrows():
        assert (r["id_a"], r["id_b"]) in {(0, 100), (1, 101), (2, 102)} or r["hamming"] == 0


def test_blocked_jaccard_blocks_by_lang(ds, corpus):
    got = dd.ngram_jaccard_pairs_blocked(ds, block_keys=("lang",), threshold=0.5)
    lang = dict(zip(corpus["doc_id"], corpus["lang"]))
    exp = [(a, b) for a, b, _ in _exact_jaccard_pairs(corpus, 0.5) if lang[a] == lang[b]]
    assert set(zip(got["id_a"], got["id_b"])) == set(exp)


def test_union_find_representatives(corpus):
    pairs = [(0, 100), (1, 101), (100, 101)]
    rep = dd.union_find_keep(pairs, corpus["doc_id"])
    assert rep[100] == 0 and rep[0] == 0
    assert rep[101] == 0 and rep[1] == 0  # transitively merged
    assert rep[5] == 5


def test_shingle_semantics_match_sql_contract():
    # < k words -> empty set (matches SQL list_transform(range(len-2)))
    assert len(tx.shingle_hashes("one two")) == 0
    a = tx.shingle_hashes("a b c d")
    assert len(a) == 2
    # jaccard identical text == 1
    assert tx.exact_jaccard(a, tx.shingle_hashes("a b c d")) == 1.0


def test_weighted_simhash_reduces_to_unweighted_on_unit_counts():
    from diive_ray.functions import text as tx

    texts = ["alpha beta gamma delta epsilon zeta", "one two three four five six seven"]
    sets = tx.batch_shingle_hashes(texts, 3, 7)
    counted = tx.batch_shingle_hashes_counted(texts, 3, 7)
    for (h, c), s in zip(counted, sets):
        assert (h == s).all()
        assert (c == 1).all()  # no repeated shingles in these texts
    unw = tx.batch_simhash64(sets)
    w = tx.batch_simhash64_weighted([h for h, _ in counted], [np.ones(len(h)) for h, _ in counted])
    assert (unw == w).all()


def test_weighted_simhash_damps_boilerplate():
    """Two docs sharing distinct content but drowned in repeated
    template text: log1p(tf) weighting brings their signatures closer
    than unweighted voting does (the web-corpus failure mode)."""
    from diive_ray.functions import text as tx

    boiler = "click here to subscribe now " * 30
    a = boiler + "quantum entanglement superconductor research findings"
    b = boiler + "quantum entanglement superconductor research findings extra"
    c = "completely different content about medieval castle architecture"
    counted = tx.batch_shingle_hashes_counted([a, b, c], 3, 7)
    wsig = tx.batch_simhash64_weighted(
        [h for h, _ in counted], [np.log1p(cc.astype(float)) for _, cc in counted]
    )
    d_ab = tx.hamming64(wsig[:1], wsig[1])[0]
    d_ac = tx.hamming64(wsig[:1], wsig[2])[0]
    assert d_ab < d_ac  # near-dups closer than unrelated under weighting


def test_counted_shingles_match_per_doc_counts():
    from diive_ray.functions import text as tx

    t = "a b c a b c a b c d e f"
    (h, c), = tx.batch_shingle_hashes_counted([t], 3, 0)
    # shingle "a b c" appears 3x; total 3-grams = 10; distinct counted
    assert c.sum() == 10
    assert c.max() == 3
    assert (np.sort(h) == h).all()


def test_duplicated_span_stats(ray_session):
    """Planted spans: cross-doc duplicate, within-doc self-repeat, a
    doc shorter than k, and a unique doc — verified against a pandas
    brute-force oracle."""
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "alpha beta gamma delta epsilon zeta",      # shares 4-gram with doc 2
            "alpha beta gamma delta other words here",  # cross-doc dup span
            "x y z w x y z w x y z w",                  # self-repeating span
            "too short",                                # < k words -> no row
            "entirely unique words without any repeats present",
        ],
    })
    out = dd.duplicated_span_stats(
        rd.from_pandas(docs).repartition(3), k=4
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)

    # brute-force oracle
    from collections import Counter
    grams = {}
    for _, r in docs.iterrows():
        ws = r["text"].split()
        grams[r["doc_id"]] = [" ".join(ws[i:i + 4]) for i in range(len(ws) - 3)]
    cnt = Counter(g for gs in grams.values() for g in gs)
    exp = pd.DataFrame([
        {"doc_id": d, "n_grams": len(gs),
         "dup_grams": sum(cnt[g] >= 2 for g in gs)}
        for d, gs in grams.items() if gs
    ]).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out.astype({"n_grams": "int64", "dup_grams": "int64"}), exp
    )
    assert 4 not in set(out["doc_id"])          # short doc emitted nothing
    assert out.set_index("doc_id").loc[3, "dup_grams"] > 0   # self-repeat counted
    assert out.set_index("doc_id").loc[5, "dup_grams"] == 0  # unique doc clean


def test_exact_jaccard_batch_matches_scalar():
    """The vectorized lexsort kernel (VERDICT r2 #5) is exact vs the
    per-pair intersect1d reference on random unique sets, including
    empty sides."""
    import numpy as np

    from diive_ray.functions import text as tx

    rng = np.random.default_rng(3)
    sets = [
        np.unique(rng.integers(0, 60, size=rng.integers(0, 25)).astype(np.uint64))
        for _ in range(120)
    ]
    sets[0] = sets[0][:0]  # empty vs non-empty
    sets[1] = sets[1][:0]  # empty vs empty
    ii = rng.integers(0, len(sets), size=300)
    jj = rng.integers(0, len(sets), size=300)
    lens = np.array([len(s) for s in sets], dtype=np.int64)
    offs = np.zeros(len(sets) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    flat = np.concatenate([s for s in sets if len(s)] or [np.zeros(0, np.uint64)])
    a_vals, a_offs = tx.gather_slices(flat, offs[ii], lens[ii])
    b_vals, b_offs = tx.gather_slices(flat, offs[jj], lens[jj])
    got = tx.exact_jaccard_batch(a_vals, a_offs, b_vals, b_offs)
    exp = np.array([tx.exact_jaccard(sets[i], sets[j]) for i, j in zip(ii, jj)])
    assert np.array_equal(got, exp)


# ---------------------------------------------------------- segment dedup


def test_segment_dedup_planted(ray_session):
    """Doc 10 copies doc 0 verbatim -> every one of its segments is a
    dup; doc 11 shares only its first 16-word window with doc 1."""
    from diive_ray.stages.dedup import segment_dedup_stats

    rng = np.random.Generator(np.random.Philox(key=9))
    mk = lambda n: " ".join(rng.choice(WORDS, size=n))
    texts = [mk(48) for _ in range(10)]
    texts.append(texts[0])                                   # doc 10: full copy
    texts.append(" ".join(texts[1].split()[:16]) + " " + mk(32))  # doc 11: first window shared
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})

    for parts in (2, 6):
        out = (
            segment_dedup_stats(rd.from_pandas(df).repartition(3),
                                width=16, num_partitions=parts)
            .to_pandas().set_index("doc_id").sort_index()
        )
        assert (out["n_seg"] == 3).all()
        assert out.loc[10, "n_dup_seg"] == 3 and out.loc[10, "dup_frac"] == 1.0
        assert out.loc[11, "n_dup_seg"] == 1
        assert out.loc[list(range(10)), "n_dup_seg"].sum() == 0
