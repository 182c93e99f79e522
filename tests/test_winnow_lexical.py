"""Winnowing fingerprints (functions/text.py:winnow_fingerprints,
Schleimer-Wilkerson-Aiken 2003) + lexical statistics battery
(functions/text.py:lexical_stats): hand-worked selections, the paper's
match guarantee, and closed-form entropy/diversity pins."""

import math

import numpy as np

from diive_ray.functions.text import (
    FP_BASE,
    FP_MOD,
    lexical_stats,
    winnow_fingerprints,
)


def _kgram_hashes(t: str, k: int) -> np.ndarray:
    out = []
    for i in range(len(t) - k + 1):
        h = 0
        for ch in t[i : i + k]:
            h = (h * FP_BASE + ord(ch)) % FP_MOD
        out.append(h)
    return np.asarray(out, dtype=np.int64)


def _naive_winnow(t: str, k: int, w: int):
    """Literal per-window rightmost-min selection from the paper."""
    kg = _kgram_hashes(t, k)
    sel = set()
    for j in range(len(kg) - w + 1):
        window = kg[j : j + w]
        m = window.min()
        pos = j + max(i for i in range(w) if window[i] == m)
        sel.add((pos + 1, int(kg[pos])))  # 1-based
    return sorted(sel)


def test_winnow_matches_naive_selection():
    texts = [
        "abcdefgabcdefgxy",
        "the quick brown fox jumps over the lazy dog",
        "aaaaaaaaaaaaaaaa",  # all-equal hashes: rightmost-min rule matters
        "ab",  # too short: no k-grams
        "abcdefghij",  # k-grams but fewer than w windows -> nothing
    ]
    k, w = 4, 3
    di, pos, h = winnow_fingerprints(texts, k=k, w=w)
    for idx, t in enumerate(texts):
        got = sorted(zip(pos[di == idx].tolist(), h[di == idx].tolist()))
        assert got == _naive_winnow(t, k, w), t


def test_winnow_match_guarantee():
    """Any shared substring of length >= w + k - 1 shares >= 1
    fingerprint hash (the paper's theorem 1 guarantee)."""
    k, w = 8, 4
    shared = "zqxjkvbwpfmghydl"  # length 16 >= 8 + 4 - 1
    a = "prefix one " + shared + " tail alpha"
    b = "completely different start " + shared + " other end"
    di, _, h = winnow_fingerprints([a, b], k=k, w=w)
    fa = set(h[di == 0].tolist())
    fb = set(h[di == 1].tolist())
    assert fa & fb


def test_winnow_short_text_emits_nothing():
    di, pos, h = winnow_fingerprints(["abcdefghij"], k=8, w=4)  # 3 k-grams < w
    assert len(di) == 0 and len(pos) == 0 and len(h) == 0


def test_lexical_stats_closed_forms():
    s = lexical_stats(["a b b a", "", "x", "a a a a"])
    # doc0: words {a:2, b:2} -> H = ln 2; chars {a:2, b:2, ' ':3}/7
    assert abs(s["h_word"][0] - math.log(2)) < 1e-12
    p = [2 / 7, 2 / 7, 3 / 7]
    assert abs(s["h_char"][0] + sum(x * math.log(x) for x in p)) < 1e-12
    assert s["ttr"][0] == 0.5
    assert s["yule_k"][0] == 1e4 * (4 + 4 - 4) / 16
    assert s["hapax_ratio"][0] == 0.0
    # empty doc: all zeros
    assert all(s[k][1] == 0.0 for k in s)
    # single word: ttr = hapax = 1, K = 0, entropies 0
    assert s["ttr"][2] == 1.0 and s["hapax_ratio"][2] == 1.0
    assert s["yule_k"][2] == 0.0 and s["h_word"][2] == 0.0
    # constant doc: ttr = 1/4, K = 1e4 * (16 - 4) / 16, H_word = 0
    assert s["ttr"][3] == 0.25
    assert s["yule_k"][3] == 1e4 * (16 - 4) / 16
    assert s["h_word"][3] == 0.0


def test_lexical_stats_entropy_bounds():
    """0 <= H_word <= ln(n_words); uniform types hit the upper bound."""
    rng = np.random.default_rng(7)
    words = [" ".join(rng.choice(list("abcdef"), size=50)) for _ in range(20)]
    s = lexical_stats(words)
    assert (s["h_word"] >= 0).all()
    assert (s["h_word"] <= math.log(50) + 1e-12).all()
    uniform = lexical_stats(["w0 w1 w2 w3"])
    assert abs(uniform["h_word"][0] - math.log(4)) < 1e-12
