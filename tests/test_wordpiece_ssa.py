"""WordPiece max-match segmentation (stages/wordpiece.py) and SSA
(stages/decompose.py:ssa_decompose) kernels."""

import numpy as np
import pandas as pd

from diive_ray.stages.decompose import ssa_decompose
from diive_ray.stages.wordpiece import wordpiece_segment, wordpiece_vocab


def _toy_vocab() -> set[str]:
    merges = pd.DataFrame({
        "left": ["u", "un", "a", "af", "aff"],
        "right": ["n", "aff", "f", "f", "able"],
    })
    return wordpiece_vocab(merges)


def test_wordpiece_vocab_contains_products_parts_chars():
    v = _toy_vocab()
    assert {"unaff", "un", "aff", "affable", "able"} <= v
    assert {"u", "n", "a", "f", "b", "l", "e"} <= v


def test_wordpiece_longest_match_first():
    v = _toy_vocab()
    # greedy takes 'unaff' (len 5), not 'un' + 'aff'
    assert wordpiece_segment("unaffable", v) == ["unaff", "##able"]
    # pure char fallback still segments in-alphabet words
    assert wordpiece_segment("fan", v) == ["f", "##a", "##n"]
    # out-of-alphabet char -> whole-word UNK (None)
    assert wordpiece_segment("zzz", v) is None
    assert wordpiece_segment("fanz", v) is None


def test_wordpiece_max_piece_len_cap():
    v = {"abcdef", "a", "b", "c", "d", "e", "f"}
    # cap below the long piece forces char segmentation
    seg = wordpiece_segment("abcdef", v, max_piece_len=3)
    assert seg == ["a", "##b", "##c", "##d", "##e", "##f"]
    assert wordpiece_segment("abcdef", v) == ["abcdef"]


def test_ssa_separates_noiseless_signal():
    t = np.arange(400, dtype=float)
    y = 0.1 * t + 5 * np.sin(2 * np.pi * t / 24)
    r = ssa_decompose(y, window=72, rank=4)
    assert np.abs(r["resid"]).max() < 1e-10
    # the kept triples carry essentially all the eigenvalue mass
    assert r["sv_share"].sum() > 0.999


def test_ssa_noise_reduction_and_share_spread():
    rng = np.random.default_rng(9)
    t = np.arange(600, dtype=float)
    signal = 4 * np.sin(2 * np.pi * t / 24)
    y = signal + rng.normal(0, 1.0, 600)
    r = ssa_decompose(y, window=72, rank=4)
    # rank-4 reconstruction is closer to the clean signal than raw data
    err_recon = np.sqrt(((r["recon"] - signal) ** 2).mean())
    err_raw = np.sqrt(((y - signal) ** 2).mean())
    assert err_recon < err_raw / 2
    # white-noise-only series spreads mass: top share far below the
    # sinusoid case
    rn = ssa_decompose(rng.normal(0, 1, 600), window=72, rank=4)
    assert rn["sv_share"][0] < r["sv_share"][0]


def test_ssa_short_series_window_clamp():
    y = np.arange(10.0)
    r = ssa_decompose(y, window=72, rank=3)
    assert len(r["recon"]) == 10
    assert np.abs(r["resid"]).max() < 1e-8  # linear = rank-2 trajectory
