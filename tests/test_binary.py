"""functions/binary.py — vectorized bit-field extraction vs a verbatim
replica of the reference's string-based semantics
(io/binary/extract.py:14-128), including the edges SQL can't see:
values wider than n_bits, bit_end past the string, NaN passthrough."""

import numpy as np
import pytest

from diive_ray.functions.binary import bit_lengths, encoded_value


def _ref_scalar(integer, bit_start, bit_end, gain=1.0, n_bits=8):
    """Verbatim reference semantics (get_encoded_value_from_int)."""
    bits = bin(int(integer)).replace("0b", "").zfill(n_bits)
    return int(str(bits[bit_start:bit_end]), 2) * gain


def test_bit_lengths_exact():
    xs = np.array([0, 1, 2, 3, 4, 7, 8, 255, 256, 2**31 - 1, 2**31,
                   2**52, 2**52 + 1, 2**62], dtype=np.int64)
    want = [max(len(bin(int(x))) - 2, 1) for x in xs]
    assert bit_lengths(xs).tolist() == want


def test_paper_example():
    # extract.py docstring: integer=18, n_bits=8, [4,8), gain 6.25 -> 12.5
    assert encoded_value(np.array([18]), 4, 8, gain=6.25).tolist() == [12.5]
    # series docstring: [250]*3, [4,8), gain 6.25 -> 62.5
    got = encoded_value(np.array([250, 250, 250]), 4, 8, gain=6.25)
    assert got.tolist() == [62.5, 62.5, 62.5]


def test_matches_reference_on_random_fields():
    rng = np.random.Generator(np.random.Philox(key=[3, 2026]))
    xs = rng.integers(0, 2**20, size=500)  # wider than n_bits=16 for some
    for bit_start, bit_end, gain, n_bits in [
        (0, 4, 1.0, 16), (4, 10, 0.25, 16), (10, 16, 6.25, 16),
        (0, 8, 1.0, 8), (2, 30, 1.0, 16),  # bit_end past most strings
    ]:
        got = encoded_value(xs, bit_start, bit_end, gain=gain, n_bits=n_bits)
        want = [_ref_scalar(x, bit_start, bit_end, gain, n_bits) for x in xs]
        np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_wider_than_n_bits_shifts_the_window():
    # 300 = '100101100' (9 bits): zfill(8) does NOT truncate, so [0,4)
    # reads the WIDE string's head — not (300 >> 4) & 15.
    assert encoded_value(np.array([300]), 0, 4, n_bits=8)[0] == int("1001", 2)
    assert _ref_scalar(300, 0, 4, n_bits=8) == int("1001", 2)


def test_nan_passthrough_and_errors():
    got = encoded_value(np.array([18.0, np.nan, 250.0]), 4, 8, gain=6.25)
    assert got[0] == 12.5 and np.isnan(got[1]) and got[2] == 62.5

    with pytest.raises(ValueError):
        encoded_value(np.array([5]), 4, 3)          # end < start
    with pytest.raises(ValueError):
        encoded_value(np.array([5]), 9, 12, n_bits=8)  # empty slice
    with pytest.raises(ValueError):
        encoded_value(np.array([-1]), 0, 4)         # negative undefined
