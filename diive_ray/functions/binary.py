"""Binary bit-field extraction — decode single values packed into
multi-bit integer fields (reference: diive/io/binary/extract.py:14-128,
get_encoded_value_from_int / get_encoded_value_series).

The reference formats each integer as an MSB-first bit string padded to
``n_bits`` with leading zeros, slices ``[bit_start:bit_end)`` out of
that string, reparses the slice as an integer and applies a gain. Two
edge semantics matter and are preserved exactly:

* values whose binary representation is WIDER than ``n_bits`` are not
  truncated — the slice indexes into the wider string (zfill never
  shortens), so the effective width is ``max(n_bits, bit_length(x))``
  per value (``bit_length(0)`` counts as 1: ``bin(0) -> '0'``);
* a ``bit_end`` past the string end truncates the slice (Python slice
  semantics), so the extracted field narrows.

Here that is a handful of numpy shift/mask ops per batch — no string
building, no Python loop. NaNs pass through as NaN (the reference
zero-fills, maps, then restores NaN).
"""

from __future__ import annotations

import numpy as np


def bit_lengths(x: np.ndarray) -> np.ndarray:
    """Exact bit length of each non-negative int64 (0 -> 1, matching
    ``len(bin(0)) - 2``). Six branch-free halving steps — no log2
    rounding hazards."""
    v = np.asarray(x, dtype=np.uint64).copy()
    out = np.zeros(v.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(shift))
        out[big] += shift
        v[big] >>= np.uint64(shift)
    out += (v > 0).astype(np.int64)
    return np.maximum(out, 1)


def encoded_value(
    values: np.ndarray,
    bit_start: int,
    bit_end: int,
    *,
    gain: float = 1.0,
    n_bits: int = 8,
) -> np.ndarray:
    """Vectorized get_encoded_value_series (extract.py:67-128): extract
    bit substring [bit_start, bit_end) of each value's zfilled binary
    representation, as float with gain applied; NaN in -> NaN out.

    Raises ValueError when the slice would be empty for some value
    (the reference's ``int('')`` failure mode), e.g. bit_start at or
    past the string width.
    """
    if not (0 <= bit_start < bit_end):
        raise ValueError(f"need 0 <= bit_start < bit_end, got [{bit_start}, {bit_end})")
    v = np.asarray(values)
    if v.dtype.kind == "f":
        missing = np.isnan(v)
        ints = np.where(missing, 0.0, v).astype(np.int64)
    else:
        missing = np.zeros(v.shape, dtype=bool)
        ints = v.astype(np.int64)
    if ints.size and int(ints.min()) < 0:
        raise ValueError("negative values cannot be bit-decoded")

    width = np.maximum(bit_lengths(ints), n_bits)
    if ints.size and bit_start >= int(width.min()):
        bad = int(ints[width <= bit_start][0])
        raise ValueError(
            f"bit_start={bit_start} at/past the {int(width.min())}-bit "
            f"representation of {bad} — empty bit slice"
        )
    eff_end = np.minimum(bit_end, width)
    n_field = eff_end - bit_start
    field = (ints >> (width - eff_end)) & ((np.int64(1) << n_field) - np.int64(1))
    out = field.astype(np.float64) * gain
    out[missing] = np.nan
    return out
