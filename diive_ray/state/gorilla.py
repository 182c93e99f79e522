"""Gorilla-style time-series block compression (public VLDB'15 scheme:
Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory Time Series
Database"). No reference counterpart — the reference keeps whole pandas
series in RAM; this is the engine's raw-tier block format required by
the north rule (BASELINE.json).

* Timestamps: delta-of-delta with the paper's variable-length buckets
  ({0:'0', [-63,64]:'10'+7b, [-255,256]:'110'+9b, [-2047,2048]:'1110'+12b,
  else:'1111'+32b}), header = first ts (64b) + first delta (32b).
* Values: XOR with leading/meaningful-bit windows ('0' same; '10' reuse
  previous window; '11' + 5b leading + 6b length + meaningful bits).

Encoders classify/width-compute vectorized in numpy; the final bit-pack
is a per-value Python loop over an int accumulator (blocks are bounded
— one (source, time-bucket) block, e.g. 3600 points/h — and a
production build would swap in a C kernel behind the same API).
"""

from __future__ import annotations

import numpy as np


class _BitWriter:
    """MSB-first bit packer; flushes whole bytes eagerly so the int
    accumulator stays below 8 bits + max field width (O(1) per write —
    an unbounded accumulator turns encoding O(n^2) in Python)."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, width: int):
        acc = (self.acc << width) | (value & ((1 << width) - 1))
        nbits = self.nbits + width
        out = self.out
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        self.acc = acc & ((1 << nbits) - 1)
        self.nbits = nbits

    def bytes(self) -> bytes:
        if self.nbits:
            return bytes(self.out) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.out)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, width: int) -> int:
        out = 0
        remaining = width
        while remaining:
            byte_i, bit_i = divmod(self.pos, 8)
            take = min(8 - bit_i, remaining)
            chunk = (self.data[byte_i] >> (8 - bit_i - take)) & ((1 << take) - 1)
            out = (out << take) | chunk
            self.pos += take
            remaining -= take
        return out


# ------------------------------------------------------- timestamp stream

_TS_BUCKETS = (  # (bit-width of payload, prefix bits, prefix width)
    (7, 0b10, 2),
    (9, 0b110, 3),
    (12, 0b1110, 4),
    (32, 0b1111, 4),
)


def encode_timestamps(ts_us: np.ndarray) -> bytes:
    """Delta-of-delta encode a sorted int64 microsecond array."""
    ts = np.asarray(ts_us, dtype=np.int64)
    n = len(ts)
    w = _BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.bytes()
    w.write(int(ts[0]) & ((1 << 64) - 1), 64)
    if n == 1:
        return w.bytes()
    deltas = np.diff(ts)
    w.write(int(deltas[0]) & ((1 << 64) - 1), 64)
    dod = np.diff(deltas)  # n-2 values
    for d in dod.tolist():
        if d == 0:
            w.write(0, 1)
        elif -63 <= d <= 64:
            w.write(0b10, 2)
            w.write(d + 63, 7)
        elif -255 <= d <= 256:
            w.write(0b110, 3)
            w.write(d + 255, 9)
        elif -2047 <= d <= 2048:
            w.write(0b1110, 4)
            w.write(d + 2047, 12)
        else:
            w.write(0b1111, 4)
            w.write(d & ((1 << 64) - 1), 64)
    return w.bytes()


def decode_timestamps(blob: bytes) -> np.ndarray:
    r = _BitReader(blob)
    n = r.read(32)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    first = r.read(64)
    if first >= 1 << 63:
        first -= 1 << 64
    out = np.empty(n, dtype=np.int64)
    out[0] = first
    if n == 1:
        return out
    delta = r.read(64)
    if delta >= 1 << 63:
        delta -= 1 << 64
    out[1] = out[0] + delta
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            dod = r.read(64)
            if dod >= 1 << 63:
                dod -= 1 << 64
        delta += dod
        out[i] = out[i - 1] + delta
    return out


# ----------------------------------------------------------- value stream


def encode_values(values: np.ndarray) -> bytes:
    """Gorilla XOR encode float64 values (ints are cast losslessly)."""
    v = np.asarray(values, dtype=np.float64).view(np.uint64)
    n = len(v)
    w = _BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.bytes()
    w.write(int(v[0]), 64)
    lead_prev, trail_prev = -1, -1
    xors = (v[1:] ^ v[:-1]).tolist() if n > 1 else []
    for x in xors:
        if x == 0:
            w.write(0, 1)
            continue
        lead = 64 - x.bit_length()
        trail = (x & -x).bit_length() - 1
        if lead >= 32:
            lead = 31  # 5-bit leading field caps at 31
        if lead_prev >= 0 and lead >= lead_prev and trail >= trail_prev:
            # meaningful bits fit inside the previous window -> '10'
            w.write(0b10, 2)
            w.write(x >> trail_prev, 64 - lead_prev - trail_prev)
        else:
            meaningful = 64 - lead - trail
            w.write(0b11, 2)
            w.write(lead, 5)
            w.write(meaningful - 1, 6)
            w.write(x >> trail, meaningful)
            lead_prev, trail_prev = lead, trail
    return w.bytes()


def decode_values(blob: bytes) -> np.ndarray:
    r = _BitReader(blob)
    n = r.read(32)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    out = np.empty(n, dtype=np.uint64)
    out[0] = r.read(64)
    lead, trail = 0, 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = out[i - 1]
            continue
        if r.read(1) == 0:  # reuse previous (lead, trail) window
            width = 64 - lead - trail
            x = r.read(width) << trail
        else:
            lead = r.read(5)
            meaningful = r.read(6) + 1
            trail = 64 - lead - meaningful
            x = r.read(meaningful) << trail
        out[i] = out[i - 1] ^ np.uint64(x)
    return out.view(np.float64)
