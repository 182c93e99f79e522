"""Gorilla-style time-series block compression (public VLDB'15 scheme:
Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory Time Series
Database"). No reference counterpart — the reference keeps whole pandas
series in RAM; this is the engine's raw-tier block format required by
the north rule (BASELINE.json).

* Timestamps: delta-of-delta with the paper's variable-length buckets
  ({0:'0', [-63,64]:'10'+7b, [-255,256]:'110'+9b, [-2047,2048]:'1110'+12b,
  else:'1111'+64b}), header = count (32b) + first ts (64b) + first delta
  (64b).
* Values: XOR with leading/meaningful-bit windows ('0' same; '10' reuse
  previous window; '11' + 5b leading + 6b length-1 + meaningful bits).

Both directions are vectorized end-to-end:

* **Encode** classifies/widths in numpy and bit-packs via
  ``_pack_codes``: entries grouped by distinct code width, bits
  extracted with a big-endian byte view + ``np.unpackbits`` (numpy's
  uint64 broadcast shifts are ~300x slower), scattered into a flat bit
  buffer, one ``np.packbits``. ~30-80M values/s per core vs ~1.3M/s for
  the per-value Python accumulator this replaced (kept below as
  ``_encode_*_scalar`` reference implementations; the timestamp stream
  is byte-identical between the two, pinned by tests).
* **Value-encode window strategy**: instead of the paper's greedy
  per-value window carry (inherently sequential), each aligned run of
  ``run=64`` XOR entries shares one (min-lead, min-trail) window — the
  run's first nonzero XOR emits the '11' window, the rest '10' reuse.
  Any conforming decoder reads it; block sizes measure *smaller* than
  the greedy encoder on integer-ish series (greedy never shrinks its
  window) and within ~5% on noisy ones.
* **Decode** is two-phase: a minimal Python cursor scan over the
  control bits records each payload's (bit-position, width), then
  payloads are gathered per distinct width, re-packed to uint64 via a
  big-endian ``np.packbits`` view, and the series reconstructed with
  ``np.bitwise_xor.accumulate`` (values) / double ``np.cumsum``
  (delta-of-delta).
"""

from __future__ import annotations

import numpy as np

_U64_MASK = (1 << 64) - 1


# ------------------------------------------------------------ bit packing


_PACK_C_SRC = r"""
#include <stdint.h>

/* MSB-first pack of variable-width codes (width <= 64) into a
   zero-initialized byte buffer: a 64-bit accumulator flushes whole
   bytes — ~10x the numpy bit-expansion path, with zero temporary
   memory (the expansion writes one uint8 PER BIT). */
void pack_codes(const uint64_t *codes, const int64_t *widths,
                int64_t n, uint8_t *out)
{
    uint64_t acc = 0;
    int64_t nacc = 0, o = 0;
    for (int64_t i = 0; i < n; i++) {
        int64_t w = widths[i];
        uint64_t c = (w >= 64) ? codes[i]
                               : (codes[i] & ((1ULL << w) - 1));
        while (w > 0) {
            int64_t take = 64 - nacc;
            if (take > w) take = w;
            /* top `take` bits of the w-bit code land with their LSB at
               bit (64 - nacc - take); every shift here is in [0, 63] */
            acc |= (c >> (w - take)) << (64 - nacc - take);
            nacc += take;
            w -= take;
            if (w > 0) c &= (1ULL << w) - 1;
            if (nacc == 64) {
                for (int b = 7; b >= 0; b--)
                    out[o++] = (uint8_t)(acc >> (8 * b));
                acc = 0; nacc = 0;
            }
        }
    }
    while (nacc > 0) {          /* flush the zero-padded tail */
        out[o++] = (uint8_t)(acc >> 56);
        acc <<= 8;
        nacc -= 8;
    }
}
"""

_PACK_CDEF = ("void pack_codes(const uint64_t *codes,"
              " const int64_t *widths, int64_t n, uint8_t *out);")


def _pack_codes_c(codes: np.ndarray, widths: np.ndarray) -> "bytes | None":
    from ..functions.ckernel import build

    built = build(_PACK_C_SRC, _PACK_CDEF)
    if built is None:
        return None
    lib, ffi = built
    total = int(widths.sum())
    out = np.zeros((total + 7) // 8, dtype=np.uint8)
    lib.pack_codes(
        ffi.cast("const uint64_t *", ffi.from_buffer(codes)),
        ffi.cast("const int64_t *", ffi.from_buffer(widths)),
        len(codes),
        ffi.cast("uint8_t *", ffi.from_buffer(out)),
    )
    return out.tobytes()


def _pack_codes(codes: np.ndarray, widths: np.ndarray) -> bytes:
    """MSB-first pack variable-width codes (each width <= 64) into bytes,
    zero-padded to a byte boundary.

    Fast path: the compiled accumulator kernel (functions/ckernel.py;
    byte-equality with the numpy path pinned in tests/test_blockstore).
    Fallback: entry i occupies flat bits [start_i, start_i + w_i);
    entries group by distinct width (a handful per stream); each
    group's bits come from ``np.unpackbits`` over a big-endian byte
    view and are written with one fancy-index store."""
    n = len(codes)
    if n == 0:
        return b""
    codes = np.ascontiguousarray(codes, dtype=np.uint64)
    widths = np.ascontiguousarray(widths, dtype=np.int64)
    fast = _pack_codes_c(codes, widths)
    if fast is not None:
        return fast
    starts = np.cumsum(widths) - widths
    total = int(starts[-1] + widths[-1])
    flat = np.zeros(total, dtype=np.uint8)
    for w in np.unique(widths):
        wi = int(w)
        if wi == 0:
            continue
        sel = widths == w
        be = codes[sel].astype(">u8").view(np.uint8).reshape(-1, 8)
        bits = np.unpackbits(be, axis=1)[:, 64 - wi:]
        pos = starts[sel][:, None] + np.arange(wi)[None, :]
        flat[pos.reshape(-1)] = bits.reshape(-1)
    return np.packbits(flat).tobytes()


def _gather_codes(bits: np.ndarray, pos: np.ndarray, widths: np.ndarray) -> np.ndarray:
    """Inverse of ``_pack_codes`` for known (bit-position, width) pairs:
    returns each code as uint64. Grouped by distinct width; each group's
    bits are gathered and re-packed through a big-endian byte view."""
    out = np.zeros(len(pos), dtype=np.uint64)
    for w in np.unique(widths):
        wi = int(w)
        if wi == 0:
            continue
        sel = widths == w
        p = pos[sel]
        mat = np.zeros((len(p), 64), dtype=np.uint8)
        mat[:, 64 - wi:] = bits[p[:, None] + np.arange(wi)[None, :]]
        out[sel] = np.packbits(mat, axis=1).view(">u8").ravel()
    return out


class _BitWriter:
    """MSB-first bit packer used by the scalar reference encoders;
    flushes whole bytes eagerly so the int accumulator stays below
    8 bits + max field width (O(1) per write)."""

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


# ------------------------------------------------------- timestamp stream


def encode_timestamps(ts_us: np.ndarray) -> bytes:
    """Delta-of-delta encode a sorted int64 microsecond array
    (vectorized; byte-identical to ``_encode_timestamps_scalar``)."""
    ts = np.asarray(ts_us, dtype=np.int64)
    n = len(ts)
    head_c = [np.uint64(n)]
    head_w = [32]
    if n >= 1:
        head_c.append(np.uint64(int(ts[0]) & _U64_MASK))
        head_w.append(64)
    if n >= 2:
        head_c.append(np.uint64(int(ts[1] - ts[0]) & _U64_MASK))
        head_w.append(64)
    codes = np.array(head_c, dtype=np.uint64)
    widths = np.array(head_w, dtype=np.int64)
    if n > 2:
        dod = np.diff(np.diff(ts))
        m = len(dod)
        c = np.empty(m, dtype=np.uint64)
        w = np.empty(m, dtype=np.int64)
        z = dod == 0
        b1 = ~z & (dod >= -63) & (dod <= 64)
        b2 = ~z & ~b1 & (dod >= -255) & (dod <= 256)
        b3 = ~z & ~b1 & ~b2 & (dod >= -2047) & (dod <= 2048)
        b4 = ~(z | b1 | b2 | b3)
        c[z] = 0
        w[z] = 1
        c[b1] = np.uint64(0b10 << 7) | (dod[b1] + 63).astype(np.uint64)
        w[b1] = 9
        c[b2] = np.uint64(0b110 << 9) | (dod[b2] + 255).astype(np.uint64)
        w[b2] = 12
        c[b3] = np.uint64(0b1110 << 12) | (dod[b3] + 2047).astype(np.uint64)
        w[b3] = 16
        if b4.any():
            # '1111' prefix + 64-bit payload = 68 bits > one code -> split
            counts = np.where(b4, 2, 1)
            pos = np.cumsum(counts) - counts
            oc = np.empty(int(counts.sum()), dtype=np.uint64)
            ow = np.empty(len(oc), dtype=np.int64)
            oc[pos] = np.where(b4, np.uint64(0b1111), c)
            ow[pos] = np.where(b4, 4, w)
            oc[pos[b4] + 1] = dod[b4].astype(np.uint64)
            ow[pos[b4] + 1] = 64
            c, w = oc, ow
        codes = np.concatenate([codes, c])
        widths = np.concatenate([widths, w])
    return _pack_codes(codes, widths)


def _encode_timestamps_scalar(ts_us: np.ndarray) -> bytes:
    """Per-value reference encoder (same stream as encode_timestamps)."""
    ts = np.asarray(ts_us, dtype=np.int64)
    n = len(ts)
    w = _BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.bytes()
    w.write(int(ts[0]) & _U64_MASK, 64)
    if n == 1:
        return w.bytes()
    deltas = np.diff(ts)
    w.write(int(deltas[0]) & _U64_MASK, 64)
    for d in np.diff(deltas).tolist():
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
            w.write(d & _U64_MASK, 64)
    return w.bytes()


def decode_timestamps(blob: bytes) -> np.ndarray:
    bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8))
    bl = bits.tolist()
    p = 0

    def rd(width: int) -> int:
        nonlocal p
        v = 0
        for b in bl[p:p + width]:
            v = (v << 1) | b
        p += width
        return v

    n = rd(32)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    first = rd(64)
    if first >= 1 << 63:
        first -= 1 << 64
    if n == 1:
        return np.array([first], dtype=np.int64)
    delta0 = rd(64)
    if delta0 >= 1 << 63:
        delta0 -= 1 << 64

    # phase 1: cursor scan over control prefixes; only payload-bearing
    # entries (dod != 0) are recorded -> plain-list appends, O(1) lookups
    m = n - 2
    idxs: list[int] = []
    poss: list[int] = []
    clss: list[int] = []
    ia = idxs.append
    pa = poss.append
    ca = clss.append
    for i in range(m):
        if bl[p] == 0:
            p += 1
        elif bl[p + 1] == 0:
            ia(i); pa(p + 2); ca(1)
            p += 9
        elif bl[p + 2] == 0:
            ia(i); pa(p + 3); ca(2)
            p += 12
        elif bl[p + 3] == 0:
            ia(i); pa(p + 4); ca(3)
            p += 16
        else:
            ia(i); pa(p + 4); ca(4)
            p += 68

    # phase 2: vectorized payload extraction + bias, then double cumsum
    dod = np.zeros(m, dtype=np.int64)
    if idxs:
        pcls = np.array(clss, dtype=np.int64)
        widths = np.array([0, 7, 9, 12, 64], dtype=np.int64)[pcls]
        raw = _gather_codes(bits, np.array(poss, dtype=np.int64), widths)
        bias = np.array([0, 63, 255, 2047, 0], dtype=np.int64)[pcls]
        # uint64 -> int64 view wraps class-4 (full 64-bit) payloads correctly
        dod[np.array(idxs, dtype=np.int64)] = raw.astype(np.int64) - bias
    out = np.empty(n, dtype=np.int64)
    out[0] = first
    deltas = np.empty(n - 1, dtype=np.int64)
    deltas[0] = delta0
    np.cumsum(dod, out=deltas[1:]) if m else None
    if m:
        deltas[1:] += delta0
    np.cumsum(deltas, out=out[1:])
    out[1:] += first
    return out


# ----------------------------------------------------------- value stream

_RUN = 64  # XOR entries per shared (lead, trail) window


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact bit_length of a uint64 array (each 32-bit half is < 2^53 so
    frexp exponents are exact — no float-rounding guards needed)."""
    hi = (x >> np.uint64(32)).astype(np.float64)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.float64)
    return np.where(hi > 0, np.frexp(hi)[1] + 32, np.frexp(lo)[1]).astype(np.int64)


def encode_values(values: np.ndarray, run: int = _RUN) -> bytes:
    """Gorilla XOR encode float64 values (ints are cast losslessly).

    Vectorized run-window strategy (module docstring): per aligned run
    of ``run`` XOR entries one shared (min-lead, min-trail) window;
    first nonzero XOR of the run emits '11'+window, the rest '10'. Each
    nonzero entry packs as two codes (control/header, payload) so no
    code exceeds 64 bits."""
    v = np.asarray(values, dtype=np.float64).view(np.uint64)
    n = len(v)
    head_c = [np.uint64(n)]
    head_w = [32]
    if n >= 1:
        head_c.append(v[0])
        head_w.append(64)
    codes = np.array(head_c, dtype=np.uint64)
    widths = np.array(head_w, dtype=np.int64)
    if n > 1:
        x = v[1:] ^ v[:-1]
        m = len(x)
        nz = x != 0
        lead = np.where(nz, np.minimum(64 - _bit_length_u64(x), 31), 0)
        trail = np.where(nz, _bit_length_u64(x & (~x + np.uint64(1))) - 1, 0)

        rid = np.arange(m) // run
        nruns = int(rid[-1]) + 1
        lead_r = np.full(nruns, 64, dtype=np.int64)
        trail_r = np.full(nruns, 64, dtype=np.int64)
        np.minimum.at(lead_r, rid[nz], lead[nz])
        np.minimum.at(trail_r, rid[nz], trail[nz])

        first_nz = np.zeros(m, dtype=bool)
        if nz.any():
            idx = np.flatnonzero(nz)
            first_nz[idx[np.unique(rid[idx], return_index=True)[1]]] = True

        wlead = lead_r[rid]
        wtrail = trail_r[rid]
        meaningful = 64 - wlead - wtrail  # in [1, 64] wherever nz
        payload = x >> wtrail.astype(np.uint64)

        counts = np.where(nz, 2, 1)
        pos = np.cumsum(counts) - counts
        k = int(counts.sum())
        oc = np.zeros(k, dtype=np.uint64)
        ow = np.ones(k, dtype=np.int64)  # zero-XOR entries: code 0, width 1
        new_win = nz & first_nz
        reuse = nz & ~first_nz
        oc[pos[new_win]] = (np.uint64(0b11 << 11)
                            | (wlead[new_win].astype(np.uint64) << np.uint64(6))
                            | (meaningful[new_win] - 1).astype(np.uint64))
        ow[pos[new_win]] = 13
        oc[pos[reuse]] = np.uint64(0b10)
        ow[pos[reuse]] = 2
        oc[pos[nz] + 1] = payload[nz]
        ow[pos[nz] + 1] = meaningful[nz]
        codes = np.concatenate([codes, oc])
        widths = np.concatenate([widths, ow])
    return _pack_codes(codes, widths)


def _encode_values_greedy(values: np.ndarray) -> bytes:
    """Per-value reference encoder with the paper's greedy window carry
    (kept as the conformance baseline for tests)."""
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
    bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8))
    bl = bits.tolist()
    p = 0

    def rd(width: int) -> int:
        nonlocal p
        v = 0
        for b in bl[p:p + width]:
            v = (v << 1) | b
        p += width
        return v

    n = rd(32)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    first = np.uint64(rd(64))
    if n == 1:
        return np.array([first], dtype=np.uint64).view(np.float64)

    # phase 1: cursor scan -> per-entry (payload pos, width, trail);
    # window ('11') entries are rare so their 11-bit header read stays
    # in the loop; '0' and '10' entries advance with O(1) list lookups.
    m = n - 1
    idxs: list[int] = []
    poss: list[int] = []
    pws: list[int] = []
    ptrails: list[int] = []
    ia = idxs.append
    pa = poss.append
    wa = pws.append
    ta = ptrails.append
    trail = width = 0
    for i in range(m):
        if bl[p] == 0:
            p += 1
            continue
        if bl[p + 1] == 0:
            p += 2
        else:
            p += 2
            lead = rd(5)
            width = rd(6) + 1
            trail = 64 - lead - width
        ia(i); pa(p); wa(width); ta(trail)
        p += width

    # phase 2: vectorized payload gather, shift, xor-scan
    seq = np.zeros(n, dtype=np.uint64)
    seq[0] = first
    if idxs:
        xor = (_gather_codes(bits, np.array(poss, dtype=np.int64),
                             np.array(pws, dtype=np.int64))
               << np.array(ptrails, dtype=np.uint64))
        seq[np.array(idxs, dtype=np.int64) + 1] = xor
    return np.bitwise_xor.accumulate(seq).view(np.float64)
