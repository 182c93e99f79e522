"""Deterministic synthetic fixture corpus (the north-rule input table).

Schema per BASELINE.json ``input_hint``: ``(doc_id:string,
tokens:list<int32>, n_tok:int32, source:string, ts:timestamp[us])``.
No external data; everything is a pure function of (source, row index,
base seed), so any scale is a prefix-consistent extension of any smaller
scale and per-row token-array equality can be re-verified from scratch.

Modeled on the reference's test-corpus construction
(diive/variables/utilities.py:112-186 ``generate_noisy_timeseries`` /
``add_impulse_noise``; fixture strategy documented in FIXTURES.md):

* regular 1-second grid per source, END-labeled timestamps
  (``ts`` marks the end of the 1-s interval, cf.
  diive/core/times/times.py:1647-1651),
* diurnal base signal + Gaussian noise on ``n_tok``,
* **skewed sources**: ``s00`` spans the full range T and holds ~50 % of
  all rows; ``s01..s07`` span T/7 each (exercises salted-key paths),
* injected defects (all deterministic):
  1. duplicated timestamps every ``DUP_EVERY`` rows (keep-last dedup
     target, cf. diive/core/times/times.py:1409-1459),
  2. one out-of-order 100-row span (sort target, times.py:641-668),
  3. deleted runs of lengths GAP_RUNS at known offsets (gap-table
     golden values, diive/analysis/gapfinder.py:114-147),
  4. impulse-noise outliers on ``n_tok``, contamination 3 %
     (diive/variables/utilities.py:186),
  5. one sparse hour (40 % of seconds present) for the min-count
     bucket mask (diive/core/times/resampling.py:161-171).

``tokens`` is a deterministic function of (doc seed, position):
``tok[j] = (doc_seed + (j+1) * 2654435761) % VOCAB`` — vectorizable,
cheap at bench scale, and exactly recomputable for per-row equality
verification without storing a reference copy.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schema import TOKENS_SCHEMA, US_PER_SEC

VOCAB = 50257
T0_US = 1656633600000000  # 2022-07-01T00:00:00 UTC in microseconds
KNUTH = 2654435761  # Knuth multiplicative-hash constant

DUP_EVERY = 1_000           # defect 1: duplicate every Nth timestamp
SHUFFLE_SPAN = (1_000, 1_100)  # defect 2: out-of-order span [a, b)
GAP_RUNS = ((1_801, 1), (2_003, 2), (2_207, 3), (2_411, 5), (2_617, 10), (3_001, 120))
SPIKE_CONTAMINATION = 0.03  # defect 4
SPIKE_FACTOR_LOW = -15.0
SPIKE_FACTOR_HIGH = 14.0
SPARSE_SPAN = (300, 900)    # defect 5: span with only 40 % coverage
SPARSE_KEEP = 0.4


@dataclass(frozen=True)
class SourceSpec:
    source: str
    t0_us: int
    n_seconds: int


@dataclass(frozen=True)
class FixtureSpec:
    """A fixture scale: s00 spans ``t_seconds``; s01..s07 span 1/7 each."""

    name: str
    t_seconds: int
    n_small_sources: int = 7
    defects: bool = True
    sources: tuple[SourceSpec, ...] = field(init=False)

    def __post_init__(self):
        specs = [SourceSpec("s00", T0_US, self.t_seconds)]
        small = max(60, self.t_seconds // self.n_small_sources)
        for i in range(1, self.n_small_sources + 1):
            specs.append(SourceSpec(f"s{i:02d}", T0_US, small))
        object.__setattr__(self, "sources", tuple(specs))

    @property
    def total_rows_approx(self) -> int:
        return sum(s.n_seconds for s in self.sources)


SCALES = {
    "tiny": FixtureSpec("tiny", 3_600),
    "small": FixtureSpec("small", 86_400),
    "bench": FixtureSpec("bench", 4 * 86_400),
    # scaling-evidence corpora, generated without tokens (the rollup /
    # screening paths never read them): ~5.5M and ~22M rows
    "scale32": FixtureSpec("scale32", 32 * 86_400),
    "scale128": FixtureSpec("scale128", 128 * 86_400),
    # 4x scale128 (~88M rows): the "does efficiency hold as
    # per-partition state grows" corpus for the scaling pair
    "scale512": FixtureSpec("scale512", 512 * 86_400),
}


def _source_seed(source: str, base_seed: int) -> int:
    return (base_seed * 1_000_003 + int(source[1:])) & 0x7FFFFFFF


def clean_n_tok(source: str, idx: np.ndarray, base_seed: int = 42) -> np.ndarray:
    """Pre-defect n_tok for row indices ``idx`` of ``source`` (int32).

    base diurnal signal + seeded noise, clipped to [1, 2048]
    (FIXTURES.md F1): round(512 + 256*sin(2*pi*hour/24) + N(0, 32)).
    The noise is counter-based (Philox keyed by source) so any index
    range can be regenerated independently.
    """
    hour = (idx % 86_400) / 3_600.0
    base = 512.0 + 256.0 * np.sin(2.0 * np.pi * hour / 24.0)
    rng = np.random.Generator(np.random.Philox(key=_source_seed(source, base_seed)))
    # Philox supports cheap jump-free random access only by regenerating;
    # for determinism across chunk boundaries we derive noise from a
    # hash of the index instead of stream position.
    h = (idx.astype(np.uint64) * np.uint64(KNUTH) + np.uint64(_source_seed(source, base_seed))) & np.uint64(0xFFFFFFFF)
    u1 = (h.astype(np.float64) + 0.5) / 4294967296.0
    h2 = (h * np.uint64(0x9E3779B1) + np.uint64(1)) & np.uint64(0xFFFFFFFF)
    u2 = (h2.astype(np.float64) + 0.5) / 4294967296.0
    # Box-Muller from the two counter-based uniforms
    noise = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2) * 32.0
    del rng
    n = np.rint(base + noise)
    return np.clip(n, 1, 2048).astype(np.int32)


def spike_mask(source: str, idx: np.ndarray, base_seed: int = 42) -> np.ndarray:
    """Deterministic impulse-noise positions (defect 4): True where spiked."""
    h = (idx.astype(np.uint64) * np.uint64(0x85EBCA6B) + np.uint64(_source_seed(source, base_seed) * 7919)) & np.uint64(
        0xFFFFFFFF
    )
    u = (h.astype(np.float64) + 0.5) / 4294967296.0
    return u < SPIKE_CONTAMINATION


def spiked_n_tok(source: str, idx: np.ndarray, base_seed: int = 42) -> np.ndarray:
    """n_tok after impulse-noise injection (reference semantics of
    diive/variables/utilities.py:186: value * factor drawn in
    [factor_low, factor_high], here derived counter-based)."""
    n = clean_n_tok(source, idx, base_seed).astype(np.float64)
    mask = spike_mask(source, idx, base_seed)
    h = (idx.astype(np.uint64) * np.uint64(0xC2B2AE35) + np.uint64(_source_seed(source, base_seed) * 104729)) & np.uint64(
        0xFFFFFFFF
    )
    u = (h.astype(np.float64) + 0.5) / 4294967296.0
    factor = SPIKE_FACTOR_LOW + u * (SPIKE_FACTOR_HIGH - SPIKE_FACTOR_LOW)
    spiked = np.abs(n * factor)
    out = np.where(mask, spiked, n)
    return np.clip(np.rint(out), 1, np.iinfo(np.int32).max).astype(np.int32)


def doc_seed(source: str, idx: np.ndarray, base_seed: int = 42) -> np.ndarray:
    return (idx.astype(np.uint64) * np.uint64(1_000_003) + np.uint64(_source_seed(source, base_seed))) & np.uint64(
        0x7FFFFFFFFFFF
    )


def tokens_for(source: str, idx: np.ndarray, n_tok: np.ndarray, base_seed: int = 42) -> pa.ListArray:
    """Vectorized deterministic token arrays: list<int32> with lengths n_tok."""
    n_tok64 = n_tok.astype(np.int64)
    offsets = np.zeros(len(n_tok64) + 1, dtype=np.int64)
    np.cumsum(n_tok64, out=offsets[1:])
    total = int(offsets[-1])
    seeds = np.repeat(doc_seed(source, idx, base_seed), n_tok64)
    j = np.arange(total, dtype=np.uint64) - np.repeat(offsets[:-1], n_tok64).astype(np.uint64) + np.uint64(1)
    flat = ((seeds + j * np.uint64(KNUTH)) % np.uint64(VOCAB)).astype(np.int32)
    return pa.LargeListArray.from_arrays(pa.array(offsets, type=pa.int64()), pa.array(flat)).cast(pa.list_(pa.int32()))


def verify_tokens_batch(t: "pa.Table", base_seed: int = 42, full: bool = False) -> "pa.Table":
    """Per-row token-array EQUALITY verification (the north-rule
    invariant). Default fast path exploits the corpus formula
    ``tok[j] = (seed + (j+1)*KNUTH) % VOCAB``: an array equals its
    expected value iff (a) its first element equals ``(seed + KNUTH) %
    VOCAB`` and (b) every successive difference is ``KNUTH % VOCAB``
    (mod VOCAB) — an exact proof at ~3 integer ops/token with no
    modular arithmetic on the data path. ``full=True`` regenerates and
    compares every token instead (~10 uint64 ops/token); both paths
    flag exactly the same corruptions (pinned by tests).

    Returns one partial row: (rows, tokens, rows_ok)."""
    import pyarrow.compute as pc

    doc_ids = t["doc_id"].to_pylist()
    srcs = np.array([d.split("-", 1)[0] for d in doc_ids])
    idx = np.array([int(d.split("-")[1]) for d in doc_ids], dtype=np.int64)
    n_tok = np.asarray(t["n_tok"].to_numpy(zero_copy_only=False), dtype=np.int64)

    # length check; all positional work below uses the ACTUAL list
    # layout (lens), so one wrong-length row cannot misalign the rest
    lens = pc.list_value_length(t["tokens"]).cast(pa.int32()).to_numpy(zero_copy_only=False).astype(np.int64)
    ok = lens == n_tok

    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    seeds = np.empty(len(n_tok), dtype=np.uint64)
    for s in np.unique(srcs):
        m = srcs == s
        seeds[m] = doc_seed(s, idx[m], base_seed)

    # stored flat values, zero-copy per chunk
    col = t["tokens"]
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    stored = (
        np.concatenate([c.flatten().to_numpy(zero_copy_only=False) for c in chunks])
        if chunks else np.empty(0, np.int32)
    )

    if full:
        flat_seeds = np.repeat(seeds, lens)
        j = (np.arange(int(offsets[-1]), dtype=np.uint64)
             - np.repeat(offsets[:-1], lens).astype(np.uint64) + np.uint64(1))
        with np.errstate(over="ignore"):
            expected = ((flat_seeds + j * np.uint64(KNUTH)) % np.uint64(VOCAB)).astype(np.int32)
        bad = stored != expected
    else:
        with np.errstate(over="ignore"):
            first_exp = ((seeds + np.uint64(KNUTH)) % np.uint64(VOCAB)).astype(np.int32)
        stride = np.int32(KNUTH % VOCAB)
        starts = offsets[:-1][lens > 0]
        bad = np.zeros(len(stored), dtype=bool)
        bad[starts] = stored[starts] != first_exp[lens > 0]
        d = np.diff(stored.astype(np.int32))
        d_bad = (d != stride) & (d != stride - np.int32(VOCAB))
        # positions crossing a doc boundary are not stride-constrained
        d_bad[starts[1:] - 1] = False
        bad[1:] |= d_bad

    mismatch_rows = np.unique(np.searchsorted(offsets[1:], np.flatnonzero(bad), side="right"))
    ok[mismatch_rows] = False
    return pa.table({
        "rows": pa.array([t.num_rows], pa.int64()),
        "tokens": pa.array([int(offsets[-1])], pa.int64()),
        "rows_ok": pa.array([int(ok.sum())], pa.int64()),
    })


def _sparse_keep_mask(source: str, idx: np.ndarray, base_seed: int) -> np.ndarray:
    """Defect 5: in SPARSE_SPAN only 40 % of seconds survive."""
    in_hour = (idx >= SPARSE_SPAN[0]) & (idx < SPARSE_SPAN[1])
    h = (idx.astype(np.uint64) * np.uint64(0x27D4EB2F) + np.uint64(_source_seed(source, base_seed) * 31337)) & np.uint64(
        0xFFFFFFFF
    )
    u = (h.astype(np.float64) + 0.5) / 4294967296.0
    return ~in_hour | (u < SPARSE_KEEP)


def _gap_delete_mask(idx: np.ndarray) -> np.ndarray:
    """Defect 3: True where the row survives (gap runs removed)."""
    keep = np.ones(len(idx), dtype=bool)
    for start, length in GAP_RUNS:
        keep &= (idx < start) | (idx >= start + length)
    return keep


def gen_chunk(
    source: str,
    t0_us: int,
    idx_start: int,
    idx_stop: int,
    *,
    base_seed: int = 42,
    defects: bool = True,
    with_tokens: bool = True,
) -> pa.Table:
    """Generate rows with indices [idx_start, idx_stop) for one source.

    Row i has END-labeled ts = t0 + (i+1) seconds (the record covers the
    interval (t0+i, t0+i+1]). Defects 1-5 are applied within the chunk;
    duplicated rows are emitted immediately after their original so
    keep-last semantics are well-defined by file order.
    """
    idx = np.arange(idx_start, idx_stop, dtype=np.int64)

    if defects:
        keep = _gap_delete_mask(idx) & _sparse_keep_mask(source, idx, base_seed)
        idx = idx[keep]

    n_tok = spiked_n_tok(source, idx, base_seed) if defects else clean_n_tok(source, idx, base_seed)
    ts = (t0_us + (idx + 1) * US_PER_SEC).astype("datetime64[us]")
    dup_flag = np.zeros(len(idx), dtype=bool)

    if defects:
        # Defect 1: duplicate every DUP_EVERY-th surviving index with a
        # different n_tok; the duplicate is the keep-last winner.
        is_dup_src = (idx % DUP_EVERY == 0) & (idx > 0)
        if is_dup_src.any():
            pos = np.flatnonzero(is_dup_src)
            idx = np.insert(idx, pos + 1, idx[pos])
            n_tok = np.insert(n_tok, pos + 1, np.clip(n_tok[pos] + 7, 1, None))
            ts = np.insert(ts, pos + 1, ts[pos])
            dup_flag = np.insert(dup_flag, pos + 1, True)

        # Defect 2: shuffle a 100-row span (by reversing it — deterministic).
        a, b = SHUFFLE_SPAN
        span = (idx >= a) & (idx < b)
        if span.any():
            pos = np.flatnonzero(span)
            rev = pos[::-1]
            idx[pos], n_tok[pos], ts[pos], dup_flag[pos] = idx[rev], n_tok[rev], ts[rev], dup_flag[rev]

    doc_id = np.char.add(
        np.char.add(f"{source}-", np.char.zfill(idx.astype("U10"), 8)),
        np.where(dup_flag, "-d", ""),
    )

    cols: dict[str, object] = {
        "doc_id": pa.array(doc_id, type=pa.string()),
        "n_tok": pa.array(n_tok, type=pa.int32()),
        "source": pa.array(np.full(len(idx), source), type=pa.string()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
    }
    if with_tokens:
        cols["tokens"] = tokens_for(source, idx, n_tok, base_seed)
        return pa.table(cols, schema=TOKENS_SCHEMA)
    return pa.table(cols)


def ensure_fixture(
    scale: str | FixtureSpec,
    root: str = "/tmp/diive_ray_fixtures",
    *,
    base_seed: int = 42,
    with_tokens: bool = True,
    chunk_seconds: int = 21_600,
) -> str:
    """Write the fixture corpus as partitioned Parquet (one directory per
    source, one file per <=chunk_seconds span) and return its path.
    Idempotent: present files are not rewritten (resumable layout, cf.
    the per-chunk checkpoint design of
    diive/flux/hires/detect_and_remove_tlag.py:78-94)."""
    spec = SCALES[scale] if isinstance(scale, str) else scale
    out = os.path.join(root, f"{spec.name}-seed{base_seed}" + ("" if with_tokens else "-notok"))
    done_marker = os.path.join(out, "_DONE")
    if os.path.exists(done_marker):
        if not os.path.exists(os.path.join(out, "_manifest.parquet")):
            _write_manifest(out)  # corpora cached before manifests existed
        return out
    os.makedirs(out, exist_ok=True)
    jobs = []
    for src in spec.sources:
        src_dir = os.path.join(out, f"src-{src.source}")
        os.makedirs(src_dir, exist_ok=True)
        for lo in range(0, src.n_seconds, chunk_seconds):
            hi = min(lo + chunk_seconds, src.n_seconds)
            path = os.path.join(src_dir, f"chunk-{lo:010d}.parquet")
            if not os.path.exists(path):
                jobs.append((src.source, src.t0_us, lo, hi, path,
                             base_seed, spec.defects, with_tokens))
    if jobs:
        # chunk generation is independent -> process pool (each chunk is
        # a pure function of its args; idempotent tmp+rename writes)
        import multiprocessing as mp

        workers = min(8, max(1, (os.cpu_count() or 8) // 4), len(jobs))
        if workers > 1:
            with mp.get_context("spawn").Pool(workers) as pool:
                pool.map(_gen_chunk_job, jobs)
        else:
            for j in jobs:
                _gen_chunk_job(j)
    _write_manifest(out)
    with open(done_marker, "w") as f:
        f.write("ok\n")
    return out


def _write_manifest(out: str) -> None:
    """Write ``_manifest.parquet`` (path, source, chunk_lo) at the
    corpus root — the lake-writer artifact that lets
    ``rollup.file_group_dataset`` skip directory listing entirely
    (any sane 100-TB lake write emits one; here it is a post-hoc
    listing of the layout we just wrote)."""
    import glob as _glob
    import re as _re

    rows = {"path": [], "source": [], "chunk_lo": []}
    for f in sorted(_glob.glob(os.path.join(out, "src-*", "*.parquet"))):
        m = _re.search(r"chunk-(\d+)\.parquet$", f)
        if m is None:
            continue
        rows["path"].append(f)
        rows["source"].append(os.path.basename(os.path.dirname(f)).removeprefix("src-"))
        rows["chunk_lo"].append(int(m.group(1)))
    tbl = pa.table({
        "path": pa.array(rows["path"], pa.string()),
        "source": pa.array(rows["source"], pa.string()),
        "chunk_lo": pa.array(rows["chunk_lo"], pa.int64()),
    })
    tmp = os.path.join(out, "_manifest.parquet.tmp")
    pq.write_table(tbl, tmp)
    os.replace(tmp, os.path.join(out, "_manifest.parquet"))


def _gen_chunk_job(args) -> None:
    source, t0_us, lo, hi, path, base_seed, defects, with_tokens = args
    tbl = gen_chunk(source, t0_us, lo, hi, base_seed=base_seed, defects=defects, with_tokens=with_tokens)
    tmp = path + f".tmp-{os.getpid()}"
    pq.write_table(tbl, tmp, compression="zstd")
    os.replace(tmp, path)
