"""Gorilla codec properties + block store round-trip + lookup actor +
checkpoint/resume contract."""

import glob
import json
import os
import shutil

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data as rd

from diive_ray.state import gorilla as g
from diive_ray.state.blockstore import BlockLookupActor, compress_blocks, decompress_blocks
from diive_ray.schema import US_PER_HOUR

try:
    from hypothesis import given, settings, strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


# ------------------------------------------------------------ codec props


def test_ts_roundtrip_regular_and_gappy():
    ts = np.arange(0, 3600) * 1_000_000
    assert (g.decode_timestamps(g.encode_timestamps(ts)) == ts).all()
    gappy = np.delete(ts, [5, 6, 7, 100, 2000])
    assert (g.decode_timestamps(g.encode_timestamps(gappy)) == gappy).all()
    # regular grid compresses to well under 1 bit/point + header
    assert len(g.encode_timestamps(ts)) < 3600 / 8 + 32


def test_val_roundtrip_bitexact():
    rng = np.random.Generator(np.random.Philox(key=3))
    for vals in (
        rng.integers(1, 2048, 2000).astype(np.float64),
        np.repeat(513.0, 1000),
        np.array([np.nan, 1.0, np.inf, -np.inf, 0.0, -0.0]),
    ):
        back = g.decode_values(g.encode_values(vals))
        assert (back.view(np.uint64) == vals.view(np.uint64)).all()


def test_vectorized_encoders_match_scalar_reference():
    """The vectorized timestamp encoder is byte-identical to the scalar
    reference; the vectorized value encoder's run-window stream decodes
    identically to the greedy reference stream and is not larger on the
    corpus-shaped integer series."""
    rng = np.random.Generator(np.random.Philox(key=11))
    n = 20_000
    regular = np.arange(n, dtype=np.int64) * 1_000_000
    jitter = np.sort(regular + rng.integers(-3, 4, n) * 1_000_000)
    wild = np.sort(rng.integers(0, 2**40, n))
    for ts in (regular, jitter, wild, regular[:0], regular[:1], regular[:2], regular[:3]):
        assert g.encode_timestamps(ts) == g._encode_timestamps_scalar(ts)

    ints = (512 + 256 * np.sin(2 * np.pi * np.arange(n) / 86_400)
            + rng.normal(0, 32, n)).round()
    noisy = ints + rng.normal(0, 1e-6, n)
    withnan = ints.copy()
    withnan[::7] = np.nan
    edge = np.array([0.0, -0.0, np.inf, -np.inf, 1e308, 5e-324, 1.0, np.nan, 2.0])
    for v in (ints, noisy, withnan, edge, ints[:0], ints[:1], np.full(500, 7.0)):
        exp = np.asarray(v, np.float64).view(np.uint64)
        assert (g.decode_values(g.encode_values(v)).view(np.uint64) == exp).all()
        # greedy reference stream decodes through the same decoder
        assert (g.decode_values(g._encode_values_greedy(v)).view(np.uint64) == exp).all()
    assert len(g.encode_values(ints)) <= len(g._encode_values_greedy(ints))


if HAVE_HYP:

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=0, max_size=200))
    def test_ts_roundtrip_property(deltas):
        ts = np.cumsum(np.asarray(deltas, dtype=np.int64)) if deltas else np.empty(0, dtype=np.int64)
        ts = np.sort(ts)
        assert (g.decode_timestamps(g.encode_timestamps(ts)) == ts).all()

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.floats(allow_nan=False, width=64), min_size=0, max_size=200))
    def test_val_roundtrip_property(vals):
        v = np.asarray(vals, dtype=np.float64)
        back = g.decode_values(g.encode_values(v))
        assert (back.view(np.uint64) == v.view(np.uint64)).all()


# ----------------------------------------------------------- block store


@pytest.fixture(scope="module")
def raw_df():
    rng = np.random.Generator(np.random.Philox(key=9))
    rows = []
    for src in ("a", "b"):
        ts = np.arange(0, 7200, dtype=np.int64) * 1_000_000
        ts = np.delete(ts, rng.integers(0, 7200, 50))  # gaps
        rows.append(pd.DataFrame({
            "source": src,
            "ts": pd.to_datetime(ts, unit="us"),
            "n_tok": rng.integers(1, 2048, len(ts)).astype(np.int32),
        }))
    return pd.concat(rows, ignore_index=True)


def test_block_roundtrip_and_ratio(raw_df, ray_session):
    ds = rd.from_pandas(raw_df).repartition(4)
    blocks = compress_blocks(ds, block_span_us=US_PER_HOUR, ts_col="ts", value_col="n_tok")
    bdf = blocks.to_pandas()
    assert set(bdf["source"]) == {"a", "b"}
    assert (bdf["packed_bytes"] < bdf["raw_bytes"]).all()
    back = decompress_blocks(rd.from_pandas(bdf), ts_col="ts", value_col="n_tok").to_pandas()
    a = raw_df.sort_values(["source", "ts"]).reset_index(drop=True)
    b = back.sort_values(["source", "ts"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["ts"].to_numpy() == b["ts"].to_numpy()).all()
    assert (a["n_tok"].to_numpy(dtype=np.float64) == b["n_tok"].to_numpy()).all()


def test_lookup_actor(raw_df, ray_session, tmp_path):
    ds = rd.from_pandas(raw_df)
    blocks = compress_blocks(ds, block_span_us=US_PER_HOUR, ts_col="ts", value_col="n_tok")
    out = str(tmp_path / "blocks")
    blocks.write_parquet(out)
    actor = BlockLookupActor.remote(out, US_PER_HOUR)
    row = raw_df.iloc[123]
    got = ray.get(actor.lookup.remote(row["source"], int(row["ts"].value // 1000)))
    assert got == float(row["n_tok"])
    assert ray.get(actor.lookup.remote("a", 999_999)) is None  # not on grid
    ray.kill(actor)


# ------------------------------------------------------ checkpoint/resume


def test_checkpointed_resume(ray_session, tiny_fixture_path, tmp_path):
    from diive_ray.pipelines.checkpointed import run_resumable

    out = str(tmp_path / "out")
    r1 = run_resumable(tiny_fixture_path, out)
    assert r1["skipped"] == [] and len(r1["done"]) >= 2
    for shard in r1["done"]:
        assert os.path.exists(os.path.join(out, "_manifests", f"{shard}.json"))
        assert glob.glob(os.path.join(out, shard, "tier=1m", "*.parquet"))

    # resume: nothing recomputed
    r2 = run_resumable(tiny_fixture_path, out)
    assert r2["done"] == [] and sorted(r2["skipped"]) == sorted(r1["done"])

    # drop one manifest -> only that shard recomputed, outputs equal
    victim = r1["done"][0]
    before = rd.read_parquet(os.path.join(out, victim, "tier=1h")).to_pandas()
    os.remove(os.path.join(out, "_manifests", f"{victim}.json"))
    r3 = run_resumable(tiny_fixture_path, out)
    assert r3["done"] == [victim]
    after = rd.read_parquet(os.path.join(out, victim, "tier=1h")).to_pandas()
    key = ["source", "bucket_ts"]
    pd.testing.assert_frame_equal(
        before.sort_values(key).reset_index(drop=True),
        after.sort_values(key).reset_index(drop=True),
    )

    # config change invalidates everything
    r4 = run_resumable(tiny_fixture_path, out, cascade_kwargs={"mincounts_perc": 0.5})
    assert sorted(r4["done"]) == sorted(r1["done"])
    man = json.load(open(os.path.join(out, "_manifests", f"{victim}.json")))
    assert man["metrics"]["tier_rows"]["1m"] > 0
    assert man["lineage"]["input_files"]


def test_pack_codes_c_matches_numpy_path():
    # round-5 pin: the compiled accumulator packer must be
    # byte-identical to the numpy bit-expansion fallback on arbitrary
    # width mixes (1..64 bits, including full-width codes)
    import numpy as np

    from diive_ray.state.gorilla import _pack_codes_c

    def numpy_pack(codes, widths):
        starts = np.cumsum(widths) - widths
        total = int(starts[-1] + widths[-1])
        flat = np.zeros(total, dtype=np.uint8)
        for w in np.unique(widths):
            wi = int(w)
            sel = widths == w
            be = codes[sel].astype(">u8").view(np.uint8).reshape(-1, 8)
            bits = np.unpackbits(be, axis=1)[:, 64 - wi:]
            pos = starts[sel][:, None] + np.arange(wi)[None, :]
            flat[pos.reshape(-1)] = bits.reshape(-1)
        return np.packbits(flat).tobytes()

    rng = np.random.Generator(np.random.Philox(key=[257, 2026]))
    for _ in range(25):
        n = int(rng.integers(1, 2500))
        widths = rng.integers(1, 65, n).astype(np.int64)
        codes = rng.integers(0, 1 << 63, n,
                             dtype=np.int64).astype(np.uint64)
        codes = np.where(
            widths >= 64, codes,
            codes & ((np.uint64(1) << widths.astype(np.uint64))
                     - np.uint64(1)))
        got = _pack_codes_c(np.ascontiguousarray(codes),
                            np.ascontiguousarray(widths))
        if got is None:            # no toolchain: fallback covers it
            return
        assert got == numpy_pack(codes, widths)
