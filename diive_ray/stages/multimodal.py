"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque ``binary`` columns with typed metadata columns
alongside (the Arrow-native layout for 100 TB multimodal corpora:
payload bytes are never parsed by the engine core, only by decode
stages). Decode / feature-extraction / resize / frame-sample are
**actor-pool** ``map_batches`` stages: codec state (decoder tables,
model weights) is built once per actor in ``__init__``, batches are
processed in ``__call__`` with small ``batch_size`` (large payloads x
concurrency must fit worker heaps — driver brief).

The image/audio codec libraries are NOT in this container, so the
actual decode is STUBBED: ``DecodeStub`` raises ``NotImplementedError``
when ``strict=True`` and otherwise computes a deterministic fake decode
(byte-length + byte-sum + fake dims derived from the payload header).
The Ray-side plumbing — schema, actor signature, batch sizing, output
layout — is real and tested (tests/test_multimodal.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_META_FIELDS = [
    pa.field("media_type", pa.string()),   # 'image' | 'audio' | 'video'
    pa.field("media_codec", pa.string()),  # e.g. 'png', 'opus'
    pa.field("media_bytes", pa.int64()),
]


def attach_payload_from_text(
    ds: ray.data.Dataset, text_col: str = "text", media_type: str = "image", codec: str = "raw"
) -> ray.data.Dataset:
    """Deterministic fake payload for tests/benchmarks: the UTF-8 bytes
    of ``text_col`` become the binary payload (no external data; any
    real corpus would read payload columns straight from Parquet)."""

    def fn(t: pa.Table) -> pa.Table:
        payload = pa.array([s.encode("utf-8") for s in t[text_col].to_pylist()], pa.binary())
        n = t.num_rows
        return (
            t.append_column("payload", payload)
            .append_column("media_type", pa.array([media_type] * n))
            .append_column("media_codec", pa.array([codec] * n))
            .append_column("media_bytes", pa.compute.binary_length(payload).cast(pa.int64()))
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class DecodeStub:
    """Actor-pool decode stage. Real decoders (PIL/libav/...) are not in
    this container; ``strict=True`` raises NotImplementedError exactly
    where the codec call would go, ``strict=False`` produces the
    deterministic fake decode used by tests:

    * ``width`` / ``height`` — from the first 4 payload bytes (fake
      header parse, stands in for the codec's header decode),
    * ``byte_sum`` — sum of payload bytes mod 2^31-1 (stands in for
      the decoded-pixel checksum).

    Usage::

        ds.map_batches(DecodeStub, batch_format="pyarrow",
                       concurrency=(2, 8), batch_size=64,
                       fn_constructor_kwargs={"strict": False})
    """

    def __init__(self, strict: bool = False):
        # per-actor setup: a real stage would load codec/model state here
        self.strict = strict
        self.mod = np.int64(2**31 - 1)

    def _decode_one(self, buf: bytes) -> tuple[int, int, int]:
        if self.strict:
            raise NotImplementedError(
                "media codecs are not available in this environment; "
                "plug a real decoder here (PIL.Image.open / av.open)"
            )
        a = np.frombuffer(buf, dtype=np.uint8)
        width = int(a[0]) * 256 + int(a[1]) if len(a) >= 2 else 0
        height = int(a[2]) * 256 + int(a[3]) if len(a) >= 4 else 0
        byte_sum = int(a.astype(np.int64).sum() % self.mod)
        return width, height, byte_sum

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        w, h, s = [], [], []
        for buf in payloads:
            wi, hi, si = self._decode_one(buf)
            w.append(wi)
            h.append(hi)
            s.append(si)
        return (
            t.drop_columns(["payload"])  # decoded stages drop the heavy bytes
            .append_column("width", pa.array(w, pa.int64()))
            .append_column("height", pa.array(h, pa.int64()))
            .append_column("byte_sum", pa.array(s, pa.int64()))
        )


def decode_features(
    ds: ray.data.Dataset, *, strict: bool = False, batch_size: int = 64, concurrency=(1, 8)
) -> ray.data.Dataset:
    """The standard decode stage wiring: actor pool, small batches
    (payload bytes x batch_size x concurrency bounded), payload dropped
    on output so downstream stages never carry the heavy column."""
    return ds.map_batches(
        DecodeStub,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"strict": strict},
    )


class ResizeStub:
    """Actor-pool resize stage (PIL.Image.resize slot). The
    deterministic stand-in keeps every ``stride``-th payload byte — the
    payload column stays binary (a resize RETAINS the media, unlike the
    decode stage which drops it) and metadata is updated: fake dims
    halve per stride doubling, ``media_bytes`` reflects the new
    payload. Real plumbing: state in ``__init__``, small batches,
    zero-copy input."""

    def __init__(self, stride: int = 2, strict: bool = False):
        self.stride = int(stride)
        self.strict = strict

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "image resampling library not available; plug PIL/cv2 here"
            )
        out = []
        for buf in t["payload"].to_pylist():
            out.append(bytes(np.frombuffer(buf, dtype=np.uint8)[:: self.stride].tobytes()))
        payload = pa.array(out, pa.binary())
        t = t.drop_columns(["payload", "media_bytes"])
        return (
            t.append_column("payload", payload)
            .append_column("media_bytes", pa.compute.binary_length(payload).cast(pa.int64()))
        )


def resize_media(
    ds: ray.data.Dataset, *, stride: int = 2, strict: bool = False,
    batch_size: int = 64, concurrency=(1, 8),
) -> ray.data.Dataset:
    return ds.map_batches(
        ResizeStub, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency,
        fn_constructor_kwargs={"stride": stride, "strict": strict},
    )


class FrameSampleStub:
    """Actor-pool video frame-sampling stage (libav slot): treats the
    payload as a sequence of fixed-size fake frames and emits ONE ROW
    PER SAMPLED FRAME (the flat-map fan-out layout a real video
    pipeline needs — row count grows, payload per row shrinks).
    Output: (id columns passthrough, frame_idx, frame_bytes)."""

    def __init__(self, frame_size: int = 16, every: int = 4, strict: bool = False, id_cols=("doc_id",)):
        self.frame_size = int(frame_size)
        self.every = int(every)
        self.strict = strict
        self.id_cols = list(id_cols)

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("video demuxer not available; plug av.open here")
        ids = {c: t[c].to_pylist() for c in self.id_cols}
        out_ids = {c: [] for c in self.id_cols}
        out_idx, out_frames = [], []
        for row, buf in enumerate(t["payload"].to_pylist()):
            n_frames = max(0, len(buf) // self.frame_size)
            for fi in range(0, n_frames, self.every):
                for c in self.id_cols:
                    out_ids[c].append(ids[c][row])
                out_idx.append(fi)
                out_frames.append(buf[fi * self.frame_size:(fi + 1) * self.frame_size])
        cols = {c: pa.array(out_ids[c]) for c in self.id_cols}
        cols["frame_idx"] = pa.array(out_idx, pa.int64())
        cols["frame_bytes"] = pa.array(out_frames, pa.binary())
        return pa.table(cols)


def sample_frames(
    ds: ray.data.Dataset, *, frame_size: int = 16, every: int = 4,
    strict: bool = False, id_cols=("doc_id",), batch_size: int = 32, concurrency=(1, 8),
) -> ray.data.Dataset:
    """Frame sampling with the small-batch actor-pool contract (frame
    fan-out multiplies rows; batch_size bounds the output blow-up)."""
    return ds.map_batches(
        FrameSampleStub, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency,
        fn_constructor_kwargs={
            "frame_size": frame_size, "every": every,
            "strict": strict, "id_cols": id_cols,
        },
    )
