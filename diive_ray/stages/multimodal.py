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
