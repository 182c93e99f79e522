"""Multimodal plumbing: payload schema, actor-pool decode stage wiring,
strict-mode NotImplementedError at the codec boundary."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from diive_ray.stages import multimodal as mm


@pytest.fixture(scope="module")
def docs(ray_session):
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["abcd efgh", "x", ""],
    })
    return rd.from_pandas(df)


def test_payload_schema_and_meta(docs):
    ds = mm.attach_payload_from_text(docs)
    t = ds.take_all()
    row = next(r for r in t if r["doc_id"] == 1)
    assert row["payload"] == b"abcd efgh"
    assert row["media_type"] == "image"
    assert row["media_bytes"] == 9


def test_decode_stub_features(docs):
    out = mm.decode_features(mm.attach_payload_from_text(docs), strict=False, batch_size=2).to_pandas()
    out = out.set_index("doc_id")
    a = np.frombuffer(b"abcd efgh", dtype=np.uint8)
    assert out.loc[1, "width"] == int(a[0]) * 256 + int(a[1])
    assert out.loc[1, "height"] == int(a[2]) * 256 + int(a[3])
    assert out.loc[1, "byte_sum"] == int(a.sum())
    assert out.loc[3, "width"] == 0 and out.loc[3, "byte_sum"] == 0
    assert "payload" not in out.columns  # heavy bytes dropped on output


def test_decode_strict_raises(docs):
    ds = mm.decode_features(mm.attach_payload_from_text(docs), strict=True)
    with pytest.raises(Exception) as ei:
        ds.take_all()
    assert "NotImplementedError" in str(ei.value) or isinstance(ei.value, NotImplementedError)


def test_resize_stub_keeps_strided_bytes(docs):
    from diive_ray.stages import multimodal as mm

    with_payload = mm.attach_payload_from_text(docs)
    out = mm.resize_media(with_payload, stride=2).to_pandas()
    src = docs.to_pandas().sort_values("doc_id").reset_index(drop=True)
    out = out.sort_values("doc_id").reset_index(drop=True)
    for i in range(len(out)):
        exp = src["text"].iloc[i].encode()[::2]
        assert bytes(out["payload"].iloc[i]) == exp
        assert out["media_bytes"].iloc[i] == len(exp)


def test_frame_sample_fanout(docs):
    import numpy as np

    from diive_ray.stages import multimodal as mm

    with_payload = mm.attach_payload_from_text(docs)
    out = mm.sample_frames(with_payload, frame_size=8, every=2).to_pandas()
    src = docs.to_pandas()
    # per-doc expected frames: every 2nd frame of size 8
    exp_rows = 0
    for s in src["text"]:
        n_frames = len(s.encode()) // 8
        exp_rows += len(range(0, n_frames, 2))
    assert len(out) == exp_rows
    # frame content check for one doc
    d0 = src.sort_values("doc_id").iloc[0]
    buf = d0["text"].encode()
    g = out[out["doc_id"] == d0["doc_id"]].sort_values("frame_idx")
    for _, r in g.iterrows():
        fi = int(r["frame_idx"])
        assert bytes(r["frame_bytes"]) == buf[fi * 8:(fi + 1) * 8]
        assert fi % 2 == 0
