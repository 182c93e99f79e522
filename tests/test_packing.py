"""Packing / sampling / decontamination stage tests (stages/packing.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from diive_ray.functions import text as tx
from diive_ray.stages.packing import (
    collect_benchmark_grams,
    decontaminate,
    keep_mask,
    pack_sequences,
    sample_by_source,
)


def _docs_ds(texts, ids=None, n_blocks=4):
    ids = list(range(len(texts))) if ids is None else ids
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    return rd.from_arrow(t).repartition(n_blocks)


def _pack_oracle(texts, ids, seq_len):
    """In-memory packing oracle: plain cumsum in id order."""
    order = np.argsort(ids)
    n = np.array([len(texts[i].split()) for i in order], dtype=np.int64)
    keep = n > 0
    n = n[keep]
    s = np.cumsum(n) - n
    e = s + n
    rows = {}
    for si, ei in zip(s, e):
        for seq in range(si // seq_len, (ei - 1) // seq_len + 1):
            lo, hi = seq * seq_len, (seq + 1) * seq_len
            r = rows.setdefault(seq, [0, 0, 0])
            r[0] += 1
            r[1] += min(ei, hi) - max(si, lo)
            r[2] += 1 if si >= lo else 0
    return pd.DataFrame(
        [(k, *v) for k, v in sorted(rows.items())],
        columns=["seq_id", "n_docs", "n_tokens", "n_starts"],
    )


def test_pack_sequences_matches_oracle(ray_session):
    rng = np.random.default_rng(7)
    texts = [" ".join(["w%d" % rng.integers(50) for _ in range(rng.integers(0, 40))])
             for _ in range(200)]
    ids = list(range(200))
    got = (
        pack_sequences(_docs_ds(texts, ids), seq_len=64, bucket_width=16)
        .to_pandas().sort_values("seq_id").reset_index(drop=True)
    )
    exp = _pack_oracle(texts, np.array(ids), 64)
    pd.testing.assert_frame_equal(got.astype(np.int64), exp.astype(np.int64))
    # every full sequence carries exactly seq_len tokens
    assert (got["n_tokens"].iloc[:-1] == 64).all()
    # token conservation
    assert got["n_tokens"].sum() == sum(len(t.split()) for t in texts)


def test_pack_sequences_long_doc_spans_many(ray_session):
    texts = ["x " * 500, "y " * 10]  # doc 0 spans ~8 sequences of 64
    got = (
        pack_sequences(_docs_ds(texts, [5, 9], n_blocks=2), seq_len=64, bucket_width=4)
        .to_pandas().sort_values("seq_id").reset_index(drop=True)
    )
    exp = _pack_oracle(texts, np.array([5, 9]), 64)
    pd.testing.assert_frame_equal(got.astype(np.int64), exp.astype(np.int64))


def test_keep_mask_deterministic_and_rate():
    ids = np.arange(100000, dtype=np.int64)
    m = keep_mask(ids, np.full(len(ids), 30))
    assert abs(m.mean() - 0.30) < 0.01
    # stable across splits
    m2 = np.concatenate([keep_mask(ids[:777], np.full(777, 30)),
                         keep_mask(ids[777:], np.full(len(ids) - 777, 30))])
    assert (m == m2).all()


def test_sample_by_source_filters(ray_session):
    t = pa.table({
        "doc_id": pa.array(range(1000), pa.int64()),
        "source": pa.array(["src%d" % (i % 4) for i in range(1000)]),
    })
    ds = rd.from_arrow(t).repartition(4)
    out = sample_by_source(
        ds, rate_fn=lambda s: np.array([0 if x == "src0" else 100 for x in s])
    ).to_pandas()
    assert (out["source"] != "src0").all()
    assert len(out) == 750


def test_decontaminate_plants(ray_session):
    shared = "alpha beta gamma delta epsilon zeta"
    texts = [shared + " one two three",            # id 0: benchmark (0 % 3 == 0)
             "unrelated words only here",          # id 1: clean
             "prefix " + shared + " suffix words", # id 2: contaminated
             shared]                               # id 3: benchmark (3 % 3 == 0)
    ds = _docs_ds(texts, n_blocks=2)
    bench = collect_benchmark_grams(ds, k=4, bench_mod=3)
    assert len(bench) > 0
    hits = decontaminate(ds, bench, k=4, bench_mod=3).to_pandas()
    hits = hits.set_index("doc_id")["n_hits"]
    assert hits.loc[1] == 0
    # doc 2 shares the 3 distinct 4-grams of the shared 6-word phrase
    assert hits.loc[2] == 3
    assert 0 not in hits.index and 3 not in hits.index  # benchmark rows excluded


def test_decontaminate_hash_equals_strings():
    # engine gram hashing reproduces string-gram distinctness on a batch
    texts = ["a b c d e f", "b c d e f g", "zz yy xx ww"]
    sets = tx.batch_shingle_hashes(texts, k=4)
    assert len(sets[0]) == 3 and len(sets[1]) == 3 and len(sets[2]) == 1
    inter = np.intersect1d(sets[0], sets[1])
    assert len(inter) == 2  # 'b c d e', 'c d e f'


def test_hash_sample_topk_partitioning_invariant(ray_session):
    """The sample is a pure function of the ids — identical at any
    partitioning and equal to a pandas replay of the hash ranking."""
    from diive_ray.stages.packing import hash_sample_topk

    df = pd.DataFrame({
        "src": np.repeat(["x", "y", "z"], 400),
        "doc_id": np.arange(1200, dtype=np.int64) * 13 + 5,
    })
    h = (df["doc_id"].to_numpy().astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
    exp = (
        df.assign(h=h.astype(np.int64))
        .sort_values(["src", "h", "doc_id"])
        .groupby("src").head(7)
        .reset_index(drop=True)
    )
    outs = []
    for parts in (1, 4, 9):
        got = hash_sample_topk(
            rd.from_pandas(df).repartition(parts), k=7, id_col="doc_id", keys=["src"]
        )
        outs.append(got[["src", "doc_id", "h"]].reset_index(drop=True))
    assert outs[0].equals(outs[1]) and outs[1].equals(outs[2])
    assert outs[0]["doc_id"].tolist() == exp["doc_id"].tolist()
    assert outs[0]["h"].tolist() == exp["h"].tolist()


def test_global_shuffle_order_exact_and_invariant(ray_session):
    """Positions are a pure function of the ids: equal to the pandas
    hash-sort replay, identical at any partitioning / bucket count,
    and each hash bucket owns a contiguous global range."""
    from diive_ray.stages.packing import global_shuffle_order

    ids = np.arange(3000, dtype=np.int64) * 7 + 1
    df = pd.DataFrame({"doc_id": ids})
    h = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
    exp = (
        df.assign(h=h.astype(np.int64))
        .sort_values(["h", "doc_id"])
        .reset_index(drop=True)
        .assign(pos=np.arange(len(df), dtype=np.int64))
    )
    outs = []
    for parts, nb in ((1, 8), (5, 8), (5, 17)):
        got = (
            global_shuffle_order(rd.from_pandas(df).repartition(parts), n_buckets=nb)
            .to_pandas().sort_values("pos").reset_index(drop=True)
        )
        outs.append(got[["doc_id", "h", "pos"]])
        # bucket ranges are contiguous in global order
        gb = got.sort_values("pos").groupby("bucket")["pos"]
        lo, hi, n = gb.min(), gb.max(), gb.size()
        assert ((hi - lo + 1) == n).all()
    assert outs[0].equals(outs[1]) and outs[1].equals(outs[2])
    assert outs[0]["doc_id"].tolist() == exp["doc_id"].tolist()
    assert outs[0]["pos"].tolist() == exp["pos"].tolist()
    # permutation sanity: every position exactly once
    assert np.array_equal(np.sort(outs[0]["pos"].to_numpy()), np.arange(len(df)))


def test_write_training_shards_global_order(ray_session, tmp_path):
    """Shard files concatenated in shard_id order reproduce the exact
    hash-shuffled corpus, payload intact; manifest ranges partition
    [0, n) contiguously."""
    import glob

    from diive_ray.stages.packing import write_training_shards

    n = 2000
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64) * 3 + 11,
        "txt": [f"doc-{i}" for i in range(n)],
    })
    out = str(tmp_path / "shards")
    man = write_training_shards(
        rd.from_pandas(df).repartition(6), out, n_buckets=7)
    assert man["n_rows"].sum() == n
    # manifest ranges tile [0, n) in shard order
    assert man["pos_min"].iloc[0] == 0 and man["pos_max"].iloc[-1] == n - 1
    assert (man["pos_min"].iloc[1:].to_numpy() ==
            man["pos_max"].iloc[:-1].to_numpy() + 1).all()

    files = sorted(glob.glob(out + "/shard_*.parquet"))
    assert len(files) == len(man)
    back = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    assert back["pos"].tolist() == list(range(n))
    h = (df["doc_id"].to_numpy().astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
    exp = df.assign(h=h.astype(np.int64)).sort_values(["h", "doc_id"])
    assert back["doc_id"].tolist() == exp["doc_id"].tolist()
    assert back["txt"].tolist() == exp["txt"].tolist()


def test_tokens_vocab_hist_invariants(ray_session):
    """tf/df sanity at sf0.001: partitioning-invariant, df <= tf,
    df <= n_docs, total tf == total token count."""
    from diive_ray.pipelines.queries import q_tokens_vocab_hist

    out = q_tokens_vocab_hist("/root/testdata/sf0.001")
    assert (out["df"] <= out["n"]).all()
    import pyarrow.parquet as pq
    eid = pq.read_table("/root/testdata/sf0.001/events.parquet", columns=["event_id"])
    ids = eid["event_id"].to_numpy()
    assert (out["df"] <= len(ids)).all()
    assert out["n"].sum() == int((ids % 257 + 1).sum())
