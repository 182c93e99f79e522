"""Round-2 dedup scale-path tests: distributed MinHash verification
(plan shape — nothing pair-shaped on the driver), connected components
via label propagation, exact_dedup broadcast vs shuffle modes, 10x
planted-dup recall, and the exchange disjointness validator."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from diive_ray.functions import text as tx
from diive_ray.stages import dedup as dd

WORDS = np.array(
    "the quick brown fox jumps over lazy dog data table query scan row batch value key merge".split()
)


def _mk_corpus(n_base: int, seed: int = 123) -> pd.DataFrame:
    """n_base random docs + 3 exact dups (of 0..2) + 4 near-dups (of
    3..6), same construction as test_dedup.corpus but sized by n_base."""
    rng = np.random.Generator(np.random.Philox(key=seed))
    rows = []
    for i in range(n_base):
        rows.append({
            "doc_id": i,
            "lang": "en" if i % 2 == 0 else "es",
            "text": " ".join(rng.choice(WORDS, size=40)),
        })
    for j, src in enumerate((0, 1, 2)):
        rows.append({"doc_id": 10_000 + j, "lang": rows[src]["lang"], "text": rows[src]["text"]})
    for j, src in enumerate((3, 4, 5, 6)):
        w = rows[src]["text"].split()
        w[20] = "REPLACED"
        rows.append({"doc_id": 20_000 + j, "lang": rows[src]["lang"], "text": " ".join(w)})
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def corpus10x(ray_session):
    return _mk_corpus(600)


@pytest.fixture(scope="module")
def ds10x(corpus10x):
    return rd.from_pandas(corpus10x).repartition(8)


def test_lsh_candidate_pairs_is_a_dataset(ds10x):
    """Plan-shape contract: the candidate tier returns a Dataset — no
    driver-side pair list anywhere in the verification path."""
    sig = dd.signature_dataset(ds10x)
    cands = dd.lsh_candidate_pairs(sig)
    assert isinstance(cands, rd.Dataset)
    verified = dd.verify_pairs_exact_jaccard(ds10x, cands)
    assert isinstance(verified, rd.Dataset)


def test_minhash_recall_at_10x(ds10x, corpus10x):
    """Planted exact+near dups all recovered at 10x the round-1 corpus,
    and every returned pair matches the brute-force Jaccard oracle."""
    got = dd.minhash_dup_pairs(ds10x, threshold=0.5)
    pairs = set(zip(got["id_a"], got["id_b"]))
    assert {(0, 10_000), (1, 10_001), (2, 10_002)} <= pairs
    assert {(3, 20_000), (4, 20_001), (5, 20_002), (6, 20_003)} <= pairs
    sh = {r.doc_id: tx.shingle_hashes(r.text) for r in corpus10x.itertuples()}
    for _, r in got.iterrows():
        j = tx.exact_jaccard(sh[r["id_a"]], sh[r["id_b"]])
        assert j >= 0.5 and abs(j - r["jaccard"]) < 1e-12


def test_connected_components_labels(ray_session):
    edges = pd.DataFrame({
        # two components: {1,2,3,9,10} (chain) and {7,8}; 10<9 ordering
        # exercises the natural-ordering fix (string order would pick '10')
        "id_a": [1, 2, 3, 9, 7],
        "id_b": [2, 3, 9, 10, 8],
    })
    labels = dd.connected_components(rd.from_pandas(edges)).to_pandas()
    lab = dict(zip(labels["node"], labels["label"]))
    assert lab[1] == lab[2] == lab[3] == lab[9] == lab[10] == 1
    assert lab[7] == lab[8] == 7


def test_union_find_native_ordering():
    rep = dd.union_find_keep([(9, 10)], [9, 10])
    assert rep[10] == 9  # str ordering would have produced 10


def test_minhash_dedup_keeps_representatives(ds10x, corpus10x):
    kept = dd.minhash_dedup(ds10x, threshold=0.5).to_pandas()
    # 7 planted dup docs dropped, their sources kept
    assert len(kept) == len(corpus10x) - 7
    assert {0, 1, 2, 3, 4, 5, 6} <= set(kept["doc_id"])
    assert not set(kept["doc_id"]) & {10_000, 10_001, 10_002, 20_000, 20_001, 20_002, 20_003}


def test_exact_dedup_modes_agree(ds10x, corpus10x):
    a = dd.exact_dedup(ds10x, mode="broadcast").to_pandas()
    b = dd.exact_dedup(ds10x, mode="shuffle").to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    assert len(a) == len(corpus10x) - 3


def test_exact_dedup_key_projection_excludes_text(ds10x, monkeypatch):
    """Broadcast mode's exchange must only ever see the 24-byte key
    projection — assert no exchanged dataset carries the text payload."""
    from diive_ray.stages import exchange as ex

    seen_cols = []
    orig = ex.block_map

    def spy(ds, keys, fn, **kw):
        seen_cols.append(set(ds.schema().names))
        return orig(ds, keys, fn, **kw)

    monkeypatch.setattr(ex, "block_map", spy)
    dd.exact_dedup(ds10x, mode="broadcast").materialize()
    assert seen_cols, "exchange was never used"
    for cols in seen_cols:
        assert "text" not in cols


def test_exchange_disjointness_validator(ray_session, monkeypatch):
    """DIIVE_RAY_VALIDATE_EXCHANGE=1 passes on a healthy exchange."""
    from diive_ray.stages.exchange import block_map

    monkeypatch.setenv("DIIVE_RAY_VALIDATE_EXCHANGE", "1")
    df = pd.DataFrame({"k": np.arange(500) % 17, "v": np.arange(500)})
    out = block_map(
        rd.from_pandas(df).repartition(4),
        ["k"],
        lambda d: d.groupby("k", as_index=False)["v"].sum(),
        batch_format="pandas",
        zero_copy_batch=False,
    ).to_pandas()
    exp = df.groupby("k", as_index=False)["v"].sum()
    got = out.sort_values("k").reset_index(drop=True)
    assert (got["v"].to_numpy() == exp["v"].to_numpy()).all()


def test_exchange_split_partition_fails_loudly(ray_session):
    """VERDICT r2 #1: if a keyed partition is ever split into multiple
    blocks (a future Ray honoring target_max_block_size inside the
    hash-shuffle aggregator), the always-on checker must raise rather
    than let per-group consumers emit duplicate rows. Simulate the
    split by scattering part labels with an UNKEYED repartition and
    running the same validating wrapper block_map installs."""
    import uuid

    import pytest

    from diive_ray.stages import exchange as ex

    df = pd.DataFrame({"k": np.arange(2000) % 7, "v": np.arange(2000)})
    labeled = ex._add_part_column(rd.from_pandas(df).repartition(4), ["k"], 64)
    scattered = labeled.repartition(8)  # rows of one part now span blocks
    fn = ex._validating_fn(lambda b: b, uuid.uuid4().hex, ex._get_checker(), "pyarrow")
    with pytest.raises(Exception, match="invariant violated"):
        scattered.map_batches(fn, batch_format="pyarrow", batch_size=None).materialize()


def test_exchange_tiny_block_size_still_correct(ray_session):
    """With target_max_block_size far below the partition size, today's
    Ray still hands block_map whole partitions (one block each) and the
    always-on checker passes — proving either correct output or (if a
    future Ray splits) the loud failure above."""
    from ray.data.context import DataContext

    from diive_ray.stages.exchange import block_map

    ctx = DataContext.get_current()
    prev = ctx.target_max_block_size
    ctx.target_max_block_size = 1 << 14  # 16 KiB
    try:
        df = pd.DataFrame({
            "k": np.arange(60_000) % 5,
            "v": np.random.default_rng(0).random(60_000),
            "pad": ["x" * 64] * 60_000,
        })
        out = block_map(
            rd.from_pandas(df).repartition(6),
            ["k"],
            lambda d: d.groupby("k", as_index=False)["v"].sum(),
            batch_format="pandas",
            zero_copy_batch=False,
        ).to_pandas()
        exp = df.groupby("k", as_index=False)["v"].sum()
        got = out.sort_values("k").reset_index(drop=True)
        assert np.allclose(got["v"].to_numpy(), exp["v"].to_numpy())
    finally:
        ctx.target_max_block_size = prev


def test_default_partitions_scales_with_cluster(ray_session):
    """The exchange fans out to 2 x cluster CPUs, uncapped (the round-2
    32-partition clamp starved multi-node clusters)."""
    import ray as _ray

    from diive_ray.stages.exchange import default_partitions

    cpus = int(_ray.cluster_resources().get("CPU", 8))
    assert default_partitions() == max(8, 2 * cpus)


def test_exchange_reexecution_no_false_positive(ray_session):
    """Round-3 regression: a lazy block_map Dataset consumed TWICE
    (count() then to_pandas(), as the driver's row+hash compare does)
    must not trip the split guard. The old whole-block fingerprint
    false-positived because the hash-shuffle's partition->aggregator
    grouping differs across executions; the per-label fingerprint is
    execution-invariant."""
    from diive_ray.stages.exchange import block_map

    df = pd.DataFrame({"k": np.arange(3000) % 23, "v": np.arange(3000, dtype=float)})
    out = block_map(
        rd.from_pandas(df).repartition(5),
        ["k"],
        lambda d: d.groupby("k", as_index=False)["v"].sum(),
        batch_format="pandas",
        zero_copy_batch=False,
    )
    n = out.count()          # execution 1
    got = out.to_pandas()    # execution 2 — same exchange_id, re-registered
    assert n == 23 and len(got) == 23
    exp = df.groupby("k", as_index=False)["v"].sum()
    assert np.allclose(got.sort_values("k")["v"].to_numpy(), exp["v"].to_numpy())


def test_exchange_weight_col_tolerates_batch_dependent_partials(ray_session):
    """Combiner-fed exchange: per-label ROW counts vary with upstream
    batch boundaries, but the per-label sum of an additive weight
    column is invariant — weight_col validation must pass where
    row-count validation would false-positive across batch layouts."""
    from diive_ray.stages.exchange import block_map

    rng = np.random.default_rng(7)
    base = pd.DataFrame({"k": rng.integers(0, 11, 4000), "count": 1, "v": rng.random(4000)})

    def partials(d: pd.DataFrame) -> pd.DataFrame:
        return d.groupby("k", as_index=False).agg(count=("count", "sum"), v=("v", "sum"))

    def combine(d: pd.DataFrame) -> pd.DataFrame:
        return d.groupby("k", as_index=False).agg(count=("count", "sum"), v=("v", "sum"))

    # two different upstream batchings -> different per-label partial row counts
    results = []
    for parts in (3, 9):
        ds = rd.from_pandas(base).repartition(parts).map_batches(
            partials, batch_format="pandas", batch_size=512
        )
        out = block_map(ds, ["k"], combine, batch_format="pandas",
                        zero_copy_batch=False, weight_col="count")
        out.count()                      # execute twice on purpose
        results.append(out.to_pandas().sort_values("k").reset_index(drop=True))
    exp = base.groupby("k", as_index=False).agg(count=("count", "sum"), v=("v", "sum"))
    for got in results:
        assert (got["count"].to_numpy() == exp["count"].to_numpy()).all()
        assert np.allclose(got["v"].to_numpy(), exp["v"].to_numpy())


def test_exchange_split_detected_on_weight_path(ray_session):
    """A split partition must still fail loudly when validating on
    weight_col: each half carries a smaller weight-sum than the
    registered whole (or two unequal halves disagree)."""
    import uuid

    from diive_ray.stages import exchange as ex

    df = pd.DataFrame({"k": np.arange(2000) % 7, "count": 1, "v": np.arange(2000)})
    labeled = ex._add_part_column(rd.from_pandas(df).repartition(4), ["k"], 64)
    scattered = labeled.repartition(8)  # rows of one part now span blocks
    fn = ex._validating_fn(
        lambda b: b, uuid.uuid4().hex, ex._get_checker(), "pyarrow", weight_col="count"
    )
    with pytest.raises(Exception, match="invariant violated"):
        scattered.map_batches(fn, batch_format="pyarrow", batch_size=None).materialize()


def test_rollup_cascade_double_execution(ray_session):
    """Round-3 regression for the observed false positive: the tier
    rollup's combiner-fed exchange re-executed (count + to_pandas per
    tier) must stay green under always-on validation."""
    from diive_ray.pipelines.rollup import rollup_cascade

    rng = np.random.default_rng(11)
    n = 3 * 6 * 3600
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(np.tile(np.arange(6 * 3600), 3), unit="s")
    df = pd.DataFrame({
        "source": np.repeat([f"s{i}" for i in range(3)], 6 * 3600),
        "ts": ts,
        "doc_id": [f"d{i:07d}" for i in range(n)],
        "n_tok": rng.integers(1, 500, n).astype(float),
    })
    tiers = rollup_cascade(
        rd.from_pandas(df).repartition(6),
        value_col="n_tok", keys=("source",), ts_col="ts",
        dedup=True, dedup_exact=True,
    )
    for name in ("1m", "1h", "1d"):
        n = tiers[name].count()
        got = tiers[name].to_pandas()
        assert n == len(got) and n > 0
