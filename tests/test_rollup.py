"""Tier-cascade correctness vs. the pandas oracle (FIXTURES.md F2/F3)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from diive_ray.pipelines.rollup import tokens_cascade, rollup_cascade
from diive_ray.schema import US_PER_MIN
from diive_ray.stages.bucket import bucket_end_us
from diive_ray.stages.resample import rollup
from diive_ray.util import ts_to_us

from . import oracle


def _sorted(df, keys=("source", "bucket_ts")):
    return df.sort_values(list(keys), kind="stable").reset_index(drop=True)


def _assert_tier_equal(got: pd.DataFrame, exp: pd.DataFrame, key="source"):
    got = _sorted(got, (key, "bucket_ts"))
    exp = _sorted(exp, (key, "bucket_ts"))
    assert len(got) == len(exp), f"row count {len(got)} != {len(exp)}"
    pd.testing.assert_series_equal(got[key], exp[key], check_names=False)
    assert (got["bucket_ts"].to_numpy() == exp["bucket_ts"].to_numpy()).all()
    assert (got["count"].to_numpy() == exp["count"].to_numpy()).all()
    np.testing.assert_allclose(got["sum"], exp["sum"], rtol=0, atol=0)
    assert (got["min"].to_numpy() == exp["min"].to_numpy()).all()
    assert (got["max"].to_numpy() == exp["max"].to_numpy()).all()
    np.testing.assert_allclose(got["mean"], exp["mean"], rtol=1e-12)


def test_bucket_ceiling_composes():
    ts = np.array([1, 59_999_999, 60_000_000, 60_000_001, 3_600_000_000], dtype=np.int64)
    b1m = bucket_end_us(ts, 60_000_000)
    assert list(b1m) == [60_000_000, 60_000_000, 60_000_000, 120_000_000, 3_600_000_000]
    b1h_direct = bucket_end_us(ts, 3_600_000_000)
    b1h_cascade = bucket_end_us(b1m, 3_600_000_000)
    assert (b1h_direct == b1h_cascade).all()


@pytest.fixture(scope="module")
def cascade_tiers(tiny_fixture_path):
    tiers = tokens_cascade(tiny_fixture_path, mincounts_perc=0.9, gapfill=True)
    return {k: v.to_pandas() for k, v in tiers.items()}


@pytest.fixture(scope="module")
def oracle_tiers(tiny_raw_df):
    d = oracle.dedup_keep_last(tiny_raw_df)
    t1m = oracle.resample_first_tier(
        d, "1min", value_col="n_tok", end_stamped=True, raw_width_s=1.0, mincounts_perc=0.9
    )
    t1h = oracle.resample_coarser(t1m, "1h")
    t1d = oracle.resample_coarser(t1h, "1D")
    return {"1m": t1m, "1h": t1h, "1d": t1d}


def test_tier_1m_matches_oracle(cascade_tiers, oracle_tiers):
    _assert_tier_equal(cascade_tiers["1m"], oracle_tiers["1m"])


def test_tier_1h_matches_oracle(cascade_tiers, oracle_tiers):
    _assert_tier_equal(cascade_tiers["1h"], oracle_tiers["1h"])


def test_tier_1d_matches_oracle(cascade_tiers, oracle_tiers):
    _assert_tier_equal(cascade_tiers["1d"], oracle_tiers["1d"])


def test_mincount_mask_dropped_sparse_buckets(cascade_tiers, tiny_raw_df):
    """The sparse span (40 % coverage) must fail the 90 % min-count rule:
    its 1m buckets are absent from the tier (resampling.py:161-171)."""
    t1m = cascade_tiers["1m"]
    s00 = t1m[t1m["source"] == "s00"]
    # sparse span covers idx 300..899 -> END buckets 00:06..00:15
    t0 = pd.Timestamp("2022-07-01")
    sparse_buckets = pd.date_range(t0 + pd.Timedelta(minutes=6), t0 + pd.Timedelta(minutes=15), freq="1min")
    present = set(s00["bucket_ts"])
    assert not (set(sparse_buckets) & present)
    # but a full bucket right before is present
    assert t0 + pd.Timedelta(minutes=5) in present


def test_tier_conservation(tiny_fixture_path):
    """F3: sum(count 1m within hour h) == count(1h bucket h); sums likewise;
    min/max monotone — with no min-count masking."""
    tiers = tokens_cascade(tiny_fixture_path, mincounts_perc=0.0)
    t1m = tiers["1m"].to_pandas()
    t1h = tiers["1h"].to_pandas()
    t1m["h"] = bucket_end_us(ts_to_us(t1m["bucket_ts"]), 3_600_000_000)
    agg = t1m.groupby(["source", "h"]).agg(count=("count", "sum"), sum=("sum", "sum"),
                                           min=("min", "min"), max=("max", "max")).reset_index()
    t1h["h"] = ts_to_us(t1h["bucket_ts"])
    m = agg.merge(t1h, on=["source", "h"], suffixes=("_1m", "_1h"))
    assert len(m) == len(t1h) == len(agg)
    assert (m["count_1m"] == m["count_1h"]).all()
    np.testing.assert_allclose(m["sum_1m"], m["sum_1h"], rtol=1e-12)
    assert (m["min_1m"] == m["min_1h"]).all()
    assert (m["max_1m"] == m["max_1h"]).all()


def test_dedup_exact_equals_partitioned(tiny_fixture_path):
    """Shuffle-exact dedup and layout-assuming dedup agree on the fixture
    corpus (duplicates are adjacent within a file)."""
    t_exact = tokens_cascade(tiny_fixture_path, dedup_exact=True)["1m"].to_pandas()
    t_part = tokens_cascade(tiny_fixture_path, dedup_exact=False)["1m"].to_pandas()
    _assert_tier_equal(t_exact, t_part)


def test_rollup_permutation_invariant(tiny_fixture_path):
    """F3: shuffled input partitioning produces identical tier output."""
    base = tokens_cascade(tiny_fixture_path)["1m"].to_pandas()
    ds = rd.read_parquet(tiny_fixture_path, columns=["doc_id", "source", "ts", "n_tok"])
    shuffled = ds.random_shuffle(seed=7)
    got = rollup_cascade(
        shuffled, value_col="n_tok", keys=("source",), ts_col="ts",
        end_stamped=True, dedup=True, dedup_exact=True,
    )["1m"].to_pandas()
    _assert_tier_equal(base, got)


def test_fused_cascade_equals_generic(ray_session, tiny_fixture_path):
    """The single-exchange fused cascade must emit exactly the tiers the
    generic multi-exchange cascade produces (same dedup, same min-count
    rules)."""
    import pandas as pd

    from diive_ray.pipelines.rollup import tokens_cascade, tokens_cascade_fused

    fused = tokens_cascade_fused(
        tiny_fixture_path, mincounts_perc=0.9, coarse_mincounts_perc={"1h": 0.25}
    ).to_pandas()
    generic = tokens_cascade(
        tiny_fixture_path, mincounts_perc=0.9, coarse_mincounts_perc={"1h": 0.25}
    )
    for tier in ("1m", "1h", "1d"):
        f = (
            fused[fused["tier"] == tier]
            .drop(columns=["tier", "n_child"])
            .sort_values(["source", "bucket_ts"])
            .reset_index(drop=True)
        )
        g = generic[tier].to_pandas()
        g = g.drop(columns=[c for c in ("n_child",) if c in g.columns])
        g = g.sort_values(["source", "bucket_ts"]).reset_index(drop=True)
        g["bucket_ts"] = pd.to_datetime(g["bucket_ts"]).astype("datetime64[us]")
        f["bucket_ts"] = pd.to_datetime(f["bucket_ts"]).astype("datetime64[us]")
        f["count"] = f["count"].astype("int64")
        g["count"] = g["count"].astype("int64")
        pd.testing.assert_frame_equal(f, g[f.columns.tolist()], check_dtype=False)


def test_partitioned_cascade_equals_fused(ray_session, tiny_fixture_path):
    """Shuffle-free partition-aligned path == exchange path."""
    import pandas as pd

    from diive_ray.pipelines.rollup import tokens_cascade_fused, tokens_cascade_partitioned

    a = tokens_cascade_fused(tiny_fixture_path, mincounts_perc=0.9).to_pandas()
    b = tokens_cascade_partitioned(tiny_fixture_path, mincounts_perc=0.9).to_pandas()
    key = ["tier", "source", "bucket_ts"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    a["bucket_ts"] = pd.to_datetime(a["bucket_ts"]).astype("datetime64[us]")
    b["bucket_ts"] = pd.to_datetime(b["bucket_ts"]).astype("datetime64[us]")
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_file_group_dataset_manifest_vectorized(ray_session, tmp_path):
    """Manifest-path group assembly (rollup.py:file_group_dataset) is
    Arrow-vectorized: correctness on a many-group synthetic manifest
    (groups sorted, file lists path-sorted, days derived from chunk_lo)
    and no quadratic/row-loop blowup at 100k groups."""
    import time

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from diive_ray.pipelines.rollup import file_group_dataset

    day_seconds = 86_400
    n_sources, days, files_per_day = 100, 1000, 3  # 100k groups, 300k files
    src = np.repeat([f"s{i:03d}" for i in range(n_sources)], days * files_per_day)
    day = np.tile(np.repeat(np.arange(days), files_per_day), n_sources)
    part = np.tile(np.arange(files_per_day), n_sources * days)
    chunk_lo = day * day_seconds + part * (day_seconds // files_per_day)
    paths = np.char.add(
        np.char.add("lake/src-", src),
        np.char.add("/chunk-", np.char.add(chunk_lo.astype(str), ".parquet")),
    )
    # shuffle rows: grouping must not depend on manifest row order
    rng = np.random.Generator(np.random.Philox(key=77))
    perm = rng.permutation(len(paths))
    pq.write_table(
        pa.table({"path": paths[perm], "source": src[perm],
                  "chunk_lo": chunk_lo[perm]}),
        tmp_path / "_manifest.parquet",
    )

    t0 = time.perf_counter()
    got = file_group_dataset(str(tmp_path), day_seconds).to_pandas()
    elapsed = time.perf_counter() - t0

    assert len(got) == n_sources * days
    got = got.sort_values(["source", "day"]).reset_index(drop=True)
    # spot-check one group end-to-end
    g = got[(got["source"] == "s042") & (got["day"] == 500)]
    assert len(g) == 1
    files = list(g["files"].iloc[0])
    assert len(files) == files_per_day
    assert files == sorted(files)
    assert all(f.startswith("lake/src-s042/chunk-") for f in files)
    # every group has exactly files_per_day paths
    assert {len(f) for f in got["files"]} == {files_per_day}
    # vectorized path: ~1-2 s even on a loaded VM; a row loop over
    # 100k groups would take far longer (generous noise margin)
    assert elapsed < 30
