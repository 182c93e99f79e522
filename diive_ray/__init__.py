"""diive_ray — a Ray-Data-native time-series rollup + downsample + retention engine.

A brand-new engine with the query/data-processing capabilities of
holukas/diive (reference, read-only at /root/reference), re-expressed
Ray-Data-first: ``ray.data.Dataset`` pipelines of ``map_batches`` over
zero-copy Arrow batches, actor pools for stateful stages, and
groupby/aggregate shuffles for the wide steps.

Semantics are derived from the reference (cited as ``path:line`` in each
module's docstrings); the physical execution is idiomatic Ray Data.

Layout:
  schema      canonical Arrow schemas + engine-wide constants
  fixtures    deterministic synthetic input generator (north-rule table)
  sources/    parquet readers + timestamp sanitizer
  stages/     operators: bucketing, resample tiers, gaps, outliers, QCF,
              corrections, time features, diel cycle, grid aggregation,
              dedup, text analysis, similarity search, multimodal plumbing
  state/      Gorilla compression, compressed block store, checkpoints
  pipelines/  end-to-end pipelines (flagship rollup cascade, screening)
  functions/  scalar/array kernels (token-array ops)
"""

__version__ = "0.1.0"


def _configure_data_context() -> None:
    """Engine-wide Ray Data defaults (no ray.init here — the driver owns
    the session; DataContext is plan-level config).

    HASH_SHUFFLE is required by the exchange layer
    (stages/exchange.py): ``repartition(n, keys=...)`` — the engine's
    only wide exchange — raises under the default sort strategy. All
    high-cardinality group work goes through vectorized per-block
    combines instead of ``groupby().aggregate()`` (measured 28x faster
    on this container; rationale in stages/exchange.py)."""
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # Bound the per-exchange aggregator actor pool: a multi-exchange
    # plan (dedup + 3 cascade tiers) would otherwise spawn
    # 64 actors x 4 ops on one node and OOM. Scale the cap with the
    # session's CPUs (half, in [4, 16]) so one exchange neither starves
    # a 32-CPU run nor floods a 4-CPU test session.
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    ctx.max_hash_shuffle_aggregators = max(4, min(16, cpus // 2))


_configure_data_context()
