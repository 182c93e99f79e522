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
