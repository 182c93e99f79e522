"""Canonical schemas and engine-wide constants.

The primary input is the north-rule table (BASELINE.json ``input_hint``):
Parquet of pre-tokenized training sequences with columns
``doc_id:string, tokens:list<int32>, n_tok:int32, source:string`` plus an
event-time column ``ts:timestamp[us]`` synthesized deterministically.

Timestamp convention (reference: diive/core/times/times.py:1647-1651):
``ts`` marks the END of the record's interval (TIMESTAMP_END semantics).
All bucket labels produced by the engine are END-labeled (right edge of
the bucket, left-closed interval), mirroring
diive/core/times/resampling.py:174-181.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------- schemas

TOKENS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# Rollup tier output schema: one row per (source, bucket_ts) aggregate of
# n_tok. ``mean`` is always derived as sum/count at read time so tiers can
# cascade losslessly (sum/count/min/max are decomposable).
ROLLUP_SCHEMA = pa.schema(
    [
        pa.field("source", pa.string()),
        pa.field("bucket_ts", pa.timestamp("us")),
        pa.field("count", pa.int64()),
        pa.field("sum", pa.float64()),
        pa.field("min", pa.float64()),
        pa.field("max", pa.float64()),
        pa.field("mean", pa.float64()),
    ]
)

# ---------------------------------------------------------------- tiers

US_PER_SEC = 1_000_000
US_PER_MIN = 60 * US_PER_SEC
US_PER_HOUR = 60 * US_PER_MIN
US_PER_DAY = 24 * US_PER_HOUR

#: Retention tiers of the cascade, name -> bucket width in microseconds.
#: Each tier's bucket id is an integer multiple of the previous tier's
#: (60x, 60x, 24x), so cascading re-aggregation never re-buckets a row
#: into a different coarse bucket than direct aggregation would.
TIERS = {
    "1m": US_PER_MIN,
    "1h": US_PER_HOUR,
    "1d": US_PER_DAY,
}

#: Flag values (reference: diive/core/base/flagbase.py:112-120 and
#: diive/preprocessing/outlier_detection/hampel.py:18-21).
FLAG_OK = 0
FLAG_SOFT = 1
FLAG_HARD = 2

#: Month -> season id map (reference: diive/core/times/times.py:15-21).
DEFAULT_SEASON_MAP = {
    1: 1, 2: 1, 12: 1,   # winter (DJF)
    3: 2, 4: 2, 5: 2,    # spring (MAM)
    6: 3, 7: 3, 8: 3,    # summer (JJA)
    9: 4, 10: 4, 11: 4,  # autumn (SON)
}
