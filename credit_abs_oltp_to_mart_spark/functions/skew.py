"""Skew mitigation: salted two-stage aggregation.

A groupBy on a low-cardinality / hot key (event_type, currency, status…)
hash-partitions every row of a hot key into ONE reducer — at 100 TB that
one task runs for hours while the rest of the cluster idles. Spark's
map-side partial aggregation usually absorbs this, but it degrades when
the per-partition key fan-in is large (hash map spills) or the aggregation
buffer is wide. The classic fix is salting:

  stage 1: groupBy(key, salt)  — salt = deterministic bucket per row,
           spreading each hot key over ``n_salt`` reducers;
  stage 2: groupBy(key)        — merge the partials (sum of sums,
           sum of counts, min of mins, …).

Only algebraic aggregates (sum/count/min/max) can be merged this way,
which is exactly what this helper exposes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sum_cols: dict[str, Column] | None = None,
    count_alias: str | None = None,
    min_cols: dict[str, Column] | None = None,
    max_cols: dict[str, Column] | None = None,
    n_salt: int = 64,
    salt_on: Column | None = None,
) -> DataFrame:
    """Two-stage salted aggregation over ``keys``.

    ``sum_cols`` / ``min_cols`` / ``max_cols`` map output alias -> input
    expression; ``count_alias`` adds a row count. The salt is derived from
    ``salt_on`` (default: a stable per-row hash via ``F.rand`` is NOT used —
    determinism matters — so pass a high-cardinality column; falls back to
    ``spark_partition_id()``, which is deterministic for a deterministic
    input partitioning).
    """
    sum_cols = sum_cols or {}
    min_cols = min_cols or {}
    max_cols = max_cols or {}
    salt_src = salt_on if salt_on is not None else F.spark_partition_id()
    salt = F.pmod(F.hash(salt_src), F.lit(n_salt)).alias("_salt")

    stage1_aggs = (
        [F.sum(c).alias(f"_s_{a}") for a, c in sum_cols.items()]
        + ([F.count(F.lit(1)).alias("_s_cnt")] if count_alias else [])
        + [F.min(c).alias(f"_mn_{a}") for a, c in min_cols.items()]
        + [F.max(c).alias(f"_mx_{a}") for a, c in max_cols.items()]
    )
    stage2_aggs = (
        [F.sum(f"_s_{a}").alias(a) for a in sum_cols]
        + ([F.sum("_s_cnt").alias(count_alias)] if count_alias else [])
        + [F.min(f"_mn_{a}").alias(a) for a in min_cols]
        + [F.max(f"_mx_{a}").alias(a) for a in max_cols]
    )
    partial = df.groupBy(*keys, salt).agg(*stage1_aggs)
    return partial.groupBy(*keys).agg(*stage2_aggs)
