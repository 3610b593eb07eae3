"""Parallelism guard for CPU-bound stages fed by small scans.

Two local[32]-visible failure modes motivate this, and both also exist on
real clusters whenever upstream cardinality (file splits / AQE-coalesced
shuffle blocks) understates downstream CPU cost:

- A small parquet table arrives as 1-3 row groups, so the scan stage has
  1-3 tasks; an explode / regex / pandas-UDF pipeline stacked on it then
  runs nearly serial no matter how many cores exist.
- AQE's coalescePartitions sizes post-shuffle partitions by BYTES
  (minPartitionSize=1m), but a grouped pandas UDF's cost scales with the
  number of group calls, not bytes — a 2 MB shuffle coalesced to 2
  partitions serializes thousands of Python calls into 2 workers.

``ensure_parallelism`` repartitions only when the input has fewer
partitions than the session's core count — a no-op posture at scale where
scans already carry many splits, and a ~MB-sized round-robin shuffle
locally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, *cols: str) -> DataFrame:
    """Pin the downstream stage's parallelism to the session core count.

    With ``cols``: hash-repartition on them unconditionally. This replaces
    the exchange the planner would insert anyway for a grouped pandas UDF
    (same ClusteredDistribution → no second shuffle) with one whose
    partition count AQE will not coalesce away — the static partition
    count can't predict the runtime coalesce, so there is no safe skip.

    Without ``cols``: round-robin, only when the input (typically a
    row-group-limited scan) has fewer partitions than cores."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if cols:
        return df.repartition(par, *cols)
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par)
