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

from pyspark.sql import DataFrame, SparkSession


def local_rows(spark: SparkSession, data: list, schema: str) -> DataFrame:
    """Driver-local metadata rows (codebooks, query sets, version stamps)
    as a ONE-slice DataFrame.

    ``spark.createDataFrame(list)`` parallelizes the rows into
    ``defaultParallelism`` pickled-RDD slices; every action on the frame
    then crosses the JVM→Python-worker boundary once PER SLICE, and a
    ``coalesce(1)`` sink (the usual shape for tiny metadata writes) pays
    those crossings SEQUENTIALLY — measured ~8 s per ~10-row parquet
    write at local[32] vs ~0.5 s with one slice (optimization guide §4:
    control how often the Python boundary is crossed). One slice keeps
    the whole frame in a single Python task; row values, dtypes and
    schema are byte-identical, only the slice count changes. Metadata
    frames are codebook/query-set sized by contract, so one slice is
    also the scale-correct layout."""
    if not data:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(data, 1), schema
    )


# single-child operators a partition-count probe may walk THROUGH (none
# changes the partitioning of its child), and the leaf relations whose
# partition count the probe is actually about (file scans / local rows /
# checkpointed RDDs — the "row-group-limited scan" case in the module
# docstring)
_PROBE_PASSTHRU = frozenset(
    {"Project", "Filter", "SubqueryAlias", "LocalLimit", "GlobalLimit"}
)
_PROBE_LEAVES = frozenset(
    {
        "LogicalRelation", "LogicalRDD", "LocalRelation",
        "DataSourceV2Relation", "DataSourceV2ScanRelation",
        "StreamingDataSourceV2Relation", "StreamingDataSourceV2ScanRelation",
    }
)


def _narrow_scan_chain(df: DataFrame) -> bool:
    """True iff ``df``'s analyzed plan is a pure narrow chain over a scan
    leaf (Project/Filter/... over a relation). Only such plans are safe —
    and useful — to probe with ``df.rdd.getNumPartitions()``: under AQE,
    building the RDD of a plan that CONTAINS exchanges materializes every
    upstream query stage (getFinalPhysicalPlan runs the shuffles), so a
    probe on a join/window/aggregate input silently EXECUTES the upstream
    once and throws the result away. Plans with an upstream shuffle get
    their parallelism from shuffle.partitions/AQE already, which is
    exactly the scale-adaptive behavior we want — no repartition needed."""
    p = df._jdf.queryExecution().analyzed()
    for _ in range(64):  # bounded walk; a scan chain is a handful of nodes
        name = p.getClass().getSimpleName()
        if name in _PROBE_LEAVES:
            return True
        if name not in _PROBE_PASSTHRU:
            return False
        children = p.children()
        if children.size() != 1:
            return False
        p = children.apply(0)
    return False


def ensure_parallelism(df: DataFrame, *cols: str) -> DataFrame:
    """Pin the downstream stage's parallelism to the session core count.

    With ``cols``: hash-repartition on them unconditionally. This replaces
    the exchange the planner would insert anyway for a grouped pandas UDF
    (same ClusteredDistribution → no second shuffle) with one whose
    partition count AQE will not coalesce away — the static partition
    count can't predict the runtime coalesce, so there is no safe skip.

    Without ``cols``: round-robin, only when the input is a narrow scan
    chain (the row-group-limited case this guard exists for) with fewer
    partitions than cores. Inputs that already contain a shuffle are left
    alone — their parallelism is AQE's job, and probing them would
    execute the upstream stages just to read a partition count (see
    ``_narrow_scan_chain``)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if cols:
        return df.repartition(par, *cols)
    if not _narrow_scan_chain(df):
        return df
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par)
