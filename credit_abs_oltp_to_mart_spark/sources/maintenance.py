"""Lake maintenance: small-file compaction.

Incremental loads (`plans/incremental.py`, streaming foreachBatch sinks)
append many small files per partition; at 100 TB the resulting file-count
explosion dominates scan planning time and kills read throughput (every
file is an open + footer read + a task). Compaction rewrites a table (or
selected partitions) into right-sized files.

Sizing is computed from the data, not guessed: a sample-free row-count +
on-disk byte estimate picks ``ceil(bytes / target_file_bytes)`` output
files. The rewrite uses ``repartition(n)`` (round-robin, even file sizes)
— NOT ``coalesce(n)``, which merges co-located partitions unevenly and
can skew file sizes badly; evenness is the point of compaction. The
rewrite is atomic per directory via write-to-temp + rename.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def compact_dir(
    spark: SparkSession,
    path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
    cluster_by: str | None = None,
) -> dict:
    """Compact one parquet directory in place; returns a stats dict.

    No-op (returns the stats, writes nothing) when the directory already
    has fewer than ``min_files_to_compact`` data files or is already at or
    under the target file count.

    ``cluster_by`` re-establishes a sort-clustered layout DURING the
    rewrite (range partition + within-file sort on that column) — append
    streams interleave values across small files, so compaction is exactly
    the moment data-skipping order is restored for free (the rewrite
    already pays the full read+write).
    """
    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]
    total_bytes = sum(os.path.getsize(f) for f in files)
    n_target = max(1, math.ceil(total_bytes / target_file_bytes))
    stats = {
        "path": path,
        "files_before": len(files),
        "bytes": total_bytes,
        "files_target": n_target,
        "compacted": False,
    }
    if len(files) < min_files_to_compact or len(files) <= n_target:
        return stats

    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "._compact_tmp"
    if cluster_by is not None:
        reshaped = df.repartitionByRange(
            n_target, cluster_by
        ).sortWithinPartitions(cluster_by)
    else:
        reshaped = df.repartition(n_target)
    reshaped.write.mode("overwrite").parquet(tmp)
    bak = path.rstrip("/") + "._compact_bak"
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
    stats["compacted"] = True
    stats["files_after"] = len(
        [f for f in os.listdir(path) if f.endswith(".parquet")]
    )
    return stats


def compact_table(
    spark: SparkSession,
    table_dir: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> list[dict]:
    """Compact a (possibly hive-partitioned) table directory.

    Leaf data directories are compacted independently — partition by
    partition, so a 100 TB table compacts as many small parallelizable
    rewrites with per-partition atomicity, and partition pruning metadata
    (the directory layout) is untouched.
    """
    leaves = []
    for root, dirs, files in os.walk(table_dir):
        if any(f.endswith(".parquet") for f in files):
            leaves.append(root)
    return [
        compact_dir(spark, leaf, target_file_bytes=target_file_bytes)
        for leaf in sorted(leaves)
    ]
