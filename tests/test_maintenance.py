"""Small-file compaction (flat + hive-partitioned) and ORC format support."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.sources.maintenance import (
    compact_dir,
    compact_table,
)
from credit_abs_oltp_to_mart_spark.sources.readers import read_oltp_table
from credit_abs_oltp_to_mart_spark.sources.writers import write_oltp_tables


def _parquet_files(path):
    return [f for f in os.listdir(path) if f.endswith(".parquet")]


def test_compact_dir_reduces_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "t.parquet")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(24).write.parquet(path)
    assert len(_parquet_files(path)) == 24
    before = sorted(r["id"] for r in spark.read.parquet(path).collect())
    stats = compact_dir(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert stats["compacted"] and stats["files_after"] < 24
    after = spark.read.parquet(path)
    assert sorted(r["id"] for r in after.collect()) == before
    assert not os.path.exists(path + "._compact_tmp")
    assert not os.path.exists(path + "._compact_bak")


def test_compact_dir_noop_when_already_small(spark, tmp_path):
    path = str(tmp_path / "small.parquet")
    spark.range(10).coalesce(1).write.parquet(path)
    stats = compact_dir(spark, path)
    assert not stats["compacted"] and len(_parquet_files(path)) == 1


def test_compact_partitioned_table_keeps_layout(spark, tmp_path):
    path = str(tmp_path / "part.parquet")
    df = spark.range(5_000).select(
        "id", (F.col("id") % 3).alias("p"), F.rand(1).alias("v")
    )
    df.repartition(8).write.partitionBy("p").parquet(path)
    before = spark.read.parquet(path)
    total_before = before.count()
    by_p_before = {r["p"]: r["n"] for r in before.groupBy("p").agg(F.count(F.lit(1)).alias("n")).collect()}
    results = compact_table(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert len(results) == 3 and all(r["compacted"] for r in results)
    after = spark.read.parquet(path)
    assert after.count() == total_before
    by_p_after = {r["p"]: r["n"] for r in after.groupBy("p").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_p_after == by_p_before  # partition pruning layout intact


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    out = str(tmp_path)
    df = spark.range(1_000).select(
        F.col("id").alias("loan_id"), (F.col("id") % 7).alias("dpd")
    )
    write_oltp_tables({"demo": df}, out, file_format="orc")
    back = read_oltp_table(spark, out, "demo", file_format="orc")
    assert back.count() == 1_000
    plan = (
        back.where(F.col("dpd") > 5)
        .select("loan_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # ORC scan must receive the predicate and the pruned schema
    assert "orc" in plan.lower()
    assert "dpd" in plan.split("ReadSchema")[-1] or "PushedFilters" in plan


def test_compact_with_clustering_restores_sorted_layout(spark, tmp_path):
    """cluster_by compaction: many interleaved small files come out as few
    files with disjoint value ranges (data skipping restored)."""
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from credit_abs_oltp_to_mart_spark.sources.maintenance import compact_dir

    path = str(tmp_path / "interleaved.parquet")
    # 12 appends, each spanning the whole key range (worst interleaving)
    for i in range(12):
        spark.range(2000).select(
            (F.xxhash64("id", F.lit(i)) % 10_000).alias("k"),
            F.col("id"),
        ).coalesce(1).write.mode("append").parquet(path)

    stats = compact_dir(
        spark, path, target_file_bytes=220_000, cluster_by="k"
    )
    assert stats["compacted"] and stats["files_after"] < stats["files_before"]

    ranges = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "k"
        )
        st = [md.row_group(r).column(idx).statistics for r in range(md.num_row_groups)]
        ranges.append((min(s.min for s in st), max(s.max for s in st)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping ranges {(lo1, hi1)} {(lo2, hi2)}"
