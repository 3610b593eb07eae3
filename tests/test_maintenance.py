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


# ---------------------------------------------------------------------------
# Tiered keyed-store compaction (size-aware trigger + manifest crash-healing)
# ---------------------------------------------------------------------------

def _mk_store(spark, root, sizes):
    """batch=<i> partitions with ``sizes[i]`` rows each + a commits dir
    marking every batch committed. Row payload carries (doc_id,
    ingest_batch) so fold-invariance is checkable row-exactly."""
    store = os.path.join(str(root), "store")
    commits = os.path.join(str(root), "commits")
    os.makedirs(commits, exist_ok=True)
    base = 0
    for i, n in enumerate(sizes):
        # payload defeats columnar compression so on-disk bytes actually
        # track row counts (the tier policy sizes by bytes)
        spark.range(base, base + n).select(
            F.col("id").alias("doc_id"),
            F.lit(i).cast("int").alias("ingest_batch"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{store}/batch={i}"
        )
        base += n
        with open(os.path.join(commits, str(i)), "w") as f:
            f.write("{}")
    return store, commits


def _store_rows(spark, store):
    return {
        (r["doc_id"], r["ingest_batch"])
        for r in spark.read.parquet(store)
        .select("doc_id", "ingest_batch")
        .collect()
    }


def _parts(store):
    return sorted(
        d for d in os.listdir(store) if d.startswith("batch=")
    )


def test_tiered_trigger_skips_lone_fresh_batch(spark, tmp_path):
    """One big merged tier + ONE fresh small batch: folding would rewrite
    the whole store to absorb a trickle — the size-tiered trigger must
    no-op instead (the O(N^2) cumulative-I/O failure mode)."""
    from credit_abs_oltp_to_mart_spark.sources.maintenance import (
        maybe_compact_keyed_store,
    )

    store, commits = _mk_store(spark, tmp_path, [4000, 10])
    before = _store_rows(spark, store)
    stats = maybe_compact_keyed_store(
        spark, store, commits_dir=commits, max_partitions=1
    )
    assert not stats["compacted"] and "skipped" in stats
    assert _parts(store) == ["batch=0", "batch=1"]
    assert _store_rows(spark, store) == before


def test_tiered_trigger_folds_small_tier_without_touching_base(
    spark, tmp_path
):
    """Several fresh small batches next to a big tier fold TOGETHER while
    the big tier's files stay byte-untouched — the amortizing partial
    fold (subset source_ids + manifest protocol)."""
    from credit_abs_oltp_to_mart_spark.sources.maintenance import (
        maybe_compact_keyed_store,
    )

    store, commits = _mk_store(spark, tmp_path, [4000, 10, 10, 10])
    before = _store_rows(spark, store)
    base_files = sorted(os.listdir(f"{store}/batch=0"))
    stats = maybe_compact_keyed_store(
        spark, store, commits_dir=commits, max_partitions=2
    )
    assert stats["compacted"] and stats["partitions_merged"] == 3
    assert stats["merged_upto"] == 3
    assert _parts(store) == ["batch=0", "batch=3"]
    assert sorted(os.listdir(f"{store}/batch=0")) == base_files
    assert _store_rows(spark, store) == before
    # no manifest left behind after a completed swap
    assert not [f for f in os.listdir(store) if "manifest" in f]


def test_tiered_trigger_restarts_anchor_past_footer_only_partition(
    spark, tmp_path
):
    """ADVICE r12 regression: a footer-only partition (an all-duplicates
    batch wrote zero rows) used to anchor the greedy and stall it forever
    — every later admission test `size > tier_ratio * gathered` failed,
    so foldable same-sized batches accumulated unboundedly. The greedy
    must RESTART from the next-smallest anchor, fold the same-sized
    batches, absorb the empty partition for free, and leave the big tier
    byte-untouched."""
    from credit_abs_oltp_to_mart_spark.sources.maintenance import (
        maybe_compact_keyed_store,
    )

    store, commits = _mk_store(spark, tmp_path, [4000, 0, 200, 200, 200])
    before = _store_rows(spark, store)
    base_files = sorted(os.listdir(f"{store}/batch=0"))
    stats = maybe_compact_keyed_store(
        spark, store, commits_dir=commits, max_partitions=2
    )
    assert stats["compacted"], stats
    assert stats["partitions_merged"] == 4
    assert _parts(store) == ["batch=0", "batch=4"]
    assert sorted(os.listdir(f"{store}/batch=0")) == base_files
    assert _store_rows(spark, store) == before


def test_tiered_trigger_surfaces_candidate_count_on_total_stall(
    spark, tmp_path
):
    """When EVERY anchor stalls (big tier + one trickle batch) the no-op
    stats must carry the candidate partition count — the number a
    monitoring loop alarms on to spot a stuck store."""
    from credit_abs_oltp_to_mart_spark.sources.maintenance import (
        maybe_compact_keyed_store,
    )

    store, commits = _mk_store(spark, tmp_path, [4000, 10])
    stats = maybe_compact_keyed_store(
        spark, store, commits_dir=commits, max_partitions=1
    )
    assert not stats["compacted"] and "skipped" in stats
    assert stats["candidates"] == 2


def test_tiered_full_fold_once_smalls_rival_base(spark, tmp_path):
    """When the accumulated small tier is within tier_ratio of the base,
    the greedy admits the base too — the geometric full fold that keeps
    tier count O(log N)."""
    from credit_abs_oltp_to_mart_spark.sources.maintenance import (
        maybe_compact_keyed_store,
    )

    store, commits = _mk_store(spark, tmp_path, [20, 10, 10])
    before = _store_rows(spark, store)
    stats = maybe_compact_keyed_store(
        spark, store, commits_dir=commits, max_partitions=1
    )
    assert stats["compacted"] and stats["partitions_merged"] == 3
    assert _parts(store) == ["batch=2"]
    assert _store_rows(spark, store) == before


def test_subset_fold_requires_own_max_as_upto(spark, tmp_path):
    import pytest as _pytest

    from credit_abs_oltp_to_mart_spark.sources.maintenance import (
        compact_keyed_store,
    )

    store, _ = _mk_store(spark, tmp_path, [10, 10, 10])
    with _pytest.raises(ValueError, match="max id"):
        compact_keyed_store(spark, store, upto=2, source_ids=[0, 1])


def test_subset_fold_crash_heal_deletes_only_manifest_sources(
    spark, tmp_path
):
    """Crash window between a subset fold's _SUCCESS and its partition
    deletes: healing must delete EXACTLY the manifest's sources and keep
    the big base partition — the legacy prefix rule would eat it."""
    import json as _json

    from credit_abs_oltp_to_mart_spark.sources.maintenance import (
        resume_pending_compaction,
    )

    store, _ = _mk_store(spark, tmp_path, [4000, 10, 10])
    before = _store_rows(spark, store)
    # hand-craft the post-_SUCCESS pre-delete state of fold [1, 2]
    merged = (
        spark.read.parquet(store)
        .where(F.col("batch").isin([1, 2]))
        .drop("batch")
    )
    merged.coalesce(1).write.mode("overwrite").parquet(
        f"{store}/.compact-2"
    )
    with open(f"{store}/.compact-2.manifest.json", "w") as f:
        _json.dump({"upto": 2, "sources": [1, 2]}, f)
    healed = resume_pending_compaction(spark, store)
    assert healed is not None and healed["resumed"] is True
    assert _parts(store) == ["batch=0", "batch=2"]
    assert not os.path.exists(f"{store}/.compact-2.manifest.json")
    assert _store_rows(spark, store) == before


def test_stray_manifest_without_hidden_dir_is_dropped(spark, tmp_path):
    """Crash between the manifest write and the merge write: sources are
    untouched, so healing just removes the sidecar."""
    import json as _json

    from credit_abs_oltp_to_mart_spark.sources.maintenance import (
        resume_pending_compaction,
    )

    store, _ = _mk_store(spark, tmp_path, [10, 10])
    before = _store_rows(spark, store)
    with open(f"{store}/.compact-1.manifest.json", "w") as f:
        _json.dump({"upto": 1, "sources": [0, 1]}, f)
    assert resume_pending_compaction(spark, store) is None
    assert not os.path.exists(f"{store}/.compact-1.manifest.json")
    assert _parts(store) == ["batch=0", "batch=1"]
    assert _store_rows(spark, store) == before
