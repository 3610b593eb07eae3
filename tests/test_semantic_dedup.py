"""SemDeDup semantics: within-cluster near-dups drop (keep-lowest-id),
cross-cluster near-dups are missed BY DESIGN (the clustering is the
recall/cost dial), and verdict rows cover every vector exactly once.
Values on the real tables are oracle-gated in test_entry_contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.operators import dedup
from credit_abs_oltp_to_mart_spark.operators.kmeans import kmeans_assign


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )


def test_semantic_dedup_verdicts(spark):
    emb = _emb(
        spark,
        [
            (0, [1.0, 0.0]),     # init centroid A
            (1, [0.0, 1.0]),     # init centroid B
            (2, [1.0, 0.01]),    # cluster A
            (3, [1.02, 0.0]),    # cluster A, near-dup of 0/2 -> dropped
            (4, [0.3, 0.8]),     # cluster B (cosine vs 1 = 0.937 < 0.99)
            # cross-cluster straddle pair: cosine(5, 6) ~ 0.9996 but they
            # assign to DIFFERENT clusters -> both kept (the designed miss)
            (5, [0.72, 0.70]),
            (6, [0.70, 0.72]),
        ],
    )
    assign = kmeans_assign(emb, init_ids=[0, 1], iterations=1)
    got = {
        r["vec_id"]: (r["cluster"], r["is_kept"])
        for r in dedup.semantic_dedup(emb, assign, threshold=0.99).collect()
    }
    assert set(got) == {0, 1, 2, 3, 4, 5, 6}
    clusters = {v: c for v, (c, _) in got.items()}
    assert clusters[5] != clusters[6]  # straddles the boundary
    kept = {v for v, (_, k) in got.items() if k == 1}
    # 0 is the lowest id of the A-side dup set; 2 and 3 are its near-dups
    assert 0 in kept and 2 not in kept and 3 not in kept
    # singletons and the cross-cluster straddle pair all survive
    assert {1, 4, 5, 6} <= kept


def test_semantic_dedup_pairs_stay_within_cluster(spark):
    """Two identical-direction vectors in different clusters never pair:
    the drop set must be empty even at threshold 0 when every cluster is
    a singleton."""
    emb = _emb(spark, [(0, [1.0, 0.0]), (1, [0.0, 1.0])])
    assign = kmeans_assign(emb, init_ids=[0, 1], iterations=1)
    got = dedup.semantic_dedup(emb, assign, threshold=0.0)
    assert got.where(F.col("is_kept") == 0).count() == 0


def test_soft_assignment_catches_cross_cluster_pair(spark):
    """The planted straddle pair (5, 6): cosine ~0.9996 but the two
    vectors hard-assign to DIFFERENT clusters, so hard SemDeDup keeps
    both. Both sit near the cluster boundary, so top-2-within-margin
    soft assignment puts each in the other's candidate pool and the
    pair is caught — the higher id drops."""
    from credit_abs_oltp_to_mart_spark.operators.kmeans import (
        kmeans_assign, kmeans_assign_soft,
    )

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (5, [0.72, 0.70]),
        (6, [0.70, 0.72]),
    ]
    emb = _emb(spark, rows)
    hard = kmeans_assign(emb, init_ids=[0, 1], iterations=1)
    got_hard = {
        r["vec_id"]: r["is_kept"]
        for r in dedup.semantic_dedup(emb, hard, threshold=0.99).collect()
    }
    assert got_hard[5] == 1 and got_hard[6] == 1  # the designed miss

    soft = kmeans_assign_soft(emb, init_ids=[0, 1], iterations=1, margin=0.5)
    primary = soft.where(F.col("is_primary") == 1).select("vec_id", "cluster")
    got_soft = {
        r["vec_id"]: r["is_kept"]
        for r in dedup.semantic_dedup(
            emb, primary, threshold=0.99,
            candidates=soft.select("vec_id", "cluster"),
        ).collect()
    }
    assert got_soft[5] == 1 and got_soft[6] == 0  # repaired
    # verdicts still one row per vector, on the primary cluster
    assert set(got_soft) == {0, 1, 5, 6}


def test_soft_assignment_margin_zero_is_hard(spark):
    """margin=0 soft assignment degenerates to the hard assignment
    (modulo the is_primary column) unless two centroids tie exactly."""
    from credit_abs_oltp_to_mart_spark.operators.kmeans import (
        kmeans_assign, kmeans_assign_soft,
    )

    emb = _emb(
        spark,
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.9, 0.1]), (3, [0.2, 0.7])],
    )
    hard = kmeans_assign(emb, init_ids=[0, 1], iterations=2)
    soft = kmeans_assign_soft(emb, init_ids=[0, 1], iterations=2, margin=0.0)
    prim = soft.where(F.col("is_primary") == 1).select("vec_id", "cluster")
    assert prim.exceptAll(hard).count() == 0
    assert hard.exceptAll(prim).count() == 0


def test_semantic_dedup_derived_blocking_splits_hot_cluster(spark):
    """A skewed cluster must split into ceil(size/target_block_rows)
    collect_list blocks (bounded task state) without changing verdicts."""
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0])] + [
        (i, [1.0, 0.001 * i]) for i in range(2, 12)
    ]
    emb = _emb(spark, rows)
    from credit_abs_oltp_to_mart_spark.operators.kmeans import kmeans_assign

    assign = kmeans_assign(emb, init_ids=[0, 1], iterations=1)
    wide = dedup.semantic_dedup(emb, assign, threshold=0.9999)
    tight = dedup.semantic_dedup(
        emb, assign, threshold=0.9999, target_block_rows=3
    )
    assert wide.exceptAll(tight).count() == 0
    assert tight.exceptAll(wide).count() == 0
    # the hot cluster (11 members) really does split under the derived
    # count: replicate the internal blk expression and count blocks
    sizes = assign.groupBy("cluster").agg(F.count(F.lit(1)).alias("__csz"))
    blks = (
        assign.join(F.broadcast(sizes), "cluster")
        .select(
            "cluster",
            F.pmod(F.col("vec_id"), F.ceil(F.col("__csz") / F.lit(3)))
            .cast("int")
            .alias("blk"),
        )
        .groupBy("cluster")
        .agg(F.countDistinct("blk").alias("n_blk"))
    )
    assert {r["cluster"]: r["n_blk"] for r in blks.collect()}[0] >= 3


def test_semantic_dedup_drop_join_dual_mode(spark):
    """broadcast_drops=True plans a broadcast of the drop set;
    =False pins a sort-merge join — the high-duplication fallback that
    never forces an unbounded set through the driver."""
    emb = _emb(spark, [(i, [1.0, 0.001 * i]) for i in range(8)])
    from credit_abs_oltp_to_mart_spark.operators.kmeans import kmeans_assign

    assign = kmeans_assign(emb, init_ids=[0], iterations=1)
    bcast = dedup.semantic_dedup(emb, assign, threshold=0.9)
    merge = dedup.semantic_dedup(
        emb, assign, threshold=0.9, broadcast_drops=False
    )
    p_b = bcast._jdf.queryExecution().executedPlan().toString()
    p_m = merge._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p_b, p_b
    assert "SortMergeJoin" in p_m, p_m
    assert bcast.exceptAll(merge).count() == 0
    assert merge.exceptAll(bcast).count() == 0
