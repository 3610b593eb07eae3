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
