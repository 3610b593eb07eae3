"""Semantic (embedding-space) decontamination: paraphrase-level eval
leakage the n-gram gate provably misses. The cross-set SemDeDup shape —
shared k-means clusters restrict candidates, the cross blocked-GEMM
kernel scores them, the TRAIN side carries the drop verdict. Values on
the real tables are oracle-gated through the extended ``decontaminate``
contract query (round 11); these tests pin the operator semantics on a
hand-built embedding space plus the never-all-pairs plan shape."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.operators.curation import (
    semantic_contamination_pairs,
    semantic_decontaminate,
)
from credit_abs_oltp_to_mart_spark.operators.kmeans import kmeans_assign


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )


def _assign_literal(spark, pairs):
    return spark.createDataFrame(pairs, "vec_id long, cluster long")


def test_planted_paraphrase_is_dropped(spark):
    """The headline invariant: a train doc that is a near-duplicate of an
    eval doc IN EMBEDDING SPACE (a paraphrase — shares no n-grams, so the
    verbatim gate passes it) is dropped; an unrelated train doc in the
    same cluster survives; a near-dup in a DIFFERENT cluster is the
    designed recall miss of hard assignment."""
    train = _emb(
        spark,
        [
            (10, [1.0, 0.02]),   # paraphrase of eval 100 -> dropped
            (11, [0.9, 0.55]),   # same cluster, cosine < threshold -> kept
            (12, [0.02, 1.0]),   # other cluster entirely -> kept
        ],
    )
    ev = _emb(spark, [(100, [1.0, 0.0]), (101, [0.0, 1.0])])
    assign = _assign_literal(
        spark, [(10, 0), (11, 0), (12, 1), (100, 0), (101, 2)]
    )
    got = {
        r["vec_id"]: (r["n_eval_hits"], r["max_eval_cosine"], r["dropped"])
        for r in semantic_decontaminate(
            train, ev, assign, threshold=0.95
        ).collect()
    }
    assert set(got) == {10, 11, 12}  # verdicts cover every TRAIN vector
    assert got[10][2] is True and got[10][0] == 1
    # cosine(10, 100) = 1 / sqrt(1 + 0.02^2), half-up 6 dp
    c = 1.0 / math.sqrt(1.0 + 0.02 * 0.02)
    want = math.floor(c * 1e6 + 0.5) / 1e6
    assert abs(got[10][1] - want) < 1e-9
    assert got[11] == (0, 0.0, False)
    # 12 is a near-dup of eval 101 but sits in a cluster with no eval
    # vector: hard assignment misses it BY DESIGN (the recall dial)
    assert got[12] == (0, 0.0, False)


def test_pairs_match_exact_brute_force(spark):
    """With every vector in ONE cluster the restriction is vacuous, so the
    cross kernel must reproduce the exact all-pairs cross cosine set —
    including pairs whose ids collide across the two sets (no triangle
    mask, no min/max normalization)."""
    train_rows = [(i, [math.cos(i * 0.37), math.sin(i * 0.37)]) for i in range(7)]
    eval_rows = [(j, [math.cos(j * 0.91), math.sin(j * 0.91)]) for j in range(5)]
    train, ev = _emb(spark, train_rows), _emb(spark, eval_rows)
    assign = _assign_literal(
        spark, [(i, 0) for i in range(7)] + [(j, 0) for j in range(5)]
    ).distinct()
    got = {
        (r["train_id"], r["eval_id"]): r["cosine"]
        for r in semantic_contamination_pairs(
            train, ev, assign, threshold=0.5
        ).collect()
    }
    want = {}
    for i, a in train_rows:
        for j, b in eval_rows:
            dot = a[0] * b[0] + a[1] * b[1]
            c = dot / (math.hypot(*a) * math.hypot(*b))
            c = math.copysign(math.floor(abs(c) * 1e6 + 0.5), c) / 1e6
            if c >= 0.5:
                want[(i, j)] = c
    assert got == want and want  # non-trivial set


def test_blocking_splits_hot_cluster_without_losing_pairs(spark):
    """target_block_rows=1 forces every vector into its own block: the
    pair set must be identical to the single-block run (blocks are a
    memory bound, never a semantics knob)."""
    train = _emb(spark, [(i, [1.0, i * 0.001]) for i in range(6)])
    ev = _emb(spark, [(100 + j, [1.0, j * 0.001]) for j in range(4)])
    assign = _assign_literal(
        spark,
        [(i, 0) for i in range(6)] + [(100 + j, 0) for j in range(4)],
    )
    one = set(
        map(
            tuple,
            semantic_contamination_pairs(
                train, ev, assign, threshold=0.9
            ).collect(),
        )
    )
    split = set(
        map(
            tuple,
            semantic_contamination_pairs(
                train, ev, assign, threshold=0.9, target_block_rows=1
            ).collect(),
        )
    )
    assert one == split and len(one) == 24


def test_union_with_ngram_gate_shape(spark):
    """The production composition: a doc survives iff BOTH gates pass —
    semantic verdicts join the same way decontaminate_against_store's do
    (keep where ~dropped)."""
    train = _emb(spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0])])
    ev = _emb(spark, [(9, [1.0, 0.001])])
    assign = _assign_literal(spark, [(1, 0), (2, 1), (9, 0)])
    verdicts = semantic_decontaminate(train, ev, assign, threshold=0.99)
    kept = verdicts.where(~F.col("dropped")).select("vec_id")
    assert [r["vec_id"] for r in kept.collect()] == [2]


def test_plan_never_all_pairs_and_eval_broadcast(spark):
    """Candidate generation must be the cluster EQUI-join with the eval
    block frame BROADCAST (default): no CartesianProduct, no
    BroadcastNestedLoopJoin, and no shuffle of the train side ON TOP of
    its block collect (the eval side ships to the executors)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assign = kmeans_assign(emb, init_ids=[10, 20, 30, 40], iterations=1)
    from credit_abs_oltp_to_mart_spark.operators.curation import split_bucket

    b = split_bucket(F.col("vec_id"), "split:")
    pairs = semantic_contamination_pairs(
        emb.where(b < 80), emb.where(b >= 80), assign, threshold=0.4
    )
    p = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BroadcastHashJoin" in p  # eval block frame broadcast
    assert "cluster" in p
    # results sane: every pair crosses the split, cosine >= threshold
    rows = pairs.collect()
    for r in rows:
        assert r["cosine"] >= 0.4


def test_broadcast_hits_dual_mode_parity_and_plan(spark):
    """broadcast_hits=False is the adversarially-contaminated-corpus
    escape: the per-train-doc hit aggregate is UNBOUNDED there, so the
    verdict join must be able to run as a plain shuffled join. Verdicts
    are identical in both modes, and the mode actually changes the plan:
    the single LeftOuter join (hits onto the train assignments) is a
    BroadcastHashJoin under the default and NOT under the fallback."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assign = kmeans_assign(emb, init_ids=[10, 20, 30, 40], iterations=1)
    from credit_abs_oltp_to_mart_spark.operators.curation import split_bucket

    b = split_bucket(F.col("vec_id"), "split:")
    train, ev = emb.where(b < 80), emb.where(b >= 80)

    def _left_outer_lines(df):
        p = df._jdf.queryExecution().executedPlan().toString()
        return [ln for ln in p.splitlines() if "LeftOuter" in ln]

    bcast = semantic_decontaminate(train, ev, assign, threshold=0.4)
    merge = semantic_decontaminate(
        train, ev, assign, threshold=0.4, broadcast_hits=False
    )
    lb, lm = _left_outer_lines(bcast), _left_outer_lines(merge)
    assert lb and all("BroadcastHashJoin" in ln for ln in lb)
    assert lm and not any("BroadcastHashJoin" in ln for ln in lm)

    def _rows(df):
        return {
            (r["vec_id"], r["cluster"], r["n_eval_hits"],
             r["max_eval_cosine"], r["dropped"])
            for r in df.collect()
        }

    rb = _rows(bcast)
    assert rb == _rows(merge) and rb
