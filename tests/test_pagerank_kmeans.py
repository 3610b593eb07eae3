"""PageRank and k-means vs pure-Python references running the SAME integer
fixed-point arithmetic (the portability contract), plus structural facts."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.operators.kmeans import kmeans_assign
from credit_abs_oltp_to_mart_spark.operators.pagerank import SCALE, pagerank


def _py_pagerank(vertices, edges, iters):
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r = {v: SCALE for v in vertices}
    for _ in range(iters):
        s = {v: 0 for v in vertices}
        for a, b in edges:
            s[b] += r[a] // deg[a]
        r = {v: 150000000000 + (85 * s[v]) // 100 for v in vertices}
    return r


def _run_pr(spark, vertices, edges, iters=8):
    vdf = spark.createDataFrame([(v,) for v in vertices], "id bigint")
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {
        r["id"]: r["rank_fp"]
        for r in pagerank(edf, vdf, iterations=iters).collect()
    }


def test_pagerank_matches_python_reference(spark):
    rng = random.Random(17)
    n = 60
    vertices = list(range(n))
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(200)
    ]
    assert _run_pr(spark, vertices, edges) == _py_pagerank(vertices, edges, 8)


def test_pagerank_cycle_is_uniform_and_star_center_dominates(spark):
    n = 10
    cycle = [(i, (i + 1) % n) for i in range(n)]
    ranks = _run_pr(spark, list(range(n)), cycle)
    assert len(set(ranks.values())) == 1  # symmetry => identical ranks
    star = [(i, 0) for i in range(1, n)]
    ranks = _run_pr(spark, list(range(n)), star)
    assert ranks[0] > max(ranks[i] for i in range(1, n)) * 3


def test_pagerank_dangling_leak_documented(spark):
    # dangling vertices leak rank: total strictly below n * SCALE
    ranks = _run_pr(spark, [0, 1, 2], [(0, 1), (1, 2)])  # 2 is dangling
    assert sum(ranks.values()) < 3 * SCALE


def _py_kmeans(rows, init_ids, iters, scale=10**6):
    def fp(x):
        import math

        return int(
            math.floor(x * scale + 0.5)
            if x >= 0
            else -math.floor(-x * scale + 0.5)
        )

    vecs = {vid: [fp(x) for x in v] for vid, v in rows}
    cents = {cid: list(vecs[cid]) for cid in init_ids}
    assign = {}
    for it in range(iters):
        for vid, a in vecs.items():
            best = min(
                (
                    sum(c * c for c in cents[cid])
                    - 2 * sum(x * y for x, y in zip(a, cents[cid])),
                    cid,
                )
                for cid in cents
            )
            assign[vid] = best[1]
        if it < iters - 1:
            for cid in cents:
                members = [vecs[v] for v in assign if assign[v] == cid]
                if members:
                    n = len(members)
                    dim = len(cents[cid])
                    cents[cid] = [
                        int(float(sum(m[d] for m in members)) / n)
                        for d in range(dim)
                    ]
    return assign


def test_kmeans_matches_python_reference(spark):
    rng = random.Random(23)
    rows = [
        (i, [rng.uniform(-0.6, 0.6) for _ in range(8)]) for i in range(80)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    # float storage truncates the values — read back what Spark stored so
    # the python reference sees identical inputs
    stored = [(r["vec_id"], list(r["embedding"])) for r in df.collect()]
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(
            df, init_ids=[0, 1, 2], iterations=3
        ).collect()
    }
    assert got == _py_kmeans(stored, [0, 1, 2], 3)


def test_kmeans_separated_clusters_recovered(spark):
    rng = random.Random(5)
    rows = []
    for i in range(60):
        center = 0.4 if i % 2 == 0 else -0.4
        rows.append(
            (i, [center + rng.uniform(-0.05, 0.05) for _ in range(4)])
        )
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(df, init_ids=[0, 1], iterations=3).collect()
    }
    assert all(got[i] == 0 for i in range(0, 60, 2))
    assert all(got[i] == 1 for i in range(1, 60, 2))


def test_kmeans_codebook_paths_bit_parity(spark):
    """Literal vs broadcast-frame codebook transport: identical integer
    arithmetic, so BOTH the per-round assignments and the trained
    codebook must match bit-for-bit (the large-k path is a pure physics
    swap)."""
    from credit_abs_oltp_to_mart_spark.operators.kmeans import kmeans_train

    rng = random.Random(47)
    rows = [
        (i, [rng.uniform(-0.6, 0.6) for _ in range(8)]) for i in range(80)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    a_lit, c_lit = kmeans_train(
        df, init_ids=[0, 1, 2], iterations=3, codebook_as_literals=True
    )
    a_bc, c_bc = kmeans_train(
        df, init_ids=[0, 1, 2], iterations=3, codebook_as_literals=False
    )
    assert c_lit == c_bc
    assert {tuple(r) for r in a_lit.collect()} == {
        tuple(r) for r in a_bc.collect()
    }


def test_kmeans_broadcast_codebook_plan_never_shuffles_vectors(spark):
    """Plan gate for the large-k path: the codebook must enter through a
    broadcast (BroadcastNestedLoopJoin of the ONE-row codebook frame) and
    the vector side must stay map-only — any shuffle Exchange here would
    mean the assignment no longer scales with the vector count."""
    from credit_abs_oltp_to_mart_spark.operators.kmeans import kmeans_train

    rng = random.Random(53)
    rows = [
        (i, [rng.uniform(-0.6, 0.6) for _ in range(8)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    assign, _ = kmeans_train(
        df, init_ids=[0, 1], iterations=1, codebook_as_literals=False
    )
    p = assign._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in p, p
    # every Exchange is the codebook broadcast — zero shuffle exchanges
    assert p.count("Exchange") == p.count("BroadcastExchange"), p
    assert p.count("BroadcastExchange") == 1, p


def test_kmeans_train_codebook_reproduces_assignment(spark):
    """kmeans_train's contract: the returned codebook is the one that
    PRODUCED the final assignment — re-scoring every vector against it
    (integer argmin, (score, cid) tiebreak) must reproduce the returned
    clusters exactly. ivf_topk_trained's coarse quantization rests on
    this equivalence."""
    from credit_abs_oltp_to_mart_spark.operators.kmeans import (
        FP_SCALE,
        kmeans_train,
    )

    rng = random.Random(31)
    rows = [
        (i, [rng.uniform(-0.6, 0.6) for _ in range(8)]) for i in range(70)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    assign, cents = kmeans_train(df, init_ids=[0, 1, 2], iterations=3)
    got = {r["vec_id"]: r["cluster"] for r in assign.collect()}

    def fp(x):
        import math

        return (
            math.floor(x * FP_SCALE + 0.5)
            if x >= 0
            else -math.floor(-x * FP_SCALE + 0.5)
        )

    for vid, vec in ((r["vec_id"], list(r["embedding"])) for r in df.collect()):
        a = [fp(float(x)) for x in vec]
        best = min(
            (
                sum(c * c for c in cents[cid])
                - 2 * sum(x * c for x, c in zip(a, cents[cid])),
                cid,
            )
            for cid in cents
        )[1]
        assert best == got[vid], f"vec {vid}: codebook argmin {best} != {got[vid]}"


def test_kmeans_partitioning_invariant(spark):
    rng = random.Random(9)
    rows = [
        (i, [rng.uniform(-0.5, 0.5) for _ in range(6)]) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    a = kmeans_assign(df.repartition(1), init_ids=[3, 7], iterations=2)
    b = kmeans_assign(df.repartition(11), init_ids=[3, 7], iterations=2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_kmeans_missing_init_raises(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0])], "vec_id bigint, embedding array<float>"
    )
    import pytest

    with pytest.raises(ValueError):
        kmeans_assign(df, init_ids=[1, 999])


def test_kmeans_prescaled_path_is_bit_identical(spark):
    """The prescaled batch path (one shared fixed-point checkpoint, used
    by ann.pq_train for its m sub-trainings) must reproduce the default
    path's assignments AND codebook bit-for-bit — fixed-pointing is
    elementwise, so scaling before or after slicing cannot differ."""
    from credit_abs_oltp_to_mart_spark.operators.kmeans import (
        FP_SCALE,
        _to_fp,
        kmeans_train,
    )

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a1, c1 = kmeans_train(emb, init_ids=[0, 1, 2], iterations=3)
    pre = emb.select(
        "vec_id", _to_fp("embedding", FP_SCALE).alias("embedding")
    ).localCheckpoint(eager=True)
    a2, c2 = kmeans_train(
        pre, init_ids=[0, 1, 2], iterations=3, prescaled=True
    )
    assert c1 == c2
    assert a1.exceptAll(a2).count() == 0
    assert a2.exceptAll(a1).count() == 0
