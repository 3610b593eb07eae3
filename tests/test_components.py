"""Connected components vs a pure-Python union-find oracle, including the
shapes that break naive label propagation (long chains, label collisions),
plus convergence behavior."""

from __future__ import annotations

import pytest

import random

from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.operators.components import (
    connected_components,
    dedup_clusters,
)


def _union_find(n_vertices: list[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = {v: v for v in n_vertices}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min member per root
    members: dict[int, list[int]] = {}
    for v in n_vertices:
        members.setdefault(find(v), []).append(v)
    out = {}
    for vs in members.values():
        m = min(vs)
        for v in vs:
            out[v] = m
    return out


def _check(spark, vertices: list[int], edges: list[tuple[int, int]]) -> None:
    vdf = spark.createDataFrame([(v,) for v in vertices], "id bigint")
    edf = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(None, None)], "src bigint, dst bigint"
    )
    if not edges:
        edf = edf.where(F.col("src").isNotNull())
    got = {
        r["id"]: r["component"]
        for r in connected_components(edf, vdf, max_iter=64).collect()
    }
    assert got == _union_find(vertices, edges)


def test_path_graph_long_chain(spark):
    # worst case for pure propagation: O(n) rounds without pointer jumping
    n = 64
    _check(spark, list(range(n)), [(i, i + 1) for i in range(n - 1)])


def test_isolated_and_mixed(spark):
    _check(spark, [0, 1, 2, 3, 4, 5, 9], [(3, 4), (4, 5)])


@pytest.mark.slow
def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for _ in range(3):
        n = 120
        vertices = list(range(n))
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(5, 90))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        _check(spark, vertices, edges)


def test_pointer_jump_converges_fast(spark):
    # a 64-node path must converge well inside O(log n)-ish rounds; cap at
    # 10 — pure hooking would need ~63
    n = 64
    vdf = spark.createDataFrame([(v,) for v in range(n)], "id bigint")
    edf = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src bigint, dst bigint"
    )
    out = connected_components(edf, vdf, max_iter=10)
    assert out.where(F.col("component") != 0).count() == 0


def test_dedup_clusters_shapes(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id bigint")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "doc_a bigint, doc_b bigint"
    )
    rows = {
        r["doc_id"]: (r["component_id"], r["cluster_size"])
        for r in dedup_clusters(docs, pairs).collect()
    }
    assert rows == {
        0: (0, 3),
        1: (0, 3),
        2: (0, 3),
        3: (3, 1),
        4: (4, 2),
        5: (4, 2),
    }
