"""Single/multi-source BFS shortest paths — the distance member of the
graph family (``components.py`` = fixpoint labels, ``pagerank.py`` =
fixed power steps, ``graph_metrics.py`` = one-shot joins; BFS is the
level-synchronous frontier iteration).

Distances over unweighted directed edges are exact integers, so the
result is engine-replayable with no fixed-point machinery: hop h's
frontier is exactly the set of vertices whose shortest distance is h,
and an oracle replays it as a depth-bounded recursive CTE followed by
``min(dist) group by id``.

Scale shape (the Pregel BFS): per hop, ONE join of the current frontier
against the edge list on the source id (both partition on the vertex id
— a cluster co-partitions them), a ``distinct`` on the discovered
targets (partial agg combines map-side), and an anti-join against the
visited set to keep only NEW vertices. ONLY the new frontier is
``localCheckpoint``-materialized each hop (the components.py lineage
rationale) — the visited set and the final distance frame are lazy
unions over those per-hop checkpoints, so per-hop checkpoint writes
total O(V) across the whole run (each vertex is written exactly once,
at the hop that discovers it). The loop runs at most ``max_hops``
rounds and exits early when a frontier comes back empty. Driver state
is one integer per round; distances live distributed.

Long-diameter read amplification: hop h's anti-join scans the lazy
visited union, i.e. h - 1 separate frontier checkpoints — harmless at
social-graph diameters (~12 hops saturate the probe graph) but
O(hops^2 * avg_frontier) cumulative on a path-like graph. So every
``COMPACT_VISITED_EVERY`` hops the visited union is FOLDED into one
compact checkpoint: the anti-join then reads one materialized frame
plus at most K-1 recent frontiers, bounding cumulative reads at
O(hops * (V/hops * K + V)) = O(V * hops / K * const) while adding at
most O(V * hops / K) compaction writes — K trades the two, and at
K = 8 both terms sit far under the uncompacted read blowup (measured:
tools/scale_probe.py --long-diameter, bench_ab_r10/).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.functions.parallelism import local_rows

COMPACT_VISITED_EVERY = 8


def bfs_distances(
    edges: DataFrame,
    vertices: DataFrame,
    sources: list[int],
    *,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
) -> DataFrame:
    """(id, dist) for EVERY vertex: the minimum number of directed hops
    from any of ``sources``, or -1 if unreachable within ``max_hops``.

    ``sources`` is a literal id list (bounded, like a codebook); source
    vertices get dist 0 even if absent from the edge list."""
    spark = edges.sparkSession
    e = edges.select(
        F.col(src).alias("id"), F.col(dst).alias("to")
    ).localCheckpoint(eager=True)
    frontier = local_rows(spark, 
        [(int(s),) for s in sorted(set(sources))], "id bigint"
    ).localCheckpoint(eager=True)
    levels = [(0, frontier)]
    visited = frontier  # lazy union over the per-hop checkpoints
    uncompacted = 0
    for hop in range(1, int(max_hops) + 1):
        discovered = (
            frontier.join(e, "id")
            .select(F.col("to").alias("id"))
            .distinct()
        )
        frontier = discovered.join(
            visited, "id", "left_anti"
        ).localCheckpoint(eager=True)
        if frontier.isEmpty():
            break
        levels.append((hop, frontier))
        visited = visited.unionByName(frontier)
        uncompacted += 1
        if uncompacted >= COMPACT_VISITED_EVERY:
            # fold the accumulated checkpoints into ONE compact frame so
            # a long-diameter run's anti-join never scans an unbounded
            # list of per-hop files (module docstring: the K dial)
            visited = visited.localCheckpoint(eager=True)
            uncompacted = 0
    dist = levels[0][1].select(
        "id", F.lit(0).cast("int").alias("dist")
    )
    for hop, fr in levels[1:]:
        dist = dist.unionByName(
            fr.select("id", F.lit(hop).cast("int").alias("dist"))
        )
    return (
        vertices.select(F.col(id_col).alias("id"))
        .join(dist, "id", "left")
        .select("id", F.coalesce("dist", F.lit(-1)).cast("int").alias("dist"))
    )
