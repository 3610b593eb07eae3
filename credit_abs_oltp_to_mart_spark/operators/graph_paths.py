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
visited set to keep only NEW vertices. Frontier and visited frames are
``localCheckpoint``-truncated per hop (the components.py rationale:
iterative lineage otherwise re-runs the whole prefix each round). The
loop runs at most ``max_hops`` rounds and exits early when a frontier
comes back empty — the per-round ``count`` action rides the checkpoint
that round already pays for. Driver state is one integer per round;
distances live distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    frontier = spark.createDataFrame(
        [(int(s),) for s in sorted(set(sources))], f"id bigint"
    ).localCheckpoint(eager=True)
    dist = frontier.select(
        "id", F.lit(0).cast("int").alias("dist")
    ).localCheckpoint(eager=True)
    for hop in range(1, int(max_hops) + 1):
        discovered = (
            frontier.join(e, "id")
            .select(F.col("to").alias("id"))
            .distinct()
        )
        frontier = discovered.join(
            dist.select("id"), "id", "left_anti"
        ).localCheckpoint(eager=True)
        if frontier.isEmpty():
            break
        dist = dist.unionByName(
            frontier.select("id", F.lit(hop).cast("int").alias("dist"))
        ).localCheckpoint(eager=True)
    return (
        vertices.select(F.col(id_col).alias("id"))
        .join(dist, "id", "left")
        .select("id", F.coalesce("dist", F.lit(-1)).cast("int").alias("dist"))
    )
