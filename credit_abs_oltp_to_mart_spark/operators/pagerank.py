"""PageRank in exact fixed-point arithmetic.

Complements ``components.py`` (the other iterative graph operator): CC
converges by fixpoint detection; PageRank runs a FIXED number of power
iterations, which makes it reproducible anywhere — if the arithmetic is.
Floating-point PageRank is not: the per-vertex contribution sum depends
on reduction order, which differs across engines and even across runs.
This implementation works in integer fixed point (1.0 == 10^12):

    contrib(v)   = rank_fp(v) div out_deg(v)           -- integer division
    rank_fp'(u)  = (1-d)*S + (d_num * sum(contribs)) div d_den

with d = 85/100 and S = 10^12. Every operation is bigint arithmetic —
order-independent, overflow-safe (total rank <= n * 10^12, n up to ~10^5
stays far under 2^63 even after the *85), and bit-identical in Spark and
DuckDB. Dangling vertices' rank is not redistributed (documented choice;
ranks then sum to < n, as in the original formulation with leaks).

Scale shape: per iteration, one hash shuffle to sum contributions by dst
and one join back to the vertex set — both partition on the vertex id, so
a cluster co-partitions them. ``localCheckpoint`` truncates lineage per
iteration (same rationale as components.py). Out-degrees are computed
once, joined into the edge list, and checkpointed so iterations reuse it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


def pagerank(
    edges: DataFrame,
    vertices: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    iterations: int = 8,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """(id, rank_fp) after ``iterations`` power steps; rank_fp is the
    fixed-point bigint rank (divide by 10^12 for the float value)."""
    base = (SCALE * (damping_den - damping_num)) // damping_den
    deg = edges.groupBy(F.col(src).alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    # edge list annotated with the source's out-degree, reused every round
    e = (
        edges.select(F.col(src).alias("id"), F.col(dst).alias("to"))
        .join(deg, "id")
        .localCheckpoint(eager=True)
    )
    # the vertex-id frame is re-joined EVERY round — checkpoint it once so
    # an upstream scan+distinct doesn't re-run per iteration
    vids = vertices.select(F.col(id_col).alias("id")).localCheckpoint(eager=True)
    ranks = vids.select(
        "id", F.lit(SCALE).cast("bigint").alias("rank_fp")
    ).localCheckpoint(eager=True)
    # NOTE: unlike components.connected_components, this loop keeps AQE on.
    # PageRank's per-round cost scales with the EDGE list (the contribution
    # join + sum), not the vertex label state — pinning the loop to a
    # vertex-sized partition count serialized real per-round compute and
    # measured ~50% slower at sf0.1.
    for _ in range(iterations):
        contrib = (
            e.join(ranks, "id")
            .select(
                F.col("to").alias("id"),
                F.expr("rank_fp div deg").alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            vids.join(contrib, "id", "left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_num} * coalesce(s, 0L)) div {damping_den}"
                    )
                ).cast("bigint").alias("rank_fp"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
