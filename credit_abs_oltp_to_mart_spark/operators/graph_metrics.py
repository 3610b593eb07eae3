"""Graph metrics: per-vertex triangle counting.

Third member of the graph family (``components.py`` iterates to a
fixpoint, ``pagerank.py`` runs fixed power steps; triangle counting is
the one-shot join-shaped analysis). Triangles drive clustering
coefficients and community quality — e.g. how clique-ish a near-dup
cluster is before collapsing it.

Scale design — degree orientation: the naive wedge join (edges ⋈ edges on
the middle vertex) explodes on hubs: a degree-d vertex generates d^2
wedges. Orienting every edge from its lower-(degree, id) endpoint to the
higher one (a total order, so each undirected edge appears exactly once)
caps out-degree at O(sqrt(E)) — the classic compact-forward bound
(Schank & Wagner 2005; Suri & Vassilvitskii's MapReduce variant) — so
wedge count is sum(out_deg^2) <= E^1.5 instead of sum(deg^2). Each
triangle is then generated exactly once (its vertices appear in rank
order), and one more join checks the closing edge. Ranks are encoded as
``deg * RANK_BASE + id`` bigints so the comparison is plain integer
arithmetic in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_BASE = 10**9  # ids must stay below this for the rank encoding


def triangle_count(
    edges: DataFrame,
    vertices: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
) -> DataFrame:
    """(id, n_triangles) for every vertex (0 for triangle-free ones).

    ``edges`` is treated as undirected; duplicates and self-loops are
    dropped during canonicalization.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("id"))
        .unionAll(und.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
        .select("id", (F.col("deg") * RANK_BASE + F.col("id")).alias("rank"))
    )
    oriented = (
        und.join(deg.select(F.col("id").alias("u"), F.col("rank").alias("ru")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("rank").alias("rv")), "v")
        .select(
            F.when(F.col("ru") < F.col("rv"), F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(F.col("ru") < F.col("rv"), F.col("v")).otherwise(F.col("u")).alias("b"),
            F.least("ru", "rv").alias("ra"),
            F.greatest("ru", "rv").alias("rb"),
        )
    )
    # NOTE: no persist on `oriented` — its three consumers resolve through
    # AQE exchange/stage reuse (measured: adding a cache write here was a
    # net ~50% slow-down at sf0.1 because the synchronous materialization
    # costs more than the shared-stage recompute it avoids)
    # wedges from each low-rank apex: pairs of out-neighbors in rank order
    e1 = oriented.select("a", F.col("b").alias("m"), F.col("rb").alias("rm"))
    e2 = oriented.select(
        F.col("a"), F.col("b").alias("w"), F.col("rb").alias("rw")
    )
    wedges = e1.join(e2, "a").where(F.col("rm") < F.col("rw"))
    closing = oriented.select(
        F.col("a").alias("m"), F.col("b").alias("w")
    )
    tris = wedges.join(closing, ["m", "w"]).select("a", "m", "w")
    per_vertex = (
        tris.select(F.explode(F.array("a", "m", "w")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return vertices.select(F.col(id_col).alias("id")).join(
        per_vertex, "id", "left"
    ).select("id", F.coalesce("n", F.lit(0)).alias("n_triangles"))
