"""Distributed connected components over an edge list.

Completes the dedup surface: near-dup pair finders (``dedup.py``) emit an
edge list, but deduplication needs the transitive closure — one canonical
id per *cluster*, not per pair (A~B, B~C must collapse A,B,C together even
when A~C was never emitted). The reference has no iterative operator at
all; this is the extension surface's one genuinely iterative algorithm.

Algorithm: min-label propagation with pointer jumping (a DataFrame-native
Two-Phase/Shiloach-Vishkin hybrid; cf. Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14). Each round every vertex
takes the min label over itself and its neighbors (hook), then compresses
one indirection step ``comp(v) := comp(comp(v))`` (jump). Hooking alone
converges in O(diameter) rounds; the jump makes label distance shrink
geometrically, so rounds = O(log n) even on path graphs.

Scale design: state is one (vertex, component) row per vertex — never
materializes the closure. Each round is a constant number of hash
shuffles (neighbor join + groupBy on vertex id, jump join on component
id); ``localCheckpoint(eager=True)`` truncates the lineage each round so
plans don't grow with iteration count (a loop of joins otherwise compiles
an exponentially deep plan). Label arrays/paths never leave the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    vertices: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    max_iter: int = 40,
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, component) for every vertex; component = min id in its cluster.

    ``vertices`` must contain every edge endpoint (isolated vertices become
    their own singleton components). Deterministic: min-based, independent
    of partitioning and join order.

    ``num_partitions`` is the deploy-time parallelism knob for the
    per-round state (labels / edge list): size it to ~vertices/5M per
    partition at scale. Leave None to AUTO-SIZE from the actual vertex
    count (one extra count action against the already-checkpointed label
    state — negligible next to the per-round actions): each round costs a
    fixed number of tasks per partition across O(log n) rounds, so an
    oversized partition count multiplies straight into wall time on small
    subgraphs while a 5M-vertices-per-partition rule keeps big ones
    spill-free.
    """
    und = edges.select(
        F.col(src).alias("id"), F.col(dst).alias("nbr")
    ).unionByName(edges.select(F.col(dst).alias("id"), F.col(src).alias("nbr")))
    labels = vertices.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("component")
    )
    sess = edges.sparkSession
    if num_partitions is None:
        labels = labels.localCheckpoint(eager=True)
        n_verts = labels.count()
        session_parts = int(
            sess.conf.get("spark.sql.shuffle.partitions", "200")
        )
        num_partitions = max(1, min(session_parts, -(-n_verts // 5_000_000)))
    und = und.repartition(num_partitions, "id")
    labels = labels.repartition(num_partitions, "id")
    und = und.localCheckpoint(eager=True)
    labels = labels.localCheckpoint(eager=True)

    # The loop body materializes eagerly (checkpoint + count per round), so
    # conf changes scope exactly to the loop's own jobs. The label state is
    # explicitly partitioned already: pin the loop's shuffles to the same
    # width and drop AQE for the duration — adaptive replanning adds one
    # scheduler job per shuffle stage, which dominates wall time on the
    # (deliberately small) per-round state while optimizing nothing the
    # explicit repartition hasn't fixed.
    #
    # CONCURRENCY CONTRACT: SQLConf is session-global, so any query PLANNED
    # on this SparkSession while the loop runs (parallel driver threads,
    # streaming micro-batches) would be planned with AQE off and a
    # vertex-sized partition count, and the finally-restore below is
    # last-writer-wins. Callers running concurrent workloads should hand
    # this loop its own isolated conf via `spark.newSession()` (shared
    # SparkContext/cache, separate SQLConf) and build `edges`/`vertices`
    # on that session; the single-query-at-a-time batch pipelines in this
    # repo call it directly.
    old_aqe = sess.conf.get("spark.sql.adaptive.enabled", "true")
    old_parts = sess.conf.get("spark.sql.shuffle.partitions", "200")
    sess.conf.set("spark.sql.adaptive.enabled", "false")
    sess.conf.set("spark.sql.shuffle.partitions", str(num_partitions))
    try:
        for _ in range(max_iter):
            nbr_min = (
                und.join(
                    labels.select(
                        F.col("id").alias("nbr"),
                        F.col("component").alias("nbr_comp"),
                    ),
                    "nbr",
                )
                .groupBy("id")
                .agg(F.min("nbr_comp").alias("nbr_min"))
            )
            hooked = labels.join(nbr_min, "id", "left").select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
                F.col("component").alias("prev"),
            )
            # pointer jump: comp(v) := comp(comp(v)) — labels are vertex ids,
            # so the hooked table itself resolves the indirection
            jumped = (
                hooked.join(
                    hooked.select(
                        F.col("id").alias("component"),
                        F.col("component").alias("comp2"),
                    ),
                    "component",
                    "left",
                )
                .select(
                    "id",
                    F.coalesce("comp2", F.col("component")).alias("component"),
                    "prev",
                )
                .localCheckpoint(eager=True)
            )
            changed = jumped.where(F.col("component") != F.col("prev")).count()
            labels = jumped.select("id", "component")
            if changed == 0:
                break
    finally:
        sess.conf.set("spark.sql.adaptive.enabled", old_aqe)
        sess.conf.set("spark.sql.shuffle.partitions", old_parts)
    return labels


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    doc_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Cluster assignment from near-dup pairs: every doc gets the min
    doc_id of its transitive near-dup cluster plus the cluster size
    (singletons included, size 1).

    Only pair PARTICIPANTS enter the iterative label loop — a doc in no
    pair is its own singleton component by definition, so the full corpus
    never cycles through the O(log n) rounds; at 100 TB the near-dup
    subgraph is orders of magnitude smaller than the corpus, and the
    participant labels join back to the corpus as the (small) build side."""
    # the pair plan feeds BOTH the participant set and the edge list of the
    # component loop — checkpoint it eagerly so the (possibly expensive)
    # pair-finding chain runs once, not once per consumer
    pairs = pairs.select(src, dst).localCheckpoint(eager=True)
    participants = (
        pairs.select(F.col(src).alias("id"))
        .unionByName(pairs.select(F.col(dst).alias("id")))
        .distinct()
    )
    cc = connected_components(pairs, participants, src=src, dst=dst)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("n"))
    labeled = cc.join(sizes, "component").select(
        F.col("id").alias(doc_col),
        F.col("component").alias("component_id"),
        F.col("n").alias("cluster_size"),
    )
    return docs.select(doc_col).join(labeled, doc_col, "left").select(
        doc_col,
        F.coalesce("component_id", F.col(doc_col)).alias("component_id"),
        F.coalesce("cluster_size", F.lit(1)).cast("long").alias("cluster_size"),
    )
