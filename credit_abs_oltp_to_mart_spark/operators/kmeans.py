"""Lloyd's k-means over an embedding column, in exact fixed point.

Closes the loop left open by ``ann.py::ivf_topk``, whose codebook is "a
deterministic stand-in for a k-means training step": this IS that training
step. Cluster-assign is also a curation primitive in its own right
(diversity sampling, cluster-balanced mixing, semantic dedup).

Reproducibility: float k-means is engine-unstable twice over — centroid
means depend on summation order, and assignment ties flip with rounding.
Here every quantity is integer fixed point (coordinates scaled by 10^6 and
half-away-from-zero rounded once on ingest):

    dot products   : bigint products, bigint sums (exact, any order)
    argmin         : min over (cc - 2*ac, centroid_id) pairs — total order
    centroid update: trunc(sum / count) — sums stay well inside double's
                     2^53 exact-integer range, so the IEEE division and
                     trunc are bit-identical in Spark and DuckDB

so a fixed iteration count gives bit-identical assignments in any engine.

Scale shape (the canonical Lloyd-on-Spark loop): the codebook is k*dim
numbers — it lives on the driver and ships to executors either as plan
LITERALS (small k: whole-stage-codegen fold per centroid, no join) or as a
one-row BROADCAST frame (large k: a BroadcastNestedLoopJoin of exactly one
row — the codebook enters the executors through the broadcast manager
instead of the serialized plan, which falls over past a few thousand
centroids). BOTH paths are map-only over the vectors: no shuffle, no
per-vector row explosion (the broadcast side is one array of structs, and
the argmin is a higher-order-function fold over it). The integer
arithmetic is identical expression-for-expression, so the paths are
bit-parity interchangeable; ``codebook_as_literals=None`` auto-selects by
k*dim. The update step shuffles (cluster, dim, partial-sum) rows — with
map-side combine that is O(k * dim * partitions) wire traffic, independent
of row count — and collects O(k*dim) to the driver per round (fine for
coarse-IVF k; an extreme-k codebook would keep the update distributed
too). Vectors are fixed-pointed once and localCheckpoint'd; iterations
never re-read or re-scale the source.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

FP_SCALE = 10**6

# literal-codebook ceiling: past ~4096 centroid VALUES (k * dim) the plan
# string and codegen blow up — auto-switch to the broadcast-frame path
LITERAL_CODEBOOK_MAX_VALUES = 4096


def _to_fp(col: str, scale: int) -> Column:
    # half-away-from-zero at fixed scale; identical expression shape to the
    # DuckDB oracle (no sign(): its return type differs across engines)
    return F.expr(
        f"transform({col}, x -> cast(case when x >= 0"
        f" then floor(cast(x as double) * {scale} + 0.5)"
        f" else -floor(-cast(x as double) * {scale} + 0.5) end as bigint))"
    )


def kmeans_assign(
    emb: DataFrame,
    *,
    init_ids: list[int],
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fp_scale: int = FP_SCALE,
    codebook_as_literals: bool | None = None,
) -> DataFrame:
    """(vec_id, cluster) after ``iterations`` assignment rounds.

    Clusters are labelled by the init vector's id (stable labels). Between
    assignment rounds, centroids move to the truncated mean of their
    members; a cluster that loses all members keeps its previous centroid.
    """
    assign, _ = kmeans_train(
        emb,
        init_ids=init_ids,
        iterations=iterations,
        id_col=id_col,
        vec_col=vec_col,
        fp_scale=fp_scale,
        codebook_as_literals=codebook_as_literals,
    )
    return assign


def centroid_score_structs(
    cents: dict[int, list[int]], arr_col: str
) -> list[Column]:
    """(score, cid) structs — the integer L2 score |c|^2 - 2<v,c> of the
    fixed-point vector column ``arr_col`` against every codebook
    centroid, with the cid tiebreak baked into struct order (struct
    comparison is lexicographic). Shared by the Lloyd assignment loop and
    ``ann.ivf_topk_trained``'s probe ranking so the two scoring
    expressions can never drift — the trained-IVF equivalence
    "assignment == re-assignment against the codebook" depends on them
    being identical."""
    out = []
    for cid in sorted(cents):
        c = cents[cid]
        cc = sum(x * x for x in c)  # exact python int, fits bigint
        lits = ", ".join(str(x) + "L" for x in c)
        dot = (
            f"aggregate(zip_with({arr_col}, array({lits}), (x, y) -> x * y),"
            f" 0L, (acc, x) -> acc + x)"
        )
        out.append(
            F.struct(
                F.expr(f"{cc}L - 2L * ({dot})").alias("score"),
                F.lit(cid).cast("bigint").alias("cid"),
            )
        )
    return out


def use_literal_codebook(
    cents: dict[int, list[int]], codebook_as_literals: bool | None
) -> bool:
    """Resolve the literal-vs-broadcast codebook choice: explicit flag
    wins; ``None`` auto-selects literals only while k*dim stays under
    ``LITERAL_CODEBOOK_MAX_VALUES``."""
    if codebook_as_literals is not None:
        return codebook_as_literals
    dim = len(next(iter(cents.values())))
    return len(cents) * dim <= LITERAL_CODEBOOK_MAX_VALUES


def codebook_frame(
    spark: SparkSession, cents: dict[int, list[int]]
) -> DataFrame:
    """The codebook as a ONE-ROW frame: ``__cbk`` is an array of
    (cid, cc, arr) structs sorted by cid (cc = |c|^2, exact). Cross-joined
    under ``F.broadcast`` this is a BroadcastNestedLoopJoin of exactly one
    row — the large-k codebook transport (broadcast manager, not plan
    literals), with no effect on the vector side's partitioning."""
    row = [
        (int(cid), int(sum(x * x for x in cents[cid])), [int(x) for x in cents[cid]])
        for cid in sorted(cents)
    ]
    return spark.createDataFrame(
        [(row,)], "__cbk array<struct<cid:bigint,cc:bigint,arr:array<bigint>>>"
    )


def codebook_score_structs_expr(arr_col: str) -> Column:
    """(score, cid) structs against a joined ``__cbk`` codebook column —
    the broadcast-path twin of ``centroid_score_structs``: same integer
    L2 score |c|^2 - 2<v,c>, same lexicographic (score, cid) tiebreak,
    evaluated as a higher-order-function fold instead of per-centroid
    literal expressions. Bit-parity with the literal path is load-bearing
    (the trained-IVF equivalence rides on it) and pinned by tests."""
    return F.expr(
        f"transform(__cbk, c -> struct("
        f"c.cc - 2L * aggregate(zip_with({arr_col}, c.arr, (x, y) -> x * y),"
        f" 0L, (acc, x) -> acc + x) as score, c.cid as cid))"
    )


def kmeans_train(
    emb: DataFrame,
    *,
    init_ids: list[int],
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fp_scale: int = FP_SCALE,
    codebook_as_literals: bool | None = None,
    prescaled: bool = False,
) -> tuple[DataFrame, dict[int, list[int]]]:
    """``kmeans_assign`` plus the trained CODEBOOK: returns
    (assignments, {cluster_id: fixed-point centroid}) where the codebook
    is exactly the one that PRODUCED the final assignment round — so
    re-assigning any vector against it (integer argmin, same tiebreak)
    reproduces the returned assignment bit-for-bit. That equivalence is
    what lets ``ann.ivf_topk_trained`` use the assignment AS the IVF
    coarse quantization while probing queries against the codebook.

    ``prescaled=True``: ``vec_col`` already holds the fixed-point bigint
    array (scaled by ``fp_scale``, ideally off a checkpointed frame) —
    skip the scaling pass and the per-call localCheckpoint. The batch
    path for callers training SEVERAL codebooks over slices of ONE
    vector table (``ann.pq_train``): fixed-pointing is elementwise, so
    slice(to_fp(v)) == to_fp(slice(v)) and results are bit-identical."""
    if prescaled:
        v = emb.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("a"))
    else:
        v = emb.select(
            F.col(id_col).alias("vid"), _to_fp(vec_col, fp_scale).alias("a")
        ).localCheckpoint(eager=True)
    cents: dict[int, list[int]] = {
        r["vid"]: list(r["a"])
        for r in v.where(F.col("vid").isin(init_ids)).collect()
    }
    if len(cents) != len(init_ids):
        missing = set(init_ids) - set(cents)
        raise ValueError(f"init ids not found in input: {sorted(missing)}")

    literals = use_literal_codebook(cents, codebook_as_literals)
    assign = None
    for it in range(iterations):
        if literals:
            choices = centroid_score_structs(cents, "a")
            cluster = F.array_min(F.array(*choices))["cid"]
            scored = v
        else:
            cluster = F.array_min(codebook_score_structs_expr("a"))["cid"]
            scored = v.crossJoin(
                F.broadcast(codebook_frame(v.sparkSession, cents))
            )
        assign = scored.select("vid", "a", cluster.alias("cluster"))
        if it < iterations - 1:
            sums = (
                assign.select(
                    "cluster", F.posexplode("a").alias("d", "val")
                )
                .groupBy("cluster", "d")
                .agg(
                    F.sum("val").alias("s"),
                    F.count(F.lit(1)).alias("n"),
                )
                .select(
                    "cluster",
                    "d",
                    # Spark's double->bigint cast truncates toward zero —
                    # same as the oracle's trunc() (DuckDB's own
                    # double->bigint cast would ROUND instead)
                    F.expr("cast(cast(s as double) / n as bigint)").alias("c"),
                )
                .collect()
            )
            dim = len(next(iter(cents.values())))
            new: dict[int, list[int]] = {}
            for r in sums:
                new.setdefault(r["cluster"], [0] * dim)
                new[r["cluster"]][r["d"]] = r["c"]
            # empty clusters keep their previous centroid
            cents = {cid: new.get(cid, cents[cid]) for cid in cents}
    return assign.select(F.col("vid").alias(id_col), "cluster"), cents


def kmeans_assign_soft(
    emb: DataFrame,
    *,
    init_ids: list[int],
    iterations: int = 3,
    margin: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fp_scale: int = FP_SCALE,
    codebook_as_literals: bool | None = None,
) -> DataFrame:
    """Top-2-within-margin SOFT assignment: every vector gets its argmin
    cluster (``is_primary`` = 1) plus, when the second-nearest centroid is
    within ``margin`` of the nearest, that runner-up cluster too
    (``is_primary`` = 0). This is the SemDeDup cross-cluster recall
    repair: a near-dup pair that straddles a k-means boundary is missed by
    hard assignment, but a boundary vector sits near BOTH centroids by
    definition, so its soft row lands it in the neighbour's candidate pool
    and the pair is scored — at the cost of one extra candidate row per
    boundary vector, still through the cluster EQUI-join (never all-pairs).

    ``margin`` is in squared-L2 units of the ORIGINAL embedding space:
    the integer score |c|^2 - 2<v,c> differs from the true squared
    distance by the assignment-invariant |v|^2, so score deltas ARE
    squared-distance deltas, in fp_scale^2 fixed-point units — the
    comparison is exact integer arithmetic, replayable in any engine.

    Scale: identical to ``kmeans_assign`` (map-only scoring against a
    literal or one-row-broadcast codebook) plus one array_sort of k
    (score, cid) structs per vector; output rows <= 2n.
    """
    _, cents = kmeans_train(
        emb,
        init_ids=init_ids,
        iterations=iterations,
        id_col=id_col,
        vec_col=vec_col,
        fp_scale=fp_scale,
        codebook_as_literals=codebook_as_literals,
    )
    margin_fp = int(round(margin * fp_scale * fp_scale))
    v = emb.select(F.col(id_col).alias("vid"), _to_fp(vec_col, fp_scale).alias("a"))
    if use_literal_codebook(cents, codebook_as_literals):
        scores = F.array_sort(F.array(*centroid_score_structs(cents, "a")))
        scored = v
    else:
        scores = F.array_sort(codebook_score_structs_expr("a"))
        scored = v.crossJoin(F.broadcast(codebook_frame(v.sparkSession, cents)))
    top = scored.select(
        "vid", F.get(scores, 0).alias("c1"), F.get(scores, 1).alias("c2")
    )
    rows = F.filter(
        F.array(
            F.struct(
                F.col("c1.cid").alias("cluster"),
                F.lit(1).alias("is_primary"),
            ),
            F.when(
                F.col("c2").isNotNull()
                & (F.col("c2.score") - F.col("c1.score") <= F.lit(margin_fp)),
                F.struct(
                    F.col("c2.cid").alias("cluster"),
                    F.lit(0).alias("is_primary"),
                ),
            ),
        ),
        lambda s: s.isNotNull(),
    )
    return top.select("vid", F.explode(rows).alias("r")).select(
        F.col("vid").alias(id_col),
        F.col("r.cluster").alias("cluster"),
        F.col("r.is_primary").cast("int").alias("is_primary"),
    )
