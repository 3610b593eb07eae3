"""Approximate-nearest-neighbor search over an embedding column.

- ``brute_force_topk`` — exact cosine top-k; the correctness baseline.
  At 100 TB this is the per-bucket kernel, never the global plan.
- ``lsh_topk`` — sign-LSH (random-hyperplane) bucketed search: queries only
  compare against vectors in the same bucket. Hyperplanes are deterministic
  md5-derived constants so results are reproducible (and oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.functions.parallelism import local_rows

from credit_abs_oltp_to_mart_spark.functions.similarity import (
    cosine_similarity,
    hyperplane_sign_bits,
    random_hyperplanes,
)


def brute_force_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors by cosine for each query vector.

    Broadcast the (small) query side; rank with a deterministic tiebreak
    (cosine desc, neighbor id asc)."""
    q = F.broadcast(
        emb.where(F.col("vec_id").isin(query_ids)).select(
            F.col("vec_id").alias("query_id"), F.col(vec_col).alias("qv")
        )
    )
    scored = (
        emb.select(F.col("vec_id").alias("neighbor_id"), F.col(vec_col).alias("nv"))
        .join(q, F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("qv"), F.col("nv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def bucketize(
    emb: DataFrame, n_planes: int = 4, dim: int = 64, seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector a sign-LSH bucket id (map-only)."""
    planes = random_hyperplanes(n_planes, dim, seed)
    return emb.select(
        "vec_id",
        F.col(vec_col),
        hyperplane_sign_bits(F.col(vec_col), planes).alias("bucket"),
    )


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    centroid_ids: list[int],
    k: int = 5,
    nprobe: int = 2,
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: coarse-quantize to the nearest centroid, probe only
    the ``nprobe`` clusters nearest each query.

    ``centroid_ids`` selects member vectors as the coarse codebook — a
    deterministic stand-in for a k-means training step (at scale: train
    k-means offline, broadcast the codebook; the search plan is identical).
    Work drops from O(Q·N) to O(Q·N·nprobe/C) for C centroids; the
    assignment pass is one broadcast join, map-only per vector. Ranking
    tiebreaks (cosine desc, id asc) are total, so results are reproducible
    and oracle-checkable."""
    cents = F.broadcast(
        emb.where(F.col("vec_id").isin(centroid_ids)).select(
            F.col("vec_id").alias("cid"), F.col(vec_col).alias("cv")
        )
    )

    def _centroid_ranked(vectors: DataFrame) -> DataFrame:
        scored = vectors.crossJoin(cents).select(
            "vec_id",
            "v",
            "cid",
            cosine_similarity(F.col("v"), F.col("cv")).alias("ccos"),
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.col("ccos").desc(), F.col("cid").asc()
        )
        return scored.withColumn("crank", F.row_number().over(w))

    vectors = emb.select("vec_id", F.col(vec_col).alias("v"))
    assign = (
        _centroid_ranked(vectors)
        .where(F.col("crank") == 1)
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("v").alias("nv"),
            F.col("cid").alias("cluster"),
        )
    )
    probes = (
        _centroid_ranked(vectors.where(F.col("vec_id").isin(query_ids)))
        .where(F.col("crank") <= nprobe)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("cid").alias("cluster"),
        )
    )
    scored = (
        probes.join(assign, "cluster")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("qv"), F.col("nv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ivf_topk_trained(
    emb: DataFrame,
    query_ids: list[int],
    *,
    init_ids: list[int],
    iterations: int = 3,
    k: int = 5,
    nprobe: int = 2,
    vec_col: str = "embedding",
    codebook_as_literals: bool | None = None,
) -> DataFrame:
    """IVF with a TRAINED coarse codebook: Lloyd k-means on the embedding
    table supplies the centroids, closing the "deterministic stand-in"
    gap in ``ivf_topk`` — offline train, broadcast-probe, the production
    IVF shape end-to-end.

    Composition (all exact fixed-point, so engine-reproducible):
      1. ``kmeans_train`` runs ``iterations`` Lloyd rounds; its final
         ASSIGNMENT is the coarse quantization (by construction it equals
         re-assigning every vector against the returned codebook — no
         second assignment pass needed).
      2. Queries rank the k centroids by the same integer score
         (|c|^2 - 2<q,c>, centroid-id tiebreak) — the codebook is k*dim
         driver-side literals, so probe selection is MAP-ONLY (array_sort
         over k structs inside codegen, no join).
      3. Probed clusters' members are scored by float cosine (rounded
         6dp) with a total (cosine desc, id asc) order — identical output
         shape and arithmetic to the other ANN operators.

    At 100 TB: training cost is the Lloyd loop (assignment map-only,
    update shuffles O(k*dim*partitions) partial sums); the search adds
    one broadcast join of the probed queries against cluster members.
    ``codebook_as_literals`` picks the codebook transport for BOTH the
    Lloyd loop and the probe ranking (None = auto by k*dim): literals
    for coarse k, a one-row broadcast codebook frame past a few thousand
    centroids — bit-parity either way (same integer score + tiebreak)."""
    from credit_abs_oltp_to_mart_spark.operators.kmeans import (
        FP_SCALE,
        _to_fp,
        centroid_score_structs,
        codebook_frame,
        codebook_score_structs_expr,
        kmeans_train,
        use_literal_codebook,
    )

    assign, cents = kmeans_train(
        emb,
        init_ids=init_ids,
        iterations=iterations,
        id_col="vec_id",
        vec_col=vec_col,
        fp_scale=FP_SCALE,
        codebook_as_literals=codebook_as_literals,
    )
    members = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col(vec_col).alias("nv")
    ).join(
        assign.select(F.col("vec_id").alias("neighbor_id"), "cluster"),
        "neighbor_id",
    )
    # SAME scoring builder family as the Lloyd loop (see
    # centroid_score_structs / codebook_score_structs_expr): probe
    # ranking must rank by the exact expression assignment used
    qsrc = emb.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col(vec_col).alias("qv"),
        _to_fp(vec_col, FP_SCALE).alias("__qa"),
    )
    if use_literal_codebook(cents, codebook_as_literals):
        ranked = F.array_sort(F.array(*centroid_score_structs(cents, "__qa")))
    else:
        qsrc = qsrc.crossJoin(
            F.broadcast(codebook_frame(emb.sparkSession, cents))
        )
        ranked = F.array_sort(codebook_score_structs_expr("__qa"))
    probes = (
        # array_sort on (score, cid) structs IS the ranked probe list:
        # lexicographic struct order = integer L2 score with id tiebreak
        qsrc.select(
            "query_id",
            "qv",
            F.explode(F.slice(ranked, 1, nprobe)).alias("pr"),
        )
        .select("query_id", "qv", F.col("pr.cid").alias("cluster"))
    )
    scored = (
        members.join(F.broadcast(probes), "cluster")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("qv"), F.col("nv")), 6).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def quantized_ivf_topk_trained(
    emb: DataFrame,
    query_ids: list[int],
    *,
    init_ids: list[int],
    iterations: int = 3,
    k: int = 5,
    nprobe: int = 2,
    levels: int = 256,
    vec_col: str = "embedding",
    codebook_as_literals: bool | None = None,
) -> DataFrame:
    """The FULL production ANN stack in one plan — train -> quantize ->
    probe -> compressed-domain score:

      1. ``kmeans_train`` supplies the coarse codebook; its assignment IS
         the inverted file (same equivalence as ``ivf_topk_trained``).
      2. Every vector is scalar-quantized to ``levels`` integer codes
         (``quantize_embeddings`` — per-vector scaling, map-only); at
         100 TB the search serves from this 4-8x smaller representation,
         never touching the float column.
      3. Queries rank the codebook by the shared integer L2 score
         (literal or broadcast-frame transport, same as the other
         trained-IVF paths) and probe ``nprobe`` clusters.
      4. Candidates in probed clusters score by the dot product of their
         RECONSTRUCTED values (``mn + code * span/(levels-1)`` per
         component, computed in registers from the int8-class codes +
         two doubles — the standard scalar-quantization serving shape:
         the search still reads only the compressed representation).
         Raw code dots would NOT rank correctly here: per-vector (mn,
         span) scaling makes code magnitudes incomparable across
         vectors. The fold is a zip_with + aggregate in array order, so
         the IEEE result (rounded 6dp, id tiebreak) is engine-exact.

    Returns (query_id, neighbor_id, rank, score).
    """
    from credit_abs_oltp_to_mart_spark.operators.kmeans import (
        FP_SCALE,
        _to_fp,
        centroid_score_structs,
        codebook_frame,
        codebook_score_structs_expr,
        kmeans_train,
        use_literal_codebook,
    )

    assign, cents = kmeans_train(
        emb,
        init_ids=init_ids,
        iterations=iterations,
        id_col="vec_id",
        vec_col=vec_col,
        fp_scale=FP_SCALE,
        codebook_as_literals=codebook_as_literals,
    )
    q = quantize_embeddings(emb, vec_col=vec_col, levels=levels)
    codes = q.select(
        "vec_id",
        "codes",
        F.col("scale_min").alias("mn"),
        (F.col("scale_max") - F.col("scale_min")).alias("sp"),
    )
    members = codes.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("codes").alias("nc"),
        F.col("mn").alias("nmn"),
        F.col("sp").alias("nsp"),
    ).join(
        assign.select(F.col("vec_id").alias("neighbor_id"), "cluster"),
        "neighbor_id",
    )
    qsrc = emb.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        _to_fp(vec_col, FP_SCALE).alias("__qa"),
    )
    if use_literal_codebook(cents, codebook_as_literals):
        ranked = F.array_sort(F.array(*centroid_score_structs(cents, "__qa")))
    else:
        qsrc = qsrc.crossJoin(
            F.broadcast(codebook_frame(emb.sparkSession, cents))
        )
        ranked = F.array_sort(codebook_score_structs_expr("__qa"))
    probes = (
        qsrc.select(
            "query_id",
            F.explode(F.slice(ranked, 1, nprobe)).alias("pr"),
        )
        .select("query_id", F.col("pr.cid").alias("cluster"))
        .join(
            codes.select(
                F.col("vec_id").alias("query_id"),
                F.col("codes").alias("qc"),
                F.col("mn").alias("qmn"),
                F.col("sp").alias("qsp"),
            ),
            "query_id",
        )
    )
    lv = float(levels - 1)
    scored = (
        members.join(F.broadcast(probes), "cluster")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.expr(
                    "aggregate(zip_with(nc, qc, (a, b) ->"
                    f" (nmn + cast(a as double) * nsp / {lv}d)"
                    f" * (qmn + cast(b as double) * qsp / {lv}d)),"
                    " cast(0 as double), (acc, x) -> acc + x)"
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def build_ivf_index(
    emb: DataFrame,
    index_dir: str,
    *,
    init_ids: list[int],
    iterations: int = 3,
    levels: int = 256,
    vec_col: str = "embedding",
    codebook_as_literals: bool | None = None,
) -> None:
    """BUILD-once half of the persisted ANN index (the production serving
    shape: train offline, write the index, answer queries from cold reads
    without ever retraining — the ANN analogue of the dedup signature
    store):

      ``<index_dir>/centroids``  (cid, cent) — the trained fixed-point
          codebook (k rows; consumers recompute |c|^2 inside the shared
          scoring kernels, so nothing derived is persisted);
      ``<index_dir>/postings``   (vec_id, codes, mn, sp) PARTITIONED BY
          cluster — the inverted file, holding only the scalar-quantized
          representation (4-8x smaller than the float column) plus the two
          per-vector reconstruction doubles.

    Everything persisted is integer or IEEE-double-exact, so a cold read
    reproduces the in-plan search bit-for-bit. Partitioning the postings
    by cluster is the scale lever: a probe touches only its clusters'
    files (partition pruning), never the full table.

    A REBUILD (new codebook) also clears the ``postings_inc`` overlay and
    the ``ingest_checkpoint`` ``stream_ann_ingest`` maintains: incremental
    postings were assigned and quantized under the OLD codebook, so a
    union probe over them after retraining would mix cluster geometries —
    the offline-refresh contract is retrain, re-ingest."""
    from credit_abs_oltp_to_mart_spark.operators.kmeans import kmeans_train
    from credit_abs_oltp_to_mart_spark.sources.maintenance import _hadoop_fs

    fs, _ = _hadoop_fs(emb.sparkSession, index_dir)
    jvm_path = emb.sparkSession._jvm.org.apache.hadoop.fs.Path
    for stale in ("postings_inc", "ingest_checkpoint"):
        p = jvm_path(f"{index_dir}/{stale}")
        if fs.exists(p):
            fs.delete(p, True)

    assign, cents = kmeans_train(
        emb,
        init_ids=init_ids,
        iterations=iterations,
        id_col="vec_id",
        vec_col=vec_col,
        codebook_as_literals=codebook_as_literals,
    )
    spark = emb.sparkSession
    cent_rows = [
        (int(cid), [int(x) for x in cents[cid]]) for cid in sorted(cents)
    ]
    local_rows(spark, 
        cent_rows, "cid bigint, cent array<bigint>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/centroids")
    codes = quantize_embeddings(emb, vec_col=vec_col, levels=levels)
    # repartition by cluster before partitionBy — one file per cluster
    # instead of one per (write task x cluster); see build_pq_index
    (
        codes.select(
            "vec_id",
            "codes",
            F.col("scale_min").alias("mn"),
            (F.col("scale_max") - F.col("scale_min")).alias("sp"),
        )
        .join(assign.select("vec_id", "cluster"), "vec_id")
        .repartition("cluster")
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(f"{index_dir}/postings")
    )


def assign_against_codebook(
    batch: DataFrame,
    cents: dict[int, list[int]],
    *,
    vec_col: str = "embedding",
    codebook_as_literals: bool | None = None,
) -> DataFrame:
    """(vec_id, cluster) for NEW vectors against a FIXED trained codebook
    — the online half of the offline-train / online-assign regime a
    served IVF index runs (``stream_ann_ingest`` maintains the index with
    it; no retraining ever happens on the ingest path).

    Bit-parity with the assignment ``kmeans_train`` produced: the same
    integer L2 score |c|^2 - 2<v,c> through the same literal/broadcast
    scoring kernels, the same (score, cid) tiebreak — so an ingested
    vector lands in exactly the cluster the index's OWN codebook assigns
    it to (a rebuild that RETRAINS on the grown corpus is a different
    codebook by design — that is the offline refresh, not this path).
    Map-only: nothing shuffles, the codebook ships as plan literals or
    one broadcast row."""
    from credit_abs_oltp_to_mart_spark.operators.kmeans import (
        FP_SCALE,
        _to_fp,
        centroid_score_structs,
        codebook_frame,
        codebook_score_structs_expr,
        use_literal_codebook,
    )

    src = batch.select("vec_id", _to_fp(vec_col, FP_SCALE).alias("__a"))
    if use_literal_codebook(cents, codebook_as_literals):
        cluster = F.array_min(F.array(*centroid_score_structs(cents, "__a")))[
            "cid"
        ]
    else:
        src = src.crossJoin(
            F.broadcast(codebook_frame(batch.sparkSession, cents))
        )
        cluster = F.array_min(codebook_score_structs_expr("__a"))["cid"]
    return src.select("vec_id", cluster.alias("cluster"))


def assign_against_hier_codebook(
    batch: DataFrame,
    coarse_cents: dict[int, list[int]],
    sub: dict[int, dict[int, list[int]]],
    *,
    nprobe: int = 1,
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster) for NEW vectors against a FIXED trained TWO-LEVEL
    codebook — the online half of ``kmeans.hier_train`` exactly as
    ``assign_against_codebook`` is the online half of ``kmeans_train``.
    The scale path for a continuously-served semantic gate whose leaf
    count k scales with the corpus (SemDeDup's recipe): scoring is
    O(coarse + nprobe*sub_k) per vector ~ O(sqrt(k)) instead of the flat
    O(k), with identical (score, id) tiebreaks to ``kmeans_assign_hier``
    so an online assignment matches what retraining-side serve would
    emit. Map-only: the two-level codebook ships as one broadcast row."""
    from credit_abs_oltp_to_mart_spark.operators.kmeans import (
        FP_SCALE,
        _hier_cand_scores_expr,
        _hier_frame,
        _to_fp,
    )

    src = batch.select("vec_id", _to_fp(vec_col, FP_SCALE).alias("a"))
    frame = _hier_frame(batch.sparkSession, coarse_cents, sub)
    best = F.array_min(_hier_cand_scores_expr("a", nprobe))
    return src.crossJoin(F.broadcast(frame)).select(
        "vec_id", best["scid"].alias("cluster")
    )


def load_index_codebook(
    spark: SparkSession, index_dir: str
) -> dict[int, list[int]]:
    """The persisted fixed-point codebook as {cid: centroid} — a k-row
    cold read, O(k*dim) on the driver (the Lloyd-loop transport shape)."""
    return {
        int(r["cid"]): list(r["cent"])
        for r in spark.read.parquet(f"{index_dir}/centroids").collect()
    }


def ivf_index_probe(
    queries: DataFrame,
    index_dir: str,
    *,
    k: int = 5,
    nprobe: int = 2,
    levels: int = 256,
    vec_col: str = "embedding",
    codebook_as_literals: bool | None = None,
    include_incremental: bool = False,
) -> DataFrame:
    """SERVE-many half of the persisted ANN index: answer ``queries``
    (a small (vec_id, vector) frame — in production the query embeddings
    arrive from outside at request time) from the index written by
    ``build_ivf_index``, with NO training and NO scan of the raw float
    corpus: the candidate side reads only the quantized postings.

    Plan shape: the codebook is a k-row cold read collected O(k*dim) to
    the driver and shipped through the shared literal/broadcast scoring
    kernel (bit-parity with the Lloyd loop, so probe ranking equals the
    ranking the index was built under); query codes are quantized on the
    fly (map-only over the tiny query frame — identical arithmetic to the
    stored codes); the postings join broadcasts the probe set, so
    Spark's dynamic partition pruning restricts the postings scan to the
    probed clusters' partitions. Scoring is the compressed-domain
    reconstruction dot product of ``quantized_ivf_topk_trained`` —
    serving from the index is bit-identical to the in-plan search."""
    from credit_abs_oltp_to_mart_spark.operators.kmeans import (
        FP_SCALE,
        _to_fp,
        centroid_score_structs,
        codebook_frame,
        codebook_score_structs_expr,
        use_literal_codebook,
    )

    spark = queries.sparkSession
    cents = load_index_codebook(spark, index_dir)
    qsrc = queries.select(
        F.col("vec_id").alias("query_id"),
        _to_fp(vec_col, FP_SCALE).alias("__qa"),
    )
    if use_literal_codebook(cents, codebook_as_literals):
        ranked = F.array_sort(F.array(*centroid_score_structs(cents, "__qa")))
    else:
        qsrc = qsrc.crossJoin(F.broadcast(codebook_frame(spark, cents)))
        ranked = F.array_sort(codebook_score_structs_expr("__qa"))
    qcodes = quantize_embeddings(queries, vec_col=vec_col, levels=levels).select(
        F.col("vec_id").alias("query_id"),
        F.col("codes").alias("qc"),
        F.col("scale_min").alias("qmn"),
        (F.col("scale_max") - F.col("scale_min")).alias("qsp"),
    )
    probes = (
        qsrc.select(
            "query_id", F.explode(F.slice(ranked, 1, nprobe)).alias("pr")
        )
        .select("query_id", F.col("pr.cid").cast("bigint").alias("cluster"))
        .join(qcodes, "query_id")
    )
    members = spark.read.parquet(f"{index_dir}/postings").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("codes").alias("nc"),
        F.col("mn").alias("nmn"),
        F.col("sp").alias("nsp"),
        F.col("cluster").cast("bigint").alias("cluster"),
        F.lit(-1).cast("long").alias("__b"),
    )
    has_inc = False
    if include_incremental:
        # postings appended by stream_ann_ingest since the last base
        # merge: batch-keyed partitions with the cluster as an IN-FILE
        # column (cluster-partition pruning applies to the base only; the
        # incremental side stays small between compactions — the LSM
        # shape every served index runs)
        from pyspark.errors import AnalysisException

        try:
            inc = spark.read.parquet(f"{index_dir}/postings_inc").select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("codes").alias("nc"),
                F.col("mn").alias("nmn"),
                F.col("sp").alias("nsp"),
                F.col("cluster").cast("bigint").alias("cluster"),
                F.col("ingest_batch").cast("long").alias("__b"),
            )
            members = members.unionByName(inc)
            has_inc = True
        except AnalysisException:
            pass  # no incremental postings yet — base-only probe
    lv = float(levels - 1)
    scored = (
        members.join(F.broadcast(probes), "cluster")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            "__b",
            F.round(
                F.expr(
                    "aggregate(zip_with(nc, qc, (a, b) ->"
                    f" (nmn + cast(a as double) * nsp / {lv}d)"
                    f" * (qmn + cast(b as double) * qsp / {lv}d)),"
                    " cast(0 as double), (acc, x) -> acc + x)"
                ),
                6,
            ).alias("score"),
        )
    )
    if has_inc:
        # LSM read-your-latest: a vector present in base AND incremental
        # (a re-delivered slice, or one re-ingested after the base build)
        # must occupy ONE candidate slot, scored from its newest posting
        # (base = batch -1) — otherwise duplicate rows displace
        # legitimate top-k neighbors. Bounded: runs on the already
        # probe-joined candidate set, never the full postings table.
        # (A vector whose UPDATE moved it across clusters still needs
        # compaction to retire the old-cluster posting — compact_keyed_
        # store is that path.)  The score tiebreak makes the kept row
        # deterministic even if one ingest batch carries the same vec_id
        # twice with different vectors (same __b): the higher score wins,
        # so the engine-exact replay guarantee holds for any input.
        wd = Window.partitionBy("query_id", "neighbor_id").orderBy(
            F.col("__b").desc(), F.col("score").desc()
        )
        scored = (
            scored.withColumn("__rn", F.row_number().over(wd))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
    scored = scored.drop("__b")
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def lsh_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: compare only within the query's LSH bucket.

    The bucket equi-join replaces the cross join — at N vectors and B
    buckets the work drops from O(Q*N) to O(Q*N/B) with recall traded via
    n_planes. Same output shape as brute_force_topk."""
    bucketed = bucketize(emb, n_planes, dim, seed, vec_col)
    q = F.broadcast(
        bucketed.where(F.col("vec_id").isin(query_ids)).select(
            F.col("vec_id").alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.col("bucket"),
        )
    )
    scored = (
        bucketed.select(
            F.col("vec_id").alias("neighbor_id"), F.col(vec_col).alias("nv"), "bucket"
        )
        .join(q, "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("qv"), F.col("nv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def quantize_embeddings(
    df: DataFrame, *, vec_col: str = "embedding", levels: int = 256
) -> DataFrame:
    """Per-vector scalar quantization of float embeddings to ``levels``
    integer codes (int8-class storage: 4x smaller than float32, 8x than
    float64 — at 100 TB the embedding column IS the table, so this is the
    difference between scanning 25 TB and 100 TB for ANN candidate
    generation).

    Each vector scales by its own (min, max) — codes
    ``floor((x - min)/span * (levels-1) + 0.5)`` — computed entirely with
    higher-order array functions inside codegen: no UDF, no explode, one
    map-only pass. Reconstruction params ride along as two doubles per
    row. The arithmetic is plain IEEE double in array order, so any
    engine reproduces the codes exactly.
    """
    mn = F.array_min(vec_col).cast("double")
    mx = F.array_max(vec_col).cast("double")
    out = (
        df.withColumn("__mn", mn)
        .withColumn(
            "__span",
            F.when(mx != mn, mx - mn).otherwise(F.lit(1.0)),
        )
        .withColumn(
            "codes",
            F.expr(
                f"transform({vec_col}, x -> cast(floor((cast(x as double)"
                f" - __mn) / __span * {levels - 1}.0d + 0.5d) as bigint))"
            ),
        )
    )
    return out.select(
        df.columns[0],
        F.col("__mn").alias("scale_min"),
        (F.col("__mn") + F.col("__span")).alias("scale_max"),
        "codes",
    )


def recall_at_k(approx: DataFrame, exact: DataFrame) -> DataFrame:
    """Per-query recall@k of an ANN result against exact ground truth.

    Both inputs carry (query_id, neighbor_id) rows (the shape every *_topk
    here emits). recall = |approx ∩ exact| / |exact| per query — the
    standard ANN quality metric, computed as a left join from the truth
    set so queries the approximate index missed entirely still score 0.
    BOTH sides are deduplicated first — a duplicated (query, neighbor)
    row on the approx side would multiply its truth row through the join,
    and a duplicated truth row would inflate the denominator; either skews
    recall.
    Distributed: one hash join + one grouped aggregation on query_id."""
    hits = exact.select("query_id", "neighbor_id").distinct().join(
        approx.select("query_id", "neighbor_id")
        .distinct()
        .withColumn("hit", F.lit(1)),
        ["query_id", "neighbor_id"],
        "left",
    )
    return hits.groupBy("query_id").agg(
        (
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("recall")
    )


def pq_train(
    emb: DataFrame,
    *,
    m: int,
    init_ids: list[int],
    iterations: int = 2,
    dim: int = 64,
    vec_col: str = "embedding",
) -> list[dict[int, list[int]]]:
    """Product-quantization codebooks (Jegou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): the vector space is split
    into ``m`` contiguous subspaces of dim/m components and an INDEPENDENT
    k-means codebook is trained per subspace with the existing exact
    fixed-point Lloyd (``kmeans_train`` on a sliced column — same integer
    arithmetic, so every codebook is bit-replayable in any engine). A
    vector then encodes as m small code ids — with 256-entry codebooks
    that is m BYTES per vector, the 16-64x compression a production
    100 TB vector store actually serves from (scalar quantization,
    ``quantize_embeddings``, only reaches 4-8x).

    Returns one {cluster_label: fixed-point centroid} dict per subspace
    (labels are the init vector ids, exactly like ``kmeans_train``).
    Driver state is m * k * (dim/m) = k * dim integers — the same
    codebook-transport budget as the coarse Lloyd loop."""
    if dim % m:
        raise ValueError(f"m={m} must divide dim={dim}")
    from credit_abs_oltp_to_mart_spark.operators.kmeans import (
        FP_SCALE,
        _to_fp,
    )

    # ONE fixed-point pass + checkpoint feeds all m sub-trainings
    # (fixed-pointing is elementwise: slice(to_fp(v)) == to_fp(slice(v)),
    # so per-subspace results are bit-identical to training on raw
    # slices) — m separate kmeans_train calls would each re-scale and
    # re-checkpoint the vectors, pure fixed overhead
    v = emb.select(
        "vec_id", _to_fp(vec_col, FP_SCALE).alias("__fa")
    ).localCheckpoint(eager=True)
    return pq_train_fp(
        v, m=m, init_ids=init_ids, iterations=iterations, dim=dim
    )


def pq_train_fp(
    v: DataFrame,
    *,
    m: int,
    init_ids: list[int],
    iterations: int = 2,
    dim: int = 64,
    init_rows: dict[int, list[int]] | None = None,
) -> list[dict[int, list[int]]]:
    """``pq_train`` over an ALREADY fixed-point (vec_id, __fa) frame —
    the entry point for residual encoding, where __fa holds the exact
    bigint residual v_fp - coarse_centroid_fp instead of the raw
    vector's fixed-point image.

    The m sub-trainings are INDEPENDENT Lloyd loops over disjoint slices
    of one checkpointed frame, so they are fused into one job per round
    instead of m sequential ``kmeans_train`` calls (guide §1.2: fix the
    distributed algorithm first — m*(iterations) barriers collapse to
    (iterations)): ONE bounded collect fetches every subspace's init
    centroids (slicing the fixed-point row driver-side is elementwise,
    bit-identical to collecting pre-sliced columns), and each update
    round computes every subspace's assignment map-side and unions the m
    (subspace, cluster, d, val) branches into ONE partial-agg shuffle +
    ONE k*dim-bounded collect. Assignment argmin, (score, cid) tiebreak,
    truncating mean and empty-cluster carry-over are the exact
    ``kmeans_train`` expressions, so the returned codebooks are
    bit-identical to the sequential form (pinned by the ann_pq* oracle
    gates and test_ann_recall)."""
    from credit_abs_oltp_to_mart_spark.operators.kmeans import (
        centroid_score_structs,
        use_literal_codebook,
    )

    dsub = dim // m
    if init_rows is None:
        init_rows = {
            r["vec_id"]: list(r["__fa"])
            for r in v.where(F.col("vec_id").isin(init_ids)).collect()
        }
    if len(init_rows) != len(init_ids) or set(init_rows) != set(init_ids):
        missing = set(init_ids) - set(init_rows)
        raise ValueError(f"init ids not found in input: {sorted(missing)}")
    books: list[dict[int, list[int]]] = [
        {vid: init_rows[vid][s * dsub : (s + 1) * dsub] for vid in init_ids}
        for s in range(m)
    ]
    if not all(use_literal_codebook(b, None) for b in books):
        # sub-codebooks past the literal plan-size envelope: fall back to
        # the per-subspace broadcast-codebook trainer (same arithmetic)
        from credit_abs_oltp_to_mart_spark.operators.kmeans import (
            kmeans_train,
        )

        out: list[dict[int, list[int]]] = []
        for s in range(m):
            sub = v.select(
                "vec_id",
                F.slice(F.col("__fa"), s * dsub + 1, dsub).alias(
                    "embedding"
                ),
            )
            _, cents = kmeans_train(
                sub, init_ids=init_ids, iterations=iterations,
                prescaled=True,
            )
            out.append(cents)
        return out
    for _ in range(iterations - 1):
        branches = None
        for s in range(m):
            arr = f"slice(__fa, {s * dsub + 1}, {dsub})"
            cluster = F.array_min(
                F.array(*centroid_score_structs(books[s], arr))
            )["cid"]
            # two-step select: a generator (posexplode) next to the
            # struct-literal getField in ONE projection makes the
            # analyzer re-derive the struct's field names as col1/col2
            # (FIELD_NOT_FOUND) — split so the argmin resolves first
            b = v.select(
                F.lit(s).alias("__s"),
                cluster.alias("cluster"),
                F.expr(arr).alias("__sub"),
            ).select("__s", "cluster", F.posexplode("__sub").alias("d", "val"))
            branches = b if branches is None else branches.unionByName(b)
        sums = (
            branches.groupBy("__s", "cluster", "d")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .select(
                "__s",
                "cluster",
                "d",
                # same truncating double->bigint mean as kmeans_train
                F.expr("cast(cast(s as double) / n as bigint)").alias("c"),
            )
            .collect()
        )
        new: list[dict[int, list[int]]] = [{} for _ in range(m)]
        for r in sums:
            new[r["__s"]].setdefault(r["cluster"], [0] * dsub)
            new[r["__s"]][r["cluster"]][r["d"]] = r["c"]
        # empty clusters keep their previous centroid, per subspace
        books = [
            {cid: new[s].get(cid, books[s][cid]) for cid in books[s]}
            for s in range(m)
        ]
    return books


def pq_code_columns(
    books: list[dict[int, list[int]]], fp_arr_col: str
) -> list:
    """One dense-code Column per subspace for the FIXED-POINT full vector
    column ``fp_arr_col``: argmin over that subspace's codebook (shared
    integer L2 kernel + (score, cid) tiebreak — bit-parity with the Lloyd
    assignment that trained it), then the cid mapped to its position in
    sorted-cid order, so codes are compact 0..k-1 ints ready for a uint8
    container. Map-only plan literals; no join, no shuffle."""
    from credit_abs_oltp_to_mart_spark.operators.kmeans import (
        centroid_score_structs,
    )

    cols = []
    dsub = len(next(iter(books[0].values())))
    for s, cents in enumerate(books):
        arr = f"slice({fp_arr_col}, {s * dsub + 1}, {dsub})"
        cid = F.array_min(F.array(*centroid_score_structs(cents, arr)))["cid"]
        dense = (
            F.array_position(
                F.array(*[F.lit(c).cast("bigint") for c in sorted(cents)]), cid
            )
            - 1
        )
        cols.append(dense.cast("int").alias(f"__pq{s}"))
    return cols


def build_pq_index(
    emb: DataFrame,
    index_dir: str,
    *,
    coarse_init_ids: list[int],
    pq_init_ids: list[int],
    m: int = 4,
    coarse_iterations: int = 3,
    pq_iterations: int = 2,
    dim: int = 64,
    vec_col: str = "embedding",
    codebook_as_literals: bool | None = None,
    by_residual: bool = False,
    with_refine: bool = False,
    refine_levels: int = 256,
) -> None:
    """BUILD-once half of the persisted IVF-PQ index — the layout FAISS
    calls IndexIVFPQ:

      ``<index_dir>/centroids``     (cid, cent) — the coarse fixed-point
          codebook (same format as ``build_ivf_index``);
      ``<index_dir>/pq_codebooks``  (sub, cid, cent) — m per-subspace
          codebooks (k rows each, fixed-point);
      ``<index_dir>/pq_meta``       (by_residual, m, dim) — the probe
          needs to know which scoring identity the codes were built
          under; ``dim`` lets online ingest reject wrong-width batches
          loudly instead of encoding truncated garbage;
      ``<index_dir>/postings``      (vec_id, pq_codes) PARTITIONED BY
          cluster — the inverted file, holding ONLY the m dense code ids
          per vector: m bytes of payload against dim floats raw, the
          16-64x compression tier under scalar quantization's 4-8x.

    ``with_refine`` additionally writes ``<index_dir>/refine`` — the
    scalar-quantized representation (codes, mn, sp) partitioned by
    cluster, FAISS's IndexRefine companion tier: the probe can ADC-rank
    a shortlist from the PQ codes, then re-score just the shortlist
    against this finer 4-8x representation (``pq_index_probe`` with
    ``refine_k``), recovering most of the recall PQ compression costs
    while still never touching the float corpus.

    ``by_residual=False`` trains the PQ codebooks on the raw vectors;
    ``=True`` is FAISS's default refinement: codebooks quantize the
    RESIDUAL v - coarse_centroid(v), whose spread is the within-cell
    radius instead of the whole space — materially finer cells at the
    same m x k code budget. Residuals are exact bigint differences of
    fixed-point values, so every persisted quantity stays
    engine-replayable; the probe then scores
    <q, cent_cluster> + <q, residual_reconstruction>, both exact.

    The probe side (``pq_index_probe``) never reads the float corpus:
    candidates are scored in the compressed domain via per-query
    asymmetric-distance lookup tables."""
    from credit_abs_oltp_to_mart_spark.operators.kmeans import (
        FP_SCALE,
        _to_fp,
        kmeans_train,
    )
    from credit_abs_oltp_to_mart_spark.sources.maintenance import _hadoop_fs

    spark = emb.sparkSession
    # a REBUILD retrains every codebook: postings ingested under the OLD
    # codebooks (and their refine payloads, and an unrequested refine
    # tier) would mix geometries — clear them, same contract as
    # build_ivf_index (retrain => re-ingest)
    fs, _ = _hadoop_fs(spark, index_dir)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    stale = ["postings_inc", "refine_inc", "ingest_checkpoint"] + (
        [] if with_refine else ["refine"]
    )
    for name in stale:
        p = jvm_path(f"{index_dir}/{name}")
        if fs.exists(p):
            fs.delete(p, True)
    v = emb.select(
        "vec_id", _to_fp(vec_col, FP_SCALE).alias("__fa")
    ).localCheckpoint(eager=True)
    # ONE bounded collect seeds BOTH trainings (raw mode): coarse and PQ
    # init centroids are rows of the same checkpointed frame
    seed_ids = sorted(set(coarse_init_ids) | set(pq_init_ids))
    seed_rows = {
        r["vec_id"]: list(r["__fa"])
        for r in v.where(F.col("vec_id").isin(seed_ids)).collect()
    }
    missing = set(seed_ids) - set(seed_rows)
    if missing:
        raise ValueError(f"init ids not found in input: {sorted(missing)}")
    assign, coarse = kmeans_train(
        v,
        init_ids=coarse_init_ids,
        iterations=coarse_iterations,
        vec_col="__fa",
        codebook_as_literals=codebook_as_literals,
        prescaled=True,
        init_cents={i: seed_rows[i] for i in coarse_init_ids},
    )
    if by_residual:
        cents_frame = F.broadcast(
            local_rows(spark, 
                [
                    (int(cid), [int(x) for x in coarse[cid]])
                    for cid in sorted(coarse)
                ],
                "cluster bigint, __cent array<bigint>",
            )
        )
        enc = (
            v.join(assign.select("vec_id", "cluster"), "vec_id")
            .join(cents_frame, "cluster")
            .select(
                "vec_id",
                "cluster",
                F.expr("zip_with(__fa, __cent, (x, y) -> x - y)").alias(
                    "__fa"
                ),
            )
            .localCheckpoint(eager=True)
        )
    else:
        # codes are cluster-independent here: train from the checkpointed
        # fp frame directly (no per-round re-join), attach clusters only
        # for the postings write
        enc = v.join(assign.select("vec_id", "cluster"), "vec_id")
    books = pq_train_fp(
        enc if by_residual else v,
        m=m, init_ids=pq_init_ids, iterations=pq_iterations, dim=dim,
        # residual seeds are rows of enc (v - coarse centroid), not v —
        # let pq_train_fp collect those itself
        init_rows=None if by_residual else {
            i: seed_rows[i] for i in pq_init_ids
        },
    )
    # the three metadata artifacts are independent tiny writes — overlap
    # them from a driver thread pool (guide §2.6) so they cost max(),
    # not sum(), of the per-job floors
    meta_writes = [
        (
            local_rows(
                spark,
                [
                    (int(cid), [int(x) for x in coarse[cid]])
                    for cid in sorted(coarse)
                ],
                "cid bigint, cent array<bigint>",
            ),
            f"{index_dir}/centroids",
        ),
        (
            local_rows(
                spark,
                [
                    (s, int(cid), [int(x) for x in books[s][cid]])
                    for s in range(m)
                    for cid in sorted(books[s])
                ],
                "sub int, cid bigint, cent array<bigint>",
            ),
            f"{index_dir}/pq_codebooks",
        ),
        (
            local_rows(
                spark,
                [
                    (
                        bool(by_residual),
                        int(m),
                        int(dim),
                        int(refine_levels) if with_refine else None,
                    )
                ],
                "by_residual boolean, m int, dim int, refine_levels int",
            ),
            f"{index_dir}/pq_meta",
        ),
    ]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        list(
            pool.map(
                lambda dp: dp[0]
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(dp[1]),
                meta_writes,
            )
        )
    # repartition by cluster BEFORE partitionBy: without it every write
    # task emits a file into every cluster directory it touches — up to
    # (shuffle partitions) tiny files per cluster, thousands at scaled k,
    # and the SERVE side pays a file-open per file even after partition
    # pruning. One build-side shuffle buys one file per cluster (parquet
    # stays row-group-splittable for read parallelism within a cluster).
    (
        enc.select(
            "vec_id",
            "cluster",
            F.array(*pq_code_columns(books, "__fa")).alias("pq_codes"),
        )
        .repartition("cluster")
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(f"{index_dir}/postings")
    )
    if with_refine:
        (
            quantize_embeddings(emb, vec_col=vec_col, levels=refine_levels)
            .select(
                "vec_id",
                "codes",
                F.col("scale_min").alias("mn"),
                (F.col("scale_max") - F.col("scale_min")).alias("sp"),
            )
            .join(assign.select("vec_id", "cluster"), "vec_id")
            .repartition("cluster")
            .write.mode("overwrite")
            .partitionBy("cluster")
            .parquet(f"{index_dir}/refine")
        )


def load_pq_codebooks(
    spark: SparkSession, index_dir: str
) -> list[dict[int, list[int]]]:
    """The persisted per-subspace codebooks as [{cid: centroid}, ...] —
    an m*k-row cold read, O(k*dim) total on the driver."""
    rows = spark.read.parquet(f"{index_dir}/pq_codebooks").collect()
    m = max(r["sub"] for r in rows) + 1
    books: list[dict[int, list[int]]] = [{} for _ in range(m)]
    for r in rows:
        books[r["sub"]][int(r["cid"])] = list(r["cent"])
    return books


def pq_index_probe(
    queries: DataFrame,
    index_dir: str,
    *,
    k: int = 5,
    nprobe: int = 2,
    vec_col: str = "embedding",
    codebook_as_literals: bool | None = None,
    include_incremental: bool = False,
    refine_k: int | None = None,
) -> DataFrame:
    """SERVE-many half of the persisted IVF-PQ index: asymmetric-distance
    (ADC) scoring of the compressed postings, no training, no scan of the
    raw float corpus.

    ``refine_k`` enables the FAISS IndexRefine pattern on an index built
    ``with_refine``: the ADC ranking keeps a shortlist of ``refine_k``
    candidates per query, ONLY the shortlist joins the scalar-quantized
    refine tier (broadcast keys into the cluster-partitioned refine
    store — partition-pruned, bounded by n_queries * refine_k), and the
    final top-k ranks by the exact re-score <raw query, SQ
    reconstruction>. Output becomes (query_id, neighbor_id, rank,
    score); the re-score restores most of the recall PQ compression
    costs at a bounded extra read.

    Plan shape: both codebooks are cold-read and collected O(k*dim) to
    the driver. Queries rank the coarse codebook through the shared
    literal/broadcast kernel (same integer score and tiebreak as the
    build) and probe ``nprobe`` clusters. Per query, ONE lookup table per
    subspace is computed map-side — lut[s][j] = <q_s, c_s(j)>, the
    fixed-point dot of the query's subspace slice with codeword j, an
    EXACT bigint (this is the "asymmetric" half: the query stays
    unquantized). The probe set (queries x clusters, luts attached)
    broadcasts into the postings join, dynamic partition pruning restricts
    the scan to probed clusters, and each candidate scores as
    sum_s lut[s][code_s] — m integer array lookups per candidate, never
    touching floats. The ADC score is the exact inner product of the
    query with the candidate's PQ reconstruction, so ranking (score desc,
    id asc) is integer-deterministic and engine-exact.

    Under a ``by_residual`` index (``pq_meta``) the identity is
    <q, v> ~ <q, cent_cluster> + <q, residual_reconstruction>: the
    per-(query, probed-cluster) base term <q, cent> is one more exact
    fixed-point dot computed on the tiny probe side; the lookup tables
    hold residual-codeword dots. Candidates still cost m array lookups.

    Returns (query_id, neighbor_id, rank, adc_score); adc_score is in
    fp_scale^2 fixed-point inner-product units."""
    from credit_abs_oltp_to_mart_spark.operators.kmeans import (
        FP_SCALE,
        LITERAL_CODEBOOK_MAX_VALUES,
        _to_fp,
        centroid_score_structs,
        codebook_frame,
        codebook_score_structs_expr,
        use_literal_codebook,
    )

    spark = queries.sparkSession
    coarse = load_index_codebook(spark, index_dir)
    books = load_pq_codebooks(spark, index_dir)
    meta = spark.read.parquet(f"{index_dir}/pq_meta").collect()[0]
    by_residual = bool(meta["by_residual"])
    m = len(books)
    dsub = len(next(iter(books[0].values())))
    lit_coarse = use_literal_codebook(coarse, codebook_as_literals)
    # PQ codebooks hold m*k*dsub = k*dim values — the same plan-size
    # hazard the coarse literal cap guards, resolved with the same dial:
    # explicit flag wins, None auto-selects by total value count
    if codebook_as_literals is not None:
        lit_pq = codebook_as_literals
    else:
        lit_pq = (
            sum(len(b) * dsub for b in books) <= LITERAL_CODEBOOK_MAX_VALUES
        )
    qsrc = queries.select(
        F.col("vec_id").alias("query_id"),
        _to_fp(vec_col, FP_SCALE).alias("__qa"),
    )
    if lit_coarse:
        ranked = F.array_sort(F.array(*centroid_score_structs(coarse, "__qa")))
    else:
        qsrc = qsrc.crossJoin(F.broadcast(codebook_frame(spark, coarse)))
        ranked = F.array_sort(codebook_score_structs_expr("__qa"))
    lut_cols = []
    if lit_pq:
        for s, cents in enumerate(books):
            dots = []
            for cid in sorted(cents):
                lits = ", ".join(str(x) + "L" for x in cents[cid])
                dots.append(
                    F.expr(
                        f"aggregate(zip_with("
                        f"slice(__qa, {s * dsub + 1}, {dsub}),"
                        f" array({lits}), (x, y) -> x * y),"
                        " 0L, (acc, x) -> acc + x)"
                    )
                )
            lut_cols.append(F.array(*dots).alias(f"__lut{s}"))
    else:
        # large-k transport: the m codebooks ride the broadcast manager
        # as ONE one-row frame (__pqcb[s] = codewords of subspace s in
        # cid order); each LUT is a HOF transform over its subspace —
        # identical arithmetic to the literal path, O(1) plan size
        pq_row = [
            [[int(x) for x in cents[cid]] for cid in sorted(cents)]
            for cents in books
        ]
        qsrc = qsrc.crossJoin(
            F.broadcast(
                local_rows(spark, 
                    [(pq_row,)], "__pqcb array<array<array<bigint>>>"
                )
            )
        )
        for s in range(m):
            lut_cols.append(
                F.expr(
                    f"transform(element_at(__pqcb, {s + 1}), cw ->"
                    f" aggregate(zip_with("
                    f"slice(__qa, {s * dsub + 1}, {dsub}), cw,"
                    f" (x, y) -> x * y), 0L, (acc, x) -> acc + x))"
                ).alias(f"__lut{s}")
            )
    if by_residual:
        if lit_coarse:
            # base term per probed cluster: <q, cent> as a (cid -> dot)
            # literal lookup — k entries, probe-side only
            base_entries = []
            for cid in sorted(coarse):
                lits = ", ".join(str(x) + "L" for x in coarse[cid])
                base_entries.append(
                    f"struct({cid}L as cid,"
                    f" aggregate(zip_with(__qa, array({lits}),"
                    f" (x, y) -> x * y), 0L, (acc, x) -> acc + x) as dot)"
                )
            qdotc = F.expr(
                f"filter(array({', '.join(base_entries)}),"
                f" e -> e.cid = pr.cid)[0].dot"
            )
        else:
            # broadcast-path base term: the joined __cbk column already
            # carries every coarse centroid — pick the probed cluster's
            # and dot it with the query, same exact bigint arithmetic
            qdotc = F.expr(
                "aggregate(zip_with(__qa,"
                " filter(__cbk, c -> c.cid = pr.cid)[0].arr,"
                " (x, y) -> x * y), 0L, (acc, x) -> acc + x)"
            )
    else:
        qdotc = F.lit(0).cast("long")
    carry = ["__cbk"] if (by_residual and not lit_coarse) else []
    probes = qsrc.select(
        "query_id",
        "__qa",
        *carry,
        F.explode(F.slice(ranked, 1, nprobe)).alias("pr"),
        *lut_cols,
    ).select(
        "query_id",
        F.col("pr.cid").cast("bigint").alias("cluster"),
        qdotc.alias("__qdotc"),
        *[f"__lut{s}" for s in range(m)],
    )
    members = spark.read.parquet(f"{index_dir}/postings").select(
        F.col("vec_id").alias("neighbor_id"),
        "pq_codes",
        F.col("cluster").cast("bigint").alias("cluster"),
        F.lit(-1).cast("long").alias("__b"),
    )
    has_inc = False
    if include_incremental:
        # batch-scoped postings appended by pq_ingest_batch since the
        # last rebuild — same LSM union shape as ivf_index_probe
        from pyspark.errors import AnalysisException

        try:
            inc = spark.read.parquet(f"{index_dir}/postings_inc").select(
                F.col("vec_id").alias("neighbor_id"),
                "pq_codes",
                F.col("cluster").cast("bigint").alias("cluster"),
                F.col("ingest_batch").cast("long").alias("__b"),
            )
            members = members.unionByName(inc)
            has_inc = True
        except AnalysisException:
            pass  # no incremental postings yet — base-only probe
    adc = F.col("__qdotc")
    for s in range(m):
        adc = adc + F.get(F.col(f"__lut{s}"), F.col("pq_codes").getItem(s))
    scored = (
        members.join(F.broadcast(probes), "cluster")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            "cluster",
            "__b",
            adc.cast("bigint").alias("adc_score"),
        )
    )
    if has_inc:
        # LSM read-your-latest on the probe-joined candidate set (same
        # rationale, bound, and same-batch-duplicate tiebreak as
        # ivf_index_probe: newest batch first, higher ADC score wins ties)
        wd = Window.partitionBy("query_id", "neighbor_id").orderBy(
            F.col("__b").desc(), F.col("adc_score").desc()
        )
        scored = (
            scored.withColumn("__rn", F.row_number().over(wd))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id").asc()
    )
    if refine_k is None:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "adc_score")
        )
    # ---- ADC-shortlist + exact re-scoring (FAISS IndexRefine) ----
    # The ADC ranking keeps refine_k candidates per query; ONLY those
    # rows join the scalar-quantized refine tier — a broadcast of
    # n_queries*refine_k keys against the cluster-partitioned refine
    # store (DPP prunes to the shortlisted clusters), never a corpus
    # scan. The re-score is asymmetric-exact: the RAW query against the
    # neighbor's reconstruction, IEEE double in array order (6dp,
    # id tiebreak), so any engine replays the refined ranking.
    if refine_k < k:
        raise ValueError(f"refine_k={refine_k} must be >= k={k}")
    if (
        "refine_levels" not in (meta.__fields__ or [])
        or meta["refine_levels"] is None
    ):
        raise ValueError(
            f"index at {index_dir} was built without with_refine=True"
        )
    rl = int(meta["refine_levels"])
    shortlist = (
        scored.withColumn("__sr", F.row_number().over(w))
        .where(F.col("__sr") <= refine_k)
        .select("query_id", "neighbor_id", "cluster", "__b")
    )
    ref = spark.read.parquet(f"{index_dir}/refine").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("codes").alias("nc"),
        F.col("mn").alias("nmn"),
        F.col("sp").alias("nsp"),
        F.col("cluster").cast("bigint").alias("cluster"),
        F.lit(-1).cast("long").alias("__b"),
    )
    if has_inc:
        from pyspark.errors import AnalysisException

        try:
            rinc = spark.read.parquet(f"{index_dir}/refine_inc").select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("codes").alias("nc"),
                F.col("mn").alias("nmn"),
                F.col("sp").alias("nsp"),
                F.col("cluster").cast("bigint").alias("cluster"),
                F.col("ingest_batch").cast("long").alias("__b"),
            )
            ref = ref.unionByName(rinc)
        except AnalysisException:
            pass  # no incremental refine payload — base tier only
    qv = queries.select(
        F.col("vec_id").alias("query_id"), F.col(vec_col).alias("__qv")
    )
    lvr = float(rl - 1)
    refined = (
        ref.join(
            F.broadcast(shortlist), ["cluster", "neighbor_id", "__b"]
        )
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.expr(
                    "aggregate(zip_with(nc, __qv, (a, x) ->"
                    f" (nmn + cast(a as double) * nsp / {lvr}d)"
                    " * cast(x as double)),"
                    " cast(0 as double), (acc, x) -> acc + x)"
                ),
                6,
            ).alias("score"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        refined.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def load_pq_index(spark: SparkSession, index_dir: str):
    """(coarse codebook, pq codebooks, meta row) in one cold read —
    O(k*dim) driver state, the load a long-running ingest job hoists
    out of its per-batch loop."""
    return (
        load_index_codebook(spark, index_dir),
        load_pq_codebooks(spark, index_dir),
        spark.read.parquet(f"{index_dir}/pq_meta").collect()[0],
    )


def pq_ingest_batch(
    batch: DataFrame,
    index_dir: str,
    *,
    batch_id: int,
    vec_col: str = "embedding",
    codebook_as_literals: bool | None = None,
    loaded=None,
) -> DataFrame:
    """Online half of the persisted IVF-PQ index — encode ONE batch of
    NEW vectors against the FIXED persisted codebooks (no retraining,
    the same offline-train / online-assign regime ``stream_ann_ingest``
    runs for the scalar-quantized index) and append it as a batch-scoped
    partition under ``<index_dir>/postings_inc/batch=<batch_id>``.

    Bit-parity with the build: coarse assignment goes through
    ``assign_against_codebook`` (same integer score + tiebreak), PQ
    codes through the same ``pq_code_columns`` argmin over the persisted
    sub-codebooks — under ``by_residual`` the residual is the same exact
    bigint difference — so a vector ingested online gets exactly the
    posting a rebuild would give it. Map-only (codebooks ship as plan
    literals / broadcast); the batch-id-scoped overwrite is idempotent
    under crash replay. Returns (vec_id, cluster) for the ingested rows.
    ``loaded`` takes a ``load_pq_index`` result so a streaming loop pays
    the codebook cold read once, not per batch."""
    from credit_abs_oltp_to_mart_spark.operators.kmeans import (
        FP_SCALE,
        _to_fp,
    )

    spark = batch.sparkSession
    coarse, books, meta = loaded or load_pq_index(spark, index_dir)
    assigned = assign_against_codebook(
        batch, coarse, vec_col=vec_col,
        codebook_as_literals=codebook_as_literals,
    )
    v = batch.select(
        "vec_id", _to_fp(vec_col, FP_SCALE).alias("__fa")
    ).join(assigned, "vec_id")
    if "dim" in (meta.__fields__ or []):
        # a wrong-width batch would otherwise encode garbage codes
        # SILENTLY (zip_with/slice truncate); fail loudly row-side
        # instead — assert_true is a map-only null column, no extra job
        idx_dim = int(meta["dim"])
        guard = F.assert_true(
            F.size("__fa") == idx_dim,
            F.concat(
                F.lit(
                    f"pq_ingest_batch: index at {index_dir} was built"
                    f" with dim={idx_dim}, got a vector of dim="
                ),
                F.size("__fa").cast("string"),
                F.lit(" (vec_id="),
                F.col("vec_id").cast("string"),
                F.lit(")"),
            ),
        )
        # the guard must ride a LIVE column or pruning elides it:
        # assert_true is null on success, so this is the identity on __fa
        v = v.withColumn(
            "__fa", F.when(guard.isNull(), F.col("__fa"))
        )
    if bool(meta["by_residual"]):
        cents_frame = F.broadcast(
            local_rows(spark, 
                [
                    (int(cid), [int(x) for x in coarse[cid]])
                    for cid in sorted(coarse)
                ],
                "cluster bigint, __cent array<bigint>",
            )
        )
        v = v.join(cents_frame, "cluster").select(
            "vec_id",
            "cluster",
            F.expr("zip_with(__fa, __cent, (x, y) -> x - y)").alias("__fa"),
        )
    out = v.select(
        "vec_id",
        "cluster",
        F.array(*pq_code_columns(books, "__fa")).alias("pq_codes"),
        F.lit(batch_id).cast("long").alias("ingest_batch"),
    )
    from credit_abs_oltp_to_mart_spark.functions import plancap

    plancap.capture(out, f"encoded_batch{batch_id}")
    out.write.mode("overwrite").parquet(
        f"{index_dir}/postings_inc/batch={batch_id}"
    )
    if (
        "refine_levels" in (meta.__fields__ or [])
        and meta["refine_levels"] is not None
    ):
        # the index carries a refine tier — keep it consistent: encode
        # the batch's SQ payload too, so a refined probe can re-score
        # ingested vectors (same batch-scoped idempotent overwrite)
        (
            quantize_embeddings(
                batch, vec_col=vec_col, levels=int(meta["refine_levels"])
            )
            .select(
                "vec_id",
                "codes",
                F.col("scale_min").alias("mn"),
                (F.col("scale_max") - F.col("scale_min")).alias("sp"),
            )
            .join(assigned, "vec_id")
            .withColumn("ingest_batch", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .parquet(f"{index_dir}/refine_inc/batch={batch_id}")
        )
    return out.select("vec_id", "cluster")
