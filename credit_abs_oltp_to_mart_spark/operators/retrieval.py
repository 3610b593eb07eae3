"""Retrieval-side curation: Okapi BM25 top-k document retrieval over an
inverted postings frame (Robertson & Zaragoza 2009) — the standard tool
behind decontamination-by-retrieval, hard-negative mining, and
eval-set-similarity audits in a pretraining data pipeline.

Engine-exact by construction (the ``classifier.py`` / ``bigram_fluency``
precedent — replace the transcendental with an exact rational
surrogate computed in bigint arithmetic):

  * the IDF is the log-free Robertson ratio
    ``idf_fp = floor(S * (2(N - df) + 1) / (2N + 1))`` — the
    probability mass of docs NOT containing the term, at fixed point S.
    It is bounded in [0, S] (no rare-term blowup) and strictly
    rank-monotone in df exactly like ``ln((N - df + .5)/(df + .5))``;
    the log's cross-term damping is traded for bigint replayability,
    the same trade ``unigram``'s piecewise-linear -log p makes;
  * the TF saturation keeps BM25's exact rational form. With
    k1 = k1n/k1d and b = bn/bd::

      tfpart = tf(k1+1) / (tf + k1(1 - b + b*dl/avgdl))

    multiplying through by ``k1d * bd * T`` (T = total corpus tokens,
    avgdl = T/N) gives an integer numerator and denominator::

      tfpart_fp = (S * tf * (k1n+k1d) * bd * T)
                    div (tf * k1d * bd * T + k1n*(bd-bn)*T + k1n*bn*dl*N)

  * a term's contribution is ``(idf_fp * tfpart_fp) div S`` and the doc
    score is the exact bigint sum of contributions — truncation only at
    the two documented ``div`` sites, never a float.

Magnitude bounds: the largest intermediate is ``S * tf * (k1n+k1d) *
bd * T`` — with S = 10^6 and default k1/b this stays under 2^63 while
``tf * T < ~10^11``; a 100 TB corpus crosses it. Two defenses, both
shipped: (1) the bigint path carries a LOUD row-side overflow guard
(``assert_true`` riding the live contribution column — a breach fails
the job instead of silently corrupting rankings; the comparisons are
div-rearranged so the GUARD itself cannot overflow), and
(2) ``decimal_scores=True`` lifts the two products to decimal(38,0)
(headroom to ``tf * T < ~2*10^30``) where ``div`` still truncates
exactly and returns bigint — both ratio quotients are <= ~2.2 * S so
the bigint quotient never wraps. The plan shape is unchanged either
way; only the guarded arithmetic differs. The production default is
``decimal_scores="auto"``: N, T, and the max document length are
driver-known before scoring (one small aggregation for ``bm25_topk``,
the persisted totals row for the store probe), so the decimal path is
selected automatically exactly when those magnitudes cannot prove the
int64 envelope — a corpus past the bound scores exactly instead of
failing the job on the guard.

Scale shape: one explode + one (term, doc_id) count aggregation builds
the postings (dl rides along, no per-doc join); the QUERY-TERM
restriction happens before anything heavy — postings join the broadcast
query-term list, so df counting and scoring run on the matched slice
only, never the full vocabulary; corpus totals (N, T) travel as a
one-row crossJoin (broadcast-nested-loop of exactly one row); one
(query_id, doc_id) aggregation and one per-query top-k window finish
it. No corpus-wide cross join anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.functions.parallelism import local_rows

from credit_abs_oltp_to_mart_spark.functions.text import ws_tokens

BM25_SCALE = 10**6
# Okapi defaults k1 = 1.2 = 6/5, b = 0.75 = 3/4, as exact fractions
BM25_K1 = (6, 5)
BM25_B = (3, 4)


def doc_postings(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """(term, doc_id, tf, dl) — the inverted postings frame with the
    doc length attached BEFORE the explode, so the single (term,
    doc_id) count shuffle is the only data movement and no per-doc
    length join ever happens."""
    # dl rides INSIDE the generated struct, computed on a LET-BOUND array:
    # a sibling projection like size(split(text)) would be collapsed ABOVE
    # the Generate and re-evaluated per exploded row, and a naive
    # size(split(text)) inside the lambda re-splits per element (HOFs
    # don't CSE outer expressions) — either way O(dl^2) per doc, a real
    # hang at dl ~ 5*10^5. The one-element transform binds the tokenized
    # array once per doc; size(w.tk) is then O(1) per element.
    tk = ws_tokens(F.col(text_col))
    terms_with_dl = F.get(
        F.transform(
            F.array(F.struct(tk.alias("tk"))),
            lambda w: F.transform(
                w["tk"],
                lambda t: F.struct(
                    t.alias("term"), F.size(w["tk"]).alias("dl")
                ),
            ),
        ),
        F.lit(0),
    )
    toked = docs.select("doc_id", F.explode(terms_with_dl).alias("s")).select(
        "doc_id", F.col("s.term").alias("term"), F.col("s.dl").alias("dl")
    )
    return toked.groupBy("term", "doc_id", "dl").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )


def _int64_ceilings(
    k1: tuple[int, int], b: tuple[int, int], fp_scale: int
) -> dict[str, int]:
    """The exact operand ceilings under which every bigint intermediate
    of the scoring formula stays inside int64 (numerator, all three
    denominator terms with 4x headroom for their sum, and the scaled IDF
    numerator). Used by the runtime guard; recomputed per call so
    non-default k1/b/fp_scale get their own bounds."""
    k1n, k1d = k1
    bn, bd = b
    m = (1 << 63) - 1
    c_tf_t = min(
        m // (fp_scale * (k1n + k1d) * bd),  # score numerator
        (m // 4) // (k1d * bd),  # denominator term 1
    )
    c_dl_n = (m // 4) // (k1n * bn)  # denominator term 3
    c_t = (m // 4) // (k1n * (bd - bn)) if bd > bn else m  # den term 2
    c_n = (m // fp_scale - 1) // 2  # idf numerator
    return {"tf_t": c_tf_t, "dl_n": c_dl_n, "t": c_t, "n": c_n}


def _auto_decimal(
    n_docs: int,
    n_toks: int,
    max_dl: int | None,
    k1: tuple[int, int],
    b: tuple[int, int],
    fp_scale: int,
) -> bool:
    """Mode selection for ``decimal_scores="auto"``: True when the
    DRIVER-KNOWN corpus magnitudes (N, T, max document length) cannot
    prove every per-row bigint intermediate stays inside int64 — then
    the decimal(38,0) path runs instead of the loud guard failing the
    job mid-scoring. tf <= dl <= max_dl bounds both per-row operands,
    so the four checks here are exactly the row-side guard's ceilings
    evaluated at the worst row. Both arithmetics are integer-exact and
    bit-identical where they overlap (pinned by
    test_decimal_and_bigint_paths_agree_in_range); auto only trades
    speed, never values. A legacy store without ``max_dl`` recorded
    (None) conservatively picks decimal — still exact, never wrong."""
    if n_docs <= 0:
        return False  # empty corpus: no rows to score, mode irrelevant
    if max_dl is None:
        return True
    c = _int64_ceilings(k1, b, fp_scale)
    return not (
        n_docs <= c["n"]
        and n_toks <= c["t"]
        and max_dl <= c["tf_t"] // max(n_toks, 1)
        and max_dl <= c["dl_n"] // max(n_docs, 1)
    )


def _score_and_rank(
    cand: DataFrame,
    *,
    k: int,
    k1: tuple[int, int],
    b: tuple[int, int],
    fp_scale: int,
    decimal_scores: bool,
) -> DataFrame:
    """Shared scoring tail: ``cand`` carries (query_id, doc_id, tf, dl,
    df, n_docs, n_toks); returns the ranked top-k. Bigint mode computes
    the two exact ratios in int64 under a LOUD overflow guard (the guard
    comparisons are div-rearranged — e.g. ``tf <= C div n_toks`` instead
    of ``tf * n_toks <= C`` — so the guard itself cannot wrap); decimal
    mode lifts the products to decimal(38,0) (both quotients are
    <= ~2.2 * fp_scale, so ``div``'s bigint result is exact) and asserts
    non-null so a beyond-38-digit corpus fails loudly too."""
    k1n, k1d = k1
    bn, bd = b
    if decimal_scores:
        dec = "cast({x} as decimal(38,0))"
        idf = F.expr(
            f"({dec.format(x=fp_scale)} * (2L * (n_docs - df) + 1L))"
            f" div (2L * n_docs + 1L)"
        )
        tfpart = F.expr(
            f"({dec.format(x=fp_scale)} * tf * {k1n + k1d}L * {bd}L * n_toks)"
            f" div ({dec.format(x='tf')} * {k1d * bd}L * n_toks"
            f" + {dec.format(x=k1n * (bd - bn))} * n_toks"
            f" + {dec.format(x=k1n * bn)} * dl * n_docs)"
        )
        contrib = F.expr(f"(__idf * __tfp) div {fp_scale}L")
        guard = F.assert_true(
            contrib.isNotNull(),
            F.lit(
                "bm25: decimal(38,0) overflow — corpus magnitudes exceed"
                " ~2e30 tf*T; shrink fp_scale"
            ),
        )
    else:
        c = _int64_ceilings(k1, b, fp_scale)
        idf = F.expr(
            f"({fp_scale}L * (2L * (n_docs - df) + 1L))"
            f" div (2L * n_docs + 1L)"
        )
        tfpart = F.expr(
            f"({fp_scale}L * tf * {k1n + k1d}L * {bd}L * n_toks)"
            f" div (tf * {k1d * bd}L * n_toks"
            f" + {k1n * (bd - bn)}L * n_toks + {k1n * bn}L * dl * n_docs)"
        )
        contrib = F.expr(f"(__idf * __tfp) div {fp_scale}L")
        guard = F.assert_true(
            (F.col("tf") <= F.expr(f"{c['tf_t']}L div n_toks"))
            & (F.col("dl") <= F.expr(f"{c['dl_n']}L div n_docs"))
            & (F.col("n_toks") <= F.lit(c["t"]))
            & (F.col("n_docs") <= F.lit(c["n"])),
            F.concat(
                F.lit(
                    "bm25: int64 overflow — corpus magnitudes breach the"
                    f" guarded ceilings (tf*T <= {c['tf_t']},"
                    f" dl*N <= {c['dl_n']}); shrink fp_scale or pass"
                    " decimal_scores=True (tf="
                ),
                F.col("tf").cast("string"),
                F.lit(", dl="),
                F.col("dl").cast("string"),
                F.lit(", T="),
                F.col("n_toks").cast("string"),
                F.lit(", N="),
                F.col("n_docs").cast("string"),
                F.lit(")"),
            ),
        )
    scored = (
        cand.withColumn("__idf", idf)
        .withColumn("__tfp", tfpart)
        .withColumn("__contrib", contrib)
        # the guard must ride the LIVE column or pruning elides it:
        # assert_true is null on success, so this is the identity
        .select(
            "query_id",
            "doc_id",
            F.when(guard.isNull(), F.col("__contrib")).alias("contrib"),
        )
    )
    agg = scored.groupBy("query_id", "doc_id").agg(
        F.sum("contrib").cast("bigint").alias("score_fp")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_fp").desc(), F.col("doc_id").asc()
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", F.col("rank").cast("int").alias("rank"),
                "score_fp")
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    k1: tuple[int, int] = BM25_K1,
    b: tuple[int, int] = BM25_B,
    fp_scale: int = BM25_SCALE,
    text_col: str = "text",
    decimal_scores: bool | str = "auto",
) -> DataFrame:
    """Top-k BM25 retrieval: ``queries`` is a small (query_id, query)
    frame of whitespace-tokenizable query strings; returns
    (query_id, doc_id, rank, score_fp) where score_fp is the exact
    fixed-point BM25 score (scale ``fp_scale``) and rank is dense
    1..k per query by (score_fp desc, doc_id asc). Docs sharing no
    term with the query emit no row; duplicate query terms weigh the
    term once per occurrence (standard bag-of-words BM25).

    ``decimal_scores="auto"`` (the production default) computes the
    corpus totals (N, T, max dl) eagerly driver-side — the same one
    small aggregation the lazy plan ran as its own broadcast stage —
    and picks the decimal(38,0) path exactly when those magnitudes
    cannot prove the int64 envelope (``_auto_decimal``), so a 100 TB
    corpus scores exactly instead of tripping the loud guard mid-job.
    Totals then enter the plan as literals (one fewer broadcast).
    Explicit True/False keep the fully-lazy plan with the in-plan
    totals crossJoin, unchanged."""
    post = doc_postings(docs, text_col=text_col)
    qterms = queries.select(
        "query_id", F.explode(ws_tokens(F.col("query"))).alias("term")
    )
    # restrict the postings stream to query terms FIRST: everything
    # downstream (df counts, scoring) runs on the matched slice
    distinct_terms = qterms.select("term").distinct()
    post_q = post.join(F.broadcast(distinct_terms), "term")
    dfq = post_q.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    joined = post_q.join(F.broadcast(qterms), "term").join(
        F.broadcast(dfq), "term"
    )
    if decimal_scores == "auto":
        t = (
            docs.select(F.size(ws_tokens(F.col(text_col))).alias("__dl"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum("__dl").cast("bigint").alias("n_toks"),
                F.max("__dl").cast("bigint").alias("max_dl"),
            )
            .first()
        )
        n_docs = int(t["n_docs"])
        n_toks = int(t["n_toks"]) if t["n_toks"] is not None else 0
        max_dl = int(t["max_dl"]) if t["max_dl"] is not None else 0
        use_decimal = _auto_decimal(n_docs, n_toks, max_dl, k1, b, fp_scale)
        cand = joined.withColumn(
            "n_docs", F.lit(n_docs).cast("bigint")
        ).withColumn("n_toks", F.lit(n_toks).cast("bigint"))
    else:
        use_decimal = bool(decimal_scores)
        totals = docs.select(
            F.size(ws_tokens(F.col(text_col))).alias("__dl")
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("__dl").cast("bigint").alias("n_toks"),
        )
        cand = joined.crossJoin(F.broadcast(totals))
    return _score_and_rank(
        cand, k=k, k1=k1, b=b, fp_scale=fp_scale,
        decimal_scores=use_decimal,
    )


# --------------------------------------------------------------------------
# persisted postings store: build once, serve many, ingest incrementally
#
# bm25_topk rebuilds the postings per call — fine for one-shot audits,
# wrong for a served retrieval tier where the corpus is 100 TB and the
# queries arrive forever. The store splits the lifecycle exactly like the
# ANN indexes (ann.build_ivf_index / ivf_index_probe / stream_ann_ingest):
#
#   <store>/postings/bucket=<b>/   (term, doc_id, tf, dl) — the inverted
#       file, PARTITIONED BY a term-hash bucket: a query computes its
#       terms' buckets driver-side and the scan prunes to those
#       partitions, so serve cost follows the matched slice, never the
#       corpus. (Partitioning by raw term would explode the filesystem at
#       vocabulary scale; the bucket count is the dial.)
#   <store>/totals/                one row (n_docs, n_toks, n_buckets) —
#       the corpus constants scoring needs, so serving never rescans docs.
#   <store>/postings_inc/batch=<id>/  streamed postings (bucket in-file),
#       batch-scoped overwrites -> crash-replay idempotent; folded by
#       sources.maintenance.compact_keyed_store (its exact contract).
#   <store>/totals_inc/batch=<id>/    per-batch (n_docs, n_toks, max_dl)
#       deltas, same idempotency; serving sums base + deltas (tiny
#       files). Folded by compact_keyed_store exactly like postings_inc
#       (NO dedup_cols — every delta row must survive the merge, since
#       serving sums them); a long-running stream otherwise accretes one
#       partition per batch and the serve-side collect loop grows with
#       stream age.
#
# Everything persisted is integer-exact, so a cold-read probe is
# bit-identical to bm25_topk over the same corpus — pinned by the
# bm25_serve / stream_postings_ingest contract oracles.
# --------------------------------------------------------------------------

POSTINGS_BUCKETS = 64


def term_bucket(term, n_buckets):
    """The store's term -> partition bucket (non-negative xxhash64 mod)."""
    return F.pmod(F.xxhash64(term), F.lit(n_buckets)).cast("int")


def build_postings_store(
    docs: DataFrame,
    store_dir: str,
    *,
    n_buckets: int = POSTINGS_BUCKETS,
    text_col: str = "text",
) -> None:
    """BUILD-once half: write the bucket-partitioned postings and the
    totals row. A REBUILD clears the incremental overlay and the ingest
    checkpoint (stale deltas describe the old corpus — same contract as
    ``ann.build_ivf_index``)."""
    from credit_abs_oltp_to_mart_spark.sources.maintenance import _hadoop_fs

    spark = docs.sparkSession
    fs, _ = _hadoop_fs(spark, store_dir)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    for stale in ("postings_inc", "totals_inc", "ingest_checkpoint"):
        p = jvm_path(f"{store_dir}/{stale}")
        if fs.exists(p):
            fs.delete(p, True)
    post = doc_postings(docs, text_col=text_col).withColumn(
        "bucket", term_bucket(F.col("term"), n_buckets)
    )
    # repartition by bucket before partitionBy — one file per bucket
    # instead of one per (write task x bucket); the serve side pays a
    # file-open per file even after partition pruning
    post.repartition("bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(f"{store_dir}/postings")
    (
        docs.select(F.size(ws_tokens(F.col(text_col))).alias("__dl"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("__dl").cast("bigint").alias("n_toks"),
            # max dl makes the serve-side decimal_scores="auto" decision
            # provable driver-side (tf <= dl <= max_dl bounds every
            # per-row operand of the scoring guard)
            F.max("__dl").cast("bigint").alias("max_dl"),
        )
        .withColumn("n_buckets", F.lit(n_buckets).cast("int"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{store_dir}/totals")
    )


def batch_postings(
    batch: DataFrame, *, n_buckets: int, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """(postings, totals_delta) for one ingest batch — postings carry the
    bucket in-file (the incremental overlay is batch-partitioned, not
    bucket-partitioned), the delta counts EVERY doc (a token-less doc
    emits no postings but still grows n_docs). Pure functions of the
    batch, so a crash replay rewrites byte-identical partitions."""
    post = doc_postings(batch, text_col=text_col).withColumn(
        "bucket", term_bucket(F.col("term"), n_buckets)
    )
    delta = batch.select(
        F.size(ws_tokens(F.col(text_col))).alias("__dl")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("__dl").cast("bigint").alias("n_toks"),
        F.max("__dl").cast("bigint").alias("max_dl"),
    )
    return post, delta


def load_store_totals(spark: SparkSession, store_dir: str) -> dict:
    """{n_docs, n_toks, n_buckets, max_dl} of the BASE store (one-row
    read). ``max_dl`` is None for a store built before it was recorded —
    the auto scoring mode then conservatively picks decimal (exact
    either way)."""
    r = spark.read.parquet(f"{store_dir}/totals").first()
    d = r.asDict()
    return {
        "n_docs": int(r["n_docs"]),
        "n_toks": int(r["n_toks"]) if r["n_toks"] is not None else 0,
        "n_buckets": int(r["n_buckets"]),
        "max_dl": int(d["max_dl"]) if d.get("max_dl") is not None else None,
    }


BM25_DIST_PRUNE_QUERY_ROWS = 5000
"""Query-batch size past which ``bm25_store_probe``'s ``"auto"`` prune
mode stops collecting distinct terms through the driver (watch item r12:
a 10^6-query batch would bloat the plan with `isin` literal lists) and
switches to the broadcast-join prune — the DPP shape the ANN refine
serve already uses."""


def bm25_store_probe(
    queries: DataFrame,
    store_dir: str,
    *,
    k: int = 5,
    k1: tuple[int, int] = BM25_K1,
    b: tuple[int, int] = BM25_B,
    fp_scale: int = BM25_SCALE,
    include_incremental: bool = False,
    decimal_scores: bool | str = "auto",
    distributed_prune: bool | str = "auto",
) -> DataFrame:
    """SERVE-many half: answer ``queries`` from cold reads of the store —
    no tokenization of the corpus, no postings rebuild. For a SMALL query
    batch (the interactive serving shape) the query terms are collected
    driver-side, their buckets computed with the store's hash, and the
    postings scan FILTERED ON THE PARTITION COLUMN — the plan prunes to
    the matched buckets (gated in tests). For a LARGE batch
    (``distributed_prune=True``, or ``"auto"`` past
    ``BM25_DIST_PRUNE_QUERY_ROWS`` query rows) nothing moves through the
    driver: the distinct-term frame carries its own store-hash bucket
    column and is BROADCAST-JOINED against the postings on
    (bucket, term), so Spark's dynamic partition pruning restricts the
    scan to the matched buckets at runtime — the same DPP shape the ANN
    refine serve uses, plan-gated in tests, bit-identical results in
    both modes. With
    ``include_incremental`` the probe unions the streamed overlay
    (read-your-latest on (term, doc_id): latest ingest_batch wins, base
    counts as batch -1) and adds the per-batch totals deltas; df counts
    come from the deduped matched slice, so serving base+overlay is
    bit-identical to a full rebuild over the grown corpus.

    ``decimal_scores="auto"`` (the production default) resolves from
    the DRIVER-KNOWN store totals — N, T, and the recorded max document
    length across base + ingested deltas — via ``_auto_decimal``: the
    decimal(38,0) path is chosen exactly when those magnitudes cannot
    prove the int64 envelope, so a grown corpus keeps scoring exactly
    instead of failing on the loud guard. Values are identical either
    way; only the guarded arithmetic differs."""
    spark = queries.sparkSession
    totals = load_store_totals(spark, store_dir)
    n_buckets = totals["n_buckets"]
    qterms = queries.select(
        "query_id", F.explode(ws_tokens(F.col("query"))).alias("term")
    )
    if distributed_prune == "auto":
        # limit(N+1).count() bounds the decision cost: a 10^9-row query
        # frame must not pay a full scan just to learn it is large
        use_dist = (
            queries.limit(BM25_DIST_PRUNE_QUERY_ROWS + 1).count()
            > BM25_DIST_PRUNE_QUERY_ROWS
        )
    else:
        use_dist = bool(distributed_prune)
    if use_dist:
        # broadcast-join prune: the distinct terms stay distributed,
        # tagged with the store's own bucket hash; DPP restricts the
        # partitioned postings scan to the matched buckets at runtime.
        # The length predicate is semantics-preserving (the store never
        # holds empty terms) and load-bearing: Spark's PartitionPruning
        # rule requires a SELECTIVE filter on the build side — a bare
        # distinct doesn't qualify (see the dpp_marts plan-gate test)
        tdf = (
            qterms.select("term")
            .where(F.length("term") > 0)
            .distinct()
            .withColumn("bucket", term_bucket(F.col("term"), n_buckets))
        )

        def _prune(df: DataFrame) -> DataFrame:
            return df.join(F.broadcast(tdf), ["bucket", "term"])

    else:
        terms = sorted(
            {r["term"] for r in qterms.select("term").distinct().collect()}
        )
        if not terms:
            return spark.createDataFrame(
                [],
                "query_id bigint, doc_id bigint, rank int, score_fp bigint",
            )
        buckets = sorted(
            {
                int(r["b"])
                for r in local_rows(
                    spark, [(t,) for t in terms], "term string"
                )
                .select(term_bucket(F.col("term"), n_buckets).alias("b"))
                .distinct()
                .collect()
            }
        )

        def _prune(df: DataFrame) -> DataFrame:
            return (
                df.where(F.col("bucket").isin(buckets))  # partition-prunes
                .where(F.col("term").isin(terms))
            )

    base = _prune(spark.read.parquet(f"{store_dir}/postings")).select(
        "term", "doc_id", "tf", "dl",
        F.lit(-1).cast("long").alias("ingest_batch")
    )
    n_docs, n_toks = totals["n_docs"], totals["n_toks"]
    max_dl = totals["max_dl"]
    matched = base
    if include_incremental:
        from pyspark.errors import AnalysisException

        from credit_abs_oltp_to_mart_spark.sources.maintenance import (
            resume_pending_compaction,
        )

        inc_dir = f"{store_dir}/postings_inc"
        resume_pending_compaction(spark, inc_dir)
        # the totals overlay is batch=<id>-partitioned too and is folded
        # by the same compact_keyed_store protocol (merging preserves
        # the delta ROWS, and this loop only sums/maxes them) — heal a
        # half-swapped totals compaction before reading
        resume_pending_compaction(spark, f"{store_dir}/totals_inc")
        try:
            inc = _prune(spark.read.parquet(inc_dir)).select(
                "term", "doc_id", "tf", "dl", "ingest_batch"
            )
            matched = base.unionByName(inc)
            for r in spark.read.parquet(f"{store_dir}/totals_inc").collect():
                n_docs += int(r["n_docs"])
                n_toks += int(r["n_toks"] or 0)
                inc_max = r.asDict().get("max_dl")
                if inc_max is None:
                    max_dl = None  # legacy delta: auto falls back to decimal
                elif max_dl is not None:
                    max_dl = max(max_dl, int(inc_max))
        except AnalysisException:
            pass  # no incremental postings yet — base-only serve
        wl = Window.partitionBy("term", "doc_id").orderBy(
            F.col("ingest_batch").desc()
        )
        matched = (
            matched.withColumn("__rn", F.row_number().over(wl))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
    dfq = matched.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    cand = (
        matched.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfq), "term")
        .withColumn("n_docs", F.lit(n_docs).cast("bigint"))
        .withColumn("n_toks", F.lit(n_toks).cast("bigint"))
    )
    if decimal_scores == "auto":
        use_decimal = _auto_decimal(n_docs, n_toks, max_dl, k1, b, fp_scale)
    else:
        use_decimal = bool(decimal_scores)
    return _score_and_rank(
        cand, k=k, k1=k1, b=b, fp_scale=fp_scale,
        decimal_scores=use_decimal,
    )


def rank_fusion(
    hits: list[DataFrame],
    *,
    k: int = 5,
    rrf_k: int = 60,
    max_rank: int = 1000,
    weights: tuple[int, ...] | None = None,
    decimal_scores: bool = False,
) -> DataFrame:
    """Exact-arithmetic reciprocal-rank fusion of L >= 2 shortlists — the
    generalized kernel under ``hybrid_rank_fusion`` (which delegates its
    2-list case here, so the registered contract gate exercises this code
    path). The L-list shape is the standard multi-signal serving pattern:
    BM25 over the body x BM25 over a second field x a dense-embedding
    probe, each contributing 1/(rrf_k + rank).

    Proof sketch (the 2-list argument generalizes verbatim): the RRF
    score is the rational num/den with den = product of the PRESENT
    lists' (rrf_k + rank) factors (missing lists contribute factor 1 in
    both num and den, which cancels), so den <= (rrf_k + max_rank)^L.
    Two distinct L-list rationals differ by at least
    1 / (rrf_k + max_rank)^(2L) = 1/S, so the fixed point

        fused_fp = num * S div den,   S = (rrf_k + max_rank)^(2L)

    orders exactly like the rationals. Envelopes: num <= w_sum *
    (rrf_k + max_rank)^(L-1), so the product num * S needs
    w_sum * (rrf_k + max_rank)^(3L-1) digits of headroom — int64 for
    small L/max_rank, decimal(38,0) via ``decimal_scores=True`` beyond
    (for L = 3 the decimal carrier is needed even at max_rank 1000);
    the ``div`` quotient is bounded by w_sum * S / (rrf_k + 1) and must
    fit int64 in either carrier (checked, loud — at L = 3 that admits
    max_rank up to ~2000; deeper multi-list fusion would need a decimal
    quotient, refused rather than rounded).

    Returns (query_id, doc_id, rank_0..rank_{L-1}, fused_fp, rank) for
    the fused top ``k`` per query; rank_i is NULL where list i missed
    the doc."""
    L = len(hits)
    if L < 2:
        raise ValueError("rank_fusion: need at least 2 shortlists")
    ws = tuple(weights) if weights is not None else (1,) * L
    if len(ws) != L:
        raise ValueError(
            f"rank_fusion: {len(ws)} weights for {L} shortlists"
        )
    for i, w in enumerate(ws):
        if not isinstance(w, int) or isinstance(w, bool):
            raise ValueError(
                f"rank_fusion: weight {w!r} (list {i}) is not an integer —"
                " fractional weights would truncate to 0 in the long cast"
                " and silently mis-rank; scale all weights to integers"
            )
    if any(w < 0 for w in ws) or sum(ws) == 0:
        raise ValueError(
            "rank_fusion: weights must be non-negative integers with a"
            " positive sum"
        )
    if not isinstance(rrf_k, int) or isinstance(rrf_k, bool) or rrf_k < 1:
        raise ValueError("rank_fusion: rrf_k must be an integer >= 1")
    if not isinstance(max_rank, int) or max_rank < 1:
        raise ValueError("rank_fusion: max_rank must be an integer >= 1")
    w_sum = sum(ws)
    base = rrf_k + max_rank
    scale = base ** (2 * L)
    if decimal_scores:
        if w_sum * base ** (3 * L - 1) >= 10**38:
            raise ValueError(
                "rank_fusion: weight sum * (rrf_k+max_rank)^(3L-1)"
                " overflows the decimal(38,0) envelope — lower the"
                " weights, max_rank, or list count"
            )
        if w_sum * scale // (rrf_k + 1) >= 2**63:
            raise ValueError(
                "rank_fusion: weight sum * (rrf_k+max_rank)^(2L) /"
                " (rrf_k+1) overflows the bigint `div` quotient — lower"
                " the weights or max_rank"
            )
    else:
        if w_sum * base ** (3 * L - 1) >= 2**63:
            raise ValueError(
                "rank_fusion: weight sum * (rrf_k+max_rank)^(3L-1)"
                " overflows the separating fixed point's int64 envelope —"
                " lower the weights or max_rank, or pass"
                " decimal_scores=True"
            )
    frames = [
        h.select(
            "query_id", "doc_id",
            F.col("rank").cast("long").alias(f"rank_{i}"),
        )
        for i, h in enumerate(hits)
    ]
    both = frames[0]
    for f2 in frames[1:]:
        both = both.join(f2, ["query_id", "doc_id"], "full_outer")
    rank_cols = [F.col(f"rank_{i}") for i in range(L)]
    over = None
    for rc in rank_cols:
        c = F.coalesce(rc, F.lit(1)) > max_rank
        over = c if over is None else (over | c)
    guard = F.when(
        over,
        F.raise_error(
            F.lit(
                f"rank_fusion: rank beyond max_rank={max_rank} — the"
                " separating-scale exactness proof no longer holds; raise"
                " max_rank to cover the shortlist depth"
            )
        ).cast("long"),
    )
    terms = [F.lit(rrf_k).cast("long") + rc for rc in rank_cols]
    den = None
    for t in terms:
        f3 = F.coalesce(t, F.lit(1))
        den = f3 if den is None else den * f3
    num = None
    for i in range(L):
        others = None
        for j in range(L):
            if j == i:
                continue
            f3 = F.coalesce(terms[j], F.lit(1))
            others = f3 if others is None else others * f3
        part = F.when(
            rank_cols[i].isNotNull(),
            F.lit(ws[i]).cast("long") * others,
        ).otherwise(F.lit(0))
        num = part if num is None else num + part
    num = F.coalesce(guard, num)
    if decimal_scores:
        fp_expr = F.expr(
            f"(cast(__num as decimal(38,0))"
            f" * cast('{scale}' as decimal(38,0))) div __den"
        )
        fp_expr = F.coalesce(
            fp_expr,
            F.raise_error(
                F.lit(
                    "rank_fusion: decimal(38,0) overflow — the num * S"
                    " product exceeded 38 digits despite the envelope"
                    " check (rank data violates the max_rank contract)"
                )
            ).cast("long"),
        )
    else:
        fp_expr = F.expr(f"(__num * {scale}L) div __den")
    fused = both.withColumn("__num", num).withColumn("__den", den).withColumn(
        "fused_fp", fp_expr
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("fused_fp").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id",
                *[f"rank_{i}" for i in range(L)], "fused_fp", "rank")
    )


def hybrid_rank_fusion(
    lex_hits: DataFrame,
    sem_hits: DataFrame,
    *,
    k: int = 5,
    rrf_k: int = 60,
    max_rank: int = 1000,
    weights: tuple[int, int] = (1, 1),
    decimal_scores: bool = False,
) -> DataFrame:
    """Exact-arithmetic reciprocal-rank fusion of a lexical (BM25) and a
    semantic (ANN) shortlist — the standard hybrid-RAG serving pattern,
    fused WITHOUT floating point so the ranking is engine-exact
    (the house rule every scoring kernel here follows).

    Inputs are the two probes' shortlists normalized to
    (query_id, doc_id, rank) with consecutive ``row_number`` ranks in
    [1, ``max_rank``] — each probe breaks score ties by doc_id, so the
    ranks are a strict 1..depth sequence per query
    (``bm25_topk``/``bm25_store_probe`` emit that shape directly;
    ``ann.ivf_index_probe`` after renaming neighbor_id). RRF score of a
    doc is sum over lists of 1/(rrf_k + rank) — a rational. Instead of
    floating 1/(k+r), the sum is formed as an exact integer fraction
    num/den (den = product of the present lists' (rrf_k + rank)) and
    materialized as the SEPARATING fixed point

        fused_fp = num * S div den,   S = (rrf_k + max_rank)^4

    ``decimal_scores=False`` (default) computes num * S in int64, which
    caps max_rank at 1000; ``decimal_scores=True`` lifts the product to
    decimal(38,0) — the same deep-corpus escape hatch ``bm25_topk``
    has — admitting deep-shortlist fusion (re-ranking top-10k and far
    beyond). The separation proof is UNCHANGED in decimal mode: it
    depends only on S >= (product of any two distinct rationals'
    denominators), never on the carrier type; what moves is the
    envelope. Product bound: num <= (w_lex + w_sem)(rrf_k + max_rank),
    so num * S <= (w_lex + w_sem)(rrf_k + max_rank)^5 must fit 38
    digits (checked, loud). Quotient bound: the true RRF score is
    <= (w_lex + w_sem)/(rrf_k + 1), so fused_fp = floor(num * S / den)
    <= (w_lex + w_sem) * S / (rrf_k + 1) must fit int64 (``div`` on
    decimals still returns bigint; checked, loud) — at rrf_k = 60 that
    admits max_rank up to ~10^6 before either bound binds.

    Two distinct two-list RRF rationals have denominators bounded by
    (rrf_k + max_rank)^2, so they differ by at least 1/S; scaling by S
    makes the integer floors differ too (x >= y + 1 => floor(x) >=
    floor(y) + 1), so ORDERING BY fused_fp IS ordering by the exact
    rational — no float ever enters. Magnitudes: num <= 2(rrf_k +
    max_rank), so num * S < 2(rrf_k + max_rank)^5 — inside int64 through
    max_rank = 1000 (~2.7e15). Ranks past ``max_rank`` would break the
    separation proof, so they fail loudly rather than mis-rank.

    Returns (query_id, doc_id, lex_rank, sem_rank, fused_fp, rank) for
    the fused top ``k`` per query, rank dense by (fused_fp desc, doc_id
    asc); lex_rank/sem_rank are NULL for the lists that missed the doc.

    ``weights`` = integer (lexical, semantic) list weights — weighted RRF
    score w_lex/(rrf_k+r_lex) + w_sem/(rrf_k+r_sem), still exact: integer
    numerators don't loosen the separation bound (two distinct rationals
    with denominators <= (rrf_k+max_rank)^2 still differ by >= 1/S), only
    the int64 envelope, which is checked against the weight sum.

    Scale posture: the shortlists are k-sized per query by construction
    (the probes bound them), so the full-outer join and the per-query
    window run on tiny frames — cost lives in the upstream probes. No
    extension of the reference surface is lost by exactness: integer
    Borda is the degenerate rrf_k -> infinity limit of the same key."""
    w_lex, w_sem = weights
    # integrality is load-bearing, not a style check: F.lit(0.6) cast to
    # long silently truncates to 0, so a float weight would zero every
    # fused_fp and degenerate the ranking to doc_id order without any
    # error — mirror the rrf_k guard and fail loudly instead
    for side, w in (("lexical", w_lex), ("semantic", w_sem)):
        if not isinstance(w, int) or isinstance(w, bool):
            raise ValueError(
                f"hybrid_rank_fusion: {side} weight {w!r} is not an"
                " integer — fractional weights would truncate to 0 in the"
                " long cast and silently mis-rank; scale both weights to"
                " integers (RRF ordering only depends on their ratio)"
            )
    if w_lex < 0 or w_sem < 0 or w_lex + w_sem == 0:
        raise ValueError(
            "hybrid_rank_fusion: weights must be non-negative integers"
            " with a positive sum"
        )
    # rrf_k < 1 (or fractional) could zero/negate a denominator; Spark's
    # integer `div` by zero yields NULL, which would silently sort the doc
    # LAST instead of failing — guard loudly like every other precondition
    if not isinstance(rrf_k, int) or isinstance(rrf_k, bool) or rrf_k < 1:
        raise ValueError(
            "hybrid_rank_fusion: rrf_k must be an integer >= 1 — a"
            " non-positive rrf_k can zero/negate an RRF denominator and"
            " Spark's div-by-zero NULL would mis-rank silently"
        )
    if not isinstance(max_rank, int) or max_rank < 1:
        raise ValueError(
            "hybrid_rank_fusion: max_rank must be an integer >= 1"
        )
    if decimal_scores:
        # decimal(38,0) envelope (see docstring): the num * S product
        # must fit 38 digits, and the `div` quotient — still a BIGINT in
        # Spark even for decimal operands — must fit int64
        if (w_lex + w_sem) * (rrf_k + max_rank) ** 5 >= 10**38:
            raise ValueError(
                "hybrid_rank_fusion: weight sum * (rrf_k+max_rank)^5"
                " overflows the decimal(38,0) envelope — lower the"
                " weights or max_rank"
            )
        if (w_lex + w_sem) * (rrf_k + max_rank) ** 4 // (rrf_k + 1) >= 2**63:
            raise ValueError(
                "hybrid_rank_fusion: weight sum * (rrf_k+max_rank)^4 /"
                " (rrf_k+1) overflows the bigint `div` quotient — lower"
                " the weights or max_rank"
            )
    else:
        if (w_lex + w_sem) * (rrf_k + max_rank) ** 5 >= 2**63:
            raise ValueError(
                "hybrid_rank_fusion: weight sum * (rrf_k+max_rank)^5"
                " overflows the separating fixed point's int64 envelope —"
                " lower the weights or max_rank, or pass"
                " decimal_scores=True"
            )
        if max_rank > 1000:
            raise ValueError(
                "hybrid_rank_fusion: max_rank > 1000 overflows the"
                " separating fixed point's int64 envelope (num * S <"
                " 2*(rrf_k+max_rank)^5) — pass decimal_scores=True for"
                " deep-shortlist fusion"
            )
    # the generalized L-list kernel computes the identical fixed point
    # for L = 2 (S = (rrf_k+max_rank)^4, same num/den construction), so
    # the registered contract gate exercises rank_fusion's code path
    return rank_fusion(
        [lex_hits, sem_hits],
        k=k,
        rrf_k=rrf_k,
        max_rank=max_rank,
        weights=(w_lex, w_sem),
        decimal_scores=decimal_scores,
    ).select(
        "query_id",
        "doc_id",
        F.col("rank_0").alias("lex_rank"),
        F.col("rank_1").alias("sem_rank"),
        "fused_fp",
        "rank",
    )
