"""Corpus-curation operators for LLM training-data pipelines: deterministic
train/val/test splits, stratified sampling, token-window chunking,
cross-split n-gram decontamination, TF-IDF salient terms, and PII scanning.

These extend the reference's surface (it has no corpus tooling; cf. its
generator-only data path, ``airflows/generator/pg_oltp_synth.py``) with the
operations a 100 TB pretraining pipeline runs between "raw crawl" and
"training shards".

Scale design:
- ``split_assign`` / ``stratified_sample`` / ``chunk_documents`` / ``pii_scan``
  are map-only (zero shuffles): hash-bucket arithmetic and array ops run at
  scan speed inside whole-stage codegen, so they cost one pass over the data
  regardless of cluster size.
- ``decontaminate`` shuffles the big (train) side once by n-gram; the eval
  gram set is tiny by construction (held-out split), so it is broadcast to
  the train scan — no shuffle of the 100 TB side beyond the one semi-join.
- ``tfidf_topk`` is two hash aggregations (doc-term, then term) plus one
  per-doc top-k window; partial aggregation halves shuffle volume before the
  exchange.

All hashing is md5-based (engine-portable) so every operator is gated by a
bit-exact DuckDB oracle — see ``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.functions.parallelism import local_rows

from credit_abs_oltp_to_mart_spark.functions.similarity import md5_long
from credit_abs_oltp_to_mart_spark.functions.text import (
    ws_token_count,
    ws_tokens,
)

SPLIT_BUCKETS = 100
TRAIN_PCT = 80  # buckets [0, 80) -> train
VAL_PCT = 10  # buckets [80, 90) -> val; [90, 100) -> test

# per-language keep-rate (percent) for the stratified sample: downsample the
# dominant language, keep the long tail intact
SAMPLE_RATES = {"en": 40, "de": 70, "es": 70, "fr": 70}
SAMPLE_DEFAULT_PCT = 100

CHUNK_TOKENS = 64
DECONTAM_N = 5  # n-gram width for cross-split overlap


def split_bucket(key: Column, salt: str) -> Column:
    """Deterministic bucket in [0, SPLIT_BUCKETS): md5 of salt||key.

    Salted so independent decisions (split vs sample) decorrelate; md5-based
    so the DuckDB oracle reproduces it exactly (see md5_long)."""
    return F.pmod(
        md5_long(F.concat(F.lit(salt), key.cast("string"))), F.lit(SPLIT_BUCKETS)
    ).cast("int")


def split_expr() -> Column:
    """The split label as a pure column expression over doc_id — usable
    inline anywhere without joining back to an assignment table."""
    b = split_bucket(F.col("doc_id"), "split:")
    return (
        F.when(b < TRAIN_PCT, F.lit("train"))
        .when(b < TRAIN_PCT + VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def split_assign(docs: DataFrame) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by doc_id hash.

    Map-only: membership is a pure function of doc_id, so re-runs, backfills
    and late-arriving shards land in the same split without any global state.
    """
    b = split_bucket(F.col("doc_id"), "split:")
    return docs.select(
        "doc_id", "lang", b.alias("bucket"), split_expr().alias("split")
    )


def stratified_sample(
    docs: DataFrame, rates: dict[str, int] | None = None
) -> DataFrame:
    """Per-language deterministic downsampling (language-balancing pass).

    Keep a doc iff its sample-bucket < the language's keep-rate percent.
    Hash-threshold sampling (not .sample()) so the choice is reproducible
    across runs and engines, and composable with incremental refresh."""
    rates = SAMPLE_RATES if rates is None else rates
    rate = F.lit(SAMPLE_DEFAULT_PCT)
    for lang, pct in sorted(rates.items()):
        rate = F.when(F.col("lang") == lang, F.lit(pct)).otherwise(rate)
    b = split_bucket(F.col("doc_id"), "sample:")
    return (
        docs.select("doc_id", "lang", b.alias("bucket"), rate.alias("keep_pct"))
        .where(F.col("bucket") < F.col("keep_pct"))
        .select("doc_id", "lang", "bucket")
    )


def chunk_documents(docs: DataFrame, chunk_tokens: int = CHUNK_TOKENS) -> DataFrame:
    """Split each document into fixed-width token windows (training shards).

    Map-side only: tokens -> sequence of chunk starts -> slice+join, exploded.
    No shuffle; output order is (doc_id, chunk_idx) within each input row, so
    a downstream partitioned write needs no extra sort."""
    toks = ws_tokens(F.col("text"))
    n = F.size(toks)
    n_chunks = ((n + F.lit(chunk_tokens - 1)) / F.lit(chunk_tokens)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(toks, i * chunk_tokens + 1, chunk_tokens), " "
        ),
    )
    return (
        docs.where(n > 0)
        .select(
            "doc_id",
            n.alias("doc_tokens"),
            F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.least(
                F.lit(chunk_tokens),
                F.col("doc_tokens") - F.col("chunk_idx") * chunk_tokens,
            )
            .cast("int")
            .alias("n_tokens"),
            "chunk_text",
        )
    )


def decontaminate(docs: DataFrame, n: int = DECONTAM_N) -> DataFrame:
    """Eval-set contamination check: for each val/test doc, the share of its
    word n-grams that also occur anywhere in the train split.

    Plan: the gram index is built ONCE (codegen-friendly posexplode+lead
    shingling, see dedup.shingle_rows) and persisted — it feeds the train
    side, the eval side and the totals. The eval gram set (held-out 20%,
    distinct grams only) is broadcast against the train gram scan, so the
    train side is never shuffled on the gram key at scale — the
    contaminated-gram set comes back small and is broadcast again onto the
    per-doc eval counts. split is a pure doc_id expression, computed inline
    (a join back to an assignment table would shuffle the corpus twice)."""
    from credit_abs_oltp_to_mart_spark.operators.dedup import shingle_rows

    grams = (
        shingle_rows(docs, n)
        .withColumnRenamed("shingle", "gram")
        .withColumn("split", split_expr())
    )
    grams.persist()
    ev = grams.where(F.col("split") != "train")
    ev_gram_set = ev.select("gram").distinct()
    # grams that exist in train AND matter to some eval doc (small set)
    contaminated = (
        grams.where(F.col("split") == "train")
        .join(F.broadcast(ev_gram_set), "gram", "left_semi")
        .select("gram")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    # ONE pass over the eval grams: `contaminated` has one row per distinct
    # gram, so the broadcast left join never duplicates an eval row —
    # per-doc totals and contaminated counts come from the same aggregation
    # (previously a semi-join agg + a second totals agg re-read the cache)
    return (
        ev.join(F.broadcast(contaminated), "gram", "left")
        .groupBy("doc_id", "split")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("__hit").alias("n_contaminated"),
        )
        .select(
            "doc_id",
            "split",
            F.col("n_grams").cast("int").alias("n_grams"),
            F.col("n_contaminated").cast("int").alias("n_contaminated"),
            F.round(
                F.col("n_contaminated").cast("double")
                / F.col("n_grams").cast("double"),
                6,
            ).alias("contamination"),
        )
    )


def build_eval_gram_store(eval_docs: DataFrame, n: int = DECONTAM_N) -> DataFrame:
    """(gram) — the DISTINCT word-n-gram set of the held-out eval docs, the
    persistable contamination BLOCKLIST.

    The production decontamination shape is incremental, exactly like the
    MinHash signature store: the eval suites are fixed, so their gram set
    is built ONCE (one distinct shuffle), written as parquet, and every
    subsequent ingest batch is checked against it via
    ``decontaminate_against_store`` without ever re-reading or
    re-shingling the eval corpus."""
    from credit_abs_oltp_to_mart_spark.operators.dedup import shingle_rows

    return (
        shingle_rows(eval_docs, n)
        .withColumnRenamed("shingle", "gram")
        .select("gram")
        .distinct()
    )


def add_eval_suite(
    gram_store_path: str,
    eval_docs: DataFrame,
    *,
    suite_id: int,
    n: int = DECONTAM_N,
) -> None:
    """Append ONE eval suite to a blocklist gram store as a batch-keyed
    partition (``<path>/batch=<suite_id>``) — the incremental growth path
    for the decontamination state: a new benchmark arriving after ingest
    has started lands as its own atomic partition write, consumers pick
    it up on their next store listing (``stream_corpus_ingest`` re-pins
    its broadcast when the listing changes), and
    ``maintenance.compact_gram_store`` later folds the partitions with
    cross-suite gram dedup. Suites legitimately share grams across
    partitions; readers dedup at pin time, so an uncompacted store is
    still correct. The partition write is an overwrite: re-adding a
    suite id replaces it idempotently.

    The store must be batch-keyed FROM CREATION (built by this function,
    or by ``compact_gram_store`` which folds back into ``batch=0``): a
    FLAT store (root-level parquet files) must not be grown in place,
    because once a ``batch=<id>`` dir exists alongside root-level files
    Spark's partition discovery returns ONLY the partitioned rows — the
    original blocklist would silently vanish from every subsequent read
    and previously blocked eval grams would pass decontamination with no
    error. Detected and refused here rather than discovered as a silent
    recall hole."""
    from credit_abs_oltp_to_mart_spark.sources.maintenance import _hadoop_fs

    root = gram_store_path.rstrip("/")
    fs, hpath = _hadoop_fs(eval_docs.sparkSession, root)
    if fs.exists(hpath):
        flat = [
            s.getPath().getName()
            for s in fs.listStatus(hpath)
            if not s.isDirectory()
            and not s.getPath().getName().startswith(("_", "."))
        ]
        if flat:
            raise ValueError(
                f"gram store at {root} holds root-level data files "
                f"({flat[:3]}...): growing it with a batch=<id> partition "
                "would make Spark's partition discovery drop the flat rows "
                "and silently disable the original blocklist. Rebuild the "
                "store batch-keyed (write the initial suite through "
                "add_eval_suite, e.g. suite_id=0) before growing it."
            )
    build_eval_gram_store(eval_docs, n).write.mode("overwrite").parquet(
        f"{root}/batch={suite_id}"
    )


def decontaminate_against_store(
    docs: DataFrame,
    gram_store: DataFrame,
    *,
    n: int = DECONTAM_N,
    max_overlap: float = 0.5,
    broadcast_store: bool = True,
) -> DataFrame:
    """Per-doc contamination of an INGEST batch against a persisted
    eval-gram store (built by ``build_eval_gram_store``): the share of the
    doc's n-grams present in the store, plus the ``dropped`` verdict at
    ``max_overlap``. Callers keep ``where(~dropped)``.

    ``broadcast_store=True`` (default): eval suites are fixed and small,
    so the store ships to every executor and the batch is NEVER shuffled —
    one map-side pass over the batch grams plus the per-doc aggregation.
    ``=False`` is the oversized-store fallback (merge-hinted sort-merge
    join on the gram key), same trade as
    ``corpus.decontaminate_train(broadcast_eval=False)``.

    The store must hold DISTINCT grams (the builder guarantees it): the
    left join then never duplicates a batch gram row, so totals and hit
    counts come from one aggregation."""
    from credit_abs_oltp_to_mart_spark.operators.dedup import shingle_rows

    store = gram_store.select("gram").withColumn("__hit", F.lit(1))
    if broadcast_store:
        store = F.broadcast(store)
    else:
        store = store.hint("merge")
    grams = shingle_rows(docs, n).withColumnRenamed("shingle", "gram")
    return (
        grams.join(store, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("__hit").alias("n_hit"),
        )
        .select(
            "doc_id",
            F.col("n_grams").cast("int").alias("n_grams"),
            F.col("n_hit").cast("int").alias("n_hit"),
            F.round(
                F.col("n_hit").cast("double") / F.col("n_grams").cast("double"),
                6,
            ).alias("overlap"),
            (
                F.col("n_hit").cast("double") / F.col("n_grams").cast("double")
                >= max_overlap
            ).alias("dropped"),
        )
    )


def semantic_contamination_pairs(
    train_emb: DataFrame,
    eval_emb: DataFrame,
    assignments: DataFrame,
    *,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    target_block_rows: int = 4096,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Embedding-space (paraphrase-level) contamination candidates: every
    (train vector, eval vector) pair that shares a k-means cluster with
    cosine >= ``threshold`` — the cross-set twin of ``dedup.semantic_dedup``
    (SemDeDup, Abbas et al. 2023), closing the gap n-gram decontamination
    provably has: ``decontaminate``/``decontaminate_against_store`` catch
    verbatim eval leakage, but a paraphrased eval passage shares few word
    5-grams while sitting near the original in embedding space.

    Candidate generation is the SemDeDup cluster restriction: an EQUI-JOIN
    on the cluster id between the two sets' block frames, never all-pairs
    (the clustering is the recall/cost dial, exactly as in semantic
    dedup; pass a soft/hier assignment frame for boundary recall).
    ``assignments`` is ONE (vec_id, cluster) frame covering BOTH id
    spaces — both sets must be assigned against the SAME codebook or the
    cluster restriction is meaningless. Within a cluster, both sides
    split into bounded collect_list blocks
    (``ceil(size / target_block_rows)``) and the cross blocked-GEMM
    kernel scores them — ``dedup._blocked_cross_cosine_kernel``, emitting
    (train_id, eval_id, cosine) with the oracle-exact 6 dp rounding.

    ``broadcast_eval=True`` (default): eval suites are small and fixed,
    so the eval block frame ships to every executor and the train side is
    joined without a shuffle on the cluster key. ``=False`` is the
    oversized-eval fallback (plain hash join)."""
    from credit_abs_oltp_to_mart_spark.operators.dedup import (
        _blocked_cross_cosine_kernel,
    )

    def _blocks(emb: DataFrame, rows_alias: str) -> DataFrame:
        tagged = assignments.join(
            emb.select(F.col("vec_id"), F.col(vec_col).alias("v")), "vec_id"
        )
        sizes = tagged.groupBy("cluster").agg(F.count(F.lit(1)).alias("__csz"))
        return (
            tagged.join(F.broadcast(sizes), "cluster")
            .select(
                "cluster",
                "vec_id",
                "v",
                F.pmod(
                    F.col("vec_id"),
                    F.ceil(F.col("__csz") / F.lit(target_block_rows)),
                ).cast("int").alias("blk"),
            )
            .groupBy("cluster", "blk")
            .agg(F.collect_list(F.struct("vec_id", "v")).alias(rows_alias))
            .drop("blk")
        )

    a = _blocks(train_emb, "rows_a")
    b = _blocks(eval_emb, "rows_b")
    if broadcast_eval:
        b = F.broadcast(b)
    return a.join(b, "cluster").mapInPandas(
        _blocked_cross_cosine_kernel(threshold),
        "id_a long, id_b long, cosine double",
    ).select(
        F.col("id_a").alias("train_id"),
        F.col("id_b").alias("eval_id"),
        "cosine",
    )


def semantic_decontaminate(
    train_emb: DataFrame,
    eval_emb: DataFrame,
    assignments: DataFrame,
    *,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    target_block_rows: int = 4096,
    broadcast_eval: bool = True,
    broadcast_hits: bool = True,
) -> DataFrame:
    """Per-TRAIN-vector semantic decontamination verdicts against an eval
    set: (vec_id, cluster, n_eval_hits, max_eval_cosine, dropped) — the
    production drop authority for paraphrase-level eval leakage. A train
    doc is ``dropped`` iff SOME eval vector shares one of its clusters
    within the cosine threshold (``semantic_contamination_pairs`` is the
    candidate kernel). ``max_eval_cosine`` is 0.0 when nothing hit
    (hits all sit at >= threshold > 0, so 0.0 is unambiguous). Callers
    keep ``where(~dropped)`` — same consumption shape as
    ``decontaminate_against_store``, so an ingest can run both gates and
    union the drop sets.

    ``broadcast_hits=True`` (default) ships the per-train-doc hit
    aggregate to every executor — right when contamination is the rare
    case it should be. On an ADVERSARIALLY contaminated corpus ``hits``
    is sized by the number of contaminated train docs (unbounded), so
    ``broadcast_hits=False`` falls back to a plain shuffled join — the
    same dual-mode escape every sibling gate has (eval-gram store,
    incremental dedup). Output is identical either way (plan-gated in
    test_semantic_decontam)."""
    pairs = semantic_contamination_pairs(
        train_emb,
        eval_emb,
        assignments,
        threshold=threshold,
        vec_col=vec_col,
        target_block_rows=target_block_rows,
        broadcast_eval=broadcast_eval,
    )
    hits = pairs.groupBy(F.col("train_id").alias("vec_id")).agg(
        F.count(F.lit(1)).cast("int").alias("n_eval_hits"),
        F.max("cosine").alias("max_eval_cosine"),
    )
    if broadcast_hits:
        hits = F.broadcast(hits)
    return (
        assignments.join(
            train_emb.select("vec_id"), "vec_id", "left_semi"
        )
        .join(hits, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.coalesce(F.col("n_eval_hits"), F.lit(0)).cast("int").alias(
                "n_eval_hits"
            ),
            F.coalesce(F.col("max_eval_cosine"), F.lit(0.0)).alias(
                "max_eval_cosine"
            ),
            (F.col("n_eval_hits").isNotNull()).alias("dropped"),
        )
    )


def sample_to_token_budget(
    docs: DataFrame,
    budget_tokens: int,
    *,
    by: str = "lang",
    text_col: str = "text",
    salt: str = "budget",
) -> DataFrame:
    """Token-budget sampling: per ``by``-group, keep a deterministic
    md5-ordered prefix of docs until the group's running token total
    reaches ``budget_tokens`` — "give me ~1B tokens per language", the
    mixture-building primitive for training-data recipes. The first doc
    crossing the line is KEPT (its preceding total was under budget), so
    each group lands within one document of the target; callers needing a
    hard token cap chop chunks downstream.

    Deterministic in any engine (md5 order + doc_id tiebreak, independent
    of partitioning). One window shuffle on the group key; token counts
    are a map-side expression. Returns (doc_id, group, n_tokens,
    cum_tokens) for the kept prefix."""
    rnd = md5_long(F.concat(F.lit(f"{salt}:"), F.col("doc_id").cast("string")))
    n_tok = ws_token_count(F.col(text_col))
    w = Window.partitionBy("grp").orderBy(rnd.asc(), F.col("doc_id").asc())
    staged = docs.select(
        "doc_id", F.col(by).alias("grp"), n_tok.alias("n_tokens")
    ).withColumn(
        "cum_tokens",
        F.sum("n_tokens").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return staged.where(
        F.col("cum_tokens") - F.col("n_tokens") < budget_tokens
    ).select(
        "doc_id",
        F.col("grp").alias(by),
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
    )


def cluster_balanced_sample(
    assign: DataFrame,
    n_per_cluster: int,
    *,
    id_col: str = "vec_id",
    cluster_col: str = "cluster",
    salt: str = "cbs",
) -> DataFrame:
    """Diversity sampling: keep up to ``n_per_cluster`` rows PER CLUSTER of
    any (id, cluster) assignment — e.g. ``kmeans.kmeans_assign`` over the
    embedding table. Uniform sampling over-represents the dominant
    semantic modes; sampling a fixed budget per k-means cell flattens the
    distribution (cluster-balanced mixing, the standard semantic-diversity
    curation move).

    Deterministic pseudo-randomness: rows rank by md5(salt || id) with an
    id tiebreak — reproducible in any engine, independent of partitioning.
    One window shuffle on the cluster key; the assignment itself carries
    whatever cost its producer had (k-means assignment is map-only)."""
    rnd = md5_long(
        F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(cluster_col).orderBy(rnd.asc(), F.col(id_col).asc())
    return (
        assign.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= n_per_cluster)
        .select(id_col, cluster_col, F.col("rank").cast("int").alias("rank"))
    )


def tfidf_topk(docs: DataFrame, k: int = 5) -> DataFrame:
    """Top-k salient terms per document by tf * N / df.

    The idf is the rational form N/df (no transcendental functions) so the
    score is a deterministic IEEE double in any engine. Ranking uses the
    unrounded score with term as tiebreak; the emitted score is rounded to
    6 dp for the oracle compare."""
    toks = docs.select("doc_id", F.explode(ws_tokens(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    score = (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df").cast(
        "double"
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_raw"), F.asc("term"))
    return (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score_raw", score)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("int").alias("tf"),
            F.round(F.col("score_raw"), 6).alias("tfidf"),
            "rank",
        )
    )


PACK_BIN_TOKENS = 256
PACK_SHARDS = 8


def pack_chunks(
    docs: DataFrame,
    chunk_tokens: int = CHUNK_TOKENS,
    bin_tokens: int = PACK_BIN_TOKENS,
    shards: int = PACK_SHARDS,
) -> DataFrame:
    """Sequence packing (concat-then-cut): route chunks to shards by doc
    hash, lay them end-to-end per shard in (doc_id, chunk_idx) order, and
    assign each chunk to the fixed-width token bin its start offset lands
    in — the layout LLM trainers consume.

    One shuffle (the shard key) and one window pass per shard. Shard count
    is the parallelism knob: 8 here, thousands on a cluster — packing
    stays deterministic because shard routing is an md5 hash of doc_id,
    not a physical partition id."""
    ch = chunk_documents(docs, chunk_tokens)
    shard = F.pmod(
        md5_long(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))),
        F.lit(shards),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id", "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ch.withColumn("shard", shard.cast("int"))
        .select(
            "shard",
            "doc_id",
            "chunk_idx",
            "n_tokens",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
            .cast("long")
            .alias("start_tok"),
        )
        .withColumn("bin", F.expr(f"start_tok div {bin_tokens}"))
    )


# fixed-point scale for mixture-weight sqrt terms: floored to bigint
# before summing so the total is aggregation-order exact in any engine
WEIGHT_FP_SCALE = 10**6

# explicit ASCII classes: Java regex (Spark) and RE2 (DuckDB) agree on these
EMAIL_PATTERN = "[A-Za-z0-9._]+@[A-Za-z0-9.]+"
URL_PATTERN = "https?://[A-Za-z0-9./_-]+"
DIGIT_RUN_PATTERN = "[0-9]{6,}"


def _pattern_count(text: Column, pattern: str) -> Column:
    """Occurrence count of one PII pattern — the shared kernel under both
    ``pii_signal_count`` and ``pii_scan``."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))


def pii_signal_count(text: Column) -> Column:
    """Total PII signal count (emails + URLs + long digit runs) as a pure
    column expression, used by the corpus pipeline's fused filter gate.
    ``pii_scan`` derives its per-pattern counts from the same
    ``_pattern_count`` kernel and PATTERN constants, so the two cannot
    drift."""
    return sum(
        _pattern_count(text, p)
        for p in (EMAIL_PATTERN, URL_PATTERN, DIGIT_RUN_PATTERN)
    )


def pii_scan(docs: DataFrame) -> DataFrame:
    """Per-doc PII signal counts (emails, URLs, long digit runs) plus the
    length of the text after redacting them — map-only, codegen-friendly."""
    t = F.col("text")
    n_emails = _pattern_count(t, EMAIL_PATTERN)
    n_urls = _pattern_count(t, URL_PATTERN)
    n_digit_runs = _pattern_count(t, DIGIT_RUN_PATTERN)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_PATTERN, "<EMAIL>"), URL_PATTERN, "<URL>"
        ),
        DIGIT_RUN_PATTERN,
        "<NUM>",
    )
    return docs.select(
        "doc_id",
        n_emails.cast("int").alias("n_emails"),
        n_urls.cast("int").alias("n_urls"),
        n_digit_runs.cast("int").alias("n_digit_runs"),
        ((n_emails + n_urls + n_digit_runs) > 0).alias("has_pii"),
        F.length(redacted).cast("int").alias("redacted_len"),
    )


def redact_pii(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """The redaction REWRITE half of ``pii_scan``: each doc's text with
    emails/URLs/long digit runs replaced by typed placeholders, plus the
    redaction count — the privacy-scrubbing pass a training corpus runs
    before packing. Map-only regexp_replace chain inside codegen; docs
    with no PII keep their text byte-identical.

    ``n_redactions`` is the PRE-rewrite PII signal count (all three
    patterns counted on the ORIGINAL text, matching ``pii_scan``): the
    replacements then run sequentially, so a nested match — a digit run
    inside an already-replaced URL — is counted once as a signal but
    never inserts its own placeholder. The count is the detection-side
    number, not the number of placeholders in the output."""
    t = F.col(text_col)
    n = (
        _pattern_count(t, EMAIL_PATTERN)
        + _pattern_count(t, URL_PATTERN)
        + _pattern_count(t, DIGIT_RUN_PATTERN)
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_PATTERN, "<EMAIL>"), URL_PATTERN, "<URL>"
        ),
        DIGIT_RUN_PATTERN,
        "<NUM>",
    )
    return docs.select(
        "doc_id",
        redacted.alias("text"),
        n.cast("int").alias("n_redactions"),
    )


def mixture_weights(
    docs: DataFrame,
    *,
    by: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-based data-mixture weights per domain (the standard
    pretraining recipe step: sampling probability ∝ token_count^alpha
    with alpha = 0.5, so small domains are upsampled relative to their
    natural share — cf. multilingual/LLaMA-style mixtures).

    Per ``by``-group: doc and token counts, the natural share, the
    alpha-tempered target share, and ``sample_factor`` = target/natural —
    the per-domain repetition multiplier a sampler applies. alpha is
    FIXED at 0.5 because sqrt is correctly rounded in every IEEE engine
    (an arbitrary pow(x, a) is not). Each group's sqrt weight is floored
    to fixed point (bigint) BEFORE the total-weight sum — a sum of
    doubles is order-nondeterministic under parallel aggregation, a sum
    of bigints is exact in any engine (same discipline as
    ``bigram_fluency``) — and every output share is a ratio of
    deterministic values. Zero-token groups (all-empty docs) get
    target_share 0 and sample_factor 0, never NaN: the natural-share
    denominator is guarded with greatest(1, n_tokens). One aggregation +
    a 1-row broadcast of the totals; map-only per group after that."""
    w_fp = F.floor(F.sqrt(F.col("n_tokens").cast("double")) * WEIGHT_FP_SCALE)
    g = docs.groupBy(F.col(by).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ws_token_count(F.col(text_col))).alias("n_tokens"),
    ).withColumn("w_fp", w_fp)
    tot = g.agg(
        F.sum("n_tokens").alias("tot_tokens"),
        F.sum("w_fp").alias("tot_w_fp"),
    )
    natural = F.col("n_tokens").cast("double") / F.col("tot_tokens").cast("double")
    target = F.col("w_fp").cast("double") / F.col("tot_w_fp").cast("double")
    # factor = target / natural, rearranged so products are computed in
    # double (no bigint overflow at 100 TB token counts) and the
    # denominator is never 0 for a zero-token group (w_fp is 0 there, so
    # the factor is exactly 0, not NaN)
    factor = (
        F.col("w_fp").cast("double") * F.col("tot_tokens").cast("double")
    ) / (
        F.col("tot_w_fp").cast("double")
        * F.greatest(F.lit(1), F.col("n_tokens")).cast("double")
    )
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            F.col("grp").alias(by),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(natural, 6).alias("natural_share"),
            F.round(target, 6).alias("target_share"),
            F.round(factor, 6).alias("sample_factor"),
        )
    )


def pack_manifest(packed: DataFrame) -> DataFrame:
    """Per-(shard, bin) composition manifest of a packed shard table —
    what a trainer's data loader reads to schedule work without touching
    payloads: chunk and distinct-doc counts, the filled token total (a
    bin can exceed its nominal width: a chunk belongs to the bin its
    START offset lands in), and the doc-id range (packing is
    (doc_id, chunk_idx)-ordered per shard, so [min, max] brackets the
    bin's provenance). Works over whitespace (``pack_chunks``) and
    tokenizer (``bpe.bpe_pack``) shards alike — one integer-exact
    aggregation, partial-agg friendly, nothing but the one groupBy
    shuffle."""
    return packed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).cast("int").alias("n_chunks"),
        F.countDistinct("doc_id").cast("int").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("filled_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def mixture_apply(
    docs: DataFrame,
    weights: DataFrame,
    *,
    by: str = "lang",
) -> DataFrame:
    """MATERIALIZE the temperature mixture ``mixture_weights`` prescribed:
    deterministic per-doc replication under each domain's published
    ``sample_factor`` — the step that turns weights into the epoch-mixed
    corpus a trainer actually consumes (a factor > 1 repeats the domain's
    docs, < 1 thins them; weights alone change nothing).

    Every doc gets floor(factor) guaranteed copies plus one more iff its
    md5 draw falls under the factor's fractional part, all in integer
    MICRO-UNITS (the factor is published at 6 dp, so factor*1e6 is exact
    after one half-up rounding; the draw is md5 mod 1e6) — no float
    comparison anywhere, any engine replays the exact copy set, and the
    expected copy count equals the factor. Returns one row per
    (doc, copy_no >= 1); dropped docs (factor 0 and a losing draw) emit
    no row.

    Scale: the weights frame is domain-cardinality (tiny) and broadcasts;
    the replication is a map-only explode — no shuffle, output size =
    sum of factors * docs, exactly the corpus the mixture demands."""
    f_u = F.floor(F.col("sample_factor") * WEIGHT_FP_SCALE + F.lit(0.5)).cast(
        "bigint"
    )
    draw = F.pmod(
        md5_long(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))),
        F.lit(WEIGHT_FP_SCALE),
    )
    n_copies = (
        (f_u / WEIGHT_FP_SCALE).cast("bigint")
        + F.when(draw < f_u % WEIGHT_FP_SCALE, F.lit(1)).otherwise(F.lit(0))
    ).alias("n_copies")
    w = weights.select(by, "sample_factor")
    return (
        docs.join(F.broadcast(w), by)
        .select("doc_id", by, n_copies)
        .where(F.col("n_copies") > 0)
        .select(
            "doc_id",
            by,
            F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("copy_no"),
        )
        .select("doc_id", by, F.col("copy_no").cast("int").alias("copy_no"))
    )


def weighted_sample(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    weight: Column | str = "weight",
    k: int = 100,
) -> DataFrame:
    """Weighted sampling without replacement via integer-replica hash race.

    Each row enters the race with ``weight`` (small positive int) lottery
    tickets — one md5 draw per (id, replica) — and its priority is its best
    (minimum) draw; the k best priorities win. A row with twice the tickets
    has (asymptotically) twice the win odds, which is the discrete version
    of the exponential-race A-ES sampler, but with NO libm (exp/ln/pow) on
    the comparison path: priorities are integer hashes, so any engine
    reproduces the exact same sample — floating-point samplers diverge in
    the last ulp and flip selections near the k-th boundary.

    Scale shape: replication is a map-side explode bounded by max weight
    (clamp weights to a small range — tickets, not magnitudes); the race
    is one partial-aggregated min per id; the final top-k is
    TakeOrdered (per-partition heads + driver merge of k rows, never a
    global sort).
    """
    w = (F.col(weight) if isinstance(weight, str) else weight).cast("int")
    rep = (
        docs.select(F.col(id_col), w.alias("__w"))
        .where(F.col("__w") >= 1)
        .select(
            id_col,
            F.explode(F.sequence(F.lit(1), F.col("__w"))).alias("__i"),
        )
    )
    draw = md5_long(
        F.concat_ws(":", F.col(id_col).cast("string"), F.col("__i").cast("string"))
    )
    race = rep.groupBy(id_col).agg(F.min(draw).alias("priority"))
    return race.orderBy("priority").limit(k)


def epoch_shuffle(
    manifest: DataFrame,
    *,
    seed: int,
    n_buckets: int = 1024,
) -> DataFrame:
    """Deterministic seeded EPOCH ordering over packed (shard, bin) read
    units: the global shuffle a trainer's data loader applies per epoch,
    published as a manifest so every rank reads the same order without
    coordination. read_order is the 1-based rank of
    md5('epoch:<seed>:<shard>:<bin>') — a new seed is a new permutation,
    the same seed replays bit-exactly in any engine.

    Scale shape: a naive global row_number would sort the whole manifest
    in ONE task. Instead the md5 key (< 2^60, uniform) is range-bucketed
    into ``n_buckets`` aligned slices (bucket = key div (2^60/n_buckets),
    so bucket order IS key order); per-bucket counts — n_buckets rows —
    come to the driver for an exact prefix sum, and the global rank is
    offset[bucket] + row_number within the bucket. One count aggregation,
    one broadcast of the offsets, one bucket-partitioned window: the sort
    parallelism is n_buckets regardless of manifest size. ``n_buckets``
    must be a power of two (keeps the slice arithmetic exact).

    Input is ``pack_manifest`` output (or anything with shard, bin,
    filled_tokens); returns (read_order, shard, bin, filled_tokens)."""
    if n_buckets & (n_buckets - 1):
        raise ValueError(f"n_buckets={n_buckets} must be a power of two")
    step = (1 << 60) // n_buckets
    key = md5_long(
        F.concat(
            F.lit(f"epoch:{seed}:"),
            F.col("shard").cast("string"),
            F.lit(":"),
            F.col("bin").cast("string"),
        )
    )
    keyed = manifest.select(
        "shard",
        "bin",
        "filled_tokens",
        key.alias("__k"),
    ).withColumn(
        # exact integer quotient — md5_long keys reach 2^60 > 2^53, so a
        # float division could land boundary keys in the wrong slice
        "__bkt",
        F.expr(f"__k div {step}L"),
    )
    counts = sorted(
        (r["__bkt"], r["n"])
        for r in keyed.groupBy("__bkt").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    )
    offsets, running = [], 0
    for bkt, n in counts:
        offsets.append((bkt, running))
        running += n
    off = F.broadcast(
        local_rows(
            manifest.sparkSession, offsets or [(0, 0)],
            "__bkt long, __off long",
        )
    )
    w = Window.partitionBy("__bkt").orderBy(
        F.col("__k").asc(), F.col("shard").asc(), F.col("bin").asc()
    )
    return (
        keyed.join(off, "__bkt")
        .select(
            (F.col("__off") + F.row_number().over(w))
            .cast("long")
            .alias("read_order"),
            "shard",
            "bin",
            "filled_tokens",
        )
    )
