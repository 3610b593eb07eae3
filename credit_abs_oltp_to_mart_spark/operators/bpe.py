"""BPE vocabulary induction on Spark — the tokenizer-training step of a
pretraining-data pipeline (Sennrich et al., "Neural Machine Translation of
Rare Words with Subword Units"), expressed as the standard distributed
shape: train on the WORD-FREQUENCY table, not the corpus.

The corpus is scanned ONCE to build (word, count) — at 100 TB the word
table is orders of magnitude smaller than the text (Heaps' law), and every
merge round thereafter runs on it alone: one pair-count aggregation
(partial-agg combines map-side), one 1-row argmax collect, one map-only
fold applying the merge. ``n_merges`` rounds = ``n_merges`` small jobs,
exactly like the Lloyd loop in ``kmeans.py``.

Determinism: pair counts are exact integers; the winning pair is argmax by
(count desc, left asc, right asc) — a total order, so any engine replays
the identical merge table. The merge APPLICATION is leftmost-greedy
non-overlapping (the reference semantics): expressed here as a single
``aggregate`` fold over the symbol array (the only overlap case is
left == right, where greedy-left = keeping even run offsets — the
property tests pin this against a literal python reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.functions.parallelism import local_rows

from credit_abs_oltp_to_mart_spark.functions.similarity import md5_long
from credit_abs_oltp_to_mart_spark.functions.text import ws_tokens


def word_frequency_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over the whitespace tokens — the one corpus scan."""
    return (
        docs.select(F.explode(ws_tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _char_symbols(word_col: str) -> F.Column:
    return F.expr(
        f"transform(sequence(1, length({word_col})),"
        f" i -> substr({word_col}, i, 1))"
    )


def _pair_structs(syms_col: str) -> F.Column:
    # sequence(a, b) DESCENDS when b < a in Spark — guard short symbols;
    # [] element access is 0-based in Spark SQL (1-based in DuckDB)
    return F.expr(
        f"case when size({syms_col}) < 2 then array()"
        f" else transform(sequence(0, size({syms_col}) - 2),"
        f" i -> struct({syms_col}[i] as l, {syms_col}[i + 1] as r)) end"
    )


def _apply_merge(syms_col, left: str, right: str) -> F.Column:
    """Leftmost-greedy non-overlapping merge of adjacent (left, right) as a
    fold: append each symbol, merging with the accumulator's tail when the
    (tail, current) pair matches — a tail that is itself a fresh merge
    never re-matches (merged symbols strictly grow). Literals enter via
    F.lit, never string-spliced into SQL."""
    la, lb = F.lit(left), F.lit(right)
    return F.aggregate(
        syms_col,
        F.expr("cast(array() as array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == la)
            & (x == lb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), x)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 8,
    *,
    text_col: str = "text",
) -> tuple[list[dict], DataFrame]:
    """Learn ``n_merges`` BPE merges; returns (merge table, final word
    frame).

    The merge table is a list of ``{"rank", "left", "right", "merged",
    "pair_count"}`` dicts in training order; the word frame is
    (word, cnt, syms) with ``syms`` = the word's segmentation under the
    full learned merge sequence (feed it to ``bpe_segment_stats`` or a
    join against the corpus tokens). Stops early if the vocabulary runs
    out of adjacent pairs (tiny corpora)."""
    wf = (
        word_frequency_table(docs, text_col)
        .withColumn("syms", _char_symbols("word"))
        # lazy like the per-round cuts: round 1's argmax materializes it
        .localCheckpoint(eager=False)
    )
    merges: list[dict] = []
    for rank in range(1, n_merges + 1):
        top = (
            wf.select("cnt", F.explode(_pair_structs("syms")).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append(
            {"rank": rank, "left": l, "right": r, "merged": l + r,
             "pair_count": c}
        )
        # checkpoint per round: the fold otherwise re-nests n_merges deep
        # and every round's argmax would re-run the whole chain. LAZY on
        # purpose — the next round's argmax (or the caller's first action)
        # materializes it inside its own job, so each round costs ONE job
        # instead of an argmax job plus a checkpoint job; the lineage cut
        # itself happens at plan-build time either way
        wf = wf.withColumn("syms", _apply_merge(F.col("syms"), l, r)) \
               .localCheckpoint(eager=False)
    return merges, wf


def merges_frame(spark: SparkSession, merges: list[dict]) -> DataFrame:
    """The learned merge table as a DataFrame (training order)."""
    return local_rows(spark, 
        [
            (m["rank"], m["left"], m["right"], m["merged"], m["pair_count"])
            for m in merges
        ],
        "rank int, left string, right string, merged string,"
        " pair_count bigint",
    )


def bpe_segment_stats(
    docs: DataFrame, word_frame: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """Per-doc subword statistics under a trained vocabulary: join the
    doc's token stream to the trained word frame and sum symbol counts —
    (doc_id, n_words, n_bpe_tokens). The join is on the word key (the
    word table is the small side at any corpus size that fits a
    vocabulary, so it broadcasts). The join is INNER: a word absent from
    the trained frame (a train/apply corpus mismatch) is excluded from
    BOTH n_words and n_bpe_tokens — the stats cover trained-vocabulary
    words only. ``bpe_tokenize`` is the strict variant: it left-joins and
    nulls out the whole doc's token sequence on any unseen word, so a
    mismatch surfaces instead of silently shrinking counts."""
    toks = docs.select(
        "doc_id", F.explode(ws_tokens(F.col(text_col))).alias("word")
    )
    wl = F.broadcast(
        word_frame.select("word", F.size("syms").alias("n_syms"))
    )
    per_doc = (
        toks.join(wl, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_syms").alias("n_bpe_tokens"),
        )
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_words", F.lit(0)).cast("int").alias("n_words"),
        F.coalesce("n_bpe_tokens", F.lit(0)).cast("int").alias("n_bpe_tokens"),
    )


def vocab_frame(word_frame: DataFrame) -> DataFrame:
    """(sym, tok_id) — the trained vocabulary with DENSE token ids
    assigned by lexicographic symbol order, so any engine derives the
    identical id table from the same merge sequence. The vocabulary is
    |alphabet| + n_merges symbols (tiny at any corpus size), so the
    single-partition ordering window is a non-issue — same trade as the
    k-means codebook collect."""
    syms = word_frame.select(F.explode("syms").alias("sym")).distinct()
    return syms.select(
        "sym",
        (F.row_number().over(Window.orderBy("sym")) - 1)
        .cast("int")
        .alias("tok_id"),
    )


def tokenizer_ids_table(word_frame: DataFrame) -> DataFrame:
    """(word, ids) — each trained word's contiguous token-id sequence
    (syms positions joined to ``vocab_frame`` ids): the broadcastable
    per-word lookup table ``bpe_tokenize`` maps the corpus through.
    Vocabulary-sized; pure function of the trained word frame, so
    multi-batch callers compute it once per vocabulary generation."""
    return (
        word_frame.select("word", F.posexplode("syms").alias("pos", "sym"))
        .join(F.broadcast(vocab_frame(word_frame)), "sym")
        .groupBy("word")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("tok_id")))
                ),
                lambda s: s["tok_id"],
            ).alias("ids")
        )
    )


def bpe_tokenize(
    docs: DataFrame,
    word_frame: DataFrame,
    *,
    text_col: str = "text",
    ids_table: DataFrame | None = None,
) -> DataFrame:
    """Per-doc CONTIGUOUS BPE token-id sequence under a trained
    vocabulary — the tokenizer OUTPUT a pretraining pipeline packs, not
    whitespace tokens.

    Shape: word → id-sequence is a per-word lookup table derived from the
    trained word frame (syms positions joined to ``vocab_frame`` ids) —
    vocabulary-sized, so it broadcasts; the corpus token stream maps
    through it with NO shuffle on the word key, then one per-doc
    aggregation stitches word id-arrays back in word order (flatten of a
    position-sorted collect).

    STRICT on train/apply mismatch: the token-stream join is LEFT, and a
    doc containing ANY word absent from the trained frame yields
    ``token_ids`` NULL (with ``n_unseen`` > 0) rather than a silently
    shortened sequence — the complement of ``bpe_segment_stats``'s
    seen-words-only counting. Docs with no tokens are excluded (no
    sequence to emit).

    ``ids_table``: a precomputed ``tokenizer_ids_table(word_frame)``
    frame (ideally checkpointed). Callers that tokenize MANY batches
    under one pinned vocabulary (streaming ingest) pass it so the
    vocab_frame window + per-word roll-up is built once per vocabulary
    generation instead of once per micro-batch — the same
    pin-heavy-state-once rule as the vocab cache itself (guide §4.5
    applied to plan subtrees)."""
    ids_per_word = (
        tokenizer_ids_table(word_frame) if ids_table is None else ids_table
    )
    toks = docs.select(
        "doc_id",
        F.posexplode(ws_tokens(F.col(text_col))).alias("wpos", "word"),
    )
    per_doc = (
        toks.join(F.broadcast(ids_per_word), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.count(F.when(F.col("ids").isNull(), 1)).alias("n_unseen"),
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("wpos"),
                                F.coalesce(
                                    F.col("ids"),
                                    F.expr("cast(array() as array<int>)"),
                                ).alias("ids"),
                            )
                        )
                    ),
                    lambda s: s["ids"],
                )
            ).alias("__ids"),
        )
    )
    return per_doc.select(
        "doc_id",
        F.col("n_words").cast("int").alias("n_words"),
        F.col("n_unseen").cast("int").alias("n_unseen"),
        F.when(F.col("n_unseen") == 0, F.col("__ids")).alias("token_ids"),
    )


def bpe_pack(
    docs: DataFrame,
    word_frame: DataFrame,
    *,
    chunk_tokens: int = 64,
    bin_tokens: int = 256,
    shards: int = 8,
    text_col: str = "text",
    ids_table: DataFrame | None = None,
) -> DataFrame:
    """Sequence-pack the TRAINED-TOKENIZER output — the last link of the
    raw-text → tokenizer → packed-shards chain: ``bpe_tokenize`` id
    sequences cut into fixed ``chunk_tokens`` windows, routed to shards
    by doc-id hash, laid end-to-end per shard in (doc_id, chunk_idx)
    order, and assigned to the fixed-width ``bin_tokens`` bin their start
    offset lands in — ``curation.pack_chunks``'s layout contract, but the
    chunk payload is the actual token-id run (space-joined in
    ``chunk_ids``), not whitespace text.

    One broadcast-mapped tokenize pass, one map-only chunk explode, one
    shard shuffle + per-shard offset window — identical shuffle budget to
    ``pack_chunks``. Docs with unseen words (null sequences) are
    excluded: packing silently-truncated sequences would corrupt
    training shards."""
    t = bpe_tokenize(
        docs, word_frame, text_col=text_col, ids_table=ids_table
    ).where(
        F.col("token_ids").isNotNull() & (F.size("token_ids") > 0)
    )
    n = F.size("token_ids")
    n_chunks = ((n + F.lit(chunk_tokens - 1)) / F.lit(chunk_tokens)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(F.col("token_ids"), i * chunk_tokens + 1, chunk_tokens),
    )
    ch = t.select(
        "doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk")
    )
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
        ch.select(
            shard.cast("int").alias("shard"),
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.size("chunk").cast("int").alias("n_tokens"),
            F.array_join(
                F.transform(F.col("chunk"), lambda x: x.cast("string")), " "
            ).alias("chunk_ids"),
        )
        .withColumn(
            "start_tok",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long"),
        )
        .withColumn("bin", F.expr(f"start_tok div {bin_tokens}"))
    )
