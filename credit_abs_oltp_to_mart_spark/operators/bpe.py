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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
        .localCheckpoint(eager=True)
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
        # and every round's argmax would re-run the whole chain
        wf = wf.withColumn("syms", _apply_merge(F.col("syms"), l, r)) \
               .localCheckpoint(eager=True)
    return merges, wf


def merges_frame(spark: SparkSession, merges: list[dict]) -> DataFrame:
    """The learned merge table as a DataFrame (training order)."""
    return spark.createDataFrame(
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
    vocabulary, so it broadcasts); unseen-word docs would indicate a
    train/apply corpus mismatch and surface as null sums."""
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
