"""Document text-analysis operators: language ID, quality scoring, token
counting, fingerprinting, repetition stats. Mostly map-only column
expressions — at 100 TB these run at scan speed inside whole-stage codegen;
repetition_stats shuffles by doc_id only."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.functions.text import (
    STOPWORDS,
    quality_score,
    regex_token_count,
    stopword_ratio,
    token_rolling_hash,
    ws_token_count,
    ws_tokens,
)


def lang_pred_expr(text):
    """Best-stopword-ratio language label as a pure column expression
    (ties -> lexicographically first; all-zero -> 'und'). The single
    source of the tie-break construction — reused by ``language_id`` and
    the corpus pipeline's fused filter gate."""
    scores = [
        (lang, stopword_ratio(text, words))
        for lang, words in sorted(STOPWORDS.items())
    ]
    best = None
    for _, score in scores:
        best = score if best is None else F.greatest(best, score)
    pred = F.lit("und")
    for lang, score in reversed(scores):  # earlier langs overwrite -> ties pick first
        pred = F.when((score == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return pred


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-ratio language heuristic over the STOPWORDS sets.

    Picks the language with the highest ratio (ties -> lexicographically
    first; all-zero -> 'und'). A real pipeline swaps in fastText/CLD3 via a
    pandas UDF; the heuristic keeps this engine dependency-free and
    oracle-checkable."""
    t = F.col(text_col)
    scores = [(lang, stopword_ratio(t, words)) for lang, words in sorted(STOPWORDS.items())]
    out = docs.select(
        "doc_id",
        *[s.alias(f"ratio_{lang}") for lang, s in scores],
        lang_pred_expr(t).alias("lang_pred"),
    )
    return out


def text_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select(
        "doc_id",
        F.length(F.col(text_col)).alias("n_chars"),
        quality_score(F.col(text_col)).alias("quality"),
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select(
        "doc_id",
        ws_token_count(F.col(text_col)).alias("n_ws_tokens"),
        regex_token_count(F.col(text_col)).alias("n_regex_tokens"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select(
        "doc_id", token_rolling_hash(F.col(text_col)).alias("fingerprint")
    )


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition-based quality signals (Gopher-style filters):

    - ``distinct_token_ratio`` — |distinct tokens| / |tokens|; low values
      flag boilerplate/spam.
    - ``top_bigram_share`` — frequency share of the most common bigram; high
      values flag template repetition.

    Exploded-token formulation (posexplode + lead window, one doc_id
    shuffle) — same plan shape as dedup.shingle_rows, codegen-friendly.
    Empty docs keep n_tokens=0 with null ratios."""
    toks = ws_tokens(F.col(text_col))
    posed = docs.where(F.size(toks) > 0).select(
        "doc_id", F.posexplode(toks).alias("pos", "tok")
    )
    tok_stats = posed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("n_distinct"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    nxt = F.lead("tok", 1).over(w)
    grams = (
        posed.select("doc_id", "tok", nxt.alias("nxt"))
        .where(F.col("nxt").isNotNull())
        .select("doc_id", F.concat_ws(" ", "tok", "nxt").alias("gram"))
    )
    gram_stats = (
        grams.groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_c"), F.sum("c").alias("total_grams"))
    )
    return (
        docs.select("doc_id")
        .join(tok_stats, "doc_id", "left")
        .join(gram_stats, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.round(
                F.col("n_distinct").cast("double") / F.col("n_tokens").cast("double"),
                6,
            ).alias("distinct_token_ratio"),
            F.round(
                F.col("max_c").cast("double") / F.col("total_grams").cast("double"), 6
            ).alias("top_bigram_share"),
        )
    )


def duplicate_spans(
    docs: DataFrame,
    k: int = 8,
    *,
    min_count: int = 2,
    keep_first: bool = False,
    text_col: str = "text",
) -> DataFrame:
    """Exact duplicated-substring spans at token level — the corpus-wide
    repeated-passage detector behind substring-level dedup (cf. Lee et
    al., "Deduplicating Training Data Makes Language Models Better":
    boilerplate, licenses, and templated passages repeat VERBATIM across
    documents that are not near-duplicates as wholes, so doc-level MinHash
    never drops them; span-level detection finds the repeated text itself).

    Definition: token position p of a doc is DUPLICATED iff the k-token
    gram starting at p occurs >= ``min_count`` times across the whole
    corpus (any doc, its own included). Overlapping or ADJACENT duplicated
    positions (next start <= prev start + k) merge into maximal spans.
    Returns (doc_id, span_start, span_end, n_tokens) with 0-based
    INCLUSIVE token indices — the downstream cut list for a span-removal
    rewrite.

    ``keep_first=True`` is the policy a production pipeline actually
    wants: per duplicated gram, the EARLIEST occurrence (min (doc_id,
    pos) over the corpus — a total order) is NOT marked, so one copy of
    every boilerplate passage survives ``remove_spans`` byte-identical
    and only later copies are cut. With the flag off, EVERY occurrence
    is marked (the pure detector — the caller sees all duplicated text).

    Scale shape: positional k-grams come straight off the token array
    (``transform`` + ``slice`` + ``array_join`` inside codegen — map-only,
    no window over the token stream); grams shuffle as 16-byte md5 keys
    for the occurrence count (partial-agg combines repeats map-side); the
    duplicated-position filter is a semi-join on that key (keep_first
    carries the gram's argmin occurrence on the same aggregation — one
    extra 12-byte struct per distinct duplicated gram, same shuffle); the
    only other shuffle is the per-doc window for interval merging.
    Nothing is ever O(corpus^2): cost ~ total token count, like
    shingling."""
    toks = ws_tokens(F.col(text_col))
    base = docs.select("doc_id", toks.alias("__tk")).where(
        F.size("__tk") >= k
    )
    grams = F.expr(
        f"transform(sequence(0, size(__tk) - {k}),"
        f" i -> array_join(slice(__tk, i + 1, {k}), ' '))"
    )
    pg = base.select("doc_id", F.posexplode(grams).alias("pos", "gram")).select(
        "doc_id", "pos", F.md5("gram").alias("g")
    )
    if keep_first:
        # the argmin occurrence rides the SAME count aggregation (min over
        # a (doc_id, pos) struct is the lexicographic total order); the
        # inner join then excludes exactly that one occurrence per gram
        occ = (
            pg.groupBy("g")
            .agg(
                F.count(F.lit(1)).alias("c"),
                F.min(F.struct("doc_id", "pos")).alias("first"),
            )
            .where(F.col("c") >= min_count)
            .select("g", "first")
        )
        marked = (
            pg.join(occ, "g")
            .where(
                (F.col("doc_id") != F.col("first.doc_id"))
                | (F.col("pos") != F.col("first.pos"))
            )
            .select("doc_id", "pos")
        )
    else:
        dup = (
            pg.groupBy("g")
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") >= min_count)
            .select("g")
        )
        marked = pg.join(dup, "g", "left_semi").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev = F.lag("pos").over(w)
    new_span = F.when(prev.isNull() | (F.col("pos") - prev > k), 1).otherwise(0)
    spans = marked.withColumn(
        "__isl",
        F.sum(new_span).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        spans.groupBy("doc_id", "__isl")
        .agg(F.min("pos").alias("s"), F.max("pos").alias("e"))
        .select(
            "doc_id",
            F.col("s").cast("int").alias("span_start"),
            (F.col("e") + k - 1).cast("int").alias("span_end"),
            (F.col("e") + k - F.col("s")).cast("int").alias("n_tokens"),
        )
    )


def remove_spans(
    docs: DataFrame, spans: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """Rewrite each doc with the given token spans CUT — the removal half
    of substring-level dedup (feed it ``duplicate_spans`` output: the
    pure detector cuts every copy, ``keep_first=True`` preserves the
    earliest occurrence of each duplicated passage).

    Returns (doc_id, text, n_removed). Docs with no spans keep their text
    byte-for-byte; docs with spans are rebuilt from the surviving tokens
    (single-space joined — a token-level rewrite is whitespace-normalized
    by construction). Spans are assumed NON-OVERLAPPING per doc
    (``duplicate_spans`` emits maximal merged intervals, and any filter
    over its output stays non-overlapping); overlapping spans would cut
    correctly but double-count ``n_removed``.

    Scale shape: the span list groups to one array per doc (it is tiny —
    bounded by duplicated regions, not corpus size), joins onto the docs,
    and the cut itself is a single indexed ``filter`` higher-order
    function over the token array — map-only, no explode, no window."""
    sp = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__sp")
    )
    toks = ws_tokens(F.col(text_col))
    kept = F.expr(
        "array_join(filter(__tk, (t, i) -> not exists(__sp,"
        " s -> i >= s.span_start and i <= s.span_end)), ' ')"
    )
    n_removed = F.expr(
        "aggregate(__sp, 0, (acc, s) -> acc + s.span_end - s.span_start + 1)"
    )
    return (
        docs.select("doc_id", F.col(text_col), toks.alias("__tk"))
        .join(sp, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("__sp").isNull(), F.col(text_col))
            .otherwise(kept)
            .alias("text"),
            F.coalesce(n_removed, F.lit(0)).cast("int").alias("n_removed"),
        )
    )


def bigram_fluency(docs: DataFrame, *, rare_max: int = 2,
                   fp_scale: int = 10**6,
                   text_col: str = "text") -> DataFrame:
    """Conditional-bigram fluency per doc — the bigram-LM companion to
    ``token_frequency_stats`` (unigram): fluent text chains tokens the
    corpus has seen CHAINED before, so the mean conditional MLE
    P(b|a) = count(a b) / count(a) separates prose from shuffled or
    templated token soup far better than unigram frequency alone.

    Per doc (over all adjacent token pairs):
      * ``avg_cond_prob`` — mean of count(bigram)/count(prefix token,
        ANY position), each ratio floored to ``fp_scale`` fixed point
        BEFORE summing: a sum of doubles is order-nondeterministic under
        parallel aggregation, a sum of fixed-point bigints is exact in
        any engine;
      * ``rare_bigram_share`` — fraction of the doc's bigrams whose
        corpus count is <= ``rare_max``.

    Both outputs are TRUNCATED at ``fp_scale`` via integer division and
    divided back out once — never ``round()``: a 6dp round can land on
    an exact decimal tie (e.g. share 1/128) where engines' half-handling
    differs, while trunc-of-integer is bit-identical everywhere.

    Scale shape: bigram rows come map-only off the token array (same
    ``transform``+``slice`` family as duplicate_spans — no window over
    the token stream); one (l, r) count aggregation, one token count
    aggregation, one join of the bigram stream to each count table
    (vocabulary is unbounded at 100 TB, neither side broadcasts), one
    per-doc aggregation. Docs with < 2 tokens keep n_bigrams = 0 with
    null ratios."""
    toks = ws_tokens(F.col(text_col))
    base = docs.select("doc_id", toks.alias("__tk")).where(F.size("__tk") >= 2)
    pair_arr = F.expr(
        "transform(sequence(0, size(__tk) - 2),"
        " i -> struct(__tk[i] as l, __tk[i + 1] as r))"
    )
    pairs = base.select("doc_id", F.explode(pair_arr).alias("p")).select(
        "doc_id", "p.l", "p.r"
    )
    c2 = pairs.groupBy("l", "r").agg(F.count(F.lit(1)).alias("c2"))
    c1 = (
        docs.select(F.explode(toks).alias("l"))
        .groupBy("l")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    scored = (
        pairs.join(c2, ["l", "r"])
        .join(c1, "l")
        .select(
            "doc_id",
            "c2",
            F.expr(f"(c2 * {fp_scale}L) div c1").alias("fp"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("fp").alias("s"),
        F.count(F.when(F.col("c2") <= rare_max, 1)).alias("rare"),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n"), F.lit(0)).cast("int").alias("n_bigrams"),
            (
                F.expr("s div n").cast("double") / F.lit(float(fp_scale))
            ).alias("avg_cond_prob"),
            (
                F.expr(f"(rare * {fp_scale}L) div n").cast("double")
                / F.lit(float(fp_scale))
            ).alias("rare_bigram_share"),
        )
    )


def token_frequency_stats(docs: DataFrame, *, rare_max: int = 2,
                          text_col: str = "text") -> DataFrame:
    """Corpus-frequency fluency signals per doc — the engine-portable core
    of an LM-perplexity-style quality filter (cf. CCNet's reference-LM
    scoring): fluent text is built mostly from tokens the corpus uses
    often, while gibberish/OCR noise is dominated by near-unique tokens.

    Per doc (over ALL token occurrences, not the distinct set):
      * ``avg_token_freq`` — mean corpus-wide occurrence count of the
        doc's tokens (rational arithmetic, no log: a ratio of exact
        integers rounds identically in any engine, where log-based
        perplexity would drift in the last ulp across libms);
      * ``rare_token_share`` — fraction of tokens whose corpus count is
        <= ``rare_max``.

    Scale shape: the tokenize+explode projection feeds TWO consumers (the
    corpus-wide (token, count) aggregation and the join side), so the
    regex scan of the corpus runs twice as written — at 100 TB persist or
    checkpoint the exploded token stream between the two (left to the
    caller: an operator-internal persist has no unpersist point once a
    lazy frame is returned). The count aggregation partial-aggs map-side;
    the token stream joins to its counts with one shuffle (vocabulary is
    unbounded at 100 TB, so the count table is NOT broadcast by design);
    one per-doc aggregation. Empty docs keep n_tokens=0 with null
    ratios."""
    toked = docs.where(F.size(ws_tokens(F.col(text_col))) > 0).select(
        "doc_id", F.explode(ws_tokens(F.col(text_col))).alias("tok")
    )
    freq = toked.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    per_doc = (
        toked.join(freq, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cnt").alias("s"),
            F.count(F.when(F.col("cnt") <= rare_max, 1)).alias("r"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n"), F.lit(0)).cast("int").alias("n_tokens"),
            F.round(
                F.col("s").cast("double") / F.col("n").cast("double"), 6
            ).alias("avg_token_freq"),
            F.round(
                F.col("r").cast("double") / F.col("n").cast("double"), 6
            ).alias("rare_token_share"),
        )
    )
