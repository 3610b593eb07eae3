"""Unigram-LM tokenizer trainer (SentencePiece-style, Kudo 2018,
"Subword Regularization") on Spark — the BPE alternative: instead of
greedy merges, a CANDIDATE-PIECE vocabulary is scored by EM: the E-step
Viterbi-segments every word under the current piece weights, the M-step
re-estimates weights from the segmentation counts, for a fixed round
count. Like ``bpe_train`` and the Lloyd loop, training runs on the
WORD-FREQUENCY table (one corpus scan), each round is one map-only
segmentation pass + one piece-count aggregation + an O(V) driver
collect, and the vocabulary (the model) lives on the driver like a
codebook.

Engine-exact by construction (the ``classifier.py`` precedent — replace
the transcendental with an exact rational surrogate):

  * piece weights are fixed point: w = floor(S*cnt/total + 1/2) with
    S = 10^6, computed in exact bigint arithmetic;
  * the Viterbi objective minimizes sum of costs with
    cost(piece) = S - w(piece) — the piecewise-LINEAR surrogate for
    -log p (exact where it matters: the argmin structure; -ln p ~ 1-p
    near p=1, and the additive piece-count pressure of the constant S
    term mirrors the per-piece -log penalty);
  * the DP tiebreak is the total order (cost asc, piece-length desc):
    ties on cost at a position with EQUAL length are impossible (same
    position + same length = same piece), so every segmentation is
    unique and any engine replays it bit-for-bit;
  * out-of-vocabulary lookups cost a 10^15 sentinel; single characters
    are PERMANENT vocabulary members, so a finite path always exists
    and the sentinel never wins.

Scale: seed counting explodes word substrings (word-table sized, not
corpus sized), and the top-V cut runs IN-CLUSTER — a TakeOrdered limit
by (cnt desc, piece asc) unioned with the distinct single-char frame
(the coverage guarantee) — so the driver collects O(V + |charset|)
rows, never the full substring table (on a CJK-charset 100 TB corpus
distinct <=4-grams are O(10^7-10^8) rows). Each EM round re-reads the
checkpointed word table once with the V-entry weight map shipped as a
one-row broadcast (the codebook transport), counts shuffle O(V *
partitions) after partial aggregation, and the driver holds O(V) state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.functions.parallelism import local_rows

from credit_abs_oltp_to_mart_spark.operators.bpe import word_frequency_table

UNIGRAM_SCALE = 10**6
OOV_COST = 10**15
MAX_PIECE_LEN = 4
UNIGRAM_VOCAB = 120
UNIGRAM_ROUNDS = 2


def _wround(c: int, total: int, scale: int = UNIGRAM_SCALE) -> int:
    """floor(scale * c / total + 1/2) in exact bigint arithmetic —
    identical to the oracle's ((2*scale*c + total) // (2*total))."""
    return (2 * scale * c + total) // (2 * total)


def seed_pieces(
    wf: DataFrame, *, max_piece_len: int = MAX_PIECE_LEN
) -> DataFrame:
    """(piece, cnt) — every substring of length 1..max_piece_len of every
    word, occurrence-counted (overlaps included) weighted by word count.
    Word-table sized work: the explode is over substring positions of
    DISTINCT words, never the corpus."""
    sub = F.expr(
        f"flatten(transform(sequence(1, length(word)), i ->"
        f" transform(sequence(1, least({max_piece_len},"
        f" length(word) - i + 1)), l -> substr(word, i, l))))"
    )
    return (
        wf.select("cnt", F.explode(sub).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("cnt").alias("cnt"))
    )


def seed_vocab_frame(sp: DataFrame, vocab_size: int) -> DataFrame:
    """The IN-CLUSTER top-V cut over the seed-piece table: the best
    ``vocab_size`` pieces under the total order (cnt desc, piece asc) —
    an orderBy+limit Spark executes as TakeOrderedAndProject
    (per-partition heads + a driver merge of V rows, never a global
    sort) — unioned with every distinct single character (the
    segmentability guarantee; the groupBy dedups chars that already made
    the cut). Collecting THIS frame is O(V + |charset|) rows; the full
    substring table never reaches the driver."""
    topv = sp.orderBy(F.col("cnt").desc(), F.col("piece").asc()).limit(
        vocab_size
    )
    chars = sp.where(F.length("piece") == 1)
    return topv.unionByName(chars).groupBy("piece").agg(
        F.max("cnt").alias("cnt")
    )


def _weights(counts: dict[str, int]) -> dict[str, int]:
    """M-step: fixed-point weights from counts; total over ALL vocabulary
    entries (zero-count single chars keep weight 0 but stay members)."""
    total = sum(counts.values())
    if total <= 0:
        return {p: 0 for p in counts}
    return {p: _wround(c, total) for p, c in counts.items()}


def _vmap_frame(spark: SparkSession, weights: dict[str, int]) -> DataFrame:
    """The vocabulary as a ONE-ROW broadcastable frame holding a
    piece -> cost map (cost = SCALE - weight) — the codebook transport:
    executors get the model through the broadcast manager, the word
    table's partitioning is untouched."""
    entries = [
        (p, int(UNIGRAM_SCALE - w)) for p, w in sorted(weights.items())
    ]
    return local_rows(spark, 
        [(dict(entries),)], "__vc map<string,bigint>"
    )


def viterbi_segment_expr(
    word_col: str, max_piece_len: int = MAX_PIECE_LEN
) -> F.Column:
    """The word's minimum-cost segmentation under the joined ``__vc``
    cost map, as ONE backward higher-order-function fold.

    Positions are 1-based; the accumulator is a sliding window of the
    best (cost, negl, segs) structs for the next ``max_piece_len``
    positions (win[1] = best of the position just after the current
    one). At each position the candidates are the 1..L-length pieces
    starting there; array_min's lexicographic struct order implements
    the (cost asc, piece-length desc) tiebreak — negl = L - l. OOV
    pieces cost the sentinel; single chars are always in the map, so a
    finite path exists at every position. Returns struct(cost, segs)."""
    L = max_piece_len
    w = word_col
    fold = f"""
    aggregate(
      sequence(length({w}), 1, -1),
      array(struct(cast(0 as bigint) as cost, 0 as negl,
                   cast(array() as array<string>) as segs)),
      (win, j) -> concat(
        array(array_min(transform(
          sequence(1, least({L}, length({w}) - j + 1)),
          l -> struct(
            coalesce(try_element_at(__vc, substr({w}, j, l)),
                     cast({OOV_COST} as bigint)) + win[l - 1].cost as cost,
            {L} - l as negl,
            concat(array(substr({w}, j, l)), win[l - 1].segs) as segs)))),
        slice(win, 1, {L - 1})),
      win -> struct(win[0].cost as cost, win[0].segs as segs))
    """
    return F.expr(fold)


def unigram_counts(
    wf_vc: DataFrame, *, max_piece_len: int = MAX_PIECE_LEN
) -> DataFrame:
    """E-step: Viterbi-segment every word (map-only fold) and sum piece
    occurrences weighted by word count — (piece, cnt), partial-agg
    friendly."""
    return (
        wf_vc.select(
            "cnt",
            F.explode(
                viterbi_segment_expr("word", max_piece_len)["segs"]
            ).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("cnt").alias("cnt"))
    )


def unigram_train(
    docs: DataFrame,
    *,
    rounds: int = UNIGRAM_ROUNDS,
    max_piece_len: int = MAX_PIECE_LEN,
    vocab_size: int = UNIGRAM_VOCAB,
    text_col: str = "text",
) -> tuple[DataFrame, dict[str, int]]:
    """Train the unigram-LM tokenizer; returns (vocab frame, weights).

    The vocab frame is (rank, piece, cnt, weight): cnt = the final
    E-step's segmentation count (single chars that no best segmentation
    uses keep cnt 0 — they stay vocabulary members as the coverage
    guarantee), weight = the final M-step fixed-point weight, rank by
    (weight desc, piece asc). ``weights`` is the same model as a driver
    dict, ready for a scoring pass."""
    spark = docs.sparkSession
    wf = word_frequency_table(docs, text_col).localCheckpoint(eager=True)
    counts = {
        r["piece"]: int(r["cnt"])
        for r in seed_vocab_frame(
            seed_pieces(wf, max_piece_len=max_piece_len), vocab_size
        ).collect()
    }
    weights = _weights(counts)
    for _ in range(rounds):
        vc = _vmap_frame(spark, weights)
        got = {
            r["piece"]: int(r["cnt"])
            for r in unigram_counts(
                wf.crossJoin(F.broadcast(vc)), max_piece_len=max_piece_len
            ).collect()
        }
        # vocabulary membership is stable across rounds: counted pieces
        # keep their new counts, unused members drop to 0 (single chars
        # stay; multi-char pieces with 0 count are pruned — the EM
        # analogue of SentencePiece's pruning step)
        counts = {
            p: got.get(p, 0)
            for p in weights
            if len(p) == 1 or got.get(p, 0) > 0
        }
        weights = _weights(counts)
    rows = [
        (p, counts[p], weights[p]) for p in sorted(weights)
    ]
    out = local_rows(spark, 
        rows, "piece string, cnt bigint, weight bigint"
    )
    w = Window.orderBy(F.col("weight").desc(), F.col("piece").asc())
    vocab = out.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "piece",
        "cnt",
        "weight",
    )
    return vocab, weights


def unigram_segment_stats(
    docs: DataFrame,
    weights: dict[str, int],
    *,
    max_piece_len: int = MAX_PIECE_LEN,
    text_col: str = "text",
) -> DataFrame:
    """Per-doc statistics under the TRAINED unigram vocabulary — the
    scoring twin of ``bpe_segment_stats``: (doc_id, n_words, n_pieces,
    total_cost), where total_cost is the summed fixed-point Viterbi cost
    of the doc's words (the surrogate corpus negative log-likelihood a
    SentencePiece deployment monitors).

    Plan: DISTINCT words are segmented once (the word-table-sized
    Viterbi fold, model map via a one-row broadcast), then the corpus
    token stream joins the broadcast word-level results — the corpus
    never shuffles on the word key, identical scale shape to
    ``bpe_segment_stats``. Every doc gets a row (empty docs at zero)."""
    from credit_abs_oltp_to_mart_spark.functions.text import ws_tokens

    spark = docs.sparkSession
    wf = word_frequency_table(docs, text_col)
    vc = _vmap_frame(spark, weights)
    seg = (
        wf.crossJoin(F.broadcast(vc))
        .select(
            "word", viterbi_segment_expr("word", max_piece_len).alias("s")
        )
        .select(
            "word",
            F.size(F.col("s.segs")).cast("int").alias("n_pieces"),
            F.col("s.cost").alias("cost"),
        )
    )
    toks = docs.select(
        "doc_id", F.explode(ws_tokens(F.col(text_col))).alias("word")
    )
    per_doc = (
        toks.join(F.broadcast(seg), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_words"),
            F.sum("n_pieces").cast("int").alias("n_pieces"),
            F.sum("cost").cast("bigint").alias("total_cost"),
        )
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_words", F.lit(0)).cast("int").alias("n_words"),
        F.coalesce("n_pieces", F.lit(0)).cast("int").alias("n_pieces"),
        F.coalesce("total_cost", F.lit(0)).cast("bigint").alias("total_cost"),
    )


def perplexity_filter(
    docs: DataFrame,
    ref_docs: DataFrame,
    *,
    max_cost_per_word: int,
    rounds: int = UNIGRAM_ROUNDS,
    max_piece_len: int = MAX_PIECE_LEN,
    vocab_size: int = UNIGRAM_VOCAB,
    text_col: str = "text",
) -> DataFrame:
    """Language-model quality filtering (the CCNet / Wenzek et al. 2020
    recipe, on the exact-arithmetic unigram LM instead of KenLM): train
    the tokenizer-LM on a REFERENCE corpus of known-good text, score
    every candidate doc's surrogate negative log-likelihood under it,
    and keep docs whose MEAN per-word cost stays under the threshold —
    text unlike the reference (noise, boilerplate, wrong domain)
    segments into expensive/OOV pieces and drops.

    The verdict is the integer comparison
    ``total_cost <= max_cost_per_word * n_words`` (no division — exact
    and engine-replayable; ``max_cost_per_word`` is in the fixed-point
    cost units of ``UNIGRAM_SCALE``). Empty docs cost 0 and are kept —
    compose with the token gate (`corpus.filter_documents`) which owns
    length policy. Words absent from the reference vocabulary segment
    through the OOV sentinel, so out-of-domain text is penalized, never
    silently passed.

    Scale shape: training is ``unigram_train`` on the reference (the
    word-table-sized EM loop); scoring is ``unigram_segment_stats`` —
    DISTINCT words segment once against the one-row broadcast model,
    the corpus stream joins the broadcast word results, one per-doc
    aggregation. Returns (doc_id, n_words, n_pieces, total_cost,
    is_kept)."""
    _, weights = unigram_train(
        ref_docs,
        rounds=rounds,
        max_piece_len=max_piece_len,
        vocab_size=vocab_size,
        text_col=text_col,
    )
    stats = unigram_segment_stats(
        docs, weights, max_piece_len=max_piece_len, text_col=text_col
    )
    return stats.select(
        "doc_id",
        "n_words",
        "n_pieces",
        "total_cost",
        (
            F.col("total_cost")
            <= F.lit(int(max_cost_per_word)) * F.col("n_words")
        )
        .cast("int")
        .alias("is_kept"),
    )
