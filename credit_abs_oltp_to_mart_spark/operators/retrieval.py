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
``tf * T < ~10^11`` (comfortably true for the test corpora; a 100 TB
corpus crosses it). At that scale drop S to 10^3 or lift the two
scaled ratios to decimal(38,0) — the plan shape is unchanged.

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
    toked = docs.select(
        "doc_id",
        F.size(ws_tokens(F.col(text_col))).alias("dl"),
        F.explode(ws_tokens(F.col(text_col))).alias("term"),
    )
    return toked.groupBy("term", "doc_id", "dl").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
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
) -> DataFrame:
    """Top-k BM25 retrieval: ``queries`` is a small (query_id, query)
    frame of whitespace-tokenizable query strings; returns
    (query_id, doc_id, rank, score_fp) where score_fp is the exact
    fixed-point BM25 score (scale ``fp_scale``) and rank is dense
    1..k per query by (score_fp desc, doc_id asc). Docs sharing no
    term with the query emit no row; duplicate query terms weigh the
    term once per occurrence (standard bag-of-words BM25)."""
    k1n, k1d = k1
    bn, bd = b
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
    totals = docs.select(
        F.size(ws_tokens(F.col(text_col))).alias("__dl")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("__dl").cast("bigint").alias("n_toks"),
    )
    cand = (
        post_q.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfq), "term")
        .crossJoin(F.broadcast(totals))
    )
    idf = F.expr(
        f"({fp_scale}L * (2L * (n_docs - df) + 1L)) div (2L * n_docs + 1L)"
    )
    tfpart = F.expr(
        f"({fp_scale}L * tf * {k1n + k1d}L * {bd}L * n_toks)"
        f" div (tf * {k1d * bd}L * n_toks"
        f" + {k1n * (bd - bn)}L * n_toks + {k1n * bn}L * dl * n_docs)"
    )
    scored = (
        cand.withColumn("__idf", idf)
        .withColumn("__tfp", tfpart)
        .select(
            "query_id",
            "doc_id",
            F.expr(f"(__idf * __tfp) div {fp_scale}L").alias("contrib"),
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
