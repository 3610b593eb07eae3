"""Document text-analysis operators: language ID, quality scoring, token
counting, fingerprinting. All map-only column expressions — at 100 TB these
run at scan speed inside whole-stage codegen, no shuffle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.functions.text import (
    STOPWORDS,
    quality_score,
    regex_token_count,
    stopword_ratio,
    token_rolling_hash,
    ws_token_count,
)


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-ratio language heuristic over the STOPWORDS sets.

    Picks the language with the highest ratio (ties -> lexicographically
    first; all-zero -> 'und'). A real pipeline swaps in fastText/CLD3 via a
    pandas UDF; the heuristic keeps this engine dependency-free and
    oracle-checkable."""
    t = F.col(text_col)
    scores = [(lang, stopword_ratio(t, words)) for lang, words in sorted(STOPWORDS.items())]
    best = None
    for lang, score in scores:
        best = score if best is None else F.greatest(best, score)
    pred = F.lit("und")
    for lang, score in reversed(scores):  # earlier langs overwrite -> ties pick first
        pred = F.when((score == best) & (best > 0), F.lit(lang)).otherwise(pred)
    out = docs.select(
        "doc_id",
        *[s.alias(f"ratio_{lang}") for lang, s in scores],
        pred.alias("lang_pred"),
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
