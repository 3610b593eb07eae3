"""Text-analysis column expressions for the training-data pipeline operators.

All pure built-in functions (JVM-side): tokenization, n-gram shingles,
counting, quality ratios, rolling-hash fingerprints. Patterns use explicit
ASCII classes so Java-regex (Spark) and RE2 (DuckDB oracle) agree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish word/punct splitter: ASCII word runs or single non-word-non-space
TOKEN_PATTERN = "[A-Za-z0-9_]+|[^A-Za-z0-9_ ]"

# tiny deterministic stopword sets for the language-ID heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour"],
}

_HASH_MOD = 2_147_483_647  # 2^31 - 1


def ws_tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed text (empty string -> empty array)."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, "[ ]+")
    )


def ws_token_count(text: Column) -> Column:
    return F.size(ws_tokens(text))


def regex_token_count(text: Column) -> Column:
    """BPE-ish token count: word runs + individual punctuation marks."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), F.lit(0)))


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> (space-joined), distinct.

    Built as transform over sequence(1, len-n+1) — no UDF, no explode until
    the caller wants one.
    """
    toks = ws_tokens(text)
    joined = F.array_join(toks, " ")
    count = F.greatest(F.lit(0), F.size(toks) - F.lit(n - 1))
    grams = F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.when(count <= 0, F.array(joined)).otherwise(F.array_distinct(grams))


def punct_ratio(text: Column) -> Column:
    n_punct = F.size(
        F.regexp_extract_all(text, F.lit("[^A-Za-z0-9_ ]"), F.lit(0))
    ).cast("double")
    return n_punct / F.greatest(F.lit(1), F.length(text)).cast("double")


def stopword_ratio(text: Column, words: list[str]) -> Column:
    toks = ws_tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(words)))
    return hits.cast("double") / F.greatest(F.lit(1), F.size(toks)).cast("double")


def mean_token_length(text: Column) -> Column:
    toks = ws_tokens(text)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return total.cast("double") / F.greatest(F.lit(1), F.size(toks)).cast("double")


def quality_score(text: Column) -> Column:
    """Deterministic document quality heuristic in [0, 1]:
    length factor x (1 - punct ratio) x token-length sanity band."""
    length_factor = F.least(F.lit(1.0), F.length(text).cast("double") / F.lit(500.0))
    mean_len = mean_token_length(text)
    len_sane = F.when((mean_len >= 2.0) & (mean_len <= 12.0), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    return F.round(length_factor * (F.lit(1.0) - punct_ratio(text)) * len_sane, 6)


def token_rolling_hash(text: Column) -> Column:
    """Document fingerprint: polynomial rolling hash over whitespace tokens.

    h_0 = 7; h_i = (h_{i-1} * 31 + len(tok) * 17 + ascii(tok[0])) mod (2^31-1).
    Pure integer arithmetic -> bit-identical in any engine.
    """
    toks = ws_tokens(text)
    return F.aggregate(
        toks,
        F.lit(7).cast("long"),
        lambda acc, t: F.pmod(
            acc * F.lit(31)
            + F.length(t).cast("long") * F.lit(17)
            + F.ascii(F.substring(t, 1, 1)).cast("long"),
            F.lit(_HASH_MOD),
        ),
    )
