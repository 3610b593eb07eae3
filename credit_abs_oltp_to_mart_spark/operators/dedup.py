"""Deduplication operators over a documents table (doc_id, text, ...).

Training-data-pipeline extensions beyond the reference surface
(BASELINE.json north star). Scale posture:

- exact:    one shuffle on the content hash; at 100 TB hash first (16-byte
  key) so the shuffle never carries full text.
- minhash:  shingle -> signature is embarrassingly parallel; the LSH
  band-bucket join shuffles only (band_key, doc_id) pairs, never O(n^2).
- simhash:  signature is a map-only pass; clustering is a groupBy on a
  16-bit key.
- ngram-jaccard: exact pairwise verify; candidate generation MUST be
  bounded upstream (LSH) at scale — the all-pairs form here is the
  correctness oracle for small data, not the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.functions.similarity import (
    cosine_similarity,
    minhash_coefficients,
    minhash_signature,
    simhash16,
)
from credit_abs_oltp_to_mart_spark.functions.text import word_ngrams, ws_tokens


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by md5 of normalized text: canonical (min)
    doc_id + member count. Normalization: trim + collapse whitespace +
    lowercase."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), "[ ]+", " "))
    return (
        docs.select(F.col("doc_id"), F.md5(norm).alias("content_key"))
        .groupBy("content_key")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def _shingle_pairs(docs: DataFrame, n: int) -> DataFrame:
    """Candidate pairs sharing >= 1 n-gram shingle, with intersection size."""
    shingled = docs.select(
        "doc_id", F.explode(word_ngrams(F.col("text"), n)).alias("shingle")
    )
    a = shingled.alias("a")
    b = shingled.alias("b")
    return (
        a.join(b, "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.2
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard >= threshold.

    jaccard = |A ∩ B| / (|A| + |B| - |A ∩ B|), computed from distinct
    shingle sets. All-pairs-with-shared-shingle generation — exact but
    quadratic in the worst case; see module docstring."""
    sizes = docs.select(
        "doc_id", F.size(word_ngrams(F.col("text"), n)).alias("n_shingles")
    )
    pairs = _shingle_pairs(docs, n)
    return (
        pairs.join(sizes.withColumnsRenamed({"doc_id": "doc_a", "n_shingles": "size_a"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n_shingles": "size_b"}), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("n_shared")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    n_perm: int = 8,
    bands: int = 2,
    threshold: float = 0.2,
    seed: int = 42,
) -> DataFrame:
    """MinHash + LSH near-dup detection: shingle -> n_perm-wide signature ->
    band buckets -> candidate join -> exact Jaccard verify.

    The band join is the scale path: only docs colliding in >= 1 band are
    paired. Returns (doc_a, doc_b, jaccard) for verified candidates."""
    rows_per_band = n_perm // bands
    coeffs = minhash_coefficients(n_perm, seed)
    sig = docs.select(
        "doc_id",
        word_ngrams(F.col("text"), n).alias("shingles"),
    ).select(
        "doc_id",
        "shingles",
        minhash_signature(F.col("shingles"), coeffs).alias("sig"),
    )
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(str(bi)),
                        *[
                            F.element_at(F.col("sig"), bi * rows_per_band + r + 1)
                            for r in range(rows_per_band)
                        ],
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("band_key"),
    ).distinct()
    candidates = (
        banded.alias("a")
        .join(banded.alias("b"), "band_key")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    shingle_sets = sig.select("doc_id", "shingles")
    verified = (
        candidates.join(
            shingle_sets.withColumnsRenamed({"doc_id": "doc_a", "shingles": "sh_a"}), "doc_a"
        )
        .join(
            shingle_sets.withColumnsRenamed({"doc_id": "doc_b", "shingles": "sh_b"}), "doc_b"
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("n_shared"),
            F.size("sh_a").alias("size_a"),
            F.size("sh_b").alias("size_b"),
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("n_shared")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return verified


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """16-bit SimHash per document (map-only)."""
    return docs.select(
        "doc_id", simhash16(ws_tokens(F.col("text"))).alias("simhash")
    )


def simhash_clusters(docs: DataFrame) -> DataFrame:
    """Groups of documents sharing an identical SimHash."""
    return (
        simhash_fingerprints(docs)
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("canonical_doc_id"))
        .where(F.col("n_docs") > 1)
    )


def embedding_near_dups(
    emb: DataFrame, threshold: float = 0.95, vec_col: str = "embedding"
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (brute-force verify form).

    At scale, pre-bucket with sign-LSH (operators/ann.py) and run this
    per-bucket; the all-pairs form is the small-data oracle."""
    a = emb.select(F.col("vec_id").alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_similarity(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
