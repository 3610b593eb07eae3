"""Deduplication operators over a documents table (doc_id, text, ...).

Training-data-pipeline extensions beyond the reference surface
(BASELINE.json north star). Scale posture:

- exact:    one shuffle on the content hash; at 100 TB hash first (16-byte
  key) so the shuffle never carries full text.
- minhash:  shingle -> signature is embarrassingly parallel; the LSH
  band-bucket join shuffles only (band_key, doc_id) pairs, never O(n^2).
- simhash:  signature is a map-only pass (64-bit xxhash64 by default;
  60-bit md5 mode for the cross-engine oracle); near-dup candidates come
  from 2^16-bucket-per-band LSH, clustering from a groupBy on the key.
- ngram-jaccard: exact pairwise verify; candidate generation MUST be
  bounded upstream (LSH) at scale — the all-pairs form here is the
  correctness oracle for small data, not the 100 TB path.
- incremental: new-batch dedup against a persisted signature store
  (``minhash_signatures`` + ``incremental_minhash_pairs``) — the batch is
  broadcast, the corpus is scanned once and never re-shingled/shuffled.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.functions.parallelism import ensure_parallelism
from credit_abs_oltp_to_mart_spark.functions.similarity import (
    MERSENNE_31,
    hyperplane_sign_bits,
    md5_long,
    md5_mod31,
    minhash_coefficients,
    random_hyperplanes,
)
from credit_abs_oltp_to_mart_spark.functions.text import ws_tokens


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


def shingle_rows(docs: DataFrame, n: int, text_col: str = "text") -> DataFrame:
    """Distinct (doc_id, shingle) rows — the exploded word-n-gram index.

    Regex-lookahead formulation: after collapsing space runs, every
    overlapping n-gram is captured in ONE regex scan per document — a
    zero-width match anchored at each token start whose lookahead group
    grabs the next n tokens. MAP-ONLY until the final distinct: no token
    explode, no window shuffle+sort over the token stream (the previous
    lead()-over-window form shuffled ~tokens rows and ran 6x slower at
    sf0.1). `[^ ]` (not `\\S`) keeps tokens bit-identical to ws_tokens'
    space-only split when text contains tabs/newlines.

    Docs with < n tokens contribute their whole space-normalized text as a
    single shingle (same as DuckDB `array_to_string(tk, ' ')`)."""
    return _doc_grams(docs, n, text_col).select(
        "doc_id", F.explode("grams").alias("shingle")
    )


def _gram_set_col(n: int, text_col: str = "text") -> Column:
    """array<string> column of the DISTINCT word-n-gram set of ``text_col``
    — the whole shingle-set build is a single map-side expression.

    Within-doc dedup happens via ``array_distinct`` on the per-doc gram
    array BEFORE any explode, so no consumer ever needs a shuffle-backed
    ``distinct()`` over the exploded gram index (the previous form
    shuffled every (doc_id, shingle) row just to dedup within documents)."""
    norm = F.regexp_replace(F.trim(F.col(text_col)), "[ ]+", " ")
    pat = "(?:^|(?<= ))(?=(" + " ".join(["[^ ]+"] * n) + "))"
    toks = ws_tokens(F.col(text_col))
    grams = F.regexp_extract_all(norm, F.lit(pat), 1)
    return F.array_distinct(
        F.when(F.size(toks) < n, F.array(F.array_join(toks, " "))).otherwise(
            grams
        )
    )


def _doc_grams(docs: DataFrame, n: int, text_col: str = "text") -> DataFrame:
    """(doc_id, grams array<string>) — one row per doc, map-only."""
    docs = ensure_parallelism(docs)
    return docs.select("doc_id", _gram_set_col(n, text_col).alias("grams"))


def _join_sizes(pairs: DataFrame, sizes: DataFrame) -> DataFrame:
    """Attach size_a/size_b set sizes to a (doc_a, doc_b, n_shared) pair
    table from a (doc_id, n_shingles) size frame. The size table is one
    narrow row per doc (AQE broadcasts the smaller side); joining at the
    pair level costs two small hash joins instead of carrying sizes on
    every gram row through the big self-join."""
    return pairs.join(
        sizes.select(
            F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("size_a")
        ),
        "doc_a",
    ).join(
        sizes.select(
            F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("size_b")
        ),
        "doc_b",
    )


def _thresholded_jaccard(pairs: DataFrame, threshold: float) -> DataFrame:
    """(doc_a, doc_b, size_a, size_b, n_shared) -> thresholded Jaccard."""
    return pairs.select(
        "doc_a",
        "doc_b",
        F.round(
            F.col("n_shared").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("n_shared")).cast("double"),
            6,
        ).alias("jaccard"),
    ).where(F.col("jaccard") >= threshold)


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.2
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard >= threshold.

    jaccard = |A ∩ B| / (|A| + |B| - |A ∩ B|), computed from distinct
    shingle sets via an inverted-index self-join. All-pairs-with-shared-
    shingle generation — exact but quadratic in the worst case; see module
    docstring."""
    dg = _doc_grams(docs, n).persist()
    ex = dg.select("doc_id", F.explode("grams").alias("shingle"))
    pairs = (
        ex.alias("a")
        .join(ex.alias("b"), "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sizes = dg.select("doc_id", F.size("grams").alias("n_shingles"))
    return _thresholded_jaccard(_join_sizes(pairs, sizes), threshold)


def _signatures(
    dg: DataFrame, n_perm: int, seed: int, grams_col: str = "grams"
) -> DataFrame:
    """(doc_id, s0..s{n_perm-1}) from a per-doc gram-array frame — pure
    map-side higher-order functions (array_min over transform), so the
    signature build needs NO explode + groupBy shuffle: each doc's
    signature is computed where its row already lives.

    Two-step projection on purpose: the md5 gram hashing lands in its own
    SELECT so it runs ONCE per gram; inlining it into each of the n_perm
    array_min expressions would re-hash every gram n_perm times (md5
    dominates the a*h+b permutation arithmetic by orders of magnitude)."""
    coeffs = minhash_coefficients(n_perm, seed)

    def perm(a: int, b: int):
        return lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(MERSENNE_31))

    hashed = dg.select(
        "doc_id", F.transform(F.col(grams_col), md5_mod31).alias("__h")
    )
    return hashed.select(
        "doc_id",
        *[
            F.array_min(F.transform(F.col("__h"), perm(a, b))).alias(f"s{i}")
            for i, (a, b) in enumerate(coeffs)
        ],
    )


def _band_key_col(n_perm: int, bands: int):
    """Exploded LSH band-key column over signature columns s0..s{n_perm-1}."""
    rows_per_band = n_perm // bands
    return F.explode(
        F.array(
            *[
                F.concat_ws(
                    ":",
                    F.lit(str(bi)),
                    *[
                        F.col(f"s{bi * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ],
                )
                for bi in range(bands)
            ]
        )
    ).alias("band_key")


def minhash_signatures(
    docs: DataFrame, n: int = 3, n_perm: int = 8, seed: int = 42
) -> DataFrame:
    """(doc_id, s0..s{n_perm-1}) MinHash signature table — the persistable
    fingerprint STORE for incremental dedup.

    At 100 TB this is written once per corpus snapshot (partitioned
    parquet, ~8 longs per document) and every subsequent ingest batch
    dedups against it via ``incremental_minhash_pairs`` without touching
    corpus text again. Map-only: gram set, hashing and the per-permutation
    minima are all computed in two projections (no explode + groupBy)."""
    return _signatures(_doc_grams(docs, n), n_perm, seed)


def incremental_minhash_pairs(
    new_docs: DataFrame,
    corpus_signatures: DataFrame,
    *,
    n: int = 3,
    n_perm: int = 8,
    bands: int = 2,
    min_est: float = 0.25,
    seed: int = 42,
    broadcast_batch: bool = True,
) -> DataFrame:
    """Dedup a NEW ingest batch against a persisted corpus signature store
    (built by ``minhash_signatures``) — the incremental path: corpus text
    is never re-read, re-shingled, or re-hashed.

    Scale design, two physical modes on one logical plan:

    * ``broadcast_batch=True`` (default) — the new batch is small relative
      to the corpus, so its banded signatures are BROADCAST; the store is
      scanned once, banded inline (projection + explode, map-only),
      hash-joined against the broadcast side, and never shuffled. Right
      whenever the batch's banded signatures fit the broadcast budget
      (~10M docs per batch at 8 longs + key each).
    * ``broadcast_batch=False`` — the large-slice fallback: a sort-merge
      join on ``band_key`` (``merge`` hint pins the strategy, so neither
      AQE nor size estimates can silently re-broadcast). Both sides
      shuffle once on the band key; sort-merge spills instead of OOMing
      when a slice is corpus-sized. If ``corpus_signatures`` arrives
      PRE-BANDED (a ``band_key`` column alongside ``doc_id``/``s*`` —
      e.g. a store table written ``bucketBy(band_key)`` via
      ``sources.writers.write_bucketed``), the banding explode is skipped
      and a bucketed scan feeds the join without a store-side exchange.

    Match quality is the standard MinHash estimator — est_jaccard =
    fraction of agreeing signature components — so verification needs no
    shingle sets from either side. Returns (new_doc_id, corpus_doc_id,
    est_jaccard) with est_jaccard >= ``min_est`` (granularity 1/n_perm)."""

    return incremental_pairs_from_signatures(
        minhash_signatures(new_docs, n=n, n_perm=n_perm, seed=seed),
        corpus_signatures,
        n_perm=n_perm,
        bands=bands,
        min_est=min_est,
        broadcast_batch=broadcast_batch,
    )


def incremental_pairs_from_signatures(
    new_sigs: DataFrame,
    corpus_signatures: DataFrame,
    *,
    n_perm: int = 8,
    bands: int = 2,
    min_est: float = 0.25,
    broadcast_batch: bool = True,
) -> DataFrame:
    """``incremental_minhash_pairs`` when the NEW side is already a
    signature table (doc_id, s0..s{n_perm-1}) — lets a caller that needs
    the batch signatures anyway (e.g. the streaming ingest, which also
    self-joins them for within-batch dedup and appends survivors' rows to
    the store) pay the gram-extraction regex ONCE per batch instead of
    once per consumer."""

    def _banded(sig: DataFrame, prefix: str) -> DataFrame:
        keyed = [F.col(f"{prefix}_doc_id"), *[
            F.col(f"s{i}").alias(f"{prefix}_s{i}") for i in range(n_perm)
        ]]
        if "band_key" in sig.columns:
            # a pre-banded store built with a different `bands` would
            # structurally never collide with the new side's keys — a
            # silent full dedup bypass. Validate the key SHAPE per row
            # (component count = band index + rows_per_band) so that
            # mismatch fails loudly instead. The assert rides on the
            # doc_id projection, NOT the join key: wrapping band_key in
            # an expression would discard the bucketed scan's
            # HashPartitioning and re-introduce the store-side exchange
            # the pre-banded layout exists to avoid. (assert_true is null
            # on pass, so the coalesce is the identity.)
            width = 1 + n_perm // bands
            chk = F.assert_true(
                F.size(F.split(F.col("band_key"), ":")) == width,
                F.lit(
                    "pre-banded signature store band_key does not match "
                    f"bands={bands}, n_perm={n_perm}"
                ),
            )
            keyed[0] = F.coalesce(
                chk.cast("long"), F.col(f"{prefix}_doc_id")
            ).alias(f"{prefix}_doc_id")
            return sig.withColumnRenamed("doc_id", f"{prefix}_doc_id").select(
                *keyed, "band_key"
            )
        return sig.select(
            F.col("doc_id").alias(f"{prefix}_doc_id"),
            *[F.col(f"s{i}").alias(f"{prefix}_s{i}") for i in range(n_perm)],
            _band_key_col(n_perm, bands),
        )

    new_banded = _banded(new_sigs, "new")
    if broadcast_batch:
        new_banded = F.broadcast(new_banded)
    else:
        new_banded = new_banded.hint("merge")
    matched = _banded(corpus_signatures, "corpus").join(new_banded, "band_key")
    est = sum(
        F.when(F.col(f"new_s{i}") == F.col(f"corpus_s{i}"), 1).otherwise(0)
        for i in range(n_perm)
    ).cast("double") / F.lit(float(n_perm))
    return (
        matched.select(
            "new_doc_id",
            "corpus_doc_id",
            F.round(est, 6).alias("est_jaccard"),
        )
        # a pair colliding in several bands appears once per band; the
        # estimate is a pure function of the pair, so distinct() dedups
        .distinct()
        .where(F.col("est_jaccard") >= min_est)
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
    paired. Returns (doc_a, doc_b, jaccard) for verified candidates.

    Plan shape: the doc-level gram-array frame is persisted ONCE and feeds
    everything map-side — signatures (array_min-over-transform HOFs),
    band keys, the exploded verify index, and set sizes — so the only
    shuffles left are the ones the algorithm requires: the band-bucket
    self-join, the candidate distinct, and the verify join + count."""
    # persisted: the gram frame feeds the signature build AND both verify
    # array lookups. The signature table itself needs no persist — the band
    # self-join's two sides are identical subtrees whose band_key exchange
    # Spark dedups via ReusedExchange, so signatures compute once anyway.
    dg = _doc_grams(docs, n).persist()
    sig = _signatures(dg, n_perm, seed)
    # band keys carry the band index, so the `bands` rows per doc are
    # distinct by construction — no dedup shuffle needed before the join
    banded = sig.select("doc_id", _band_key_col(n_perm, bands))
    candidates = (
        banded.alias("a")
        .join(banded.alias("b"), "band_key")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # exact verify straight off the gram ARRAYS: the candidate pair set is
    # tiny relative to the corpus (that is the point of LSH), so joining it
    # to the per-doc arrays twice (small side broadcast by AQE) and taking
    # size(array_intersect) per pair is map-side work — no gram explode, no
    # inverted-index shuffle, no groupBy. A candidate with an empty
    # intersection keeps jaccard 0 < threshold, as in the oracle.
    ga = dg.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("__ga"))
    gb = dg.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("__gb"))
    verified = (
        candidates.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("__ga", "__gb")).alias("n_shared"),
            F.size("__ga").alias("size_a"),
            F.size("__gb").alias("size_b"),
        )
    )
    return _thresholded_jaccard(verified, threshold)


def simhash_fingerprints(docs: DataFrame, n_bits: int = 64) -> DataFrame:
    """``n_bits``-wide SimHash per document (default 64).

    Exploded-vote formulation: one row per distinct token, hashed once,
    then ``n_bits`` conditional SUMs (bit votes) in a single grouped
    aggregation — partial-agg friendly and codegen'd, vs interpreted array
    folds that each re-hash every token. Docs with no tokens get simhash 0
    (empty vote = all bits unset), as with an empty-array fold.

    Token-hash modes:
      * ``n_bits == 64`` — ``xxhash64`` (JVM intrinsic, no string round
        trips): the production/scale path. 64-bit fingerprints are what
        band-bucketed candidate generation needs at 1e9+ docs; a 16-bit
        space saturates (~256 buckets) and degrades to all-pairs.
      * ``n_bits <= 60`` — bits of ``md5_long`` (first 15 md5 hex digits),
        reproducible in any engine: the DuckDB oracle gate runs the 60-bit
        variant with bit-identical arithmetic.
    """
    assert n_bits == 64 or 1 <= n_bits <= 60, "portable md5 mode caps at 60 bits"
    docs = ensure_parallelism(docs)
    toked = docs.select(
        "doc_id", F.explode(F.array_distinct(ws_tokens(F.col("text")))).alias("tok")
    )
    h = F.xxhash64(F.col("tok")) if n_bits == 64 else md5_long(F.col("tok"))
    hashed = toked.select("doc_id", h.alias("h"))
    # SWAR packed bit-count formulation: the +-1 vote for bit j is
    # vote_j = 2*ones_j - n (ones_j = tokens with bit j set, n = tokens),
    # so "vote_j > 0" == "2*ones_j > n" and only the ones_j COUNTS need
    # aggregating. One shift+mask with lane mask 0x0001000100010001 drops
    # bits a, a+16, a+32, a+48 into four independent 16-bit counter lanes,
    # so the whole 60/64-bit vote costs 16 shift+AND ops per token row and
    # 16 SUM accumulators (vs 60-64 conditional sums: ~4x less per-row
    # work, ~4x smaller partial-agg buffer through the shuffle). The guard
    # below caps n at 2^15-1 DISTINCT tokens per doc (still hundreds of KB
    # of unique words), one bit tighter than the 16-bit lane width: it
    # guarantees that any doc which PASSES the guard kept every partial
    # SUM below Long.MAX (top lane, bits 48+, included), so passing docs
    # can never overflow, in ANSI mode or out. A doc that VIOLATES the
    # bound may still die with the raw ArithmeticException under
    # spark.sql.ansi.enabled before the post-agg assert column evaluates
    # (the overflow happens inside the aggregation itself); non-ANSI mode
    # wraps benignly and reaches the intended assert_true message.
    # shiftrightUNSIGNED so bit 63 of a signed xxhash64 never smears sign
    # bits across higher lanes.
    stride = 16
    lane_mask = 0x0001000100010001
    n_acc = min(n_bits, stride)
    packed = [
        F.sum(
            F.shiftrightunsigned(F.col("h"), a).bitwiseAND(F.lit(lane_mask))
        ).alias(f"a{a}")
        for a in range(n_acc)
    ]
    votes = hashed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), *packed
    )
    chk = F.assert_true(
        F.col("n") < F.lit(1 << (stride - 1)),
        F.lit(f"simhash_fingerprints: > {(1 << (stride - 1)) - 1} distinct"
              " tokens in one doc overflows the packed vote counters"),
    )
    acc = F.lit(0).cast("long")
    cmask = (1 << stride) - 1
    for j in range(n_bits):
        lane, a = divmod(j, stride)
        ones = F.shiftrightunsigned(F.col(f"a{a}"), stride * lane).bitwiseAND(
            F.lit(cmask)
        )
        bitval = F.lit(-(1 << 63)) if j == 63 else F.lit(1 << j)
        acc = acc + F.when(ones * 2 > F.col("n"), bitval).otherwise(F.lit(0))
    sim = votes.select(
        "doc_id", F.when(chk.isNull(), acc).cast("long").alias("simhash")
    )
    return (
        docs.select("doc_id")
        .join(sim, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("simhash"), F.lit(0).cast("long")).alias("simhash"),
        )
    )


def banded_hamming_pairs(
    fp: DataFrame,
    fp_col: str,
    max_hamming: int = 3,
    n_bands: int = 4,
    n_bits: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs among ``n_bits``-wide integer fingerprints by hamming
    distance <= ``max_hamming`` — the shared kernel behind SimHash text
    near-dups and perceptual-hash image near-dups.

    Band-bucketed candidate generation (same shape as MinHash LSH): the
    fingerprint splits into ``n_bands`` equal bands; rows sharing any band
    collide into a candidate pair; the exact hamming distance (bit_count
    of xor — one instruction, identical in DuckDB) verifies. Pigeonhole
    guarantees full recall while max_hamming < n_bands: a pair within
    distance n_bands-1 must agree exactly on >= 1 band.

    Scale: candidate volume is bounded by band-bucket occupancy. The
    default 64-bit/4-band split gives 2^16 buckets PER BAND (vs ~2^8 for a
    16-bit fingerprint, which saturates at ~1e8 docs and degrades the band
    self-join toward O(n^2)); raise ``n_bands`` only with a wider
    ``max_hamming`` budget, since width = n_bits/n_bands shrinks buckets
    but weakens the pigeonhole bound."""
    assert max_hamming < n_bands, "recall guarantee needs max_hamming < n_bands"
    assert n_bits % n_bands == 0, "bands must tile the fingerprint evenly"
    width = n_bits // n_bands
    mask = (1 << width) - 1
    # NOTE: no persist here — the self-join's two sides are identical
    # subtrees, so Spark's ReusedExchange computes the fingerprint chain
    # once already; a cache write would only add a synchronous
    # materialization in front of it
    banded = fp.select(
        id_col,
        fp_col,
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(str(b)),
                        # logical shift: a signed 64-bit fingerprint's top
                        # band must not smear the sign bit into the bucket
                        F.shiftrightunsigned(F.col(fp_col), width * b)
                        .bitwiseAND(F.lit(mask))
                        .cast("string"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    )
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), "band")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col(f"a.{fp_col}").alias("sa"),
            F.col(f"b.{fp_col}").alias("sb"),
        )
        .distinct()
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.bit_count(
            F.col("sa").bitwiseXOR(F.col("sb"))
        ).alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    n_bands: int = 4,
    n_bits: int = 64,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= ``max_hamming`` —
    ``simhash_fingerprints`` composed with the ``banded_hamming_pairs``
    kernel (see that docstring for the recall guarantee and the bucket
    geometry at scale)."""
    # validate geometry BEFORE paying for fingerprints (the kernel
    # re-asserts for direct callers)
    assert max_hamming < n_bands, "recall guarantee needs max_hamming < n_bands"
    assert n_bits % n_bands == 0, "bands must tile the fingerprint evenly"
    fp = simhash_fingerprints(docs, n_bits=n_bits)
    return banded_hamming_pairs(
        fp, "simhash", max_hamming=max_hamming, n_bands=n_bands, n_bits=n_bits
    )


def simhash_clusters(docs: DataFrame) -> DataFrame:
    """Groups of documents sharing an identical SimHash."""
    return (
        simhash_fingerprints(docs)
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("canonical_doc_id"))
        .where(F.col("n_docs") > 1)
    )


def _round6_half_up(x: np.ndarray) -> np.ndarray:
    """Round-half-away-from-zero to 6 dp (numpy round is half-even)."""
    return np.copysign(np.floor(np.abs(x) * 1e6 + 0.5), x) / 1e6


def _blocked_cosine_kernel(threshold: float):
    """mapInPandas kernel over block-pair rows (blk_a, rows_a, blk_b,
    rows_b[, bucket]): emits (id_a, id_b, cosine) for pairs with cosine >=
    threshold. Dot/norm accumulation loops dimension-by-dimension so every
    partial sum matches a sequential left-fold bit-for-bit — the DuckDB
    oracle (`list_dot_product` over DOUBLE[]) reproduces it exactly."""

    def _block_cosines(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_a_out: list[np.ndarray] = []
            ids_b_out: list[np.ndarray] = []
            cos_out: list[np.ndarray] = []
            for blk_a, blk_b, rows_a, rows_b in zip(
                pdf["blk_a"], pdf["blk_b"], pdf["rows_a"], pdf["rows_b"]
            ):
                ids_a = np.array([r["vec_id"] for r in rows_a], dtype=np.int64)
                ids_b = np.array([r["vec_id"] for r in rows_b], dtype=np.int64)
                mat_a = np.array(
                    [np.asarray(r["v"], dtype=np.float64) for r in rows_a]
                )
                mat_b = np.array(
                    [np.asarray(r["v"], dtype=np.float64) for r in rows_b]
                )
                dim = mat_a.shape[1]
                # dimension-major accumulation == sequential fold per pair
                dots = np.zeros((len(ids_a), len(ids_b)))
                for d in range(dim):
                    dots += mat_a[:, d : d + 1] * mat_b[None, :, d]
                sq_a = np.zeros(len(ids_a))
                sq_b = np.zeros(len(ids_b))
                for d in range(dim):
                    sq_a += mat_a[:, d] * mat_a[:, d]
                    sq_b += mat_b[:, d] * mat_b[:, d]
                cos = _round6_half_up(
                    dots / (np.sqrt(sq_a)[:, None] * np.sqrt(sq_b)[None, :])
                )
                mask = cos >= threshold
                if blk_a == blk_b:
                    mask &= ids_a[:, None] < ids_b[None, :]
                ii, jj = np.nonzero(mask)
                pa, pb = ids_a[ii], ids_b[jj]
                ids_a_out.append(np.minimum(pa, pb))
                ids_b_out.append(np.maximum(pa, pb))
                cos_out.append(cos[ii, jj])
            empty_i = np.array([], dtype=np.int64)
            yield pd.DataFrame(
                {
                    "id_a": np.concatenate(ids_a_out or [empty_i]),
                    "id_b": np.concatenate(ids_b_out or [empty_i]),
                    "cosine": np.concatenate(cos_out or [np.array([])]),
                }
            )

    return _block_cosines


def _blocked_cross_cosine_kernel(threshold: float):
    """mapInPandas kernel over CROSS-SET block-pair rows (rows_a from one
    vector set, rows_b from another): emits (id_a, id_b, cosine) for every
    cross pair with cosine >= threshold — no triangle mask and no min/max
    id normalization, because the two sides are distinct populations
    (train vs eval) and the caller needs to know which side each id came
    from. Same dimension-major accumulation + half-up 6 dp rounding as
    ``_blocked_cosine_kernel``, so the DuckDB ``list_dot_product`` oracle
    reproduces every cosine bit-for-bit."""

    def _block_cross(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_a_out: list[np.ndarray] = []
            ids_b_out: list[np.ndarray] = []
            cos_out: list[np.ndarray] = []
            for rows_a, rows_b in zip(pdf["rows_a"], pdf["rows_b"]):
                ids_a = np.array([r["vec_id"] for r in rows_a], dtype=np.int64)
                ids_b = np.array([r["vec_id"] for r in rows_b], dtype=np.int64)
                mat_a = np.array(
                    [np.asarray(r["v"], dtype=np.float64) for r in rows_a]
                )
                mat_b = np.array(
                    [np.asarray(r["v"], dtype=np.float64) for r in rows_b]
                )
                dim = mat_a.shape[1]
                dots = np.zeros((len(ids_a), len(ids_b)))
                for d in range(dim):
                    dots += mat_a[:, d : d + 1] * mat_b[None, :, d]
                sq_a = np.zeros(len(ids_a))
                sq_b = np.zeros(len(ids_b))
                for d in range(dim):
                    sq_a += mat_a[:, d] * mat_a[:, d]
                    sq_b += mat_b[:, d] * mat_b[:, d]
                cos = _round6_half_up(
                    dots / (np.sqrt(sq_a)[:, None] * np.sqrt(sq_b)[None, :])
                )
                ii, jj = np.nonzero(cos >= threshold)
                ids_a_out.append(ids_a[ii])
                ids_b_out.append(ids_b[jj])
                cos_out.append(cos[ii, jj])
            empty_i = np.array([], dtype=np.int64)
            yield pd.DataFrame(
                {
                    "id_a": np.concatenate(ids_a_out or [empty_i]),
                    "id_b": np.concatenate(ids_b_out or [empty_i]),
                    "cosine": np.concatenate(cos_out or [np.array([])]),
                }
            )

    return _block_cross


def semantic_dedup(
    emb: DataFrame,
    assignments: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    target_block_rows: int = 4096,
    broadcast_drops: bool = True,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication that restricts pair scoring to k-means CLUSTERS of the
    embedding space — the trick that makes embedding-level dedup feasible
    at corpus scale, because candidate generation is an EQUI-JOIN on the
    cluster id instead of all-pairs (cross-cluster near-dups are missed
    by hard assignment; the clustering is the recall/cost dial, and
    ``candidates`` below is the recall repair).

    Inputs: the embeddings and a (vec_id, cluster) assignment frame
    (``kmeans.kmeans_assign`` — caller controls init/rounds). Within each
    cluster the blocked-GEMM cosine kernel scores pairs (same kernel as
    ``embedding_near_dups``); the keep policy is deterministic
    keep-lowest-id: a vector is dropped iff SOME smaller-id vector shares
    one of its candidate clusters within ``threshold`` (conservative on
    chains — never keeps two near-identical vectors). Returns one verdict
    row per vector: (vec_id, cluster, is_kept 0/1).

    ``candidates`` (default = ``assignments``) is the candidate-POOL
    assignment and may hold several rows per vector — pass
    ``kmeans.kmeans_assign_soft`` output to score boundary vectors in
    their runner-up cluster too, catching cross-cluster near-dup pairs
    the hard assignment provably misses. Verdict rows always come from
    ``assignments`` (one per vector, its primary cluster). A pair sharing
    two candidate clusters is scored twice with bit-identical cosine
    (same vectors, same GEMM); the drop set is distinct, so verdicts
    don't care.

    Scale: one hash join to attach clusters, one (cluster, blk) collect
    shuffle, block pairs via the cluster equi-join, one drop-set anti
    join. Per-cluster block counts are DERIVED from a cheap size count —
    ``ceil(cluster_size / target_block_rows)`` — so a skewed cluster
    splits into bounded collect_list blocks instead of putting a
    near-corpus-sized array in one task (size ``target_block_rows`` so
    two blocks of vectors fit in executor memory; same bounding as
    ``embedding_near_dups_lsh``'s per-bucket GEMM). The drop-set join is
    dual-mode like ``curation.decontaminate_against_store``:
    ``broadcast_drops=True`` (default) ships the drop ids to every
    executor; ``=False`` is the high-duplication fallback (merge-hinted
    sort-merge join) for when the drop set is a large fraction of the
    corpus and a forced broadcast would OOM the driver."""
    pool = candidates if candidates is not None else assignments
    sizes = pool.groupBy("cluster").agg(F.count(F.lit(1)).alias("__csz"))
    joined = (
        pool.join(emb.select(F.col("vec_id"), F.col(vec_col).alias("v")), "vec_id")
        .join(F.broadcast(sizes), "cluster")
        .select(
            "vec_id",
            "cluster",
            "v",
            F.pmod(
                F.col("vec_id"),
                F.ceil(F.col("__csz") / F.lit(target_block_rows)),
            ).cast("int").alias("blk"),
        )
    )
    grouped = joined.groupBy("cluster", "blk").agg(
        F.collect_list(F.struct("vec_id", "v")).alias("rows")
    )
    a = grouped.select(
        "cluster", F.col("blk").alias("blk_a"), F.col("rows").alias("rows_a")
    )
    b = grouped.select(
        "cluster", F.col("blk").alias("blk_b"), F.col("rows").alias("rows_b")
    )
    block_pairs = a.join(b, "cluster").where(F.col("blk_a") <= F.col("blk_b"))
    pairs = block_pairs.mapInPandas(
        _blocked_cosine_kernel(threshold), "id_a long, id_b long, cosine double"
    )
    # the drop set (id_b side only = keep-lowest-id) is a distinct
    # projection; broadcast under the default, merge-hinted past it
    dropped = pairs.select(F.col("id_b").alias("vec_id")).distinct()
    drop_frame = dropped.withColumn("__d", F.lit(1))
    drop_frame = (
        F.broadcast(drop_frame) if broadcast_drops else drop_frame.hint("merge")
    )
    return (
        assignments.join(drop_frame, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.when(F.col("__d").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("is_kept"),
        )
    )


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact all-pairs form).

    Blocked pairwise-similarity: vectors are grouped into ``n_blocks``
    row-blocks (by vec_id mod), every block pair (upper triangle) becomes
    one task, and each task computes its cosine sub-matrix in numpy —
    O(n^2/P) work with n/n_blocks vectors of state per task, no per-pair
    interpreted array folds. Size n_blocks so two blocks of vectors fit in
    executor memory. This exact form is the small-data correctness oracle;
    the 100 TB path is ``embedding_near_dups_lsh`` (sign-LSH buckets, then
    this kernel per bucket)."""
    grouped = (
        emb.select(
            "vec_id",
            F.col(vec_col).alias("v"),
            F.pmod(F.col("vec_id"), F.lit(n_blocks)).cast("int").alias("blk"),
        )
        .groupBy("blk")
        .agg(F.collect_list(F.struct("vec_id", "v")).alias("rows"))
    )
    a = grouped.select(F.col("blk").alias("blk_a"), F.col("rows").alias("rows_a"))
    b = grouped.select(F.col("blk").alias("blk_b"), F.col("rows").alias("rows_b"))
    block_pairs = a.join(b, F.col("blk_a") <= F.col("blk_b"), "inner")
    return block_pairs.mapInPandas(
        _blocked_cosine_kernel(threshold), "id_a long, id_b long, cosine double"
    )


def embedding_near_dups_lsh(
    emb: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 42,
    n_blocks: int = 2,
    n_seeds: int = 3,
) -> DataFrame:
    """Sign-LSH bucketed embedding near-dups — the 100 TB composition.

    Pipeline: map-only sign-LSH bucket assignment (deterministic
    md5-derived hyperplanes, reproducible in the DuckDB oracle) ->
    per-(bucket, block) collect -> block pairs via an EQUI-JOIN on the
    bucket id -> blocked-GEMM cosine kernel per block pair. Only pairs
    sharing a bucket are ever scored, so work is O(sum_b n_b^2 / P)
    instead of the all-pairs form's O(n^2 / P), and the join the planner
    sees is a hash join on ``bucket`` — never a block cross join.

    Single-table recall is the sign-LSH collision probability
    (1 - theta/pi)^n_planes per pair — only ~0.65 at cosine 0.95 with 4
    planes. ``n_seeds`` independent hyperplane sets are therefore UNIONED:
    each vector gets one bucket per seed (seed-tagged so buckets never
    collide across seeds), candidate pairs from any seed are scored, and
    the pair set deduplicates at the end. Union recall is
    1 - (1 - p)^n_seeds (~0.96 at cosine 0.95 with the default 3 seeds —
    measured against the exact kernel in tests/test_ann_recall.py), and
    cost scales x n_seeds, never toward O(n^2).
    ``embedding_near_dups`` stays the exact oracle for verifying recall."""
    bucket_exprs = [
        (
            F.lit(si * (1 << n_planes))
            + hyperplane_sign_bits(
                F.col(vec_col), random_hyperplanes(n_planes, dim, seed + si)
            )
        ).cast("int")
        for si in range(n_seeds)
    ]
    bucketed = emb.select(
        "vec_id",
        F.col(vec_col).alias("v"),
        F.explode(F.array(*bucket_exprs)).alias("bucket"),
        F.pmod(F.col("vec_id"), F.lit(n_blocks)).cast("int").alias("blk"),
    )
    grouped = bucketed.groupBy("bucket", "blk").agg(
        F.collect_list(F.struct("vec_id", "v")).alias("rows")
    )
    a = grouped.select(
        "bucket", F.col("blk").alias("blk_a"), F.col("rows").alias("rows_a")
    )
    b = grouped.select(
        "bucket", F.col("blk").alias("blk_b"), F.col("rows").alias("rows_b")
    )
    block_pairs = a.join(b, "bucket").where(F.col("blk_a") <= F.col("blk_b"))
    scored = block_pairs.mapInPandas(
        _blocked_cosine_kernel(threshold), "id_a long, id_b long, cosine double"
    )
    # a pair colliding under several seeds is scored several times with
    # bit-identical cosine (same vectors, same GEMM) — distinct is exact
    return scored.distinct()
