"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling") on
Spark: pick the raw-corpus documents whose hashed n-gram feature
distribution looks most like a TARGET corpus, by scoring every document
under a target-vs-raw bag-of-features likelihood ratio.

The published recipe: hash features into B buckets, fit two bag-of-words
models (target and raw) over the buckets with add-one smoothing, weight
each document by sum over feature occurrences of
``log p_target(b) - log p_raw(b)``, then resample by weight. Here the
log-ratio is replaced by the repo's exact fixed-point LINEAR surrogate
(the ``unigram.py`` / ``classifier.py`` precedent — replace the
transcendental with exact bigint arithmetic so any engine replays the
score bit-for-bit):

  * per-bucket evidence  s[b] = W_t[b] - W_r[b]  with
    W[b] = floor(S * (c[b] + 1) / (total + B) + 1/2)
    computed as ``(2*S*(c+1) + (total+B)) // (2*(total+B))`` — the
    fixed-point add-one probability under each model; the difference is
    the linear surrogate for the per-feature log ratio (log x ~ x - 1
    near 1; the argsort it induces per bucket is what selection needs);
  * per-doc importance   dsir_score = sum of s[bucket(tok)] over the
    doc's token occurrences (exact bigint, order-free);
  * selection is the DETERMINISTIC top-k variant of DSIR: the k docs
    winning the total order (dsir_score desc, doc_id asc). (Gumbel-top-k
    resampling needs log(uniform) draws — a transcendental per doc —
    so the exact-replay contract pins the top-k variant; the sampled
    variant is one hash-Gumbel column away if approximate replay is
    ever acceptable.)

Scale shape (100 TB posture): ONE corpus scan fits both models — a
per-bucket dual aggregation (raw count + conditional target count)
reduces the corpus to at most B rows (B is a literal, default 256) —
the collect is the codebook pattern, bounded by B, never corpus-sized. The
evidence table ships back as a one-row broadcast map (the ``unigram``
vocabulary transport); scoring is then map-only per token occurrence +
ONE per-doc shuffle. Top-k selection is orderBy+limit — Spark executes
TakeOrderedAndProject (per-partition heads + a k-row driver merge,
never a global sort) — and the flag joins back as a broadcast semi-join
on doc_id. No step holds more than O(B + k) driver-side state.

Reference surface: extension beyond the credit-mart reference (its
pipeline has no data-selection stage); the feature hashing reuses
``md5_long`` (functions/similarity.py) so the oracle replays the
bucketing with DuckDB's md5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.functions.parallelism import local_rows

from credit_abs_oltp_to_mart_spark.functions.similarity import md5_long
from credit_abs_oltp_to_mart_spark.functions.text import ws_tokens

DSIR_BUCKETS = 256
DSIR_SCALE = 10**6


def _wround(num: int, den: int, scale: int = DSIR_SCALE) -> int:
    """floor(scale * num / den + 1/2) in exact bigint arithmetic —
    identical to the oracle's ``(2*scale*num + den) // (2*den)``."""
    return (2 * scale * num + den) // (2 * den)


def hashed_feature_counts(
    docs: DataFrame,
    *,
    buckets: int = DSIR_BUCKETS,
    text_col: str = "text",
) -> DataFrame:
    """(bucket, cnt) over hashed whitespace-token unigram occurrences —
    one corpus scan reduced to at most ``buckets`` rows (partial
    aggregation combines map-side, so the shuffle is O(buckets *
    partitions) however large the corpus)."""
    return (
        docs.select(F.explode(ws_tokens(F.col(text_col))).alias("tok"))
        .select(F.pmod(md5_long(F.col("tok")), F.lit(buckets)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_evidence(
    target_counts: dict[int, int],
    raw_counts: dict[int, int],
    *,
    buckets: int = DSIR_BUCKETS,
    scale: int = DSIR_SCALE,
) -> dict[int, int]:
    """Per-bucket evidence s[b] = W_target[b] - W_raw[b] for EVERY bucket
    0..B-1 (zero-count buckets carry the smoothing mass). Pure bigint
    driver math over the two B-row codebooks."""
    t_tot = sum(target_counts.values()) + buckets
    r_tot = sum(raw_counts.values()) + buckets
    return {
        b: _wround(target_counts.get(b, 0) + 1, t_tot, scale)
        - _wround(raw_counts.get(b, 0) + 1, r_tot, scale)
        for b in range(buckets)
    }


def dsir_score_all(
    docs: DataFrame,
    ev_frame: DataFrame,
    *,
    buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The PRE-CHECKPOINT scoring plan of ``dsir_select``: token
    explode -> bucket hash -> one-row broadcast evidence lookup ->
    per-doc aggregation -> left join back onto all docs. Exposed
    separately so tests can gate the scoring stages' plan shape (the
    token stream must never exchange on the token/bucket key) — inside
    ``dsir_select`` the localCheckpoint truncates these stages out of
    any downstream explain output."""
    toks = docs.select(
        id_col, F.explode(ws_tokens(F.col(text_col))).alias("tok")
    ).select(
        id_col,
        F.pmod(md5_long(F.col("tok")), F.lit(buckets))
        .cast("int")
        .alias("bucket"),
    )
    scored_docs = (
        toks.join(F.broadcast(ev_frame))
        .select(id_col, F.col("__ev")[F.col("bucket")].alias("s"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("s").alias("dsir_score"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored_docs, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_feats", F.lit(0)).cast("int").alias("n_feats"),
            F.coalesce("dsir_score", F.lit(0))
            .cast("bigint")
            .alias("dsir_score"),
        )
    )


GUMBEL_RESOLUTION = 256


def gumbel_noise_table(
    resolution: int = GUMBEL_RESOLUTION, scale: int = DSIR_SCALE
) -> list[int]:
    """Fixed-point midpoint-quantile discretization of the Gumbel(0,1)
    quantile function: entry j = round(-ln(-ln((j + 0.5)/R)) * S).
    Computed ONCE driver-side in Python floats and shipped as integer
    literals (the codebook-as-literals transport), so both the Spark
    plan and the SQL oracle consume the SAME integers — the sampled
    variant stays engine-replayable by rule even though the Gumbel
    quantile is transcendental. Midpoint quantiles make the
    discretized noise mean/scale match Gumbel(0,1) to O(1/R); R = 256
    matches the evidence-bucket resolution."""
    import math

    return [
        int(round(-math.log(-math.log((j + 0.5) / resolution)) * scale))
        for j in range(resolution)
    ]


def dsir_select(
    docs: DataFrame,
    target_filter,
    k: int,
    *,
    buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
    gumbel_k: int | None = None,
    gumbel_seed: str = "dsir",
    gumbel_resolution: int = GUMBEL_RESOLUTION,
) -> DataFrame:
    """Score every doc and flag the top-k: returns
    (doc_id, n_feats, dsir_score, is_selected) for ALL docs.

    ``target_filter`` is a Column predicate defining the target corpus
    (e.g. ``F.col("lang") == "en"``); the raw model is fit on the whole
    input. Docs with no tokens score 0 and compete in the same total
    order (score desc, doc_id asc).

    ``gumbel_k`` additionally emits the SAMPLED variant of DSIR (the
    paper's importance RESAMPLING, made replayable): Gumbel-top-k over
    the importance weights — key = dsir_score + G where G is the
    hash-Gumbel perturbation ``gumbel_noise_table()[md5(seed:doc_id)
    mod R]`` (dsir_score already IS the fixed-point log-weight, so
    adding fixed-point Gumbel noise and taking the top-k is exactly
    the Gumbel-max trick over exp(score/S), discretized to R quantile
    levels). Adds columns ``gumbel_key`` (bigint) and ``is_sampled``
    (the k winners by key desc, doc_id asc). Deterministic in
    (seed, doc_id) — replays bit-for-bit, no RNG state. The scoring
    pass is shared: the same checkpointed frame feeds both flags and
    the extra cost is one more TakeOrdered + broadcast join."""
    spark = docs.sparkSession
    # ONE corpus scan fits both models: per-bucket raw count + the
    # target slice as a conditional count (a second scan would double
    # the dominant cost at corpus scale for no information gain)
    dual = (
        docs.select(
            target_filter.alias("__t"),
            F.explode(ws_tokens(F.col(text_col))).alias("tok"),
        )
        .select(
            F.pmod(md5_long(F.col("tok")), F.lit(buckets)).alias("bucket"),
            "__t",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("r_cnt"),
            F.count(F.when(F.col("__t"), 1)).alias("t_cnt"),
        )
        .collect()
    )
    t_counts = {r["bucket"]: r["t_cnt"] for r in dual if r["t_cnt"]}
    r_counts = {r["bucket"]: r["r_cnt"] for r in dual}
    ev = dsir_evidence(t_counts, r_counts, buckets=buckets)
    # one-row broadcast map — the codebook transport (unigram._vmap_frame)
    ev_frame = local_rows(spark, 
        [({int(b): int(s) for b, s in ev.items()},)],
        "__ev map<int,bigint>",
    )
    # one scoring pass: the frame feeds BOTH the top-k and the output
    # join, and without truncation Spark re-derives the whole token
    # explode + aggregation for each consumer (measured: 2x the plan's
    # exchanges). localCheckpoint is output-sized (one row per doc).
    # The pre-checkpoint plan is built by dsir_score_all so the plan
    # gate can inspect the scoring stages the truncation hides.
    allscore = dsir_score_all(
        docs, ev_frame, buckets=buckets, id_col=id_col, text_col=text_col
    ).localCheckpoint(eager=True)
    topk = allscore.orderBy(
        F.col("dsir_score").desc(), F.col(id_col).asc()
    ).limit(int(k)).select(F.col(id_col).alias("__sel"))
    out = allscore.join(
        F.broadcast(topk),
        F.col(id_col) == F.col("__sel"),
        "left",
    ).select(
        id_col,
        "n_feats",
        "dsir_score",
        F.col("__sel").isNotNull().cast("int").alias("is_selected"),
    )
    if gumbel_k is None:
        return out
    gt = gumbel_noise_table(gumbel_resolution)
    noise = F.element_at(
        F.array(*[F.lit(int(g)).cast("bigint") for g in gt]),
        F.pmod(
            md5_long(
                F.concat(
                    F.lit(f"{gumbel_seed}:"), F.col(id_col).cast("string")
                )
            ),
            F.lit(gumbel_resolution),
        ).cast("int")
        + F.lit(1),
    )
    keyed = out.withColumn(
        "gumbel_key", (F.col("dsir_score") + noise).cast("bigint")
    )
    sampk = (
        keyed.orderBy(F.col("gumbel_key").desc(), F.col(id_col).asc())
        .limit(int(gumbel_k))
        .select(F.col(id_col).alias("__smp"))
    )
    return keyed.join(
        F.broadcast(sampk), F.col(id_col) == F.col("__smp"), "left"
    ).select(
        id_col,
        "n_feats",
        "dsir_score",
        "is_selected",
        "gumbel_key",
        F.col("__smp").isNotNull().cast("int").alias("is_sampled"),
    )
