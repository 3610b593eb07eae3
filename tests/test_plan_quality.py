"""Physical-plan quality gates: the scale claims (pushdown, broadcast,
bounded shuffles, no stray cartesian products) asserted as tests so a
refactor can't silently regress the plan shape."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = entry_mod.queries()[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_scan_pushes_predicates_and_prunes(spark):
    p = _plan(spark, "filter_scan")
    assert "PushedFilters: [" in p and "PushedFilters: []" not in p
    # projection pruning: only the 3 selected + 2 filter columns are read
    read = p.split("ReadSchema:")[1].splitlines()[0]
    for col in ("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate", "l_discount"):
        assert col in read
    assert "l_extendedprice" not in read and "l_comment" not in read


@pytest.mark.parametrize("name", ["join_dim_agg", "region_revenue"])
def test_dim_joins_broadcast(spark, name):
    p = _plan(spark, name)
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_vintage_mob_copartitioned_join(spark):
    # first_seen is per-customer (fact-key cardinality) so it is NOT
    # F.broadcast()-forced; at test scale AQE may still size-broadcast it,
    # at 100 TB it degrades gracefully to a custkey-co-partitioned join.
    # Either way: no cartesian, and at most 3 hash exchanges (custkey
    # scan-side, custkey agg-side, final cohort/mob agg).
    p = _plan(spark, "vintage_mob")
    assert "CartesianProduct" not in p
    n = p.count("Exchange hashpartitioning")
    assert n <= 3, f"vintage_mob plan has {n} hash exchanges"


def test_roll_rate_single_window_shuffle(spark):
    # user_id pre-partitioning: both windows share one exchange; plus the
    # final aggregation exchange -> at most 2 (AQE may list reused ones)
    p = _plan(spark, "roll_rate")
    n_exchanges = p.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, f"roll_rate plan has {n_exchanges} hash exchanges"


@pytest.mark.slow
def test_no_cartesian_products_anywhere(spark):
    # block-pair cross joins (embedding near-dup) and the 1-row threshold
    # broadcast are BroadcastNestedLoopJoin by design; true CartesianProduct
    # (shuffled all-pairs) must never appear
    for name in entry_mod.queries():
        if name.startswith("stream_"):
            continue  # streaming plans materialize through their own runner
        p = _plan(spark, name)
        assert "CartesianProduct" not in p, f"{name} plan degraded to CartesianProduct"


@pytest.mark.parametrize(
    "name", ["split_assign", "stratified_sample", "doc_chunks", "pii_scan"]
)
def test_map_only_curation_ops_never_shuffle(spark, name):
    # these ops are pure per-row functions of the input: any Exchange in the
    # plan means someone added an accidental aggregation/join
    p = _plan(spark, name)
    assert "Exchange" not in p, f"{name} claims map-only but shuffles:\n{p}"


def test_decontaminate_broadcasts_the_eval_gram_set(spark):
    # the train side must never shuffle on the gram key: both gram joins are
    # broadcast semi-joins, and the only hash exchanges are the distinct /
    # per-doc aggregations
    p = _plan(spark, "decontaminate")
    assert "BroadcastHashJoin" in p and "LeftSemi" in p
    assert "SortMergeJoin" not in p


def test_tfidf_broadcasts_corpus_count_only(spark):
    # N (1 row) joins via broadcast nested loop; the term-df join stays a
    # shuffle join ON PURPOSE (vocabulary is unbounded at 100 TB) — but it
    # must not degrade to a cartesian product
    p = _plan(spark, "tfidf_topk")
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_embedding_lsh_dedup_joins_on_bucket(spark):
    # the 100 TB composition: block pairs must come from a HASH equi-join
    # on the sign-LSH bucket id — if the bucket key drops out, the plan
    # degrades to the all-pairs block cross join (BroadcastNestedLoopJoin
    # over blk_a <= blk_b), which is the small-data oracle, not this path
    p = _plan(spark, "dedup_embedding_lsh")
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
    assert "bucket" in p
    # the exact all-pairs form, by contrast, IS the block cross join
    p_all = _plan(spark, "dedup_embedding")
    assert "BroadcastNestedLoopJoin" in p_all


def test_incremental_dedup_broadcasts_new_batch(spark):
    # incremental path: the small new-batch signatures must be the BROADCAST
    # side of the band join so the corpus store is scanned once and never
    # shuffled — a SortMergeJoin here means the store pays a full shuffle
    # per ingest batch, which defeats the point of a persisted store
    p = _plan(spark, "dedup_incremental")
    assert "BroadcastHashJoin" in p and "band_key" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_codegen_present_in_hot_aggregations(spark):
    for name in ("pricing_summary", "bucket_case"):
        df = entry_mod.queries()[name](spark, SF_DIR)
        df.collect()  # finalize the adaptive plan
        p = df._jdf.queryExecution().executedPlan().toString()
        # codegen stages print as "*(n) Operator" in the compact plan form
        assert "*(" in p, f"{name} lost whole-stage codegen"


def test_cdc_upsert_target_side_broadcast_anti(spark):
    # the snapshot side must reach the anti join by broadcast probe, not a
    # sort-merge shuffle of the full target
    p = _plan(spark, "cdc_upsert")
    assert "BroadcastHashJoin" in p and "LeftAnti" in p, p
    assert "SortMergeJoin LeftAnti" not in p, p


def test_interval_join_is_equi_hash_join(spark):
    # the time-bucket replication must surface as an equi hash join on the
    # bucket key — a nested-loop range join here means bucketing regressed
    p = _plan(spark, "interval_join_agg")
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p


def test_fuzzy_match_blocks_via_equi_join(spark):
    p = _plan(spark, "fuzzy_name_match")
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p


@pytest.mark.parametrize("name", ["unpivot_measures", "array_hof"])
def test_map_only_layout_ops_never_shuffle(spark, name):
    # unpivot (Expand) and higher-order array functions are per-row: any
    # Exchange means an accidental aggregation crept in
    p = _plan(spark, name)
    assert "Exchange" not in p, f"{name} claims map-only but shuffles:\n{p}"


def test_window_frames_share_one_sort_shuffle(spark):
    # every frame variant shares (priority, date, key) ordering: one
    # exchange, one sort, all functions in the same Window stage
    p = _plan(spark, "window_frames")
    assert p.count("Exchange hashpartitioning") <= 1, p
    assert p.count("Window") <= 2, p  # WindowExec (+WindowGroupLimit never)


def test_grouping_sets_single_shuffle(spark):
    # Expand feeds one hash aggregate: partials per grouping set before the
    # single exchange, same as rollup/cube
    p = _plan(spark, "grouping_sets_revenue")
    assert "Expand" in p
    assert p.count("Exchange hashpartitioning") <= 1, p


def test_bitmap_distinct_two_bounded_shuffles(spark):
    # exchange 1 carries (group, bucket, bitmap) — bounded by buckets, not
    # distinct keys; exchange 2 carries one popcount row per bucket
    p = _plan(spark, "bitmap_distinct")
    assert p.count("Exchange hashpartitioning") <= 2, p
    assert "bitmap_construct_agg" in p


def test_nullsafe_join_stays_hash_join(spark):
    # <=> is an equi predicate: must plan as hash join, not nested loop
    p = _plan(spark, "nullsafe_join")
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p


def test_dynamic_partition_pruning_on_partitioned_mart(spark, marts, tmp_path):
    # monthly marts are written partitioned by month so a dim-filtered join
    # prunes partitions at runtime (DPP): the fact scan must carry a
    # dynamicpruning subquery on the partition key, not read every month
    from pyspark.sql import functions as F

    from credit_abs_oltp_to_mart_spark.sources.writers import write_mart

    out = str(tmp_path / "dpp_marts")
    write_mart(marts["fct_npl_monthly"], out, "fct_npl_monthly")
    fact = spark.read.parquet(f"{out}/fct_npl_monthly.parquet")
    # a month-dimension with a SELECTIVE predicate (DPP requires a filter
    # on the build side — a bare limit/distinct doesn't qualify) and the
    # same key type as the hive-partition column
    months = fact.select("month").distinct()
    dim_path = str(tmp_path / "dpp_dim.parquet")
    months.withColumn(
        "tag", F.when(F.year("month") % 4 == 0, "keep").otherwise("drop")
    ).write.parquet(dim_path)
    dim = spark.read.parquet(dim_path).where(F.col("tag") == "keep")
    joined = fact.join(dim, "month").groupBy("tag").agg(
        F.sum("total_exposure").alias("exposure")
    )
    p = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in p.lower(), p


def test_funnel_single_user_shuffle(spark):
    # all three stage-min windows share the user_id partition: one
    # exchange feeds them; the final global agg adds at most single-
    # partition exchanges, never another hash repartition of the events
    p = _plan(spark, "funnel_stages")
    assert p.count("Exchange hashpartitioning") <= 2, p


def test_ewma_one_shuffle_arrow_batched(spark):
    # partition-level Arrow kernel (MapInPandas after one key shuffle +
    # in-partition sort): every key in a partition smooths in one pandas
    # call — never per-group dispatch or row-at-a-time python UDFs
    p = _plan(spark, "ewma")
    assert "MapInPandas" in p, p
    assert p.count("Exchange hashpartitioning") <= 1, p
    assert "Sort" in p, p


def test_value_histogram_partial_aggregates(spark):
    # binning is map-side; the shuffle carries (type, bin) partials only
    p = _plan(spark, "value_histogram")
    assert p.count("Exchange hashpartitioning") <= 1, p
    assert "partial" in p.lower(), p


def test_weighted_sample_topk_not_global_sort(spark):
    # orderBy().limit(k) must compile to TakeOrdered (per-partition heads,
    # driver merge of k rows) — a rangepartitioning Exchange means someone
    # materialized a global sort for a 100-row result
    p = _plan(spark, "weighted_sample")
    assert "TakeOrderedAndProject" in p, p
    assert "rangepartitioning" not in p, p


def test_rolling_distinct_slots_bounded_shuffles(spark):
    # slot replication is map-side; shuffles: user-day dedup, the day spine
    # dedup (broadcast-joined back), and the per-slot distinct count
    p = _plan(spark, "rolling_distinct_users")
    assert "BroadcastHashJoin" in p and "LeftSemi" in p, p
    assert "CartesianProduct" not in p


def test_correlated_subqueries_decorrelate(spark):
    # Catalyst must rewrite both correlated scalars to aggregate+join —
    # a SubqueryExec per input row would be a different engine entirely
    for name in ("correlated_subquery", "exists_subquery"):
        p = _plan(spark, name)
        assert "Join" in p, p
        assert "CartesianProduct" not in p, p


def test_aqe_splits_skewed_join_partition(spark):
    # the skew posture is AQE, not manual salting, for joins: with one
    # dominant key, the final adaptive plan must mark the sort-merge join
    # skew-handled (partition split at runtime) instead of leaving one
    # straggler task. Thresholds are lowered to make 200k rows "skewed";
    # the mechanism is identical at 100 TB with production thresholds.
    from pyspark.sql import functions as F

    tuned = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        big = spark.range(200_000).select(
            F.lit(0).alias("k"), F.col("id").alias("v")
        ).unionAll(
            spark.range(5_000).select(
                (F.col("id") % 50 + 1).alias("k"), F.col("id").alias("v")
            )
        )
        right = spark.range(51).select(
            F.col("id").alias("k"), F.rand(1).alias("w")
        )
        j = big.join(right, "k").groupBy().agg(F.sum("v").alias("s"))
        j.collect()  # finalize adaptive plan
        p = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in p, p
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


@pytest.mark.parametrize("name", ["topk_per_group", "month_end_snapshot"])
def test_rank_filters_get_window_group_limit(spark, name):
    # rn=1 / rank<=k filters must trigger WindowGroupLimit: each map task
    # keeps only its per-group top-k BEFORE the window shuffle, so the
    # exchange carries k rows per (group, task) instead of every snapshot —
    # the reference's month-end pattern depends on this at 100 TB
    p = _plan(spark, name)
    assert "WindowGroupLimit" in p, p


def test_corpus_filter_stage_is_map_only(spark):
    # the quality/language/PII gate inlines every signal expression: any
    # Exchange here means a signal op was joined back in by doc_id
    from credit_abs_oltp_to_mart_spark.plans.corpus import filter_documents

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    p = (
        filter_documents(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # note: the stopword-ratio HOF lambdas run JVM-side but outside
    # whole-stage codegen (array filter() is interpreted-eval) — still a
    # single scan+filter pass, which is the claim that matters here
    assert "Exchange" not in p, "corpus filter stage gained a shuffle"


def test_minhash_signature_store_build_is_map_only(spark):
    # the 100 TB incremental-dedup story depends on the signature STORE
    # being writable in one pass over the corpus: gram-set extraction,
    # md5 hashing and the per-permutation minima are all per-row
    # higher-order-function work. Any Exchange means the build regressed
    # to the explode + groupBy form (a full gram-index shuffle per snapshot)
    from credit_abs_oltp_to_mart_spark.operators.dedup import (
        minhash_signatures,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    p = (
        minhash_signatures(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # ensure_parallelism's RoundRobin fan-out (scan-parallelism on
    # row-group-limited small files, no-op at scale) is allowed; a KEY
    # exchange is not
    assert "Exchange hashpartitioning" not in p, p
    assert "Exchange rangepartitioning" not in p, p


def test_corpus_exact_dedup_single_shuffle(spark):
    # keep-min-doc-per-content-key must stay the one-shuffle window form;
    # a second hashpartitioning Exchange means the groupBy+semi-join shape
    # (two corpus shuffles for the same result) crept back in
    from credit_abs_oltp_to_mart_spark.plans.corpus import dedup_documents

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # slice the plan before the (checkpointed) LSH stage contributes: the
    # exact stage is everything up to the first localCheckpoint scan
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), "[ ]+", " "))
    w = Window.partitionBy("__ck").orderBy("doc_id")
    exact = (
        docs.withColumn("__ck", F.md5(norm))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__ck", "__rn")
    )
    p = exact._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange hashpartitioning") == 1, p


def test_dup_spans_gram_build_is_map_only_and_bounded(spark):
    # positional k-grams must come straight off the token array (no window
    # over the token stream); the whole detector is a fixed number of
    # shuffles: gram count, duplicate semi-join, doc window + span agg —
    # a regression to the lead()-chain form would add a doc_id sort
    # shuffle before any aggregation
    p = _plan(spark, "dup_spans")
    assert "CartesianProduct" not in p
    n = p.count("Exchange hashpartitioning")
    assert n <= 5, f"dup_spans has {n} hash exchanges:\n{p}"


def test_decontaminate_store_broadcasts_store(spark):
    # default mode: the persisted gram store is the broadcast side; the
    # ingest batch must never shuffle on the gram key
    p = _plan(spark, "decontaminate_store")
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p


def test_cluster_sample_single_window_shuffle(spark):
    # after the (map-only) k-means assignment, the ranked pick is ONE
    # cluster-key window — no joins, no extra exchanges
    p = _plan(spark, "cluster_sample")
    assert "CartesianProduct" not in p and "Join" not in p
    n = p.count("Exchange hashpartitioning")
    assert n <= 1, f"cluster_sample has {n} hash exchanges:\n{p}"


def test_dup_spans_keep_first_same_shuffle_budget(spark):
    # the keep-first policy rides its argmin on the SAME gram-count
    # aggregation (one extra struct per distinct duplicated gram, an inner
    # join instead of a semi-join) — the shuffle budget must not grow
    # beyond the detector's, and nothing degrades to an all-pairs shape
    p = _plan(spark, "dup_spans_keep_first")
    assert "CartesianProduct" not in p
    n = p.count("Exchange hashpartitioning")
    assert n <= 6, f"dup_spans_keep_first has {n} hash exchanges:\n{p}"


def test_quantized_ivf_probes_broadcast(spark):
    # the composed train->quantize->probe->score stack must ship the
    # (tiny) probed-query side by broadcast — the member/code table is
    # the corpus-sized side and must never be the build side of a
    # nested-loop or all-pairs shape
    p = _plan(spark, "ann_quantized_ivf")
    assert "CartesianProduct" not in p
    assert "BroadcastExchange" in p, p


def test_ann_index_probe_prunes_partitions_never_scans_floats(spark):
    # the serve path's candidate side must read ONLY the persisted index:
    # the postings scan is dynamically pruned to the probed clusters, and
    # the only scans of the raw embeddings parquet are the query-vector
    # side with the vec_id IN filter pushed to the reader
    import re

    df = entry_mod.queries()["ann_index_serve"](spark, SF_DIR)
    p = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "dynamicpruningexpression" in p, p
    # every embeddings.parquet scan block carries the pushed IN filter
    # (the 5-row query side); none reads the table unfiltered
    blocks = re.split(r"\n\n", p)
    emb_blocks = [b for b in blocks if "embeddings.parquet" in b]
    assert emb_blocks, p
    for b in emb_blocks:
        assert re.search(r"PushedFilters: \[In\(vec_id", b), b


def test_image_phash_is_map_only(spark):
    """The perceptual-hash fingerprint is pure column expressions over one
    hex() of the blob — an Exchange means a join/agg crept into what must
    stay an embarrassingly-parallel scan at 100 TB."""
    from credit_abs_oltp_to_mart_spark.operators import multimodal

    media = multimodal.synthesize_blobs(
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
    )
    fp = multimodal.image_phash(media)
    p = fp._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, f"image_phash gained a shuffle:\n{p}"


def test_image_near_dups_single_band_shuffle(spark):
    """The band self-join is the only shuffle the algorithm needs; its two
    sides are identical subtrees, so the exchange must be planned once
    (ReusedExchange), plus one for the candidate distinct."""
    p = _plan(spark, "image_near_dups")
    assert "Exchange" in p  # the band join does shuffle
    assert p.count("Exchange hashpartitioning") <= 3, p


def test_semantic_dedup_joins_on_cluster(spark):
    # SemDeDup's whole point: block pairs come from an EQUI-join on the
    # k-means cluster id — a BroadcastNestedLoopJoin/CartesianProduct here
    # means candidate generation degraded to all-pairs
    p = _plan(spark, "semantic_dedup")
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
    assert "cluster" in p


def test_stream_ann_ingest_union_probe_never_scans_floats(spark, tmp_path):
    """The incremental-serving path keeps the persisted-index invariant:
    with postings_inc in the union, the candidate side still reads ONLY
    quantized postings (base + incremental); the raw embeddings parquet
    appears solely as the filtered query side. (The contract query
    returns a checkpointed frame, so the probe plan is rebuilt here.)
    The ingest batches themselves are map-only — gated by the parity
    checks in test_stream_ann_ingest."""
    import os
    import re
    import time as _time

    from pyspark.sql import functions as F

    from credit_abs_oltp_to_mart_spark.operators import ann
    from credit_abs_oltp_to_mart_spark.streaming import stream_ann_ingest

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    idx = str(tmp_path / "index")
    ann.build_ivf_index(
        emb.where(F.col("vec_id") % 4 != 3), idx,
        init_ids=[10, 20, 30, 40], iterations=2,
    )
    sdir = tmp_path / "slices" / "b0"
    emb.where(F.col("vec_id") % 4 == 3).coalesce(1).write.parquet(str(sdir))
    t = _time.time() - 60
    for f in os.listdir(sdir):
        if f.endswith(".parquet"):
            os.utime(os.path.join(sdir, f), (t, t))
    stream_ann_ingest(
        spark, f"{tmp_path}/slices/b*", idx,
        schema="vec_id bigint, embedding array<float>",
    )
    probe = ann.ivf_index_probe(
        emb.where(F.col("vec_id").isin([0, 1, 2])), idx,
        k=3, nprobe=1, include_incremental=True,
    )
    p = probe._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    blocks = re.split(r"\n\n", p)
    emb_blocks = [b for b in blocks if "embeddings.parquet" in b]
    assert emb_blocks, p  # the query side does scan embeddings...
    for b in emb_blocks:  # ...but only with the IN filter pushed down
        assert re.search(r"PushedFilters: \[In\(vec_id", b), b
    assert "postings_inc" in p  # the incremental tail is in the union


@pytest.mark.slow
def test_pq_index_probe_prunes_partitions_never_scans_floats(spark):
    """IVF-PQ serve path: the candidate side reads ONLY the persisted
    compressed postings (dynamic partition pruning restricts the scan to
    probed clusters; the postings schema holds just vec_id + the m code
    ids); the raw embeddings parquet appears solely as the filtered
    query-vector side with the vec_id IN filter pushed to the reader."""
    import re

    for qname in ("ann_pq", "ann_pq_residual"):
        df = entry_mod.queries()[qname](spark, SF_DIR)
        p = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "dynamicpruningexpression" in p, (qname, p)
        blocks = re.split(r"\n\n", p)
        emb_blocks = [b for b in blocks if "embeddings.parquet" in b]
        assert emb_blocks, (qname, p)
        for b in emb_blocks:
            assert re.search(r"PushedFilters: \[In\(vec_id", b), (qname, b)
        # the postings scan reads codes, never a float embedding column
        post_blocks = [b for b in blocks if "/postings" in b]
        assert post_blocks, (qname, p)
        for b in post_blocks:
            assert "pq_codes" in b and "embedding" not in b, (qname, b)


def test_video_near_dups_band_join_never_cartesian(spark):
    """Frame-pair candidates must come from the banded equi-join: a
    CartesianProduct / BroadcastNestedLoopJoin on the frame side means
    candidate generation degraded to all-pairs across frames."""
    p = _plan(spark, "video_near_dups")
    assert "CartesianProduct" not in p, p
    # the only BNLJ allowed would be a literal one-row side; the frame
    # fingerprint side must never appear under one
    assert "BroadcastNestedLoopJoin" not in p, p


def test_unigram_segment_corpus_never_shuffles_on_word(spark):
    """The scoring pass's corpus token stream joins the BROADCAST
    word-level segmentation results — the corpus side must reach its
    per-doc aggregation without a word-key exchange (one doc_id
    aggregation exchange + the one-row model broadcast only)."""
    from credit_abs_oltp_to_mart_spark.operators import unigram

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    _, weights = unigram.unigram_train(docs, rounds=1, vocab_size=40)
    out = unigram.unigram_segment_stats(docs, weights)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p, p
    # exactly ONE word-key exchange is inherent: the distinct-word table
    # build (word-table sized). The corpus token stream itself is the
    # broadcast-join PROBE side and must contribute none beyond it.
    word_exchanges = [
        ln for ln in p.splitlines()
        if "Exchange hashpartitioning(word" in ln
    ]
    assert len(word_exchanges) <= 1, p


def test_pq_refine_reads_shortlist_only_never_corpus(spark):
    """The refined PQ probe adds exactly one bounded stage: the refine
    tier scan must be DPP-pruned (cluster partitions) and joined against
    the BROADCAST shortlist — never a float-corpus scan. The refine scan
    reads SQ codes + reconstruction scalars, no embedding column; the
    raw embeddings parquet still appears only as the IN-filtered query
    side."""
    import re

    df = entry_mod.queries()["ann_pq_refine"](spark, SF_DIR)
    p = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "dynamicpruningexpression" in p, p
    blocks = re.split(r"\n\n", p)
    emb_blocks = [b for b in blocks if "embeddings.parquet" in b]
    assert emb_blocks, p
    for b in emb_blocks:
        assert re.search(r"PushedFilters: \[In\(vec_id", b), b
    ref_blocks = [b for b in blocks if "/refine" in b]
    assert ref_blocks, p
    for b in ref_blocks:
        assert "codes" in b and "embedding" not in b, b
    post_blocks = [
        b for b in blocks if "/postings" in b and "/refine" not in b
    ]
    assert post_blocks, p
    for b in post_blocks:
        assert "pq_codes" in b and "embedding" not in b, b


def test_dsir_select_broadcast_evidence_single_doc_shuffle(spark):
    """DSIR selection tail (post-checkpoint — the scoring stages are
    localCheckpoint-truncated out of this plan; they are gated
    separately below): selection is TakeOrdered (per-partition heads,
    no global sort) + a broadcast semi-side join, with hash exchanges
    only for the docs<->scores join."""
    p = _plan(spark, "dsir_select")
    assert "TakeOrderedAndProject" in p, p
    n = p.count("Exchange hashpartitioning")
    assert n <= 3, f"dsir_select plan has {n} hash exchanges"


def test_dsir_scoring_plan_no_token_shuffle(spark):
    """DSIR scoring stages (PRE-checkpoint, via dsir.dsir_score_all —
    dsir_select's localCheckpoint hides them from any downstream
    explain): the evidence map rides a one-row broadcast (BNLJ by
    design), the token stream NEVER exchanges on the token/bucket key,
    and the only hash exchanges are the per-doc aggregation and the
    docs<->scores join."""
    from credit_abs_oltp_to_mart_spark.operators import dsir

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ev_frame = spark.createDataFrame(
        [({b: 1 for b in range(dsir.DSIR_BUCKETS)},)], "__ev map<int,bigint>"
    )
    out = dsir.dsir_score_all(docs, ev_frame)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in p, p
    assert "hashpartitioning(tok" not in p, p
    assert "hashpartitioning(bucket" not in p, p
    assert "CartesianProduct" not in p, p
    n = p.count("Exchange hashpartitioning")
    assert n <= 3, f"dsir scoring plan has {n} hash exchanges"


def test_graph_bfs_checkpoints_truncate_lineage(spark):
    """The returned BFS plan must be the FINAL join only: the per-hop
    frontier lineage is localCheckpoint-truncated, so the plan re-scans
    the vertex parquet once and joins the checkpointed distance frame —
    no re-derivation of the hop chain, no cartesian."""
    p = _plan(spark, "graph_bfs")
    assert p.count("Scan parquet") <= 1, p
    assert "ExistingRDD" in p or "LocalTableScan" in p, p
    n = p.count("Exchange hashpartitioning")
    assert n <= 2, f"graph_bfs final plan has {n} hash exchanges"


def test_incremental_month_filter_pushes_to_parquet_scan(spark, oltp_dir):
    """The refresh path's month filter must reach the arrears parquet
    reader as plain date-range comparisons (row-group pruning at 100 TB)
    — trunc(col).isin(...) would silently scan every row group."""
    import datetime as dt

    from credit_abs_oltp_to_mart_spark.plans import incremental as inc
    from credit_abs_oltp_to_mart_spark.sources.readers import read_oltp_table

    df = read_oltp_table(spark, oltp_dir, "arrears_dpd_status").where(
        inc._month_filter("as_of_date", [dt.date(2025, 5, 15)])
    )
    p = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PushedFilters" in p, p
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    assert any(
        "GreaterThanOrEqual(as_of_date" in ln and "LessThan(as_of_date" in ln
        for ln in pushed
    ), p
