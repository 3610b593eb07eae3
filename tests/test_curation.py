"""Operator-level invariants for the corpus-curation module (the contract
test already gates each query bit-exactly vs DuckDB; these check the
semantic properties a pipeline relies on)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.operators import curation

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_split_is_total_and_deterministic(docs):
    assigned = curation.split_assign(docs)
    n_docs = docs.count()
    assert assigned.count() == n_docs  # every doc assigned exactly once
    counts = {r["split"]: r["count"] for r in assigned.groupBy("split").count().collect()}
    assert sum(counts.values()) == n_docs
    # hash buckets are uniform-ish: train should dominate, test/val minority
    assert counts.get("train", 0) > counts.get("val", 0)
    assert counts.get("train", 0) > counts.get("test", 0)
    # pure function of doc_id: a second evaluation is identical
    again = curation.split_assign(docs)
    assert assigned.exceptAll(again).count() == 0


def test_stratified_sample_is_subset_with_lower_en_rate(docs):
    sampled = curation.stratified_sample(docs)
    assert sampled.join(docs, "doc_id", "left_anti").count() == 0
    base = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    kept = {r["lang"]: r["count"] for r in sampled.groupBy("lang").count().collect()}
    # en is downsampled hardest (40%); rate ordering should show up even at
    # small n because buckets are uniform md5 hashes
    en_rate = kept.get("en", 0) / base["en"]
    assert en_rate < 0.65


def test_chunks_reassemble_to_normalized_text(docs):
    chunks = curation.chunk_documents(docs)
    glued = (
        chunks.groupBy("doc_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("chunk_idx", "chunk_text"))
                ).getField("chunk_text"),
                " ",
            ).alias("glued")
        )
    )
    orig = docs.select(
        "doc_id",
        F.array_join(
            F.split(F.trim(F.col("text")), "[ ]+"), " "
        ).alias("norm"),
    ).where(F.trim(F.col("text")) != "")
    bad = glued.join(orig, "doc_id").where(F.col("glued") != F.col("norm"))
    assert bad.count() == 0


def test_chunk_sizes(docs):
    chunks = curation.chunk_documents(docs).cache()
    assert chunks.where(F.col("n_tokens") > curation.CHUNK_TOKENS).count() == 0
    assert chunks.where(F.col("n_tokens") <= 0).count() == 0
    # every chunk except a doc's last is exactly CHUNK_TOKENS wide
    last = chunks.groupBy("doc_id").agg(F.max("chunk_idx").alias("last_idx"))
    non_last = chunks.join(last, "doc_id").where(
        F.col("chunk_idx") < F.col("last_idx")
    )
    assert non_last.where(F.col("n_tokens") != curation.CHUNK_TOKENS).count() == 0
    chunks.unpersist()


def test_decontaminate_covers_eval_only(docs):
    out = curation.decontaminate(docs).cache()
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits <= {"val", "test"}
    assert out.where(
        (F.col("contamination") < 0) | (F.col("contamination") > 1)
    ).count() == 0
    assert out.where(F.col("n_contaminated") > F.col("n_grams")).count() == 0
    # every val/test doc appears exactly once
    n_eval = curation.split_assign(docs).where(F.col("split") != "train").count()
    assert out.count() == n_eval
    out.unpersist()


def test_decontaminate_store_modes_agree_and_store_is_reusable(docs):
    """The persisted-blocklist path: both join-physics modes produce the
    identical verdicts, the fallback plan really is a sort-merge gram
    join, and a store written to parquet and read back (the incremental
    production flow) gives the same answer as the in-memory frame."""
    ev = docs.where(F.col("doc_id") % 5 == 0)
    batch = docs.where(F.col("doc_id") % 5 != 0)
    store = curation.build_eval_gram_store(ev)
    a = curation.decontaminate_against_store(batch, store, broadcast_store=True)
    b = curation.decontaminate_against_store(batch, store, broadcast_store=False)
    rows_a = sorted(tuple(r) for r in a.collect())
    rows_b = sorted(tuple(r) for r in b.collect())
    assert rows_a and rows_a == rows_b
    p = (
        curation.decontaminate_against_store(
            batch, store, broadcast_store=False
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin [gram" in p and "BroadcastExchange" not in p

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        store.write.parquet(f"{tmp}/gram_store")
        reread = docs.sparkSession.read.parquet(f"{tmp}/gram_store")
        c = curation.decontaminate_against_store(batch, reread)
        assert sorted(tuple(r) for r in c.collect()) == rows_a


def test_gram_store_compaction_dedups_and_preserves_verdicts(spark, docs, tmp_path):
    """compact_gram_store: an INCREMENTALLY-extended blocklist (one
    batch=<id> partition per added eval suite, grams repeating across
    suites) folds to one partition of DISTINCT grams via the same
    crash-safe hidden-dir protocol as the signature store — and the
    compacted store yields the exact verdicts of a from-scratch build."""
    import os

    from credit_abs_oltp_to_mart_spark.sources.maintenance import (
        compact_gram_store,
    )

    ev = docs.where(F.col("doc_id") % 5 == 0)
    batch = docs.where(F.col("doc_id") % 5 != 0)
    store_dir = str(tmp_path / "gram_store")
    # three overlapping eval suites land as three partitions (suites 1 and
    # 2 share their doc range, so grams repeat cross-partition)
    for i, cond in enumerate([
        F.col("doc_id") % 3 == 0,
        F.col("doc_id") % 3 != 0,
        F.col("doc_id") % 2 == 0,
    ]):
        curation.build_eval_gram_store(ev.where(cond)).write.parquet(
            os.path.join(store_dir, f"batch={i}")
        )
    raw = spark.read.parquet(store_dir)
    assert raw.count() > raw.select("gram").distinct().count()  # dups exist

    stats = compact_gram_store(spark, store_dir)
    assert stats["compacted"] and stats["partitions_merged"] == 3
    assert [d for d in os.listdir(store_dir) if d.startswith("batch=")] == ["batch=2"]
    compacted = spark.read.parquet(store_dir).drop("batch")
    # distinct grams, equal to the one-shot build over the union
    assert compacted.count() == compacted.select("gram").distinct().count()
    oneshot = curation.build_eval_gram_store(ev)
    assert compacted.select("gram").subtract(oneshot).count() == 0
    assert oneshot.subtract(compacted.select("gram")).count() == 0
    got = sorted(
        tuple(r)
        for r in curation.decontaminate_against_store(batch, compacted).collect()
    )
    want = sorted(
        tuple(r)
        for r in curation.decontaminate_against_store(batch, oneshot).collect()
    )
    assert got and got == want


def test_redact_pii_rewrites_only_pii_docs(spark):
    rows = [
        (1, "contact me at alice.b@example.com or https://ex.com/page now"),
        (2, "a perfectly clean sentence with no personal data at all"),
        (3, "card 1234567890 and backup 999999 plus 55555555"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["n_redactions"])
           for r in curation.redact_pii(df).collect()}
    assert got[1] == ("contact me at <EMAIL> or <URL> now", 2)
    assert got[2] == (rows[1][1], 0)  # byte-identical
    # 999999 is a 6+ digit run; 1234567890 and 55555555 too -> 3 redactions
    assert got[3] == ("card <NUM> and backup <NUM> plus <NUM>", 3)


def test_mixture_weights_upsample_small_domains(docs):
    out = {r["lang"]: r for r in curation.mixture_weights(docs).collect()}
    assert len(out) >= 2
    smallest = min(out.values(), key=lambda r: r["n_tokens"])
    largest = max(out.values(), key=lambda r: r["n_tokens"])
    # alpha = 0.5 tempers the distribution toward uniform
    assert smallest["sample_factor"] > 1.0 > largest["sample_factor"]
    assert abs(sum(r["natural_share"] for r in out.values()) - 1.0) < 1e-4
    assert abs(sum(r["target_share"] for r in out.values()) - 1.0) < 1e-4


def test_gram_store_compaction_heals_fully_swapped_crash(spark, docs, tmp_path):
    """Crash window where a previous compaction finished ALL its partition
    deletes but not the rename: the only copy of the blocklist lives in
    the complete hidden dir and zero batch= partitions remain. The next
    compact_gram_store call must heal (rename into place), not no-op on
    the empty listing."""
    import os
    import shutil

    from credit_abs_oltp_to_mart_spark.sources.maintenance import (
        compact_gram_store,
    )

    ev = docs.where(F.col("doc_id") % 5 == 0)
    store_dir = str(tmp_path / "gram_store_crash")
    curation.build_eval_gram_store(ev).write.parquet(
        os.path.join(store_dir, "batch=0")
    )
    want = {r["gram"] for r in spark.read.parquet(store_dir).select("gram").collect()}
    # stage the crash: complete hidden dir (with _SUCCESS), all partitions gone
    shutil.copytree(
        os.path.join(store_dir, "batch=0"), os.path.join(store_dir, ".compact-0")
    )
    shutil.rmtree(os.path.join(store_dir, "batch=0"))

    stats = compact_gram_store(spark, store_dir)
    assert [d for d in os.listdir(store_dir) if d.startswith("batch=")] == ["batch=0"]
    assert not any(d.startswith(".compact") for d in os.listdir(store_dir))
    got = {r["gram"] for r in spark.read.parquet(store_dir).select("gram").collect()}
    assert got == want
    assert stats["partitions_before"] == 1  # the healed partition is back


def test_tfidf_ranks_are_dense_topk(docs):
    out = curation.tfidf_topk(docs, k=5).cache()
    per_doc = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("rank").alias("lo"),
        F.max("rank").alias("hi"),
    )
    assert per_doc.where(F.col("n") > 5).count() == 0
    assert per_doc.where((F.col("lo") != 1) | (F.col("hi") != F.col("n"))).count() == 0
    out.unpersist()


def test_pack_chunks_is_gapless_concatenation(docs):
    from pyspark.sql import Window

    packed = curation.pack_chunks(docs).cache()
    w = Window.partitionBy("shard").orderBy("doc_id", "chunk_idx")
    gaps = (
        packed.withColumn(
            "expected",
            F.coalesce(
                F.lag(F.col("start_tok") + F.col("n_tokens")).over(w), F.lit(0)
            ),
        )
        .where(F.col("start_tok") != F.col("expected"))
        .count()
    )
    assert gaps == 0  # chunks tile each shard with no gaps or overlaps
    # same chunk inventory as chunk_documents, just routed and offset
    assert packed.count() == curation.chunk_documents(docs).count()
    # deterministic shard routing: all chunks of a doc share one shard
    assert (
        packed.groupBy("doc_id")
        .agg(F.countDistinct("shard").alias("s"))
        .where(F.col("s") != 1)
        .count()
        == 0
    )
    packed.unpersist()


def test_pii_scan_counts_injected_signals(spark):
    rows = [
        (1, "contact me at bob@example.com or visit https://example.com/x today"),
        (2, "card 1234567890 and backup 999999 plus a@b.c"),
        (3, "clean text with no signals at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in curation.pii_scan(df).collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_urls"] == 1
    assert out[1]["has_pii"] is True
    assert out[2]["n_digit_runs"] == 2 and out[2]["n_emails"] == 1
    assert out[3]["has_pii"] is False
    # redaction replaces, never grows unboundedly: doc 3 untouched
    assert out[3]["redacted_len"] == len(rows[2][1])


def test_mixture_apply_replicates_to_the_factor(spark):
    """A big domain thins toward its factor (< 1), a small one upsamples
    (> 1, so every doc gets >= 1 copy and some get 2); per-doc copies are
    always floor(factor) or floor(factor)+1; an all-empty domain (factor
    0) emits nothing."""
    import math

    rows = (
        [(i, "many " * 200, "big") for i in range(40)]
        + [(100 + i, "few words here", "small") for i in range(4)]
        + [(200, "", "empty"), (201, " ", "empty")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    w = curation.mixture_weights(docs)
    factors = {r["lang"]: r["sample_factor"] for r in w.collect()}
    assert factors["small"] > 1.0 and factors["big"] < 1.0
    assert factors["empty"] == 0.0
    got = curation.mixture_apply(docs, w).groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    per_doc = {r["doc_id"]: (r["lang"], r["n"]) for r in got.collect()}
    assert not any(lang == "empty" for lang, _ in per_doc.values())
    for doc_id, (lang, n) in per_doc.items():
        lo = math.floor(factors[lang])
        assert n in (lo, lo + 1), (doc_id, lang, n)
    # every small-domain doc has >= 1 copy (factor > 1 guarantees the floor)
    small_ids = {100, 101, 102, 103}
    assert small_ids <= set(per_doc)
    # expected total tracks the factor within the +-1-per-doc draw bound
    n_small = sum(n for _, (lang, n) in per_doc.items() if lang == "small")
    assert abs(n_small - factors["small"] * 4) <= 4


def test_pack_manifest_accounts_for_every_token(docs):
    """The manifest is a lossless roll-up: summed filled_tokens equal the
    packed chunks' total, every (shard, bin) of the pack appears exactly
    once, and doc ranges bracket their bins' members."""
    packed = curation.pack_chunks(docs)
    man = curation.pack_manifest(packed)
    tot_chunks = packed.count()
    got = man.agg(
        F.sum("n_chunks").alias("c"), F.sum("filled_tokens").alias("t")
    ).collect()[0]
    want_t = packed.agg(F.sum("n_tokens")).collect()[0][0]
    assert got["c"] == tot_chunks and got["t"] == want_t
    assert man.count() == packed.select("shard", "bin").distinct().count()
    bad = (
        packed.join(man, ["shard", "bin"])
        .where((F.col("doc_id") < F.col("first_doc"))
               | (F.col("doc_id") > F.col("last_doc")))
    )
    assert bad.count() == 0
