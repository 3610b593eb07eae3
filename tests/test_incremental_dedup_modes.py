"""The large-slice ingest paths: incremental_minhash_pairs' non-broadcast
(sort-merge on band_key) fallback, the pre-banded bucketed store layout,
and stream_dedup_ingest's batch-id-scoped crash-replay idempotency +
within-batch dedup contract."""

from __future__ import annotations

import os
import time as _time

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.operators.dedup import (
    _band_key_col,
    incremental_minhash_pairs,
    minhash_signatures,
)
from credit_abs_oltp_to_mart_spark.streaming import ops as streaming

SF_DIR = "/root/testdata/sf0.001"


def _corpus_and_batch(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1)
    return corpus, batch


def _rows(df):
    return {tuple(r) for r in df.collect()}


@pytest.mark.slow
def test_broadcast_and_merge_modes_agree(spark):
    """The physical knob must not change the answer: broadcast-batch and
    sort-merge-fallback modes produce the identical pair set."""
    corpus, batch = _corpus_and_batch(spark)
    store = minhash_signatures(corpus)
    a = incremental_minhash_pairs(batch, store, broadcast_batch=True)
    b = incremental_minhash_pairs(batch, store, broadcast_batch=False)
    ra, rb = _rows(a), _rows(b)
    assert ra and ra == rb


def test_merge_fallback_plan_has_no_batch_broadcast(spark):
    """broadcast_batch=False is the corpus-sized-slice path: the band join
    must be a SortMergeJoin (spillable) with NO BroadcastExchange — AQE or
    size estimates silently re-broadcasting would resurrect the memory
    cliff the flag exists to avoid."""
    corpus, batch = _corpus_and_batch(spark)
    store = minhash_signatures(corpus)
    p = (
        incremental_minhash_pairs(batch, store, broadcast_batch=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" in p and "band_key" in p
    assert "BroadcastExchange" not in p and "BroadcastHashJoin" not in p


def test_prebanded_bucketed_store_skips_store_side_exchange(spark, tmp_path):
    """A signature store written PRE-BANDED and bucketed by band_key feeds
    the merge-mode join without a store-side shuffle: only the new batch
    (and the candidate distinct) pay an Exchange. This is the shuffle-free
    store side for recurring large-slice ingests."""
    corpus, batch = _corpus_and_batch(spark)
    n_perm, bands = 8, 2
    banded_store = minhash_signatures(corpus, n_perm=n_perm).select(
        "doc_id",
        *[f"s{i}" for i in range(n_perm)],
        _band_key_col(n_perm, bands),
    )
    from credit_abs_oltp_to_mart_spark.sources.writers import write_bucketed

    write_bucketed(banded_store, "banded_sig_store", ["band_key"], n_buckets=8)
    try:
        store = spark.table("banded_sig_store")
        got = incremental_minhash_pairs(batch, store, broadcast_batch=False)
        # plan asserts BEFORE any action: post-execution AdaptiveSparkPlan
        # prints final + initial plans, double-counting exchanges
        p = got._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in p
        want = incremental_minhash_pairs(
            batch, minhash_signatures(corpus), broadcast_batch=True
        )
        assert _rows(got) == _rows(want)
        assert "SortMergeJoin" in p and "BroadcastExchange" not in p
        # exchanges: batch side into the join + the pair distinct. The
        # bucketed store side must contribute NONE.
        n = p.count("Exchange hashpartitioning")
        assert n <= 2, f"bucketed store side still shuffles:\n{p}"
    finally:
        spark.sql("drop table if exists banded_sig_store")


# ---------------------------------------------------------------------------
# streaming ingest: crash replay + within-batch dedup
# ---------------------------------------------------------------------------

TEXT_A = "alpha beta gamma delta epsilon zeta eta theta"
TEXT_B = "one two three four five six seven eight nine"
TEXT_C = "red orange yellow green blue indigo violet ultraviolet"


def _land(spark, src, schema, k, rows, t0):
    d = str(src / f"b{k}")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)
    for f in os.listdir(d):
        if f.endswith(".parquet"):
            t = t0 + 10 * k
            os.utime(os.path.join(d, f), (t, t))


@pytest.mark.slow
def test_stream_dedup_ingest_replay_is_idempotent(spark, tmp_path):
    """Crash between the sink writes and the checkpoint commit: deleting
    commits/0 forces the engine to REPLAY batch 0 on restart. The replay
    must (a) not self-match against its own half-committed signatures —
    the silent-data-loss mode where every batch-0 doc estimates 1.0
    against itself and the survivor set collapses to empty — and (b) not
    duplicate survivor rows (partition overwrite, not append)."""
    src = tmp_path / "replay_slices"
    out = str(tmp_path / "replay_out")
    schema = spark.createDataFrame([Row(doc_id=1, text=TEXT_A)]).schema
    t0 = _time.time() - 120

    _land(spark, src, schema, 0, [Row(doc_id=1, text=TEXT_A), Row(doc_id=2, text=TEXT_B)], t0)
    first = streaming.stream_dedup_ingest(
        spark, f"{src}/b*", out, schema=schema, min_est=0.25
    )
    assert _rows(first) == {(1, 0), (2, 0)}
    # simulate the crash window: both sinks written, commit log not (a
    # real crash never wrote either file — drop the hidden Hadoop-local
    # .crc too, or the replay's commit rename collides with it)
    commits = os.path.join(out, "checkpoint", "commits")
    os.remove(os.path.join(commits, "0"))
    crc = os.path.join(commits, ".0.crc")
    if os.path.exists(crc):
        os.remove(crc)
    _land(spark, src, schema, 1, [Row(doc_id=10, text=TEXT_A), Row(doc_id=11, text=TEXT_C)], t0)
    second = streaming.stream_dedup_ingest(
        spark, f"{src}/b*", out, schema=schema, min_est=0.25
    )
    # batch 0 replayed idempotently (same two rows, not zero, not four);
    # batch 1 then dedups against the replay-consistent store
    assert _rows(second) == {(1, 0), (2, 0), (11, 1)}


@pytest.mark.slow
def test_stream_dedup_ingest_within_batch_dedup(spark, tmp_path):
    """dedup_within_batch=True: a doc also drops when it matches any
    SMALLER-doc_id doc of its own batch — independent of the store check,
    and independent of whether that smaller doc itself survives."""
    src = tmp_path / "within_slices"
    out = str(tmp_path / "within_out")
    schema = spark.createDataFrame([Row(doc_id=1, text=TEXT_A)]).schema
    t0 = _time.time() - 120

    # batch 0 carries a within-batch dup (3 ~ 1); batch 1 carries a store
    # dup (10 ~ 1), a fresh doc (11), a within-batch dup of it (12), and
    # a doc (13) matching only the store-dropped 10 — still dropped,
    # because the within-batch drop set is order-free by contract
    _land(spark, src, schema, 0,
          [Row(doc_id=1, text=TEXT_A), Row(doc_id=2, text=TEXT_B),
           Row(doc_id=3, text=TEXT_A)], t0)
    _land(spark, src, schema, 1,
          [Row(doc_id=10, text=TEXT_A), Row(doc_id=11, text=TEXT_C),
           Row(doc_id=12, text=TEXT_C), Row(doc_id=13, text=TEXT_A)], t0)
    got = streaming.stream_dedup_ingest(
        spark, f"{src}/b*", out, schema=schema, min_est=0.25,
        dedup_within_batch=True,
    )
    assert _rows(got) == {(1, 0), (2, 0), (11, 1)}


@pytest.mark.slow
def test_signature_store_compaction_preserves_semantics(spark, tmp_path):
    """compact_signature_store folds all committed batch partitions into
    one, preserving (a) the survivor table exactly (ingest_batch is a
    real column, not just the partition key) and (b) dedup semantics for
    every LATER ingest batch against the compacted store."""
    from credit_abs_oltp_to_mart_spark.sources.maintenance import (
        compact_signature_store,
    )

    src = tmp_path / "cmp_slices"
    out = str(tmp_path / "cmp_out")
    store = os.path.join(out, "signature_store")
    schema = spark.createDataFrame([Row(doc_id=1, text=TEXT_A)]).schema
    t0 = _time.time() - 120
    _land(spark, src, schema, 0, [Row(doc_id=1, text=TEXT_A), Row(doc_id=2, text=TEXT_B)], t0)
    _land(spark, src, schema, 1, [Row(doc_id=10, text=TEXT_A), Row(doc_id=11, text=TEXT_C)], t0)
    before = _rows(
        streaming.stream_dedup_ingest(spark, f"{src}/b*", out, schema=schema, min_est=0.25)
    )
    assert before == {(1, 0), (2, 0), (11, 1)}

    stats = compact_signature_store(spark, out, target_files=1)
    assert stats["compacted"] and stats["partitions_merged"] == 2
    # one partition dir left; survivor projection identical
    parts = [d for d in os.listdir(store) if d.startswith("batch=")]
    assert parts == ["batch=1"]
    after = _rows(
        spark.read.parquet(store).select("doc_id", "ingest_batch")
    )
    assert after == before

    # a later slice still dedups against the compacted store, and the
    # combined output keeps the original batch labels
    _land(spark, src, schema, 2, [Row(doc_id=20, text=TEXT_C), Row(doc_id=21, text="totally fresh words nobody wrote down yet")], t0)
    got = _rows(
        streaming.stream_dedup_ingest(spark, f"{src}/b*", out, schema=schema, min_est=0.25)
    )
    assert got == {(1, 0), (2, 0), (11, 1), (21, 2)}

    # second compaction folds the new batch in too
    stats2 = compact_signature_store(spark, out, target_files=1)
    assert stats2["compacted"]
    assert [d for d in os.listdir(store) if d.startswith("batch=")] == ["batch=2"]
    assert _rows(spark.read.parquet(store).select("doc_id", "ingest_batch")) == got


@pytest.mark.slow
def test_signature_store_compaction_resumes_after_crash(spark, tmp_path):
    """A crash between the partition deletes and the final rename leaves
    the hidden .compact-<id> dir as the only copy of the merged data; the
    next call must RESUME (finish deletes + rename), not re-merge from
    now-incomplete partitions."""
    import shutil

    from credit_abs_oltp_to_mart_spark.sources.maintenance import (
        compact_signature_store,
    )

    src = tmp_path / "crash_slices"
    out = str(tmp_path / "crash_out")
    store = os.path.join(out, "signature_store")
    schema = spark.createDataFrame([Row(doc_id=1, text=TEXT_A)]).schema
    t0 = _time.time() - 120
    _land(spark, src, schema, 0, [Row(doc_id=1, text=TEXT_A)], t0)
    _land(spark, src, schema, 1, [Row(doc_id=11, text=TEXT_C)], t0)
    before = _rows(
        streaming.stream_dedup_ingest(spark, f"{src}/b*", out, schema=schema, min_est=0.25)
    )

    # stage the mid-crash state by hand: merged data in the hidden dir,
    # one source partition already deleted
    from pyspark.sql import functions as F

    (
        spark.read.parquet(store)
        .where(F.col("batch") <= 1)
        .drop("batch")
        .repartition(1)
        .write.parquet(os.path.join(store, ".compact-1"))
    )
    shutil.rmtree(os.path.join(store, "batch=0"))

    stats = compact_signature_store(spark, out, target_files=1)
    assert stats["compacted"] and stats.get("resumed") is True
    assert [d for d in os.listdir(store) if d.startswith("batch=")] == ["batch=1"]
    assert _rows(spark.read.parquet(store).select("doc_id", "ingest_batch")) == before


@pytest.mark.slow
def test_compaction_resume_falls_through_to_fresh_merge(spark, tmp_path):
    """A call that resumes a crashed swap must ALSO deliver the compaction
    it was asked for: with a complete .compact-1 pending (batches 0-1) and
    a committed batch=2 outside it, ONE call both finishes the swap and
    folds the resumed partition with batch=2."""
    import shutil

    from credit_abs_oltp_to_mart_spark.sources.maintenance import (
        compact_signature_store,
    )

    src = tmp_path / "resume_merge_slices"
    out = str(tmp_path / "resume_merge_out")
    store = os.path.join(out, "signature_store")
    schema = spark.createDataFrame([Row(doc_id=1, text=TEXT_A)]).schema
    t0 = _time.time() - 120
    _land(spark, src, schema, 0, [Row(doc_id=1, text=TEXT_A)], t0)
    _land(spark, src, schema, 1, [Row(doc_id=11, text=TEXT_B)], t0)
    _land(spark, src, schema, 2, [Row(doc_id=21, text=TEXT_C)], t0)
    before = _rows(
        streaming.stream_dedup_ingest(spark, f"{src}/b*", out, schema=schema, min_est=0.25)
    )

    # stage the mid-crash state of a 0..1 compaction: merged data complete
    # in the hidden dir, one source partition already deleted
    (
        spark.read.parquet(store)
        .where(F.col("batch") <= 1)
        .drop("batch")
        .repartition(1)
        .write.parquet(os.path.join(store, ".compact-1"))
    )
    shutil.rmtree(os.path.join(store, "batch=0"))

    stats = compact_signature_store(spark, out, target_files=1)
    assert stats["compacted"] and stats.get("resumed") is True
    # NOT just the resumed batch=1: the same call folded it with batch=2
    assert stats["merged_upto"] == 2 and stats["partitions_merged"] == 2
    assert [d for d in os.listdir(store) if d.startswith("batch=")] == ["batch=2"]
    assert _rows(spark.read.parquet(store).select("doc_id", "ingest_batch")) == before


@pytest.mark.slow
def test_auto_compaction_triggers_inside_ingest_loop(spark, tmp_path):
    """auto_compact_partitions arms the in-loop trigger: once the store
    exceeds the threshold, COMMITTED partitions fold between batches,
    and the survivor set is bit-identical to an untriggered run (the
    trigger only buys back listing cost, never rows)."""
    schema = spark.createDataFrame([Row(doc_id=1, text=TEXT_A)]).schema
    t0 = _time.time() - 120
    batches = [
        [Row(doc_id=1, text=TEXT_A), Row(doc_id=2, text=TEXT_B)],
        [Row(doc_id=10, text=TEXT_A), Row(doc_id=11, text=TEXT_C)],
        [Row(doc_id=20, text=TEXT_B), Row(doc_id=21, text="totally fresh words nobody wrote down yet")],
        [Row(doc_id=30, text=TEXT_C), Row(doc_id=31, text="another genuinely novel sentence of unseen grams")],
    ]
    results = {}
    for k_auto in (None, 1):
        src = tmp_path / f"auto_slices_{k_auto}"
        out = str(tmp_path / f"auto_out_{k_auto}")
        for i, rows in enumerate(batches):
            _land(spark, src, schema, i, rows, t0)
        results[k_auto] = _rows(
            streaming.stream_dedup_ingest(
                spark, f"{src}/b*", out, schema=schema, min_est=0.25,
                auto_compact_partitions=k_auto,
            )
        )
        n_parts = len([
            d
            for d in os.listdir(os.path.join(out, "signature_store"))
            if d.startswith("batch=")
        ])
        if k_auto is None:
            assert n_parts == 4  # one partition per batch, nothing folds
        else:
            # the trigger fired mid-loop: committed partitions folded
            # (the in-flight batch's own partition is never eligible)
            assert n_parts < 4
    assert results[1] == results[None] == {
        (1, 0), (2, 0), (11, 1), (21, 2), (31, 3),
    }


@pytest.mark.slow
def test_auto_compaction_then_crash_replay_is_idempotent(spark, tmp_path):
    """The compaction-mid-stream crash window: the trigger fires inside
    batch N's foreachBatch (folding committed partitions < N), then the
    run dies BEFORE batch N's checkpoint commit. The replay must still
    find its own batch=<N> partition to exclude (it was uncommitted, so
    the fold never touched it) and must dedup correctly against the
    now-FOLDED earlier history."""
    src = tmp_path / "auto_replay_slices"
    out = str(tmp_path / "auto_replay_out")
    store = os.path.join(out, "signature_store")
    schema = spark.createDataFrame([Row(doc_id=1, text=TEXT_A)]).schema
    t0 = _time.time() - 120
    _land(spark, src, schema, 0, [Row(doc_id=1, text=TEXT_A)], t0)
    _land(spark, src, schema, 1, [Row(doc_id=11, text=TEXT_B)], t0)
    # batch 2 holds a dup of batch 0 (20~A: drops), a fresh doc (21),
    # and lands with the trigger armed low enough that ITS apply folds
    # batches 0-1 into batch=1 before the crash
    _land(spark, src, schema, 2,
          [Row(doc_id=20, text=TEXT_A), Row(doc_id=21, text=TEXT_C)], t0)
    first = _rows(
        streaming.stream_dedup_ingest(
            spark, f"{src}/b*", out, schema=schema, min_est=0.25,
            auto_compact_partitions=1,
        )
    )
    assert first == {(1, 0), (11, 1), (21, 2)}
    # batch 2's apply folded the two committed partitions; its own
    # partition survived the fold
    assert sorted(
        d for d in os.listdir(store) if d.startswith("batch=")
    ) == ["batch=1", "batch=2"]

    # crash window: batch 2's sinks + compaction done, commit log not
    commits = os.path.join(out, "checkpoint", "commits")
    os.remove(os.path.join(commits, "2"))
    crc = os.path.join(commits, ".2.crc")
    if os.path.exists(crc):
        os.remove(crc)
    _land(spark, src, schema, 3,
          [Row(doc_id=30, text=TEXT_C),
           Row(doc_id=31, text="totally fresh words nobody wrote down yet")],
          t0)
    second = _rows(
        streaming.stream_dedup_ingest(
            spark, f"{src}/b*", out, schema=schema, min_est=0.25,
            auto_compact_partitions=1,
        )
    )
    # batch 2 replayed idempotently against the folded store (same two
    # verdicts), then batch 3 deduped against the replay-consistent
    # store (30~C drops against 21, 31 is fresh)
    assert second == {(1, 0), (11, 1), (21, 2), (31, 3)}


@pytest.mark.parametrize("broadcast_batch", [True, False])
@pytest.mark.slow
def test_stream_dedup_ingest_modes_agree(spark, tmp_path, broadcast_batch):
    """The join-physics knob threads through the streaming ingest without
    changing the survivor set."""
    src = tmp_path / "mode_slices"
    out = str(tmp_path / f"mode_out_{broadcast_batch}")
    schema = spark.createDataFrame([Row(doc_id=1, text=TEXT_A)]).schema
    t0 = _time.time() - 120
    _land(spark, src, schema, 0, [Row(doc_id=1, text=TEXT_A), Row(doc_id=2, text=TEXT_B)], t0)
    _land(spark, src, schema, 1, [Row(doc_id=10, text=TEXT_A), Row(doc_id=11, text=TEXT_C)], t0)
    got = streaming.stream_dedup_ingest(
        spark, f"{src}/b*", out, schema=schema, min_est=0.25,
        broadcast_batch=broadcast_batch,
    )
    assert _rows(got) == {(1, 0), (2, 0), (11, 1)}


@pytest.mark.slow
def test_stream_dedup_ingest_prebanded_store(spark, tmp_path):
    """store_prebanded=True: identical survivor set, band_key baked into
    the store partitions (bands rows per doc), store-side scans feed the
    band join with NO explode, and compaction + audit still hold."""
    from credit_abs_oltp_to_mart_spark.operators import dedup as D
    from credit_abs_oltp_to_mart_spark.sources.maintenance import (
        audit_signature_store,
        compact_signature_store,
    )

    schema = spark.createDataFrame([Row(doc_id=1, text=TEXT_A)]).schema
    t0 = _time.time() - 120
    results = {}
    for mode in (False, True):
        src = tmp_path / f"preband_slices_{mode}"
        out = str(tmp_path / f"preband_out_{mode}")
        _land(spark, src, schema, 0, [Row(doc_id=1, text=TEXT_A), Row(doc_id=2, text=TEXT_B)], t0)
        _land(spark, src, schema, 1, [Row(doc_id=10, text=TEXT_A), Row(doc_id=11, text=TEXT_C)], t0)
        results[mode] = _rows(
            streaming.stream_dedup_ingest(
                spark, f"{src}/b*", out, schema=schema, min_est=0.25,
                store_prebanded=mode,
            )
        )
    assert results[True] == results[False] == {(1, 0), (2, 0), (11, 1)}

    out = str(tmp_path / "preband_out_True")
    store = spark.read.parquet(os.path.join(out, "signature_store"))
    assert "band_key" in store.columns
    # bands=2 -> exactly 2 rows per surviving doc
    assert store.groupBy("doc_id").count().where(F.col("count") != 2).count() == 0
    rep = audit_signature_store(spark, out)
    assert (rep["duplicate_doc_ids"], rep["mislabeled_rows"]) == (0, 0)

    # plan gate: ONLY the new batch explodes its bands; the pre-banded
    # store side feeds the sort-merge join straight off the scan
    batch = spark.createDataFrame([Row(doc_id=99, text=TEXT_A)], schema)
    pairs = D.incremental_minhash_pairs(
        batch, store.drop("batch"), broadcast_batch=False
    )
    p = pairs._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in p, p
    assert p.count("Generate") == 1, p

    # compaction folds pre-banded partitions; survivor projection intact
    stats = compact_signature_store(spark, out, target_files=1)
    assert stats["compacted"]
    rep2 = audit_signature_store(spark, out)
    assert (rep2["duplicate_doc_ids"], rep2["mislabeled_rows"]) == (0, 0)
    got = _rows(
        spark.read.parquet(os.path.join(out, "signature_store"))
        .select("doc_id", "ingest_batch")
        .distinct()
    )
    assert got == results[True]


@pytest.mark.slow
def test_signature_store_audit(spark, tmp_path):
    """audit_signature_store: clean after an ingest AND after compaction;
    detects planted duplicate doc_ids, mislabeled rows, and orphan
    partitions."""
    import shutil

    from pyspark.sql import functions as F

    from credit_abs_oltp_to_mart_spark.sources.maintenance import (
        audit_signature_store,
        compact_signature_store,
    )

    src = tmp_path / "audit_slices"
    out = str(tmp_path / "audit_out")
    store = os.path.join(out, "signature_store")
    schema = spark.createDataFrame([Row(doc_id=1, text=TEXT_A)]).schema
    t0 = _time.time() - 120
    _land(spark, src, schema, 0, [Row(doc_id=1, text=TEXT_A)], t0)
    _land(spark, src, schema, 1, [Row(doc_id=11, text=TEXT_C)], t0)
    streaming.stream_dedup_ingest(spark, f"{src}/b*", out, schema=schema, min_est=0.25)

    clean = audit_signature_store(spark, out)
    assert (clean["duplicate_doc_ids"], clean["mislabeled_rows"], clean["orphan_partitions"]) == (0, 0, [])
    compact_signature_store(spark, out, target_files=1)
    clean2 = audit_signature_store(spark, out)
    assert (clean2["duplicate_doc_ids"], clean2["mislabeled_rows"], clean2["orphan_partitions"]) == (0, 0, [])

    # plant every anomaly: copy the compacted partition to an id beyond
    # the offset log (orphan + duplicate docs + column > partition? no —
    # copied rows keep ingest_batch <= 1 < 99, so NOT mislabeled; plant a
    # mislabeled row separately)
    shutil.copytree(os.path.join(store, "batch=1"), os.path.join(store, "batch=99"))
    spark.createDataFrame(
        [(777, *[0] * 8, 5)],
        "doc_id long, s0 long, s1 long, s2 long, s3 long, s4 long, s5 long,"
        " s6 long, s7 long, ingest_batch long",
    ).write.mode("append").parquet(os.path.join(store, "batch=1"))
    bad = audit_signature_store(spark, out)
    assert bad["duplicate_doc_ids"] == 2  # docs 1 and 11 in both partitions
    assert bad["mislabeled_rows"] == 1  # ingest_batch 5 > partition 1
    assert bad["orphan_partitions"] == [99]


@pytest.mark.slow
def test_compaction_drops_partial_hidden_dir_and_remerges(spark, tmp_path):
    """A hidden dir WITHOUT _SUCCESS is a crashed mid-write (partitions
    intact): compaction must drop it and re-merge — trusting it would
    swap a partial file set over the committed store (data loss)."""
    from credit_abs_oltp_to_mart_spark.sources.maintenance import (
        audit_signature_store,
        compact_signature_store,
    )

    src = tmp_path / "partial_slices"
    out = str(tmp_path / "partial_out")
    store = os.path.join(out, "signature_store")
    schema = spark.createDataFrame([Row(doc_id=1, text=TEXT_A)]).schema
    t0 = _time.time() - 120
    _land(spark, src, schema, 0, [Row(doc_id=1, text=TEXT_A)], t0)
    _land(spark, src, schema, 1, [Row(doc_id=11, text=TEXT_C)], t0)
    before = _rows(
        streaming.stream_dedup_ingest(spark, f"{src}/b*", out, schema=schema, min_est=0.25)
    )
    # stage a crashed-mid-write attempt: hidden dir, garbage file, NO _SUCCESS
    os.makedirs(os.path.join(store, ".compact-1"))
    with open(os.path.join(store, ".compact-1", "part-zzz.parquet"), "wb") as f:
        f.write(b"not a parquet file")
    assert audit_signature_store(spark, out)["pending_compaction"] == [1]
    stats = compact_signature_store(spark, out, target_files=1)
    assert stats["compacted"] and stats.get("resumed") is False
    assert [d for d in os.listdir(store) if d.startswith("batch=")] == ["batch=1"]
    assert not any(d.startswith(".compact") for d in os.listdir(store))
    assert _rows(spark.read.parquet(store).select("doc_id", "ingest_batch")) == before


@pytest.mark.slow
def test_ingest_heals_half_swapped_store(spark, tmp_path):
    """Crash between compaction's partition deletes and the rename: the
    only copy of merged history is the hidden dir. A restarted ingest
    must heal the swap BEFORE dedup-ing, or previously-committed
    near-duplicates would be silently re-admitted."""
    import shutil

    from pyspark.sql import functions as F

    src = tmp_path / "heal_slices"
    out = str(tmp_path / "heal_out")
    store = os.path.join(out, "signature_store")
    schema = spark.createDataFrame([Row(doc_id=1, text=TEXT_A)]).schema
    t0 = _time.time() - 120
    _land(spark, src, schema, 0, [Row(doc_id=1, text=TEXT_A)], t0)
    _land(spark, src, schema, 1, [Row(doc_id=11, text=TEXT_C)], t0)
    streaming.stream_dedup_ingest(spark, f"{src}/b*", out, schema=schema, min_est=0.25)
    # stage the half-swapped state: COMPLETE hidden dir (spark write =>
    # _SUCCESS), all source partitions already deleted
    (
        spark.read.parquet(store)
        .where(F.col("batch") <= 1)
        .drop("batch")
        .repartition(1)
        .write.parquet(os.path.join(store, ".compact-1"))
    )
    shutil.rmtree(os.path.join(store, "batch=0"))
    shutil.rmtree(os.path.join(store, "batch=1"))
    # a new slice carrying a dup of batch-0's survivor arrives
    _land(spark, src, schema, 2, [Row(doc_id=20, text=TEXT_A), Row(doc_id=21, text="fresh never seen words entirely new here")], t0)
    got = _rows(
        streaming.stream_dedup_ingest(spark, f"{src}/b*", out, schema=schema, min_est=0.25)
    )
    # doc 20 dropped against the HEALED store; without healing the store
    # read would miss batches 0-1 and 20 would survive
    assert got == {(1, 0), (11, 1), (21, 2)}


def test_prebanded_store_band_mismatch_fails_loudly(spark):
    """A pre-banded store built with a different `bands` must raise, not
    silently produce zero candidate pairs (a full dedup bypass)."""
    corpus, batch = _corpus_and_batch(spark)
    wrong = minhash_signatures(corpus, n_perm=8).select(
        "doc_id",
        *[f"s{i}" for i in range(8)],
        _band_key_col(8, 4),
    )
    with pytest.raises(Exception, match="band_key does not match"):
        incremental_minhash_pairs(
            batch, wrong, bands=2, broadcast_batch=False
        ).collect()
