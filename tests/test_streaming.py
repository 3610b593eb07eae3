"""Structured Streaming operators: batch parity in a single availableNow
run (the driver-contract mode) AND honest multi-micro-batch execution with
cross-batch state for the custom sessionizer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from credit_abs_oltp_to_mart_spark import streaming

SF_DIR = "/root/testdata/sf0.001"


def _collect_sorted(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_stream_windowed_agg_matches_batch(spark):
    got = entry_mod.q_stream_windowed_agg(spark, SF_DIR)
    from __spark_entry__ import _t

    e = _t(spark, SF_DIR, "events")
    exp = (
        e.groupBy(
            F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )
    cols = ["day", "event_type", "n_events", "total_value"]
    assert _collect_sorted(got, cols) == _collect_sorted(exp, cols)


def test_stream_sessionize_multibatch(spark, tmp_path):
    """Split events into time-ordered files, force one file per micro-batch,
    and check that the LAST emission per (user, session) — update-mode
    semantics — reproduces the batch sessionization, including sessions
    spanning micro-batch boundaries."""
    from __spark_entry__ import _t

    e = _t(spark, SF_DIR, "events").select("user_id", "event_id", "ts")
    # three contiguous time slices written as separate files, oldest first
    thirds = e.select(
        F.percentile_approx(F.col("ts").cast("double"), [1 / 3, 2 / 3], 10000)
    ).first()[0]
    src = tmp_path / "events_stream"
    slices = [
        e.where(F.col("ts").cast("double") <= thirds[0]),
        e.where(
            (F.col("ts").cast("double") > thirds[0])
            & (F.col("ts").cast("double") <= thirds[1])
        ),
        e.where(F.col("ts").cast("double") > thirds[1]),
    ]
    import time

    for i, sl in enumerate(slices):
        sl.coalesce(1).write.parquet(str(src / f"slice={i}"))
        time.sleep(1.1)  # distinct mtimes => deterministic file order

    schema = slices[0].schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src / "slice=*"))
    )
    out = streaming.run_to_memory(
        streaming.stream_sessionize(stream), "mem_test_multibatch", "update"
    )
    # update semantics: last emission per (user_id, session_no) wins
    # (n_events grows monotonically per session, so max-by-n_events == last)
    w_last = (
        out.groupBy("user_id", "session_no")
        .agg(
            F.max(F.struct("n_events", "session_start", "session_end")).alias("s")
        )
        .select("user_id", "session_no", "s.n_events", "s.session_start", "s.session_end")
    )
    exp = entry_mod.q_sessionize(spark, SF_DIR)
    cols = ["user_id", "session_no", "n_events", "session_start", "session_end"]
    assert _collect_sorted(w_last, cols) == _collect_sorted(exp, cols)
    # and some session must have been re-emitted across batches (state reuse)
    assert out.count() > w_last.count()


@pytest.mark.slow
def test_stream_stream_join_multibatch(spark, tmp_path):
    """Click->purchase join pairs must survive micro-batch boundaries:
    time-sliced files, one per trigger, vs the batch range join."""
    import time

    from __spark_entry__ import _t

    e = _t(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    thirds = e.select(
        F.percentile_approx(F.col("ts").cast("double"), [1 / 3, 2 / 3], 10000)
    ).first()[0]
    src = tmp_path / "ss_events"
    slices = [
        e.where(F.col("ts").cast("double") <= thirds[0]),
        e.where(
            (F.col("ts").cast("double") > thirds[0])
            & (F.col("ts").cast("double") <= thirds[1])
        ),
        e.where(F.col("ts").cast("double") > thirds[1]),
    ]
    for i, sl in enumerate(slices):
        sl.coalesce(1).write.parquet(str(src / f"slice={i}"))
        time.sleep(1.1)
    stream = (
        spark.readStream.schema(slices[0].schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src / "slice=*"))
    )
    got = streaming.run_to_memory(
        streaming.stream_stream_join(stream), "mem_test_ssj", "append"
    )
    c = e.where(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id"), F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    exp = c.join(p, "user_id").where(
        (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") < F.col("c_ts") + F.expr("INTERVAL 15 MINUTES"))
    ).select(
        "user_id", "click_id", "purchase_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"),
    )
    cols = ["user_id", "click_id", "purchase_id", "gap_us"]
    assert _collect_sorted(got, cols) == _collect_sorted(exp, cols)
    assert got.count() > 0


def test_stream_upsert_snapshot_foreachbatch(spark, tmp_path):
    """foreachBatch incremental mart maintenance: per-batch deltas folded
    into a keyed snapshot must equal the batch aggregate regardless of
    micro-batch boundaries (decimal accumulation is associative)."""
    import time

    from __spark_entry__ import _t

    e = _t(spark, SF_DIR, "events").select("user_id", "ts", "value")
    half = e.select(
        F.percentile_approx(F.col("ts").cast("double"), [0.5], 10000)
    ).first()[0][0]
    src = tmp_path / "ub_events"
    slices = [
        e.where(F.col("ts").cast("double") <= half),
        e.where(F.col("ts").cast("double") > half),
    ]
    for i, sl in enumerate(slices):
        sl.coalesce(1).write.parquet(str(src / f"slice={i}"))
        time.sleep(1.1)
    stream = (
        spark.readStream.schema(slices[0].schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "slice=*"))
    )
    snap_dir = str(tmp_path / "snapshot")
    streaming.stream_upsert_snapshot(stream, snap_dir)
    got = spark.read.parquet(snap_dir).select(
        "user_id", "n_events", F.col("total_value").cast("double").alias("tv")
    )
    exp = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("tv"),
    )
    cols = ["user_id", "n_events", "tv"]
    assert _collect_sorted(got, cols) == _collect_sorted(exp, cols)


@pytest.mark.slow
def test_dedup_within_watermark_bounds_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicates inside the watermark are
    suppressed; once the watermark passes a key's event time its state is
    evicted, so a later re-send of the same id is emitted again (bounded
    state, at-least-once upstream semantics)."""
    import time
    from datetime import datetime

    t0 = datetime(2026, 1, 1, 12, 0, 0)

    def ev(eid, minutes):
        return (
            eid,
            datetime(2026, 1, 1, 12, 0, 0).replace(
                hour=12 + minutes // 60, minute=minutes % 60
            ),
            eid * 10,
            "click",
        )

    batches = [
        [ev(1, 0), ev(2, 1)],    # first sight of 1, 2
        [ev(1, 10), ev(3, 200)], # dup 1 suppressed; 3 advances wm to +140m
        [ev(4, 206)],            # end-of-batch cleanup evicts 1's state
                                 # (expiry +70m < wm +140m; eviction runs
                                 # after input, so a same-batch re-send
                                 # would still be suppressed)
        [ev(1, 210)],            # state gone => re-emitted
    ]
    src = tmp_path / "dedup_stream"
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / f"b={i}")
        )
        time.sleep(1.1)  # distinct mtimes => deterministic batch order

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src / "b=*"))
    )
    out = streaming.run_to_memory(
        streaming.stream_dedup_within_watermark(stream, "1 hour"),
        "mem_test_dedup_wm",
        "append",
    )
    emitted = sorted(r["event_id"] for r in out.collect())
    assert emitted == [1, 1, 2, 3, 4], emitted


def test_transform_with_state_running_totals(spark, tmp_path):
    """v2 arbitrary-state API (transformWithStateInPandas + RocksDB state
    store): running per-user totals accumulate across micro-batches; the
    last emission per user equals the batch aggregate exactly (integer-
    cents state)."""
    # the v2 state protocol speaks protobuf between JVM and Python
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf not available in this environment")
    import time

    from __spark_entry__ import _t

    e = _t(spark, SF_DIR, "events").select("user_id", "ts", "value")
    thirds = e.select(
        F.percentile_approx(F.col("ts").cast("double"), [1 / 3, 2 / 3], 10000)
    ).first()[0]
    src = tmp_path / "twspd_stream"
    d = F.col("ts").cast("double")
    slices = [
        e.where(d <= thirds[0]),
        e.where((d > thirds[0]) & (d <= thirds[1])),
        e.where(d > thirds[1]),
    ]
    for i, sl in enumerate(slices):
        sl.coalesce(1).write.parquet(str(src / f"s={i}"))
        time.sleep(1.1)

    stream = (
        spark.readStream.schema(slices[0].schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src / "s=*"))
    )
    # stream_running_totals sets the RocksDB provider session-wide (the v2
    # state API requires it at query START, which happens inside
    # run_to_memory) — restore the prior provider so later streaming tests
    # in this session keep the default store
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    prev_prov = spark.conf.get(prov_key, None)
    try:
        out = streaming.run_to_memory(
            streaming.stream_running_totals(stream),
            "mem_twspd_totals",
            "update",
        )
    finally:
        if prev_prov is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, prev_prov)
    # update mode: keep the emission with the highest n_events per user
    w_last = out.groupBy("user_id").agg(
        F.max(F.struct("n_events", "total_value")).alias("s")
    ).select("user_id", "s.n_events", "s.total_value")
    exp = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0
        ).alias("total_value"),
    )
    key = lambda df: sorted(tuple(r) for r in df.collect())
    assert key(w_last) == key(exp)


def test_restart_from_checkpoint_recovers_state_and_offsets(spark, tmp_path):
    """Fault-tolerance contract: stop a stateful streaming query, start a
    NEW query over the same checkpoint, and the restart must (a) not
    reprocess slice-1 files (offset log recovery) and (b) still suppress
    slice-2 duplicates of slice-1 keys (state store recovery). File sink +
    dropDuplicates in append mode; availableNow triggers give clean
    run-to-completion boundaries around the restart."""
    import time as _time

    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = str(tmp_path / "ckpt")
    base = F.to_timestamp(F.lit("2026-01-01 00:00:00"))

    def slice_df(ids):
        return spark.createDataFrame(
            [(int(i),) for i in ids], "event_id bigint"
        ).select(
            "event_id",
            (base + F.make_interval(secs=F.col("event_id"))).alias("ts"),
        )

    schema = "event_id bigint, ts timestamp"
    # slice 1: keys 0..99 with 0..19 duplicated inside the slice
    slice_df(list(range(100)) + list(range(20))).coalesce(1).write.parquet(
        str(src / "s1")
    )

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "s*"))
        )
        q = (
            stream.withWatermark("ts", "1 hour")
            .dropDuplicates(["event_id"])
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert not q.isActive

    run_once()  # processes slice 1, then terminates
    n1 = spark.read.parquet(str(out)).count()
    assert n1 == 100  # in-slice duplicates suppressed

    _time.sleep(1.1)  # distinct mtime for the new file
    # slice 2: 50 repeats of slice-1 keys + 50 new keys
    slice_df(list(range(50)) + list(range(100, 150))).coalesce(1).write.parquet(
        str(src / "s2")
    )
    run_once()  # NEW query object, same checkpoint

    got = spark.read.parquet(str(out))
    assert got.count() == 150  # +50 new keys only: recovered state
    # suppressed the cross-restart repeats
    assert got.select("event_id").distinct().count() == 150
    ids = {r.event_id for r in got.collect()}
    assert ids == set(range(150))


def test_stream_dedup_ingest_drops_cross_batch_dups(spark, tmp_path):
    """Streaming incremental-dedup ingest: a later batch's near-copy of an
    earlier SURVIVOR is dropped; unique docs survive; within-batch dups
    both survive (the store only grows between batches). Also checks the
    lineage-severing checkpoint: survivors must be computed against the
    store state BEFORE the batch's own signatures are appended (a doc must
    never be dropped for matching itself)."""
    import os
    import time as _time

    from pyspark.sql import Row

    text_a = "alpha beta gamma delta epsilon zeta eta theta"
    text_b = "one two three four five six seven eight nine"
    text_c = "red orange yellow green blue indigo violet ultraviolet"
    slices = [
        # batch 0: two docs (1 and 2), plus a WITHIN-batch dup of doc 1
        [Row(doc_id=1, text=text_a), Row(doc_id=2, text=text_b),
         Row(doc_id=3, text=text_a)],
        # batch 1: dup of batch-0 survivor (drop) + unique (survive)
        [Row(doc_id=10, text=text_a), Row(doc_id=11, text=text_c)],
        # batch 2: dup of batch-1 SURVIVOR (drop) — proves the store grew
        [Row(doc_id=20, text=text_c)],
    ]
    src = tmp_path / "ingest_slices"
    now = _time.time()
    for k, rows in enumerate(slices):
        d = str(src / f"b{k}")
        spark.createDataFrame(rows).coalesce(1).write.parquet(d)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                t = now - 60 + 10 * k
                os.utime(os.path.join(d, f), (t, t))
    out = streaming.stream_dedup_ingest(
        spark,
        f"{src}/b*",
        str(tmp_path / "ingest_out"),
        schema=spark.createDataFrame(slices[0]).schema,
        n=3,
        n_perm=8,
        bands=2,
        min_est=0.25,
        seed=42,
    )
    got = {(r["doc_id"], r["ingest_batch"]) for r in out.collect()}
    # 1, 2 and the within-batch dup 3 survive batch 0; 10 (copy of 1/3) is
    # dropped; 11 survives batch 1; 20 (copy of survivor 11) is dropped
    assert got == {(1, 0), (2, 0), (3, 0), (11, 1)}, got


def test_stream_dedup_ingest_resumes_across_runs(spark, tmp_path):
    """Continuous ingest across process restarts: run the ingest over the
    first two slices, then land a third slice and re-run with the SAME
    checkpoint/store/output. The second run must process ONLY the new file
    (offset-log recovery — no duplicate survivor rows for batches 0/1) and
    dedup it against the store persisted by the first run."""
    import os
    import time as _time

    from pyspark.sql import Row

    text_a = "alpha beta gamma delta epsilon zeta eta theta"
    text_c = "red orange yellow green blue indigo violet ultraviolet"
    src = tmp_path / "resume_slices"
    out = str(tmp_path / "resume_out")
    schema = spark.createDataFrame([Row(doc_id=1, text=text_a)]).schema
    now = _time.time()

    def land(k, rows):
        d = str(src / f"b{k}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                t = now - 60 + 10 * k
                os.utime(os.path.join(d, f), (t, t))

    land(0, [Row(doc_id=1, text=text_a)])
    land(1, [Row(doc_id=2, text=text_c)])
    first = streaming.stream_dedup_ingest(
        spark, f"{src}/b*", out, schema=schema, min_est=0.25
    )
    assert {(r["doc_id"], r["ingest_batch"]) for r in first.collect()} == {
        (1, 0), (2, 1)
    }
    # a new slice lands after the first run shut down: one copy of a
    # first-run survivor (drop) + one new doc (survive)
    land(2, [Row(doc_id=30, text=text_a), Row(doc_id=31, text="brand new words never seen before at all")])
    second = streaming.stream_dedup_ingest(
        spark, f"{src}/b*", out, schema=schema, min_est=0.25
    )
    got = {(r["doc_id"], r["ingest_batch"]) for r in second.collect()}
    # batches 0/1 NOT reprocessed (no duplicated rows); the resumed run's
    # batch id continues from the checkpoint (2); doc 30 deduped against
    # the store written by run 1
    assert got == {(1, 0), (2, 1), (31, 2)}, got


def test_state_partition_count_frozen_in_checkpoint(spark, tmp_path):
    """Deploy-time pitfall, pinned (``run_to_memory``'s docstring warns of
    it): the stateful-operator partition count is FROZEN into the
    checkpoint at first start. A resume under a DIFFERENT
    ``spark.sql.shuffle.partitions`` must (a) stay correct across the
    restart and (b) keep the ORIGINAL state layout — Spark reads the
    count from checkpoint metadata and silently ignores the session
    setting, so an operator resumed with a mismatched conf neither
    crashes nor re-shards."""
    import os
    import time as _time

    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = str(tmp_path / "ckpt")
    base = F.to_timestamp(F.lit("2026-01-01 00:00:00"))

    def slice_df(ids):
        return spark.createDataFrame(
            [(int(i),) for i in ids], "event_id bigint"
        ).select(
            "event_id",
            (base + F.make_interval(secs=F.col("event_id"))).alias("ts"),
        )

    schema = "event_id bigint, ts timestamp"
    slice_df(list(range(60)) + list(range(10))).coalesce(1).write.parquet(
        str(src / "s1")
    )

    def run_once(n_parts: int):
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
        try:
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(str(src / "s*"))
            )
            q = (
                stream.withWatermark("ts", "1 hour")
                .dropDuplicates(["event_id"])
                .writeStream.format("parquet")
                .option("path", str(out))
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            assert not q.isActive
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)

    def state_partition_dirs() -> int:
        # <ckpt>/state/<operatorId=0>/<partitionId>/ — one dir per state
        # store partition, created at first start
        return len(
            [d for d in os.listdir(f"{ckpt}/state/0") if d.isdigit()]
        )

    run_once(8)
    assert spark.read.parquet(str(out)).count() == 60
    assert state_partition_dirs() == 8

    _time.sleep(1.1)  # distinct mtime for the new file
    slice_df(list(range(30)) + list(range(60, 90))).coalesce(1).write.parquet(
        str(src / "s2")
    )
    run_once(3)  # resume under a DIFFERENT session setting
    got = spark.read.parquet(str(out))
    # correct across the restart: +30 new keys, repeats suppressed
    assert got.count() == 90
    assert got.select("event_id").distinct().count() == 90
    # and the state layout kept the frozen original count, not 3
    assert state_partition_dirs() == 8
