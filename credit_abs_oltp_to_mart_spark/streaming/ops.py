"""Structured Streaming operators over the events feed.

The reference is batch-only (SURVEY.md §2.10; dbt full-refresh models,
`schedule=None` DAG — `airflows/dags/pg_credit_oltp_synth_dag.py:43`). Its
daily `arrears_dpd_status` feed is the natural streaming ingestion point,
so this module provides that ingestion shape as first-class capability:

- watermarked tumbling-window aggregation (`stream_windowed_agg`),
- streaming key-dedup (`stream_distinct_keys`),
- a custom stateful sessionizer via ``applyInPandasWithState``
  (`stream_sessionize`) — the operator Spark's built-ins lack.

Each operator is a plain unbounded streaming plan; ``run_to_memory`` drives
it with ``trigger(availableNow=True)`` into a memory sink so the finite
test corpus yields exactly the batch answer and the DuckDB oracles can gate
correctness. On a cluster the same plans point at a file/Kafka source with
a processing-time trigger and a real sink; watermarks then bound state.

Scale posture: windowed aggregation and dedup state are partitioned by
group key / dedup key (RocksDB-backed state store on a real cluster); the
sessionizer keeps O(1) state per user_id. Nothing below collects to the
driver.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.functions import plancap
from credit_abs_oltp_to_mart_spark.functions.parallelism import local_rows
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SECONDS = 1800

_OUT_SCHEMA = (
    "user_id bigint, session_no bigint, n_events bigint, "
    "session_start timestamp, session_end timestamp"
)
# state: open session carried across micro-batches (epoch-micros longs)
_STATE_SCHEMA = (
    "session_no bigint, start_us bigint, end_us bigint, n_events bigint"
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source streaming read of the events table.

    Schema comes from a batch footer read (file streams require an explicit
    schema). events.ts is parquet TIMESTAMP(NANOS) — read as long and
    truncated to microseconds, exactly as the batch path does.
    """
    base = sf_dir.rstrip("/")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{base}/events.parquet").schema
    # the file source lists a DIRECTORY; events.parquet may be a single file
    # (driver testdata) or a directory (our lake layout)
    if os.path.isdir(f"{base}/events.parquet"):
        df = spark.readStream.schema(schema).parquet(f"{base}/events.parquet")
    else:
        df = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(base)
        )
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dict(df.dtypes).get("ts") == "timestamp_ntz":
        # naive parquet timestamp surfaced as NTZ (session-dependent): pin
        # UTC and cast so watermarks/windows see plain TIMESTAMP instants
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def run_to_memory(
    df: DataFrame,
    name: str,
    output_mode: str,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Drive a streaming plan to completion over the currently-available
    data (one availableNow run) and return the memory-sink table.

    ``state_partitions`` pins the stateful-operator partition count for
    this query (restoring the session conf afterwards). Streaming state
    partitioning is a deploy-time decision — it is FROZEN into the
    checkpoint at first start and every micro-batch pays a state-store
    open/commit per partition, so size it to expected state volume, not to
    the session's batch shuffle setting (per-batch overhead scales with
    partition count; 8 suits the test corpus, thousands suit a real
    cluster). ``None`` keeps the session default.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        query = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def stream_windowed_agg(events: DataFrame) -> DataFrame:
    """Tumbling 1-day windowed aggregation with a 1-hour watermark.

    Window starts are epoch-aligned (UTC session timezone), so
    ``window.start == date_trunc('day', ts)`` and a plain GROUP BY oracle
    reproduces the result on finite data (no row is ever late within a
    single availableNow batch). Run in complete mode so unfinalized windows
    are emitted too.
    """
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").cast("date").alias("day"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_enriched_agg(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static join enrichment: the event stream joined to the static
    customer dimension, then watermarked daily aggregation per segment.

    The dim side is broadcast — the canonical streaming-enrichment shape:
    no stream-side shuffle for the join, each micro-batch probes the
    broadcast hash table at scan speed, and only the post-join aggregation
    shuffles (on the day/segment key). On a cluster, a slowly-changing dim
    would be re-broadcast per batch via a snapshot view; semantics are
    identical."""
    dim = F.broadcast(
        customers.select(
            F.col("c_custkey").alias("user_id"), "c_mktsegment"
        )
    )
    return (
        events.withWatermark("ts", "1 hour")
        .join(dim, "user_id")
        .groupBy(F.window("ts", "1 day").alias("w"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").cast("date").alias("day"),
            F.col("c_mktsegment").alias("mktsegment"),
            "n_events",
            "total_value",
        )
    )


def stream_distinct_keys(events: DataFrame) -> DataFrame:
    """Streaming dedup to distinct (user_id, event_type, day) keys.

    Emits key columns only, so the output is deterministic (no arbitrary
    surviving-row payload). State is one entry per distinct key; on an
    unbounded stream add ``withWatermark`` +
    ``dropDuplicatesWithinWatermark`` to bound it.
    """
    return events.select(
        "user_id", "event_type", F.col("ts").cast("date").alias("day")
    ).dropDuplicates(["user_id", "event_type", "day"])


def stream_dedup_within_watermark(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Bounded-state streaming dedup: ``dropDuplicatesWithinWatermark``.

    ``dropDuplicates`` keeps every key seen forever — unbounded state on an
    unbounded stream. The watermark variant evicts key state once the
    event-time watermark passes it, so state is O(keys per watermark
    window): the only shape that survives an unbounded 100 TB/day feed.
    Duplicates are suppressed only while their first occurrence is within
    the watermark — exactly the guarantee an at-least-once upstream
    (Kafka redelivery) needs.
    """
    return (
        events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type", "ts")
    )


def _sessionize_fn(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user session builder: gap > SESSION_GAP_SECONDS starts a new
    session. Emits every session it closed this batch plus the still-open
    session (update semantics — re-emitted, with more events, if the user
    reappears next batch); only the open session is kept as state."""
    rows = pd.concat(list(batches))
    rows = rows.sort_values(["ts", "event_id"])
    ts_us = (rows["ts"].astype("int64") // 1000).to_numpy()

    if state.exists:
        session_no, start_us, end_us, n_events = state.get
    else:
        session_no, start_us, end_us, n_events = -1, None, None, 0

    out: list[tuple[int, int, int, int, int]] = []
    user_id = key[0]
    for t in ts_us:
        if start_us is None:
            session_no, start_us, end_us, n_events = session_no + 1, t, t, 1
        elif (t - end_us) / 1_000_000 > SESSION_GAP_SECONDS:
            out.append((user_id, session_no, n_events, start_us, end_us))
            session_no, start_us, end_us, n_events = session_no + 1, t, t, 1
        else:
            end_us, n_events = t, n_events + 1
    if start_us is not None:
        out.append((user_id, session_no, n_events, start_us, end_us))
        state.update((int(session_no), int(start_us), int(end_us), int(n_events)))

    pdf = pd.DataFrame(
        out,
        columns=["user_id", "session_no", "n_events", "start_us", "end_us"],
    )
    yield pd.DataFrame(
        {
            "user_id": pdf["user_id"],
            "session_no": pdf["session_no"],
            "n_events": pdf["n_events"],
            "session_start": pd.to_datetime(pdf["start_us"], unit="us"),
            "session_end": pd.to_datetime(pdf["end_us"], unit="us"),
        }
    )


def stream_sessionize(events: DataFrame) -> DataFrame:
    """Custom stateful operator: sessionization (gap > 30 min) with
    ``applyInPandasWithState`` — O(1) state per user, Arrow-batched."""
    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_stream_join(events: DataFrame) -> DataFrame:
    """Stream-stream inner join with an event-time range bound: each click
    joined to the same user's purchases in the following 15 minutes.

    Both sides carry watermarks and the join condition bounds purchase time
    relative to click time, so Spark can size the join state: a click is
    held only until the purchase-side watermark passes click_ts + 15 min,
    then evicted — state is O(events in the watermark horizon), not O(all
    history). Append-only output (the one mode stream-stream inner joins
    support). Self-joining one source stream is fine — Spark treats the
    two branches as independent streams with independent state.
    """
    clicks = (
        events.withWatermark("ts", "1 hour")
        .where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    purchases = (
        events.withWatermark("ts", "1 hour")
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") < F.col("c_ts") + F.expr("INTERVAL 15 MINUTES")),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"),
    )


def stream_upsert_snapshot(
    events: DataFrame, snapshot_dir: str, state_partitions: int | None = 8
) -> None:
    """Incremental mart maintenance: fold each micro-batch's per-user
    delta into a persistent keyed snapshot (foreachBatch + apply_cdc).

    This is the streaming write path the batch pipeline lacks: instead of
    rebuilding the mart, every micro-batch aggregates ITS OWN rows (tiny),
    joins the affected keys against the current snapshot, and merges via
    the CDC operator — so per-batch work scales with the batch, not the
    table. Totals accumulate in decimal (exact, order- and
    batch-boundary-independent: any micro-batch split folds to the same
    snapshot). The swap is write-temp + rename, atomic per batch; on a
    real lake the same shape targets a format with MERGE (Delta/Iceberg)
    or partition overwrite.
    """
    import os
    import shutil

    from credit_abs_oltp_to_mart_spark.operators.cdc import apply_cdc

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
        )
        if os.path.exists(snapshot_dir):
            old = spark.read.parquet(snapshot_dir)
        else:
            old = spark.createDataFrame(
                [], "user_id bigint, n_events bigint, total_value decimal(28,2)"
            )
        changes = (
            delta.alias("d")
            .join(old.alias("o"), "user_id", "left")
            .select(
                "user_id",
                (
                    F.col("d.n_events")
                    + F.coalesce(F.col("o.n_events"), F.lit(0))
                ).alias("n_events"),
                (
                    F.col("d.total_value").cast("decimal(28,2)")
                    + F.coalesce(
                        F.col("o.total_value"),
                        F.lit(0).cast("decimal(28,2)"),
                    )
                ).cast("decimal(28,2)").alias("total_value"),
                F.lit("U").alias("op"),
            )
        )
        snap = apply_cdc(old, changes, key="user_id")
        tmp = snapshot_dir.rstrip("/") + "._batch_tmp"
        snap.write.mode("overwrite").parquet(tmp)
        if os.path.exists(snapshot_dir):
            bak = snapshot_dir.rstrip("/") + "._batch_bak"
            os.rename(snapshot_dir, bak)
            os.rename(tmp, snapshot_dir)
            shutil.rmtree(bak)
        else:
            os.rename(tmp, snapshot_dir)

    spark = events.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            events.writeStream.foreachBatch(_merge)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def stream_session_window_agg(events: DataFrame) -> DataFrame:
    """Native event-time session windows (30-min gap) per user.

    Complements the custom ``applyInPandasWithState`` sessionizer with the
    built-in operator: ``session_window`` merges events whose windows
    overlap (next.ts < prev.ts + gap) and the state store handles session
    growth/merge across micro-batches. Window end is last-event + gap by
    definition. Complete mode so sessions still inside the watermark
    horizon are emitted in the finite availableNow run.
    """
    w = F.session_window("ts", "30 minutes")
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(w.alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
        )
    )


def stream_running_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals on the v2 arbitrary-state API
    (``transformWithStateInPandas``): ValueState survives micro-batches in
    the RocksDB state store, so state scales to disk (not executor heap) —
    the knob that matters when key cardinality is 10^9. Update-mode: each
    batch re-emits the keys it touched with their lifetime totals.

    Runtime requirement: the v2 state protocol carries state over
    protobuf between the JVM and the Python driver worker —
    ``google.protobuf`` must be importable (the test suite skips when it
    isn't; the ``applyInPandasWithState`` operators above have no such
    dependency).
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )

    state_schema = StructType([
        StructField("n", LongType()),
        StructField("total_cents", LongType()),
    ])

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timer_values):
            n, cents = 0, 0
            if self._totals.exists():
                n, cents = self._totals.get()
            for pdf in rows:
                n += len(pdf)
                # integer cents: exact accumulation, order-independent.
                # copysign(floor(|x|*100 + 0.5), x) = HALF-AWAY-FROM-ZERO —
                # the Spark F.round batch-oracle convention on BOTH signs
                # (plain floor(x*100+0.5) rounds negative half-cents toward
                # +inf: -12.5 -> -12 instead of -13; pandas .round() is
                # half-to-even and diverges on exact .5 either way)
                v = pdf["value"].to_numpy() * 100.0
                cents += int(
                    np.copysign(np.floor(np.abs(v) + 0.5), v)
                    .astype("int64")
                    .sum()
                )
            self._totals.update((n, cents))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [cents / 100.0],
                }
            )

        def close(self) -> None:
            pass

    spark = events.sparkSession
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType=(
                "user_id bigint, n_events bigint, total_value double"
            ),
            outputMode="Update",
            timeMode="None",
        )
    )


def _dedup_drop_ids(
    batch_sigs: DataFrame,
    store: DataFrame | None,
    *,
    n_perm: int,
    bands: int,
    min_est: float,
    broadcast_batch: bool,
    dedup_within_batch: bool,
):
    """The per-micro-batch drop set shared by the streaming ingests: docs
    matching a store signature (estimator >= min_est), plus — with
    ``dedup_within_batch`` — docs matching any SMALLER-doc_id doc of
    their own batch. None when neither source applies."""
    from credit_abs_oltp_to_mart_spark.operators import dedup as D

    drop = None
    if store is not None:
        drop = D.incremental_pairs_from_signatures(
            batch_sigs,
            store,
            n_perm=n_perm,
            bands=bands,
            min_est=min_est,
            broadcast_batch=broadcast_batch,
        ).select(F.col("new_doc_id").alias("doc_id"))
    if dedup_within_batch:
        within = (
            D.incremental_pairs_from_signatures(
                batch_sigs,
                batch_sigs,
                n_perm=n_perm,
                bands=bands,
                min_est=min_est,
                broadcast_batch=broadcast_batch,
            )
            .where(F.col("new_doc_id") > F.col("corpus_doc_id"))
            .select(F.col("new_doc_id").alias("doc_id"))
        )
        drop = within if drop is None else drop.unionByName(within)
    return drop


def stream_dedup_ingest(
    spark: SparkSession,
    slices_glob: str,
    out_dir: str,
    *,
    schema,
    n: int = 3,
    n_perm: int = 8,
    bands: int = 2,
    min_est: float = 0.25,
    seed: int = 42,
    broadcast_batch: bool = True,
    dedup_within_batch: bool = False,
    store_prebanded: bool = False,
    auto_compact_partitions: int | None = None,
) -> DataFrame:
    """Streaming corpus ingest with incremental dedup against a GROWING
    signature store — the 100 TB continuous-ingest shape, composing the
    streaming engine with the batch dedup kernels:

    each micro-batch (one arriving file via ``maxFilesPerTrigger=1``) is
    deduped against the persisted MinHash signature store
    (``incremental_minhash_pairs``: store scanned once, corpus text never
    re-read); the batch's SURVIVORS then write their signatures to the
    store, so later batches dedup against everything that survived before
    them. ``broadcast_batch`` picks the join physics for both the store
    check and the within-batch pass: True broadcasts the batch's banded
    signatures (the normal small-slice case), False falls back to a
    sort-merge join on the band key for corpus-sized slices.
    ``store_prebanded=True`` writes the LSH ``band_key`` INTO the store
    partitions (``bands`` rows per surviving doc instead of one), so every
    later batch's store scan skips the band explode entirely — the store
    side feeds the join straight off the scan, the batch operator's
    pre-banded layout (``dedup.py``) applied to the growing streaming
    store. The band shape is validated per row on scan, so a store
    written with different (n_perm, bands) fails loudly.

    Returns the (doc_id, ingest_batch) survivor table. Batch-sequential
    semantics: a doc is dropped iff its signature matches (estimator
    >= ``min_est``) a SURVIVOR of an earlier batch — and, with
    ``dedup_within_batch=True``, additionally iff it matches ANY
    smaller-doc_id doc of its OWN batch (whether or not that doc itself
    survives — the drop sets are independent, which keeps the contract
    order-free and exactly replayable by a batch engine). Exact
    within-batch duplicates need no separate pass: identical text yields
    an identical signature, estimator 1.0 >= ``min_est``. With the flag
    off, within-batch duplicates all survive (the store only grows
    between batches), the same contract as the batch
    ``incremental_minhash_pairs`` operator.

    Crash-replay idempotency (exactly-once output): the ONE sink is a
    BATCH-ID-SCOPED partition overwrite — survivors' signatures land in
    ``signature_store/batch=<id>/`` with mode("overwrite") on that
    partition path. A replayed batch (crash after the write but before
    the checkpoint commit) first EXCLUDES its own ``batch=<id>``
    partition from the store scan — so it never self-matches against its
    half-committed signatures — recomputes the identical survivor set,
    and overwrites the partition in place. There is no separate survivor
    sink: the store partition IS the survivor list (it holds exactly the
    surviving doc_ids), so the returned table is just a projection of
    the store — one write per batch, one source of truth.

    Scale posture: per-batch cost = one store scan + one join against the
    batch's banded signatures; the store is the only state and lives as
    plain partitioned parquet — restartable, auditable, DFS-friendly
    (probed via the reader, not driver-local filesystem calls), and
    shared with the batch pipeline's ``minhash_signatures`` writer.
    ``auto_compact_partitions`` arms the between-batches compaction
    trigger (``maintenance.maybe_compact_keyed_store``): when the store
    exceeds that many ``batch=`` partitions, the COMMITTED ones fold into
    one — results are bit-identical either way (the trigger only buys
    back the per-batch store-listing cost a long ingest accretes).
    """
    from pyspark.errors import AnalysisException

    from credit_abs_oltp_to_mart_spark.operators import dedup as D
    from credit_abs_oltp_to_mart_spark.sources.maintenance import (
        maybe_compact_keyed_store,
        resume_pending_compaction,
    )

    store_dir = os.path.join(out_dir, "signature_store")
    ck_dir = os.path.join(out_dir, "checkpoint")
    # heal a store left mid-compaction by a crash BEFORE reading it:
    # between compaction's partition deletes and its final rename, the
    # only copy of the merged history lives in a dot-prefixed dir Spark's
    # file index ignores — dedup-ing against that half-swapped store
    # would silently re-admit every previously-committed near-duplicate
    resume_pending_compaction(spark, store_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        # the gram-extraction regex dominates per-doc signature cost, and
        # the batch signatures feed up to THREE consumers (store check,
        # within-batch self-join, store append) — compute once, cache
        batch_sigs = D.minhash_signatures(
            batch_df, n=n, n_perm=n_perm, seed=seed
        ).persist()
        try:
            sess = batch_df.sparkSession
            try:
                # reader-based probe (works on hdfs://, s3a://, local
                # alike); a missing or still-empty store path raises
                # AnalysisException. Excluding this batch's own partition
                # is what makes crash REPLAY safe: a half-committed
                # batch=<id> partition must not match the batch against
                # itself. Partition pruning keeps the exclusion free.
                store = (
                    sess.read.parquet(store_dir)
                    .where(F.col("batch") != batch_id)
                    .drop("batch")
                )
            except AnalysisException:
                store = None
            drop = _dedup_drop_ids(
                batch_sigs,
                store,
                n_perm=n_perm,
                bands=bands,
                min_est=min_est,
                broadcast_batch=broadcast_batch,
                dedup_within_batch=dedup_within_batch,
            )
            if drop is not None:
                survivors = batch_df.join(
                    drop.distinct(), "doc_id", "left_anti"
                )
            else:
                survivors = batch_df
            # CHECKPOINT, not persist: the survivor plan references the
            # store PATH (through the match anti-join), and writing this
            # batch's signatures below invalidates any cache over that
            # path — a persisted frame would silently recompute against
            # the updated store, where every doc matches its own
            # just-written signature and the survivor set collapses to
            # empty. The eager localCheckpoint severs the lineage first.
            plancap.capture(survivors, f"survivors_batch{batch_id}")
            survivors = survivors.localCheckpoint(eager=True)
            # survivors' signatures = the cached batch signatures filtered
            # to the survivor ids — no second gram pass, and the ONLY
            # write: the store partition doubles as the survivor record.
            # ingest_batch rides INSIDE the files (not just the partition
            # key) so store compaction can merge old partitions without
            # losing the survivor labels.
            surv_sigs = batch_sigs.join(
                survivors.select("doc_id"), "doc_id", "left_semi"
            ).withColumn("ingest_batch", F.lit(batch_id).cast("long"))
            if store_prebanded:
                # bake the band explode into the store ONCE at write time
                # (bands rows per doc) — every later batch's scan then
                # skips it
                surv_sigs = surv_sigs.select(
                    "*", D._band_key_col(n_perm, bands)
                )
            surv_sigs.write.mode("overwrite").parquet(
                os.path.join(store_dir, f"batch={batch_id}")
            )
            if auto_compact_partitions is not None:
                maybe_compact_keyed_store(
                    sess,
                    store_dir,
                    commits_dir=os.path.join(ck_dir, "commits"),
                    max_partitions=auto_compact_partitions,
                )
        finally:
            batch_sigs.unpersist()
            batch_df.unpersist()

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(slices_glob)
    )
    query = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    # the in-file ingest_batch column, NOT the batch= partition key: after
    # sources.maintenance.compact_signature_store merges committed
    # partitions, the partition key no longer equals the original batch id
    # but the column always does
    out = spark.read.parquet(store_dir).select("doc_id", "ingest_batch")
    # a pre-banded store holds `bands` rows per surviving doc
    return out.distinct() if store_prebanded else out


def stream_corpus_ingest(
    spark: SparkSession,
    slices_glob: str,
    out_dir: str,
    *,
    schema,
    gram_store_path: str | None = None,
    n: int = 3,
    n_perm: int = 8,
    bands: int = 2,
    min_est: float = 0.25,
    seed: int = 42,
    decontam_n: int | None = None,
    max_overlap: float = 0.5,
    min_quality: float = 0.3,
    min_tokens: int = 8,
    keep_langs: tuple[str, ...] = ("en", "de", "es", "fr"),
    chunk_tokens: int = 64,
    bin_tokens: int = 256,
    shards: int = 8,
    broadcast_batch: bool = True,
    broadcast_gram_store: bool = True,
    dedup_within_batch: bool = True,
    store_prebanded: bool = False,
    on_batch_complete=None,
    tokenizer_word_frame: DataFrame | None = None,
    tokenizer_refresh_init: DataFrame | None = None,
    tokenizer_refresh_every: int = 2,
    tokenizer_merges: int = 8,
    return_packed: bool = False,
    return_segmented: bool = False,
    stage_times: dict | None = None,
    auto_compact_partitions: int | None = None,
    semantic_eval_store: str | None = None,
    semantic_doc_embeddings: DataFrame | None = None,
    semantic_centroids: dict | None = None,
    semantic_threshold: float = 0.4,
) -> DataFrame:
    """The COMPLETE incremental corpus pipeline per arriving micro-batch —
    the actual shape of a continuous 100 TB pretraining ingest, composing
    the batch pipeline's stages (``plans/corpus.py``) with the streaming
    engine's exactly-once machinery (``stream_dedup_ingest``):

      filter   — the fused map-only language/quality/length/PII gate
                 (``corpus.filter_documents``) applied to the raw batch;
      dedup    — the gated docs' MinHash signatures checked against the
                 GROWING signature store (earlier batches' ADMITTED docs)
                 and, with ``dedup_within_batch``, against same-batch
                 smaller-doc_id docs — same contract as
                 ``stream_dedup_ingest``;
      decontam — dedup survivors checked against a PERSISTED eval-gram
                 blocklist (``curation.build_eval_gram_store`` parquet at
                 ``gram_store_path`` — flat, or batch-keyed partitions
                 grown by ``curation.add_eval_suite``); docs with gram
                 overlap >= ``max_overlap`` are dropped. The pinned
                 broadcast refreshes when the store's file listing
                 changes, so a suite added MID-RUN blocks from the next
                 batch without a restart. ``None`` skips the stage (no
                 eval suites yet);
      pack     — admitted docs chunked + sequence-packed
                 (``curation.pack_chunks``: md5 shard routing, per-shard
                 end-to-end layout, fixed-width token bins) and written
                 under ``packed/batch=<id>/``. Bin numbering is
                 CONTINUOUS across batches: a tiny batch-scoped
                 ``pack_offsets`` state partition carries each shard's
                 running token total (same crash-replay discipline as
                 the signature store — a replayed batch reads only
                 strictly-earlier batches' offsets), so streamed shards
                 are byte-compatible with a single batch
                 ``pack_chunks`` run over the same docs in slice order.
                 With ``tokenizer_word_frame`` set (a TRAINED BPE word
                 frame, ``bpe.bpe_train`` — pinned once per run like the
                 blocklist), the pack stage becomes ``bpe.bpe_pack``:
                 shards hold the tokenizer's token-ID runs instead of
                 whitespace text — the streaming half of the
                 raw-text → trained-tokenizer → packed-shards chain,
                 offsets continuity included (the tokenizer is FIXED for
                 the run: retrain offline, re-tokenize on the next run —
                 the same regime as the ANN codebook).

    Store semantics: the signature store holds ADMITTED docs only (passed
    ALL three gates) — the store IS the corpus, so later near-dups of an
    admitted doc dedup away, while near-dups of a decontam-rejected doc
    are re-judged on their own text (and rejected by the same fixed
    blocklist). Crash-replay idempotency is ``stream_dedup_ingest``'s:
    both sinks are batch-id-scoped partition overwrites, the store scan
    excludes the batch's own partition, and a half-swapped compaction is
    healed at startup. Returns (doc_id, ingest_batch, n_chunks) for every
    admitted doc — a projection of the two sinks.

    Scale posture: per batch, ONE map-only filter pass, one signature
    projection (cached, three consumers), one store scan + band join
    (``broadcast_batch`` picks broadcast vs sort-merge;
    ``store_prebanded=True`` bakes the band_key into the store
    partitions so every later scan skips the band explode, exactly as
    in ``stream_dedup_ingest``), one gram semi-join against the
    blocklist (``broadcast_gram_store`` False = merge-hinted fallback),
    one shard shuffle for packing. State is plain
    partitioned parquet; the eval gram store is built offline and grown
    incrementally by partition appends (``on_batch_complete`` is the
    between-batches hook for suite additions / compaction triggers —
    called after the batch's sinks are written, before its commit).

    Replay caveat: because the hook runs BEFORE the checkpoint commit,
    a crash in that window replays the batch against any state the hook
    just mutated — a suite landed by the hook means the replay
    decontaminates against the GROWN blocklist and overwrites the
    batch's partitions with a (correctly) stricter admitted set. Replay
    is therefore self-consistent and never under-blocks, but it is not
    byte-identical to the pre-crash attempt when the hook mutates the
    blocklist; hooks needing byte-identical replay should snapshot their
    state keyed by batch_id and no-op on re-delivery.

    ``tokenizer_refresh_init`` switches the tokenizer from
    run-pinned to SELF-REFRESHING — ``stream_vocab_refresh``'s by-rule
    versioning threaded into the full corpus pipeline: batch b segments
    and packs its ADMITTED docs under vocabulary generation
    v(b) = b div ``tokenizer_refresh_every``, and generation v > 0 is
    trained (``bpe.bpe_train``, ``tokenizer_merges`` merges) on
    ``tokenizer_refresh_init`` plus exactly the ADMITTED docs of batches
    [0, v * refresh_every) — read from the ``admitted_docs`` batch-keyed
    store this mode additionally maintains. Both the version choice and
    the training set are pure functions of the batch id and
    strictly-earlier partitions, so crash replays and lost publishes
    re-derive identical vocabularies (no pointer-read caveat). Extra
    layout: ``admitted_docs/batch=<id>`` (raw admitted text),
    ``vocab/version=<v>`` (trained word frames), ``vocab_current``
    (consumer pointer, re-pinned after each publish),
    ``segmented/batch=<id>`` (per-doc stats under the pinned
    generation). ``return_segmented`` returns (doc_id, ingest_batch,
    vocab_version, n_words, n_bpe_tokens). Mutually exclusive with
    ``tokenizer_word_frame``.

    ``stage_times`` (ATTRIBUTION MODE, tools/isolated_bench.py): a
    mutable dict that accumulates per-stage wall seconds across
    batches (filter / signatures / dedup / decontam / pack /
    store_write). Timing a lazy chain requires stage-boundary
    materializations the production path deliberately fuses (an extra
    count on the two persisted frames, an extra checkpoint after the
    dedup anti-join), so the per-stage SUM slightly exceeds the
    untimed run's wall — use it to attribute cost, never as the
    headline number.

    ``auto_compact_partitions`` arms the between-batches signature-store
    compaction trigger (``maintenance.maybe_compact_keyed_store``) —
    the round-10 stage attribution put the store's per-batch file
    listing at 10.0 of this pipeline's 28.0 timed-stage seconds, and
    the existing ``compact_signature_store`` had no caller inside the
    loop. Fires after the batch's sinks are written, folds COMMITTED
    partitions only; admitted output is bit-identical either way.

    ``semantic_eval_store`` + ``semantic_doc_embeddings`` +
    ``semantic_centroids`` (all three together) arm the SEMANTIC
    decontamination stage after the gram one — the streaming half of
    ``plans.corpus.build_corpus(embeddings=...)``: the eval embedding
    store (parquet of (vec_id, embedding)) is pinned like the gram
    blocklist and RE-PINNED when its file listing changes (a suite of
    eval embeddings landed mid-run blocks from the next batch); arriving
    docs look up their embeddings in the pinned ``semantic_doc_
    embeddings`` frame (doc_id-keyed; docs without one pass untouched);
    both sides assign map-only against the FIXED trained
    ``semantic_centroids`` codebook — a flat ``{cid: centroid}`` dict
    (``ann.assign_against_codebook``, O(k) per vector) or the two-level
    ``{"coarse": ..., "sub": ...}`` form from ``kmeans.hier_train``
    (``ann.assign_against_hier_codebook``, O(sqrt(k)) — the scale form
    once the leaf count grows with the corpus); the same offline-train /
    online-assign regime as ``stream_ann_ingest``. Batch docs within
    ``semantic_threshold`` cosine of a same-cluster eval vector drop
    (``curation.semantic_decontaminate``). Batch doc_ids and eval
    vec_ids must be DISJOINT id spaces (validated per batch, fail-loud:
    a collision would cross-tag vectors across the union's cluster
    restriction). All gate state is fixed or strictly-pinned, so crash
    replays re-derive identical admitted sets (the mid-run
    suite-addition caveat above applies unchanged)."""
    from pyspark.errors import AnalysisException

    from credit_abs_oltp_to_mart_spark.operators import dedup as D
    from credit_abs_oltp_to_mart_spark.operators.curation import (
        DECONTAM_N,
        decontaminate_against_store,
        pack_chunks,
    )
    from credit_abs_oltp_to_mart_spark.plans.corpus import filter_documents
    from credit_abs_oltp_to_mart_spark.sources.maintenance import (
        maybe_compact_keyed_store,
        resume_pending_compaction,
    )

    n_grams = DECONTAM_N if decontam_n is None else decontam_n
    store_dir = os.path.join(out_dir, "signature_store")
    packed_dir = os.path.join(out_dir, "packed")
    offsets_dir = os.path.join(out_dir, "pack_offsets")
    ck_dir = os.path.join(out_dir, "checkpoint")
    adm_docs_dir = os.path.join(out_dir, "admitted_docs")
    vocab_dir = os.path.join(out_dir, "vocab")
    seg_dir = os.path.join(out_dir, "segmented")
    if tokenizer_refresh_init is not None and tokenizer_word_frame is not None:
        raise ValueError(
            "tokenizer_refresh_init and tokenizer_word_frame are mutually"
            " exclusive: refresh mode derives its own word frames"
        )
    resume_pending_compaction(spark, store_dir)
    from credit_abs_oltp_to_mart_spark.operators import bpe as B_bpe

    # the trained tokenizer is FIXED for the run: materialize the word
    # frame once (vocabulary-sized) so every batch's tokenize pass reads
    # the checkpoint, never re-derives it
    wf_pinned = (
        tokenizer_word_frame.localCheckpoint(eager=True)
        if tokenizer_word_frame is not None
        else None
    )
    # same rule for the derived per-word id table: a pure function of the
    # pinned word frame that every batch's pack pass would otherwise
    # rebuild (vocab window + roll-up + broadcast) once per micro-batch
    ids_pinned = (
        B_bpe.tokenizer_ids_table(wf_pinned).localCheckpoint(eager=True)
        if wf_pinned is not None
        else None
    )
    # the blocklist is pinned into the block manager (not re-scanned
    # every micro-batch), but NOT frozen for the run: each batch
    # re-checks the store's file listing (a metadata-only op) and
    # re-pins when a new suite partition has landed via
    # ``curation.add_eval_suite`` — a benchmark added MID-RUN starts
    # blocking from the next batch without a stream restart. The
    # dropDuplicates on the gram key is load-bearing either way: an
    # incrementally-extended multi-partition blocklist that hasn't been
    # through compact_gram_store carries duplicate grams, and the
    # decontam left join would fan out gram rows and over-count overlap.
    # Superseded pins are dropped by the context cleaner when the old
    # checkpoint frame is garbage-collected (suite additions are rare).
    pinned: dict = {"sig": None, "df": None}

    def _pin_gram_store(sess: SparkSession):
        if gram_store_path is None:
            return None
        raw = sess.read.parquet(gram_store_path)
        sig = tuple(sorted(raw.inputFiles()))
        if sig != pinned["sig"]:
            pinned["df"] = (
                raw.select("gram")
                .dropDuplicates(["gram"])
                .localCheckpoint(eager=True)
            )
            pinned["sig"] = sig
        return pinned["df"]

    _pin_gram_store(spark)

    sem_armed = semantic_eval_store is not None
    if sem_armed and (
        semantic_doc_embeddings is None or semantic_centroids is None
    ):
        raise ValueError(
            "semantic decontamination needs all three of"
            " semantic_eval_store, semantic_doc_embeddings and"
            " semantic_centroids (fixed trained codebook)"
        )
    # doc-embedding lookup: pinned ONCE per run (doc vectors are input
    # data, not state); eval store: pinned like the gram blocklist and
    # re-pinned on a listing change, with its codebook assignment
    # precomputed at pin time (map-only, eval-suite-sized)
    sem_doc_emb = (
        semantic_doc_embeddings.select("vec_id", "embedding")
        .localCheckpoint(eager=True)
        if sem_armed
        else None
    )
    # ``semantic_centroids`` is either a FLAT codebook ({cid: centroid},
    # assign_against_codebook — O(k) per vector) or a TWO-LEVEL one
    # ({"coarse": {...}, "sub": {ccl: {scid: ...}}} from
    # ``kmeans.hier_train`` — assign_against_hier_codebook, O(sqrt(k));
    # the scale form once the leaf count grows with the corpus). Both
    # are map-only against one broadcast/literal codebook; the dispatch
    # is shared by the eval-store pin and the per-batch candidate side
    # so both sets always assign under the same rule.
    sem_hier = sem_armed and set(semantic_centroids) == {"coarse", "sub"}

    def _sem_assign(frame: DataFrame) -> DataFrame:
        from credit_abs_oltp_to_mart_spark.operators import ann as A

        if sem_hier:
            return A.assign_against_hier_codebook(
                frame,
                semantic_centroids["coarse"],
                semantic_centroids["sub"],
            )
        return A.assign_against_codebook(frame, semantic_centroids)

    sem_pinned: dict = {"sig": None, "emb": None, "assign": None}

    def _pin_eval_embeddings(sess: SparkSession):
        if not sem_armed:
            return None, None

        raw = sess.read.parquet(semantic_eval_store)
        sig = tuple(sorted(raw.inputFiles()))
        if sig != sem_pinned["sig"]:
            emb = raw.select("vec_id", "embedding").localCheckpoint(
                eager=True
            )
            sem_pinned["emb"] = emb
            sem_pinned["assign"] = _sem_assign(emb).localCheckpoint(
                eager=True
            )
            sem_pinned["sig"] = sig
        return sem_pinned["emb"], sem_pinned["assign"]

    _pin_eval_embeddings(spark)

    # tokenizer-refresh mode: one trained word frame per vocabulary
    # generation, derived BY RULE (version v trains on init + admitted
    # docs of batches < v*refresh_every — strictly-earlier partitions,
    # so replays re-derive byte-identical vocabularies); pinned per run
    vocab_cache: dict[int, tuple[DataFrame, DataFrame]] = {}

    def _vocab_for(
        sess: SparkSession, version: int
    ) -> tuple[DataFrame, DataFrame]:
        """(word frame, per-word id table) for a vocabulary generation,
        both checkpointed once per generation — batches under the same
        generation reuse the plans instead of re-deriving them."""
        if version in vocab_cache:
            return vocab_cache[version]
        from credit_abs_oltp_to_mart_spark.operators import bpe as B

        vdir = os.path.join(vocab_dir, f"version={version}")
        try:
            wf = sess.read.parquet(vdir)
        except AnalysisException:
            # first batch of the segment (or a lost publish): self-heal
            # by retraining from the rule's exact corpus
            train = tokenizer_refresh_init.select("doc_id", "text")
            bound = version * tokenizer_refresh_every
            if bound > 0:
                try:
                    earlier = (
                        sess.read.option("basePath", adm_docs_dir)
                        .parquet(adm_docs_dir)
                        .where(F.col("batch") < bound)
                        .select("doc_id", "text")
                    )
                    train = train.unionByName(earlier)
                except AnalysisException:
                    pass  # no admitted docs yet — init-only regime
            _, wf_t = B.bpe_train(train, tokenizer_merges)
            wf_t.write.mode("overwrite").parquet(vdir)
            # consumer-facing pointer, re-pinned AFTER the publish
            local_rows(
                sess, [(int(version),)], "version int"
            ).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(out_dir, "vocab_current")
            )
            wf = sess.read.parquet(vdir)
        wf = wf.localCheckpoint(eager=True)
        ids = B_bpe.tokenizer_ids_table(wf).localCheckpoint(eager=True)
        vocab_cache[version] = (wf, ids)
        return wf, ids

    # generation 0 trains on the init corpus alone (bound = 0), so it is
    # fully determined before the first batch arrives — train it on a
    # driver thread DURING stream startup (guide §2.6) instead of inside
    # batch 0's wall. The rule-derived result is identical; batch 0 joins
    # the future (and any training failure re-raises there).
    vocab_futures: dict = {}
    if tokenizer_refresh_init is not None:
        from concurrent.futures import ThreadPoolExecutor

        _vpool = ThreadPoolExecutor(max_workers=1)
        vocab_futures[0] = _vpool.submit(_vocab_for, spark, 0)
        _vpool.shutdown(wait=False)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        import time as _time_mod

        def _mark(key: str, t0: float) -> float:
            if stage_times is not None:
                now = _time_mod.perf_counter()
                stage_times[key] = stage_times.get(key, 0.0) + (now - t0)
                return now
            return t0

        sess = batch_df.sparkSession
        gram_store = _pin_gram_store(sess)
        t0 = _time_mod.perf_counter()
        gated = filter_documents(
            batch_df,
            min_quality=min_quality,
            min_tokens=min_tokens,
            keep_langs=keep_langs,
        ).persist()
        if stage_times is not None:
            gated.count()  # boundary materialization (attribution mode)
        t0 = _mark("filter", t0)
        batch_sigs = D.minhash_signatures(
            gated, n=n, n_perm=n_perm, seed=seed
        ).persist()
        if stage_times is not None:
            batch_sigs.count()
        t0 = _mark("signatures", t0)
        try:
            try:
                store = (
                    sess.read.parquet(store_dir)
                    .where(F.col("batch") != batch_id)
                    .drop("batch")
                )
            except AnalysisException:
                store = None
            drop = _dedup_drop_ids(
                batch_sigs,
                store,
                n_perm=n_perm,
                bands=bands,
                min_est=min_est,
                broadcast_batch=broadcast_batch,
                dedup_within_batch=dedup_within_batch,
            )
            if drop is not None:
                survivors = gated.join(drop.distinct(), "doc_id", "left_anti")
            else:
                survivors = gated
            if stage_times is not None:
                survivors = survivors.localCheckpoint(eager=True)
            t0 = _mark("dedup", t0)
            if gram_store is not None:
                verdicts = decontaminate_against_store(
                    survivors,
                    gram_store,
                    n=n_grams,
                    max_overlap=max_overlap,
                    broadcast_store=broadcast_gram_store,
                )
                admitted = survivors.join(
                    verdicts.where(F.col("dropped")).select("doc_id"),
                    "doc_id",
                    "left_anti",
                )
            else:
                admitted = survivors
            if sem_armed:
                from credit_abs_oltp_to_mart_spark.operators.curation import (
                    semantic_decontaminate,
                )

                ev_emb, ev_assign = _pin_eval_embeddings(sess)
                # only candidates WITH an embedding are judged; the
                # batch side assigns map-only against the fixed codebook
                cand_vecs = sem_doc_emb.join(
                    admitted.select(F.col("doc_id").alias("vec_id")),
                    "vec_id",
                    "left_semi",
                )
                # the union below treats batch doc_ids and eval vec_ids
                # as ONE id space; a collision would cross-tag a vector
                # with the other set's cluster, inflating candidate
                # pairs and duplicating verdict rows — fail loudly
                # instead (broadcast semi-join against the pinned eval
                # ids + limit(1): map-only, early-exit)
                collided = (
                    cand_vecs.select("vec_id")
                    .join(
                        F.broadcast(ev_emb.select("vec_id")),
                        "vec_id",
                        "left_semi",
                    )
                    .limit(1)
                    .collect()
                )
                if collided:
                    raise ValueError(
                        "stream_corpus_ingest: batch doc_id"
                        f" {collided[0]['vec_id']} collides with an eval"
                        " vec_id in the semantic eval store — the two id"
                        " spaces must be disjoint (namespace one of them"
                        " upstream) or the cluster restriction would"
                        " cross-tag vectors"
                    )
                assignments = _sem_assign(cand_vecs).unionByName(ev_assign)
                sem_drop = (
                    semantic_decontaminate(
                        cand_vecs,
                        ev_emb,
                        assignments,
                        threshold=semantic_threshold,
                    )
                    .where(F.col("dropped"))
                    .select(F.col("vec_id").alias("doc_id"))
                )
                admitted = admitted.join(
                    F.broadcast(sem_drop), "doc_id", "left_anti"
                )
            # same lineage-severing checkpoint as stream_dedup_ingest:
            # the admitted plan reads the store path, which the signature
            # write below invalidates
            plancap.capture(admitted, f"admitted_batch{batch_id}")
            admitted = admitted.localCheckpoint(eager=True)
            t0 = _mark("decontam", t0)
            wf_run, ids_run = wf_pinned, ids_pinned
            if tokenizer_refresh_init is not None:
                # vocab for THIS batch trains on strictly-earlier
                # admitted partitions (bound v*refresh_every <= batch),
                # so it must resolve BEFORE this batch's own writes
                v_gen = int(batch_id) // tokenizer_refresh_every
                fut = vocab_futures.pop(v_gen, None)
                wf_run, ids_run = (
                    fut.result() if fut is not None else _vocab_for(
                        sess, v_gen
                    )
                )

            # The batch's sink writes form INDEPENDENT chains once
            # `admitted` is checkpointed and wf_run/ids_run are resolved:
            # (packed -> offsets read-back), (signature store -> compact),
            # and in refresh mode (admitted docs), (segment stats). Running
            # them sequentially paid 4-6 parquet round-trips of pure job
            # latency per micro-batch; a small driver pool overlaps the
            # chains (guide §2.6) so the tail costs max() instead of
            # sum(). Order WITHIN a chain is preserved (offsets read back
            # the packed partition; compact folds the store only after
            # this batch's partition lands). Attribution mode
            # (stage_times set) stays sequential so the per-stage walls
            # keep meaning what they say.
            def _refresh_writes():
                (
                    admitted.select("doc_id", "text")
                    .write.mode("overwrite")
                    .parquet(os.path.join(adm_docs_dir, f"batch={batch_id}"))
                )

            def _seg_writes():
                from credit_abs_oltp_to_mart_spark.operators import bpe as B

                v = int(batch_id) // tokenizer_refresh_every
                (
                    B.bpe_segment_stats(
                        admitted.select("doc_id", "text"), wf_run
                    )
                    .withColumn("vocab_version", F.lit(v).cast("int"))
                    .select("doc_id", "vocab_version", "n_words",
                            "n_bpe_tokens")
                    .write.mode("overwrite")
                    .parquet(os.path.join(seg_dir, f"batch={batch_id}"))
                )

            def _pack_chain():
                if wf_run is not None:
                    from credit_abs_oltp_to_mart_spark.operators.bpe import (
                        bpe_pack,
                    )

                    packed = bpe_pack(
                        admitted,
                        wf_run,
                        chunk_tokens=chunk_tokens,
                        bin_tokens=bin_tokens,
                        shards=shards,
                        ids_table=ids_run,
                    )
                else:
                    packed = pack_chunks(
                        admitted,
                        chunk_tokens=chunk_tokens,
                        bin_tokens=bin_tokens,
                        shards=shards,
                    )
                # per-shard running offsets from STRICTLY earlier batches
                # (a replayed batch never sees its own prior write), so the
                # stream's bin numbering continues where the last batch
                # stopped — byte-compatible with one batch pack over the
                # same docs in slice order
                try:
                    base = (
                        sess.read.parquet(offsets_dir)
                        .where(F.col("batch") < batch_id)
                        .groupBy("shard")
                        .agg(F.sum("batch_tokens").alias("__base"))
                    )
                except AnalysisException:
                    base = None
                if base is not None:
                    packed_b = (
                        packed.join(F.broadcast(base), "shard", "left")
                        .withColumn(
                            "start_tok",
                            F.col("start_tok")
                            + F.coalesce(F.col("__base"), F.lit(0)),
                        )
                        .withColumn(
                            "bin", F.expr(f"start_tok div {bin_tokens}")
                        )
                        .drop("__base")
                    )
                else:
                    packed_b = packed
                packed_out = packed_b.withColumn(
                    "ingest_batch", F.lit(batch_id).cast("long")
                )
                plancap.capture(packed_out, f"packed_batch{batch_id}")
                packed_out.write.mode("overwrite").parquet(
                    os.path.join(packed_dir, f"batch={batch_id}")
                )
                # record this batch's per-shard token totals for the next
                # batch's offsets (read back from the sink: cheap, and the
                # totals are crash-consistent with what was written)
                (
                    sess.read.parquet(
                        os.path.join(packed_dir, f"batch={batch_id}")
                    )
                    .groupBy("shard")
                    .agg(
                        F.sum("n_tokens").cast("long").alias("batch_tokens")
                    )
                    .write.mode("overwrite")
                    .parquet(os.path.join(offsets_dir, f"batch={batch_id}"))
                )

            def _store_chain():
                adm_sigs = batch_sigs.join(
                    admitted.select("doc_id"), "doc_id", "left_semi"
                ).withColumn("ingest_batch", F.lit(batch_id).cast("long"))
                if store_prebanded:
                    # bake the band explode into the store once at write
                    # time — the same pre-banded layout as
                    # stream_dedup_ingest
                    adm_sigs = adm_sigs.select(
                        "*", D._band_key_col(n_perm, bands)
                    )
                adm_sigs.write.mode("overwrite").parquet(
                    os.path.join(store_dir, f"batch={batch_id}")
                )

            def _compact():
                maybe_compact_keyed_store(
                    sess,
                    store_dir,
                    commits_dir=os.path.join(ck_dir, "commits"),
                    max_partitions=auto_compact_partitions,
                )

            chains = []
            if tokenizer_refresh_init is not None:
                chains.append(_refresh_writes)
                chains.append(_seg_writes)
            chains.append(_pack_chain)
            if auto_compact_partitions is not None:
                chains.append(lambda: (_store_chain(), _compact()))
            else:
                chains.append(_store_chain)
            if stage_times is None:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(
                    max_workers=min(4, len(chains))
                ) as pool:
                    futures = [pool.submit(c) for c in chains]
                    for fut in futures:
                        fut.result()  # propagate the first failure
            else:
                for c in chains[:-1]:
                    c()
                t0 = _mark("pack", t0)
                if auto_compact_partitions is not None:
                    _store_chain()
                    t0 = _mark("store_write", t0)
                    _compact()
                    t0 = _mark("auto_compact", t0)
                else:
                    _store_chain()
                    t0 = _mark("store_write", t0)
            # if the NEXT batch opens a new vocabulary generation, its
            # training corpus (admitted docs of batches <= this one) is
            # complete the moment this batch's writes land — train it on
            # a driver thread NOW so it overlaps the next batch's
            # admission stages (filter/signatures/dedup/decontam run
            # before the vocab is needed; guide §2.6). Rule-derived from
            # the same partitions a synchronous call would read, so the
            # result is identical; the next batch joins the future.
            if tokenizer_refresh_init is not None:
                nv = (int(batch_id) + 1) // tokenizer_refresh_every
                if (
                    nv != int(batch_id) // tokenizer_refresh_every
                    and nv not in vocab_cache
                    and nv not in vocab_futures
                ):
                    from concurrent.futures import ThreadPoolExecutor

                    _np = ThreadPoolExecutor(max_workers=1)
                    vocab_futures[nv] = _np.submit(_vocab_for, sess, nv)
                    _np.shutdown(wait=False)
            # between-batches hook: metrics, store compaction triggers,
            # or landing a new eval suite (add_eval_suite) that the NEXT
            # batch's re-pin picks up — runs after this batch's sinks
            # are fully written, before the checkpoint commit
            if on_batch_complete is not None:
                on_batch_complete(batch_id)
        finally:
            batch_sigs.unpersist()
            gated.unpersist()

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(slices_glob)
    )
    query = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    if return_segmented:
        # per-doc stats under each batch's PINNED vocabulary generation
        return spark.read.parquet(seg_dir).select(
            "doc_id",
            F.col("batch").cast("long").alias("ingest_batch"),
            "vocab_version",
            "n_words",
            "n_bpe_tokens",
        )
    if return_packed:
        # the packed shards themselves (cross-batch bin numbering and
        # all) — the trainer-facing artifact
        return spark.read.parquet(packed_dir)
    admitted = spark.read.parquet(store_dir).select("doc_id", "ingest_batch")
    if store_prebanded:
        admitted = admitted.distinct()  # `bands` rows per admitted doc
    chunks = (
        spark.read.parquet(packed_dir)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_chunks"))
    )
    return admitted.join(chunks, "doc_id")


def stream_ann_ingest(
    spark: SparkSession,
    slices_glob: str,
    index_dir: str,
    *,
    schema,
    levels: int = 256,
    vec_col: str = "embedding",
    codebook_as_literals: bool | None = None,
    auto_compact_partitions: int | None = None,
) -> DataFrame:
    """Continuous maintenance of the persisted IVF index
    (``ann.build_ivf_index``): micro-batches of NEW vectors are assigned
    to the FIXED trained codebook and appended as quantized postings —
    the production regime for a served vector index (retrain offline,
    assign online; the index never goes down for ingest).

    Per micro-batch (map-only, nothing shuffles):
      * assignment via ``ann.assign_against_codebook`` — bit-parity with
        the assignment the index was BUILT under (same integer argmin,
        same tiebreak), so an ingested vector lands exactly where a full
        rebuild would put it;
      * scalar quantization via ``ann.quantize_embeddings`` — identical
        arithmetic to the base postings' codes;
      * ONE sink: a batch-id-scoped partition overwrite under
        ``<index_dir>/postings_inc/batch=<id>/`` with the cluster as an
        in-file column. Batch output depends only on the batch input and
        the fixed codebook (no store reads), so a crash replay rewrites
        byte-identical data over its own partition — idempotent without
        any exclusion dance.

    ``ann.ivf_index_probe(..., include_incremental=True)`` serves base
    UNION incremental; ``sources.maintenance.compact_keyed_store`` folds
    the accreting batch partitions (they are exactly its contract:
    batch-keyed, ingest_batch in-file), automatically between batches
    when ``auto_compact_partitions`` is set (committed partitions only —
    an uncommitted batch's replay still byte-identically overwrites its
    own untouched partition). The codebook is loaded ONCE per
    run — O(k*dim) — and shipped into every batch through the shared
    literal/broadcast kernel.

    Returns (vec_id, cluster, ingest_batch) for everything ingested."""
    from credit_abs_oltp_to_mart_spark.operators import ann as A
    from credit_abs_oltp_to_mart_spark.sources.maintenance import (
        maybe_compact_keyed_store,
        resume_pending_compaction,
    )

    inc_dir = os.path.join(index_dir, "postings_inc")
    ck_dir = os.path.join(index_dir, "ingest_checkpoint")
    # heal a half-swapped compaction BEFORE any probe/scan of the store
    resume_pending_compaction(spark, inc_dir)
    cents = A.load_index_codebook(spark, index_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        assigned = A.assign_against_codebook(
            batch_df,
            cents,
            vec_col=vec_col,
            codebook_as_literals=codebook_as_literals,
        )
        codes = A.quantize_embeddings(
            batch_df, vec_col=vec_col, levels=levels
        ).select(
            "vec_id",
            "codes",
            F.col("scale_min").alias("mn"),
            (F.col("scale_max") - F.col("scale_min")).alias("sp"),
        )
        appended = codes.join(assigned, "vec_id").withColumn(
            "ingest_batch", F.lit(batch_id).cast("long")
        )
        plancap.capture(appended, f"appended_batch{batch_id}")
        appended.write.mode("overwrite").parquet(
            os.path.join(inc_dir, f"batch={batch_id}")
        )
        if auto_compact_partitions is not None:
            maybe_compact_keyed_store(
                batch_df.sparkSession,
                inc_dir,
                commits_dir=os.path.join(ck_dir, "commits"),
                max_partitions=auto_compact_partitions,
            )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(slices_glob)
    )
    query = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.read.parquet(inc_dir).select(
        "vec_id", "cluster", "ingest_batch"
    )


def stream_pq_ingest(
    spark: SparkSession,
    slices_glob: str,
    index_dir: str,
    *,
    schema,
    vec_col: str = "embedding",
    codebook_as_literals: bool | None = None,
    auto_compact_partitions: int | None = None,
) -> DataFrame:
    """Continuous maintenance of the persisted IVF-PQ index
    (``ann.build_pq_index``) — the product-quantized twin of
    ``stream_ann_ingest``: micro-batches of NEW vectors encode against
    the FIXED persisted codebooks (coarse assignment + per-subspace
    argmin, exact residuals under by_residual — all via
    ``ann.pq_ingest_batch``, bit-parity with a rebuild) and append as
    batch-scoped partitions under ``postings_inc/batch=<id>``; when the
    index carries a refine tier, each batch's SQ payload lands in
    ``refine_inc`` too, so refined probes stay consistent.

    All three codebook tables are cold-read ONCE per run
    (``ann.load_pq_index``, O(k*dim) driver state) and shipped into
    every batch through the shared literal/broadcast kernels. Batch
    output depends only on the batch input and the fixed codebooks, so
    a crash replay rewrites byte-identical data over its own partition —
    idempotent without an exclusion dance.
    ``ann.pq_index_probe(..., include_incremental=True)`` serves base
    UNION incremental with read-your-latest dedup.
    ``auto_compact_partitions`` arms the between-batches trigger over
    BOTH accreting stores (``postings_inc`` and, when the index carries
    a refine tier, ``refine_inc`` — committed partitions only). Returns
    (vec_id, cluster, ingest_batch) for everything ingested."""
    from credit_abs_oltp_to_mart_spark.operators import ann as A
    from credit_abs_oltp_to_mart_spark.sources.maintenance import (
        maybe_compact_keyed_store,
        resume_pending_compaction,
    )

    inc_dir = os.path.join(index_dir, "postings_inc")
    refine_dir = os.path.join(index_dir, "refine_inc")
    ck_dir = os.path.join(index_dir, "ingest_checkpoint")
    resume_pending_compaction(spark, inc_dir)
    resume_pending_compaction(spark, refine_dir)
    loaded = A.load_pq_index(spark, index_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        A.pq_ingest_batch(
            batch_df,
            index_dir,
            batch_id=batch_id,
            vec_col=vec_col,
            codebook_as_literals=codebook_as_literals,
            loaded=loaded,
        )
        if auto_compact_partitions is not None:
            sess = batch_df.sparkSession
            for store in (inc_dir, refine_dir):
                maybe_compact_keyed_store(
                    sess,
                    store,
                    commits_dir=os.path.join(ck_dir, "commits"),
                    max_partitions=auto_compact_partitions,
                )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(slices_glob)
    )
    query = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.read.parquet(inc_dir).select(
        "vec_id", "cluster", "ingest_batch"
    )


def stream_vocab_refresh(
    spark: SparkSession,
    slices_glob: str,
    init_docs: DataFrame,
    out_dir: str,
    *,
    schema,
    n_merges: int = 8,
    refresh_every: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Streaming tokenizer-vocabulary REFRESH — the production loop where
    the deployed tokenizer periodically retrains on the grown corpus and
    consumers atomically re-pin (the ``add_eval_suite`` re-pin pattern
    applied to the word frame): micro-batches of new docs are segmented
    under the vocabulary generation PINNED for that batch, appended to
    the docs store, and every ``refresh_every`` batches the tokenizer
    retrains on EVERYTHING ingested so far and publishes the next
    versioned vocabulary partition.

    Determinism is BY RULE, not by pointer: batch b segments under
    version v(b) = b div ``refresh_every``, and version v > 0 is trained
    on ``init_docs`` plus exactly the batches [0, v*refresh_every) —
    both pure functions of the batch id, so a crash replay of batch b
    re-derives the same vocabulary even if a newer version was already
    published before the crash (the pointer-read design would segment
    the replayed batch under the NEWER vocab — the replay caveat
    ``stream_corpus_ingest`` documents; the rule sidesteps it). Missing
    versions self-heal: the first batch of a segment retrains its own
    vocabulary from the store if the publish was lost.

    Layout under ``out_dir``:
      ``docs_store/batch=<id>``    ingested docs (batch-scoped idempotent);
      ``vocab/version=<v>``        the trained word frames (word, cnt, syms);
      ``vocab_current``            one-row consumer pointer (version) —
                                   re-pinned AFTER each publish;
      ``segmented/batch=<id>``     per-doc stats under the pinned vocab
                                   (doc_id, vocab_version, n_words,
                                   n_bpe_tokens);
      ``checkpoint``               stream offsets.

    Per batch: one segmentation pass (broadcast word join), one docs
    append; on refresh boundaries one ``bpe_train`` over the store (the
    word-table-sized merge loop). Returns the segmented store:
    (batch, doc_id, vocab_version, n_words, n_bpe_tokens)."""
    from pyspark.errors import AnalysisException

    from credit_abs_oltp_to_mart_spark.operators import bpe as B

    docs_dir = os.path.join(out_dir, "docs_store")
    vocab_dir = os.path.join(out_dir, "vocab")
    seg_dir = os.path.join(out_dir, "segmented")
    ck_dir = os.path.join(out_dir, "checkpoint")

    def _train_set(upto_batch: int) -> DataFrame:
        sel = init_docs.select("doc_id", text_col)
        if upto_batch > 0:
            try:
                store = (
                    spark.read.option("basePath", docs_dir)
                    .parquet(docs_dir)
                    .where(F.col("batch") < upto_batch)
                    .select("doc_id", text_col)
                )
                sel = sel.unionByName(store)
            except AnalysisException:
                pass  # no store yet — version 0 regime
        return sel

    def _publish(version: int) -> None:
        _, wf = B.bpe_train(
            _train_set(version * refresh_every),
            n_merges,
            text_col=text_col,
        )
        wf.write.mode("overwrite").parquet(
            os.path.join(vocab_dir, f"version={version}")
        )
        # consumer-facing pointer, re-pinned AFTER the publish (atomic
        # via the parquet commit protocol — readers see old or new)
        local_rows(
            spark, [(int(version),)], "version int"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, "vocab_current")
        )

    # vocabulary pinned once per generation (batches under the same
    # generation reuse the checkpointed word frame instead of re-reading
    # and re-broadcasting the vocab partition per micro-batch)
    wf_cache: dict[int, DataFrame] = {}

    def _wf_for(v: int) -> DataFrame:
        if v in wf_cache:
            return wf_cache[v]
        vdir = os.path.join(vocab_dir, f"version={v}")
        try:
            wf = spark.read.parquet(vdir)
        except AnalysisException:
            _publish(v)  # first batch of the segment (or lost publish)
            wf = spark.read.parquet(vdir)
        wf = wf.localCheckpoint(eager=True)
        wf_cache[v] = wf
        return wf

    # generation 0 trains on init_docs alone — fully determined before the
    # first batch arrives, so train/publish it on a driver thread DURING
    # stream startup (guide §2.6); batch 0 joins the future
    from concurrent.futures import ThreadPoolExecutor

    _vpool = ThreadPoolExecutor(max_workers=1)
    wf_futures = {0: _vpool.submit(_wf_for, 0)}
    _vpool.shutdown(wait=False)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        b = int(batch_id)
        v = b // refresh_every
        fut = wf_futures.pop(v, None)
        wf = fut.result() if fut is not None else _wf_for(v)
        seg = B.bpe_segment_stats(
            batch_df.select("doc_id", text_col), wf, text_col=text_col
        )
        plancap.capture(seg, f"seg_batch{b}")

        def _seg_write():
            (
                seg.withColumn("vocab_version", F.lit(v).cast("int"))
                .select(
                    "doc_id", "vocab_version", "n_words", "n_bpe_tokens"
                )
                .write.mode("overwrite")
                .parquet(os.path.join(seg_dir, f"batch={b}"))
            )

        def _docs_write():
            batch_df.write.mode("overwrite").parquet(
                os.path.join(docs_dir, f"batch={b}")
            )

        # the segmented stats and the docs-store append are independent
        # sinks — overlap them (guide §2.6)
        with ThreadPoolExecutor(max_workers=2) as pool:
            for fut in [pool.submit(_seg_write), pool.submit(_docs_write)]:
                fut.result()
        # if the NEXT batch opens a new generation, its training corpus
        # (docs-store batches <= this one) is complete as of the append
        # above — train it now on a driver thread so it overlaps the
        # next batch's segmentation (same rule-derived corpus as a
        # synchronous call; the next batch joins the future)
        nv = (b + 1) // refresh_every
        if nv != v and nv not in wf_cache and nv not in wf_futures:
            _np = ThreadPoolExecutor(max_workers=1)
            wf_futures[nv] = _np.submit(_wf_for, nv)
            _np.shutdown(wait=False)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(slices_glob)
    )
    query = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.read.parquet(seg_dir).select(
        F.col("batch").cast("int").alias("batch"),
        "doc_id",
        "vocab_version",
        "n_words",
        "n_bpe_tokens",
    )


def stream_postings_ingest(
    spark: SparkSession,
    slices_glob: str,
    store_dir: str,
    *,
    schema,
    text_col: str = "text",
    auto_compact_partitions: int | None = None,
) -> DataFrame:
    """Continuous maintenance of the persisted BM25 postings store
    (``retrieval.build_postings_store``) — the retrieval twin of
    ``stream_ann_ingest``: micro-batches of NEW documents are tokenized
    into postings under the store's FIXED bucket hash and appended as
    batch-scoped partitions, with a per-batch totals delta riding along
    so serving never rescans the corpus for N/T.

    Per micro-batch (one tokenize pass, one (term, doc_id) count
    shuffle — the ``doc_postings`` shape):
      * postings (term, doc_id, tf, dl, bucket) -> overwrite
        ``<store>/postings_inc/batch=<id>/``;
      * totals delta (n_docs, n_toks — counting token-less docs too) ->
        overwrite ``<store>/totals_inc/batch=<id>/``.
    Both are pure functions of the batch input, so a crash replay
    rewrites byte-identical partitions over its own batch directories —
    idempotent without any exclusion dance.

    ``retrieval.bm25_store_probe(..., include_incremental=True)`` serves
    base UNION overlay with read-your-latest dedup;
    ``sources.maintenance.compact_keyed_store`` folds the accreting
    batch partitions (their exact contract: batch-keyed, ingest_batch
    in-file), automatically between batches over BOTH stores when
    ``auto_compact_partitions`` is set (committed partitions only). A
    store REBUILD clears the overlay + this checkpoint.

    Returns (doc_id, ingest_batch, n_terms) for everything ingested."""
    from credit_abs_oltp_to_mart_spark.operators import retrieval as R
    from credit_abs_oltp_to_mart_spark.sources.maintenance import (
        maybe_compact_keyed_store,
        resume_pending_compaction,
    )

    inc_dir = os.path.join(store_dir, "postings_inc")
    tot_dir = os.path.join(store_dir, "totals_inc")
    ck_dir = os.path.join(store_dir, "ingest_checkpoint")
    resume_pending_compaction(spark, inc_dir)
    resume_pending_compaction(spark, tot_dir)  # same keyed-store protocol
    n_buckets = R.load_store_totals(spark, store_dir)["n_buckets"]

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        post, delta = R.batch_postings(
            batch_df, n_buckets=n_buckets, text_col=text_col
        )
        sess = batch_df.sparkSession

        # the two stores form independent (write -> compact) chains over
        # pure functions of the batch — overlap them (guide §2.6), order
        # preserved WITHIN each chain (a store compacts only after its
        # own batch partition lands)
        def _chain(df: DataFrame, store: str) -> None:
            df.withColumn(
                "ingest_batch", F.lit(batch_id).cast("long")
            ).write.mode("overwrite").parquet(
                os.path.join(store, f"batch={batch_id}")
            )
            if auto_compact_partitions is not None:
                maybe_compact_keyed_store(
                    sess,
                    store,
                    commits_dir=os.path.join(ck_dir, "commits"),
                    max_partitions=auto_compact_partitions,
                )

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            futures = [
                pool.submit(_chain, post, inc_dir),
                pool.submit(_chain, delta.coalesce(1), tot_dir),
            ]
            for fut in futures:
                fut.result()  # propagate the first failure

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(slices_glob)
    )
    query = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return (
        spark.read.parquet(inc_dir)
        .groupBy("doc_id", "ingest_batch")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_terms"))
    )
