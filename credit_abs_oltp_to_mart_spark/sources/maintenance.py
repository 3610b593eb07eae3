"""Lake maintenance: small-file compaction.

Incremental loads (`plans/incremental.py`, streaming foreachBatch sinks)
append many small files per partition; at 100 TB the resulting file-count
explosion dominates scan planning time and kills read throughput (every
file is an open + footer read + a task). Compaction rewrites a table (or
selected partitions) into right-sized files.

Sizing is computed from the data, not guessed: a sample-free row-count +
on-disk byte estimate picks ``ceil(bytes / target_file_bytes)`` output
files. The rewrite uses ``repartition(n)`` (round-robin, even file sizes)
— NOT ``coalesce(n)``, which merges co-located partitions unevenly and
can skew file sizes badly; evenness is the point of compaction. The
rewrite is atomic per directory via write-to-temp + rename.
"""

from __future__ import annotations

import json
import math
import os
import re
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def compact_dir(
    spark: SparkSession,
    path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
    cluster_by: str | None = None,
) -> dict:
    """Compact one parquet directory in place; returns a stats dict.

    No-op (returns the stats, writes nothing) when the directory already
    has fewer than ``min_files_to_compact`` data files or is already at or
    under the target file count.

    ``cluster_by`` re-establishes a sort-clustered layout DURING the
    rewrite (range partition + within-file sort on that column) — append
    streams interleave values across small files, so compaction is exactly
    the moment data-skipping order is restored for free (the rewrite
    already pays the full read+write).
    """
    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]
    total_bytes = sum(os.path.getsize(f) for f in files)
    n_target = max(1, math.ceil(total_bytes / target_file_bytes))
    stats = {
        "path": path,
        "files_before": len(files),
        "bytes": total_bytes,
        "files_target": n_target,
        "compacted": False,
    }
    if len(files) < min_files_to_compact or len(files) <= n_target:
        return stats

    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "._compact_tmp"
    if cluster_by is not None:
        reshaped = df.repartitionByRange(
            n_target, cluster_by
        ).sortWithinPartitions(cluster_by)
    else:
        reshaped = df.repartition(n_target)
    reshaped.write.mode("overwrite").parquet(tmp)
    bak = path.rstrip("/") + "._compact_bak"
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
    stats["compacted"] = True
    stats["files_after"] = len(
        [f for f in os.listdir(path) if f.endswith(".parquet")]
    )
    return stats


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` via the Hadoop API — works on any
    scheme the cluster knows (file://, hdfs://, s3a://), unlike the
    driver-local os calls the rest of this module uses for the test lake."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def _fs_names(fs, jvm_path, path: str) -> list[str]:
    """Child names of ``path`` via the Hadoop FS, [] when absent."""
    p = jvm_path(path)
    if not fs.exists(p):
        return []
    return [s.getPath().getName() for s in fs.listStatus(p)]


def _fs_write_text(fs, jvm_path, path: str, text: str) -> None:
    """Tiny-file write via the Hadoop FS (works on any scheme the cluster
    knows): create-overwrite, write UTF-8 bytes, close."""
    out = fs.create(jvm_path(path), True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _fs_read_text(spark: SparkSession, fs, jvm_path, path: str) -> str:
    """Read a tiny UTF-8 file via the Hadoop FS (commons-io ships with
    Spark; compaction manifests are a few hundred bytes)."""
    inp = fs.open(jvm_path(path))
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            inp, "UTF-8"
        )
    finally:
        inp.close()


def resume_pending_compaction(spark: SparkSession, store_dir: str) -> dict | None:
    """Heal a signature store left mid-compaction by a crash; None if no
    ``.compact-*`` dir is pending.

    The protocol invariant that makes this safe: source partitions are
    deleted ONLY after the hidden merge dir is completely written (its
    ``_SUCCESS`` marker exists). Therefore:

    * a hidden dir WITHOUT ``_SUCCESS`` is a crashed step-1 write — the
      partitions are untouched, so the partial dir is simply deleted;
    * a hidden dir WITH ``_SUCCESS`` is the single source of truth for
      the partitions its sidecar MANIFEST names (subset folds from the
      tiered trigger; legacy hidden dirs without a manifest subsume
      every batch <= their id) — finish the swap: delete the remaining
      source partitions, rename the hidden dir into place.

    ``stream_dedup_ingest`` calls this before starting, so an ingest
    restarted over a half-swapped store repairs it instead of silently
    dedup-ing against a store missing its merged history."""
    fs, _ = _hadoop_fs(spark, store_dir)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    pending = sorted(
        int(n.split("-", 1)[1])
        for n in _fs_names(fs, jvm_path, store_dir)
        if re.fullmatch(r"\.compact-\d+", n)
    )
    manifests = sorted(
        int(re.fullmatch(r"\.compact-(\d+)\.manifest\.json", n).group(1))
        for n in _fs_names(fs, jvm_path, store_dir)
        if re.fullmatch(r"\.compact-\d+\.manifest\.json", n)
    )
    if not pending:
        # a manifest with no hidden dir is a crash between the manifest
        # write and the merge write — sources untouched, drop the sidecar
        for cid in manifests:
            fs.delete(jvm_path(_manifest_path(store_dir, cid)), False)
        return None
    result = {"resumed": False, "dropped_partials": []}
    complete = [
        cid
        for cid in pending
        if fs.exists(jvm_path(f"{store_dir}/.compact-{cid}/_SUCCESS"))
    ]
    for cid in pending:
        if cid not in complete or cid != max(complete, default=-1):
            # crashed mid-write (partitions intact), or superseded by a
            # newer complete attempt — never partition-deleted, safe to drop
            fs.delete(jvm_path(f"{store_dir}/.compact-{cid}"), True)
            if cid in manifests:
                fs.delete(jvm_path(_manifest_path(store_dir, cid)), False)
            if cid not in complete:
                result["dropped_partials"].append(cid)
    if complete:
        cid = max(complete)
        if cid in manifests:
            sources = set(
                json.loads(
                    _fs_read_text(
                        spark, fs, jvm_path, _manifest_path(store_dir, cid)
                    )
                )["sources"]
            )
        else:
            sources = None  # legacy prefix fold: everything <= cid
        for n in _fs_names(fs, jvm_path, store_dir):
            if not re.fullmatch(r"batch=\d+", n):
                continue
            bid = int(n.split("=", 1)[1])
            if (sources is None and bid <= cid) or (
                sources is not None and bid in sources
            ):
                fs.delete(jvm_path(f"{store_dir}/{n}"), True)
        fs.rename(
            jvm_path(f"{store_dir}/.compact-{cid}"),
            jvm_path(f"{store_dir}/batch={cid}"),
        )
        if cid in manifests:
            fs.delete(jvm_path(_manifest_path(store_dir, cid)), False)
        result.update(resumed=True, merged_upto=cid)
    # drop any manifest left orphaned by the partial-drops above
    for mid in manifests:
        mp = jvm_path(_manifest_path(store_dir, mid))
        if fs.exists(mp) and not fs.exists(
            jvm_path(f"{store_dir}/.compact-{mid}")
        ):
            fs.delete(mp, False)
    return result


def _manifest_path(store_dir: str, cid: int) -> str:
    return f"{store_dir}/.compact-{cid}.manifest.json"


def compact_keyed_store(
    spark: SparkSession,
    store_dir: str,
    *,
    upto: int,
    target_files: int = 8,
    dedup_cols: list[str] | None = None,
    source_ids: list[int] | None = None,
) -> dict:
    """Crash-safe hidden-dir compaction of ANY ``batch=<id>``-partitioned
    parquet store — the protocol ``compact_signature_store`` pioneered,
    factored out so every long-running keyed store (MinHash signatures,
    eval-gram blocklists, any accreting partitioned state) shares one
    audited implementation:

      1. heal any pending swap (``resume_pending_compaction``);
      2. write a sidecar MANIFEST (``.compact-<upto>.manifest.json``)
         naming exactly the source partition ids about to fold;
      3. write those partitions merged (optionally deduplicated on
         ``dedup_cols`` — cross-batch appends of a set-semantics store
         repeat keys, and compaction is exactly the moment to fold them)
         into a hidden ``.compact-<upto>`` dir;
      4. delete the sources, rename the hidden dir to ``batch=<upto>``,
         drop the manifest.

    ``source_ids=None`` folds every partition with id <= ``upto`` (the
    original prefix fold); an explicit list folds exactly that SUBSET —
    the primitive the tiered trigger (``maybe_compact_keyed_store``)
    uses to avoid re-reading the whole store every fold. Subset folds
    must include their own max id as ``upto`` so the destination rename
    never collides with a live partition. Crash healing stays exact in
    both modes: the manifest pins which partitions the hidden dir
    subsumes, and a pre-manifest crash leaves sources untouched.

    The caller decides ``upto`` = the highest batch id that can never be
    rewritten (for a streaming sink: the checkpoint's max committed id;
    for a write-once blocklist: the max partition present). Returns a
    stats dict; no-op when fewer than 2 partitions qualify."""
    fs, _ = _hadoop_fs(spark, store_dir)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path

    stats = {"store": store_dir, "compacted": False}
    resumed = False
    healed = resume_pending_compaction(spark, store_dir)
    if healed and healed.get("resumed"):
        resumed = True
        stats.update(compacted=True, resumed=True,
                     merged_upto=healed["merged_upto"])

    parts = sorted(
        int(n.split("=", 1)[1])
        for n in _fs_names(fs, jvm_path, store_dir)
        if re.fullmatch(r"batch=\d+", n)
    )
    if source_ids is None:
        merge = [n for n in parts if n <= upto]
    else:
        merge = sorted(set(source_ids) & set(parts))
        if merge and max(merge) != upto:
            raise ValueError(
                "compact_keyed_store: subset folds must rename onto their"
                f" own max id (upto={upto}, max(source_ids)={max(merge)})"
                " — anything else collides with or shadows a live"
                " partition"
            )
    stats["partitions_before"] = len(parts)
    if len(merge) < 2:
        return stats
    merged = (
        spark.read.parquet(store_dir)
        .where(F.col("batch").isin([int(n) for n in merge]))
        .drop("batch")
    )
    if dedup_cols is not None:
        merged = merged.dropDuplicates(dedup_cols)
    merged = merged.repartition(target_files)
    # manifest BEFORE the data write: healing trusts a completed hidden
    # dir's manifest for the exact source set; with no manifest it falls
    # back to the legacy prefix rule, which is only correct for prefix
    # folds — so subset folds must never reach _SUCCESS without one
    _fs_write_text(
        fs,
        jvm_path,
        _manifest_path(store_dir, upto),
        json.dumps({"upto": upto, "sources": [int(n) for n in merge]}),
    )
    hidden = f"{store_dir}/.compact-{upto}"
    merged.write.mode("overwrite").parquet(hidden)
    # the deletes below are ONLY safe once the hidden dir is provably
    # complete — resume_pending_compaction keys on this marker to decide
    # between finish-the-swap and drop-the-partial
    if not fs.exists(jvm_path(f"{hidden}/_SUCCESS")):
        raise RuntimeError(
            f"compaction write to {hidden} left no _SUCCESS marker "
            "(committer configured without job markers?) — refusing to "
            "delete source partitions"
        )
    for n in merge:
        fs.delete(jvm_path(f"{store_dir}/batch={n}"), True)
    fs.rename(jvm_path(hidden), jvm_path(f"{store_dir}/batch={upto}"))
    fs.delete(jvm_path(_manifest_path(store_dir, upto)), False)
    stats.update(
        compacted=True,
        resumed=resumed,
        merged_upto=upto,
        partitions_merged=len(merge),
        partitions_after=len(parts) - len(merge) + 1,
    )
    return stats


def maybe_compact_keyed_store(
    spark: SparkSession,
    store_dir: str,
    *,
    commits_dir: str,
    max_partitions: int,
    target_files: int = 8,
    dedup_cols: list[str] | None = None,
    tier_ratio: float = 2.0,
) -> dict:
    """Partition-count-triggered compaction for a RUNNING ingest loop —
    the automatic form of ``compact_keyed_store`` the streaming ingests
    call between batches (round-10 stage attribution: the signature
    store's per-batch file LISTING was 10.0 of ``stream_corpus_ingest``'s
    28.0 timed-stage seconds once partitions accreted; nothing triggered
    the existing compaction).

    Fires only when the store's ``batch=`` partition count EXCEEDS
    ``max_partitions``, and folds a SIZE-TIERED subset of the committed
    partitions, not always everything: candidates sort by on-disk bytes
    ascending and the fold set grows greedily while the next partition is
    at most ``tier_ratio`` x the bytes already gathered. Small fresh
    partitions fold together cheaply every trigger; an older merged tier
    is re-folded only once the accumulated smalls rival it in size, so a
    long ingest's cumulative rewrite I/O amortizes to O(N log N) instead
    of the O(N^2) an always-full fold costs (each byte re-folds only when
    the fold's output is >= ~(1+1/tier_ratio) x its previous tier). The
    greedy restarts from the next-smallest ANCHOR whenever it stalls at a
    single partition (ADVICE r12: a lone footer-only partition must not
    pin the trigger into a forever-no-op while same-sized batches
    accumulate); partitions smaller than the winning anchor ride along in
    the fold for free. Only when EVERY anchor stalls (a lone fresh batch
    next to a big tier) is the trigger a no-op rather than a full
    rewrite — the store may sit above ``max_partitions`` by the O(log N)
    tier count, which is exactly the listing cost the threshold
    tolerates, and the skip is surfaced in stats with the candidate
    count so a stuck store is visible.
    Folds only partitions whose batch id is committed in the stream
    checkpoint (``commits_dir`` = its ``commits/``). Why this is safe
    INSIDE ``foreachBatch`` (after the batch's own sinks are written,
    which is where the ingests call it):

    * ``upto`` = max COMMITTED id, and the in-flight batch has no commit
      yet — its ``batch=<id>`` partition is never folded, so a crash
      replay still finds its own partition to exclude
      (``stream_dedup_ingest``) or byte-identically overwrite
      (``stream_ann_ingest`` family);
    * the batch's store SCAN already completed (its survivors are
      lineage-severed via localCheckpoint before any store write), so no
      in-flight plan holds the pre-swap file listing;
    * a crash mid-swap leaves the standard ``.compact-<id>`` state that
      the ingests' startup ``resume_pending_compaction`` heals.

    Compaction never changes rows (``ingest_batch`` rides in-file), so
    results are bit-identical with the trigger on or off — it buys back
    listing/planning time only. No-op stats dict when under threshold or
    nothing is committed yet."""
    fs, _ = _hadoop_fs(spark, store_dir)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    parts = [
        int(n.split("=", 1)[1])
        for n in _fs_names(fs, jvm_path, store_dir)
        if re.fullmatch(r"batch=\d+", n)
    ]
    stats = {
        "store": store_dir,
        "partitions_before": len(parts),
        "compacted": False,
    }
    if len(parts) <= max_partitions:
        return stats
    committed = [
        int(name)
        for name in _fs_names(fs, jvm_path, commits_dir)
        if re.fullmatch(r"\d+", name)
    ]
    if not committed:
        return stats
    upto = max(committed)
    cand = sorted(n for n in parts if n <= upto)
    if len(cand) < 2:
        return stats
    # size-tiered fold-set selection (see docstring): smallest-first
    # greedy, admit the next partition only while it is <= tier_ratio x
    # the bytes already gathered — never rewrite a big tier to absorb a
    # trickle of fresh batches
    sized = sorted(
        (
            fs.getContentSummary(
                jvm_path(f"{store_dir}/batch={n}")
            ).getLength(),
            n,
        )
        for n in cand
    )
    # ADVICE r12: anchoring only on the single smallest partition can
    # stall forever — one footer-only partition (an all-duplicates batch)
    # makes every admission test `size > tier_ratio * gathered` fail, and
    # the store's partition count then grows unboundedly. If the greedy
    # stalls at length 1, RESTART it from the next-smallest anchor; any
    # skipped smaller partitions then ride along in the fold for free
    # (they are strictly smaller than the anchor, so absorbing them adds
    # negligible rewrite bytes and can only improve the fold).
    fold: list[int] = []
    for anchor in range(len(sized) - 1):
        fold = [sized[anchor][1]]
        gathered = sized[anchor][0]
        for size, n in sized[anchor + 1:]:
            if size > tier_ratio * max(gathered, 1):
                break
            fold.append(n)
            gathered += size
        if len(fold) >= 2:
            fold = [n for _, n in sized[:anchor]] + fold
            break
        fold = []
    if len(fold) < 2:
        # surface the skip loudly enough to spot a stuck store: the
        # partition count is the number a monitoring loop should alarm on
        stats["skipped"] = (
            "single-partition tier at every anchor — nothing to amortize"
        )
        stats["candidates"] = len(cand)
        return stats
    return compact_keyed_store(
        spark,
        store_dir,
        upto=max(fold),
        target_files=target_files,
        dedup_cols=dedup_cols,
        source_ids=fold,
    )


def compact_gram_store(
    spark: SparkSession,
    store_dir: str,
    *,
    target_files: int = 1,
) -> dict:
    """Compaction + audit story for a long-running decontamination
    blocklist: an incrementally-extended gram store (one ``batch=<id>``
    partition per added eval suite) folds to a single partition with
    grams DEDUPLICATED cross-batch — ``decontaminate_against_store``
    requires a distinct store, and suites legitimately share grams.
    ``upto`` = every partition present (a blocklist partition write is
    atomic and never replayed); run between ingest runs like the
    signature-store compaction."""
    # heal BEFORE listing: after a crash between a previous compaction's
    # partition deletes and its rename, the only partitions may live in
    # the hidden dir — listing first would see zero partitions and skip
    # the repair entirely
    resume_pending_compaction(spark, store_dir)
    fs, _ = _hadoop_fs(spark, store_dir)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    parts = [
        int(n.split("=", 1)[1])
        for n in _fs_names(fs, jvm_path, store_dir)
        if re.fullmatch(r"batch=\d+", n)
    ]
    if not parts:
        return {"store": store_dir, "compacted": False,
                "partitions_before": 0}
    return compact_keyed_store(
        spark,
        store_dir,
        upto=max(parts),
        target_files=target_files,
        dedup_cols=["gram"],
    )


def compact_signature_store(
    spark: SparkSession,
    out_dir: str,
    *,
    target_files: int = 8,
) -> dict:
    """Merge the streaming dedup ingest's committed signature-store
    partitions into one right-sized partition.

    ``stream_dedup_ingest`` writes one ``batch=<id>`` partition per
    micro-batch; a long-running ingest accretes thousands of small
    partitions/files — at 100 TB that file count dominates scan-planning
    time for every subsequent batch's store scan. Compaction folds all
    partitions whose batch id is COMMITTED in the stream checkpoint into a
    single ``batch=<max committed>`` partition of ``target_files`` files.

    Correctness contract, and why only committed batches qualify: a
    replayed batch excludes its OWN ``batch=<id>`` partition from the
    store scan to avoid matching itself (see stream_dedup_ingest). A batch
    with a commit-log entry can never replay, so folding it into another
    partition id is safe; the (at most one) uncommitted trailing batch is
    left untouched. Survivor labels are preserved because ``ingest_batch``
    is a real column inside the files, not just the partition key.

    Crash-safe, resumable protocol (all steps via the Hadoop FileSystem
    API, so DFS paths work):

      1. write the merged rows to ``.compact-<id>`` INSIDE the store —
         dot-prefixed, so Spark's file index never reads it;
      2. delete the source ``batch=<n>`` partitions (n <= id);
      3. rename ``.compact-<id>`` to ``batch=<id>``.

    A crash DURING step 1 leaves a hidden dir without its ``_SUCCESS``
    marker and the partitions untouched — the next call (or the ingest's
    startup healing) deletes the partial dir and re-merges. A crash
    during 2-3 leaves a COMPLETE hidden dir, which is then the single
    source of truth: the next call first finishes that swap, THEN falls
    through to a fresh merge pass over whatever committed partitions
    remain — one call always performs the compaction it was asked for.
    Returns a stats dict; no-op when fewer than 2 committed partitions.

    Run BETWEEN ingest runs: the ingest's per-batch store scan lists
    files at plan time, so swapping partitions under a concurrently
    RUNNING ingest can fail that batch's scan transiently (committed
    data is never at risk — the swap is rerun-safe either way).
    """
    store_dir = os.path.join(out_dir, "signature_store")
    commits_dir = os.path.join(out_dir, "checkpoint", "commits")
    fs, _ = _hadoop_fs(spark, store_dir)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path

    committed = [
        int(name)
        for name in _fs_names(fs, jvm_path, commits_dir)
        if re.fullmatch(r"\d+", name)
    ]
    if not committed:
        return {"store": store_dir, "compacted": False}
    # the shared keyed-store protocol does the work (heal-then-fresh-merge
    # — a resumed crashed swap only FINISHES the old attempt, so the call
    # falls through to a fresh merge pass and one call always delivers
    # the compaction it was asked for); only the committed-id policy is
    # signature-store-specific
    return compact_keyed_store(
        spark, store_dir, upto=max(committed), target_files=target_files
    )


def audit_signature_store(spark: SparkSession, out_dir: str) -> dict:
    """Consistency report for a ``stream_dedup_ingest`` signature store —
    the operational check a long-running ingest runs between batches or
    after incidents. Detects:

    * ``duplicate_doc_ids`` — a doc_id present in more than one partition:
      the replay-idempotency or compaction contract was violated somewhere
      (e.g. a partition restored from backup next to its compacted copy).
    * ``mislabeled_rows`` — rows whose in-file ``ingest_batch`` EXCEEDS
      their partition id: impossible under both the writer (column ==
      partition) and compaction (column <= merged partition id).
    * ``orphan_partitions`` — partition ids beyond every batch the
      checkpoint's offset log has ever started: leftovers of a run whose
      checkpoint was deleted or swapped.
    * ``pending_compaction`` / ``unreadable_store`` — a ``.compact-*``
      dir awaiting `resume_pending_compaction`, and the
      partitions-exist-but-cannot-be-read incident state (wiped files,
      mid-crash store) — the LISTING checks still run in that case.

    A report, not a gate — returns counts plus the offending ids so an
    operator can decide; empty store returns zeros."""
    from pyspark.errors import AnalysisException

    store_dir = os.path.join(out_dir, "signature_store")
    offsets_dir = os.path.join(out_dir, "checkpoint", "offsets")
    fs, _ = _hadoop_fs(spark, store_dir)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path

    names = _fs_names(fs, jvm_path, store_dir)
    parts = [
        int(n.split("=", 1)[1]) for n in names if re.fullmatch(r"batch=\d+", n)
    ]
    started = [
        int(n)
        for n in _fs_names(fs, jvm_path, offsets_dir)
        if re.fullmatch(r"\d+", n)
    ]
    max_started = max(started) if started else -1
    report = {
        "store": store_dir,
        "duplicate_doc_ids": 0,
        "mislabeled_rows": 0,
        "orphan_partitions": sorted(n for n in parts if n > max_started),
        "pending_compaction": sorted(
            int(n.split("-", 1)[1])
            for n in names
            if re.fullmatch(r"\.compact-\d+", n)
        ),
        "unreadable_store": False,
    }
    try:
        store = spark.read.parquet(store_dir)
        # a PRE-BANDED store legitimately holds one row per (doc, band):
        # a doc is duplicated iff it has more rows than distinct band
        # keys (re-appearing in another partition, or appended twice,
        # repeats its band keys). Plain stores degrade to count > 1.
        key = (
            F.col("band_key") if "band_key" in store.columns else F.lit("")
        )
        report["duplicate_doc_ids"] = (
            store.groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct(key).alias("d"),
            )
            .where(F.col("n") > F.col("d"))
            .count()
        )
        report["mislabeled_rows"] = store.where(
            F.col("ingest_batch") > F.col("batch")
        ).count()
    except AnalysisException:
        # the audit's whole point is surfacing broken stores: report the
        # listing-based findings instead of pretending health
        report["unreadable_store"] = bool(parts)
    return report


def compact_table(
    spark: SparkSession,
    table_dir: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> list[dict]:
    """Compact a (possibly hive-partitioned) table directory.

    Leaf data directories are compacted independently — partition by
    partition, so a 100 TB table compacts as many small parallelizable
    rewrites with per-partition atomicity, and partition pruning metadata
    (the directory layout) is untouched.
    """
    leaves = []
    for root, dirs, files in os.walk(table_dir):
        if any(f.endswith(".parquet") for f in files):
            leaves.append(root)
    return [
        compact_dir(spark, leaf, target_file_bytes=target_file_bytes)
        for leaf in sorted(leaves)
    ]
