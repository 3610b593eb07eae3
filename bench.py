#!/usr/bin/env python
"""Benchmark harness: run every driver-contract query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized via the noop sink (computes every column, writes
nothing) so timings reflect the full plan, not count()-pruned shortcuts.
"""

from __future__ import annotations

import json
import os
import sys
import time

from credit_abs_oltp_to_mart_spark.session import get_spark

import __spark_entry__ as entry_mod


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _calibration(spark) -> float:
    """Fixed micro-query (min-of-3 wall for a 10M-row range sum) whose cost
    depends only on the machine, never on this repo's code.  Recorded at run
    start AND end so a loaded-machine run is self-adjudicating: if the
    calibration walls are inflated vs prior rounds' records, a total-time
    swing is host contention, not a regression (round 10's 428.6 s vs the
    quiesced 332.4 s was adjudicable only by cross-artifact forensics)."""
    import pyspark.sql.functions as F

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(10_000_000).select(F.sum("id")).collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def _loadavg() -> list[float]:
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except OSError:  # platform without getloadavg
        return []


# Committed quiesced reference band for the calibration micro-query on this
# host (min-of-3 wall for the 10M-row range sum): 0.073-0.086 s across the
# r10/r11 quiesced runs. A run measured on a contended host is NOT
# comparable to prior quiesced records — rounds 10 and 11 both needed
# after-the-fact cross-artifact forensics to adjudicate exactly this.
# The gate turns that postmortem into a field: the run is stamped
# "contended": true and the record-keeping rule is that a contended total
# never supersedes a quiesced one.
#
# Rule, calibrated against every adjudicated run on record: the END
# bracket is the decisive calibration reading (the START bracket runs
# right after the warm-up loop and is structurally JIT/GC-noisy — the
# ACCEPTED r11 quiesced record read start=0.315/end=0.073); an inflated
# start only counts when the host was actually busy (1-min loadavg), and
# a grossly busy host is contended regardless (the r11 driver run read
# loadavg 6.27 with a CLEAN end bracket — calibration alone misses it).
QUIESCED_CALIBRATION_REF_SEC = 0.086
CONTENTION_TOLERANCE = 1.25
LOADAVG_HOT = 4.0   # r11 driver run: 6.27 -> contended (end bracket clean)
LOADAVG_WARM = 1.5  # r12 run 1: calib_start 0.155 at loadavg 2.11 -> hot


def _contended(
    calib_start: float, calib_end: float, load1: float | None
) -> bool:
    lim = QUIESCED_CALIBRATION_REF_SEC * CONTENTION_TOLERANCE
    if calib_end > lim:
        return True
    if load1 is None:
        return calib_start > lim  # no loadavg: fall back to strict
    return load1 > LOADAVG_HOT or (calib_start > lim and load1 > LOADAVG_WARM)


def _details_path(base_path: str, run_contended: bool) -> str:
    """Where this run's full per-query record belongs. The record-keeping
    gate, enforced mechanically (ADVICE r13): a run that stamps itself
    contended must never overwrite a QUIESCED record — it measured host
    contention, not code. Such a run is diverted to a
    ``bench_details_contended.json`` sidecar; anything else (quiesced run,
    no prior record, or a prior record that was itself contended/unreadable)
    writes the canonical file."""
    if not run_contended or not os.path.exists(base_path):
        return base_path
    try:
        with open(base_path) as f:
            prev_contended = json.load(f).get("machine", {}).get(
                "contended", True
            )
    except (OSError, ValueError):
        prev_contended = True
    if prev_contended:
        return base_path
    return base_path.replace(
        "bench_details.json", "bench_details_contended.json"
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")

    load_start = _loadavg()

    # warm-up: JIT/codegen + parquet footer/page caches for EVERY table, not
    # measured — per-query timings then reflect plan cost, not first-touch IO
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        _materialize(spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1000))

    calib_start = _calibration(spark)

    # three passes per query, keep the min: single-run numbers swing +-2x
    # from JVM/GC and host-contention noise at this scale; min-of-3 reports
    # steady-state plan cost (first pass also pays codegen compilation)
    # generator_invariants is a correctness/parity probe: it synthesizes its
    # own fixed-size input and ignores sf_dir entirely, so timing it at a
    # scale factor is meaningless and would just add a constant ~15s of
    # generator wall time to the throughput total
    skip = {"generator_invariants"}
    timings: dict[str, float] = {}
    for name, q in entry_mod.queries().items():
        if name in skip:
            continue
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _materialize(q(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
            # drop persisted intermediates so the next pass re-pays the full
            # plan (cold cache, warm codegen) instead of reading its own cache
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
        # memory-sink tables from streaming queries pin every result row in
        # the driver; across 70+ queries that heap pressure inflates late
        # queries' timings — drop them once measured
        for view in spark.catalog.listTables():
            if view.isTemporary:
                spark.catalog.dropTempView(view.name)
        # settle GC debt now so the NEXT query's first pass doesn't pay
        # this query's collection pauses
        spark.sparkContext._jvm.System.gc()

    # production-mode counterparts of the oracle-portable contract queries:
    # same operators at their at-scale settings (xxhash64 simhash, HLL
    # distinct). Measured into the sidecar only — quantifies the
    # "oracle-portability tax" documented in PERFORMANCE.md.
    from credit_abs_oltp_to_mart_spark.operators import dedup as _dedup
    from credit_abs_oltp_to_mart_spark.operators.profile import profile_table

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    production = {
        "simhash_64bit": lambda: _dedup.simhash_fingerprints(docs, n_bits=64),
        "simhash_pairs_64bit": lambda: _dedup.simhash_pairs(
            docs, max_hamming=3, n_bands=4, n_bits=64
        ),
        "profile_stats_hll": lambda: profile_table(
            spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
            exact_distinct=False,
        ),
    }
    prod_timings: dict[str, float] = {}
    for name, build in production.items():
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _materialize(build())
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        prod_timings[name] = round(best, 3)

    calib_end = _calibration(spark)
    load_end = _loadavg()
    # machine-state telemetry: the calibration walls bracket the run with a
    # code-independent yardstick; loadavg records host contention directly.
    # A future reader compares calibration against prior rounds' sidecars —
    # inflated calibration + inflated total = noisy host, not a regression.
    telemetry = {
        "loadavg_start": load_start,
        "loadavg_end": load_end,
        "calibration_range_sum_sec_start": calib_start,
        "calibration_range_sum_sec_end": calib_end,
        "quiesced_calibration_ref_sec": QUIESCED_CALIBRATION_REF_SEC,
        # GATE, not annotation: a contended run's total must not supersede
        # a quiesced record (it measured host contention, not code) — see
        # the rule derivation at _contended
        "contended": _contended(
            calib_start, calib_end, load_start[0] if load_start else None
        ),
    }

    total = round(sum(timings.values()), 3)
    # The driver captures only a short tail of stdout; a 98-entry queries
    # dict overflows it and parses as null (round-1 BENCH had "parsed": null).
    # Print ONE short summary line (headline queries only) and write the full
    # per-query timings to a sidecar file next to this script.
    details_path = _details_path(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_details.json"),
        telemetry["contended"],
    )
    with open(details_path, "w") as f:
        json.dump(
            {
                "metric": "total_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "production_mode": prod_timings,
                "machine": telemetry,
                "n_queries": len(timings),
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
            },
            f,
            indent=1,
        )
    headline = [
        "pricing_summary", "join_dim_agg", "month_end_snapshot", "sessionize",
        "dedup_minhash_lsh", "dedup_clusters", "ann_ivf", "stream_sessionize",
        # r14 additions (VERDICT r13 #6, additions-only): the bench's cost
        # carriers, so the round-over-round geomean tracks where the time
        # actually goes instead of eight sub-second mart/dedup floors
        "ann_pq", "training_manifest", "stream_corpus_vocab_ingest",
        "bpe_training_manifest",
    ]
    print(
        json.dumps(
            {
                "metric": "total_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": {k: timings[k] for k in headline if k in timings},
                "n_queries": len(timings),
                "machine": telemetry,
                "details": os.path.basename(details_path),
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
