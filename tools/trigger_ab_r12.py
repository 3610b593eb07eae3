#!/usr/bin/env python
"""Long-ingest A/B for the r12 SIZE-TIERED compaction trigger.

Three arms over the same 32-batch ingest (20x word-retokenized sf0.1
corpus, ~100k docs, one slice per batch) through
``stream_dedup_ingest``:

  * ``no_trigger``   — partitions accrete (the r10 failure mode);
  * ``tiered_k4``    — the r12 default policy (tier_ratio=2): smalls
                       fold together, a big tier re-folds only when
                       accumulated smalls rival it;
  * ``legacy_full_k4`` — the r11 always-full fold, emulated by
                       tier_ratio=1e9 (the greedy then admits every
                       committed partition — bit-identical to the old
                       prefix fold), the O(N^2)-cumulative-I/O policy
                       the ADVICE flagged.

Survivor sets must be IDENTICAL across arms (compaction never changes
rows); walls are min-of-2 with a fresh output dir per rep. The tiered
arm should match or beat legacy on wall while doing strictly less
rewrite I/O — and the gap widens with ingest length.

Usage: python tools/trigger_ab_r12.py [--out bench_ab_r12/trigger_ab.json]
       [--batches 32] [--factor 20] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench_ab_r12/trigger_ab.json")
    ap.add_argument("--batches", type=int, default=32)
    ap.add_argument("--factor", type=int, default=20)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--k-auto", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from credit_abs_oltp_to_mart_spark.session import get_spark
    from credit_abs_oltp_to_mart_spark.sources import maintenance
    from credit_abs_oltp_to_mart_spark.streaming import ops as streaming

    spark = get_spark(app_name="trigger_ab_r12")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    base = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    # per-copy retokenization: every word carries the copy index, so no
    # cross-copy near-dups exist and the signature store actually grows
    # with the corpus (the thing compaction is for)
    copies = [
        base.select(
            (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
            F.array_join(
                F.expr(f"transform(split(text, ' +'), w -> concat(w, '{k}x'))"),
                " ",
            ).alias("text"),
        )
        for k in range(args.factor)
    ]
    corpus = functools.reduce(lambda a, b: a.unionByName(b), copies)

    tmp = tempfile.mkdtemp(prefix="trigger_ab_r12_")
    slices = f"{tmp}/slices"
    now = time.time()
    for b in range(args.batches):
        d = f"{slices}/b{b:03d}"
        corpus.where(F.pmod(F.xxhash64("doc_id"), args.batches) == b).coalesce(
            1
        ).write.parquet(d)
        for f2 in os.listdir(d):
            if f2.endswith(".parquet"):
                t = now - 3600 + 10 * b
                os.utime(os.path.join(d, f2), (t, t))
    schema = corpus.schema

    real_trigger = maintenance.maybe_compact_keyed_store
    real_fold = maintenance.compact_keyed_store
    fold_bytes = {"n": 0}  # cumulative bytes of source partitions re-read
    # and rewritten by folds — the quantity the tiered policy amortizes

    def counting_fold(spark_, store_dir, **kw):
        fs, _ = maintenance._hadoop_fs(spark_, store_dir)
        jvm_path = spark_._jvm.org.apache.hadoop.fs.Path
        src = kw.get("source_ids")
        import re as _re

        parts = [
            int(n.split("=", 1)[1])
            for n in maintenance._fs_names(fs, jvm_path, store_dir)
            if _re.fullmatch(r"batch=\d+", n)
        ]
        ids = [n for n in parts if n <= kw["upto"]] if src is None else [
            n for n in src if n in parts
        ]
        if len(ids) >= 2:
            fold_bytes["n"] += sum(
                fs.getContentSummary(
                    jvm_path(f"{store_dir}/batch={n}")
                ).getLength()
                for n in ids
            )
        return real_fold(spark_, store_dir, **kw)

    maintenance.compact_keyed_store = counting_fold

    def run(arm: str) -> dict:
        if arm == "legacy_full_k4":
            maintenance.maybe_compact_keyed_store = functools.partial(
                real_trigger, tier_ratio=1e9
            )
        else:
            maintenance.maybe_compact_keyed_store = real_trigger
        k_auto = None if arm == "no_trigger" else args.k_auto
        best, survivors, parts = float("inf"), None, None
        try:
            for rep in range(2):
                fold_bytes["n"] = 0  # folds are deterministic per arm
                out = f"{tmp}/out_{arm}_{rep}"
                t0 = time.perf_counter()
                got = streaming.stream_dedup_ingest(
                    spark,
                    f"{slices}/b*",
                    out,
                    schema=schema,
                    min_est=0.25,
                    auto_compact_partitions=k_auto,
                )
                rows = got.count()
                best = min(best, time.perf_counter() - t0)
                sig = got.agg(
                    F.expr("bit_xor(xxhash64(doc_id, ingest_batch))").alias(
                        "h"
                    )
                ).first()["h"]
                survivors = (rows, int(sig))
                parts = len(
                    [
                        d
                        for d in os.listdir(f"{out}/signature_store")
                        if d.startswith("batch=")
                    ]
                )
                spark.catalog.clearCache()
        finally:
            maintenance.maybe_compact_keyed_store = real_trigger
        rec = {
            "wall_min2": round(best, 3),
            "survivors": survivors[0],
            "survivor_set_hash": survivors[1],
            "store_partitions_after": parts,
            "fold_rewrite_mb": round(fold_bytes["n"] / 1e6, 2),
        }
        print(arm, rec, flush=True)
        return rec

    results = {
        "task": (
            "r12 tiered-compaction trigger A/B: no trigger vs tiered"
            " (tier_ratio=2) vs legacy always-full fold (tier_ratio=1e9),"
            f" {args.batches}-batch ingest of a {args.factor}x retokenized"
            " corpus"
        ),
        "n_docs": corpus.count(),
        "batches": args.batches,
        "k_auto": args.k_auto,
        "arms": {
            arm: run(arm)
            for arm in ("no_trigger", "tiered_k4", "legacy_full_k4")
        },
    }
    hashes = {a["survivor_set_hash"] for a in results["arms"].values()}
    results["survivor_sets_identical"] = len(hashes) == 1
    with open(os.path.join(repo, args.out), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
