#!/usr/bin/env python
"""Deep long-ingest A/B for the size-tiered compaction trigger (r13).

The r12 record (``bench_ab_r12/trigger_ab.json``) stops at 32 batches,
where tiered does 45% less rewrite I/O than the legacy always-full fold.
This run extends the same three-arm comparison to 128 batches and
records the CUMULATIVE-REWRITE CURVE per arm — cumulative fold bytes
after every ingested batch — so the O(N^2)-vs-O(N log N) divergence is
visible as curve shape, not just a final total:

  * ``no_trigger``    — partitions accrete; rewrite curve is flat 0 (the
                        baseline that pays the O(N) listing cost instead);
  * ``tiered_k4``     — the default policy (tier_ratio=2);
  * ``legacy_full_k4``— always-full fold via tier_ratio=1e9.

Survivor sets must be IDENTICAL across arms (compaction never changes
rows). Fold curves are deterministic given the batch sequence, so one
reading per arm suffices for the decisive field; walls are single-run
and labeled as such.

Usage: python tools/trigger_ab_r13.py [--out bench_ab_r13/trigger_ab_deep.json]
       [--batches 128] [--factor 20] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench_ab_r13/trigger_ab_deep.json")
    ap.add_argument("--batches", type=int, default=128)
    ap.add_argument("--factor", type=int, default=20)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--k-auto", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from credit_abs_oltp_to_mart_spark.session import get_spark
    from credit_abs_oltp_to_mart_spark.sources import maintenance
    from credit_abs_oltp_to_mart_spark.streaming import ops as streaming

    spark = get_spark(app_name="trigger_ab_r13")

    base = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    # per-copy retokenization (same construction as the r12 A/B): every
    # word carries the copy index, so no cross-copy near-dups exist and
    # the signature store genuinely grows with the corpus
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

    tmp = tempfile.mkdtemp(prefix="trigger_ab_r13_")
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
    fold_bytes = {"n": 0}
    curve: list[float] = []  # cumulative rewrite MB after each trigger call

    def counting_fold(spark_, store_dir, **kw):
        fs, _ = maintenance._hadoop_fs(spark_, store_dir)
        jvm_path = spark_._jvm.org.apache.hadoop.fs.Path
        src = kw.get("source_ids")
        parts = [
            int(n.split("=", 1)[1])
            for n in maintenance._fs_names(fs, jvm_path, store_dir)
            if re.fullmatch(r"batch=\d+", n)
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
        tier_kw = {"tier_ratio": 1e9} if arm == "legacy_full_k4" else {}

        def tracking_trigger(spark_, store_dir, **kw):
            stats = real_trigger(spark_, store_dir, **{**kw, **tier_kw})
            curve.append(round(fold_bytes["n"] / 1e6, 3))
            return stats

        maintenance.maybe_compact_keyed_store = tracking_trigger
        k_auto = None if arm == "no_trigger" else args.k_auto
        try:
            fold_bytes["n"] = 0
            curve.clear()
            out = f"{tmp}/out_{arm}"
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
            wall = time.perf_counter() - t0
            sig = got.agg(
                F.expr("bit_xor(xxhash64(doc_id, ingest_batch))").alias("h")
            ).first()["h"]
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
            "wall_single_run": round(wall, 3),
            "survivors": rows,
            "survivor_set_hash": int(sig),
            "store_partitions_after": parts,
            "fold_rewrite_mb": round(fold_bytes["n"] / 1e6, 2),
            "rewrite_curve_mb": list(curve),
        }
        print(arm, {k: v for k, v in rec.items() if k != "rewrite_curve_mb"},
              flush=True)
        return rec

    arms = {a: run(a) for a in ("no_trigger", "tiered_k4", "legacy_full_k4")}
    maintenance.compact_keyed_store = real_fold

    hashes = {a: r["survivor_set_hash"] for a, r in arms.items()}
    identical = len(set(hashes.values())) == 1
    t_mb = arms["tiered_k4"]["fold_rewrite_mb"]
    l_mb = arms["legacy_full_k4"]["fold_rewrite_mb"]
    results = {
        "task": (
            "r13 DEEP tiered-compaction A/B: no trigger vs tiered"
            " (tier_ratio=2) vs legacy always-full fold (tier_ratio=1e9),"
            f" {args.batches}-batch ingest of a {args.factor}x retokenized"
            " corpus, per-batch cumulative rewrite curves"
        ),
        "n_docs": corpus.count(),
        "batches": args.batches,
        "k_auto": args.k_auto,
        "arms": arms,
        "survivor_sets_identical": identical,
        "rewrite_ratio_tiered_vs_legacy": (
            round(t_mb / l_mb, 3) if l_mb else None
        ),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: v for k, v in results.items() if k != "arms"},
                     indent=1))
    return 0 if identical else 1


if __name__ == "__main__":
    sys.exit(main())
