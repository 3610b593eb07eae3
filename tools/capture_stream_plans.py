#!/usr/bin/env python
"""Capture GENUINE foreachBatch-interior micro-batch plans (VERDICT r13 #7).

The contract frame a streaming query returns is a post-checkpoint sink
read, so its explain() is an 8-line stub; the real plans live inside each
operator's ``foreachBatch`` closure. This tool arms the
``functions.plancap`` hook and runs each streaming contract query once —
every interior frame's ``explain("formatted")`` lands in
``plans/<tag>/<query>__<frame>_batch<k>.txt``.

Usage: python tools/capture_stream_plans.py [--tag r14] [--suffix after]
         [--only q1,q2] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STREAM_QUERIES = [
    "stream_dedup_ingest",
    "stream_corpus_ingest",
    "stream_bpe_ingest",
    "stream_corpus_vocab_ingest",
    "stream_vocab_refresh",
    "stream_ann_ingest",
    "stream_pq_ingest",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="r14")
    ap.add_argument("--suffix", default="after")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from credit_abs_oltp_to_mart_spark.functions import plancap
    from credit_abs_oltp_to_mart_spark.session import get_spark

    import __spark_entry__ as entry_mod

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture-stream-plans")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    names = (
        args.only.split(",") if args.only else STREAM_QUERIES
    )
    qs = entry_mod.queries()
    plancap.PLAN_CAPTURE_DIR = out_dir
    try:
        for name in names:
            plancap.PLAN_CAPTURE_TAG = f"{name}__{args.suffix}__"
            try:
                qs[name](spark, args.sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                print(f"ok   {name}", flush=True)
            except Exception as e:  # noqa: BLE001 — record and continue
                print(f"FAIL {name}: {e}", flush=True)
            spark.catalog.clearCache()
    finally:
        plancap.PLAN_CAPTURE_DIR = None
        plancap.PLAN_CAPTURE_TAG = ""
    n = len([f for f in os.listdir(out_dir) if f"__{args.suffix}__" in f])
    print(f"{n} interior plans -> {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
