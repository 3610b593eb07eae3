#!/usr/bin/env python
"""BM25 build/serve split (the refine_split.json pattern): price the
postings-store BUILD (offline, once) separately from the cold-read
SERVE (per-query, forever) at sf0.1, min-of-3 each, plus the in-plan
`bm25_topk` (which rebuilds postings per call) for contrast.

Usage: python tools/bm25_split.py [--out bench_ab_r09/bm25_split.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from credit_abs_oltp_to_mart_spark.operators import retrieval
    from credit_abs_oltp_to_mart_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="bm25_split")
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    qs = spark.createDataFrame(
        entry_mod.BM25_SERVE_QUERIES, "query_id long, query string"
    )

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    results = {}
    tmp = tempfile.mkdtemp(prefix="bm25_split_")
    store = os.path.join(tmp, "store")
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        retrieval.build_postings_store(docs, store)
        best = min(best, time.perf_counter() - t0)
    results["store_build"] = round(best, 3)
    for name, kw in (
        ("serve_cold", {}),
        ("serve_incremental_union", {"include_incremental": True}),
    ):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            mat(retrieval.bm25_store_probe(qs, store, k=10, **kw))
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        results[name] = round(best, 3)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        mat(retrieval.bm25_topk(docs, qs, k=10))
        best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
    results["in_plan_rebuild (bm25_topk)"] = round(best, 3)

    doc = {"sf_dir": args.sf_dir, "min_of": 3, "sec": results}
    if args.out:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(repo, args.out), "w") as f:
            json.dump(doc, f, indent=2)
    print(json.dumps(doc))
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
