#!/usr/bin/env python
"""r14 profiling harness for the manifest-family composites.

Runs ONE composite in a fresh session, splitting the wall into the phases
the code actually executes (eager plan-build work vs cache population vs
the audit-union materialization), and reports Spark job counts per phase
via the UI REST API — the job-count evidence VERDICT r13 asked for.

Usage: python tools/profile_manifest_r14.py <query> [--sf-dir ...]
  query in {training_manifest, bpe_training_manifest, corpus_pipeline}
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def jobs_now(port: int = 4040):
    try:
        apps = json.load(
            urllib.request.urlopen(f"http://localhost:{port}/api/v1/applications")
        )
        app = apps[0]["id"]
        js = json.load(
            urllib.request.urlopen(
                f"http://localhost:{port}/api/v1/applications/{app}/jobs?status=succeeded"
            )
        )
        return len(js)
    except Exception:
        return -1


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from credit_abs_oltp_to_mart_spark.session import get_spark

    spark = get_spark(app_name=f"profile-{name}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import __spark_entry__ as entry

    import pyspark.sql.functions as F  # noqa

    docs = entry._t(spark, sf_dir, "documents")
    # warm codegen/parquet once
    docs.limit(10).write.format("noop").mode("overwrite").save()

    marks = []

    def mark(label):
        marks.append((label, time.perf_counter(), jobs_now()))

    from credit_abs_oltp_to_mart_spark.plans.corpus import (
        build_corpus,
        build_training_manifest,
    )

    mark("start")
    if name == "corpus_pipeline":
        stages = build_corpus(docs)
        mark("build_corpus eager (pairs ckpt + count + CC)")
        q = entry.q_corpus_pipeline(spark, sf_dir)
        mark("audit-plan build")
        q.write.format("noop").mode("overwrite").save()
        mark("audit union materialize")
    else:
        wf = None
        if name == "bpe_training_manifest":
            from credit_abs_oltp_to_mart_spark.operators import bpe

            _, wf = bpe.bpe_train(docs, n_merges=entry.BPE_MERGES)
            mark("bpe_train")
            nv = bpe.vocab_frame(wf).count()
            mark("vocab count")
        stages = build_training_manifest(
            docs, copy_id_stride=64, tokenizer_word_frame=wf
        )
        mark("build_training_manifest eager (pairs ckpt + count + CC)")
        stages["train"].write.format("noop").mode("overwrite").save()
        mark("train cache populate (filter+exactdup+antijoin+decontam)")
        stages["mixture"].write.format("noop").mode("overwrite").save()
        mark("mixture populate")
        stages["packed_mix"].write.format("noop").mode("overwrite").save()
        mark("packed populate")
        stages["manifest"].write.format("noop").mode("overwrite").save()
        mark("manifest populate")
        stages["epochs"].write.format("noop").mode("overwrite").save()
        mark("epochs populate")
        # drop the attribution caches so the end-to-end run below cannot
        # accidentally hit them (CacheManager matches by analyzed plan)
        spark.catalog.clearCache()
        mark("clearCache")
        fn = getattr(entry, f"q_{name}")
        q = fn(spark, sf_dir)
        mark("full query plan build (re-runs everything eager again)")
        q.write.format("noop").mode("overwrite").save()
        mark("audit union materialize")

    prev_t, prev_j = marks[0][1], marks[0][2]
    for label, t, j in marks[1:]:
        print(f"{t - prev_t:8.2f}s  {j - prev_j:4d} jobs  {label}")
        prev_t, prev_j = t, j
    print(f"total {marks[-1][1] - marks[0][1]:.2f}s, {marks[-1][2] - marks[0][2]} jobs")
    return 0


if __name__ == "__main__":
    sys.exit(main())
