#!/usr/bin/env python
"""Fresh-session isolated timings for the lifecycle composite queries.

The per-round driver bench times every query inside ONE long session, so
session position (JVM heap state, codegen cache, GC pressure from ~130
prior queries) swings composite timings by seconds and has repeatedly
produced phantom "regressions" (VERDICT r06: dedup_embedding_lsh 2.4x in
the driver run, 1.0x isolated). This tool records the ground truth each
round: every listed query runs min-of-3 in its OWN fresh JVM/session.

Usage: python tools/isolated_bench.py [--out bench_ab_r07/isolated.json]
                                      [--queries a,b,c] [--sf-dir ...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

DEFAULT_QUERIES = [
    "stream_bpe_ingest",
    "stream_corpus_ingest",
    "stream_ann_ingest",
    "stream_pq_ingest",
    "ann_index_serve",
    "ann_pq_refine",
    "corpus_pipeline",
    "bpe_training_manifest",
    # r09: the one r08 shared-set regression (+1.2 s driver, source
    # untouched) — settle it against fresh-session ground truth
    "profile_stats",
    # r09: the transpiled reference-SQL path (dbt runner), priced like
    # the DataFrame marts — special-cased below (needs an OLTP lake)
    "sql_models_npl",
    # r09 late additions: DSIR selection + BFS shortest paths
    "dsir_select",
    "graph_bfs",
]

# sql_models_npl: generate a deterministic OLTP lake once (outside the
# timed loop), register views, then time run_sql_models + materializing
# fct_npl_monthly — the transpiled twin of the DataFrame mart.
_CHILD_SQL_MODELS = r"""
import sys, tempfile, time
sys.path.insert(0, {repo!r})
from datetime import date
from credit_abs_oltp_to_mart_spark.session import get_spark
from credit_abs_oltp_to_mart_spark.generator import (
    OLTPSynthConfig, run_credit_oltp_synth,
)
from credit_abs_oltp_to_mart_spark.plans.sql_models import run_sql_models
from credit_abs_oltp_to_mart_spark.sources.readers import read_oltp_table

spark = get_spark(app_name="isolated-sql_models_npl")
out = tempfile.mkdtemp(prefix="isolated_sqlmodels_")
cfg = OLTPSynthConfig(
    n_borrowers=3000, n_applications=4500, n_loans=2000,
    start_date_max=date(2025, 12, 31), seed=42,
)
run_credit_oltp_synth(spark, cfg, out_dir=out)
for t in ("loan_contract", "arrears_dpd_status", "repayment_payment",
          "write_off_and_recovery"):
    read_oltp_table(spark, out, t).createOrReplaceTempView(t)
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    marts = run_sql_models(spark, "/root/reference/dbt/credit_mart/models")
    marts["fct_npl_monthly"].write.format("noop").mode("overwrite").save()
    best = min(best, time.perf_counter() - t0)
    spark.catalog.clearCache()
print("ISOLATED_RESULT", best)
"""

_CHILD = r"""
import sys, time
sys.path.insert(0, {repo!r})
from credit_abs_oltp_to_mart_spark.session import get_spark
import __spark_entry__ as entry_mod
name, sf_dir = {name!r}, {sf_dir!r}
spark = get_spark(app_name="isolated-" + name)
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    entry_mod.queries()[name](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    best = min(best, time.perf_counter() - t0)
    spark.catalog.clearCache()
print("ISOLATED_RESULT", best)
"""

# reference_chain_e2e: the WHOLE reference surface priced as one chain
# at the reference's own generator volumes (BASELINE.md: 2000 borrowers
# / 3000 applications / 1500 loans, seed 42) — generate the 17-table
# OLTP lake, read it back, build staging + all 7 marts with observe
# metrics, materialize every mart, then run the dbt schema tests and
# README audit checks. Each piece is priced separately elsewhere; this
# is the airflow-DAG-shaped end-to-end number.
# reference_chain_e2e_10x (r11): the SAME chain at 10x the reference
# volumes (20k borrowers / 30k applications / 15k loans — the axis the
# credit-domain surface actually grows on, ~5M arrears rows) — turns
# "the generator+marts chain scales horizontally" into a measured ratio.
_CHILD_REFERENCE_CHAIN = r"""
import sys, tempfile, time
sys.path.insert(0, {repo!r})
from datetime import date
from credit_abs_oltp_to_mart_spark.session import get_spark
from credit_abs_oltp_to_mart_spark.generator import (
    OLTPSynthConfig, run_credit_oltp_synth,
)
from credit_abs_oltp_to_mart_spark.plans.pipeline import run_pipeline
from credit_abs_oltp_to_mart_spark.plans.checks import (
    run_audit_checks, run_schema_tests,
)
from credit_abs_oltp_to_mart_spark.sources.readers import read_oltp_table

mult = {mult}
spark = get_spark(app_name="isolated-reference_chain_e2e")
best = float("inf")
for rep in range(3):
    out = tempfile.mkdtemp(prefix="isolated_refchain_")
    t0 = time.perf_counter()
    cfg = OLTPSynthConfig(
        n_borrowers=2000 * mult, n_applications=3000 * mult,
        n_loans=1500 * mult,
        start_date_max=date(2025, 12, 31), seed=42,
    )
    run_credit_oltp_synth(spark, cfg, out_dir=out + "/oltp")
    metrics = {{}}
    frames = run_pipeline(
        spark, out + "/oltp", out_dir=out + "/marts",
        collect_metrics=metrics,
    )
    schema_fails = sum(run_schema_tests(frames).values())
    audit_fails = sum(run_audit_checks({{
        t: read_oltp_table(spark, out + "/oltp", t)
        for t in ("loan_contract", "arrears_dpd_status")
    }}).values())
    assert schema_fails == 0 and audit_fails == 0, (
        schema_fails, audit_fails)
    best = min(best, time.perf_counter() - t0)
    spark.catalog.clearCache()
print("ISOLATED_RESULT", best)
"""

# stream_corpus_ingest stage attribution: the same contract query with
# the stage_times hook set — per-stage wall seconds summed over the 3
# micro-batches (attribution mode adds stage-boundary materializations;
# the stage SUM exceeds the untimed wall by design, see the operator
# docstring). Records BOTH: the untimed min-of-3 headline and one timed
# run's decomposition.
_CHILD_CORPUS_STAGES = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from credit_abs_oltp_to_mart_spark.session import get_spark
import __spark_entry__ as entry_mod
sf_dir = {sf_dir!r}
spark = get_spark(app_name="isolated-stream_corpus_ingest_stages")
q = entry_mod.queries()["stream_corpus_ingest"]
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()
    best = min(best, time.perf_counter() - t0)
    spark.catalog.clearCache()
entry_mod.STREAM_CORPUS_STAGE_TIMES = st = {{}}
t0 = time.perf_counter()
q(spark, sf_dir).write.format("noop").mode("overwrite").save()
timed_wall = time.perf_counter() - t0
entry_mod.STREAM_CORPUS_STAGE_TIMES = None
print("ISOLATED_STAGES", json.dumps({{
    "untimed_min3": round(best, 3),
    "timed_wall": round(timed_wall, 3),
    "stages": {{k: round(v, 3) for k, v in st.items()}},
}}))
print("ISOLATED_RESULT", best)
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def _calibration() -> float:
        """min-of-3 wall for the 10M-row range sum in a FRESH child JVM —
        the same machine yardstick bench.py brackets its run with, so the
        isolated floors carry their own contention evidence."""
        code = (
            f"import sys, time; sys.path.insert(0, {repo!r})\n"
            "from credit_abs_oltp_to_mart_spark.session import get_spark\n"
            "import pyspark.sql.functions as F\n"
            "spark = get_spark(app_name='isolated-calibration')\n"
            "best = float('inf')\n"
            "for _ in range(3):\n"
            "    t0 = time.perf_counter()\n"
            "    spark.range(10_000_000).select(F.sum('id')).collect()\n"
            "    best = min(best, time.perf_counter() - t0)\n"
            "print('ISOLATED_RESULT', best)\n"
        )
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            cwd=repo,
        )
        for ln in out.stdout.splitlines():
            if ln.startswith("ISOLATED_RESULT"):
                return round(float(ln.split()[1]), 4)
        return float("nan")

    calib_start = _calibration()
    results: dict[str, float] = {}
    stages: dict[str, dict] = {}
    for name in args.queries.split(","):
        if name == "sql_models_npl":
            code = _CHILD_SQL_MODELS.format(repo=repo)
        elif name == "reference_chain_e2e":
            code = _CHILD_REFERENCE_CHAIN.format(repo=repo, mult=1)
        elif name == "reference_chain_e2e_10x":
            code = _CHILD_REFERENCE_CHAIN.format(repo=repo, mult=10)
        elif name == "reference_chain_e2e_100x":
            # r12: 100x the reference volumes (200k borrowers / 300k
            # applications / 150k loans, ~50M arrears rows) — the axis a
            # real credit-ABS user scales on; extends the 36.7 -> 64.8 s
            # curve a decade further
            code = _CHILD_REFERENCE_CHAIN.format(repo=repo, mult=100)
        elif name == "stream_corpus_ingest_stages":
            code = _CHILD_CORPUS_STAGES.format(repo=repo, sf_dir=args.sf_dir)
        else:
            code = _CHILD.format(repo=repo, name=name, sf_dir=args.sf_dir)
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            cwd=repo,
        )
        line = [
            ln for ln in out.stdout.splitlines()
            if ln.startswith("ISOLATED_RESULT")
        ]
        if not line:
            print(f"{name}: FAILED\n{out.stderr[-2000:]}", file=sys.stderr)
            return 1
        results[name] = round(float(line[0].split()[1]), 3)
        for ln in out.stdout.splitlines():
            if ln.startswith("ISOLATED_STAGES"):
                stages[name] = json.loads(ln.split(" ", 1)[1])
        print(name, results[name], stages.get(name, ""), flush=True)
    calib_end = _calibration()
    doc = {"sf_dir": args.sf_dir, "min_of": 3, "fresh_session": True,
           "calibration_range_sum_sec_start": calib_start,
           "calibration_range_sum_sec_end": calib_end,
           "isolated_sec": results}
    if stages:
        doc["stage_decomposition"] = stages
    if args.out:
        with open(os.path.join(repo, args.out), "w") as f:
            json.dump(doc, f, indent=2)
    print(json.dumps(doc))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
