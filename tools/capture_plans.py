#!/usr/bin/env python
"""Dump ``.explain("formatted")`` for contract queries to plans/<tag>/.

Usage:
    python tools/capture_plans.py --tag r13 --suffix before \
        [--only q1,q2] [--sf-dir /root/testdata/sf0.1]

Writes ``plans/<tag>/<query>_<suffix>.txt`` per query.  Plan capture is
driver-side only (no job runs), so it is safe on a loaded host.  Queries
whose plan depends on side effects (streaming ingests that return a
memory-sink table) still build their full pipeline; their file records
the plan of the RETURNED frame.
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from credit_abs_oltp_to_mart_spark.session import get_spark

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", args.tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    all_queries = entry_mod.queries()
    if args.only:
        wanted = [n.strip() for n in args.only.split(",")]
        missing = [n for n in wanted if n not in all_queries]
        if missing:
            print(f"unknown queries: {missing}", file=sys.stderr)
            return 2
        all_queries = {n: all_queries[n] for n in wanted}

    n_ok = 0
    for name, q in all_queries.items():
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        try:
            df = q(spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(path, "w") as f:
                f.write(plan)
            n_ok += 1
            print(f"ok   {name}")
        except Exception:
            with open(path, "w") as f:
                f.write("CAPTURE FAILED\n" + traceback.format_exc())
            print(f"FAIL {name}")
    print(f"{n_ok}/{len(all_queries)} plans -> {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
