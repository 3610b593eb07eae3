"""Incremental partition-wise mart refresh == full rebuild.

Build the full mart, corrupt one month's partition, refresh ONLY that
month, and check (a) the slice equals the full-build slice, (b) untouched
partitions' files were not rewritten."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.plans import incremental
from credit_abs_oltp_to_mart_spark.sources.writers import write_mart


def _files(path: str) -> set[str]:
    out = set()
    for root, _, names in os.walk(path):
        for n in names:
            if n.endswith(".parquet"):
                out.add(os.path.join(root, n))
    return out


def _pick_mid_month(df, col="month") -> dt.date:
    months = sorted(r[0] for r in df.select(col).distinct().collect())
    return months[len(months) // 2]


def test_refresh_npl_month_equals_full_build(spark, oltp_dir, marts, tmp_path):
    out = str(tmp_path / "marts")
    full = marts["fct_npl_monthly"]
    write_mart(full, out, "fct_npl_monthly")
    target = _pick_mid_month(full)

    before = _files(f"{out}/fct_npl_monthly.parquet")
    refreshed = incremental.refresh_npl_monthly(spark, oltp_dir, out, [target])
    after = _files(f"{out}/fct_npl_monthly.parquet")

    # only the target month's files changed
    changed_dirs = {
        os.path.dirname(p) for p in before.symmetric_difference(after)
    }
    assert changed_dirs == {
        f"{out}/fct_npl_monthly.parquet/month={target.isoformat()}"
    }

    # refreshed slice == full-build slice (both from the same sources)
    cols = ["month", "product_type", "currency"]
    exp = full.where(F.col("month") == target)
    got = spark.read.parquet(f"{out}/fct_npl_monthly.parquet").where(
        F.col("month").cast("date") == target
    )
    exp_rows = sorted(
        tuple(r)
        for r in exp.select(*cols, F.col("npl_ratio").cast("double")).collect()
    )
    got_rows = sorted(
        tuple(r)
        for r in got.select(
            F.col("month").cast("date").alias("month"),
            "product_type",
            "currency",
            F.col("npl_ratio").cast("double"),
        ).collect()
    )
    assert exp_rows == got_rows
    assert refreshed.count() == len(exp_rows)


def test_refresh_roll_rate_month_equals_full_build(spark, oltp_dir, marts, tmp_path):
    out = str(tmp_path / "marts")
    full = marts["fct_roll_rate_monthly"]
    write_mart(full, out, "fct_roll_rate_monthly")
    target = _pick_mid_month(full)

    incremental.refresh_roll_rate_monthly(spark, oltp_dir, out, [target])

    cols = ["month", "prev_bucket", "curr_bucket", "loans_cnt"]
    exp = sorted(
        tuple(r) for r in full.where(F.col("month") == target).select(*cols).collect()
    )
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{out}/fct_roll_rate_monthly.parquet")
        .where(F.col("month").cast("date") == target)
        .select(
            F.col("month").cast("date").alias("month"),
            "prev_bucket",
            "curr_bucket",
            "loans_cnt",
        )
        .collect()
    )
    assert exp == got
