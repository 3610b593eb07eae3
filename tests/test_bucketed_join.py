"""Bucketed-table co-location: a join between two tables bucketed on the
join key must run with ZERO exchanges — the write-time shuffle replaces
every query-time shuffle (the 100 TB layout for the recurring loan_id
joins)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.sources.writers import write_bucketed


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    snaps = spark.range(0, 5000).select(
        F.col("id").alias("loan_id"),
        (F.col("id") % 100).alias("days_past_due"),
    )
    loans = spark.range(0, 500).select(
        F.col("id").alias("loan_id"),
        F.concat(F.lit("P"), (F.col("id") % 5)).alias("product_type"),
    )
    write_bucketed(snaps, "b_snaps", ["loan_id"], n_buckets=8)
    write_bucketed(loans, "b_loans", ["loan_id"], n_buckets=8)
    yield
    spark.sql("drop table if exists b_snaps")
    spark.sql("drop table if exists b_loans")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # disable auto-broadcast so the join would otherwise shuffle both sides
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_snaps").join(spark.table("b_loans"), "loan_id")
        assert _exchanges(joined) == 0
        # and the result is still correct
        assert joined.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_join_does_exchange(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.range(0, 5000).select(F.col("id").alias("k"))
        b = spark.range(0, 500).select(F.col("id").alias("k"))
        assert _exchanges(a.join(b, "k")) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
