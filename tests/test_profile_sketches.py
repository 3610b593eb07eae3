"""KMV sketch accuracy/exactness and single-pass profile correctness."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.operators.profile import profile_table
from credit_abs_oltp_to_mart_spark.operators.sketches import kmv_distinct


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame([(i % 10, "g") for i in range(100)], "k int, g string")
    out = kmv_distinct(df, key="k", group_cols=("g",), k=64).collect()
    assert len(out) == 1
    assert out[0]["n_hashes"] == 10
    assert out[0]["est_distinct"] == 10.0


def test_kmv_estimate_within_relative_error(spark):
    # KMV stderr ~ 1/sqrt(k-2); with k=256 and n=5000 expect well under 3σ
    n, k = 5000, 256
    df = spark.createDataFrame([(i,) for i in range(n)], "k int")
    est = kmv_distinct(df, key="k", k=k).collect()[0]["est_distinct"]
    assert abs(est - n) / n < 3 / math.sqrt(k - 2)


def test_kmv_independent_of_partitioning(spark):
    rows = [(random.Random(5).randrange(1000),) for _ in range(2000)]
    df = spark.createDataFrame(rows, "k int")
    a = kmv_distinct(df.repartition(1), key="k").collect()[0]["est_distinct"]
    b = kmv_distinct(df.repartition(13), key="k").collect()[0]["est_distinct"]
    assert a == b


def test_profile_stats_values(spark):
    df = spark.createDataFrame(
        [(1, 2.5, "x"), (2, None, "y"), (2, 7.5, None)],
        "a int, b double, c string",
    )
    prof = {r["column_name"]: r for r in profile_table(df).collect()}
    assert set(prof) == {"a", "b", "c"}
    a = prof["a"]
    assert (a["n_rows"], a["n_nulls"], a["n_distinct"]) == (3, 0, 2)
    assert (a["min_num"], a["max_num"]) == (1.0, 2.0)
    assert a["min_str"] is None
    b = prof["b"]
    assert (b["n_nulls"], b["n_distinct"], b["min_num"], b["max_num"]) == (1, 2, 2.5, 7.5)
    c = prof["c"]
    assert (c["n_nulls"], c["n_distinct"], c["min_str"], c["max_str"]) == (1, 2, "x", "y")


def test_profile_scan_counts(spark):
    df = spark.createDataFrame([(1, "x")], "a int, c string")
    # exact mode: wide-agg pass + melt pass; approx mode: one scan total
    exact = profile_table(df)._jdf.queryExecution().optimizedPlan().collectLeaves()
    assert exact.size() == 2, exact.toString()
    approx = (
        profile_table(df, exact_distinct=False)
        ._jdf.queryExecution()
        .optimizedPlan()
        .collectLeaves()
    )
    assert approx.size() == 1, approx.toString()


def test_profile_never_plans_global_distinct_expand(spark):
    # multi-column COUNT(DISTINCT) would plan an Expand feeding a
    # single-reducer global aggregate — the profile must avoid it in both
    # modes (exact mode melts instead; approx mode uses HLL partials)
    df = spark.createDataFrame([(1, "x")], "a int, c string")
    for mode in (True, False):
        p = (
            profile_table(df, exact_distinct=mode)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Expand" not in p, p


def test_profile_exact_matches_approx_shape_and_all_null_column(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None)], "a int, z string"
    )
    prof = {r["column_name"]: r for r in profile_table(df).collect()}
    assert prof["z"]["n_distinct"] == 0 and prof["z"]["n_nulls"] == 2
    assert profile_table(df, exact_distinct=False).columns == profile_table(df).columns
