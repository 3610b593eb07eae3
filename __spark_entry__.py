"""Driver contract for the spark-graft builder (PySpark target).

Each entry in ``queries()`` exercises one operator family from SURVEY.md §2
(or a training-data-pipeline extension) over the driver's tables; the
matching ``oracle_sql()`` is ANSI SQL for DuckDB on the same parquet.

Cross-engine exactness rules used throughout (so value-hashes match):
- sums aggregate DECIMAL(18,2|4) (exact, order-independent), final cast to
  DOUBLE (deterministic conversion both engines);
- ratios are DOUBLE division of exact inputs (IEEE-deterministic);
- every window has a total deterministic ordering (explicit tiebreaks);
- string hashing is md5-based (engine-portable), never murmur/xxhash;
- constants (minhash coefficients, LSH hyperplanes, stopword sets) are
  generated once in Python and baked into BOTH the Spark plan and the
  oracle SQL.
"""

from __future__ import annotations

import os
from collections.abc import Callable

import pandas as pd  # module-level: pandas-UDF type hints must resolve here

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.functions.similarity import (
    MERSENNE_31,
    minhash_coefficients,
    random_hyperplanes,
)
from credit_abs_oltp_to_mart_spark.functions.text import STOPWORDS, TOKEN_PATTERN
from credit_abs_oltp_to_mart_spark.functions.parallelism import local_rows
from credit_abs_oltp_to_mart_spark.operators import (
    ann,
    curation,
    dedup,
    multimodal,
    textops,
)
from credit_abs_oltp_to_mart_spark import streaming

SF_SMOKE = "/root/testdata/sf0.001"

# shared tuning constants (mirrored into oracles)
JACCARD_N = 3
JACCARD_THRESHOLD = 0.12
MINHASH_PERMS = 8
MINHASH_BANDS = 2
MINHASH_SEED = 42
ANN_QUERY_IDS = [0, 1, 2, 3, 4]
ANN_K = 5
IVF_CENTROID_IDS = [10, 20, 30, 40, 50, 60, 70, 80]
IVF_NPROBE = 2
LSH_PLANES = 4
LSH_SEEDS = 3
EMB_DIM = 64
EMB_NEAR_DUP_THRESHOLD = 0.4

_D182 = "decimal(18,2)"
_D184 = "decimal(18,4)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark reads only as
        # a nanosecond long (legacy conf). Truncate to a microsecond
        # timestamp — exactly what DuckDB does natively on the same file —
        # so both engines see identical values and window orderings.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _normalize_ntz(spark, df)
    return _normalize_ntz(spark, spark.read.parquet(path))


def _normalize_ntz(spark: SparkSession, df: DataFrame) -> DataFrame:
    # Naive parquet timestamps may surface as TIMESTAMP_NTZ depending on the
    # session's inferTimestampNTZ setting. DuckDB treats them as plain (UTC)
    # instants, so pin the session to UTC and cast — unix_micros / window /
    # date_trunc then agree between both engines.
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz_cols:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        for c in ntz_cols:
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


# ---------------------------------------------------------------------------
# Reference-surface operator families (SURVEY.md §2) over the driver tables
# ---------------------------------------------------------------------------

def q_stg_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P6: typed projection with casts + renames (staging-layer shape)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").cast("long").alias("order_id"),
        F.col("l_linenumber").cast("int").alias("line_no"),
        F.col("l_quantity").cast("int").alias("qty"),
        F.col("l_extendedprice").cast("double").alias("price"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
    )


def q_bucket_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7/P10 searched-CASE bucketing (dpd_bucket pattern) + A1/A3."""
    li = _t(spark, sf_dir, "lineitem")
    bucket = (
        F.when(F.col("l_quantity") <= 0, "0")
        .when(F.col("l_quantity").between(1, 10), "1-10")
        .when(F.col("l_quantity").between(11, 25), "11-25")
        .when(F.col("l_quantity").between(26, 40), "26-40")
        .otherwise("40+")
    )
    return (
        li.groupBy(bucket.alias("qty_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast(_D182)).cast("double").alias("sum_price"),
        )
    )


def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A4 conditional + filtered aggregation, P8 divide-by-zero guard."""
    o = _t(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        F.sum(
            F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice").cast(_D182))
            .otherwise(F.lit(0).cast(_D182))
        ).cast("double").alias("finished_value"),
    )
    return agg.select(
        "o_orderpriority",
        "n_orders",
        "n_finished",
        "finished_value",
        F.when(F.col("n_orders") == 0, F.lit(None))
        .otherwise(F.col("n_finished").cast("double") / F.col("n_orders").cast("double"))
        .alias("finished_ratio"),
    )


def q_filter_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-family + S1: predicate pushdown + column pruning on the fact scan."""
    li = _t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1996-01-01")
        & (F.col("l_discount") > 0.05)
    ).select("l_orderkey", "l_linenumber", "l_quantity")


def q_join_dim_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2 broadcast dim join + D1 month trunc + A1 grouped sum."""
    o = _t(spark, sf_dir, "orders")
    c = F.broadcast(_t(spark, sf_dir, "customer"))
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy(
            F.trunc("o_orderdate", "month").alias("month"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast(_D182)).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 referential anti-join: orders whose customer has negative balance
    (anti vs the non-negative-balance customer set)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").where(F.col("c_acctbal") >= 0)
    return (
        o.join(
            F.broadcast(c.select(F.col("c_custkey").alias("o_custkey"))),
            "o_custkey",
            "left_anti",
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join (EXISTS): orders having at least one full-quantity line."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 49).select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return (
        o.join(li, "o_orderkey", "left_semi")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def _month_end_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+F1: last event per user per month (the month-end-snapshot CTE of
    fct_roll_rate/cure/vintage), with a total deterministic ordering."""
    # hash-partition by user_id ONCE: HashPartitioning(user_id) satisfies
    # the clustered distribution of BOTH the (user_id, month) row_number
    # window and the downstream (user_id) lag window, so the whole
    # snapshot->transition pipeline runs on a single shuffle
    e = _t(spark, sf_dir, "events").repartition("user_id")
    w = Window.partitionBy("user_id", F.trunc("ts", "month")).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.select(
            "user_id",
            "event_id",
            "ts",
            "event_type",
            "value",
            F.trunc("ts", "month").alias("month"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


_MONTH_END_ORACLE = """
    select user_id, event_id, ts, event_type, value,
           cast(date_trunc('month', ts) as date) as month
    from (
      select e.*,
             row_number() over (partition by user_id, date_trunc('month', ts)
                                order by ts desc, event_id desc) as rn
      from events e) x
    where rn = 1
"""


def q_month_end_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _month_end_snapshot(spark, sf_dir).select(
        "user_id", "month", "event_id", "event_type", "value"
    )


def _week_end_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-grain variant of the month-end snapshot (same W1 rn=1 pattern).

    The synthetic events corpus spans only ~1 month, so a month-over-month
    lag produces ZERO transitions at the driver's sf0.01 — round 1's
    roll_rate/cure_rate gate rows hash-matched vacuously on 0 rows. The
    reference's roll-rate operator semantics (period-end snapshot -> lag by
    row ordinal -> transition counts, fct_roll_rate_monthly.sql:17) are
    grain-agnostic; re-expressing them at week grain exercises W2/F2/A4
    with real rows. Same single-shuffle design as _month_end_snapshot."""
    e = _t(spark, sf_dir, "events").repartition("user_id")
    w = Window.partitionBy("user_id", F.trunc("ts", "week")).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.select(
            "user_id",
            "event_id",
            "ts",
            "event_type",
            "value",
            F.trunc("ts", "week").alias("week"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


def _write_slices(slices_dir: str, parts: list) -> None:
    """Write a streaming query's input slice files CONCURRENTLY and stamp
    strictly increasing mtimes in slice order (the file source's arrival
    order, together with the lexicographic b0 < b1 < ... paths).

    The slices are independent tiny writes whose wall cost is pure
    per-job overhead; submitting them from a small driver thread pool
    overlaps the jobs (guide §2.6) so setup costs max() instead of
    sum(). parts: [(subdir, DataFrame), ...] in arrival order."""
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    def _one(item):
        sub, df = item
        d = os.path.join(slices_dir, sub)
        df.coalesce(1).write.parquet(d)
        return d

    with ThreadPoolExecutor(max_workers=min(4, len(parts))) as pool:
        dirs = list(pool.map(_one, parts))
    now = _time.time()
    for k, d in enumerate(dirs):
        t = now - 10 * (len(dirs) - k)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                os.utime(os.path.join(d, f), (t, t))


def _overlap(*thunks):
    """Run independent setup steps (each a zero-arg callable that submits
    Spark jobs) from a small driver thread pool and return their results in
    order — guide §2.6: a streaming query's timed region otherwise pays the
    SUM of its setup steps' walls (gram-store build, input-slice writes,
    offline index/tokenizer training) when the cluster could run them
    side by side for the MAX. Exceptions propagate from the first failed
    step."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(4, len(thunks))) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]


def _transitions_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 at week grain: previous observed week's event_type per user (lag
    by row ordinal, not calendar week — reference roll-rate quirk,
    fct_roll_rate_monthly.sql:17)."""
    we = _week_end_snapshot(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("week")
    return we.select(
        "user_id",
        "week",
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("curr_type"),
    )


_TRANSITIONS_WEEKLY_ORACLE = """
    with week_end as (
      select user_id, event_id, ts, event_type, value,
             cast(date_trunc('week', ts) as date) as week
      from (
        select e.*,
               row_number() over (partition by user_id, date_trunc('week', ts)
                                  order by ts desc, event_id desc) as rn
        from events e) x
      where rn = 1)
    select user_id, week,
           lag(event_type) over (partition by user_id order by week) as prev_type,
           event_type as curr_type
    from week_end
"""


def _transitions_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 at day grain (same rn=1 snapshot -> row-ordinal lag shape as the
    weekly variant): the ~1-month corpus yields ~29 transition days, giving
    the cure-rate pattern real row coverage at the driver's sf0.01."""
    e = _t(spark, sf_dir, "events").repartition("user_id")
    w = Window.partitionBy("user_id", F.col("ts").cast("date")).orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    de = (
        e.select(
            "user_id", "event_id", "ts", "event_type",
            F.col("ts").cast("date").alias("day"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    lw = Window.partitionBy("user_id").orderBy("day")
    return de.select(
        "user_id",
        "day",
        F.lag("event_type").over(lw).alias("prev_type"),
        F.col("event_type").alias("curr_type"),
    )


_TRANSITIONS_DAILY_ORACLE = """
    with day_end as (
      select user_id, event_id, ts, event_type,
             cast(date_trunc('day', ts) as date) as day
      from (
        select e.*,
               row_number() over (partition by user_id, date_trunc('day', ts)
                                  order by ts desc, event_id desc) as rn
        from events e) x
      where rn = 1)
    select user_id, day,
           lag(event_type) over (partition by user_id order by day) as prev_type,
           event_type as curr_type
    from day_end
"""


def q_roll_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fct_roll_rate_monthly pattern: W2 + F2 + A3 (week grain so the
    ~1-month test corpus yields non-vacuous transitions)."""
    return (
        _transitions_weekly(spark, sf_dir)
        .where(F.col("prev_type").isNotNull())
        .groupBy("week", "prev_type", "curr_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def q_cure_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fct_cure_rate_monthly pattern: A4 filtered counts + P12 nullif
    (day grain so the ~1-month test corpus yields ~29 real rows rather
    than 4 weekly ones — the reference's cure semantics,
    fct_cure_rate_monthly.sql, are grain-agnostic)."""
    t = _transitions_daily(spark, sf_dir).where(F.col("prev_type").isNotNull())
    bad, good = "error", "purchase"
    agg = t.groupBy("day").agg(
        F.count(F.when(F.col("prev_type") == bad, 1)).alias("prev_bad_cnt"),
        F.count(
            F.when((F.col("prev_type") == bad) & (F.col("curr_type") == good), 1)
        ).alias("recovered_cnt"),
    )
    return agg.select(
        "day",
        "prev_bad_cnt",
        "recovered_cnt",
        (
            F.col("recovered_cnt").cast("double")
            / F.nullif(F.col("prev_bad_cnt"), F.lit(0)).cast("double")
        ).alias("recovery_rate"),
    )


def q_vintage_mob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fct_vintage_mob pattern: D2 quarter cohorts, D3 months-on-book
    (explicit year/month arithmetic — exact in any engine, matching
    ``fct_vintage_mob.sql:17`` age() month semantics), A5 flag sums,
    F3 mob filter.

    Runs over ``orders`` (1995-2001, leap years, month-start/-end cohort
    dates) rather than the 1-month ``events`` corpus so the month
    arithmetic gets real coverage: ~28 cohort quarters x up to ~80
    months-on-book (~766 rows at sf0.01) instead of a single cohort row.

    Scale note: first_seen has one row per customer — same cardinality
    class as the fact's key, so it is NOT broadcast; both sides hash on
    o_custkey and the join reuses the aggregation's partitioning."""
    o = _t(spark, sf_dir, "orders")
    first_seen = o.groupBy("o_custkey").agg(
        F.min(F.col("o_orderdate").cast("date")).alias("first_date")
    )
    base = o.join(first_seen, "o_custkey").select(
        F.trunc("first_date", "quarter").alias("cohort_q"),
        (
            (F.year("o_orderdate") - F.year("first_date")) * 12
            + (F.month("o_orderdate") - F.month("first_date"))
        ).cast("int").alias("mob"),
        (F.col("o_totalprice") > 150000).cast("int").alias("high_flag"),
    )
    agg = (
        base.where(F.col("mob") >= 0)
        .groupBy("cohort_q", "mob")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("high_flag").alias("high_cnt"),
        )
    )
    return agg.select(
        "cohort_q",
        "mob",
        "n_orders",
        "high_cnt",
        (
            F.col("high_cnt").cast("double")
            / F.nullif(F.col("n_orders"), F.lit(0)).cast("double")
        ).alias("high_rate"),
    )


def q_coalesce_nullif_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11/P12/P13 + D1 + A1: fct_writeoff_recovery_monthly pattern."""
    e = _t(spark, sf_dir, "events")
    v = F.col("value").cast(_D182)
    return e.groupBy(F.trunc("ts", "month").alias("month")).agg(
        F.sum(F.coalesce(F.nullif(v, F.lit(0).cast(_D182)), F.lit(0).cast(_D182)))
        .cast("double")
        .alias("total_value"),
        F.sum(
            F.coalesce(
                F.when(F.col("event_type") == "purchase", v), F.lit(0).cast(_D182)
            )
            + F.lit(1).cast(_D182)
        )
        .cast("double")
        .alias("purchase_value_plus_n"),
    )


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: multi-measure grouped aggregation with derived
    averages (A1/A5/A6); decimal-exact sums, double averages."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= "1998-09-02")
    disc_price = F.col("l_extendedprice").cast(_D182) * (
        F.lit(1).cast(_D182) - F.col("l_discount").cast(_D182)
    )
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(_D182)).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast(_D182)).cast("double").alias("sum_base_price"),
        F.sum(disc_price.cast(_D184)).cast("double").alias("sum_disc_price"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        (F.col("sum_qty") / F.col("count_order").cast("double")).alias("avg_qty"),
        "count_order",
    )


def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + grouped revenue + deterministic
    top-10 (sort + limit)."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1998-03-15")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1995-03-15")
    revenue = F.col("l_extendedprice").cast(_D182) * (
        F.lit(1).cast(_D182) - F.col("l_discount").cast(_D182)
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("o_orderdate"))
        .agg(F.sum(revenue.cast(_D184)).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join (region-nation-customer-orders-lineitem-
    supplier) with the local-supplier equality, grouped revenue."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    revenue = F.col("l_extendedprice").cast(_D182) * (
        F.lit(1).cast(_D182) - F.col("l_discount").cast(_D182)
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(F.sum(revenue.cast(_D184)).cast("double").alias("revenue"))
    )


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 rank variant: top-3 parts by retail price per brand."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return (
        p.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("p_brand", "rank", "p_partkey", "p_retailprice")
    )


def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-aggregate window: cumulative value per user over time
    (decimal-exact accumulation, double output)."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast(_D182)).over(w).cast("double").alias("running_value"),
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (gap > 30 min) via lag + running flag-sum — the batch
    form of the streaming session-window operator."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))) > 1800,
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessions.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# ---------------------------------------------------------------------------
# Structured Streaming surface (availableNow over the finite corpus ==
# the batch answer, so the same DuckDB oracles gate correctness)
# ---------------------------------------------------------------------------

def q_grouped_pandas_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map pandas UDF (applyInPandas): per-user ordered scan counting
    strictly-increasing consecutive value steps — the escape hatch for
    per-group imperative logic Spark expressions can't state. Integer-exact
    output keeps it oracle-gated."""
    import pandas as pd

    # explicit hash repartition: AQE's byte-based coalesce would fold the
    # tiny shuffle into ~2 partitions, serializing ~1.5k pandas group calls
    # into 2 Python workers (3.1s -> 0.95s at sf0.1). Python cost scales
    # with groups, not bytes — pin the stage to the core count.
    e = (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "value")
        .repartition(spark.sparkContext.defaultParallelism, "user_id")
    )

    def _stats(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        inc = (pdf["value"].diff() > 0).sum()
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "n_increasing": [int(inc)],
            }
        )

    return e.groupBy("user_id").applyInPandas(
        _stats, "user_id long, n_events long, n_increasing long"
    )


def q_grouped_pandas_wavg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-AGGREGATE pandas UDF (vectorized UDAF — completes the pandas
    UDF taxonomy next to the grouped-map and map variants): exposure-weighted
    mean discount per returnflag.

    All arithmetic inside the UDF is int64 (cents / basis points), so the
    result is independent of row order within the group — float accumulation
    there would be shuffle-order-dependent and break the oracle. Magnitude
    headroom: |price_cents * disc_bp| < 2^63 up to ~1e8 rows per group; at
    larger scale switch the partial sums to Python ints (arbitrary
    precision) or a decimal aggregation."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wavg(price_cents: pd.Series, disc_bp: pd.Series) -> float:
        den = int(price_cents.sum())
        if den == 0:
            return None
        num = int((price_cents * disc_bp).sum())
        return float(num) / float(den)

    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        "l_returnflag",
        (F.col("l_extendedprice").cast(_D182) * 100)
        .cast("long")
        .alias("price_cents"),
        (F.col("l_discount").cast(_D184) * 10000).cast("long").alias("disc_bp"),
    )
    return base.groupBy("l_returnflag").agg(
        wavg("price_cents", "disc_bp").alias("wavg_discount_bp")
    )


def q_reconcile_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COGROUPED-map pandas UDF (cogroup().applyInPandas — completes the
    pandas-UDF taxonomy): per-key FIFO reconciliation of two tables, the
    batch form of the reference generator's payment-allocation walk. Here
    the customer's orders are the "schedule" and their events the
    "payments"; all arithmetic is int64 cents (order-independent)."""
    from credit_abs_oltp_to_mart_spark.operators.reconcile import (
        reconcile_payments,
    )

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cust_id"),
        "o_orderdate",
        "o_orderkey",
        "o_totalprice",
    )
    e = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("cust_id"), "value"
    )
    return reconcile_payments(
        o,
        e,
        key="cust_id",
        due="o_totalprice",
        sched_order=("o_orderdate", "o_orderkey"),
        recv="value",
    )


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column handling: parse the JSON props column, extract
    a typed field, aggregate on it (JVM-side json path, no UDF)."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("k_total"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


def q_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per-user trailing-7-day event-value sum (event-
    time range frame over epoch seconds, not row counts)."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-7 * 86400, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast(_D182)).over(w).cast("double").alias("trailing_7d_value"),
    )


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators: customers with orders INTERSECT positive-balance set,
    EXCEPT customers with a 'F'-status order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    with_orders = o.select(F.col("o_custkey").alias("custkey"))
    positive = c.where(F.col("c_acctbal") > 0).select(
        F.col("c_custkey").alias("custkey")
    )
    finished = o.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return with_orders.intersect(positive).exceptAll(finished.distinct())


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event picks up the user's most recent
    prior-or-simultaneous click (backward-inclusive, per-user timeline)."""
    from credit_abs_oltp_to_mart_spark.operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.col("value").cast("double").alias("click_value"),
    )
    return asof_join(
        purchases, clicks, keys=["user_id"], ts_col="ts", right_order="click_id"
    ).select("user_id", "purchase_id", "click_id", "click_value")


def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP rollup: revenue at (region, nation), (region), and grand-total
    levels in one pass (partial-agg friendly)."""
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    base = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            F.col("o_totalprice").cast(_D182).alias("price"),
        )
    )
    return base.rollup("region", "nation").agg(
        F.sum("price").cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (sort-based aggregate).

    ``percentile()`` is the exact linear-interpolation quantile — the same
    arithmetic as DuckDB ``quantile_cont``, hence bit-exact. At 100 TB swap
    in ``approx_percentile`` (t-digest, mergeable partial agg): the exact
    form needs each group's full value set on one reducer."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.expr("percentile(value, 0.99)").alias("p99"),
    )


def q_window_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-family window functions (ntile / percent_rank / cume_dist) under
    a total deterministic ordering (acctbal with custkey tiebreak) — one
    shuffle on the partition key feeds all three."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
    )


def q_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE + grouping_id: all four aggregation levels of
    (returnflag, linestatus) in one pass; map-side partial aggregation
    applies to every grouping set before the single shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_extendedprice").cast(_D182).alias("price"),
    )
    return base.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.sum("price").cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: monthly value totals with one column per event type (fixed
    pivot values => no extra distinct-discovery job)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.trunc("ts", "month").alias("month"))
        .pivot("event_type", PIVOT_TYPES)
        .agg(F.sum(F.col("value").cast(_D182)).cast("double"))
    )


def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-stage aggregation over a hot low-cardinality key
    (event_type): each hot key spreads over 64 reducers in stage 1, partials
    merge in stage 2. Same result as a plain groupBy — the point is the
    shuffle shape at scale."""
    from credit_abs_oltp_to_mart_spark.functions.skew import salted_agg

    e = _t(spark, sf_dir, "events")
    agg = salted_agg(
        e,
        keys=["event_type"],
        sum_cols={"total_value": F.col("value").cast(_D182)},
        count_alias="n_events",
        min_cols={"first_ts": F.col("ts")},
        max_cols={"last_ts": F.col("ts")},
        n_salt=64,
        salt_on=F.col("event_id"),
    )
    return agg.select(
        "event_type",
        F.col("total_value").cast("double").alias("total_value"),
        "n_events",
        "first_ts",
        "last_ts",
    )


def q_stream_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    plan = streaming.stream_windowed_agg(streaming.events_stream(spark, sf_dir))
    return streaming.run_to_memory(plan, "mem_stream_windowed_agg", "complete")


def q_stream_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    plan = streaming.stream_distinct_keys(streaming.events_stream(spark, sf_dir))
    return streaming.run_to_memory(plan, "mem_stream_distinct_keys", "append")


def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    plan = streaming.stream_sessionize(streaming.events_stream(spark, sf_dir))
    return streaming.run_to_memory(plan, "mem_stream_sessionize", "update")


def q_stream_enriched_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    plan = streaming.stream_enriched_agg(
        streaming.events_stream(spark, sf_dir), _t(spark, sf_dir, "customer")
    )
    return streaming.run_to_memory(plan, "mem_stream_enriched_agg", "complete")


def q_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window aggregation (30-min gap) — the built-in
    counterpart of the custom stateful sessionizer."""
    plan = streaming.stream_session_window_agg(
        streaming.events_stream(spark, sf_dir)
    )
    return streaming.run_to_memory(plan, "mem_stream_session_window", "complete")


def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join (click -> purchase within 15 min, same
    user) with watermark-bounded join state; append output."""
    plan = streaming.stream_stream_join(streaming.events_stream(spark, sf_dir))
    return streaming.run_to_memory(plan, "mem_stream_stream_join", "append")


def q_stream_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental-dedup ingest — the 100 TB continuous-ingest
    shape: the documents table arrives as 3 deterministic micro-batches
    (md5 bucket of doc_id, file-arrival order pinned via mtimes); each
    batch is first deduped against ITSELF (``dedup_within_batch=True``:
    drop any doc matching a smaller-doc_id doc of the same batch), then
    against the signature store built from EARLIER batches' survivors
    (broadcast batch, store scanned once), and the survivors' signatures
    are written to the store under a batch-scoped partition (foreachBatch,
    crash-replay idempotent). Batch-sequential oracle: survivors(b) =
    docs of batch b with no MinHash-estimator match >= 0.25 among
    survivors(<b) NOR among same-batch docs with smaller doc_id."""
    import shutil
    import tempfile
    import time as _time

    from credit_abs_oltp_to_mart_spark.functions.similarity import md5_long

    docs = _t(spark, sf_dir, "documents")
    b = F.pmod(
        md5_long(F.concat(F.lit("ingest:"), F.col("doc_id").cast("string"))),
        F.lit(3),
    )
    tagged = docs.withColumn("__b", b.cast("int"))
    tmp = tempfile.mkdtemp(prefix="spark_ingest_")
    try:
        slices = os.path.join(tmp, "slices")
        # batch k is exactly md5 bucket k (arrival order pinned by mtime)
        _write_slices(
            slices,
            [(f"b{k}", tagged.where(F.col("__b") == k).drop("__b"))
             for k in range(3)],
        )
        out = streaming.stream_dedup_ingest(
            spark,
            f"{slices}/b*",
            os.path.join(tmp, "out"),
            schema=docs.schema,
            n=JACCARD_N,
            n_perm=MINHASH_PERMS,
            bands=MINHASH_BANDS,
            min_est=0.25,
            seed=MINHASH_SEED,
            dedup_within_batch=True,
        )
        # pin the rows into the block manager so the temp parquet backing
        # them can be deleted before the caller materializes the frame
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_stream_corpus_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE incremental corpus pipeline per micro-batch
    (VERDICT r04 #2): the TRAIN split of the documents table arrives as 3
    deterministic md5 slices; each batch runs filter (fused quality/lang/
    length/PII gate) -> store-dedup (vs earlier batches' ADMITTED docs +
    within-batch) -> decontamination (vs a PERSISTED eval-gram blocklist
    built once from the held-out split) -> chunk+pack, with both sinks
    batch-id-scoped partition overwrites. Batch-sequential oracle replays
    all four stages; output = (doc_id, ingest_batch, n_chunks) per
    admitted doc."""
    import shutil
    import tempfile
    import time as _time

    from credit_abs_oltp_to_mart_spark.functions.similarity import md5_long
    from credit_abs_oltp_to_mart_spark.operators.curation import split_expr

    docs = _t(spark, sf_dir, "documents").withColumn("split", split_expr())
    train = docs.where(F.col("split") == "train").drop("split")
    b = F.pmod(
        md5_long(F.concat(F.lit("ingest:"), F.col("doc_id").cast("string"))),
        F.lit(3),
    )
    tagged = train.withColumn("__b", b.cast("int"))
    tmp = tempfile.mkdtemp(prefix="spark_corpus_ingest_")
    try:
        gram_store = os.path.join(tmp, "eval_grams")
        slices = os.path.join(tmp, "slices")
        # the blocklist build and the input-slice writes are independent
        # setup steps — overlap them (guide §2.6)
        _overlap(
            lambda: curation.build_eval_gram_store(
                docs.where(F.col("split") != "train").drop("split")
            ).write.parquet(gram_store),
            lambda: _write_slices(
                slices,
                [(f"b{k}", tagged.where(F.col("__b") == k).drop("__b"))
                 for k in range(3)],
            ),
        )
        out = streaming.stream_corpus_ingest(
            spark,
            f"{slices}/b*",
            os.path.join(tmp, "out"),
            schema=train.schema,
            gram_store_path=gram_store,
            n=JACCARD_N,
            n_perm=MINHASH_PERMS,
            bands=MINHASH_BANDS,
            min_est=0.25,
            seed=MINHASH_SEED,
            dedup_within_batch=True,
            # the in-loop store-compaction trigger (r10 stage attribution
            # put the store LISTING at 10.0 of 28.0 timed-stage seconds;
            # r11 wires the trigger). Fires once here (batch 2 folds the
            # two committed partitions); admitted rows are bit-identical
            # with or without it — parity pinned in
            # tests/test_stream_corpus_ingest.py
            auto_compact_partitions=2,
            # attribution hook (tools/isolated_bench.py --stages): None
            # in every gate/bench run, so the production path is
            # untouched there
            stage_times=STREAM_CORPUS_STAGE_TIMES,
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# set by tools/isolated_bench.py's stage-decomposition child to a dict
# that stream_corpus_ingest fills with per-stage wall seconds
STREAM_CORPUS_STAGE_TIMES: dict | None = None


def q_stream_bpe_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING half of the raw-text → trained-tokenizer →
    packed-shards chain: the same 3-slice incremental corpus ingest as
    ``stream_corpus_ingest`` (filter → store-dedup → decontam), but the
    pack stage runs the TRAINED BPE tokenizer (``bpe.bpe_pack``) — the
    tokenizer is trained offline on the full corpus, pinned for the run
    like the blocklist, and streamed shards hold token-ID runs with
    cross-batch bin continuity. Output = the packed shard rows
    themselves, so the hash gate covers segmentation, id assignment,
    shard routing AND the carried offsets in one verdict."""
    import shutil
    import tempfile
    import time as _time

    from credit_abs_oltp_to_mart_spark.functions.similarity import md5_long
    from credit_abs_oltp_to_mart_spark.operators import bpe
    from credit_abs_oltp_to_mart_spark.operators.curation import split_expr

    docs = _t(spark, sf_dir, "documents").withColumn("split", split_expr())
    train = docs.where(F.col("split") == "train").drop("split")
    b = F.pmod(
        md5_long(F.concat(F.lit("ingest:"), F.col("doc_id").cast("string"))),
        F.lit(3),
    )
    tagged = train.withColumn("__b", b.cast("int"))
    tmp = tempfile.mkdtemp(prefix="spark_bpe_ingest_")
    try:
        gram_store = os.path.join(tmp, "eval_grams")
        slices = os.path.join(tmp, "slices")
        # tokenizer training, the blocklist build and the input-slice
        # writes are mutually independent setup steps — overlap them
        # (guide §2.6); bpe_train's sequential merge rounds run while the
        # two write jobs occupy otherwise-idle cores
        (_, wf), _, _ = _overlap(
            lambda: bpe.bpe_train(
                _t(spark, sf_dir, "documents"), n_merges=BPE_MERGES
            ),
            lambda: curation.build_eval_gram_store(
                docs.where(F.col("split") != "train").drop("split")
            ).write.parquet(gram_store),
            lambda: _write_slices(
                slices,
                [(f"b{k}", tagged.where(F.col("__b") == k).drop("__b"))
                 for k in range(3)],
            ),
        )
        out = streaming.stream_corpus_ingest(
            spark,
            f"{slices}/b*",
            os.path.join(tmp, "out"),
            schema=train.schema,
            gram_store_path=gram_store,
            n=JACCARD_N,
            n_perm=MINHASH_PERMS,
            bands=MINHASH_BANDS,
            min_est=0.25,
            seed=MINHASH_SEED,
            dedup_within_batch=True,
            tokenizer_word_frame=wf,
            return_packed=True,
            chunk_tokens=BPE_PACK_CHUNK,
            bin_tokens=BPE_PACK_BIN,
            shards=BPE_PACK_SHARDS,
        ).select(
            "shard", "doc_id", "chunk_idx", "n_tokens", "chunk_ids",
            "start_tok", "bin", "ingest_batch",
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics on a snapshot: a deterministic I/U/D change
    feed derived from orders applied to the customer dimension via
    broadcast anti-join + union (target never shuffles)."""
    from credit_abs_oltp_to_mart_spark.operators.cdc import apply_cdc

    cust = _t(spark, sf_dir, "customer")
    fsum = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast(_D182)).alias("__bal"))
    )
    upd = fsum.join(
        cust, F.col("o_custkey") == F.col("c_custkey")
    ).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.col("__bal").cast("double").alias("c_acctbal"),
        "c_mktsegment",
        F.when(F.col("c_custkey") % 19 == 0, "D").otherwise("U").alias("op"),
    )
    ins = fsum.where(F.col("o_custkey") % 23 == 0).select(
        (F.col("o_custkey") + 10_000_000).alias("c_custkey"),
        F.concat(F.lit("NEW#"), F.col("o_custkey").cast("string")).alias(
            "c_name"
        ),
        F.lit(0).cast("int").alias("c_nationkey"),
        F.col("__bal").cast("double").alias("c_acctbal"),
        F.lit("CDC").alias("c_mktsegment"),
        F.lit("I").alias("op"),
    )
    return apply_cdc(cust, upd.unionByName(ins), key="c_custkey")


# ---------------------------------------------------------------------------
# Training-data-pipeline extensions (dedup / ANN / text analysis)
# ---------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(_t(spark, sf_dir, "documents"))


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=JACCARD_N, threshold=JACCARD_THRESHOLD
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"),
        n=JACCARD_N,
        n_perm=MINHASH_PERMS,
        bands=MINHASH_BANDS,
        threshold=JACCARD_THRESHOLD,
        seed=MINHASH_SEED,
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clustering: connected components (iterative
    min-label propagation + pointer jumping) over the exact-Jaccard pair
    graph; component id = min doc_id, plus cluster size."""
    from credit_abs_oltp_to_mart_spark.operators.components import (
        dedup_clusters,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(
        docs, n=JACCARD_N, threshold=JACCARD_THRESHOLD
    )
    return dedup_clusters(docs, pairs)


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: a new ingest batch (doc_id % 5 == 0) against the
    persisted MinHash signature store of the existing corpus (the rest) —
    broadcast band join, corpus never reshuffled, estimator-based verify."""
    docs = _t(spark, sf_dir, "documents")
    store = dedup.minhash_signatures(
        docs.where(F.col("doc_id") % 5 != 0),
        n=JACCARD_N,
        n_perm=MINHASH_PERMS,
        seed=MINHASH_SEED,
    )
    return dedup.incremental_minhash_pairs(
        docs.where(F.col("doc_id") % 5 == 0),
        store,
        n=JACCARD_N,
        n_perm=MINHASH_PERMS,
        bands=MINHASH_BANDS,
        min_est=0.25,
        seed=MINHASH_SEED,
    )


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit engine-portable SimHash (md5_long bit votes); the production
    default is the same operator at n_bits=64 over xxhash64 (not DuckDB-
    replicable), exercised by tests/test_simhash_scale.py."""
    return dedup.simhash_fingerprints(_t(spark, sf_dir, "documents"), n_bits=60)


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at scale geometry: 60-bit fingerprints,
    4 bands of 15 bits (2^15 buckets per band), exact hamming verify
    (bit_count(xor)) — full recall for hamming <= 3 by pigeonhole."""
    return dedup.simhash_pairs(
        _t(spark, sf_dir, "documents"), max_hamming=3, n_bands=4, n_bits=60
    )


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.embedding_near_dups(
        _t(spark, sf_dir, "embeddings"), threshold=EMB_NEAR_DUP_THRESHOLD
    )


def q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed near-dups — the 100 TB path: bucket equi-join
    bounds candidate generation, blocked-GEMM kernel scores per bucket,
    candidate pairs unioned over LSH_SEEDS independent plane seeds for
    recall. Same deterministic hyperplanes as ann_lsh, so the DuckDB
    oracle reproduces the bucket assignment (and therefore the pair set)
    exactly."""
    return dedup.embedding_near_dups_lsh(
        _t(spark, sf_dir, "embeddings"),
        threshold=EMB_NEAR_DUP_THRESHOLD,
        n_planes=LSH_PLANES,
        dim=EMB_DIM,
        n_seeds=LSH_SEEDS,
    )


def q_ann_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann.brute_force_topk(
        _t(spark, sf_dir, "embeddings"), ANN_QUERY_IDS, k=ANN_K
    )


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann.lsh_topk(
        _t(spark, sf_dir, "embeddings"),
        ANN_QUERY_IDS,
        k=ANN_K,
        n_planes=LSH_PLANES,
        dim=EMB_DIM,
    )


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann.ivf_topk(
        _t(spark, sf_dir, "embeddings"),
        ANN_QUERY_IDS,
        IVF_CENTROID_IDS,
        k=ANN_K,
        nprobe=IVF_NPROBE,
    )


def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture building: per-language md5-ordered prefix until the running
    token total reaches 5000 — "N tokens per domain", the deterministic
    training-data recipe primitive (first doc over the line kept)."""
    return curation.sample_to_token_budget(
        _t(spark, sf_dir, "documents"), 5000
    )


def q_cluster_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic diversity sampling: k-means clusters the embedding table
    (3 exact fixed-point Lloyd rounds), then a deterministic md5-ranked
    sample keeps 25 vectors per cluster — cluster-balanced mixing that
    flattens the corpus's semantic mode distribution."""
    from credit_abs_oltp_to_mart_spark.operators.kmeans import kmeans_assign

    assign = kmeans_assign(
        _t(spark, sf_dir, "embeddings"),
        init_ids=KMEANS_INIT_IDS,
        iterations=KMEANS_ITERS,
    )
    return curation.cluster_balanced_sample(assign, 25)


def q_ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search whose coarse codebook comes from the k-means training
    loop (3 Lloyd rounds, exact fixed point) instead of caller-picked
    member vectors — the offline-train -> broadcast-probe production
    shape as one gated artifact."""
    return ann.ivf_topk_trained(
        _t(spark, sf_dir, "embeddings"),
        ANN_QUERY_IDS,
        init_ids=KMEANS_INIT_IDS,
        iterations=KMEANS_ITERS,
        k=ANN_K,
        nprobe=IVF_NPROBE,
    )


def q_ann_quantized_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full production ANN stack as ONE gated artifact (VERDICT r04
    stretch #9): Lloyd-trained coarse codebook -> per-vector scalar
    quantization -> probe ranking against the codebook -> INTEGER
    compressed-domain dot-product scoring inside the probed clusters.
    All-integer arithmetic end-to-end, so the DuckDB replay is
    bit-exact."""
    return ann.quantized_ivf_topk_trained(
        _t(spark, sf_dir, "embeddings"),
        ANN_QUERY_IDS,
        init_ids=KMEANS_INIT_IDS,
        iterations=KMEANS_ITERS,
        k=ANN_K,
        nprobe=IVF_NPROBE,
    )


def q_ann_index_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted ANN index, build once / serve from cold reads (VERDICT
    r05 #3): ``build_ivf_index`` writes the trained codebook + the
    cluster-partitioned quantized postings to parquet; ``ivf_index_probe``
    then answers the queries WITHOUT retraining — the candidate side
    reads only the index (dynamic partition pruning restricts it to the
    probed clusters), never the raw float corpus. Serving from the index
    is bit-identical to the in-plan ``ann_quantized_ivf`` search, so the
    same all-integer DuckDB replay gates it."""
    import tempfile

    emb = _t(spark, sf_dir, "embeddings")
    idx = tempfile.mkdtemp(prefix="spark_ann_index_")
    ann.build_ivf_index(
        emb, idx, init_ids=KMEANS_INIT_IDS, iterations=KMEANS_ITERS
    )
    queries = emb.where(F.col("vec_id").isin(ANN_QUERY_IDS)).select(
        "vec_id", "embedding"
    )
    return ann.ivf_index_probe(queries, idx, k=ANN_K, nprobe=IVF_NPROBE)


def q_stream_ann_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous maintenance of the persisted IVF index: the index is
    BUILT once from the base 75% of the embeddings, the remaining 25%
    then ARRIVES as 2 streaming micro-batches — each assigned to the
    fixed trained codebook (bit-parity with the build-time assignment,
    no retraining) and appended as batch-scoped quantized postings —
    and the probe finally serves base UNION incremental from cold reads.
    Output = the ANN_QUERY_IDS top-k over the fully-ingested index, so
    the hash gate covers assignment, quantization, the batch-keyed
    appends AND the union probe in one verdict."""
    import shutil
    import tempfile
    import time as _time

    from credit_abs_oltp_to_mart_spark.operators import ann as _ann

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.where(F.col("vec_id") % 4 != 3)
    tmp = tempfile.mkdtemp(prefix="spark_ann_ingest_")
    try:
        idx = os.path.join(tmp, "index")
        slices = os.path.join(tmp, "slices")
        # the offline index build and the input-slice writes are
        # independent setup steps — overlap them (guide §2.6)
        _overlap(
            lambda: _ann.build_ivf_index(
                base, idx, init_ids=KMEANS_INIT_IDS,
                iterations=KMEANS_ITERS,
            ),
            lambda: _write_slices(
                slices,
                [(f"b{k}", emb.where(F.col("vec_id") % 8 == resid))
                 for k, resid in enumerate([3, 7])],
            ),
        )
        streaming.stream_ann_ingest(
            spark, f"{slices}/b*", idx, schema=emb.schema
        )
        queries = emb.where(F.col("vec_id").isin(ANN_QUERY_IDS))
        out = _ann.ivf_index_probe(
            queries, idx, k=ANN_K, nprobe=IVF_NPROBE,
            include_incremental=True,
        )
        # pin rows into the block manager so the temp index can be removed
        # before the caller materializes the frame
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = multimodal.synthesize_blobs(_t(spark, sf_dir, "documents"))
    return multimodal.extract_meta(media)


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = multimodal.synthesize_blobs(_t(spark, sf_dir, "documents"))
    return multimodal.decode_features(media)


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = multimodal.synthesize_blobs(_t(spark, sf_dir, "documents"))
    return multimodal.sample_frames(media)


# planted-copy id offset for image_near_dups: == 0 mod 3 AND mod 4, so a
# planted doc keeps both its modality (doc_id % 3) and its blob chunk
# count (doc_id % 4) — the copy's bytes are identical to the original's
IMG_PLANT_OFFSET = 3_000_000_000


def q_image_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup: deterministic fake decode -> 8x8
    nearest-neighbor plane (resize_images' kernel) -> 64-bit average-hash
    (strictly-above-mean bits, integer-exact) -> the SAME banded hamming
    kernel simhash_pairs uses (4 bands x 16 bits, exact bit_count(xor)
    verify, full recall for hamming <= 3 by pigeonhole). The corpus has no
    byte-identical media, so the query plants copies of every 10th image
    (doc_id + IMG_PLANT_OFFSET); each must surface at hamming 0."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.where(F.col("doc_id") % 30 == 0).select(
        (F.col("doc_id") + F.lit(IMG_PLANT_OFFSET)).alias("doc_id"), "text"
    )
    media = multimodal.synthesize_blobs(docs.unionByName(planted))
    return multimodal.image_near_dups(media, max_hamming=3, n_bands=4)


def q_video_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup detection by frame-set overlap — pure composition
    of shipped kernels: sampled frames as image rows -> per-frame 64-bit
    aHash -> the shared banded-hamming kernel -> per-video-pair
    matched-frame share (the smaller of the two matched fractions). The
    corpus has no duplicate media, so the query plants copies of every
    10th video (doc_id + IMG_PLANT_OFFSET, ≡ 0 mod 12 so modality and
    chunk count survive); each must surface at share 1.0."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.where(F.col("doc_id") % 30 == 2).select(
        (F.col("doc_id") + F.lit(IMG_PLANT_OFFSET)).alias("doc_id"), "text"
    )
    media = multimodal.synthesize_blobs(docs.unionByName(planted))
    return multimodal.video_near_dups(media, max_hamming=3, n_bands=4)


def _video_near_dups_oracle(out_w: int = 8, out_h: int = 8) -> str:
    """Replays blob synthesis (planted video copies), the frame grid +
    every-kth sampling, the per-frame integer-exact aHash, the banded
    hamming join, and the per-video-pair matched-frame aggregation.
    Same band-from-pixel-bits assembly as the image oracle (never
    arithmetic-shifts a negative BIGINT)."""
    from credit_abs_oltp_to_mart_spark.operators.multimodal import (
        FRAME_BYTES,
        FRAME_SAMPLE_EVERY,
        VIDEO_FRAME_ID_STRIDE,
    )

    n_px = out_w * out_h
    stride = VIDEO_FRAME_ID_STRIDE
    fb2 = FRAME_BYTES * 2
    px_exprs = []
    for r in range(out_h):
        for c in range(out_w):
            idx = f"(({r} * hh) // {out_h}) * ww + (({c} * ww) // {out_w})"
            px_exprs.append(
                f"('0x' || substr(hx, (({idx}) % nb) * 2 + 1, 2))::int"
                f" as p{r * out_w + c}"
            )
    total = " + ".join(f"p{i}" for i in range(n_px))
    bit_terms = " + ".join(
        f"case when p{i} * {n_px} > total then "
        + ("(-9223372036854775807 - 1)" if i == 63 else f"(1::bigint << {i})")
        + " else 0::bigint end"
        for i in range(n_px)
    )
    band_exprs = ", ".join(
        "("
        + " + ".join(
            f"case when p{16 * b + j} * {n_px} > total then (1::bigint << {j})"
            " else 0::bigint end"
            for j in range(16)
        )
        + f") as band{b}"
        for b in range(4)
    )
    return f"""
    with base as (
      select doc_id, text from documents
      union all
      select doc_id + {IMG_PLANT_OFFSET} as doc_id, text
      from documents where doc_id % 30 = 2),
    media as (
      select doc_id,
             upper(md5(text)
               || case when doc_id % 4 >= 1 then md5(text || 'c1') else '' end
               || case when doc_id % 4 >= 2 then md5(text || 'c2') else '' end
               || case when doc_id % 4 >= 3 then md5(text || 'c3') else '' end
             ) as vhx
      from base where doc_id % 3 = 2),
    frames as (
      select doc_id * {stride} + fno as doc_id,
             substr(vhx, fno * {fb2} + 1, {fb2}) as hx
      from (select doc_id, vhx,
                   unnest(generate_series(0,
                     (length(vhx) // 2 + {FRAME_BYTES - 1}) // {FRAME_BYTES}
                       - 1,
                     {FRAME_SAMPLE_EVERY})) as fno
            from media where length(vhx) > 0)),
    dims as (
      select doc_id, hx, length(hx) // 2 as nb,
             1 + ('0x' || substr(hx, 1, 2))::int % 64 as ww,
             1 + ('0x' || substr(hx, 3, 2))::int % 64 as hh
      from frames),
    pix as (select doc_id, {", ".join(px_exprs)} from dims),
    tot as (select *, {total} as total from pix),
    hashed as (
      select doc_id, cast({bit_terms} as bigint) as phash, {band_exprs}
      from tot),
    banded as (
      select doc_id, phash, t.b,
             case t.b when 0 then band0 when 1 then band1
                      when 2 then band2 else band3 end as band
      from hashed, (values (0), (1), (2), (3)) t(b)),
    cand as (
      select distinct a.doc_id as doc_a, b2.doc_id as doc_b,
             a.phash as sa, b2.phash as sb
      from banded a
      join banded b2 on a.b = b2.b and a.band = b2.band
      where a.doc_id < b2.doc_id),
    pairs as (
      select doc_a, doc_b from cand
      where bit_count(xor(sa, sb)) <= 3),
    crossv as (
      select doc_a // {stride} as video_a, doc_b // {stride} as video_b,
             doc_a, doc_b
      from pairs where doc_a // {stride} <> doc_b // {stride}),
    matched as (
      select video_a, video_b,
             count(distinct doc_a)::int as n_matched_a,
             count(distinct doc_b)::int as n_matched_b
      from crossv group by 1, 2),
    fcnt as (
      select doc_id // {stride} as video, count(*)::int as nf
      from frames group by 1)
    select m.video_a, m.video_b,
           fa.nf as n_frames_a, fb.nf as n_frames_b,
           m.n_matched_a, m.n_matched_b,
           round(least(m.n_matched_a::double / fa.nf,
                       m.n_matched_b::double / fb.nf), 6) as match_share
    from matched m
    join fcnt fa on fa.video = m.video_a
    join fcnt fb on fb.video = m.video_b
    """


def q_audio_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup detection by matched-window share — the third
    modality on the one shared kernel (VERDICT r07 #7): overlapping
    65-sample windows -> sign-of-first-difference 64-bit fingerprint
    (the Chromaprint-style delta coding; deterministic fake decode,
    bytes == samples) -> the shared banded-hamming kernel -> per-pair
    matched-window share. The corpus has no duplicate media, so the
    query plants copies of every 30th audio stream (doc_id +
    IMG_PLANT_OFFSET, ≡ 0 mod 12 so modality and chunk count survive);
    each must surface at share 1.0."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.where(F.col("doc_id") % 30 == 1).select(
        (F.col("doc_id") + F.lit(IMG_PLANT_OFFSET)).alias("doc_id"), "text"
    )
    media = multimodal.synthesize_blobs(docs.unionByName(planted))
    return multimodal.audio_near_dups(media, max_hamming=3, n_bands=4)


def _audio_near_dups_oracle() -> str:
    """Replays blob synthesis (planted audio copies), the overlapping
    window grid, the 65-sample first-difference fingerprint with cyclic
    tiling, the banded hamming join, and the matched-window share
    aggregation. Band assembly from the comparison predicates directly
    (never arithmetic-shifts a negative BIGINT)."""
    from credit_abs_oltp_to_mart_spark.operators.multimodal import (
        AUDIO_WINDOW_HOP,
        AUDIO_WINDOW_ID_STRIDE,
        AUDIO_WINDOW_SAMPLES,
    )

    w = AUDIO_WINDOW_SAMPLES
    hop = AUDIO_WINDOW_HOP
    stride = AUDIO_WINDOW_ID_STRIDE
    px_exprs = ", ".join(
        f"('0x' || substr(hx, ((start + {i}) % nb) * 2 + 1, 2))::int"
        f" as p{i}"
        for i in range(w)
    )
    bit_terms = " + ".join(
        f"case when p{i + 1} > p{i} then "
        + ("(-9223372036854775807 - 1)" if i == 63 else f"(1::bigint << {i})")
        + " else 0::bigint end"
        for i in range(w - 1)
    )
    band_exprs = ", ".join(
        "("
        + " + ".join(
            f"case when p{16 * b + j + 1} > p{16 * b + j} then"
            f" (1::bigint << {j}) else 0::bigint end"
            for j in range(16)
        )
        + f") as band{b}"
        for b in range(4)
    )
    return f"""
    with base as (
      select doc_id, text from documents
      union all
      select doc_id + {IMG_PLANT_OFFSET} as doc_id, text
      from documents where doc_id % 30 = 1),
    media as (
      select doc_id,
             upper(md5(text)
               || case when doc_id % 4 >= 1 then md5(text || 'c1') else '' end
               || case when doc_id % 4 >= 2 then md5(text || 'c2') else '' end
               || case when doc_id % 4 >= 3 then md5(text || 'c3') else '' end
             ) as ahx
      from base where doc_id % 3 = 1),
    wins as (
      select doc_id * {stride} + wno as doc_id,
             ahx as hx, length(ahx) // 2 as nb, wno * {hop} as start
      from (select doc_id, ahx,
                   unnest(generate_series(0,
                     (length(ahx) // 2 + {hop - 1}) // {hop} - 1)) as wno
            from media where length(ahx) > 0)),
    pix as (select doc_id, {px_exprs} from wins),
    hashed as (
      select doc_id, cast({bit_terms} as bigint) as fp, {band_exprs}
      from pix),
    banded as (
      select doc_id, fp, t.b,
             case t.b when 0 then band0 when 1 then band1
                      when 2 then band2 else band3 end as band
      from hashed, (values (0), (1), (2), (3)) t(b)),
    cand as (
      select distinct a.doc_id as doc_a, b2.doc_id as doc_b,
             a.fp as sa, b2.fp as sb
      from banded a
      join banded b2 on a.b = b2.b and a.band = b2.band
      where a.doc_id < b2.doc_id),
    pairs as (
      select doc_a, doc_b from cand
      where bit_count(xor(sa, sb)) <= 3),
    crossa as (
      select doc_a // {stride} as audio_a, doc_b // {stride} as audio_b,
             doc_a, doc_b
      from pairs where doc_a // {stride} <> doc_b // {stride}),
    matched as (
      select audio_a, audio_b,
             count(distinct doc_a)::int as n_matched_a,
             count(distinct doc_b)::int as n_matched_b
      from crossa group by 1, 2),
    wcnt as (
      select doc_id // {stride} as audio, count(*)::int as nw
      from wins group by 1)
    select m.audio_a, m.audio_b,
           wa.nw as n_windows_a, wb.nw as n_windows_b,
           m.n_matched_a, m.n_matched_b,
           round(least(m.n_matched_a::double / wa.nw,
                       m.n_matched_b::double / wb.nw), 6) as match_share
    from matched m
    join wcnt wa on wa.audio = m.audio_a
    join wcnt wb on wb.audio = m.audio_b
    """


def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide duplicated-substring spans (token-level, k=8,
    occurrences >= 2 anywhere incl. the doc itself) merged into maximal
    per-doc intervals — the repeated-passage cut list that doc-level
    near-dup detection structurally cannot produce."""
    return textops.duplicate_spans(_t(spark, sf_dir, "documents"), k=8)


def q_dup_spans_removed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The removal half of substring-level dedup: rewrite every doc with
    its corpus-wide duplicated spans cut (detection feeds removal in one
    composed plan; span-free docs keep their text byte-for-byte)."""
    docs = _t(spark, sf_dir, "documents")
    return textops.remove_spans(docs, textops.duplicate_spans(docs, k=8))


def q_dup_spans_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first-occurrence span policy end-to-end: per duplicated gram
    the earliest (doc_id, pos) occurrence is NOT cut, so one copy of
    every boilerplate passage survives the rewrite byte-identical and
    only later copies are removed — the production substring-dedup shape
    (cutting ALL copies kills the first legitimate occurrence too)."""
    docs = _t(spark, sf_dir, "documents")
    return textops.remove_spans(
        docs, textops.duplicate_spans(docs, k=8, keep_first=True)
    )


def q_token_freq_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency fluency scoring (engine-portable LM-filter core):
    per doc, the mean corpus-wide occurrence count of its tokens and the
    share of near-unique tokens — rational arithmetic instead of log
    perplexity so any engine reproduces it bit-for-bit."""
    return textops.token_frequency_stats(_t(spark, sf_dir, "documents"))


def q_bigram_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-bigram fluency scoring (bigram-LM companion to
    token_freq_stats): mean corpus MLE P(next|prev) per doc plus the
    rare-bigram share — ratios floored to fixed point BEFORE summing so
    the parallel aggregation is order-exact in any engine."""
    return textops.bigram_fluency(_t(spark, sf_dir, "documents"))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.language_id(_t(spark, sf_dir, "documents"))


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.text_quality(_t(spark, sf_dir, "documents"))


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.token_counts(_t(spark, sf_dir, "documents"))


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.fingerprints(_t(spark, sf_dir, "documents"))


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.repetition_stats(_t(spark, sf_dir, "documents"))


def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation.split_assign(_t(spark, sf_dir, "documents"))


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation.stratified_sample(_t(spark, sf_dir, "documents"))


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation.chunk_documents(_t(spark, sf_dir, "documents"))


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both decontamination axes per eval doc in one contract row (the
    round-11 oracle extension — capacity-safe growth per the dsir_select
    Gumbel precedent, zero new contract entries):

    * n-gram (verbatim leakage): share of the eval doc's word 5-grams
      present anywhere in the train split (``curation.decontaminate``);
    * semantic (paraphrase leakage): count + max cosine of TRAIN vectors
      sharing the eval doc's k-means cluster within the
      ``EMB_NEAR_DUP_THRESHOLD`` — ``curation.semantic_contamination_
      pairs``, the SemDeDup cluster restriction applied cross-set, with
      the same Lloyd rounds as the kmeans/semantic_dedup contracts and
      the doc_id<->vec_id identity the embeddings table carries.

    The production TRAIN-side drop verdict (``semantic_decontaminate``)
    rides the same pair kernel — planted-paraphrase drop + plan gates in
    tests/test_semantic_decontam.py."""
    from credit_abs_oltp_to_mart_spark.operators.curation import (
        TRAIN_PCT,
        split_bucket,
    )
    from credit_abs_oltp_to_mart_spark.operators.kmeans import kmeans_assign

    ng = curation.decontaminate(_t(spark, sf_dir, "documents"))
    emb = _t(spark, sf_dir, "embeddings")
    assign = kmeans_assign(
        emb, init_ids=KMEANS_INIT_IDS, iterations=KMEANS_ITERS
    )
    b = split_bucket(F.col("vec_id"), "split:")
    sem = (
        curation.semantic_contamination_pairs(
            emb.where(b < TRAIN_PCT),
            emb.where(b >= TRAIN_PCT),
            assign,
            threshold=EMB_NEAR_DUP_THRESHOLD,
        )
        .groupBy(F.col("eval_id").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_sem_hits"),
            F.max("cosine").alias("max_train_cosine"),
        )
    )
    return ng.join(F.broadcast(sem), "doc_id", "left").select(
        "doc_id",
        "split",
        "n_grams",
        "n_contaminated",
        "contamination",
        F.coalesce(F.col("n_sem_hits"), F.lit(0)).cast("int").alias(
            "n_sem_hits"
        ),
        F.coalesce(F.col("max_train_cosine"), F.lit(0.0)).alias(
            "max_train_cosine"
        ),
    )


def q_decontaminate_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental decontamination: the held-out (non-train) docs' DISTINCT
    gram set is the persisted blocklist store; the train split plays the
    arriving ingest batch, checked per-doc against the store with the
    0.5-overlap drop verdict — the fixed-eval-suite production shape
    (store built once, batches never re-shingle the eval corpus)."""
    from credit_abs_oltp_to_mart_spark.operators.curation import split_expr

    docs = _t(spark, sf_dir, "documents").withColumn("split", split_expr())
    store = curation.build_eval_gram_store(
        docs.where(F.col("split") != "train")
    )
    return curation.decontaminate_against_store(
        docs.where(F.col("split") == "train").drop("split"), store
    )


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation.tfidf_topk(_t(spark, sf_dir, "documents"))


def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation.pii_scan(_t(spark, sf_dir, "documents"))


def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation.pack_chunks(_t(spark, sf_dir, "documents"))


def q_pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trainer-facing bin manifest over the packed shards: per
    (shard, bin) chunk/doc counts, filled token total and doc-id range —
    the data-loader's scheduling table, composed directly on the
    pack_chunks plan (one extra aggregation)."""
    return curation.pack_manifest(
        curation.pack_chunks(_t(spark, sf_dir, "documents"))
    )


EPOCH_SEEDS = [0, 1]


def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded per-epoch read order over the packed (shard, bin) units —
    the deterministic global shuffle a trainer's loader applies each
    epoch, published as a manifest so every rank agrees without
    coordination. Two seeds gate in one verdict: each epoch is its own
    md5-rank permutation, replayed exactly by the oracle. The rank
    itself is computed scalably (range-bucketed md5 key + driver prefix
    sum + per-bucket window), never a one-task global sort."""
    manifest = curation.pack_manifest(
        curation.pack_chunks(_t(spark, sf_dir, "documents"))
    ).persist()
    out = None
    for seed in EPOCH_SEEDS:
        e = curation.epoch_shuffle(manifest, seed=seed).select(
            F.lit(seed).cast("int").alias("epoch"),
            "read_order",
            "shard",
            "bin",
            "filled_tokens",
        )
        out = e if out is None else out.unionByName(e)
    return out


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The redaction rewrite (map-only regexp chain): emails/URLs/digit
    runs replaced by typed placeholders — the privacy scrub a corpus runs
    before packing; PII-free docs stay byte-identical."""
    return curation.redact_pii(_t(spark, sf_dir, "documents"))


def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based (alpha = 0.5) data-mixture weights per language:
    natural vs tempered target share and the per-domain repetition
    multiplier — the standard pretraining-mixture recipe step, engine-
    exact because sqrt is correctly rounded everywhere."""
    return curation.mixture_weights(_t(spark, sf_dir, "documents"))


def q_mixture_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixture MATERIALIZED: weights feed deterministic per-doc
    replication (floor(factor) copies + one more iff the md5 draw falls
    under the fractional part, all integer micro-units) — one row per
    (doc, copy_no), the epoch-mixed corpus manifest a trainer consumes.
    Composes mixture_weights -> mixture_apply in one plan."""
    docs = _t(spark, sf_dir, "documents")
    return curation.mixture_apply(docs, curation.mixture_weights(docs))


# ---------------------------------------------------------------------------
# Oracle SQL generation (DuckDB dialect = ANSI + list lambdas)
# ---------------------------------------------------------------------------

_SHINGLES_CTE = f"""
    toks as (
      select doc_id, string_split_regex(trim(text), ' +') as tk from documents
    ),
    sh as (
      select doc_id,
             case when len(tk) < {JACCARD_N}
                  then [array_to_string(tk, ' ')]
                  else list_distinct(list_transform(
                         generate_series(1, len(tk) - {JACCARD_N - 1}),
                         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
             end as shingles
      from toks
    )
"""

_JACCARD_PAIRS_SQL = f"""
    with {_SHINGLES_CTE},
    ex as (select doc_id, unnest(shingles) as shingle from sh),
    sizes as (select doc_id, len(shingles) as n from sh),
    pairs as (
      select a.doc_id as doc_a, b.doc_id as doc_b, count(*) as n_shared
      from ex a join ex b using (shingle)
      where a.doc_id < b.doc_id
      group by 1, 2)
    select doc_a, doc_b, jaccard from (
      select doc_a, doc_b,
             round(n_shared::double / (sa.n + sb.n - n_shared), 6) as jaccard
      from pairs
      join sizes sa on sa.doc_id = doc_a
      join sizes sb on sb.doc_id = doc_b) z
    where jaccard >= {JACCARD_THRESHOLD}
"""


def _minhash_oracle() -> str:
    coeffs = minhash_coefficients(MINHASH_PERMS, MINHASH_SEED)
    rows_per_band = MINHASH_PERMS // MINHASH_BANDS
    sig_cols = ", ".join(
        f"list_min(list_transform(hs, h -> (h * {a} + {b}) % {MERSENNE_31})) as s{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    band_exprs = ", ".join(
        "concat_ws(':', '{bi}', {vals})".format(
            bi=bi,
            vals=", ".join(f"s{bi * rows_per_band + r}" for r in range(rows_per_band)),
        )
        for bi in range(MINHASH_BANDS)
    )
    return f"""
    with {_SHINGLES_CTE},
    hashed as (
      select doc_id, shingles,
             list_transform(shingles,
               x -> ('0x' || substr(md5(x), 1, 15))::bigint % {MERSENNE_31}) as hs
      from sh),
    sigs as (select doc_id, shingles, {sig_cols} from hashed),
    banded as (
      select distinct doc_id, unnest([{band_exprs}]) as band_key from sigs),
    cands as (
      select distinct a.doc_id as doc_a, b.doc_id as doc_b
      from banded a join banded b using (band_key)
      where a.doc_id < b.doc_id),
    verified as (
      select doc_a, doc_b,
             round(len(list_intersect(sa.shingles, sb.shingles))::double
                   / (len(sa.shingles) + len(sb.shingles)
                      - len(list_intersect(sa.shingles, sb.shingles))), 6) as jaccard
      from cands
      join sigs sa on sa.doc_id = doc_a
      join sigs sb on sb.doc_id = doc_b)
    select doc_a, doc_b, jaccard from verified where jaccard >= {JACCARD_THRESHOLD}
    """


def _incremental_minhash_oracle(min_est: float = 0.25) -> str:
    coeffs = minhash_coefficients(MINHASH_PERMS, MINHASH_SEED)
    rows_per_band = MINHASH_PERMS // MINHASH_BANDS
    sig_cols = ", ".join(
        f"list_min(list_transform(hs, h -> (h * {a} + {b}) % {MERSENNE_31})) as s{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    band_exprs = ", ".join(
        "concat_ws(':', '{bi}', {vals})".format(
            bi=bi,
            vals=", ".join(f"s{bi * rows_per_band + r}" for r in range(rows_per_band)),
        )
        for bi in range(MINHASH_BANDS)
    )
    match_sum = " + ".join(
        f"(sa.s{i} = sb.s{i})::int" for i in range(MINHASH_PERMS)
    )
    return f"""
    with {_SHINGLES_CTE},
    hashed as (
      select doc_id, shingles,
             list_transform(shingles,
               x -> ('0x' || substr(md5(x), 1, 15))::bigint % {MERSENNE_31}) as hs
      from sh),
    sigs as (select doc_id, {sig_cols} from hashed),
    sn as (select * from sigs where doc_id % 5 = 0),
    sc as (select * from sigs where doc_id % 5 != 0),
    bn as (select distinct doc_id, unnest([{band_exprs}]) as band_key from sn),
    bc as (select distinct doc_id, unnest([{band_exprs}]) as band_key from sc),
    cands as (
      select distinct bn.doc_id as new_doc_id, bc.doc_id as corpus_doc_id
      from bn join bc using (band_key)),
    est as (
      select new_doc_id, corpus_doc_id,
             round(({match_sum}) / {float(MINHASH_PERMS)}, 6) as est_jaccard
      from cands
      join sn sa on sa.doc_id = new_doc_id
      join sc sb on sb.doc_id = corpus_doc_id)
    select new_doc_id, corpus_doc_id, est_jaccard
    from est where est_jaccard >= {min_est}
    """


def _stream_dedup_ingest_oracle(min_est: float = 0.25) -> str:
    """Batch-sequential replay of the streaming incremental-dedup ingest
    with ``dedup_within_batch=True``: a doc of batch k (md5 bucket of
    doc_id) survives iff its MinHash estimator matches (a) no SURVIVOR of
    an earlier batch and (b) no SMALLER-doc_id doc of its OWN batch — the
    within-batch drop set is order-free (computed against all same-batch
    docs, surviving or not), exactly the foreachBatch contract in
    streaming/ops.py."""
    coeffs = minhash_coefficients(MINHASH_PERMS, MINHASH_SEED)
    rows_per_band = MINHASH_PERMS // MINHASH_BANDS
    sig_cols = ", ".join(
        f"list_min(list_transform(hs, h -> (h * {a} + {b}) % {MERSENNE_31})) as s{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    band_exprs = ", ".join(
        "concat_ws(':', '{bi}', {vals})".format(
            bi=bi,
            vals=", ".join(f"s{bi * rows_per_band + r}" for r in range(rows_per_band)),
        )
        for bi in range(MINHASH_BANDS)
    )
    match_sum = " + ".join(
        f"(sa.s{i} = sb.s{i})::int" for i in range(MINHASH_PERMS)
    )
    est_ok = (
        f"round(({match_sum}) / {float(MINHASH_PERMS)}, 6) >= {min_est}"
    )

    def banded(k: int) -> str:
        return f"""
    bn{k} as (select distinct doc_id, unnest([{band_exprs}]) as band_key
              from sigs where b = {k})"""

    def within(k: int) -> str:
        # docs of batch k matching any SMALLER-doc_id doc of batch k
        return f"""
    wc{k} as (select distinct a.doc_id as nid, bb.doc_id as cid
              from bn{k} a join bn{k} bb using (band_key)
              where a.doc_id > bb.doc_id),
    wm{k} as (select distinct nid from wc{k}
              join sigs sa on sa.doc_id = nid
              join sigs sb on sb.doc_id = cid
              where {est_ok})"""

    def level(k: int, prev_surv: str) -> str:
        # docs of batch k matching any survivor of earlier batches
        return f"""
    bs{k} as (select distinct doc_id, unnest([{band_exprs}]) as band_key
              from {prev_surv}),
    c{k} as (select distinct bn{k}.doc_id as nid, bs{k}.doc_id as cid
             from bn{k} join bs{k} using (band_key)),
    m{k} as (select distinct nid from c{k}
             join sigs sa on sa.doc_id = nid
             join sigs sb on sb.doc_id = cid
             where {est_ok}),
    surv{k} as (select * from sigs where b = {k}
                and doc_id not in (select nid from m{k})
                and doc_id not in (select nid from wm{k}))"""

    return f"""
    with {_SHINGLES_CTE},
    hashed as (
      select doc_id, shingles,
             list_transform(shingles,
               x -> ('0x' || substr(md5(x), 1, 15))::bigint % {MERSENNE_31}) as hs
      from sh),
    sigs as (
      select doc_id,
             ('0x' || substr(md5('ingest:' || doc_id::varchar), 1, 15))::bigint
               % 3 as b,
             {sig_cols}
      from hashed),
    {banded(0)}, {within(0)},
    surv0 as (select * from sigs where b = 0
              and doc_id not in (select nid from wm0)),
    {banded(1)}, {within(1)}, {level(1, "surv0")},
    surv01 as (select * from surv0 union all select * from surv1),
    {banded(2)}, {within(2)}, {level(2, "surv01")}
    select doc_id, 0::bigint as ingest_batch from surv0
    union all select doc_id, 1::bigint from surv1
    union all select doc_id, 2::bigint from surv2
    """


def _bigram_fluency_oracle(rare_max: int = 2, fp_scale: int = 10**6) -> str:
    """Replay of textops.bigram_fluency: corpus bigram + prefix-token
    counts, per-ratio fixed-point floor, per-doc integer sums."""
    return f"""
    with base as (
      select doc_id, string_split_regex(trim(text), ' +') as tk
      from documents where trim(text) <> ''),
    prs as (
      select doc_id, s.l as l, s.r as r
      from (select doc_id,
                   unnest(case when len(tk) < 2 then []
                          else list_transform(generate_series(1, len(tk) - 1),
                                 i -> {{'l': tk[i], 'r': tk[i + 1]}}) end) as s
            from base)),
    c2 as (select l, r, count(*) as c2 from prs group by 1, 2),
    c1 as (select l, count(*) as c1
           from (select unnest(tk) as l from base) group by 1),
    sc as (select doc_id, c2.c2, (c2.c2 * {fp_scale}) // c1.c1 as fp
           from prs join c2 using (l, r) join c1 using (l)),
    pd as (select doc_id, count(*) as n, sum(fp) as s,
                  count(case when c2 <= {rare_max} then 1 end) as rare
           from sc group by 1)
    select d.doc_id, coalesce(n, 0)::int as n_bigrams,
           (s // n)::double / {float(fp_scale)} as avg_cond_prob,
           ((rare * {fp_scale}) // n)::double / {float(fp_scale)}
             as rare_bigram_share
    from documents d left join pd using (doc_id)
    """


BM25_K = 10
BM25_QUERIES = [
    (0, "spark window agg"),
    (1, "fast table scan"),
    (2, "customer order query"),
    (3, "vector batch stream"),
]


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k document retrieval (Robertson & Zaragoza 2009)
    over an inverted postings frame — the retrieval-side curation tool
    (decontamination-by-retrieval, hard-negative mining). Exact bigint
    arithmetic end to end: the log-free Robertson-ratio IDF surrogate at
    fixed point, the k1/b saturation kept in exact rational form
    (k1 = 6/5, b = 3/4, avgdl = T/N multiplied through), truncation only
    at two documented div sites — so the oracle replays bit-exactly.
    Postings restrict to the broadcast query-term list before df
    counting or scoring; no corpus-wide cross join."""
    from credit_abs_oltp_to_mart_spark.operators import retrieval

    docs = _t(spark, sf_dir, "documents")
    qs = local_rows(spark, BM25_QUERIES, "query_id long, query string")
    return retrieval.bm25_topk(docs, qs, k=BM25_K)


def _bm25_topk_oracle(
    fp_scale: int = 10**6,
    queries: list[tuple[int, str]] | None = None,
    src_batch: bool = False,
) -> str:
    """Replay of retrieval.bm25_topk: postings with dl attached, df over
    the query-term slice, the same two-div fixed-point contribution, sum
    and rank. Integer `//` floordiv == Spark `div` (all operands
    positive). Also the replay of the cold-store serve paths: the store
    persists exactly these postings/totals (bucketing only changes which
    FILES hold a term, never the rows), and after a full ingest the
    base-UNION-overlay state equals the whole corpus, so bm25_serve and
    stream_postings_ingest replay through the same SQL. ``src_batch``
    adds the provenance tag the ingest query reads back from the store's
    batch partitions (base = -1; the batches are the doc_id % 8 == 3 and
    % 8 == 7 slices in arrival order)."""
    k1n, k1d = 6, 5
    bn, bd = 3, 4
    qrows = ", ".join(
        f"({qid}::bigint, '{term}')"
        for qid, q in (queries if queries is not None else BM25_QUERIES)
        for term in q.split()
    )
    batch_col = (
        """,
           case when rk.doc_id % 8 = 3 then 0
                when rk.doc_id % 8 = 7 then 1
                else -1 end::int as src_batch"""
        if src_batch
        else ""
    )
    return f"""
    with tk as (
      select doc_id,
             case when trim(text) = '' then []
                  else string_split_regex(trim(text), ' +') end as tk
      from documents),
    post as (
      select term, doc_id, dl, count(*)::bigint as tf
      from (select doc_id, len(tk) as dl, unnest(tk) as term from tk)
      group by 1, 2, 3),
    qt as (select * from (values {qrows}) q(query_id, term)),
    tot as (select count(*)::bigint as n_docs,
                   coalesce(sum(len(tk)), 0)::bigint as n_toks
            from tk),
    dfq as (select term, count(*)::bigint as df from post
            where term in (select distinct term from qt) group by 1),
    cand as (select q.query_id, p.doc_id, p.tf, p.dl, d.df,
                    t.n_docs, t.n_toks
             from post p
             join qt q using (term)
             join dfq d using (term)
             cross join tot t),
    sc as (select query_id, doc_id,
                  ((({fp_scale} * (2 * (n_docs - df) + 1))
                      // (2 * n_docs + 1))
                   * (({fp_scale} * tf * {k1n + k1d} * {bd} * n_toks)
                      // (tf * {k1d * bd} * n_toks
                          + {k1n * (bd - bn)} * n_toks
                          + {k1n * bn} * dl * n_docs)))
                  // {fp_scale} as contrib
           from cand),
    agg as (select query_id, doc_id, sum(contrib)::bigint as score_fp
            from sc group by 1, 2),
    rk as (select *, row_number() over (partition by query_id
                                        order by score_fp desc,
                                                 doc_id asc) as rank
           from agg)
    select query_id, doc_id, rank::int as rank, score_fp{batch_col}
    from rk where rank <= {BM25_K}
    """


# distinct query set for the cold-store serve contract, so bm25_serve's
# hash gate is independent of bm25_topk's
BM25_SERVE_QUERIES = [
    (0, "merge sort join"),
    (1, "slow filter group"),
    (2, "big data column"),
    (3, "hash key row"),
]


def q_bm25_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 from the PERSISTED postings store: build writes the
    bucket-partitioned inverted file + the totals row once; the probe
    answers from cold reads only — query terms' buckets are computed
    driver-side and the postings scan partition-prunes to them, so serve
    cost follows the matched slice, never the corpus. Bit-identical to
    bm25_topk over the same corpus (one replay oracle covers both)."""
    import shutil
    import tempfile

    from credit_abs_oltp_to_mart_spark.operators import retrieval

    docs = _t(spark, sf_dir, "documents")
    qs = local_rows(spark, 
        BM25_SERVE_QUERIES, "query_id long, query string"
    )
    tmp = tempfile.mkdtemp(prefix="spark_bm25_store_")
    try:
        store = os.path.join(tmp, "store")
        retrieval.build_postings_store(docs, store)
        out = retrieval.bm25_store_probe(qs, store, k=BM25_K)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _bm25_serve_oracle() -> str:
    return _bm25_topk_oracle(queries=BM25_SERVE_QUERIES)


# --- hybrid BM25+ANN fusion ------------------------------------------------
# The operator + Fraction-reference parity landed in round 11
# (retrieval.hybrid_rank_fusion, tests/test_bm25.py); the contract entry
# was deferred one round (round 11's gate window had zero slack) and is
# REGISTERED as of round 12 in the window's single slack slot
# ("hybrid_rank_fusion"). tests/test_bm25.py::
# test_hybrid_fusion_contract_rehearsal exercises this exact query/oracle
# pair against DuckDB directly.

HYBRID_DEPTH = 8  # per-list shortlist depth feeding the fusion
HYBRID_RRF_K = 60
HYBRID_MAX_RANK = 1000
# deep-shortlist config (r13 oracle extension, capacity rule: extends the
# EXISTING composite oracle, no new contract entry): depth-64 shortlists
# fused under max_rank 10_000 via the decimal(38,0) carrier — the scale
# S = (60 + 10^4)^4 ~ 1.02e16 pushes num * S past int64, so this config
# exercises the decimal escape end-to-end against a DuckDB HUGEINT replay
HYBRID_DEPTH_DEEP = 64
HYBRID_MAX_RANK_DEEP = 10_000


# (w_lex, w_sem, depth, max_rank, decimal_scores) — weight pairs are
# distinct across configs because they tag the output rows
HYBRID_CONFIGS = [
    (1, 1, HYBRID_DEPTH, HYBRID_MAX_RANK, False),
    (2, 1, HYBRID_DEPTH, HYBRID_MAX_RANK, False),
    (3, 2, HYBRID_DEPTH_DEEP, HYBRID_MAX_RANK_DEEP, True),
]


def q_hybrid_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval serving: the BM25 lexical shortlist and the exact
    cosine semantic shortlist for the same query ids, fused by
    reciprocal-rank fusion in EXACT integer arithmetic
    (``retrieval.hybrid_rank_fusion`` — the RRF rational is materialized
    as a separating fixed point whose int64 ordering provably equals the
    rational ordering; no float enters the ranking). One fusion per
    ``HYBRID_CONFIGS`` entry, tagged by (w_lex, w_sem) — so the single
    gate verdict covers the unweighted, the integer-weighted, AND (r13)
    the DEEP-SHORTLIST decimal(38,0) separating fixed point: the third
    config fuses depth-64 shortlists under max_rank 10_000, whose scale
    S = (60 + 10^4)^4 pushes num * S past int64, so it runs on the
    decimal carrier end-to-end against a DuckDB HUGEINT replay (weighted
    numerators and the carrier type don't loosen the separation bound,
    only the envelope; see the operator proof)."""
    from credit_abs_oltp_to_mart_spark.operators import ann, retrieval

    docs = _t(spark, sf_dir, "documents")
    qs = local_rows(spark, BM25_QUERIES, "query_id long, query string")
    emb = _t(spark, sf_dir, "embeddings")
    qids = [qid for qid, _ in BM25_QUERIES]
    # ONE probe pair at the deepest depth serves every config: a
    # row_number shortlist filtered to rank <= d is bit-identical to the
    # depth-d probe (same ordering, same ranks 1..d), so the shallower
    # configs are free
    depths = sorted({cfg[2] for cfg in HYBRID_CONFIGS})
    deepest = depths[-1]
    lex_deep = retrieval.bm25_topk(docs, qs, k=deepest)
    sem_deep = ann.brute_force_topk(emb, qids, k=deepest).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    lists = {
        d: (
            lex_deep.where(F.col("rank") <= d),
            sem_deep.where(F.col("rank") <= d),
        )
        if d != deepest
        else (lex_deep, sem_deep)
        for d in depths
    }
    out = None
    for w_lex, w_sem, depth, max_rank, dec in HYBRID_CONFIGS:
        lex, sem = lists[depth]
        fused = retrieval.hybrid_rank_fusion(
            lex,
            sem,
            k=ANN_K,
            rrf_k=HYBRID_RRF_K,
            max_rank=max_rank,
            weights=(w_lex, w_sem),
            decimal_scores=dec,
        ).select(
            F.lit(w_lex).cast("int").alias("w_lex"),
            F.lit(w_sem).cast("int").alias("w_sem"),
            "*",
        )
        out = fused if out is None else out.unionByName(fused)
    return out


def _hybrid_fusion_oracle() -> str:
    """BM25 replay (one shortlist per distinct ``HYBRID_CONFIGS`` depth)
    + exact-cosine replay (same query ids) + the separating-fixed-point
    RRF key per config: fused_fp = num * (rrf_k + max_rank)^4 // den over
    the full-outer-joined shortlists, rank by (fused_fp desc, doc_id
    asc). The deep config's scale exceeds int64, so its block computes
    the product in DuckDB HUGEINT (int128) — exact integer arithmetic
    either way, mirroring the engine's bigint/decimal(38,0) carriers."""
    k1n, k1d, bn, bd, fp_scale = 6, 5, 3, 4, 10**6
    qrows = ", ".join(
        f"({qid}::bigint, '{term}')"
        for qid, q in BM25_QUERIES
        for term in q.split()
    )
    ids = ", ".join(str(qid) for qid, _ in BM25_QUERIES)
    cos = _COSINE.format(a="qv", b="nv")
    depths = sorted({cfg[2] for cfg in HYBRID_CONFIGS})
    shortlists = ",".join(
        f"""
    lex_{d} as (select query_id, doc_id, rank from lexr where rank <= {d}),
    sem_{d} as (select query_id, doc_id, rank from semr where rank <= {d}),
    joined_{d} as (
      select coalesce(l.query_id, s.query_id) as query_id,
             coalesce(l.doc_id, s.doc_id) as doc_id,
             l.rank::bigint as lex_rank, s.rank::bigint as sem_rank
      from lex_{d} l full join sem_{d} s
        on l.query_id = s.query_id and l.doc_id = s.doc_id)"""
        for d in depths
    )
    return f"""
    with tk as (
      select doc_id,
             case when trim(text) = '' then []
                  else string_split_regex(trim(text), ' +') end as tk
      from documents),
    post as (
      select term, doc_id, dl, count(*)::bigint as tf
      from (select doc_id, len(tk) as dl, unnest(tk) as term from tk)
      group by 1, 2, 3),
    qt as (select * from (values {qrows}) q(query_id, term)),
    tot as (select count(*)::bigint as n_docs,
                   coalesce(sum(len(tk)), 0)::bigint as n_toks
            from tk),
    dfq as (select term, count(*)::bigint as df from post
            where term in (select distinct term from qt) group by 1),
    cand as (select q.query_id, p.doc_id, p.tf, p.dl, d.df,
                    t.n_docs, t.n_toks
             from post p join qt q using (term) join dfq d using (term)
             cross join tot t),
    sc as (select query_id, doc_id,
                  ((({fp_scale} * (2 * (n_docs - df) + 1))
                      // (2 * n_docs + 1))
                   * (({fp_scale} * tf * {k1n + k1d} * {bd} * n_toks)
                      // (tf * {k1d * bd} * n_toks
                          + {k1n * (bd - bn)} * n_toks
                          + {k1n * bn} * dl * n_docs)))
                  // {fp_scale} as contrib
           from cand),
    agg as (select query_id, doc_id, sum(contrib)::bigint as score_fp
            from sc group by 1, 2),
    lexr as (select query_id, doc_id,
               row_number() over (partition by query_id
                 order by score_fp desc, doc_id asc) as rank from agg),
    q2 as (select vec_id as query_id, embedding::DOUBLE[] as qv
           from embeddings where vec_id in ({ids})),
    n2 as (select vec_id as doc_id, embedding::DOUBLE[] as nv
           from embeddings),
    scored as (select query_id, doc_id, {cos} as cosine
               from q2, n2 where doc_id <> query_id),
    semr as (select query_id, doc_id,
               row_number() over (partition by query_id
                 order by cosine desc, doc_id asc) as rank from scored),
    {shortlists},
    {",".join(_hybrid_fused_blocks())}
    {" union all ".join(_hybrid_final_selects())}
    """


def _hybrid_fused_blocks() -> list[str]:
    """One weighted fusedk/ranked CTE pair per HYBRID_CONFIGS entry —
    weighted RRF num = w_lex*(K+sem_rank) + w_sem*(K+lex_rank) over that
    config's full-outer ``joined_<depth>`` CTE, separating scale
    S = (rrf_k + max_rank)^4. Configs whose num * S product exceeds
    int64 (the deep max_rank = 10_000 one) compute it in HUGEINT —
    DuckDB's exact int128 — and the final fused_fp::bigint cast is safe
    because the quotient is bounded by w_sum * S / (rrf_k + 1) (the
    operator's decimal-mode envelope check)."""
    blocks = []
    for i, (w_lex, w_sem, depth, max_rank, dec) in enumerate(HYBRID_CONFIGS):
        scale = (HYBRID_RRF_K + max_rank) ** 4
        cast = "::hugeint" if dec else ""
        blocks.append(f"""
    fused_{i} as (
      select query_id, doc_id, lex_rank, sem_rank,
             ((case when lex_rank is not null
                    then {w_lex} * coalesce({HYBRID_RRF_K} + sem_rank, 1)
                    else 0 end
               + case when sem_rank is not null
                      then {w_sem} * coalesce({HYBRID_RRF_K} + lex_rank, 1)
                      else 0 end){cast} * {scale}{cast})
             // (coalesce({HYBRID_RRF_K} + lex_rank, 1)
                 * coalesce({HYBRID_RRF_K} + sem_rank, 1)){cast} as fused_fp
      from joined_{depth}),
    ranked_{i} as (
      select *, row_number() over (partition by query_id
        order by fused_fp desc, doc_id asc) as rank from fused_{i})""")
    return blocks


def _hybrid_final_selects() -> list[str]:
    return [
        f"""
    select {w_lex}::int as w_lex, {w_sem}::int as w_sem, query_id, doc_id,
           lex_rank, sem_rank, fused_fp::bigint as fused_fp, rank::int as rank
    from ranked_{i} where rank <= {ANN_K}"""
        for i, (w_lex, w_sem, _d, _m, _dec) in enumerate(HYBRID_CONFIGS)
    ]


def q_stream_postings_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous maintenance of the persisted BM25 postings store — the
    retrieval twin of stream_ann_ingest: the store is BUILT from the
    base 75% of the documents, the remaining 25% ARRIVES as 2 streaming
    micro-batches (tokenized under the store's fixed bucket hash,
    appended as batch-scoped postings + totals deltas), and the probe
    serves base UNION overlay from cold reads with read-your-latest
    dedup. Output = the BM25 top-k over the fully-ingested store, each
    row tagged with the batch the store RECORDED for its doc (base =
    -1) — so the hash gate covers tokenize-on-ingest, the batch-keyed
    appends, the totals deltas AND the union probe in one verdict."""
    import shutil
    import tempfile
    import time as _time

    from credit_abs_oltp_to_mart_spark.operators import retrieval

    docs = _t(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") % 4 != 3)
    qs = local_rows(spark, BM25_QUERIES, "query_id long, query string")
    tmp = tempfile.mkdtemp(prefix="spark_bm25_ingest_")
    try:
        store = os.path.join(tmp, "store")
        retrieval.build_postings_store(base, store)
        slices = os.path.join(tmp, "slices")
        _write_slices(
            slices,
            [(f"b{kk}", docs.where(F.col("doc_id") % 8 == resid))
             for kk, resid in enumerate([3, 7])],
        )
        streaming.stream_postings_ingest(
            spark, f"{slices}/b*", store, schema=docs.schema
        )
        served = retrieval.bm25_store_probe(
            qs, store, k=BM25_K, include_incremental=True
        )
        ingested = (
            spark.read.parquet(os.path.join(store, "postings_inc"))
            .select("doc_id", "ingest_batch")
            .distinct()
        )
        out = served.join(F.broadcast(ingested), "doc_id", "left").select(
            "query_id",
            "doc_id",
            "rank",
            "score_fp",
            F.coalesce(F.col("ingest_batch"), F.lit(-1))
            .cast("int")
            .alias("src_batch"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _stream_postings_ingest_oracle() -> str:
    return _bm25_topk_oracle(src_batch=True)


def _corpus_admitted_ctes(min_est: float = 0.25) -> str:
    """Shared CTE fragment: the batch-sequential replay of the streaming
    corpus ingest up to the per-batch ADMITTED sets (adm0/adm1/adm2,
    with ``gated`` carrying each admitted doc's tokens). CTE names are
    disjoint from _bpe_ctes's so the two chains compose:
    filter gate (quality/lang/length/PII — same expressions as
    corpus.filter_documents, quality ROUNDED to 6dp like quality_score),
    MinHash store-dedup of the gated docs (store = earlier batches'
    ADMITTED docs; within-batch vs smaller doc_ids), decontamination
    against the held-out split's distinct 5-gram blocklist (drop at
    overlap >= 0.5), and ceil(len/chunk) chunk counts per admitted doc."""
    coeffs = minhash_coefficients(MINHASH_PERMS, MINHASH_SEED)
    rows_per_band = MINHASH_PERMS // MINHASH_BANDS
    sig_cols = ", ".join(
        f"list_min(list_transform(hs, h -> (h * {a} + {b}) % {MERSENNE_31})) as s{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    band_exprs = ", ".join(
        "concat_ws(':', '{bi}', {vals})".format(
            bi=bi,
            vals=", ".join(
                f"s{bi * rows_per_band + r}" for r in range(rows_per_band)
            ),
        )
        for bi in range(MINHASH_BANDS)
    )
    match_sum = " + ".join(
        f"(sa.s{i} = sb.s{i})::int" for i in range(MINHASH_PERMS)
    )
    est_ok = (
        f"round(({match_sum}) / {float(MINHASH_PERMS)}, 6) >= {min_est}"
    )
    langs = sorted(STOPWORDS)
    ratios = ", ".join(
        "len(list_filter(ltk, t -> t in ({words})))::double"
        " / greatest(1, len(ltk)) as ratio_{lang}".format(
            words=", ".join(f"'{w}'" for w in STOPWORDS[lang]), lang=lang
        )
        for lang in langs
    )
    best = "greatest(" + ", ".join(f"ratio_{lang}" for lang in langs) + ")"
    jn = JACCARD_N
    jterms = " || ' ' || ".join(
        ["tk[i]"] + [f"tk[i+{j}]" for j in range(1, jn)]
    )
    dn = curation.DECONTAM_N
    dterms = " || ' ' || ".join(
        ["tk[i]"] + [f"tk[i+{j}]" for j in range(1, dn)]
    )
    gram_expr = (
        f"case when len(tk) < {dn} then [array_to_string(tk, ' ')]"
        f" else list_distinct(list_transform("
        f"generate_series(1, len(tk) - {dn - 1}), i -> {dterms})) end"
    )

    def banded(k: int) -> str:
        return f"""
    bn{k} as (select distinct doc_id, unnest([{band_exprs}]) as band_key
              from sigs where b = {k})"""

    def within(k: int) -> str:
        return f"""
    wc{k} as (select distinct a.doc_id as nid, bb.doc_id as cid
              from bn{k} a join bn{k} bb using (band_key)
              where a.doc_id > bb.doc_id),
    wm{k} as (select distinct nid from wc{k}
              join sigs sa on sa.doc_id = nid
              join sigs sb on sb.doc_id = cid
              where {est_ok})"""

    def level(k: int, prev_adm: str) -> str:
        return f"""
    bs{k} as (select distinct doc_id, unnest([{band_exprs}]) as band_key
              from {prev_adm}),
    sc{k} as (select distinct bn{k}.doc_id as nid, bs{k}.doc_id as cid
             from bn{k} join bs{k} using (band_key)),
    sm{k} as (select distinct nid from sc{k}
             join sigs sa on sa.doc_id = nid
             join sigs sb on sb.doc_id = cid
             where {est_ok}),
    adm{k} as (select * from sigs where b = {k}
               and doc_id not in (select nid from sm{k})
               and doc_id not in (select nid from wm{k})
               and doc_id not in (select doc_id from cont))"""

    return f"""
    train as (
      select doc_id, text from documents
      where {_split_bucket_sql("split:")} < {curation.TRAIN_PCT}),
    q0 as (
      select doc_id, text,
             string_split_regex(trim(text), ' +') as tk,
             string_split_regex(trim(lower(text)), ' +') as ltk
      from train where trim(text) <> ''),
    q1 as (
      select doc_id, text, tk, {ratios},
             len(regexp_extract_all(text, '[^A-Za-z0-9_ ]'))::double
               / greatest(1, length(text)) as punct,
             list_sum(list_transform(tk, x -> length(x)))::double
               / greatest(1, len(tk)) as mean_len,
             (len(regexp_extract_all(text, '{curation.EMAIL_PATTERN}'))
              + len(regexp_extract_all(text, '{curation.URL_PATTERN}'))
              + len(regexp_extract_all(text, '{curation.DIGIT_RUN_PATTERN}')))
               as pii
      from q0),
    gated as (
      select doc_id, text, tk from q1
      where {best} > 0
        and round(least(1.0, length(text)::double / 500.0) * (1.0 - punct)
              * (case when mean_len >= 2.0 and mean_len <= 12.0
                      then 1.0 else 0.5 end), 6) >= 0.3
        and len(tk) >= 8
        and pii = 0),
    sh as (
      select doc_id,
             case when len(tk) < {jn}
                  then [array_to_string(tk, ' ')]
                  else list_distinct(list_transform(
                         generate_series(1, len(tk) - {jn - 1}),
                         i -> {jterms}))
             end as shingles
      from gated),
    hashed as (
      select doc_id, list_transform(shingles,
               x -> ('0x' || substr(md5(x), 1, 15))::bigint % {MERSENNE_31}) as hs
      from sh),
    sigs as (
      select doc_id,
             ('0x' || substr(md5('ingest:' || doc_id::varchar), 1, 15))::bigint
               % 3 as b,
             {sig_cols}
      from hashed),
    entoks as (
      select doc_id, string_split_regex(trim(text), ' +') as tk
      from documents
      where {_split_bucket_sql("split:")} >= {curation.TRAIN_PCT}),
    bl as (
      select distinct gram from (
        select unnest({gram_expr}) as gram from entoks)),
    dg as (select doc_id, unnest({gram_expr}) as gram from gated),
    totg as (select doc_id, count(*) as ng from dg group by 1),
    hitg as (select doc_id, count(*) as nh from dg join bl using (gram)
             group by 1),
    cont as (
      select totg.doc_id from totg left join hitg using (doc_id)
      where coalesce(nh, 0)::double / ng >= 0.5),
    {banded(0)}, {within(0)},
    adm0 as (select * from sigs where b = 0
             and doc_id not in (select nid from wm0)
             and doc_id not in (select doc_id from cont)),
    {banded(1)}, {within(1)}, {level(1, "adm0")},
    adm01 as (select * from adm0 union all select * from adm1),
    {banded(2)}, {within(2)}, {level(2, "adm01")}
    """


def _stream_corpus_ingest_oracle(
    min_est: float = 0.25, chunk_tokens: int = 64
) -> str:
    """Batch-sequential replay of the streaming END-TO-END corpus ingest
    (filter gate -> MinHash store-dedup -> blocklist decontam), then
    ceil(len/chunk) chunk counts per admitted doc — the full chain lives
    in _corpus_admitted_ctes."""
    return f"""
    with {_corpus_admitted_ctes(min_est)}
    select g.doc_id, a.b::bigint as ingest_batch,
           ((len(g.tk) + {chunk_tokens - 1}) // {chunk_tokens})::int
             as n_chunks
    from (select doc_id, b from adm0
          union all select doc_id, b from adm1
          union all select doc_id, b from adm2) a
    join gated g on g.doc_id = a.doc_id
    """


def _simhash_oracle(n_bits: int = 60) -> str:
    """60-bit portable SimHash: token hash = first 15 md5 hex digits as
    bigint (< 2^60), bit-identical to Spark's md5_long — mirrors
    dedup.simhash_fingerprints(n_bits=60)."""
    bit_terms = " + ".join(
        f"case when list_sum(list_transform(hs, h -> case when (h >> {j}) & 1 = 1 "
        f"then 1 else -1 end)) > 0 then (1::bigint << {j}) else 0::bigint end"
        for j in range(n_bits)
    )
    return f"""
    with toks as (
      select doc_id,
             list_distinct(string_split_regex(trim(text), ' +')) as tk
      from documents),
    hashed as (
      select doc_id,
             list_transform(tk,
               x -> ('0x' || substr(md5(x), 1, 15))::bigint) as hs
      from toks)
    select doc_id, cast({bit_terms} as bigint) as simhash from hashed
    """


_COSINE = (
    "round(list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
)


def _ann_brute_oracle() -> str:
    ids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    cos = _COSINE.format(a="qv", b="nv")
    return f"""
    with q as (select vec_id as query_id, embedding::DOUBLE[] as qv
               from embeddings where vec_id in ({ids})),
    n as (select vec_id as neighbor_id, embedding::DOUBLE[] as nv from embeddings),
    scored as (
      select query_id, neighbor_id, {cos} as cosine
      from q, n where neighbor_id <> query_id),
    ranked as (
      select *, row_number() over (partition by query_id
                                   order by cosine desc, neighbor_id asc) as rank
      from scored)
    select query_id, neighbor_id, cast(rank as int) as rank, cosine
    from ranked where rank <= {ANN_K}
    """


def _lsh_bucket_expr(vec: str, seed: int = 42) -> str:
    planes = random_hyperplanes(LSH_PLANES, EMB_DIM, seed)
    terms = []
    for p, plane in enumerate(planes):
        lit = "[" + ", ".join(f"{v:.1f}" for v in plane) + "]::DOUBLE[]"
        terms.append(
            f"case when list_dot_product({vec}, {lit}) >= 0 then {1 << p} else 0 end"
        )
    return "(" + " + ".join(terms) + ")"


def _ann_lsh_oracle() -> str:
    ids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    cos = _COSINE.format(a="qv", b="nv")
    return f"""
    with b as (select vec_id, embedding::DOUBLE[] as v,
                      {_lsh_bucket_expr("embedding::DOUBLE[]")} as bucket
               from embeddings),
    q as (select vec_id as query_id, v as qv, bucket from b where vec_id in ({ids})),
    n as (select vec_id as neighbor_id, v as nv, bucket from b),
    scored as (
      select query_id, neighbor_id, {cos} as cosine
      from q join n using (bucket) where neighbor_id <> query_id),
    ranked as (
      select *, row_number() over (partition by query_id
                                   order by cosine desc, neighbor_id asc) as rank
      from scored)
    select query_id, neighbor_id, cast(rank as int) as rank, cosine
    from ranked where rank <= {ANN_K}
    """


def _emb_near_dup_oracle() -> str:
    cos = _COSINE.format(a="va", b="vb")
    return f"""
    with e as (select vec_id, embedding::DOUBLE[] as v from embeddings)
    select id_a, id_b, cosine from (
      select a.vec_id as id_a, b.vec_id as id_b,
             {_COSINE.format(a="a.v", b="b.v")} as cosine
      from e a, e b where a.vec_id < b.vec_id) z
    where cosine >= {EMB_NEAR_DUP_THRESHOLD}
    """


def _ann_ivf_oracle() -> str:
    qids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    cids = ", ".join(str(i) for i in IVF_CENTROID_IDS)
    cos = _COSINE.format(a="qv", b="nv")
    # centroid-assignment cosine is UNROUNDED (matches the Spark plan);
    # final scores round to 6dp like every similarity output
    return f"""
    with e as (select vec_id, embedding::DOUBLE[] as v from embeddings),
    c as (select vec_id as cid, v as cv from e where vec_id in ({cids})),
    sc as (
      select vec_id, v, cid,
             list_dot_product(v, cv)
               / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv)))
               as ccos
      from e, c),
    ranked as (
      select *, row_number() over (partition by vec_id
                                   order by ccos desc, cid asc) as crank
      from sc),
    assign as (
      select vec_id as neighbor_id, v as nv, cid as cluster
      from ranked where crank = 1),
    probes as (
      select vec_id as query_id, v as qv, cid as cluster
      from ranked where crank <= {IVF_NPROBE} and vec_id in ({qids})),
    scored as (
      select query_id, neighbor_id, {cos} as cosine
      from probes join assign using (cluster)
      where neighbor_id <> query_id),
    final as (
      select *, row_number() over (partition by query_id
                                   order by cosine desc, neighbor_id asc) as rank
      from scored)
    select query_id, neighbor_id, cast(rank as int) as rank, cosine
    from final where rank <= {ANN_K}
    """


# deterministic fake-media CTE — byte-identical to multimodal.synthesize_blobs
_MEDIA_CTE = """
    media as (
      select doc_id,
             unhex(md5(text)
               || case when doc_id % 4 >= 1 then md5(text || 'c1') else '' end
               || case when doc_id % 4 >= 2 then md5(text || 'c2') else '' end
               || case when doc_id % 4 >= 3 then md5(text || 'c3') else '' end
             ) as content,
             case cast(doc_id % 3 as int)
               when 0 then 'image' when 1 then 'audio' else 'video' end as modality,
             cast(1 + doc_id % 4 as int) as n_chunks
      from documents)
"""


def _multimodal_meta_oracle() -> str:
    return f"""
    with {_MEDIA_CTE}
    select doc_id, modality, n_chunks,
           case modality when 'image' then 'png'
                         when 'audio' then 'wav' else 'mp4' end as declared_format,
           cast(octet_length(content) as int) as n_bytes,
           md5(hex(content)) as checksum,
           cast(1 + ('0x' || substr(hex(content), 1, 2))::int % 64 as int) as width,
           cast(1 + ('0x' || substr(hex(content), 3, 2))::int % 64 as int) as height
    from media
    """


def _multimodal_features_oracle() -> str:
    hist_cols = ", ".join(
        f"cast(length(h) - length(replace(h, '{d}', '')) as int) as hist_{d.lower()}"
        for d in "0123456789ABCDEF"
    )
    return f"""
    with {_MEDIA_CTE}
    select doc_id, modality, cast(octet_length(content) as int) as n_bytes,
           {hist_cols}
    from (select doc_id, modality, content, hex(content) as h from media) z
    """


def _multimodal_frames_oracle() -> str:
    # frame i covers hex chars [i*16+1, i*16+16] (8 bytes); every 2nd frame
    return """
    with media as (
      select doc_id,
             upper(md5(text)
               || case when doc_id % 4 >= 1 then md5(text || 'c1') else '' end
               || case when doc_id % 4 >= 2 then md5(text || 'c2') else '' end
               || case when doc_id % 4 >= 3 then md5(text || 'c3') else '' end
             ) as h
      from documents where doc_id % 3 = 2),
    frames as (
      select doc_id,
             cast(f - 1 as int) as frame_no,
             substr(h, (f - 1) * 16 + 1, 16) as frame_hex
      from media,
           unnest(generate_series(1, cast(ceil(length(h) / 16.0) as bigint))) as t(f)
      where (f - 1) % 2 = 0)
    select doc_id, frame_no,
           cast(length(frame_hex) / 2 as int) as frame_bytes,
           md5(frame_hex) as frame_md5
    from frames
    """


def _image_near_dups_oracle(out_w: int = 8, out_h: int = 8) -> str:
    """Replays blob synthesis (planted copies included), the fake decode +
    nearest-neighbor resize, the integer-exact aHash, and the banded
    hamming join. Band values are assembled from the pixel bits directly
    (not by shifting the hash) so the oracle never arithmetic-shifts a
    negative BIGINT — Spark's shiftrightunsigned of the packed hash
    computes the identical value."""
    n_px = out_w * out_h
    px_exprs = []
    for r in range(out_h):
        for c in range(out_w):
            idx = f"(({r} * hh) // {out_h}) * ww + (({c} * ww) // {out_w})"
            # short buffers tile cyclically (idx % nb), exactly as
            # image_phash does — a no-op when len(buf) == h*w
            px_exprs.append(
                f"('0x' || substr(hx, (({idx}) % nb) * 2 + 1, 2))::int"
                f" as p{r * out_w + c}"
            )
    total = " + ".join(f"p{i}" for i in range(n_px))
    bit_terms = " + ".join(
        f"case when p{i} * {n_px} > total then "
        + ("(-9223372036854775807 - 1)" if i == 63 else f"(1::bigint << {i})")
        + " else 0::bigint end"
        for i in range(n_px)
    )
    band_exprs = ", ".join(
        "("
        + " + ".join(
            f"case when p{16 * b + j} * {n_px} > total then (1::bigint << {j})"
            " else 0::bigint end"
            for j in range(16)
        )
        + f") as band{b}"
        for b in range(4)
    )
    return f"""
    with base as (
      select doc_id, text from documents
      union all
      select doc_id + {IMG_PLANT_OFFSET} as doc_id, text
      from documents where doc_id % 30 = 0),
    media as (
      select doc_id,
             upper(md5(text)
               || case when doc_id % 4 >= 1 then md5(text || 'c1') else '' end
               || case when doc_id % 4 >= 2 then md5(text || 'c2') else '' end
               || case when doc_id % 4 >= 3 then md5(text || 'c3') else '' end
             ) as hx
      from base where doc_id % 3 = 0),
    dims as (
      select doc_id, hx, length(hx) // 2 as nb,
             1 + ('0x' || substr(hx, 1, 2))::int % 64 as ww,
             1 + ('0x' || substr(hx, 3, 2))::int % 64 as hh
      from media),
    pix as (select doc_id, {", ".join(px_exprs)} from dims),
    tot as (select *, {total} as total from pix),
    hashed as (
      select doc_id, cast({bit_terms} as bigint) as phash, {band_exprs}
      from tot),
    banded as (
      select doc_id, phash, t.b,
             case t.b when 0 then band0 when 1 then band1
                      when 2 then band2 else band3 end as band
      from hashed, (values (0), (1), (2), (3)) t(b)),
    cand as (
      select distinct a.doc_id as doc_a, b2.doc_id as doc_b,
             a.phash as sa, b2.phash as sb
      from banded a
      join banded b2 on a.b = b2.b and a.band = b2.band
      where a.doc_id < b2.doc_id)
    select doc_a, doc_b, bit_count(xor(sa, sb))::int as hamming
    from cand where bit_count(xor(sa, sb)) <= 3
    """


def _lang_id_oracle() -> str:
    langs = sorted(STOPWORDS)
    ratio_exprs = []
    for lang in langs:
        words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        ratio_exprs.append(
            f"len(list_filter(ltk, t -> t in ({words})))::double"
            f" / greatest(1, len(ltk)) as ratio_{lang}"
        )
    best = "greatest(" + ", ".join(f"ratio_{lang}" for lang in langs) + ")"
    pred_cases = " ".join(
        f"when ratio_{lang} = best then '{lang}'" for lang in langs
    )
    return f"""
    with toks as (
      select doc_id, string_split_regex(trim(lower(text)), ' +') as ltk
      from documents),
    ratios as (select doc_id, {", ".join(ratio_exprs)} from toks),
    scored as (select *, {best} as best from ratios)
    select doc_id, {", ".join(f"ratio_{lang}" for lang in langs)},
           case when best <= 0 then 'und' {pred_cases} else 'und' end as lang_pred
    from scored
    """


def _quality_oracle() -> str:
    return """
    with t as (
      select doc_id, text,
             string_split_regex(trim(text), ' +') as tk,
             len(regexp_extract_all(text, '[^A-Za-z0-9_ ]'))::double
               / greatest(1, length(text)) as punct_ratio
      from documents),
    m as (
      select doc_id, text, punct_ratio,
             list_sum(list_transform(tk, x -> length(x)))::double
               / greatest(1, len(tk)) as mean_len
      from t)
    select doc_id, length(text)::int as n_chars,
           round(least(1.0, length(text)::double / 500.0) * (1.0 - punct_ratio)
                 * (case when mean_len >= 2.0 and mean_len <= 12.0
                         then 1.0 else 0.5 end), 6) as quality
    from m
    """


def _token_counts_oracle() -> str:
    return f"""
    select doc_id,
           case when trim(text) = '' then 0
                else len(string_split_regex(trim(text), ' +')) end::int as n_ws_tokens,
           len(regexp_extract_all(text, '{TOKEN_PATTERN}'))::int as n_regex_tokens
    from documents
    """


def _fingerprint_oracle() -> str:
    return f"""
    with toks as (
      select doc_id,
             case when trim(text) = '' then []::varchar[]
                  else string_split_regex(trim(text), ' +') end as tk
      from documents)
    select doc_id,
           list_reduce(
             list_concat([7::bigint],
               list_transform(tk, t -> (length(t) * 17 + ascii(substr(t, 1, 1)))::bigint)),
             (a, b) -> (a * 31 + b) % {MERSENNE_31}) as fingerprint
    from toks
    """


def _split_bucket_sql(salt: str) -> str:
    """DuckDB twin of curation.split_bucket (md5_long % 100)."""
    return (
        f"(('0x' || substr(md5('{salt}' || doc_id::varchar), 1, 15))::bigint"
        f" % {curation.SPLIT_BUCKETS})::int"
    )


def _split_assign_oracle() -> str:
    t, v = curation.TRAIN_PCT, curation.TRAIN_PCT + curation.VAL_PCT
    return f"""
    with b as (
      select doc_id, lang, {_split_bucket_sql("split:")} as bucket from documents)
    select doc_id, lang, bucket,
           case when bucket < {t} then 'train'
                when bucket < {v} then 'val' else 'test' end as split
    from b
    """


def _stratified_sample_oracle() -> str:
    cases = " ".join(
        f"when lang = '{lang}' then {pct}"
        for lang, pct in sorted(curation.SAMPLE_RATES.items())
    )
    return f"""
    with b as (
      select doc_id, lang, {_split_bucket_sql("sample:")} as bucket from documents)
    select doc_id, lang, bucket from b
    where bucket < (case {cases} else {curation.SAMPLE_DEFAULT_PCT} end)
    """


def _doc_chunks_oracle() -> str:
    c = curation.CHUNK_TOKENS
    return f"""
    with toks as (
      select doc_id, string_split_regex(trim(text), ' +') as tk
      from documents where trim(text) <> ''),
    ch as (
      select doc_id, tk,
             unnest(generate_series(0, ((len(tk) + {c - 1}) // {c}) - 1)) as chunk_idx
      from toks)
    select doc_id, chunk_idx::int as chunk_idx,
           least({c}, len(tk) - chunk_idx * {c})::int as n_tokens,
           array_to_string(tk[chunk_idx * {c} + 1 : chunk_idx * {c} + {c}], ' ')
             as chunk_text
    from ch
    """


def _ngram_cte(n: int) -> str:
    """Parameterized twin of functions.text.word_ngrams (distinct n-grams,
    whole-doc fallback for short docs) — generalizes _SHINGLES_CTE."""
    terms = " || ' ' || ".join(["tk[i]"] + [f"tk[i+{j}]" for j in range(1, n)])
    return f"""
    ntoks as (
      select doc_id, string_split_regex(trim(text), ' +') as tk from documents
    ),
    ngr as (
      select doc_id,
             case when len(tk) < {n}
                  then [array_to_string(tk, ' ')]
                  else list_distinct(list_transform(
                         generate_series(1, len(tk) - {n - 1}), i -> {terms}))
             end as grams
      from ntoks
    )
    """


def _decontaminate_oracle() -> str:
    """Round-11 extension: the n-gram replay plus the SEMANTIC axis —
    the Lloyd-replay CTEs (shared with the kmeans/semantic_dedup oracles)
    feed a cross-split shared-cluster cosine pair set; per eval doc, the
    count and max cosine of train vectors within the threshold."""
    t = curation.TRAIN_PCT
    cos = _COSINE.format(a="ea.ve", b="eb.ve")
    return f"""
    {_kmeans_ctes(KMEANS_ITERS)},
    {_ngram_cte(curation.DECONTAM_N)},
    splits as (
      select doc_id,
             case when {_split_bucket_sql("split:")} < {t} then 'train'
                  else 'eval' end as is_train,
             case when {_split_bucket_sql("split:")} < {t} then 'train'
                  when {_split_bucket_sql("split:")} < {t + curation.VAL_PCT}
                  then 'val' else 'test' end as split
      from documents),
    g as (
      select ngr.doc_id, split, is_train, unnest(grams) as gram
      from ngr join splits using (doc_id)),
    tg as (select distinct gram from g where is_train = 'train'),
    ev as (select doc_id, split, gram from g where is_train <> 'train'),
    hits as (select doc_id, count(*) as c from ev join tg using (gram) group by 1),
    tot as (select doc_id, split, count(*) as n from ev group by 1, 2),
    e2 as (select vec_id, embedding::DOUBLE[] as ve from embeddings),
    vb as (select vid, (('0x' || substr(md5('split:' || vid::varchar), 1, 15))
                        ::bigint % {curation.SPLIT_BUCKETS}) as b
           from a{KMEANS_ITERS}),
    sem_pairs as (
      select x.vid as train_id, y.vid as eval_id, {cos} as cosine
      from a{KMEANS_ITERS} x
      join a{KMEANS_ITERS} y on x.cluster = y.cluster
      join vb bx on bx.vid = x.vid
      join vb bz on bz.vid = y.vid
      join e2 ea on ea.vec_id = x.vid
      join e2 eb on eb.vec_id = y.vid
      where bx.b < {t} and bz.b >= {t}),
    sem as (select eval_id as doc_id, count(*)::int as n_sem_hits,
                   max(cosine) as mc
            from sem_pairs where cosine >= {EMB_NEAR_DUP_THRESHOLD}
            group by 1)
    select tot.doc_id, tot.split, n::int as n_grams,
           coalesce(c, 0)::int as n_contaminated,
           round(coalesce(c, 0)::double / n, 6) as contamination,
           coalesce(n_sem_hits, 0)::int as n_sem_hits,
           coalesce(mc, 0.0)::double as max_train_cosine
    from tot left join hits on hits.doc_id = tot.doc_id
    left join sem on sem.doc_id = tot.doc_id
    """


def _token_freq_oracle(rare_max: int = 2) -> str:
    """Replay of textops.token_frequency_stats: global token counts joined
    back onto the token stream, per-doc rational averages."""
    return f"""
    with t as (
      select doc_id, unnest(string_split_regex(trim(text), ' +')) as tok
      from documents where trim(text) <> ''),
    f as (select tok, count(*) as cnt from t group by 1),
    pd as (select doc_id, count(*) as n, sum(cnt) as s,
                  count(case when cnt <= {rare_max} then 1 end) as r
           from t join f using (tok) group by 1)
    select d.doc_id, coalesce(n, 0)::int as n_tokens,
           round(s::double / n, 6) as avg_token_freq,
           round(r::double / n, 6) as rare_token_share
    from documents d left join pd using (doc_id)
    """


def _dup_spans_ctes(k: int = 8, min_count: int = 2, keep_first: bool = False) -> str:
    """Shared replay CTEs for textops.duplicate_spans: positional k-grams
    (md5 keys), corpus-wide occurrence filter (``keep_first`` additionally
    excludes each gram's earliest (doc_id, pos) occurrence), gaps-and-
    islands interval merge — ends with sp(doc_id, span_start, span_end)."""
    if keep_first:
        marked = f"""
    m as (select doc_id, pos from (
            select doc_id, pos,
                   count(*) over (partition by g) as c,
                   row_number() over (partition by g
                                      order by doc_id, pos) as rn
            from pg)
          where c >= {min_count} and rn > 1),"""
    else:
        marked = f"""
    dup as (select g from pg group by g having count(*) >= {min_count}),
    m as (select doc_id, pos from pg where g in (select g from dup)),"""
    return f"""
    ntoks as (
      select doc_id, string_split_regex(trim(text), ' +') as tk
      from documents where trim(text) <> ''),
    pg as (
      select doc_id, i - 1 as pos,
             md5(array_to_string(tk[i:i+{k - 1}], ' ')) as g
      from ntoks, unnest(generate_series(1, len(tk) - {k - 1})) as s(i)
      where len(tk) >= {k}),
    {marked}
    l as (select doc_id, pos,
                 lag(pos) over (partition by doc_id order by pos) as pp
          from m),
    mi as (select doc_id, pos,
                  sum(case when pp is null or pos - pp > {k}
                      then 1 else 0 end)
                    over (partition by doc_id order by pos
                          rows unbounded preceding) as isl
           from l),
    sp as (select doc_id, min(pos) as span_start, max(pos) + {k - 1} as span_end
           from mi group by doc_id, isl)"""


def _dup_spans_oracle(k: int = 8, min_count: int = 2) -> str:
    return f"""
    with {_dup_spans_ctes(k, min_count)}
    select doc_id, span_start::int as span_start, span_end::int as span_end,
           (span_end - span_start + 1)::int as n_tokens
    from sp
    """


def _dup_spans_removed_oracle(
    k: int = 8, min_count: int = 2, keep_first: bool = False
) -> str:
    """Replay of textops.remove_spans over duplicate_spans output: docs
    with spans are rebuilt from the surviving tokens (ordered string_agg),
    docs without keep their text untouched."""
    return f"""
    with {_dup_spans_ctes(k, min_count, keep_first)},
    alltok as (
      select doc_id, i - 1 as pos, tk[i] as tok
      from ntoks, unnest(generate_series(1, len(tk))) as s(i)),
    kept as (
      select a.doc_id, a.pos, a.tok from alltok a
      where not exists (select 1 from sp
                        where sp.doc_id = a.doc_id
                          and a.pos between sp.span_start and sp.span_end)),
    reb as (select doc_id, string_agg(tok, ' ' order by pos) as text
            from kept group by doc_id),
    hs as (select distinct doc_id from sp),
    rem as (select doc_id, sum(span_end - span_start + 1) as n_removed
            from sp group by doc_id)
    select d.doc_id,
           case when hs.doc_id is not null then coalesce(reb.text, '')
                else d.text end as text,
           coalesce(rem.n_removed, 0)::int as n_removed
    from documents d
    left join hs using (doc_id)
    left join reb on reb.doc_id = d.doc_id
    left join rem on rem.doc_id = d.doc_id
    """


def _decontaminate_store_oracle() -> str:
    """Replay of build_eval_gram_store + decontaminate_against_store: the
    non-train docs' distinct gram set is the blocklist; each train doc's
    overlap share against it decides the 0.5-threshold drop verdict."""
    t = curation.TRAIN_PCT
    return f"""
    with {_ngram_cte(curation.DECONTAM_N)},
    splits as (
      select doc_id,
             case when {_split_bucket_sql("split:")} < {t} then 'train'
                  else 'eval' end as is_train
      from documents),
    g as (select ngr.doc_id, is_train, unnest(grams) as gram
          from ngr join splits using (doc_id)),
    store as (select distinct gram from g where is_train <> 'train'),
    tr as (select doc_id, gram from g where is_train = 'train'),
    hits as (select doc_id, count(*) as c
             from tr join store using (gram) group by 1),
    tot as (select doc_id, count(*) as n from tr group by 1)
    select tot.doc_id, n::int as n_grams, coalesce(c, 0)::int as n_hit,
           round(coalesce(c, 0)::double / n, 6) as overlap,
           (coalesce(c, 0)::double / n >= 0.5) as dropped
    from tot left join hits using (doc_id)
    """


def _tfidf_oracle() -> str:
    return """
    with toks as (
      select doc_id, unnest(string_split_regex(trim(text), ' +')) as term
      from documents where trim(text) <> ''),
    tf as (select doc_id, term, count(*) as tf from toks group by 1, 2),
    dfq as (select term, count(*) as df from tf group by 1),
    scored as (
      select doc_id, term, tf,
             (tf * (select count(*) from documents))::double / df as score_raw
      from tf join dfq using (term)),
    ranked as (
      select *, row_number() over (
               partition by doc_id order by score_raw desc, term asc) as rnk
      from scored)
    select doc_id, term, tf::int as tf, round(score_raw, 6) as tfidf,
           rnk::int as "rank"
    from ranked where rnk <= 5
    """


def _pack_chunks_oracle() -> str:
    c = curation.CHUNK_TOKENS
    return f"""
    with toks as (
      select doc_id, string_split_regex(trim(text), ' +') as tk
      from documents where trim(text) <> ''),
    ch as (
      select doc_id, tk,
             unnest(generate_series(0, ((len(tk) + {c - 1}) // {c}) - 1)) as chunk_idx
      from toks),
    sized as (
      select doc_id, chunk_idx::int as chunk_idx,
             least({c}, len(tk) - chunk_idx * {c})::int as n_tokens,
             (('0x' || substr(md5('shard:' || doc_id::varchar), 1, 15))::bigint
              % {curation.PACK_SHARDS})::int as shard
      from ch),
    packed as (
      select shard, doc_id, chunk_idx, n_tokens,
             coalesce(sum(n_tokens) over (
               partition by shard order by doc_id, chunk_idx
               rows between unbounded preceding and 1 preceding), 0)::bigint
               as start_tok
      from sized)
    select shard, doc_id, chunk_idx, n_tokens, start_tok,
           start_tok // {curation.PACK_BIN_TOKENS} as bin
    from packed
    """


def _pii_oracle() -> str:
    return f"""
    select doc_id,
           len(regexp_extract_all(text, '{curation.EMAIL_PATTERN}'))::int as n_emails,
           len(regexp_extract_all(text, '{curation.URL_PATTERN}'))::int as n_urls,
           len(regexp_extract_all(text, '{curation.DIGIT_RUN_PATTERN}'))::int
             as n_digit_runs,
           (len(regexp_extract_all(text, '{curation.EMAIL_PATTERN}'))
            + len(regexp_extract_all(text, '{curation.URL_PATTERN}'))
            + len(regexp_extract_all(text, '{curation.DIGIT_RUN_PATTERN}'))) > 0
             as has_pii,
           length(regexp_replace(regexp_replace(regexp_replace(text,
                    '{curation.EMAIL_PATTERN}', '<EMAIL>', 'g'),
                    '{curation.URL_PATTERN}', '<URL>', 'g'),
                    '{curation.DIGIT_RUN_PATTERN}', '<NUM>', 'g'))::int
             as redacted_len
    from documents
    """


# ---------------------------------------------------------------------------
# Temporal operators / sketches / profiling (operators/temporal.py etc.)
# ---------------------------------------------------------------------------

INTERVAL_JOIN_WINDOW_S = 900
KMV_K = 64
_KMV_M_INT = 16**15  # 2^60: hash domain of the 15-hex-digit md5 prefix


def q_interval_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join with NO equi key (time-bucketed): every purchase opens a
    15-minute attribution window; count/sum the clicks of ANY user that
    land in it. Empty windows are kept (left join back to the intervals)."""
    from credit_abs_oltp_to_mart_spark.operators.temporal import interval_join

    e = _t(spark, sf_dir, "events")
    iv = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("buyer_id"),
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 900 SECONDS")).alias("end"),
    )
    pts = e.where(F.col("event_type") == "click").select(
        F.col("ts"), F.col("value")
    )
    matched = (
        interval_join(
            pts, iv, point_ts="ts", start="start", end="end",
            bucket_seconds=INTERVAL_JOIN_WINDOW_S,
        )
        .groupBy("purchase_id")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.sum(F.col("value").cast(_D182)).alias("sum_dec"),
        )
    )
    return (
        iv.select("purchase_id", "buyer_id")
        .join(matched, "purchase_id", "left")
        .select(
            "purchase_id",
            "buyer_id",
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce(F.col("sum_dec").cast("double"), F.lit(0.0)).alias(
                "sum_click_value"
            ),
        )
    )


def q_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution continuous aggregate (hour -> day -> week), each
    level built from the previous level's partials; raw scanned once."""
    from credit_abs_oltp_to_mart_spark.operators.temporal import (
        hypertable_rollup,
    )

    e = _t(spark, sf_dir, "events")
    return hypertable_rollup(
        e, ts_col="ts", dims=("event_type",), measure="value"
    ).select(
        "resolution_s",
        F.floor(F.unix_timestamp("bucket_start")).cast("long").alias("bucket_s"),
        "event_type",
        "n_events",
        "sum_value",
    )


def q_scd2_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 dimension from the event change log: collapse each user's
    consecutive same-event_type runs into validity intervals."""
    from credit_abs_oltp_to_mart_spark.operators.temporal import (
        scd2_from_changelog,
    )

    e = _t(spark, sf_dir, "events")
    return scd2_from_changelog(
        e, key="user_id", attr="event_type", ts_col="ts", tiebreak="event_id"
    ).select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("valid_from").cast("timestamp")).alias("valid_from_us"),
        F.unix_micros(F.col("valid_to").cast("timestamp")).alias("valid_to_us"),
        F.col("version").cast("long").alias("version"),
        "n_changes",
        "is_current",
    )


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch per event_type (estimate is a pure
    function of md5 order statistics, so the oracle reproduces it)."""
    from credit_abs_oltp_to_mart_spark.operators.sketches import kmv_distinct

    return kmv_distinct(
        _t(spark, sf_dir, "events"),
        key="user_id",
        group_cols=("event_type",),
        k=KMV_K,
    )


# lineitem dtypes for the profile oracle (driver testdata schema)
_LINEITEM_PROFILE_COLS: list[tuple[str, str]] = [
    ("l_orderkey", "num"),
    ("l_partkey", "num"),
    ("l_suppkey", "num"),
    ("l_linenumber", "num"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_discount", "num"),
    ("l_tax", "num"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_shipdate", "ts"),
]


def q_profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass ANALYZE-style profile of lineitem (nulls, exact
    distincts, min/max) unpivoted to one row per column."""
    from credit_abs_oltp_to_mart_spark.operators.profile import profile_table

    return profile_table(_t(spark, sf_dir, "lineitem"))


def q_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event_type via fixed-width bitmaps
    (bitmap_construct_agg): the shuffle carries 4 KB bitmaps per
    (group, bucket) instead of every distinct key — the 100 TB shape for
    exact COUNT(DISTINCT)."""
    from credit_abs_oltp_to_mart_spark.operators.sketches import (
        bitmap_exact_distinct,
    )

    return bitmap_exact_distinct(
        _t(spark, sf_dir, "events"), key="user_id", group_cols=("event_type",)
    )


def q_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind rollup/cube): the
    four levels of (priority, status) chosen individually, one shuffle,
    map-side partials for every set."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderstatus",
        F.col("o_totalprice").cast(_D182).alias("price"),
    )
    return o.groupingSets(
        [["o_orderpriority", "o_orderstatus"], ["o_orderpriority"], ["o_orderstatus"], []],
        "o_orderpriority",
        "o_orderstatus",
    ).agg(
        F.grouping_id().alias("gid"),
        F.sum("price").cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec window family: first/last/nth_value with explicit ROWS
    frames, multi-offset lag/lead, and a 4-row moving sum — one shuffle,
    one sort, all functions share the (priority, date) ordering."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    base = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    grow = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full = base.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    trail = base.rowsBetween(-3, Window.currentRow)
    price = F.col("o_totalprice").cast(_D182)
    return o.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.first("o_totalprice").over(grow).alias("first_price"),
        F.last("o_totalprice").over(full).alias("last_price"),
        F.nth_value("o_totalprice", 3).over(grow).alias("third_price"),
        F.lag("o_totalprice", 2, -1.0).over(base).alias("prev2_price"),
        F.lead("o_totalprice", 1).over(base).alias("next_price"),
        F.sum(price).over(trail).cast("double").alias("trailing4_sum"),
    )


def q_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """median() and deterministic mode() aggregates per (return flag, ship
    month) group — a real per-group median over ~250 groups, not 3 (ties
    in mode resolve to the lowest value so any engine reproduces it)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(
        "l_returnflag",
        F.date_trunc("month", F.col("l_shipdate")).cast("date").alias(
            "ship_month"
        ),
    ).agg(
        F.median(F.col("l_quantity").cast("int")).alias("median_qty"),
        F.mode(F.col("l_linestatus"), True).alias("mode_status"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide per-line measures to long (measure, value)
    rows — map-only, no shuffle; the layout step before per-measure
    profiling at scale."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("qty"),
        F.col("l_extendedprice").cast("double").alias("price"),
        F.col("l_discount").cast("double").alias("disc"),
        F.col("l_tax").cast("double").alias("tax"),
    )
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["qty", "price", "disc", "tax"],
        "measure",
        "value",
    )


def q_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column: transform /
    filter / aggregate run inside codegen — no UDF, no explode-shuffle.
    The sum of squares is int64-exact (elements quantized at 1e-7 with the
    floor(x+0.5) half-up trick) so any engine reproduces it bit-for-bit."""
    e = _t(spark, sf_dir, "embeddings")
    quant = "cast(floor(cast(x as double) * 1e7 + 0.5d) as bigint)"
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.expr("size(filter(embedding, x -> x > 0f))").alias("n_pos"),
        F.expr(
            "aggregate(embedding, cast(0 as bigint),"
            f" (acc, x) -> acc + {quant} * {quant})"
        ).alias("sum_sq_q"),
        F.array_max("embedding").cast("double").alias("max_component"),
    )


def q_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click -> purchase): each stage's
    first-qualifying timestamp is a windowed conditional min over the SAME
    user partition, so all three stages resolve in one shuffle + one
    window stage — no per-stage self-joins."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    tv = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    staged = e.withColumn("tv", tv)
    tc = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") >= F.col("tv")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("tc", tc)
    tp = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") >= F.col("tc")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("tp", tp)
    per_user = staged.select("user_id", "tv", "tc", "tp").distinct()
    # dimensional funnel: per-user stage flags roll up by (market segment,
    # nation) through a broadcast dim join — ~85 output rows at sf0.01
    # instead of a single global row, and the at-scale shape (fact window
    # shuffle + broadcast dim) stays unchanged
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nationkey"),
    )
    return (
        per_user.join(F.broadcast(cust), "user_id")
        .groupBy("segment", "nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.count("tv").alias("n_viewed"),
            F.count("tc").alias("n_clicked_after_view"),
            F.count("tp").alias("n_purchased_after_click"),
        )
    )


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-active day,
    distinct-user counts per (cohort, day offset). Two aggregations and a
    window min — the user shuffle is shared by the window and the dedup."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id")
    cohorts = ud.withColumn("cohort_day", F.min("day").over(w))
    return (
        cohorts.groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram per event type (bin = floor(value/25)): the
    binning is a map-side expression, so the only shuffle carries one row
    per (type, bin) partial."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            "event_type",
            F.floor(F.col("value") / F.lit(25.0)).cast("long").alias("bin"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_D182)).cast("double").alias("bin_value"),
        )
    )


def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA smoothing (alpha=0.5) of event values — the recursive
    per-key kernel via Arrow grouped-map (see temporal.ewma_smooth)."""
    from credit_abs_oltp_to_mart_spark.operators.temporal import ewma_smooth

    e = _t(spark, sf_dir, "events")
    return ewma_smooth(
        e, key="user_id", ts_col="ts", value_col="value",
        alpha=0.5, tiebreak="event_id",
    ).select("user_id", "event_id", "ts", "value", "ewma")


def q_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: tokens WITH ordinal position (map-only Generate) — the
    first five tokens of every document, position-indexed."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token"),
        )
        .where((F.col("pos") < 5) & (F.col("token") != ""))
    )


def q_array_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set -> array_sort -> array_join: per-group distinct values
    as a deterministic CSV (collect_set order is partition-dependent, so
    the sort is what makes the result an engine-stable value)."""
    li = _t(spark, sf_dir, "lineitem")
    months = li.select(
        "l_returnflag",
        F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
    )
    return months.groupBy("l_returnflag").agg(
        F.array_join(
            F.array_sort(F.collect_set("ship_month")), ","
        ).alias("ship_months"),
        F.size(F.collect_set("ship_month")).alias("n_months"),
    )


def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT (Spark 4 semi-structured type): parse the JSON props column
    once into variant, extract a typed field, aggregate. Unlike per-path
    get_json_object, the parse cost is paid once per row however many
    fields are later extracted."""
    e = _t(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("k_total"),
            F.max("k").alias("k_max"),
        )
    )


def q_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression family (try_divide / try_cast): malformed
    input degrades to NULL instead of failing the job — the posture a
    100 TB pipeline needs, where one bad row must not kill a stage."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(
            F.try_divide(F.col("l_extendedprice"), F.col("l_discount"))
        ).alias("n_divisible"),
        F.count(F.lit(1)).alias("n_rows"),
        # unit price summed exactly: cents*1e4 / qty floored to int — both
        # engines do one IEEE divide + floor, so no decimal-scale drift
        F.sum(
            F.floor(
                F.floor(F.col("l_extendedprice") * 100 + 0.5)
                * 10000.0
                / F.col("l_quantity")
            ).cast("long")
        ).alias("unit_price_sum_q"),
    )


def q_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: build a measure map per line, explode it
    (Generate MapExplode — map-side, no shuffle until the final agg), and
    total each measure key."""
    li = _t(spark, sf_dir, "lineitem")
    m = F.create_map(
        F.lit("qty"), F.col("l_quantity").cast(_D182),
        F.lit("price"), F.col("l_extendedprice").cast(_D182),
        F.lit("tax"), F.col("l_tax").cast(_D182),
    )
    return (
        li.select(F.explode(m).alias("measure", "v"))
        .groupBy("measure")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").cast("double").alias("total"),
        )
    )


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8-class scalar quantization of the embedding column (4-8x scan
    reduction for ANN at scale); emits integer code statistics per vector
    so the oracle checks the exact codes without array-compare semantics."""
    from credit_abs_oltp_to_mart_spark.operators.ann import (
        quantize_embeddings,
    )

    q = quantize_embeddings(_t(spark, sf_dir, "embeddings"))
    return q.select(
        "vec_id",
        "scale_min",
        "scale_max",
        F.size("codes").alias("dim"),
        F.expr(
            "aggregate(codes, cast(0 as bigint), (a, x) -> a + x)"
        ).alias("code_sum"),
        F.expr(
            "aggregate(codes, cast(0 as bigint), (a, x) -> a + x * x)"
        ).alias("code_sumsq"),
        F.array_min("codes").alias("code_min"),
        F.array_max("codes").alias("code_max"),
    )


ANN_QUANT_QUERIES = 8
ANN_QUANT_K = 5


def q_ann_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search over the int8-quantized codes: top-k neighbors by
    integer dot product (zip_with + aggregate, codegen) — the compressed-
    domain candidate pass that precedes exact rescoring at 100 TB. All
    arithmetic is integral, so ranks are engine-exact."""
    from credit_abs_oltp_to_mart_spark.operators.ann import (
        quantize_embeddings,
    )
    from pyspark.sql import Window

    q = quantize_embeddings(_t(spark, sf_dir, "embeddings")).select(
        "vec_id", "codes"
    )
    probes = F.broadcast(
        q.where(F.col("vec_id") < ANN_QUANT_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("codes").alias("qc")
        )
    )
    scored = q.join(probes, F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.expr(
            "aggregate(zip_with(codes, qc, (a, b) -> a * b),"
            " cast(0 as bigint), (acc, x) -> acc + x)"
        ).alias("dot"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= ANN_QUANT_K)
        .select("query_id", "neighbor_id", "rank", "dot")
    )


def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL-string API (every other
    entry uses the DataFrame DSL; this proves the SQL surface): orders
    priced above their customer's average. Catalyst decorrelates to an
    aggregate + join — no per-row re-execution."""
    path = f"{sf_dir.rstrip('/')}/orders.parquet"
    return spark.sql(f"""
        select o.o_orderkey, o.o_custkey,
               cast(o.o_totalprice as double) as price
        from parquet.`{path}` o
        where cast(o.o_totalprice as decimal(18,2)) * (
                select count(*) from parquet.`{path}` c
                where c.o_custkey = o.o_custkey)
              > (
                select sum(cast(i.o_totalprice as decimal(18,2)))
                from parquet.`{path}` i
                where i.o_custkey = o.o_custkey)
    """)
    # price*n > sum(price) === price > avg(price), but in exact decimal
    # arithmetic — an avg() comparison sits on a float boundary that two
    # engines can round differently


def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS with a non-key predicate (decorrelates to a semi
    join on the key + pushed filter): orders containing any high-quantity
    line."""
    o_path = f"{sf_dir.rstrip('/')}/orders.parquet"
    l_path = f"{sf_dir.rstrip('/')}/lineitem.parquet"
    return spark.sql(f"""
        select o.o_orderkey, o.o_orderstatus,
               cast(o.o_totalprice as double) as price
        from parquet.`{o_path}` o
        where exists (
          select 1 from parquet.`{l_path}` l
          where l.l_orderkey = o.o_orderkey and l.l_quantity > 45)
    """)


def q_window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """last_value IGNORE NULLS as a growing-frame window — the LOCF
    (last-observation-carried-forward) pattern over a sparse column: each
    event carries the most recent purchase amount seen for its user."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    sparse = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.last(sparse, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


def q_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day. COUNT(DISTINCT) over a
    sliding frame isn't a window function Spark (or anyone) can stream, so
    each (user, day) replicates into the 7 day-slots it influences —
    map-side explode, one shuffle of (slot, user) pairs, exact distinct
    per slot. A semi join against observed days trims phantom tail slots."""
    e = _t(spark, sf_dir, "events")
    ud = e.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    days = ud.select("day").distinct()
    slots = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add("day", 6))
        ).alias("day"),
    )
    return (
        slots.join(days, "day", "left_semi")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("n_users_7d"))
    )


WEIGHTED_SAMPLE_K = 100


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling: documents race with length-
    proportional tickets (1-8 per doc); integer hash priorities make the
    winning set engine-reproducible."""
    from credit_abs_oltp_to_mart_spark.operators.curation import (
        weighted_sample,
    )

    d = _t(spark, sf_dir, "documents")
    tickets = F.least(
        F.lit(8),
        F.greatest(F.lit(1), F.floor(F.col("n_chars") / 256).cast("int")),
    )
    return weighted_sample(
        d, id_col="doc_id", weight=tickets, k=WEIGHTED_SAMPLE_K
    )


def q_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=>): per-key aggregates joined so the
    NULL bucket (nullif-suppressed flag) pairs up instead of dropping —
    one-sided nulls appear on neither side's output."""
    li = _t(spark, sf_dir, "lineitem")
    a = li.groupBy(
        F.nullif("l_returnflag", F.lit("A")).alias("k")
    ).agg(F.count(F.lit(1)).alias("n_a"))
    b = li.groupBy(
        F.nullif("l_returnflag", F.lit("R")).alias("k")
    ).agg(F.count(F.lit(1)).alias("n_b"))
    return a.join(b, a["k"].eqNullSafe(b["k"]), "inner").select(
        a["k"].alias("flag_a"), b["k"].alias("flag_b"), "n_a", "n_b"
    )


def _profile_oracle() -> str:
    parts = []
    for c, kind in _LINEITEM_PROFILE_COLS:
        if kind == "num":
            mn, mx = f"min({c})::double", f"max({c})::double"
            ms, xs = "null::varchar", "null::varchar"
        elif kind == "ts":
            mn = f"floor(epoch(min({c})))::double"
            mx = f"floor(epoch(max({c})))::double"
            ms, xs = "null::varchar", "null::varchar"
        else:
            mn, mx = "null::double", "null::double"
            ms, xs = f"min({c})", f"max({c})"
        parts.append(
            f"""select '{c}' as column_name, count(*) as n_rows,
                count(*) - count({c}) as n_nulls,
                count(distinct {c}) as n_distinct,
                {mn} as min_num, {mx} as max_num,
                {ms} as min_str, {xs} as max_str from lineitem"""
        )
    return "\nunion all\n".join(parts)


# ---------------------------------------------------------------------------
# Graph metrics / UDTF
# ---------------------------------------------------------------------------


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangles on a deterministic band+chord graph over
    customers (degree-oriented wedge join — no hub blowup)."""
    from credit_abs_oltp_to_mart_spark.operators.graph_metrics import (
        triangle_count,
    )

    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id")
    )
    n = cust.count()
    edges = None
    for expr in ("id + 1", "id + 2", "id * 7 + 3"):
        e = cust.select(
            F.col("id").alias("src"), (F.expr(expr) % n).alias("dst")
        )
        edges = e if edges is None else edges.unionByName(e)
    return triangle_count(edges, cust)


def q_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF via LATERAL join: per-document sentence expansion
    (map-only — each partition expands independently)."""
    from credit_abs_oltp_to_mart_spark.operators.udtf_ops import (
        register_udtfs,
    )

    register_udtfs(spark)
    _t(spark, sf_dir, "documents").createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        """
        select d.doc_id, s.sentence_no, s.sentence, s.n_chars
        from __udtf_docs d, lateral split_sentences(d.text) s
        """
    )


# ---------------------------------------------------------------------------
# Gap fill / full outer / fuzzy match
# ---------------------------------------------------------------------------

FUZZY_MAX_DISTANCE = 8


def q_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-user daily series: zero-filled counts + LOCF value sums
    over each user's own [first, last] active-day range."""
    from credit_abs_oltp_to_mart_spark.operators.gapfill import gap_fill_locf

    return gap_fill_locf(
        _t(spark, sf_dir, "events"), key="user_id", ts_col="ts",
        value_col="value", bucket_seconds=86400,
    )


def q_full_outer_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join reconciliation: open-order vs finished-order revenue
    per customer, with a side indicator for one-sided keys (completes the
    §2.4 join-type matrix: inner/left/semi/anti/cross/asof/full)."""
    o = _t(spark, sf_dir, "orders")

    def rev(status: str, name: str) -> DataFrame:
        return (
            o.where(F.col("o_orderstatus") == status)
            .groupBy(F.col("o_custkey").alias(f"{name}_key"))
            .agg(
                F.sum(F.col("o_totalprice").cast(_D182))
                .cast("double")
                .alias(f"{name}_revenue")
            )
        )

    a, b = rev("O", "open"), rev("F", "fin")
    return a.join(
        b, F.col("open_key") == F.col("fin_key"), "full_outer"
    ).select(
        F.coalesce("open_key", "fin_key").alias("custkey"),
        F.coalesce("open_revenue", F.lit(0.0)).alias("open_revenue"),
        F.coalesce("fin_revenue", F.lit(0.0)).alias("fin_revenue"),
        F.when(F.col("open_key").isNull(), "FIN_ONLY")
        .when(F.col("fin_key").isNull(), "OPEN_ONLY")
        .otherwise("BOTH")
        .alias("side"),
    )


def q_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked entity resolution: customers re-keyed with a corrupted name
    (digit tail reversed) matched back by Levenshtein within nation
    blocks; argmin with a total tiebreak."""
    from credit_abs_oltp_to_mart_spark.operators.fuzzy import fuzzy_match

    cust = _t(spark, sf_dir, "customer")
    probes = cust.where(F.col("c_custkey") % 101 == 0).select(
        F.col("c_custkey").alias("probe_id"),
        F.concat(
            F.substring("c_name", 1, 10),
            F.reverse(F.expr("substring(c_name, 11)")),
        ).alias("probe_name"),
        "c_nationkey",
    )
    cands = cust.select(
        F.col("c_custkey").alias("cand_id"),
        F.col("c_name").alias("cand_name"),
        "c_nationkey",
    )
    return fuzzy_match(
        probes,
        cands,
        probe_id="probe_id",
        probe_col="probe_name",
        cand_id="cand_id",
        cand_col="cand_name",
        block_cols=["c_nationkey"],
        max_distance=FUZZY_MAX_DISTANCE,
    )


# ---------------------------------------------------------------------------
# Iterative algorithms: PageRank (fixed point), k-means (fixed point)
# ---------------------------------------------------------------------------

PAGERANK_ITERS = 8
KMEANS_ITERS = 3
KMEANS_INIT_IDS = IVF_CENTROID_IDS


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8 power iterations over a deterministic 2-regular permutation graph
    on customers; bigint fixed-point arithmetic makes the trajectory
    bit-identical to the oracle's unrolled recursion."""
    from credit_abs_oltp_to_mart_spark.operators.pagerank import pagerank

    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id")
    )
    n = cust.count()
    edges = cust.select(
        F.col("id").alias("src"), ((F.col("id") * 7 + 3) % n).alias("dst")
    ).unionByName(
        cust.select(
            F.col("id").alias("src"), ((F.col("id") * 13 + 5) % n).alias("dst")
        )
    )
    return pagerank(edges, cust, iterations=PAGERANK_ITERS)


def _pagerank_oracle(iters: int = PAGERANK_ITERS) -> str:
    steps = []
    for i in range(iters):
        steps.append(f"""
            c{i} as (select ed.dst as id, sum(r.r // ed.deg) as s
                     from r{i} r join ed on r.id = ed.src group by 1),
            r{i + 1} as (select v.id,
                           (150000000000 + (85 * coalesce(c{i}.s, 0)) // 100)::bigint as r
                         from v left join c{i} on v.id = c{i}.id)""")
        # NB: // floors, but every operand here is non-negative, so it
        # agrees with Spark's truncating `div`
    return (
        """
        with v as (select c_custkey as id from customer),
        nn as (select count(*) as n from customer),
        e as (select id as src, (id * 7 + 3) % n as dst from v, nn
              union all
              select id, (id * 13 + 5) % n from v, nn),
        deg as (select src, count(*) as deg from e group by 1),
        ed as (select e.src, e.dst, deg.deg from e join deg using (src)),
        r0 as (select id, 1000000000000::bigint as r from v),"""
        + ",".join(steps)
        + f" select id, r as rank_fp from r{iters}"
    )


def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 Lloyd rounds over the embeddings (integer fixed point; init =
    the IVF codebook member vectors); returns the final assignment."""
    from credit_abs_oltp_to_mart_spark.operators.kmeans import kmeans_assign

    return kmeans_assign(
        _t(spark, sf_dir, "embeddings"),
        init_ids=KMEANS_INIT_IDS,
        iterations=KMEANS_ITERS,
    )


def _kmeans_ctes(iters: int = KMEANS_ITERS, where_v: str = "") -> str:
    """The Lloyd-replay CTE chain shared by the kmeans and trained-IVF
    oracles: ends with a{iters} (vid, cluster) assignments and
    c{iters-1} (cid, d, c) — the codebook that produced them.
    ``where_v`` restricts the TRAINING set (e.g. a base/stream split) —
    init ids must satisfy it."""
    ids = ", ".join(str(i) for i in KMEANS_INIT_IDS)
    parts = [
        f"""
        with v as (select vec_id as vid,
                     list_transform(embedding, x -> cast(case when x >= 0
                       then floor(x::double * 1000000 + 0.5)
                       else -floor(-x::double * 1000000 + 0.5) end
                       as bigint)) as a
                   from embeddings {where_v}),
        u as (select vid, g.d, a[g.d] as val
              from v, generate_series(1, 64) g(d)),
        c0 as (select vid as cid, d, val as c from u where vid in ({ids}))"""
    ]
    for i in range(iters):
        parts.append(f"""
            ac{i} as (select u.vid, c{i}.cid,
                             sum(u.val * c{i}.c)::bigint as ac,
                             sum(c{i}.c * c{i}.c)::bigint as cc
                      from u join c{i} using (d) group by 1, 2),
            a{i + 1} as (select vid, cid as cluster from (
                           select vid, cid,
                                  row_number() over (partition by vid
                                    order by cc - 2 * ac, cid) as rn
                           from ac{i}) z where rn = 1)""")
        if i < iters - 1:
            parts.append(f"""
                m{i + 1} as (select a{i + 1}.cluster as cid, u.d,
                               cast(trunc(sum(u.val)::double / count(*))
                                    as bigint) as c
                             from u join a{i + 1} using (vid) group by 1, 2),
                c{i + 1} as (select prev.cid, prev.d,
                               coalesce(mm.c, prev.c) as c
                             from c{i} prev
                             left join m{i + 1} mm
                               on mm.cid = prev.cid and mm.d = prev.d)""")
    return ",".join(parts)


def _kmeans_oracle(iters: int = KMEANS_ITERS) -> str:
    return _kmeans_ctes(iters) + f" select vid as vec_id, cluster from a{iters}"


def _token_budget_oracle(budget: int = 5000) -> str:
    """Replay of curation.sample_to_token_budget: per-lang running token
    sum over the md5 order, keep rows whose preceding total < budget."""
    return f"""
    with t as (
      select doc_id, lang,
             case when trim(text) = '' then 0
                  else len(string_split_regex(trim(text), ' +')) end
               as n_tokens,
             ('0x' || substr(md5('budget:' || doc_id::varchar), 1, 15))
               ::bigint as rnd
      from documents),
    c as (select doc_id, lang, n_tokens,
                 sum(n_tokens) over (partition by lang order by rnd, doc_id
                                     rows unbounded preceding) as cum
          from t)
    select doc_id, lang, n_tokens::int as n_tokens, cum::bigint as cum_tokens
    from c where cum - n_tokens < {budget}
    """


def _cluster_sample_oracle(
    iters: int = KMEANS_ITERS, n_per_cluster: int = 25
) -> str:
    """Replay of curation.cluster_balanced_sample over kmeans_assign:
    per-cluster row_number on md5('cbs:' || id) with id tiebreak."""
    return f"""
    {_kmeans_ctes(iters)},
    rk as (
      select vid, cluster,
             row_number() over (
               partition by cluster
               order by ('0x' || substr(md5('cbs:' || vid::varchar), 1, 15))
                          ::bigint asc, vid asc) as rank
      from a{iters})
    select vid as vec_id, cluster, rank::int as rank
    from rk where rank <= {n_per_cluster}
    """


def _ann_ivf_trained_oracle(
    iters: int = KMEANS_ITERS, nprobe: int = IVF_NPROBE
) -> str:
    """Trained-IVF replay: Lloyd CTEs give the final assignment a{iters}
    (the coarse quantization) and its generating codebook c{iters-1};
    queries rank centroids by the same integer score (|c|^2 - 2<q,c>,
    cid tiebreak), probe the top ``nprobe`` clusters, and score members
    by float cosine rounded to 6dp — mirrors ann.ivf_topk_trained."""
    qids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    cb = f"c{iters - 1}"
    cos = _COSINE.format(a="eq.v", b="en.v")
    return f"""
    {_kmeans_ctes(iters)},
    qs as (select vid, d, val from u where vid in ({qids})),
    psc as (select qs.vid, {cb}.cid,
                   (sum({cb}.c * {cb}.c) - 2 * sum(qs.val * {cb}.c))::bigint
                     as score
            from qs join {cb} using (d) group by 1, 2),
    pr as (select vid as query_id, cid as cluster from (
             select vid, cid,
                    row_number() over (partition by vid
                                       order by score, cid) as rn
             from psc) z
           where rn <= {nprobe}),
    e as (select vec_id, embedding::DOUBLE[] as v from embeddings),
    cand as (select pr.query_id, a{iters}.vid as neighbor_id
             from pr join a{iters} on a{iters}.cluster = pr.cluster
             where a{iters}.vid <> pr.query_id),
    scored as (select query_id, neighbor_id, {cos} as cosine
               from cand
               join e eq on eq.vec_id = cand.query_id
               join e en on en.vec_id = cand.neighbor_id),
    final as (select *, row_number() over (partition by query_id
                                           order by cosine desc,
                                                    neighbor_id asc) as rank
              from scored)
    select query_id, neighbor_id, cast(rank as int) as rank, cosine
    from final where rank <= {ANN_K}
    """


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup restricted to k-means
    clusters of the embedding space — candidate generation is an
    equi-join on the cluster id, never all-pairs. Reuses the kmeans
    contract rounds for the clustering; keep-lowest-id verdict per
    vector (dropped iff a smaller-id vector in the SAME cluster sits
    within the cosine threshold)."""
    from credit_abs_oltp_to_mart_spark.operators.kmeans import kmeans_assign

    emb = _t(spark, sf_dir, "embeddings")
    assign = kmeans_assign(
        emb, init_ids=KMEANS_INIT_IDS, iterations=KMEANS_ITERS
    )
    return dedup.semantic_dedup(
        emb, assign, threshold=EMB_NEAR_DUP_THRESHOLD
    )


def _semantic_dedup_oracle(iters: int = KMEANS_ITERS) -> str:
    """Lloyd replay (shared CTEs) + within-cluster pair cosine + the
    keep-lowest-id drop set."""
    cos = _COSINE.format(a="ea.v", b="eb.v")
    return f"""
    {_kmeans_ctes(iters)},
    e as (select vec_id, embedding::DOUBLE[] as v from embeddings),
    pairs as (
      select x.vid as id_a, y.vid as id_b, {cos} as cosine
      from a{iters} x
      join a{iters} y on x.cluster = y.cluster and x.vid < y.vid
      join e ea on ea.vec_id = x.vid
      join e eb on eb.vec_id = y.vid),
    dropped as (select distinct id_b from pairs
                where cosine >= {EMB_NEAR_DUP_THRESHOLD})
    select a.vid as vec_id, a.cluster,
           cast(case when d.id_b is null then 1 else 0 end as int) as is_kept
    from a{iters} a left join dropped d on d.id_b = a.vid
    """


SEMDEDUP_SOFT_MARGIN = 0.01


def q_semantic_dedup_soft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with the cross-cluster recall repair: top-2-within-margin
    SOFT assignment puts each boundary vector in its runner-up cluster's
    candidate pool too, so a near-dup pair straddling a k-means boundary
    (which the hard assignment provably misses) is scored through the
    same cluster equi-join. Verdict rows stay one-per-vector on the
    primary assignment; the margin comparison is exact fixed-point
    integer arithmetic, replayed by the oracle."""
    from credit_abs_oltp_to_mart_spark.operators.kmeans import (
        kmeans_assign_soft,
    )

    emb = _t(spark, sf_dir, "embeddings")
    soft = kmeans_assign_soft(
        emb,
        init_ids=KMEANS_INIT_IDS,
        iterations=KMEANS_ITERS,
        margin=SEMDEDUP_SOFT_MARGIN,
    )
    primary = soft.where(F.col("is_primary") == 1).select("vec_id", "cluster")
    return dedup.semantic_dedup(
        emb,
        primary,
        threshold=EMB_NEAR_DUP_THRESHOLD,
        candidates=soft.select("vec_id", "cluster"),
    )


def _semantic_dedup_soft_oracle(iters: int = KMEANS_ITERS) -> str:
    """Lloyd replay + re-scoring every vector against the final codebook
    c{iters-1} (bit-identical to the assignment that produced a{iters}),
    top-2-within-margin soft pool, pair cosines over the pool, verdicts
    on the primary assignment. margin_fp = margin * fp_scale^2 — score
    deltas are squared-L2 deltas (|v|^2 cancels), exact integers."""
    cos = _COSINE.format(a="ea.v", b="eb.v")
    margin_fp = int(round(SEMDEDUP_SOFT_MARGIN * 10**12))
    cb = f"c{iters - 1}"
    return f"""
    {_kmeans_ctes(iters)},
    sc as (select u.vid, {cb}.cid,
                  (sum({cb}.c * {cb}.c) - 2 * sum(u.val * {cb}.c))::bigint
                    as score
           from u join {cb} using (d) group by 1, 2),
    rk as (select vid, cid, score,
                  row_number() over (partition by vid
                                     order by score, cid) as rn
           from sc),
    soft as (select vid, cid as cluster from rk where rn = 1
             union all
             select r2.vid, r2.cid as cluster
             from rk r2 join rk r1 on r1.vid = r2.vid and r1.rn = 1
             where r2.rn = 2 and r2.score - r1.score <= {margin_fp}),
    e as (select vec_id, embedding::DOUBLE[] as v from embeddings),
    pairs as (
      select x.vid as id_a, y.vid as id_b, {cos} as cosine
      from soft x
      join soft y on x.cluster = y.cluster and x.vid < y.vid
      join e ea on ea.vec_id = x.vid
      join e eb on eb.vec_id = y.vid),
    dropped as (select distinct id_b from pairs
                where cosine >= {EMB_NEAR_DUP_THRESHOLD})
    select a.vid as vec_id, a.cluster,
           cast(case when d.id_b is null then 1 else 0 end as int) as is_kept
    from a{iters} a left join dropped d on d.id_b = a.vid
    """


# Hierarchical SemDeDup: the 100 TB assignment posture. Flat Lloyd
# assignment is O(N * k * dim) per round — O(N^2) once k scales with the
# corpus (SemDeDup's own recipe). The hierarchical rule (FAISS
# IVF-assign / two-level clustering) trains ~sqrt(k) coarse cells, then
# sub-clusters WITHIN each cell, and assigns by probing nprobe nearest
# cells only — O(N * sqrt(k) * dim). Approximate-BY-RULE like ann.ivf_*:
# the oracle replays every step (coarse Lloyd, lowest-vid sub-seeding,
# within-cell sub-Lloyd, nprobe-union argmin) so results stay hash-exact.
SEMDEDUP_COARSE_IDS = [10, 30, 50, 70]
SEMDEDUP_SUB_K = 2
SEMDEDUP_COARSE_ITERS = 2
SEMDEDUP_SUB_ITERS = 2
SEMDEDUP_SOFT_NPROBE = 2


def q_semantic_dedup_hier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the HIERARCHICAL assignment (coarse cells ->
    within-cell sub-clusters, nprobe=1): candidate generation stays a
    cluster equi-join; assignment cost drops from O(N*k) to
    O(N*sqrt(k)) — the scale path for corpus-scaled cluster counts."""
    from credit_abs_oltp_to_mart_spark.operators.kmeans import (
        kmeans_assign_hier,
    )

    emb = _t(spark, sf_dir, "embeddings")
    assign = kmeans_assign_hier(
        emb,
        coarse_init_ids=SEMDEDUP_COARSE_IDS,
        sub_k=SEMDEDUP_SUB_K,
        coarse_iterations=SEMDEDUP_COARSE_ITERS,
        sub_iterations=SEMDEDUP_SUB_ITERS,
        nprobe=1,
    )
    return dedup.semantic_dedup(emb, assign, threshold=EMB_NEAR_DUP_THRESHOLD)


def q_semantic_dedup_hier_soft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical SemDeDup with the cross-cell recall repair: nprobe=2
    union pool + top-2-within-margin soft rows, so near-dup pairs that
    straddle a coarse-cell OR sub-cluster boundary still meet in a
    candidate pool. Verdicts stay one-per-vector on the primary."""
    from credit_abs_oltp_to_mart_spark.operators.kmeans import (
        kmeans_assign_hier_soft,
    )

    emb = _t(spark, sf_dir, "embeddings")
    soft = kmeans_assign_hier_soft(
        emb,
        coarse_init_ids=SEMDEDUP_COARSE_IDS,
        sub_k=SEMDEDUP_SUB_K,
        margin=SEMDEDUP_SOFT_MARGIN,
        coarse_iterations=SEMDEDUP_COARSE_ITERS,
        sub_iterations=SEMDEDUP_SUB_ITERS,
        nprobe=SEMDEDUP_SOFT_NPROBE,
    )
    primary = soft.where(F.col("is_primary") == 1).select("vec_id", "cluster")
    return dedup.semantic_dedup(
        emb,
        primary,
        threshold=EMB_NEAR_DUP_THRESHOLD,
        candidates=soft.select("vec_id", "cluster"),
    )


def _hier_ctes(nprobe: int) -> str:
    """Full SQL replay of the hierarchical assignment rule
    (kmeans.hier_train + the nprobe serve pass): coarse Lloyd
    (SEMDEDUP_COARSE_ITERS rounds), lowest-vid-per-cell sub-seeding,
    within-cell sub-Lloyd (SEMDEDUP_SUB_ITERS - 1 update rounds), then
    rank coarse cells per vector, keep nprobe, argmin over the probed
    cells' sub-centroids. Ends with frk (vid, scid, score, rn) and fa
    (vid, cluster)."""
    ids = ", ".join(str(i) for i in SEMDEDUP_COARSE_IDS)
    ci, si, sub_k = (
        SEMDEDUP_COARSE_ITERS,
        SEMDEDUP_SUB_ITERS,
        SEMDEDUP_SUB_K,
    )
    parts = [
        f"""
    with v as (select vec_id as vid,
                 list_transform(embedding, x -> cast(case when x >= 0
                   then floor(x::double * 1000000 + 0.5)
                   else -floor(-x::double * 1000000 + 0.5) end
                   as bigint)) as a
               from embeddings),
    u as (select vid, g.d, a[g.d] as val
          from v, generate_series(1, 64) g(d)),
    hc0 as (select vid as cid, d, val as c from u where vid in ({ids}))"""
    ]
    for i in range(ci):
        parts.append(f"""
        hac{i} as (select u.vid, hc{i}.cid,
                          sum(u.val * hc{i}.c)::bigint as ac,
                          sum(hc{i}.c * hc{i}.c)::bigint as cc
                   from u join hc{i} using (d) group by 1, 2),
        ha{i + 1} as (select vid, cid as cluster from (
                        select vid, cid,
                               row_number() over (partition by vid
                                 order by cc - 2 * ac, cid) as rn
                        from hac{i}) z where rn = 1)""")
        if i < ci - 1:
            parts.append(f"""
            hm{i + 1} as (select ha{i + 1}.cluster as cid, u.d,
                            cast(trunc(sum(u.val)::double / count(*))
                                 as bigint) as c
                          from u join ha{i + 1} using (vid) group by 1, 2),
            hc{i + 1} as (select prev.cid, prev.d,
                            coalesce(mm.c, prev.c) as c
                          from hc{i} prev
                          left join hm{i + 1} mm
                            on mm.cid = prev.cid and mm.d = prev.d)""")
    parts.append(f"""
    ss as (select vid as scid, ccl from (
             select a.vid, a.cluster as ccl,
                    row_number() over (partition by a.cluster
                                       order by a.vid) as rn
             from ha{ci} a) z where rn <= {sub_k}),
    s0 as (select ss.scid, ss.ccl, u.d, u.val as c
           from ss join u on u.vid = ss.scid)""")
    for j in range(si - 1):
        parts.append(f"""
        sac{j} as (select w.vid, s.scid,
                          sum(w.val * s.c)::bigint as ac,
                          sum(s.c * s.c)::bigint as cc
                   from u w
                   join ha{ci} aw on aw.vid = w.vid
                   join s{j} s on s.ccl = aw.cluster and s.d = w.d
                   group by 1, 2),
        sa{j + 1} as (select vid, scid from (
                        select vid, scid,
                               row_number() over (partition by vid
                                 order by cc - 2 * ac, scid) as rn
                        from sac{j}) z where rn = 1),
        sm{j + 1} as (select sa.scid, u.d,
                        cast(trunc(sum(u.val)::double / count(*)) as bigint)
                          as c
                      from u join sa{j + 1} sa using (vid) group by 1, 2),
        s{j + 1} as (select prev.scid, prev.ccl, prev.d,
                       coalesce(mm.c, prev.c) as c
                     from s{j} prev
                     left join sm{j + 1} mm
                       on mm.scid = prev.scid and mm.d = prev.d)""")
    parts.append(f"""
    fcs as (select u.vid, h.cid as ccl,
                   (sum(h.c * h.c) - 2 * sum(u.val * h.c))::bigint as cs
            from u join hc{ci - 1} h using (d) group by 1, 2),
    fpr as (select vid, ccl from (
              select vid, ccl, row_number() over (partition by vid
                order by cs, ccl) as rn from fcs) z where rn <= {nprobe}),
    fsc as (select u.vid, s.scid,
                   (sum(s.c * s.c) - 2 * sum(u.val * s.c))::bigint as score
            from u
            join fpr p on p.vid = u.vid
            join s{si - 1} s on s.ccl = p.ccl and s.d = u.d
            group by 1, 2),
    frk as (select vid, scid, score,
                   row_number() over (partition by vid
                     order by score, scid) as rn
            from fsc),
    fa as (select vid, scid as cluster from frk where rn = 1)""")
    return ",".join(parts)


def _semantic_dedup_hier_oracle() -> str:
    cos = _COSINE.format(a="ea.v", b="eb.v")
    return f"""
    {_hier_ctes(1)},
    e as (select vec_id, embedding::DOUBLE[] as v from embeddings),
    pairs as (
      select x.vid as id_a, y.vid as id_b, {cos} as cosine
      from fa x
      join fa y on x.cluster = y.cluster and x.vid < y.vid
      join e ea on ea.vec_id = x.vid
      join e eb on eb.vec_id = y.vid),
    dropped as (select distinct id_b from pairs
                where cosine >= {EMB_NEAR_DUP_THRESHOLD})
    select a.vid as vec_id, a.cluster,
           cast(case when d.id_b is null then 1 else 0 end as int) as is_kept
    from fa a left join dropped d on d.id_b = a.vid
    """


def _semantic_dedup_hier_soft_oracle() -> str:
    cos = _COSINE.format(a="ea.v", b="eb.v")
    margin_fp = int(round(SEMDEDUP_SOFT_MARGIN * 10**12))
    return f"""
    {_hier_ctes(SEMDEDUP_SOFT_NPROBE)},
    soft as (select vid, scid as cluster from frk where rn = 1
             union all
             select r2.vid, r2.scid
             from frk r2 join frk r1 on r1.vid = r2.vid and r1.rn = 1
             where r2.rn = 2 and r2.score - r1.score <= {margin_fp}),
    e as (select vec_id, embedding::DOUBLE[] as v from embeddings),
    pairs as (
      select x.vid as id_a, y.vid as id_b, {cos} as cosine
      from soft x
      join soft y on x.cluster = y.cluster and x.vid < y.vid
      join e ea on ea.vec_id = x.vid
      join e eb on eb.vec_id = y.vid),
    dropped as (select distinct id_b from pairs
                where cosine >= {EMB_NEAR_DUP_THRESHOLD})
    select a.vid as vec_id, a.cluster,
           cast(case when d.id_b is null then 1 else 0 end as int) as is_kept
    from fa a left join dropped d on d.id_b = a.vid
    """


PQ_M = 4
PQ_ITERS = 2
PQ_INIT_IDS = [5, 15, 25, 35, 45, 55, 65, 75]


def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted IVF-PQ index (FAISS IndexIVFPQ layout, no residuals):
    ``build_pq_index`` trains the coarse codebook plus m per-subspace
    product-quantization codebooks (all exact fixed-point Lloyd) and
    writes cluster-partitioned postings holding ONLY the m dense code
    ids per vector — the 16-64x compression tier a 100 TB vector store
    serves from. ``pq_index_probe`` then answers queries by
    asymmetric-distance scoring: per-query integer lookup tables, m
    array lookups per candidate, never touching the float corpus."""
    import tempfile

    emb = _t(spark, sf_dir, "embeddings")
    idx = tempfile.mkdtemp(prefix="spark_ann_pq_")
    ann.build_pq_index(
        emb,
        idx,
        coarse_init_ids=KMEANS_INIT_IDS,
        pq_init_ids=PQ_INIT_IDS,
        m=PQ_M,
        coarse_iterations=KMEANS_ITERS,
        pq_iterations=PQ_ITERS,
    )
    queries = emb.where(F.col("vec_id").isin(ANN_QUERY_IDS)).select(
        "vec_id", "embedding"
    )
    return ann.pq_index_probe(queries, idx, k=ANN_K, nprobe=IVF_NPROBE)


def _pq_sub_ctes(
    sub: int, iters: int = PQ_ITERS, dim: int = 64, src: str = "v",
    init_ids: list[int] | None = None,
) -> str:
    """Per-subspace Lloyd-replay CTEs (prefix s{sub}): with ``src="v"``
    subspace dims come from the shared fixed-point vector CTE ``v``
    (a[off+1 .. off+dsub]); with ``src="res"`` they come from the
    residual row CTE ``res`` (vid, d, val) — the by_residual index.
    Init centroids come from PQ_INIT_IDS slices, rounds mirror the
    coarse chain exactly. Ends with s{sub}a{iters} (the per-vector
    code = cluster label) and s{sub}c{iters-1} (the codebook that
    produced it)."""
    dsub = dim // PQ_M
    off = sub * dsub
    ids = ", ".join(str(i) for i in (init_ids or PQ_INIT_IDS))
    if src == "v":
        u_cte = f"""
        s{sub}u as (select vid, g.d, a[{off} + g.d] as val
                    from v, generate_series(1, {dsub}) g(d))"""
    else:
        u_cte = f"""
        s{sub}u as (select vid, d - {off} as d, val from res
                    where d > {off} and d <= {off + dsub})"""
    parts = [
        u_cte
        + f""",
        s{sub}c0 as (select vid as cid, d, val as c
                     from s{sub}u where vid in ({ids}))"""
    ]
    for i in range(iters):
        parts.append(f"""
            s{sub}ac{i} as (select q.vid, c.cid,
                                   sum(q.val * c.c)::bigint as ac,
                                   sum(c.c * c.c)::bigint as cc
                            from s{sub}u q join s{sub}c{i} c using (d)
                            group by 1, 2),
            s{sub}a{i + 1} as (select vid, cid as cluster from (
                                 select vid, cid,
                                        row_number() over (partition by vid
                                          order by cc - 2 * ac, cid) as rn
                                 from s{sub}ac{i}) z where rn = 1)""")
        if i < iters - 1:
            parts.append(f"""
                s{sub}m{i + 1} as (select a.cluster as cid, q.d,
                                     cast(trunc(sum(q.val)::double / count(*))
                                          as bigint) as c
                                   from s{sub}u q join s{sub}a{i + 1} a
                                     using (vid) group by 1, 2),
                s{sub}c{i + 1} as (select prev.cid, prev.d,
                                     coalesce(mm.c, prev.c) as c
                                   from s{sub}c{i} prev
                                   left join s{sub}m{i + 1} mm
                                     on mm.cid = prev.cid and mm.d = prev.d)""")
    return ",".join(parts)


def _ann_pq_oracle(
    iters: int = KMEANS_ITERS, piters: int = PQ_ITERS, nprobe: int = IVF_NPROBE
) -> str:
    """IVF-PQ replay: coarse Lloyd CTEs give the inverted file a{iters}
    and probe codebook c{iters-1}; per-subspace Lloyd CTEs give each
    vector's code (= its subspace cluster) and the codebook behind it.
    ADC = sum over subspaces of the query-slice x codeword fixed-point
    dot — exact bigints end to end, mirroring ann.pq_index_probe."""
    qids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    cb = f"c{iters - 1}"
    subs = ",".join(_pq_sub_ctes(s, piters) for s in range(PQ_M))
    luts = ",".join(
        f"""
        s{s}lut as (select q.vid as query_id, c.cid,
                           sum(q.val * c.c)::bigint as dp
                    from s{s}u q join s{s}c{piters - 1} c using (d)
                    where q.vid in ({qids}) group by 1, 2)"""
        for s in range(PQ_M)
    )
    contribs = " union all ".join(
        f"""select l.query_id, a.vid as neighbor_id, l.dp
            from s{s}a{piters} a join s{s}lut l on l.cid = a.cluster"""
        for s in range(PQ_M)
    )
    return f"""
    {_kmeans_ctes(iters)},
    {subs},
    {luts},
    adc as (select query_id, neighbor_id, sum(dp)::bigint as adc_score
            from ({contribs}) group by 1, 2),
    psc as (select u.vid, {cb}.cid,
                   (sum({cb}.c * {cb}.c) - 2 * sum(u.val * {cb}.c))::bigint
                     as score
            from u join {cb} using (d)
            where u.vid in ({qids}) group by 1, 2),
    pr as (select vid as query_id, cid as cluster from (
             select vid, cid,
                    row_number() over (partition by vid
                                       order by score, cid) as rn
             from psc) z
           where rn <= {nprobe}),
    cand as (select pr.query_id, a{iters}.vid as neighbor_id
             from pr join a{iters} on a{iters}.cluster = pr.cluster
             where a{iters}.vid <> pr.query_id),
    final as (select c.query_id, c.neighbor_id, adc.adc_score,
                     row_number() over (partition by c.query_id
                                        order by adc.adc_score desc,
                                                 c.neighbor_id asc) as rank
              from cand c join adc
                on adc.query_id = c.query_id
               and adc.neighbor_id = c.neighbor_id)
    select query_id, neighbor_id, cast(rank as int) as rank, adc_score
    from final where rank <= {ANN_K}
    """


def q_ann_pq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with RESIDUAL encoding — FAISS's IndexIVFPQ default: the
    per-subspace codebooks quantize v - coarse_centroid(v), whose spread
    is the within-cell radius instead of the whole space (materially
    finer cells at the same m x k code budget), and the probe scores
    <q, cent_cluster> + <q, residual_reconstruction> — both exact
    fixed-point dots, so the whole chain stays bit-replayable."""
    import tempfile

    emb = _t(spark, sf_dir, "embeddings")
    idx = tempfile.mkdtemp(prefix="spark_ann_pqr_")
    ann.build_pq_index(
        emb,
        idx,
        coarse_init_ids=KMEANS_INIT_IDS,
        pq_init_ids=PQ_INIT_IDS,
        m=PQ_M,
        coarse_iterations=KMEANS_ITERS,
        pq_iterations=PQ_ITERS,
        by_residual=True,
    )
    queries = emb.where(F.col("vec_id").isin(ANN_QUERY_IDS)).select(
        "vec_id", "embedding"
    )
    return ann.pq_index_probe(queries, idx, k=ANN_K, nprobe=IVF_NPROBE)


def _ann_pq_residual_oracle(
    iters: int = KMEANS_ITERS, piters: int = PQ_ITERS, nprobe: int = IVF_NPROBE
) -> str:
    """Residual-IVF-PQ replay: on top of the coarse Lloyd CTEs, ``res``
    holds each vector's exact residual rows (u.val - assigned centroid
    component); the per-subspace Lloyd chains train on ``res`` slices;
    lookup tables dot the RAW query slices against residual codewords;
    the final score adds the per-(query, probed-cluster) base term
    <q, cent> — mirroring ann.pq_index_probe's by_residual identity."""
    qids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    cb = f"c{iters - 1}"
    dsub = 64 // PQ_M
    subs = ",".join(_pq_sub_ctes(s, piters, src="res") for s in range(PQ_M))
    luts = ",".join(
        f"""
        s{s}lut as (select q.vid as query_id, c.cid,
                           sum(q.val * c.c)::bigint as dp
                    from (select vid, d - {s * dsub} as d, val from u
                          where d > {s * dsub} and d <= {(s + 1) * dsub}
                            and vid in ({qids})) q
                    join s{s}c{piters - 1} c using (d) group by 1, 2)"""
        for s in range(PQ_M)
    )
    contribs = " union all ".join(
        f"""select l.query_id, a.vid as neighbor_id, l.dp
            from s{s}a{piters} a join s{s}lut l on l.cid = a.cluster"""
        for s in range(PQ_M)
    )
    return f"""
    {_kmeans_ctes(iters)},
    res as (select u.vid, u.d, u.val - cb.c as val
            from u
            join a{iters} on a{iters}.vid = u.vid
            join {cb} cb on cb.cid = a{iters}.cluster and cb.d = u.d),
    {subs},
    {luts},
    adc as (select query_id, neighbor_id, sum(dp)::bigint as adc_score
            from ({contribs}) group by 1, 2),
    qc as (select u.vid as query_id, {cb}.cid as cluster,
                  sum(u.val * {cb}.c)::bigint as qdotc
           from u join {cb} using (d)
           where u.vid in ({qids}) group by 1, 2),
    psc as (select u.vid, {cb}.cid,
                   (sum({cb}.c * {cb}.c) - 2 * sum(u.val * {cb}.c))::bigint
                     as score
            from u join {cb} using (d)
            where u.vid in ({qids}) group by 1, 2),
    pr as (select vid as query_id, cid as cluster from (
             select vid, cid,
                    row_number() over (partition by vid
                                       order by score, cid) as rn
             from psc) z
           where rn <= {nprobe}),
    cand as (select pr.query_id, pr.cluster, a{iters}.vid as neighbor_id
             from pr join a{iters} on a{iters}.cluster = pr.cluster
             where a{iters}.vid <> pr.query_id),
    final as (select c.query_id, c.neighbor_id,
                     (qc.qdotc + adc.adc_score)::bigint as adc_score,
                     row_number() over (partition by c.query_id
                                        order by qc.qdotc + adc.adc_score
                                                   desc,
                                                 c.neighbor_id asc) as rank
              from cand c
              join adc on adc.query_id = c.query_id
                      and adc.neighbor_id = c.neighbor_id
              join qc on qc.query_id = c.query_id
                     and qc.cluster = c.cluster)
    select query_id, neighbor_id, cast(rank as int) as rank, adc_score
    from final where rank <= {ANN_K}
    """


ANN_REFINE_K = 10


def q_ann_pq_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with the ADC-shortlist + exact re-rank stage — FAISS's
    IndexRefine serving shape (VERDICT r07 #5): the index persists a
    scalar-quantized refine tier next to the PQ postings; the probe
    ADC-ranks a shortlist of refine_k candidates from the integer LUTs,
    joins ONLY the shortlist to the refine tier (broadcast keys into the
    cluster-partitioned store — bounded by n_queries*refine_k, plan-gated
    no corpus scan), and re-scores <raw query, SQ reconstruction> exactly
    (IEEE double in array order, 6dp, id tiebreak). Recovers most of the
    recall the 16-64x PQ compression costs at a bounded extra read."""
    import tempfile

    emb = _t(spark, sf_dir, "embeddings")
    idx = tempfile.mkdtemp(prefix="spark_ann_pqref_")
    ann.build_pq_index(
        emb,
        idx,
        coarse_init_ids=KMEANS_INIT_IDS,
        pq_init_ids=PQ_INIT_IDS,
        m=PQ_M,
        coarse_iterations=KMEANS_ITERS,
        pq_iterations=PQ_ITERS,
        with_refine=True,
    )
    queries = emb.where(F.col("vec_id").isin(ANN_QUERY_IDS)).select(
        "vec_id", "embedding"
    )
    return ann.pq_index_probe(
        queries, idx, k=ANN_K, nprobe=IVF_NPROBE, refine_k=ANN_REFINE_K
    )


def _ann_pq_refine_oracle(
    iters: int = KMEANS_ITERS, piters: int = PQ_ITERS, nprobe: int = IVF_NPROBE
) -> str:
    """The ann_pq ADC replay, extended two stages: shortlist = ADC rank
    <= refine_k, then the refined score re-ranks the shortlist by
    <raw query, scalar-quantized reconstruction> — the same quantize
    replay the ann_index_serve oracle uses, against the RAW query floats
    (asymmetric-exact, mirroring ann.pq_index_probe's refine path)."""
    qids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    cb = f"c{iters - 1}"
    subs = ",".join(_pq_sub_ctes(s, piters) for s in range(PQ_M))
    luts = ",".join(
        f"""
        s{s}lut as (select q.vid as query_id, c.cid,
                           sum(q.val * c.c)::bigint as dp
                    from s{s}u q join s{s}c{piters - 1} c using (d)
                    where q.vid in ({qids}) group by 1, 2)"""
        for s in range(PQ_M)
    )
    contribs = " union all ".join(
        f"""select l.query_id, a.vid as neighbor_id, l.dp
            from s{s}a{piters} a join s{s}lut l on l.cid = a.cluster"""
        for s in range(PQ_M)
    )
    return f"""
    {_kmeans_ctes(iters)},
    {subs},
    {luts},
    adc as (select query_id, neighbor_id, sum(dp)::bigint as adc_score
            from ({contribs}) group by 1, 2),
    psc as (select u.vid, {cb}.cid,
                   (sum({cb}.c * {cb}.c) - 2 * sum(u.val * {cb}.c))::bigint
                     as score
            from u join {cb} using (d)
            where u.vid in ({qids}) group by 1, 2),
    pr as (select vid as query_id, cid as cluster from (
             select vid, cid,
                    row_number() over (partition by vid
                                       order by score, cid) as rn
             from psc) z
           where rn <= {nprobe}),
    cand as (select pr.query_id, a{iters}.vid as neighbor_id
             from pr join a{iters} on a{iters}.cluster = pr.cluster
             where a{iters}.vid <> pr.query_id),
    shortlist as (select c.query_id, c.neighbor_id,
                         row_number() over (partition by c.query_id
                                            order by adc.adc_score desc,
                                                     c.neighbor_id asc)
                           as adc_rank
                  from cand c join adc
                    on adc.query_id = c.query_id
                   and adc.neighbor_id = c.neighbor_id),
    sq as (select vec_id,
                  cast(list_min(embedding) as double) as mn,
                  case when list_max(embedding) <> list_min(embedding)
                       then cast(list_max(embedding) as double)
                            - cast(list_min(embedding) as double)
                       else 1.0 end as span,
                  embedding
           from embeddings),
    rv as (select vec_id,
                  list_transform(embedding,
                    x -> mn + cast(floor((cast(x as double) - mn) / span
                                         * 255.0 + 0.5) as double)
                              * span / 255.0) as recon
           from sq),
    eq as (select vec_id, embedding::DOUBLE[] as qv from embeddings
           where vec_id in ({qids})),
    refined as (select s.query_id, s.neighbor_id,
                       round(list_dot_product(eq.qv, rv.recon), 6) as score
                from shortlist s
                join rv on rv.vec_id = s.neighbor_id
                join eq on eq.vec_id = s.query_id
                where s.adc_rank <= {ANN_REFINE_K}),
    final as (select *, row_number() over (partition by query_id
                                           order by score desc,
                                                    neighbor_id asc) as rank
              from refined)
    select query_id, neighbor_id, cast(rank as int) as rank, score
    from final where rank <= {ANN_K}
    """


def q_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer training (SentencePiece-style, Kudo 2018) —
    the BPE alternative: seed candidate pieces from word substrings,
    then EM rounds where the E-step Viterbi-segments every word under
    the current fixed-point piece weights (one map-only fold over the
    word table) and the M-step re-estimates weights from the counts
    (O(V) driver collect, the codebook pattern). The Viterbi objective
    is the exact piecewise-linear -log p surrogate (cost = S - weight,
    integer), so every round — and therefore the final vocabulary — is
    bit-replayable; the oracle replays both EM rounds with a recursive-
    CTE dynamic program."""
    from credit_abs_oltp_to_mart_spark.operators import unigram

    vocab, _ = unigram.unigram_train(_t(spark, sf_dir, "documents"))
    return vocab


def q_unigram_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained unigram tokenizer's scoring pass: per-doc word/piece
    counts and summed fixed-point Viterbi cost (the surrogate corpus
    negative log-likelihood) under the vocabulary q_unigram_train
    produces — distinct words segment once, the corpus stream joins the
    broadcast word-level results, every doc emits a row."""
    from credit_abs_oltp_to_mart_spark.operators import unigram

    docs = _t(spark, sf_dir, "documents")
    _, weights = unigram.unigram_train(docs)
    return unigram.unigram_segment_stats(docs, weights)


def _unigram_ctes(
    rounds: int | None = None,
    max_piece_len: int | None = None,
    vocab_size: int | None = None,
    with_final_dp: bool = False,
    train_where: str = "",
    score_from_all: bool = False,
) -> str:
    """EM-round replay CTEs for the unigram trainer: seed substring
    counts -> top-V cut (+ permanent single chars) -> per round a
    recursive-CTE Viterbi DP (sliding window of best-suffix structs,
    (cost asc, piece-length desc) tiebreak, OOV sentinel) + count
    aggregation + exact fixed-point re-weighting; ends at w{rounds}.
    ``with_final_dp`` appends one more DP under the FINAL weights
    (vc{R}/dp{R}) for scoring-pass oracles. ``train_where`` restricts
    the TRAINING corpus (an extra predicate and-ed onto the
    non-empty-text filter — the perplexity-filter replay trains on the
    reference split only); ``score_from_all`` makes the final DP
    segment the WHOLE corpus's words (swrds) instead of the training
    words, so out-of-reference words score through the OOV sentinel.
    Defaults reproduce the historical chain byte-for-byte. All integer
    arithmetic; DuckDB's struct-list sort order matches Spark's
    array_min struct comparison."""
    from credit_abs_oltp_to_mart_spark.operators.unigram import (
        MAX_PIECE_LEN,
        OOV_COST,
        UNIGRAM_ROUNDS,
        UNIGRAM_SCALE,
        UNIGRAM_VOCAB,
    )

    R = UNIGRAM_ROUNDS if rounds is None else rounds
    L = MAX_PIECE_LEN if max_piece_len is None else max_piece_len
    V = UNIGRAM_VOCAB if vocab_size is None else vocab_size
    S = UNIGRAM_SCALE
    extra = f" and ({train_where})" if train_where else ""
    parts = [
        f"""
    with recursive wrds as materialized (
      select word, count(*)::bigint as cnt
      from (select unnest(string_split_regex(trim(text), ' +')) as word
            from documents where trim(text) <> ''{extra})
      group by 1),
    seed as materialized (
      select piece, sum(cnt)::bigint as cnt
      from (select cnt, substr(word, i.i::int, l.l::int) as piece
            from wrds,
                 unnest(generate_series(1, length(word))) i(i),
                 unnest(generate_series(1,
                   least({L}, length(word) - i.i + 1))) l(l))
      group by 1),
    v0 as materialized (
      select piece, cnt from (
        select piece, cnt,
               row_number() over (order by cnt desc, piece) as rn
        from seed) z
      where rn <= {V} or length(piece) = 1),
    w0 as materialized (
      select piece, cnt, (2 * {S} * cnt + t.tot) // (2 * t.tot) as wgt
      from v0, (select sum(cnt) as tot from v0) t)"""
    ]
    for r in range(R):
        parts.append(f"""
    vc{r} as materialized (
      select map(list(piece order by piece),
                 list(({S} - wgt)::bigint order by piece)) as vm
      from w{r}),
    dp{r} as (
      select word, cnt, length(word) as len, length(word) + 1 as j,
             [struct_pack(cost := 0::bigint, negl := 0::bigint,
                          segs := []::varchar[])] as win,
             vm
      from wrds, vc{r}
      union all
      select word, cnt, len, j - 1,
             list_prepend(
               list_sort(list_transform(
                 generate_series(1, least({L}, len - (j - 1) + 1)),
                 l -> struct_pack(
                   cost := coalesce(
                       map_extract(vm, substr(word, (j - 1)::int,
                                              l::int))[1],
                       {OOV_COST}::bigint) + win[l].cost,
                   negl := ({L} - l)::bigint,
                   segs := list_prepend(
                       substr(word, (j - 1)::int, l::int),
                       win[l].segs))))[1],
               win[1:{L - 1}]),
             vm
      from dp{r} where j > 1),
    c{r} as materialized (
      select piece, sum(cnt)::bigint as cnt
      from (select cnt, unnest(win[1].segs) as piece
            from dp{r} where j = 1)
      group by 1),
    v{r + 1} as materialized (
      select w.piece, coalesce(c.cnt, 0)::bigint as cnt
      from w{r} w left join c{r} c using (piece)
      where length(w.piece) = 1 or coalesce(c.cnt, 0) > 0),
    w{r + 1} as materialized (
      select piece, cnt, (2 * {S} * cnt + t.tot) // (2 * t.tot) as wgt
      from v{r + 1}, (select sum(cnt) as tot from v{r + 1}) t)""")
    if with_final_dp:
        src = "wrds"
        if score_from_all:
            src = "swrds"
            parts.append("""
    swrds as materialized (
      select word, count(*)::bigint as cnt
      from (select unnest(string_split_regex(trim(text), ' +')) as word
            from documents where trim(text) <> '')
      group by 1)""")
        parts.append(f"""
    vc{R} as materialized (
      select map(list(piece order by piece),
                 list(({S} - wgt)::bigint order by piece)) as vm
      from w{R}),
    dp{R} as (
      select word, cnt, length(word) as len, length(word) + 1 as j,
             [struct_pack(cost := 0::bigint, negl := 0::bigint,
                          segs := []::varchar[])] as win,
             vm
      from {src}, vc{R}
      union all
      select word, cnt, len, j - 1,
             list_prepend(
               list_sort(list_transform(
                 generate_series(1, least({L}, len - (j - 1) + 1)),
                 l -> struct_pack(
                   cost := coalesce(
                       map_extract(vm, substr(word, (j - 1)::int,
                                              l::int))[1],
                       {OOV_COST}::bigint) + win[l].cost,
                   negl := ({L} - l)::bigint,
                   segs := list_prepend(
                       substr(word, (j - 1)::int, l::int),
                       win[l].segs))))[1],
               win[1:{L - 1}]),
             vm
      from dp{R} where j > 1)""")
    return ",".join(parts)


def _unigram_oracle(
    rounds: int | None = None,
    max_piece_len: int | None = None,
    vocab_size: int | None = None,
) -> str:
    from credit_abs_oltp_to_mart_spark.operators.unigram import UNIGRAM_ROUNDS

    R = UNIGRAM_ROUNDS if rounds is None else rounds
    return _unigram_ctes(rounds, max_piece_len, vocab_size) + f"""
    select row_number() over (order by wgt desc, piece asc)::int as rank,
           piece, cnt, wgt::bigint as weight
    from w{R}"""


def _unigram_segment_oracle() -> str:
    """Replays training (shared CTEs), one MORE Viterbi DP under the
    FINAL weights (vc{R}/dp{R}), then the per-doc word join + sums —
    every doc emits a row, empty docs at zero."""
    from credit_abs_oltp_to_mart_spark.operators.unigram import UNIGRAM_ROUNDS

    R = UNIGRAM_ROUNDS
    return _unigram_ctes(with_final_dp=True) + f""",
    docwords as (
      select d.doc_id, t.word
      from (select doc_id, string_split_regex(trim(text), ' +') as tk
            from documents where trim(text) <> '') d,
           unnest(d.tk) as t(word)),
    wseg as (
      select word, len(win[1].segs)::int as n_pieces, win[1].cost as cost
      from dp{R} where j = 1),
    perdoc as (
      select doc_id, count(*)::int as n_words,
             sum(n_pieces)::int as n_pieces,
             sum(cost)::bigint as total_cost
      from docwords join wseg using (word) group by 1)
    select d.doc_id,
           coalesce(p.n_words, 0)::int as n_words,
           coalesce(p.n_pieces, 0)::int as n_pieces,
           coalesce(p.total_cost, 0)::bigint as total_cost
    from documents d left join perdoc p using (doc_id)"""


# perplexity-filter threshold: fixed-point mean cost per word (units of
# UNIGRAM_SCALE) — sits inside the corpus's cost distribution so the
# verdict is a genuine split, not all-keep/all-drop (checked in tests)
PPL_MAX_COST_PER_WORD = 2_800_000


def q_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM quality filtering (CCNet / Wenzek et al. 2020, on the exact
    unigram LM instead of KenLM): the tokenizer-LM trains on the
    HELD-OUT reference split, every document scores its surrogate
    negative log-likelihood under it (distinct words Viterbi-segment
    once against the one-row broadcast model; out-of-reference words
    pay the OOV sentinel), and the verdict keeps docs whose mean
    per-word cost stays under the threshold — as an integer comparison
    total_cost <= T * n_words, no division."""
    from credit_abs_oltp_to_mart_spark.operators.curation import split_expr
    from credit_abs_oltp_to_mart_spark.operators.unigram import (
        perplexity_filter,
    )

    docs = _t(spark, sf_dir, "documents").withColumn("split", split_expr())
    ref = docs.where(F.col("split") != "train").drop("split")
    return perplexity_filter(
        docs.drop("split"),
        ref,
        max_cost_per_word=PPL_MAX_COST_PER_WORD,
    )


def _perplexity_filter_oracle() -> str:
    """Replays training restricted to the held-out split (train_where on
    the shared EM CTEs), one final Viterbi DP over the WHOLE corpus's
    words (swrds — OOV pieces via the sentinel), then the per-doc sums
    and the integer threshold verdict."""
    from credit_abs_oltp_to_mart_spark.operators.unigram import UNIGRAM_ROUNDS

    R = UNIGRAM_ROUNDS
    ref_where = f"{_split_bucket_sql('split:')} >= {curation.TRAIN_PCT}"
    return _unigram_ctes(
        with_final_dp=True, train_where=ref_where, score_from_all=True
    ) + f""",
    docwords as (
      select d.doc_id, t.word
      from (select doc_id, string_split_regex(trim(text), ' +') as tk
            from documents where trim(text) <> '') d,
           unnest(d.tk) as t(word)),
    wseg as (
      select word, len(win[1].segs)::int as n_pieces, win[1].cost as cost
      from dp{R} where j = 1),
    perdoc as (
      select doc_id, count(*)::int as n_words,
             sum(n_pieces)::int as n_pieces,
             sum(cost)::bigint as total_cost
      from docwords join wseg using (word) group by 1)
    select d.doc_id,
           coalesce(p.n_words, 0)::int as n_words,
           coalesce(p.n_pieces, 0)::int as n_pieces,
           coalesce(p.total_cost, 0)::bigint as total_cost,
           (coalesce(p.total_cost, 0)
              <= {PPL_MAX_COST_PER_WORD} * coalesce(p.n_words, 0))::int
             as is_kept
    from documents d left join perdoc p using (doc_id)"""


BPE_MERGES = 8


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary induction (Sennrich subword units) as the standard
    distributed shape: ONE corpus scan builds the word-frequency table,
    then each merge round is a pair-count aggregation + 1-row argmax +
    map-only merge fold over the word table alone — the
    tokenizer-training step of a pretraining pipeline. Deterministic:
    exact integer counts, (count desc, left, right) argmax total order,
    leftmost-greedy merge application."""
    from credit_abs_oltp_to_mart_spark.operators import bpe

    merges, _ = bpe.bpe_train(
        _t(spark, sf_dir, "documents"), n_merges=BPE_MERGES
    )
    return bpe.merges_frame(spark, merges)


def q_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword segmentation statistics under the trained BPE vocabulary:
    per doc, word count and post-merge subword count — the learned-
    tokenizer twin of ``token_counts`` (whose regex mode approximates
    BPE; this IS BPE). The trained word table broadcasts; the corpus
    token stream never shuffles on the word key."""
    from credit_abs_oltp_to_mart_spark.operators import bpe

    docs = _t(spark, sf_dir, "documents")
    _, wf = bpe.bpe_train(docs, n_merges=BPE_MERGES)
    return bpe.bpe_segment_stats(docs, wf)


def q_bpe_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw-text → trained-tokenizer → packed-shards chain end to end:
    train BPE, tokenize every doc into its contiguous subword id
    sequence (dense lexicographic ids over the learned vocabulary), and
    sequence-pack THOSE ids into fixed-width shard bins — the shards a
    trainer would actually consume hold tokenizer output, not
    whitespace tokens. Same shuffle budget as ``pack_chunks``: the
    tokenize pass is broadcast-mapped, packing is one shard shuffle +
    per-shard offset window."""
    from credit_abs_oltp_to_mart_spark.operators import bpe

    docs = _t(spark, sf_dir, "documents")
    _, wf = bpe.bpe_train(docs, n_merges=BPE_MERGES)
    return bpe.bpe_pack(
        docs, wf, chunk_tokens=BPE_PACK_CHUNK, bin_tokens=BPE_PACK_BIN,
        shards=BPE_PACK_SHARDS,
    )


BPE_PACK_CHUNK = 64
BPE_PACK_BIN = 256
BPE_PACK_SHARDS = 8


def _bpe_ctes(
    n_merges: int = BPE_MERGES, prefix: str = "", train_where: str = "",
) -> str:
    """Round-replay CTE chain for bpe_train (mirrors the Lloyd-replay
    style): w0 = per-word char symbols off the word-frequency table; each
    round r appends pc{r}/m{r} (pair counts + argmax with the (count
    desc, left, right) tiebreak) and e..w{r} (leftmost-greedy merge:
    candidates via lead(), equal-pair overlaps resolved by even run
    offset — provably the greedy fold's fixpoint). DuckDB lists are
    1-based where Spark's [] is 0-based; both sides were built against
    the same worked examples in tests.

    ``prefix`` namespaces every CTE so several independently-trained
    vocabularies compose in one statement (the vocab-refresh replay);
    ``train_where`` restricts the TRAINING corpus (an extra predicate
    and-ed onto the non-empty-text filter). Defaults reproduce the
    historical single-vocabulary chain byte-for-byte."""
    p = prefix

    def pair_counts(r: int, src: str) -> str:
        return f"""
    {p}pc{r} as materialized (
      select s.l as l, s.r as r, sum(cnt) as c
      from (select cnt,
                   unnest(case when len(syms) < 2 then []
                          else list_transform(generate_series(1, len(syms) - 1),
                                 i -> {{'l': syms[i], 'r': syms[i + 1]}}) end)
                     as s
            from {src})
      group by 1, 2),
    {p}m{r} as materialized (select l, r, c from {p}pc{r}
                             order by c desc, l, r limit 1)"""

    def apply_merge(r: int) -> str:
        prev = f"{p}w{r - 1}"
        return f"""
    {p}e{r} as materialized (select word, cnt, t.i, syms[t.i] as sym
             from {prev}, unnest(generate_series(1, len(syms))) as t(i)),
    {p}f{r} as materialized (select {p}e{r}.*,
                    (sym = (select l from {p}m{r}) and
                     lead(sym) over (partition by word order by i)
                       = (select r from {p}m{r})) as cand
             from {p}e{r}),
    {p}g{r} as materialized (select {p}f{r}.*,
                    i - row_number() over (partition by word, sym order by i)
                      as grp
             from {p}f{r}),
    {p}h{r} as materialized (select {p}g{r}.*,
                    min(i) over (partition by word, sym, grp) as run_start
             from {p}g{r}),
    {p}s{r} as materialized (select {p}h{r}.*,
                    coalesce(cand, false)
                    and ((select l from {p}m{r}) <> (select r from {p}m{r})
                         or (i - run_start) % 2 = 0) as mstart
             from {p}h{r}),
    {p}t{r} as materialized (select {p}s{r}.*,
                    coalesce(lag(mstart) over (partition by word order by i),
                             false) as consumed
             from {p}s{r}),
    {p}w{r} as materialized (select word, cnt,
                    list(case when mstart
                              then sym || (select r from {p}m{r}) else sym end
                         order by i) as syms
             from {p}t{r} where not consumed group by word, cnt)"""

    extra = f" and ({train_where})" if train_where else ""
    parts = [
        f"""
    {p}wrds as materialized (
      select word, count(*) as cnt
      from (select unnest(string_split_regex(trim(text), ' +')) as word
            from documents where trim(text) <> ''{extra})
      group by 1),
    {p}w0 as materialized (
      select word, cnt,
             list_transform(generate_series(1, length(word)),
                            i -> word[i:i]) as syms
      from {p}wrds)"""
    ]
    for r in range(1, n_merges + 1):
        parts.append(pair_counts(r, f"{p}w{r - 1}"))
        parts.append(apply_merge(r))
    return ",".join(parts)


def _bpe_merges_oracle(n_merges: int = BPE_MERGES) -> str:
    rows = " union all ".join(
        f'select {r} as "rank", l as "left", r as "right",'
        f' l || r as merged, c::bigint as pair_count from m{r}'
        for r in range(1, n_merges + 1)
    )
    return f"""
    with {_bpe_ctes(n_merges)}
    select "rank"::int as "rank", "left", "right", merged, pair_count
    from ({rows})
    """


def _bpe_segment_oracle(n_merges: int = BPE_MERGES) -> str:
    return f"""
    with {_bpe_ctes(n_merges)},
    tok as (select doc_id,
                   unnest(string_split_regex(trim(text), ' +')) as word
            from documents where trim(text) <> ''),
    per as (select doc_id, count(*) as n_words,
                   sum(len(syms)) as n_bpe
            from tok join w{n_merges} using (word) group by 1)
    select d.doc_id, coalesce(n_words, 0)::int as n_words,
           coalesce(n_bpe, 0)::int as n_bpe_tokens
    from documents d left join per using (doc_id)
    """


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained quality classifier (VERDICT r05 #5): distill the
    hand-crafted quality gate into a linear model via full-batch
    gradient rounds on the cluster (one d+1-value aggregation + O(d)
    collect per round — the Lloyd/BPE loop shape), then score the corpus
    map-only. Hard-sigmoid activation + fixed-point features + exact
    bigint gradient sums make every round — and so the final weights and
    scores — bit-replayable by the DuckDB oracle."""
    from credit_abs_oltp_to_mart_spark.operators import classifier

    return classifier.quality_classifier(_t(spark, sf_dir, "documents"))


def _quality_classifier_oracle() -> str:
    """Gradient-replay of ``classifier.quality_classifier``: w0 = zeros;
    each round r computes the hard-sigmoid probabilities under w{r-1},
    sums the exact bigint err*x gradients, and derives w{r} with the
    shared truncate-toward-zero division (DuckDB ``//`` == Spark
    ``div``); the final select scores under w{rounds}."""
    from credit_abs_oltp_to_mart_spark.operators import classifier as CL

    S = CL.FEATURE_SCALE
    d = CL.N_FEATURES
    R = CL.CLASSIFIER_ROUNDS
    half = S // 2
    stop = ", ".join("'" + w + "'" for w in CL.ALL_STOPWORDS)
    ntok = (
        "(case when trim(text) = '' then 0"
        " else len(string_split_regex(trim(text), ' +')) end)"
    )
    feats = f"""
    f as materialized (
      select doc_id,
             (case when round(least(1.0, length(text)::double / 500.0)
                 * (1.0 - len(regexp_extract_all(text, '[^A-Za-z0-9_ ]'))::double
                          / greatest(1, length(text)))
                 * (case when ml >= 2.0 and ml <= 12.0 then 1.0 else 0.5 end),
                 6) >= 0.5 then 1 else 0 end) as y,
             [ {S}::bigint,
               least({S}, (length(text) * {S}) // 500),
               (len(regexp_extract_all(text, '[^A-Za-z0-9_ ]')) * {S})
                 // greatest(1, length(text)),
               (len(list_filter(case when trim(text) = '' then []
                    else string_split_regex(trim(lower(text)), ' +') end,
                    tok -> tok in ({stop}))) * {S})
                 // greatest(1, {ntok}),
               least({S}, (length(regexp_replace(trim(text), ' +', '', 'g'))
                 * {S}) // (12 * greatest(1, {ntok}))),
               least({S}, ({ntok} * {S}) // 100) ] as x
      from (select doc_id, text,
                   list_sum(list_transform(
                     string_split_regex(trim(text), ' +'),
                     tk -> length(tk)))::double
                     / greatest(1, len(string_split_regex(trim(text), ' +')))
                     as ml
            from documents))"""
    dot = " + ".join(f"x[{j + 1}] * w.w{j}" for j in range(d))
    p_expr = f"greatest(0, least({S}, {half} + ((({dot}) // {S}) // 4)))"
    parts = [feats, f"w0 as (select {', '.join(f'0::bigint as w{j}' for j in range(d))})"]
    for r in range(1, R + 1):
        gsums = ", ".join(
            f"sum((p - y * {S}) * x[{j + 1}]) as g{j}" for j in range(d)
        )
        wnew = ", ".join(
            f"(w.w{j} - (({CL.LR_NUM} * g.g{j})"
            f" // ({CL.LR_DEN} * g.n * {S})))::bigint as w{j}"
            for j in range(d)
        )
        parts.append(
            f"s{r} as materialized (select doc_id, y, x, {p_expr} as p"
            f" from f, w{r - 1} w)"
        )
        parts.append(
            f"g{r} as materialized (select count(*) as n, {gsums} from s{r})"
        )
        parts.append(f"w{r} as (select {wnew} from w{r - 1} w, g{r} g)")
    return f"""
    with {','.join(parts)}
    select f.doc_id, f.y::int as label,
           ({p_expr})::double / {S} as prob,
           ({p_expr} >= {half})::int as predicted
    from f, w{R} w
    """


def _bpe_pack_oracle(n_merges: int = BPE_MERGES) -> str:
    """Replays segmentation + id assignment + packing: vocab = distinct
    final symbols with dense lexicographic ids; per-word id list from the
    trained word frame; per-doc flattened sequence in word order; chunk /
    shard / offset / bin exactly as ``_pack_chunks_oracle``."""
    c, b, s = BPE_PACK_CHUNK, BPE_PACK_BIN, BPE_PACK_SHARDS
    return f"""
    with {_bpe_ctes(n_merges)},
    vocab as materialized (
      select sym, (row_number() over (order by sym) - 1)::int as tok_id
      from (select distinct unnest(syms) as sym from w{n_merges})),
    wid as materialized (
      select word, list(tok_id order by i) as ids
      from (select word, t.i, syms[t.i] as sym
            from w{n_merges},
                 unnest(generate_series(1, len(syms))) as t(i)) e
           join vocab using (sym)
      group by word),
    dt as (
      select doc_id, t.i as wpos, tk[t.i] as word
      from (select doc_id, string_split_regex(trim(text), ' +') as tk
            from documents where trim(text) <> '') d,
           unnest(generate_series(1, len(tk))) as t(i)),
    seq as (
      select doc_id, flatten(list(ids order by wpos)) as ids
      from dt join wid using (word) group by doc_id),
    ch as (
      select doc_id, ids,
             unnest(generate_series(0, ((len(ids) + {c - 1}) // {c}) - 1))
               as chunk_idx
      from seq where len(ids) > 0),
    sized as (
      select doc_id, chunk_idx::int as chunk_idx,
             ids[chunk_idx * {c} + 1 : chunk_idx * {c} + {c}] as chunk,
             (('0x' || substr(md5('shard:' || doc_id::varchar), 1, 15))::bigint
              % {s})::int as shard
      from ch),
    packed as (
      select shard, doc_id, chunk_idx, len(chunk)::int as n_tokens,
             array_to_string(chunk, ' ') as chunk_ids,
             coalesce(sum(len(chunk)) over (
               partition by shard order by doc_id, chunk_idx
               rows between unbounded preceding and 1 preceding), 0)::bigint
               as start_tok
      from sized)
    select shard, doc_id, chunk_idx, n_tokens, chunk_ids, start_tok,
           start_tok // {b} as bin
    from packed
    """


def _stream_bpe_ingest_oracle(n_merges: int = BPE_MERGES) -> str:
    """Composes the two heaviest replay chains: the batch-sequential
    admitted sets from _corpus_admitted_ctes, then BPE segmentation +
    dense-id assignment from _bpe_ctes, then the pack with PER-SHARD
    offsets carried ACROSS batches — one window in (batch, doc_id,
    chunk_idx) order per shard, exactly what the streamed per-batch
    windows + the pack_offsets state compute together."""
    c, bn, s = BPE_PACK_CHUNK, BPE_PACK_BIN, BPE_PACK_SHARDS
    return f"""
    with {_corpus_admitted_ctes()},
    {_bpe_ctes(n_merges)},
    vocab as materialized (
      select sym, (row_number() over (order by sym) - 1)::int as tok_id
      from (select distinct unnest(syms) as sym from w{n_merges})),
    wid as materialized (
      select word, list(tok_id order by i) as ids
      from (select word, t.i, syms[t.i] as sym
            from w{n_merges},
                 unnest(generate_series(1, len(syms))) as t(i)) e
           join vocab using (sym)
      group by word),
    asel as (select doc_id, b from adm0
             union all select doc_id, b from adm1
             union all select doc_id, b from adm2),
    dt as (
      select g.doc_id, t.i as wpos, g.tk[t.i] as word
      from gated g join asel using (doc_id),
           unnest(generate_series(1, len(g.tk))) as t(i)),
    seq as (
      select doc_id, flatten(list(ids order by wpos)) as ids
      from dt join wid using (word) group by doc_id),
    ch as (
      select doc_id, ids,
             unnest(generate_series(0, ((len(ids) + {c - 1}) // {c}) - 1))
               as chunk_idx
      from seq where len(ids) > 0),
    sized as (
      select doc_id, chunk_idx::int as chunk_idx,
             ids[chunk_idx * {c} + 1 : chunk_idx * {c} + {c}] as chunk,
             (('0x' || substr(md5('shard:' || doc_id::varchar), 1, 15))::bigint
              % {s})::int as shard
      from ch),
    packed as (
      select shard, sized.doc_id, chunk_idx, len(chunk)::int as n_tokens,
             array_to_string(chunk, ' ') as chunk_ids,
             asel.b,
             coalesce(sum(len(chunk)) over (
               partition by shard
               order by asel.b, sized.doc_id, chunk_idx
               rows between unbounded preceding and 1 preceding), 0)::bigint
               as start_tok
      from sized join asel on asel.doc_id = sized.doc_id)
    select shard, doc_id, chunk_idx, n_tokens, chunk_ids, start_tok,
           start_tok // {bn} as bin, b::bigint as ingest_batch
    from packed
    """


def _ann_quantized_ivf_oracle(
    iters: int = KMEANS_ITERS, nprobe: int = IVF_NPROBE, levels: int = 256
) -> str:
    """Replay of ann.quantized_ivf_topk_trained: Lloyd CTEs give the
    assignment + codebook; probe ranking is the trained-IVF integer
    score; candidate scoring is the dot product of the RECONSTRUCTED
    scalar-quantized values (mn + code * span/(levels-1)), rounded 6dp
    — same fold order as the Spark zip_with aggregate."""
    qids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    cb = f"c{iters - 1}"
    return f"""
    {_kmeans_ctes(iters)},
    qs as (select vid, d, val from u where vid in ({qids})),
    psc as (select qs.vid, {cb}.cid,
                   (sum({cb}.c * {cb}.c) - 2 * sum(qs.val * {cb}.c))::bigint
                     as score
            from qs join {cb} using (d) group by 1, 2),
    pr as (select vid as query_id, cid as cluster from (
             select vid, cid,
                    row_number() over (partition by vid
                                       order by score, cid) as rn
             from psc) z
           where rn <= {nprobe}),
    s as (select vec_id,
                 cast(list_min(embedding) as double) as mn,
                 case when list_max(embedding) <> list_min(embedding)
                      then cast(list_max(embedding) as double)
                           - cast(list_min(embedding) as double)
                      else 1.0 end as span,
                 embedding
          from embeddings),
    cq as (select vec_id,
                  list_transform(embedding,
                    x -> mn + cast(floor((cast(x as double) - mn) / span
                                         * {levels - 1}.0 + 0.5) as double)
                              * span / {levels - 1}.0)
                    as rv
           from s),
    cand as (select pr.query_id, a{iters}.vid as neighbor_id, pr.cluster
             from pr join a{iters} on a{iters}.cluster = pr.cluster
             where a{iters}.vid <> pr.query_id),
    scored as (select cand.query_id, cand.neighbor_id,
                      round(list_dot_product(cn.rv, cp.rv), 6) as score
               from cand
               join cq cn on cn.vec_id = cand.neighbor_id
               join cq cp on cp.vec_id = cand.query_id),
    final as (select *, row_number() over (partition by query_id
                                           order by score desc,
                                                    neighbor_id asc) as rank
              from scored)
    select query_id, neighbor_id, cast(rank as int) as rank, score
    from final where rank <= {ANN_K}
    """


def _stream_ann_ingest_oracle(
    iters: int = KMEANS_ITERS, nprobe: int = IVF_NPROBE, levels: int = 256
) -> str:
    """Replay: Lloyd restricted to the base split gives codebook
    c{iters-1} + base assignments; stream vectors assign against that
    FINAL codebook (same integer argmin); quantization replays for all;
    probe + compressed-domain scoring as in the quantized-IVF oracle."""
    qids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    cb = f"c{iters - 1}"
    return f"""
    {_kmeans_ctes(iters, where_v="where vec_id % 4 <> 3")},
    vall as (select vec_id as vid,
               list_transform(embedding, x -> cast(case when x >= 0
                 then floor(x::double * 1000000 + 0.5)
                 else -floor(-x::double * 1000000 + 0.5) end
                 as bigint)) as a
             from embeddings),
    uall as (select vid, g.d, a[g.d] as val
             from vall, generate_series(1, 64) g(d)),
    qs as (select vid, d, val from uall where vid in ({qids})),
    psc as (select qs.vid, {cb}.cid,
                   (sum({cb}.c * {cb}.c) - 2 * sum(qs.val * {cb}.c))::bigint
                     as score
            from qs join {cb} using (d) group by 1, 2),
    pr as (select vid as query_id, cid as cluster from (
             select vid, cid,
                    row_number() over (partition by vid
                                       order by score, cid) as rn
             from psc) z
           where rn <= {nprobe}),
    ssc as (select u2.vid, {cb}.cid,
                   (sum({cb}.c * {cb}.c) - 2 * sum(u2.val * {cb}.c))::bigint
                     as score
            from (select * from uall where vid % 4 = 3) u2
            join {cb} using (d) group by 1, 2),
    sassign as (select vid, cid as cluster from (
                  select vid, cid,
                         row_number() over (partition by vid
                                            order by score, cid) as rn
                  from ssc) z where rn = 1),
    allassign as (select vid, cluster from a{iters}
                  union all
                  select vid, cluster from sassign),
    s as (select vec_id,
                 cast(list_min(embedding) as double) as mn,
                 case when list_max(embedding) <> list_min(embedding)
                      then cast(list_max(embedding) as double)
                           - cast(list_min(embedding) as double)
                      else 1.0 end as span,
                 embedding
          from embeddings),
    cq as (select vec_id,
                  list_transform(embedding,
                    x -> mn + cast(floor((cast(x as double) - mn) / span
                                         * {levels - 1}.0 + 0.5) as double)
                              * span / {levels - 1}.0)
                    as rv
           from s),
    cand as (select pr.query_id, allassign.vid as neighbor_id
             from pr join allassign on allassign.cluster = pr.cluster
             where allassign.vid <> pr.query_id),
    scored as (select cand.query_id, cand.neighbor_id,
                      round(list_dot_product(cn.rv, cp.rv), 6) as score
               from cand
               join cq cn on cn.vec_id = cand.neighbor_id
               join cq cp on cp.vec_id = cand.query_id),
    final as (select *, row_number() over (partition by query_id
                                           order by score desc,
                                                    neighbor_id asc) as rank
              from scored)
    select query_id, neighbor_id, cast(rank as int) as rank, score
    from final where rank <= {ANN_K}
    """


def q_stream_vocab_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tokenizer-vocabulary refresh (VERDICT r07 #9, stretch):
    the deployed-tokenizer production loop — docs stream in, every batch
    segments under the vocabulary generation PINNED for it, and every
    ``refresh_every`` batches the tokenizer retrains on everything
    ingested so far and publishes the next versioned vocab partition
    consumers re-pin. Version choice is BY RULE (batch b -> version
    b div refresh_every; version v trains on init + batches before
    v*refresh_every), so crash replays and lost publishes re-derive
    identical vocabularies — the add_eval_suite re-pin pattern without
    its replay caveat. Init = every 4th doc; 4 batches of the rest;
    refresh_every=2 — so the output carries TWO vocab generations and
    the hash gate covers both trainings, the cadence, and every batch's
    pinned segmentation in one verdict."""
    import shutil
    import tempfile
    import time as _time

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    init = docs.where(F.col("doc_id") % 4 == 0)
    tmp = tempfile.mkdtemp(prefix="spark_vocab_refresh_")
    try:
        slices = os.path.join(tmp, "slices")
        _write_slices(
            slices,
            [
                (
                    f"b{k}",
                    docs.where(
                        F.pmod(F.col("doc_id"), F.lit(16)).isin(
                            [4 * k + 1, 4 * k + 2, 4 * k + 3]
                        )
                    ),
                )
                for k in range(4)
            ],
        )
        out = streaming.stream_vocab_refresh(
            spark,
            f"{slices}/b*",
            init,
            os.path.join(tmp, "out"),
            schema="doc_id bigint, text string",
            n_merges=BPE_MERGES,
            refresh_every=2,
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _stream_vocab_refresh_oracle(n_merges: int = BPE_MERGES) -> str:
    """Replay: TWO independently-trained BPE chains (prefixed CTEs) —
    v0 on the init split, v1 on init + batches 0-1 — then each batch's
    per-doc stats via the word join against its PINNED generation's
    final word frame (left join keeps all-unseen/empty docs at 0, the
    bpe_segment_stats contract)."""
    va = _bpe_ctes(n_merges, prefix="va", train_where="doc_id % 4 = 0")
    vb = _bpe_ctes(
        n_merges,
        prefix="vb",
        train_where="doc_id % 4 = 0 or doc_id % 16 in (1,2,3,5,6,7)",
    )
    return f"""
    with {va},
    {vb},
    toks as (select doc_id,
                    unnest(string_split_regex(trim(text), ' +')) as word
             from documents where trim(text) <> ''),
    bsel as (select doc_id,
                    case when doc_id % 16 in (1,2,3) then 0
                         when doc_id % 16 in (5,6,7) then 1
                         when doc_id % 16 in (9,10,11) then 2
                         else 3 end as batch
             from documents
             where doc_id % 16 in (1,2,3,5,6,7,9,10,11,13,14,15)),
    stats_a as (select t.doc_id, count(*) as n_words,
                       sum(len(w.syms)) as n_bpe
                from toks t join vaw{n_merges} w on w.word = t.word
                group by 1),
    stats_b as (select t.doc_id, count(*) as n_words,
                       sum(len(w.syms)) as n_bpe
                from toks t join vbw{n_merges} w on w.word = t.word
                group by 1)
    select b.batch::int as batch, b.doc_id,
           0 as vocab_version,
           coalesce(s.n_words, 0)::int as n_words,
           coalesce(s.n_bpe, 0)::int as n_bpe_tokens
    from bsel b left join stats_a s using (doc_id)
    where b.batch in (0, 1)
    union all
    select b.batch::int as batch, b.doc_id,
           1 as vocab_version,
           coalesce(s.n_words, 0)::int as n_words,
           coalesce(s.n_bpe, 0)::int as n_bpe_tokens
    from bsel b left join stats_b s using (doc_id)
    where b.batch in (2, 3)
    """


def q_stream_corpus_vocab_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stream_vocab_refresh's by-rule tokenizer versioning threaded into
    the FULL corpus ingest (VERDICT r08 #9, stretch): the 3-slice
    filter -> store-dedup -> decontam chain of stream_corpus_ingest, but
    the tokenizer now retrains MID-RUN on the pipeline's own admitted
    output — batch b segments/packs its admitted docs under vocabulary
    generation v(b) = b div 2, where v0 trains on the held-out seed
    corpus and v1 on seed + exactly the ADMITTED docs of batches 0-1
    (both pure functions of the batch id, so crash replays re-derive
    identical vocabularies). Output = per-admitted-doc segmentation
    stats under the batch's PINNED generation, so the hash gate covers
    all three admission gates, both trainings, the cadence, and every
    batch's pinned segmentation in one verdict."""
    import shutil
    import tempfile
    import time as _time

    from credit_abs_oltp_to_mart_spark.functions.similarity import md5_long
    from credit_abs_oltp_to_mart_spark.operators.curation import split_expr

    docs = _t(spark, sf_dir, "documents").withColumn("split", split_expr())
    train = docs.where(F.col("split") == "train").drop("split")
    init = docs.where(F.col("split") != "train").select("doc_id", "text")
    b = F.pmod(
        md5_long(F.concat(F.lit("ingest:"), F.col("doc_id").cast("string"))),
        F.lit(3),
    )
    tagged = train.withColumn("__b", b.cast("int"))
    tmp = tempfile.mkdtemp(prefix="spark_corpus_vocab_")
    try:
        gram_store = os.path.join(tmp, "eval_grams")
        slices = os.path.join(tmp, "slices")
        # independent setup steps — overlap them (guide §2.6)
        _overlap(
            lambda: curation.build_eval_gram_store(
                docs.where(F.col("split") != "train").drop("split")
            ).write.parquet(gram_store),
            lambda: _write_slices(
                slices,
                [(f"b{k}", tagged.where(F.col("__b") == k).drop("__b"))
                 for k in range(3)],
            ),
        )
        out = streaming.stream_corpus_ingest(
            spark,
            f"{slices}/b*",
            os.path.join(tmp, "out"),
            schema=train.schema,
            gram_store_path=gram_store,
            n=JACCARD_N,
            n_perm=MINHASH_PERMS,
            bands=MINHASH_BANDS,
            min_est=0.25,
            seed=MINHASH_SEED,
            dedup_within_batch=True,
            tokenizer_refresh_init=init,
            tokenizer_refresh_every=2,
            tokenizer_merges=BPE_MERGES,
            return_segmented=True,
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _stream_corpus_vocab_ingest_oracle(n_merges: int = BPE_MERGES) -> str:
    """Replay: the full admission chain (_corpus_admitted_ctes ->
    adm0/adm1/adm2), TWO independently-trained BPE chains — v0 on the
    held-out split, v1 on held-out + the REPLAYED admitted docs of
    batches 0-1 (the adm01 CTE feeds the training predicate) — then each
    admitted doc's stats via the word join against its batch's PINNED
    generation (left join keeps all-unseen docs at 0, the
    bpe_segment_stats contract)."""
    not_train = f"{_split_bucket_sql('split:')} >= {curation.TRAIN_PCT}"
    va = _bpe_ctes(n_merges, prefix="va", train_where=not_train)
    vb = _bpe_ctes(
        n_merges,
        prefix="vb",
        train_where=(
            f"({not_train}) or doc_id in (select doc_id from adm01)"
        ),
    )
    return f"""
    with {_corpus_admitted_ctes()},
    {va},
    {vb},
    vtoks as (select doc_id,
                     unnest(string_split_regex(trim(text), ' +')) as word
              from documents where trim(text) <> ''),
    vstats_a as (select t.doc_id, count(*) as n_words,
                        sum(len(w.syms)) as n_bpe
                 from vtoks t join vaw{n_merges} w on w.word = t.word
                 group by 1),
    vstats_b as (select t.doc_id, count(*) as n_words,
                        sum(len(w.syms)) as n_bpe
                 from vtoks t join vbw{n_merges} w on w.word = t.word
                 group by 1),
    adm as (select doc_id, b from adm0
            union all select doc_id, b from adm1
            union all select doc_id, b from adm2)
    select a.doc_id, a.b::bigint as ingest_batch,
           (a.b // 2)::int as vocab_version,
           coalesce(case when a.b < 2 then sa.n_words else sb.n_words end,
                    0)::int as n_words,
           coalesce(case when a.b < 2 then sa.n_bpe else sb.n_bpe end,
                    0)::int as n_bpe_tokens
    from adm a
    left join vstats_a sa on sa.doc_id = a.doc_id
    left join vstats_b sb on sb.doc_id = a.doc_id
    """


# PQ init ids for the streaming contract: all in the base split
# (vec_id % 4 != 3) — the sub-codebooks must train on base only
STREAM_PQ_INIT_IDS = [4, 9, 14, 21, 24, 29, 34, 41]


def q_stream_pq_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous maintenance of the persisted IVF-PQ index — the
    product-quantized twin of ``stream_ann_ingest``: the index is BUILT
    once from the base 75% of the embeddings (coarse + per-subspace
    codebooks), the remaining 25% ARRIVES as 2 streaming micro-batches —
    each encoded against the FIXED persisted codebooks (coarse argmin +
    per-subspace argmin, bit-parity with a rebuild) and appended as
    batch-scoped postings — and the ADC probe finally serves base UNION
    incremental from cold reads. The hash gate covers codebook training,
    online encoding, the batch-keyed appends AND the integer ADC union
    probe in one verdict."""
    import shutil
    import tempfile
    import time as _time

    from credit_abs_oltp_to_mart_spark.operators import ann as _ann

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.where(F.col("vec_id") % 4 != 3)
    tmp = tempfile.mkdtemp(prefix="spark_pq_ingest_")
    try:
        idx = os.path.join(tmp, "index")
        slices = os.path.join(tmp, "slices")
        # the offline index build and the input-slice writes are
        # independent setup steps — overlap them (guide §2.6)
        _overlap(
            lambda: _ann.build_pq_index(
                base,
                idx,
                coarse_init_ids=KMEANS_INIT_IDS,
                pq_init_ids=STREAM_PQ_INIT_IDS,
                m=PQ_M,
                coarse_iterations=KMEANS_ITERS,
                pq_iterations=PQ_ITERS,
            ),
            lambda: _write_slices(
                slices,
                [(f"b{k}", emb.where(F.col("vec_id") % 8 == resid))
                 for k, resid in enumerate([3, 7])],
            ),
        )
        streaming.stream_pq_ingest(
            spark, f"{slices}/b*", idx, schema=emb.schema
        )
        queries = emb.where(F.col("vec_id").isin(ANN_QUERY_IDS))
        out = _ann.pq_index_probe(
            queries, idx, k=ANN_K, nprobe=IVF_NPROBE,
            include_incremental=True,
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _stream_pq_ingest_oracle(
    iters: int = KMEANS_ITERS, piters: int = PQ_ITERS, nprobe: int = IVF_NPROBE
) -> str:
    """Replay: coarse + per-subspace Lloyd restricted to the base split;
    stream vectors assign/encode against those FINAL codebooks (same
    integer argmins); ADC lookup tables from the raw query slices; probe
    over base UNION streamed code tables."""
    qids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    cb = f"c{iters - 1}"
    dsub = 64 // PQ_M
    subs = ",".join(
        _pq_sub_ctes(s, piters, init_ids=STREAM_PQ_INIT_IDS)
        for s in range(PQ_M)
    )
    luts = ",".join(
        f"""
        s{s}lut as (select q.vid as query_id, c.cid,
                           sum(q.val * c.c)::bigint as dp
                    from (select vid, d - {s * dsub} as d, val from uall
                          where d > {s * dsub} and d <= {(s + 1) * dsub}
                            and vid in ({qids})) q
                    join s{s}c{piters - 1} c using (d) group by 1, 2)"""
        for s in range(PQ_M)
    )
    stream_codes = ",".join(
        f"""
        s{s}ssc as (select u2.vid, c.cid,
                           (sum(c.c * c.c) - 2 * sum(u2.val * c.c))::bigint
                             as score
                    from (select vid, d - {s * dsub} as d, val from uall
                          where d > {s * dsub} and d <= {(s + 1) * dsub}
                            and vid % 4 = 3) u2
                    join s{s}c{piters - 1} c using (d) group by 1, 2),
        s{s}sa as (select vid, cid as cluster from (
                     select vid, cid,
                            row_number() over (partition by vid
                                               order by score, cid) as rn
                     from s{s}ssc) z where rn = 1),
        s{s}all as (select vid, cluster from s{s}a{piters}
                    union all
                    select vid, cluster from s{s}sa)"""
        for s in range(PQ_M)
    )
    contribs = " union all ".join(
        f"""select l.query_id, a.vid as neighbor_id, l.dp
            from s{s}all a join s{s}lut l on l.cid = a.cluster"""
        for s in range(PQ_M)
    )
    return f"""
    {_kmeans_ctes(iters, where_v="where vec_id % 4 <> 3")},
    {subs},
    vall as (select vec_id as vid,
               list_transform(embedding, x -> cast(case when x >= 0
                 then floor(x::double * 1000000 + 0.5)
                 else -floor(-x::double * 1000000 + 0.5) end
                 as bigint)) as a
             from embeddings),
    uall as (select vid, g.d, a[g.d] as val
             from vall, generate_series(1, 64) g(d)),
    {luts},
    {stream_codes},
    adc as (select query_id, neighbor_id, sum(dp)::bigint as adc_score
            from ({contribs}) group by 1, 2),
    ssc as (select u2.vid, {cb}.cid,
                   (sum({cb}.c * {cb}.c) - 2 * sum(u2.val * {cb}.c))::bigint
                     as score
            from (select * from uall where vid % 4 = 3) u2
            join {cb} using (d) group by 1, 2),
    sassign as (select vid, cid as cluster from (
                  select vid, cid,
                         row_number() over (partition by vid
                                            order by score, cid) as rn
                  from ssc) z where rn = 1),
    allassign as (select vid, cluster from a{iters}
                  union all
                  select vid, cluster from sassign),
    psc as (select q.vid, {cb}.cid,
                   (sum({cb}.c * {cb}.c) - 2 * sum(q.val * {cb}.c))::bigint
                     as score
            from (select * from uall where vid in ({qids})) q
            join {cb} using (d) group by 1, 2),
    pr as (select vid as query_id, cid as cluster from (
             select vid, cid,
                    row_number() over (partition by vid
                                       order by score, cid) as rn
             from psc) z
           where rn <= {nprobe}),
    cand as (select pr.query_id, allassign.vid as neighbor_id
             from pr join allassign on allassign.cluster = pr.cluster
             where allassign.vid <> pr.query_id),
    final as (select c.query_id, c.neighbor_id, adc.adc_score,
                     row_number() over (partition by c.query_id
                                        order by adc.adc_score desc,
                                                 c.neighbor_id asc) as rank
              from cand c join adc
                on adc.query_id = c.query_id
               and adc.neighbor_id = c.neighbor_id)
    select query_id, neighbor_id, cast(rank as int) as rank, adc_score
    from final where rank <= {ANN_K}
    """


# --- generator parity (G1-G11): pinned tiny config, deterministic seed ---
_GEN_PARAMS = dict(n_loans=60, n_borrowers=80, n_applications=100, seed=42)


def q_generator_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1-G11 parity evidence in the driver gate: run the 17-table generator
    dataflow in-memory (pinned sizes + seed; start_date_max pinned so output
    can't move with the clock) and fold the reference's documented
    invariants into violation counts — schedule balance recurrence
    (pg_oltp_synth.py:442-445), payment timing windows (:594-601), id
    floors (:36-37), arrears bucket/flag consistency (:76-85, :686-688),
    exact loan cardinality. The oracle is the invariant CONTRACT itself (a
    constant all-zeros table): any generator regression flips a count and
    breaks the value hash. ``sf_dir`` is unused — the generator IS the
    source."""
    from datetime import date as _date

    from credit_abs_oltp_to_mart_spark.generator.config import OLTPSynthConfig
    from credit_abs_oltp_to_mart_spark.generator.generate import (
        run_credit_oltp_synth,
    )

    cfg = OLTPSynthConfig(start_date_max=_date(2025, 12, 31), **_GEN_PARAMS)
    t = run_credit_oltp_synth(spark, cfg)
    sched, loans, pay = t["repayment_schedule"], t["loan_contract"], t["repayment_payment"]

    def viol(name: str, df: DataFrame, cond) -> DataFrame:
        return (
            df.where(cond)
            .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
            .select(F.lit(name).alias("invariant"), "n_violations")
        )

    cent = 0.011  # each side rounds to cents independently -> <=1c drift
    pay_sched = pay.join(
        sched.select(F.col("schedule_id").alias("payment_id"), "due_date"),
        "payment_id",
    )
    bucket_expected = (
        F.when(F.col("days_past_due") <= 0, "0")
        .when(F.col("days_past_due") <= 30, "1-30")
        .when(F.col("days_past_due") <= 60, "31-60")
        .when(F.col("days_past_due") <= 90, "61-90")
        .otherwise(">90")
    )
    frames = [
        viol(
            "schedule_balance_recurrence",
            sched,
            F.abs(
                F.col("closing_principal_balance")
                - (F.col("opening_principal_balance") - F.col("principal_due"))
            )
            > cent,
        ),
        viol(
            "schedule_total_due",
            sched,
            (
                F.abs(
                    F.col("total_due")
                    - (F.col("principal_due") + F.col("interest_due"))
                )
                > cent
            )
            | (F.col("fees_due") != 0),
        ),
        # every payment id maps back to a schedule installment (S6 id scheme)
        pay.join(
            sched.select(F.col("schedule_id").alias("payment_id")),
            "payment_id",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        .select(F.lit("payment_installment_fk").alias("invariant"), "n_violations"),
        viol(
            "payment_timing_window",
            pay_sched,
            (F.col("payment_date") < F.col("due_date"))
            | (F.datediff("payment_date", "due_date") > 90),
        ),
        viol(
            "id_floors",
            loans,
            (F.col("borrower_id") < 10_000)
            | (F.col("application_id") < 100_000_000),
        ),
        loans.agg(
            F.abs(F.count(F.lit(1)) - F.lit(_GEN_PARAMS["n_loans"]))
            .cast("long")
            .alias("n_violations")
        ).select(F.lit("loan_cardinality").alias("invariant"), "n_violations"),
        viol(
            "arrears_bucket_consistency",
            t["arrears_dpd_status"],
            (F.col("arrears_bucket") != bucket_expected)
            | (
                F.col("early_arrears_flag")
                != F.col("days_past_due").between(5, 30)
            )
            | (F.col("nonperforming_flag") != (F.col("days_past_due") > 90)),
        ),
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


_GENERATOR_INVARIANTS_ORACLE = """
    select invariant, n_violations::bigint as n_violations
    from (values
        ('schedule_balance_recurrence', 0),
        ('schedule_total_due', 0),
        ('payment_installment_fk', 0),
        ('payment_timing_window', 0),
        ('id_floors', 0),
        ('loan_cardinality', 0),
        ('arrears_bucket_consistency', 0)
    ) t(invariant, n_violations)
"""


def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus-pipeline composition in the driver gate
    (VERDICT r02 #6): run ``build_corpus`` on the documents table and fold
    the pipeline's guarantees into violation counts, ``generator_invariants``
    style — the oracle is the invariant CONTRACT (constant all-zeros), so
    any stage regression (a filter gate leak, a surviving dup pair, eval
    contamination, a token-budget breach) flips a count and breaks the
    value hash. Stage frames are persisted: the 8 audit branches would
    otherwise each re-run the whole upstream (LSH self-join + iterative
    components) once."""
    from credit_abs_oltp_to_mart_spark.functions.text import (
        quality_score,
        ws_token_count,
    )
    from credit_abs_oltp_to_mart_spark.operators.curation import (
        DECONTAM_N,
        pii_signal_count,
    )
    from credit_abs_oltp_to_mart_spark.operators.dedup import (
        minhash_lsh_pairs,
        shingle_rows,
    )
    from credit_abs_oltp_to_mart_spark.operators.textops import lang_pred_expr
    from credit_abs_oltp_to_mart_spark.plans.corpus import build_corpus

    docs = _t(spark, sf_dir, "documents")
    stages = build_corpus(docs)
    filtered, deduped, clean, packed = (
        stages["filtered"].persist(),
        stages["deduped"].persist(),
        stages["clean"].persist(),
        stages["packed"].persist(),
    )

    def viol(name: str, df: DataFrame, cond=None) -> DataFrame:
        src = df.where(cond) if cond is not None else df
        return src.agg(
            F.count(F.lit(1)).cast("long").alias("n_violations")
        ).select(F.lit(name).alias("invariant"), "n_violations")

    t = F.col("text")
    # stage monotonicity via 1-row count frames (broadcast-nested-loop of
    # single rows — no data movement)
    counts = (
        docs.agg(F.count(F.lit(1)).alias("n_in"))
        .crossJoin(filtered.agg(F.count(F.lit(1)).alias("n_f")))
        .crossJoin(deduped.agg(F.count(F.lit(1)).alias("n_d")))
        .crossJoin(clean.agg(F.count(F.lit(1)).alias("n_c")))
    )
    monotone = counts.select(
        F.lit("stage_monotonicity").alias("invariant"),
        (
            F.when(F.col("n_in") < F.col("n_f"), 1).otherwise(0)
            + F.when(F.col("n_f") < F.col("n_d"), 1).otherwise(0)
            + F.when(F.col("n_d") < F.col("n_c"), 1).otherwise(0)
            + F.when(F.col("n_c") <= 0, 1).otherwise(0)
        ).cast("long").alias("n_violations"),
    )
    norm = F.lower(F.regexp_replace(F.trim(t), "[ ]+", " "))
    dup_groups = (
        deduped.select(F.md5(norm).alias("ck"))
        .groupBy("ck")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )
    # eval contamination audit recomputed independently of the pipeline's
    # own decontaminate step (same grams, same 0.5 bar; the split comes
    # from the OUTPUT's split column, not re-derived). Persisted: the eval
    # and train branches would otherwise each re-run the shingle explode +
    # split join.
    grams = (
        shingle_rows(clean, DECONTAM_N)
        .join(clean.select("doc_id", "split"), "doc_id")
        .persist()
    )
    ev = (
        grams.where(F.col("split") != "train")
        .select("shingle")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    # one row per distinct shingle on the build side -> the left join never
    # duplicates a train gram row; total and overlap come from one agg pass
    contaminated = (
        grams.where(F.col("split") == "train")
        .join(F.broadcast(ev), "shingle", "left")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("tot"), F.count("__hit").alias("hit"))
        .where(F.col("hit").cast("double") / F.col("tot") >= 0.5)
    )
    frames = [
        monotone,
        viol(
            "filter_gate",
            filtered,
            (quality_score(t) < 0.3)
            | (ws_token_count(t) < 8)
            | ~lang_pred_expr(t).isin(["en", "de", "es", "fr"])
            | (pii_signal_count(t) > 0),
        ),
        viol("exact_dup_survivors", dup_groups),
        viol("near_dup_survivors", minhash_lsh_pairs(deduped, threshold=0.12)),
        viol("eval_contamination", contaminated),
        viol("chunk_token_budget", packed, F.col("n_tokens") > 64),
        viol("packed_train_only", packed, F.col("split") != "train"),
        viol(
            "bin_offset_consistency",
            packed,
            F.col("bin") != F.expr("start_tok div 256"),
        ),
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def q_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trainer-facing tail composed end to end (clean corpus ->
    temperature mixture -> packed replicated shards -> loader manifest ->
    two seeded epoch orders), folded into violation counts like
    ``corpus_pipeline``: the oracle is the invariant CONTRACT (constant
    all-zeros), so a mixture bound breach, a non-permutation epoch order,
    seed collapse, a packed chunk from an unadmitted doc, an offset/bin
    mismatch, or a lossy manifest roll-up each flip a count and break
    the value hash."""
    from credit_abs_oltp_to_mart_spark.operators.curation import (
        WEIGHT_FP_SCALE,
    )
    from credit_abs_oltp_to_mart_spark.plans.corpus import (
        build_training_manifest,
    )

    stride = 64
    stages = build_training_manifest(
        _t(spark, sf_dir, "documents"), copy_id_stride=stride
    )
    train = stages["train"]
    weights, mixture = stages["weights"], stages["mixture"].persist()
    packed, manifest = stages["packed_mix"].persist(), stages["manifest"]
    epochs = stages["epochs"].persist()

    def viol(name: str, df: DataFrame, cond=None) -> DataFrame:
        src = df.where(cond) if cond is not None else df
        return src.agg(
            F.count(F.lit(1)).cast("long").alias("n_violations")
        ).select(F.lit(name).alias("invariant"), "n_violations")

    # per-doc replication stays within [floor(factor), floor(factor)+1]
    # and copy numbers are dense 1..n_copies
    f_u = F.floor(
        F.col("sample_factor") * WEIGHT_FP_SCALE + F.lit(0.5)
    ).cast("bigint")
    base = (f_u / WEIGHT_FP_SCALE).cast("bigint")
    per_doc = (
        mixture.groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.max("copy_no").alias("max_copy"),
        )
        .join(F.broadcast(weights.select("lang", "sample_factor")), "lang")
        .withColumn("__base", base)
    )
    # every epoch order is a permutation of the manifest's (shard, bin)
    mcount = manifest.agg(F.count(F.lit(1)).alias("__m"))
    epstats = (
        epochs.groupBy("epoch")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("read_order").alias("nd"),
            F.countDistinct("shard", "bin").alias("ndk"),
            F.min("read_order").alias("mn"),
            F.max("read_order").alias("mx"),
        )
        .crossJoin(F.broadcast(mcount))
    )
    # the two seeds must not produce the same order
    e0 = epochs.where(F.col("epoch") == 0).select(
        "shard", "bin", F.col("read_order").alias("o0")
    )
    e1 = epochs.where(F.col("epoch") == 1).select(
        "shard", "bin", F.col("read_order").alias("o1")
    )
    seed_cmp = (
        e0.join(e1, ["shard", "bin"])
        .agg(
            F.sum(
                F.when(F.col("o0") != F.col("o1"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("__ndiff")
        )
        .select(
            F.lit("epoch_orders_differ").alias("invariant"),
            F.when(F.col("__ndiff") == 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("n_violations"),
        )
    )
    # manifest roll-up is lossless over the packed chunks
    lossless = (
        manifest.agg(F.sum("n_chunks").alias("__mc"))
        .crossJoin(F.broadcast(packed.agg(F.count(F.lit(1)).alias("__pc"))))
        .select(
            F.lit("manifest_lossless").alias("invariant"),
            F.when(F.col("__mc") != F.col("__pc"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("n_violations"),
        )
    )
    frames = [
        viol(
            "mixture_copy_bounds",
            per_doc,
            (F.col("n_copies") < F.col("__base"))
            | (F.col("n_copies") > F.col("__base") + 1)
            | (F.col("max_copy") != F.col("n_copies")),
        ),
        viol(
            "epoch_permutation",
            epstats,
            (F.col("n") != F.col("__m"))
            | (F.col("nd") != F.col("__m"))
            | (F.col("ndk") != F.col("__m"))
            | (F.col("mn") != 1)
            | (F.col("mx") != F.col("__m")),
        ),
        seed_cmp,
        viol(
            "packed_only_admitted",
            packed.select(
                F.expr(f"doc_id div {stride}").alias("doc_id")
            ).join(train.select("doc_id"), "doc_id", "left_anti"),
        ),
        viol(
            "bin_offset_consistency",
            packed,
            F.col("bin") != F.expr("start_tok div 256"),
        ),
        lossless,
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


_TRAINING_MANIFEST_ORACLE = """
    select invariant, n_violations::bigint as n_violations
    from (values
        ('mixture_copy_bounds', 0),
        ('epoch_permutation', 0),
        ('epoch_orders_differ', 0),
        ('packed_only_admitted', 0),
        ('bin_offset_consistency', 0),
        ('manifest_lossless', 0)
    ) t(invariant, n_violations)
"""


def q_bpe_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TOKENIZER-AWARE trainer tail (VERDICT r07 #4): the same
    clean-corpus -> mixture -> replicated packing -> manifest -> epoch
    chain as ``training_manifest``, but the shards carry TRAINED-BPE
    token-id runs (``build_training_manifest(tokenizer_word_frame=...)``
    routes packing through ``bpe.bpe_pack``) — the batch twin of
    ``stream_corpus_ingest``'s tokenizer mode, closing the last seam in
    the raw-text -> trained tokenizer -> shards -> manifest chain.

    Folded into violation counts; the oracle is the invariant CONTRACT
    (constant all-zeros). Beyond ``training_manifest``'s six, four
    tokenizer-specific invariants tie the payload to the trained model:
    ``token_parity`` (each replicated doc's packed token total equals the
    base doc's independent ``bpe_segment_stats`` count — segmentation and
    packing agree), ``all_copies_packed`` (every mixture copy produced
    chunks: the training-corpus vocabulary covers the train split, so
    ``bpe_pack``'s unseen-word exclusion must fire zero times),
    ``ids_in_vocab`` (every packed id parses and falls in
    [0, |vocabulary|)), and ``chunk_token_budget``."""
    from credit_abs_oltp_to_mart_spark.operators import bpe
    from credit_abs_oltp_to_mart_spark.operators.curation import (
        WEIGHT_FP_SCALE,
    )
    from credit_abs_oltp_to_mart_spark.plans.corpus import (
        build_training_manifest,
    )

    stride = 64
    docs = _t(spark, sf_dir, "documents")
    # deferred tokenizer training: build_training_manifest trains it on a
    # driver thread while the corpus-cleaning chain runs its eager dedup
    # work (guide §2.6), and needs it only at the packing step
    stages = build_training_manifest(
        docs,
        copy_id_stride=stride,
        tokenizer_word_frame=lambda: bpe.bpe_train(
            docs, n_merges=BPE_MERGES
        )[1],
    )
    wf = stages["tokenizer_wf"]
    n_vocab = bpe.vocab_frame(wf).count()
    train = stages["train"]
    weights, mixture = stages["weights"], stages["mixture"].persist()
    packed, manifest = stages["packed_mix"].persist(), stages["manifest"]
    epochs = stages["epochs"].persist()

    def viol(name: str, df: DataFrame, cond=None) -> DataFrame:
        src = df.where(cond) if cond is not None else df
        return src.agg(
            F.count(F.lit(1)).cast("long").alias("n_violations")
        ).select(F.lit(name).alias("invariant"), "n_violations")

    f_u = F.floor(
        F.col("sample_factor") * WEIGHT_FP_SCALE + F.lit(0.5)
    ).cast("bigint")
    base = (f_u / WEIGHT_FP_SCALE).cast("bigint")
    per_doc = (
        mixture.groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.max("copy_no").alias("max_copy"),
        )
        .join(F.broadcast(weights.select("lang", "sample_factor")), "lang")
        .withColumn("__base", base)
    )
    mcount = manifest.agg(F.count(F.lit(1)).alias("__m"))
    epstats = (
        epochs.groupBy("epoch")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("read_order").alias("nd"),
            F.countDistinct("shard", "bin").alias("ndk"),
            F.min("read_order").alias("mn"),
            F.max("read_order").alias("mx"),
        )
        .crossJoin(F.broadcast(mcount))
    )
    e0 = epochs.where(F.col("epoch") == 0).select(
        "shard", "bin", F.col("read_order").alias("o0")
    )
    e1 = epochs.where(F.col("epoch") == 1).select(
        "shard", "bin", F.col("read_order").alias("o1")
    )
    seed_cmp = (
        e0.join(e1, ["shard", "bin"])
        .agg(
            F.sum(
                F.when(F.col("o0") != F.col("o1"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("__ndiff")
        )
        .select(
            F.lit("epoch_orders_differ").alias("invariant"),
            F.when(F.col("__ndiff") == 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("n_violations"),
        )
    )
    lossless = (
        manifest.agg(F.sum("n_chunks").alias("__mc"))
        .crossJoin(F.broadcast(packed.agg(F.count(F.lit(1)).alias("__pc"))))
        .select(
            F.lit("manifest_lossless").alias("invariant"),
            F.when(F.col("__mc") != F.col("__pc"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("n_violations"),
        )
    )
    # tokenizer invariants: packing must agree with an INDEPENDENT
    # segmentation pass (bpe_segment_stats joins the broadcast word
    # frame, no shared lineage with bpe_pack's tokenize)
    seg = bpe.bpe_segment_stats(train.select("doc_id", "text"), wf)
    per_copy = packed.groupBy("doc_id").agg(
        F.sum("n_tokens").alias("__packed_toks")
    )
    parity = (
        per_copy.withColumn(
            "__base_doc", F.expr(f"doc_id div {stride}")
        )
        .join(
            seg.select(
                F.col("doc_id").alias("__base_doc"), "n_bpe_tokens"
            ),
            "__base_doc",
        )
    )
    copies_packed = (
        mixture.agg(F.count(F.lit(1)).alias("__n_copies"))
        .crossJoin(
            F.broadcast(
                per_copy.agg(F.count(F.lit(1)).alias("__n_packed_docs"))
            )
        )
        .select(
            F.lit("all_copies_packed").alias("invariant"),
            F.when(
                F.col("__n_copies") != F.col("__n_packed_docs"), F.lit(1)
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("n_violations"),
        )
    )
    ids = F.expr("transform(split(chunk_ids, ' '), x -> cast(x as int))")
    frames = [
        viol(
            "mixture_copy_bounds",
            per_doc,
            (F.col("n_copies") < F.col("__base"))
            | (F.col("n_copies") > F.col("__base") + 1)
            | (F.col("max_copy") != F.col("n_copies")),
        ),
        viol(
            "epoch_permutation",
            epstats,
            (F.col("n") != F.col("__m"))
            | (F.col("nd") != F.col("__m"))
            | (F.col("ndk") != F.col("__m"))
            | (F.col("mn") != 1)
            | (F.col("mx") != F.col("__m")),
        ),
        seed_cmp,
        viol(
            "packed_only_admitted",
            packed.select(
                F.expr(f"doc_id div {stride}").alias("doc_id")
            ).join(train.select("doc_id"), "doc_id", "left_anti"),
        ),
        viol(
            "bin_offset_consistency",
            packed,
            F.col("bin") != F.expr("start_tok div 256"),
        ),
        lossless,
        viol(
            "token_parity",
            parity,
            F.col("__packed_toks") != F.col("n_bpe_tokens"),
        ),
        copies_packed,
        viol(
            "ids_in_vocab",
            packed,
            F.exists(
                ids,
                lambda i: i.isNull() | (i < 0) | (i >= F.lit(n_vocab)),
            ),
        ),
        viol("chunk_token_budget", packed, F.col("n_tokens") > 64),
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


_BPE_TRAINING_MANIFEST_ORACLE = """
    select invariant, n_violations::bigint as n_violations
    from (values
        ('mixture_copy_bounds', 0),
        ('epoch_permutation', 0),
        ('epoch_orders_differ', 0),
        ('packed_only_admitted', 0),
        ('bin_offset_consistency', 0),
        ('manifest_lossless', 0),
        ('token_parity', 0),
        ('all_copies_packed', 0),
        ('ids_in_vocab', 0),
        ('chunk_token_budget', 0)
    ) t(invariant, n_violations)
"""


_CORPUS_PIPELINE_ORACLE = """
    select invariant, n_violations::bigint as n_violations
    from (values
        ('stage_monotonicity', 0),
        ('filter_gate', 0),
        ('exact_dup_survivors', 0),
        ('near_dup_survivors', 0),
        ('eval_contamination', 0),
        ('chunk_token_budget', 0),
        ('packed_train_only', 0),
        ('bin_offset_consistency', 0)
    ) t(invariant, n_violations)
"""


DSIR_TOPK = 150


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): score every document under
    a target-vs-raw hashed-feature likelihood-ratio surrogate (target =
    the English slice, raw = the whole corpus; 256 md5 buckets, add-one
    smoothing, the repo's exact fixed-point linear surrogate for the
    log-ratio) and flag the deterministic top-k. ONE corpus scan fits
    both models (dual conditional aggregation to 256 bucket rows,
    codebook collect —
    and the evidence division runs in PYTHON bigints, so the BM25-class
    int64 ceiling never arises); scoring is a broadcast-map lookup + one
    per-doc shuffle; top-k is TakeOrdered + a broadcast semi-join.

    Round-10 extension (same oracle, no new contract entry): the
    SAMPLED variant — Gumbel-top-k importance resampling via the
    hash-Gumbel key dsir_score + gumbel_noise_table()[md5(seed:doc_id)
    mod 256] (fixed-point quantile-discretized Gumbel noise, identical
    integer table embedded in the oracle SQL) — adds gumbel_key and
    is_sampled columns, deterministic in (seed, doc_id)."""
    from credit_abs_oltp_to_mart_spark.operators import dsir

    docs = _t(spark, sf_dir, "documents")
    return dsir.dsir_select(
        docs, F.col("lang") == "en", DSIR_TOPK, gumbel_k=DSIR_TOPK
    )


def _dsir_select_oracle(k: int = DSIR_TOPK) -> str:
    from credit_abs_oltp_to_mart_spark.operators.dsir import (
        DSIR_BUCKETS,
        DSIR_SCALE,
        GUMBEL_RESOLUTION,
        gumbel_noise_table,
    )

    B, S = DSIR_BUCKETS, DSIR_SCALE
    # the SAME Python-computed fixed-point Gumbel table the Spark plan
    # embeds as literals — both engines consume identical integers
    res = GUMBEL_RESOLUTION
    gt_list = ", ".join(str(int(g)) for g in gumbel_noise_table(res))
    return f"""
    with tok as materialized (
      select doc_id, lang,
             ('0x' || substr(md5(word), 1, 15))::bigint % {B} as bucket
      from (select doc_id, lang,
                   unnest(string_split_regex(trim(text), ' +')) as word
            from documents where trim(text) <> '')),
    b as (select unnest(generate_series(0, {B} - 1)) as bucket),
    tc as (select bucket, count(*)::bigint as cnt from tok
           where lang = 'en' group by 1),
    rc as (select bucket, count(*)::bigint as cnt from tok group by 1),
    tt as (select count(*)::bigint + {B} as t from tok where lang = 'en'),
    rt as (select count(*)::bigint + {B} as t from tok),
    ev as (select b.bucket,
             (2 * {S} * (coalesce(tc.cnt, 0) + 1) + tt.t) // (2 * tt.t)
           - (2 * {S} * (coalesce(rc.cnt, 0) + 1) + rt.t) // (2 * rt.t)
             as s
           from b left join tc using (bucket)
                  left join rc using (bucket), tt, rt),
    sc as (select t.doc_id, count(*)::int as n_feats,
                  sum(ev.s)::bigint as dsir_score
           from tok t join ev using (bucket) group by 1),
    alls as (select d.doc_id, coalesce(sc.n_feats, 0)::int as n_feats,
                    coalesce(sc.dsir_score, 0)::bigint as dsir_score
             from documents d left join sc using (doc_id)),
    topk as (select doc_id from alls
             order by dsir_score desc, doc_id asc limit {k}),
    gt(g) as (select [{gt_list}]),
    keyed as (select a.doc_id, a.n_feats, a.dsir_score,
                     a.dsir_score + g.g[1 + (('0x' ||
                       substr(md5('dsir:' || a.doc_id::varchar), 1, 15)
                     )::bigint % {res})]::bigint as gumbel_key
              from alls a, gt g),
    samp as (select doc_id from keyed
             order by gumbel_key desc, doc_id asc limit {k})
    select kk.doc_id, kk.n_feats, kk.dsir_score,
           (t.doc_id is not null)::int as is_selected,
           kk.gumbel_key,
           (sm.doc_id is not null)::int as is_sampled
    from keyed kk left join topk t using (doc_id)
                  left join samp sm using (doc_id)
    """


BFS_MAX_HOPS = 12


def q_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS shortest paths from customer 0 over the same deterministic
    2-out directed graph the pagerank contract uses (dst = (7*id+3) % n
    and (13*id+5) % n) — hop distances are exact integers, -1 =
    unreachable within {BFS_MAX_HOPS} hops (at sf0.1 n = 15000 > 2^12
    frontier reach, so the unreached branch is exercised). Oracle: a
    depth-bounded recursive CTE + min(dist)."""
    from credit_abs_oltp_to_mart_spark.operators.graph_paths import (
        bfs_distances,
    )

    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id")
    )
    n = cust.count()
    edges = cust.select(
        F.col("id").alias("src"), ((F.col("id") * 7 + 3) % n).alias("dst")
    ).unionByName(
        cust.select(
            F.col("id").alias("src"),
            ((F.col("id") * 13 + 5) % n).alias("dst"),
        )
    )
    return bfs_distances(edges, cust, [0], max_hops=BFS_MAX_HOPS)


def _graph_bfs_oracle(max_hops: int = BFS_MAX_HOPS) -> str:
    return f"""
    with recursive v as (select c_custkey as id from customer),
    nn as (select count(*) as n from customer),
    e as (select id as src, (id * 7 + 3) % n as dst from v, nn
          union all
          select id, (id * 13 + 5) % n from v, nn),
    walk(id, dist) as (
        select 0::bigint as id, 0 as dist
        union
        select e.dst, w.dist + 1
        from walk w join e on w.id = e.src
        where w.dist < {max_hops}
    ),
    d as (select id, min(dist)::int as dist from walk group by 1)
    select v.id, coalesce(d.dist, -1)::int as dist
    from v left join d using (id)
    """


# ---------------------------------------------------------------------------
# Contract surface
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the month-end-snapshot pattern (W1+F1 — the reference's
    analytical heart; every roll/cure/vintage mart starts here) over the
    sf0.001 events table. (sf0.001 spans a single month, so the lag-based
    roll-rate variant would be legitimately empty; this stage returns rows.)"""
    return q_month_end_snapshot(spark, SF_SMOKE)


# documented one-round aging waivers, read by tools/window_order.py
# --check: a query listed here may sit outside the first-50 driver gate
# window for ONE round despite missing/expiring evidence — the waiver
# states why and names the newest CORRECTNESS round it was granted
# under; the tool EXPIRES a waiver automatically once a newer round's
# artifact lands, so the next round cannot silently inherit it
_R14_DISPLACED = (
    "displaced for one round by the r14 changed-query re-proof (VERDICT"
    " r13 #2: 40 queries changed in the r13 optimization phase or in r14"
    " outrank age-only rotation); this query's code path is UNCHANGED"
    " since its r11 gate + r10-r12 plan audits, and the local DuckDB"
    " mirrors at the r14 HEAD are 150/150 hash-exact at sf0.01 and sf0.1"
)
WINDOW_AGING_EXCEPTIONS: dict = {
    name: {"granted_at_round": 13, "reason": _R14_DISPLACED}
    for name in (
        "dup_spans", "dup_spans_removed", "value_histogram", "ewma",
        "rolling_distinct_users", "correlated_subquery", "exists_subquery",
        "window_ignore_nulls", "vintage_mob", "cure_rate",
        "dedup_embedding_lsh", "stg_projection", "bucket_case",
        "conditional_agg", "filter_scan", "join_dim_agg", "anti_join",
        "semi_join", "month_end_snapshot", "coalesce_nullif_arith",
        "audio_near_dups",
    )
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # === PRIORITY ORDER: the driver's gate checks the FIRST 50
        # entries in registration order. Round-14 window: every query
        # whose code path CHANGED in the r13 optimization phase
        # (6ff65cb..71940d4) or in r14 and whose newest driver
        # evidence predates the change (VERDICT r13 #2) — 40 queries,
        # grouped below by evidence age — plus the 10 oldest-evidence
        # unchanged r11 queries. 21 unchanged r11-evidence queries are
        # displaced for one round under documented waivers
        # (WINDOW_AGING_EXCEPTIONS above; local both-SF mirrors are
        # 150/150 hash-exact at this HEAD). Run
        # `python tools/window_order.py --check` before committing any
        # registration change. ===
        # --- # changed; evidence r11 ---
        "profile_stats": q_profile_stats,
        "ann_quantized_ivf": q_ann_quantized_ivf,
        "kmeans": q_kmeans,
        "ann_ivf_trained": q_ann_ivf_trained,
        "corpus_pipeline": q_corpus_pipeline,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_clusters": q_dedup_clusters,
        "decontaminate": q_decontaminate,
        "bpe_training_manifest": q_bpe_training_manifest,
        "ann_pq_refine": q_ann_pq_refine,
        "bm25_topk": q_bm25_topk,
        "stream_pq_ingest": q_stream_pq_ingest,
        "stream_vocab_refresh": q_stream_vocab_refresh,
        "unigram_train": q_unigram_train,
        "ann_pq": q_ann_pq,
        "ann_pq_residual": q_ann_pq_residual,
        "ann_index_serve": q_ann_index_serve,
        "epoch_shuffle": q_epoch_shuffle,
        # --- # changed; evidence r12 ---
        "semantic_dedup_hier": q_semantic_dedup_hier,
        "hybrid_rank_fusion": q_hybrid_fusion,
        "bm25_serve": q_bm25_serve,
        "bpe_merges": q_bpe_merges,
        "bpe_segment": q_bpe_segment,
        "bpe_pack": q_bpe_pack,
        "stream_bpe_ingest": q_stream_bpe_ingest,
        "stream_dedup_ingest": q_stream_dedup_ingest,
        "stream_postings_ingest": q_stream_postings_ingest,
        "decontaminate_store": q_decontaminate_store,
        "dedup_incremental": q_dedup_incremental,
        "simhash": q_simhash,
        "simhash_pairs": q_simhash_pairs,
        # --- # changed; evidence r13 ---
        "training_manifest": q_training_manifest,
        "stream_corpus_ingest": q_stream_corpus_ingest,
        "stream_corpus_vocab_ingest": q_stream_corpus_vocab_ingest,
        "stream_ann_ingest": q_stream_ann_ingest,
        "semantic_dedup": q_semantic_dedup,
        "semantic_dedup_soft": q_semantic_dedup_soft,
        "semantic_dedup_hier_soft": q_semantic_dedup_hier_soft,
        "ann_ivf": q_ann_ivf,
        # --- # unchanged r11 (expiring) ---
        "nullsafe_join": q_nullsafe_join,
        "retention_cohorts": q_retention_cohorts,
        "bitmap_distinct": q_bitmap_distinct,
        "grouping_sets_revenue": q_grouping_sets_revenue,
        "dedup_exact": q_dedup_exact,
        "triangle_count": q_triangle_count,
        "udtf_sentences": q_udtf_sentences,
        "dup_spans_keep_first": q_dup_spans_keep_first,
        "pii_redact": q_pii_redact,
        "bigram_fluency": q_bigram_fluency,
        # ---- driver gate window (50) ends here ----
        "perplexity_filter": q_perplexity_filter,
        "dsir_select": q_dsir_select,
        "graph_bfs": q_graph_bfs,
        "token_freq_stats": q_token_freq_stats,
        "roll_rate": q_roll_rate,
        "unigram_segment": q_unigram_segment,
        "sessionize": q_sessionize,
        "reconcile_waterfall": q_reconcile_waterfall,
        "stream_sessionize": q_stream_sessionize,
        "generator_invariants": q_generator_invariants,
        "dedup_embedding": q_dedup_embedding,
        "variant_extract": q_variant_extract,
        "try_arithmetic": q_try_arithmetic,
        "ann_brute_force": q_ann_brute_force,
        "ann_lsh": q_ann_lsh,
        "embedding_quantize": q_embedding_quantize,
        "ann_quantized": q_ann_quantized,
        "multimodal_meta": q_multimodal_meta,
        "multimodal_features": q_multimodal_features,
        "multimodal_frames": q_multimodal_frames,
        "lang_id": q_lang_id,
        "text_quality": q_text_quality,
        "token_counts": q_token_counts,
        "fingerprints": q_fingerprints,
        "text_repetition": q_text_repetition,
        "split_assign": q_split_assign,
        "stratified_sample": q_stratified_sample,
        "doc_chunks": q_doc_chunks,
        "tfidf_topk": q_tfidf_topk,
        "pii_scan": q_pii_scan,
        "weighted_sample": q_weighted_sample,
        "interval_join_agg": q_interval_join_agg,
        "hypertable_rollup": q_hypertable_rollup,
        "scd2_changelog": q_scd2_changelog,
        "kmv_distinct": q_kmv_distinct,
        "video_near_dups": q_video_near_dups,
        "window_frames": q_window_frames,
        "unpivot_measures": q_unpivot_measures,
        "array_hof": q_array_hof,
        "map_explode": q_map_explode,
        "array_agg_sorted": q_array_agg_sorted,
        "token_positions": q_token_positions,
        "dup_spans": q_dup_spans,
        "dup_spans_removed": q_dup_spans_removed,
        "value_histogram": q_value_histogram,
        "ewma": q_ewma,
        "rolling_distinct_users": q_rolling_distinct_users,
        "correlated_subquery": q_correlated_subquery,
        "exists_subquery": q_exists_subquery,
        "window_ignore_nulls": q_window_ignore_nulls,
        "vintage_mob": q_vintage_mob,
        "cure_rate": q_cure_rate,
        "dedup_embedding_lsh": q_dedup_embedding_lsh,
        "stg_projection": q_stg_projection,
        "bucket_case": q_bucket_case,
        "conditional_agg": q_conditional_agg,
        "filter_scan": q_filter_scan,
        "join_dim_agg": q_join_dim_agg,
        "anti_join": q_anti_join,
        "semi_join": q_semi_join,
        "month_end_snapshot": q_month_end_snapshot,
        "coalesce_nullif_arith": q_coalesce_nullif_arith,
        "audio_near_dups": q_audio_near_dups,
        "asof_join": q_asof_join,
        "cube_revenue": q_cube_revenue,
        "grouped_pandas_stats": q_grouped_pandas_stats,
        "grouped_pandas_wavg": q_grouped_pandas_wavg,
        "json_extract": q_json_extract,
        "pagerank": q_pagerank,
        "pivot_monthly": q_pivot_monthly,
        "pricing_summary": q_pricing_summary,
        "range_window": q_range_window,
        "region_revenue": q_region_revenue,
        "rollup_revenue": q_rollup_revenue,
        "running_total": q_running_total,
        "set_ops": q_set_ops,
        "skew_salted_agg": q_skew_salted_agg,
        "stream_distinct_keys": q_stream_distinct_keys,
        "stream_enriched_agg": q_stream_enriched_agg,
        "stream_session_window": q_stream_session_window,
        "stream_stream_join": q_stream_stream_join,
        "stream_windowed_agg": q_stream_windowed_agg,
        "top_revenue_orders": q_top_revenue_orders,
        "topk_per_group": q_topk_per_group,
        "value_percentiles": q_value_percentiles,
        "window_variety": q_window_variety,
        "image_near_dups": q_image_near_dups,
        "quality_classifier": q_quality_classifier,
        "mixture_weights": q_mixture_weights,
        "pack_chunks": q_pack_chunks,
        "mixture_apply": q_mixture_apply,
        "pack_manifest": q_pack_manifest,
        "cdc_upsert": q_cdc_upsert,
        "gap_fill_daily": q_gap_fill_daily,
        "full_outer_recon": q_full_outer_recon,
        "fuzzy_name_match": q_fuzzy_name_match,
        "funnel_stages": q_funnel_stages,
        "median_mode": q_median_mode,
        "cluster_sample": q_cluster_sample,
        "token_budget_sample": q_token_budget_sample,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "stg_projection": """
            select l_orderkey::bigint as order_id, l_linenumber::int as line_no,
                   cast(l_quantity as int) as qty, l_extendedprice::double as price,
                   cast(l_shipdate as date) as ship_date
            from lineitem
        """,
        "bucket_case": """
            select case when l_quantity <= 0 then '0'
                        when l_quantity between 1 and 10 then '1-10'
                        when l_quantity between 11 and 25 then '11-25'
                        when l_quantity between 26 and 40 then '26-40'
                        else '40+' end as qty_bucket,
                   count(*) as n_lines,
                   cast(sum(cast(l_extendedprice as decimal(18,2))) as double) as sum_price
            from lineitem group by 1
        """,
        "conditional_agg": """
            with a as (
              select o_orderpriority, count(*) as n_orders,
                     count(*) filter (where o_orderstatus = 'F') as n_finished,
                     cast(sum(case when o_orderstatus = 'F'
                                   then cast(o_totalprice as decimal(18,2))
                                   else cast(0 as decimal(18,2)) end) as double) as finished_value
              from orders group by 1)
            select o_orderpriority, n_orders, n_finished, finished_value,
                   case when n_orders = 0 then null
                        else n_finished::double / n_orders::double end as finished_ratio
            from a
        """,
        "filter_scan": """
            select l_orderkey, l_linenumber, l_quantity
            from lineitem
            where l_shipdate >= date '1995-01-01' and l_shipdate < date '1996-01-01'
              and l_discount > 0.05
        """,
        "join_dim_agg": """
            select cast(date_trunc('month', o_orderdate) as date) as month,
                   c_mktsegment as segment,
                   cast(sum(cast(o_totalprice as decimal(18,2))) as double) as revenue,
                   count(*) as n_orders
            from orders join customer on o_custkey = c_custkey
            group by 1, 2
        """,
        "anti_join": """
            select o_orderstatus, count(*) as n_orders
            from orders o
            where not exists (select 1 from customer c
                              where c.c_custkey = o.o_custkey and c.c_acctbal >= 0)
            group by 1
        """,
        "semi_join": """
            select o_orderstatus, count(*) as n_orders
            from orders o
            where exists (select 1 from lineitem l
                          where l.l_orderkey = o.o_orderkey and l.l_quantity >= 49)
            group by 1
        """,
        "month_end_snapshot": f"""
            select user_id, month, event_id, event_type, value
            from ({_MONTH_END_ORACLE}) me
        """,
        "roll_rate": f"""
            select week, prev_type, curr_type, count(*) as n_users
            from ({_TRANSITIONS_WEEKLY_ORACLE}) t
            where prev_type is not null
            group by 1, 2, 3
        """,
        "cure_rate": f"""
            with t as ({_TRANSITIONS_DAILY_ORACLE})
            select day,
                   count(*) filter (where prev_type = 'error') as prev_bad_cnt,
                   count(*) filter (where prev_type = 'error'
                                    and curr_type = 'purchase') as recovered_cnt,
                   (count(*) filter (where prev_type = 'error'
                                     and curr_type = 'purchase'))::double
                     / nullif(count(*) filter (where prev_type = 'error'), 0)::double
                     as recovery_rate
            from t where prev_type is not null group by 1
        """,
        "vintage_mob": """
            with fs as (select o_custkey, min(cast(o_orderdate as date)) as first_date
                        from orders group by 1),
            base as (
              select cast(date_trunc('quarter', first_date) as date) as cohort_q,
                     ((date_part('year', o_orderdate) - date_part('year', first_date)) * 12
                      + (date_part('month', o_orderdate) - date_part('month', first_date)))::int as mob,
                     case when o_totalprice > 150000 then 1 else 0 end as high_flag
              from orders join fs using (o_custkey)),
            agg as (
              select cohort_q, mob, count(*) as n_orders, sum(high_flag)::bigint as high_cnt
              from base where mob >= 0 group by 1, 2)
            select cohort_q, mob, n_orders, high_cnt,
                   high_cnt::double / nullif(n_orders, 0)::double as high_rate
            from agg
        """,
        "coalesce_nullif_arith": """
            select cast(date_trunc('month', ts) as date) as month,
                   cast(sum(coalesce(nullif(cast(value as decimal(18,2)),
                                            cast(0 as decimal(18,2))),
                                     cast(0 as decimal(18,2)))) as double) as total_value,
                   cast(sum(coalesce(case when event_type = 'purchase'
                                          then cast(value as decimal(18,2)) end,
                                     cast(0 as decimal(18,2)))
                            + cast(1 as decimal(18,2))) as double) as purchase_value_plus_n
            from events group by 1
        """,
        "pricing_summary": """
            with a as (
              select l_returnflag, l_linestatus,
                     cast(sum(cast(l_quantity as decimal(18,2))) as double) as sum_qty,
                     cast(sum(cast(l_extendedprice as decimal(18,2))) as double) as sum_base_price,
                     cast(sum(cast(cast(l_extendedprice as decimal(18,2))
                                   * (cast(1 as decimal(18,2)) - cast(l_discount as decimal(18,2)))
                                   as decimal(18,4))) as double) as sum_disc_price,
                     count(*) as count_order
              from lineitem where l_shipdate <= timestamp '1998-09-02 00:00:00'
              group by 1, 2)
            select l_returnflag, l_linestatus, sum_qty, sum_base_price, sum_disc_price,
                   sum_qty / count_order::double as avg_qty, count_order
            from a
        """,
        "top_revenue_orders": """
            select l_orderkey, cast(o_orderdate as date) as o_orderdate,
                   cast(sum(cast(cast(l_extendedprice as decimal(18,2))
                                 * (cast(1 as decimal(18,2)) - cast(l_discount as decimal(18,2)))
                                 as decimal(18,4))) as double) as revenue
            from lineitem
            join orders on l_orderkey = o_orderkey
            join customer on o_custkey = c_custkey
            where c_mktsegment = 'BUILDING'
              and o_orderdate < timestamp '1998-03-15 00:00:00'
              and l_shipdate > timestamp '1995-03-15 00:00:00'
            group by 1, 2
            order by revenue desc, l_orderkey asc
            limit 10
        """,
        "region_revenue": """
            select n_name as nation, r_name as region,
                   cast(sum(cast(cast(l_extendedprice as decimal(18,2))
                                 * (cast(1 as decimal(18,2)) - cast(l_discount as decimal(18,2)))
                                 as decimal(18,4))) as double) as revenue
            from lineitem
            join orders on l_orderkey = o_orderkey
            join supplier on l_suppkey = s_suppkey
            join customer on o_custkey = c_custkey
            join nation on c_nationkey = n_nationkey
            join region on n_regionkey = r_regionkey
            where c_nationkey = s_nationkey
            group by 1, 2
        """,
        "topk_per_group": """
            select p_brand, cast(rank as int) as rank, p_partkey, p_retailprice
            from (select p_brand, p_partkey, p_retailprice,
                         row_number() over (partition by p_brand
                                            order by p_retailprice desc, p_partkey asc) as rank
                  from part) x
            where rank <= 3
        """,
        "running_total": """
            select user_id, event_id,
                   cast(sum(cast(value as decimal(18,2)))
                          over (partition by user_id order by ts, event_id
                                rows between unbounded preceding and current row)
                        as double) as running_value
            from events
        """,
        "sessionize": """
            with flagged as (
              select user_id, event_id, ts,
                     case when epoch(ts) - epoch(lag(ts) over
                            (partition by user_id order by ts, event_id)) > 1800
                          then 1 else 0 end as new_session
              from events),
            sessions as (
              select user_id, event_id, ts,
                     (sum(new_session) over (partition by user_id order by ts, event_id
                                             rows between unbounded preceding
                                             and current row))::bigint as session_no
              from flagged)
            select user_id, session_no, count(*) as n_events,
                   min(ts) as session_start, max(ts) as session_end
            from sessions group by 1, 2
        """,
        "grouped_pandas_stats": """
            with ordered as (
              select user_id, value,
                     lag(value) over (partition by user_id
                                      order by ts, event_id) as prev_value
              from events)
            select user_id, count(*) as n_events,
                   count(*) filter (where value > prev_value) as n_increasing
            from ordered group by 1
        """,
        "grouped_pandas_wavg": """
            with b as (
              select l_returnflag,
                     cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)
                       as price_cents,
                     cast(cast(l_discount as decimal(18,4)) * 10000 as bigint)
                       as disc_bp
              from lineitem)
            select l_returnflag,
                   case when sum(price_cents) = 0 then null
                        else cast(sum(price_cents * disc_bp) as double)
                             / cast(sum(price_cents) as double) end
                     as wavg_discount_bp
            from b group by 1
        """,
        "reconcile_waterfall": """
            with s as (
              select o_custkey as cust_id, count(*)::int as n_installments,
                     sum(cast(round(o_totalprice * 100) as bigint))::bigint
                       as scheduled_cents
              from orders group by 1),
            p as (
              select user_id as cust_id, count(*)::int as n_payments,
                     sum(cast(round(value * 100) as bigint))::bigint as received_cents
              from events group by 1),
            cum as (
              select o_custkey as cust_id,
                     sum(cast(round(o_totalprice * 100) as bigint)) over (
                       partition by o_custkey
                       order by o_orderdate, o_orderkey
                       rows between unbounded preceding and current row)
                       as cum_due
              from orders),
            pif as (
              select cum.cust_id, count(*)::int as paid_in_full_cnt
              from cum join p using (cust_id)
              where cum.cum_due <= p.received_cents
              group by 1)
            select cust_id,
                   coalesce(s.n_installments, 0) as n_installments,
                   coalesce(p.n_payments, 0) as n_payments,
                   coalesce(s.scheduled_cents, 0) as scheduled_cents,
                   coalesce(p.received_cents, 0) as received_cents,
                   coalesce(pif.paid_in_full_cnt, 0) as paid_in_full_cnt,
                   coalesce(p.received_cents, 0)
                     - coalesce(s.scheduled_cents, 0) as residual_cents
            from s
            full outer join p using (cust_id)
            left join pif using (cust_id)
        """,
        "json_extract": """
            select event_type,
                   count(k) as n_with_k, sum(k)::bigint as k_total,
                   min(k) as k_min, max(k) as k_max
            from (select event_type, json_extract(props, '$.k')::int as k
                  from events) z
            group by 1
        """,
        "range_window": """
            select user_id, event_id,
                   cast(sum(cast(value as decimal(18,2))) over (
                          partition by user_id order by floor(epoch(ts))::bigint
                          range between 604800 preceding and current row)
                        as double) as trailing_7d_value
            from events
        """,
        "set_ops": """
            select o_custkey as custkey from orders
            intersect
            select c_custkey as custkey from customer where c_acctbal > 0
            except all
            select distinct o_custkey as custkey from orders where o_orderstatus = 'F'
        """,
        "asof_join": """
            with p as (select user_id, event_id as purchase_id, ts
                       from events where event_type = 'purchase'),
            c as (select user_id, ts, event_id as click_id, value::double as click_value
                  from events where event_type = 'click'),
            j as (select p.user_id, p.purchase_id, c.click_id, c.click_value,
                         row_number() over (partition by p.purchase_id
                                            order by c.ts desc, c.click_id desc) as rn
                  from p left join c on c.user_id = p.user_id and c.ts <= p.ts)
            select user_id, purchase_id, click_id, click_value
            from j where rn = 1
        """,
        "rollup_revenue": """
            select r_name as region, n_name as nation,
                   cast(sum(cast(o_totalprice as decimal(18,2))) as double) as revenue,
                   count(*) as n_orders
            from orders
            join customer on o_custkey = c_custkey
            join nation on c_nationkey = n_nationkey
            join region on n_regionkey = r_regionkey
            group by rollup(r_name, n_name)
        """,
        "cube_revenue": """
            select l_returnflag, l_linestatus,
                   grouping(l_returnflag, l_linestatus) as gid,
                   cast(sum(cast(l_extendedprice as decimal(18,2))) as double)
                     as revenue,
                   count(*) as n_rows
            from lineitem
            group by cube (l_returnflag, l_linestatus)
        """,
        "value_percentiles": """
            select event_type, count(*) as n,
                   quantile_cont(value, 0.5) as p50,
                   quantile_cont(value, 0.9) as p90,
                   quantile_cont(value, 0.99) as p99
            from events group by 1
        """,
        "window_variety": """
            select c_custkey, c_mktsegment as segment,
                   ntile(4) over w as quartile,
                   percent_rank() over w as pct_rank,
                   cume_dist() over w as cum_dist
            from customer
            window w as (partition by c_mktsegment
                         order by c_acctbal asc, c_custkey asc)
        """,
        "pivot_monthly": """
            select cast(date_trunc('month', ts) as date) as month,
                   cast(sum(case when event_type = 'click'
                                 then cast(value as decimal(18,2)) end) as double) as click,
                   cast(sum(case when event_type = 'error'
                                 then cast(value as decimal(18,2)) end) as double) as error,
                   cast(sum(case when event_type = 'purchase'
                                 then cast(value as decimal(18,2)) end) as double) as purchase,
                   cast(sum(case when event_type = 'signup'
                                 then cast(value as decimal(18,2)) end) as double) as signup,
                   cast(sum(case when event_type = 'view'
                                 then cast(value as decimal(18,2)) end) as double) as view
            from events group by 1
        """,
        "skew_salted_agg": """
            select event_type,
                   cast(sum(cast(value as decimal(18,2))) as double) as total_value,
                   count(*) as n_events,
                   min(ts) as first_ts, max(ts) as last_ts
            from events group by 1
        """,
        "stream_windowed_agg": """
            select cast(date_trunc('day', ts) as date) as day, event_type,
                   count(*) as n_events,
                   cast(sum(cast(value as decimal(18,2))) as double) as total_value
            from events group by 1, 2
        """,
        "stream_distinct_keys": """
            select distinct user_id, event_type, cast(ts as date) as day
            from events
        """,
        "stream_enriched_agg": """
            select cast(date_trunc('day', ts) as date) as day,
                   c_mktsegment as mktsegment,
                   count(*) as n_events,
                   cast(sum(cast(value as decimal(18,2))) as double) as total_value
            from events e join customer c on e.user_id = c.c_custkey
            group by 1, 2
        """,
        "stream_sessionize": """
            with flagged as (
              select user_id, event_id, ts,
                     case when epoch(ts) - epoch(lag(ts) over
                            (partition by user_id order by ts, event_id)) > 1800
                          then 1 else 0 end as new_session
              from events),
            sessions as (
              select user_id, event_id, ts,
                     (sum(new_session) over (partition by user_id order by ts, event_id
                                             rows between unbounded preceding
                                             and current row))::bigint as session_no
              from flagged)
            select user_id, session_no, count(*) as n_events,
                   min(ts) as session_start, max(ts) as session_end
            from sessions group by 1, 2
        """,
        "dedup_exact": """
            select md5(lower(regexp_replace(trim(text), ' +', ' ', 'g'))) as content_key,
                   min(doc_id) as canonical_doc_id, count(*) as n_docs
            from documents group by 1
        """,
        "dedup_ngram_jaccard": _JACCARD_PAIRS_SQL,
        "dedup_minhash_lsh": _minhash_oracle(),
        "dedup_clusters": f"""
            with recursive {_SHINGLES_CTE},
            ex as (select doc_id, unnest(shingles) as shingle from sh),
            sizes as (select doc_id, len(shingles) as n from sh),
            cpairs as (
              select a.doc_id as doc_a, b.doc_id as doc_b, count(*) as n_shared
              from ex a join ex b using (shingle)
              where a.doc_id < b.doc_id
              group by 1, 2),
            jpairs as (
              select doc_a, doc_b from (
                select doc_a, doc_b,
                       round(n_shared::double / (sa.n + sb.n - n_shared), 6)
                         as jaccard
                from cpairs
                join sizes sa on sa.doc_id = doc_a
                join sizes sb on sb.doc_id = doc_b) z
              where jaccard >= {JACCARD_THRESHOLD}),
            e as (
              select doc_a as src, doc_b as dst from jpairs
              union all
              select doc_b, doc_a from jpairs),
            reach(v, s) as (
              select doc_id, doc_id from documents
              union
              select e.dst, r.s
              from reach r join e on r.v = e.src
              where r.s < e.dst),
            comp as (
              select v as doc_id, min(s) as component_id from reach group by 1)
            select doc_id, component_id,
                   count(*) over (partition by component_id) as cluster_size
            from comp
        """,
        "simhash": _simhash_oracle(),
        "dedup_incremental": _incremental_minhash_oracle(),
        "stream_dedup_ingest": _stream_dedup_ingest_oracle(),
        "stream_corpus_ingest": _stream_corpus_ingest_oracle(),
        "simhash_pairs": f"""
            with fp as ({_simhash_oracle()}),
            banded as (
              select doc_id, simhash, t.b,
                     (simhash >> (15 * t.b)) & 32767 as band
              from fp, (values (0), (1), (2), (3)) t(b)),
            cand as (
              select distinct a.doc_id as doc_a, b2.doc_id as doc_b,
                     a.simhash as sa, b2.simhash as sb
              from banded a
              join banded b2 on a.b = b2.b and a.band = b2.band
              where a.doc_id < b2.doc_id)
            select doc_a, doc_b, bit_count(xor(sa, sb))::int as hamming
            from cand where bit_count(xor(sa, sb)) <= 3
        """,
        "dedup_embedding": _emb_near_dup_oracle(),
        "generator_invariants": _GENERATOR_INVARIANTS_ORACLE,
        "corpus_pipeline": _CORPUS_PIPELINE_ORACLE,
        "dedup_embedding_lsh": f"""
            with base as (select vec_id, embedding::DOUBLE[] as v
                          from embeddings),
            b as (
              {" union all ".join(
                  f'''select vec_id, v,
                      {si * (1 << LSH_PLANES)}
                        + {_lsh_bucket_expr("v", seed=42 + si)} as bucket
                      from base'''
                  for si in range(LSH_SEEDS)
              )}),
            cand as (
              select distinct a.vec_id as id_a, b2.vec_id as id_b
              from b a join b b2
                on a.bucket = b2.bucket and a.vec_id < b2.vec_id)
            select id_a, id_b, cosine from (
              select id_a, id_b,
                     {_COSINE.format(a="va.v", b="vb.v")} as cosine
              from cand
              join base va on va.vec_id = id_a
              join base vb on vb.vec_id = id_b) z
            where cosine >= {EMB_NEAR_DUP_THRESHOLD}
        """,
        "ann_brute_force": _ann_brute_oracle(),
        "ann_lsh": _ann_lsh_oracle(),
        "ann_ivf": _ann_ivf_oracle(),
        "ann_ivf_trained": _ann_ivf_trained_oracle(),
        "ann_quantized_ivf": _ann_quantized_ivf_oracle(),
        # serving from the persisted index must be bit-identical to the
        # in-plan quantized search — the SAME replay gates both
        "ann_index_serve": _ann_quantized_ivf_oracle(),
        "bpe_merges": _bpe_merges_oracle(),
        "bigram_fluency": _bigram_fluency_oracle(),
        "bm25_topk": _bm25_topk_oracle(),
        "bm25_serve": _bm25_serve_oracle(),
        "hybrid_rank_fusion": _hybrid_fusion_oracle(),
        "stream_postings_ingest": _stream_postings_ingest_oracle(),
        "bpe_segment": _bpe_segment_oracle(),
        "bpe_pack": _bpe_pack_oracle(),
        "quality_classifier": _quality_classifier_oracle(),
        "semantic_dedup": _semantic_dedup_oracle(),
        "semantic_dedup_soft": _semantic_dedup_soft_oracle(),
        "semantic_dedup_hier": _semantic_dedup_hier_oracle(),
        "semantic_dedup_hier_soft": _semantic_dedup_hier_soft_oracle(),
        "ann_pq": _ann_pq_oracle(),
        "ann_pq_residual": _ann_pq_residual_oracle(),
        "ann_pq_refine": _ann_pq_refine_oracle(),
        "video_near_dups": _video_near_dups_oracle(),
        "audio_near_dups": _audio_near_dups_oracle(),
        "unigram_train": _unigram_oracle(),
        "unigram_segment": _unigram_segment_oracle(),
        "perplexity_filter": _perplexity_filter_oracle(),
        "dsir_select": _dsir_select_oracle(),
        "graph_bfs": _graph_bfs_oracle(),
        "training_manifest": _TRAINING_MANIFEST_ORACLE,
        "bpe_training_manifest": _BPE_TRAINING_MANIFEST_ORACLE,
        "epoch_shuffle": f"""
            with p as ({_pack_chunks_oracle()}),
            mf as (select shard, bin, sum(n_tokens)::bigint as filled_tokens
                   from p group by 1, 2),
            e as (select s.epoch, mf.shard, mf.bin, mf.filled_tokens,
                         ('0x' || substr(md5('epoch:' || s.epoch::varchar
                            || ':' || mf.shard::varchar
                            || ':' || mf.bin::varchar), 1, 15))::bigint as k
                  from mf, (values (0), (1)) s(epoch))
            select epoch::int as epoch,
                   row_number() over (partition by epoch
                                      order by k, shard, bin)::bigint
                     as read_order,
                   shard, bin, filled_tokens
            from e
        """,
        "stream_ann_ingest": _stream_ann_ingest_oracle(),
        "stream_vocab_refresh": _stream_vocab_refresh_oracle(),
        "stream_corpus_vocab_ingest": _stream_corpus_vocab_ingest_oracle(),
        "stream_pq_ingest": _stream_pq_ingest_oracle(),
        "stream_bpe_ingest": _stream_bpe_ingest_oracle(),
        "multimodal_meta": _multimodal_meta_oracle(),
        "multimodal_features": _multimodal_features_oracle(),
        "multimodal_frames": _multimodal_frames_oracle(),
        "image_near_dups": _image_near_dups_oracle(),
        "lang_id": _lang_id_oracle(),
        "text_quality": _quality_oracle(),
        "token_counts": _token_counts_oracle(),
        "fingerprints": _fingerprint_oracle(),
        "text_repetition": """
            with nz as (
              select doc_id, string_split_regex(trim(text), ' +') as tk
              from documents where trim(text) <> ''),
            t as (select doc_id, unnest(tk) as tok from nz),
            ts as (select doc_id, count(*) as n_tokens,
                          count(distinct tok) as n_distinct
                   from t group by 1),
            g as (select doc_id, tk[i] || ' ' || tk[i+1] as gram
                  from nz, unnest(generate_series(1, len(tk) - 1)) as s(i)
                  where len(tk) >= 2),
            gc as (select doc_id, gram, count(*) as c from g group by 1, 2),
            gs as (select doc_id, max(c) as max_c, sum(c) as total_grams
                   from gc group by 1)
            select d.doc_id,
                   coalesce(ts.n_tokens, 0) as n_tokens,
                   round(ts.n_distinct::double / ts.n_tokens, 6)
                     as distinct_token_ratio,
                   round(gs.max_c::double / gs.total_grams, 6)
                     as top_bigram_share
            from documents d
            left join ts using (doc_id)
            left join gs using (doc_id)
        """,
        "split_assign": _split_assign_oracle(),
        "stratified_sample": _stratified_sample_oracle(),
        "doc_chunks": _doc_chunks_oracle(),
        "decontaminate": _decontaminate_oracle(),
        "decontaminate_store": _decontaminate_store_oracle(),
        "dup_spans": _dup_spans_oracle(),
        "dup_spans_removed": _dup_spans_removed_oracle(),
        "dup_spans_keep_first": _dup_spans_removed_oracle(keep_first=True),
        "cluster_sample": _cluster_sample_oracle(),
        "token_budget_sample": _token_budget_oracle(),
        "token_freq_stats": _token_freq_oracle(),
        "tfidf_topk": _tfidf_oracle(),
        "pii_scan": _pii_oracle(),
        "pii_redact": f"""
            select doc_id,
                   regexp_replace(regexp_replace(regexp_replace(text,
                     '{curation.EMAIL_PATTERN}', '<EMAIL>', 'g'),
                     '{curation.URL_PATTERN}', '<URL>', 'g'),
                     '{curation.DIGIT_RUN_PATTERN}', '<NUM>', 'g') as text,
                   (len(regexp_extract_all(text, '{curation.EMAIL_PATTERN}'))
                    + len(regexp_extract_all(text, '{curation.URL_PATTERN}'))
                    + len(regexp_extract_all(text, '{curation.DIGIT_RUN_PATTERN}')))::int
                     as n_redactions
            from documents
        """,
        "mixture_weights": f"""
            with g as (
              select lang, count(*) as n_docs,
                     sum(case when trim(text) = '' then 0
                         else len(string_split_regex(trim(text), ' +')) end)
                       as n_tokens,
                     floor(sqrt((sum(case when trim(text) = '' then 0
                           else len(string_split_regex(trim(text), ' +'))
                           end))::double)
                           * {curation.WEIGHT_FP_SCALE})::bigint as w_fp
              from documents group by 1),
            t as (select sum(n_tokens) as tot_tokens,
                         sum(w_fp) as tot_w_fp from g)
            select lang, n_docs::bigint as n_docs, n_tokens::bigint as n_tokens,
                   round(n_tokens::double / tot_tokens::double, 6)
                     as natural_share,
                   round(w_fp::double / tot_w_fp::double, 6) as target_share,
                   round((w_fp::double * tot_tokens::double)
                         / (tot_w_fp::double
                            * greatest(1, n_tokens)::double), 6)
                     as sample_factor
            from g, t
        """,
        "mixture_apply": f"""
            with g as (
              select lang, count(*) as n_docs,
                     sum(case when trim(text) = '' then 0
                         else len(string_split_regex(trim(text), ' +')) end)
                       as n_tokens,
                     floor(sqrt((sum(case when trim(text) = '' then 0
                           else len(string_split_regex(trim(text), ' +'))
                           end))::double)
                           * {curation.WEIGHT_FP_SCALE})::bigint as w_fp
              from documents group by 1),
            t as (select sum(n_tokens) as tot_tokens,
                         sum(w_fp) as tot_w_fp from g),
            w as (select lang,
                         round((w_fp::double * tot_tokens::double)
                               / (tot_w_fp::double
                                  * greatest(1, n_tokens)::double), 6)
                           as sample_factor
                  from g, t),
            j as (select d.doc_id, d.lang,
                         floor(sample_factor * {curation.WEIGHT_FP_SCALE}
                               + 0.5)::bigint as f_u,
                         ('0x' || substr(md5('mix:' || d.doc_id::varchar),
                                         1, 15))::bigint
                           % {curation.WEIGHT_FP_SCALE} as draw
                  from documents d join w using (lang)),
            c as (select doc_id, lang,
                         (f_u // {curation.WEIGHT_FP_SCALE})
                           + case when draw < f_u % {curation.WEIGHT_FP_SCALE}
                                  then 1 else 0 end as n_copies
                  from j)
            select doc_id, lang, cast(u.copy_no as int) as copy_no
            from c, unnest(generate_series(1, n_copies)) as u(copy_no)
        """,
        "pack_chunks": _pack_chunks_oracle(),
        "pack_manifest": f"""
            with p as ({_pack_chunks_oracle()})
            select shard, bin,
                   count(*)::int as n_chunks,
                   count(distinct doc_id)::int as n_docs,
                   sum(n_tokens)::bigint as filled_tokens,
                   min(doc_id) as first_doc,
                   max(doc_id) as last_doc
            from p group by 1, 2
        """,
        "interval_join_agg": f"""
            with p as (select event_id as purchase_id, user_id as buyer_id,
                              ts as s,
                              ts + interval {INTERVAL_JOIN_WINDOW_S} second as e
                       from events where event_type = 'purchase'),
            c as (select ts, value from events where event_type = 'click')
            select purchase_id, buyer_id,
                   count(c.ts) as n_clicks,
                   cast(coalesce(sum(cast(value as decimal(18,2))), 0)
                        as double) as sum_click_value
            from p left join c on c.ts >= p.s and c.ts < p.e
            group by purchase_id, buyer_id
        """,
        "hypertable_rollup": """
            with e as (select floor(epoch(ts))::bigint as sec, event_type,
                              cast(value as decimal(18,2)) as v from events),
            r1 as (select (sec // 3600) * 3600 as b, event_type,
                          count(*) as n, sum(v) as s from e group by 1, 2),
            r2 as (select (b // 86400) * 86400 as b, event_type,
                          sum(n)::bigint as n, sum(s) as s from r1 group by 1, 2),
            r3 as (select (b // 604800) * 604800 as b, event_type,
                          sum(n)::bigint as n, sum(s) as s from r2 group by 1, 2)
            select 3600 as resolution_s, b as bucket_s, event_type,
                   n as n_events, cast(s as double) as sum_value from r1
            union all
            select 86400, b, event_type, n, cast(s as double) from r2
            union all
            select 604800, b, event_type, n, cast(s as double) from r3
        """,
        "scd2_changelog": """
            with f as (
              select user_id, event_type, ts, event_id,
                     case when lag(event_type) over w is null
                            or lag(event_type) over w <> event_type
                          then 1 else 0 end as flag
              from events
              window w as (partition by user_id order by ts, event_id)),
            i as (
              select user_id, event_type, ts,
                     sum(flag) over (partition by user_id
                                     order by ts, event_id)::bigint as island
              from f),
            runs as (
              select user_id, event_type, island,
                     min(ts) as valid_from, count(*) as n_changes
              from i group by 1, 2, 3)
            select user_id, event_type,
                   epoch_us(valid_from) as valid_from_us,
                   epoch_us(lead(valid_from) over wk) as valid_to_us,
                   island as version, n_changes,
                   (lead(valid_from) over wk is null) as is_current
            from runs
            window wk as (partition by user_id order by island)
        """,
        "kmv_distinct": f"""
            with h as (select distinct event_type,
                         ('0x' || substr(md5(user_id::varchar), 1, 15))::bigint
                           as h
                       from events),
            r as (select event_type, h,
                         row_number() over (partition by event_type
                                            order by h) as rn
                  from h),
            t as (select event_type, count(*) as n_hashes, max(h) as hk
                  from r where rn <= {KMV_K} group by 1)
            select event_type, n_hashes,
                   case when n_hashes < {KMV_K} then n_hashes::double
                        else floor(({KMV_K - 1} * {float(_KMV_M_INT)!r} / hk)
                                   * 1e6 + 0.5) / 1e6
                   end as est_distinct
            from t
        """,
        "profile_stats": _profile_oracle(),
        "bitmap_distinct": """
            select event_type, count(distinct user_id) as n_distinct
            from events group by 1
        """,
        "grouping_sets_revenue": """
            select o_orderpriority, o_orderstatus,
                   grouping(o_orderpriority, o_orderstatus) as gid,
                   cast(sum(cast(o_totalprice as decimal(18,2))) as double) as revenue,
                   count(*) as n_orders
            from orders
            group by grouping sets ((o_orderpriority, o_orderstatus),
                                    (o_orderpriority), (o_orderstatus), ())
        """,
        "window_frames": """
            select o_orderkey, o_orderpriority as priority,
                   first_value(o_totalprice) over wgrow as first_price,
                   last_value(o_totalprice) over wfull as last_price,
                   nth_value(o_totalprice, 3) over wgrow as third_price,
                   coalesce(lag(o_totalprice, 2) over wbase, -1.0)
                     as prev2_price,
                   lead(o_totalprice, 1) over wbase as next_price,
                   cast(sum(cast(o_totalprice as decimal(18,2))) over wtrail
                        as double) as trailing4_sum
            from orders
            window
              wbase as (partition by o_orderpriority
                        order by o_orderdate asc, o_orderkey asc),
              wgrow as (partition by o_orderpriority
                        order by o_orderdate asc, o_orderkey asc
                        rows between unbounded preceding and current row),
              wfull as (partition by o_orderpriority
                        order by o_orderdate asc, o_orderkey asc
                        rows between unbounded preceding
                                 and unbounded following),
              wtrail as (partition by o_orderpriority
                         order by o_orderdate asc, o_orderkey asc
                         rows between 3 preceding and current row)
        """,
        "median_mode": """
            with med as (
              select l_returnflag,
                     date_trunc('month', l_shipdate) as ship_month,
                     median(cast(l_quantity as int)) as median_qty,
                     count(*) as n_rows
              from lineitem group by 1, 2),
            mo as (
              select l_returnflag, ship_month, min(s) as mode_status from (
                select l_returnflag,
                       date_trunc('month', l_shipdate) as ship_month,
                       l_linestatus as s,
                       rank() over (partition by l_returnflag,
                                      date_trunc('month', l_shipdate)
                                    order by count(*) desc) as r
                from lineitem group by 1, 2, 3) z
              where r = 1 group by 1, 2)
            select med.l_returnflag, med.ship_month, median_qty,
                   mode_status, n_rows
            from med join mo using (l_returnflag, ship_month)
        """,
        "unpivot_measures": """
            select l_orderkey, l_linenumber, m.measure,
                   case m.measure
                     when 'qty' then l_quantity
                     when 'price' then l_extendedprice
                     when 'disc' then l_discount
                     else l_tax end as value
            from lineitem
            cross join (values ('qty'), ('price'), ('disc'), ('tax'))
                       as m(measure)
        """,
        "array_hof": """
            select vec_id, len(embedding) as dim,
                   len(list_filter(embedding, x -> x > 0)) as n_pos,
                   list_sum(list_transform(embedding,
                     x -> cast(floor(cast(x as double) * 1e7 + 0.5) as bigint)
                          * cast(floor(cast(x as double) * 1e7 + 0.5)
                                 as bigint)))::bigint as sum_sq_q,
                   cast(list_max(embedding) as double) as max_component
            from embeddings
        """,
        "nullsafe_join": """
            select a.k as flag_a, b.k as flag_b, n_a, n_b
            from (select nullif(l_returnflag, 'A') as k, count(*) as n_a
                  from lineitem group by 1) a
            join (select nullif(l_returnflag, 'R') as k, count(*) as n_b
                  from lineitem group by 1) b
              on a.k is not distinct from b.k
        """,
        "funnel_stages": """
            with e1 as (
              select user_id, event_type, ts,
                     min(case when event_type = 'view' then ts end)
                       over (partition by user_id) as tv
              from events),
            e2 as (
              select *, min(case when event_type = 'click' and ts >= tv
                                 then ts end)
                          over (partition by user_id) as tc
              from e1),
            e3 as (
              select *, min(case when event_type = 'purchase' and ts >= tc
                                 then ts end)
                          over (partition by user_id) as tp
              from e2),
            u as (select distinct user_id, tv, tc, tp from e3)
            select c.c_mktsegment as segment, c.c_nationkey as nationkey,
                   count(*) as n_users, count(tv) as n_viewed,
                   count(tc) as n_clicked_after_view,
                   count(tp) as n_purchased_after_click
            from u join customer c on c.c_custkey = u.user_id
            group by 1, 2
        """,
        "retention_cohorts": """
            with ud as (
              select distinct user_id, cast(ts as date) as day from events),
            c as (
              select user_id, day,
                     min(day) over (partition by user_id) as cohort_day
              from ud)
            select cohort_day, cast(day - cohort_day as int) as day_offset,
                   count(*) as n_users
            from c group by 1, 2
        """,
        "value_histogram": """
            select event_type,
                   cast(floor(value / 25.0) as bigint) as bin,
                   count(*) as n_events,
                   cast(sum(cast(value as decimal(18,2))) as double)
                     as bin_value
            from events group by 1, 2
        """,
        "token_positions": """
            with s as (
              select doc_id, string_split(text, ' ') as toks
              from documents),
            e as (
              select doc_id, toks,
                     unnest(generate_series(1, least(5, len(toks)))) as i
              from s)
            select doc_id, cast(i - 1 as int) as pos, toks[i] as token
            from e where toks[i] <> ''
        """,
        "array_agg_sorted": """
            select l_returnflag,
                   string_agg(distinct strftime(l_shipdate, '%Y-%m'), ','
                              order by strftime(l_shipdate, '%Y-%m'))
                     as ship_months,
                   cast(count(distinct strftime(l_shipdate, '%Y-%m')) as int)
                     as n_months
            from lineitem group by 1
        """,
        "variant_extract": """
            select event_type,
                   count(cast(json_extract(props, '$.k') as int)) as n_with_k,
                   sum(cast(json_extract(props, '$.k') as int))::bigint as k_total,
                   max(cast(json_extract(props, '$.k') as int)) as k_max
            from events group by 1
        """,
        "try_arithmetic": """
            select l_returnflag,
                   count(l_extendedprice / nullif(l_discount, 0))
                     as n_divisible,
                   count(*) as n_rows,
                   sum(cast(floor(floor(l_extendedprice * 100 + 0.5)
                                  * 10000.0 / l_quantity) as bigint))::bigint
                     as unit_price_sum_q
            from lineitem group by 1
        """,
        "map_explode": """
            select m.measure, count(*) as n,
                   cast(sum(case m.measure
                              when 'qty' then cast(l_quantity as decimal(18,2))
                              when 'price' then cast(l_extendedprice as decimal(18,2))
                              else cast(l_tax as decimal(18,2)) end)
                        as double) as total
            from lineitem
            cross join (values ('qty'), ('price'), ('tax')) as m(measure)
            group by 1
        """,
        "embedding_quantize": """
            with s as (
              select vec_id,
                     cast(list_min(embedding) as double) as mn,
                     case when list_max(embedding) <> list_min(embedding)
                          then cast(list_max(embedding) as double)
                               - cast(list_min(embedding) as double)
                          else 1.0 end as span,
                     embedding
              from embeddings),
            q as (
              select vec_id, mn, span,
                     list_transform(embedding,
                       x -> cast(floor((cast(x as double) - mn) / span
                                       * 255.0 + 0.5) as bigint)) as codes
              from s)
            select vec_id, mn as scale_min, mn + span as scale_max,
                   len(codes) as dim,
                   list_sum(codes)::bigint as code_sum,
                   list_sum(list_transform(codes, c -> c * c))::bigint
                     as code_sumsq,
                   list_min(codes) as code_min, list_max(codes) as code_max
            from q
        """,
        "ann_quantized": f"""
            with s as (
              select vec_id,
                     cast(list_min(embedding) as double) as mn,
                     case when list_max(embedding) <> list_min(embedding)
                          then cast(list_max(embedding) as double)
                               - cast(list_min(embedding) as double)
                          else 1.0 end as span,
                     embedding
              from embeddings),
            q as (
              select vec_id,
                     list_transform(embedding,
                       x -> cast(floor((cast(x as double) - mn) / span
                                       * 255.0 + 0.5) as double)) as codes
              from s),
            probes as (select vec_id as query_id, codes as qc from q
                       where vec_id < {ANN_QUANT_QUERIES}),
            scored as (
              select p.query_id, q.vec_id as neighbor_id,
                     cast(list_dot_product(q.codes, p.qc) as bigint) as dot
              from q join probes p on q.vec_id <> p.query_id),
            ranked as (
              select query_id, neighbor_id, dot,
                     row_number() over (partition by query_id
                                        order by dot desc, neighbor_id asc)
                       as rank
              from scored)
            select query_id, neighbor_id, cast(rank as int) as rank, dot
            from ranked where rank <= {ANN_QUANT_K}
        """,
        "correlated_subquery": """
            select o.o_orderkey, o.o_custkey,
                   cast(o.o_totalprice as double) as price
            from orders o
            where cast(o.o_totalprice as decimal(18,2)) * (
                    select count(*) from orders c
                    where c.o_custkey = o.o_custkey)
                  > (
                    select sum(cast(i.o_totalprice as decimal(18,2)))
                    from orders i
                    where i.o_custkey = o.o_custkey)
        """,
        "exists_subquery": """
            select o.o_orderkey, o.o_orderstatus,
                   cast(o.o_totalprice as double) as price
            from orders o
            where exists (
              select 1 from lineitem l
              where l.l_orderkey = o.o_orderkey and l.l_quantity > 45)
        """,
        "window_ignore_nulls": """
            select user_id, event_id,
                   last_value(case when event_type = 'purchase'
                                   then value end ignore nulls)
                     over (partition by user_id
                           order by ts asc, event_id asc
                           rows between unbounded preceding and current row)
                     as last_purchase_value
            from events
        """,
        "rolling_distinct_users": """
            with ud as (
              select distinct user_id, cast(ts as date) as day from events),
            days as (select distinct day from ud)
            select d.day, count(distinct u.user_id) as n_users_7d
            from days d
            join ud u on u.day between d.day - 6 and d.day
            group by 1
        """,
        "weighted_sample": f"""
            with rep as (
              select doc_id, unnest(generate_series(1, w)) as i
              from (select doc_id,
                           least(8, greatest(1,
                             cast(floor(n_chars / 256) as int))) as w
                    from documents) d),
            race as (
              select doc_id,
                     min(('0x' || substr(md5(doc_id::varchar || ':' ||
                                         i::varchar), 1, 15))::bigint)
                       as priority
              from rep group by 1)
            select doc_id, priority from race
            order by priority limit {WEIGHTED_SAMPLE_K}
        """,
        "ewma": """
            with recursive base as (
              select user_id, event_id, ts, value,
                     row_number() over (partition by user_id
                                        order by ts, event_id) as rn
              from events),
            rec as (
              select user_id, event_id, ts, value, rn, value as ewma
              from base where rn = 1
              union all
              select b.user_id, b.event_id, b.ts, b.value, b.rn,
                     0.5 * r.ewma + 0.5 * b.value
              from rec r
              join base b on b.user_id = r.user_id and b.rn = r.rn + 1)
            select user_id, event_id, ts, value, ewma from rec
        """,
        "stream_session_window": """
            with f as (
              select user_id, ts, event_id,
                     case when lag(ts) over w is null
                            or epoch_us(ts) - epoch_us(lag(ts) over w)
                               >= 1800000000
                          then 1 else 0 end as flag
              from events
              window w as (partition by user_id order by ts, event_id)),
            i as (
              select user_id, ts,
                     sum(flag) over (partition by user_id
                                     order by ts, event_id) as island
              from f),
            sess as (
              select user_id, island, min(ts) as s, max(ts) as e,
                     count(*) as n from i group by 1, 2)
            select user_id,
                   epoch_us(s) as session_start_us,
                   epoch_us(e) + 1800000000 as session_end_us,
                   n as n_events
            from sess
        """,
        "stream_stream_join": """
            select c.user_id, c.event_id as click_id, p.event_id as purchase_id,
                   epoch_us(p.ts) - epoch_us(c.ts) as gap_us
            from events c
            join events p
              on p.user_id = c.user_id
             and p.ts >= c.ts
             and p.ts < c.ts + interval 15 minute
            where c.event_type = 'click' and p.event_type = 'purchase'
        """,
        "cdc_upsert": """
            with fsum as (
              select o_custkey as k,
                     cast(sum(cast(o_totalprice as decimal(18,2))) as double)
                       as bal
              from orders where o_orderstatus = 'F' group by 1),
            kept as (
              select c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
              from customer c
              where not exists (select 1 from fsum where k = c.c_custkey)),
            upd as (
              select c_custkey, c_name, c_nationkey, bal as c_acctbal,
                     c_mktsegment
              from customer join fsum on k = c_custkey
              where c_custkey % 19 <> 0),
            ins as (
              select k + 10000000 as c_custkey, 'NEW#' || k as c_name,
                     0 as c_nationkey, bal as c_acctbal, 'CDC' as c_mktsegment
              from fsum where k % 23 = 0)
            select * from kept
            union all select * from upd
            union all select * from ins
        """,
        "pagerank": _pagerank_oracle(),
        "kmeans": _kmeans_oracle(),
        "gap_fill_daily": """
            with d as (select user_id,
                              floor(epoch(ts))::bigint // 86400 as bucket,
                              count(*) as n,
                              sum(cast(value as decimal(18,2))) as s
                       from events group by 1, 2),
            b as (select user_id, min(bucket) as mn, max(bucket) as mx
                  from d group by 1),
            spine as (select user_id, unnest(generate_series(mn, mx)) as bucket
                      from b)
            select spine.user_id, spine.bucket,
                   coalesce(d.n, 0) as n_events,
                   cast(last_value(d.s ignore nulls) over (
                          partition by spine.user_id order by spine.bucket
                          rows between unbounded preceding and current row)
                        as double) as locf_value,
                   d.n is null as is_gap
            from spine left join d
              on d.user_id = spine.user_id and d.bucket = spine.bucket
        """,
        "full_outer_recon": """
            with a as (select o_custkey as open_key,
                              cast(sum(cast(o_totalprice as decimal(18,2)))
                                   as double) as open_revenue
                       from orders where o_orderstatus = 'O' group by 1),
            b as (select o_custkey as fin_key,
                         cast(sum(cast(o_totalprice as decimal(18,2)))
                              as double) as fin_revenue
                  from orders where o_orderstatus = 'F' group by 1)
            select coalesce(open_key, fin_key) as custkey,
                   coalesce(open_revenue, 0.0) as open_revenue,
                   coalesce(fin_revenue, 0.0) as fin_revenue,
                   case when open_key is null then 'FIN_ONLY'
                        when fin_key is null then 'OPEN_ONLY'
                        else 'BOTH' end as side
            from a full outer join b on open_key = fin_key
        """,
        "triangle_count": """
            with v as (select c_custkey as id from customer),
            nn as (select count(*) as n from customer),
            raw as (select id as s, (id + 1) % n as d from v, nn
                    union all select id, (id + 2) % n from v, nn
                    union all select id, (id * 7 + 3) % n from v, nn),
            und as (select distinct least(s, d) as u, greatest(s, d) as v2
                    from raw where s <> d),
            deg as (select id, (count(*) * 1000000000 + id)::bigint as rank
                    from (select u as id from und
                          union all select v2 from und) z
                    group by id),
            o as (select case when du.rank < dv.rank then u else v2 end as a,
                         case when du.rank < dv.rank then v2 else u end as b,
                         greatest(du.rank, dv.rank) as rb
                  from und
                  join deg du on du.id = u
                  join deg dv on dv.id = v2),
            w as (select o1.a, o1.b as m, o2.b as w
                  from o o1 join o o2 on o1.a = o2.a
                  where o1.rb < o2.rb),
            t as (select w.a, w.m, w.w
                  from w join o on o.a = w.m and o.b = w.w),
            x as (select unnest([a, m, w]) as id from t),
            c as (select id, count(*) as n from x group by 1)
            select v.id, coalesce(c.n, 0) as n_triangles
            from v left join c using (id)
        """,
        "udtf_sentences": """
            with parts as (select doc_id, string_split(text, '. ') as l
                           from documents),
            expl as (select doc_id,
                            unnest(range(1, len(l) + 1))::int as sentence_no,
                            unnest(l) as sentence
                     from parts)
            select doc_id, sentence_no, sentence,
                   length(sentence)::int as n_chars
            from expl where length(sentence) > 0
        """,
        "fuzzy_name_match": f"""
            with probes as (
              select c_custkey as probe_id,
                     substring(c_name, 1, 10)
                       || reverse(substring(c_name, 11)) as probe_name,
                     c_nationkey
              from customer where c_custkey % 101 = 0),
            scored as (
              select p.probe_id, c.c_custkey as cand_id,
                     levenshtein(p.probe_name, c.c_name) as distance
              from probes p join customer c using (c_nationkey)
              where levenshtein(p.probe_name, c.c_name)
                      <= {FUZZY_MAX_DISTANCE})
            select probe_id, cand_id, distance from (
              select probe_id, cand_id, distance,
                     row_number() over (partition by probe_id
                                        order by distance, cand_id) as rn
              from scored) z
            where rn = 1
        """,
    }
