"""Mart parity vs the reference SQL run verbatim in DuckDB over the same
generated lake (SURVEY.md §5 item 3). Each oracle below is the reference
model's SQL (dbt/credit_mart/models/marts/*.sql) with ``ref()`` replaced by
the staging views."""

from __future__ import annotations

import datetime

import pytest

from tests.duck_oracle import assert_frames_match, connect_with_staging

MONTH_END_CTE = """
with month_end as (
  select * from (
    select loan_id, as_of_date, days_past_due, dpd_bucket,
           date_trunc('month', as_of_date)::date as month,
           row_number() over (partition by loan_id, date_trunc('month', as_of_date)
                              order by as_of_date desc) as rn
    from stg_arrears_daily) x
  where rn = 1
),
x as (
  select loan_id, month,
         lag(dpd_bucket) over (partition by loan_id order by month) as prev_bucket,
         dpd_bucket as curr_bucket
  from month_end
)
"""


@pytest.fixture(scope="module")
def duck(oltp_dir):
    con = connect_with_staging(oltp_dir)
    yield con
    con.close()


def test_fct_dpd_daily(marts, duck):
    oracle = duck.execute("""
        select a.as_of_date, a.loan_id, l.borrower_id, l.product_type, l.currency,
               l.origination_date, l.principal_current as exposure,
               a.days_past_due, a.dpd_bucket, a.npl_flag, a.past_due_amount_total
        from stg_arrears_daily a
        join stg_loan_contract l using (loan_id)
    """).df()
    assert_frames_match(marts["fct_dpd_daily"], oracle, strict_dtypes=False)


def test_fct_npl_monthly(marts, duck):
    oracle = duck.execute("""
        with m as (
          select date_trunc('month', as_of_date)::date as month,
                 l.product_type, l.currency,
                 sum(l.principal_current) as total_exposure,
                 sum(case when a.npl_flag then l.principal_current else 0 end) as npl_exposure
          from stg_arrears_daily a join stg_loan_contract l using (loan_id)
          group by 1,2,3)
        select month, product_type, currency, total_exposure, npl_exposure,
               case when total_exposure = 0 then null
                    else npl_exposure / total_exposure end as npl_ratio
        from m
    """).df()
    assert_frames_match(marts["fct_npl_monthly"], oracle, strict_dtypes=False)


def test_fct_roll_rate_monthly(marts, duck):
    oracle = duck.execute(
        MONTH_END_CTE
        + """
        select month, prev_bucket, curr_bucket, count(*) as loans_cnt
        from x where prev_bucket is not null group by 1,2,3
    """
    ).df()
    assert_frames_match(marts["fct_roll_rate_monthly"], oracle, strict_dtypes=False)


def test_fct_cure_rate_monthly(marts, duck):
    oracle = duck.execute(
        MONTH_END_CTE
        + """
        select month,
               count(*) filter (where prev_bucket <> '0') as prev_delinquent_cnt,
               count(*) filter (where prev_bucket <> '0' and curr_bucket = '0') as cured_cnt,
               (count(*) filter (where prev_bucket <> '0' and curr_bucket = '0'))::double
                 / nullif(count(*) filter (where prev_bucket <> '0'),0) as cure_rate
        from x where prev_bucket is not null group by 1
    """
    ).df()
    assert_frames_match(marts["fct_cure_rate_monthly"], oracle, strict_dtypes=False)


def test_fct_vintage_mob(marts, duck):
    oracle = duck.execute("""
        with month_end as (
          select * from (
            select loan_id, as_of_date, days_past_due, dpd_bucket,
                   date_trunc('month', as_of_date)::date as month,
                   row_number() over (partition by loan_id, date_trunc('month', as_of_date)
                                      order by as_of_date desc) as rn
            from stg_arrears_daily) x
          where rn = 1),
        base as (
          select l.loan_id, date_trunc('quarter', l.origination_date)::date as cohort_q,
                 me.month,
                 (date_part('year', age(me.month, l.origination_date))*12
                  + date_part('month', age(me.month, l.origination_date)))::int as mob,
                 (me.days_past_due > 0) as delinquent_flag,
                 (me.days_past_due > 90) as npl_flag
          from month_end me join stg_loan_contract l using (loan_id))
        select cohort_q, mob, count(*) as loans_cnt,
               sum(delinquent_flag::int) as delinquent_cnt,
               sum(npl_flag::int) as npl_cnt,
               sum(delinquent_flag::int)::double / nullif(count(*),0) as delinquent_rate,
               sum(npl_flag::int)::double / nullif(count(*),0) as npl_rate
        from base where mob >= 0 group by 1,2
    """).df()
    assert_frames_match(marts["fct_vintage_mob"], oracle, strict_dtypes=False)


def test_fct_collections_monthly(marts, duck):
    oracle = duck.execute("""
        select date_trunc('month', p.payment_date)::date as month,
               l.product_type, p.currency,
               sum(p.amount_received) as collected_amount
        from stg_payments p join stg_loan_contract l using (loan_id)
        group by 1,2,3
    """).df()
    assert_frames_match(marts["fct_collections_monthly"], oracle, strict_dtypes=False)


def test_fct_writeoff_recovery_monthly(marts, duck):
    oracle = duck.execute("""
        select date_trunc('month', coalesce(recovery_date, writeoff_date))::date as month,
               sum(coalesce(writeoff_amount_principal,0) + coalesce(writeoff_amount_interest,0)
                   + coalesce(writeoff_amount_fees,0)) as writeoff_total,
               sum(coalesce(recovery_amount,0)) as recovery_total
        from stg_writeoff_recovery group by 1
    """).df()
    assert_frames_match(marts["fct_writeoff_recovery_monthly"], oracle, strict_dtypes=False)


def test_months_on_book_edge_dates(spark):
    """D3 semantic risk (SURVEY.md §7b): floor(months_between) vs Postgres
    age() on edge origination dates — month-start, month-end, leap Feb."""
    import duckdb
    from pyspark.sql import functions as F

    from credit_abs_oltp_to_mart_spark.functions.dates import months_on_book

    cases = [
        (datetime.date(2023, 1, 1), datetime.date(2023, 2, 1)),
        (datetime.date(2023, 1, 31), datetime.date(2023, 2, 1)),
        (datetime.date(2024, 2, 29), datetime.date(2024, 3, 1)),
        (datetime.date(2024, 2, 29), datetime.date(2025, 3, 1)),
        (datetime.date(2023, 1, 15), datetime.date(2024, 1, 1)),
        (datetime.date(2023, 12, 31), datetime.date(2024, 1, 1)),
        (datetime.date(2015, 3, 31), datetime.date(2025, 2, 1)),
        (datetime.date(2023, 6, 1), datetime.date(2023, 6, 1)),
    ]
    df = spark.createDataFrame(cases, "orig date, month date")
    got = {
        (r["orig"], r["month"]): r["mob"]
        for r in df.select(
            "orig", "month", months_on_book(F.col("month"), F.col("orig")).alias("mob")
        ).collect()
    }
    con = duckdb.connect()
    for orig, month in cases:
        expected = con.execute(
            "select (date_part('year', age(?::date, ?::date))*12 "
            "+ date_part('month', age(?::date, ?::date)))::int",
            [month, orig, month, orig],
        ).fetchone()[0]
        assert got[(orig, month)] == expected, (orig, month, got[(orig, month)], expected)


@pytest.mark.slow
def test_pipeline_observe_metrics(spark, oltp_dir, tmp_path):
    """df.observe metrics accumulate during the mart writes (no extra
    pass): row counts match the written tables, key nulls are zero."""
    from credit_abs_oltp_to_mart_spark.plans.pipeline import run_pipeline

    metrics: dict[str, dict[str, float]] = {}
    out = str(tmp_path / "marts_obs")
    run_pipeline(spark, oltp_dir, out_dir=out, collect_metrics=metrics)
    assert set(metrics) == {
        "fct_dpd_daily", "fct_npl_monthly", "fct_roll_rate_monthly",
        "fct_cure_rate_monthly", "fct_vintage_mob",
        "fct_collections_monthly", "fct_writeoff_recovery_monthly",
    }
    for name, m in metrics.items():
        written = spark.read.parquet(f"{out}/{name}.parquet").count()
        assert m["n_rows"] == written, (name, m, written)
        assert m["first_col_nulls"] == 0, (name, m)
