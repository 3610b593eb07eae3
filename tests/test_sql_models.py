"""Run the reference's own dbt model files (read from /root/reference at
test time, never vendored) through the SQL-model runner on Spark, and
compare every mart to the DataFrame pipeline output — which is itself
pinned against the identical SQL executed in DuckDB (test_marts_oracle).

Also unit-pins each transpile rule, since a silent mistranslation would
surface as a subtly wrong mart."""

from __future__ import annotations

import os

import pytest

from credit_abs_oltp_to_mart_spark.plans.sql_models import (
    load_models,
    run_sql_models,
    transpile_postgres,
)
from tests.duck_oracle import assert_frames_match

REF_MODELS = "/root/reference/dbt/credit_mart/models"

MART_NAMES = [
    "fct_dpd_daily",
    "fct_npl_monthly",
    "fct_roll_rate_monthly",
    "fct_cure_rate_monthly",
    "fct_vintage_mob",
    "fct_collections_monthly",
    "fct_writeoff_recovery_monthly",
]

needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF_MODELS), reason="reference checkout not present"
)


@pytest.fixture(scope="module")
def sql_marts(spark, oltp):
    for name, df in oltp.items():
        df.createOrReplaceTempView(name)
    return run_sql_models(spark, REF_MODELS)


@needs_reference
def test_runner_discovers_the_full_model_graph():
    assert set(load_models(REF_MODELS)) == set(MART_NAMES) | {
        "stg_arrears_daily",
        "stg_loan_contract",
        "stg_payments",
        "stg_writeoff_recovery",
    }


@needs_reference
@pytest.mark.parametrize("name", MART_NAMES)
def test_sql_mart_matches_dataframe_mart(sql_marts, marts, name):
    assert_frames_match(sql_marts[name], marts[name].toPandas(), strict_dtypes=False)


def test_transpile_ident_cast():
    assert (
        transpile_postgres("select a.b::numeric from t")
        == "select cast(a.b as decimal(18,2)) from t"
    )


def test_transpile_paren_cast_nested():
    out = transpile_postgres("select sum(x::int)::numeric / nullif(count(*),0) from t")
    assert (
        out
        == "select cast(sum(cast(x as int)) as decimal(18,2)) / nullif(count(*),0) from t"
    )


def test_transpile_age_to_months_between():
    src = (
        "(date_part('year', age(me.month, l.origination_date))*12 "
        "+ date_part('month', age(me.month, l.origination_date)))::int"
    )
    assert transpile_postgres(src) == (
        "cast((floor(months_between(me.month, l.origination_date))) as int)"
    )


def test_transpile_leaves_spark_sql_alone():
    sql = "select count(*) filter (where x > 0) as c from t group by 1"
    assert transpile_postgres(sql) == sql
