"""The dbt model DAG as explicit composition (reference E2, SURVEY.md §3).

dbt topologically orders stg_* -> fct_dpd_daily -> fct_npl_monthly (the other
fct_* depend only on stg_*); here the order is plain Python data flow.
Catalyst replaces the Postgres planner end-to-end.

``build_marts`` caches the two reused intermediates:
- the month-end snapshot (consumed by roll-rate, cure-rate AND vintage — the
  reference recomputes it 3x);
- the bucket transitions (consumed by roll-rate AND cure-rate).
At 100 TB, swap ``.cache()`` for a persisted intermediate table; the
function composition is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from credit_abs_oltp_to_mart_spark.operators import marts as M
from credit_abs_oltp_to_mart_spark.operators import staging as S
from credit_abs_oltp_to_mart_spark.sources.readers import read_sources
from credit_abs_oltp_to_mart_spark.sources.writers import write_mart


def build_staging(sources: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """All 4 staging models from raw source DataFrames."""
    return {
        "stg_loan_contract": S.stg_loan_contract(sources["loan_contract"]),
        "stg_arrears_daily": S.stg_arrears_daily(sources["arrears_dpd_status"]),
        "stg_payments": S.stg_payments(sources["repayment_payment"]),
        "stg_writeoff_recovery": S.stg_writeoff_recovery(
            sources["write_off_and_recovery"]
        ),
    }


def build_marts(
    staging: dict[str, DataFrame], cache_intermediates: bool = True
) -> dict[str, DataFrame]:
    """All 7 fact models from the staging layer."""
    loan = staging["stg_loan_contract"]
    arrears = staging["stg_arrears_daily"]

    dpd_daily = M.fct_dpd_daily(arrears, loan)
    month_end = M.int_month_end_snapshot(arrears)
    if cache_intermediates:
        month_end = month_end.cache()
    transitions = M.int_bucket_transitions(month_end)
    if cache_intermediates:
        transitions = transitions.cache()

    return {
        "fct_dpd_daily": dpd_daily,
        "fct_npl_monthly": M.fct_npl_monthly(dpd_daily),
        "fct_roll_rate_monthly": M.fct_roll_rate_monthly(transitions),
        "fct_cure_rate_monthly": M.fct_cure_rate_monthly(transitions),
        "fct_vintage_mob": M.fct_vintage_mob(month_end, loan),
        "fct_collections_monthly": M.fct_collections_monthly(
            staging["stg_payments"], loan
        ),
        "fct_writeoff_recovery_monthly": M.fct_writeoff_recovery_monthly(
            staging["stg_writeoff_recovery"]
        ),
    }


def run_pipeline(
    spark: SparkSession,
    src_dir: str,
    out_dir: str | None = None,
    collect_metrics: dict[str, dict[str, float]] | None = None,
) -> dict[str, DataFrame]:
    """End-to-end: read OLTP sources -> staging -> marts (-> optional write).

    The Spark analogue of ``dbt run`` against the project
    (dbt/credit_mart/models/). Pass a dict as ``collect_metrics`` to
    receive per-mart in-flight quality metrics (row counts, key nulls) —
    ``df.observe`` accumulates them DURING the write, so monitoring costs
    zero extra passes over 100 TB."""
    staging = build_staging(read_sources(spark, src_dir))
    mart_dfs = build_marts(staging)
    if out_dir:
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        observations: dict[str, Observation] = {}
        for name, df in mart_dfs.items():
            if collect_metrics is not None:
                obs = Observation(name)
                first_col = df.columns[0]
                df = df.observe(
                    obs,
                    F.count(F.lit(1)).alias("n_rows"),
                    F.coalesce(
                        F.sum(F.col(first_col).isNull().cast("int")),
                        F.lit(0),
                    ).alias("first_col_nulls"),
                )
                observations[name] = obs
            write_mart(df, out_dir, name)
        for name, obs in observations.items():
            collect_metrics[name] = dict(obs.get)
    return {**staging, **mart_dfs}


if __name__ == "__main__":
    import argparse

    from credit_abs_oltp_to_mart_spark.session import get_spark

    ap = argparse.ArgumentParser(
        description="Run staging + marts over an OLTP parquet lake "
        "(the Spark analogue of `dbt run`)"
    )
    ap.add_argument("src_dir", help="OLTP lake directory (17 *.parquet tables)")
    ap.add_argument("out_dir", help="output directory for the 7 fact tables")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    metrics: dict[str, dict[str, float]] = {}
    run_pipeline(
        get_spark(master=args.master),
        args.src_dir,
        out_dir=args.out_dir,
        collect_metrics=metrics,
    )
    for name, m in sorted(metrics.items()):
        print(f"{name}: rows={int(m['n_rows'])} key_nulls={int(m['first_col_nulls'])}")
