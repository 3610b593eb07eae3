"""Staging layer — type-cleaning projections over the OLTP sources.

Reference: dbt/credit_mart/models/staging/{stg_loan_contract,
stg_arrears_daily, stg_payments, stg_writeoff_recovery}.sql. Each model is a
1:1 projection with explicit casts (operators P1-P6) plus, for arrears, two
derived columns (P7 dpd_bucket, P9 npl_flag).

Each function is ``DataFrame -> DataFrame`` and purely declarative, so
Catalyst collapses the casts into the parquet scan (column pruning +
pushdown): reading ``stg_loan_contract`` from a 24-column source scans only
the 17 projected columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.functions.buckets import dpd_bucket_expr, npl_flag_expr
from credit_abs_oltp_to_mart_spark.schemas import MONEY, RATE


def stg_loan_contract(loan_contract: DataFrame) -> DataFrame:
    """stg_loan_contract.sql:1-19 — loan dimension projection."""
    c = F.col
    return loan_contract.select(
        c("loan_id").cast("long").alias("loan_id"),
        c("borrower_id").cast("long").alias("borrower_id"),
        c("application_id").cast("long").alias("application_id"),
        c("product_type"),
        c("currency"),
        c("origination_date").cast("date").alias("origination_date"),
        c("disbursement_date").cast("date").alias("disbursement_date"),
        c("maturity_date").cast("date").alias("maturity_date"),
        c("principal_original").cast(MONEY).alias("principal_original"),
        c("principal_current").cast(MONEY).alias("principal_current"),
        c("term_months").cast("int").alias("term_months"),
        c("interest_rate_type"),
        c("interest_rate_current").cast(RATE).alias("interest_rate_current"),
        c("repayment_method"),
        c("payment_frequency"),
        c("grace_period_months").cast("int").alias("grace_period_months"),
        c("status"),
    )


def stg_arrears_daily(arrears_dpd_status: DataFrame) -> DataFrame:
    """stg_arrears_daily.sql:1-23 — daily snapshot projection + dpd_bucket +
    npl_flag. ``dpd_bucket`` is recomputed here, never trusted from source
    (the generator writes '>90' where staging defines '90+')."""
    c = F.col
    dpd = c("days_past_due").cast("int")
    return arrears_dpd_status.select(
        c("loan_id").cast("long").alias("loan_id"),
        c("as_of_date").cast("date").alias("as_of_date"),
        dpd.alias("days_past_due"),
        c("past_due_amount_total").cast(MONEY).alias("past_due_amount_total"),
        c("past_due_principal").cast(MONEY).alias("past_due_principal"),
        c("past_due_interest").cast(MONEY).alias("past_due_interest"),
        c("past_due_fees").cast(MONEY).alias("past_due_fees"),
        c("oldest_unpaid_due_date").cast("date").alias("oldest_unpaid_due_date"),
        c("early_arrears_flag").cast("boolean").alias("early_arrears_flag"),
        c("default_flag").cast("boolean").alias("default_flag"),
        c("nonperforming_flag").cast("boolean").alias("nonperforming_flag"),
        dpd_bucket_expr(dpd).alias("dpd_bucket"),
        npl_flag_expr(
            c("nonperforming_flag").cast("boolean"),
            c("default_flag").cast("boolean"),
            dpd,
        ).alias("npl_flag"),
    )


def stg_payments(repayment_payment: DataFrame) -> DataFrame:
    """stg_payments.sql:1-11 — cash-receipt projection."""
    c = F.col
    return repayment_payment.select(
        c("payment_id").cast("long").alias("payment_id"),
        c("loan_id").cast("long").alias("loan_id"),
        c("payment_date").cast("date").alias("payment_date"),
        c("value_date").cast("date").alias("value_date"),
        c("currency"),
        c("amount_received").cast(MONEY).alias("amount_received"),
        c("payment_channel"),
        c("external_reference"),
        c("status"),
    )


def stg_writeoff_recovery(write_off_and_recovery: DataFrame) -> DataFrame:
    """stg_writeoff_recovery.sql:1-9 — write-off projection."""
    c = F.col
    return write_off_and_recovery.select(
        c("loan_id").cast("long").alias("loan_id"),
        c("writeoff_date").cast("date").alias("writeoff_date"),
        c("writeoff_amount_principal").cast(MONEY).alias("writeoff_amount_principal"),
        c("writeoff_amount_interest").cast(MONEY).alias("writeoff_amount_interest"),
        c("writeoff_amount_fees").cast(MONEY).alias("writeoff_amount_fees"),
        c("recovery_amount").cast(MONEY).alias("recovery_amount"),
        c("recovery_date").cast("date").alias("recovery_date"),
    )
