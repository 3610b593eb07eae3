"""Cogrouped-map reconciliation: the pandas-UDF result must equal the same
waterfall expressed as pure DataFrame ops (windows + aggregations) on the
generated lake."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.operators.reconcile import reconcile_payments


def _cents(c):
    return F.round(F.col(c).cast("decimal(18,2)") * 100).cast("long")


def test_reconcile_matches_dataframe_formulation(spark, oltp):
    sched, pays = oltp["repayment_schedule"], oltp["repayment_payment"]
    got = reconcile_payments(sched, pays).cache()

    s_agg = sched.groupBy("loan_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_installments"),
        F.sum(_cents("total_due")).alias("scheduled_cents"),
    )
    p_agg = pays.groupBy("loan_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_payments"),
        F.sum(_cents("amount_received")).alias("received_cents"),
    )
    w = (
        Window.partitionBy("loan_id")
        .orderBy("installment_no")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = sched.select(
        "loan_id", F.sum(_cents("total_due")).over(w).alias("cum_due")
    )
    pif = (
        cum.join(p_agg.select("loan_id", "received_cents"), "loan_id", "left")
        .where(F.col("cum_due") <= F.coalesce(F.col("received_cents"), F.lit(0)))
        .groupBy("loan_id")
        .agg(F.count(F.lit(1)).cast("int").alias("paid_in_full_cnt"))
    )
    expected = (
        s_agg.join(p_agg, "loan_id", "full_outer")
        .join(pif, "loan_id", "left")
        .select(
            "loan_id",
            F.coalesce("n_installments", F.lit(0)).alias("n_installments"),
            F.coalesce("n_payments", F.lit(0)).alias("n_payments"),
            F.coalesce("scheduled_cents", F.lit(0)).alias("scheduled_cents"),
            F.coalesce("received_cents", F.lit(0)).alias("received_cents"),
            F.coalesce("paid_in_full_cnt", F.lit(0)).alias("paid_in_full_cnt"),
            (
                F.coalesce("received_cents", F.lit(0))
                - F.coalesce("scheduled_cents", F.lit(0))
            ).alias("residual_cents"),
        )
    )
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0
    got.unpersist()


def test_reconcile_invariants(spark, oltp):
    out = reconcile_payments(
        oltp["repayment_schedule"], oltp["repayment_payment"]
    ).cache()
    assert (
        out.where(F.col("paid_in_full_cnt") > F.col("n_installments")).count() == 0
    )
    # late/partial/default behaviors guarantee some shortfalls in the lake,
    # and a shortfall loan can never be fully paid up
    underpaid = out.where(F.col("residual_cents") < 0).cache()
    assert underpaid.count() > 0
    assert (
        underpaid.where(
            F.col("paid_in_full_cnt") >= F.col("n_installments")
        ).count()
        == 0
    )
    out.unpersist()
