"""Domain application of the as-of join: effective interest rate per
installment — each repayment_schedule row picks up the interest_rate_schedule
period covering its due date (the reference models this with
effective_from/effective_to ranges, pg_oltp_synth.py:376-388)."""

from __future__ import annotations

from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.operators.asof import asof_join


def test_effective_rate_asof_matches_range_join(spark, oltp):
    sched = oltp["repayment_schedule"].select("loan_id", "installment_no", "due_date")
    rates = oltp["interest_rate_schedule"].select(
        "loan_id",
        F.col("effective_from_date").alias("due_date"),
        "effective_to_date",
        "nominal_rate",
    )
    # restrict to loans that have a rate schedule (variable-rate loans)
    sched = sched.join(rates.select("loan_id").distinct(), "loan_id", "left_semi")

    got = asof_join(
        sched,
        rates,
        keys=["loan_id"],
        ts_col="due_date",
        payload_cols=["nominal_rate", "effective_to_date"],
    )

    # reference semantics: the period with effective_from <= due_date <=
    # effective_to (open-ended last period has null effective_to)
    r = oltp["interest_rate_schedule"].alias("r")
    s = sched.alias("s")
    exp = (
        s.join(
            r,
            (F.col("s.loan_id") == F.col("r.loan_id"))
            & (F.col("r.effective_from_date") <= F.col("s.due_date"))
            & (
                F.col("r.effective_to_date").isNull()
                | (F.col("s.due_date") <= F.col("r.effective_to_date"))
            ),
            "left",
        )
        .select(
            F.col("s.loan_id").alias("loan_id"),
            "installment_no",
            F.col("r.nominal_rate").alias("nominal_rate"),
        )
    )

    cols = ["loan_id", "installment_no", "nominal_rate"]
    got_rows = sorted(tuple(x) for x in got.select(*cols).collect())
    exp_rows = sorted(tuple(x) for x in exp.collect())
    assert got_rows == exp_rows
    # and a meaningful share of installments actually resolved a rate
    n_matched = sum(1 for r_ in got_rows if r_[2] is not None)
    assert n_matched > 0
