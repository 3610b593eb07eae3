"""Staging-layer unit tests: bucket edges and three-valued npl_flag logic
(stg_arrears_daily.sql:14-22)."""

from __future__ import annotations

import datetime

from credit_abs_oltp_to_mart_spark.operators.staging import stg_arrears_daily
from credit_abs_oltp_to_mart_spark.schemas import ARREARS_DPD_STATUS


def _arrears_row(dpd, npf=False, dflt=False):
    return {
        "arrears_id": 1,
        "loan_id": 1,
        "as_of_date": datetime.date(2024, 1, 1),
        "days_past_due": dpd,
        "arrears_bucket": ">90",  # deliberately the generator's spelling
        "default_flag": dflt,
        "nonperforming_flag": npf,
        "probation_flag": False,
    }


def test_dpd_bucket_edges(spark):
    rows = [_arrears_row(d) for d in [-1, 0, 1, 30, 31, 60, 61, 90, 91, 400, None]]
    out = stg_arrears_daily(spark.createDataFrame(rows, schema=ARREARS_DPD_STATUS))
    got = {r["days_past_due"]: r["dpd_bucket"] for r in out.collect()}
    assert got[-1] == "0"
    assert got[0] == "0"
    assert got[1] == "1-30"
    assert got[30] == "1-30"
    assert got[31] == "31-60"
    assert got[60] == "31-60"
    assert got[61] == "61-90"
    assert got[90] == "61-90"
    assert got[91] == "90+"  # staging spelling, NOT the generator's '>90'
    assert got[400] == "90+"
    assert got[None] == "90+"  # searched CASE: NULL falls to ELSE, as Postgres


def test_npl_flag_three_valued(spark):
    rows = [
        _arrears_row(100, npf=False, dflt=False),  # dpd>90 alone
        _arrears_row(10, npf=True, dflt=False),
        _arrears_row(10, npf=False, dflt=True),
        _arrears_row(10, npf=None, dflt=None),  # coalesce to false, dpd<=90
        _arrears_row(None, npf=None, dflt=None),  # NULL OR NULL-> NULL (Postgres)
    ]
    out = stg_arrears_daily(spark.createDataFrame(rows, schema=ARREARS_DPD_STATUS)).collect()
    flags = [r["npl_flag"] for r in out]
    assert flags[0] is True
    assert flags[1] is True
    assert flags[2] is True
    assert flags[3] is False
    assert flags[4] is None


def test_staging_projections_shape(staging):
    assert set(staging["stg_loan_contract"].columns) == {
        "loan_id", "borrower_id", "application_id", "product_type", "currency",
        "origination_date", "disbursement_date", "maturity_date",
        "principal_original", "principal_current", "term_months",
        "interest_rate_type", "interest_rate_current", "repayment_method",
        "payment_frequency", "grace_period_months", "status",
    }
    assert set(staging["stg_payments"].columns) == {
        "payment_id", "loan_id", "payment_date", "value_date", "currency",
        "amount_received", "payment_channel", "external_reference", "status",
    }
    assert set(staging["stg_writeoff_recovery"].columns) == {
        "loan_id", "writeoff_date", "writeoff_amount_principal",
        "writeoff_amount_interest", "writeoff_amount_fees",
        "recovery_amount", "recovery_date",
    }
