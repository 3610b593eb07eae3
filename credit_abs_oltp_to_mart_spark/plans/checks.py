"""dbt schema tests as DataFrame assertions (reference E3, SURVEY.md §3/§5).

``dbt test`` expands schema.yml:1-30 into three query shapes; each returns
the count of violating rows (a test passes iff 0):

- ``unique``        -> GROUP BY key HAVING count(*) > 1
- ``not_null``      -> WHERE key IS NULL
- ``relationships`` -> child LEFT ANTI JOIN parent (J4)

``run_schema_tests`` runs the exact test set the reference declares, plus
the README's manual data-quality audits (README.MD:31-45) codified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def not_null(df: DataFrame, column: str) -> int:
    """Violations of ``not_null`` (schema.yml e.g. :5, :12, :18, :23)."""
    return df.where(F.col(column).isNull()).count()


def unique(df: DataFrame, column: str) -> int:
    """Violations of ``unique`` (schema.yml:6, :24): number of duplicated keys."""
    return (
        df.groupBy(column).agg(F.count(F.lit(1)).alias("cnt")).where("cnt > 1").count()
    )


def relationships(child: DataFrame, child_col: str, parent: DataFrame, parent_col: str) -> int:
    """Violations of ``relationships`` (schema.yml:14-17, 26-30): child keys
    with no parent — broadcast left-anti join (J4)."""
    p = F.broadcast(parent.select(F.col(parent_col).alias(child_col)).distinct())
    return child.select(child_col).where(F.col(child_col).isNotNull()).join(
        p, child_col, "left_anti"
    ).count()


def run_schema_tests(staging: dict[str, DataFrame]) -> dict[str, int]:
    """The reference's full declared test set (schema.yml:1-30). All values
    must be 0."""
    loan = staging["stg_loan_contract"]
    arrears = staging["stg_arrears_daily"]
    pay = staging["stg_payments"]
    return {
        "stg_loan_contract.loan_id.not_null": not_null(loan, "loan_id"),
        "stg_loan_contract.loan_id.unique": unique(loan, "loan_id"),
        "stg_arrears_daily.loan_id.not_null": not_null(arrears, "loan_id"),
        "stg_arrears_daily.loan_id.relationships": relationships(
            arrears, "loan_id", loan, "loan_id"
        ),
        "stg_arrears_daily.as_of_date.not_null": not_null(arrears, "as_of_date"),
        "stg_payments.payment_id.not_null": not_null(pay, "payment_id"),
        "stg_payments.payment_id.unique": unique(pay, "payment_id"),
        "stg_payments.loan_id.not_null": not_null(pay, "loan_id"),
        "stg_payments.loan_id.relationships": relationships(
            pay, "loan_id", loan, "loan_id"
        ),
    }


def run_audit_checks(tables: dict[str, DataFrame]) -> dict[str, int]:
    """README.MD:31-45 manual data-quality audits, codified. All 0 = clean.

    - no future business dates
    - chronology: origination <= disbursement <= maturity
    - arrears natural-key uniqueness (pg_oltp_synth.py:791)
    """
    out: dict[str, int] = {}
    loan = tables.get("loan_contract")
    if loan is not None:
        out["loan_contract.chronology"] = loan.where(
            (F.col("origination_date") > F.col("disbursement_date"))
            | (F.col("disbursement_date") > F.col("maturity_date"))
        ).count()
        out["loan_contract.no_future_origination"] = loan.where(
            F.col("origination_date") > F.current_date()
        ).count()
    arrears = tables.get("arrears_dpd_status")
    if arrears is not None:
        out["arrears.natural_key_unique"] = (
            arrears.groupBy("loan_id", "as_of_date")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .where("cnt > 1")
            .count()
        )
    return out
