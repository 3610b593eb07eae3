"""DPD bucketing / NPL flag expressions.

Reference: dbt/credit_mart/models/staging/stg_arrears_daily.sql:14-22.
Buckets are ALWAYS derived in staging from ``days_past_due`` — the
generator-side ``arrears_bucket`` column emits ``'>90'``
(pg_oltp_synth.py:85) while staging recomputes ``'90+'``; the staging
derivation is authoritative (SURVEY.md §7g).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dpd_bucket_expr(days_past_due: Column) -> Column:
    """Searched CASE over days-past-due (stg_arrears_daily.sql:14-20).

    NULL days_past_due falls through to the ELSE branch ('90+'), exactly as
    the reference's searched CASE does in Postgres.
    """
    return (
        F.when(days_past_due <= 0, F.lit("0"))
        .when(days_past_due.between(1, 30), F.lit("1-30"))
        .when(days_past_due.between(31, 60), F.lit("31-60"))
        .when(days_past_due.between(61, 90), F.lit("61-90"))
        .otherwise(F.lit("90+"))
    )


def npl_flag_expr(
    nonperforming_flag: Column, default_flag: Column, days_past_due: Column
) -> Column:
    """``coalesce(npf,false) OR coalesce(def,false) OR dpd > 90``
    (stg_arrears_daily.sql:22) — three-valued OR preserved (NULL dpd with
    both flags false yields NULL, as in Postgres)."""
    return (
        F.coalesce(nonperforming_flag, F.lit(False))
        | F.coalesce(default_flag, F.lit(False))
        | (days_past_due > 90)
    )
