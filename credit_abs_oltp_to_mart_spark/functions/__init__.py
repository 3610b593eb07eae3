"""Reusable column-expression builders (all pure built-in ``F.*`` — JVM-side,
whole-stage-codegen friendly; no Python UDFs in any hot path)."""

from credit_abs_oltp_to_mart_spark.functions.buckets import dpd_bucket_expr, npl_flag_expr
from credit_abs_oltp_to_mart_spark.functions.dates import (
    month_start,
    months_on_book,
    quarter_start,
)

__all__ = [
    "dpd_bucket_expr",
    "npl_flag_expr",
    "month_start",
    "quarter_start",
    "months_on_book",
]
