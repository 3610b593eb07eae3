"""The dbt DAG as explicit function composition + dbt-style data checks."""

from credit_abs_oltp_to_mart_spark.plans.checks import (
    not_null,
    relationships,
    run_schema_tests,
    unique,
)
from credit_abs_oltp_to_mart_spark.plans.pipeline import build_marts, build_staging

__all__ = [
    "build_staging",
    "build_marts",
    "not_null",
    "unique",
    "relationships",
    "run_schema_tests",
]
