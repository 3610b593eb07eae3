"""credit_abs_oltp_to_mart_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of jalalabiyev/credit-abs-oltp-to-mart.

The reference is a Postgres/dbt/Airflow credit-ABS pipeline (OLTP synth ->
staging -> marts). This package re-expresses it Spark-first:

- ``generator``  — the synthetic credit-OLTP generator as a distributed,
  deterministic Spark job (reference: airflows/generator/pg_oltp_synth.py).
- ``operators.staging`` — the 4 dbt staging models as DataFrame transforms
  (reference: dbt/credit_mart/models/staging/*.sql).
- ``operators.marts`` — the 7 dbt mart models (reference:
  dbt/credit_mart/models/marts/*.sql).
- ``plans`` — the dbt DAG as explicit function composition + dbt-style
  schema checks (reference: dbt/credit_mart/models/staging/schema.yml).
- ``operators.dedup`` / ``operators.ann`` / ``operators.textops`` /
  ``operators.multimodal`` — large-scale training-data-pipeline extensions
  (dedup, similarity search, text analysis, multimodal plumbing) beyond the
  reference surface.
- ``streaming`` — Structured-Streaming ingestion of the daily arrears feed
  (the reference's arrears_dpd_status daily snapshot as a stream).

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join strategy, and whole-stage codegen; Python UDFs appear only as
Arrow-batched pandas UDFs in the explicitly-marked slow paths.
"""

__version__ = "0.1.0"
