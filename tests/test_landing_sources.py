"""CSV / JSON landing-zone ingestion: explicit-schema reads round-trip the
lake, malformed rows quarantine instead of failing the job."""

from __future__ import annotations

from credit_abs_oltp_to_mart_spark.sources.readers import (
    quarantine_split,
    read_landing_csv,
    read_landing_json,
)


def test_csv_roundtrip_clean(spark, oltp, tmp_path):
    loans = oltp["loan_contract"]
    p = str(tmp_path / "lc_csv")
    loans.write.option("header", "true").mode("overwrite").csv(p)
    clean, bad = quarantine_split(read_landing_csv(spark, p, "loan_contract"))
    assert bad.count() == 0
    assert clean.count() == loans.count()
    cols = ["loan_id", "principal_original", "origination_date", "status"]
    a = [tuple(r) for r in loans.select(*cols).orderBy("loan_id").collect()]
    b = [tuple(r) for r in clean.select(*cols).orderBy("loan_id").collect()]
    assert a == b


def test_json_quarantines_malformed_rows(spark, oltp, tmp_path):
    loans = oltp["loan_contract"].limit(5)
    p = tmp_path / "lc_json"
    loans.coalesce(1).write.mode("overwrite").json(str(p))
    (p / "zz_bad.json").write_text('{"loan_id": truncated\nnot json at all\n')
    clean, bad = quarantine_split(read_landing_json(spark, str(p), "loan_contract"))
    assert clean.count() == 5
    assert bad.count() == 2
    # quarantined rows carry the raw line for replay
    raw = {r["_corrupt_record"] for r in bad.collect()}
    assert "not json at all" in raw


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Lake reality: later batches add columns. mergeSchema unions the
    footers; early files surface nulls for the new column."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "evolving")
    spark.range(5).select(F.col("id"), F.lit("a").alias("v1")).write.parquet(
        p + "/batch=1"
    )
    spark.range(5, 8).select(
        F.col("id"), F.lit("b").alias("v1"), F.lit(2.5).alias("v2")
    ).write.parquet(p + "/batch=2")
    df = spark.read.option("mergeSchema", "true").parquet(p + "/batch=*")
    assert set(df.columns) == {"id", "v1", "v2"}
    assert df.count() == 8
    assert df.where(F.col("v2").isNull()).count() == 5
    assert df.where(F.col("v2") == 2.5).count() == 3
