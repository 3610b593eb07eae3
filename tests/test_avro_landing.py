"""Pure-Python Avro container files: codec round-trips, corruption
detection, and the Spark DataSource path (schema mapping, multi-file
partitions, null handling)."""

from __future__ import annotations

import pytest

from credit_abs_oltp_to_mart_spark.sources.avro_py import (
    avro_schema_to_ddl,
    read_avro_file,
    register,
    write_avro,
)

SCHEMA = {
    "type": "record",
    "name": "payment",
    "fields": [
        {"name": "payment_id", "type": "long"},
        {"name": "loan_id", "type": "long"},
        {"name": "amount", "type": "double"},
        {"name": "channel", "type": ["null", "string"]},
        {"name": "attempts", "type": "int"},
        {"name": "ok", "type": "boolean"},
    ],
}


def _rows(n: int, start: int = 0):
    return [
        {
            "payment_id": start + i,
            "loan_id": (start + i) % 7,
            "amount": round(100.0 + i * 0.25, 2),
            "channel": None if i % 5 == 0 else f"ch{i % 3}",
            "attempts": i % 4,
            "ok": i % 2 == 0,
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip(tmp_path, codec):
    rows = _rows(2500)  # > rows_per_block -> multiple blocks
    p = str(tmp_path / f"{codec}.avro")
    write_avro(p, SCHEMA, rows, codec=codec)
    schema, got = read_avro_file(p)
    assert schema == SCHEMA
    assert got == rows


def test_corrupt_sync_marker_detected(tmp_path):
    p = str(tmp_path / "x.avro")
    write_avro(p, SCHEMA, _rows(10), codec="null")
    blob = bytearray(open(p, "rb").read())
    blob[-1] ^= 0xFF  # flip a byte in the trailing sync marker
    open(p, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="sync marker"):
        read_avro_file(p)


def test_not_avro_rejected(tmp_path):
    p = str(tmp_path / "x.avro")
    open(p, "wb").write(b"PAR1 not avro")
    with pytest.raises(ValueError, match="not an Avro"):
        read_avro_file(p)


def test_schema_ddl_mapping():
    assert avro_schema_to_ddl(SCHEMA) == (
        "payment_id bigint, loan_id bigint, amount double, "
        "channel string, attempts int, ok boolean"
    )


@pytest.mark.slow
def test_spark_reads_avro_landing_dir(spark, tmp_path):
    register(spark)
    write_avro(str(tmp_path / "a.avro"), SCHEMA, _rows(120, 0))
    write_avro(str(tmp_path / "b.avro"), SCHEMA, _rows(80, 1000), codec="null")
    df = spark.read.format("avro_py").load(str(tmp_path))
    assert df.schema.simpleString() == (
        "struct<payment_id:bigint,loan_id:bigint,amount:double,"
        "channel:string,attempts:int,ok:boolean>"
    )
    assert df.count() == 200
    assert df.rdd.getNumPartitions() == 2  # one partition per file
    got = {r.payment_id for r in df.where("channel is null").collect()}
    want = {r["payment_id"] for r in _rows(120) + _rows(80, 1000) if r["channel"] is None}
    assert got == want
    # values survive the full decode -> Arrow -> Spark path
    from pyspark.sql import functions as F

    total = df.agg(F.sum("amount").alias("s")).collect()[0].s
    assert round(total, 2) == round(
        sum(r["amount"] for r in _rows(120) + _rows(80, 1000)), 2
    )
