"""Custom Python DataSource (sources/pysource.py): planning, determinism,
and filter pushdown."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.sources.pysource import (
    CreditSynthReader,
    register,
)


@pytest.fixture(scope="module")
def synth(spark):
    register(spark)
    return spark.read.format("credit_synth").option("rows", 5000)


def test_planning_and_row_count(synth):
    df = synth.load()
    assert df.count() == 5000
    assert df.rdd.getNumPartitions() == 8  # default numpartitions
    assert df.columns == [
        "event_id", "loan_id", "product_type", "amount", "days_past_due"
    ]


def test_deterministic_across_partitionings(synth):
    a = synth.load()
    b = synth.option("numpartitions", 3).load()
    key = lambda df: sorted(tuple(r) for r in df.collect())
    assert key(a) == key(b)


def test_filter_pushdown_into_source(synth):
    # handled: equality / IN on product_type prunes inside the reader;
    # result must equal post-hoc filtering of the unfiltered read
    df = synth.load()
    exp = {r["event_id"] for r in df.collect() if r["product_type"] == "auto"}
    got = {
        r["event_id"]
        for r in synth.load().where(F.col("product_type") == "auto").collect()
    }
    assert got == exp and got


def test_push_filters_contract():
    # unit: reader keeps product_type filters, returns the rest to Spark
    from pyspark.sql.datasource import EqualTo, GreaterThan

    r = CreditSynthReader({"rows": "10"})
    rest = list(
        r.pushFilters(
            [EqualTo(("product_type",), "sme"), GreaterThan(("amount",), 5.0)]
        )
    )
    assert r.keep_products == ["sme"]
    assert len(rest) == 1 and isinstance(rest[0], GreaterThan)


def test_arrow_batch_read_applies_pushed_filter():
    import pyarrow as pa

    from credit_abs_oltp_to_mart_spark.sources.pysource import (
        _SlicePartition,
    )

    r = CreditSynthReader({"rows": "1000"})
    r.keep_products = ["mortgage"]
    batches = list(r.read(_SlicePartition(0, 1000)))
    assert all(isinstance(b, pa.RecordBatch) for b in batches)
    tbl = pa.Table.from_batches(batches)
    assert set(tbl.column("product_type").to_pylist()) == {"mortgage"}
    assert 0 < tbl.num_rows < 1000


def test_stream_source_microbatches(spark, tmp_path):
    # micro-batch stream: offsets advance by rowsPerBatch, rows are the
    # same deterministic feed as the batch source
    register(spark)
    stream = (
        spark.readStream.format("credit_synth")
        .option("rowsPerBatch", 500)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("mem_synth_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    import time

    deadline = time.time() + 60
    while time.time() < deadline:
        n = spark.table("mem_synth_stream").count()
        if n >= 1500:
            break
        time.sleep(0.5)
    q.stop()
    got = spark.table("mem_synth_stream")
    n = got.count()
    assert n >= 1500 and n % 500 == 0, n
    # prefix must equal the batch source's first n rows (same seed)
    batch = (
        spark.read.format("credit_synth").option("rows", n).load()
    )
    key = lambda df: sorted(tuple(r) for r in df.collect())
    assert key(got) == key(batch)
