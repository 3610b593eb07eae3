"""epoch_shuffle: the seeded per-epoch read order over packed (shard,
bin) units. The bucketed distributed rank must equal a naive global
rank, every epoch is a permutation, and seeds decorrelate orderings.
Values on the real tables are oracle-gated in test_entry_contract."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.functions.similarity import md5_long
from credit_abs_oltp_to_mart_spark.operators import curation


def _manifest(spark, n_shards=4, n_bins=13):
    rows = [
        (s, b, 256 + s + b) for s in range(n_shards) for b in range(n_bins)
    ]
    return spark.createDataFrame(
        rows, "shard int, bin int, filled_tokens long"
    )


def test_bucketed_rank_equals_global_rank(spark):
    mf = _manifest(spark)
    got = curation.epoch_shuffle(mf, seed=3, n_buckets=8)
    key = md5_long(
        F.concat(
            F.lit("epoch:3:"),
            F.col("shard").cast("string"),
            F.lit(":"),
            F.col("bin").cast("string"),
        )
    )
    naive = mf.select(
        F.row_number()
        .over(Window.orderBy(key.asc(), "shard", "bin"))
        .cast("long")
        .alias("read_order"),
        "shard",
        "bin",
        "filled_tokens",
    )
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0


def test_epoch_is_permutation_and_seeds_differ(spark):
    mf = _manifest(spark)
    n = mf.count()
    e0 = curation.epoch_shuffle(mf, seed=0)
    e1 = curation.epoch_shuffle(mf, seed=1)
    assert sorted(r["read_order"] for r in e0.collect()) == list(
        range(1, n + 1)
    )
    # same seed replays bit-exactly
    again = curation.epoch_shuffle(mf, seed=0)
    assert e0.exceptAll(again).count() == 0
    # different seeds give a different order over the same units
    o0 = {(r["shard"], r["bin"]): r["read_order"] for r in e0.collect()}
    o1 = {(r["shard"], r["bin"]): r["read_order"] for r in e1.collect()}
    assert set(o0) == set(o1)
    assert o0 != o1


def test_bucket_is_exact_integer_quotient(spark):
    """The bucket must be the EXACT integer quotient key div step —
    md5_long keys reach 2^60 > 2^53, so a float-division implementation
    can misplace keys near slice boundaries. Checked against Python
    bigint division on a manifest large enough to land keys everywhere
    in the range."""
    n_buckets = 64
    step = (1 << 60) // n_buckets
    mf = _manifest(spark, n_shards=16, n_bins=64)
    key = md5_long(
        F.concat(
            F.lit("epoch:7:"),
            F.col("shard").cast("string"),
            F.lit(":"),
            F.col("bin").cast("string"),
        )
    )
    # the operator's own plan must carry the integer `div`, not a
    # float division recast to long
    plan = curation.epoch_shuffle(
        mf, seed=7, n_buckets=n_buckets
    )._jdf.queryExecution().analyzed().toString()
    assert f"div {step}" in plan, plan
    rows = (
        mf.select(key.alias("k"))
        .withColumn("bkt", F.expr(f"k div {step}L"))
        .collect()
    )
    assert rows, "manifest produced no keys"
    for r in rows:
        assert r["bkt"] == r["k"] // step


def test_n_buckets_must_be_power_of_two(spark):
    with pytest.raises(ValueError, match="power of two"):
        curation.epoch_shuffle(_manifest(spark), seed=0, n_buckets=100)


def test_rank_window_is_bucket_partitioned(spark):
    """The plan must never contain a single-partition global sort window:
    the row_number partitions by the key bucket (parallel at any manifest
    size); the only non-partitioned exchange allowed is the tiny
    offsets-frame broadcast."""
    got = curation.epoch_shuffle(_manifest(spark), seed=0, n_buckets=8)
    p = got._jdf.queryExecution().executedPlan().toString()
    assert "partitionBy" not in p  # sanity: physical plan text
    assert "Exchange SinglePartition" not in p, p
