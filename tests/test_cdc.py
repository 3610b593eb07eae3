"""CDC apply semantics (upsert / delete / latest-wins) and the no-target-
shuffle plan shape."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.operators.cdc import apply_cdc


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id bigint, name string, bal double",
    )


def test_upsert_delete_insert(spark):
    changes = spark.createDataFrame(
        [
            (2, "b2", 21.0, "U"),   # update
            (3, None, 0.0, "D"),    # delete
            (9, "new", 90.0, "I"),  # insert
        ],
        "id bigint, name string, bal double, op string",
    )
    out = {
        r["id"]: (r["name"], r["bal"])
        for r in apply_cdc(_target(spark), changes, key="id").collect()
    }
    assert out == {1: ("a", 10.0), 2: ("b2", 21.0), 9: ("new", 90.0)}


def test_latest_change_wins_with_seq(spark):
    changes = spark.createDataFrame(
        [
            (2, "v1", 1.0, "U", 1),
            (2, "v2", 2.0, "U", 2),
            (2, "v3", 3.0, "D", 3),   # final op for key 2 is delete
            (9, "x1", 1.0, "I", 1),
            (9, "x2", 2.0, "U", 2),   # final op for key 9 is upsert
        ],
        "id bigint, name string, bal double, op string, seq int",
    )
    out = {
        r["id"]: (r["name"], r["bal"])
        for r in apply_cdc(
            _target(spark), changes, key="id", seq_col="seq"
        ).collect()
    }
    assert out == {1: ("a", 10.0), 3: ("c", 30.0), 9: ("x2", 2.0)}


def test_idempotent_reapply(spark):
    changes = spark.createDataFrame(
        [(2, "b2", 21.0, "U"), (3, None, 0.0, "D")],
        "id bigint, name string, bal double, op string",
    )
    once = apply_cdc(_target(spark), changes, key="id")
    twice = apply_cdc(once, changes, key="id")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_target_joins_via_broadcast_anti_not_sortmerge(spark):
    changes = spark.createDataFrame(
        [(2, "b2", 21.0, "U")], "id bigint, name string, bal double, op string"
    )
    plan = (
        apply_cdc(_target(spark), changes, key="id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan, plan


@pytest.mark.slow
def test_streaming_arrears_feed_maintains_current_dpd(spark, oltp_dir, tmp_path):
    """Domain wiring: the daily arrears snapshot feed (the reference's
    workhorse table) streamed in as_of_date slices keeps a latest-DPD-per-
    loan snapshot current via foreachBatch + apply_cdc — per-batch work
    scales with the slice, and the final state equals the batch answer
    regardless of slice boundaries."""
    import os
    import shutil
    import time

    from pyspark.sql import functions as F

    from credit_abs_oltp_to_mart_spark.operators.cdc import apply_cdc
    from credit_abs_oltp_to_mart_spark.sources.readers import read_oltp_table

    arrears = read_oltp_table(spark, oltp_dir, "arrears_dpd_status").select(
        "loan_id", "as_of_date", "days_past_due", "arrears_bucket"
    )
    # three contiguous as_of_date slices, oldest first, as a file stream
    bounds = arrears.select(
        F.expr("percentile_approx(cast(cast(as_of_date as timestamp) as double), array(0.33, 0.66), 10000)")
    ).first()[0]
    d = F.col("as_of_date").cast("timestamp").cast("double")
    slices = [
        arrears.where(d <= bounds[0]),
        arrears.where((d > bounds[0]) & (d <= bounds[1])),
        arrears.where(d > bounds[1]),
    ]
    src = tmp_path / "arrears_feed"
    for i, sl in enumerate(slices):
        sl.coalesce(1).write.parquet(str(src / f"s={i}"))
        time.sleep(1.1)

    snap_dir = str(tmp_path / "dpd_current")

    def _merge(batch_df, batch_id):
        s = batch_df.sparkSession
        changes = batch_df.withColumn("op", F.lit("U")).withColumn(
            "seq", F.col("as_of_date")
        )
        if os.path.exists(snap_dir):
            target = s.read.parquet(snap_dir)
        else:
            target = s.createDataFrame([], batch_df.schema)
        new = apply_cdc(target, changes, key="loan_id", seq_col="seq")
        tmp_out = snap_dir + ".tmp"
        new.write.mode("overwrite").parquet(tmp_out)
        if os.path.exists(snap_dir):
            shutil.rmtree(snap_dir)
        os.rename(tmp_out, snap_dir)

    stream = (
        spark.readStream.schema(slices[0].schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(str(src / "s=*"))
    )
    q = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(snap_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("loan_id").orderBy(F.col("as_of_date").desc())
    exp = (
        arrears.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    key = lambda df: sorted(
        (r["loan_id"], r["as_of_date"], r["days_past_due"]) for r in df.collect()
    )
    assert got.count() == exp.count()
    assert key(got) == key(exp)
