"""CDC apply semantics (upsert / delete / latest-wins) and the no-target-
shuffle plan shape."""

from __future__ import annotations

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
