"""Temporal operators: interval join vs a brute-force cross join, rollup
level consistency, SCD2 island semantics — plus the physical-plan shapes
that make them scale (no cartesian product, single scan, one shuffle)."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.operators.temporal import (
    hypertable_rollup,
    interval_join,
    scd2_from_changelog,
)

_T0 = dt.datetime(2024, 1, 1)


def _ts(s: float) -> dt.datetime:
    return _T0 + dt.timedelta(seconds=s)


def test_interval_join_matches_bruteforce(spark):
    rng = random.Random(11)
    points = [(i, _ts(rng.uniform(0, 50_000))) for i in range(300)]
    intervals = [
        (j, _ts(s := rng.uniform(0, 50_000)), _ts(s + rng.uniform(1, 8_000)))
        for j in range(40)
    ]
    p = spark.createDataFrame(points, "pid int, ts timestamp")
    i = spark.createDataFrame(intervals, "iid int, start timestamp, end timestamp")
    for width in (60, 900, 7200, 100_000):
        got = {
            (r["pid"], r["iid"])
            for r in interval_join(p, i, bucket_seconds=width).collect()
        }
        want = {
            (pid, iid)
            for pid, ts in points
            for iid, s, e in intervals
            if s <= ts < e
        }
        assert got == want, f"width={width}"


def test_interval_join_plan_is_hash_join_not_cartesian(spark):
    p = spark.createDataFrame([(1, _ts(10))], "pid int, ts timestamp")
    i = spark.createDataFrame(
        [(1, _ts(0), _ts(100))], "iid int, start timestamp, end timestamp"
    )
    plan = interval_join(p, i)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_hypertable_levels_are_consistent(spark):
    rng = random.Random(3)
    rows = [
        (_ts(rng.uniform(0, 30 * 86400)), rng.choice("ab"), round(rng.uniform(0, 99), 2))
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = hypertable_rollup(df, dims=("event_type",)).collect()
    by_res: dict[int, list] = {}
    for r in out:
        by_res.setdefault(r["resolution_s"], []).append(r)
    assert set(by_res) == {3600, 86400, 604800}
    # every level preserves total count and total (decimal-exact) sum
    for res, rs in by_res.items():
        assert sum(r["n_events"] for r in rs) == 500, res
        assert abs(sum(r["sum_value"] for r in rs) - sum(v for _, _, v in rows)) < 1e-6
    # coarse buckets contain their fine buckets' counts
    day = {(r["bucket_start"], r["event_type"]): r["n_events"] for r in by_res[86400]}
    for r in by_res[3600]:
        d = r["bucket_start"].replace(hour=0)
        assert day[(d, r["event_type"])] >= r["n_events"]


def test_hypertable_reuses_shared_prefix_or_materializes(spark):
    df = spark.createDataFrame(
        [(_ts(0), "a", 1.0)], "ts timestamp, event_type string, value double"
    )
    # declarative: identical shuffle subtrees dedupe at runtime
    out = hypertable_rollup(df, dims=("event_type",))
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, plan
    # materialized: each level is a checkpointed RDD; coarse levels never
    # reach back to the raw relation (3 checkpoint leaves, nothing else)
    mat = hypertable_rollup(df, dims=("event_type",), materialize=True)
    leaves = mat._jdf.queryExecution().optimizedPlan().collectLeaves()
    assert leaves.size() == 3, leaves.toString()
    assert mat.count() == out.count()


def test_hypertable_rejects_non_nesting_resolutions(spark):
    df = spark.createDataFrame([(_ts(0), 1.0)], "ts timestamp, value double")
    import pytest

    with pytest.raises(ValueError):
        hypertable_rollup(df, resolutions=(3600, 5000))


def test_scd2_runs_and_validity_chain(spark):
    rows = [
        (1, "A", _ts(0), 100),
        (1, "A", _ts(10), 101),
        (1, "B", _ts(20), 102),
        (1, "A", _ts(30), 103),
        (2, "X", _ts(5), 104),
    ]
    df = spark.createDataFrame(rows, "k int, attr string, ts timestamp, id int")
    out = sorted(
        scd2_from_changelog(df, key="k", attr="attr", ts_col="ts", tiebreak="id").collect(),
        key=lambda r: (r["k"], r["version"]),
    )
    u1 = [r for r in out if r["k"] == 1]
    assert [(r["attr"], r["n_changes"], r["is_current"]) for r in u1] == [
        ("A", 2, False),
        ("B", 1, False),
        ("A", 1, True),
    ]
    # valid_to chains to the next valid_from, open-ended tail
    assert u1[0]["valid_to"] == u1[1]["valid_from"]
    assert u1[1]["valid_to"] == u1[2]["valid_from"]
    assert u1[2]["valid_to"] is None
    assert [r["version"] for r in u1] == [1, 2, 3]
    u2 = [r for r in out if r["k"] == 2]
    assert len(u2) == 1 and u2[0]["is_current"]


def test_scd2_single_shuffle(spark):
    df = spark.createDataFrame(
        [(1, "A", _ts(0), 1)], "k int, attr string, ts timestamp, id int"
    )
    plan = (
        scd2_from_changelog(df, key="k", attr="attr", ts_col="ts", tiebreak="id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # lag + running-sum + groupBy + lead all share the key partitioning:
    # exactly one hash exchange
    assert plan.count("Exchange hashpartitioning") == 1, plan
