"""Gap-fill (dense spine + LOCF) and blocked fuzzy-match edge cases."""

from __future__ import annotations

import datetime as dt

from credit_abs_oltp_to_mart_spark.operators.fuzzy import fuzzy_match
from credit_abs_oltp_to_mart_spark.operators.gapfill import gap_fill_locf


def _day(d: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=d, hours=3)


def test_gap_fill_locf_fills_and_flags(spark):
    rows = [
        (1, _day(0), 10.0),
        (1, _day(0), 5.0),   # same bucket, aggregates
        (1, _day(3), 7.0),   # days 1-2 are gaps
        (2, _day(5), 1.0),   # single-day key: no gaps
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    out = {
        (r["user_id"], r["bucket"]): (r["n_events"], r["locf_value"], r["is_gap"])
        for r in gap_fill_locf(df, key="user_id").collect()
    }
    base = dt.date(2024, 1, 1).toordinal() - dt.date(1970, 1, 1).toordinal()
    assert out[(1, base + 0)] == (2, 15.0, False)
    assert out[(1, base + 1)] == (0, 15.0, True)   # LOCF carries 15.0
    assert out[(1, base + 2)] == (0, 15.0, True)
    assert out[(1, base + 3)] == (1, 7.0, False)
    assert out[(2, base + 5)] == (1, 1.0, False)
    assert len(out) == 5  # dense spine per key, nothing beyond ranges


def test_fuzzy_match_best_and_threshold(spark):
    probes = spark.createDataFrame(
        [(1, "abcdef", "x"), (2, "zzzzzz", "x"), (3, "abc", "y")],
        "probe_id int, name string, blk string",
    )
    cands = spark.createDataFrame(
        [
            (10, "abcdef", "x"),  # exact for probe 1
            (11, "abcdeX", "x"),  # distance 1
            (12, "abd", "y"),     # distance 1 from "abc"
            (13, "abe", "y"),     # also distance 1 -> loses id tiebreak
        ],
        "cand_id int, name string, blk string",
    )
    got = {
        r["probe_id"]: (r["cand_id"], r["distance"])
        for r in fuzzy_match(
            probes.withColumnRenamed("name", "pname"),
            cands.withColumnRenamed("name", "cname"),
            probe_id="probe_id", probe_col="pname",
            cand_id="cand_id", cand_col="cname",
            block_cols=["blk"], max_distance=2,
        ).collect()
    }
    assert got == {1: (10, 0), 3: (12, 1)}  # probe 2: nothing within 2


def test_fuzzy_match_respects_blocks(spark):
    probes = spark.createDataFrame(
        [(1, "same", "a")], "probe_id int, pname string, blk string"
    )
    cands = spark.createDataFrame(
        [(10, "same", "b")], "cand_id int, cname string, blk string"
    )
    assert (
        fuzzy_match(
            probes, cands, probe_id="probe_id", probe_col="pname",
            cand_id="cand_id", cand_col="cname", block_cols=["blk"],
            max_distance=5,
        ).count()
        == 0
    )
