"""Local replica of the driver's correctness gate: every ``queries()`` entry
vs its ``oracle_sql()`` in DuckDB on the same parquet tables.

Runs at sf0.001 by default (fast); set SPARK_GRAFT_TEST_SF_DIR to check a
bigger scale factor (the driver gates at sf0.01).
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tests.duck_oracle import assert_frames_match

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def test_oracle_coverage():
    """Every query has an oracle (any intentional rows-only entries must be
    listed here explicitly)."""
    rows_only = set()  # none currently
    assert set(entry_mod.oracle_sql()) == set(entry_mod.queries()) - rows_only


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        df = q(spark, SF_DIR)
        assert df.count() >= 0  # rows-only check, like the driver's
        return
    # rtol=atol=0: bit-exact, matching the driver's value-hash gate
    assert_frames_match(q(spark, SF_DIR), duck.execute(sql).df(), rtol=0, atol=0)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
