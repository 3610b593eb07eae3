"""Randomized property tests for the custom operators, against independent
pure-Python/pandas reference implementations. Seeded and deterministic;
exercises edges the driver corpus doesn't hit (timestamp ties, empty
matches, single-element blocks, short docs)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.functions.skew import salted_agg
from credit_abs_oltp_to_mart_spark.operators.asof import asof_join
from credit_abs_oltp_to_mart_spark.operators.dedup import (
    embedding_near_dups,
    shingle_rows,
)

SEEDS = [7, 42, 1337]


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.mark.parametrize("seed", SEEDS)
def test_asof_join_matches_bruteforce(spark, seed):
    rng = np.random.RandomState(seed)
    base = dt.datetime(2024, 1, 1)
    # coarse timestamp grid => plenty of exact ties across and within sides
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 4, 60),
            "ts": [base + dt.timedelta(hours=int(h)) for h in rng.randint(0, 20, 60)],
            "lid": np.arange(60),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.randint(0, 4, 40),
            "ts": [base + dt.timedelta(hours=int(h)) for h in rng.randint(0, 20, 40)],
            "rid": np.arange(40),
            "payload": rng.randint(0, 1000, 40),
        }
    )
    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        keys=["k"],
        ts_col="ts",
        right_order="rid",
    )

    def expected_row(lrow):
        cand = right[(right["k"] == lrow["k"]) & (right["ts"] <= lrow["ts"])]
        if cand.empty:
            return (lrow["lid"], None, None)
        # backward-inclusive; ties at equal ts -> largest rid wins
        best = cand.sort_values(["ts", "rid"]).iloc[-1]
        return (lrow["lid"], int(best["rid"]), int(best["payload"]))

    exp = sorted(expected_row(r) for _, r in left.iterrows())
    assert _rows(got, ["lid", "rid", "payload"]) == exp


@pytest.mark.parametrize("seed", SEEDS)
def test_salted_agg_equals_plain_groupby(spark, seed):
    rng = np.random.RandomState(seed)
    pdf = pd.DataFrame(
        {
            "key": rng.choice(["a", "b", "c"], 500),
            "v": rng.randint(-100, 100, 500),
            "id": np.arange(500),
        }
    )
    df = spark.createDataFrame(pdf)
    got = salted_agg(
        df,
        keys=["key"],
        sum_cols={"v_sum": F.col("v")},
        count_alias="n",
        min_cols={"v_min": F.col("v")},
        max_cols={"v_max": F.col("v")},
        n_salt=int(rng.randint(2, 100)),
        salt_on=F.col("id"),
    )
    exp = df.groupBy("key").agg(
        F.sum("v").alias("v_sum"),
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("v_min"),
        F.max("v").alias("v_max"),
    )
    cols = ["key", "v_sum", "n", "v_min", "v_max"]
    assert _rows(got, cols) == _rows(exp, cols)


@pytest.mark.parametrize("seed,n_blocks", [(7, 1), (42, 3), (1337, 50)])
def test_embedding_near_dups_matches_naive(spark, seed, n_blocks):
    rng = np.random.RandomState(seed)
    n, dim = 40, 8
    vecs = rng.randn(n, dim).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": np.arange(n), "embedding": list(map(list, vecs))})
    thr = 0.2
    got = embedding_near_dups(
        spark.createDataFrame(pdf), threshold=thr, n_blocks=n_blocks
    )
    v64 = vecs.astype(np.float64)
    exp = []
    for i in range(n):
        for j in range(i + 1, n):
            # same sequential-fold arithmetic as the operator
            d = 0.0
            na = 0.0
            nb = 0.0
            for t in range(dim):
                d += v64[i, t] * v64[j, t]
                na += v64[i, t] * v64[i, t]
                nb += v64[j, t] * v64[j, t]
            c = d / (np.sqrt(na) * np.sqrt(nb))
            c = np.copysign(np.floor(abs(c) * 1e6 + 0.5), c) / 1e6
            if c >= thr:
                exp.append((i, j, c))
    assert _rows(got, ["id_a", "id_b", "cosine"]) == sorted(exp)


def test_shingle_rows_edges(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3, 4],
                "text": [
                    "",  # empty -> single empty shingle
                    "one two",  # < n tokens -> whole text
                    "a b c",  # exactly n -> one shingle
                    "a b c d",  # two shingles
                    "  x   y  z   w ",  # whitespace runs collapse
                ],
            }
        )
    )
    got = _rows(shingle_rows(docs, n=3), ["doc_id", "shingle"])
    assert got == sorted(
        [
            (0, ""),
            (1, "one two"),
            (2, "a b c"),
            (3, "a b c"),
            (3, "b c d"),
            (4, "x y z"),
            (4, "y z w"),
        ]
    )
