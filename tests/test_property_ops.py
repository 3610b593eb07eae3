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


@pytest.mark.parametrize("seed", SEEDS)
def test_incremental_minhash_matches_python_reference(spark, seed):
    """incremental_minhash_pairs vs an independent pure-Python pipeline:
    md5 shingle hashing, universal-hash signatures, band collisions, and
    the component-agreement estimator. Random short docs with heavy term
    reuse force real band collisions and sub-1.0 estimates."""
    import hashlib

    from credit_abs_oltp_to_mart_spark.functions.similarity import (
        MERSENNE_31,
        minhash_coefficients,
    )
    from credit_abs_oltp_to_mart_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_signatures,
    )

    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(12)]
    corpus = [
        (100 + i, " ".join(rng.choice(vocab, size=rng.randint(3, 9))))
        for i in range(20)
    ]
    # new batch: perturbed copies of corpus docs (exact dup, one token
    # appended, one dropped) plus fresh randoms => real band collisions
    # at every estimate level, not just 1.0
    newbatch = []
    for j, (_, t) in enumerate(corpus[:10]):
        tk = t.split(" ")
        if j % 3 == 0:
            nt = t
        elif j % 3 == 1:
            nt = t + " " + str(rng.choice(vocab))
        else:
            nt = " ".join(tk[:-1]) if len(tk) > 3 else t
        newbatch.append((200 + j, nt))
    newbatch += [
        (220 + j, " ".join(rng.choice(vocab, size=rng.randint(1, 9))))
        for j in range(5)
    ]
    n, n_perm, bands, min_est = 3, 8, 2, 0.25
    coeffs = minhash_coefficients(n_perm, 42)

    def shingles(text: str) -> set[str]:
        tk = [t for t in text.strip().split(" ") if t]
        if len(tk) < n:
            return {" ".join(tk)}
        return {" ".join(tk[i : i + n]) for i in range(len(tk) - n + 1)}

    def sig(text: str) -> list[int]:
        hs = [
            int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MERSENNE_31
            for s in shingles(text)
        ]
        return [min((a * h + b) % MERSENNE_31 for h in hs) for a, b in coeffs]

    def band_keys(s: list[int]) -> set[str]:
        rpb = n_perm // bands
        return {
            ":".join([str(bi)] + [str(x) for x in s[bi * rpb : (bi + 1) * rpb]])
            for bi in range(bands)
        }

    want = set()
    for ni, nt in newbatch:
        ns = sig(nt)
        for ci, ct in corpus:
            cs = sig(ct)
            if band_keys(ns) & band_keys(cs):
                est = sum(x == y for x, y in zip(ns, cs)) / n_perm
                if est >= min_est:
                    want.add((ni, ci, round(est, 6)))

    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    ndf = spark.createDataFrame(newbatch, "doc_id long, text string")
    store = minhash_signatures(cdf, n=n, n_perm=n_perm, seed=42)
    got = incremental_minhash_pairs(
        ndf,
        store,
        n=n,
        n_perm=n_perm,
        bands=bands,
        min_est=min_est,
        seed=42,
    )
    assert want, "degenerate case: reference found no pairs"
    assert (
        _rows(got, ["new_doc_id", "corpus_doc_id", "est_jaccard"])
        == sorted(want)
    )
