"""Streaming tokenizer-vocabulary refresh: cadence by rule, versioned
publishes, consumer pointer, pinned-generation segmentation, and
full-replay determinism (including a lost publish self-healing).
Values on the real tables are oracle-gated in test_entry_contract."""

from __future__ import annotations

import pytest

import os
import shutil
import time as _time

from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.streaming import stream_vocab_refresh

SCHEMA = "doc_id bigint, text string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _land(df, path, k, t0):
    df.coalesce(1).write.parquet(str(path))
    for f in os.listdir(path):
        if f.endswith(".parquet"):
            t = t0 + 10 * k
            os.utime(os.path.join(path, f), (t, t))


INIT = [(i, "abab abab cdcd") for i in range(8)]
# streamed batches push a NEW dominant pair ("xy") into the corpus: the
# refreshed vocabulary learns xy-merges the initial one cannot have
BATCHES = [
    [(100 + i, "xyxy xyxy abab") for i in range(6)],
    [(200 + i, "xyxy xyxy xyxy") for i in range(6)],
    [(300, "xyxyxyxy"), (301, "abab")],
    [(400, "xyxyxyxy"), (401, "abab")],
]


def _run(spark, tmp_path, tag):
    src = tmp_path / f"slices_{tag}"
    t0 = _time.time() - 300
    for k, rows in enumerate(BATCHES):
        _land(_docs(spark, rows), src / f"b{k}", k, t0)
    out = tmp_path / f"out_{tag}"
    got = stream_vocab_refresh(
        spark,
        f"{src}/b*",
        _docs(spark, INIT),
        str(out),
        schema=SCHEMA,
        n_merges=4,
        refresh_every=2,
    )
    return got, out


@pytest.mark.slow
def test_cadence_versions_and_pinning(spark, tmp_path):
    got, out = _run(spark, tmp_path, "main")
    rows = got.collect()
    by_batch = {}
    for r in rows:
        by_batch.setdefault(r["batch"], set()).add(r["vocab_version"])
    # batches 0,1 segment under v0; batches 2,3 under v1 (refresh_every=2)
    assert by_batch == {0: {0}, 1: {0}, 2: {1}, 3: {1}}, by_batch
    versions = sorted(
        int(d.split("=")[1])
        for d in os.listdir(out / "vocab")
        if d.startswith("version=")
    )
    assert versions == [0, 1]
    cur = spark.read.parquet(str(out / "vocab_current")).collect()
    assert [r["version"] for r in cur] == [1]
    # the refreshed vocabulary actually learned the new dominant pair
    v0 = spark.read.parquet(str(out / "vocab/version=0"))
    v1 = spark.read.parquet(str(out / "vocab/version=1"))
    s0 = {r["word"]: list(r["syms"]) for r in v0.collect()}
    s1 = {r["word"]: list(r["syms"]) for r in v1.collect()}
    assert "xyxy" not in s0  # init corpus never saw it
    assert len(s1["xyxy"]) < len("xyxy")  # v1 merged the xy pair


@pytest.mark.slow
def test_replay_is_deterministic_and_self_heals(spark, tmp_path):
    got_a, out_a = _run(spark, tmp_path, "a")
    a = {(r["batch"], r["doc_id"]): (r["vocab_version"], r["n_bpe_tokens"])
         for r in got_a.collect()}
    # restart over the same checkpoint: nothing reprocesses, store stable
    got_again, _ = (
        stream_vocab_refresh(
            spark,
            f"{tmp_path}/slices_a/b*",
            _docs(spark, INIT),
            str(out_a),
            schema=SCHEMA,
            n_merges=4,
            refresh_every=2,
        ),
        None,
    )
    again = {
        (r["batch"], r["doc_id"]): (r["vocab_version"], r["n_bpe_tokens"])
        for r in got_again.collect()
    }
    assert again == a
    # lost publish: drop version=1 and replay the WHOLE stream fresh —
    # the version rule re-derives the identical vocabulary and stats
    shutil.rmtree(out_a / "vocab" / "version=1")
    shutil.rmtree(out_a / "checkpoint")
    got_b = stream_vocab_refresh(
        spark,
        f"{tmp_path}/slices_a/b*",
        _docs(spark, INIT),
        str(out_a),
        schema=SCHEMA,
        n_merges=4,
        refresh_every=2,
    )
    b = {(r["batch"], r["doc_id"]): (r["vocab_version"], r["n_bpe_tokens"])
         for r in got_b.collect()}
    assert b == a
