"""stream_corpus_ingest: the per-batch filter -> store-dedup -> decontam
-> pack composition. Planted docs exercise every drop reason; the crash
replay must recompute the identical admitted set (batch-scoped overwrite
sinks). The contract query gates the full pipeline hash-exact vs a
batch-sequential DuckDB replay; these tests pin the stage semantics on a
hand-built corpus."""

from __future__ import annotations

import os
import time as _time

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.operators.curation import (
    build_eval_gram_store,
)
from credit_abs_oltp_to_mart_spark.streaming import ops as streaming

# all >= 150 chars (quality >= 0.3), >= 8 tokens, English stopwords, no PII
GOOD_A = (
    "the quick brown fox jumps over the lazy dog and then it runs far away "
    "to find a quiet place in the woods where it can rest for the day and "
    "watch the river flow past the old stone bridge"
)
# exact copy: signature-identical (estimator 1.0), so the store-dedup
# drop is deterministic regardless of LSH band luck
DUP_A = GOOD_A
FRESH = (
    "a completely different story about sailing ships and the captains of "
    "the northern fleet who charted the islands in the cold sea and kept "
    "careful logs of the wind and the tide for every voyage"
)
EVAL_DOC = (
    "the held out benchmark passage that is part of the evaluation suite "
    "and must never appear in the training corpus because it would leak "
    "the answers of the test set into the model weights"
)
JUNK = "too short"


def _land(spark, src, schema, k, rows, t0):
    d = str(src / f"b{k}")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)
    for f in os.listdir(d):
        if f.endswith(".parquet"):
            t = t0 + 10 * k
            os.utime(os.path.join(d, f), (t, t))


def _run(spark, src, out, schema, gram_store):
    return streaming.stream_corpus_ingest(
        spark,
        f"{src}/b*",
        out,
        schema=schema,
        gram_store_path=gram_store,
        min_est=0.25,
        chunk_tokens=8,
        dedup_within_batch=True,
    )


@pytest.mark.slow
def test_stream_corpus_ingest_every_drop_reason(spark, tmp_path):
    schema = spark.createDataFrame([Row(doc_id=1, text=GOOD_A)]).schema
    gram_store = str(tmp_path / "eval_grams")
    build_eval_gram_store(
        spark.createDataFrame([Row(doc_id=900, text=EVAL_DOC)], schema)
    ).write.parquet(gram_store)

    src = tmp_path / "slices"
    t0 = _time.time() - 120
    # batch 0: one admitted doc + one filter-gate drop
    _land(spark, src, schema, 0, [
        Row(doc_id=1, text=GOOD_A),
        Row(doc_id=2, text=JUNK),
    ], t0)
    # batch 1: exact copy of admitted doc 1 (store dedup), a copy of the
    # eval passage (decontam), an exact within-batch dup pair, one fresh
    _land(spark, src, schema, 1, [
        Row(doc_id=10, text=DUP_A),
        Row(doc_id=11, text=EVAL_DOC),
        Row(doc_id=12, text=FRESH),
        Row(doc_id=13, text=FRESH),
    ], t0)

    out = str(tmp_path / "out")
    got = {
        (r.doc_id, r.ingest_batch, r.n_chunks)
        for r in _run(spark, src, out, schema, gram_store).collect()
    }
    n_a = len(GOOD_A.split())
    n_f = len(FRESH.split())
    assert got == {
        (1, 0, -(-n_a // 8)),   # admitted batch 0
        (12, 1, -(-n_f // 8)),  # fresh survivor; 13 died within-batch
    }
    # packed sink: chunk budget respected, batch-scoped partitions exist
    packed = spark.read.parquet(os.path.join(out, "packed"))
    assert packed.where(F.col("n_tokens") > 8).count() == 0
    assert {r.doc_id for r in packed.select("doc_id").distinct().collect()} == {1, 12}


@pytest.mark.slow
def test_stream_corpus_ingest_replay_is_idempotent(spark, tmp_path):
    """Crash after the sinks but before the checkpoint commit: replaying
    the last batch must reproduce the identical admitted set with no
    duplicated rows (both sinks are batch-id-scoped overwrites; the store
    scan excludes the replaying batch's own partition)."""
    schema = spark.createDataFrame([Row(doc_id=1, text=GOOD_A)]).schema
    gram_store = str(tmp_path / "eval_grams")
    build_eval_gram_store(
        spark.createDataFrame([Row(doc_id=900, text=EVAL_DOC)], schema)
    ).write.parquet(gram_store)
    src = tmp_path / "slices"
    t0 = _time.time() - 120
    _land(spark, src, schema, 0, [Row(doc_id=1, text=GOOD_A)], t0)
    _land(spark, src, schema, 1, [Row(doc_id=10, text=DUP_A), Row(doc_id=12, text=FRESH)], t0)

    out = str(tmp_path / "out")
    first = {tuple(r) for r in _run(spark, src, out, schema, gram_store).collect()}
    n_a = -(-len(GOOD_A.split()) // 8)
    n_f = -(-len(FRESH.split()) // 8)
    assert first == {(1, 0, n_a), (12, 1, n_f)}

    # simulate the crash window: both sinks written, commit 1 never was
    # (drop the hidden Hadoop-local .crc too, or the replay's commit
    # rename collides with it); batch 1 replays on the next start
    commits = os.path.join(out, "checkpoint", "commits")
    os.remove(os.path.join(commits, "1"))
    crc = os.path.join(commits, ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    _land(spark, src, schema, 2, [Row(doc_id=20, text=EVAL_DOC)], t0)
    again = [tuple(r) for r in _run(spark, src, out, schema, gram_store).collect()]
    # batch 1 replayed idempotently (doc 12 once, doc 10 still dropped);
    # batch 2's eval-copy doc is decontam-dropped against the same store
    assert set(again) == first
    assert len(again) == len(set(again))  # no duplicated survivor rows


@pytest.mark.slow
def test_stream_corpus_ingest_auto_compaction_parity(spark, tmp_path):
    """auto_compact_partitions threads through the full corpus pipeline
    without changing the admitted set or the packed shards: the in-loop
    signature-store compaction (fires during batch 2's apply here, after
    the sinks, folding the two committed partitions) is invisible to
    every downstream consumer."""
    schema = spark.createDataFrame([Row(doc_id=1, text=GOOD_A)]).schema
    gram_store = str(tmp_path / "eval_grams")
    build_eval_gram_store(
        spark.createDataFrame([Row(doc_id=900, text=EVAL_DOC)], schema)
    ).write.parquet(gram_store)
    t0 = _time.time() - 120
    batches = [
        [Row(doc_id=1, text=GOOD_A), Row(doc_id=2, text=JUNK)],
        [Row(doc_id=10, text=DUP_A), Row(doc_id=12, text=FRESH)],
        [Row(doc_id=20, text=EVAL_DOC), Row(doc_id=21, text=FRESH),
         Row(doc_id=22, text=GOOD_A)],
    ]
    results, packed = {}, {}
    for k_auto in (None, 2):
        src = tmp_path / f"auto_slices_{k_auto}"
        out = str(tmp_path / f"auto_out_{k_auto}")
        for i, rows in enumerate(batches):
            _land(spark, src, schema, i, rows, t0)
        results[k_auto] = {
            tuple(r)
            for r in streaming.stream_corpus_ingest(
                spark, f"{src}/b*", out, schema=schema,
                gram_store_path=gram_store, min_est=0.25, chunk_tokens=8,
                dedup_within_batch=True, auto_compact_partitions=k_auto,
            ).collect()
        }
        packed[k_auto] = {
            tuple(r)
            for r in spark.read.parquet(os.path.join(out, "packed"))
            .drop("batch").collect()
        }
        store = os.path.join(out, "signature_store")
        n_parts = len(
            [d for d in os.listdir(store) if d.startswith("batch=")]
        )
        assert n_parts == (3 if k_auto is None else 2)
    assert results[2] == results[None]
    assert packed[2] == packed[None]
    n_a = -(-len(GOOD_A.split()) // 8)
    n_f = -(-len(FRESH.split()) // 8)
    # 1 admitted; 10/22 store-dups, 20 decontam, 21 dup of 12
    assert results[2] == {(1, 0, n_a), (12, 1, n_f)}


@pytest.mark.slow
def test_stream_corpus_ingest_prebanded_store_agrees(spark, tmp_path):
    """store_prebanded=True: identical admitted set + chunk counts, with
    band_key baked into the signature-store partitions (bands rows per
    admitted doc) — parity with stream_dedup_ingest's layout knob."""
    schema = spark.createDataFrame([Row(doc_id=1, text=GOOD_A)]).schema
    gram_store = str(tmp_path / "eval_grams")
    build_eval_gram_store(
        spark.createDataFrame([Row(doc_id=900, text=EVAL_DOC)], schema)
    ).write.parquet(gram_store)
    t0 = _time.time() - 120
    results = {}
    for mode in (False, True):
        src = tmp_path / f"slices_{mode}"
        _land(spark, src, schema, 0, [Row(doc_id=1, text=GOOD_A)], t0)
        _land(spark, src, schema, 1, [Row(doc_id=10, text=DUP_A), Row(doc_id=12, text=FRESH)], t0)
        out = str(tmp_path / f"out_{mode}")
        got = streaming.stream_corpus_ingest(
            spark, f"{src}/b*", out, schema=schema,
            gram_store_path=gram_store, min_est=0.25, chunk_tokens=8,
            dedup_within_batch=True, store_prebanded=mode,
        )
        results[mode] = {tuple(r) for r in got.collect()}
    assert results[True] == results[False] and results[True]
    store = spark.read.parquet(os.path.join(str(tmp_path / "out_True"), "signature_store"))
    assert "band_key" in store.columns
    assert store.groupBy("doc_id").count().where(F.col("count") != 2).count() == 0


@pytest.mark.slow
def test_stream_pack_bins_continue_across_batches(spark, tmp_path):
    """Cross-batch pack continuity: bin numbering carries each shard's
    running token total across micro-batches (the pack_offsets state
    partitions), so the streamed shards are IDENTICAL rows to one batch
    pack_chunks run over the same docs — byte-compatible shard layouts."""
    from credit_abs_oltp_to_mart_spark.operators.curation import pack_chunks

    schema = spark.createDataFrame([Row(doc_id=1, text=GOOD_A)]).schema
    texts = {
        1: GOOD_A,
        2: FRESH,
        3: (
            "a careful account of the mountain village where the baker "
            "wakes before dawn to heat the stone oven and the children "
            "carry warm loaves across the square to the houses by the well"
        ),
        4: (
            "notes from the observatory describe how the astronomers "
            "tracked the comet for a month and compared its path against "
            "the tables printed in the old almanac kept in the library"
        ),
        5: (
            "the gardener explained that the orchard needs pruning in "
            "late winter so the apple trees keep their shape and the "
            "fruit grows where the light can reach it through the branches"
        ),
        6: (
            "a long letter from the engineer lists the repairs made to "
            "the canal locks during the spring and the schedule of barges "
            "that will pass once the water level returns to normal"
        ),
    }
    src = tmp_path / "slices"
    t0 = _time.time() - 120
    _land(spark, src, schema, 0, [Row(doc_id=1, text=texts[1]), Row(doc_id=2, text=texts[2])], t0)
    _land(spark, src, schema, 1, [Row(doc_id=3, text=texts[3]), Row(doc_id=4, text=texts[4])], t0)
    _land(spark, src, schema, 2, [Row(doc_id=5, text=texts[5]), Row(doc_id=6, text=texts[6])], t0)
    out = str(tmp_path / "out")
    got = streaming.stream_corpus_ingest(
        spark, f"{src}/b*", out, schema=schema,
        gram_store_path=None, min_est=0.25, chunk_tokens=8,
        bin_tokens=16, shards=2, dedup_within_batch=True,
    )
    assert {r.doc_id for r in got.collect()} == set(texts)
    streamed = {
        (r.shard, r.doc_id, r.chunk_idx, r.n_tokens, r.start_tok, r.bin)
        for r in spark.read.parquet(os.path.join(out, "packed")).collect()
    }
    batch_docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in sorted(texts.items())], schema
    )
    want = {
        tuple(r)
        for r in pack_chunks(
            batch_docs, chunk_tokens=8, bin_tokens=16, shards=2
        ).collect()
    }
    assert streamed == want
    # bins genuinely span batches: some later-batch chunk continues a bin
    # or offset started earlier (i.e. not every batch restarts at 0)
    per_batch_min = {}
    for r in spark.read.parquet(os.path.join(out, "packed")).collect():
        key = (r.ingest_batch, r.shard)
        per_batch_min[key] = min(per_batch_min.get(key, 1 << 60), r.start_tok)
    assert any(
        v > 0 for (b, _), v in per_batch_min.items() if b > 0
    ), per_batch_min
    # the offset state is batch-scoped parquet partitions
    offs = os.listdir(os.path.join(out, "pack_offsets"))
    assert {d for d in offs if d.startswith("batch=")} == {
        "batch=0", "batch=1", "batch=2"
    }


@pytest.mark.slow
def test_stream_pack_offsets_survive_crash_replay(spark, tmp_path):
    """Replaying the last batch after a lost commit must reproduce the
    SAME continued offsets (the offsets read excludes the replaying
    batch's own partition, like the signature store)."""
    schema = spark.createDataFrame([Row(doc_id=1, text=GOOD_A)]).schema
    src = tmp_path / "slices"
    t0 = _time.time() - 120
    _land(spark, src, schema, 0, [Row(doc_id=1, text=GOOD_A)], t0)
    _land(spark, src, schema, 1, [Row(doc_id=2, text=FRESH)], t0)
    out = str(tmp_path / "out")
    streaming.stream_corpus_ingest(
        spark, f"{src}/b*", out, schema=schema, gram_store_path=None,
        min_est=0.25, chunk_tokens=8, bin_tokens=16, shards=1,
    ).collect()
    first = {
        tuple(r)
        for r in spark.read.parquet(os.path.join(out, "packed")).collect()
    }
    commits = os.path.join(out, "checkpoint", "commits")
    os.remove(os.path.join(commits, "1"))
    crc = os.path.join(commits, ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    streaming.stream_corpus_ingest(
        spark, f"{src}/b*", out, schema=schema, gram_store_path=None,
        min_est=0.25, chunk_tokens=8, bin_tokens=16, shards=1,
    ).collect()
    again = {
        tuple(r)
        for r in spark.read.parquet(os.path.join(out, "packed")).collect()
    }
    assert again == first


@pytest.mark.slow
def test_add_eval_suite_mid_run_blocks_from_next_batch(spark, tmp_path):
    """A benchmark suite landed BETWEEN micro-batches (via
    curation.add_eval_suite from the on_batch_complete hook) must start
    blocking from the very next batch — the pinned broadcast re-pins on
    the changed store listing, no stream restart. The same doc admitted
    in an earlier batch stays admitted (the corpus is append-only)."""
    from credit_abs_oltp_to_mart_spark.operators.curation import (
        add_eval_suite,
    )

    schema = spark.createDataFrame([Row(doc_id=1, text=GOOD_A)]).schema
    gram_store = str(tmp_path / "eval_grams")
    # suite 0: the existing eval set, as a batch-keyed partition
    add_eval_suite(
        gram_store,
        spark.createDataFrame([Row(doc_id=900, text=EVAL_DOC)], schema),
        suite_id=0,
    )
    src = tmp_path / "slices"
    t0 = _time.time() - 120
    # batch 0 admits FRESH; batch 1 carries an exact copy of FRESH's
    # text under a new id (store-deduped) and GOOD_A (the new suite's
    # target); batch 2 re-offers GOOD_A under yet another id
    _land(spark, src, schema, 0, [Row(doc_id=1, text=FRESH)], t0)
    _land(spark, src, schema, 1, [Row(doc_id=10, text=GOOD_A)], t0)
    _land(spark, src, schema, 2, [Row(doc_id=20, text=GOOD_A)], t0)

    def grow(batch_id: int) -> None:
        if batch_id == 0:
            # GOOD_A becomes a benchmark after batch 0 committed
            add_eval_suite(
                gram_store,
                spark.createDataFrame(
                    [Row(doc_id=901, text=GOOD_A)], schema
                ),
                suite_id=1,
            )

    out = str(tmp_path / "out")
    got = {
        (r.doc_id, r.ingest_batch)
        for r in streaming.stream_corpus_ingest(
            spark, f"{src}/b*", out, schema=schema,
            gram_store_path=gram_store, min_est=0.25, chunk_tokens=8,
            on_batch_complete=grow,
        ).collect()
    }
    # FRESH admitted in batch 0; GOOD_A blocked in BOTH later batches by
    # the suite added mid-run
    assert got == {(1, 0)}


@pytest.mark.slow
def test_stream_bpe_pack_matches_batch_bpe_pack(spark, tmp_path):
    """Tokenizer-aware streaming ingest: with a trained word frame the
    pack stage emits token-ID shards, and cross-batch offsets make the
    streamed rows IDENTICAL to one batch bpe_pack over the same docs —
    the streaming half of the raw-text → tokenizer → shards chain."""
    from credit_abs_oltp_to_mart_spark.operators import bpe

    schema = spark.createDataFrame([Row(doc_id=1, text=GOOD_A)]).schema
    texts = {
        1: GOOD_A,
        2: FRESH,
        3: (
            "a careful account of the mountain village where the baker "
            "wakes before dawn to heat the stone oven and the children "
            "carry warm loaves across the square to the houses by the well"
        ),
        4: (
            "the gardener explained that the orchard needs pruning in "
            "late winter so the apple trees keep their shape and the "
            "fruit grows where the light can reach it through the branches"
        ),
    }
    all_docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in sorted(texts.items())], schema
    )
    _, wf = bpe.bpe_train(all_docs, n_merges=4)
    src = tmp_path / "slices"
    t0 = _time.time() - 120
    _land(spark, src, schema, 0, [Row(doc_id=1, text=texts[1]), Row(doc_id=2, text=texts[2])], t0)
    _land(spark, src, schema, 1, [Row(doc_id=3, text=texts[3]), Row(doc_id=4, text=texts[4])], t0)
    out = str(tmp_path / "out")
    packed = streaming.stream_corpus_ingest(
        spark, f"{src}/b*", out, schema=schema,
        gram_store_path=None, min_est=0.25, chunk_tokens=8,
        bin_tokens=16, shards=2, dedup_within_batch=True,
        tokenizer_word_frame=wf, return_packed=True,
    )
    streamed = {
        (r.shard, r.doc_id, r.chunk_idx, r.n_tokens, r.chunk_ids,
         r.start_tok, r.bin)
        for r in packed.collect()
    }
    want = {
        tuple(r)
        for r in bpe.bpe_pack(
            all_docs, wf, chunk_tokens=8, bin_tokens=16, shards=2
        ).collect()
    }
    assert streamed == want and streamed
    # the payloads are token-id runs under the trained vocabulary,
    # not whitespace text
    ids = {
        int(tok)
        for r in packed.collect()
        for tok in r.chunk_ids.split(" ")
    }
    n_vocab = bpe.vocab_frame(wf).count()
    assert ids and max(ids) < n_vocab


def test_add_eval_suite_refuses_flat_store(spark, tmp_path):
    """Growing a FLAT-built gram store in place would make Spark's
    partition discovery drop the root-level rows and silently disable
    the original blocklist — add_eval_suite must refuse with a clear
    error instead of creating the recall hole."""
    import pytest

    from credit_abs_oltp_to_mart_spark.operators.curation import (
        add_eval_suite,
        build_eval_gram_store,
    )

    schema = spark.createDataFrame([Row(doc_id=1, text=GOOD_A)]).schema
    gram_store = str(tmp_path / "flat_grams")
    # a flat store: root-level parquet files, no batch= partitions
    build_eval_gram_store(
        spark.createDataFrame([Row(doc_id=900, text=EVAL_DOC)], schema)
    ).write.parquet(gram_store)
    with pytest.raises(ValueError, match="batch-keyed"):
        add_eval_suite(
            gram_store,
            spark.createDataFrame([Row(doc_id=901, text=GOOD_A)], schema),
            suite_id=1,
        )
    # the flat store is untouched and still reads back whole
    assert spark.read.parquet(gram_store).count() > 0
    # a batch-keyed store still grows fine
    keyed = str(tmp_path / "keyed_grams")
    add_eval_suite(
        keyed,
        spark.createDataFrame([Row(doc_id=900, text=EVAL_DOC)], schema),
        suite_id=0,
    )
    add_eval_suite(
        keyed,
        spark.createDataFrame([Row(doc_id=901, text=GOOD_A)], schema),
        suite_id=1,
    )
    assert spark.read.parquet(keyed).select("batch").distinct().count() == 2


# ----------------------------------------------------- tokenizer refresh


def _vocab_ingest_run(spark, tmp_path, tag):
    """3 batches, refresh_every=2: batches 0-1 segment under v0 (trained
    on the init seed only), batch 2 under v1 (seed + admitted of 0-1).
    Texts are long/clean enough to pass the filter gate."""
    import os as _os
    import time as _time

    from credit_abs_oltp_to_mart_spark.streaming import stream_corpus_ingest

    def _text(doc_id, tail):
        # unique pseudo-random 3-letter content words per doc (no
        # MinHash near-dups, and no dominant char pair that would
        # out-rank 'xy' in BPE training), stopword 'a' every other word
        # (passes the en lang gate with zero intra-word pairs), ~400
        # chars (passes the length-quality gate)
        words = []
        for j in range(40):
            w = "".join(
                chr(97 + (doc_id * 7 + j * k + k * k) % 26)
                for k in range(1, 4)
            )
            words += ["a", w]
        return " ".join(words) + " " + tail

    xy_tail = " ".join(["xyxy"] * 25)
    batches = [
        [(100 + i, _text(100 + i, "abab abab")) for i in range(3)],
        [(200 + i, _text(200 + i, xy_tail)) for i in range(3)],
        [(300 + i, _text(300 + i, "xyxy abab")) for i in range(3)],
    ]
    init = spark.createDataFrame(
        [(i, "abab abab cdcd") for i in range(4)], "doc_id long, text string"
    )
    src = tmp_path / f"vslices_{tag}"
    t0 = _time.time() - 300
    for k, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        d = src / f"b{k}"
        df.coalesce(1).write.parquet(str(d))
        for f in _os.listdir(d):
            if f.endswith(".parquet"):
                t = t0 + 10 * k
                _os.utime(_os.path.join(d, f), (t, t))
    out = tmp_path / f"vout_{tag}"
    got = stream_corpus_ingest(
        spark,
        f"{src}/b*",
        str(out),
        schema="doc_id long, text string",
        tokenizer_refresh_init=init,
        tokenizer_refresh_every=2,
        tokenizer_merges=4,
        return_segmented=True,
    )
    return got, out, src


@pytest.mark.slow
def test_vocab_ingest_cadence_and_generations(spark, tmp_path):
    import os as _os

    got, out, _ = _vocab_ingest_run(spark, tmp_path, "a")
    rows = {
        r["doc_id"]: (r["ingest_batch"], r["vocab_version"], r["n_bpe_tokens"])
        for r in got.collect()
    }
    # every streamed doc admitted (clean text, no dups) and versioned by
    # the cadence rule: batches 0-1 -> v0, batch 2 -> v1
    assert {d for d in rows} == {100, 101, 102, 200, 201, 202, 300, 301, 302}
    assert all(v == 0 for d, (b, v, _) in rows.items() if b in (0, 1))
    assert all(v == 1 for d, (b, v, _) in rows.items() if b == 2)
    assert sorted(_os.listdir(_os.path.join(str(out), "vocab"))) == [
        "version=0",
        "version=1",
    ]
    # v1 trained on seed + admitted 0-1 learns the xy merges v0 (seed
    # only) cannot have — batch 2's xyxy-docs compress under v1
    v1 = spark.read.parquet(str(out / "vocab" / "version=1"))
    syms1 = {s for r in v1.collect() for s in r["syms"]}
    assert any("xy" in s for s in syms1)
    v0 = spark.read.parquet(str(out / "vocab" / "version=0"))
    syms0 = {s for r in v0.collect() for s in r["syms"]}
    assert not any("xy" in s for s in syms0)
    # packed shards exist for every batch (pack runs under the pinned
    # generation too)
    assert sorted(_os.listdir(_os.path.join(str(out), "packed"))) == [
        "batch=0",
        "batch=1",
        "batch=2",
    ]


@pytest.mark.slow
def test_vocab_ingest_replay_is_idempotent(spark, tmp_path):
    import os as _os

    from credit_abs_oltp_to_mart_spark.streaming import stream_corpus_ingest

    got, out, src = _vocab_ingest_run(spark, tmp_path, "b")
    first = {tuple(r) for r in got.collect()}
    # crash window: batch 2's sinks written (incl. its segmented rows
    # under v1 and the v1 publish), commit 2 never was
    commits = _os.path.join(str(out), "checkpoint", "commits")
    _os.remove(_os.path.join(commits, "2"))
    crc = _os.path.join(commits, ".2.crc")
    if _os.path.exists(crc):
        _os.remove(crc)
    init = spark.createDataFrame(
        [(i, "abab abab cdcd") for i in range(4)], "doc_id long, text string"
    )
    again = {
        tuple(r)
        for r in stream_corpus_ingest(
            spark,
            f"{src}/b*",
            str(out),
            schema="doc_id long, text string",
            tokenizer_refresh_init=init,
            tokenizer_refresh_every=2,
            tokenizer_merges=4,
            return_segmented=True,
        ).collect()
    }
    assert again == first


@pytest.mark.slow
def test_streaming_semantic_gate_drops_planted_paraphrase(spark, tmp_path):
    """The streaming half of build_corpus(embeddings=...): with the
    semantic eval store + doc-embedding lookup + FIXED codebook armed, an
    arriving doc whose text passes every verbatim gate but whose
    embedding nearly equals an eval vector drops before packing; docs
    without an embedding pass untouched; a crash replay re-derives the
    identical admitted set (the gate's state is all pinned/fixed)."""
    from credit_abs_oltp_to_mart_spark.operators.kmeans import kmeans_train

    schema = spark.createDataFrame([Row(doc_id=1, text=GOOD_A)]).schema

    def vec(axis, eps=0.0):
        v = [0.0] * 4
        v[axis] = 1.0
        v[(axis + 1) % 4] = eps
        return v

    # eval suite: one vector on axis 0 (id 900) and one on axis 1 (901)
    ev_store = str(tmp_path / "eval_emb")
    spark.createDataFrame(
        [(900, vec(0)), (901, vec(1))],
        "vec_id long, embedding array<double>",
    ).write.parquet(ev_store)
    # doc embeddings: doc 1 is the PARAPHRASE of eval 900 (cosine ~1,
    # text GOOD_A shares no grams with the eval texts since there are
    # no eval TEXTS at all here); doc 12 sits far away on axis 2;
    # doc 13 (same batch) has NO embedding -> passes untouched
    doc_emb = spark.createDataFrame(
        [(1, vec(0, 0.01)), (12, vec(2))],
        "vec_id long, embedding array<double>",
    )
    # fixed codebook trained offline over the whole little vector space
    pool = spark.createDataFrame(
        [(900, vec(0)), (901, vec(1)), (12, vec(2))],
        "vec_id long, embedding array<double>",
    )
    _, cents = kmeans_train(pool, init_ids=[900, 901, 12], iterations=1)

    src = tmp_path / "sem_slices"
    t0 = _time.time() - 120
    _land(spark, src, schema, 0, [
        Row(doc_id=1, text=GOOD_A),      # semantic dup of eval 900
        Row(doc_id=12, text=FRESH),      # far vector -> admitted
        Row(doc_id=13, text=EVAL_DOC),   # no embedding -> admitted
    ], t0)
    out = str(tmp_path / "sem_out")

    def run():
        return {
            r["doc_id"]
            for r in streaming.stream_corpus_ingest(
                spark, f"{src}/b*", out, schema=schema,
                gram_store_path=None, min_est=0.25, chunk_tokens=8,
                dedup_within_batch=True,
                semantic_eval_store=ev_store,
                semantic_doc_embeddings=doc_emb,
                semantic_centroids=cents,
                semantic_threshold=0.95,
            ).collect()
        }

    got = run()
    assert got == {12, 13}  # 1 dropped by the semantic gate, others pass

    # crash replay: delete the commit, re-run — identical admitted set
    commits = os.path.join(out, "checkpoint", "commits")
    os.remove(os.path.join(commits, "0"))
    crc = os.path.join(commits, ".0.crc")
    if os.path.exists(crc):
        os.remove(crc)
    assert run() == {12, 13}


def test_streaming_semantic_gate_rejects_id_collision(spark, tmp_path):
    """Batch doc_ids and eval vec_ids feed ONE unioned id space in the
    gate's cluster restriction — a collision would cross-tag vectors and
    duplicate verdicts, so it must fail loudly at the batch, not blur."""
    from credit_abs_oltp_to_mart_spark.operators.kmeans import kmeans_train

    schema = spark.createDataFrame([Row(doc_id=1, text=GOOD_A)]).schema

    def vec(axis):
        v = [0.0] * 4
        v[axis] = 1.0
        return v

    ev_store = str(tmp_path / "collide_eval_emb")
    # eval vec_id 1 COLLIDES with arriving doc_id 1
    spark.createDataFrame(
        [(1, vec(0))], "vec_id long, embedding array<double>"
    ).write.parquet(ev_store)
    doc_emb = spark.createDataFrame(
        [(1, vec(2))], "vec_id long, embedding array<double>"
    )
    pool = spark.createDataFrame(
        [(1, vec(0)), (12, vec(2))],
        "vec_id long, embedding array<double>",
    )
    _, cents = kmeans_train(pool, init_ids=[1, 12], iterations=1)

    src = tmp_path / "collide_slices"
    t0 = _time.time() - 120
    _land(spark, src, schema, 0, [Row(doc_id=1, text=GOOD_A)], t0)
    out = str(tmp_path / "collide_out")
    with pytest.raises(Exception, match="collides with an eval"):
        streaming.stream_corpus_ingest(
            spark, f"{src}/b*", out, schema=schema,
            gram_store_path=None, min_est=0.25, chunk_tokens=8,
            semantic_eval_store=ev_store,
            semantic_doc_embeddings=doc_emb,
            semantic_centroids=cents,
            semantic_threshold=0.95,
        ).collect()


@pytest.mark.slow
def test_streaming_semantic_gate_hier_codebook(spark, tmp_path):
    """semantic_centroids in the two-level {"coarse", "sub"} form routes
    both the eval-store pin and the batch side through
    ann.assign_against_hier_codebook (the O(sqrt(k)) scale form): the
    planted paraphrase still drops, bystanders still pass."""
    from credit_abs_oltp_to_mart_spark.operators.kmeans import hier_train

    schema = spark.createDataFrame([Row(doc_id=1, text=GOOD_A)]).schema

    def vec(axis, eps=0.0):
        v = [0.0] * 4
        v[axis] = 1.0
        v[(axis + 1) % 4] = eps
        return v

    ev_store = str(tmp_path / "hier_eval_emb")
    spark.createDataFrame(
        [(900, vec(0)), (901, vec(1))],
        "vec_id long, embedding array<double>",
    ).write.parquet(ev_store)
    doc_emb = spark.createDataFrame(
        [(1, vec(0)), (12, vec(2))],
        "vec_id long, embedding array<double>",
    )
    pool = spark.createDataFrame(
        [(900, vec(0)), (901, vec(1)), (12, vec(2)), (14, vec(3))],
        "vec_id long, embedding array<double>",
    )
    _, coarse, sub = hier_train(
        pool, coarse_init_ids=[900, 12], sub_k=2,
        coarse_iterations=1, sub_iterations=1,
    )

    src = tmp_path / "hier_slices"
    t0 = _time.time() - 120
    _land(spark, src, schema, 0, [
        Row(doc_id=1, text=GOOD_A),      # identical to eval 900 -> drops
        Row(doc_id=12, text=FRESH),      # far vector -> admitted
        Row(doc_id=13, text=EVAL_DOC),   # no embedding -> admitted
    ], t0)
    out = str(tmp_path / "hier_out")
    got = {
        r["doc_id"]
        for r in streaming.stream_corpus_ingest(
            spark, f"{src}/b*", out, schema=schema,
            gram_store_path=None, min_est=0.25, chunk_tokens=8,
            semantic_eval_store=ev_store,
            semantic_doc_embeddings=doc_emb,
            semantic_centroids={"coarse": coarse, "sub": sub},
            semantic_threshold=0.95,
        ).collect()
    }
    assert got == {12, 13}
