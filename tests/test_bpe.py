"""BPE training semantics pinned against a literal python reference
(Sennrich get_stats/merge: overlapping pair counts, leftmost-greedy
non-overlapping merge application) — the contract queries gate the
operator bit-exactly vs the DuckDB round replay; these prove the Spark
fold IS the reference algorithm, including the equal-pair run case."""

from __future__ import annotations

import random

from credit_abs_oltp_to_mart_spark.operators import bpe


def _py_bpe(word_counts: dict[str, int], n_merges: int):
    """Reference implementation: count ALL adjacent pairs (overlapping),
    argmax by (count desc, pair asc), merge leftmost-greedy."""
    syms = {w: [c for c in w] for w in word_counts}
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, s in syms.items():
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = (
                    counts.get((s[i], s[i + 1]), 0) + word_counts[w]
                )
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, a + b, c))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms


def _train(spark, words: dict[str, int], n_merges: int):
    rows = []
    did = 0
    for w, c in words.items():
        for _ in range(c):
            did += 1
            rows.append((did, w))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges, wf = bpe.bpe_train(docs, n_merges=n_merges)
    got_m = [(m["rank"], m["left"], m["right"], m["merged"], m["pair_count"])
             for m in merges]
    got_s = {r["word"]: list(r["syms"]) for r in wf.collect()}
    return got_m, got_s


def test_bpe_matches_python_reference(spark):
    rng = random.Random(19)
    words = {
        "".join(rng.choice("abcde") for _ in range(rng.randint(1, 9))): rng.randint(1, 5)
        for _ in range(60)
    }
    want_m, want_s = _py_bpe(words, 6)
    got_m, got_s = _train(spark, words, 6)
    assert got_m == want_m
    assert got_s == want_s


def test_bpe_equal_pair_runs_merge_leftmost(spark):
    # the only overlap case: left == right. "aaaaa" under (a,a) must
    # become [aa, aa, a] (greedy-left), never [a, aa, aa]
    words = {"aaaaa": 3, "aaa": 2, "xy": 1}
    want_m, want_s = _py_bpe(words, 1)
    got_m, got_s = _train(spark, words, 1)
    assert got_m == want_m
    assert got_s == want_s
    assert got_s["aaaaa"] == ["aa", "aa", "a"]  # greedy-left, not right


def test_bpe_merged_symbols_chain_across_rounds(spark):
    # round 2+ merges can take a round-1 merged symbol as an operand
    words = {"abab": 5, "abc": 3}
    got_m, got_s = _train(spark, words, 3)
    want_m, want_s = _py_bpe(words, 3)
    assert got_m == want_m and got_s == want_s
    # some merge after round 1 uses a multi-char operand
    assert any(len(m[1]) > 1 or len(m[2]) > 1 for m in got_m[1:])


def _py_tokenize(words_seq: list[str], syms: dict[str, list[str]]):
    """Reference tokenizer: dense lexicographic ids over the final
    vocabulary, per-doc concatenation of per-word segmentations."""
    vocab = sorted({s for ss in syms.values() for s in ss})
    ids = {s: i for i, s in enumerate(vocab)}
    return [ids[s] for w in words_seq for s in syms[w]]


def test_bpe_tokenize_sequences(spark):
    docs = spark.createDataFrame(
        [(1, "abab xy abab"), (2, ""), (3, "abc abab")],
        "doc_id long, text string",
    )
    _, wf = bpe.bpe_train(docs, n_merges=2)
    _, want_s = _py_bpe({"abab": 3, "xy": 1, "abc": 1}, 2)
    got = {r["doc_id"]: r for r in bpe.bpe_tokenize(docs, wf).collect()}
    assert set(got) == {1, 3}  # empty doc excluded (no tokens)
    assert list(got[1]["token_ids"]) == _py_tokenize(
        ["abab", "xy", "abab"], want_s
    )
    assert list(got[3]["token_ids"]) == _py_tokenize(["abc", "abab"], want_s)
    assert got[1]["n_words"] == 3 and got[1]["n_unseen"] == 0


def test_bpe_tokenize_nulls_out_unseen_words(spark):
    train = spark.createDataFrame([(1, "abab abc")], "doc_id long, text string")
    _, wf = bpe.bpe_train(train, n_merges=1)
    apply = spark.createDataFrame(
        [(1, "abab abc"), (2, "abab ZZZ abc")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in bpe.bpe_tokenize(apply, wf).collect()}
    assert got[1]["token_ids"] is not None and got[1]["n_unseen"] == 0
    # the mismatch doc surfaces as a NULL sequence, never a shortened one
    assert got[2]["token_ids"] is None and got[2]["n_unseen"] == 1
    assert got[2]["n_words"] == 3


def test_bpe_pack_layout_matches_reference(spark):
    rng = random.Random(7)
    rows = [
        (
            i,
            " ".join(
                "".join(rng.choice("ab") for _ in range(rng.randint(1, 4)))
                for _ in range(rng.randint(0, 12))
            ),
        )
        for i in range(1, 21)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    _, wf = bpe.bpe_train(docs, n_merges=3)
    out = bpe.bpe_pack(docs, wf, chunk_tokens=4, bin_tokens=8, shards=3)
    rows_out = out.collect()
    syms = {r["word"]: list(r["syms"]) for r in wf.collect()}
    # per-doc recomposition: chunks in order rebuild the full id sequence
    by_doc: dict[int, list] = {}
    for r in rows_out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for did, text in rows:
        words = text.split()
        want = _py_tokenize(words, syms) if words else []
        got_chunks = sorted(by_doc.get(did, []), key=lambda r: r["chunk_idx"])
        got_ids = [
            int(x) for r in got_chunks for x in r["chunk_ids"].split()
        ]
        assert got_ids == want
        for r in got_chunks:
            assert r["n_tokens"] == len(r["chunk_ids"].split()) <= 4
    # per-shard end-to-end layout: offsets are cumulative in
    # (doc_id, chunk_idx) order and bins are start_tok div bin_tokens
    by_shard: dict[int, list] = {}
    for r in rows_out:
        by_shard.setdefault(r["shard"], []).append(r)
    for rs in by_shard.values():
        rs.sort(key=lambda r: (r["doc_id"], r["chunk_idx"]))
        off = 0
        for r in rs:
            assert r["start_tok"] == off
            assert r["bin"] == off // 8
            off += r["n_tokens"]


def test_bpe_segment_stats_counts(spark):
    spark_docs = spark.createDataFrame(
        [(1, "abab abab xy"), (2, ""), (3, "abc")],
        "doc_id long, text string",
    )
    merges, wf = bpe.bpe_train(spark_docs, n_merges=2)
    got = {tuple(r) for r in bpe.bpe_segment_stats(spark_docs, wf).collect()}
    want_m, want_s = _py_bpe({"abab": 2, "xy": 1, "abc": 1}, 2)
    n1 = 2 * len(want_s["abab"]) + len(want_s["xy"])
    n3 = len(want_s["abc"])
    assert got == {(1, 3, n1), (2, 0, 0), (3, 1, n3)}
