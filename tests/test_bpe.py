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
