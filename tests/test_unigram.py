"""Unigram-LM tokenizer trainer: Viterbi DP correctness against a
literal python reference, single-char coverage, EM membership rules,
determinism. Values on the real tables are oracle-gated in
test_entry_contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.operators import unigram


def _viterbi_ref(word: str, costs: dict[str, int], L: int) -> list[str]:
    """Literal reference DP: min total cost, ties -> longest piece."""
    n = len(word)
    best: list[tuple[int, int, list[str]]] = [(0, 0, [])] * (n + 1)
    for j in range(n - 1, -1, -1):
        cands = []
        for l in range(1, min(L, n - j) + 1):
            piece = word[j : j + l]
            c = costs.get(piece, unigram.OOV_COST)
            nxt = best[j + l]
            cands.append((c + nxt[0], L - l, [piece] + nxt[2]))
        best[j] = min(cands, key=lambda t: (t[0], t[1]))
    return best[0][2]


def test_viterbi_expr_matches_reference(spark):
    costs = {
        "a": 900_000, "b": 950_000, "c": 990_000, "d": 990_000,
        "ab": 400_000, "bc": 300_000, "abc": 999_999, "cd": 100_000,
    }
    words = ["abcd", "abc", "dcba", "aaaa", "b", "abab", "dddd"]
    vc = spark.createDataFrame([(costs,)], "__vc map<string,bigint>")
    wf = spark.createDataFrame([(w, 1) for w in words], "word string, cnt long")
    got = {
        r["word"]: r["s"]["segs"]
        for r in wf.crossJoin(F.broadcast(vc))
        .select("word", unigram.viterbi_segment_expr("word").alias("s"))
        .collect()
    }
    for w in words:
        assert got[w] == _viterbi_ref(w, costs, unigram.MAX_PIECE_LEN), (
            w, got[w]
        )


def test_oov_never_blocks_segmentation(spark):
    """A word containing characters outside the multi-char vocab still
    segments through single chars; the sentinel path never wins when a
    char path exists."""
    costs = {"x": 999_999, "y": 999_999, "xy": 1}
    vc = spark.createDataFrame([(costs,)], "__vc map<string,bigint>")
    wf = spark.createDataFrame([("xyx", 1)], "word string, cnt long")
    r = (
        wf.crossJoin(F.broadcast(vc))
        .select(unigram.viterbi_segment_expr("word").alias("s"))
        .collect()[0]["s"]
    )
    assert r["segs"] == ["xy", "x"]
    assert r["cost"] == 1_000_000


def test_unigram_train_membership_and_determinism(spark):
    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat " * 3) for i in range(4)]
        + [(10 + i, "a bag of words and more words") for i in range(3)],
        "doc_id long, text string",
    )
    vocab, weights = unigram.unigram_train(
        docs, rounds=2, vocab_size=30
    )
    rows = vocab.collect()
    pieces = {r["piece"]: r for r in rows}
    # every single char of the corpus is a member, even at count 0
    chars = {c for r in docs.collect() for c in r["text"] if c != " "}
    assert chars <= set(pieces)
    # multi-char members all carry positive final counts
    for p, r in pieces.items():
        if len(p) > 1:
            assert r["cnt"] > 0, p
    # ranks are dense and ordered by (weight desc, piece asc)
    ordered = sorted(rows, key=lambda r: (-r["weight"], r["piece"]))
    assert [r["rank"] for r in ordered] == list(range(1, len(rows) + 1))
    # bit-identical re-run
    vocab2, weights2 = unigram.unigram_train(docs, rounds=2, vocab_size=30)
    assert weights2 == weights
    assert vocab2.exceptAll(vocab).count() == 0


def test_em_rounds_change_the_model(spark):
    """Round 1 re-weights by segmentation usage, so seed-frequency
    weights and round-1 weights must differ (the EM actually moves)."""
    docs = spark.createDataFrame(
        [(1, "abab abab baba abba")], "doc_id long, text string"
    )
    _, w0 = unigram.unigram_train(docs, rounds=0, vocab_size=10)
    _, w1 = unigram.unigram_train(docs, rounds=1, vocab_size=10)
    assert w0 != w1
    # membership after a round is usage-pruned: strictly fewer or equal
    assert set(w1) <= set(w0)


def test_seed_cut_is_in_cluster_and_bounded(spark):
    """The top-V seed cut must run in-cluster (TakeOrderedAndProject —
    per-partition heads, a V-row driver merge) and collect only
    O(V + |charset|) rows, matching the driver-side sort it replaced
    exactly. The full substring table must never reach the driver."""
    docs = spark.createDataFrame(
        [(i, f"banana band bandana ab{i % 7}") for i in range(40)],
        "doc_id long, text string",
    )
    wf = unigram.word_frequency_table(docs, "text")
    sp = unigram.seed_pieces(wf)
    vocab_size = 10
    cut = unigram.seed_vocab_frame(sp, vocab_size)
    plan = cut._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    rows = cut.collect()
    n_chars = sp.where(F.length("piece") == 1).count()
    assert len(rows) <= vocab_size + n_chars
    # exact equivalence with the full driver-side cut it replaced
    seeds = [(r["piece"], int(r["cnt"])) for r in sp.collect()]
    ordered = sorted(seeds, key=lambda r: (-r[1], r[0]))
    expect = {p: c for p, c in ordered[:vocab_size]}
    for p, c in ordered:
        if len(p) == 1:
            expect.setdefault(p, c)
    assert {r["piece"]: int(r["cnt"]) for r in rows} == expect


def test_perplexity_filter_separates_by_reference_likelihood(spark):
    """CCNet-style LM filtering: docs like the REFERENCE keep, docs of
    out-of-reference words pay OOV costs and drop; the verdict is the
    exact integer comparison total_cost <= T * n_words."""
    ref = spark.createDataFrame(
        [(i, "banana band bandana banana band") for i in range(10)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "banana band banana"),          # in-reference -> cheap
            (2, "zzqx wvvk zzqx wvvk"),         # out-of-domain -> OOV costs
            (3, ""),                            # empty -> cost 0, kept
        ],
        "doc_id long, text string",
    )
    # threshold = the in-reference doc's own mean cost (computed below),
    # so doc 1 sits exactly AT the boundary (<= keeps it) and doc 2 far above
    from credit_abs_oltp_to_mart_spark.operators.unigram import (
        perplexity_filter,
        unigram_segment_stats,
        unigram_train,
    )

    _, weights = unigram_train(ref)
    s1 = {
        r["doc_id"]: (r["total_cost"], r["n_words"])
        for r in unigram_segment_stats(docs, weights).collect()
    }
    t = s1[1][0] // s1[1][1]  # doc 1's mean cost per word (floored)
    got = {
        r["doc_id"]: r["is_kept"]
        for r in perplexity_filter(
            docs, ref, max_cost_per_word=t + 1
        ).collect()
    }
    assert got == {1: 1, 2: 0, 3: 1}
    # monotone in the threshold: a huge ceiling keeps everything
    all_kept = perplexity_filter(
        docs, ref, max_cost_per_word=10**15
    )
    assert all_kept.where(F.col("is_kept") == 0).count() == 0


def test_perplexity_filter_scoring_joins_broadcast_word_results(spark):
    """Scale shape: the corpus stream joins the word-level Viterbi
    results through a BROADCAST join — no corpus shuffle on the word
    key, no cartesian product."""
    ref = spark.createDataFrame(
        [(i, "banana band bandana") for i in range(5)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [(i, "banana band") for i in range(20)], "doc_id long, text string"
    )
    from credit_abs_oltp_to_mart_spark.operators.unigram import (
        perplexity_filter,
    )

    out = perplexity_filter(docs, ref, max_cost_per_word=10**9)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
