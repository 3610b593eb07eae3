"""duplicate_spans semantics on planted passages: exact boundaries,
adjacency merging, within-doc repeats, and the no-false-positive case.
(The contract query gates the operator bit-exactly vs DuckDB; these pin
the interval arithmetic on hand-built corpora.)"""

from __future__ import annotations

from pyspark.sql import Row

from credit_abs_oltp_to_mart_spark.operators.textops import duplicate_spans


def _spans(spark, rows, k=4):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r.doc_id, r.span_start, r.span_end, r.n_tokens)
        for r in duplicate_spans(df, k=k).collect()
    }


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_shared_passage_exact_boundaries(spark):
    # a 6-token passage shared by docs 1 and 2, embedded at different
    # offsets in otherwise-unique text. With k=4, duplicated gram starts
    # cover the passage's 3 windows -> one merged span per doc covering
    # exactly the 6 passage tokens.
    passage = "the quick brown fox jumps high"
    rows = [
        Row(doc_id=1, text=_words("a", 3) + " " + passage + " " + _words("b", 3)),
        Row(doc_id=2, text=_words("c", 5) + " " + passage),
        Row(doc_id=3, text=_words("d", 12)),
    ]
    got = _spans(spark, rows, k=4)
    assert got == {
        (1, 3, 8, 6),   # tokens 3..8 = the passage
        (2, 5, 10, 6),  # tokens 5..10
    }


def test_within_doc_repeat_is_duplicated(spark):
    # the SAME doc repeating a passage counts: both occurrences covered.
    # (the two copies are non-adjacent: gap of 4 unique tokens > 0)
    passage = "alpha beta gamma delta"
    rows = [
        Row(doc_id=1, text=passage + " " + _words("x", 4) + " " + passage),
    ]
    got = _spans(spark, rows, k=4)
    assert got == {(1, 0, 3, 4), (1, 8, 11, 4)}


def test_adjacent_spans_merge(spark):
    # two shared passages sitting back-to-back in doc 1 merge into one
    # maximal span (next start <= prev start + k)
    p1 = "one two three four"
    p2 = "five six seven eight"
    rows = [
        Row(doc_id=1, text=p1 + " " + p2),
        Row(doc_id=2, text=_words("u", 4) + " " + p1),
        Row(doc_id=3, text=p2 + " " + _words("v", 4)),
    ]
    got = _spans(spark, rows, k=4)
    assert (1, 0, 7, 8) in got  # merged across both passages
    assert (2, 4, 7, 4) in got and (3, 0, 3, 4) in got


def test_unique_corpus_has_no_spans(spark):
    rows = [
        Row(doc_id=1, text=_words("a", 20)),
        Row(doc_id=2, text=_words("b", 20)),
    ]
    assert _spans(spark, rows, k=4) == set()


def test_keep_first_preserves_earliest_occurrence_byte_identical(spark):
    """keep_first=True: per duplicated gram the min (doc_id, pos)
    occurrence is not marked — the FIRST copy of a shared passage
    survives remove_spans byte-identical, later copies are cut."""
    from credit_abs_oltp_to_mart_spark.operators.textops import remove_spans

    passage = "the quick brown fox jumps high"
    first = "x0 x1 " + passage + " y0 y1"
    rows = [
        Row(doc_id=1, text=first),
        Row(doc_id=2, text=_words("c", 5) + " " + passage),
        Row(doc_id=3, text=passage + " " + _words("d", 5)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = duplicate_spans(df, k=4, keep_first=True)
    # no span lands in doc 1 (it owns every gram's earliest occurrence)
    assert {r.doc_id for r in spans.collect()} == {2, 3}
    got = {r.doc_id: (r.text, r.n_removed) for r in remove_spans(df, spans).collect()}
    assert got[1] == (first, 0)  # byte-identical survival
    assert got[2] == (_words("c", 5), 6)
    assert got[3] == (_words("d", 5), 6)


def test_keep_first_within_doc_keeps_first_copy_only(spark):
    # the SAME doc repeating a passage: earliest in-doc occurrence kept
    passage = "alpha beta gamma delta"
    rows = [
        Row(doc_id=1, text=passage + " " + _words("x", 4) + " " + passage),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_tokens)
        for r in duplicate_spans(df, k=4, keep_first=True).collect()
    }
    assert got == {(1, 8, 11, 4)}


def test_remove_spans_cuts_exactly_and_preserves_clean_docs(spark):
    from credit_abs_oltp_to_mart_spark.operators.textops import remove_spans

    passage = "the quick brown fox jumps high"
    dirty = "a0  a1\ta2 " + passage  # messy whitespace, preserved iff no span
    rows = [
        Row(doc_id=1, text="x0 x1 " + passage + " y0 y1"),
        Row(doc_id=2, text=passage),
        Row(doc_id=3, text=dirty.replace(passage, "z0 z1 z2 z3 z4 z5")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = duplicate_spans(df, k=4)
    got = {r.doc_id: (r.text, r.n_removed) for r in remove_spans(df, spans).collect()}
    assert got[1] == ("x0 x1 y0 y1", 6)
    assert got[2] == ("", 6)  # whole doc was the shared passage
    # doc 3 shares nothing: text byte-identical incl. the messy whitespace
    assert got[3] == (rows[2].text, 0)


def test_bigram_fluency_separates_prose_from_shuffle(spark):
    """Semantic sanity for the bigram-LM scorer: docs built from a chain
    the corpus repeats score a far higher mean conditional probability
    than the same words in a never-seen order."""
    from credit_abs_oltp_to_mart_spark.operators.textops import bigram_fluency

    phrase = "the quick brown fox jumps over the lazy dog"
    shuffled = "dog the over quick lazy fox the brown jumps"
    rows = [(i, phrase) for i in range(1, 6)] + [(9, shuffled)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in bigram_fluency(df).collect()}
    assert got[1]["n_bigrams"] == 8
    assert got[1]["avg_cond_prob"] > 3 * got[9]["avg_cond_prob"]
    # every bigram of the shuffled doc is corpus-rare, the prose's are not
    assert got[9]["rare_bigram_share"] == 1.0
    assert got[1]["rare_bigram_share"] < 0.5
