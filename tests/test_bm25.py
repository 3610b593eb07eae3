"""BM25 retrieval: exact fixed-point scores against an independent
Python replica, ranking semantics, and the restriction/shape contracts.
Values on the real tables are oracle-gated in test_entry_contract."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.operators import retrieval


DOCS = [
    (1, "apple banana apple cherry"),
    (2, "banana banana banana"),
    (3, "cherry date elderberry fig grape"),
    (4, "apple apple apple apple apple apple"),
    (5, ""),
]
QUERIES = [(10, "apple banana"), (11, "elderberry"), (12, "kumquat")]


def _bm25_python(docs, queries, k, S=10**6, k1=(6, 5), b=(3, 4)):
    """Independent replica: same rational surrogate, bigint floordiv."""
    k1n, k1d = k1
    bn, bd = b
    toks = {d: t.split() for d, t in docs if t.strip()}
    n_docs = len([1 for _, t in docs])
    n_toks = sum(len(v) for v in toks.values())
    df = Counter()
    for d, tk in toks.items():
        for term in set(tk):
            df[term] += 1
    out = {}
    for qid, q in queries:
        scores = Counter()
        for term in q.split():
            if term not in df:
                continue
            idf = (S * (2 * (n_docs - df[term]) + 1)) // (2 * n_docs + 1)
            for d, tk in toks.items():
                tf = tk.count(term)
                if not tf:
                    continue
                dl = len(tk)
                tfp = (S * tf * (k1n + k1d) * bd * n_toks) // (
                    tf * k1d * bd * n_toks
                    + k1n * (bd - bn) * n_toks
                    + k1n * bn * dl * n_docs
                )
                scores[d] += (idf * tfp) // S
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
        out[qid] = [(d, r + 1, s) for r, (d, s) in enumerate(ranked)]
    return out


def test_bm25_matches_python_replica(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "query_id long, query string")
    got = {}
    for r in retrieval.bm25_topk(docs, qs, k=3).collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["rank"], r["score_fp"])
        )
    expect = _bm25_python(DOCS, QUERIES, k=3)
    for qid in (10, 11):
        assert got[qid] == expect[qid], (qid, got.get(qid), expect[qid])
    # a query with no corpus term emits no rows
    assert 12 not in got


def test_bm25_tf_saturation_and_idf_ordering(spark):
    """Six repeats of 'apple' must NOT score 6x one occurrence (k1
    saturation), and a rarer term must out-weigh a common one at equal
    tf."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(
        [(1, "apple"), (2, "elderberry cherry")],
        "query_id long, query string",
    )
    rows = retrieval.bm25_topk(docs, qs, k=5).collect()
    apple = {r["doc_id"]: r["score_fp"] for r in rows if r["query_id"] == 1}
    assert apple[4] < 6 * apple[1] and apple[4] > apple[1]
    # elderberry (df=1) appears only in doc 3; cherry (df=2) in 1 and 3 —
    # doc 3 must lead the second query
    second = [r for r in rows if r["query_id"] == 2]
    assert second[0]["doc_id"] == 3 and second[0]["rank"] == 1


def test_bm25_postings_restricted_before_scoring(spark):
    """The plan must restrict postings to query terms with a BROADCAST
    join before any aggregation wider than the (term, doc_id) count —
    no corpus-wide cross join, no sort-merge on the term key."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "query_id long, query string")
    out = retrieval.bm25_topk(docs, qs, k=3)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p, p
    assert "BroadcastHashJoin" in p, p
