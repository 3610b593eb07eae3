"""BM25 retrieval: exact fixed-point scores against an independent
Python replica, ranking semantics, and the restriction/shape contracts.
Values on the real tables are oracle-gated in test_entry_contract."""

from __future__ import annotations

from collections import Counter

import pytest
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


# ---------------------------------------------------------------- store


def _store(spark, tmp_path, docs_rows=DOCS, n_buckets=8):
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    store = str(tmp_path / "bm25_store")
    retrieval.build_postings_store(docs, store, n_buckets=n_buckets)
    return docs, store


def test_store_probe_matches_bm25_topk(spark, tmp_path):
    """Cold-read serving is bit-identical to the in-plan build."""
    docs, store = _store(spark, tmp_path)
    qs = spark.createDataFrame(QUERIES, "query_id long, query string")
    direct = {tuple(r) for r in retrieval.bm25_topk(docs, qs, k=3).collect()}
    served = {
        tuple(r)
        for r in retrieval.bm25_store_probe(qs, store, k=3).collect()
    }
    assert served == direct and direct  # non-empty and equal


def test_store_probe_partition_prunes(spark, tmp_path):
    """The postings scan must carry a PARTITION filter on the query
    terms' buckets — serve cost follows the matched slice."""
    _, store = _store(spark, tmp_path)
    qs = spark.createDataFrame([(10, "apple")], "query_id long, query string")
    out = retrieval.bm25_store_probe(qs, store, k=3)
    p = out._jdf.queryExecution().executedPlan().toString()
    pfs = [
        seg.split("PartitionFilters:")[1].splitlines()[0]
        for seg in p.split("FileScan")
        if "PartitionFilters:" in seg
    ]
    assert any("bucket" in pf for pf in pfs), p
    # the bucket filter carries an actual equality/IN, not just isnotnull
    assert any("bucket" in pf and ("=" in pf or " IN " in pf) for pf in pfs)
    assert "CartesianProduct" not in p


def test_store_probe_no_matching_terms(spark, tmp_path):
    _, store = _store(spark, tmp_path)
    qs = spark.createDataFrame(
        [(9, "kumquat zebra")], "query_id long, query string"
    )
    assert retrieval.bm25_store_probe(qs, store, k=3).count() == 0
    # distributed mode serves the same empty result without the literal
    # path's early return
    assert (
        retrieval.bm25_store_probe(
            qs, store, k=3, distributed_prune=True
        ).count()
        == 0
    )


def test_store_probe_distributed_prune_matches_literal_mode(spark, tmp_path):
    """Watch item r12: past BM25_DIST_PRUNE_QUERY_ROWS the probe must
    stop collecting distinct terms through the driver. The broadcast-join
    prune mode must (a) serve bit-identical rows, (b) carry a DPP
    subquery on the postings scan's bucket partition column instead of
    `isin` literal lists, and (c) never collect terms driver-side."""
    docs, store = _store(spark, tmp_path)
    qs = spark.createDataFrame(QUERIES, "query_id long, query string")
    lit_rows = {
        tuple(r)
        for r in retrieval.bm25_store_probe(
            qs, store, k=3, distributed_prune=False
        ).collect()
    }
    dist = retrieval.bm25_store_probe(qs, store, k=3, distributed_prune=True)
    assert {tuple(r) for r in dist.collect()} == lit_rows and lit_rows
    p = dist._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in p.lower(), p
    assert "CartesianProduct" not in p
    # the term restriction rides the broadcast join, not driver literals
    assert " IN (" not in p.split("FileScan")[0], p


@pytest.mark.slow
def test_store_probe_auto_flips_to_distributed_past_threshold(
    spark, tmp_path
):
    """auto mode: a query batch past BM25_DIST_PRUNE_QUERY_ROWS must take
    the broadcast-join prune (DPP subquery in the plan), and the flip
    decision itself is bounded (limit(N+1).count(), not a full scan)."""
    from pyspark.sql import functions as F

    _, store = _store(spark, tmp_path)
    n = retrieval.BM25_DIST_PRUNE_QUERY_ROWS + 1
    big = spark.range(n).select(
        F.col("id").alias("query_id"),
        F.concat(F.lit("apple banana q"), F.col("id")).alias("query"),
    )
    out = retrieval.bm25_store_probe(big, store, k=2)
    assert out.where(F.col("rank") == 1).count() == n  # every query served
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in p.lower(), p


@pytest.mark.slow
def test_store_probe_distributed_prune_with_incremental(spark, tmp_path):
    """The dual-mode contract holds through the streamed overlay path
    too: base + incremental serve is identical under both prune modes."""
    _, store, _, _ = _ingest(spark, tmp_path)
    qs = spark.createDataFrame(QUERIES, "query_id long, query string")
    lit_rows = {
        tuple(r)
        for r in retrieval.bm25_store_probe(
            qs, store, k=3, include_incremental=True,
            distributed_prune=False,
        ).collect()
    }
    dist_rows = {
        tuple(r)
        for r in retrieval.bm25_store_probe(
            qs, store, k=3, include_incremental=True,
            distributed_prune=True,
        ).collect()
    }
    assert dist_rows == lit_rows and lit_rows


def _ingest(spark, tmp_path):
    """Base store from docs 1-3; docs 4 and 5 arrive as 2 micro-batches."""
    import os
    import time

    from credit_abs_oltp_to_mart_spark.streaming.ops import (
        stream_postings_ingest,
    )

    base_rows = [r for r in DOCS if r[0] <= 3]
    docs, store = _store(spark, tmp_path, docs_rows=base_rows)
    src = str(tmp_path / "slices")
    now = time.time()
    for k, rows in enumerate([[DOCS[3]], [DOCS[4]]]):  # doc 4, then doc 5
        d = f"{src}/b{k}"
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(d)
        for f2 in os.listdir(d):
            if f2.endswith(".parquet"):
                t = now - 60 + 10 * k
                os.utime(os.path.join(d, f2), (t, t))
    got = stream_postings_ingest(
        spark, f"{src}/b*", store, schema="doc_id long, text string"
    )
    return docs, store, src, got


@pytest.mark.slow
def test_postings_ingest_union_serves_full_corpus(spark, tmp_path):
    """After ingest, base UNION overlay == a fresh build over the full
    corpus — df, totals (incl. the token-less doc 5's n_docs bump) and
    scores all bit-identical."""
    _, store, _, got = _ingest(spark, tmp_path)
    rows = {r["doc_id"]: r["ingest_batch"] for r in got.collect()}
    assert rows == {4: 0}  # doc 5 has no tokens -> no postings
    full = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "query_id long, query string")
    direct = {
        tuple(r) for r in retrieval.bm25_topk(full, qs, k=3).collect()
    }
    served = {
        tuple(r)
        for r in retrieval.bm25_store_probe(
            qs, store, k=3, include_incremental=True
        ).collect()
    }
    assert served == direct and direct
    # the token-less doc still bumped n_docs through the totals delta
    tot = spark.read.parquet(f"{store}/totals_inc").collect()
    assert sum(int(r["n_docs"]) for r in tot) == 2
    assert sum(int(r["n_toks"] or 0) for r in tot) == 6


@pytest.mark.slow
def test_postings_replay_idempotent(spark, tmp_path):
    import os

    from credit_abs_oltp_to_mart_spark.streaming.ops import (
        stream_postings_ingest,
    )

    _, store, src, got = _ingest(spark, tmp_path)
    first = {tuple(r) for r in got.collect()}
    commits = os.path.join(store, "ingest_checkpoint", "commits")
    os.remove(os.path.join(commits, "1"))
    crc = os.path.join(commits, ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    again = [
        tuple(r)
        for r in stream_postings_ingest(
            spark, f"{src}/b*", store, schema="doc_id long, text string"
        ).collect()
    ]
    assert set(again) == first
    assert len(again) == len(set(again))


@pytest.mark.slow
def test_postings_compaction_transparent(spark, tmp_path):
    from credit_abs_oltp_to_mart_spark.sources.maintenance import (
        compact_keyed_store,
    )

    _, store, _, _ = _ingest(spark, tmp_path)
    qs = spark.createDataFrame(QUERIES, "query_id long, query string")
    before = {
        tuple(r)
        for r in retrieval.bm25_store_probe(
            qs, store, k=3, include_incremental=True
        ).collect()
    }
    compact_keyed_store(
        spark, f"{store}/postings_inc", upto=1, dedup_cols=["term", "doc_id"]
    )
    # the totals overlay folds under the SAME protocol — but with NO
    # dedup_cols: every per-batch delta row must survive the merge
    # (serving sums them), so n_docs/n_toks/max_dl stay exact
    stats = compact_keyed_store(spark, f"{store}/totals_inc", upto=1)
    assert stats["compacted"] and stats["partitions_after"] == 1
    after = {
        tuple(r)
        for r in retrieval.bm25_store_probe(
            qs, store, k=3, include_incremental=True
        ).collect()
    }
    assert after == before


# ------------------------------------------------------------- overflow


ADVERSARIAL = [
    (1, "x " * 500_000 + "y"),  # tf(x)=500k, T~500k -> tf*T ~ 2.5e11
    (2, "x y z"),
    (3, "z z y"),
]


def test_overflow_guard_fires_loudly_bigint(spark):
    """With decimal_scores FORCED off, the row-side guard still fails
    the job loudly at magnitudes past the int64 envelope (the defense
    when auto selection is explicitly overridden)."""
    import pytest as _pytest

    docs = spark.createDataFrame(ADVERSARIAL, "doc_id long, text string")
    qs = spark.createDataFrame([(0, "x y")], "query_id long, query string")
    with _pytest.raises(Exception, match="bm25: int64 overflow"):
        retrieval.bm25_topk(docs, qs, k=3, decimal_scores=False).collect()


@pytest.mark.slow
def test_auto_mode_scores_exactly_beyond_bigint_bound(spark):
    """The production default (decimal_scores='auto'): a corpus whose
    driver-known magnitudes breach the int64 envelope scores EXACTLY
    (decimal path auto-selected) instead of dying on the loud guard —
    verified against the Python bigint replica."""
    docs = spark.createDataFrame(ADVERSARIAL, "doc_id long, text string")
    qs = spark.createDataFrame(
        [(0, "x y"), (1, "z")], "query_id long, query string"
    )
    got = {}
    for r in retrieval.bm25_topk(docs, qs, k=3).collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["rank"], r["score_fp"])
        )
    expect = _bm25_python(list(ADVERSARIAL), [(0, "x y"), (1, "z")], k=3)
    assert got[0] == expect[0]
    assert got[1] == expect[1]


@pytest.mark.slow
def test_auto_mode_store_probe_beyond_bigint_bound(spark, tmp_path):
    """Serve-side auto: the store's persisted totals (N, T, max_dl)
    drive the same decision — a probe of an adversarial-magnitude store
    scores exactly with the default mode."""
    docs, store = _store(spark, tmp_path, docs_rows=ADVERSARIAL)
    totals = retrieval.load_store_totals(spark, store)
    assert totals["max_dl"] == 500_001
    qs = spark.createDataFrame([(0, "x y")], "query_id long, query string")
    got = [
        (r["doc_id"], r["rank"], r["score_fp"])
        for r in retrieval.bm25_store_probe(qs, store, k=3).collect()
        if r["query_id"] == 0
    ]
    expect = _bm25_python(list(ADVERSARIAL), [(0, "x y")], k=3)
    assert got == expect[0]


@pytest.mark.slow
def test_auto_mode_tracks_incremental_max_dl(spark, tmp_path):
    """Serve-side auto with the streamed overlay: a small base store
    grown by an adversarial-magnitude ingest batch must flip the auto
    decision via the delta's recorded max_dl and still score exactly
    (base tf*T is tiny; only the driver-side totals fold knows the
    overlay broke the envelope)."""
    import os
    import time

    from credit_abs_oltp_to_mart_spark.streaming.ops import (
        stream_postings_ingest,
    )

    docs, store = _store(spark, tmp_path, docs_rows=[ADVERSARIAL[1]])
    assert retrieval.load_store_totals(spark, store)["max_dl"] == 3
    src = str(tmp_path / "adv_slices")
    d = f"{src}/b0"
    spark.createDataFrame(
        [ADVERSARIAL[0]], "doc_id long, text string"
    ).coalesce(1).write.parquet(d)
    now = time.time()
    for f2 in os.listdir(d):
        if f2.endswith(".parquet"):
            os.utime(os.path.join(d, f2), (now - 60, now - 60))
    stream_postings_ingest(
        spark, f"{src}/b*", store, schema="doc_id long, text string"
    )
    qs = spark.createDataFrame([(0, "x y")], "query_id long, query string")
    got = [
        (r["doc_id"], r["rank"], r["score_fp"])
        for r in retrieval.bm25_store_probe(
            qs, store, k=3, include_incremental=True
        ).collect()
    ]
    expect = _bm25_python(
        [ADVERSARIAL[1], ADVERSARIAL[0]], [(0, "x y")], k=3
    )
    assert got == expect[0]
    # the bigint arithmetic would have tripped the loud guard here
    import pytest as _pytest

    with _pytest.raises(Exception, match="bm25: int64 overflow"):
        retrieval.bm25_store_probe(
            qs, store, k=3, include_incremental=True, decimal_scores=False
        ).collect()


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_auto_decimal_decision_is_sound(seed):
    """Property pin (pure Python, exact ints): whenever _auto_decimal
    says the bigint path is safe, EVERY int64 intermediate of the
    scoring formula fits at the worst admissible row (tf = dl = max_dl,
    df in {1, N}) — i.e. the driver-side decision can never admit a row
    the row-side guard would reject."""
    import random

    rng = random.Random(seed)
    m = (1 << 63) - 1
    k1n, k1d = retrieval.BM25_K1
    bn, bd = retrieval.BM25_B
    checked = 0
    for _ in range(4000):
        s = rng.choice([10**4, 10**6, 10**9, 10**12, 10**14])
        n_docs = rng.randrange(1, 10 ** rng.randrange(1, 13))
        max_dl = rng.randrange(1, 10 ** rng.randrange(1, 10))
        n_toks = max_dl * rng.randrange(1, 1000)
        if retrieval._auto_decimal(
            n_docs, n_toks, max_dl, (k1n, k1d), (bn, bd), s
        ):
            continue  # decimal chosen: nothing to prove
        checked += 1
        tf = dl = max_dl
        # score numerator and the three denominator terms (den sums, so
        # each term must fit with the same 4x headroom the guard uses)
        assert s * tf * (k1n + k1d) * bd * n_toks <= m
        assert tf * k1d * bd * n_toks <= m // 4
        assert k1n * (bd - bn) * n_toks <= m // 4
        assert k1n * bn * dl * n_docs <= m // 4
        # idf numerator at the rarest admissible term (df -> 0 bound)
        assert s * (2 * n_docs + 1) <= m
    assert checked > 100  # the property must actually exercise bigint


def test_auto_decimal_decision_bounds():
    """Unit pin of the mode decision: in-range magnitudes stay bigint,
    each breached ceiling flips to decimal, unknown max_dl (legacy
    store) conservatively picks decimal, empty corpus stays bigint."""
    k1, b, s = retrieval.BM25_K1, retrieval.BM25_B, retrieval.BM25_SCALE
    c = retrieval._int64_ceilings(k1, b, s)
    assert retrieval._auto_decimal(1000, 50_000, 200, k1, b, s) is False
    # tf*T ceiling: max_dl just past c_tf_t // n_toks
    n_toks = 10**6
    assert retrieval._auto_decimal(
        1000, n_toks, c["tf_t"] // n_toks + 1, k1, b, s
    ) is True
    # N past the idf-numerator ceiling
    assert retrieval._auto_decimal(c["n"] + 1, 10, 5, k1, b, s) is True
    assert retrieval._auto_decimal(1000, 50_000, None, k1, b, s) is True
    assert retrieval._auto_decimal(0, 0, None, k1, b, s) is False


def test_decimal_scores_exact_at_adversarial_magnitudes(spark):
    """decimal(38,0) path: same formulas, exact at magnitudes the bigint
    path guards against — verified against the Python bigint replica."""
    docs = spark.createDataFrame(ADVERSARIAL, "doc_id long, text string")
    qs = spark.createDataFrame(
        [(0, "x y"), (1, "z")], "query_id long, query string"
    )
    got = {}
    for r in retrieval.bm25_topk(
        docs, qs, k=3, decimal_scores=True
    ).collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["rank"], r["score_fp"])
        )
    adv = [(d, t) for d, t in ADVERSARIAL]
    expect = _bm25_python(adv, [(0, "x y"), (1, "z")], k=3)
    assert got[0] == expect[0]
    assert got[1] == expect[1]


def test_decimal_and_bigint_paths_agree_in_range(spark):
    """Inside the int64 envelope the two arithmetics are bit-identical."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "query_id long, query string")
    a = {tuple(r) for r in retrieval.bm25_topk(docs, qs, k=3).collect()}
    b = {
        tuple(r)
        for r in retrieval.bm25_topk(
            docs, qs, k=3, decimal_scores=True
        ).collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# hybrid BM25 + ANN reciprocal-rank fusion (round 11; contract entry
# deferred to round 12 per the window-capacity discipline)
# ---------------------------------------------------------------------------


def _shortlist(spark, rows):
    return spark.createDataFrame(rows, "query_id long, doc_id long, rank long")


def test_hybrid_fusion_matches_fraction_reference(spark):
    """Literal-python reference: the fused ordering must equal ordering by
    the EXACT rational RRF score (fractions.Fraction), including docs
    present in only one list and cross-list ties broken by doc_id."""
    from fractions import Fraction

    from credit_abs_oltp_to_mart_spark.operators.retrieval import (
        hybrid_rank_fusion,
    )

    lex = {  # query -> [(doc, rank)]
        1: [(10, 1), (11, 2), (12, 3), (13, 4)],
        2: [(20, 1), (21, 2)],
    }
    sem = {
        1: [(12, 1), (10, 2), (14, 3)],
        2: [(22, 1), (21, 2)],  # 21 gets the same (2,2) ranks as... see q1
    }
    rrf_k, k = 60, 6
    got = hybrid_rank_fusion(
        _shortlist(spark, [(q, d, r) for q, ds in lex.items() for d, r in ds]),
        _shortlist(spark, [(q, d, r) for q, ds in sem.items() for d, r in ds]),
        k=k,
        rrf_k=rrf_k,
    ).collect()

    for q in (1, 2):
        scores = {}
        for d, r in lex[q]:
            scores[d] = scores.get(d, Fraction(0)) + Fraction(1, rrf_k + r)
        for d, r in sem[q]:
            scores[d] = scores.get(d, Fraction(0)) + Fraction(1, rrf_k + r)
        want = sorted(scores.items(), key=lambda t: (-t[1], t[0]))[:k]
        rows = sorted((r for r in got if r["query_id"] == q),
                      key=lambda r: r["rank"])
        assert [r["doc_id"] for r in rows] == [d for d, _ in want]
        # the separating fixed point orders exactly like the rationals:
        # strictly-greater fraction => strictly-greater fused_fp
        by_doc = {r["doc_id"]: r["fused_fp"] for r in rows}
        ds = [d for d, _ in want]
        for x, y in zip(ds, ds[1:]):
            if scores[x] > scores[y]:
                assert by_doc[x] > by_doc[y]
            else:
                assert by_doc[x] == by_doc[y]  # exact tie preserved
    # single-list docs carry NULL for the missing side
    r13 = next(r for r in got if r["doc_id"] == 13)
    assert r13["lex_rank"] == 4 and r13["sem_rank"] is None
    r14 = next(r for r in got if r["doc_id"] == 14)
    assert r14["lex_rank"] is None and r14["sem_rank"] == 3


def test_hybrid_fusion_end_to_end_over_real_probes(spark):
    """Compose the real shortlists: bm25_topk over documents (lexical) and
    brute_force_topk over embeddings (semantic, neighbor_id renamed).
    The fused top-k must respect both signals: a doc in both shortlists
    outranks the same-rank doc present in one."""
    from fractions import Fraction

    from credit_abs_oltp_to_mart_spark.operators import ann
    from credit_abs_oltp_to_mart_spark.operators.retrieval import (
        bm25_topk,
        hybrid_rank_fusion,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    queries = spark.createDataFrame(
        [(0, "the model data"), (1, "loan payment record")],
        "query_id long, query string",
    )
    lex = bm25_topk(docs, queries, k=8)
    sem = ann.brute_force_topk(emb, [0, 1], k=8).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    fused = hybrid_rank_fusion(lex, sem, k=5).collect()
    assert fused and {r["query_id"] for r in fused} == {0, 1}
    lex_rows = {(r["query_id"], r["doc_id"]): r["rank"] for r in lex.collect()}
    sem_rows = {(r["query_id"], r["doc_id"]): r["rank"] for r in sem.collect()}
    # python replay over the union of the real shortlists
    for q in (0, 1):
        scores = {}
        for (qq, d), r in list(lex_rows.items()) + list(sem_rows.items()):
            if qq == q:
                scores[d] = scores.get(d, Fraction(0)) + Fraction(1, 60 + r)
        want = [d for d, _ in sorted(
            scores.items(), key=lambda t: (-t[1], t[0])
        )[:5]]
        rows = sorted((r for r in fused if r["query_id"] == q),
                      key=lambda r: r["rank"])
        assert [r["doc_id"] for r in rows] == want


def test_hybrid_fusion_rank_guard_fails_loudly(spark):
    """A rank beyond max_rank breaks the separating-scale exactness proof:
    the operator must raise, never silently mis-rank."""
    import pytest as _pytest

    from credit_abs_oltp_to_mart_spark.operators.retrieval import (
        hybrid_rank_fusion,
    )

    lex = _shortlist(spark, [(1, 10, 1)])
    sem = _shortlist(spark, [(1, 11, 9)])
    ok = hybrid_rank_fusion(lex, sem, k=2, max_rank=9).collect()
    assert len(ok) == 2
    with _pytest.raises(Exception, match="max_rank"):
        hybrid_rank_fusion(lex, sem, k=2, max_rank=8).collect()
    with _pytest.raises(ValueError, match="int64"):
        hybrid_rank_fusion(lex, sem, k=2, max_rank=2000)


def test_hybrid_fusion_rrf_k_guard_fails_loudly(spark):
    """rrf_k < 1 (or fractional) can zero/negate an RRF denominator and
    Spark's integer-div-by-zero NULL would silently sort the doc LAST —
    the constructor must reject it before any plan is built."""
    import pytest as _pytest

    from credit_abs_oltp_to_mart_spark.operators.retrieval import (
        hybrid_rank_fusion,
    )

    lex = _shortlist(spark, [(1, 10, 1)])
    sem = _shortlist(spark, [(1, 11, 1)])
    for bad in (0, -61, 1.5, True):
        with _pytest.raises(ValueError, match="rrf_k"):
            hybrid_rank_fusion(lex, sem, k=2, rrf_k=bad)
    with _pytest.raises(ValueError, match="max_rank must"):
        hybrid_rank_fusion(lex, sem, k=2, max_rank=0)


def test_hybrid_fusion_contract_rehearsal(spark):
    """The registered contract pair (q_hybrid_fusion / "hybrid_rank_fusion"
    in the round-12 window's slack slot) compared the exact way the driver
    gate compares them: sorted columns, per-row values."""
    import duckdb

    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    got = entry_mod.q_hybrid_fusion(spark, sf).toPandas()
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"create view {t} as select * from"
            f" parquet_scan('{sf}/{t}.parquet')"
        )
    want = con.execute(entry_mod._hybrid_fusion_oracle()).fetchdf()
    assert sorted(got.columns) == sorted(want.columns)
    g = got[sorted(got.columns)].sort_values(
        ["w_lex", "query_id", "rank"]).reset_index(drop=True)
    w = want[sorted(want.columns)].sort_values(
        ["w_lex", "query_id", "rank"]).reset_index(drop=True)
    assert len(g) == len(w) > 0
    for col in g.columns:
        gv, wv = g[col].tolist(), w[col].tolist()
        norm = lambda xs: [None if x != x else int(x) for x in xs]  # noqa: E731
        assert norm(gv) == norm(wv), (col, gv[:8], wv[:8])


def test_hybrid_fusion_weighted_matches_fraction_reference(spark):
    """Integer list weights stay exact: ordering equals Fraction-weighted
    RRF, and weights=(1,1) reproduces the unweighted key bit-for-bit."""
    from fractions import Fraction

    from credit_abs_oltp_to_mart_spark.operators.retrieval import (
        hybrid_rank_fusion,
    )

    lex = [(1, 10, 1), (1, 11, 2), (1, 12, 3)]
    sem = [(1, 12, 1), (1, 13, 2), (1, 10, 3)]
    l_df, s_df = _shortlist(spark, lex), _shortlist(spark, sem)
    for w in ((1, 1), (3, 1), (1, 4), (0, 1)):
        got = sorted(
            hybrid_rank_fusion(l_df, s_df, k=4, weights=w).collect(),
            key=lambda r: r["rank"],
        )
        scores = {}
        for _, d, r in lex:
            scores[d] = scores.get(d, Fraction(0)) + Fraction(w[0], 60 + r)
        for _, d, r in sem:
            scores[d] = scores.get(d, Fraction(0)) + Fraction(w[1], 60 + r)
        want = [d for d, _ in sorted(
            scores.items(), key=lambda t: (-t[1], t[0]))[:4]]
        assert [r["doc_id"] for r in got] == want, w
    base = hybrid_rank_fusion(l_df, s_df, k=4).collect()
    w11 = hybrid_rank_fusion(l_df, s_df, k=4, weights=(1, 1)).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, w11))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="positive sum"):
        hybrid_rank_fusion(l_df, s_df, weights=(0, 0))
    with _pytest.raises(ValueError, match="envelope"):
        hybrid_rank_fusion(l_df, s_df, weights=(10**6, 1))


def test_hybrid_fusion_rejects_fractional_weights(spark):
    """ADVICE r12: weights=(0.6, 0.4) used to pass validation (sum > 0,
    non-negative) but F.lit(0.6).cast('long') truncates to 0, zeroing
    every fused_fp and silently degenerating the ranking to doc_id
    order. Fractional weights must fail LOUDLY at plan-build time."""
    import pytest as _pytest

    from credit_abs_oltp_to_mart_spark.operators.retrieval import (
        hybrid_rank_fusion,
    )

    l_df = _shortlist(spark, [(1, 10, 1), (1, 11, 2)])
    s_df = _shortlist(spark, [(1, 11, 1), (1, 12, 2)])
    for bad in ((0.6, 0.4), (1, 0.5), (0.5, 1), (True, 1), (1, False)):
        with _pytest.raises(ValueError, match="not an integer"):
            hybrid_rank_fusion(l_df, s_df, weights=bad)
    # integer-valued floats are still floats — same silent-truncation
    # class, same loud failure
    with _pytest.raises(ValueError, match="not an integer"):
        hybrid_rank_fusion(l_df, s_df, weights=(2.0, 1))


def test_hybrid_fusion_decimal_deep_shortlist_matches_fraction(spark):
    """The decimal(38,0) escape hatch (r13): deep-shortlist fusion at
    max_rank = 10_000 — where the int64 path's envelope check refuses —
    must order exactly like the rational RRF score (fractions.Fraction),
    weighted and unweighted, with ranks probing the full [1, 10_000]
    depth. S = (60 + 10_000)^4 ~ 1.02e16, so num * S ~ 5e20 only fits
    the decimal carrier; the quotient stays inside int64 per the
    envelope proof in the operator docstring."""
    from fractions import Fraction

    import pytest as _pytest

    from credit_abs_oltp_to_mart_spark.operators.retrieval import (
        hybrid_rank_fusion,
    )

    n, rrf_k, k = 10_000, 60, 25
    # deterministic partial overlap: lexical list ranks doc i at i;
    # semantic list ranks doc (i * 7919) mod (n + 500) at i — some docs
    # in both lists (often at wildly different depths), some in one
    lex = [(1, d, d) for d in range(1, n + 1)]
    sem = [(1, (r * 7919) % (n + 500), r) for r in range(1, n + 1)]
    l_df, s_df = _shortlist(spark, lex), _shortlist(spark, sem)

    with _pytest.raises(ValueError, match="decimal_scores=True"):
        hybrid_rank_fusion(l_df, s_df, k=k, max_rank=n)

    for w in ((1, 1), (3, 2)):
        got = sorted(
            hybrid_rank_fusion(
                l_df, s_df, k=k, rrf_k=rrf_k, max_rank=n,
                weights=w, decimal_scores=True,
            ).collect(),
            key=lambda r: r["rank"],
        )
        scores: dict = {}
        for _, d, r in lex:
            scores[d] = scores.get(d, Fraction(0)) + Fraction(w[0], rrf_k + r)
        for _, d, r in sem:
            scores[d] = scores.get(d, Fraction(0)) + Fraction(w[1], rrf_k + r)
        want = sorted(scores.items(), key=lambda t: (-t[1], t[0]))[:k]
        assert [r["doc_id"] for r in got] == [d for d, _ in want], w
        # strict rational order => strict fixed-point order; exact ties
        # (if any) => equal fixed points
        by_doc = {r["doc_id"]: r["fused_fp"] for r in got}
        ds = [d for d, _ in want]
        for x, y in zip(ds, ds[1:]):
            if scores[x] > scores[y]:
                assert by_doc[x] > by_doc[y]
            else:
                assert by_doc[x] == by_doc[y]


def test_hybrid_fusion_decimal_and_bigint_paths_agree_in_range(spark):
    """Inside the int64 envelope the two carriers compute the SAME
    floor(num * S / den) — fused_fp must be bit-identical, not merely
    order-identical (the bm25 decimal/bigint agreement precedent)."""
    from credit_abs_oltp_to_mart_spark.operators.retrieval import (
        hybrid_rank_fusion,
    )

    lex = [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1)]
    sem = [(1, 12, 1), (1, 13, 2), (2, 21, 1), (2, 20, 2)]
    l_df, s_df = _shortlist(spark, lex), _shortlist(spark, sem)
    a = hybrid_rank_fusion(l_df, s_df, k=5, weights=(2, 1)).collect()
    b = hybrid_rank_fusion(
        l_df, s_df, k=5, weights=(2, 1), decimal_scores=True
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_hybrid_fusion_decimal_envelope_guards(spark):
    """The decimal path's own two envelope checks fail loudly: 38-digit
    product overflow and bigint quotient overflow. The in-plan rank
    guard stays live in decimal mode too."""
    import pytest as _pytest

    from credit_abs_oltp_to_mart_spark.operators.retrieval import (
        hybrid_rank_fusion,
    )

    l_df = _shortlist(spark, [(1, 10, 1)])
    s_df = _shortlist(spark, [(1, 11, 1)])
    with _pytest.raises(ValueError, match="decimal"):
        hybrid_rank_fusion(
            l_df, s_df, max_rank=10**8, decimal_scores=True
        )
    # product fits 38 digits (2001 * (1+1e4)^5 ~ 2e23) but the bigint
    # quotient bound 2001 * (1+1e4)^4 / 2 ~ 1.0e19 exceeds 2^63
    with _pytest.raises(ValueError, match="quotient"):
        hybrid_rank_fusion(
            l_df, s_df, max_rank=10**4, rrf_k=1,
            weights=(2000, 1), decimal_scores=True,
        )
    deep = _shortlist(spark, [(1, 12, 1500)])
    with _pytest.raises(Exception, match="beyond max_rank"):
        hybrid_rank_fusion(
            l_df, deep, k=2, max_rank=1400, decimal_scores=True
        ).collect()


def test_rank_fusion_three_lists_matches_fraction_reference(spark):
    """The generalized L-list kernel (r13): three shortlists (the BM25
    body x BM25 title x dense-probe shape) fused under the L = 3
    separating scale S = (rrf_k+max_rank)^6 must order exactly like the
    weighted Fraction RRF — including docs present in 1, 2, or all 3
    lists. L = 3 at max_rank 1000 needs the decimal carrier (num * S ~
    (1060)^8 > int64), so this also pins the decimal envelope for L > 2;
    the int64 path is exercised at a small max_rank."""
    from fractions import Fraction

    import pytest as _pytest

    from credit_abs_oltp_to_mart_spark.operators.retrieval import rank_fusion

    lists = [
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1)],
        [(1, 12, 1), (1, 13, 2), (1, 10, 3), (2, 21, 1)],
        [(1, 13, 1), (1, 14, 2), (2, 20, 2), (2, 22, 1)],
    ]
    dfs = [_shortlist(spark, rows) for rows in lists]
    rrf_k, k = 60, 6
    for w, max_rank, dec in (
        ((1, 1, 1), 1000, True),
        ((3, 2, 1), 1000, True),
        ((1, 2, 4), 100, False),  # int64 path: 7*(160)^8 ~ 3e18 < 2^63
    ):
        got = rank_fusion(
            dfs, k=k, rrf_k=rrf_k, max_rank=max_rank, weights=w,
            decimal_scores=dec,
        ).collect()
        for q in (1, 2):
            scores: dict = {}
            for i, rows in enumerate(lists):
                for qq, d, r in rows:
                    if qq == q:
                        scores[d] = scores.get(d, Fraction(0)) + Fraction(
                            w[i], rrf_k + r
                        )
            want = sorted(scores.items(), key=lambda t: (-t[1], t[0]))[:k]
            rows_q = sorted(
                (r for r in got if r["query_id"] == q),
                key=lambda r: r["rank"],
            )
            assert [r["doc_id"] for r in rows_q] == [d for d, _ in want], (
                w, q,
            )
            by_doc = {r["doc_id"]: r["fused_fp"] for r in rows_q}
            ds = [d for d, _ in want]
            for x, y in zip(ds, ds[1:]):
                if scores[x] > scores[y]:
                    assert by_doc[x] > by_doc[y]
                else:
                    assert by_doc[x] == by_doc[y]
    # per-list NULL bookkeeping: doc 14 is only in list 2
    got = rank_fusion(dfs, k=6, decimal_scores=True).collect()
    r14 = next(r for r in got if r["doc_id"] == 14)
    assert (r14["rank_0"], r14["rank_1"], r14["rank_2"]) == (None, None, 2)
    # guards: int64 path at L=3/max_rank 1000 must refuse loudly
    with _pytest.raises(ValueError, match="decimal_scores=True"):
        rank_fusion(dfs, max_rank=1000)
    with _pytest.raises(ValueError, match="quotient"):
        rank_fusion(dfs, max_rank=10**4, decimal_scores=True)
    with _pytest.raises(ValueError, match="at least 2"):
        rank_fusion(dfs[:1])
    with _pytest.raises(ValueError, match="3 weights for"):
        rank_fusion(dfs[:2], weights=(1, 1, 1))


def test_rank_fusion_two_list_case_is_hybrid_fusion(spark):
    """The delegation contract: hybrid_rank_fusion(a, b) ==
    rank_fusion([a, b]) modulo the lex/sem column names, bit-for-bit."""
    from credit_abs_oltp_to_mart_spark.operators.retrieval import (
        hybrid_rank_fusion,
        rank_fusion,
    )

    l_df = _shortlist(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3)])
    s_df = _shortlist(spark, [(1, 12, 1), (1, 13, 2), (1, 10, 3)])
    a = hybrid_rank_fusion(l_df, s_df, k=5, weights=(2, 1)).collect()
    b = rank_fusion([l_df, s_df], k=5, weights=(2, 1)).collect()
    assert sorted(
        (r["query_id"], r["doc_id"], r["lex_rank"], r["sem_rank"],
         r["fused_fp"], r["rank"])
        for r in a
    ) == sorted(
        (r["query_id"], r["doc_id"], r["rank_0"], r["rank_1"],
         r["fused_fp"], r["rank"])
        for r in b
    )


def test_hybrid_fusion_store_backed_serving(spark, tmp_path):
    """The full hybrid-RAG serving composition on PERSISTED state: the
    BM25 postings store and the IVF index both built once, both probed
    cold, shortlists fused — and the fused result replays exactly from a
    Fraction reference over the two probes' own outputs."""
    from fractions import Fraction

    from credit_abs_oltp_to_mart_spark.operators import ann
    from credit_abs_oltp_to_mart_spark.operators.retrieval import (
        bm25_store_probe,
        build_postings_store,
        hybrid_rank_fusion,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    store = str(tmp_path / "bm25_store")
    idx = str(tmp_path / "ivf_idx")
    build_postings_store(docs, store)
    ann.build_ivf_index(emb, idx, init_ids=[10, 20, 30, 40], iterations=2)

    qs = spark.createDataFrame(
        [(0, "the data table"), (1, "model stream batch")],
        "query_id long, query string",
    )
    lex = bm25_store_probe(qs, store, k=6)
    qvecs = emb.where(F.col("vec_id").isin([0, 1]))
    sem = ann.ivf_index_probe(qvecs, idx, k=6, nprobe=2).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    fused = hybrid_rank_fusion(lex, sem, k=4).collect()
    assert fused and {r["query_id"] for r in fused} <= {0, 1}
    lr = {(r["query_id"], r["doc_id"]): r["rank"] for r in lex.collect()}
    sr = {(r["query_id"], r["doc_id"]): r["rank"] for r in sem.collect()}
    for q in {r["query_id"] for r in fused}:
        scores = {}
        for (qq, d), r in list(lr.items()) + list(sr.items()):
            if qq == q:
                scores[d] = scores.get(d, Fraction(0)) + Fraction(1, 60 + r)
        want = [d for d, _ in sorted(
            scores.items(), key=lambda t: (-t[1], t[0]))[:4]]
        rows = sorted((r for r in fused if r["query_id"] == q),
                      key=lambda r: r["rank"])
        assert [r["doc_id"] for r in rows] == want
