"""DSIR importance selection + BFS shortest paths.

Both operators are exact by construction (bigint fixed-point evidence /
integer hop counts), so every test pins against a literal Python
reference computed independently of Spark.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.operators import dsir
from credit_abs_oltp_to_mart_spark.operators.graph_paths import bfs_distances


def _bucket(tok: str, buckets: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % buckets


def _py_dsir(rows, target_langs, buckets, k):
    """Literal reference: add-one fixed-point evidence + top-k order."""
    t_counts: dict[int, int] = {}
    r_counts: dict[int, int] = {}
    for _did, lang, text in rows:
        for tok in text.split():
            b = _bucket(tok, buckets)
            r_counts[b] = r_counts.get(b, 0) + 1
            if lang in target_langs:
                t_counts[b] = t_counts.get(b, 0) + 1
    ev = dsir.dsir_evidence(t_counts, r_counts, buckets=buckets)
    scored = []
    for did, _lang, text in rows:
        toks = text.split()
        scored.append(
            (did, len(toks), sum(ev[_bucket(t, buckets)] for t in toks))
        )
    sel = {
        did
        for did, _, _ in sorted(scored, key=lambda r: (-r[2], r[0]))[:k]
    }
    return {
        did: (nf, sc, int(did in sel)) for did, nf, sc in scored
    }


DOCS = [
    (1, "en", "credit risk credit exposure"),
    (2, "en", "loan loss provision model"),
    (3, "de", "kredit risiko modell"),
    (4, "fr", "perte de credit"),
    (5, "en", ""),
    (6, "de", "risiko risiko risiko risiko risiko"),
]


def test_dsir_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, lang string, text string")
    got = {
        r["doc_id"]: (r["n_feats"], r["dsir_score"], r["is_selected"])
        for r in dsir.dsir_select(
            df, F.col("lang") == "en", 3, buckets=32
        ).collect()
    }
    assert got == _py_dsir(DOCS, {"en"}, 32, 3)


def _py_gumbel_key(did, score, seed="dsir", res=256):
    import hashlib

    h = int(
        hashlib.md5(f"{seed}:{did}".encode()).hexdigest()[:15], 16
    ) % res
    return score + dsir.gumbel_noise_table(res)[h]


def test_dsir_gumbel_sampled_matches_python_reference(spark):
    """The Gumbel-top-k sampled variant replays from (seed, doc_id)
    alone: keys and the is_sampled flag match a from-scratch Python
    replica (md5 hash -> fixed-point Gumbel table -> top-k)."""
    df = spark.createDataFrame(DOCS, "doc_id bigint, lang string, text string")
    got = {
        r["doc_id"]: (r["gumbel_key"], r["is_sampled"])
        for r in dsir.dsir_select(
            df, F.col("lang") == "en", 3, buckets=32, gumbel_k=3
        ).collect()
    }
    base = _py_dsir(DOCS, {"en"}, 32, 3)
    keys = {did: _py_gumbel_key(did, sc) for did, (_, sc, _) in base.items()}
    samp = {
        did
        for did, _ in sorted(keys.items(), key=lambda t: (-t[1], t[0]))[:3]
    }
    expect = {did: (keys[did], int(did in samp)) for did in keys}
    assert got == expect


def test_dsir_gumbel_table_shape():
    """Fixed-point Gumbel quantile table: strictly increasing in the
    quantile index, negative tail / positive head (the Gumbel shape),
    and deterministic across calls."""
    gt = dsir.gumbel_noise_table()
    assert len(gt) == 256
    assert gt == sorted(gt) and gt[0] < 0 < gt[-1]
    assert gt == dsir.gumbel_noise_table()
    # mean of discretized Gumbel(0,1) ~ Euler-Mascheroni * scale
    assert abs(sum(gt) / len(gt) - 0.5772 * dsir.DSIR_SCALE) < 0.02 * dsir.DSIR_SCALE


def test_dsir_empty_doc_scores_zero_and_competes(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, lang string, text string")
    out = {
        r["doc_id"]: r
        for r in dsir.dsir_select(
            df, F.col("lang") == "en", 6, buckets=32
        ).collect()
    }
    assert out[5]["n_feats"] == 0 and out[5]["dsir_score"] == 0
    # k = corpus size -> everything selected, including the empty doc
    assert all(r["is_selected"] == 1 for r in out.values())


def test_dsir_dual_scan_equals_per_model_counts(spark):
    # dsir_select fits both models in ONE conditional-agg scan; the
    # public per-model helper must agree with it on each slice
    df = spark.createDataFrame(DOCS, "doc_id bigint, lang string, text string")
    t = {
        r["bucket"]: r["cnt"]
        for r in dsir.hashed_feature_counts(
            df.where(F.col("lang") == "en"), buckets=32
        ).collect()
    }
    r_ = {
        r["bucket"]: r["cnt"]
        for r in dsir.hashed_feature_counts(df, buckets=32).collect()
    }
    ref_t, ref_r = {}, {}
    for _did, lang, text in DOCS:
        for tok in text.split():
            b = _bucket(tok, 32)
            ref_r[b] = ref_r.get(b, 0) + 1
            if lang == "en":
                ref_t[b] = ref_t.get(b, 0) + 1
    assert t == ref_t and r_ == ref_r


def test_dsir_evidence_is_exact_bigint():
    # the division rule (2*S*c' + tot) // (2*tot) == floor(S*c'/tot + 1/2)
    for num, den in [(1, 3), (7, 2), (10**15, 7), (999999, 10**6)]:
        s = dsir._wround(num, den)
        assert s == (2 * dsir.DSIR_SCALE * num + den) // (2 * den)
    # target == raw -> evidence cancels to 0 in every bucket
    c = {0: 5, 3: 2}
    ev = dsir.dsir_evidence(c, c, buckets=8)
    assert set(ev) == set(range(8)) and all(v == 0 for v in ev.values())


def test_dsir_target_tokens_score_higher(spark):
    # docs made purely of target-only vs raw-only tokens must rank apart
    rows = [(i, "en", "alpha beta gamma") for i in range(3)] + [
        (i, "zz", "omega psi chi") for i in range(3, 9)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    out = dsir.dsir_select(df, F.col("lang") == "en", 3, buckets=64).collect()
    sel = {r["doc_id"] for r in out if r["is_selected"] == 1}
    assert sel == {0, 1, 2}


def _py_bfs(edges, n_vertices, sources, max_hops):
    dist = {s: 0 for s in sources}
    frontier = set(sources)
    for h in range(1, max_hops + 1):
        frontier = {
            d for s, d in edges if s in frontier and d not in dist
        }
        if not frontier:
            break
        for v in frontier:
            dist[v] = h
    return {v: dist.get(v, -1) for v in range(n_vertices)}


def test_bfs_matches_python_reference(spark):
    # a chain with a branch and two unreachable nodes
    edges = [(0, 1), (1, 2), (2, 3), (1, 4), (4, 3), (5, 6)]
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    v = spark.createDataFrame([(i,) for i in range(7)], "id bigint")
    got = {
        r["id"]: r["dist"]
        for r in bfs_distances(e, v, [0], max_hops=10).collect()
    }
    assert got == _py_bfs(edges, 7, [0], 10)
    assert got[3] == 3 and got[5] == -1 and got[6] == -1


def test_bfs_max_hops_truncates(spark):
    edges = [(i, i + 1) for i in range(6)]
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    v = spark.createDataFrame([(i,) for i in range(7)], "id bigint")
    got = {
        r["id"]: r["dist"]
        for r in bfs_distances(e, v, [0], max_hops=3).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: -1, 5: -1, 6: -1}


def test_bfs_multi_source_and_cycle(spark):
    # 0->1->2->0 cycle plus an offshoot; sources {0, 4}
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (4, 3)]
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    v = spark.createDataFrame([(i,) for i in range(5)], "id bigint")
    got = {
        r["id"]: r["dist"]
        for r in bfs_distances(e, v, [0, 4], max_hops=10).collect()
    }
    assert got == _py_bfs(edges, 5, [0, 4], 10)
    assert got[3] == 1  # via source 4, not the 3-hop cycle path


def test_bfs_source_without_edges(spark):
    e = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    v = spark.createDataFrame([(0,), (1,), (2,)], "id bigint")
    got = {
        r["id"]: r["dist"]
        for r in bfs_distances(e, v, [0], max_hops=5).collect()
    }
    assert got == {0: 0, 1: -1, 2: -1}


SEEDS = [7, 42, 1337]


@pytest.mark.parametrize("seed", SEEDS)
def test_dsir_random_corpus_matches_reference(spark, seed):
    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for did in range(40):
        n = int(rng.randint(0, 12))  # includes empty docs
        text = " ".join(vocab[j] for j in rng.randint(0, len(vocab), n))
        lang = ["en", "de", "fr"][int(rng.randint(0, 3))]
        rows.append((did, lang, text))
    k = int(rng.randint(1, 15))
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    got = {
        r["doc_id"]: (r["n_feats"], r["dsir_score"], r["is_selected"])
        for r in dsir.dsir_select(
            df, F.col("lang") == "en", k, buckets=16
        ).collect()
    }
    assert got == _py_dsir(rows, {"en"}, 16, k)


@pytest.mark.parametrize("seed", SEEDS)
def test_bfs_random_graph_matches_reference(spark, seed):
    rng = np.random.RandomState(seed)
    n = int(rng.randint(5, 30))
    m = int(rng.randint(0, 3 * n))
    # duplicates and self-loops included on purpose
    edges = [
        (int(a), int(b))
        for a, b in zip(rng.randint(0, n, m), rng.randint(0, n, m))
    ]
    sources = sorted(set(int(s) for s in rng.randint(0, n, 2)))
    max_hops = int(rng.randint(1, 8))
    e = spark.createDataFrame(edges or [(0, 0)], "src bigint, dst bigint")
    if not edges:
        e = e.limit(0)
    v = spark.createDataFrame([(i,) for i in range(n)], "id bigint")
    got = {
        r["id"]: r["dist"]
        for r in bfs_distances(e, v, sources, max_hops=max_hops).collect()
    }
    assert got == _py_bfs(edges, n, sources, max_hops)


def test_bfs_hub_graph_skew(spark):
    # a degree-2000 hub: the frontier⋈edges join must survive the skew
    # (AQE splits the hub partition) and every leaf lands at dist 1;
    # leaves chain one extra hop to a shared sink at dist 2
    n = 2000
    edges = [(0, i) for i in range(1, n + 1)] + [
        (i, n + 1) for i in range(1, n + 1)
    ]
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    v = spark.createDataFrame([(i,) for i in range(n + 2)], "id bigint")
    got = {
        r["id"]: r["dist"]
        for r in bfs_distances(e, v, [0], max_hops=5).collect()
    }
    assert got[0] == 0 and got[n + 1] == 2
    assert all(got[i] == 1 for i in range(1, n + 1))
