"""End-to-end corpus pipeline invariants on the driver documents table:
every stage shrinks or preserves the corpus, the dedup guarantee holds
(no surviving near-dup pair), train is decontaminated against eval, chunks
respect the token budget, and the whole pipeline is deterministic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.operators.dedup import minhash_lsh_pairs
from credit_abs_oltp_to_mart_spark.plans.corpus import (
    build_corpus,
    decontaminate_train,
    filter_documents,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def stages(docs):
    return build_corpus(docs)


def test_stage_counts_monotonic(docs, stages):
    n_in = docs.count()
    n_f = stages["filtered"].count()
    n_d = stages["deduped"].count()
    n_c = stages["clean"].count()
    assert n_in >= n_f >= n_d >= n_c > 0


def test_filter_gates_apply(docs):
    f = filter_documents(docs, min_quality=0.3, min_tokens=8)
    # re-derive the gates independently and assert no violator survived
    from credit_abs_oltp_to_mart_spark.functions.text import (
        quality_score,
        ws_token_count,
    )

    bad = f.where(
        (quality_score(F.col("text")) < 0.3)
        | (ws_token_count(F.col("text")) < 8)
    ).count()
    assert bad == 0


def test_no_surviving_near_dup_pair(stages):
    # any pair >= threshold would have been clustered; only the cluster
    # canonical survives, so the survivor set must be pair-free
    pairs = minhash_lsh_pairs(stages["deduped"], threshold=0.12)
    assert pairs.count() == 0


def test_exact_dups_keep_min_doc_id(spark, stages):
    d = stages["deduped"]
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), "[ ]+", " "))
    per_key = d.select(F.md5(norm).alias("ck"), "doc_id").groupBy("ck").count()
    assert per_key.where(F.col("count") > 1).count() == 0


def test_train_decontaminated_against_eval(stages):
    # recompute the overlap of surviving train docs vs eval grams: none may
    # reach the 0.5 drop bar
    from credit_abs_oltp_to_mart_spark.operators.dedup import shingle_rows

    clean = stages["clean"]
    grams = shingle_rows(clean, 5).join(
        clean.select("doc_id", "split"), "doc_id"
    )
    ev = grams.where(F.col("split") != "train").select("shingle").distinct()
    tr = grams.where(F.col("split") == "train")
    frac = (
        tr.join(ev, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("hit"))
        .join(
            tr.groupBy("doc_id").agg(F.count(F.lit(1)).alias("tot")), "doc_id"
        )
        .where(F.col("hit").cast("double") / F.col("tot") >= 0.5)
    )
    assert frac.count() == 0


def test_decontaminate_modes_agree(docs):
    """broadcast_eval is join physics, not semantics: both modes must
    produce the identical (doc_id, split) survivor set. The False mode is
    the past-the-broadcast-budget fallback (eval grams too big to ship),
    so its plan must contain NO BroadcastExchange on the gram join — a
    sort-merge/shuffle join is the point."""
    a = decontaminate_train(docs, broadcast_eval=True)
    b = decontaminate_train(docs, broadcast_eval=False)
    rows_a = sorted((r["doc_id"], r["split"]) for r in a.select("doc_id", "split").collect())
    rows_b = sorted((r["doc_id"], r["split"]) for r in b.select("doc_id", "split").collect())
    assert rows_a and rows_a == rows_b


def test_decontaminate_no_broadcast_plan_in_fallback_mode(docs):
    # the GRAM join (the memory cliff) must be sort-merge in fallback
    # mode; the final doc-level anti-join against the dropped-id list is
    # legitimately broadcast at any scale (it is bounded by dropped DOCS,
    # not grams) and stays
    p = (
        decontaminate_train(docs, broadcast_eval=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin [shingle" in p, p
    assert "BroadcastHashJoin [shingle" not in p, p
    assert p.count("BroadcastExchange") == 1, p  # only the doc anti-join
    pb = (
        decontaminate_train(docs, broadcast_eval=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in pb


def test_packed_chunks_respect_budget(stages):
    p = stages["packed"]
    assert p.where(F.col("n_tokens") > 64).count() == 0
    assert p.where((F.col("split") != "train")).count() == 0
    # bin index consistent with the running offset
    assert p.where(F.col("bin") != F.expr("start_tok div 256")).count() == 0


@pytest.mark.slow
def test_pipeline_deterministic(docs, stages):
    again = build_corpus(docs)["packed"]
    a = sorted(tuple(r) for r in stages["packed"].collect())
    b = sorted(tuple(r) for r in again.collect())
    assert a == b


@pytest.mark.slow
def test_build_corpus_span_cut_stage(docs):
    """cut_dup_spans=True: the spancut stage rewrites exactly the docs that
    carry corpus-wide duplicated spans, the rest stay byte-identical, and
    every downstream stage consumes the rewritten text."""
    from credit_abs_oltp_to_mart_spark.operators.textops import (
        duplicate_spans,
        remove_spans,
    )
    from credit_abs_oltp_to_mart_spark.plans.corpus import filter_documents

    from credit_abs_oltp_to_mart_spark.functions.text import ws_token_count

    stages = build_corpus(docs, cut_dup_spans=True)
    assert "spancut" in stages
    filtered = filter_documents(docs)
    rewritten = remove_spans(filtered, duplicate_spans(filtered, k=8))
    pre = {r["doc_id"]: (r["text"], r["n_removed"]) for r in rewritten.collect()}
    # the test corpus does contain shared passages...
    assert any(n > 0 for _, n in pre.values())
    # ...and the stage equals the rewrite with the token gate RE-APPLIED
    # post-cut (fully-cut docs must not survive as empty rows)
    expected = rewritten.where(ws_token_count(F.col("text")) >= 8)
    exp = {r["doc_id"]: r["text"] for r in expected.collect()}
    got = {r["doc_id"]: r["text"] for r in stages["spancut"].select("doc_id", "text").collect()}
    assert got == exp
    # downstream consumed the rewrite: no deduped doc still carries a
    # duplicated span FROM THE SPANCUT INPUT (spans were cut corpus-wide)
    n_dups_in_clean = duplicate_spans(
        stages["spancut"].select("doc_id", "text"), k=8
    ).count()
    assert n_dups_in_clean == 0


@pytest.mark.slow
def test_span_cut_drops_fully_cut_docs(spark):
    """Docs whose ENTIRE text is a corpus-wide duplicated span rewrite to
    empty; the re-applied token gate must drop them before dedup so no
    empty doc can reach the packed output (ADVICE r04)."""
    boiler = (
        "this is the standard license text that all of these pages share "
        "and it repeats the same words in the same order every single time "
        "so that the quality gate still sees a long enough document while "
        "the whole body remains one corpus wide duplicated span of tokens"
    )
    uniq = "a genuinely original passage about small boats on the river at dawn"
    docs = spark.createDataFrame(
        [(1, boiler), (2, boiler), (3, f"{uniq} {boiler}")],
        "doc_id long, text string",
    ).withColumn("lang", F.lit("en"))
    stages = build_corpus(docs, cut_dup_spans=True)
    # docs 1 and 2 are pure boilerplate -> fully cut -> gated out; doc 3
    # keeps its original passage
    kept = {r["doc_id"] for r in stages["spancut"].select("doc_id").collect()}
    assert kept == {3}
    assert stages["spancut"].where(F.trim(F.col("text")) == "").count() == 0
    # the packed output exists and every chunk carries real tokens
    packed = stages["packed"].collect()
    assert packed and all(r["n_tokens"] > 0 for r in packed)
    # keep_first_span=True: doc 1 owns every boiler gram's earliest
    # occurrence and survives byte-identical; its exact copy doc 2 is
    # fully cut; doc 3 keeps only its original passage
    kf = build_corpus(docs, cut_dup_spans=True, keep_first_span=True)
    got = {r["doc_id"]: r["text"] for r in kf["spancut"].select("doc_id", "text").collect()}
    assert set(got) == {1, 3}
    assert got[1] == boiler and got[3] == uniq


@pytest.mark.slow
def test_semantic_gate_drops_planted_paraphrase(spark, docs):
    """build_corpus(embeddings=...) arms the semantic decontamination
    stage: a TRAIN doc whose text shares no 5-grams with any eval doc (so
    the n-gram gate passes it) but whose EMBEDDING nearly equals an eval
    doc's is dropped from `semclean`/`packed`; every other survivor is
    untouched, and the default (no embeddings) output is unchanged."""
    from credit_abs_oltp_to_mart_spark.operators.curation import split_expr

    base = build_corpus(docs)
    clean = base["clean"].select("doc_id", "split")
    train_ids = [r["doc_id"] for r in clean.where(
        F.col("split") == "train").orderBy("doc_id").limit(3).collect()]
    eval_ids = [r["doc_id"] for r in clean.where(
        F.col("split") != "train").orderBy("doc_id").limit(2).collect()]
    assert train_ids and eval_ids
    planted, anchor = train_ids[0], eval_ids[0]
    bystander = train_ids[1]

    # hand-built embedding space: the planted train doc sits on the eval
    # anchor's axis (cosine ~1); everyone else is far away on other axes
    def vec(axis, eps=0.0):
        v = [0.0] * 8
        v[axis] = 1.0
        v[(axis + 1) % 8] = eps
        return v

    rows = [(planted, vec(0, 0.01)), (anchor, vec(0))]
    rows += [(i, vec(2 + (j % 5))) for j, i in enumerate(
        train_ids[1:] + eval_ids[1:])]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    gated = build_corpus(
        docs,
        embeddings=emb,
        semantic_threshold=0.95,
        semantic_init_ids=[planted, anchor, bystander],
    )
    kept = {r["doc_id"] for r in gated["semclean"].select("doc_id").collect()}
    base_kept = {r["doc_id"] for r in clean.collect()}
    assert planted not in kept                  # the paraphrase dropped
    assert kept == base_kept - {planted}        # and ONLY the paraphrase
    # eval docs are never dropped by the semantic gate (train-side verdicts)
    assert anchor in kept
    # packed shards carry no trace of the dropped doc
    assert gated["packed"].where(F.col("doc_id") == planted).count() == 0
    # docs WITHOUT an embedding pass the gate untouched (most of the
    # corpus here) — already implied by kept == base_kept - {planted}


@pytest.mark.slow
def test_semantic_gate_hier_assign_drops_planted_paraphrase(spark, docs):
    """semantic_assign="hier" routes the gate's codebook through
    kmeans_assign_hier (the O(sqrt(k)) scale path; flat read 13.34x at
    the 20x embeddings probe with corpus-scaled k, hier 0.91x): the same
    planted paraphrase drops — the near-identical train/eval pair lands
    in one leaf under any sane assignment — and "auto" past the k
    threshold makes the identical decision."""
    from credit_abs_oltp_to_mart_spark.operators.curation import split_expr

    base = build_corpus(docs)
    clean = base["clean"].select("doc_id", "split")
    train_ids = [r["doc_id"] for r in clean.where(
        F.col("split") == "train").orderBy("doc_id").limit(3).collect()]
    eval_ids = [r["doc_id"] for r in clean.where(
        F.col("split") != "train").orderBy("doc_id").limit(2).collect()]
    planted, anchor, bystander = train_ids[0], eval_ids[0], train_ids[1]

    def vec(axis, eps=0.0):
        v = [0.0] * 8
        v[axis] = 1.0
        v[(axis + 1) % 8] = eps
        return v

    # planted == anchor EXACTLY: identical vectors score identically
    # against any codebook, so they share a leaf under flat, hier and
    # auto alike — the test pins the knob, not k-means geometry
    rows = [(planted, vec(0)), (anchor, vec(0))]
    rows += [(i, vec(2 + (j % 5))) for j, i in enumerate(
        train_ids[1:] + eval_ids[1:])]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    kw = dict(
        embeddings=emb,
        semantic_threshold=0.95,
        semantic_init_ids=[planted, anchor, bystander],
    )
    hier = build_corpus(docs, semantic_assign="hier", **kw)
    base_kept = {r["doc_id"] for r in clean.collect()}
    kept = {r["doc_id"] for r in hier["semclean"].select("doc_id").collect()}
    assert kept == base_kept - {planted}
    # "auto" past the threshold = the hier decision, below it = flat
    auto = build_corpus(
        docs, semantic_assign="auto", semantic_hier_k_threshold=2, **kw
    )
    assert kept == {
        r["doc_id"] for r in auto["semclean"].select("doc_id").collect()
    }

    import pytest as _pytest

    with _pytest.raises(ValueError, match="semantic_assign"):
        build_corpus(docs, semantic_assign="bogus", **kw)


def test_semantic_gate_empty_embedding_pool_is_logged_noop(spark, docs):
    """Embeddings supplied but NO surviving doc has one: the gate cannot
    drop anything by definition — it must warn and no-op instead of
    training an empty codebook into an opaque downstream failure."""
    import warnings as _warnings

    emb = spark.createDataFrame(
        [(10**15 + i, [float(i), 1.0]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        gated = build_corpus(docs, embeddings=emb)
        n_clean = gated["clean"].count()
        n_sem = gated["semclean"].count()
    assert n_sem == n_clean > 0
    assert any("semantic decontamination" in str(w.message) for w in caught)
