"""End-to-end training-corpus pipeline: raw documents -> packed shards.

Composes the per-operator building blocks into the complete path a 100 TB
pretraining ingest runs (the reference has no corpus tooling; this is the
extension surface assembled into one job):

1. filter   — language / quality / length / PII gates, all pure column
              expressions in ONE map-only pass over the corpus (no joins
              between signal operators; their expressions are inlined).
2. dedup    — exact (content-hash groupBy keeps the min doc_id), then
              MinHash-LSH near-dup pairs -> connected components -> only
              each cluster's canonical (min) doc survives.
3. decontam — deterministic split; train docs sharing >= ``max_overlap``
              of their n-grams with any val/test doc are dropped (the
              eval gram set is broadcast; the train side never shuffles
              on the gram key).
4. pack     — token-window chunking + concat-then-cut sequence packing
              into fixed-token bins, sharded by doc hash.

Every stage is deterministic (md5-derived hashing throughout), so rerunning
the pipeline on the same input bit-reproduces the same shards.

Scale posture: one content-hash shuffle (exact dedup), the LSH band/verify
shuffles on signatures (never text), one gram semi-join against a broadcast
eval set, one shard-key shuffle for packing. The filter stage fuses into
the scan.
"""

from __future__ import annotations

import math
import sys
import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.functions.text import (
    quality_score,
    ws_token_count,
)
from credit_abs_oltp_to_mart_spark.operators.components import (
    connected_components,
)
from credit_abs_oltp_to_mart_spark.operators.curation import (
    DECONTAM_N,
    pack_chunks,
    pii_signal_count,
    split_expr,
)
from credit_abs_oltp_to_mart_spark.operators.textops import lang_pred_expr
from credit_abs_oltp_to_mart_spark.operators.dedup import (
    minhash_lsh_pairs,
    shingle_rows,
)


def filter_documents(
    docs: DataFrame,
    *,
    min_quality: float = 0.3,
    min_tokens: int = 8,
    keep_langs: tuple[str, ...] = ("en", "de", "es", "fr"),
) -> DataFrame:
    """Quality/language/PII gate as ONE map-only projection+filter.

    The signal operators (textops.language_id / text_quality / pii_scan)
    exist for per-signal analysis; here their shared column-expression
    helpers (lang_pred_expr, pii_signal_count) are applied inline so the
    gate costs a single map-only pass — no doc_id joins between signals,
    and no drift from the per-signal operators' semantics."""
    t = F.col("text")
    return (
        docs.withColumn("lang_pred", lang_pred_expr(t))
        .withColumn("quality", quality_score(t))
        .withColumn("n_tokens", ws_token_count(t))
        .withColumn("pii_signals", pii_signal_count(t))
        .where(
            F.col("lang_pred").isin(list(keep_langs))
            & (F.col("quality") >= min_quality)
            & (F.col("n_tokens") >= min_tokens)
            & (F.col("pii_signals") == 0)
        )
        .select(*docs.columns)
    )


def dedup_documents(
    docs: DataFrame,
    *,
    n: int = 3,
    n_perm: int = 8,
    bands: int = 2,
    threshold: float = 0.12,
    seed: int = 42,
) -> DataFrame:
    """Exact + near-dup removal; each duplicate cluster keeps its min doc_id.

    Exact pass first (cheap content-hash shuffle) so byte-identical copies
    never reach the LSH stage; near-dup clusters come from verified
    MinHash-LSH pairs closed under transitivity (connected components)."""
    from pyspark.sql import Window

    # keep-min-doc-per-content-key as ONE shuffle (hash partition + sort on
    # the content key) instead of the groupBy-min + semi-join form, which
    # shuffles the corpus twice for the same result
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), "[ ]+", " "))
    w = Window.partitionBy("__ck").orderBy("doc_id")
    exact = (
        docs.withColumn("__ck", F.md5(norm))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__ck", "__rn")
    )

    pairs = minhash_lsh_pairs(
        exact, n=n, n_perm=n_perm, bands=bands, threshold=threshold, seed=seed
    )
    # The verified pair set is small by construction (near-dup rate x
    # corpus, never O(n^2)); checkpointing it eagerly means the LSH chain
    # runs ONCE even though both the edge list and the vertex set of the
    # component loop (and its eager per-round actions) derive from it.
    pairs = pairs.localCheckpoint(eager=True)
    # Only pair PARTICIPANTS enter the iterative component loop: isolated
    # docs are their own canonical by definition, so the corpus never
    # cycles through the O(log n) label rounds — at 100 TB the near-dup
    # subgraph is orders of magnitude smaller than the corpus, and the
    # final anti-join against the (small) drop set is broadcast-able.
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    pair_docs = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    # the pair set is already checkpointed, so its count is nearly free and
    # bounds the vertex count at 2x — sizing the component loop here skips
    # connected_components' internal auto-size action (an extra checkpoint
    # + count of the label state)
    session_parts = int(
        docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    cc_parts = max(1, min(session_parts, -(-2 * pairs.count() // 5_000_000)))
    comp = connected_components(edges, pair_docs, num_partitions=cc_parts)
    drop = comp.where(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    return exact.join(drop, "doc_id", "left_anti")


def decontaminate_train(
    docs: DataFrame,
    *,
    n: int = DECONTAM_N,
    max_overlap: float = 0.5,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Split the corpus and drop TRAIN docs that share >= ``max_overlap`` of
    their n-grams with the held-out val/test docs. Returns the surviving
    train docs plus the untouched eval docs, with a ``split`` column.

    ``broadcast_eval=True`` ships the distinct eval gram set to every
    executor so the train side never shuffles on the gram key. Practical
    bound: the eval split is ~20% of corpus grams, so this only holds while
    the DISTINCT eval grams fit the broadcast budget (a few GiB — roughly a
    10-100 GB corpus depending on gram dedup rate). Past that, pass
    ``broadcast_eval=False``: a sort-merge semi-join on the gram key —
    one extra shuffle of the train gram rows, but no driver/executor
    memory cliff. Against held-out EVAL BENCHMARKS (the common production
    case — a fixed set of eval suites, not a corpus split) the gram set is
    tiny and the broadcast path is always right."""
    tagged = docs.withColumn("split", split_expr())
    # split is a pure doc_id expression — computed inline on the gram rows
    # (a join back to an assignment table would shuffle the corpus twice)
    grams = shingle_rows(tagged, n).withColumn("split", split_expr())
    ev_grams = (
        grams.where(F.col("split") != "train")
        .select("shingle")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    if broadcast_eval:
        ev_grams = F.broadcast(ev_grams)
    else:
        # merge hint PINS the fallback physics: without it the planner's
        # size estimate (or AQE at runtime) quietly re-broadcasts the eval
        # gram set, resurrecting the exact memory cliff this mode avoids
        ev_grams = ev_grams.hint("merge")
    # ONE pass over the train grams: ev_grams has exactly one row per
    # distinct shingle, so the left join never duplicates a train row —
    # count(1) is the gram total and count(__hit) the overlap, from the
    # same aggregation (the previous semi-join + two-agg form scanned the
    # train gram rows twice)
    dropped = (
        grams.where(F.col("split") == "train")
        .join(ev_grams, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("__hit").alias("n_hit"),
        )
        .where(
            F.col("n_hit").cast("double") / F.col("n_grams").cast("double")
            >= max_overlap
        )
        .select("doc_id")
    )
    return tagged.join(dropped, "doc_id", "left_anti")


def build_corpus(
    docs: DataFrame,
    *,
    chunk_tokens: int = 64,
    bin_tokens: int = 256,
    shards: int = 8,
    cut_dup_spans: bool = False,
    span_k: int = 8,
    keep_first_span: bool = False,
    min_tokens: int = 8,
    embeddings: DataFrame | None = None,
    semantic_threshold: float = 0.4,
    semantic_init_ids: list[int] | None = None,
    semantic_iterations: int = 2,
    semantic_assign: str = "flat",
    semantic_sub_k: int | None = None,
    semantic_hier_k_threshold: int = 64,
) -> dict[str, DataFrame]:
    """Full pipeline; returns every stage so callers can write or audit any
    of them. ``packed`` is the trainer-facing output: train-split chunks
    laid end-to-end per shard with fixed-width bin assignment.

    ``cut_dup_spans=True`` inserts substring-level dedup between the
    quality gate and doc-level dedup: corpus-wide duplicated ``span_k``-
    token passages (boilerplate, licenses, templates — text doc-level
    MinHash cannot drop because the surrounding docs differ) are CUT from
    every document (``textops.duplicate_spans`` + ``remove_spans``);
    ``keep_first_span=True`` preserves the earliest occurrence of each
    duplicated passage and cuts only the later copies. Runs before
    doc-level dedup on purpose: span removal can collapse near-dups into
    exact dups, which the cheaper exact pass then takes.

    ``embeddings`` (a (vec_id, embedding) frame keyed by doc_id) arms the
    SEMANTIC decontamination gate after the n-gram one: surviving docs'
    embeddings assign to a shared k-means codebook
    (``semantic_init_ids``/``semantic_iterations``; default init = the 8
    lowest present ids, deterministic) and TRAIN docs within
    ``semantic_threshold`` cosine of a same-cluster eval doc drop
    (``curation.semantic_decontaminate``) — the paraphrase-leakage gate
    the n-gram overlap provably misses. Docs WITHOUT an embedding pass
    the gate untouched (they cannot be semantically checked; the n-gram
    gate already judged them). Stage key: ``semclean``. If NO surviving
    doc has an embedding, the gate is a logged no-op (nothing can drop)
    rather than training an empty codebook into an opaque failure.

    ``semantic_assign`` picks the codebook-assignment kernel feeding the
    gate: ``"flat"`` (default, ``kmeans_assign`` — exact O(N*k*dim),
    right for the small fixed codebooks the contract query uses),
    ``"hier"`` (``kmeans_assign_hier`` — two-level O(N*(sqrt(k)+sub_k)*
    dim); the 100 TB path when k scales with the corpus per SemDeDup's
    own recipe: the r11 embeddings-axis probe read FLAT at 13.34x for
    20x data vs 0.91x for the hier composition), or ``"auto"`` (hier
    once ``len(semantic_init_ids) > semantic_hier_k_threshold``, flat
    below it). Under hier the flat request of k = len(init_ids) seeds is
    split into ceil(k/sub_k) coarse seeds (the first ids) x ``sub_k``
    sub-centroids per cell (``semantic_sub_k``, default ceil(sqrt(k))),
    keeping the total leaf count ~= the flat request — cluster labels
    stay vec_ids either way, so ``semantic_decontaminate`` is agnostic
    to which kernel produced them."""
    if semantic_assign not in ("flat", "hier", "auto"):
        raise ValueError(
            "build_corpus: semantic_assign must be 'flat', 'hier' or"
            f" 'auto', got {semantic_assign!r}"
        )
    # persisted BEFORE dedup: the dedup stage eagerly materializes its
    # verified pair set (localCheckpoint inside dedup_documents), which
    # would otherwise re-run the full regex-heavy filter gate once for the
    # pair chain and once more per downstream stage. First eager use
    # populates the cache; every later stage reads it back.
    filtered = filter_documents(docs, min_tokens=min_tokens).persist()
    stages = {"filtered": filtered}
    gated = filtered
    if cut_dup_spans:
        from credit_abs_oltp_to_mart_spark.operators.textops import (
            duplicate_spans,
            remove_spans,
        )

        spans = duplicate_spans(filtered, k=span_k, keep_first=keep_first_span)
        rewritten = remove_spans(filtered, spans)
        # rejoin the rewrite onto the doc's other columns; persist — it
        # feeds the dedup pair chain and every later stage, like filtered.
        # The length gate is RE-APPLIED after the cut: a doc whose text was
        # mostly duplicated spans can come back below the token floor (or
        # fully empty — all such docs would otherwise collapse to one
        # surviving empty doc in dedup and reach the packed output).
        gated = (
            filtered.drop("text")
            .join(rewritten.drop("n_removed"), "doc_id")
            .where(ws_token_count(F.col("text")) >= min_tokens)
            .persist()
        )
        stages["spancut"] = gated
    # Lineage cuts (lazy localCheckpoint): by this point the logical tree
    # under `deduped` carries the whole regex-heavy filter gate, the exact-dup
    # window and the LSH pair chain. Left uncut, EVERY downstream DataFrame
    # operation (mixture, packing, manifest, epoch orders, the entry-side
    # audit branches) re-analyzes that tree from scratch — measured at ~10 s
    # of pure driver time per composite invocation at sf0.1, dwarfing the
    # executor work. The cut replaces the subtree with a LogicalRDD leaf so
    # downstream analysis is O(downstream), and it also materializes `deduped`
    # once per run where the previous plan recomputed it 3x inside
    # decontaminate_train (tagged + the two gram consumers). eager=False: no
    # extra job — the first real action populates it. Values are unchanged
    # (checkpointing replays the identical deterministic plan); at 100 TB the
    # same cut would be a durable-storage checkpoint of the post-dedup corpus,
    # which a real ingest writes out at this stage anyway.
    deduped = dedup_documents(gated).localCheckpoint(eager=False)
    clean = decontaminate_train(deduped).localCheckpoint(eager=False)
    # "clean" stays the n-gram gate's output even when the semantic gate
    # runs after it — auditors diff the two stages to see what the
    # paraphrase gate caught that the verbatim gate missed
    stages["clean"] = clean
    if embeddings is not None:
        from credit_abs_oltp_to_mart_spark.operators.curation import (
            semantic_decontaminate,
        )
        from credit_abs_oltp_to_mart_spark.operators.kmeans import (
            kmeans_assign,
            kmeans_assign_hier,
        )

        emb = embeddings.select("vec_id", "embedding")
        # restrict to docs still alive after the n-gram gate — the
        # semantic gate judges survivors, and the codebook trains on
        # exactly the population it will restrict
        pool = emb.join(
            clean.select(F.col("doc_id").alias("vec_id")),
            "vec_id",
            "left_semi",
        ).persist()
        if semantic_init_ids is None:
            # deterministic default: the 8 lowest present ids (bounded
            # driver collect, codebook-sized)
            semantic_init_ids = [
                r["vec_id"]
                for r in pool.select("vec_id")
                .orderBy("vec_id")
                .limit(8)
                .collect()
            ]
        if not semantic_init_ids:
            # no surviving doc has an embedding (the default-init collect
            # above came back empty — for explicit init_ids the caller
            # owns seed validity and no extra eager job is spent here):
            # the gate can drop nothing by definition — skip it loudly
            # instead of training an empty codebook into an opaque
            # downstream failure
            warnings.warn(
                "build_corpus: embeddings were supplied but no surviving"
                " doc has one — the semantic decontamination gate is a"
                " no-op for this corpus",
                stacklevel=2,
            )
            pool.unpersist()
            stages["semclean"] = clean
        else:
            k_req = len(semantic_init_ids)
            use_hier = semantic_assign == "hier" or (
                semantic_assign == "auto"
                and k_req > semantic_hier_k_threshold
            )
            if use_hier:
                sub_k = semantic_sub_k or math.ceil(math.sqrt(k_req))
                n_coarse = max(1, math.ceil(k_req / sub_k))
                assign = kmeans_assign_hier(
                    pool,
                    coarse_init_ids=semantic_init_ids[:n_coarse],
                    sub_k=sub_k,
                    coarse_iterations=semantic_iterations,
                    sub_iterations=semantic_iterations,
                )
            else:
                assign = kmeans_assign(
                    pool,
                    init_ids=semantic_init_ids,
                    iterations=semantic_iterations,
                )
            train_emb = pool.join(
                clean.where(F.col("split") == "train").select(
                    F.col("doc_id").alias("vec_id")
                ),
                "vec_id",
                "left_semi",
            )
            eval_emb = pool.join(
                clean.where(F.col("split") != "train").select(
                    F.col("doc_id").alias("vec_id")
                ),
                "vec_id",
                "left_semi",
            )
            verdicts = semantic_decontaminate(
                train_emb, eval_emb, assign, threshold=semantic_threshold
            )
            # the drop list is contaminated-train-doc-sized; materialize it
            # eagerly so the pool's cache (which the whole verdict chain
            # reads) can be released before the caller materializes
            # downstream stages
            sem_drop = (
                verdicts.where(F.col("dropped"))
                .select(F.col("vec_id").alias("doc_id"))
                .localCheckpoint(eager=True)
            )
            pool.unpersist()
            clean = clean.join(F.broadcast(sem_drop), "doc_id", "left_anti")
            stages["semclean"] = clean
    train = clean.where(F.col("split") == "train")
    packed = pack_chunks(
        train, chunk_tokens=chunk_tokens, bin_tokens=bin_tokens, shards=shards
    ).join(train.select("doc_id", "split"), "doc_id")
    stages["deduped"] = deduped
    stages.setdefault("clean", clean)
    stages["packed"] = packed
    return stages


def run_corpus_pipeline(
    spark: SparkSession,
    docs_path: str,
    out_dir: str,
    *,
    cut_dup_spans: bool = False,
    keep_first_span: bool = False,
) -> dict[str, int]:
    """CLI flow: read a documents parquet, run the pipeline, write the packed
    shards partitioned by shard, return per-stage row counts."""
    docs = spark.read.parquet(docs_path)
    stages = build_corpus(
        docs, cut_dup_spans=cut_dup_spans, keep_first_span=keep_first_span
    )
    # persist each stage before the write + counts: the stages chain off one
    # another, so un-persisted counts would re-run the whole upstream
    # (LSH self-join, iterative components) once per stage — ~5x the work
    for df in stages.values():
        df.persist()
    try:
        stages["packed"].write.mode("overwrite").partitionBy("shard").parquet(
            f"{out_dir}/train_shards.parquet"
        )
        counts = {k: df.count() for k, df in stages.items()}
        counts["input"] = docs.count()
    finally:
        for df in stages.values():
            df.unpersist()
    return counts


def main(argv: list[str]) -> int:
    from credit_abs_oltp_to_mart_spark.session import get_spark

    flags = ("--cut-dup-spans", "--keep-first-span")
    args = [a for a in argv[1:] if a not in flags]
    docs_path, out_dir = args[0], args[1]
    counts = run_corpus_pipeline(
        get_spark(app_name="corpus"),
        docs_path,
        out_dir,
        cut_dup_spans="--cut-dup-spans" in argv,
        keep_first_span="--keep-first-span" in argv,
    )
    for k in ("input", "filtered", "spancut", "deduped", "clean", "packed"):
        if k in counts:
            print(f"{k}: {counts[k]}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))


def build_training_manifest(
    docs: DataFrame,
    *,
    chunk_tokens: int = 64,
    bin_tokens: int = 256,
    shards: int = 8,
    epoch_seeds: tuple[int, ...] = (0, 1),
    min_tokens: int = 8,
    copy_id_stride: int = 64,
    tokenizer_word_frame: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """The trainer-facing TAIL of the pipeline, composed end to end: the
    cleaned train split from ``build_corpus`` feeds the temperature
    mixture (``mixture_weights`` -> ``mixture_apply``), the REPLICATED
    corpus packs into fixed-width shard bins (copy k of doc d packs
    under id d * ``copy_id_stride`` + k, so copies are distinct pack
    units and the base doc is recoverable by integer division), the
    packed table rolls up into the loader manifest, and each seed in
    ``epoch_seeds`` yields its deterministic epoch read order — exactly
    the artifact chain a distributed trainer consumes: WHAT to read
    (manifest), HOW MUCH of each domain (mixture), in WHAT order per
    epoch (epoch_shuffle).

    Scale posture is inherited piecewise from the parts, all
    individually plan-gated: map-only gate, single-shuffle dedup,
    broadcast decontamination, broadcast domain weights + map-only
    replication, one shard shuffle for packing, one integer groupBy for
    the manifest, bucket-partitioned epoch rank. ``copy_id_stride``
    bounds per-doc replication (sample_factor must stay below it — at
    temperature alpha = 0.5 factors are single digits).

    ``tokenizer_word_frame`` (a trained ``bpe_train`` word frame) swaps
    the whitespace ``pack_chunks`` tail for ``bpe_pack``: the replicated
    corpus is segmented under the TRAINED vocabulary and the shards carry
    token-id runs — the payload a real trainer consumes, and the batch
    twin of ``stream_corpus_ingest``'s tokenizer mode. Same shuffle
    budget (one broadcast-mapped tokenize pass replaces the whitespace
    chunk split); docs with unseen words are excluded by ``bpe_pack``'s
    contract rather than packed truncated.

    Returns every stage of ``build_corpus`` plus train / weights /
    mixture / packed_mix / manifest / epochs."""
    from credit_abs_oltp_to_mart_spark.operators.bpe import bpe_pack
    from credit_abs_oltp_to_mart_spark.operators.curation import (
        epoch_shuffle,
        mixture_apply,
        mixture_weights,
        pack_manifest,
    )

    # ``tokenizer_word_frame`` may be a zero-arg callable (e.g. a deferred
    # ``bpe_train``): tokenizer training is independent of the corpus-
    # cleaning chain and is only NEEDED at the packing step below, so a
    # callable is trained on a driver thread WHILE build_corpus runs its
    # eager dedup work (guide §2.6 — the two setup costs overlap to max()
    # instead of sum()). The resolved frame is returned under the
    # ``tokenizer_wf`` stage key either way.
    wf_future = None
    if callable(tokenizer_word_frame):
        from concurrent.futures import ThreadPoolExecutor

        _pool = ThreadPoolExecutor(max_workers=1)
        wf_future = _pool.submit(tokenizer_word_frame)
        _pool.shutdown(wait=False)
    stages = build_corpus(
        docs,
        chunk_tokens=chunk_tokens,
        bin_tokens=bin_tokens,
        shards=shards,
        min_tokens=min_tokens,
    )
    if wf_future is not None:
        tokenizer_word_frame = wf_future.result()
    train = stages["clean"].where(F.col("split") == "train").persist()
    weights = mixture_weights(train)
    copies = mixture_apply(train, weights)
    rep = copies.join(train.select("doc_id", "text"), "doc_id").select(
        (F.col("doc_id") * copy_id_stride + F.col("copy_no")).alias("doc_id"),
        "text",
    )
    if tokenizer_word_frame is not None:
        packed = bpe_pack(
            rep,
            tokenizer_word_frame,
            chunk_tokens=chunk_tokens,
            bin_tokens=bin_tokens,
            shards=shards,
        )
    else:
        packed = pack_chunks(
            rep, chunk_tokens=chunk_tokens, bin_tokens=bin_tokens, shards=shards
        )
    # lineage cut, not just a cache: the manifest is (shard, bin)-sized and
    # feeds the per-seed epoch orders plus several entry-side audit
    # branches — each re-analyzed the full pack subtree when manifest was
    # merely persisted (~2.5 s of driver time per composite at sf0.1)
    manifest = pack_manifest(packed).localCheckpoint(eager=False)
    epochs = None
    for seed in epoch_seeds:
        e = epoch_shuffle(manifest, seed=seed).select(
            F.lit(seed).cast("int").alias("epoch"),
            "read_order",
            "shard",
            "bin",
            "filled_tokens",
        )
        epochs = e if epochs is None else epochs.unionByName(e)
    stages.update(
        train=train,
        weights=weights,
        mixture=copies,
        packed_mix=packed,
        manifest=manifest,
        epochs=epochs,
        tokenizer_wf=tokenizer_word_frame,
    )
    return stages
