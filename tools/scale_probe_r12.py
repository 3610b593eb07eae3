#!/usr/bin/env python
"""Round-12 scale probes.

1. ``hybrid_cold_serve`` — the hybrid-RAG serving composition priced
   COLD from persisted stores at 1x vs Nx corpus: the BM25 postings
   store and the IVF index are built once per factor (build walls
   recorded for context; builds are the offline path by contract), then
   ``bm25_store_probe`` alone, ``ivf_index_probe`` alone, and the
   ``hybrid_rank_fusion`` composition over both are each timed
   min-of-3. The claim under test: fusion adds O(queries * k) over the
   two probes — its overhead (fused - lex - sem) must stay ~constant
   while the corpus scales, and the probes themselves near-flat
   (bucket-pruned / DPP-pruned serve paths).

2. ``semclean_api`` — build_corpus's semantic-decontamination stage
   priced THROUGH THE CONVENIENCE API at 1x vs Nx corpus with
   corpus-scaled k (SemDeDup's own recipe), flat vs hier assignment.
   The timed window is the full build_corpus(embeddings=...) call up to
   a materialized ``semclean`` (the gate computes eagerly inside the
   call via the drop-list localCheckpoint), so it INCLUDES the
   document-axis upstream (filter/dedup/n-gram gate — probed separately
   in scale_probe.py); the flat-vs-hier DELTA at a fixed factor
   isolates exactly what ``semantic_assign`` switches, since upstream
   work is identical across modes. The r11 operator-level probe showed
   flat 13.34x / hier 0.91x at 20x; this pins the same verdict on the
   build_corpus wiring the r11 VERDICT called out as unreachable.

Scaling regime (shared): copy k of the documents table rotates each
doc's WORD sequence by 7*k positions (token stats and quality scores
unchanged; shingle sets ~disjoint across copies so doc-level dedup does
not collapse the scale-up) under doc_id + k*10_000_000; embeddings use
the norm-preserving element rotation from scale_probe_emb.py under the
same id scheme, so embedding ids stay doc-aligned.

Usage: python tools/scale_probe_r12.py [--factor 20]
       [--sf-dir /root/testdata/sf0.1] [--only hybrid_cold_serve]
       [--out bench_ab_r12/scale_probe_r12.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_K = 8
N_QUERIES = 16
BM25_K = 6
FUSE_K = 4
SEM_THRESHOLD = 0.4


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=20)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    only = (
        {x.strip() for x in args.only.split(",") if x.strip()}
        if args.only
        else None
    )

    from pyspark.sql import functions as F

    from credit_abs_oltp_to_mart_spark.session import get_spark

    spark = get_spark(app_name="scale_probe_r12")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    docs_base = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    emb_base = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n_docs = docs_base.count()
    n_vecs = emb_base.count()
    dim = len(emb_base.first()["embedding"])

    def scaled_docs(factor: int):
        copies = []
        for k in range(factor):
            shift = (7 * k) % 97 + 1  # != 0 so copies never share shingles
            rotated = F.expr(
                "array_join(concat("
                f" slice(split(text, ' '), {shift} + 1,"
                f"       greatest(size(split(text, ' ')) - {shift}, 0)),"
                f" slice(split(text, ' '), 1,"
                f"       least({shift}, size(split(text, ' '))))"
                "), ' ')"
            )
            copies.append(
                docs_base.select(
                    (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
                    rotated.alias("text"),
                    *[
                        c
                        for c in docs_base.columns
                        if c not in ("doc_id", "text")
                    ],
                )
            )
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        return out

    def scaled_emb(factor: int):
        copies = []
        for k in range(factor):
            rot = k % dim
            rotated = F.expr(
                f"concat(slice(embedding, {rot + 1}, {dim - rot}),"
                f" slice(embedding, 1, {rot}))"
            )
            copies.append(
                emb_base.select(
                    (F.col("vec_id") + F.lit(k * 10_000_000)).alias("vec_id"),
                    rotated.alias("embedding"),
                )
            )
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        return out

    def mat(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def min3(fn) -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        return round(best, 3)

    def emb_init_ids(factor: int) -> list[int]:
        step = max(1, n_vecs // BASE_K)
        return [
            k * 10_000_000 + i * step
            for k in range(factor)
            for i in range(BASE_K)
        ]

    tmp = tempfile.mkdtemp(prefix="scale_probe_r12_")
    results: dict = {
        "task": (
            "r12: hybrid serving composition cold from persisted stores"
            " + build_corpus semclean stage through the convenience API"
            " (corpus-scaled k, flat vs hier)"
        ),
        "n_docs_1x": n_docs,
        "n_vecs_1x": n_vecs,
        "dim": dim,
        "factor": args.factor,
        "base_k": BASE_K,
    }

    # ---------------------------------------------------------- hybrid serve
    if only is None or "hybrid_cold_serve" in only:
        from credit_abs_oltp_to_mart_spark.operators import ann
        from credit_abs_oltp_to_mart_spark.operators.retrieval import (
            bm25_store_probe,
            build_postings_store,
            hybrid_rank_fusion,
        )

        # query workload is FIXED across factors (serving cost must not
        # scale with the corpus): base-copy doc ids for the vectors, the
        # most frequent corpus words for the text queries
        qid_step = max(1, n_vecs // N_QUERIES)
        qids = [i * qid_step for i in range(N_QUERIES)]
        top_words = [
            r["w"]
            for r in docs_base.select(
                F.explode(F.split("text", " +")).alias("w")
            )
            .where(F.length("w") > 2)
            .groupBy("w")
            .count()
            .orderBy(F.desc("count"), "w")
            .limit(2 * N_QUERIES)
            .collect()
        ]
        n_q = min(len(qids), len(top_words) // 2)
        qtexts = [
            (qid, f"{top_words[2 * i]} {top_words[2 * i + 1]}")
            for i, qid in enumerate(qids[:n_q])
        ]
        qs = spark.createDataFrame(qtexts, "query_id long, query string")

        hybrid: dict = {}
        for label, factor in (("1x", 1), (f"{args.factor}x", args.factor)):
            docsF = scaled_docs(factor)
            docsF.write.mode("overwrite").parquet(f"{tmp}/docs_{factor}")
            docsF = spark.read.parquet(f"{tmp}/docs_{factor}")
            embF = scaled_emb(factor)
            embF.write.mode("overwrite").parquet(f"{tmp}/emb_{factor}")
            embF = spark.read.parquet(f"{tmp}/emb_{factor}")
            store = f"{tmp}/bm25_store_{factor}"
            idx = f"{tmp}/ivf_idx_{factor}"
            t0 = time.perf_counter()
            build_postings_store(docsF, store)
            bm25_build = time.perf_counter() - t0
            t0 = time.perf_counter()
            ann.build_ivf_index(
                embF, idx, init_ids=emb_init_ids(factor), iterations=2
            )
            ivf_build = time.perf_counter() - t0
            qvecs = embF.where(F.col("vec_id").isin(qids))

            def lex_df():
                return bm25_store_probe(qs, store, k=BM25_K)

            def sem_df():
                return ann.ivf_index_probe(
                    qvecs, idx, k=BM25_K, nprobe=2
                ).select(
                    "query_id",
                    F.col("neighbor_id").alias("doc_id"),
                    "rank",
                )

            t_lex = min3(lambda: mat(lex_df()))
            t_sem = min3(lambda: mat(sem_df()))
            t_fused = min3(
                lambda: mat(hybrid_rank_fusion(lex_df(), sem_df(), k=FUSE_K))
            )
            hybrid[label] = {
                "bm25_store_build_sec": round(bm25_build, 3),
                "ivf_index_build_sec": round(ivf_build, 3),
                "lex_probe_sec": t_lex,
                "sem_probe_sec": t_sem,
                "fused_serve_sec": t_fused,
                "fusion_overhead_sec": round(t_fused - t_lex - t_sem, 3),
            }
            print("hybrid_cold_serve", label, hybrid[label], flush=True)
        results["hybrid_cold_serve"] = hybrid

    # ------------------------------------------------------------- semclean
    if only is None or "semclean_api" in only:
        from credit_abs_oltp_to_mart_spark.plans.corpus import build_corpus

        sem: dict = {}
        for label, factor in (("1x", 1), (f"{args.factor}x", args.factor)):
            docsF = spark.read.parquet(f"{tmp}/docs_{factor}") if os.path.isdir(
                f"{tmp}/docs_{factor}"
            ) else None
            if docsF is None:
                scaled_docs(factor).write.mode("overwrite").parquet(
                    f"{tmp}/docs_{factor}"
                )
                docsF = spark.read.parquet(f"{tmp}/docs_{factor}")
            embF = spark.read.parquet(f"{tmp}/emb_{factor}") if os.path.isdir(
                f"{tmp}/emb_{factor}"
            ) else None
            if embF is None:
                scaled_emb(factor).write.mode("overwrite").parquet(
                    f"{tmp}/emb_{factor}"
                )
                embF = spark.read.parquet(f"{tmp}/emb_{factor}")
            # seeds must exist in the gate's pool (embeddings of docs that
            # SURVIVE the n-gram gate) — derive them from one untimed
            # upstream run, evenly spaced, k = BASE_K * factor
            survivors = sorted(
                r["vec_id"]
                for r in embF.join(
                    build_corpus(docsF)["clean"].select(
                        F.col("doc_id").alias("vec_id")
                    ),
                    "vec_id",
                    "left_semi",
                )
                .select("vec_id")
                .collect()
            )
            spark.catalog.clearCache()
            k_req = min(BASE_K * factor, len(survivors))
            stride = max(1, len(survivors) // k_req)
            seed_ids = survivors[::stride][:k_req]
            sem[label] = {}
            for mode in ("flat", "hier"):
                best, n_sem = float("inf"), None
                for _ in range(2):  # min-of-2: each rep is a full pipeline
                    spark.catalog.clearCache()
                    t0 = time.perf_counter()
                    stages = build_corpus(
                        docsF,
                        embeddings=embF,
                        semantic_assign=mode,
                        semantic_init_ids=seed_ids,
                        semantic_threshold=SEM_THRESHOLD,
                    )
                    n_sem = stages["semclean"].count()
                    best = min(best, time.perf_counter() - t0)
                sem[label][mode] = {
                    "k": len(seed_ids),
                    "call_to_semclean_sec": round(best, 3),
                    "n_semclean": n_sem,
                }
                print("semclean_api", label, mode, sem[label][mode],
                      flush=True)
                spark.catalog.clearCache()
            sem[label]["hier_minus_flat_sec"] = round(
                sem[label]["hier"]["call_to_semclean_sec"]
                - sem[label]["flat"]["call_to_semclean_sec"],
                3,
            )
        for mode in ("flat", "hier"):
            if mode in sem.get("1x", {}) and mode in sem.get(
                f"{args.factor}x", {}
            ):
                t1 = sem["1x"][mode]["call_to_semclean_sec"]
                tN = sem[f"{args.factor}x"][mode]["call_to_semclean_sec"]
                sem[f"ratio_{mode}"] = round(tN / t1, 2) if t1 else None
        results["semclean_api"] = sem

    out_path = args.out or "bench_ab_r12/scale_probe_r12.json"
    with open(os.path.join(repo, out_path), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
