#!/usr/bin/env python
"""Round-13 probe: build_corpus(semantic_assign=) with BOTH axes scaled.

Closes the pool-axis caveat the r12 probe pinned in its own artifact
(``bench_ab_r12/scale_probe_r12.json``): there the 20x run scaled k
fully (8 -> 160) but the surviving-embedding pool only ~1.1x, because
the word-ROTATION doc scaling preserves every internal n-gram shingle
and the n-gram dedup gate collapsed the copies before the semantic
stage. This probe scales the documents with the per-copy word-SUFFIX
construction instead (every word carries the copy index — the
trigger-A/B corpus recipe): shingle sets are fully disjoint across
copies, so the whole document axis survives to the semantic gate and
the embedding pool scales with the corpus. Embeddings use the
norm-preserving element rotation (rotated copies are ~orthogonal to
their originals, so semantic dedup does not collapse them either).

Expectation (the r11 operator-level split reproduced through the API):
flat assignment scales ~O(N*k) — superlinear wall at 20x/k=160 — while
hier assignment scales ~O(N*sqrt(k)) and stays near-flat; the recorded
pool sizes prove the axis actually scaled this time.

Usage: python tools/scale_probe_r13.py [--factor 20]
       [--sf-dir /root/testdata/sf0.1]
       [--out bench_ab_r13/semclean_both_axes.json]
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
SEM_THRESHOLD = 0.4


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=20)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="bench_ab_r13/semclean_both_axes.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from credit_abs_oltp_to_mart_spark.plans.corpus import build_corpus
    from credit_abs_oltp_to_mart_spark.session import get_spark

    spark = get_spark(app_name="scale_probe_r13")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    docs_base = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    emb_base = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n_docs = docs_base.count()
    n_vecs = emb_base.count()
    dim = len(emb_base.first()["embedding"])

    from credit_abs_oltp_to_mart_spark.functions.text import STOPWORDS

    all_sw = sorted(set().union(*STOPWORDS.values()))
    sw_list = ", ".join(f"'{w}'" for w in all_sw)

    def scaled_docs(factor: int):
        # per-copy word suffix on NON-stopwords only: copy k's content
        # vocabulary is disjoint from every other copy's, so any shingle
        # containing a content word differs across copies and the n-gram
        # dedup gate keeps all of them (the axis the r12 probe lost to
        # rotation-preserved shingles) — while the untouched stopwords
        # keep the language-ID gate's stopword ratios exactly, and the
        # 2-letter alpha tags keep mean token length inside the quality
        # score's sanity band (a bare '{k}x' digit suffix re-labels every
        # stopword and the filter gate drops the whole corpus)
        copies = []
        for k in range(factor):
            tag = chr(97 + k // 26) + chr(97 + k % 26)
            copies.append(
                docs_base.select(
                    (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
                    F.array_join(
                        F.expr(
                            "transform(split(text, ' +'), w -> case"
                            f" when w in ({sw_list}) then w"
                            f" else concat(w, '{tag}') end)"
                        ),
                        " ",
                    ).alias("text"),
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

    tmp = tempfile.mkdtemp(prefix="scale_probe_r13_")
    results: dict = {
        "task": (
            "r13: build_corpus(semantic_assign=) with BOTH axes scaled —"
            " suffix-token doc copies (disjoint shingles) + rotated"
            " embeddings, corpus-scaled k, flat vs hier"
        ),
        "n_docs_1x": n_docs,
        "n_vecs_1x": n_vecs,
        "dim": dim,
        "factor": args.factor,
        "base_k": BASE_K,
    }

    sem: dict = {}
    for label, factor in (("1x", 1), (f"{args.factor}x", args.factor)):
        scaled_docs(factor).write.mode("overwrite").parquet(
            f"{tmp}/docs_{factor}"
        )
        docsF = spark.read.parquet(f"{tmp}/docs_{factor}")
        scaled_emb(factor).write.mode("overwrite").parquet(
            f"{tmp}/emb_{factor}"
        )
        embF = spark.read.parquet(f"{tmp}/emb_{factor}")
        # seeds must exist in the gate's pool (embeddings of docs that
        # survive the document-axis gates) — derived from one untimed
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
        sem[label] = {"surviving_pool": len(survivors)}
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
            print("semclean_both_axes", label, mode, sem[label][mode],
                  flush=True)
            spark.catalog.clearCache()
        sem[label]["hier_minus_flat_sec"] = round(
            sem[label]["hier"]["call_to_semclean_sec"]
            - sem[label]["flat"]["call_to_semclean_sec"],
            3,
        )
    pool_ratio = (
        sem[f"{args.factor}x"]["surviving_pool"] / sem["1x"]["surviving_pool"]
        if sem["1x"]["surviving_pool"]
        else None
    )
    sem["pool_scale_ratio"] = round(pool_ratio, 2) if pool_ratio else None
    for mode in ("flat", "hier"):
        t1 = sem["1x"][mode]["call_to_semclean_sec"]
        tN = sem[f"{args.factor}x"][mode]["call_to_semclean_sec"]
        sem[f"ratio_{mode}"] = round(tN / t1, 2) if t1 else None
    results["semclean_api"] = sem

    os.makedirs(
        os.path.dirname(os.path.join(repo, args.out)) or ".", exist_ok=True
    )
    with open(os.path.join(repo, args.out), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
