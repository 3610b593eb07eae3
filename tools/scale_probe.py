#!/usr/bin/env python
"""Empirical scaling probe: measure operator wall time at 1x vs Nx corpus.

Answers "would this hold at 1000x?" with measurement instead of argument:
the sf0.1 documents table (5k docs) is scaled by ``--factor`` (default 20,
-> 100k docs) by hash-retokenizing each copy — every token t in copy k
becomes md5(t || k)[:8], so copies are fully DISTINCT documents (no
cross-copy near-dups to explode LSH buckets) while preserving each doc's
length and within-doc token-repetition structure. Each probed operator
then reports the time ratio vs the 1x corpus next to the data ratio: a
scalable (shuffle-bounded, never O(n^2)) operator shows time-ratio ~<=
data-ratio on fixed local[32] parallelism.

Results are printed as a small JSON document (also the source for the
"Measured scaling" table in PERFORMANCE.md).

Usage: python tools/scale_probe.py [--factor 20] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=20)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--stream",
        action="store_true",
        help="also probe stream_dedup_ingest: one big slice vs --slices"
        " small ones over the same scaled corpus",
    )
    ap.add_argument("--slices", type=int, default=8)
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated probe names to run (default: all)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from credit_abs_oltp_to_mart_spark.operators import (
        bpe,
        classifier,
        curation,
        dedup,
        multimodal,
        textops,
    )
    from credit_abs_oltp_to_mart_spark.session import get_spark

    spark = get_spark(app_name="scale_probe")
    base = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_base = base.count()

    def scaled(factor: int):
        copies = []
        for k in range(factor):
            retok = F.array_join(
                F.transform(
                    F.split(F.trim(F.col("text")), " +"),
                    lambda t: F.substring(
                        F.md5(F.concat(t, F.lit(f"#{k}"))), 1, 8
                    ),
                ),
                " ",
            )
            copies.append(
                base.select(
                    (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
                    retok.alias("text"),
                )
            )
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        return out

    def mat(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # materialize both corpora to parquet so probed ops read identical
    # physical layouts (not a 20-way union plan)
    import tempfile

    tmp = tempfile.mkdtemp(prefix="scale_probe_")
    one = scaled(1)
    big = scaled(args.factor)
    one.write.mode("overwrite").parquet(f"{tmp}/docs1.parquet")
    big.write.mode("overwrite").parquet(f"{tmp}/docsN.parquet")
    d1 = spark.read.parquet(f"{tmp}/docs1.parquet")
    dN = spark.read.parquet(f"{tmp}/docsN.parquet")

    probes = {
        "textops_maponly": lambda d: textops.text_quality(d),
        "exact_dedup": lambda d: dedup.exact_dedup(d),
        "simhash_fingerprints_64": lambda d: dedup.simhash_fingerprints(
            d, n_bits=64
        ),
        "simhash_pairs_64": lambda d: dedup.simhash_pairs(
            d, max_hamming=3, n_bands=4, n_bits=64
        ),
        "minhash_lsh_pairs": lambda d: dedup.minhash_lsh_pairs(d),
        "dedup_incremental": lambda d: dedup.incremental_minhash_pairs(
            d.where(F.col("doc_id") % 20 == 0),
            dedup.minhash_signatures(d.where(F.col("doc_id") % 20 != 0)),
        ),
        # corpus-sized slice (half the corpus): the regime the
        # broadcast_batch=False sort-merge fallback exists for — compare
        # the two modes' cost growth at the same slice size
        "dedup_incremental_big_slice_broadcast": lambda d: (
            dedup.incremental_minhash_pairs(
                d.where(F.col("doc_id") % 2 == 0),
                dedup.minhash_signatures(d.where(F.col("doc_id") % 2 != 0)),
                broadcast_batch=True,
            )
        ),
        "dedup_incremental_big_slice_merge": lambda d: (
            dedup.incremental_minhash_pairs(
                d.where(F.col("doc_id") % 2 == 0),
                dedup.minhash_signatures(d.where(F.col("doc_id") % 2 != 0)),
                broadcast_batch=False,
            )
        ),
        # round-5 operators: substring-level dedup (both policies — the
        # keep-first argmin must not change the growth curve), the
        # bigram-LM scorer (two unbroadcast count joins), and BPE
        # training (drives its own actions: word-table rounds, corpus
        # scanned once — returns None, nothing left to materialize)
        "dup_spans": lambda d: textops.duplicate_spans(d),
        "dup_spans_keep_first": lambda d: textops.duplicate_spans(
            d, keep_first=True
        ),
        "bigram_fluency": lambda d: textops.bigram_fluency(d),
        "bpe_train_4rounds": lambda d: (bpe.bpe_train(d, n_merges=4), None)[1],
        # round-6 operators: perceptual-hash image dedup (map-only hash +
        # band join), the trained quality gate (fixed gradient rounds over
        # ONE feature aggregation per round + map-only scoring), the
        # mixture materialization (domain-cardinality broadcast + map-only
        # replication), and BPE tokenization under a trained vocabulary
        # (broadcast word lookup + per-doc stitch)
        "image_near_dups": lambda d: multimodal.image_near_dups(
            multimodal.synthesize_blobs(d)
        ),
        "quality_classifier": lambda d: classifier.quality_classifier(d),
        # the scaled corpus carries no lang column — synthesize 5 domains
        "mixture_apply": lambda d: (
            lambda dl: curation.mixture_apply(dl, curation.mixture_weights(dl))
        )(
            d.withColumn(
                "lang",
                F.concat(
                    F.lit("l"), F.pmod(F.col("doc_id"), F.lit(5)).cast("string")
                ),
            )
        ),
        "bpe_tokenize": lambda d: bpe.bpe_tokenize(
            d, bpe.bpe_train(d, n_merges=4)[1]
        ),
        # round-7 operators: video near-dups (map-only frame explode +
        # per-frame hash + band join), the epoch-shuffle manifest
        # (bucket-partitioned rank over the pack manifest), and the
        # unigram-LM trainer (2 EM rounds: word-table Viterbi fold +
        # O(V) driver collect per round). The embeddings-based round-7
        # ops (ann_pq, semantic_dedup soft/hardened) are not probed here
        # — the probe corpus scales documents only; their scale shape is
        # plan-gated instead (DPP-pruned postings, cluster equi-join).
        "video_near_dups": lambda d: multimodal.video_near_dups(
            multimodal.synthesize_blobs(d)
        ),
        "epoch_shuffle": lambda d: curation.epoch_shuffle(
            curation.pack_manifest(curation.pack_chunks(d)), seed=0
        ),
        "unigram_train": lambda d: (
            __import__(
                "credit_abs_oltp_to_mart_spark.operators.unigram",
                fromlist=["unigram_train"],
            ).unigram_train(d, rounds=2)[0]
        ),
        # round-8 operators: BM25 retrieval (postings restricted to the
        # broadcast query-term list before df counting/scoring — the
        # probe re-derives query terms from the scaled corpus since
        # retokenized copies share no vocabulary with the original) and
        # audio near-dups (map-only window fingerprints + band join).
        # The embeddings-based round-8 ops (ann_pq_refine,
        # stream_pq_ingest) are probed by tools/scale_probe_emb.py.
        "bm25_topk": lambda d: (
            lambda R: R.bm25_topk(
                d,
                d.select(
                    F.col("doc_id").alias("query_id"),
                    F.substring("text", 1, 40).alias("query"),
                ).where(
                    (F.col("query_id") < 10_000_000)
                    & (F.col("query_id") % 997 == 0)
                ),
                k=10,
            )
        )(
            __import__(
                "credit_abs_oltp_to_mart_spark.operators.retrieval",
                fromlist=["bm25_topk"],
            )
        ),
        "audio_near_dups": lambda d: multimodal.audio_near_dups(
            multimodal.synthesize_blobs(d)
        ),
        # round-9 operators: DSIR selection (two 256-row codebook
        # aggregations + broadcast-map scoring + ONE per-doc shuffle +
        # TakeOrdered — the scaled corpus carries no lang column, so
        # synthesize 5 domains and target one of them) and BFS shortest
        # paths (per-hop frontier⋈edges equi-join; probed on a 2-out
        # affine graph sized to the corpus' doc count, so the vertex
        # axis scales with --factor like everything else here)
        "dsir_select": lambda d: (
            lambda dl: __import__(
                "credit_abs_oltp_to_mart_spark.operators.dsir",
                fromlist=["dsir_select"],
            ).dsir_select(dl, F.col("lang") == "l0", 150)
        )(
            d.withColumn(
                "lang",
                F.concat(
                    F.lit("l"), F.pmod(F.col("doc_id"), F.lit(5)).cast("string")
                ),
            )
        ),
        # long-diameter BFS: a ~96-row lattice (row width n/96, edges
        # v -> v+W and v -> v+W+1, plus a source fan-out across row 0)
        # — diameter ~96 hops with frontier mass proportional to n, the
        # read-amplification regime the visited-set compaction
        # (graph_paths.COMPACT_VISITED_EVERY) exists for; the 2-out
        # affine "graph_bfs" probe saturates in ~12 hops and never
        # stresses it
        "graph_bfs_long": lambda d: (
            lambda n: (
                lambda w: __import__(
                    "credit_abs_oltp_to_mart_spark.operators.graph_paths",
                    fromlist=["bfs_distances"],
                ).bfs_distances(
                    spark.range(1, w)
                    .select(
                        F.lit(0).cast("long").alias("src"),
                        F.col("id").alias("dst"),
                    )
                    .unionByName(
                        spark.range(n).select(
                            F.col("id").alias("src"),
                            (F.col("id") + w).alias("dst"),
                        )
                    )
                    .unionByName(
                        spark.range(n).select(
                            F.col("id").alias("src"),
                            (F.col("id") + w + 1).alias("dst"),
                        )
                    )
                    .where(F.col("dst") < n),
                    spark.range(n).select("id"),
                    [0],
                    max_hops=n // w + 2,
                )
            )(max(2, n // 96))
        )(d.count()),
        "graph_bfs": lambda d: (
            lambda n: __import__(
                "credit_abs_oltp_to_mart_spark.operators.graph_paths",
                fromlist=["bfs_distances"],
            ).bfs_distances(
                spark.range(n)
                .select(
                    F.col("id").alias("src"),
                    ((F.col("id") * 7 + 3) % n).alias("dst"),
                )
                .unionByName(
                    spark.range(n).select(
                        F.col("id").alias("src"),
                        ((F.col("id") * 13 + 5) % n).alias("dst"),
                    )
                ),
                spark.range(n).select("id"),
                [0],
                max_hops=12,
            )
        )(d.count()),
    }
    if args.only:
        keep = {s.strip() for s in args.only.split(",") if s.strip()}
        unknown = keep - set(probes)
        if unknown:
            print(f"unknown probes: {sorted(unknown)}", file=sys.stderr)
            return 1
        probes = {k: v for k, v in probes.items() if k in keep}
    results: dict[str, dict] = {}
    for name, build in probes.items():
        times = {}
        for label, d in (("t1", d1), ("tN", dN)):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = build(d)
                if out is not None:
                    mat(out)
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            times[label] = round(best, 3)
        results[name] = {
            **times,
            "time_ratio": round(times["tN"] / times["t1"], 2),
        }
        print(name, results[name], flush=True)

    if args.stream:
        # continuous-ingest overhead: the SAME corpus arrives as one big
        # slice vs many small ones. Measures the fixed micro-batch +
        # store-round-trip cost per slice against the one-off big-batch
        # cost (and the merge fallback on the corpus-sized single slice,
        # where broadcasting the whole batch is the anti-pattern).
        from credit_abs_oltp_to_mart_spark.streaming.ops import (
            stream_dedup_ingest,
        )

        def run_ingest(n_slices: int, tag: str, broadcast_batch: bool):
            sdir = f"{tmp}/slices_{tag}"
            now = time.time()
            for k in range(n_slices):
                part = dN.where(F.pmod(F.col("doc_id"), n_slices) == k)
                path = f"{sdir}/b{k:03d}"
                # ONE file per slice: the ingest's maxFilesPerTrigger=1
                # makes every file its own micro-batch, so micro-batch
                # count must equal slice count or the per-slice-overhead
                # number measures nothing
                part.coalesce(1).write.parquet(path)
                for f in os.listdir(path):
                    if f.endswith(".parquet"):
                        t = now - 600 + 10 * k
                        os.utime(os.path.join(path, f), (t, t))
            t0 = time.perf_counter()
            stream_dedup_ingest(
                spark,
                f"{sdir}/b*",
                f"{tmp}/ingest_out_{tag}",
                schema=dN.schema,
                broadcast_batch=broadcast_batch,
            ).count()
            return round(time.perf_counter() - t0, 3)

        t_one = run_ingest(1, "one", True)
        t_one_merge = run_ingest(1, "one_merge", False)
        t_many = run_ingest(args.slices, f"many{args.slices}", True)
        results["stream_ingest"] = {
            "t_1slice_broadcast": t_one,
            "t_1slice_merge": t_one_merge,
            "t_nslices": t_many,
            "n_slices": args.slices,
            "per_slice_overhead": round(
                (t_many - t_one) / max(1, args.slices - 1), 3
            ),
        }
        print("stream_ingest", results["stream_ingest"], flush=True)

    out = {
        "n_docs_1x": n_base,
        "factor": args.factor,
        "probes": results,
    }
    print(json.dumps(out))
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
