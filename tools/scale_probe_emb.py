#!/usr/bin/env python
"""Embeddings-axis scaling probe: the vector-stack companion to
tools/scale_probe.py (which scales the documents table only).

Measures wall time at 1x vs Nx embedding corpus for the serve/assign
paths whose 100 TB posture was previously argued by plan gate alone:

  * ``pq_probe``        — pq_index_probe on a PREBUILT IVF-PQ index
                          (serve-only; the build is timed separately as
                          ``pq_build`` for context but is the offline
                          path by contract);
  * ``pq_probe_refine`` — the same probe with the IndexRefine stage
                          (refine_k=10): the bounded shortlist join
                          against the SQ refine tier must keep the
                          serve cost near-flat too;
  * ``ann_serve``       — ivf_index_probe on a prebuilt scalar-quantized
                          index (the ann_index_serve path);
  * ``semantic_dedup``  — kmeans assignment + cluster-equi-join SemDeDup;
  * ``semantic_dedup_soft`` — the top-2-margin soft-assignment variant;
  * ``stream_assign``   — per-batch assign_against_codebook of a 1/8
                          slice against the fixed codebook (the
                          stream_ann_ingest per-batch kernel).

Scaling regime: copy k of the corpus rotates every vector by k
positions (norm-preserving, deterministic, no artificial cross-copy
near-dup explosion) under vec_id + k*10_000_000. The coarse codebook
scales WITH the corpus (k_clusters = base_k * factor, broadcast
codebook transport) — the production posture that keeps per-cluster
candidate counts constant; a fixed-k probe at 20x data would measure
the known quadratic within-cluster blowup SemDeDup's own paper scales
k against, not the implementation.

Usage: python tools/scale_probe_emb.py [--factor 20]
       [--sf-dir /root/testdata/sf0.1]
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
NPROBE = 2
N_QUERIES = 25
DEDUP_THRESHOLD = 0.4
SOFT_MARGIN = 0.01


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=20)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated probe names to run (default: all);"
        " index builds are skipped unless a pq/ann/stream probe needs them",
    )
    args = ap.parse_args()
    only = (
        {x.strip() for x in args.only.split(",") if x.strip()}
        if args.only
        else None
    )

    from pyspark.sql import functions as F

    from credit_abs_oltp_to_mart_spark.operators import ann, dedup
    from credit_abs_oltp_to_mart_spark.operators.kmeans import (
        kmeans_assign,
        kmeans_assign_soft,
    )
    from credit_abs_oltp_to_mart_spark.session import get_spark

    spark = get_spark(app_name="scale_probe_emb")
    base = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n_base = base.count()
    dim = len(base.first()["embedding"])

    def scaled(factor: int):
        copies = []
        for k in range(factor):
            rot = k % dim
            rotated = F.expr(
                f"concat(slice(embedding, {rot + 1}, {dim - rot}),"
                f" slice(embedding, 1, {rot}))"
            )
            copies.append(
                base.select(
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

    tmp = tempfile.mkdtemp(prefix="scale_probe_emb_")
    scaled(1).write.mode("overwrite").parquet(f"{tmp}/emb1.parquet")
    scaled(args.factor).write.mode("overwrite").parquet(
        f"{tmp}/embN.parquet"
    )
    e1 = spark.read.parquet(f"{tmp}/emb1.parquet")
    eN = spark.read.parquet(f"{tmp}/embN.parquet")

    def init_ids(factor: int) -> list[int]:
        # base_k * factor seeds spread across copies: one block of 8
        # evenly-spaced base ids per copy, shifted into that copy's
        # id range — every id exists by construction
        step = max(1, n_base // BASE_K)
        return [
            k * 10_000_000 + i * step
            for k in range(factor)
            for i in range(BASE_K)
        ]

    results: dict[str, dict] = {}

    def probe(name: str, fn) -> None:
        if only is not None and name not in only:
            return
        times = {}
        for label, (d, factor) in (
            ("t1", (e1, 1)),
            ("tN", (eN, args.factor)),
        ):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn(d, factor)
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

    # --- prebuilt indexes (build timed once per corpus, serve probed) ---
    needs_idx = only is None or bool(
        {"pq_probe", "pq_probe_refine", "ann_serve", "stream_assign"} & only
    )
    idx = {}
    for tag, (d, factor) in (
        (("1", (e1, 1)), ("N", (eN, args.factor))) if needs_idx else ()
    ):
        t0 = time.perf_counter()
        pq_dir = f"{tmp}/pq_{tag}"
        ann.build_pq_index(
            d,
            pq_dir,
            coarse_init_ids=init_ids(factor),
            pq_init_ids=init_ids(1),
            m=4,
            coarse_iterations=2,
            pq_iterations=2,
            dim=dim,
            codebook_as_literals=False,
            with_refine=True,
        )
        pq_t = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        ivf_dir = f"{tmp}/ivf_{tag}"
        ann.build_ivf_index(
            d,
            ivf_dir,
            init_ids=init_ids(factor),
            iterations=2,
            codebook_as_literals=False,
        )
        ivf_t = round(time.perf_counter() - t0, 3)
        idx[tag] = (pq_dir, ivf_dir)
        results[f"pq_build_t{tag}"] = {"sec": pq_t}
        results[f"ivf_build_t{tag}"] = {"sec": ivf_t}
        print(f"build[{tag}]", pq_t, ivf_t, flush=True)

    queries1 = e1.where(F.col("vec_id") < N_QUERIES)

    probe(
        "pq_probe",
        lambda d, f: ann.pq_index_probe(
            queries1,
            idx["1" if f == 1 else "N"][0],
            k=5,
            nprobe=NPROBE,
            codebook_as_literals=False,
        ),
    )
    probe(
        "pq_probe_refine",
        lambda d, f: ann.pq_index_probe(
            queries1,
            idx["1" if f == 1 else "N"][0],
            k=5,
            nprobe=NPROBE,
            codebook_as_literals=False,
            refine_k=10,
        ),
    )
    probe(
        "ann_serve",
        lambda d, f: ann.ivf_index_probe(
            queries1,
            idx["1" if f == 1 else "N"][1],
            k=5,
            nprobe=NPROBE,
            codebook_as_literals=False,
        ),
    )
    probe(
        "semantic_dedup",
        lambda d, f: dedup.semantic_dedup(
            d,
            kmeans_assign(
                d,
                init_ids=init_ids(f),
                iterations=2,
                codebook_as_literals=False,
            ),
            threshold=DEDUP_THRESHOLD,
        ),
    )

    def soft(d, f):
        s = kmeans_assign_soft(
            d,
            init_ids=init_ids(f),
            iterations=2,
            margin=SOFT_MARGIN,
            codebook_as_literals=False,
        )
        primary = s.where(F.col("is_primary") == 1).select(
            "vec_id", "cluster"
        )
        return dedup.semantic_dedup(
            d,
            primary,
            threshold=DEDUP_THRESHOLD,
            candidates=s.select("vec_id", "cluster"),
        )

    probe("semantic_dedup_soft", soft)

    # --- semantic decontamination (r11): the cross-set SemDeDup shape.
    # Train = the full scaled corpus, eval = a FIXED-SIZE suite (the
    # production regime: benchmarks don't grow with the corpus). Both
    # sets assign against the same corpus-scaled codebook, so the probe
    # measures the train side's cluster-restricted cross-GEMM growth.
    def sem_decontam(d, f):
        from credit_abs_oltp_to_mart_spark.operators.curation import (
            semantic_decontaminate,
        )
        from credit_abs_oltp_to_mart_spark.operators.kmeans import (
            kmeans_assign as _ka,
        )

        ev = e1.where(F.col("vec_id") % 10 == 3).select(
            (F.col("vec_id") + F.lit(900_000_000)).alias("vec_id"),
            "embedding",
        )
        pool = d.unionByName(ev)
        assign = _ka(
            pool,
            init_ids=init_ids(f),
            iterations=2,
            codebook_as_literals=False,
        )
        return semantic_decontaminate(
            d, ev, assign, threshold=DEDUP_THRESHOLD
        )

    probe("semantic_decontam", sem_decontam)

    # --- hierarchical SemDeDup: the production path once k scales with
    # the corpus. coarse_k ~ sqrt(k_total) cells, sub_k subs per cell —
    # assignment cost O(N * sqrt(k) * dim) instead of O(N * k * dim).
    import math as _math

    from credit_abs_oltp_to_mart_spark.operators.kmeans import (
        kmeans_assign_hier,
        kmeans_assign_hier_soft,
    )

    def hier_params(factor: int):
        k_total = BASE_K * factor
        coarse_k = max(2, _math.isqrt(k_total - 1) + 1)
        ids = init_ids(factor)
        step = max(1, len(ids) // coarse_k)
        coarse_ids = ids[::step][:coarse_k]
        sub_k = -(-k_total // len(coarse_ids))
        return coarse_ids, sub_k

    def hier(d, f):
        coarse_ids, sub_k = hier_params(f)
        return dedup.semantic_dedup(
            d,
            kmeans_assign_hier(
                d,
                coarse_init_ids=coarse_ids,
                sub_k=sub_k,
                coarse_iterations=2,
                sub_iterations=2,
                nprobe=1,
            ),
            threshold=DEDUP_THRESHOLD,
        )

    probe("semantic_dedup_hier", hier)

    def hier_soft(d, f):
        coarse_ids, sub_k = hier_params(f)
        s = kmeans_assign_hier_soft(
            d,
            coarse_init_ids=coarse_ids,
            sub_k=sub_k,
            margin=SOFT_MARGIN,
            coarse_iterations=2,
            sub_iterations=2,
            nprobe=2,
        )
        primary = s.where(F.col("is_primary") == 1).select(
            "vec_id", "cluster"
        )
        return dedup.semantic_dedup(
            d,
            primary,
            threshold=DEDUP_THRESHOLD,
            candidates=s.select("vec_id", "cluster"),
        )

    probe("semantic_dedup_hier_soft", hier_soft)

    # semantic decontamination under the HIER assignment — the actual
    # production composition once k scales with the corpus (the flat
    # `semantic_decontam` probe's ratio is dominated by the O(N*k*dim)
    # flat assignment, the known blowup the hier path exists to kill;
    # the cross-GEMM itself is cluster-bounded either way)
    def sem_decontam_hier(d, f):
        from credit_abs_oltp_to_mart_spark.operators.curation import (
            semantic_decontaminate,
        )

        coarse_ids, sub_k = hier_params(f)
        ev = e1.where(F.col("vec_id") % 10 == 3).select(
            (F.col("vec_id") + F.lit(900_000_000)).alias("vec_id"),
            "embedding",
        )
        pool = d.unionByName(ev)
        assign = kmeans_assign_hier(
            pool,
            coarse_init_ids=coarse_ids,
            sub_k=sub_k,
            coarse_iterations=2,
            sub_iterations=2,
            nprobe=1,
        )
        return semantic_decontaminate(
            d, ev, assign, threshold=DEDUP_THRESHOLD
        )

    probe("semantic_decontam_hier", sem_decontam_hier)

    def stream_assign(d, f):
        cents = ann.load_index_codebook(
            spark, idx["1" if f == 1 else "N"][1]
        )
        return ann.assign_against_codebook(
            d.where(F.col("vec_id") % 8 == 3),
            cents,
            codebook_as_literals=False,
        )

    probe("stream_assign", stream_assign)

    out = {
        "n_vecs_1x": n_base,
        "dim": dim,
        "factor": args.factor,
        "base_k": BASE_K,
        "k_scales_with_corpus": True,
        "probes": results,
    }
    print(json.dumps(out))
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
