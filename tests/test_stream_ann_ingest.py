"""Streaming IVF-index maintenance: assignment parity with the persisted
codebook, planted-neighbor retrieval through the union probe, crash-replay
idempotency of the batch-scoped postings, and compaction transparency.
Values on the real tables are oracle-gated in test_entry_contract."""

from __future__ import annotations

import os
import time as _time

import pytest

from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.operators import ann
from credit_abs_oltp_to_mart_spark.streaming import stream_ann_ingest

DIM = 4


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )


def _land(df, path, k, t0):
    df.coalesce(1).write.parquet(str(path))
    for f in os.listdir(path):
        if f.endswith(".parquet"):
            t = t0 + 10 * k
            os.utime(os.path.join(path, f), (t, t))


BASE = [
    (0, [1.0, 0.0, 0.0, 0.0]),   # init centroid A
    (1, [0.0, 1.0, 0.0, 0.0]),   # init centroid B
    (2, [0.9, 0.1, 0.0, 0.0]),
    (3, [0.1, 0.9, 0.0, 0.0]),
    (4, [0.8, 0.0, 0.1, 0.0]),
]
# stream batch 1: exact copies of base vectors (id-shifted) -> must land
# in the SAME cluster the build assigned the originals to; batch 2: a
# near-copy of query 0 that the union probe must retrieve
S1 = [(100, [0.9, 0.1, 0.0, 0.0]), (101, [0.1, 0.9, 0.0, 0.0])]
S2 = [(200, [0.99, 0.01, 0.0, 0.0])]


def _build_and_stream(spark, tmp_path):
    idx = str(tmp_path / "index")
    ann.build_ivf_index(
        _emb(spark, BASE), idx, init_ids=[0, 1], iterations=2
    )
    src = tmp_path / "slices"
    t0 = _time.time() - 120
    _land(_emb(spark, S1), src / "b0", 0, t0)
    _land(_emb(spark, S2), src / "b1", 1, t0)
    got = stream_ann_ingest(
        spark,
        f"{src}/b*",
        idx,
        schema="vec_id long, embedding array<double>",
    )
    return idx, src, got


def test_assignment_parity_and_batch_labels(spark, tmp_path):
    idx, _, got = _build_and_stream(spark, tmp_path)
    rows = {r["vec_id"]: (r["cluster"], r["ingest_batch"]) for r in got.collect()}
    assert set(rows) == {100, 101, 200}
    assert rows[100][1] == 0 and rows[101][1] == 0 and rows[200][1] == 1
    base_assign = {
        r["vec_id"]: r["cluster"]
        for r in spark.read.parquet(f"{idx}/postings").collect()
    }
    # an exact copy of a base vector lands in the SAME cluster the index
    # build assigned the original to (bit-parity of the scoring kernel)
    assert rows[100][0] == base_assign[2]
    assert rows[101][0] == base_assign[3]
    # quantized codes of an exact copy equal the original's stored codes
    inc = {
        r["vec_id"]: list(r["codes"])
        for r in spark.read.parquet(f"{idx}/postings_inc").collect()
    }
    base_codes = {
        r["vec_id"]: list(r["codes"])
        for r in spark.read.parquet(f"{idx}/postings").collect()
    }
    assert inc[100] == base_codes[2] and inc[101] == base_codes[3]


@pytest.mark.slow
def test_union_probe_retrieves_streamed_neighbor(spark, tmp_path):
    idx, _, _ = _build_and_stream(spark, tmp_path)
    queries = _emb(spark, [(0, [1.0, 0.0, 0.0, 0.0])])
    with_inc = ann.ivf_index_probe(
        queries, idx, k=3, nprobe=1, include_incremental=True
    )
    neigh = {r["neighbor_id"] for r in with_inc.collect()}
    assert 200 in neigh  # the streamed near-copy of the query
    base_only = ann.ivf_index_probe(queries, idx, k=3, nprobe=1)
    assert 200 not in {r["neighbor_id"] for r in base_only.collect()}


def test_replay_is_idempotent(spark, tmp_path):
    idx, src, got = _build_and_stream(spark, tmp_path)
    first = {tuple(r) for r in got.collect()}
    # crash window: postings written, commit 1 never was
    commits = os.path.join(idx, "ingest_checkpoint", "commits")
    os.remove(os.path.join(commits, "1"))
    crc = os.path.join(commits, ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    again = [
        tuple(r)
        for r in stream_ann_ingest(
            spark,
            f"{src}/b*",
            idx,
            schema="vec_id long, embedding array<double>",
        ).collect()
    ]
    assert set(again) == first
    assert len(again) == len(set(again))  # no duplicated postings


@pytest.mark.slow
def test_compaction_is_transparent_to_the_probe(spark, tmp_path):
    from credit_abs_oltp_to_mart_spark.sources.maintenance import (
        compact_keyed_store,
    )

    idx, _, _ = _build_and_stream(spark, tmp_path)
    queries = _emb(spark, [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])])
    before = {
        tuple(r)
        for r in ann.ivf_index_probe(
            queries, idx, k=3, nprobe=1, include_incremental=True
        ).collect()
    }
    stats = compact_keyed_store(
        spark, f"{idx}/postings_inc", upto=1, dedup_cols=["vec_id"]
    )
    assert stats["compacted"] and stats["partitions_merged"] == 2
    after = {
        tuple(r)
        for r in ann.ivf_index_probe(
            queries, idx, k=3, nprobe=1, include_incremental=True
        ).collect()
    }
    assert after == before


@pytest.mark.slow
def test_rebuild_clears_stale_incremental_postings(spark, tmp_path):
    """Retraining the index must clear the postings_inc overlay and the
    ingest checkpoint: incremental rows were assigned/quantized under the
    OLD codebook, so a union probe after a rebuild would mix cluster
    geometries — and a stale checkpoint would skip re-ingesting the
    already-seen slices under the new codebook."""
    import os

    idx, src, _ = _build_and_stream(spark, tmp_path)
    assert os.path.exists(f"{idx}/postings_inc")
    ann.build_ivf_index(
        _emb(spark, BASE), idx, init_ids=[0, 1], iterations=1
    )
    assert not os.path.exists(f"{idx}/postings_inc")
    assert not os.path.exists(f"{idx}/ingest_checkpoint")
    # and the same slices re-ingest cleanly under the new codebook
    got = stream_ann_ingest(
        spark,
        f"{src}/b*",
        idx,
        schema="vec_id long, embedding array<double>",
    )
    assert {r["vec_id"] for r in got.collect()} == {100, 101, 200}


def test_union_probe_dedups_re_ingested_vector(spark, tmp_path):
    """A vector present in BOTH the base postings and an incremental
    batch (re-delivered slice, or re-ingested after the base build) must
    occupy ONE candidate slot — LSM read-your-latest — not displace a
    legitimate top-k neighbor with its duplicate row."""
    idx = str(tmp_path / "index")
    ann.build_ivf_index(_emb(spark, BASE), idx, init_ids=[0, 1], iterations=2)
    # re-ingest base vector 2 verbatim as an incremental posting (same
    # codebook -> same cluster, same codes), plus one genuinely new vector
    dup_and_new = _emb(spark, [(2, [0.9, 0.1, 0.0, 0.0]),
                               (300, [0.85, 0.15, 0.0, 0.0])])
    cents = ann.load_index_codebook(spark, idx)
    assigned = ann.assign_against_codebook(dup_and_new, cents)
    q = ann.quantize_embeddings(dup_and_new)
    (
        q.select(
            "vec_id", "codes",
            F.col("scale_min").alias("mn"),
            (F.col("scale_max") - F.col("scale_min")).alias("sp"),
        )
        .join(assigned, "vec_id")
        .withColumn("ingest_batch", F.lit(7).cast("long"))
        .write.mode("overwrite")
        .parquet(f"{idx}/postings_inc/batch=7")
    )
    queries = _emb(spark, [(0, [1.0, 0.0, 0.0, 0.0])])
    got = ann.ivf_index_probe(
        queries, idx, k=4, nprobe=1, include_incremental=True
    ).collect()
    neighbors = [r["neighbor_id"] for r in got]
    assert len(neighbors) == len(set(neighbors)), neighbors
    assert 2 in neighbors and 300 in neighbors
    # ranks stay dense 1..n
    assert sorted(r["rank"] for r in got) == list(range(1, len(got) + 1))


@pytest.mark.slow
def test_pq_ingest_parity_with_build(spark, tmp_path):
    """A vector ingested online against the persisted codebooks must get
    EXACTLY the posting a full rebuild would give it (same cluster, same
    pq codes) — the offline-train / online-assign contract, in both
    by_residual modes."""
    for by_residual in (False, True):
        idx_base = str(tmp_path / f"base_{int(by_residual)}")
        ann.build_pq_index(
            _emb(spark, BASE), idx_base,
            coarse_init_ids=[0, 1], pq_init_ids=[0, 1, 2],
            m=2, coarse_iterations=2, pq_iterations=2, dim=DIM,
            by_residual=by_residual,
        )
        ann.pq_ingest_batch(_emb(spark, S1), idx_base, batch_id=0)
        ingested = {
            r["vec_id"]: (r["cluster"], list(r["pq_codes"]))
            for r in spark.read.parquet(
                f"{idx_base}/postings_inc"
            ).collect()
        }
        # re-derive expected codes by running the build-time encode path
        # on base+batch under the base codebooks
        from credit_abs_oltp_to_mart_spark.operators.kmeans import (
            FP_SCALE, _to_fp,
        )
        coarse = ann.load_index_codebook(spark, idx_base)
        books = ann.load_pq_codebooks(spark, idx_base)
        batch = _emb(spark, S1)
        assigned = ann.assign_against_codebook(batch, coarse)
        v = batch.select(
            "vec_id", _to_fp("embedding", FP_SCALE).alias("__fa")
        ).join(assigned, "vec_id")
        if by_residual:
            cents_frame = F.broadcast(
                spark.createDataFrame(
                    [(int(c), [int(x) for x in coarse[c]])
                     for c in sorted(coarse)],
                    "cluster bigint, __cent array<bigint>",
                )
            )
            v = v.join(cents_frame, "cluster").select(
                "vec_id", "cluster",
                F.expr("zip_with(__fa, __cent, (x, y) -> x - y)").alias(
                    "__fa"
                ),
            )
        expected = {
            r["vec_id"]: (r["cluster"], list(r["pq_codes"]))
            for r in v.select(
                "vec_id", "cluster",
                F.array(*ann.pq_code_columns(books, "__fa")).alias(
                    "pq_codes"
                ),
            ).collect()
        }
        assert ingested == expected, (by_residual, ingested, expected)


@pytest.mark.slow
def test_pq_union_probe_serves_ingested_and_dedups(spark, tmp_path):
    """The PQ union probe must retrieve a vector that arrived ONLY as an
    incremental posting, and a re-ingested base vector must occupy one
    candidate slot (LSM read-your-latest), in both by_residual modes."""
    for by_residual in (False, True):
        idx = str(tmp_path / f"pqu_{int(by_residual)}")
        ann.build_pq_index(
            _emb(spark, BASE), idx,
            coarse_init_ids=[0, 1], pq_init_ids=[0, 1, 2],
            m=2, coarse_iterations=2, pq_iterations=2, dim=DIM,
            by_residual=by_residual,
        )
        # batch: one new near-copy of base 0, plus base vector 2 verbatim
        ann.pq_ingest_batch(
            _emb(spark, [(200, [0.99, 0.01, 0.0, 0.0]),
                         (2, [0.9, 0.1, 0.0, 0.0])]),
            idx, batch_id=3,
        )
        queries = _emb(spark, [(0, [1.0, 0.0, 0.0, 0.0])])
        got = ann.pq_index_probe(
            queries, idx, k=4, nprobe=1, include_incremental=True
        ).collect()
        neighbors = [r["neighbor_id"] for r in got]
        assert 200 in neighbors, (by_residual, got)
        assert len(neighbors) == len(set(neighbors)), (by_residual, got)
        # base-only probe ignores the overlay
        base_only = ann.pq_index_probe(queries, idx, k=4, nprobe=1)
        assert 200 not in [
            r["neighbor_id"] for r in base_only.collect()
        ], by_residual


def test_pq_ingest_dim_mismatch_raises(spark, tmp_path):
    """A batch whose vectors are a different width than the index was
    built with must FAIL LOUDLY — zip_with/slice would otherwise encode
    truncated garbage codes silently. pq_meta persists dim for this."""
    import pytest
    from pyspark.errors import PySparkException

    idx = str(tmp_path / "dim_guard")
    ann.build_pq_index(
        _emb(spark, BASE), idx,
        coarse_init_ids=[0, 1], pq_init_ids=[0, 1, 2],
        m=2, coarse_iterations=2, pq_iterations=2, dim=DIM,
    )
    meta = spark.read.parquet(f"{idx}/pq_meta").collect()[0]
    assert int(meta["dim"]) == DIM
    bad = spark.createDataFrame(
        [(500, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(PySparkException, match="dim"):
        ann.pq_ingest_batch(bad, idx, batch_id=9)
    # the right width still ingests cleanly after the failed attempt
    ann.pq_ingest_batch(_emb(spark, S2), idx, batch_id=10)
    inc = spark.read.parquet(f"{idx}/postings_inc").collect()
    assert {r["vec_id"] for r in inc} == {200}


@pytest.mark.slow
def test_pq_refine_covers_ingested_vectors(spark, tmp_path):
    """An index built with_refine keeps its refine tier consistent under
    online ingest: pq_ingest_batch writes the batch's SQ payload to
    refine_inc, so a REFINED union probe retrieves and re-scores a
    vector that arrived only incrementally."""
    idx = str(tmp_path / "pq_refine_ing")
    ann.build_pq_index(
        _emb(spark, BASE), idx,
        coarse_init_ids=[0, 1], pq_init_ids=[0, 1, 2],
        m=2, coarse_iterations=2, pq_iterations=2, dim=DIM,
        with_refine=True,
    )
    ann.pq_ingest_batch(_emb(spark, S2), idx, batch_id=5)
    assert spark.read.parquet(f"{idx}/refine_inc").count() == len(S2)
    queries = _emb(spark, [(0, [1.0, 0.0, 0.0, 0.0])])
    got = ann.pq_index_probe(
        queries, idx, k=3, nprobe=1, include_incremental=True, refine_k=6
    ).collect()
    neighbors = [r["neighbor_id"] for r in got]
    assert 200 in neighbors, got
    assert sorted(r["rank"] for r in got) == list(range(1, len(got) + 1))
    # a rebuild clears BOTH overlays (stale geometry must not leak)
    ann.build_pq_index(
        _emb(spark, BASE), idx,
        coarse_init_ids=[0, 1], pq_init_ids=[0, 1, 2],
        m=2, coarse_iterations=2, pq_iterations=2, dim=DIM,
        with_refine=True,
    )
    import os
    assert not os.path.exists(f"{idx}/postings_inc")
    assert not os.path.exists(f"{idx}/refine_inc")


@pytest.mark.slow
def test_stream_pq_ingest_parity_and_replay(spark, tmp_path):
    """stream_pq_ingest must land exactly the postings pq_ingest_batch
    would write per batch (offline/online bit-parity through the shared
    encode path), serve them through the union probe, and stay
    idempotent when the stream restarts over the same checkpoint."""
    import time as _time

    from credit_abs_oltp_to_mart_spark.streaming import stream_pq_ingest

    idx = str(tmp_path / "pq_stream")
    ann.build_pq_index(
        _emb(spark, BASE), idx,
        coarse_init_ids=[0, 1], pq_init_ids=[0, 1, 2],
        m=2, coarse_iterations=2, pq_iterations=2, dim=DIM,
    )
    src = tmp_path / "slices"
    t0 = _time.time() - 120
    _land(_emb(spark, S1), src / "b0", 0, t0)
    _land(_emb(spark, S2), src / "b1", 1, t0)
    got = stream_pq_ingest(
        spark, f"{src}/b*", idx,
        schema="vec_id bigint, embedding array<double>",
    )
    rows = {r["vec_id"]: (r["cluster"], r["ingest_batch"])
            for r in got.collect()}
    assert set(rows) == {100, 101, 200}
    # batches arrive oldest-first, one file per trigger
    assert rows[100][1] == 0 and rows[200][1] == 1
    # parity: same codes a direct pq_ingest_batch produces for batch 0
    inc = spark.read.parquet(f"{idx}/postings_inc").collect()
    direct_idx = str(tmp_path / "pq_direct")
    ann.build_pq_index(
        _emb(spark, BASE), direct_idx,
        coarse_init_ids=[0, 1], pq_init_ids=[0, 1, 2],
        m=2, coarse_iterations=2, pq_iterations=2, dim=DIM,
    )
    ann.pq_ingest_batch(_emb(spark, S1), direct_idx, batch_id=0)
    direct = spark.read.parquet(f"{direct_idx}/postings_inc").collect()
    by_id = {r["vec_id"]: (r["cluster"], list(r["pq_codes"])) for r in inc
             if r["ingest_batch"] == 0}
    by_id_direct = {
        r["vec_id"]: (r["cluster"], list(r["pq_codes"])) for r in direct
    }
    assert by_id == by_id_direct
    # union probe serves the streamed near-copy of query 0
    queries = _emb(spark, [(0, [1.0, 0.0, 0.0, 0.0])])
    neighbors = [
        r["neighbor_id"]
        for r in ann.pq_index_probe(
            queries, idx, k=4, nprobe=1, include_incremental=True
        ).collect()
    ]
    assert 200 in neighbors
    # restart over the same checkpoint: no new batches, no duplicates
    again = stream_pq_ingest(
        spark, f"{src}/b*", idx,
        schema="vec_id bigint, embedding array<double>",
    )
    assert sorted(r["vec_id"] for r in again.collect()) == [100, 101, 200]
