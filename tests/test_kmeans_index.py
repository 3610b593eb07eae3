"""Large-k assignment transports: the exact centroid index (bit-parity
with the flat scan is the CONTRACT — it only skips provably-losing
cells) and the hierarchical nprobe rule (approximate BY RULE — its
contract queries are oracle-gated in test_entry_contract; here the
structural properties: determinism, seed rule, nprobe bound, plan
shape). Scale rationale: flat assignment is O(N*k*dim); the hierarchy
is O(N*sqrt(k)*dim) — see kmeans.py's module comments."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.operators.kmeans import (
    CENTROID_INDEX_MIN_K,
    build_centroid_cells,
    centroid_index_frame,
    centroid_index_stats_expr,
    hier_train,
    kmeans_assign,
    kmeans_assign_hier,
    kmeans_assign_hier_soft,
    kmeans_assign_soft,
    kmeans_train,
    use_centroid_index,
    use_literal_codebook,
    _to_fp,
)

EMB = "/root/testdata/sf0.001/embeddings.parquet"
K80_IDS = [i * 6 + 1 for i in range(80)]  # k*dim = 5120 > literal cap


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB)


# ---------------------------------------------------------------- exact index


@pytest.mark.slow
def test_centroid_index_bit_parity_hard(spark, emb):
    flat = kmeans_assign(
        emb, init_ids=K80_IDS, iterations=2, centroid_index=False
    )
    idx = kmeans_assign(
        emb, init_ids=K80_IDS, iterations=2, centroid_index=True
    )
    assert flat.exceptAll(idx).count() == 0
    assert idx.exceptAll(flat).count() == 0


@pytest.mark.slow
def test_centroid_index_bit_parity_soft(spark, emb):
    flat = kmeans_assign_soft(
        emb, init_ids=K80_IDS, iterations=2, margin=0.01, centroid_index=False
    )
    idx = kmeans_assign_soft(
        emb, init_ids=K80_IDS, iterations=2, margin=0.01, centroid_index=True
    )
    assert flat.exceptAll(idx).count() == 0
    assert idx.exceptAll(flat).count() == 0


def test_centroid_cells_partition_the_codebook(spark, emb):
    _, cents = kmeans_train(
        emb, init_ids=K80_IDS, iterations=2, centroid_index=False
    )
    cells = build_centroid_cells(cents)
    seen = [m[0] for c in cells for m in c["members"]]
    assert sorted(seen) == sorted(cents)  # every centroid, exactly once
    import math

    for c in cells:
        m = c["marr"]
        for _, _, arr in c["members"]:
            d2 = sum((a - b) ** 2 for a, b in zip(arr, m))
            assert math.isqrt(d2) <= c["rceil"]  # radius covers members


def test_centroid_index_work_is_bounded(spark, emb):
    _, cents = kmeans_train(
        emb, init_ids=K80_IDS, iterations=2, centroid_index=False
    )
    cells = build_centroid_cells(cents)
    v = emb.select(_to_fp("embedding", 10**6).alias("a"))
    st = v.crossJoin(
        F.broadcast(centroid_index_frame(spark, cells))
    ).select(centroid_index_stats_expr("a").alias("s"))
    row = st.agg(
        F.max("s.cells_scored").alias("mc"),
        F.max("s.members_scored").alias("mm"),
    ).first()
    assert row["mc"] <= len(cells)
    assert row["mm"] <= len(cents)


def test_transport_selection_rules():
    small = {i: [1] * 64 for i in range(8)}
    big = {i: [1] * 64 for i in range(max(CENTROID_INDEX_MIN_K, 128))}
    assert use_literal_codebook(small, None)
    assert not use_centroid_index(small, None, None)  # literal wins
    assert not use_literal_codebook(big, None)
    assert use_centroid_index(big, None, None)  # auto past MIN_K
    assert not use_centroid_index(big, None, False)  # explicit off wins
    assert use_centroid_index(small, False, True)  # forced on, non-literal


# ------------------------------------------------------------- hierarchical


HIER_KW = dict(
    coarse_init_ids=[10, 30, 50, 70],
    sub_k=2,
    coarse_iterations=2,
    sub_iterations=2,
)


@pytest.mark.slow
def test_hier_labels_are_subseed_ids_and_deterministic(spark, emb):
    a1 = kmeans_assign_hier(emb, nprobe=1, **HIER_KW)
    a2 = kmeans_assign_hier(emb, nprobe=1, **HIER_KW)
    assert a1.exceptAll(a2).count() == 0 and a2.exceptAll(a1).count() == 0
    # labels = the sub_k lowest vec_ids of each coarse cell (the seed rule)
    v, coarse_cents, sub = hier_train(emb, **HIER_KW)
    labels = {r["cluster"] for r in a1.select("cluster").distinct().collect()}
    seed_ids = {scid for cell in sub.values() for scid in cell}
    assert labels <= seed_ids
    assert len(seed_ids) <= len(coarse_cents) * HIER_KW["sub_k"]


def test_hier_nprobe_bound(spark, emb):
    """The serve kernel is structurally incapable of scoring outside the
    nprobe nearest cells: its candidate pool per vector is exactly the
    flattened members of the nprobe coarse-nearest cells."""
    from credit_abs_oltp_to_mart_spark.operators.kmeans import (
        _hier_cand_scores_expr,
        _hier_frame,
    )

    v, coarse_cents, sub = hier_train(emb, **HIER_KW)
    frame = _hier_frame(spark, coarse_cents, sub)
    for nprobe in (1, 2):
        scored = v.crossJoin(F.broadcast(frame)).select(
            F.size(_hier_cand_scores_expr("a", nprobe)).alias("n")
        )
        max_members = sorted(
            (len(cell) for cell in sub.values()), reverse=True
        )[:nprobe]
        assert scored.agg(F.max("n")).first()[0] <= sum(max_members)


@pytest.mark.slow
def test_hier_nprobe1_matches_own_cell_argmin(spark, emb):
    """nprobe=1 assigns within the vector's coarse-argmin cell — the
    final training assignment — so cluster labels refine the coarse
    partition (each hier cluster maps to exactly one coarse cell)."""
    v, coarse_cents, sub = hier_train(emb, **HIER_KW)
    owner = {
        scid: ccl for ccl, cell in sub.items() for scid in cell
    }
    a = kmeans_assign_hier(emb, nprobe=1, **HIER_KW)
    coarse, _ = kmeans_train(
        v,
        init_ids=HIER_KW["coarse_init_ids"],
        iterations=HIER_KW["coarse_iterations"],
        id_col="vid",
        vec_col="a",
        prescaled=True,
    )
    joined = a.join(
        coarse.withColumnRenamed("vid", "vec_id").withColumnRenamed(
            "cluster", "ccl"
        ),
        "vec_id",
    )
    bad = joined.where(
        F.col("ccl")
        != F.udf(lambda c: owner[c], "bigint")(F.col("cluster"))
    ).count()
    assert bad == 0


def test_hier_serve_is_map_only(spark, emb):
    """Plan gate: the final assignment pass is scan + one-row broadcast
    + project — no shuffle on the vector side (the only exchanges are
    broadcast exchanges)."""
    a = kmeans_assign_hier(emb, nprobe=2, **HIER_KW)
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "CartesianProduct" not in plan


@pytest.mark.slow
def test_hier_soft_rows_shape(spark, emb):
    s = kmeans_assign_hier_soft(emb, margin=0.01, nprobe=2, **HIER_KW)
    n = emb.count()
    prim = s.where(F.col("is_primary") == 1)
    assert prim.count() == n  # exactly one primary per vector
    assert s.count() <= 2 * n  # at most one runner-up each
    assert s.groupBy("vec_id").count().agg(F.max("count")).first()[0] <= 2


def test_hier_soft_pruned_serve_is_map_only(spark, emb):
    """Plan gate for the PRUNED soft serve: still scan + one-row
    broadcast + project on the vector side — the prune is pure
    expression work, no new exchange, no cartesian."""
    s = kmeans_assign_hier_soft(emb, margin=0.01, nprobe=2, **HIER_KW)
    plan = s._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "CartesianProduct" not in plan


@pytest.mark.slow
def test_hier_hard_prune_bit_identical_to_union(spark, emb):
    """Hard nprobe=2 assignment through the margin-0 prune equals the
    plain union kernel, bit for bit."""
    pruned = {
        tuple(r)
        for r in kmeans_assign_hier(emb, nprobe=2, **HIER_KW).collect()
    }
    union = {
        tuple(r)
        for r in kmeans_assign_hier(
            emb, nprobe=2, _prune=False, **HIER_KW
        ).collect()
    }
    assert pruned == union and pruned


@pytest.mark.parametrize("margin", [0.0, 0.01, 0.5, 10.0])
@pytest.mark.slow
def test_hier_soft_prune_bit_identical_to_union(spark, emb, margin):
    """The margin prune is a certified skip: the pruned kernel's output
    rows equal the full nprobe=2 union kernel's, bit for bit, across
    margins from degenerate (0) to window-dominating (10)."""
    pruned = {
        tuple(r)
        for r in kmeans_assign_hier_soft(
            emb, margin=margin, nprobe=2, **HIER_KW
        ).collect()
    }
    union = {
        tuple(r)
        for r in kmeans_assign_hier_soft(
            emb, margin=margin, nprobe=2, _prune=False, **HIER_KW
        ).collect()
    }
    assert pruned == union and pruned


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.slow
def test_hier_soft_prune_randomized_boundary_parity(spark, seed):
    """Adversarial geometry for the float-sqrt conservativeness: tight
    clusters PLUS vectors sitting on midpoints between cluster pairs
    (where the triangle bound is weakest and a non-conservative d_lb
    would flip results). Pruned vs union must stay bit-identical at a
    degenerate, a tight, and a window-dominating margin."""
    import random

    rng = random.Random(seed)
    dim = 8
    centers = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(4)]
    rows, vid = [], 0
    for c in centers:
        for _ in range(30):
            rows.append(
                (vid, [x + rng.uniform(-0.05, 0.05) for x in c])
            )
            vid += 1
    for i in range(4):
        for j in range(i + 1, 4):
            mid = [(a + b) / 2 for a, b in zip(centers[i], centers[j])]
            for _ in range(5):
                rows.append(
                    (vid, [x + rng.uniform(-0.02, 0.02) for x in mid])
                )
                vid += 1
    e = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    kw = dict(
        coarse_init_ids=[0, 30, 60, 90],
        sub_k=3,
        coarse_iterations=2,
        sub_iterations=2,
    )
    for margin in (0.0, 0.005, 0.2):
        a = {
            tuple(r)
            for r in kmeans_assign_hier_soft(
                e, margin=margin, nprobe=2, **kw
            ).collect()
        }
        b = {
            tuple(r)
            for r in kmeans_assign_hier_soft(
                e, margin=margin, nprobe=2, _prune=False, **kw
            ).collect()
        }
        assert a == b and a, margin


def test_hier_soft_prune_actually_fires(spark, emb):
    """The certified skip must engage on real data — otherwise the
    kernel silently degrades to the union cost. Inspect probed2 from
    the kernel expression directly (it is projected away in the public
    output)."""
    from credit_abs_oltp_to_mart_spark.operators.kmeans import (
        _hier_frame,
        _hier_soft_top2_pruned_expr,
        FP_SCALE,
    )

    v, coarse_cents, sub = hier_train(emb, **HIER_KW)
    frame = _hier_frame(spark, coarse_cents, sub)
    margin_fp = int(round(0.01 * FP_SCALE * FP_SCALE))
    t2 = _hier_soft_top2_pruned_expr("a", margin_fp)
    probed = (
        v.crossJoin(F.broadcast(frame))
        .select(t2.alias("__t"))
        .agg(
            F.sum("__t.probed2").alias("probed"),
            F.count(F.lit(1)).alias("n"),
        )
        .first()
    )
    assert probed["n"] > 0
    # some vectors sit near a cell boundary (must probe), but the bulk
    # of a clustered corpus must prune — require BOTH behaviors present
    assert 0 < probed["probed"] < probed["n"]


def test_assign_against_hier_codebook_matches_training_serve(spark, emb):
    """The FIXED-two-level-codebook online assignment (the streaming
    semantic gate's scale form) is bit-identical to the trained serve:
    same kernel, same (score, scid) tiebreaks — an ingested vector lands
    exactly where the codebook's own retrain-side serve would put it."""
    from credit_abs_oltp_to_mart_spark.operators.ann import (
        assign_against_hier_codebook,
    )

    v, coarse_cents, sub = hier_train(emb, **HIER_KW)
    want = {
        (r["vec_id"], r["cluster"])
        for r in kmeans_assign_hier(emb, nprobe=1, **HIER_KW).collect()
    }
    got_df = assign_against_hier_codebook(
        emb, coarse_cents, sub, nprobe=1
    )
    got = {(r["vec_id"], r["cluster"]) for r in got_df.collect()}
    assert got == want and got
    # map-only plan gate, like the trained serve: one broadcast frame,
    # no vector-side shuffle
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "CartesianProduct" not in plan
