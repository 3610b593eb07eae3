"""Lloyd's k-means over an embedding column, in exact fixed point.

Closes the loop left open by ``ann.py::ivf_topk``, whose codebook is "a
deterministic stand-in for a k-means training step": this IS that training
step. Cluster-assign is also a curation primitive in its own right
(diversity sampling, cluster-balanced mixing, semantic dedup).

Reproducibility: float k-means is engine-unstable twice over — centroid
means depend on summation order, and assignment ties flip with rounding.
Here every quantity is integer fixed point (coordinates scaled by 10^6 and
half-away-from-zero rounded once on ingest):

    dot products   : bigint products, bigint sums (exact, any order)
    argmin         : min over (cc - 2*ac, centroid_id) pairs — total order
    centroid update: trunc(sum / count) — sums stay well inside double's
                     2^53 exact-integer range, so the IEEE division and
                     trunc are bit-identical in Spark and DuckDB

so a fixed iteration count gives bit-identical assignments in any engine.

Scale shape (the canonical Lloyd-on-Spark loop): the codebook is k*dim
numbers — it lives on the driver and ships to executors either as plan
LITERALS (small k: whole-stage-codegen fold per centroid, no join) or as a
one-row BROADCAST frame (large k: a BroadcastNestedLoopJoin of exactly one
row — the codebook enters the executors through the broadcast manager
instead of the serialized plan, which falls over past a few thousand
centroids). BOTH paths are map-only over the vectors: no shuffle, no
per-vector row explosion (the broadcast side is one array of structs, and
the argmin is a higher-order-function fold over it). The integer
arithmetic is identical expression-for-expression, so the paths are
bit-parity interchangeable; ``codebook_as_literals=None`` auto-selects by
k*dim. The update step shuffles (cluster, dim, partial-sum) rows — with
map-side combine that is O(k * dim * partitions) wire traffic, independent
of row count — and collects O(k*dim) to the driver per round (fine for
coarse-IVF k; an extreme-k codebook would keep the update distributed
too). Vectors are fixed-pointed once and localCheckpoint'd; iterations
never re-read or re-scale the source.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.functions.parallelism import local_rows

FP_SCALE = 10**6

# literal-codebook ceiling: past ~4096 centroid VALUES (k * dim) the plan
# string and codegen blow up — auto-switch to the broadcast-frame path
LITERAL_CODEBOOK_MAX_VALUES = 4096

# past this many centroids the broadcast path stops scanning the FLAT
# codebook per vector and assigns through the centroid INDEX instead
# (IVF-on-centroids with an exact triangle-inequality prune) — results
# are bit-identical either way, this is a cost dial only
CENTROID_INDEX_MIN_K = 64


def _to_fp(col: str, scale: int) -> Column:
    # half-away-from-zero at fixed scale; identical expression shape to the
    # DuckDB oracle (no sign(): its return type differs across engines)
    return F.expr(
        f"transform({col}, x -> cast(case when x >= 0"
        f" then floor(cast(x as double) * {scale} + 0.5)"
        f" else -floor(-cast(x as double) * {scale} + 0.5) end as bigint))"
    )


def kmeans_assign(
    emb: DataFrame,
    *,
    init_ids: list[int],
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fp_scale: int = FP_SCALE,
    codebook_as_literals: bool | None = None,
    centroid_index: bool | None = None,
) -> DataFrame:
    """(vec_id, cluster) after ``iterations`` assignment rounds.

    Clusters are labelled by the init vector's id (stable labels). Between
    assignment rounds, centroids move to the truncated mean of their
    members; a cluster that loses all members keeps its previous centroid.
    """
    assign, _ = kmeans_train(
        emb,
        init_ids=init_ids,
        iterations=iterations,
        id_col=id_col,
        vec_col=vec_col,
        fp_scale=fp_scale,
        codebook_as_literals=codebook_as_literals,
        centroid_index=centroid_index,
    )
    return assign


def centroid_score_structs(
    cents: dict[int, list[int]], arr_col: str
) -> list[Column]:
    """(score, cid) structs — the integer L2 score |c|^2 - 2<v,c> of the
    fixed-point vector column ``arr_col`` against every codebook
    centroid, with the cid tiebreak baked into struct order (struct
    comparison is lexicographic). Shared by the Lloyd assignment loop and
    ``ann.ivf_topk_trained``'s probe ranking so the two scoring
    expressions can never drift — the trained-IVF equivalence
    "assignment == re-assignment against the codebook" depends on them
    being identical."""
    out = []
    for cid in sorted(cents):
        c = cents[cid]
        cc = sum(x * x for x in c)  # exact python int, fits bigint
        lits = ", ".join(str(x) + "L" for x in c)
        dot = (
            f"aggregate(zip_with({arr_col}, array({lits}), (x, y) -> x * y),"
            f" 0L, (acc, x) -> acc + x)"
        )
        out.append(
            F.struct(
                F.expr(f"{cc}L - 2L * ({dot})").alias("score"),
                F.lit(cid).cast("bigint").alias("cid"),
            )
        )
    return out


def use_literal_codebook(
    cents: dict[int, list[int]], codebook_as_literals: bool | None
) -> bool:
    """Resolve the literal-vs-broadcast codebook choice: explicit flag
    wins; ``None`` auto-selects literals only while k*dim stays under
    ``LITERAL_CODEBOOK_MAX_VALUES``."""
    if codebook_as_literals is not None:
        return codebook_as_literals
    dim = len(next(iter(cents.values())))
    return len(cents) * dim <= LITERAL_CODEBOOK_MAX_VALUES


def codebook_frame(
    spark: SparkSession, cents: dict[int, list[int]]
) -> DataFrame:
    """The codebook as a ONE-ROW frame: ``__cbk`` is an array of
    (cid, cc, arr) structs sorted by cid (cc = |c|^2, exact). Cross-joined
    under ``F.broadcast`` this is a BroadcastNestedLoopJoin of exactly one
    row — the large-k codebook transport (broadcast manager, not plan
    literals), with no effect on the vector side's partitioning."""
    row = [
        (int(cid), int(sum(x * x for x in cents[cid])), [int(x) for x in cents[cid]])
        for cid in sorted(cents)
    ]
    return local_rows(spark, 
        [(row,)], "__cbk array<struct<cid:bigint,cc:bigint,arr:array<bigint>>>"
    )


def codebook_score_structs_expr(arr_col: str) -> Column:
    """(score, cid) structs against a joined ``__cbk`` codebook column —
    the broadcast-path twin of ``centroid_score_structs``: same integer
    L2 score |c|^2 - 2<v,c>, same lexicographic (score, cid) tiebreak,
    evaluated as a higher-order-function fold instead of per-centroid
    literal expressions. Bit-parity with the literal path is load-bearing
    (the trained-IVF equivalence rides on it) and pinned by tests."""
    return F.expr(
        f"transform(__cbk, c -> struct("
        f"c.cc - 2L * aggregate(zip_with({arr_col}, c.arr, (x, y) -> x * y),"
        f" 0L, (acc, x) -> acc + x) as score, c.cid as cid))"
    )


# --------------------------------------------------------------------------
# centroid index: IVF over the CODEBOOK, with an EXACT prune
#
# Flat assignment scores every vector against all k centroids — O(k * dim)
# per vector, the one cost in this module that grows with k. When k scales
# with the corpus (SemDeDup's own recipe: keep per-cluster candidate counts
# constant), that makes assignment O(N * k) ~ O(N^2) total. The classic fix
# (FAISS's assign-via-quantizer / Elkan-Hamerly bounds) is an index over
# the CENTROIDS: group the k centroids into ~sqrt(k) coarse cells, score a
# vector against the cell CENTERS first, visit cells nearest-first, and
# skip a whole cell when the triangle inequality proves it cannot contain
# the argmin:
#
#     ||v - c|| >= ||v - m_g|| - r_g        for every member c of cell g
#     (m_g = cell center, r_g = max member distance from m_g)
#
# The prune is CONSERVATIVE-EXACT, so the assignment is bit-identical to
# the flat scan — including the (score, cid) tiebreak, because a cell is
# only skipped when its lower bound is STRICTLY above the incumbent score
# (a potential tie is never pruned). Exactness bookkeeping in integers:
# the scoring kernel's score is ||v-c||^2 - ||v||^2, so with vv = ||v||^2
# the incumbent squared distance is acc.score + vv, and the cell bound is
#
#     lbs  = max(0, floor_sqrt(D) - 1 - rceil_g),  D = ||v - m_g||^2
#     skip iff  lbs^2 - vv > acc.score
#
# where floor_sqrt is computed through double sqrt (IEEE correctly
# rounded; the extra -1 absorbs the half-ulp so lbs <= ||v - m_g|| - r_g
# always) and rceil_g = ceil(max member distance) is exact via
# math.isqrt at build time. The bound only ever SKIPS work, never changes
# a comparison, so no cross-engine replay obligation attaches to it — the
# DuckDB oracle keeps replaying the flat argmin and hashes stay equal.
#
# Cost: O(sqrt(k) * dim) cell scoring + O(visited_members * dim) member
# scoring per vector, map-only against a one-row broadcast (same
# transport as the flat ``codebook_frame``). The coarse grouping itself
# is driver-side numpy over the k*dim codebook the driver already holds.
# --------------------------------------------------------------------------


def _coarse_assign(mat: np.ndarray, centers: np.ndarray) -> np.ndarray:
    """argmin_j ||c_i - m_j||^2 via the same |m|^2 - 2<c,m> integer score
    (ties -> lowest cell index; exact int64 arithmetic)."""
    dots = mat @ centers.T
    mm = (centers * centers).sum(axis=1)
    return (mm[None, :] - 2 * dots).argmin(axis=1)


def build_centroid_cells(
    cents: dict[int, list[int]],
    *,
    n_cells: int | None = None,
    coarse_iterations: int = 2,
) -> list[dict]:
    """Group the codebook's k centroids into ~sqrt(k) coarse cells
    (driver-side numpy Lloyd over k*dim integers — the codebook already
    lives on the driver). Returns one dict per NON-EMPTY cell:
    {mcc, marr, rceil, members=[(cid, cc, arr), ...]} with members sorted
    by cid and every centroid in exactly one cell. The grouping quality
    affects COST only, never results, so the deterministic evenly-spaced
    seeding + truncated-mean updates here need no cross-engine replay."""
    cids = sorted(cents)
    k = len(cids)
    mat = np.array([cents[c] for c in cids], dtype=np.int64)
    if n_cells is None:
        n_cells = max(1, math.isqrt(max(0, k - 1)) + 1)
    n_cells = min(n_cells, k)
    if n_cells == 1:
        seed_idx = [0]
    else:
        seed_idx = sorted(
            {round(i * (k - 1) / (n_cells - 1)) for i in range(n_cells)}
        )
    centers = mat[seed_idx].copy()
    for _ in range(coarse_iterations):
        assign = _coarse_assign(mat, centers)
        for j in range(len(centers)):
            mask = assign == j
            if mask.any():
                s = mat[mask].sum(axis=0, dtype=np.int64)
                # trunc-toward-zero mean; float64 exact (sums << 2^53)
                centers[j] = np.fix(s / int(mask.sum())).astype(np.int64)
    assign = _coarse_assign(mat, centers)
    cells: list[dict] = []
    for j in range(len(centers)):
        idx = np.nonzero(assign == j)[0]
        if idx.size == 0:
            continue
        m = centers[j]
        diffs = mat[idx] - m[None, :]
        rceil = 0
        for d2 in (diffs * diffs).sum(axis=1).tolist():
            r = math.isqrt(int(d2))
            if r * r < d2:
                r += 1
            rceil = max(rceil, r)
        cells.append(
            {
                "mcc": int((m * m).sum()),
                "marr": [int(x) for x in m],
                "rceil": int(rceil),
                "members": [
                    (
                        int(cids[i]),
                        int((mat[i] * mat[i]).sum()),
                        [int(x) for x in mat[i]],
                    )
                    for i in idx.tolist()
                ],
            }
        )
    return cells


def centroid_index_frame(spark: SparkSession, cells: list[dict]) -> DataFrame:
    """The centroid index as a ONE-ROW frame (column ``__cbi``), the
    large-k transport twin of ``codebook_frame`` — cross-joined under
    ``F.broadcast`` it ships through the broadcast manager, one array of
    cell structs, no effect on the vector side's partitioning."""
    rows = [
        (c["mcc"], c["marr"], c["rceil"], list(c["members"])) for c in cells
    ]
    return local_rows(spark, 
        [(rows,)],
        "__cbi array<struct<mcc:bigint,marr:array<bigint>,rceil:bigint,"
        "members:array<struct<cid:bigint,cc:bigint,arr:array<bigint>>>>>",
    )


def _cbi_member_scores(arr_col: str, cell_idx: str, tag: str) -> str:
    """(score, cid) structs of ``arr_col`` against every member of cell
    ``cell_idx`` — the SAME integer L2 kernel as the flat paths; ``tag``
    keeps nested lambda variable names collision-free."""
    return (
        f"transform(get(__cbi, {cell_idx}).members, {tag}c -> struct("
        f"{tag}c.cc - 2L * aggregate("
        f"zip_with({arr_col}, {tag}c.arr, ({tag}x, {tag}y) -> {tag}x * {tag}y),"
        f" 0L, ({tag}a, {tag}z) -> {tag}a + {tag}z) as score,"
        f" {tag}c.cid as cid))"
    )


def _cbi_lbs(d_expr: str, cell_idx: str) -> str:
    """Conservative integer lower bound on the distance from the vector
    to any member of cell ``cell_idx``: max(0, floor_sqrt(D) - 1 - rceil).
    floor(sqrt(double)) can overshoot the real sqrt by at most one (D is
    an exact double below 2^53 and IEEE sqrt is correctly rounded), so
    the -1 makes the bound provably <= sqrt(D) - r — prunes never drop
    the true argmin."""
    return (
        f"greatest(0L, cast(floor(sqrt(cast({d_expr} as double))) as bigint)"
        f" - 1L - get(__cbi, {cell_idx}).rceil)"
    )


def _cbi_prelude(arr_col: str) -> tuple[str, str]:
    """Shared head of the index expressions: the let-binding (a one-element
    transform) holding vv = |v|^2 and the distance-sorted cell order."""
    vv = f"aggregate({arr_col}, 0L, (va, vx) -> va + vx * vx)"
    cell_order = (
        f"array_sort(transform(__cbi, (g, gi) -> struct("
        f"g.mcc - 2L * aggregate("
        f"zip_with({arr_col}, g.marr, (mx, my) -> mx * my),"
        f" 0L, (ma, mz) -> ma + mz) as ms, gi as idx)))"
    )
    return vv, cell_order


def centroid_index_best_expr(arr_col: str) -> Column:
    """The flat argmin, through the index: struct(score, cid) of the
    nearest centroid — bit-identical to
    ``array_min(codebook_score_structs_expr(arr_col))`` (pinned by
    tests), visiting cells nearest-first and skipping every cell whose
    triangle-inequality bound clears the incumbent."""
    vv, cell_order = _cbi_prelude(arr_col)
    init = f"array_min({_cbi_member_scores(arr_col, 'get(t.cells, 0).idx', 'i')})"
    lbs = _cbi_lbs("s.ms + t.vv", "s.idx")
    step = (
        f"if(({lbs}) * ({lbs}) - t.vv > acc.score, acc,"
        f" least(acc, array_min({_cbi_member_scores(arr_col, 's.idx', 'u')})))"
    )
    return F.expr(
        f"get(transform(array(struct(({vv}) as vv, ({cell_order}) as cells)),"
        f" t -> aggregate(slice(t.cells, 2, size(t.cells) - 1),"
        f" {init}, (acc, s) -> {step})), 0)"
    )


def centroid_index_top2_expr(arr_col: str) -> Column:
    """Exact top-2 through the index: struct(c1, c2) of the two nearest
    centroids (c2 null iff k = 1) — bit-identical to taking elements 0/1
    of the sorted flat scores. The prune compares against the SECOND
    incumbent (a cell that cannot beat c2 cannot change either slot) and
    never fires while c2 is still null."""
    vv, cell_order = _cbi_prelude(arr_col)
    init_sorted = (
        f"array_sort({_cbi_member_scores(arr_col, 'get(t.cells, 0).idx', 'i')})"
    )
    init = (
        f"get(transform(array({init_sorted}), w ->"
        f" struct(get(w, 0) as c1, get(w, 1) as c2)), 0)"
    )
    lbs = _cbi_lbs("s.ms + t.vv", "s.idx")
    merged = (
        f"slice(array_sort(filter(concat(array(acc.c1, acc.c2),"
        f" {_cbi_member_scores(arr_col, 's.idx', 'u')}),"
        f" e -> e is not null)), 1, 2)"
    )
    step = (
        f"if(acc.c2 is not null and ({lbs}) * ({lbs}) - t.vv > acc.c2.score,"
        f" acc, get(transform(array({merged}), w ->"
        f" struct(get(w, 0) as c1, get(w, 1) as c2)), 0))"
    )
    return F.expr(
        f"get(transform(array(struct(({vv}) as vv, ({cell_order}) as cells)),"
        f" t -> aggregate(slice(t.cells, 2, size(t.cells) - 1),"
        f" {init}, (acc, s) -> {step})), 0)"
    )


def centroid_index_stats_expr(arr_col: str) -> Column:
    """Work counter for gates/diagnostics: struct(cells_scored,
    members_scored) — how many cells the argmin fold actually VISITED
    (init cell included) and how many member centroids it scored. Runs
    the same fold with a counting accumulator; results unused."""
    vv, cell_order = _cbi_prelude(arr_col)
    init = (
        f"struct(array_min({_cbi_member_scores(arr_col, 'get(t.cells, 0).idx', 'i')})"
        f" as best, 1 as cells_scored,"
        f" size(get(__cbi, get(t.cells, 0).idx).members) as members_scored)"
    )
    lbs = _cbi_lbs("s.ms + t.vv", "s.idx")
    step = (
        f"if(({lbs}) * ({lbs}) - t.vv > acc.best.score, acc,"
        f" struct(least(acc.best,"
        f" array_min({_cbi_member_scores(arr_col, 's.idx', 'u')})) as best,"
        f" acc.cells_scored + 1 as cells_scored,"
        f" acc.members_scored + size(get(__cbi, s.idx).members)"
        f" as members_scored))"
    )
    return F.expr(
        f"get(transform(array(struct(({vv}) as vv, ({cell_order}) as cells)),"
        f" t -> aggregate(slice(t.cells, 2, size(t.cells) - 1),"
        f" {init}, (acc, s) -> {step})), 0)"
    )


def use_centroid_index(
    cents: dict[int, list[int]],
    codebook_as_literals: bool | None,
    centroid_index: bool | None,
) -> bool:
    """Among the non-literal transports, index past CENTROID_INDEX_MIN_K
    centroids (explicit ``centroid_index`` wins). Never combined with the
    literal path — small codebooks stay as plan literals."""
    if use_literal_codebook(cents, codebook_as_literals):
        return False
    if centroid_index is not None:
        return centroid_index
    return len(cents) >= CENTROID_INDEX_MIN_K


def kmeans_train(
    emb: DataFrame,
    *,
    init_ids: list[int],
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fp_scale: int = FP_SCALE,
    codebook_as_literals: bool | None = None,
    centroid_index: bool | None = None,
    prescaled: bool = False,
    init_cents: dict[int, list[int]] | None = None,
) -> tuple[DataFrame, dict[int, list[int]]]:
    """``kmeans_assign`` plus the trained CODEBOOK: returns
    (assignments, {cluster_id: fixed-point centroid}) where the codebook
    is exactly the one that PRODUCED the final assignment round — so
    re-assigning any vector against it (integer argmin, same tiebreak)
    reproduces the returned assignment bit-for-bit. That equivalence is
    what lets ``ann.ivf_topk_trained`` use the assignment AS the IVF
    coarse quantization while probing queries against the codebook.

    ``prescaled=True``: ``vec_col`` already holds the fixed-point bigint
    array (scaled by ``fp_scale``, ideally off a checkpointed frame) —
    skip the scaling pass and the per-call localCheckpoint. The batch
    path for callers training SEVERAL codebooks over slices of ONE
    vector table (``ann.pq_train``): fixed-pointing is elementwise, so
    slice(to_fp(v)) == to_fp(slice(v)) and results are bit-identical."""
    if prescaled:
        v = emb.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("a"))
    else:
        v = emb.select(
            F.col(id_col).alias("vid"), _to_fp(vec_col, fp_scale).alias("a")
        ).localCheckpoint(eager=True)
    if init_cents is not None:
        # caller already collected the seed rows (e.g. one shared collect
        # covering several trainings); values MUST equal the input frame's
        # fixed-point rows for those ids — same contract as prescaled
        if set(init_cents) != set(init_ids):
            raise ValueError("init_cents keys must equal init_ids")
        cents: dict[int, list[int]] = {
            int(k): list(v_) for k, v_ in init_cents.items()
        }
    else:
        cents = {
            r["vid"]: list(r["a"])
            for r in v.where(F.col("vid").isin(init_ids)).collect()
        }
        if len(cents) != len(init_ids):
            missing = set(init_ids) - set(cents)
            raise ValueError(f"init ids not found in input: {sorted(missing)}")

    literals = use_literal_codebook(cents, codebook_as_literals)
    indexed = use_centroid_index(cents, codebook_as_literals, centroid_index)
    assign = None
    for it in range(iterations):
        if literals:
            choices = centroid_score_structs(cents, "a")
            cluster = F.array_min(F.array(*choices))["cid"]
            scored = v
        elif indexed:
            # same integer kernel, same argmin — the index only SKIPS
            # provably-losing cells, so assignments are bit-identical to
            # the flat scan (pinned by tests/test_kmeans_index.py)
            cluster = centroid_index_best_expr("a")["cid"]
            scored = v.crossJoin(
                F.broadcast(
                    centroid_index_frame(
                        v.sparkSession, build_centroid_cells(cents)
                    )
                )
            )
        else:
            cluster = F.array_min(codebook_score_structs_expr("a"))["cid"]
            scored = v.crossJoin(
                F.broadcast(codebook_frame(v.sparkSession, cents))
            )
        assign = scored.select("vid", "a", cluster.alias("cluster"))
        if it < iterations - 1:
            sums = (
                assign.select(
                    "cluster", F.posexplode("a").alias("d", "val")
                )
                .groupBy("cluster", "d")
                .agg(
                    F.sum("val").alias("s"),
                    F.count(F.lit(1)).alias("n"),
                )
                .select(
                    "cluster",
                    "d",
                    # Spark's double->bigint cast truncates toward zero —
                    # same as the oracle's trunc() (DuckDB's own
                    # double->bigint cast would ROUND instead)
                    F.expr("cast(cast(s as double) / n as bigint)").alias("c"),
                )
                .collect()
            )
            dim = len(next(iter(cents.values())))
            new: dict[int, list[int]] = {}
            for r in sums:
                new.setdefault(r["cluster"], [0] * dim)
                new[r["cluster"]][r["d"]] = r["c"]
            # empty clusters keep their previous centroid
            cents = {cid: new.get(cid, cents[cid]) for cid in cents}
    return assign.select(F.col("vid").alias(id_col), "cluster"), cents


def kmeans_assign_soft(
    emb: DataFrame,
    *,
    init_ids: list[int],
    iterations: int = 3,
    margin: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fp_scale: int = FP_SCALE,
    codebook_as_literals: bool | None = None,
    centroid_index: bool | None = None,
) -> DataFrame:
    """Top-2-within-margin SOFT assignment: every vector gets its argmin
    cluster (``is_primary`` = 1) plus, when the second-nearest centroid is
    within ``margin`` of the nearest, that runner-up cluster too
    (``is_primary`` = 0). This is the SemDeDup cross-cluster recall
    repair: a near-dup pair that straddles a k-means boundary is missed by
    hard assignment, but a boundary vector sits near BOTH centroids by
    definition, so its soft row lands it in the neighbour's candidate pool
    and the pair is scored — at the cost of one extra candidate row per
    boundary vector, still through the cluster EQUI-join (never all-pairs).

    ``margin`` is in squared-L2 units of the ORIGINAL embedding space:
    the integer score |c|^2 - 2<v,c> differs from the true squared
    distance by the assignment-invariant |v|^2, so score deltas ARE
    squared-distance deltas, in fp_scale^2 fixed-point units — the
    comparison is exact integer arithmetic, replayable in any engine.

    Scale: identical to ``kmeans_assign`` (map-only scoring against a
    literal or one-row-broadcast codebook) plus one array_sort of k
    (score, cid) structs per vector; output rows <= 2n.
    """
    _, cents = kmeans_train(
        emb,
        init_ids=init_ids,
        iterations=iterations,
        id_col=id_col,
        vec_col=vec_col,
        fp_scale=fp_scale,
        codebook_as_literals=codebook_as_literals,
        centroid_index=centroid_index,
    )
    margin_fp = int(round(margin * fp_scale * fp_scale))
    v = emb.select(F.col(id_col).alias("vid"), _to_fp(vec_col, fp_scale).alias("a"))
    if use_literal_codebook(cents, codebook_as_literals):
        scores = F.array_sort(F.array(*centroid_score_structs(cents, "a")))
        top = v.select(
            "vid", F.get(scores, 0).alias("c1"), F.get(scores, 1).alias("c2")
        )
    elif use_centroid_index(cents, codebook_as_literals, centroid_index):
        # exact top-2 through the centroid index (prunes on the SECOND
        # incumbent) — bit-identical to sorting the flat scores
        t2 = centroid_index_top2_expr("a")
        top = v.crossJoin(
            F.broadcast(
                centroid_index_frame(v.sparkSession, build_centroid_cells(cents))
            )
        ).select("vid", t2["c1"].alias("c1"), t2["c2"].alias("c2"))
    else:
        scores = F.array_sort(codebook_score_structs_expr("a"))
        top = v.crossJoin(
            F.broadcast(codebook_frame(v.sparkSession, cents))
        ).select(
            "vid", F.get(scores, 0).alias("c1"), F.get(scores, 1).alias("c2")
        )
    rows = F.filter(
        F.array(
            F.struct(
                F.col("c1.cid").alias("cluster"),
                F.lit(1).alias("is_primary"),
            ),
            F.when(
                F.col("c2").isNotNull()
                & (F.col("c2.score") - F.col("c1.score") <= F.lit(margin_fp)),
                F.struct(
                    F.col("c2.cid").alias("cluster"),
                    F.lit(0).alias("is_primary"),
                ),
            ),
        ),
        lambda s: s.isNotNull(),
    )
    return top.select("vid", F.explode(rows).alias("r")).select(
        F.col("vid").alias(id_col),
        F.col("r.cluster").alias("cluster"),
        F.col("r.is_primary").cast("int").alias("is_primary"),
    )


# --------------------------------------------------------------------------
# hierarchical k-means: coarse cells -> per-cell sub-clusters, nprobe serve
#
# Flat Lloyd's assignment cost is O(N * k * dim) per round; with k scaled
# against the corpus (SemDeDup's own recipe — keep per-cluster candidate
# counts constant) that is O(N^2 * dim) total, the one scale-killer in the
# vector stack. The exact centroid-index above removes it only when the
# triangle bound bites, which near-orthogonal high-dim corpora (including
# the synthetic test embeddings: mean pairwise cosine ~0) defeat. The
# production answer — FAISS's IVF-assign, SemDeDup-at-scale's two-level
# clustering — CHANGES THE ASSIGNMENT RULE: train ~sqrt(k) coarse cells
# over the data, train sub-clusters WITHIN each cell, and assign a vector
# by probing its ``nprobe`` nearest cells' sub-clusters only. That rule is
# deterministic and engine-replayable (the contract oracles replay every
# step in SQL: coarse Lloyd, lowest-vid-per-cell sub-seeding, within-cell
# sub-Lloyd, nprobe-union argmin), so its queries stay hash-exact — the
# same contract posture as ``ann.ivf_topk``, which is approximate-by-rule
# too. Cost: O(N * sqrt(k) * dim) per round at sub_k ~ sqrt(k).
#
# Every scoring expression below is the SAME integer fixed-point L2
# kernel as the flat paths (|c|^2 - 2<v,c>, (score, id) tiebreak); only
# WHICH centroids get scored changes. Transport is a one-row broadcast
# (__cbc coarse array + __cbh cell->sub-centroids map): assignment stays
# map-only, no shuffle on the vector side; sub-training's update step
# shuffles O(k * dim * partitions) partial sums exactly like flat Lloyd.
# --------------------------------------------------------------------------


def _hier_frame(
    spark: SparkSession,
    coarse_cents: dict[int, list[int]],
    sub: dict[int, dict[int, list[int]]],
) -> DataFrame:
    """One-row transport frame: ``__cbc`` = coarse codebook (array of
    (ccl, cc, r, arr) ordered by ccl), ``__cbh`` = map from coarse cell
    id to its sub-centroids (array of (scid, cc, arr) ordered by scid;
    empty array for a memberless cell so lookups never null).

    ``r`` is the cell's sub-centroid radius — max over the cell's
    sub-centroids of ceil(sqrt(d2(cc, sc))), EXACT integer ceiling via
    math.isqrt (codebooks are driver-sized). It feeds the soft-serve
    margin prune: by the triangle inequality every member sc satisfies
    d(x, sc) >= d(x, cc) - r, so a runner-up coarse cell whose bound
    already exceeds the margin window never needs its sub-centroids
    scored."""
    import math

    cbc = []
    for ccl in sorted(coarse_cents):
        cc = coarse_cents[ccl]
        r = 0
        for vec in sub.get(ccl, {}).values():
            d2 = sum((int(a) - int(b)) ** 2 for a, b in zip(cc, vec))
            if d2 > 0:
                r = max(r, math.isqrt(d2 - 1) + 1)
        cbc.append(
            (
                int(ccl),
                int(sum(x * x for x in cc)),
                int(r),
                [int(x) for x in cc],
            )
        )
    cbh = {
        int(ccl): [
            (
                int(scid),
                int(sum(x * x for x in vec)),
                [int(x) for x in vec],
            )
            for scid, vec in sorted(sub.get(ccl, {}).items())
        ]
        for ccl in sorted(coarse_cents)
    }
    return local_rows(spark, 
        [(cbc, cbh)],
        "__cbc array<struct<ccl:bigint,cc:bigint,r:bigint,arr:array<bigint>>>,"
        "__cbh map<bigint,array<struct<scid:bigint,cc:bigint,arr:array<bigint>>>>",
    )


def _hier_own_scores_expr(arr_col: str) -> Column:
    """(score, scid) structs of the vector against its OWN coarse cell's
    sub-centroids (row column ``ccl`` -> ``__cbh`` lookup) — the
    sub-training assignment kernel, map-only."""
    return F.expr(
        f"transform(element_at(__cbh, ccl), hc -> struct("
        f"hc.cc - 2L * aggregate(zip_with({arr_col}, hc.arr,"
        f" (sx, sy) -> sx * sy), 0L, (sa, sz) -> sa + sz) as score,"
        f" hc.scid as scid))"
    )


def _hier_cand_scores_expr(arr_col: str, nprobe: int) -> Column:
    """(score, scid) structs of the vector against the UNION of its
    ``nprobe`` nearest coarse cells' sub-centroids: rank the coarse
    codebook by the integer score (ccl tiebreak), slice nprobe, flatten
    the probed cells' member scores. The serve/assignment kernel —
    structurally incapable of scoring beyond nprobe cells."""
    coarse = (
        f"slice(array_sort(transform(__cbc, hg -> struct("
        f"hg.cc - 2L * aggregate(zip_with({arr_col}, hg.arr,"
        f" (hx, hy) -> hx * hy), 0L, (ha, hz) -> ha + hz) as cs,"
        f" hg.ccl as ccl))), 1, {int(nprobe)})"
    )
    return F.expr(
        f"flatten(transform({coarse}, hp -> "
        f"transform(element_at(__cbh, hp.ccl), hc -> struct("
        f"hc.cc - 2L * aggregate(zip_with({arr_col}, hc.arr,"
        f" (sx, sy) -> sx * sy), 0L, (sa, sz) -> sa + sz) as score,"
        f" hc.scid as scid))))"
    )


def _hier_soft_top2_pruned_expr(arr_col: str, margin_fp: int) -> Column:
    """struct(c1, c2, probed2) for the nprobe=2 soft serve with the
    MARGIN PRUNE: the vector always scores its nearest coarse cell's
    sub-centroids exactly; the runner-up cell's sub-centroids are scored
    ONLY when the triangle-inequality lower bound cannot rule them out
    of the (primary, within-margin runner-up) outcome.

    Exactness argument (all comparisons on the integer score
    s = ||c||^2 - 2<x,c>, i.e. d^2 shifted by the constant ||x||^2):
    with s1 = best own-cell score, the prune requires
    min_{sc in cell2} s(sc) > s1 + margin_fp, certified by
    (d_lb - r2)^2 > s1 + ||x||^2 + margin_fp with d_lb <= d(x, cc2)
    and d_lb >= r2. Then no cell-2 candidate can be the primary
    (score > s1, strictly — labels never tie it away) nor a kept
    runner-up (score - s1 > margin), so (own[0], own[1]) equals the
    full union's effective top-2: if own[1] <= cell2-min the pools
    agree outright; otherwise BOTH pools' second candidates exceed the
    margin window and are dropped identically downstream. d_lb uses
    float sqrt CONSERVATIVELY (floor - 1, clamped at 0): an
    underestimate only ever disables the prune, never the other way,
    so the fallback is exact scoring — bit-identical output either
    way. A memberless own cell (empty sub-codebook) disables the
    prune, reproducing the union kernel's behavior verbatim.
    ``probed2`` = 1 when cell 2 was scored (the measured prune rate)."""
    own_scores = (
        f"array_sort(transform(element_at(__cbh, get(w0.top2, 0).ccl),"
        f" hc -> struct(hc.cc - 2L * aggregate(zip_with({arr_col}, hc.arr,"
        f" (sx, sy) -> sx * sy), 0L, (sa, sz) -> sa + sz) as score,"
        f" hc.scid as scid)))"
    )
    sub2_scores = (
        f"transform(element_at(__cbh, get(w0.top2, 1).ccl),"
        f" hd -> struct(hd.cc - 2L * aggregate(zip_with({arr_col}, hd.arr,"
        f" (tx, ty) -> tx * ty), 0L, (ta, tz) -> ta + tz) as score,"
        f" hd.scid as scid))"
    )
    prune = (
        "(get(w0.top2, 1) is null"
        " or size(element_at(__cbh, get(w0.top2, 1).ccl)) = 0"
        " or (size(w1.own) > 0 and w1.dlb >= get(w0.top2, 1).r"
        "     and (w1.dlb - get(w0.top2, 1).r)"
        "         * (w1.dlb - get(w0.top2, 1).r)"
        f"        > get(w1.own, 0).score + w0.normx + {int(margin_fp)}L))"
    )
    return F.expr(
        f"get(transform(array(struct("
        f"aggregate(zip_with({arr_col}, {arr_col}, (nx, ny) -> nx * ny),"
        f" 0L, (na, nz) -> na + nz) as normx,"
        f"slice(array_sort(transform(__cbc, hg -> struct("
        f"hg.cc - 2L * aggregate(zip_with({arr_col}, hg.arr,"
        f" (hx, hy) -> hx * hy), 0L, (ha, hz) -> ha + hz) as cs,"
        f" hg.ccl as ccl, hg.r as r))), 1, 2) as top2"
        f")), w0 -> "
        f"get(transform(array(struct({own_scores} as own,"
        f" greatest(0L, cast(floor(sqrt(cast("
        f"   get(w0.top2, 1).cs + w0.normx as double))) as bigint) - 1L)"
        f" as dlb)), w1 -> "
        f"get(transform(array(struct("
        f"if({prune}, w1.own,"
        f" array_sort(concat(w1.own, {sub2_scores}))) as pool,"
        f"if({prune}, 0, 1) as probed2)), w2 -> struct("
        f"get(w2.pool, 0) as c1, get(w2.pool, 1) as c2,"
        f" w2.probed2 as probed2)), 0)"
        f"), 0)"
        f"), 0)"
    )


def hier_train(
    emb: DataFrame,
    *,
    coarse_init_ids: list[int],
    sub_k: int,
    coarse_iterations: int = 2,
    sub_iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fp_scale: int = FP_SCALE,
    codebook_as_literals: bool | None = None,
    centroid_index: bool | None = None,
) -> tuple[DataFrame, dict[int, list[int]], dict[int, dict[int, list[int]]]]:
    """Train the two-level structure. Returns (v, coarse_cents, sub)
    where v is the fixed-pointed (vid, a) frame (checkpointed — serve
    passes reuse it), coarse_cents the coarse codebook after
    ``coarse_iterations`` Lloyd rounds, and sub = {ccl: {scid: centroid}}
    the per-cell sub-codebooks after ``sub_iterations - 1`` within-cell
    update rounds (the final assignment round is the caller's serve pass,
    so nprobe=1 serving reproduces the last training assignment exactly).

    Sub-seeding is BY RULE (replayable): the ``sub_k`` lowest vec_ids of
    each coarse cell, labelled by their vec_id — labels stay globally
    unique, like flat k-means'. Sub-centroid updates are the same
    truncated mean with keep-previous-on-empty."""
    v = emb.select(
        F.col(id_col).alias("vid"), _to_fp(vec_col, fp_scale).alias("a")
    ).localCheckpoint(eager=True)
    coarse_assign, coarse_cents = kmeans_train(
        v,
        init_ids=coarse_init_ids,
        iterations=coarse_iterations,
        id_col="vid",
        vec_col="a",
        fp_scale=fp_scale,
        codebook_as_literals=codebook_as_literals,
        centroid_index=centroid_index,
        prescaled=True,
    )
    w = v.join(
        coarse_assign.withColumnRenamed("cluster", "ccl"), "vid"
    ).localCheckpoint(eager=True)
    wnd = Window.partitionBy("ccl").orderBy("vid")
    seed_rows = (
        w.withColumn("rn", F.row_number().over(wnd))
        .where(F.col("rn") <= sub_k)
        .select("ccl", "vid", "a")
        .collect()
    )
    sub: dict[int, dict[int, list[int]]] = {int(c): {} for c in coarse_cents}
    for r in seed_rows:
        sub[int(r["ccl"])][int(r["vid"])] = [int(x) for x in r["a"]]
    spark = emb.sparkSession
    dim = len(next(iter(coarse_cents.values())))
    for _ in range(max(0, sub_iterations - 1)):
        frame = _hier_frame(spark, coarse_cents, sub)
        scl = F.array_min(_hier_own_scores_expr("a"))["scid"]
        assign = w.crossJoin(F.broadcast(frame)).select(
            "vid", "a", scl.alias("scl")
        )
        sums = (
            assign.select("scl", F.posexplode("a").alias("d", "val"))
            .groupBy("scl", "d")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .select(
                "scl",
                "d",
                F.expr("cast(cast(s as double) / n as bigint)").alias("c"),
            )
            .collect()
        )
        new: dict[int, list[int]] = {}
        for r in sums:
            new.setdefault(r["scl"], [0] * dim)
            new[r["scl"]][r["d"]] = r["c"]
        for ccl in sub:
            for scid in sub[ccl]:
                if scid in new:
                    sub[ccl][scid] = new[scid]
    return v, coarse_cents, sub


def kmeans_assign_hier(
    emb: DataFrame,
    *,
    coarse_init_ids: list[int],
    sub_k: int,
    coarse_iterations: int = 2,
    sub_iterations: int = 2,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fp_scale: int = FP_SCALE,
    codebook_as_literals: bool | None = None,
    centroid_index: bool | None = None,
    _prune: bool = True,
) -> DataFrame:
    """(vec_id, cluster) under the hierarchical rule: argmin over the
    union of the vector's ``nprobe`` nearest coarse cells' sub-centroids
    (same integer kernel and tiebreaks as flat k-means; cluster labels
    are sub-seed vec_ids, globally unique). nprobe=1 reproduces the final
    within-cell training assignment bit-for-bit.

    At nprobe=2 the serve kernel reuses the soft path's MARGIN PRUNE at
    margin 0 (``_hier_soft_top2_pruned_expr``): the runner-up cell's
    sub-centroids are scored only when the triangle-inequality radius
    bound cannot certify the own-cell argmin as the union argmin —
    bit-identical output, one-cell scoring cost for the pruned bulk.
    ``_prune=False`` keeps the plain union kernel (parity reference)."""
    v, coarse_cents, sub = hier_train(
        emb,
        coarse_init_ids=coarse_init_ids,
        sub_k=sub_k,
        coarse_iterations=coarse_iterations,
        sub_iterations=sub_iterations,
        id_col=id_col,
        vec_col=vec_col,
        fp_scale=fp_scale,
        codebook_as_literals=codebook_as_literals,
        centroid_index=centroid_index,
    )
    frame = _hier_frame(emb.sparkSession, coarse_cents, sub)
    if nprobe == 2 and _prune:
        # margin 0: the prune certifies exactly "no cell-2 candidate
        # can beat the own-cell argmin" — the hard-assignment condition
        t2 = _hier_soft_top2_pruned_expr("a", 0)
        return v.crossJoin(F.broadcast(frame)).select(
            F.col("vid").alias(id_col),
            t2["c1"]["scid"].alias("cluster"),
        )
    best = F.array_min(_hier_cand_scores_expr("a", nprobe))
    return v.crossJoin(F.broadcast(frame)).select(
        F.col("vid").alias(id_col), best["scid"].alias("cluster")
    )


def kmeans_assign_hier_soft(
    emb: DataFrame,
    *,
    coarse_init_ids: list[int],
    sub_k: int,
    margin: float,
    coarse_iterations: int = 2,
    sub_iterations: int = 2,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fp_scale: int = FP_SCALE,
    codebook_as_literals: bool | None = None,
    centroid_index: bool | None = None,
    _prune: bool = True,
) -> DataFrame:
    """Top-2-within-margin soft assignment under the hierarchical rule:
    rank the nprobe-union candidates, primary = argmin, runner-up kept
    when within ``margin`` (squared-L2 units of the original space, exact
    fixed-point integer comparison — same semantics as
    ``kmeans_assign_soft``). With nprobe >= 2 the pool spans coarse-cell
    boundaries, so this is the cross-cell SemDeDup recall repair.

    At the default nprobe=2 the serve kernel MARGIN-PRUNES the
    runner-up cell (``_hier_soft_top2_pruned_expr``): only vectors
    whose second coarse cell could, by the triangle-inequality bound on
    its recorded sub-centroid radius, still place a candidate inside
    the (primary, within-margin runner-up) window pay the second
    cell's sub-centroid scoring — everyone else scores one cell, the
    ``kmeans_assign_hier`` cost shape. Output is bit-identical to the
    full union (the prune is a certified skip, pinned by
    test_kmeans_index); ``_prune=False`` forces the union kernel (the
    parity reference), and nprobe != 2 always uses it."""
    v, coarse_cents, sub = hier_train(
        emb,
        coarse_init_ids=coarse_init_ids,
        sub_k=sub_k,
        coarse_iterations=coarse_iterations,
        sub_iterations=sub_iterations,
        id_col=id_col,
        vec_col=vec_col,
        fp_scale=fp_scale,
        codebook_as_literals=codebook_as_literals,
        centroid_index=centroid_index,
    )
    margin_fp = int(round(margin * fp_scale * fp_scale))
    frame = _hier_frame(emb.sparkSession, coarse_cents, sub)
    if nprobe == 2 and _prune:
        t2 = _hier_soft_top2_pruned_expr("a", margin_fp)
        top = v.crossJoin(F.broadcast(frame)).select(
            "vid", t2.alias("__t")
        ).select(
            "vid",
            F.col("__t.c1").alias("c1"),
            F.col("__t.c2").alias("c2"),
        )
    else:
        scores = F.array_sort(_hier_cand_scores_expr("a", nprobe))
        top = v.crossJoin(F.broadcast(frame)).select(
            "vid", F.get(scores, 0).alias("c1"), F.get(scores, 1).alias("c2")
        )
    rows = F.filter(
        F.array(
            F.struct(
                F.col("c1.scid").alias("cluster"),
                F.lit(1).alias("is_primary"),
            ),
            F.when(
                F.col("c2").isNotNull()
                & (F.col("c2.score") - F.col("c1.score") <= F.lit(margin_fp)),
                F.struct(
                    F.col("c2.scid").alias("cluster"),
                    F.lit(0).alias("is_primary"),
                ),
            ),
        ),
        lambda s: s.isNotNull(),
    )
    return top.select("vid", F.explode(rows).alias("r")).select(
        F.col("vid").alias(id_col),
        F.col("r.cluster").alias("cluster"),
        F.col("r.is_primary").cast("int").alias("is_primary"),
    )
