"""Temporal operators: interval (range) join, hypertable rollup, SCD2.

These extend the reference's mart surface (reference has only equi-joins +
window functions; see SURVEY.md §2.4/§2.6) with the three time-centric
operators a large event lake needs:

- ``interval_join`` — join points to [start, end) intervals with NO equi
  key. Naively this is a cross join; the scale path is time bucketing:
  replicate each interval onto the fixed-width buckets it overlaps, hash
  join points on their single bucket, then apply the exact range predicate.
  Shuffle volume is O(points + intervals * avg_buckets_per_interval), not
  O(points * intervals), and both sides co-partition on the bucket key.
  Each (point, interval) pair meets in exactly one bucket (the point's),
  so no post-join dedup is needed.

- ``hypertable_rollup`` — multi-resolution continuous aggregates
  (TimescaleDB hypertable / materialized-rollup pattern): the finest
  resolution aggregates the raw events, each coarser resolution aggregates
  the next-finer PARTIALS, so the coarser levels shuffle only
  already-aggregated rows. The union's logical plan repeats the shared
  prefix per level (plans are trees), but Spark's exchange reuse
  deduplicates the identical shuffle subtrees at runtime (ReusedExchange),
  so raw is scanned once; pass ``materialize=True`` to instead eagerly
  ``localCheckpoint`` each level — guaranteed once-per-level computation
  and what a production deployment does anyway (each rollup level persists
  as its own table that incremental refresh appends to). Requires each
  resolution to divide the next (buckets nest). Sums stay decimal through
  every level (exact, order-independent) and only the final projection
  casts to double.

- ``scd2_from_changelog`` — type-2 slowly-changing dimension from an
  append-only change log: collapse consecutive runs of equal attribute
  values per key (gaps-and-islands via lag + running count — two window
  passes over ONE hash-partitioning on the key, no joins), emit
  valid_from / valid_to / version / is_current.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bucket_seconds: int = 900,
) -> DataFrame:
    """Rows of ``points`` × ``intervals`` where ``start <= ts < end``.

    Result columns: all of ``points`` plus all of ``intervals`` (caller
    must pre-rename collisions). ``bucket_seconds`` is the deploy-time
    knob: set it near the median interval length so each interval lands
    on ~2 buckets; too small replicates intervals, too large degrades to
    a per-bucket cross join. Works for any interval length — long
    intervals just replicate onto more buckets.
    """
    p_sec = F.floor(F.unix_timestamp(F.col(point_ts)))
    s_sec = F.floor(F.unix_timestamp(F.col(start)))
    e_sec = F.floor(F.unix_timestamp(F.col(end)))
    p = points.withColumn("__bucket", F.floor(p_sec / bucket_seconds))
    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(s_sec / bucket_seconds), F.floor(e_sec / bucket_seconds)
            )
        ),
    )
    return (
        p.join(i, "__bucket")
        .where(
            (F.col(point_ts) >= F.col(start)) & (F.col(point_ts) < F.col(end))
        )
        .drop("__bucket")
    )


def hypertable_rollup(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    dims: Sequence[str] = (),
    measure: str = "value",
    measure_decimal: str = "decimal(18,2)",
    resolutions: Sequence[int] = (3600, 86400, 604800),
    materialize: bool = False,
) -> DataFrame:
    """Union of per-resolution aggregates, each built from the previous.

    Output: ``resolution_s`` (int), ``bucket_start`` (timestamp), *dims,
    ``n_events`` (long), ``sum_<measure>`` (double). Buckets are
    epoch-aligned: ``floor(epoch / W) * W``.
    """
    res = list(resolutions)
    if not res:
        raise ValueError("need at least one resolution")
    for fine, coarse in zip(res, res[1:]):
        if coarse % fine != 0:
            raise ValueError(
                f"resolutions must nest: {coarse} not a multiple of {fine}"
            )

    def bucket(col: Column, width: int) -> Column:
        return (F.floor(col / width) * width).cast("long")

    sum_name = f"sum_{measure}"
    sec = F.floor(F.unix_timestamp(F.col(ts_col)))
    level = df.groupBy(
        bucket(sec, res[0]).alias("__b"), *dims
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(measure).cast(measure_decimal)).alias("__sum"),
    )
    out = []
    for i, width in enumerate(res):
        if i > 0:
            level = level.groupBy(
                bucket(F.col("__b"), width).alias("__b"), *dims
            ).agg(
                F.sum("n_events").alias("n_events"),
                F.sum("__sum").alias("__sum"),
            )
        if materialize:
            level = level.localCheckpoint(eager=True)
        out.append(
            level.select(
                F.lit(width).alias("resolution_s"),
                F.timestamp_seconds(F.col("__b")).alias("bucket_start"),
                *dims,
                "n_events",
                F.col("__sum").cast("double").alias(sum_name),
            )
        )
    result = out[0]
    for part in out[1:]:
        result = result.unionByName(part)
    return result


def scd2_from_changelog(
    log: DataFrame,
    *,
    key: str,
    attr: str,
    ts_col: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Type-2 dimension rows from an append-only change log.

    One row per run of consecutive equal ``attr`` values per ``key``:
    ``valid_from`` (first ts of the run), ``valid_to`` (start of the next
    run, null for the current one), ``version`` (1-based run ordinal),
    ``n_changes`` (rows in the run), ``is_current``. ``tiebreak`` must
    make the ordering total when ``ts_col`` has duplicates.
    """
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    # windows can't nest: materialize the change flag, then running-sum it
    # (same partition+order, so Catalyst plans one shuffle + one sort)
    flag = F.when(
        F.lag(attr).over(w).isNull() | (F.lag(attr).over(w) != F.col(attr)),
        1,
    ).otherwise(0)
    keep = [key, attr, ts_col] + ([tiebreak] if tiebreak else [])
    runs = (
        log.select(*keep)
        .withColumn("__flag", flag)
        .withColumn("__island", F.sum("__flag").over(w))
        .groupBy(key, "__island", attr)
        .agg(
            F.min(ts_col).alias("valid_from"),
            F.count(F.lit(1)).alias("n_changes"),
        )
    )
    wk = Window.partitionBy(key).orderBy("__island")
    return runs.select(
        key,
        attr,
        "valid_from",
        F.lead("valid_from").over(wk).alias("valid_to"),
        F.col("__island").alias("version"),
        "n_changes",
        F.lead("valid_from").over(wk).isNull().alias("is_current"),
    )


def ewma_smooth(
    df: DataFrame,
    *,
    key: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.5,
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-key exponentially-weighted moving average (recursive smoothing).

    s_0 = x_0; s_i = (1-alpha)*s_{i-1} + alpha*x_i over rows ordered by
    (``ts_col``, ``tiebreak``). The recurrence is inherently sequential
    per key — no built-in window frame expresses it for unbounded series —
    but per-GROUP pandas calls (applyInPandas) pay dispatch per key, which
    dominates when keys are small. Instead: one shuffle to co-locate keys,
    an in-partition sort, then ``mapInPandas`` runs pandas'
    ``groupby().ewm()`` C kernel over EVERY key in the partition at once.
    Arrow hands mapInPandas a partition as a sequence of record batches, a
    key can straddle two batches, so each batch seeds continuing keys by
    prepending the key's last smoothed value as a synthetic observation —
    with adjust=False the recurrence then continues bit-exactly — and
    drops it after. The arithmetic is IEEE double in deterministic order,
    so an engine that can recurse (SQL WITH RECURSIVE) reproduces it
    bit-for-bit.
    """
    order = [ts_col] + ([tiebreak] if tiebreak else [])
    cols = [key, *order, value_col]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*cols).schema.fields
    ) + ", ewma double"

    def _smooth_partition(batches):
        import pandas as pd

        carry: dict = {}  # key -> last smoothed value (continues recurrence)
        for pdf in batches:
            if pdf.empty:
                continue
            # seed rows for keys continuing from the previous record batch:
            # sorted input keeps a straddling key's rows at the batch head,
            # and groupby(sort=False) keeps them grouped with their seed
            seed_keys = [k for k in pdf[key].unique() if k in carry]
            if seed_keys:
                seeds = pd.DataFrame(
                    {key: seed_keys, value_col: [carry[k] for k in seed_keys]}
                )
                work = pd.concat([seeds, pdf], ignore_index=True)
                work = work.sort_values(
                    [key], kind="stable", ignore_index=True
                )
            else:
                seeds = None
                work = pdf.reset_index(drop=True)
            grouped = work.groupby(key, sort=False)
            # cython grouped online kernel: every key in the batch at once
            sm = grouped[value_col].ewm(alpha=alpha, adjust=False).mean()
            work = work.assign(ewma=sm.reset_index(drop=True).values)
            if seeds is not None:
                work = work[work[order[0]].notna()].reset_index(drop=True)
            carry.update(
                work.groupby(key, sort=False)["ewma"].last().to_dict()
            )
            yield work[[*cols, "ewma"]]

    return (
        df.select(*cols)
        .repartition(key)
        .sortWithinPartitions(key, *order)
        .mapInPandas(_smooth_partition, out_schema)
    )
