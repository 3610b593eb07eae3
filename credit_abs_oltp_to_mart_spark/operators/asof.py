"""As-of (point-in-time) join — the temporal operator Spark's built-ins
lack.

Credit-domain motivation: "which interest rate was effective on this
installment's due date" (`interest_rate_schedule.effective_from_date`,
reference pg_oltp_synth.py:376-388) is an as-of lookup; so is any
point-in-time feature join in a training pipeline.

Formulation: union-and-carry — tag both inputs, union them, and carry the
most recent right-side payload forward with ``last(ignorenulls)`` over a
(keys, time) window. ONE shuffle on the partition keys, no per-row
subqueries, no cross product; skew follows the key distribution exactly
like any window. This is the scalable shape — a broadcast-range variant
only wins when the right side is tiny.

Tie policy: a right row AT the left timestamp matches (backward-inclusive,
DuckDB/pandas ``ASOF JOIN`` semantics) — the union sorts right rows before
left rows at equal timestamps. Among multiple right rows at the same
(keys, ts) the last by ``right_order`` wins, so pass a tiebreak column for
full determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    payload_cols: list[str] | None = None,
    right_order: str | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join: every ``left`` row gains the payload
    of the latest ``right`` row with the same ``keys`` and
    ``right.ts_col <= left.ts_col``; null payload when no prior right row.

    ``payload_cols`` default to every right column not in keys + ts_col.
    The payload is carried as ONE struct (atomic — all columns always come
    from the same right row). Left columns pass through unchanged.
    """
    if payload_cols is None:
        payload_cols = [
            c for c in right.columns if c not in set(keys) | {ts_col}
        ]
    left_cols = left.columns
    order_expr = F.col(right_order) if right_order else F.lit(0)

    l_tag = left.select(
        *keys,
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.lit(0).cast(
            right.schema[right_order].dataType if right_order else "int"
        ).alias("_ord"),
        F.struct(*left_cols).alias("_l"),
    )
    r_tag = right.select(
        *keys,
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_is_left"),
        order_expr.alias("_ord"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
        F.struct(*payload_cols).alias("_r"),
    )
    l_tag = l_tag.withColumn(
        "_r", F.lit(None).cast(r_tag.schema["_r"].dataType)
    )

    # right rows sort before left rows at equal _ts -> inclusive match;
    # _ord breaks ties among simultaneous right rows deterministically
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_is_left", "_ord")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l_tag.unionByName(r_tag).withColumn(
        "_carry", F.last("_r", ignorenulls=True).over(w)
    )
    return carried.where(F.col("_is_left") == 1).select(
        *[F.col("_l")[c].alias(c) for c in left_cols],
        *[F.col("_carry")[c].alias(c) for c in payload_cols],
    )
