"""Time-series gap filling: dense per-key spine + LOCF interpolation.

The reference's marts only aggregate months that HAVE data (a month with
no arrears rows simply doesn't appear — see fct_npl_monthly); real
reporting needs dense series. This operator builds the dense per-key
bucket spine and fills gaps: counts become 0, values carry forward
(last-observation-carried-forward).

Scale shape: the spine is generated per key from that key's own
[min, max] bucket range — ``sequence()`` + ``explode`` inside the key's
partition, never a global calendar cross join (a global spine × keys
cross product is the naive shape that dies at 100 TB; per-key ranges also
avoid generating spine for a key's inactive years). One hash shuffle on
the key feeds the range agg, the spine join, and the LOCF window alike.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_locf(
    df: DataFrame,
    *,
    key: str,
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_seconds: int = 86400,
    value_decimal: str = "decimal(18,2)",
) -> DataFrame:
    """Dense (key, bucket) series with zero-filled counts and LOCF values.

    Output: *key*, ``bucket`` (long: epoch-seconds div bucket_seconds),
    ``n_events`` (long, 0 on gap rows), ``locf_value`` (double: this
    bucket's exact-decimal sum, or the most recent bucket's when absent),
    ``is_gap`` (boolean).
    """
    sec = F.floor(F.unix_timestamp(F.col(ts_col)))
    actual = df.groupBy(
        F.col(key), (sec / bucket_seconds).cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast(value_decimal)).alias("__s"),
    )
    spine = (
        actual.groupBy(key)
        .agg(F.min("bucket").alias("__mn"), F.max("bucket").alias("__mx"))
        .select(key, F.explode(F.sequence("__mn", "__mx")).alias("bucket"))
    )
    w = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(actual, [key, "bucket"], "left")
        .select(
            key,
            "bucket",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("__s", ignorenulls=True).over(w).cast("double").alias(
                "locf_value"
            ),
            F.col("n_events").isNull().alias("is_gap"),
        )
    )
