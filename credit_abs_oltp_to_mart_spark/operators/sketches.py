"""Distinct-count sketches: KMV (k-minimum-values).

The reference computes distinct counts exactly (COUNT(DISTINCT ...) in the
mart SQL; SURVEY.md §2.5 A5). Exact distinct shuffles every distinct key —
at 100 TB that is the dominant cost of a cardinality profile. KMV
(Bar-Yossef et al., "Counting distinct elements in a data stream",
RANDOM'02) is the sketch whose estimate is a pure function of the hash
values, so — unlike HyperLogLog register layouts, which vary by
implementation — the SAME estimate is reproducible in any engine that can
hash and sort: keep the k smallest distinct hashes h_1 < ... < h_k of the
keys under a uniform hash onto [0, M); then E[distinct] ~= (k-1) * M / h_k.

Scale shape: the dedup groupBy gets Spark's map-side partial hash
aggregation (each partition emits its local distinct hashes once), and
the subsequent per-group top-k window reduces every group to k rows, so
downstream stages carry O(k * groups). The shuffle itself still moves the
per-partition-distinct hash set — the fully-sketched path (O(k) per
partition on the wire) needs a custom JVM Aggregator (e.g. Apache
DataSketches' ItemsSketch); this implementation deliberately stays
declarative so the estimate is bit-reproducible in the DuckDB oracle,
and the hash dedup is no more traffic than the exact COUNT(DISTINCT)
it replaces.

Determinism (the oracle gate): the hash is the md5-prefix bigint from
[[oracle-portability-rules]] — conv(substr(md5(x),1,15),16,10) — which
DuckDB reproduces exactly; rounding is half-away-from-zero via the
floor(x*1e6+0.5) trick (positive domain), identical in both engines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# hash domain: 15 hex digits = 60 bits
_M = float(16**15)


def bitmap_exact_distinct(
    df: DataFrame,
    *,
    key: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """EXACT distinct ``key`` count per group via fixed-width bitmaps.

    The scalable alternative to ``COUNT(DISTINCT key)`` when the sketch
    estimate (``kmv_distinct``) isn't acceptable: keys are mapped to
    (bucket, bit) pairs — 32768 bits per bucket — and each
    (group, bucket) partition ORs its bits into one bitmap with map-side
    partial aggregation. The shuffle then carries at most one 4 KB bitmap
    per (group, bucket, map task) instead of every distinct key, and the
    final count is the sum of disjoint buckets' popcounts. Requires a
    non-negative integral key (ids here satisfy that).
    """
    g = list(group_cols)
    per_bucket = (
        df.select(*g, F.col(key).alias("__k"))
        .groupBy(*g, F.bitmap_bucket_number("__k").alias("__bucket"))
        .agg(F.bitmap_construct_agg(F.bitmap_bit_position("__k")).alias("__bm"))
    )
    return per_bucket.groupBy(*g).agg(
        F.sum(F.bitmap_count("__bm")).alias("n_distinct")
    )


def kmv_distinct(
    df: DataFrame,
    *,
    key: str,
    group_cols: Sequence[str] = (),
    k: int = 64,
) -> DataFrame:
    """Estimated distinct ``key`` count per ``group_cols`` group.

    Output: *group_cols, ``n_hashes`` (long, = min(k, true distinct)),
    ``est_distinct`` (double, exact when the group has < k distinct keys,
    else the KMV estimate rounded to 6 dp).
    """
    g = list(group_cols)
    h = F.conv(
        F.substring(F.md5(F.col(key).cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    hashes = df.select(*g, h.alias("__h")).groupBy(*g, "__h").agg(F.lit(1))
    w = Window.partitionBy(*g).orderBy(F.col("__h").asc())
    topk = hashes.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") <= k
    )
    est_raw = (k - 1) * F.lit(_M) / F.col("__hk").cast("double")
    est = F.floor(est_raw * 1e6 + F.lit(0.5)) / 1e6  # half-up, positive
    return (
        topk.groupBy(*g)
        .agg(
            F.count(F.lit(1)).alias("n_hashes"),
            F.max("__h").alias("__hk"),
        )
        .select(
            *g,
            "n_hashes",
            F.when(F.col("n_hashes") < k, F.col("n_hashes").cast("double"))
            .otherwise(est)
            .alias("est_distinct"),
        )
    )
