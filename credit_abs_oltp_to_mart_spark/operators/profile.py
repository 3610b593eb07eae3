"""Table profiling (ANALYZE-style column statistics).

The reference has no profiling surface; its dbt tests assert per-column
facts one query at a time (SURVEY.md §5 — not_null / unique / accepted
_values each scan the table). This operator computes the whole profile —
row count, null count, exact distinct count, min/max — for every requested
column at once, unpivoted to a long (column_name, stat...) table.

Scale design, two parallel passes:

- counts + min/max fold into ONE wide aggregation with map-side partials
  (single scan, 1-row combine — no data shuffles).
- exact distincts deliberately do NOT use Spark's multi-column
  COUNT(DISTINCT): that plans an Expand (xN projections) feeding a GLOBAL
  two-stage distinct aggregate whose final stage is a single reducer —
  every partially-deduped value of every column funnels through one task
  (measured 20+s on 600k x 11 where the rest of the profile takes <1s).
  Instead the table melts to (column_name, value-as-string) pairs and runs
  dedup-then-count as two hash aggregations, both parallel across the
  cluster: the dedup shuffle partitions by (column, value) — no hot
  reducer — and the per-column count is a tiny map-side-combined agg.
- ``exact_distinct=False`` swaps in approx_count_distinct (HLL++) inside
  the wide agg: one scan total, no melt — the 100 TB default.

The string cast in the melt is injectivity-safe per type (distinct values
-> distinct strings); float/double negative zero is normalized first since
SQL DISTINCT treats -0.0 = 0.0 but their strings differ.

Type handling keeps the output schema fixed and engine-portable: min/max
land in ``min_num``/``max_num`` (double) for numeric columns, in
``min_str``/``max_str`` for strings (binary collation compare in both
engines), and timestamps land in ``*_num`` as floored epoch seconds
(double formatting of timestamps differs across engines; epoch longs
don't).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.functions.parallelism import ensure_parallelism

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    *,
    exact_distinct: bool = True,
) -> DataFrame:
    """Long-format profile: one row per column.

    Output: ``column_name``, ``n_rows``, ``n_nulls``, ``n_distinct``,
    ``min_num``, ``max_num`` (double; null for strings), ``min_str``,
    ``max_str`` (null for non-strings).
    """
    dtypes = dict(df.dtypes)
    cols = list(columns) if columns is not None else list(df.columns)
    # row-group count caps scan parallelism on small files; both passes
    # (the ~4N-aggregate wide fold and the xN melt explode) are CPU-bound,
    # so spread them over cores (no-op at scale — see ensure_parallelism).
    df = ensure_parallelism(df)

    def num(c: str) -> Column | None:
        t = dtypes[c]
        if t in _NUMERIC or t.startswith("decimal"):
            return F.col(c).cast("double")
        if t in ("timestamp", "timestamp_ntz"):
            return F.floor(F.unix_timestamp(F.col(c))).cast("double")
        if t == "date":
            return F.datediff(F.col(c), F.lit("1970-01-01")).cast("double")
        return None

    def melt_value(c: str) -> Column:
        v = F.col(c)
        if dtypes[c] in ("float", "double"):
            v = F.when(v == 0.0, F.lit(0.0)).otherwise(v)  # -0.0 -> 0.0
        return v.cast("string")

    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__cnt_{c}"))
        if not exact_distinct:
            aggs.append(
                F.approx_count_distinct(F.col(c)).alias(f"__nd_{c}")
            )
        n = num(c)
        if n is not None:
            aggs.append(F.min(n).alias(f"__min_{c}"))
            aggs.append(F.max(n).alias(f"__max_{c}"))
        else:
            aggs.append(F.min(F.col(c).cast("string")).alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c).cast("string")).alias(f"__max_{c}"))
    wide = df.agg(*aggs)

    rows = []
    for c in cols:
        is_num = num(c) is not None
        nd = (
            F.col(f"__nd_{c}").cast("long")
            if not exact_distinct
            else F.lit(None).cast("long")
        )
        rows.append(
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n_rows").alias("n_rows"),
                (F.col("n_rows") - F.col(f"__cnt_{c}")).alias("n_nulls"),
                nd.alias("n_distinct"),
                (F.col(f"__min_{c}") if is_num else F.lit(None).cast("double")).alias("min_num"),
                (F.col(f"__max_{c}") if is_num else F.lit(None).cast("double")).alias("max_num"),
                (F.lit(None).cast("string") if is_num else F.col(f"__min_{c}")).alias("min_str"),
                (F.lit(None).cast("string") if is_num else F.col(f"__max_{c}")).alias("max_str"),
            )
        )
    long = wide.select(F.inline(F.array(*rows)))
    if not exact_distinct:
        return long

    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        melt_value(c).alias("__v"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.*")
    nd = (
        pairs.where(F.col("__v").isNotNull())
        .groupBy("column_name", "__v")
        .agg(F.lit(1))
        .groupBy("column_name")
        .agg(F.count(F.lit(1)).alias("__nd"))
    )
    return (
        long.drop("n_distinct")
        .join(F.broadcast(nd), "column_name", "left")
        .select(
            "column_name",
            "n_rows",
            "n_nulls",
            F.coalesce(F.col("__nd"), F.lit(0)).alias("n_distinct"),
            "min_num",
            "max_num",
            "min_str",
            "max_str",
        )
    )
