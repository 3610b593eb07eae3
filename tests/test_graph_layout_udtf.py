"""Triangle counting on known graphs, range-partitioned write layout
disjointness, and the UDTF lateral plan shape."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from credit_abs_oltp_to_mart_spark.operators.graph_metrics import triangle_count
from credit_abs_oltp_to_mart_spark.sources.writers import write_range_partitioned


def _tc(spark, vertices, edges):
    vdf = spark.createDataFrame([(v,) for v in vertices], "id bigint")
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {
        r["id"]: r["n_triangles"]
        for r in triangle_count(edf, vdf).collect()
    }


def test_triangles_k4_and_path(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert _tc(spark, range(4), k4) == {0: 3, 1: 3, 2: 3, 3: 3}
    path = [(i, i + 1) for i in range(4)]
    assert _tc(spark, range(5), path) == {i: 0 for i in range(5)}


def test_triangles_ignore_duplicates_selfloops_direction(spark):
    edges = [
        (0, 1), (1, 0), (1, 2), (2, 0),  # triangle 0-1-2, with a dup reversed
        (2, 2),                           # self loop dropped
        (3, 0),                           # pendant
    ]
    assert _tc(spark, range(4), edges) == {0: 1, 1: 1, 2: 1, 3: 0}


def test_range_partitioned_write_disjoint_file_ranges(spark, tmp_path):
    import pyarrow.parquet as pq

    path = str(tmp_path / "ranged.parquet")
    df = spark.range(20_000).select(
        F.col("id"), (F.col("id") % 997).alias("k"), F.rand(7).alias("v")
    )
    write_range_partitioned(df, path, "id", n_files=8)
    ranges = []
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        col_idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "id"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) == 8
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"overlapping file ranges {(lo1, hi1)} {(lo2, hi2)}"
    back = spark.read.parquet(path)
    assert back.count() == 20_000


def test_udtf_lateral_is_shuffle_free(spark):
    from credit_abs_oltp_to_mart_spark.operators.udtf_ops import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "a b. c d. "), (2, None)], "doc_id int, text string"
    ).createOrReplaceTempView("__udtf_unit")
    out = spark.sql(
        "select d.doc_id, s.* from __udtf_unit d,"
        " lateral split_sentences(d.text) s"
    )
    rows = {(r["doc_id"], r["sentence_no"]): r["sentence"] for r in out.collect()}
    assert rows == {(1, 1): "a b", (1, 2): "c d"}  # trailing empty skipped
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_zorder_write_prunes_on_both_columns(spark, tmp_path):
    import pyarrow.parquet as pq

    from credit_abs_oltp_to_mart_spark.sources.writers import write_zorder

    path = str(tmp_path / "zordered.parquet")
    n, files = 40_000, 16
    # two independent uniform dimensions — the worst case for single-column
    # range layout (sorting by x leaves y stats at full width)
    df = spark.range(n).select(
        (F.xxhash64("id") % 10_000).alias("x"),
        (F.xxhash64("id", F.lit(1)) % 10_000).alias("y"),
        F.col("id"),
    )
    write_zorder(df, path, ["x", "y"], n_files=files, bits=8)

    def file_ranges(col):
        out = []
        for f in sorted(os.listdir(path)):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            idx = next(
                i for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == col
            )
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            out.append((min(mins), max(maxs)))
        return out

    full_span = 20_000  # values in [-10000, 10000)
    for col in ("x", "y"):
        ranges = file_ranges(col)
        assert len(ranges) == files
        # a uniform random point prunes a file iff it falls outside that
        # file's [min,max]; z-order must keep BOTH columns' expected file
        # width well under the full span (random layout would be ~full)
        avg_width = sum(hi - lo for lo, hi in ranges) / files
        assert avg_width < 0.6 * full_span, (col, avg_width)
    back = spark.read.parquet(path)
    assert back.count() == n
    assert back.columns == ["x", "y", "id"]
