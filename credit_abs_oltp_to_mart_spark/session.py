"""SparkSession factory tuned for the target workload.

Local-mode defaults mirror what we would set on a real cluster: AQE on
(runtime coalesce + skew-join handling), shuffle partitions sized to the
parallelism actually available, Arrow enabled for the pandas-UDF slow paths.
At 100 TB the same code runs with ``spark.sql.shuffle.partitions`` sized to
~2-3x total executor cores and AQE coalescing down; nothing here is
local-only logic.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "credit_abs_oltp_to_mart_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or (int(cpus) if cpus.isdigit() else 32)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Driver testdata stores naive timestamp[us]; read it as plain UTC
        # TIMESTAMP so time functions (unix_micros, window, watermark) apply
        # uniformly whether or not the writer attached a timezone.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # allow custom Python data sources (sources/pysource.py) to accept
        # pushed filters
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
