"""SparkSession factory with scale-appropriate defaults.

Defaults are tuned for the sandbox (local[N], 32 cores) but every knob is
what we would set on a 1000-executor cluster: AQE on (runtime re-plan +
skew-join splitting), partition coalescing on, Arrow enabled for the
pandas-UDF detector tiers, and a shuffle-partition count that callers
override per deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dr_source_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    cores = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
    if shuffle_partitions is None:
        # local mode: match core count; on a real cluster callers pass
        # ~2-3x total executor cores.
        shuffle_partitions = 32 if cores == "*" else max(int(cores), 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # pin the session timezone: date_trunc/to_date/hour resolve in
        # session-local time, and the day-densification operators
        # (cusum_changepoint, acf_by_group, seasonal_residual_anomalies)
        # step calendars with fixed 86400s intervals — under a DST
        # timezone the two drift 1h apart mid-range and the dense join
        # zeroes every later bucket. UTC has no DST and matches what an
        # unconfigured DuckDB oracle assumes.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # scan-parallelism floor (guide §6.1): the local SF tables are
        # single parquet files, so with only maxPartitionBytes the busiest
        # scans plan 1-2 tasks on a 32-core master (sf1 lineitem: 2 splits
        # for 6 row groups). A floor of defaultParallelism derives from
        # cluster size — scale-adaptive by construction: at corpus scale
        # natural splits far exceed core count and the floor is a no-op.
        # Split granularity is still bounded by row groups; override via
        # SPARK_GRAFT_MIN_PARTITION_NUM for clusters where even the floor
        # should be pinned (e.g. very wide dynamic-allocation ranges).
        .config(
            "spark.sql.files.minPartitionNum",
            os.environ.get("SPARK_GRAFT_MIN_PARTITION_NUM")
            or ("32" if cores == "*" else str(max(int(cores), 8))),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
