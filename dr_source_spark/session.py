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
        # maxPartitionBytes kept at the 128m default. MEASURED AND
        # REJECTED (round 6): a spark.sql.files.minPartitionNum floor of
        # defaultParallelism — the guide §6.1 shape for the single-file
        # local SF tables — was consistently SLOWER on the scan-bound
        # relational queries (sf1, in-session A/B best-of-5: q1 0.92 s vs
        # 0.80 s off, join_region 1.57 vs 1.29, ann 0.71 vs 0.61): split
        # granularity is bounded by the 6 row groups anyway, and 26 empty
        # splits pay per-task footer/open overhead for nothing. A
        # maxPartitionBytes sweep (128m/32m/16m) moved nothing beyond
        # noise for the same reason.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
