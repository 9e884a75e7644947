"""Thin table-catalog abstraction (SURVEY.md §7): Iceberg `writeTo` when a
catalog is configured on the session, partitioned-parquet layout otherwise
(same schemas, so a later Iceberg migration is a pure relocation).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        return bool(spark.conf.get("spark.sql.catalog.spark_catalog", None)) or any(
            k.startswith("spark.sql.catalog.") for k, _v in spark.sparkContext.getConf().getAll()
        )
    except Exception:
        return False


def write_table(
    df: DataFrame,
    location: str,
    mode: str = "append",
    partition_by: Optional[Sequence[str]] = None,
    fmt: Optional[str] = None,
) -> None:
    """location: an Iceberg table name (`cat.db.tbl`, no '/') or a path."""
    is_table_name = "/" not in location
    if fmt == "iceberg" or (fmt is None and is_table_name):
        writer = df.writeTo(location)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(location)


def read_table(spark: SparkSession, location: str, fmt: Optional[str] = None) -> DataFrame:
    if fmt == "iceberg" or (fmt is None and "/" not in location):
        return spark.read.format("iceberg").load(location)
    return spark.read.parquet(location)
