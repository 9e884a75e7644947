"""Distributed global prefix sum — the scale-safe replacement for
``sum() OVER (ORDER BY ...)``.

An un-partitioned ordered window is a single-partition exchange: every row
of a 100 TB input funnels through ONE task. The classic fix (used by every
MPP engine for running totals) is a two-level decomposition:

  1. bucket rows by RANGE of the order key (integer-arithmetic bucket ids,
     deterministic under retries — no ``spark_partition_id()``, which can
     change when lineage recomputes);
  2. a per-bucket ordered window computes local running sums — one
     narrow-key shuffle, parallelism = bucket count;
  3. bucket TOTALS (``n_buckets`` rows, bytes) get an exclusive prefix via
     the only single-partition window in the plan — over the tiny
     aggregate, never the data;
  4. broadcast-join the bucket offsets back and add.

Bucket widths are uniform over the KEY RANGE, not the row distribution:
clustered/sparse keys skew the buckets (documented trade-off for
determinism; a production corpus with pathological id clustering should
pre-normalize ids or raise ``n_buckets``).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "prefix_excl",
    n_buckets: Optional[int] = None,
) -> DataFrame:
    """Append ``out_col`` = EXCLUSIVE prefix sum of ``value_col`` in
    ``order_col`` order (the sum of all strictly-preceding rows; 0 for the
    first). ``order_col`` must be integral and unique; ``df`` should
    already be projected narrow — every column rides the bucket shuffle.

    A NULL ``order_col`` is a contract violation that would otherwise be
    SILENT row loss (the NULL bucket never matches the offsets join), so
    it fails fast — the check rides the min/max aggregate job for free.

    Cost: one min/max aggregate job (narrow), one hash shuffle of the
    input by bucket, one tiny single-partition window over ``n_buckets``
    totals, one broadcast join. No full-data single-partition exchange at
    any width (gated by tests/test_plans.py).
    """
    spark = df.sparkSession
    nb = n_buckets or spark.sparkContext.defaultParallelism * 4
    lo, hi, n_null = df.agg(
        F.min(order_col),
        F.max(order_col),
        F.count(F.when(F.col(order_col).isNull(), 1)),
    ).first()
    if n_null:
        raise ValueError(
            f"global_prefix_sum: {n_null} rows have NULL {order_col!r} — "
            f"they would silently vanish in the bucket-offset join. Filter "
            f"or key them upstream (see equidepth_histogram's explicit "
            f"NULL handling)."
        )
    if lo is None:  # empty input
        return df.withColumn(out_col, F.lit(0).cast("long"))
    span = int(hi) - int(lo) + 1
    width = max(1, (span + nb - 1) // nb)
    bucket = F.expr(f"({order_col} - {int(lo)}) div {width}")

    wb = Window.partitionBy("_b").orderBy(order_col)
    local = df.withColumn("_b", bucket).withColumn(
        "_local_incl", F.sum(F.col(value_col).cast("long")).over(wb)
    )
    totals = local.groupBy("_b").agg(F.sum(F.col(value_col).cast("long")).alias("_t"))
    # exclusive prefix over the bucket totals: n_buckets rows — the ONLY
    # unpartitioned window, and it never sees the data
    wo = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_t").over(wo), F.lit(0))
    ).select("_b", "_off")
    return (
        local.join(F.broadcast(offsets), "_b")
        .withColumn(
            out_col,
            (F.col("_off") + F.col("_local_incl") - F.col(value_col)).cast("long"),
        )
        .drop("_b", "_local_incl", "_off")
    )
