"""Exponentially-decayed aggregates with exact bit-shift arithmetic.

Recency weighting — "recent activity counts more" — normally means
float ``pow(alpha, age)``, which no two engines round identically. With
the half-life fixed at ONE STEP (alpha = 1/2), the decayed sum has an
exact integer form both Spark and DuckDB reproduce bit-for-bit:

    decayed_c = sum over events i of (value_c >> (n - i))

where i is the event's 1-based rank in (order, tie-break) order and n
is the group's event count: the latest event contributes its full
cents, the one before half (floored), then a quarter, and so on. The
per-row floor makes the result deterministic and order-stable — the
float formulation's sum order sensitivity is gone.

Shape at scale: one shuffle on the group key; the rank and count ride
the same window partition, so the whole operator is a single exchange
(the same one-exchange guarantee session_stats carries). No joins, no
UDFs. Shifts clamp at 62: any positive cents value shifted 62 is
already 0, and clamping keeps both engines inside defined shift
semantics (Java's ``>>`` would otherwise wrap at 64).

Used for freshness-weighted sampling and "decayed engagement" features
in training-data pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def decayed_sum(
    df: DataFrame,
    group_col: str,
    order_cols: list[str | Column],
    value_cents: Column,
) -> DataFrame:
    """Per-group half-life-per-step decayed sum of non-negative integer
    cents, plus the group's event count and the undecayed total.

    ``order_cols`` must be a deterministic total order within the group
    (include a unique tie-break key)."""
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    ranked = df.select(
        group_col,
        value_cents.alias("_vc"),
        F.row_number().over(w).alias("_i"),
        F.count("*").over(
            Window.partitionBy(group_col).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_n"),
    )
    # pyspark's shiftright() helper takes a literal int; the SQL form
    # accepts a column shift amount
    shifted = F.expr("shiftright(_vc, CAST(least(_n - _i, 62) AS INT))")
    return ranked.groupBy(group_col).agg(
        F.max("_n").cast("long").alias("n_events"),
        F.sum("_vc").cast("long").alias("total_c"),
        F.sum(shifted).cast("long").alias("decayed_c"),
    )
