"""As-of join — the time-series enrichment operator Spark's DataFrame API
lacks (cited as a canonical "custom operator" gap; Pandas has
merge_asof, DuckDB has ASOF JOIN, kdb has aj).

For every left row, attach the LATEST right row of the same key whose
timestamp is <= the left timestamp (inclusive — a right row at exactly
the left ts matches).

The naive formulation — a range join (l.key = r.key AND r.ts <= l.ts)
plus a per-left-row argmax — explodes to |matching-range| intermediate
rows and plans a broadcast-nested-loop without an equi-bound. This
implementation is the MERGE-CARRY shape every MPP engine uses instead:

  1. union both sides tagged (right = 0, left = 1), right's payload
     columns nulled on the left side;
  2. one window per key ordered by (ts, tag): ``last(payload,
     ignorenulls=True)`` over unbounded-preceding rows carries the most
     recent right payload forward — at equal ts the right row sorts
     first, giving inclusive semantics;
  3. keep the left rows.

Cost: ONE shuffle of (key, ts, payload) — no range join, no explosion;
window partitions are per-key and ordered, exactly the sortWithinPartitions
shape AQE handles. Determinism requires the right side be unique per
(key, ts) — callers pre-aggregate duplicates (the driver query takes
max(value)); with duplicates, "latest" at one timestamp is undefined in
ANY engine's as-of semantics.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    payload: Sequence[str] = ("value",),
) -> DataFrame:
    """Left as-of join: left's columns plus, for each payload column P,
    ``asof_P`` = P of the latest right row with right.ts <= left.ts for
    the same ``by`` key (NULL when no prior right row exists), plus
    ``asof_ts`` = that row's timestamp."""
    lcols = left.columns
    l = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[ts].dataType).alias("_r_ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in payload],
    )
    r = right.select(
        F.col(by),
        F.col(ts),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in (by, ts)],
        F.lit(0).alias("_side"),
        F.col(ts).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in payload],
    ).select(*l.columns)  # align column order
    merged = l.unionByName(r)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.select(
        *lcols,
        "_side",
        F.last("_r_ts", ignorenulls=True).over(w).alias("asof_ts"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in payload
        ],
    )
    return carried.filter(F.col("_side") == 1).drop("_side")
