"""2-D Pareto frontier (skyline) as aggregates + one tiny window.

"Which parts are cost/size Pareto-optimal", "which configs trade off
latency/quality optimally" — the skyline operator. The textbook
relational statement is a NOT EXISTS dominance anti-join, which is a
NON-equi self-join: at corpus scale that plans a broadcast nested loop
or a cartesian product, the classic skyline scale killer.

For two dimensions there is an exact shuffle-light form:

1. Collapse to one row per distinct x: ``max(y) per x`` — any row not
   achieving its x's best y is dominated at equal x (one hash shuffle
   on x, map-side combined).
2. Over the DISTINCT x values ordered ascending, a row survives iff its
   best-y strictly exceeds the running max best-y of all strictly
   smaller x (lag-window prefix max). The window runs over distinct x
   only — a SinglePartition exchange above an aggregate, the same
   bounded shape the equi-depth histogram and bucket-totals windows
   use, NOT over the raw table. (If distinct x itself is huge,
   bucketize x first — ``operators/prefix.py`` shows the two-level
   pattern — at the cost of a conservative pre-prune round.)
3. Join the surviving (x, best_y) pairs back (broadcast: the frontier
   of n distinct x values has at most n points, and real frontiers are
   tiny) to recover every row sitting exactly ON the frontier — two
   rows with identical (x, y) don't strictly dominate each other, so
   both are frontier members.

Dominance is STRICT-Pareto: a dominates b iff a.x <= b.x and
a.y >= b.y with at least one strict — exactly the NOT EXISTS the
DuckDB oracle runs. x minimized, y maximized; flip signs to change
direction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier_2d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Rows of ``df`` on the (minimize x, maximize y) Pareto frontier.

    Exact under strict-Pareto dominance; x and y must be exactly
    comparable types (integers / exact decimals — floor floats to cents
    first, as every exact operator in this package does).
    """
    best = df.groupBy(F.col(x_col).alias("_x")).agg(
        F.max(F.col(y_col)).alias("_besty")
    )
    w = Window.orderBy(F.col("_x").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier_keys = (
        best.withColumn("_prev", F.max("_besty").over(w))
        .filter(F.col("_prev").isNull() | (F.col("_besty") > F.col("_prev")))
        .select("_x", "_besty")
    )
    return df.join(
        F.broadcast(frontier_keys),
        (df[x_col] == F.col("_x")) & (df[y_col] == F.col("_besty")),
    ).drop("_x", "_besty")
