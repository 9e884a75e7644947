"""Exact-arithmetic statistical profiling operators.

A 100 TB curation pipeline audits its corpus with statistics — robust
center/spread per group, feature covariance, concentration (inequality)
of the size distribution — and those audits must be REPRODUCIBLE: the
same number on every engine, every retry, every backfill. Floating
aggregates don't give that (summation order changes the low bits), so
every operator here is integer/decimal-exact:

* ``mad_profile`` — median / median-absolute-deviation via explicit
  ORDER-STATISTIC selection (row_number against the partition count),
  not percentile interpolation. The lower median with a unique-key
  tie-break is the same row on any engine; ``3 * MAD`` outlier flags
  follow by pure integer comparison.
* ``cov_pairs`` — the exact pairwise sample-covariance numerator
  ``n·Σxy − Σx·Σy`` in DECIMAL(38,0) (sums of cent-scaled products
  overflow int64 past ~1e18; decimal38 carries to ~1e38, enough for
  10^12 rows of cent² products), truncated toward zero on division so
  both engines agree on negative covariances (DuckDB ``//`` floors,
  Java ``div`` truncates — sign is factored out explicitly).
* ``gini_by_group`` — the Gini coefficient from the closed form over
  ascending ranks, ``G = (2·Σ r·x − (n+1)·Σx) / (n·Σx)``, in exact
  basis points. Rank ties broken by the row key so a duplicated size
  cannot make the coefficient nondeterministic.

Scale shape: every operator is one narrow-column shuffle per grouped
pass — ``mad_profile`` two sort-window passes over (group, value),
``cov_pairs`` a single global aggregate (map-side partials, one row
out), ``gini_by_group`` one window pass. No UDFs, no collects.

Reference: the reference engine has no statistics surface (findings go
straight to a SQLite store, dr_source/core/db.py); these are the audit
operators its output table would need at lake scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_D38 = "decimal(38,0)"


def mad_profile(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    k: int = 3,
) -> DataFrame:
    """Per-group robust profile: lower median, MAD, and |x−med| > k·MAD
    outlier count, all on integer values.

    The lower median is the row at ``row_number == (n+1) div 2`` under
    ``ORDER BY (value, id)`` — an exact order statistic both engines
    select identically (percentile functions interpolate differently
    between engines for even n). MAD repeats the same selection on the
    absolute deviations.
    """
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("long").alias("v"),
        F.col(id_col).alias("rid"),
    )
    w = Window.partitionBy("grp").orderBy(F.asc("v"), F.asc("rid"))
    ranked = base.select(
        "grp", "v", "rid",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy("grp")).alias("_n"),
    )
    med = (
        ranked.filter(F.col("_rn") == F.expr("(_n + 1) div 2"))
        .select("grp", F.col("v").alias("med_v"))
    )
    dev = ranked.join(F.broadcast(med), "grp").select(
        "grp", "v", "rid", "_n", F.abs(F.col("v") - F.col("med_v")).alias("dv"),
        "med_v",
    )
    w2 = Window.partitionBy("grp").orderBy(F.asc("dv"), F.asc("rid"))
    dev_ranked = dev.withColumn("_rn2", F.row_number().over(w2))
    mad = (
        dev_ranked.filter(F.col("_rn2") == F.expr("(_n + 1) div 2"))
        .select("grp", F.col("dv").alias("mad_v"))
    )
    return (
        dev.join(F.broadcast(mad), "grp")
        .groupBy("grp")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.first("med_v").cast("long").alias("med_v"),
            F.first("mad_v").cast("long").alias("mad_v"),
            F.sum(
                (F.col("dv") > F.lit(int(k)) * F.col("mad_v")).cast("long")
            ).cast("long").alias("n_outliers"),
            F.max("dv").cast("long").alias("max_abs_dev"),
        )
    )


def cov_pairs(df: DataFrame, metrics: dict[str, "F.Column"]) -> DataFrame:
    """Exact pairwise sample covariance over integer-scaled metrics.

    One global aggregate computes Σx per metric and Σxy per ordered
    pair (x ≤ y lexicographically) plus the common row count; the
    covariance ``(n·Σxy − Σx·Σy) / (n·(n−1))`` is then evaluated on the
    single result row in DECIMAL(38,0) and truncated toward zero with
    the sign factored out, so engines with floor-division semantics
    (DuckDB ``//``) and trunc-division semantics (Spark ``div``) emit
    the same integer. Diagonal pairs are the exact sample variances.

    Output: (var_x, var_y, n, cov) — cov in the product of the two
    metrics' integer units (e.g. cent² for price×price).
    """
    names = sorted(metrics)
    aggs = [F.count(F.lit(1)).cast(_D38).alias("_n")]
    for nm in names:
        aggs.append(F.sum(metrics[nm].cast(_D38)).alias(f"_s_{nm}"))
    for i, a in enumerate(names):
        for b in names[i:]:
            aggs.append(
                F.sum((metrics[a].cast(_D38) * metrics[b].cast(_D38))).alias(f"_p_{a}_{b}")
            )
    row = df.agg(*aggs)
    pair_structs = [
        F.struct(
            F.lit(a).alias("var_x"),
            F.lit(b).alias("var_y"),
            (
                F.col("_n") * F.col(f"_p_{a}_{b}") - F.col(f"_s_{a}") * F.col(f"_s_{b}")
            ).alias("num"),
        )
        for i, a in enumerate(names)
        for b in names[i:]
    ]
    den = (F.col("_n") * (F.col("_n") - F.lit(1).cast(_D38))).alias("_den")
    exploded = row.select(den, F.explode(F.array(*pair_structs)).alias("p"))
    num = F.col("p.num")
    sign = F.when(num < 0, F.lit(-1)).otherwise(F.lit(1)).cast("long")
    return exploded.select(
        F.col("p.var_x").alias("var_x"),
        F.col("p.var_y").alias("var_y"),
        (sign * F.expr("abs(p.num) div _den").cast("long")).cast("long").alias("cov"),
    )


def gini_by_group(
    df: DataFrame, group_col: str, size_col: str, id_col: str
) -> DataFrame:
    """Per-group Gini coefficient of a nonnegative integer size column,
    in exact basis points.

    Closed form over ascending ranks r = 1..n (ties broken by the row
    key): ``gini_bp = (2·Σ r·x − (n+1)·Σx) · 10000 div (n·Σx)``. All
    products carried in DECIMAL(38,0) so 10^12-row groups of 64-bit
    sizes cannot overflow. Groups with zero total size emit NULL (a
    concentration of nothing is undefined, not zero).
    """
    w = Window.partitionBy(group_col).orderBy(F.asc(size_col), F.asc(id_col))
    ranked = df.select(
        F.col(group_col).alias("grp"),
        F.col(size_col).cast(_D38).alias("x"),
        F.row_number().over(w).cast(_D38).alias("r"),
    )
    agg = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).cast(_D38).alias("_n"),
        F.sum("x").alias("_s"),
        F.sum(F.col("r") * F.col("x")).alias("_rs"),
    )
    return agg.select(
        "grp",
        F.col("_n").cast("long").alias("n"),
        F.col("_s").cast("long").alias("total_size"),
        F.when(F.col("_s") > 0, F.expr(
            "(cast(2 as decimal(38,0)) * _rs - (_n + 1) * _s) * 10000 div (_n * _s)"
        ).cast("long")).alias("gini_bp"),
    )
