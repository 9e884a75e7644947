"""Leakage-safe feature engineering for training-data pipelines.

Two classic feature constructors, both exact-integer so every engine
and every retry produces the identical feature table:

* ``loo_target_encode`` — leave-one-out target encoding: each row's
  categorical key is replaced by the mean target of the OTHER rows
  sharing that key, ``(Σ_group − own) div (n_group − 1)``. The "leave
  one out" is what makes the encoding leakage-safe: a row never sees
  its own label, so the feature carries no target information the
  model shouldn't have at train time. Rows in singleton groups get
  NULL (there are no other rows to average — imputing the global mean
  would silently re-introduce the row's own label into the global
  term; the caller decides the fallback).
* ``feature_hash_profile`` — the hashing trick's collision ledger:
  tokens map to ``h(token) mod n_buckets`` with the same portable
  32-bit md5-prefix hash the dedup family uses (first 8 hex chars of
  md5 as an integer — reproducible across Spark, DuckDB, and any
  engine with md5). The profile reports, per bucket, total term
  frequency, distinct documents, and distinct tokens — ``n_tokens >
  1`` rows are exactly the hash collisions a model owner audits before
  committing to a bucket count.

Scale shape: LOO encoding is one unordered aggregate window (pure
per-partition aggregation — no sort, no join); the hash profile is one
explode + one groupBy on the bucket id (bounded cardinality =
n_buckets, so the final aggregate is tiny no matter the corpus).

Reference: no counterpart — the reference is a security scanner
(dr_source/core/scanner.py); these are the operators its corpus would
need when it becomes model training data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def loo_target_encode(
    df: DataFrame, key_col: str, target_col: "F.Column", id_cols: list[str]
) -> DataFrame:
    """Per-row leave-one-out mean of ``target_col`` (integer units)
    within ``key_col`` groups; NULL for singleton groups.

    ``target_col`` must already be integer-scaled (cents, basis
    points); the LOO mean floors via integer div, which both Spark and
    DuckDB truncate identically for the nonnegative targets this is
    meant for.
    """
    w = Window.partitionBy("key")
    return (
        df.select(
            *id_cols,
            F.col(key_col).alias("key"),
            target_col.cast("long").alias("_y"),
        )
        .withColumn("_s", F.sum("_y").over(w))
        .withColumn("_n", F.count(F.lit(1)).over(w))
        .select(
            *id_cols,
            "key",
            F.col("_y").alias("target"),
            F.when(
                F.col("_n") > 1, F.expr("(_s - _y) div (_n - 1)")
            ).cast("long").alias("loo_mean"),
        )
    )


def _portable_hash32(col: "F.Column") -> "F.Column":
    """First 8 hex chars of md5 as a 32-bit integer — the package's
    cross-engine hash (same construction as the minhash base)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def feature_hash_profile(
    documents: DataFrame, n_buckets: int = 256
) -> DataFrame:
    """Hashing-trick bucket ledger over the whitespace token stream.

    Output: (bucket, total_tf, n_docs, n_tokens) — one row per
    occupied bucket. ``n_tokens`` is the collision count an ML owner
    checks before freezing ``n_buckets``; ``n_docs`` is the bucket's
    document frequency (its usefulness as a feature).
    """
    toks = F.split(
        F.trim(F.lower(F.coalesce(F.col("text"), F.lit("")))), r"\s+"
    )
    stream = (
        documents.select("doc_id", F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .select(
            "doc_id",
            "token",
            (_portable_hash32(F.col("token")) % n_buckets).alias("bucket"),
        )
    )
    return stream.groupBy("bucket").agg(
        F.count("*").cast("long").alias("total_tf"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.countDistinct("token").cast("long").alias("n_tokens"),
    )


def quota_allocate(
    df: DataFrame, group_col: str, total: int
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a sample budget
    across groups, proportional to group row counts — the exact-integer
    answer to "fill a ``total``-doc eval set proportionally by
    language" that float rounding cannot give reproducibly (banker's
    vs half-up rounding disagree, and independently-rounded shares
    don't sum to the budget).

    base_g = total·n_g div N; the L = total − Σ base leftover seats go
    to the L largest remainders (total·n_g mod N), ties broken by the
    group key — the textbook method, deterministic end to end.
    Output: (group, n_rows, base_alloc, final_alloc); Σ final_alloc ==
    total exactly (pytest-pinned law).

    Scale shape: one groupBy(group) count + window ranking over the
    GROUP table (cardinality = number of groups, tiny by construction).
    """
    counts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    t = F.lit(int(total)).cast("long")
    enriched = (
        counts.withColumn("_N", F.sum("n_rows").over(Window.partitionBy()))
        .select(
            "grp",
            "n_rows",
            F.expr(f"({int(total)} * n_rows) div _N").alias("base_alloc"),
            F.expr(f"({int(total)} * n_rows) % _N").alias("_rem"),
        )
        .withColumn("_leftover", t - F.sum("base_alloc").over(Window.partitionBy()))
    )
    ranked = enriched.withColumn(
        "_rk",
        F.row_number().over(Window.orderBy(F.desc("_rem"), F.asc("grp"))),
    )
    return ranked.select(
        "grp",
        "n_rows",
        F.col("base_alloc").cast("long").alias("base_alloc"),
        (
            F.col("base_alloc") + (F.col("_rk") <= F.col("_leftover")).cast("long")
        ).cast("long").alias("final_alloc"),
    )


def dhondt_allocate(
    df: DataFrame, group_col: str, weight_expr, seats: int
) -> DataFrame:
    """Highest-averages (D'Hondt) apportionment of ``seats`` across
    groups proportional to an integer weight — ``quota_allocate``'s
    divisor-method twin (Hamilton favors small groups at the margin,
    D'Hondt large ones; a pipeline allocating shard budgets or eval
    quotas by bytes wants both on the shelf). Every group generates
    quotients q(g, i) = W_g div i for i = 1..seats (TRUNCATED integer
    quotients — the pinned convention both engines reproduce exactly;
    a tie in the truncated quotient is broken by (W_g desc, group asc,
    i asc), deterministic end to end); the ``seats`` largest quotients
    win one seat each. Groups with zero/negative weight keep a 0-seat
    row. Σ seats_g == seats exactly (pytest-pinned law).

    Scale shape: one groupBy(group) sum, then the quotient explode is
    |groups| × seats rows — both dimension-bounded, tiny — through a
    single row_number ranking. Output: (group, weight, seats).
    """
    weights = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.sum(weight_expr).cast("long").alias("w")
    )
    quot = (
        weights.filter(F.col("w") > 0)
        .select(
            "grp",
            "w",
            F.explode(F.sequence(F.lit(1), F.lit(int(seats)))).alias("i"),
        )
        .select("grp", "w", "i", F.expr("w div i").alias("q"))
    )
    ranked = quot.withColumn(
        "_rk",
        F.row_number().over(
            Window.orderBy(
                F.desc("q"), F.desc("w"), F.asc("grp"), F.asc("i")
            )
        ),
    )
    won = (
        ranked.filter(F.col("_rk") <= int(seats))
        .groupBy("grp")
        .agg(F.count(F.lit(1)).cast("long").alias("seats"))
    )
    return (
        weights.join(won, "grp", "left")
        .select(
            "grp",
            F.col("w").alias("weight"),
            F.coalesce(F.col("seats"), F.lit(0)).cast("long").alias("seats"),
        )
    )


def systematic_sample(
    df: DataFrame, id_col: str, stride: int
) -> DataFrame:
    """SYSTEMATIC every-``stride``-th sampling over a portable-hash
    total order — the third deterministic sampling flavor beside
    stratified and weighted: rank every row by (hash32(id), id) — the
    package's md5-prefix hash, so the order is pseudo-random yet
    engine-reproducible — and keep ranks 1, 1+stride, 1+2·stride, …
    (⌈N/stride⌉ rows exactly, uniform coverage of the hash ring, no
    RNG state anywhere).

    Scale shape: systematic sampling REQUIRES a total order by
    definition; here it is one global sort window over (hash, id) —
    at lake scale the same order comes from a range-partitioned sort
    on the hash (documented; the convention is identical). Output:
    (id, sample_rank).
    """
    h = _portable_hash32(F.col(id_col).cast("string"))
    w = Window.orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.select(F.col(id_col))
        .withColumn("sample_rank", F.row_number().over(w))
        .filter((F.col("sample_rank") - 1) % int(stride) == 0)
        .select(F.col(id_col), F.col("sample_rank").cast("long"))
    )


def waterfill_allocate(
    df: DataFrame, group_col: str, avail_expr, budget: int
) -> DataFrame:
    """MAX-MIN FAIR (water-filling) allocation of an integer budget
    across groups with per-group capacity caps — the third allocation
    method on the shelf beside largest-remainder (quota_allocate) and
    highest-averages (dhondt_allocate): proportional methods starve
    small groups under a dominant one; max-min fairness raises every
    group to a common water level L, capping each at its own
    availability.

    Exact semantics (pinned): avail_g = Σ avail_expr; if Σ avail ≤
    budget every group gets its full availability (no water to
    ration). Otherwise L = the unique level with Σ min(avail_g, L) ≤
    budget < Σ min(avail_g, L+1); groups at or below L keep avail_g,
    the rest get L — and the leftover budget − Σ min(avail_g, L)
    (strictly fewer units than unsaturated groups) goes +1 each to the
    first unsaturated groups by group key ascending. Σ alloc ==
    min(budget, Σ avail) exactly, every alloc ≤ avail, and any two
    unsaturated allocations differ by ≤ 1 (the max-min laws, all
    pytest-pinned).

    Scale shape: one groupBy(group) sum, then ONE sort window over the
    GROUP table (group-domain-sized) for the prefix sums that locate
    the water level in closed form — no iteration, no driver loop.
    Output: (grp, avail, alloc).
    """
    b = int(budget)
    groups = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.sum(avail_expr).cast("long").alias("avail")
    )
    w = Window.orderBy(F.asc("avail"), F.asc("grp"))
    wall = Window.partitionBy()
    staged = groups.select(
        "grp",
        "avail",
        F.row_number().over(w).alias("i"),
        F.sum("avail").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("pfx"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("avail").over(wall).alias("total"),
    )
    # water level in closed form: i* = largest i with P_i + (n−i)·a_i ≤
    # budget (groups 1..i* saturated at their own avail); then L =
    # (budget − P_i*) div (n − i*), provably in [a_i*, a_{i*+1}) by
    # maximality. No feasible i (even the smallest group can't be
    # fully served) → zero saturated groups, L = budget div n.
    level = staged.agg(
        F.max(
            F.when(
                F.expr(f"pfx + (n - i) * avail <= {b}"),
                F.struct("i", "pfx", "n"),
            )
        ).alias("s"),
        F.max("n").alias("nn"),
    ).select(
        F.expr(
            f"CAST(coalesce(({b} - s.pfx) div nullif(s.n - s.i, 0),"
            f" {b} div nn) AS BIGINT)"
        ).alias("lvl")
    )
    alloc = staged.crossJoin(F.broadcast(level)).select(
        "grp",
        "avail",
        "total",
        F.when(F.col("total") <= b, F.col("avail"))
        .otherwise(F.least(F.col("avail"), F.col("lvl")))
        .alias("base"),
        F.col("lvl"),
    )
    # leftover = budget - sum(base); +1 to the first leftover
    # unsaturated groups (avail > base) by key ascending
    wk = Window.orderBy(F.asc("grp"))
    return (
        alloc.withColumn("_spent", F.sum("base").over(wall))
        .withColumn(
            "_rk",
            F.sum(
                (F.col("avail") > F.col("base")).cast("long")
            ).over(wk.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .select(
            "grp",
            "avail",
            (
                F.col("base")
                + F.when(
                    (F.col("total") > b)
                    & (F.col("avail") > F.col("base"))
                    & (F.col("_rk") <= b - F.col("_spent")),
                    1,
                ).otherwise(0)
            ).cast("long").alias("alloc"),
        )
    )
