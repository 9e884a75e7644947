"""Financial-controls forensics operators — the audit screens a
payments/revenue pipeline runs before closing its books, all
exact-integer so a flagged pair is reproducible evidence, not a float
coincidence:

* ``near_duplicate_payments`` — double-charge screen: order pairs from
  the same customer with nearly identical amounts close together in
  time. The amount tolerance makes this a BAND join, rewritten to an
  exploded-bucket equi-join (the dedup_simhash_pairs technique): the
  probe side explodes its amount bucket ±1, the join lands on
  (customer, bucket), and the exact |Δamount| / |Δdays| predicates
  filter the tiny candidate set — never a cross join.
* ``structuring_census`` — smurfing/structuring screen: customers
  splitting what sums to an over-threshold amount into several
  under-threshold orders inside one ISO week. One groupBy with a
  HAVING-style filter.
* ``round_number_bias`` — fabricated-figure screen: genuine
  transactional values spread across the digit space; invented ones
  cluster on round numbers. Reports observed vs expected share (exact
  bp) of round quantities and whole-dollar prices.

Reference: no counterpart — the reference is a code scanner; these are
the table-side audits its findings store would sit beside in a
warehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def near_duplicate_payments(
    orders: DataFrame,
    amount_tol_c: int = 100000,
    day_window: int = 90,
) -> DataFrame:
    """Pairs of orders from one customer whose amounts differ by at
    most ``amount_tol_c`` cents within ``day_window`` days — the
    double-charge / duplicate-invoice screen. Pair identity pinned by
    okey_a < okey_b; each pair emitted exactly once (the probe side
    explodes bucket−1/bucket/bucket+1 and the build side keeps its one
    true bucket, so a matching pair meets on exactly one bucket
    value).

    Scale shape: equi-join keyed on (customer, amount-bucket) — the
    band predicate never degrades to a nested loop (the
    dedup_simhash_pairs plan-gate lesson applied to money); fan-out
    bounded by per-customer orders in a 2·tol amount band.
    Output: (o_custkey, okey_a, okey_b, cents_a, cents_b, diff_c,
    day_gap).
    """
    tol = int(amount_tol_c)
    narrow = orders.select(
        F.col("o_custkey").alias("cust"),
        F.col("o_orderkey").alias("okey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    probe = narrow.select(
        "cust",
        F.col("okey").alias("okey_a"),
        F.col("cents").alias("cents_a"),
        F.col("d").alias("d_a"),
        F.explode(
            F.array(
                F.expr(f"cents div {tol} - 1"),
                F.expr(f"cents div {tol}"),
                F.expr(f"cents div {tol} + 1"),
            )
        ).alias("bkt"),
    )
    build = narrow.select(
        "cust",
        F.col("okey").alias("okey_b"),
        F.col("cents").alias("cents_b"),
        F.col("d").alias("d_b"),
        F.expr(f"cents div {tol}").alias("bkt"),
    )
    return (
        probe.join(build, ["cust", "bkt"])
        .filter(F.col("okey_a") < F.col("okey_b"))
        .filter(F.expr(f"abs(cents_a - cents_b) <= {tol}"))
        .filter(F.expr(f"abs(datediff(d_a, d_b)) <= {int(day_window)}"))
        .select(
            F.col("cust").alias("o_custkey"),
            "okey_a",
            "okey_b",
            "cents_a",
            "cents_b",
            F.expr("abs(cents_a - cents_b)").cast("long").alias("diff_c"),
            F.expr("abs(datediff(d_a, d_b))").cast("long").alias("day_gap"),
        )
    )


def structuring_census(
    orders: DataFrame, threshold_c: int = 30000000
) -> DataFrame:
    """Customers whose SAME-ISO-WEEK orders each stay under
    ``threshold_c`` cents but SUM to at least it — the structuring
    ("smurfing") pattern a reporting-threshold control watches for.
    Only under-threshold orders participate (an over-threshold order
    already hits the direct control); ≥ 2 orders required.

    Scale shape: one filter + one groupBy(customer, week) — map-side
    combinable, the canonical aggregate screen. Output: (o_custkey,
    week_start, n_orders, total_cents).
    """
    t = int(threshold_c)
    return (
        orders.select(
            "o_custkey",
            F.date_trunc("week", F.col("o_orderdate").cast("date"))
            .cast("date")
            .alias("week_start"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .filter(F.col("cents") < t)
        .groupBy("o_custkey", "week_start")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
        .filter((F.col("n_orders") >= 2) & (F.col("total_cents") >= t))
    )


def round_number_bias(lineitem: DataFrame) -> DataFrame:
    """Round-number clustering audit over quantities and prices:
    observed vs expected share (exact truncated bp) of (a) quantities
    divisible by 5 — expected 2 000 bp under a uniform integer
     1..50 domain — and (b) whole-dollar extended prices (cents ≡ 0
    mod 100) — expected 100 bp under uniform cent endings. A large
    positive excess is the classic fabricated-data tell (humans
    invent round figures; real processes don't).

    Scale shape: one conditional global aggregate — two counters, one
    row per metric out. Output: (metric, n, n_hits, share_bp,
    expected_bp, excess_bp).
    """
    base = lineitem.select(
        F.floor(F.col("l_quantity")).cast("long").alias("q"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    agg = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("q") % 5 == 0).cast("long")).cast("long").alias("h_qty"),
        F.sum((F.col("cents") % 100 == 0).cast("long"))
        .cast("long")
        .alias("h_price"),
    )
    qty = agg.select(
        F.lit("qty_mult_of_5").alias("metric"),
        "n",
        F.col("h_qty").alias("n_hits"),
        F.expr("CAST((10000 * h_qty) div n AS BIGINT)").alias("share_bp"),
        F.lit(2000).cast("long").alias("expected_bp"),
        F.expr("CAST((10000 * h_qty) div n - 2000 AS BIGINT)").alias(
            "excess_bp"
        ),
    )
    price = agg.select(
        F.lit("whole_dollar_price").alias("metric"),
        "n",
        F.col("h_price").alias("n_hits"),
        F.expr("CAST((10000 * h_price) div n AS BIGINT)").alias("share_bp"),
        F.lit(100).cast("long").alias("expected_bp"),
        F.expr("CAST((10000 * h_price) div n - 100 AS BIGINT)").alias(
            "excess_bp"
        ),
    )
    return qty.unionByName(price)
