"""Gates for the data-layout planning operators (operators/layout.py):
Z-order file manifests and equi-depth histograms. DuckDB value-hash
oracles live in __spark_entry__ (events_zorder_manifest,
events_value_histogram)."""

import datetime

from pyspark.sql import functions as F

from dr_source_spark.operators.layout import (
    equidepth_histogram,
    hilbert_manifest,
    interleave_bits,
    range_partition_advice,
    with_hilbert_index,
    zorder_manifest,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


def test_interleave_matches_python_model(spark):
    """The Morton expression equals the textbook bit interleave for every
    (a, b) pair of a full 16x16 grid."""
    df = spark.range(256).select(
        (F.col("id") / 16).cast("long").alias("a"), (F.col("id") % 16).alias("b")
    )
    got = {(r.a, r.b): r.z for r in df.select("a", "b", interleave_bits(F.col("a"), F.col("b"), 4).alias("z")).collect()}

    def model(a, b):
        z = 0
        for i in range(4):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    assert got == {(a, b): model(a, b) for a in range(16) for b in range(16)}
    # Morton order is a bijection on the grid
    assert len(set(got.values())) == 256


def test_zorder_manifest_locality(spark):
    """The point of Z-order: every target file's manifest spans a NARROW
    range of BOTH dimensions, so predicates on either column prune files.
    Build a uniform 64x64 (user, hour) grid and check each file covers at
    most a 16-wide slab of u and of t (a perfect 4096-cell Z-curve cut
    into 16 files yields exactly 16x16 tiles), while a time-sorted layout
    of the same data would span all 64 u values in every file."""
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (u * 64 + t, base + datetime.timedelta(hours=t), u, 1.0)
        for u in range(64)
        for t in range(64)
    ]
    man = zorder_manifest(_events(spark, rows), dim_bits=6, file_span=256).collect()
    assert len(man) == 16 and sum(r.n_events for r in man) == 4096
    for r in man:
        assert r.u_hi - r.u_lo <= 15 and r.t_hi - r.t_lo <= 15, r
        # z ranges are disjoint consecutive spans
        assert r.z_hi - r.z_lo <= 255


def test_zorder_manifest_counts_and_stats(spark):
    """Counts, distinct users and min/max stats are exact (duplicate
    users across files counted per-file)."""
    base = datetime.datetime(2024, 1, 1)
    rows = [(i, base + datetime.timedelta(hours=i % 3), i % 5, 1.0) for i in range(100)]
    man = zorder_manifest(_events(spark, rows), dim_bits=2, file_span=4).collect()
    assert sum(r.n_events for r in man) == 100
    assert all(r.z_lo >= r.file_id * 4 and r.z_hi < (r.file_id + 1) * 4 for r in man)
    assert all(1 <= r.n_users <= 5 for r in man)


def test_equidepth_histogram_matches_python_model(spark):
    """Tie-coalesced equi-depth: each distinct value's bucket is
    rank_of_first_row * B div N; per-bucket counts/min/max exact. Skewed
    multiplicities exercise the tie-coalescing (one heavy value keeps all
    its rows together even when that overflows the even split)."""
    base = datetime.datetime(2024, 1, 1)
    vals = [1.25] * 40 + [2.5] * 10 + [round(3 + 0.01 * i, 2) for i in range(50)]
    rows = [(i, base, 0, v) for i, v in enumerate(vals)]
    got = {r.bucket: (r.n_rows, r.n_values, r.v_lo, r.v_hi)
           for r in equidepth_histogram(_events(spark, rows), buckets=4).collect()}

    counts = {}
    for v in vals:
        counts[v] = counts.get(v, 0) + 1
    n, rank, exp = len(vals), 0, {}
    for v in sorted(counts):
        b = rank * 4 // n
        nr, nv, lo, hi = exp.get(b, (0, 0, v, v))
        exp[b] = (nr + counts[v], nv + 1, min(lo, v), max(hi, v))
        rank += counts[v]
    assert got == exp
    # the 40-row value 1.25 lands whole in bucket 0
    assert got[0][0] >= 40


def test_equidepth_histogram_plan_is_scalable(spark):
    """Same gate as the prefix helper's own (tests/test_pack.py): at most
    ONE SinglePartition exchange (the bucket-totals window over
    n_buckets rows), the data path shuffled by the prefix bucket — plus
    no Cartesian (the N join is an explicit 1-row broadcast)."""
    base = datetime.datetime(2024, 1, 1)
    rows = [(i, base, 0, float(i % 97)) for i in range(500)]
    df = equidepth_histogram(_events(spark, rows), buckets=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # two SinglePartition exchanges are allowed, and each must feed from
    # an aggregate (bucket totals = n_buckets rows; the global-N sum = one
    # partial row per task) — never from un-aggregated data
    lines = plan.splitlines()
    sp = [i for i, ln in enumerate(lines) if "Exchange SinglePartition" in ln]
    assert len(sp) <= 2
    for i in sp:
        assert "HashAggregate" in lines[i + 1], lines[i : i + 2]
    assert "hashpartitioning(_b" in plan
    assert sum(r.n_rows for r in df.collect()) == 500


def test_histogram_excludes_nulls_explicitly(spark):
    """NULL values are excluded by an EXPLICIT filter (null_count is a
    separate column stat), matching the oracle's WHERE clause — without
    it the prefix join's join-on-NULL would drop them on the Spark side
    only, a cross-engine divergence. Empty input yields an empty
    histogram."""
    base = datetime.datetime(2024, 1, 1)
    rows = [(1, base, 0, None), (2, base, 0, 2.5), (3, base, 0, None), (4, base, 0, 7.5)]
    out = equidepth_histogram(_events(spark, rows), buckets=2).collect()
    assert sorted((r.bucket, r.n_rows, r.v_lo) for r in out) == [(0, 1, 2.5), (1, 1, 7.5)]
    empty = spark.createDataFrame([], "event_id long, ts timestamp, user_id long, value double")
    assert equidepth_histogram(empty).count() == 0


def test_zorder_null_rows_form_a_visible_null_file(spark):
    """Rows with NULL user/ts land in a single NULL-keyed manifest row
    (SQL GROUP BY semantics, identical in DuckDB) — visible, never
    silently dropped. Empty input yields an empty manifest."""
    base = datetime.datetime(2024, 1, 1)
    rows = [(1, None, None, 1.0), (2, base, 5, 2.0)]
    out = {r.file_id: r for r in zorder_manifest(_events(spark, rows), dim_bits=2, file_span=4).collect()}
    assert None in out and out[None].n_events == 1 and out[None].n_users == 0
    assert len(out) == 2
    empty = spark.createDataFrame([], "event_id long, ts timestamp, user_id long, value double")
    assert zorder_manifest(empty).count() == 0


def test_zorder_negative_ids_and_pre_epoch_ts_stay_in_range(spark):
    """pmod bucketing: negative user_ids and pre-1970 timestamps must
    land in [0, 2^bits) like any other value — under sign-preserving %
    they produced negative buckets, garbage Z-values and negative
    file_ids."""
    base = datetime.datetime(1969, 12, 30)  # pre-epoch hours
    rows = [
        (-5, base + datetime.timedelta(hours=h), -3, 1.0) for h in range(4)
    ] + [(7, datetime.datetime(2024, 1, 1), 2, 1.0)]
    man = zorder_manifest(_events(spark, rows), dim_bits=4, file_span=8).collect()
    assert sum(r.n_events for r in man) == 5
    for r in man:
        assert r.file_id >= 0 and r.z_lo >= 0, r
        assert 0 <= r.u_lo <= r.u_hi < 16 and 0 <= r.t_lo <= r.t_hi < 16, r


def _xy2d(n, x, y):
    """Textbook Hilbert xy2d (the public-domain recurrence): quadrant
    digit + rotate/flip per level, most-significant level first."""
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) else 0
        ry = 1 if (y & s) else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_python_model(spark):
    """The chained-select recurrence equals the textbook xy2d for every
    cell of a full 16x16 grid, and is a bijection onto [0, 256)."""
    df = spark.range(256).select(
        (F.col("id") / 16).cast("long").alias("x"), (F.col("id") % 16).alias("y")
    )
    got = {(r.x, r.y): r.hkey for r in with_hilbert_index(df, "x", "y", 4).collect()}
    assert got == {(x, y): _xy2d(16, x, y) for x in range(16) for y in range(16)}
    assert len(set(got.values())) == 256


def test_hilbert_adjacency_beats_zorder_seams(spark):
    """The defining Hilbert property, as an exact law: EVERY pair of
    consecutive keys is grid-adjacent (|du| + |dt| = 1). The Morton curve
    on the same grid teleports at quadrant seams (max jump = grid
    width), which is precisely the locality Hilbert buys at file
    boundaries."""
    n = 32
    df = spark.range(n * n).select(
        (F.col("id") / n).cast("long").alias("x"), (F.col("id") % n).alias("y")
    )
    inv = {
        r.hkey: (r.x, r.y)
        for r in with_hilbert_index(df, "x", "y", 5).collect()
    }
    assert all(
        abs(inv[k][0] - inv[k + 1][0]) + abs(inv[k][1] - inv[k + 1][1]) == 1
        for k in range(n * n - 1)
    )

    def morton(a, b):
        z = 0
        for i in range(5):
            z |= ((a >> i) & 1) << (2 * i + 1) | ((b >> i) & 1) << (2 * i)
        return z

    minv = {morton(a, b): (a, b) for a in range(n) for b in range(n)}
    zjumps = [
        abs(minv[k][0] - minv[k + 1][0]) + abs(minv[k][1] - minv[k + 1][1])
        for k in range(n * n - 1)
    ]
    assert max(zjumps) >= n  # the seam teleport Hilbert eliminates


def test_hilbert_manifest_files_are_exact_subsquares(spark):
    """With file_span = 4^k, every aligned run of consecutive Hilbert
    keys is EXACTLY one 2^k x 2^k subsquare — on a uniform 64x64 grid at
    span 64 each file's bounding box is exactly 8x8 with 64 cells, the
    provably minimal box for its cell count (the Z-order peer's law is
    the weaker <=15-wide slab)."""
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (u * 64 + t, base + datetime.timedelta(hours=t), u, 1.0)
        for u in range(64)
        for t in range(64)
    ]
    man = hilbert_manifest(_events(spark, rows), dim_bits=6, file_span=64).collect()
    assert len(man) == 64 and sum(r.n_events for r in man) == 4096
    for r in man:
        assert r.u_hi - r.u_lo == 7 and r.t_hi - r.t_lo == 7, r
        assert r.h_lo == r.file_id * 64 and r.h_hi == r.h_lo + 63, r


def test_hilbert_single_sided_null_masks_key(spark):
    """A row where only ONE of (user, ts) is NULL must key to the NULL
    file: without the explicit mask the rotation's otherwise-branches
    leak a non-NULL garbage digit and the row lands in a real file on
    the Spark side only (the DuckDB oracle's CASE does the same leak —
    both sides mask). Empty input yields an empty manifest."""
    base = datetime.datetime(2024, 1, 1)
    rows = [(1, None, 4, 1.0), (2, base, None, 2.0), (3, base, 5, 3.0)]
    out = {r.file_id: r for r in hilbert_manifest(_events(spark, rows), dim_bits=3, file_span=4).collect()}
    assert None in out and out[None].n_events == 2
    assert len(out) == 2
    empty = spark.createDataFrame([], "event_id long, ts timestamp, user_id long, value double")
    assert hilbert_manifest(empty).count() == 0


def test_hilbert_plan_stays_linear_and_shuffles_once(spark):
    """The per-level chained selects must NOT be collapsed into one
    exponentially-substituted expression: the optimized plan stays small
    (a naive single-expression form at 6 levels blows past 10^5 chars),
    and the only exchanges are the count-distinct pair of the final
    groupBy(file_id) — both hash-partitioned on file_id, never
    SinglePartition."""
    base = datetime.datetime(2024, 1, 1)
    rows = [(i, base + datetime.timedelta(hours=i), i, 1.0) for i in range(50)]
    df = hilbert_manifest(_events(spark, rows), dim_bits=6, file_span=64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2, plan  # distinct-agg expand + final
    assert plan.count("Exchange hashpartitioning(file_id") == 2, plan
    assert "SinglePartition" not in plan
    assert len(plan) < 100_000, len(plan)


def test_partition_advice_flags_indivisible_heavy_key(spark):
    """The advisor's whole point: a single value carrying several
    balanced shares is indivisible under range partitioning, so its
    partition reports skew_pct > 100 and salt_factor = the number of
    shares that ONE key carries (ceil(max_value_rows * parts / N)) —
    uniform partitions report salt_factor 1 and skew ~100."""
    base = datetime.datetime(2024, 1, 1)
    # 64 uniform values x 1 row + one value with 64 rows => N=128, parts=4,
    # ideal share 32: the heavy value alone is exactly 2 shares
    vals = [round(1 + 0.01 * i, 2) for i in range(64)] + [9.99] * 64
    rows = [(i, base, 0, v) for i, v in enumerate(vals)]
    out = {r.partition: r for r in
           range_partition_advice(_events(spark, rows), parts=4).collect()}
    assert sum(r.n_rows for r in out.values()) == 128
    heavy = max(out.values(), key=lambda r: r.max_value_rows)
    assert heavy.max_value_rows == 64 and heavy.salt_factor == 2
    assert heavy.skew_pct > 100
    assert all(r.salt_factor == 1 for r in out.values() if r is not heavy)
    # boundaries are disjoint and ordered: consumable by a range partitioner
    parts = sorted(out.values(), key=lambda r: r.partition)
    assert all(a.v_hi <= b.v_lo for a, b in zip(parts, parts[1:]))


def test_partition_advice_matches_python_model(spark):
    """Cell-for-cell against a direct Python restatement of the integer
    arithmetic (rank*parts div N assignment, exact ceil salt)."""
    base = datetime.datetime(2024, 1, 1)
    vals = [float(v) for v in [1, 1, 1, 2, 3, 3, 4, 5, 5, 5, 5, 6]]
    rows = [(i, base, 0, v) for i, v in enumerate(vals)]
    got = {r.partition: (r.n_rows, r.n_values, r.v_lo, r.v_hi, r.skew_pct,
                         r.max_value_rows, r.salt_factor)
           for r in range_partition_advice(_events(spark, rows), parts=3).collect()}

    counts = {}
    for v in vals:
        counts[v] = counts.get(v, 0) + 1
    n, rank, exp = len(vals), 0, {}
    for v in sorted(counts):
        p = rank * 3 // n
        nr, nv, lo, hi, mx = exp.get(p, (0, 0, v, v, 0))
        exp[p] = (nr + counts[v], nv + 1, min(lo, v), max(hi, v), max(mx, counts[v]))
        rank += counts[v]
    exp = {p: (nr, nv, lo, hi, nr * 100 * 3 // n, mx, (mx * 3 + n - 1) // n)
           for p, (nr, nv, lo, hi, mx) in exp.items()}
    assert got == exp


def test_partition_advice_plan_and_nulls(spark):
    """Same scalable shape as the histogram it derives from: at most two
    SinglePartition exchanges, each fed by an aggregate; NULL values
    excluded by the explicit filter; empty input yields empty advice."""
    base = datetime.datetime(2024, 1, 1)
    rows = [(i, base, 0, float(i % 37) if i % 5 else None) for i in range(300)]
    df = range_partition_advice(_events(spark, rows), parts=6)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    lines = plan.splitlines()
    sp = [i for i, ln in enumerate(lines) if "Exchange SinglePartition" in ln]
    assert len(sp) <= 2
    for i in sp:
        assert "HashAggregate" in lines[i + 1], lines[i : i + 2]
    assert sum(r.n_rows for r in df.collect()) == 240  # the 60 NULLs excluded
    empty = spark.createDataFrame([], "event_id long, ts timestamp, user_id long, value double")
    assert range_partition_advice(empty).count() == 0
