"""Gates for the data-layout planning operators (operators/layout.py):
Z-order file manifests and equi-depth histograms. DuckDB value-hash
oracles live in __spark_entry__ (events_zorder_manifest,
events_value_histogram)."""

import datetime

from pyspark.sql import functions as F

from dr_source_spark.operators.layout import (
    equidepth_histogram,
    interleave_bits,
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
