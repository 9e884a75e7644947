"""Property-based gates for the round-5 algebraic operators: the
distributed formulations must equal their brute-force definitions on
arbitrary inputs, not just the handcrafted fixtures.

Spark-session-per-example is too slow for hypothesis, so each property
draws MANY random cases up front (seeded) and verifies them in one
Spark job per case family — the property style without the per-example
session cost.
"""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def test_prefix_sum_property_random_keyspaces(spark):
    """Exclusive prefix sums over sparse/clustered/negative key sets with
    varied bucket counts equal the sequential definition."""
    from dr_source_spark.operators.prefix import global_prefix_sum

    rng = random.Random(11)
    for trial in range(6):
        n = rng.randrange(1, 120)
        keys = rng.sample(range(-50_000, 50_000), n)
        vals = [rng.randrange(0, 1000) for _ in range(n)]
        nb = rng.choice([1, 2, 7, 32, 101])
        df = spark.createDataFrame(list(zip(keys, vals)), "k long, v long")
        got = {
            r.k: r.prefix_excl
            for r in global_prefix_sum(df, "k", "v", n_buckets=nb).collect()
        }
        acc, want = 0, {}
        for k, v in sorted(zip(keys, vals)):
            want[k] = acc
            acc += v
        assert got == want, f"trial {trial} nb={nb}"


def test_interval_join_property_vs_brute_force(spark):
    """Bucketized interval join equals the O(n*m) definition for random
    points/intervals including negatives and degenerate intervals."""
    from dr_source_spark.operators.rangejoin import interval_bucket_join

    rng = random.Random(13)
    for trial in range(4):
        pts = [(i, rng.uniform(-100, 100)) for i in range(rng.randrange(1, 60))]
        ivs = []
        for j in range(rng.randrange(1, 40)):
            lo = rng.uniform(-120, 120)
            ivs.append((j, lo, lo + rng.uniform(0, 80)))
        w = rng.choice([1.0, 7.5, 32.0, 200.0])
        p = spark.createDataFrame(pts, "pid long, v double")
        i = spark.createDataFrame(ivs, "iid long, lo double, hi double")
        got = {
            (r.pid, r.iid)
            for r in interval_bucket_join(p, i, value_col="v", bucket_width=w).collect()
        }
        want = {
            (pid, iid)
            for pid, v in pts
            for iid, lo, hi in ivs
            if lo <= v <= hi
        }
        assert got == want, f"trial {trial} w={w}"


def test_asof_join_property_vs_brute_force(spark):
    """Merge-carry as-of equals the per-row argmax definition on random
    event sets with duplicate left timestamps and sparse right sides."""
    from datetime import datetime, timedelta

    from dr_source_spark.operators.asof import asof_join

    rng = random.Random(17)
    t0 = datetime(2024, 1, 1)
    for trial in range(4):
        lts = [
            (i, rng.randrange(3), t0 + timedelta(minutes=rng.randrange(200)))
            for i in range(rng.randrange(1, 50))
        ]
        # right side unique per (key, ts) by construction
        seen = set()
        rts = []
        for _ in range(rng.randrange(1, 30)):
            key, m = rng.randrange(3), rng.randrange(200)
            if (key, m) in seen:
                continue
            seen.add((key, m))
            rts.append((key, t0 + timedelta(minutes=m), float(m)))
        left = spark.createDataFrame(lts, "event_id long, user_id long, ts timestamp")
        right = spark.createDataFrame(rts, "user_id long, ts timestamp, value double")
        got = {
            r.event_id: (r.asof_ts, r.asof_value)
            for r in asof_join(left, right).collect()
        }
        for eid, key, ts in lts:
            cands = [(rt, v) for k, rt, v in rts if k == key and rt <= ts]
            want = max(cands) if cands else (None, None)
            assert got[eid] == want, f"trial {trial} event {eid}"
