"""A/B the 112-expression minhash aggregate against split / OPH variants.

Round-6 candidate (docs/FUTURE.md): minhash banding is the dedup_clusters
floor (~3.5 s of 5.5 s at sf0.1) and the 112 min-aggregates form one
whole-stage-codegen unit. This harness measures, on the same sf0.1
documents table:

  A. current  — ONE groupBy(doc_id) with 112 min() expressions
  B. split2   — two groupBy(doc_id) passes of 56 aggregates each,
                joined on doc_id (smaller codegen units, but the token
                explode + md5 runs twice and the join adds a shuffle)
  C. oph      — one-permutation hashing shape: groupBy(doc_id, h % 112)
                .agg(min(h)) (narrow 2-key aggregate with map-side
                combine) then a second groupBy(doc_id) collecting the
                bins. Different hash family — NOT oracle-compatible;
                measured only to see whether the aggregate width or the
                explode dominates.

Usage: python tools/minhash_ab.py [sf_dir] [runs]
Prints one JSON line per variant with best/all times + host-steal%.
"""
from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dr_source_spark.training.dedup import (  # noqa: E402
    _MINHASH_P,
    _minhash_base,
    _minhash_wide,
    _words,
    minhash_family,
)


def _ticks():
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:9]]


def variant_current(documents, num_hashes):
    return _minhash_wide(documents, num_hashes)


def variant_split2(documents, num_hashes):
    sc = documents.sparkSession.sparkContext
    hashed = (
        documents.repartition(sc.defaultParallelism, "doc_id")
        .select("doc_id", F.explode(_words()).alias("word"))
        .select("doc_id", _minhash_base(F.col("word")).alias("h"))
    )
    fam = minhash_family(num_hashes)
    half = num_hashes // 2

    def agg(lo, hi):
        return hashed.groupBy("doc_id").agg(
            *[
                F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(_MINHASH_P)).alias(f"m{i}")
                for i, (a, b) in list(enumerate(fam))[lo:hi]
            ]
        )

    return agg(0, half).join(agg(half, num_hashes), "doc_id")


def variant_oph(documents, num_hashes):
    sc = documents.sparkSession.sparkContext
    hashed = (
        documents.repartition(sc.defaultParallelism, "doc_id")
        .select("doc_id", F.explode(_words()).alias("word"))
        .select("doc_id", _minhash_base(F.col("word")).alias("h"))
    )
    return (
        hashed.withColumn("bin", (F.col("h") % F.lit(num_hashes)).cast("int"))
        .groupBy("doc_id", "bin")
        .agg(F.min("h").alias("mh"))
        .groupBy("doc_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("bin", "mh"))).alias("sig"))
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("minhash-ab")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).cache()
    n = docs.count()  # warm cache so every variant reads the same input

    variants = {
        "current_112x1": variant_current,
        "split_56x2": variant_split2,
        "oph_bins": variant_oph,
    }
    # One untimed warm-up of each variant (JIT/codegen), then round-robin
    # timed passes so host-steal drift hits every variant equally.
    for fn in variants.values():
        fn(docs, 112).count()
    times = {k: [] for k in variants}
    steals = {k: [] for k in variants}
    rows = {}
    for _ in range(runs):
        for name, fn in variants.items():
            t0, s0 = time.time(), _ticks()
            rows[name] = fn(docs, 112).count()
            s1 = [b - a for a, b in zip(s0, _ticks())]
            times[name].append(round(time.time() - t0, 3))
            steals[name].append(round(100.0 * s1[7] / max(sum(s1), 1), 2))
    for name in variants:
        print(
            json.dumps(
                {
                    "variant": name,
                    "best_s": min(times[name]),
                    "times_s": times[name],
                    "steal_pct": steals[name],
                    "out_rows": rows[name],
                    "docs": n,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
