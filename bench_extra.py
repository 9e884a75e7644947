"""Round-6 optimization measurement harness (guide §1: measure first).

Separate from the FROZEN bench.py. Stage-level isolation of the expensive
paths with the noop sink (guide §1.4) and job labels (§1.5):

  * kg_extract decomposition: corpus synth, ingest, symbol index,
    detector pass, triples;
  * dedup_clusters decomposition: minhash wide agg, band sigs,
    LSH candidates, jaccard verify, components;
  * kg_pagerank decomposition: extraction (memoized) vs the rank loop;
  * every headline query, best-of-N with the noop sink.

Usage: python bench_extra.py [stage|headline|all] [--sf DIR] [--runs N]
Prints one JSON line per timing so runs are diffable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, fn, runs=3):
    samples = []
    for _ in range(runs):
        spark.sparkContext.setJobDescription(name)
        t0 = time.monotonic()
        fn()
        samples.append(round(time.monotonic() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({"stage": name, "best": min(samples), "samples": samples}), flush=True)
    return min(samples)


def stages_kg(spark, runs=3):
    from dr_source_spark.kb import compiled_kb_cached
    from dr_source_spark.operators.analyze import run_detectors
    from dr_source_spark.operators.index_build import build_symbol_index
    from dr_source_spark.operators.triples import findings_to_triples
    from dr_source_spark.pipeline import extract
    from dr_source_spark.sources.corpus import ingest_source_files
    from dr_source_spark.sources.synth import synth_code_corpus

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ckb = compiled_kb_cached(project_dir="/nonexistent")

    timed(spark, "kg.synth_corpus_noop", lambda: _noop(synth_code_corpus(docs, templates=6)), runs)
    timed(
        spark,
        "kg.ingest_noop",
        lambda: _noop(ingest_source_files(synth_code_corpus(docs, templates=6))),
        runs,
    )
    timed(
        spark,
        "kg.index_build_noop",
        lambda: _noop(
            build_symbol_index(ingest_source_files(synth_code_corpus(docs, templates=6)))
        ),
        runs,
    )
    timed(
        spark,
        "kg.detectors_noop",
        lambda: _noop(
            run_detectors(ingest_source_files(synth_code_corpus(docs, templates=6)), ckb)
        ),
        runs,
    )

    def full():
        res = extract(spark, synth_code_corpus(docs, templates=6), run_id="bx")
        res.triples.count()
        res.cleanup()

    timed(spark, "kg.extract_full_count", full, runs)

    def full10():
        res = extract(spark, synth_code_corpus(docs, templates=0), run_id="bx10")
        res.triples.count()
        res.cleanup()

    timed(spark, "kg.extract_alltpl_count", full10, runs)


def stages_dedup(spark, runs=3):
    from dr_source_spark.training.dedup import (
        _band_signatures,
        _minhash_wide,
        duplicate_clusters,
        minhash_lsh_candidates,
        ngram_jaccard,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    timed(spark, "dd.minhash_wide_noop", lambda: _noop(_minhash_wide(docs, 112)), runs)
    timed(spark, "dd.band_sigs_noop", lambda: _noop(_band_signatures(docs, 112, 14)), runs)
    timed(spark, "dd.lsh_candidates_noop", lambda: _noop(minhash_lsh_candidates(docs)), runs)
    timed(
        spark,
        "dd.jaccard_verified_composed_noop",
        lambda: _noop(
            ngram_jaccard(docs, minhash_lsh_candidates(docs)).filter("jaccard >= 0.9")
        ),
        runs,
    )
    from dr_source_spark.training.dedup import _verified_near_dup_pairs

    timed(
        spark,
        "dd.verified_pairs_fused_noop",
        lambda: _noop(_verified_near_dup_pairs(docs, 0.9)),
        runs,
    )
    timed(spark, "dd.clusters_noop", lambda: _noop(duplicate_clusters(docs)), runs)


def stages_pagerank(spark, runs=3):
    from dr_source_spark.operators.graph import pagerank_fixed_point
    from dr_source_spark.pipeline import extract
    from dr_source_spark.sources.synth import synth_code_corpus

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    res = extract(spark, synth_code_corpus(docs), run_id="bx_pr")
    edges = res.edges.persist()
    n = edges.count()
    print(json.dumps({"stage": "pr.n_edge_rows", "n": n}), flush=True)
    timed(spark, "pr.pagerank_over_cached_edges", lambda: _noop(pagerank_fixed_point(edges)), runs)
    edges.unpersist()
    res.cleanup()


def headline(spark, runs=3):
    import __spark_entry__ as entrymod
    from bench import bench_detector_scan, bench_kg_extract

    qmap = entrymod.queries()
    names = [
        "q1_pricing_summary", "join_region_revenue", "a10_latest_per_group",
        "a9_scan_diff_new", "b1_regex_match", "dedup_exact_text",
        "dedup_minhash_signatures", "ann_cosine_topk", "text_lang_profile",
        "dedup_clusters", "kg_pagerank",
    ]
    timed(spark, "hl.kg_extract", lambda: bench_kg_extract(spark), runs)
    timed(spark, "hl.detector_scan", lambda: bench_detector_scan(spark), runs)
    for name in names:
        timed(spark, f"hl.{name}", lambda n=name: _noop(qmap[n](spark, SF_DIR)), runs)


def main():
    from dr_source_spark.session import get_spark

    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    runs = int(os.environ.get("BX_RUNS", "3"))
    spark = get_spark(
        app_name="dr_source_spark_bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    # warm the JVM / python worker pool (same rationale as bench.py)
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "what": what}), flush=True)
    if what in ("stage", "all"):
        stages_kg(spark, runs)
        stages_dedup(spark, runs)
        stages_pagerank(spark, runs)
    if what in ("headline", "all"):
        headline(spark, runs)
    spark.stop()


if __name__ == "__main__":
    main()
