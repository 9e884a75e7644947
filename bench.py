"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Headliners cover the engine's three workload families:
  * kg_extract        — full pipeline (ingest → fused detector UDF → triples)
                        over a corpus synthesized deterministically from the
                        documents table (detector throughput dominates);
  * relational ops    — TPC-H-ish aggregates/joins/windows (Catalyst path);
  * training ops      — dedup (exact/minhash-LSH), ANN top-k, text profile.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _corpus(spark, templates: int = 6):
    """Deterministic code corpus derived from the documents table — one
    source file per document, cycling language tiers, heavy-tailed repo
    sizes (sources/synth.py). The HEADLINE corpus pins templates=6 (the
    round-1/2 shape) so files/sec and kg_extract stay comparable across
    rounds; the full 10-template corpus (inter-file + framework + django
    structural, a heavier per-file mix) is timed separately as
    kg_extract_full, outside the headline sum."""
    from dr_source_spark.sources.synth import synth_code_corpus

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return synth_code_corpus(docs, templates=templates)


def bench_kg_extract(spark, templates: int = 6):
    """Full pipeline: ingest → symbol index → fused detectors → triples."""
    from dr_source_spark.pipeline import extract

    res = extract(spark, _corpus(spark, templates), run_id="bench")
    n = res.triples.count()
    res.cleanup()  # release the corpus cache between best-of runs
    return n


def bench_detector_scan(spark):
    """Fused detector stage alone (all tiers) — the files/sec driver."""
    from dr_source_spark.kb import compiled_kb_cached
    from dr_source_spark.operators.analyze import run_detectors
    from dr_source_spark.sources.corpus import ingest_source_files

    ckb = compiled_kb_cached(project_dir="/nonexistent")
    files = ingest_source_files(_corpus(spark))
    return run_detectors(files, ckb).count()


def main():
    from dr_source_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="dr_source_spark_bench", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))

    relational = [
        "q1_pricing_summary",
        "join_region_revenue",
        "a10_latest_per_group",
        "a9_scan_diff_new",
        "b1_regex_match",
    ]
    training = [
        "dedup_exact_text",
        "dedup_minhash_signatures",
        "ann_cosine_topk",
        "text_lang_profile",
    ]
    qmap = entrymod.queries()

    timings = {}
    noise = {"runs": {}, "spread_pct": {}, "steal_pct": {}}

    def timed(name, fn, runs: int = 2, max_runs: int = 5):
        # best-of-N: masks first-action warmup and box noise (the single
        # shared sandbox box hosts other jobs). Sub-second queries sit in
        # the noise floor, so they get extra runs; the recorded spread
        # (max/min - 1) lets a reader tell a real regression from a noisy
        # box without re-running. Per-query host-steal%: attributes which
        # query drew a steal wave (suite-level steal hides it — one run's
        # kg_pagerank carried 109% spread at 0.3% suite steal).
        def _ticks():
            return list(map(int, open("/proc/stat").readline().split()[1:]))

        samples = []
        s0 = _ticks()
        while len(samples) < runs or (min(samples) < 1.0 and len(samples) < max_runs):
            t0 = time.monotonic()
            fn()
            samples.append(time.monotonic() - t0)
        d = [b - a for a, b in zip(s0, _ticks())]
        timings[name] = round(min(samples), 3)
        noise["runs"][name] = len(samples)
        noise["spread_pct"][name] = round((max(samples) / min(samples) - 1) * 100, 1)
        noise["steal_pct"][name] = round(100.0 * d[7] / max(sum(d), 1), 2)

    # Load gate: the shared sandbox box carries load waves (observed loadavg
    # 1 -> 10 within minutes) that corrupted the r3/r4 cross-round series.
    # Spin-wait (bounded) for a quiet 1-min loadavg before the timed passes;
    # if the gate never opens, run anyway and stamp the JSON noisy so a
    # reader can tell engine regression from box noise without re-running.
    # The gate runs BEFORE the warm-up pass: warm-up itself is a 32-thread
    # burst that inflates the 1-min loadavg, and gating after it would burn
    # the budget waiting for our own load to decay instead of external load.
    def _steal_sample(window: float = 2.0) -> float:
        # fraction of all CPU ticks the host stole from this VM over the
        # window — the noise source guest loadavg cannot see (r5
        # postmortem: identical runs at loadavg < 2 swung 7.7 -> 12.9 s
        # purely with steal waves)
        def ticks():
            return list(map(int, open("/proc/stat").readline().split()[1:]))

        a = ticks()
        time.sleep(window)
        b = ticks()
        d = [y - x for x, y in zip(a, b)]
        return 100.0 * d[7] / max(sum(d), 1)

    gate_t0 = time.monotonic()
    # bounded at 5 min: the grading driver invokes bench.py under its own
    # timeout, and a full 10-min spin on a stolen box risks tripping it —
    # an unopened gate still stamps the run noisy, which is the contract
    gate_limit = float(os.environ.get("SPARK_GRAFT_LOADGATE_SEC", "300"))
    gate_thresh = float(os.environ.get("SPARK_GRAFT_LOADGATE_LOAD", "2.0"))
    steal_thresh = float(os.environ.get("SPARK_GRAFT_LOADGATE_STEAL", "2.0"))
    while time.monotonic() - gate_t0 < gate_limit:
        if os.getloadavg()[0] >= gate_thresh:
            time.sleep(10)
            continue
        if _steal_sample() >= steal_thresh:
            time.sleep(10)
            continue
        break
    load_gate_wait = round(time.monotonic() - gate_t0, 1)
    noisy = os.getloadavg()[0] >= gate_thresh
    loadavg_start = [round(x, 2) for x in os.getloadavg()]

    # warm the JVM/py worker pool once (not timed): the first full-pipeline
    # pass pays python-worker spawn x cores, broadcast ship, whole-stage
    # codegen for the index/detector/triples plans and per-worker regex/KB
    # compile memos (~3-6s one-time at sf0.1) — that is session setup, not
    # query cost, and best-of-2 can't mask it
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    bench_kg_extract(spark)
    # warm the dedup/LSH/components plan family too: the dedup_clusters
    # extra series otherwise pays whole-stage codegen + shuffle
    # first-touch in its first timed sample (observed 19-25 s cold vs
    # 5-7 s warm on the same box), which best-of-2 then misreports as a
    # regression. Warm on the FULL bench input, not a limit() prefix — a
    # shrunken input compiles different plan shapes (broadcast
    # thresholds, candidate-pair volume) and a 400-doc warm pass still
    # left a ~16 s first timed sample (141 % spread) on the very series
    # it was meant to fix
    from dr_source_spark.training.dedup import duplicate_clusters

    duplicate_clusters(spark.read.parquet(f"{SF_DIR}/documents.parquet")).count()

    # host-steal instrumentation: this sandbox is a VM on a shared host,
    # and host CPU steal (invisible to guest loadavg — the r5 postmortem
    # measured identical workloads swinging 7.7 s -> 12.9 s at loadavg < 2)
    # is the dominant noise source. /proc/stat column 8 counts stolen
    # ticks; the delta across the timed section, over total ticks, is the
    # fraction of compute the host took from us.
    def _stat_ticks():
        parts = open("/proc/stat").readline().split()
        return list(map(int, parts[1:]))

    steal_t0 = _stat_ticks()

    timed("kg_extract", lambda: bench_kg_extract(spark))
    timed("detector_scan", lambda: bench_detector_scan(spark))
    for name in relational + training:
        timed(name, lambda n=name: qmap[n](spark, SF_DIR).write.format("noop").mode("overwrite").save())

    n_files = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    total = round(sum(timings.values()), 3)
    # the round-3 extended corpus (inter-file + framework templates) is a
    # heavier per-file workload — timed OUTSIDE the headline sum so the
    # headline stays an apples-to-apples series across rounds
    timed("kg_extract_full", lambda: bench_kg_extract(spark, templates=0))
    # late-round-3 heavyweight ops, tracked outside the headline series:
    # iterative graph jobs (components / fixed-point pagerank) and the
    # verified near-dup clustering pipeline
    for name in ("dedup_clusters", "kg_pagerank"):
        if name in qmap:
            timed(name, lambda n=name: qmap[n](spark, SF_DIR).write.format("noop").mode("overwrite").save())
    extra = {}
    for name in ("kg_extract_full", "dedup_clusters", "kg_pagerank"):
        if name in timings:
            extra[name] = timings.pop(name)
            noise["runs"].pop(name, None)
            extra[f"{name}_spread_pct"] = noise["spread_pct"].pop(name, None)
            extra[f"{name}_steal_pct"] = noise["steal_pct"].pop(name, None)
    steal_t1 = _stat_ticks()
    _d = [b - a for a, b in zip(steal_t0, steal_t1)]
    steal_pct = round(100.0 * _d[7] / max(sum(_d), 1), 2)
    # > 3% of all cycles stolen across the run = the numbers measured the
    # host's neighbors, not this engine
    noisy = noisy or steal_pct > 3.0
    out = {
        "metric": "headline_suite_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cpus": int(CPUS),
        "corpus_files": n_files,
        "files_per_sec_detector": round(n_files / timings["detector_scan"], 2) if timings.get("detector_scan") else None,
        # noise indicators: box load before/after, per-query run counts and
        # best-to-worst spread — a regression claim needs a quiet box
        # (loadavg ~ the Spark job itself) and a small spread
        "extra": extra,
        "noisy": noisy,
        "noise": dict(noise, loadavg_start=loadavg_start,
                      loadavg_end=[round(x, 2) for x in os.getloadavg()],
                      load_gate_wait_sec=load_gate_wait,
                      host_steal_pct=steal_pct),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
