"""A/B evidence for the automatic straggler-slack policy (VERDICT r3 #8).

Builds a synthetic heavy-tailed corpus (~1000:1 content-length skew:
a handful of ~1 MB files among hundreds of ~200 B files), runs the fused
detector stage at local[N] with factor=1 (uniform-corpus optimum) vs the
skew policy's factor (operators/skew.STRAGGLER_FACTOR), and prints one
JSON line with both walls. The win is structural: with exactly-cores
partitions, hash placement lands several multi-second files in one
partition and its task pins a core; factor× more, smaller tasks let the
scheduler rebalance.

Usage: python tools/skew_ab.py [cores] [n_heavy] [n_light]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(spark, n_heavy: int, n_light: int):
    light = (
        "class C%d { void m(javax.servlet.http.HttpServletRequest request, "
        "java.sql.Statement st) throws Exception { "
        'String u = request.getParameter("q"); st.executeQuery(u); } }'
    )
    unit = ' String x%d = "v"; if (x%d.length() > 0) { System.out.println(x%d); }'
    heavy_body = "".join(unit.replace("%d", str(i)) for i in range(15000))
    heavy = (
        "class HX { void m(javax.servlet.http.HttpServletRequest request, "
        "java.sql.Statement st) throws Exception { "
        'String u = request.getParameter("q");' + heavy_body + " st.executeQuery(u); } }"
    )
    rows = [("r", f"light{i}.java", "c", None, light % i) for i in range(n_light)]
    rows += [("r", f"heavy{i}.java", "c", None, heavy.replace("HX", f"H{i}")) for i in range(n_heavy)]
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    ), len(heavy), len(light % 0)


def main():
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_heavy = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_light = int(sys.argv[3]) if len(sys.argv) > 3 else 200

    from dr_source_spark.kb import compiled_kb_cached
    from dr_source_spark.operators.analyze import run_detectors
    from dr_source_spark.operators.skew import (
        STRAGGLER_FACTOR,
        attach_length_observation,
        straggler_factor_from,
    )
    from dr_source_spark.session import get_spark
    from dr_source_spark.sources.corpus import ingest_source_files

    spark = get_spark(app_name="skew_ab", master=f"local[{cores}]", shuffle_partitions=cores)
    df, heavy_len, light_len = build_corpus(spark, n_heavy, n_light)
    files, obs = attach_length_observation(ingest_source_files(df))
    files = files.persist()
    files.count()  # materialize cache + observation (stands in for the index pass)
    engaged = straggler_factor_from(obs)
    ckb = compiled_kb_cached(project_dir="/nonexistent")

    def run(factor: int) -> float:
        t0 = time.monotonic()
        run_detectors(files, ckb, straggler_factor=factor).count()
        return round(time.monotonic() - t0, 2)

    run(1)  # warmup: worker spawn, codegen, per-worker memos
    base = run(1)
    auto = run(engaged)
    print(json.dumps({
        "cores": cores,
        "n_heavy": n_heavy, "n_light": n_light,
        "heavy_len": heavy_len, "light_len": light_len,
        "skew_ratio_measured": round(heavy_len / ((n_heavy * heavy_len + n_light * light_len) / (n_heavy + n_light)), 1),
        "engaged_factor": engaged,
        "wall_factor1_s": base,
        "wall_auto_s": auto,
        "speedup": round(base / auto, 3) if auto else None,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
