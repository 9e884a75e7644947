"""Automatic straggler-slack policy (operators/skew.py, VERDICT r3 #8):
heavy-tailed corpora get factor>1 detector partitioning WITHOUT the caller
knowing their corpus shape; uniform corpora keep the measured factor=1
optimum. Engagement is decided from content-length stats observed for free
on the pipeline's index pass."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_LIGHT = (
    "class C%d { void m(javax.servlet.http.HttpServletRequest request, "
    "java.sql.Statement st) throws Exception { "
    'String u = request.getParameter("q"); st.executeQuery(u); } }'
)


def _corpus(spark, n_light: int, heavy_bytes: int):
    rows = [("r", f"light{i}.java", "c", None, _LIGHT % i) for i in range(n_light)]
    if heavy_bytes:
        filler = " // pad" * (heavy_bytes // 7)
        rows.append(("r", "heavy.java", "c", None, (_LIGHT % 999) + "\n" + filler))
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )


def test_policy_engages_on_skewed_corpus(spark):
    """1000:1-ish length skew → extract() runs the detector stage with the
    straggler factor, reported on the result."""
    from dr_source_spark.operators.skew import STRAGGLER_FACTOR
    from dr_source_spark.pipeline import extract

    res = extract(spark, _corpus(spark, n_light=100, heavy_bytes=200_000), run_id="skewed")
    res.findings.count()
    res.cleanup()
    assert res.straggler_factor == STRAGGLER_FACTOR


def test_policy_stays_flat_on_uniform_corpus(spark):
    from dr_source_spark.pipeline import extract

    res = extract(spark, _corpus(spark, n_light=100, heavy_bytes=0), run_id="uniform")
    res.findings.count()
    res.cleanup()
    assert res.straggler_factor == 1


def test_straggler_factor_nonblocking_without_action(spark):
    """No prior action on the observed frame → the policy must return 1
    immediately, never block on obs.get (inter-file indexing disabled is a
    real path that runs no job before the detector stage)."""
    from dr_source_spark.operators.skew import attach_length_observation, straggler_factor_from

    df = _corpus(spark, n_light=10, heavy_bytes=100_000)
    _observed, obs = attach_length_observation(df)
    assert straggler_factor_from(obs) == 1  # returns, no deadlock


def test_max_over_median_sees_tail_heavy_corpora(spark):
    """The metric must be max/MEDIAN: many ~1 MB files among ~200 B files
    drag the MEAN toward the tail (max/mean ~ 14 here, under threshold)
    while max/median stays ~6700."""
    from dr_source_spark.operators.skew import attach_length_observation, straggler_factor_from

    rows = [("r", f"l{i}.java", "c", None, "x" * 170) for i in range(200)]
    rows += [("r", f"h{i}.java", "c", None, "y" * 1_100_000) for i in range(16)]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    observed, obs = attach_length_observation(df)
    observed.count()
    assert straggler_factor_from(obs) > 1


@pytest.mark.slow
def test_skew_ab_wall_time_win_local8():
    """End-to-end A/B at local[8] (subprocess — the shared test session is
    local[4]): the engaged factor must beat factor=1 on the synthetic
    1000:1 corpus. Structural win is ~1.35x; asserted at >1.05 to ride out
    box noise."""
    last = None
    for _attempt in range(2):  # one retry: the A/B is timing-sensitive and
        # the shared box carries load waves (±35% between consecutive runs
        # measured in BENCH/BASELINE.md); the structural win is ~1.35x
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "skew_ab.py"), "8", "16", "200"],
            capture_output=True, text=True, timeout=600, cwd=REPO,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        last = json.loads(line)
        assert last["engaged_factor"] > 1, last
        if last["speedup"] and last["speedup"] > 1.05:
            return
    raise AssertionError(f"no wall-time win in 2 attempts: {last}")
