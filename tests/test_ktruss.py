"""Gates for k-truss decomposition (operators/graph.py::ktruss_edges):
edge-support peeling with the rounds-bound contract. DuckDB value-hash
oracle: parts_ktruss in __spark_entry__ (3-truss over the >=2-order
co-purchase graph, 181 surviving edges at sf0.01)."""

from dr_source_spark.operators.graph import ktruss_edges


def _edges(spark, pairs):
    return spark.createDataFrame([(int(a), int(b)) for a, b in pairs], "src long, dst long")


def test_k4_clique_is_a_4_truss_not_a_5_truss(spark):
    """Every edge of K4 closes exactly 2 triangles: the whole clique
    survives k=4 (support >= 2) with supports intact, and k=5
    (support >= 3) empties it in one round."""
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    out = ktruss_edges(_edges(spark, k4), k=4, rounds=2).collect()
    assert sorted((r.a, r.b) for r in out) == k4
    assert all(r.support == 2 for r in out)
    assert ktruss_edges(_edges(spark, k4), k=5, rounds=2).count() == 0


def test_peeling_cascades_across_rounds(spark):
    """Two triangles sharing edge (1,2): under k=4, round 1 keeps only
    the shared edge (support 2), round 2 kills it (its triangles died
    with the peeled edges) — rounds=1 vs rounds>=2 pins the
    rounds-bound contract exactly, and the fixed point is empty."""
    bowtie = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    one = ktruss_edges(_edges(spark, bowtie), k=4, rounds=1).collect()
    assert [(r.a, r.b, r.support) for r in one] == [(1, 2, 0)]
    assert ktruss_edges(_edges(spark, bowtie), k=4, rounds=2).count() == 0
    # overshooting a fixed point re-derives the identical edge list
    three = ktruss_edges(_edges(spark, bowtie), k=3, rounds=3).collect()
    assert sorted((r.a, r.b) for r in three) == bowtie
    assert {(r.a, r.b): r.support for r in three}[(1, 2)] == 2


def test_canonicalization_collapses_dirty_input(spark):
    """Self-loops drop; reverse and parallel duplicates collapse to one
    canonical a < b edge — the triangle is still found."""
    dirty = [(0, 1), (1, 0), (0, 1), (2, 2), (1, 2), (0, 2)]
    out = ktruss_edges(_edges(spark, dirty), k=3, rounds=2).collect()
    assert sorted((r.a, r.b) for r in out) == [(0, 1), (0, 2), (1, 2)]
    assert all(r.support == 1 for r in out)


def test_support_matches_brute_force(spark):
    """Final supports equal a brute-force triangle count on a small
    random-ish deterministic graph (k=2 keeps every edge: support
    threshold 0, pure support report)."""
    pairs = sorted({(i * 7 % 11, i * 3 % 11) for i in range(40)} - {(i, i) for i in range(11)})
    und = sorted({(min(a, b), max(a, b)) for a, b in pairs})
    out = {(r.a, r.b): r.support for r in ktruss_edges(_edges(spark, pairs), k=2, rounds=1).collect()}
    es = set(und)
    brute = {
        (a, b): sum(
            1
            for c in range(11)
            if c not in (a, b)
            and (min(a, c), max(a, c)) in es
            and (min(b, c), max(b, c)) in es
        )
        for a, b in und
    }
    assert out == brute


def test_ktruss_plan_has_no_cartesian(spark):
    """Every stage is an equi-join or narrow groupBy: no
    CartesianProduct; the wedge join's inequality rides the u equi-key
    (degree-ordered orientation, no celebrity blowup)."""
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    df = ktruss_edges(_edges(spark, k4), k=3, rounds=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
