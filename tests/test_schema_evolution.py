"""Schema-evolution receipts: a 100 TB table accretes columns over
years; readers must handle old files missing new columns without a
rewrite. Pins the two mechanisms this engine relies on — parquet
mergeSchema reads across file generations, and
unionByName(allowMissingColumns=True) for in-flight frame evolution —
plus the failure mode worth knowing: positional union silently
mismatches, name-based union does not."""

import pytest
from pyspark.sql import functions as F


def test_merge_schema_reads_across_generations(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], "id long, v string").write.mode("append").parquet(p)
    spark.createDataFrame(
        [(2, "b", 99)], "id long, v string, score long"
    ).write.mode("append").parquet(p)
    df = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(df.columns) == {"id", "v", "score"}
    got = {r.id: r.score for r in df.collect()}
    assert got == {1: None, 2: 99}  # old-generation rows read NULL, not error


def test_union_by_name_fills_missing_columns(spark):
    old = spark.createDataFrame([(1, "a")], "id long, v string")
    new = spark.createDataFrame([(2, "b", 99)], "id long, v string, score long")
    u = old.unionByName(new, allowMissingColumns=True)
    got = {r.id: r.score for r in u.collect()}
    assert got == {1: None, 2: 99}


def test_positional_union_is_the_trap_name_union_avoids(spark):
    """The known hazard: positional union zips columns by POSITION, so
    two frames with the same columns in different order silently
    cross-assign values; unionByName is immune."""
    a = spark.createDataFrame([(1, "x")], "id long, v string")
    b = spark.createDataFrame([("y", 2)], "v string, id long")
    with pytest.raises(Exception):
        # Spark at least catches the type mismatch here (long vs string)
        a.union(b).collect()
    ok = a.unionByName(b)
    assert {(r.id, r.v) for r in ok.collect()} == {(1, "x"), (2, "y")}
