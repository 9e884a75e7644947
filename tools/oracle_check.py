import sys, math
sys.path.insert(0, "/root/repo")
import duckdb, pandas as pd
import __spark_entry__ as E
from dr_source_spark.session import get_spark

SF = "/root/testdata/sf0.01"
spark = get_spark(master="local[8]")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

qs, os_ = E.queries(), E.oracle_sql()
if len(sys.argv) > 1:  # optional: check only the named queries
    want = set(sys.argv[1:])
    unknown = want - set(qs)
    if unknown:
        sys.exit(f"unknown queries: {sorted(unknown)}")
    qs = {k: v for k, v in qs.items() if k in want}
fails = []
for name, fn in qs.items():
    try:
        if name not in os_:
            n = fn(spark, SF).count()
            print(f"OK    {name:28s} rows={n} (rows-only, no oracle)")
            continue
        sdf = fn(spark, SF).toPandas()
        odf = con.execute(os_[name]).fetchdf()
        a, b = norm(sdf), norm(odf)
        if list(a.columns) != list(b.columns):
            fails.append((name, f"cols {list(a.columns)} vs {list(b.columns)}")); continue
        if len(a) != len(b):
            fails.append((name, f"rows {len(a)} vs {len(b)}")); continue
        eq = True
        for c in a.columns:
            av, bv = a[c], b[c]
            if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                if not ((av.isna() & bv.isna()) | (abs(av.astype(float) - bv.astype(float)) < 1e-12)).all():
                    eq = False; fails.append((name, f"col {c} float mismatch")); break
            else:
                if not (av.astype(str) == bv.astype(str)).all():
                    eq = False
                    diff = (av.astype(str) != bv.astype(str))
                    i = diff.idxmax()
                    fails.append((name, f"col {c} mismatch at {i}: {av[i]!r} vs {bv[i]!r}")); break
        if eq: print(f"OK    {name:28s} rows={len(a)}")
    except Exception as ex:
        fails.append((name, f"ERROR {type(ex).__name__}: {str(ex)[:300]}"))
for n, m in fails: print(f"FAIL  {n}: {m}")
spark.stop()
