#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <outDir>

Reads <outDir>/oracle_sql.json (written by graft.Verify), runs each oracle
in DuckDB over the parquet tables in <sfDir>, reads the corresponding Spark
result parquet from <outDir>/<name>/, and compares after sorting columns by
name (values compared exactly; floats exactly too — the engine is built for
bit-equality via decimal-exact aggregation).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # the driver sorts rows before hashing — replicate it so list-typed
    # columns fail here too (unhashable ndarray), not only in the gate
    df = df.sort_values(by=list(df.columns))
    return df.reset_index(drop=True)

def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table dir (e.g. ScaleUpData's sf1.0)
            p = f"{p}/*.parquet"
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = norm(con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf())
            exp = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1; continue
        # the driver's gate hashes typed values, so dtype divergence
        # (e.g. DuckDB HUGEINT->float64 vs Spark int64) is a failure even
        # when values compare equal
        dt = [(c, str(got[c].dtype), str(exp[c].dtype))
              for c in got.columns if str(got[c].dtype) != str(exp[c].dtype)]
        if dt:
            print(f"FAIL {name}: dtype mismatch {dt}")
            n_fail += 1; continue
        bad = None
        for c in got.columns:
            a, b = got[c], exp[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                bad = (c, i, a.iloc[i], b.iloc[i], int((~eq).sum()))
                break
        if bad:
            c, i, av, bv, n = bad
            print(f"FAIL {name}: col={c} row={i} got={av!r} exp={bv!r} ({n} diffs)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
