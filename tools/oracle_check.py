#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare (t2 loop).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query in oracle_sql.json: run the SQL in DuckDB with views over
the sf parquet tables, load the Spark parquet result, sort columns by
name and rows by all values, and compare cell-by-cell (exact for
non-floats; floats must match to 1e-9 after the query's own rounding).
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

def cmp_cell(a, b):
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
        except (TypeError, ValueError):
            return False
    return str(a) == str(b)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        try:
            duck = con.execute(sql).df()
        except Exception as e:
            results[name] = f"ORACLE SQL ERROR: {e}"
            continue
        try:
            spark = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            results[name] = f"SPARK RESULT MISSING: {e}"
            continue
        d, s = canon(duck), canon(spark)
        if list(d.columns) != list(s.columns):
            results[name] = f"SCHEMA MISMATCH duck={list(d.columns)} spark={list(s.columns)}"
            continue
        if len(d) != len(s):
            results[name] = f"ROWCOUNT MISMATCH duck={len(d)} spark={len(s)}"
            continue
        bad = None
        for ci, c in enumerate(d.columns):
            dv, sv = d[c].tolist(), s[c].tolist()
            for ri in range(len(dv)):
                if not cmp_cell(dv[ri], sv[ri]):
                    bad = f"VALUE MISMATCH col={c} row={ri} duck={dv[ri]!r} spark={sv[ri]!r}"
                    break
            if bad:
                break
        results[name] = bad or f"OK ({len(d)} rows)"
    # spark-only queries (no oracle): rows-only sanity
    import os
    for name in sorted(os.listdir(out_dir)):
        if name.startswith("q_") and name not in oracle:
            n = len(pd.read_parquet(f"{out_dir}/{name}"))
            results[name] = f"NO-ORACLE rows={n}" + (" (EMPTY!)" if n == 0 else "")
    fails = 0
    for k, v in sorted(results.items()):
        flag = "PASS" if v.startswith("OK") or v.startswith("NO-ORACLE rows=") and "EMPTY" not in v else "FAIL"
        if flag == "FAIL":
            fails += 1
        print(f"{flag} {k}: {v}")
    print(f"\n{len(results) - fails}/{len(results)} passed")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
