#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 oracle gate (dev tooling only —
not part of the Scala library). Mirrors the documented compare: for each
query, run the oracle SQL in DuckDB over the same parquet tables, load the
Spark-written parquet result, sort columns by name, sort rows by all
values, and compare cell-by-cell (doubles via repr after float64 cast).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize cell values to comparable canonical forms
    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(sorted(cell(x) for x in v)) + "]"
        if isinstance(v, float):
            return repr(float(v))
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        return str(v)
    out = df.apply(lambda col: col.map(cell))
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            duck = con.execute(sql).fetchdf()
            spark = pd.read_parquet(f"{out_dir}/{name}")
            a, b = canon(spark), canon(duck)
            if list(a.columns) != list(b.columns):
                print(f"FAIL {name}: columns spark={list(a.columns)} duck={list(b.columns)}")
                n_fail += 1
                continue
            if len(a) != len(b):
                print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
                n_fail += 1
                continue
            if not a.equals(b):
                neq = (a != b)
                bad_cols = [c for c in a.columns if neq[c].any()]
                idx = neq.any(axis=1)
                i = int(idx[idx].index[0])
                print(f"FAIL {name}: value mismatch cols={bad_cols} first_row={i}")
                print(f"  spark: {a.iloc[i].to_dict()}")
                print(f"  duck : {b.iloc[i].to_dict()}")
                n_fail += 1
                continue
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: EXCEPTION {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed / {len(oracle)}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
