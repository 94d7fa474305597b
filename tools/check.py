#!/usr/bin/env python3
"""Local oracle check mimicking the driver's correctness gate.

Usage: python3 tools/check.py <outDir> <sfDir>
  (run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

For each query: load Spark's parquet dump and the DuckDB oracle result,
sort columns by name, sort rows, compare values exactly (floats: exact
after both engines' own rounding — mismatches are reported with samples).
Dev-only tool; the real gate is driver-side.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def values_equal(a, b):
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isclose(a, b, rel_tol=0, abs_tol=0):
            return True
        return a == b
    return a == b

def main():
    out, sf = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = canon(con.sql(
                f"SELECT * FROM read_parquet({files!r})").df())
            ora_df = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(ora_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(ora_df.columns)}")
            n_fail += 1
            continue
        if len(spark_df) != len(ora_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(ora_df)}")
            n_fail += 1
            continue
        diffs = []
        for c in spark_df.columns:
            sv, ov = spark_df[c].tolist(), ora_df[c].tolist()
            bad = [(i, sv[i], ov[i]) for i in range(len(sv)) if not values_equal(sv[i], ov[i])]
            if bad:
                diffs.append((c, bad[:3], len(bad)))
        if diffs:
            print(f"FAIL {name}:")
            for c, sample, nbad in diffs:
                print(f"    col {c}: {nbad} diffs, e.g. {sample}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
