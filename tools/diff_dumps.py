#!/usr/bin/env python3
"""Compare two Verify output dirs query by query (exact row-set equality).

Usage: python3 tools/diff_dumps.py <dirA> <dirB> [only_query ...]

Dev tool for refactor equivalence runs: dump the suite before and after a
rewrite on the same sfDir and require bit-identical results everywhere.
"""
import sys, glob, json
import duckdb

def main():
    a, b = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    names = sorted(json.load(open(f"{a}/oracle_sql.json")).keys())
    if only:
        names = [n for n in names if n in only]
    con = duckdb.connect()
    n_pass = n_fail = 0
    for name in names:
        fa = glob.glob(f"{a}/{name}/*.parquet")
        fb = glob.glob(f"{b}/{name}/*.parquet")
        if not fa or not fb:
            print(f"SKIP {name}: missing dump ({len(fa)}/{len(fb)})")
            continue
        d = con.sql(
            f"SELECT count(*) FROM ((SELECT * FROM read_parquet({fa!r}) "
            f"EXCEPT ALL SELECT * FROM read_parquet({fb!r})) UNION ALL "
            f"(SELECT * FROM read_parquet({fb!r}) EXCEPT ALL "
            f"SELECT * FROM read_parquet({fa!r})))").fetchone()[0]
        if d == 0:
            n_pass += 1
        else:
            n_fail += 1
            print(f"DIFF {name}: {d} asymmetric rows")
    print(f"== {n_pass} identical / {n_fail} differ")

if __name__ == "__main__":
    main()
