#!/usr/bin/env python3
"""DuckDB-side timing parity check (judge's round-3 methodology).

Usage: python3 tools/duck_bench.py <oracleSqlJson> <sfDir> [threads]

Runs every oracle SQL against the same parquet tables DuckDB-side,
warm min-of-2 per query, and prints one JSON line:
  {"total_sec": T, "queries": {name: sec, ...}, "n": N}

Compare the total against the Spark bench total at the same SF to get
the spark/duckdb ratio for BENCH_NOTES.md. Dev-only tool.
"""
import sys, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    oracle_path, sf = sys.argv[1], sys.argv[2]
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    with open(oracle_path) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    times = {}
    for name in sorted(oracles):
        best = None
        for _ in range(2):  # warm min-of-2
            t0 = time.monotonic()
            try:
                con.execute(oracles[name]).fetchall()
            except Exception as e:
                times[name] = None
                print(f"[duck_bench] {name} FAILED: {e}", file=sys.stderr)
                break
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        else:
            times[name] = round(best, 4)
    ok = {k: v for k, v in times.items() if v is not None}
    print(json.dumps({"total_sec": round(sum(ok.values()), 3),
                      "queries": times, "n": len(ok)}))

if __name__ == "__main__":
    main()
