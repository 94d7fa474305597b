#!/usr/bin/env python3
"""Simulate the driver's bench collector on a Bench stdout capture.

The collector keeps only the LAST ~2000 chars of stdout and records
`parsed: null` unless a complete bare JSON line fits in that window
(sbt's default forked-run logger used to decorate the line as
"[info] {...}" and append a "[success]" epilogue — BENCH_r0{1..7} all
recorded parsed:null for exactly that reason; build.sbt now sets
run/outputStrategy := StdoutOutput and showSuccess := false).

Usage:
  sbt "runMain graft.Bench" 2>/dev/null > /tmp/bench.out
  python3 tools/tail_check.py /tmp/bench.out
Exits 0 and prints the parsed metric when the graded line survives the
tail window; exits 1 otherwise.
"""
import sys, json

data = sys.stdin.read() if len(sys.argv) < 2 else open(sys.argv[1]).read()
tail = data[-2000:]
parsed = None
for line in tail.splitlines():
    line = line.strip()
    if not line:
        continue
    try:
        d = json.loads(line)
        if isinstance(d, dict) and "metric" in d:
            parsed = d
    except ValueError:
        pass

if parsed is None:
    print("FAIL: no bare JSON metric line in the last 2000 chars")
    print("--- tail ---")
    print(tail[-500:])
    sys.exit(1)
if parsed.get("metric") != "total":
    print(f"WARN: last parseable metric line is {parsed.get('metric')!r}, "
          "not 'total' (the compact headline should come last)")
print("PASS parsed:", json.dumps(parsed)[:400])
