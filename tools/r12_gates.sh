#!/bin/bash
# Round-12 closing gates, one detached run:
#  1. full ScalaTest suite;
#  2. ladder rungs sf1 (10x), sf3 (30x), sf10 (100x) over the PRE-BUILT
#     /tmp/graft_sf{1,3,10} trees (testdata unchanged since r11, so the
#     ScaleUp outputs are still valid), writing BENCH_sf{1,3,10}.json
#     from each run's final total metric line — the r9 staleness rule:
#     committed ladder artifacts must match the closing query count.
# Usage: setsid nohup tools/r12_gates.sh > /tmp/r12_gates_driver.log 2>&1 &
set -u
cd /root/repo
LOG=/tmp/r12_gates.log
: > "$LOG"

echo "[r12] sbt test start $(date -u +%H:%M:%S)" >> "$LOG"
sbt -batch test > /tmp/r12_test.log 2>&1
echo "[r12] sbt test exit=$? $(date -u +%H:%M:%S)" >> "$LOG"
grep -E "Tests: succeeded|All tests passed|TESTS FAILED" /tmp/r12_test.log | tail -3 >> "$LOG"

for rung in sf1 sf3 sf10; do
  echo "[r12] bench $rung start $(date -u +%H:%M:%S)" >> "$LOG"
  SPARK_GRAFT_SF_DIR=/tmp/graft_$rung sbt -batch "runMain graft.Bench" \
    > /tmp/r12_bench_$rung.log 2>&1
  echo "[r12] bench $rung exit=$? $(date -u +%H:%M:%S)" >> "$LOG"
  grep '"metric":"total"' /tmp/r12_bench_$rung.log | tail -1 \
    | python3 -c "import json,sys; print(json.dumps(json.loads(sys.stdin.read()), indent=1))" \
    > /root/repo/BENCH_$rung.json
  python3 -c "import json; d=json.load(open('/root/repo/BENCH_$rung.json')); print('[r12] $rung total', d['value'], 'n', d['n'], 'failed', d['failed'])" >> "$LOG"
done
echo "[r12] all done $(date -u +%H:%M:%S)" >> "$LOG"
