#!/bin/bash
# Round-11 GCLocker proof + scaling ladder, one detached run:
#  1. rebuild the derived rungs (10x/30x/100x of sf0.1) via ScaleUp;
#  2. run the FULL bench suite at the 100x rung N times back to back,
#     recording every exit code — the r10 verdict demanded >=5 clean
#     runs before the GCLockerRetryAllocationCount flag counts as a fix
#     for the stochastic exit-52 ("Retried waiting for GCLocker too
#     often") seen once at r10's first 100x attempt;
#  3. one run each at 1x/10x/30x for the round ladder.
# Usage: setsid nohup tools/gclocker_ladder.sh [N] > /tmp/gcl_driver.log 2>&1 &
set -u
cd /root/repo
N="${1:-5}"
LOG=/tmp/gclocker_proof.log
: > "$LOG"

echo "[gcl] building rungs $(date -u +%H:%M:%S)" >> "$LOG"
sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/graft_sf1 10" \
  > /tmp/scaleup_sf1.log 2>&1
echo "[gcl] sf1 exit=$?" >> "$LOG"
sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/graft_sf3 30" \
  > /tmp/scaleup_sf3.log 2>&1
echo "[gcl] sf3 exit=$?" >> "$LOG"
sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/graft_sf10 100" \
  > /tmp/scaleup_sf10.log 2>&1
echo "[gcl] sf10 exit=$?" >> "$LOG"

for i in $(seq 1 "$N"); do
  echo "[gcl] sf10 bench run $i start $(date -u +%H:%M:%S)" >> "$LOG"
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 sbt -batch "runMain graft.Bench" \
    > "/tmp/bench_sf10_run$i.log" 2>&1
  rc=$?
  line=$(grep -h '"metric":"total"' "/tmp/bench_sf10_run$i.log" | tail -1 | cut -c1-200)
  echo "[gcl] sf10 bench run $i exit=$rc ${line}" >> "$LOG"
done

for rung in sf0.1:/root/testdata/sf0.1 sf1:/tmp/graft_sf1 sf3:/tmp/graft_sf3; do
  name="${rung%%:*}"; dir="${rung#*:}"
  echo "[gcl] $name bench start $(date -u +%H:%M:%S)" >> "$LOG"
  SPARK_GRAFT_SF_DIR="$dir" sbt -batch "runMain graft.Bench" \
    > "/tmp/bench_${name}_r11.log" 2>&1
  echo "[gcl] $name bench exit=$?" >> "$LOG"
done
echo "[gcl] all done $(date -u +%H:%M:%S)" >> "$LOG"
