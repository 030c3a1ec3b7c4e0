#!/bin/bash
# Round-11 bench windows (one host window, back to back, in this order):
#   1. full 200-query suite at sf0.1  (cpus=32, 16g — same as r10)
#   2. full 200-query suite at sf1    (cpus=32, 16g — same as r10)
#   3. full 200-query suite at sf10   (cpus=32, 24g — same as the r9/r10
#      sf10 spot windows; the larger heap is the documented recipe for
#      the second decade)
#   4. point-lookup latency (graft.LookupBench) at sf1 then sf10
# Full per-query JSON lands in bench/BENCH_r11_<sf>.json; raw stdout in
# /tmp/bench_r11_<sf>.std{out,err} for post-mortems.
set -u
cd /root/repo

run_suite() { # $1=sfdir $2=name $3=mem
  echo "[bench_r11] suite $2 ($1, mem=$3) start: $(date -u +%H:%M:%S)"
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM="$3" \
    sbt -batch 'runMain graft.Bench' \
    > "/tmp/bench_r11_$2.stdout" 2> "/tmp/bench_r11_$2.stderr"
  grep -F '"metric"' "/tmp/bench_r11_$2.stdout" | head -1 \
    > "bench/BENCH_r11_$2.json"
  echo "[bench_r11] suite $2 done: $(date -u +%H:%M:%S)"
}

run_suite /root/testdata/sf0.1 sf0.1 16g
run_suite /tmp/graft_sf1      sf1   16g
run_suite /tmp/graft_sf10     sf10  24g

for sf in sf1 sf10; do
  dir=/tmp/graft_$sf
  echo "[bench_r11] lookup $sf start: $(date -u +%H:%M:%S)"
  SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
    SPARK_GRAFT_LOOKUPS=64 sbt -batch 'runMain graft.LookupBench' \
    > "/tmp/lookup_r11_$sf.stdout" 2> "/tmp/lookup_r11_$sf.stderr"
  grep -F '"metric"' "/tmp/lookup_r11_$sf.stdout" | head -1 \
    > "bench/LOOKUP_r11_$sf.json"
done
echo "[bench_r11] all done: $(date -u +%H:%M:%S)"
