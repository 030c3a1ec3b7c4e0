#!/bin/bash
# Round-12 bench window: full 203-query suite at sf0.1/sf1/sf10 (first
# window including q201-q203 and per-row rows_out), then LookupBench at
# sf1/sf10 (first window with the driver-local PointReader path — the
# unsuffixed rows; *_job rows are the Spark scheduler floor).
# Launch with nohup (see memory: a run_in_background task dies with the
# session). Per-leg progress JSONLs are pinned via env so a concurrent
# dev JVM can't clobber them.
set -u
cd /root/repo

run_suite() { # $1=sfdir $2=name $3=mem
  echo "[bench_r12] suite $2 ($1, mem=$3) start: $(date -u +%H:%M:%S)"
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM="$3" \
    SPARK_GRAFT_BENCH_PROGRESS="/tmp/bench_r12_$2.progress.jsonl" \
    sbt -batch 'runMain graft.Bench' \
    > "/tmp/bench_r12_$2.stdout" 2> "/tmp/bench_r12_$2.stderr"
  grep -F '"metric"' "/tmp/bench_r12_$2.stdout" | head -1 \
    > "bench/BENCH_r12_$2.json"
  echo "[bench_r12] suite $2 done: $(date -u +%H:%M:%S)"
}

run_lookup() { # $1=sfdir $2=name
  echo "[bench_r12] lookup $2 start: $(date -u +%H:%M:%S)"
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
    sbt -batch 'runMain graft.LookupBench' \
    > "/tmp/lookup_r12_$2.stdout" 2> "/tmp/lookup_r12_$2.stderr"
  grep -F '"metric"' "/tmp/lookup_r12_$2.stdout" | head -1 \
    > "bench/LOOKUP_r12_$2.json"
  echo "[bench_r12] lookup $2 done: $(date -u +%H:%M:%S)"
}

run_suite /root/testdata/sf0.1 sf0.1 16g
run_suite /tmp/graft_sf1      sf1   16g
run_suite /tmp/graft_sf10     sf10  24g
run_lookup /tmp/graft_sf1  sf1
run_lookup /tmp/graft_sf10 sf10
echo "[bench_r12] all done: $(date -u +%H:%M:%S)"
