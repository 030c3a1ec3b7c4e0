#!/bin/bash
# Round-11 bench window, take 2 (post q42/q109 OOM fix). The first
# window's sf10 leg died at q42_embedding_neardup: the pair-with-vectors
# flatten array OOM'd the 24g local JVM, the uncaught OOM tore down the
# SparkContext, and the forked runner exited 52 before Bench printed its
# JSON — losing all 100 minutes of per-query measurements (hence the
# incremental /tmp/graft_bench_progress.jsonl Bench now writes).
# Lookup legs from window 1 are valid (LOOKUP_r11_sf{1,10}.json) and are
# not re-run.
set -u
cd /root/repo

run_suite() { # $1=sfdir $2=name $3=mem
  echo "[bench_r11b] suite $2 ($1, mem=$3) start: $(date -u +%H:%M:%S)"
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM="$3" \
    sbt -batch 'runMain graft.Bench' \
    > "/tmp/bench_r11b_$2.stdout" 2> "/tmp/bench_r11b_$2.stderr"
  grep -F '"metric"' "/tmp/bench_r11b_$2.stdout" | head -1 \
    > "bench/BENCH_r11_$2.json"
  cp /tmp/graft_bench_progress.jsonl "/tmp/bench_r11b_$2.progress.jsonl"
  echo "[bench_r11b] suite $2 done: $(date -u +%H:%M:%S)"
}

run_suite /root/testdata/sf0.1 sf0.1 16g
run_suite /tmp/graft_sf1      sf1   16g
run_suite /tmp/graft_sf10     sf10  24g
echo "[bench_r11b] all done: $(date -u +%H:%M:%S)"
