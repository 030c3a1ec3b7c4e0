#!/bin/bash
# Round-12 bench window, continuation leg: /tmp was wiped between sessions,
# so regenerate the deterministic sf1/sf10 slope datasets (tools/gen_sf.py,
# fixed seed — byte-identical distribution to the earlier window's inputs),
# then run the three legs the first window didn't reach: the sf10 suite leg
# and both LookupBench legs. The sf0.1/sf1 suite legs are already committed
# (bench/BENCH_r12_sf{0.1,1}.json).
set -u
cd /root/repo

echo "[bench_r12b] gen sf1 start: $(date -u +%H:%M:%S)"
python3 tools/gen_sf.py 10 /tmp/graft_sf1 > /tmp/gen_sf1.log 2>&1
echo "[bench_r12b] gen sf10 start: $(date -u +%H:%M:%S)"
python3 tools/gen_sf.py 100 /tmp/graft_sf10 > /tmp/gen_sf10.log 2>&1
echo "[bench_r12b] gen done: $(date -u +%H:%M:%S)"

run_suite() { # $1=sfdir $2=name $3=mem
  echo "[bench_r12b] suite $2 ($1, mem=$3) start: $(date -u +%H:%M:%S)"
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM="$3" \
    SPARK_GRAFT_BENCH_PROGRESS="/tmp/bench_r12_$2.progress.jsonl" \
    sbt -batch 'runMain graft.Bench' \
    > "/tmp/bench_r12_$2.stdout" 2> "/tmp/bench_r12_$2.stderr"
  grep -F '"metric"' "/tmp/bench_r12_$2.stdout" | head -1 \
    > "bench/BENCH_r12_$2.json"
  echo "[bench_r12b] suite $2 done: $(date -u +%H:%M:%S)"
}

run_lookup() { # $1=sfdir $2=name
  echo "[bench_r12b] lookup $2 start: $(date -u +%H:%M:%S)"
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
    sbt -batch 'runMain graft.LookupBench' \
    > "/tmp/lookup_r12_$2.stdout" 2> "/tmp/lookup_r12_$2.stderr"
  grep -F '"metric"' "/tmp/lookup_r12_$2.stdout" | head -1 \
    > "bench/LOOKUP_r12_$2.json"
  echo "[bench_r12b] lookup $2 done: $(date -u +%H:%M:%S)"
}

run_suite /tmp/graft_sf10 sf10 24g
run_lookup /tmp/graft_sf1  sf1
run_lookup /tmp/graft_sf10 sf10
echo "[bench_r12b] all done: $(date -u +%H:%M:%S)"
