#!/bin/bash
# Round-13 bench window: the first SEGMENTED window (8 forked JVMs per
# leg — the r12 verdict's structural fix for JVM-aging confounds), with
# staged-build rows billed separately and an automatic fresh-JVM
# isolation re-measure of any row that would flag vs the sf1 leg.
# Self-commits each artifact WITH AN EXPLICIT PATHSPEC (r12 advisor:
# a bare `git commit` swept unrelated staged files into bench commits).
#
# Legs (sequential; nothing else CPU-heavy may run concurrently):
#   1. sf1  segmented suite  -> bench/BENCH_r13_sf1.json
#   2. sf10 segmented suite  -> bench/BENCH_r13_sf10.json
#      (+ isolation re-measure of flagged rows, folded in as "isolated")
#   3. LookupBench sf1, sf10 -> bench/LOOKUP_r13_sf{1,10}.json
#      (r13 adds the projected relation_meta probe; target p50 < 10 ms)
set -u
cd /root/repo
NSEG=${NSEG:-8}

commit_artifact() { # $1..: paths
  for i in 1 2 3 4 5; do
    git add "$@" && \
    git commit -m "Bench artifacts: $*

No-Verification-Needed: bench-artifact JSON only" -- "$@" && return 0
    sleep 10
  done
  echo "[bench_r13] WARN: commit of $* failed" >&2
}

echo "[bench_r13] sf1 segmented leg start: $(date -u +%H:%M:%S)"
bash tools/bench_seg.sh /tmp/graft_sf1 "$NSEG" bench/BENCH_r13_sf1.json
[ -s bench/BENCH_r13_sf1.json ] && commit_artifact bench/BENCH_r13_sf1.json

echo "[bench_r13] sf10 segmented leg start: $(date -u +%H:%M:%S)"
bash tools/bench_seg.sh /tmp/graft_sf10 "$NSEG" bench/BENCH_r13_sf10.json \
  bench/BENCH_r13_sf1.json 6.0 10
[ -s bench/BENCH_r13_sf10.json ] && commit_artifact bench/BENCH_r13_sf10.json

run_lookup() { # $1=sfdir $2=name
  echo "[bench_r13] lookup $2 start: $(date -u +%H:%M:%S)"
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
    sbt -batch 'runMain graft.LookupBench' \
    > "/tmp/lookup_r13_$2.stdout" 2> "/tmp/lookup_r13_$2.stderr"
  grep -F '"metric"' "/tmp/lookup_r13_$2.stdout" | head -1 \
    > "bench/LOOKUP_r13_$2.json"
  [ -s "bench/LOOKUP_r13_$2.json" ] && \
    commit_artifact "bench/LOOKUP_r13_$2.json"
}
run_lookup /tmp/graft_sf1  sf1
run_lookup /tmp/graft_sf10 sf10
echo "[bench_r13] window done: $(date -u +%H:%M:%S)"
