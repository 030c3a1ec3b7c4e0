#!/bin/bash
# Round-14 follow-up window (runs AFTER tools/bench_r14.sh):
#   1. sf30 uncontended twins of the rows the r13 sf30 leg measured
#      while the driver's graded leg was running on the same host
#      (q100/q154 — the landed-but-contended heavy rows).
#   2. Full segmented sf1 + sf10 windows (8 JVMs each, isolation
#      re-measure of flagged rows) for round-over-round per-row
#      comparability with BENCH_r13_sf{1,10}.json.
# Every leg runs under a HARD timeout so the window cannot collide
# with round close (r13 verdict #1a).
set -u
cd /root/repo
export SPARK_GRAFT_OSM_MAT_DIR=${SPARK_GRAFT_OSM_MAT_DIR:-/tmp/graft_osm_mat}
mkdir -p "$SPARK_GRAFT_OSM_MAT_DIR"

commit_artifact() { # $1..: paths
  for i in 1 2 3 4 5; do
    git add "$@" && \
    git commit -m "Bench artifacts: $*

No-Verification-Needed: bench-artifact JSON only" -- "$@" && return 0
    sleep 10
  done
  echo "[bench_r14b] WARN: commit of $* failed" >&2
}

echo "[bench_r14b] sf30 contended-twin leg: $(date -u +%H:%M:%S)"
timeout 3600 env \
  SPARK_GRAFT_SF_DIR=/tmp/graft_sf30 SPARK_GRAFT_CPUS=32 \
  SPARK_DRIVER_MEM=24g \
  SPARK_GRAFT_BENCH_ONLY=q100_training_build,q154_containment_dedup \
  SPARK_GRAFT_BENCH_PROGRESS=/tmp/bench_r14_sf30b.progress.jsonl \
  sbt -batch 'runMain graft.Bench' \
  > /tmp/bench_r14_sf30b.stdout 2>/tmp/bench_r14_sf30b.stderr
grep -F '"metric"' /tmp/bench_r14_sf30b.stdout | head -1 \
  > bench/BENCH_r14_spot_sf30b.json
[ -s bench/BENCH_r14_spot_sf30b.json ] && \
  commit_artifact bench/BENCH_r14_spot_sf30b.json

echo "[bench_r14b] sf1 segmented window: $(date -u +%H:%M:%S)"
timeout 3600 bash tools/bench_seg.sh /tmp/graft_sf1 8 \
  bench/BENCH_r14_sf1.json
[ -s bench/BENCH_r14_sf1.json ] && commit_artifact bench/BENCH_r14_sf1.json

echo "[bench_r14b] sf10 segmented window: $(date -u +%H:%M:%S)"
timeout 10800 bash tools/bench_seg.sh /tmp/graft_sf10 8 \
  bench/BENCH_r14_sf10.json bench/BENCH_r14_sf1.json 6.0 10
[ -s bench/BENCH_r14_sf10.json ] && \
  commit_artifact bench/BENCH_r14_sf10.json

echo "[bench_r14b] window done: $(date -u +%H:%M:%S)"
