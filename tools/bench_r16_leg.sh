#!/bin/bash
# Round-16 isolated-leg runner: N fresh-JVM legs of the given query
# set (SPARK_GRAFT_BENCH_ONLY), per-leg JSON committed under
# bench/r16/, medians computed by tools/median_r16.py. This is the
# evidence discipline VERDICT r15 item 9 demands: every optimization
# claim ships with 3-leg isolated medians at 32 cores, per-leg
# artifacts committed.
#
# Usage: tools/bench_r16_leg.sh TAG "q1,q2,..." [NLEGS] [CPUS]
set -u
cd /root/repo
TAG=$1; QUERIES=$2; NLEGS=${3:-3}; CPUS=${4:-32}
SFDIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
export SPARK_GRAFT_OSM_MAT_DIR=${SPARK_GRAFT_OSM_MAT_DIR:-/tmp/graft_osm_mat}
mkdir -p "$SPARK_GRAFT_OSM_MAT_DIR" bench/r16
for i in $(seq 1 "$NLEGS"); do
  echo "[r16] $TAG leg $i/$NLEGS: $(date -u +%H:%M:%S)" >&2
  timeout 2400 env \
    SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS="$CPUS" \
    SPARK_DRIVER_MEM=24g SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
    SPARK_GRAFT_BENCH_PROGRESS=/tmp/bench_r16_${TAG}_$i.progress.jsonl \
    sbt -batch 'runMain graft.Bench' \
    > /tmp/bench_r16_${TAG}_$i.stdout 2>/tmp/bench_r16_${TAG}_$i.stderr
  grep -F '"metric"' /tmp/bench_r16_${TAG}_$i.stdout | head -1 \
    > "bench/r16/${TAG}_leg$i.json"
  [ -s "bench/r16/${TAG}_leg$i.json" ] || \
    echo "[r16] WARN $TAG leg $i produced no JSON" >&2
done
python3 tools/median_r16.py bench/r16/${TAG}_leg*.json
