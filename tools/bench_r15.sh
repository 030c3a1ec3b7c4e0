#!/bin/bash
# Round-15 bench window. Sequential legs, nothing else CPU-heavy runs
# concurrently; every leg under a HARD timeout; graft.Bench stamps
# artifacts "contended" (now incl. non-JVM cpu-burners) and
# bench_merge propagates the stamps into merged artifacts (r14
# verdict #2).
#
# Legs, priority-ordered so a round-close kill still leaves evidence:
#   1. sf10 segmented window (8 JVMs) -> bench/BENCH_r15_sf10.json,
#      isolation pass vs the r14 sf1 window (same host; picks iso
#      candidates only).
#   2. LookupBench sf1 + sf10 -> bench/LOOKUP_r15_sf{1,10}.json
#      (r14 verdict #5: the store write path changed in r14 with no
#      lookup re-measure).
#   3. sf30 FULL segmented window (r14 verdict #3 — the suite's first
#      complete third decade) with INCREMENTAL merge + commit after
#      every segment, so partial windows survive; isolation pass vs
#      this session's sf10 at data-ratio 3 with the remaining time.
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
  echo "[bench_r15] WARN: commit of $* failed" >&2
}

# ---- Leg 1: sf10 segmented window ----
echo "[bench_r15] sf10 segmented window: $(date -u +%H:%M:%S)"
timeout 10800 bash tools/bench_seg.sh /tmp/graft_sf10 8 \
  bench/BENCH_r15_sf10.json bench/BENCH_r14_sf1.json 6.0 10
[ -s bench/BENCH_r15_sf10.json ] && \
  commit_artifact bench/BENCH_r15_sf10.json

# ---- Leg 2: point-lookup legs ----
run_lookup() { # $1=sfdir $2=name
  echo "[bench_r15] lookup $2 start: $(date -u +%H:%M:%S)"
  timeout 1500 env \
    SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
    sbt -batch 'runMain graft.LookupBench' \
    > "/tmp/lookup_r15_$2.stdout" 2> "/tmp/lookup_r15_$2.stderr"
  grep -F '"metric"' "/tmp/lookup_r15_$2.stdout" | head -1 \
    > "bench/LOOKUP_r15_$2.json"
  [ -s "bench/LOOKUP_r15_$2.json" ] && \
    commit_artifact "bench/LOOKUP_r15_$2.json"
}
run_lookup /tmp/graft_sf1  sf1
run_lookup /tmp/graft_sf10 sf10

# ---- Leg 3: sf30 full window, incremental merge + commit ----
# Global deadline guards round close; per-segment timeout bounds one
# runaway JVM. A timed-out/failed segment is SKIPPED (logged), the
# rest of the window still lands; bench_merge's `segments` count and
# the missing rows make a partial artifact self-evident.
NSEG=8
DEADLINE=$(( $(date +%s) + 13500 ))   # 3h45m for the whole leg
TAG=sf30_r15
SEGS=()
echo "[bench_r15] sf30 segmented window: $(date -u +%H:%M:%S)"
for i in $(seq 1 "$NSEG"); do
  left=$(( DEADLINE - $(date +%s) ))
  if [ "$left" -lt 300 ]; then
    echo "[bench_r15] sf30 deadline reached before segment $i" >&2
    break
  fi
  segto=$(( left < 4200 ? left : 4200 ))
  echo "[bench_r15] sf30 segment $i/$NSEG (timeout ${segto}s): $(date -u +%H:%M:%S)" >&2
  timeout "$segto" env \
    SPARK_GRAFT_SF_DIR=/tmp/graft_sf30 SPARK_GRAFT_CPUS=32 \
    SPARK_DRIVER_MEM=24g \
    SPARK_GRAFT_BENCH_SEGMENT=$i/$NSEG \
    SPARK_GRAFT_BENCH_PROGRESS=/tmp/bench_${TAG}_$i.progress.jsonl \
    sbt -batch 'runMain graft.Bench' \
    > /tmp/bench_${TAG}_$i.stdout 2>/tmp/bench_${TAG}_$i.stderr
  grep -F '"metric"' /tmp/bench_${TAG}_$i.stdout | head -1 \
    > /tmp/bench_${TAG}_$i.json
  if [ -s /tmp/bench_${TAG}_$i.json ]; then
    SEGS+=(/tmp/bench_${TAG}_$i.json)
    python3 tools/bench_merge.py "${SEGS[@]}" > bench/BENCH_r15_sf30.json
    commit_artifact bench/BENCH_r15_sf30.json
  else
    echo "[bench_r15] sf30 segment $i produced no JSON (timeout/crash) — skipped" >&2
  fi
done

# isolation pass for sf30 rows that flag vs this session's sf10, with
# whatever time remains (fresh-JVM re-measures, folded as "isolated";
# a contended iso file is refused by bench_merge)
if [ -s bench/BENCH_r15_sf30.json ] && [ -s bench/BENCH_r15_sf10.json ]; then
  mapfile -t FLAGGED < <(python3 tools/slope.py bench/BENCH_r15_sf10.json \
    bench/BENCH_r15_sf30.json 6.0 --data-ratio=3 --names-only)
  ISO=()
  for q in "${FLAGGED[@]}"; do
    [ -z "$q" ] && continue
    left=$(( DEADLINE + 1800 - $(date +%s) ))
    [ "$left" -lt 300 ] && break
    echo "[bench_r15] sf30 isolation re-measure: $q $(date -u +%H:%M:%S)" >&2
    qk=${q//[^A-Za-z0-9]/_}
    timeout $(( left < 2400 ? left : 2400 )) env \
      SPARK_GRAFT_SF_DIR=/tmp/graft_sf30 SPARK_GRAFT_CPUS=32 \
      SPARK_DRIVER_MEM=24g SPARK_GRAFT_BENCH_ONLY="$q" \
      sbt -batch 'runMain graft.Bench' \
      > /tmp/bench_iso_${TAG}_${qk}.stdout 2>/tmp/bench_iso_${TAG}_${qk}.stderr
    grep -F '"metric"' /tmp/bench_iso_${TAG}_${qk}.stdout | head -1 \
      > /tmp/bench_iso_${TAG}_${qk}.json
    [ -s /tmp/bench_iso_${TAG}_${qk}.json ] && \
      ISO+=(--isolated "$q=/tmp/bench_iso_${TAG}_${qk}.json")
  done
  if [ ${#ISO[@]} -gt 0 ]; then
    python3 tools/bench_merge.py "${SEGS[@]}" "${ISO[@]}" \
      > bench/BENCH_r15_sf30.json
    commit_artifact bench/BENCH_r15_sf30.json
  fi
fi
echo "[bench_r15] window done: $(date -u +%H:%M:%S)"
