#!/bin/bash
# Segmented bench window: runs the suite in N forked JVMs (one per
# query segment — the r12 verdict's structural fix for JVM-aging
# confounds), merges the per-segment JSON lines into one artifact, and
# optionally re-measures every row that would FLAG vs a small-SF log in
# its own fresh JVM, folding the isolated numbers in as "isolated"
# (tools/slope.py then flags on those).
#
# Usage: tools/bench_seg.sh SFDIR NSEG OUT.json [SMALL_LOG] [FLAG_RATIO] [DATA_RATIO]
#   SFDIR      e.g. /tmp/graft_sf10
#   NSEG       forked-JVM segment count (8 keeps each JVM ~25 queries deep)
#   OUT.json   merged artifact path (committed as the round artifact)
#   SMALL_LOG  optional small-SF merged log; enables the isolation pass
#   FLAG_RATIO optional, default 6.0
#   DATA_RATIO optional data-volume step between the logs (10 for a
#              decade): rows at <= 1.2x it are corpus-linear, not
#              re-measured
set -u
cd /root/repo
SFDIR=$1; NSEG=$2; OUT=$3; SMALL=${4:-}; RATIO=${5:-6.0}; DR=${6:-}
TAG=$(basename "$SFDIR")_$$
CPUS=${SPARK_GRAFT_CPUS:-32}
MEM=${SPARK_DRIVER_MEM:-24g}
# one OSM bundle per host per sfdir, shared across segment JVMs
export SPARK_GRAFT_OSM_MAT_DIR=${SPARK_GRAFT_OSM_MAT_DIR:-/tmp/graft_osm_mat}
mkdir -p "$SPARK_GRAFT_OSM_MAT_DIR"

SEGS=()
for i in $(seq 1 "$NSEG"); do
  echo "[bench_seg] segment $i/$NSEG start: $(date -u +%H:%M:%S)" >&2
  SPARK_GRAFT_SF_DIR=$SFDIR SPARK_GRAFT_CPUS=$CPUS SPARK_DRIVER_MEM=$MEM \
    SPARK_GRAFT_BENCH_SEGMENT=$i/$NSEG \
    SPARK_GRAFT_BENCH_PROGRESS=/tmp/bench_seg_${TAG}_$i.progress.jsonl \
    sbt -batch 'runMain graft.Bench' \
    > /tmp/bench_seg_${TAG}_$i.stdout 2>/tmp/bench_seg_${TAG}_$i.stderr
  grep -F '"metric"' /tmp/bench_seg_${TAG}_$i.stdout | head -1 \
    > /tmp/bench_seg_${TAG}_$i.json
  if ! [ -s /tmp/bench_seg_${TAG}_$i.json ]; then
    echo "[bench_seg] segment $i produced no JSON — aborting" >&2
    exit 1
  fi
  SEGS+=(/tmp/bench_seg_${TAG}_$i.json)
done

python3 tools/bench_merge.py "${SEGS[@]}" > "$OUT"
echo "[bench_seg] merged window -> $OUT" >&2

if [ -n "$SMALL" ]; then
  DRARG=""
  [ -n "$DR" ] && DRARG="--data-ratio=$DR"
  mapfile -t FLAGGED < <(python3 tools/slope.py "$SMALL" "$OUT" "$RATIO" $DRARG --names-only)
  ISO=()
  for q in "${FLAGGED[@]}"; do
    [ -z "$q" ] && continue
    echo "[bench_seg] isolation re-measure: $q $(date -u +%H:%M:%S)" >&2
    SPARK_GRAFT_SF_DIR=$SFDIR SPARK_GRAFT_CPUS=$CPUS SPARK_DRIVER_MEM=$MEM \
      SPARK_GRAFT_BENCH_ONLY=$q \
      sbt -batch 'runMain graft.Bench' \
      > /tmp/bench_iso_${TAG}_${q//[^A-Za-z0-9]/_}.stdout \
      2>/tmp/bench_iso_${TAG}_${q//[^A-Za-z0-9]/_}.stderr
    grep -F '"metric"' /tmp/bench_iso_${TAG}_${q//[^A-Za-z0-9]/_}.stdout \
      | head -1 > /tmp/bench_iso_${TAG}_${q//[^A-Za-z0-9]/_}.json
    [ -s /tmp/bench_iso_${TAG}_${q//[^A-Za-z0-9]/_}.json ] && \
      ISO+=(--isolated "$q=/tmp/bench_iso_${TAG}_${q//[^A-Za-z0-9]/_}.json")
  done
  if [ ${#ISO[@]} -gt 0 ]; then
    python3 tools/bench_merge.py "${SEGS[@]}" "${ISO[@]}" > "$OUT"
    echo "[bench_seg] folded ${#FLAGGED[@]} isolated rows -> $OUT" >&2
  else
    echo "[bench_seg] no rows flagged; window numbers stand" >&2
  fi
fi
echo "[bench_seg] done: $(date -u +%H:%M:%S)" >&2
