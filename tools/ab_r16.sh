#!/bin/bash
# Round-16 PAIRED A/B runner: alternates two env-variant legs
# (A,B,A,B,...) of the same query set so slow VM-weather drift hits
# both variants equally; tools/ab_pair.py then compares per-leg-pair
# ratios. This exists because single-leg medians on this VM swing up
# to 4x on byte-identical code (bench/r16/base_* legs).
#
# Usage: tools/ab_r16.sh TAG "q1,q2" NPAIRS "ENVA=val" "ENVB=val" [CPUS]
#   e.g. tools/ab_r16.sh pool "q38_...,q52_..." 3 \
#          "SPARK_GRAFT_COMMIT_POOL=4" "SPARK_GRAFT_COMMIT_POOL=1"
set -u
cd /root/repo
TAG=$1; QUERIES=$2; NPAIRS=$3; ENVA=$4; ENVB=$5; CPUS=${6:-32}
SFDIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
export SPARK_GRAFT_OSM_MAT_DIR=${SPARK_GRAFT_OSM_MAT_DIR:-/tmp/graft_osm_mat}
mkdir -p "$SPARK_GRAFT_OSM_MAT_DIR" bench/r16
run_leg() { # $1=variant-name $2=env-assignment $3=legno
  timeout 2400 env \
    SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS="$CPUS" \
    SPARK_DRIVER_MEM=24g SPARK_GRAFT_BENCH_ONLY="$QUERIES" "$2" \
    sbt -batch 'runMain graft.Bench' \
    > /tmp/ab_r16_${TAG}_$1_$3.stdout 2>/tmp/ab_r16_${TAG}_$1_$3.stderr
  grep -F '"metric"' /tmp/ab_r16_${TAG}_$1_$3.stdout | head -1 \
    > "bench/r16/ab_${TAG}_$1_leg$3.json"
}
for i in $(seq 1 "$NPAIRS"); do
  echo "[ab] $TAG pair $i A ($ENVA): $(date -u +%H:%M:%S)" >&2
  run_leg A "$ENVA" "$i"
  echo "[ab] $TAG pair $i B ($ENVB): $(date -u +%H:%M:%S)" >&2
  run_leg B "$ENVB" "$i"
done
python3 tools/ab_pair.py "bench/r16/ab_${TAG}" "$NPAIRS"
