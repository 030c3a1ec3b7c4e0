#!/bin/bash
# Round-14 bench window. Sequential legs, nothing else CPU-heavy may
# run concurrently (r13's graded sf0.1 leg was poisoned by the
# builder's own still-running sf30 job — verdict #1). Two defenses new
# this round: every leg runs under a HARD `timeout` so the window
# cannot outlive its schedule, and graft.Bench itself stamps artifacts
# "contended": true when it sees other live JVMs at leg start/end.
#
# Legs:
#   0. CLEAN single-JVM full-suite sf0.1 with driver-default env — the
#      committed twin of the driver's graded artifact (verdict #1c).
#   1-3. Stage-family + kNN-consumer spot legs at sf1 / sf10 / sf30:
#      three decades of slope evidence for the exact families a 100 TB
#      deployment pays for (verdict #3 fix measurement + #6), plus the
#      five rows the r13 sf30 leg lost to the round-end kill
#      (q200/q203/q41/q193/q198 — verdict #2).
#   4. (time-permitting, driven by bench_r14b.sh) full segmented
#      sf1+sf10 windows for round-over-round comparability.
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
  echo "[bench_r14] WARN: commit of $* failed" >&2
}

# ---- Leg 0: driver twin (driver-default env: no CPUS/MEM overrides,
# default SF dir). 35 min hard deadline (r12's clean run was ~6 min of
# query wall; the suite has only grown by stage rows since).
echo "[bench_r14] leg0 sf0.1 clean single-JVM suite: $(date -u +%H:%M:%S)"
timeout 2100 env \
  SPARK_GRAFT_BENCH_PROGRESS=/tmp/bench_r14_sf0.1.progress.jsonl \
  sbt -batch 'runMain graft.Bench' \
  > /tmp/bench_r14_sf0.1.stdout 2>/tmp/bench_r14_sf0.1.stderr
grep -F '"metric"' /tmp/bench_r14_sf0.1.stdout | head -1 \
  > bench/BENCH_r14_sf0.1.json
[ -s bench/BENCH_r14_sf0.1.json ] && \
  commit_artifact bench/BENCH_r14_sf0.1.json

# ---- Legs 1-3: stage family (all five stage rows, dependency-ordered
# by the registry) + the kNN graph consumers + the r13 sf30 dead five.
STAGES=stage:lsh_candidates,stage:neardup_pairs,stage:dedup_components
STAGES=$STAGES,stage:knn_edges,stage:bm25_dl
KNN=q92_knn_graph,q119_pagerank,q151_knn_triangles,q160_bfs_hops
DEAD5=q200_simhash_scalable,q203_simhash_candidates_default
DEAD5=$DEAD5,q41_simhash_bands,q193_prefix_filter_join,q198_dsir_select

spot() { # $1=sfdir $2=tag $3=only $4=deadline_sec
  echo "[bench_r14] spot $2 start: $(date -u +%H:%M:%S)"
  timeout "$4" env \
    SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
    SPARK_GRAFT_BENCH_ONLY="$3" \
    SPARK_GRAFT_BENCH_PROGRESS="/tmp/bench_r14_$2.progress.jsonl" \
    sbt -batch 'runMain graft.Bench' \
    > "/tmp/bench_r14_$2.stdout" 2>"/tmp/bench_r14_$2.stderr"
  grep -F '"metric"' "/tmp/bench_r14_$2.stdout" | head -1 \
    > "bench/BENCH_r14_$2.json"
  [ -s "bench/BENCH_r14_$2.json" ] && \
    commit_artifact "bench/BENCH_r14_$2.json"
}

spot /tmp/graft_sf1  spot_sf1  "$STAGES,$KNN"        1200
spot /tmp/graft_sf10 spot_sf10 "$STAGES,$KNN"        2700
spot /tmp/graft_sf30 spot_sf30 "$STAGES,$KNN,$DEAD5" 6000

echo "[bench_r14] window done: $(date -u +%H:%M:%S)"
