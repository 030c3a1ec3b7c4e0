#!/bin/bash
# Round-16 plan evidence: before/after plans for every touched lever,
# generated from ONE binary via the A/B env knobs (before = old
# behavior via knob), so the dumps are exactly the code the bench ran.
set -u
cd /root/repo
mkdir -p plans/r16
SF=${1:-/root/testdata/sf0.1}
run_explain() { # $1=outfile $2=queries $3...=env
  timeout 900 env "${@:3}" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
    SPARK_GRAFT_OSM_MAT_DIR=/tmp/graft_osm_mat \
    sbt -batch "runMain graft.Explain $SF $2" 2>/dev/null \
    | sed -n '/^====/,$p' > "$1"
  echo "$1: $(wc -l < "$1") lines"
}
run_wpd() { # $1=outfile $2=query $3...=env
  timeout 900 env "${@:3}" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
    SPARK_GRAFT_OSM_MAT_DIR=/tmp/graft_osm_mat \
    sbt -batch "runMain graft.tools.WritePlanDump $SF $2 $1" 2>/dev/null \
    | tail -1
}
# widen family: read-side plans (the exchange below the kernel)
run_explain plans/r16/q200_simhash_scalable_before.txt q200_simhash_scalable SPARK_GRAFT_WIDEN=0
run_explain plans/r16/q200_simhash_scalable_after.txt  q200_simhash_scalable SPARK_GRAFT_WIDEN=1
run_explain plans/r16/q198_dsir_select_before.txt q198_dsir_select SPARK_GRAFT_WIDEN=0
run_explain plans/r16/q198_dsir_select_after.txt  q198_dsir_select SPARK_GRAFT_WIDEN=1
# q193: persist (after has InMemoryRelation over ONE shingle subtree)
run_explain plans/r16/q193_prefix_filter_join_after.txt q193_prefix_filter_join SPARK_GRAFT_WIDEN=1
# vstore width: WRITE-side plans (the r15 evidence gap) at two SFs
run_wpd plans/r16/q197_writes_session_before.txt q197_version_history SPARK_GRAFT_VT_WIDTH=session
run_wpd plans/r16/q197_writes_explicit_after.txt q197_version_history SPARK_GRAFT_VT_WIDTH=explicit
run_wpd plans/r16/q50_writes_explicit_after.txt q50_bucketed_roundtrip SPARK_GRAFT_VT_WIDTH=explicit
# expand floor: WRITE-side plans for the q52 pipeline at two SFs
run_wpd plans/r16/q52_writes_floor1_before.txt q52_pbf_roundtrip SPARK_GRAFT_EXPAND_FLOOR=one
run_wpd plans/r16/q52_writes_floor16mb_after.txt q52_pbf_roundtrip SPARK_GRAFT_EXPAND_FLOOR=data
SF=/root/testdata/sf0.01
run_wpd plans/r16/q52_writes_floor16mb_after_sf0.01.txt q52_pbf_roundtrip SPARK_GRAFT_EXPAND_FLOOR=data
echo done
