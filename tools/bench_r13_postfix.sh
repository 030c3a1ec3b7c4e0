#!/bin/bash
# Round-13 post-fix leg: re-measures, in ONE fresh JVM per SF, exactly
# the rows the segmented window flagged plus their stage context, after
# the two fixes landed (SHUFFLE_HASH verify joins; q44/q45 added to the
# neardup stage registry). These are the fresh-JVM isolated numbers the
# r12 verdict asked flags to be judged on — same-session, same host,
# same data as bench/BENCH_r13_sf{1,10}.json.
# Then the two LookupBench legs (incl. the new relation_meta probe).
set -u
cd /root/repo
ONLY=q21_token_counts,q25_minhash_pairs,q27_ngram_jaccard
ONLY=$ONLY,q44_dedup_survivors,q45_curate_funnel,q92_knn_graph
ONLY=$ONLY,q100_training_build,q107_image_decode,q154_containment_dedup
ONLY=$ONLY,q181_shipping_priority,q193_prefix_filter_join,q198_dsir_select

run_leg() { # $1=sfdir $2=name
  echo "[postfix] $2 start: $(date -u +%H:%M:%S)"
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
    SPARK_GRAFT_BENCH_ONLY="$ONLY" \
    SPARK_GRAFT_BENCH_PROGRESS="/tmp/bench_r13_postfix_$2.progress.jsonl" \
    sbt -batch 'runMain graft.Bench' \
    > "/tmp/bench_r13_postfix_$2.stdout" 2>"/tmp/bench_r13_postfix_$2.stderr"
  grep -F '"metric"' "/tmp/bench_r13_postfix_$2.stdout" | head -1 \
    > "bench/BENCH_r13_$2_postfix.json"
}
commit_artifact() {
  for i in 1 2 3 4 5; do
    git add "$@" && \
    git commit -m "Bench artifacts: $*

No-Verification-Needed: bench-artifact JSON only" -- "$@" && return 0
    sleep 10
  done
}

run_leg /tmp/graft_sf1  sf1
run_leg /tmp/graft_sf10 sf10
[ -s bench/BENCH_r13_sf1_postfix.json ] && \
  commit_artifact bench/BENCH_r13_sf1_postfix.json \
    bench/BENCH_r13_sf10_postfix.json tools/bench_r13_postfix.sh

run_lookup() { # $1=sfdir $2=name
  echo "[postfix] lookup $2 start: $(date -u +%H:%M:%S)"
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
echo "[postfix] done: $(date -u +%H:%M:%S)"
