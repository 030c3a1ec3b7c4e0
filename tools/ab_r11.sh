#!/bin/bash
# Round-11 isolation A/B: are the sf1 outlier rows (q100/q193/q141 ~2x
# vs the r10 window; q47/q48 suspected host noise) caused by this
# round's code (exact-measure broadcast gate) or by ambient host drift?
#
# Method: same host window, back to back, same JVM settings as the
# suite legs — run ONLY the outlier rows at sf1 on HEAD, then on the
# r10 tag (3e87bf2) checked out in a throwaway worktree. A row that is
# ~2x on HEAD but r10-speed on the old code is a code regression; a row
# inflated on BOTH is host drift.
set -u
QUERIES="q100_training_build,q109_semantic_dedup,q141_lsh_tuning,q193_prefix_filter_join,q42_embedding_neardup,q47_buffered_extract,q48_relation_geometry,q52_pbf_roundtrip"
SF=/tmp/graft_sf1

cd /root/repo
echo "[ab] HEAD leg start: $(date -u +%H:%M:%S)"
SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
  SPARK_GRAFT_BENCH_ONLY=$QUERIES \
  sbt -batch 'runMain graft.Bench' \
  > /tmp/ab_r11_head.stdout 2> /tmp/ab_r11_head.stderr

if [ ! -d /tmp/ab_r10_code ]; then
  git worktree add --detach /tmp/ab_r10_code 3e87bf2
fi
cd /tmp/ab_r10_code
echo "[ab] r10 leg start: $(date -u +%H:%M:%S)"
SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
  SPARK_GRAFT_BENCH_ONLY=$QUERIES \
  sbt -batch 'runMain graft.Bench' \
  > /tmp/ab_r11_r10code.stdout 2> /tmp/ab_r11_r10code.stderr
echo "[ab] done: $(date -u +%H:%M:%S)"
grep -F '"metric"' /tmp/ab_r11_head.stdout | head -1
grep -F '"metric"' /tmp/ab_r11_r10code.stdout | head -1
