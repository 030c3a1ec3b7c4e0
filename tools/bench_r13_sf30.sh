#!/bin/bash
# Round-13 third-decade spot leg (r12 verdict prescription #5): the 10
# heaviest sf10 rows + q154/q200/q203 (the scale-critical dedup
# defaults), one JVM, at sf30 (3x the second decade's data, generated
# by tools/gen_sf.py 300). Stage rows bill the shared builds once, so
# every row is marginal — compare against the SAME set's rows in the
# segmented sf10 artifact: per work-driver, 3x data must cost <= ~3x.
set -u
cd /root/repo
SPOT=q100_training_build,q193_prefix_filter_join,q154_containment_dedup
SPOT=$SPOT,q135_video_decode,q41_simhash_bands,q119_pagerank
SPOT=$SPOT,q200_simhash_scalable,q198_dsir_select,q107_image_decode
SPOT=$SPOT,q163_thumbnail_resize,q203_simhash_candidates_default

echo "[bench_r13_sf30] spot leg start: $(date -u +%H:%M:%S)"
SPARK_GRAFT_SF_DIR=/tmp/graft_sf30 SPARK_GRAFT_CPUS=32 \
  SPARK_DRIVER_MEM=24g SPARK_GRAFT_BENCH_ONLY="$SPOT" \
  SPARK_GRAFT_BENCH_PROGRESS=/tmp/bench_r13_sf30.progress.jsonl \
  sbt -batch 'runMain graft.Bench' \
  > /tmp/bench_r13_sf30.stdout 2>/tmp/bench_r13_sf30.stderr
grep -F '"metric"' /tmp/bench_r13_sf30.stdout | head -1 \
  > bench/BENCH_r13_sf30_spot.json
echo "[bench_r13_sf30] done: $(date -u +%H:%M:%S)"
if [ -s bench/BENCH_r13_sf30_spot.json ]; then
  for i in 1 2 3 4 5; do
    git add bench/BENCH_r13_sf30_spot.json && \
    git commit -m "Bench artifact: sf30 spot leg (third decade, heaviest rows)

No-Verification-Needed: bench-artifact JSON only" \
      -- bench/BENCH_r13_sf30_spot.json && break
    sleep 10
  done
fi
