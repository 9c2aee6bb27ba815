#!/bin/bash
# Round-5 N vs 4N multi-executor gate on the round-5 binary: alternates
# 1-exec and 4-exec spark-submit runs of graft.ScalingBench `cluster` mode
# over the regenerated 1.12M-turn corpus, then the 10x-density skew corpus,
# appending tagged JSON lines. Standalone master/worker per
# tools/cluster_scaling.sh recipe.
set -u
OUT=${1:-/root/repo/BENCH/scaling_loop_r5.jsonl}
DENSE_OUT=${2:-/root/repo/BENCH/scaling_dense_r5.jsonl}
JAR=/root/repo/target/scala-2.13/reachspark_2.13-0.1.0.jar
submit() {
  local cores=$1 tag=$2 corpus=$3 out=$4
  GRAFT_SHUFFLE_PARTS=32 /opt/spark/bin/spark-submit \
    --master spark://127.0.0.1:7077 --class graft.ScalingBench \
    --driver-memory 8g \
    --conf spark.cores.max=$cores --conf spark.executor.cores=2 \
    --conf spark.executor.memory=10g \
    --conf spark.local.dir=/dev/shm/graft-cluster \
    --conf spark.ui.enabled=false \
    "$JAR" cluster "$corpus" 2 2>/dev/null |
    grep -a '"rep"' | sed "s/^{/{\"size\":\"$tag\",\"at\":\"$(date -u +%H:%M:%S)\",/" >> "$out"
}
for round in 1 2; do
  submit 2 N  /tmp/kgscale_r5 "$OUT";  sleep 45
  submit 8 4N /tmp/kgscale_r5 "$OUT";  sleep 45
done
submit 2 N  /tmp/kgdense_r5 "$DENSE_OUT"; sleep 45
submit 8 4N /tmp/kgdense_r5 "$DENSE_OUT"
echo DONE
