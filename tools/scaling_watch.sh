#!/bin/bash
# Run ScalingBench 'run' mode once per listed cpu level in fresh JVMs,
# sampling jstack of the forked JVM so degraded runs leave stack evidence.
set -u
OUT=${OUT:-/tmp/scalewatch}
mkdir -p "$OUT"
CORPUS=${CORPUS:-/tmp/kgscale16}
for c in "$@"; do
  tag="c${c}_$(date +%s)"
  ( SPARK_DRIVER_MEM=48g sbt -batch "runMain graft.ScalingBench run $CORPUS $c" \
      2>&1 | grep -a '"cpus"' > "$OUT/$tag.json" ) &
  SBT=$!
  i=0
  while kill -0 $SBT 2>/dev/null; do
    sleep 45
    i=$((i+1))
    PID=$(jps 2>/dev/null | grep ForkMain | awk '{print $1}' | head -1)
    [ -n "${PID:-}" ] && jstack "$PID" > "$OUT/${tag}_stack$i.txt" 2>/dev/null
  done
  wait $SBT
  cat "$OUT/$tag.json"
  rm -rf /dev/shm/graft-spark-local/* 2>/dev/null
done
