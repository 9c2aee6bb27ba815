#!/bin/bash
set -u
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
OUT=${OUT:-/tmp/scale_fused}
mkdir -p $OUT
: > $OUT/results.txt
# 60s cooldown before each level so both measure from a comparable thermal state
for c in 2 8; do
  sleep 60
  echo "== cpus=$c ==" >> $OUT/results.txt
  java $ADD_OPENS -Xmx48g -XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing \
    -XX:ActiveProcessorCount=$c \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp "$CP" \
    graft.ScalingBench fused /tmp/kgscale_r2big $c 2 2> $OUT/run_c${c}.log \
    | grep -a '"rep"' >> $OUT/results.txt
  rm -rf /dev/shm/graft-spark-local/* /dev/shm/graft-ckpt-* 2>/dev/null
done
echo DONE > $OUT/done
