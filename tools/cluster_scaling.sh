#!/bin/bash
GRAFT_SHUFFLE_PARTS=32 /opt/spark/bin/spark-submit \
  --master spark://127.0.0.1:7077 --class graft.ScalingBench \
  --driver-memory 8g \
  --conf spark.cores.max=8 --conf spark.executor.cores=2 \
  --conf spark.executor.memory=10g \
  --conf spark.local.dir=/dev/shm/graft-cluster \
  --conf spark.ui.enabled=false \
  /root/repo/target/scala-2.13/reachspark_2.13-0.1.0.jar cluster /tmp/kgscale_r2v2 2 \
  > /tmp/submit_n4.out 2> /tmp/submit_n4b.log
echo done >> /tmp/submit_n4.out
# Full recipe:
#   sbt -batch package
#   /opt/spark/sbin/start-master.sh -h 127.0.0.1 -p 7077 --webui-port 8090
#   SPARK_WORKER_DIR=/dev/shm/spark-worker /opt/spark/sbin/start-worker.sh \
#     spark://127.0.0.1:7077 -c 8 -m 48g --webui-port 8091
#   run with spark.cores.max=2 (N = 1 executor), then =8 (4N = 4 executors)
