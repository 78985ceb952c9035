#!/bin/bash
# Kill-an-executor demonstration for spark.graft.reliableCheckpoint
# (r11 verdict ask #2): graft.MultiJvmDemo under local-cluster[2,4,2048]
# force-kills one executor JVM between snapshot and consume, then
# requires the answer unchanged. Prints MJVM_DEMO ok ... on success.
# Usage: tools/run_multijvm_demo.sh
set -u
SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
GRAFT_SPARK_OPTS="-Dspark.executor.extraClassPath=${GRAFT_CLASSES:-/tmp/graft_classes} ${GRAFT_SPARK_OPTS:-}" \
  exec tools/run_graft.sh graft.MultiJvmDemo
