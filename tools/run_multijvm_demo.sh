#!/bin/bash
# Kill-an-executor demonstrations for spark.graft.reliableCheckpoint
# (r11 verdict ask #2; r12 missing #3): graft.MultiJvmDemo under
# local-cluster[2,4,2048] force-kills one executor JVM at a chosen
# placement, then requires the answer unchanged. Prints
# MJVM_DEMO ok mode=... on success.
# Usage: tools/run_multijvm_demo.sh [snapshot|midserve|m4]
#   snapshot (default) — kill between snapshot and consume
#   midserve           — kill while the consuming stage is running
#   m4                 — kill mid-serve inside the REAL m4 sequential
#                        fork serve (stage retry x checkpoint re-read)
set -u
MODE="${1:-snapshot}"
SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
GRAFT_SPARK_OPTS="-Dspark.executor.extraClassPath=${GRAFT_CLASSES:-/tmp/graft_classes} ${GRAFT_SPARK_OPTS:-}" \
  exec tools/run_graft.sh graft.MultiJvmDemo "$MODE"
