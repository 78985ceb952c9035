#!/bin/bash
# Multi-JVM registry run — the first execution with a REAL executor
# boundary (r11 verdict ask #1). Runs graft.Verify under Spark's
# in-repo pseudo-cluster master `local-cluster[2,16,4096]`: one driver
# JVM plus TWO separately-spawned executor JVMs, so typed-fold
# serialization, broadcasts, and localCheckpoint block placement all
# actually cross a process boundary (local[32] structurally cannot
# show that class of bug).
#
# Usage: tools/run_multijvm.sh [SF_DIR] [OUT_DIR]
#   then: python3 tools/check.py SF_DIR OUT_DIR   (expect 145 ok)
#
# Notes:
#  - SPARK_SCALA_VERSION must be set: the executor launcher
#    (launcher/AbstractCommandBuilder.getScalaVersion) otherwise looks
#    for a source-build directory and dies with "Cannot find any build
#    directories" — normally load-spark-env.sh sets it, but the
#    in-process Worker never sources that.
#  - Executors get the graft classes via spark.executor.extraClassPath
#    (they are spawned from SPARK_HOME, not from our -cp).
#  - GRAFT_MJVM_SPEC overrides the cluster shape.
set -u
SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/verify_mjvm}"
SPEC="${GRAFT_MJVM_SPEC:-local-cluster[2,16,4096]}"
rm -rf "$OUT"
SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
GRAFT_MASTER="$SPEC" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
GRAFT_SPARK_OPTS="-Dspark.executor.extraClassPath=/tmp/graft_classes ${GRAFT_SPARK_OPTS:-}" \
  exec tools/run_graft.sh graft.Verify "$SF" "$OUT"
