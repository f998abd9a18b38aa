#!/bin/bash
# The north-rule deployment path: the engine as a packaged jar under
# spark-submit. On a real cluster swap --master local[8] for the cluster
# master (yarn / k8s / spark://...) and size --num-executors; the mains
# build their session via graft.core.Sessions.localBuilder, which DEFERS to
# any spark-submit-injected master/conf (a hardcoded .master would silently
# override --master and run local on the driver node).
#   tools/spark_submit_demo.sh [main] [args...]
# e.g. tools/spark_submit_demo.sh graft.Verify /root/testdata/sf0.001 /tmp/submit_verify
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch package >/dev/null
MAIN="${1:-graft.Demo}"; shift || true
exec /opt/spark/bin/spark-submit \
  --master "${SPARK_GRAFT_MASTER:-local[8]}" \
  --driver-memory "${SPARK_DRIVER_MEM:-8g}" \
  --conf spark.sql.shuffle.partitions=8 \
  --conf spark.ui.enabled=false \
  --class "$MAIN" \
  target/scala-2.13/angelgraphspark_2.13-0.1.0.jar "$@"
