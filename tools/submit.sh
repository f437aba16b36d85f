#!/usr/bin/env bash
# Production launch: ship the engine to a cluster via spark-submit --py-files
# (the packaging path the north rule names). `get_spark` also auto-ships the
# same zip through addPyFile for library/driver-script use, so executors can
# import osm_hadoop_spark inside Arrow UDF workers either way.
#
# Usage: tools/submit.sh <job.py> [job args...]
#   MASTER=yarn|spark://...|local[32]   (default local[32])
#   EXECUTORS / EXEC_CORES / EXEC_MEM   sizing knobs (cluster masters)
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
JOB="${1:?usage: submit.sh <job.py> [args...]}"; shift || true

ZIP="$(python - <<EOF
import sys
sys.path.insert(0, "${REPO}")
from osm_hadoop_spark.session import build_pyfiles_zip
print(build_pyfiles_zip())
EOF
)"

exec spark-submit \
  --master "${MASTER:-local[32]}" \
  ${EXECUTORS:+--num-executors "$EXECUTORS"} \
  ${EXEC_CORES:+--executor-cores "$EXEC_CORES"} \
  ${EXEC_MEM:+--executor-memory "$EXEC_MEM"} \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --py-files "$ZIP" \
  "$JOB" "$@"
