#!/bin/bash
# Fresh-JVM per-query bench: each invocation runs graft.Bench in child
# mode (SPARK_GRAFT_ONLY + SPARK_GRAFT_RESULT_FILE) in its own JVM with
# the same flags build.sbt passes, so every measure starts from a cold
# heap — the r7+ standard for settling over-2x entries.
# Usage: tools/fresh_bench.sh <comma-separated-query-names> <n-runs> [sfdir]
set -e
QUERIES="$1"
N="${2:-6}"
SFDIR="${3:-/root/testdata/sf0.1}"
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
cd /root/repo
for i in $(seq 1 "$N"); do
  OUT=$(mktemp /tmp/fresh_bench.XXXXXX)
  SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_ONLY="$QUERIES" \
  SPARK_GRAFT_RESULT_FILE="$OUT" \
  java $ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-8g} \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.Bench >/tmp/fresh_bench_stdout.log 2>/tmp/fresh_bench_stderr.log \
    || { echo "run $i FAILED (see /tmp/fresh_bench_stderr.log)"; exit 1; }
  echo "run $i: $(tr '\n' ' ' < "$OUT")"
  rm -f "$OUT"
done
