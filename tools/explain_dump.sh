#!/bin/bash
# Dump explain("formatted") for the named queries to a directory:
#   tools/explain_dump.sh <outdir> <suffix> <query> [query...]
# Writes <outdir>/<query>_<suffix>.txt for each query. Uses the
# compiled classes directly (no sbt lock), SPARK_GRAFT_SF_DIR or
# sf0.01 by default.
set -e
OUTDIR="$1"; SUFFIX="$2"; shift 2
mkdir -p "$OUTDIR"
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
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.01}" \
java $ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-8g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.Explain "$@" > /tmp/explain_dump_raw.txt 2>/tmp/explain_dump_err.log
python3 - "$OUTDIR" "$SUFFIX" <<'EOF'
import sys, re
outdir, suffix = sys.argv[1], sys.argv[2]
raw = open('/tmp/explain_dump_raw.txt').read()
parts = re.split(r'\n========== (\S+) ==========\n', raw)
for i in range(1, len(parts), 2):
    name, body = parts[i], parts[i+1]
    with open(f'{outdir}/{name}_{suffix}.txt', 'w') as f:
        f.write(body)
    print(f'wrote {outdir}/{name}_{suffix}.txt ({len(body)} bytes)')
EOF
