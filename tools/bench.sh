#!/bin/bash
# Bench isolation protocol (VERDICT r11 #4) — the repo-recorded version of
# what previously lived only in session notes: solo/sweep numbers are only
# trustworthy when this JVM owns the 32 local cores. The r10 verdict chased
# a q_lsh_curve "regression" that was partly a concurrent driver JVM.
#
#   - REFUSES to start while another java process is alive (override with
#     BENCH_FORCE=1, which the JSON's contention marker will then expose).
#   - Pins the recorded protocol: fresh JVM, median of SPARK_GRAFT_PASSES=3
#     sweep passes, solo children at -Xmx8g with 2-3 agreement launches
#     (all enforced inside graft.Bench; this wrapper just launches clean).
#   - graft.Bench itself writes the machine-load marker ("contention":
#     other_jvms_start/load1_start/load1_end) into the JSON line, so a
#     contended run is self-evident in BENCH_r*.json.
#
# Usage: tools/bench.sh [out.json]      SF=... (default /root/testdata/sf0.1)
set -u -o pipefail
cd "$(dirname "$0")/.."

SF=${SF:-/root/testdata/sf0.1}
OUT=${1:-bench_last.json}
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

if [ "${BENCH_FORCE:-0}" != "1" ]; then
  # No `|| echo 0` fallback: when nothing matches, pgrep -c still PRINTS
  # "0" before exiting 1, so the fallback emitted "0\n0" and broke the
  # -gt test (ADVICE r12). An empty capture (pgrep absent) defaults to 0.
  others=$(pgrep -c java 2>/dev/null); others=${others:-0}
  if [ "$others" -gt 0 ]; then
    echo "[bench.sh] REFUSING to start: $others java process(es) already running" >&2
    pgrep -a java | head -5 >&2
    echo "[bench.sh] stop them (e.g. the sbt session) or rerun with BENCH_FORCE=1" >&2
    exit 3
  fi
fi

SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
SPARK_GRAFT_PASSES=${SPARK_GRAFT_PASSES:-3} \
java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx${BENCH_HEAP:-24g} -cp "$CP" graft.Bench | tail -1 | tee "$OUT"
