#!/bin/bash
# Standing decade-stress gate (r10 VERDICT #8; SURVEY §6): one command that
# builds the three StressGen corpora over sf0.1 and verifies every
# fact-scanning oracle query EXACT against the DuckDB oracle at decade
# scale. Fails loud (nonzero) on any divergence, so new operators get
# decade coverage by default instead of by discipline.
#
# Usage: tools/stress.sh [numeric] [events] [docs]     (default: all three)
#   SF=...    source SF dir      (default /root/testdata/sf0.1)
#   WORK=...  scratch dir        (default /root/repo/stress)
#   FACTOR_NUMERIC/FACTOR_EVENTS/FACTOR_DOCS  replication factors
#             (default 100 each — one decade past the r9 10x stress)
#
# NOT run concurrently with Bench (shared cores inflate timings); stress is
# a correctness gate, so concurrent Verify runs are safe but slow.
set -u -o pipefail
cd "$(dirname "$0")/.."

SF=${SF:-/root/testdata/sf0.1}
WORK=${WORK:-stress}
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
JAVA="java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g -cp $CP"
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}

MODES=${*:-numeric events docs}
FACTOR_NUMERIC=${FACTOR_NUMERIC:-100}
FACTOR_EVENTS=${FACTOR_EVENTS:-100}
FACTOR_DOCS=${FACTOR_DOCS:-100}

# Oracle map dump (no queries run, no Spark): feeds the per-mode
# selection. The old `__dump_only__` subset sentinel is gone — the r12
# reconcile hardening rightly fails any requested-but-unknown key, so
# the dump is its own explicit Verify mode now.
$JAVA graft.Verify --dump-oracles "$WORK/_oracles" >/dev/null 2>&1 \
  || { echo "[stress] oracle dump failed"; exit 1; }

fail=0
for mode in $MODES; do
  case $mode in
    numeric) factor=$FACTOR_NUMERIC ;;
    events)  factor=$FACTOR_EVENTS ;;
    docs)    factor=$FACTOR_DOCS ;;
    *) echo "[stress] unknown mode $mode"; exit 2 ;;
  esac
  corpus="$WORK/${mode}_x${factor}"
  out="$WORK/${mode}_x${factor}_out"
  queries=$(python3 tools/stress_select.py "$WORK/_oracles/oracle_sql.json" "$mode")
  n=$(echo "$queries" | tr ',' '\n' | grep -c .)
  echo "[stress] mode=$mode factor=$factor queries=$n"
  $JAVA graft.StressGen "$SF" "$corpus" "$factor" "$mode" \
    || { echo "[stress] $mode: StressGen FAILED"; fail=1; continue; }
  rm -rf "$out"
  $JAVA graft.Verify "$corpus" "$out" "$queries" 2> >(grep -E "\[verify\]" >&2) \
    || { echo "[stress] $mode: Verify FAILED"; fail=1; continue; }
  # Reconcile requested vs produced (ADVICE r11): Verify catches per-query
  # exceptions and exits 0, and --allow-missing would reclassify a crashed
  # query's missing result dir as benign subset mode — so a decade-scale
  # crash could silently drop out of the gate. Any requested-but-missing
  # query fails the mode BEFORE localcheck runs.
  dropped=$(echo "$queries" | tr ',' '\n' | grep . | while read -r q; do
      [ -d "$out/$q" ] || echo "$q"; done)
  if [ -n "$dropped" ]; then
    echo "[stress] mode=$mode: CRASHED at ${factor}x (requested but no result dir):"
    echo "$dropped" | sed 's/^/[stress]   /'
    fail=1; continue
  fi
  if python3 tools/localcheck.py --allow-missing "$corpus" "$out" \
      | tee "$WORK/${mode}_x${factor}.log" | tail -1; then
    echo "[stress] mode=$mode: EXACT at ${factor}x"
  else
    echo "[stress] mode=$mode: DIVERGENCE at ${factor}x — see $WORK/${mode}_x${factor}.log"
    fail=1
  fi
done
exit $fail
