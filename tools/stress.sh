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
#   FACTOR_HEAVY  reduced factor for the oracle-heavy family (default 10;
#             see tools/stress_select.py — the DuckDB side of the
#             hyperplane-LSH kNN oracles cannot complete at x100 on this
#             machine, judge-reproduced in r13, so that family's decade
#             tally runs BOTH sides at x10, recorded, not skipped)
#   TALLY_TIMEOUT/TALLY_JOBS  per-query oracle budget (default 1800s / 4)
#
# The DuckDB compare runs through tools/tally.py: one subprocess per
# query with a memory limit and temp spill dir, one JSON verdict line
# appended per query (resumable — rerunning a crashed gate resumes where
# it stopped instead of losing the whole tally, the r13 failure mode).
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
FACTOR_HEAVY=${FACTOR_HEAVY:-10}
TALLY_TIMEOUT=${TALLY_TIMEOUT:-1800}
TALLY_JOBS=${TALLY_JOBS:-4}

# Disk preflight (VERDICT r13 #3: the driver window filled the disk and
# three shuffles died mid-write as silent-looking test failures). A
# decade corpus + results + DuckDB spill needs real headroom; fail loud
# BEFORE burning an hour.
free_gb=$(df -BG --output=avail . | tail -1 | tr -dc 0-9)
if [ "$free_gb" -lt 25 ]; then
  echo "[stress] only ${free_gb}G free on $(pwd) — need >=25G; clean up first"
  exit 3
fi

# Oracle map dump (no queries run, no Spark): feeds the per-mode
# selection. The old `__dump_only__` subset sentinel is gone — the r12
# reconcile hardening rightly fails any requested-but-unknown key, so
# the dump is its own explicit Verify mode now.
$JAVA graft.Verify --dump-oracles "$WORK/_oracles" >/dev/null 2>&1 \
  || { echo "[stress] oracle dump failed"; exit 1; }

# One pass: corpus at $3, Spark verify of $4's queries, per-query tally.
# A completion marker ($corpus/_stressgen_done) makes the corpus build
# idempotent — a resumed gate reuses the replica instead of regenerating.
run_pass() {
  local mode=$1 factor=$2 queries=$3 tag=$4
  local corpus="$WORK/${mode}_x${factor}"
  local out="$WORK/${mode}_x${factor}_out${tag}"
  local n; n=$(echo "$queries" | tr ',' '\n' | grep -c .)
  if [ "$n" -eq 0 ]; then return 0; fi
  echo "[stress] mode=$mode$tag factor=$factor queries=$n"
  if [ ! -f "$corpus/_stressgen_done" ]; then
    $JAVA graft.StressGen "$SF" "$corpus" "$factor" "$mode" \
      || { echo "[stress] $mode: StressGen FAILED"; return 1; }
    touch "$corpus/_stressgen_done"
  fi
  $JAVA graft.Verify "$corpus" "$out" "$queries" 2> >(grep -E "\[verify\]" >&2) \
    || { echo "[stress] $mode$tag: Verify FAILED"; return 1; }
  # Reconcile requested vs produced (ADVICE r11): Verify catches per-query
  # exceptions and exits 0, and --allow-missing would reclassify a crashed
  # query's missing result dir as benign subset mode — so a decade-scale
  # crash could silently drop out of the gate. tally.py records any
  # targeted-but-missing query as a hard "missing" verdict line.
  if python3 tools/tally.py "$corpus" "$out" --queries "$queries" \
      --timeout "$TALLY_TIMEOUT" --jobs "$TALLY_JOBS" \
      | tee "$WORK/${mode}_x${factor}${tag}.log" | grep -E "^\[tally\] (summary|NOT-EXACT)"; then
    echo "[stress] mode=$mode$tag: EXACT at ${factor}x"
    return 0
  else
    echo "[stress] mode=$mode$tag: DIVERGENCE at ${factor}x — see $WORK/${mode}_x${factor}${tag}.log and $out/_tally.jsonl"
    return 1
  fi
}

fail=0
for mode in $MODES; do
  case $mode in
    numeric) factor=$FACTOR_NUMERIC ;;
    events)  factor=$FACTOR_EVENTS ;;
    docs)    factor=$FACTOR_DOCS ;;
    *) echo "[stress] unknown mode $mode"; exit 2 ;;
  esac
  light=$(python3 tools/stress_select.py "$WORK/_oracles/oracle_sql.json" "$mode" light)
  heavy=$(python3 tools/stress_select.py "$WORK/_oracles/oracle_sql.json" "$mode" heavy)
  run_pass "$mode" "$factor" "$light" "" || fail=1
  run_pass "$mode" "$FACTOR_HEAVY" "$heavy" "_heavy" || fail=1
done
exit $fail
