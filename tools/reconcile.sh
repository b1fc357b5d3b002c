#!/bin/bash
# Driver-artifact reconciliation (VERDICT r12 #8): diff a round's
# CORRECTNESS_r*.json against SparkEntry.queries, flag every key that is
# MISSING from the artifact or RED in it, and re-run exactly those through
# the standalone graft.Verify + tools/localcheck.py on the gate corpus —
# the one-command version of the r12 judging forensics (q_tpch_q21 absent,
# q_rolling_z blank: both driver-environment artifacts, both pass locally).
#
# Usage: tools/reconcile.sh [CORRECTNESS_rNN.json] [sfDir]
#   default artifact: the highest-numbered CORRECTNESS_r*.json in the repo
#   default sfDir:    /root/testdata/sf0.01 (the driver's gate corpus)
# Exit 0 iff the artifact is complete+green OR every flagged key passes the
# local re-check; nonzero when a flagged key fails locally too (a real bug).
set -u -o pipefail
cd "$(dirname "$0")/.."

ART=${1:-$(ls CORRECTNESS_r*.json 2>/dev/null | sort -V | tail -1)}
SF=${2:-/root/testdata/sf0.01}
[ -n "$ART" ] && [ -f "$ART" ] || { echo "[reconcile] no correctness artifact found"; exit 2; }

CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
JAVA="java $OPENS -Xmx8g -cp $CP"

echo "[reconcile] artifact: $ART   gate corpus: $SF"
expected=$($JAVA graft.Verify --list) || { echo "[reconcile] --list failed (compile first?)"; exit 2; }

flagged=$(python3 - "$ART" <<'EOF' | tr '\n' ',' | sed 's/,$//'
import json, sys
art = json.load(open(sys.argv[1]))
for k, v in sorted(art.items()):
    if not (v.get("rows_match") and v.get("schema_match") and v.get("hash_match")) or v.get("err"):
        print(k)
EOF
)
missing=$(comm -23 <(echo "$expected" | sort) <(python3 -c "import json,sys; [print(k) for k in sorted(json.load(open('$ART')))]" | sort) | tr '\n' ',' | sed 's/,$//')

both="$flagged${flagged:+${missing:+,}}$missing"
if [ -z "$both" ]; then
  echo "[reconcile] $ART is complete and green against $(echo "$expected" | wc -l) registered queries — nothing to re-run"
  exit 0
fi
echo "[reconcile] missing from artifact: ${missing:-none}"
echo "[reconcile] red in artifact:       ${flagged:-none}"

OUT=$(mktemp -d /tmp/graft_reconcile.XXXX)
echo "[reconcile] re-running through standalone Verify -> $OUT"
$JAVA graft.Verify "$SF" "$OUT" "$both" || { echo "[reconcile] Verify FAILED (dropped key reproduces locally)"; exit 1; }
if python3 tools/localcheck.py --allow-missing "$SF" "$OUT"; then
  echo "[reconcile] all flagged keys PASS the local gate — driver-environment blemish, not a code bug"
  exit 0
else
  echo "[reconcile] flagged key FAILS locally too — real divergence, fix before round close"
  exit 1
fi
