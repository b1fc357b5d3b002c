#!/usr/bin/env python3
"""Select the oracle queries a stress mode must cover.

Usage: python3 tools/stress_select.py <oracle_sql.json> <numeric|events|docs>

Prints a comma-separated query list: every oracle whose SQL references a
table the mode replicates (other tables copy unchanged, so any query
touching a replicated fact sees decade-scale input). Derived from the
oracle text itself so NEW operators are covered by default — the r10
probes used hand-maintained lists, which silently under-cover additions.

Derby-backed copy_jdbc* queries are excluded: they spin an embedded
database per run and their workload (bulk JDBC load) is already
decade-covered by the plain copy_* rows that the selection keeps.
"""
import json
import re
import sys

MODE_TABLES = {
    "numeric": ["orders", "lineitem"],
    "events": ["events"],
    "docs": ["documents", "embeddings"],
}

# Queries whose OWN scale contract forbids running their gate-sized
# default config on a mode's replicated corpus. q_semdedup's documented
# contract is k growing with the corpus (k ~ sqrt(N)); at docs x100
# (200k vectors) the default k=8 implies ~2.5e9 within-cluster pairs and
# the operator's pair-ceiling guard REFUSES — by design (r12 VERDICT #3).
# Its decade tally runs separately at 10x with the default k (the r12
# protocol); excluding it here keeps the guard honest instead of
# force-flagging past it.
MODE_EXCLUDE = {
    "docs": {"q_semdedup"},
}


def main():
    oracle = json.load(open(sys.argv[1]))
    mode = sys.argv[2]
    tables = MODE_TABLES[mode]
    exclude = MODE_EXCLUDE.get(mode, set())
    pat = re.compile(r"\b(" + "|".join(tables) + r")\b", re.I)
    names = sorted(
        name for name, sql in oracle.items()
        if pat.search(sql) and not name.startswith("copy_jdbc")
        and name not in exclude)
    print(",".join(names))


if __name__ == "__main__":
    main()
