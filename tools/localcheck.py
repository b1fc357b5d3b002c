#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/localcheck.py [sfDir] [outDir]

Reads each <outDir>/<name> parquet written by graft.Verify, runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same sfDir tables,
and compares: row count, column names, dtypes (strict, after widening small
ints to int64 on both sides — the only representation-neutral coercion), and
exact values after sorting columns by name. Exit 0 iff everything matches.
"""
import json
import re
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


INT_WIDEN = {"int8", "int16", "int32", "uint8", "uint16", "uint32"}


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.reset_index(drop=True)
    # Benign widening ONLY: small ints -> int64 (identical value rendering).
    # Anything else (e.g. DuckDB HUGEINT -> float64 vs Spark int64) must
    # FAIL here, because the driver's hash is representation-sensitive.
    for c in df.columns:
        if str(df[c].dtype) in INT_WIDEN:
            df[c] = df[c].astype("int64")
    return df


def round_lint(oracle):
    """round()-on-DOUBLE is not engine-version-stable (the r7 q_cov_matrix
    red row: DuckDB changed DOUBLE round tie behavior across versions).
    House style for new oracles is floor(x*1e6 + 0.5)/1e6 or DECIMAL
    rounding. Existing driver-green oracles are frozen in
    tools/round_allowlist.txt; any NEW oracle using round( fails here."""
    allow_path = os.path.join(os.path.dirname(__file__), "round_allowlist.txt")
    allowed = set()
    if os.path.exists(allow_path):
        allowed = {ln.strip() for ln in open(allow_path) if ln.strip()}
    return sorted(k for k, v in oracle.items()
                  if re.search(r"round\(", v, re.I) and k not in allowed)


def connect(sf_dir: str):
    """One DuckDB connection with the corpus tables mounted as views."""
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table: a DIRECTORY of part files (StressGen
            # output); plain files are the driver-generated layout.
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def compare_one(con, name: str, result_dir: str, sql):
    """Compare one Spark result dir against its oracle SQL.

    Returns (status, msg): status is "exact" (oracle matched),
    "rows-only" (no oracle, non-empty result), or "fail". The compare
    semantics are the driver gate's: column names, strict dtypes after
    small-int widening, exact values after sorting columns by name.
    tools/tally.py runs this per-query in an isolated subprocess; main()
    below runs it in the classic one-process full-gate loop.
    """
    files = glob.glob(f"{result_dir}/*.parquet")
    if not files:
        return ("fail", "no parquet output")
    got = pd.read_parquet(result_dir)
    if sql is None:
        if len(got) == 0:
            return ("fail", "VACUOUS: rows-only query returned 0 rows")
        return ("rows-only", f"rows-only: {len(got)} rows")
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        return ("fail", f"oracle SQL failed: {e}")
    g, e = norm(got), norm(exp)
    if list(g.columns) != list(e.columns):
        return ("fail", f"columns differ: spark={list(g.columns)} duck={list(e.columns)}")
    if len(g) != len(e):
        return ("fail", f"row count differs: spark={len(g)} duck={len(e)}")
    if len(g) == 0:
        # The r8 q_suffix_dup failure mode: both engines return the
        # empty set at the gate SF, so the green row proves NOTHING
        # about the operator. An oracle must produce signal here.
        return ("fail", "VACUOUS: empty result at gate SF on both "
                "engines — empty==empty proves nothing; tune the "
                "operator params so the gate corpus yields rows")
    dt_bad = [(c, str(g[c].dtype), str(e[c].dtype)) for c in g.columns
              if str(g[c].dtype) != str(e[c].dtype)]
    if dt_bad:
        return ("fail", "dtype mismatch (driver hash is representation-"
                f"sensitive): {dt_bad}")
    try:
        pd.testing.assert_frame_equal(g, e, check_dtype=True, check_exact=True)
        return ("exact", f"{len(g)} rows exact")
    except AssertionError as ex:
        msg = str(ex).split("\n")
        return ("fail", " | ".join(msg[:4]))


def main():
    # --allow-missing: subset runs (dev loop, stress probes) verify only the
    # queries they ran; oracles with no result dir are expected, not a gate
    # failure. Full-gate runs keep missing as a hard fail.
    allow_missing = "--allow-missing" in sys.argv
    argv = [a for a in sys.argv if a != "--allow-missing"]
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.01"
    out_dir = argv[2] if len(argv) > 2 else "/tmp/graft_verify"
    print(f"duckdb {duckdb.__version__}, pandas {pd.__version__}, "
          f"sf_dir {sf_dir}")
    con = connect(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok, bad = [], []
    # Underscore-prefixed dirs are harness artifacts (tools/tally.py's
    # _duck_tmp spill dir), never query results.
    result_dirs = sorted(d for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d)
                         and not os.path.basename(d).startswith("_"))
    for d in result_dirs:
        name = os.path.basename(d)
        status, msg = compare_one(con, name, d, oracle.get(name))
        (ok if status in ("exact", "rows-only") else bad).append((name, msg))
    for name, m in ok:
        print(f"  OK   {name}: {m}")
    for name, m in bad:
        print(f"  FAIL {name}: {m}")
    missing = set(oracle) - {os.path.basename(d) for d in result_dirs}
    if allow_missing:
        print(f"  ({len(missing)} oracles not run — subset mode)")
        missing = set()
    else:
        for name in sorted(missing):
            print(f"  MISS {name}: oracle present but no result dir")
    linted = round_lint(oracle)
    for name in linted:
        print(f"  LINT {name}: new oracle uses round( — use floor(x*1e6+0.5)"
              f"/1e6 or DECIMAL rounding (engine-version-stable), or add to "
              f"tools/round_allowlist.txt with justification")
    print(f"\n{len(ok)} ok, {len(bad)} fail, {len(missing)} missing, "
          f"{len(linted)} lint")
    sys.exit(1 if (bad or missing or linted) else 0)


if __name__ == "__main__":
    main()
