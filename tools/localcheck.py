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
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok, bad = [], []
    result_dirs = sorted(d for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d))
    for d in result_dirs:
        name = os.path.basename(d)
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            bad.append((name, "no parquet output"))
            continue
        got = pd.read_parquet(d)
        if name not in oracle:
            if len(got) == 0:
                bad.append((name, "VACUOUS: rows-only query returned 0 rows"))
            else:
                ok.append((name, f"rows-only: {len(got)} rows"))
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            bad.append((name, f"oracle SQL failed: {e}"))
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            bad.append((name, f"columns differ: spark={list(g.columns)} duck={list(e.columns)}"))
            continue
        if len(g) != len(e):
            bad.append((name, f"row count differs: spark={len(g)} duck={len(e)}"))
            continue
        if len(g) == 0:
            # The r8 q_suffix_dup failure mode: both engines return the
            # empty set at the gate SF, so the green row proves NOTHING
            # about the operator. An oracle must produce signal here.
            bad.append((name, "VACUOUS: empty result at gate SF on both "
                        "engines — empty==empty proves nothing; tune the "
                        "operator params so the gate corpus yields rows"))
            continue
        dt_bad = [(c, str(g[c].dtype), str(e[c].dtype)) for c in g.columns
                  if str(g[c].dtype) != str(e[c].dtype)]
        if dt_bad:
            bad.append((name, "dtype mismatch (driver hash is representation-"
                        f"sensitive): {dt_bad}"))
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=True, check_exact=True)
            ok.append((name, f"{len(g)} rows exact"))
        except AssertionError as ex:
            msg = str(ex).split("\n")
            bad.append((name, " | ".join(msg[:4])))
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
