#!/usr/bin/env python3
"""Per-query, resumable, resource-limited decade tally (VERDICT r13 #1).

The monolithic localcheck run at docs x100 died twice without leaving a
usable record: once to a pyarrow ArrowMemoryError at the FIRST result
read (the driver's disk-full window), once to DuckDB itself aborting
with `Resource temporarily unavailable` after ~6 CPU-hours inside the
hyperplane-LSH kNN oracles — and in both cases the crash destroyed the
WHOLE tally, because localcheck is one process that prints only at the
end. This runner executes each oracle compare in its OWN subprocess
with a DuckDB memory limit, a temp spill directory, and a wall-clock
timeout, and appends one JSON line per query to a tally file as soon as
its verdict is known. Crashes and timeouts become recorded per-query
outcomes instead of lost runs, and re-running skips queries already
tallied (resume after any interruption).

Compare semantics are EXACTLY localcheck.compare_one (the driver-gate
replica) — this file adds isolation and bookkeeping, never a different
notion of "matches".

Usage:
  python3 tools/tally.py <sfDir> <outDir> [--tally FILE] [--timeout S]
      [--mem GB] [--threads N] [--jobs J] [--queries a,b,c]
  python3 tools/tally.py --one <name> <sfDir> <outDir> [--mem GB] [--threads N]

Defaults: tally <outDir>/_tally.jsonl, timeout 1800 s/query, 24 GB
DuckDB memory limit, 8 DuckDB threads, 4 concurrent query subprocesses
(4 x 24 GB < this box's 125 GB). Exit 0 iff every targeted query is
"exact" or "rows-only" in the tally.
"""
import json
import os
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
import localcheck  # noqa: E402


def parse_flag(argv, flag, default):
    if flag in argv:
        i = argv.index(flag)
        v = argv[i + 1]
        del argv[i:i + 2]
        return v
    return default


def run_one(name: str, sf_dir: str, out_dir: str, mem_gb: int, threads: int):
    """Child mode: one compare under DuckDB resource limits; prints one
    JSON verdict line on stdout (the parent records it verbatim)."""
    import duckdb  # noqa: F401  (localcheck imported it; pragma goes below)
    con = localcheck.connect(sf_dir)
    tmp = os.path.join(out_dir, "_duck_tmp")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET memory_limit='{mem_gb}GB'")
    con.execute(f"SET threads={threads}")
    con.execute(f"SET temp_directory='{tmp}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    t0 = time.time()
    status, msg = localcheck.compare_one(
        con, name, os.path.join(out_dir, name), oracle.get(name))
    print(json.dumps({"name": name, "status": status, "msg": msg,
                      "secs": round(time.time() - t0, 1)}))
    return 0 if status in ("exact", "rows-only") else 1


def main():
    argv = list(sys.argv[1:])
    if argv and argv[0] == "--one":
        name, sf_dir, out_dir = argv[1], argv[2], argv[3]
        rest = argv[4:]
        mem = int(parse_flag(rest, "--mem", "24"))
        threads = int(parse_flag(rest, "--threads", "8"))
        sys.exit(run_one(name, sf_dir, out_dir, mem, threads))

    tally_path = parse_flag(argv, "--tally", None)
    timeout = int(parse_flag(argv, "--timeout", "1800"))
    mem = parse_flag(argv, "--mem", "24")
    threads = parse_flag(argv, "--threads", "8")
    jobs = int(parse_flag(argv, "--jobs", "4"))
    queries = parse_flag(argv, "--queries", None)
    if len(argv) < 2:
        print(__doc__)
        sys.exit(2)
    sf_dir, out_dir = argv[0], argv[1]
    tally_path = tally_path or os.path.join(out_dir, "_tally.jsonl")

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if queries:
        targets = sorted(q for q in queries.split(",") if q)
    else:
        targets = sorted(
            d for d in os.listdir(out_dir)
            if os.path.isdir(os.path.join(out_dir, d))
            and not d.startswith("_"))
    # A targeted query with no result dir is a hard per-query outcome,
    # not a silent shrink (the stress.sh reconcile discipline, recorded).
    done = {}
    if os.path.exists(tally_path):
        for ln in open(tally_path):
            ln = ln.strip()
            if ln:
                rec = json.loads(ln)
                done[rec["name"]] = rec
    todo = [q for q in targets if q not in done]
    print(f"[tally] {len(targets)} targeted, {len(done)} already tallied, "
          f"{len(todo)} to run (timeout {timeout}s, mem {mem}GB x {jobs} jobs)",
          flush=True)

    lock = __import__("threading").Lock()

    def record(rec):
        with lock:
            with open(tally_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            done[rec["name"]] = rec
            tag = rec["status"].upper()
            print(f"[tally] {tag:8s} {rec['name']}: {rec['msg']} "
                  f"({rec.get('secs', '?')}s)", flush=True)

    def work(name):
        if not os.path.isdir(os.path.join(out_dir, name)):
            record({"name": name, "status": "missing",
                    "msg": "targeted but no result dir", "secs": 0})
            return
        cmd = [sys.executable, os.path.abspath(__file__), "--one", name,
               sf_dir, out_dir, "--mem", mem, "--threads", threads]
        t0 = time.time()
        try:
            p = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=timeout)
        except subprocess.TimeoutExpired:
            record({"name": name, "status": "timeout",
                    "msg": f"no verdict within {timeout}s",
                    "secs": round(time.time() - t0, 1)})
            return
        line = None
        for ln in (p.stdout or "").splitlines():
            ln = ln.strip()
            if ln.startswith("{"):
                line = ln
        if line is None:
            tail = (p.stderr or "").strip().splitlines()[-3:]
            record({"name": name, "status": "crash",
                    "msg": f"exit {p.returncode}: " + " | ".join(tail),
                    "secs": round(time.time() - t0, 1)})
            return
        record(json.loads(line))

    with ThreadPoolExecutor(max_workers=jobs) as ex:
        list(ex.map(work, todo))

    counts = {}
    bad = []
    for q in targets:
        st = done[q]["status"]
        counts[st] = counts.get(st, 0) + 1
        if st not in ("exact", "rows-only"):
            bad.append((q, st, done[q]["msg"]))
    print(f"[tally] summary: " +
          ", ".join(f"{k}={v}" for k, v in sorted(counts.items())) +
          f" -> {tally_path}", flush=True)
    for q, st, msg in bad:
        print(f"[tally] NOT-EXACT {q} ({st}): {msg}", flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
