#!/usr/bin/env python3
"""Per-job / per-stage wall-time breakdown from a Spark event log.

Usage: tools/evprof.py <eventlog file> [topN]

Prints jobs in submission order with duration and first-stage callsite, then
the topN stages by duration with task-time totals — the measurement half of
guide §1 (empirical loop) for a UI-less sandbox: point it at
spark.eventLog.dir output for one benched query and read where the seconds
actually went (job launch overhead vs one hot stage vs many tiny rounds).
"""
import json, sys, collections

path = sys.argv[1]
topn = int(sys.argv[2]) if len(sys.argv) > 2 else 15

jobs = {}            # id -> dict
stages = {}          # id -> dict
app_start = app_end = None
for line in open(path):
    try:
        e = json.loads(line)
    except json.JSONDecodeError:
        continue
    ev = e.get("Event")
    if ev == "SparkListenerApplicationStart":
        app_start = e["Timestamp"]
    elif ev == "SparkListenerApplicationEnd":
        app_end = e["Timestamp"]
    elif ev == "SparkListenerJobStart":
        jobs[e["Job ID"]] = {
            "t0": e["Submission Time"],
            "desc": (e.get("Properties") or {}).get("spark.job.description", ""),
            "stages": [s["Stage ID"] for s in e["Stage Infos"]],
            "site": e["Stage Infos"][-1]["Details"].split("\n")[0]
                     if e["Stage Infos"] else "",
            "name": e["Stage Infos"][-1]["Stage Name"] if e["Stage Infos"] else "",
        }
    elif ev == "SparkListenerJobEnd":
        if e["Job ID"] in jobs:
            jobs[e["Job ID"]]["t1"] = e["Completion Time"]
    elif ev == "SparkListenerStageCompleted":
        si = e["Stage Info"]
        t0, t1 = si.get("Submission Time"), si.get("Completion Time")
        stages[si["Stage ID"]] = {
            "name": si["Stage Name"],
            "dur": (t1 - t0) / 1e3 if t0 and t1 else 0.0,
            "ntask": si["Number of Tasks"],
        }

print(f"{'job':>4} {'dur_s':>7} {'gap_s':>6}  last-stage")
prev_end = app_start
total = gap_total = 0.0
for jid in sorted(jobs):
    j = jobs[jid]
    if "t1" not in j:
        continue
    dur = (j["t1"] - j["t0"]) / 1e3
    gap = (j["t0"] - prev_end) / 1e3 if prev_end else 0.0
    prev_end = j["t1"]
    total += dur
    gap_total += max(0.0, gap)
    label = j["desc"] or j["name"]
    print(f"{jid:>4} {dur:>7.2f} {gap:>6.2f}  {label[:90]}")
print(f"\njobs total {total:.2f}s, inter-job gaps {gap_total:.2f}s, "
      f"app {(app_end - app_start) / 1e3 if app_end and app_start else -1:.2f}s, "
      f"n_jobs {len(jobs)}")
print(f"\ntop {topn} stages by duration:")
for sid, s in sorted(stages.items(), key=lambda kv: -kv[1]["dur"])[:topn]:
    print(f"  stage {sid:>4} {s['dur']:>7.2f}s {s['ntask']:>4}t  {s['name'][:80]}")
