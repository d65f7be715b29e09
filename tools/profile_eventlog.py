#!/usr/bin/env python3
"""Attribute a Bench run's wall/CPU to jobs, stages, and plan nodes from
a Spark event log — the profiling loop behind the R19 model-query
surgery (no UI needed; works on the rolling zstd logs local mode writes).

Capture a log, then read it:

    SPARK_GRAFT_CONF="spark.eventLog.enabled=true;spark.eventLog.dir=/tmp/sparklogs" \
      SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_SF_DIR=benchdata/sf1.5 \
      sbt -batch "runMain graft.Bench q_model_authority_scores"
    python3 tools/profile_eventlog.py /tmp/sparklogs            # jobs+stages
    python3 tools/profile_eventlog.py /tmp/sparklogs --sql [N]  # plan trees

Reading the output:
- jobs/stages: with runs=2 the SECOND half of the job list is the warm
  run — cold stages carry JIT warmup (up to 10x CPU) and must be
  ignored. Each AQE stage materialization is one job; a long tail of
  tiny sequential jobs is stage-barrier latency, not compute.
- --sql: the final adaptive plan per execution with node metrics summed
  over ALL runs (halve for per-run). A WholeStageCodegen's duration and
  a HashAggregate's "time in aggregation build" INCLUDE pulling every
  non-codegen child above the stage input (windows, sort-aggregates),
  so attribute by differencing nested units, not by reading one number.
- smells this has caught: interpreted SortAggregate chains (max(struct)
  buffers are immutable -> no codegen), AQE broadcasting a corpus-sized
  relation (BroadcastExchange rows= in the millions), 2-task stages
  (AQE coalesced an underestimated shuffle), double execution of an
  uncached nondeterministic subtree (no ReusedExchange).
"""
import collections
import glob
import json
import os
import subprocess
import sys


def load_events(path):
    d = path
    if os.path.isdir(path) and not path.rstrip("/").startswith("eventlog_v2"):
        cands = sorted(glob.glob(os.path.join(path, "*")), key=os.path.getmtime)
        if cands and os.path.isdir(cands[-1]):
            d = cands[-1]
    files = sorted(glob.glob(os.path.join(d, "events_*"))) if os.path.isdir(d) else [d]
    for f in files:
        if f.endswith(".zstd"):
            data = subprocess.run(["zstd", "-dc", f],
                                  capture_output=True).stdout
            lines = data.decode(errors="ignore").splitlines()
        else:
            lines = open(f, errors="ignore").read().splitlines()
        for line in lines:
            try:
                yield json.loads(line)
            except ValueError:
                continue


def jobs_stages(events):
    jobs, stages = {}, []
    cpu = collections.defaultdict(lambda: [0, 0])
    for e in events:
        t = e.get("Event", "")
        if t == "SparkListenerJobStart":
            jobs[e["Job ID"]] = [e["Submission Time"], None,
                                 [s["Stage ID"] for s in e["Stage Infos"]]]
        elif t == "SparkListenerJobEnd":
            if e["Job ID"] in jobs:
                jobs[e["Job ID"]][1] = e["Completion Time"]
        elif t == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            stages.append((si["Stage ID"], si["Stage Name"].split("\n")[0][:80],
                           si.get("Submission Time"), si.get("Completion Time"),
                           si["Number of Tasks"]))
        elif t == "SparkListenerTaskEnd":
            m = e.get("Task Metrics") or {}
            cpu[e["Stage ID"]][0] += m.get("Executor Run Time", 0)
            cpu[e["Stage ID"]][1] += 1
    if not jobs:
        raise SystemExit("no jobs in log")
    base = min(v[0] for v in jobs.values())
    print("== jobs (s offsets; 2nd half of the list = warm run) ==")
    for jid, (s, e2, sts) in sorted(jobs.items()):
        if e2 is None:
            continue
        print(f"job {jid:3d}  start={(s - base) / 1000:8.3f}  "
              f"dur={(e2 - s) / 1000:6.3f}  stages={sorted(sts)}")
    print("== stages ==")
    for sid, name, s, c, n in sorted(stages):
        if s is None:
            continue
        print(f"stage {sid:3d}  start={(s - base) / 1000:8.3f} "
              f"dur={(c - s) / 1000:6.3f} tasks={n:3d} "
              f"cpu_ms={cpu[sid][0]:7d}  {name}")


def sql_plans(events, want=None):
    accv = collections.defaultdict(int)
    plans = {}
    for e in events:
        t = e.get("Event", "")
        if t.endswith("SQLExecutionStart"):
            plans[e["executionId"]] = [e["sparkPlanInfo"],
                                       e.get("description", "")[:60]]
        elif t.endswith("SQLAdaptiveExecutionUpdate"):
            plans.setdefault(e["executionId"], [None, ""])[0] = e["sparkPlanInfo"]
        elif t == "SparkListenerTaskEnd":
            for a in (e.get("Task Info") or {}).get("Accumulables", []):
                try:
                    accv[a["ID"]] += int(a["Update"])
                except (ValueError, TypeError):
                    continue
        elif t.endswith("DriverAccumUpdates"):
            for aid, v in e["accumUpdates"]:
                accv[aid] += v

    def walk(p, depth, out):
        ms = []
        for m in p.get("metrics", []):
            v = accv.get(m["accumulatorId"])
            if v is None:
                continue
            n, mt = m["name"], m.get("metricType")
            if mt == "timing" and v > 200:
                ms.append(f"{n}={v}ms")
            elif mt == "nsTiming" and v > 2e8:
                ms.append(f"{n}={v // 1000000}ms")
            elif "output rows" in n:
                ms.append(f"rows={v}")
        out.append("  " * depth + p["nodeName"] +
                   ("  [" + ", ".join(ms) + "]" if ms else ""))
        for c in p.get("children", []):
            walk(c, depth + 1, out)

    for eid in sorted(plans):
        if want is not None and eid != want:
            continue
        info, desc = plans[eid]
        if info is None:
            continue
        out = []
        walk(info, 0, out)
        print(f"===== execution {eid}: {desc}")
        print("\n".join(out))


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparklogs"
    if "--sql" in sys.argv:
        i = sys.argv.index("--sql")
        want = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else None
        sql_plans(load_events(path), want)
    else:
        jobs_stages(load_events(path))


if __name__ == "__main__":
    main()
