#!/usr/bin/env python3
"""Per-QUERY attribution of a labeled Bench event log (Bench sets
spark.job.description = query name since r21): for each query, the jobs
it ran, per-job wall, stage count, and the unattributed gap (driver/
planning time between the query's first job submission and its last job
end that no job covers).

    python3 tools/profile_per_query.py /tmp/sparklogs [query ...]

With query names given, prints the full job/stage detail for those
queries; otherwise a one-line summary per query (second-half runs only
are NOT separated — Bench runs round-robin, so per-query min wall is in
the BENCH json; this tool explains WHERE the time goes)."""
import collections
import sys

sys.path.insert(0, __import__("os").path.dirname(__file__))
from profile_eventlog import load_events  # noqa: E402


def main():
    path = sys.argv[1]
    want = set(sys.argv[2:])
    jobs = {}          # jid -> [desc, submit, end, [stage ids]]
    stage_info = {}    # sid -> (name, submit, complete, ntasks)
    cpu = collections.defaultdict(int)
    for e in load_events(path):
        t = e.get("Event", "")
        if t == "SparkListenerJobStart":
            desc = (e.get("Properties") or {}).get("spark.job.description", "?")
            jobs[e["Job ID"]] = [desc, e["Submission Time"], None,
                                 [s["Stage ID"] for s in e["Stage Infos"]]]
        elif t == "SparkListenerJobEnd":
            if e["Job ID"] in jobs:
                jobs[e["Job ID"]][2] = e["Completion Time"]
        elif t == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            stage_info[si["Stage ID"]] = (
                si["Stage Name"].split("\n")[0][:70],
                si.get("Submission Time"), si.get("Completion Time"),
                si["Number of Tasks"])
        elif t == "SparkListenerTaskEnd":
            m = e.get("Task Metrics") or {}
            cpu[e["Stage ID"]] += m.get("Executor Run Time", 0)

    per = collections.defaultdict(list)
    for jid, (desc, s, e2, sts) in sorted(jobs.items()):
        if e2 is not None:
            per[desc].append((jid, s, e2, sts))

    print(f"{'query':38s} {'jobs':>4s} {'job_wall_s':>10s} "
          f"{'span_s':>7s} {'gap_s':>6s} {'stages':>6s}")
    rows = []
    for q, js in per.items():
        jw = sum(e2 - s for _, s, e2, _ in js) / 1000
        span = (max(e2 for _, _, e2, _ in js) - min(s for _, s, _, _ in js)) / 1000
        nst = sum(len(set(sts) & set(stage_info)) for _, _, _, sts in js)
        rows.append((jw, q, len(js), span, nst))
    for jw, q, nj, span, nst in sorted(rows, reverse=True):
        print(f"{q:38s} {nj:4d} {jw:10.3f} {span:7.3f} {span - jw:6.3f} {nst:6d}")

    for q in want:
        print(f"\n== {q} ==")
        for jid, s, e2, sts in per.get(q, []):
            real = sorted(set(sts) & set(stage_info))
            print(f" job {jid:4d} dur={(e2 - s) / 1000:7.3f} stages={real}")
            for sid in real:
                name, ss, cc, n = stage_info[sid]
                if ss is None:
                    continue
                print(f"   stage {sid:4d} dur={(cc - ss) / 1000:7.3f} "
                      f"tasks={n:3d} cpu_ms={cpu[sid]:6d} {name}")


if __name__ == "__main__":
    main()
