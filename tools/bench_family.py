#!/usr/bin/env python3
"""Family crossover sweep: a named subset of queries, solo per JVM
(min over SPARK_GRAFT_BENCH_RUNS=runs) + same-box DuckDB, with the same
resume semantics as bench_structural.py — used for the sf3/sf6 crossover
artifacts where only one query family is being curved.

Usage: python3 tools/bench_family.py <sfDir> <out.json> <runs> <duck_timeout_s> q1 q2 ...
"""
import json, os, subprocess, sys, time, threading
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_once(con, sql, timeout):
    lock = threading.Lock(); done = [False]
    def maybe():
        with lock:
            if not done[0]: con.interrupt()
    t = threading.Timer(timeout, maybe); t.start()
    t0 = time.monotonic()
    try:
        con.execute(sql).fetchall()
        with lock: done[0] = True
        return time.monotonic() - t0
    except Exception:
        with lock: done[0] = True
        if time.monotonic() - t0 >= timeout - 0.5: return -timeout
        raise
    finally: t.cancel()


def main():
    sf, out_path = sys.argv[1], sys.argv[2]
    runs, duck_timeout = int(sys.argv[3]), float(sys.argv[4])
    qs = sys.argv[5:]
    oracles = json.load(open("/tmp/vout01/oracle_sql.json"))
    con = duckdb.connect(); con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    mode = f"solo-min-of-{runs}"
    out = {"mode": mode, "sf": sf, "queries": {}}
    if os.path.exists(out_path):
        prior = json.load(open(out_path))
        if prior.get("sf") == sf and prior.get("mode") == mode:
            out["queries"] = {q: v for q, v in prior.get("queries", {}).items()
                              if q in qs}
    for q in qs:
        if q in out["queries"]: continue
        detail = f"/tmp/bench_fam_{q}.json"
        if os.path.exists(detail): os.unlink(detail)
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf,
                   SPARK_GRAFT_BENCH_RUNS=str(runs),
                   SPARK_GRAFT_BENCH_OUT=detail)
        r = subprocess.run(["sbt", "-batch", f"runMain graft.Bench {q}"],
                           capture_output=True, text=True, env=env)
        if r.returncode != 0:
            raise RuntimeError(f"bench failed for {q}:\n{r.stdout[-2000:]}")
        s = json.load(open(detail))["queries"][q]
        if s < 0:
            raise RuntimeError(f"{q} threw inside Bench")
        best = None
        for _ in range(3):
            d = duck_once(con, oracles[q], duck_timeout)
            if d < 0: best = d; break
            best = d if best is None else min(best, d)
        row = {"spark_s": round(s, 3), "duckdb_s": round(best, 3)}
        if best > 0:
            row["ratio"] = round(s / best, 3)
            row["gate"] = "PASS" if row["ratio"] <= 2.0 else "FAIL"
        else:
            row["gate"] = "PASS (DNF)"
        out["queries"][q] = row
        print(q, row, flush=True)
        json.dump(out, open(out_path, "w"), indent=1)
    npass = sum(1 for v in out["queries"].values()
                if v["gate"].startswith("PASS"))
    out["summary"] = f"{npass}/{len(out['queries'])} pass the 2x gate"
    json.dump(out, open(out_path, "w"), indent=1)
    print(out["summary"])


if __name__ == "__main__":
    main()
