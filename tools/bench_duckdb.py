#!/usr/bin/env python3
"""Cross-engine benchmark: time each oracle SQL in DuckDB over the same
parquet the Spark bench reads. The reference's warehouse IS DuckDB, so this
is the 'matches-or-beats the reference's single-node throughput at the same
data scale' comparison, per query.

Usage: python3 tools/bench_duckdb.py <sfDir> <oracle_sql.json> [runs=3] [timeout_s]
Emits one JSON line: {"engine":"duckdb","sf":...,"queries":{name:sec_min}}
Each query materializes fully (fetchall) — the analogue of the Spark
bench's noop-sink write. With a timeout, a query that exceeds it is
interrupted and reported as -timeout (negative = did not finish): at the
heavy tier some oracles are quadratic (IEJoin radius join) and would run
for hours — the timeout marker IS the scale finding.
"""
import sys, time, json, threading
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    sf = sys.argv[1]
    oracles = json.load(open(sys.argv[2]))
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    timeout = float(sys.argv[4]) if len(sys.argv) > 4 else None
    con = duckdb.connect()
    con.execute(f"SET threads TO 32")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    best = {}
    for name, sql in sorted(oracles.items()):
        ts = []
        for _ in range(runs):
            timer = None
            if timeout:
                timer = threading.Timer(timeout, con.interrupt)
                timer.start()
            t0 = time.monotonic()
            try:
                con.execute(sql).fetchall()
            except duckdb.InterruptException:
                ts = [-timeout]
                sys.stderr.write(f"{name}: timed out after {timeout}s\n")
                break
            except Exception as e:
                took = time.monotonic() - t0
                # an interrupt can surface as InvalidInputException too
                if timeout and took >= timeout - 0.5:
                    ts = [-timeout]
                    sys.stderr.write(f"{name}: timed out after {timeout}s\n")
                else:
                    ts = [-1.0]
                    sys.stderr.write(f"{name}: {str(e)[:120]}\n")
                break
            finally:
                if timer:
                    timer.cancel()
            ts.append(time.monotonic() - t0)
        best[name] = min(ts)
    total = sum(v for v in best.values() if v >= 0)
    print(json.dumps({"engine": "duckdb", "sf": sf, "runs": runs,
                      "total": round(total, 3),
                      "queries": {k: round(v, 4) for k, v in best.items()}}))

if __name__ == "__main__":
    main()
