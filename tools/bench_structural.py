#!/usr/bin/env python3
"""Structural cross-engine sweep: every structural query (DuckDB does
>= 0.5 s of real work at sf0.1 — the set BENCH_structural_r11.json
pinned) runs SOLO in its own Spark JVM (min over SPARK_GRAFT_BENCH_RUNS
runs) and in DuckDB (same box, same parquet, tools/bench_duckdb.py
semantics inline), producing one machine-readable artifact.

Usage: python3 tools/bench_structural.py <sfDir> <out.json> [runs=3] [duck_timeout_s=300]

A DuckDB timeout reports duckdb_s = -timeout and gate = "PASS (DNF)":
the reference engine did not finish, which at the heavy tier IS the
scale finding. Gate: spark <= 2x duckdb.
"""
import json, os, re, subprocess, sys, time
import duckdb

QUERIES = [
  "q_bpe_encode", "q_bpe_encode_bytes", "q_contamination",
  "q_curation_pipeline", "q_dedup_keep", "q_dedup_ngram",
  "q_dup_clusters", "q_dup_clusters_star", "q_dup_spans",
  "q_range_join_points", "q_semantic_clusters", "q_semantic_dedup_keep",
  "q_simhash_pairs", "q_span_cut", "q_span_cut_keep",
  "q_wellbeing_impact", "q_winnow_pairs", "q_unigram_encode",
]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def spark_solo(sf, query, runs):
    detail = f"/tmp/bench_solo_{query}.json"
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf,
               SPARK_GRAFT_BENCH_RUNS=str(runs),
               SPARK_GRAFT_BENCH_OUT=detail)
    out = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Bench {query}"],
        capture_output=True, text=True, env=env, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    m = re.search(r'\{"metric".*\}', out.stdout)
    if not m:
        sys.stderr.write(out.stdout[-2000:] + out.stderr[-2000:])
        raise SystemExit(f"no bench line for {query}")
    return json.load(open(detail))["queries"][query]


def duck_solo(con, sql, runs, timeout):
    import threading
    best = None
    for _ in range(runs):
        timer = threading.Timer(timeout, con.interrupt)
        timer.start()
        t0 = time.monotonic()
        try:
            con.execute(sql).fetchall()
            took = time.monotonic() - t0
            best = took if best is None else min(best, took)
        except Exception:
            took = time.monotonic() - t0
            if took >= timeout - 0.5:
                return -timeout
            raise
        finally:
            timer.cancel()
    return best


def main():
    sf = sys.argv[1]
    out_path = sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    duck_timeout = float(sys.argv[4]) if len(sys.argv) > 4 else 300.0

    # oracle SQL from the last Verify dump, or regenerate
    oracle_path = "/tmp/vout01/oracle_sql.json"
    oracles = json.load(open(oracle_path))

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    # resume: keep rows already measured in a previous partial run
    result = {"mode": f"solo-min-of-{runs}", "sf": sf, "queries": {}}
    if os.path.exists(out_path):
        prior = json.load(open(out_path))
        if prior.get("sf") == sf:
            result["queries"] = prior.get("queries", {})
            result["mode"] = prior.get("mode", result["mode"])
    for q in QUERIES:
        if q in result["queries"]:
            continue
        s = spark_solo(sf, q, runs)
        d = duck_solo(con, oracles[q], runs, duck_timeout)
        if d < 0:
            gate = "PASS (DNF)"
            ratio = None
        else:
            ratio = round(s / d, 3)
            gate = "PASS" if ratio <= 2.0 else "FAIL"
        result["queries"][q] = {
            "spark_s": round(s, 3),
            "duckdb_s": round(d, 3),
            **({"ratio": ratio} if ratio is not None else {}),
            "gate": gate}
        print(q, result["queries"][q], flush=True)
        json.dump(result, open(out_path, "w"), indent=1)
    npass = sum(1 for v in result["queries"].values()
                if v["gate"].startswith("PASS"))
    result["summary"] = f"{npass}/{len(QUERIES)} pass the 2x gate"
    json.dump(result, open(out_path, "w"), indent=1)
    print(result["summary"])


if __name__ == "__main__":
    main()
