#!/usr/bin/env bash
# R17 measurement batch — run SEQUENTIALLY on a quiet box. Produces:
#   BENCH_structural_sf15_r17.json — full structural sweep at sf1.5
#                                    (solo min-of-6 + DuckDB same box)
#   BENCH_model_sf3_r17.json       — the model-family sf3 points that
#                                    finish the R16 crossover argument
#   /tmp/r17_solo_geo.json         — q_geo_geojson watch-item reading
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/4 full structural sweep @ sf1.5 (min-of-6, duck timeout 300)"
python3 tools/bench_structural.py benchdata/sf1.5 BENCH_structural_sf15_r17.json 6 300

echo "== 2/4 model-family sf3 points (solo min-of-6 + DuckDB min-of-3)"
python3 - <<'EOF'
import json, os, re, subprocess, time
import duckdb

QS = ["q_model_authority_scores", "q_model_impact_scores",
      "q_model_authority_scores_england", "q_model_data_tests",
      "q_model_permit_details_england", "q_model_wellbeing"]
SF = "benchdata/sf3"
oracles = json.load(open("/tmp/vout01/oracle_sql.json"))
con = duckdb.connect(); con.execute("SET threads TO 32")
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
out = {"mode": "solo-min-of-6 (duck min-of-3)", "sf": SF, "queries": {}}
for q in QS:
    detail = f"/tmp/bench_sf3_{q}.json"
    if os.path.exists(detail):
        os.unlink(detail)  # never read a stale detail from a failed run
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF,
               SPARK_GRAFT_BENCH_RUNS="6", SPARK_GRAFT_BENCH_OUT=detail)
    r = subprocess.run(["sbt", "-batch", f"runMain graft.Bench {q}"],
                       capture_output=True, text=True, env=env)
    if r.returncode != 0:
        raise RuntimeError(f"sbt bench failed for {q}:\n{r.stdout[-2000:]}")
    spark_s = json.load(open(detail))["queries"][q]
    best = None
    for _ in range(3):
        t0 = time.monotonic()
        try:
            con.execute(oracles[q]).fetchall()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        except Exception as e:
            print(q, "duck ERR", e, flush=True); best = best or -1; break
    ratio = round(spark_s / best, 3) if best and best > 0 else None
    out["queries"][q] = {"spark_s": round(spark_s, 3),
                         "duckdb_s": round(best, 3) if best else None,
                         **({"ratio": ratio} if ratio else {})}
    print(q, out["queries"][q], flush=True)
    json.dump(out, open("BENCH_model_sf3_r17.json", "w"), indent=1)
EOF

echo "== 3/4 authority-family sf6 points (the crossover tail of the curve)"
python3 - <<'EOF'
import json, os, subprocess, time
import duckdb

QS = ["q_model_authority_scores", "q_model_authority_scores_england"]
SF = "benchdata/sf6"
oracles = json.load(open("/tmp/vout01/oracle_sql.json"))
con = duckdb.connect(); con.execute("SET threads TO 32")
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
out = {"mode": "solo-min-of-6 (duck min-of-3)", "sf": SF, "queries": {}}
for q in QS:
    detail = f"/tmp/bench_sf6_{q}.json"
    if os.path.exists(detail):
        os.unlink(detail)  # never read a stale detail from a failed run
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF,
               SPARK_GRAFT_BENCH_RUNS="6", SPARK_GRAFT_BENCH_OUT=detail)
    r = subprocess.run(["sbt", "-batch", f"runMain graft.Bench {q}"],
                       capture_output=True, text=True, env=env)
    if r.returncode != 0:
        raise RuntimeError(f"sbt bench failed for {q}:\n{r.stdout[-2000:]}")
    spark_s = json.load(open(detail))["queries"][q]
    best = None
    for _ in range(3):
        t0 = time.monotonic()
        con.execute(oracles[q]).fetchall()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    out["queries"][q] = {"spark_s": round(spark_s, 3),
                         "duckdb_s": round(best, 3),
                         "ratio": round(spark_s / best, 3)}
    print(q, out["queries"][q], flush=True)
    json.dump(out, open("BENCH_model_sf6_r17.json", "w"), indent=1)
EOF

echo "== 4/4 q_geo_geojson watch item (solo min-of-6 @ sf0.1)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=6 \
  SPARK_GRAFT_BENCH_OUT=/tmp/r17_solo_geo.json \
  sbt -batch "runMain graft.Bench q_geo_geojson" | tail -1
echo DONE
