#!/usr/bin/env bash
# R18 measurement batch — run SEQUENTIALLY on a quiet box. Model-family
# legs run FIRST (the round's adjudicated rows), then the full sweep, so
# a truncated run still carries the gate-relevant evidence. Produces:
#   BENCH_model_sf3_r18.json       — model-family sf3 points (r18 path)
#   BENCH_model_sf6_r18.json       — sf6 crossover tails, all four rows
#   BENCH_structural_sf15_r18.json — full structural sweep at sf1.5
#                                    (solo min-of-4 + DuckDB same box)
#   /tmp/r18_solo_geo.json         — q_geo_geojson watch-item reading
set -euo pipefail
cd "$(dirname "$0")/.."

if [ ! -f /tmp/vout01/oracle_sql.json ]; then
  echo "== 0/4 regenerating oracle dump (Verify @ sf0.01)"
  SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout01" >/dev/null
fi

run_models() {  # $1 = sfdir, $2 = out json, $3.. = queries
python3 - "$@" <<'EOF'
import json, os, subprocess, sys, time
import duckdb

SF, OUT = sys.argv[1], sys.argv[2]
QS = sys.argv[3:]
oracles = json.load(open("/tmp/vout01/oracle_sql.json"))
con = duckdb.connect(); con.execute("SET threads TO 32")
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
out = {"mode": "solo-min-of-6 (duck min-of-3)", "sf": SF, "queries": {}}
for q in QS:
    detail = f"/tmp/bench_{os.path.basename(SF)}_{q}.json"
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
    json.dump(out, open(OUT, "w"), indent=1)
EOF
}

echo "== 1/4 model-family sf3 points (r18 fused path)"
run_models benchdata/sf3 BENCH_model_sf3_r18.json \
  q_model_impact_scores q_model_authority_scores \
  q_model_impact_scores_england q_model_authority_scores_england \
  q_model_data_tests

echo "== 2/4 model-family sf6 points (all four crossover tails)"
run_models benchdata/sf6 BENCH_model_sf6_r18.json \
  q_model_impact_scores q_model_authority_scores \
  q_model_authority_scores_england q_model_data_tests

echo "== 3/4 q_geo_geojson watch item (solo min-of-6 @ sf0.1)"
rm -f /tmp/r18_solo_geo.json
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=6 \
  SPARK_GRAFT_BENCH_OUT=/tmp/r18_solo_geo.json \
  sbt -batch "runMain graft.Bench q_geo_geojson" | tail -1

echo "== 4/4 full structural sweep @ sf1.5 (min-of-4, duck timeout 300)"
python3 tools/bench_structural.py benchdata/sf1.5 BENCH_structural_sf15_r18.json 4 300
echo DONE
