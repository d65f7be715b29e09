#!/usr/bin/env bash
# R20 measurement batch — run SEQUENTIALLY on a quiet box. One filename
# per measurement batch (VERDICT r19 hygiene item 2): nothing here
# overwrites an artifact a committed BASELINE.md already cites; if a
# number must be re-measured, it gets a new suffix and BASELINE is
# regenerated from the new bytes. Produces:
#   BENCH_local_r20.json           — full Spark suite @ sf0.1, min-of-3
#   DUCKDB_BENCH_r20_full.json     — full DuckDB oracle suite @ sf0.1,
#                                    min-of-3, same session (the paired
#                                    headline divides these two files)
#   BENCH_structural_sf15_r20.json — full structural sweep @ sf1.5
#                                    (solo min-of-4 + DuckDB same box;
#                                    includes the 5 pinned ANN rows)
#   BENCH_structural_sf6_r20.json  — dedup/span/simhash family @ sf6
set -euo pipefail
cd "$(dirname "$0")/.."

if [ ! -f /tmp/vout01/oracle_sql.json ]; then
  echo "== 0/4 regenerating oracle dump (Verify @ sf0.01)"
  SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout01" >/dev/null
fi

echo "== 1/4 PAIRED full sweep @ sf0.1 (Spark min-of-3 then DuckDB min-of-3, one session)"
rm -f BENCH_local_r20.json
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_OUT=BENCH_local_r20.json \
  sbt -batch "runMain graft.Bench" | tail -1
python3 tools/bench_duckdb.py /root/testdata/sf0.1 /tmp/vout01/oracle_sql.json 3 600 \
  > DUCKDB_BENCH_r20_full.json
python3 - <<'EOF'
import json
s = json.load(open("BENCH_local_r20.json"))
d = json.load(open("DUCKDB_BENCH_r20_full.json"))
st = sum(v for v in s["queries"].values() if v >= 0)
dt = sum(v for v in d["queries"].values() if v >= 0)
print(f"PAIRED HEADLINE sf0.1: spark={st:.1f}s duckdb={dt:.1f}s ratio={st/dt:.3f}")
EOF

echo "== 2/4 full structural sweep @ sf1.5 (min-of-4, duck timeout 300; 5 ANN rows pinned)"
python3 tools/bench_structural.py benchdata/sf1.5 BENCH_structural_sf15_r20.json 4 300

echo "== 3/4 dedup/span/simhash family crossover @ sf6 (min-of-4, duck timeout 300)"
# 16g driver at sf6: q_dedup_ngram OOMs min-of-4 in one JVM at the 8g
# default (r19 finding)
SPARK_DRIVER_MEM=16g python3 tools/bench_family.py benchdata/sf6 \
  BENCH_structural_sf6_r20.json 4 300 \
  q_simhash_pairs q_span_cut q_span_cut_keep q_dedup_ngram q_dedup_keep \
  q_dup_spans q_winnow_pairs

echo "== 4/4 done — regenerate BASELINE.md from these exact files before committing"
