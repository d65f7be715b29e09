#!/usr/bin/env bash
# R21 measurement batch — run SEQUENTIALLY on a quiet box (same
# discipline as r20_measure.sh: one filename per batch, nothing
# overwrites an artifact a committed BASELINE.md cites). Produces:
#   BENCH_local_r21.json           — full Spark suite @ sf0.1, min-of-3
#                                    (supersedes the four PQ rows that
#                                    predated the r20 argmin fix —
#                                    VERDICT r20 "What's wrong" #2)
#   DUCKDB_BENCH_r21_full.json     — full DuckDB oracle suite @ sf0.1,
#                                    min-of-3, same session (paired)
#   BENCH_structural_sf15_r21.json — full structural sweep @ sf1.5
#                                    (solo min-of-4 + DuckDB same box;
#                                    now 34 rows: q_ann_pq_indexed is
#                                    pinned — VERDICT r20 #4 — and DNF
#                                    rows carry a drift WATCH vs the
#                                    previous round's artifact —
#                                    VERDICT r20 #3)
set -euo pipefail
cd "$(dirname "$0")/.."

if [ ! -f /tmp/vout01/oracle_sql.json ]; then
  echo "== 0/3 regenerating oracle dump (Verify @ sf0.01)"
  SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout01" >/dev/null
fi

echo "== 1/3 PAIRED full sweep @ sf0.1 (Spark min-of-3 then DuckDB min-of-3, one session)"
rm -f BENCH_local_r21.json
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_OUT=BENCH_local_r21.json \
  sbt -batch "runMain graft.Bench" | tail -1
python3 tools/bench_duckdb.py /root/testdata/sf0.1 /tmp/vout01/oracle_sql.json 3 600 \
  > DUCKDB_BENCH_r21_full.json
python3 - <<'EOF'
import json
s = json.load(open("BENCH_local_r21.json"))
d = json.load(open("DUCKDB_BENCH_r21_full.json"))
st = sum(v for v in s["queries"].values() if v >= 0)
dt = sum(v for v in d["queries"].values() if v >= 0)
print(f"PAIRED HEADLINE sf0.1: spark={st:.1f}s duckdb={dt:.1f}s ratio={st/dt:.3f}")
EOF

echo "== 2/3 full structural sweep @ sf1.5 (min-of-4, duck timeout 300; 6 ANN rows pinned)"
python3 tools/bench_structural.py benchdata/sf1.5 BENCH_structural_sf15_r21.json 4 300

echo "== 3/3 done — regenerate BASELINE.md from these exact files before committing"
