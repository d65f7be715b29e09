#!/usr/bin/env bash
# R19 measurement batch — run SEQUENTIALLY on a quiet box. Order per the
# round's asks: (1) the PAIRED same-session full sweep first (VERDICT r18
# hygiene item — Spark and DuckDB full suites back-to-back in one batch,
# so the headline divides two same-session artifacts), (2) the sf1.5
# structural sweep with the surgically-fixed model rows, (3) the sf6
# crossover extension for the dedup/span/simhash families. Produces:
#   BENCH_local_r19.json          — full Spark suite @ sf0.1, min-of-3
#   DUCKDB_BENCH_r19_full.json    — full DuckDB oracle suite @ sf0.1,
#                                   min-of-3, same session as the above
#   BENCH_structural_sf15_r19.json — full structural sweep @ sf1.5
#                                   (solo min-of-4 + DuckDB same box)
#   BENCH_structural_sf6_r19.json — dedup/span/simhash family @ sf6
set -euo pipefail
cd "$(dirname "$0")/.."

if [ ! -f /tmp/vout01/oracle_sql.json ]; then
  echo "== 0/4 regenerating oracle dump (Verify @ sf0.01)"
  SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout01" >/dev/null
fi

echo "== 1/4 PAIRED full sweep @ sf0.1 (Spark min-of-3 then DuckDB min-of-3, one session)"
rm -f BENCH_local_r19.json
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=3 \
  SPARK_GRAFT_BENCH_OUT=BENCH_local_r19.json \
  sbt -batch "runMain graft.Bench" | tail -1
python3 tools/bench_duckdb.py /root/testdata/sf0.1 /tmp/vout01/oracle_sql.json 3 600 \
  > DUCKDB_BENCH_r19_full.json
python3 - <<'EOF'
import json
s = json.load(open("BENCH_local_r19.json"))
d = json.load(open("DUCKDB_BENCH_r19_full.json"))
st = sum(v for v in s["queries"].values() if v >= 0)
dt = sum(v for v in d["queries"].values() if v >= 0)
print(f"PAIRED HEADLINE sf0.1: spark={st:.1f}s duckdb={dt:.1f}s ratio={st/dt:.3f}")
EOF

echo "== 2/4 full structural sweep @ sf1.5 (min-of-4, duck timeout 300)"
python3 tools/bench_structural.py benchdata/sf1.5 BENCH_structural_sf15_r19.json 4 300

echo "== 3/4 dedup/span/simhash family crossover @ sf6 (min-of-4, duck timeout 300)"
# (r20 ADVICE fix: the resume/timeout/gate logic was inline-duplicated
# from tools/bench_family.py here; call the tool instead so the two
# cannot drift)
python3 tools/bench_family.py benchdata/sf6 BENCH_structural_sf6_r19.json 4 300 \
  q_simhash_pairs q_span_cut q_span_cut_keep q_dedup_ngram q_dedup_keep \
  q_dup_spans q_winnow_pairs

echo DONE
