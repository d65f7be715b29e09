#!/usr/bin/env bash
# R16 measurement batch — runs SEQUENTIALLY on a quiet box (clean solo
# timings). Produces:
#   /tmp/r16_solo_sf01.json      — solo min-of-6 sf0.1 rows (England family,
#                                  geo_geojson, data_tests, dup_clusters HEAD)
#   /tmp/r16_ab_r13.json         — dup-clusters A/B at the r13 commit (worktree)
#   BENCH_structural_sf15_r16.json — full structural sweep at sf1.5 (min-of-6)
set -uo pipefail
cd "$(dirname "$0")/.."

SOLO_QS="q_model_authority_scores_england q_model_permit_details_england q_model_impact_scores_england q_model_authority_scores q_geo_geojson q_model_data_tests q_dup_clusters q_dup_clusters_star"

echo "== 1/3 solo min-of-6 @ sf0.1 (HEAD)"
python3 - <<'EOF'
import json, os, re, subprocess
out = {}
for q in "q_model_authority_scores_england q_model_permit_details_england q_model_impact_scores_england q_model_authority_scores q_geo_geojson q_model_data_tests q_dup_clusters q_dup_clusters_star".split():
    detail = f"/tmp/bench_solo01_{q}.json"
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
               SPARK_GRAFT_BENCH_RUNS="6", SPARK_GRAFT_BENCH_OUT=detail)
    r = subprocess.run(["sbt", "-batch", f"runMain graft.Bench {q}"],
                       capture_output=True, text=True, env=env)
    try:
        out[q] = round(json.load(open(detail))["queries"][q], 3)
    except Exception as e:
        out[q] = f"ERR {e}"
    print(q, out[q], flush=True)
    json.dump(out, open("/tmp/r16_solo_sf01.json", "w"), indent=1)
EOF

echo "== 2/3 dup-clusters A/B at r13 (318f701) in a worktree"
git worktree add /tmp/wt_r13 318f701 2>/dev/null || true
python3 - <<'EOF'
import json, os, subprocess
out = {}
for q in ["q_dup_clusters", "q_dup_clusters_star"]:
    detail = f"/tmp/bench_r13_{q}.json"
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
               SPARK_GRAFT_BENCH_RUNS="6", SPARK_GRAFT_BENCH_OUT=detail)
    r = subprocess.run(["sbt", "-batch", f"runMain graft.Bench {q}"],
                       capture_output=True, text=True, env=env,
                       cwd="/tmp/wt_r13")
    try:
        out[q] = round(json.load(open(detail))["queries"][q], 3)
    except Exception as e:
        out[q] = f"ERR {e}"
    print("r13", q, out[q], flush=True)
    json.dump(out, open("/tmp/r16_ab_r13.json", "w"), indent=1)
EOF
git worktree remove --force /tmp/wt_r13 2>/dev/null || true

echo "== 3/3 full structural sweep @ sf1.5 (min-of-6, duck timeout 300)"
python3 tools/bench_structural.py benchdata/sf1.5 BENCH_structural_sf15_r16.json 6 300
echo "DONE"
