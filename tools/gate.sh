#!/usr/bin/env bash
# One-command correctness gate (round-9; VERDICT r8 ask #6).
#
# Runs, in order, failing fast:
#   1. sbt test                      — all ScalaTest suites
#   2. graft.Verify on sf0.001       — dump every driver query to parquet
#   3. tools/compare.py              — cell-exact DuckDB-oracle compare
#   4. tools/dtype_sweep.py          — oracle output dtype hygiene
#   5. golden row-count check        — dumps vs tools/golden_rowcounts.json
#
# Step 5 is the committed-expectation tripwire: it catches a query AND its
# oracle drifting together (which steps 3-4 cannot see). Regenerate the
# golden file intentionally with:  tools/gate.sh --regold
#
# Usage: tools/gate.sh [--regold] [sfDir] [verifyOutDir]
set -euo pipefail
cd "$(dirname "$0")/.."
REGOLD=0
if [ "${1:-}" = "--regold" ]; then REGOLD=1; shift; fi
SF=${1:-/root/testdata/sf0.001}
OUT=${2:-/tmp/graft_gate_verify}

echo "== gate 1/5: sbt test"
sbt -batch test

echo "== gate 2/5: Verify dump ($SF -> $OUT)"
rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF $OUT"

echo "== gate 3/5: oracle value compare"
python3 tools/compare.py "$SF" "$OUT"

echo "== gate 4/5: oracle dtype sweep"
python3 tools/dtype_sweep.py "$SF" "$OUT"

echo "== gate 5/5: golden row counts"
python3 - "$OUT" "$REGOLD" <<'PY'
import glob, json, os, sys
import duckdb
out, regold = sys.argv[1], sys.argv[2] == "1"
golden_path = "tools/golden_rowcounts.json"
counts = {}
for d in sorted(glob.glob(f"{out}/q_*")):
    name = os.path.basename(d)
    counts[name] = duckdb.sql(f"SELECT COUNT(*) FROM '{d}/*.parquet'").fetchone()[0]
if regold:
    json.dump(counts, open(golden_path, "w"), indent=0, sort_keys=True)
    print(f"regolded {len(counts)} row counts -> {golden_path}")
    sys.exit(0)
golden = json.load(open(golden_path))
bad = {k: (golden.get(k), counts.get(k))
       for k in set(golden) | set(counts) if golden.get(k) != counts.get(k)}
for k, (g, c) in sorted(bad.items()):
    print(f"GOLDEN DRIFT {k}: golden={g} actual={c}")
print(f"golden: {len(counts)} queries, {len(bad)} drifted")
sys.exit(1 if bad else 0)
PY
echo "== gate: ALL GREEN"
