#!/usr/bin/env python3
"""Oracle dtype-hygiene sweep (round-9 convention; see OracleSql.scala).

DESCRIBEs every oracle SQL in DuckDB and diffs the declared output types
against the Spark parquet dump's schema. Catches DuckDB's silent integer
promotions (SUM -> HUGEINT, `//` inheriting it, AVG -> DOUBLE) that the
value-level compare in compare.py cannot see but the driver's hash does.

Usage: python3 tools/dtype_sweep.py <sfDir> <verifyOutDir>
"""
import json, sys
import duckdb

def norm(t):
    t = t.upper()
    if t in ("INTEGER", "SMALLINT", "TINYINT", "BIGINT",
             "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT"):
        return "INT"  # widths <= 64 bit hash identically driver-side
    if t == "HUGEINT":
        return "HUGEINT"  # INT128: the q_transitions flake
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "FLOAT"
    return t  # DECIMAL(p,s) and everything else must match exactly

def main():
    sf, vout = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders "
              "lineitem events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracles = json.load(open(f"{vout}/oracle_sql.json"))
    issues = 0
    for name, sql in sorted(oracles.items()):
        try:
            otypes = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
        except Exception as e:
            print(f"{name}: DESCRIBE ERROR {str(e)[:120]}")
            issues += 1
            continue
        try:
            stypes = {r[0]: r[1] for r in con.execute(
                f"DESCRIBE SELECT * FROM '{vout}/{name}/*.parquet'").fetchall()}
        except Exception as e:
            print(f"{name}: no spark dump ({str(e)[:80]})")
            issues += 1
            continue
        if set(otypes) != set(stypes):
            print(f"{name}: COLS oracle={sorted(otypes)} spark={sorted(stypes)}")
            issues += 1
            continue
        for c in sorted(otypes):
            if norm(otypes[c]) != norm(stypes[c]):
                print(f"{name}.{c}: oracle={otypes[c]} spark={stypes[c]}")
                issues += 1
    print(f"dtype_sweep: {issues} issues across {len(oracles)} oracles")
    return 1 if issues else 0

if __name__ == "__main__":
    sys.exit(main())
