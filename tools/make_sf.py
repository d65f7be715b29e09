#!/usr/bin/env python3
"""Scale up a testdata tier by key-shifted replication, for the heavy
bench tier (BASELINE.md "sf0.5"): 80/94 queries finish <0.5 s in DuckDB
at sf0.1, so the 2x gate there measures per-query constants. This builds
a K-fold copy of sf0.1 with every key domain shifted consistently
(orders.o_custkey moves with customer.c_custkey etc.), giving both
engines identical bigger inputs whose joins still resolve.

pyarrow (driver-side tooling, like tools/compare.py) so the parquet
schema is preserved BIT-FOR-BIT — in particular events.ts keeps the
source tier's encoding (timestamp[us] since the r7 regeneration;
INT64 TIMESTAMP(NANOS) before), so Spark's adaptive Tables.events and
DuckDB see the same type; a DuckDB COPY could silently rewrite it and
fork the two engines' views.

Usage: python3 tools/make_sf.py <srcDir> <outDir> [K=5]
"""
import sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# per-table key columns, by the domain they draw from
KEYS = {
    "customer": {"c_custkey": "cust"},
    "orders": {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "ord", "l_partkey": "part", "l_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supp"},
    "events": {"event_id": "ev", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
    # nation/region: dimensions, replicated as-is would duplicate PKs
}
DIMS = ["nation", "region"]
DOMAIN_COL = {"cust": ("customer", "c_custkey"), "ord": ("orders", "o_orderkey"),
              "part": ("part", "p_partkey"), "supp": ("supplier", "s_suppkey"),
              "ev": ("events", "event_id"), "user": ("events", "user_id"),
              "doc": ("documents", "doc_id"), "vec": ("embeddings", "vec_id")}


def main():
    src, out = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    import os
    os.makedirs(out, exist_ok=True)
    offs = {}
    for dom, (tbl, col) in DOMAIN_COL.items():
        t = pq.read_table(f"{src}/{tbl}.parquet", columns=[col])
        offs[dom] = pc.max(t.column(col)).as_py() + 1
    for tbl in DIMS:
        pq.write_table(pq.read_table(f"{src}/{tbl}.parquet"), f"{out}/{tbl}.parquet")
        print(f"{tbl}: copied")
    for tbl, keys in KEYS.items():
        t = pq.read_table(f"{src}/{tbl}.parquet")
        parts = []
        for b in range(k):
            cols = []
            for name in t.column_names:
                col = t.column(name)
                if name in keys and b > 0:
                    shifted = pc.add(col, pa.scalar(b * offs[keys[name]],
                                                    type=col.type))
                    cols.append(shifted)
                else:
                    cols.append(col)
            parts.append(pa.table(dict(zip(t.column_names, cols)), schema=t.schema))
        big = pa.concat_tables(parts)
        # Realistic row-group sizing (~4 MB in-memory per group): pyarrow's
        # default would emit 1-3 giant row groups per file, and BOTH
        # engines parallelize parquet scans at row-group granularity — a
        # 1-row-group documents table caps every scan at ONE task on a
        # 32-core box, which no real 100 TB table would. Values/schema are
        # unchanged; only the grouping (hence scan parallelism) is.
        rgs = max(4096, int(big.num_rows * (4 << 20) / max(big.nbytes, 1)))
        pq.write_table(big, f"{out}/{tbl}.parquet", row_group_size=rgs)
        print(f"{tbl}: {t.num_rows} -> {big.num_rows} (row_group_size={rgs})")


if __name__ == "__main__":
    main()
