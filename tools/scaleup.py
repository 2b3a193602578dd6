#!/usr/bin/env python3
"""Deterministic K-fold scale-up of a testdata dir (driver-side dev
tooling, like check.py — NOT engine code).

Purpose: the driver ships sf0.001/0.01/0.1 only, but every 100 TB
posture claim rests on shapes (chunked windows, LSH salting, prefix
sums, span merges) that should be exercised at least one decade above
the largest dev SF. This tool builds an sf~1 dataset as K shifted
copies of sf0.1:

  - fact/entity tables (orders, lineitem, customer, supplier, part,
    documents, embeddings, events) are unioned K times with their KEY
    columns shifted by i*OFFSET per copy, so all foreign-key joins stay
    within-copy and ids remain < 4e9 (the idHash no-overflow bound);
  - dimension tables (region, nation) and dimension-valued columns
    (nationkey, label, lang, source, event_type, ts) are NOT shifted —
    the domains a real corpus would hold fixed while it grows;
  - text/payload columns are copied verbatim: the scale-up makes every
    document a K-way exact-duplicate cluster, which is exactly the
    stress the dedup family's salting/banding must absorb.

The correctness gate is unchanged: graft.Verify dumps Spark results on
the generated dir and check.py replays the same DuckDB oracles on the
same parquet — the comparison is as binding at sf1 as at sf0.01.

Usage: python3 tools/scaleup.py [src=/root/testdata/sf0.1] \
         [dst=target/sf1] [K=10]
"""
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "target/sf1"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFFSET = 10**8

# key columns shifted per copy; everything else copied verbatim
SHIFT = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main():
    import os

    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for table, keys in SHIFT.items():
        src = f"{SRC}/{table}.parquet"
        cols = [r[0] for r in con.sql(f"describe select * from '{src}'").fetchall()]
        if not keys:
            # fixed dimension: copied once
            sel = f"SELECT * FROM '{src}'"
        else:
            parts = []
            for i in range(K):
                proj = ", ".join(
                    f"{c} + {i * OFFSET} AS {c}" if c in keys else c for c in cols
                )
                parts.append(f"SELECT {proj} FROM '{src}'")
            sel = " UNION ALL ".join(parts)
        con.sql(f"COPY ({sel}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
