#!/usr/bin/env python3
"""Scale a testdata dir by an integer factor k for ratio-vs-scale bench
runs: each table becomes k copies with all key columns shifted by
copy_index * (domain_max + 1), so foreign keys stay consistent within a
copy and copies never collide. Document text is re-tokenized per copy
(every token suffixed with ~i), which keeps the near-dup rate constant
as the corpus grows — naive duplication would make every doc an exact
dup of k-1 others and blow candidate pairs up k^2, a workload no real
corpus has. n_chars is recomputed from the rewritten text.

Usage: python3 tools/scale_data.py <srcDir> <dstDir> <k>
"""
import sys, os
import duckdb

src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

def domain(table, col):
    return con.execute(
        f"SELECT max({col}) + 1 FROM '{src}/{table}.parquet'").fetchone()[0]

off = {
    "regionkey": domain("region", "r_regionkey"),
    "nationkey": domain("nation", "n_nationkey"),
    "custkey": domain("customer", "c_custkey"),
    "suppkey": domain("supplier", "s_suppkey"),
    "partkey": domain("part", "p_partkey"),
    "orderkey": domain("orders", "o_orderkey"),
    "event_id": domain("events", "event_id"),
    "user_id": domain("events", "user_id"),
    "doc_id": domain("documents", "doc_id"),
    "vec_id": domain("embeddings", "vec_id"),
}

# table -> {column: key domain}
shift = {
    "region": {"r_regionkey": "regionkey"},
    "nation": {"n_nationkey": "nationkey", "n_regionkey": "regionkey"},
    "customer": {"c_custkey": "custkey", "c_nationkey": "nationkey"},
    "supplier": {"s_suppkey": "suppkey", "s_nationkey": "nationkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey",
                 "l_suppkey": "suppkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}

RETOK = ("array_to_string(list_transform("
         "string_split_regex(trim(text), '\\s+'), x -> x || '~{i}'), ' ')")

for t, cols in shift.items():
    desc = con.execute(
        f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()
    pieces = []
    for i in range(k):
        sel = []
        for row in desc:
            name, typ = row[0], row[1]
            if name in cols:
                sel.append(
                    f"CAST({name} + {i} * {off[cols[name]]} AS {typ}) AS {name}")
            elif t == "documents" and name == "text" and i > 0:
                sel.append(RETOK.format(i=i) + " AS text")
            elif t == "documents" and name == "n_chars" and i > 0:
                sel.append(
                    f"CAST(length({RETOK.format(i=i)}) AS BIGINT) AS n_chars")
            else:
                sel.append(name)
        pieces.append(
            f"SELECT {', '.join(sel)} FROM '{src}/{t}.parquet'")
    q = " UNION ALL ".join(pieces)
    con.execute(f"COPY ({q}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")
