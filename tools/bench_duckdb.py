#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB at a given sf (baseline proxy for bench
comparisons). Usage: python3 tools/bench_duckdb.py <sfDir> <oracleJson>"""
import sys, json, time, os
import duckdb

sf_dir, oracle_path = sys.argv[1], sys.argv[2]
con = duckdb.connect()
con.execute(f"SET threads TO 32")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
oracle = json.load(open(oracle_path))
# Warm pass mirroring graft.Bench: run each SQL once unmeasured so the
# timed pass compares warm-vs-warm (Spark's bench warms every query at
# the measured sf before timing; timing DuckDB cold would bias the ratio
# in Spark's favor).
for name, sql in sorted(oracle.items()):
    try:
        con.execute(sql).fetchall()
    except Exception:
        pass
times = {}
for name, sql in sorted(oracle.items()):
    t0 = time.time()
    try:
        con.execute(sql).fetchall()
        times[name] = round(time.time() - t0, 3)
    except Exception as e:
        times[name] = None
def loadavg():
    try:
        return float(open("/proc/loadavg").read().split()[0])
    except Exception:
        return -1.0

print(json.dumps({"total": round(sum(v for v in times.values() if v), 2),
                  "sf_dir": sf_dir, "loadavg_end": loadavg(),
                  "queries": times}))
