#!/usr/bin/env python3
"""Assemble a BENCH_CURVE_x{k}.json from a paired Spark full-bench
artifact and a bench_duckdb.py output taken back-to-back at the same sf
dir. The ratio is computed over the ORACLE-COMMON queries only (those
DuckDB could run), mirroring the round-7 curve files.

Usage: python3 tools/make_curve.py <sparkFull.json> <duck.json> <k> <out> \
         [variance.json]

The optional variance.json carries {"<query>": {"min": s, "max": s,
"n": k, "note": "..."}} session-window bounds for queries whose reading
swings with neighbor load (the r12 verdict asked for the committed
number to carry its spread so it can't be misread as a regression).
"""
import sys, json

spark_path, duck_path, k, out = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]
spark = json.load(open(spark_path))
duck = json.load(open(duck_path))
variance = json.load(open(sys.argv[5])) if len(sys.argv) > 5 else None
common = [q for q, v in duck["queries"].items()
          if v is not None and q in spark["queries"]]
s_tot = round(sum(spark["queries"][q] for q in common), 3)
d_tot = round(sum(duck["queries"][q] for q in common), 3)
curve = {
    "scale_vs_sf0.1": k,
    "sf_dir": spark["sf"],
    "ratio_oracle_common": round(s_tot / d_tot, 3) if d_tot else None,
    "n_common": len(common),
    "spark_common_total_sec": s_tot,
    "duck_common_total_sec": d_tot,
    "spark": {"metric": "total", "value": spark["value"], "unit": "sec",
              "queries": spark["queries"], "sf": spark["sf"],
              "loadavg_start": spark.get("loadavg_start"),
              "loadavg_end": spark.get("loadavg_end"),
              "baseline": spark.get("baseline"),
              "reruns": spark.get("reruns", {})},
    "duckdb": duck,
}
if variance:
    curve["variance"] = variance
json.dump(curve, open(out, "w"), indent=1)
print(f"{out}: ratio {curve['ratio_oracle_common']} over {len(common)} "
      f"common (spark {s_tot}s / duck {d_tot}s)")
