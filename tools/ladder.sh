#!/bin/bash
# One paired curve window: wait for a quiet host, run the Spark full
# bench at $1, then bench_duckdb.py back-to-back on the same dir.
# Usage: tools/ladder.sh <sfDir> <tag> <outDir> [oracleJson]
# Writes <outDir>/spark_<tag>.json and <outDir>/duck_<tag>.json.
set -u
cd "$(dirname "$0")/.."   # sbt + BENCH_FULL.json live at the repo root
SFDIR="$1"; TAG="$2"; OUT="$3"; ORACLE="${4:-/tmp/vfull_01/oracle_sql.json}"
mkdir -p "$OUT"
# settle: wait until 1-min loadavg is quiet (cap the wait at ~8 min)
for i in $(seq 1 48); do
  L=$(cut -d' ' -f1 /proc/loadavg)
  ok=$(python3 -c "print(1 if $L < 2.0 else 0)")
  [ "$ok" = "1" ] && break
  sleep 10
done
echo "window start loadavg: $(cut -d' ' -f1 /proc/loadavg)"
SPARK_GRAFT_SF_DIR="$SFDIR" sbt -batch 'runMain graft.Bench' 2>/dev/null \
  | grep -E '^\{' > "$OUT/sparkline_$TAG.json"
# a failed bench must not silently hand this window a STALE
# BENCH_FULL.json from an earlier run (possibly at another sf)
if [ ! -s "$OUT/sparkline_$TAG.json" ]; then
  echo "ladder: Spark bench produced no JSON line for $TAG — window discarded" >&2
  exit 1
fi
python3 -c "
import json, sys
s = json.load(open('$OUT/sparkline_$TAG.json'))
f = json.load(open('BENCH_FULL.json'))
sys.exit(0 if s['sf'] == '$SFDIR' == f['sf'] and s['value'] == f['value'] else 1)
" || { echo "ladder: BENCH_FULL.json does not match this window's run — discarded" >&2; exit 1; }
cp BENCH_FULL.json "$OUT/spark_$TAG.json"   # full per-query map
python3 tools/bench_duckdb.py "$SFDIR" "$ORACLE" > "$OUT/duck_$TAG.json" \
  || { echo "ladder: duck bench failed for $TAG — window discarded" >&2; exit 1; }
python3 - "$OUT" "$TAG" <<'EOF'
import json, sys
out, tag = sys.argv[1], sys.argv[2]
s = json.load(open(f"{out}/spark_{tag}.json"))
d = json.load(open(f"{out}/duck_{tag}.json"))
common = [q for q, v in d["queries"].items() if v is not None and q in s["queries"]]
st = sum(s["queries"][q] for q in common); dt = sum(d["queries"][q] for q in common)
print(f"{tag}: spark_common {st:.2f}s duck_common {dt:.2f}s ratio {st/dt:.3f} "
      f"n={len(common)} spark_total {s['value']} prewarm {s.get('loadavg_prewarm')} "
      f"reruns {len(s.get('reruns', {}))}")
EOF
