#!/usr/bin/env bash
# Pre-commit gate: never commit a non-compiling HEAD (round-3 failure mode).
#
# Usage:
#   tools/preflight.sh              # compile + unit specs
#   tools/preflight.sh --fast       # compile only
#   tools/preflight.sh --gate       # compile + specs + sf0.001 Verify + check.py
#
# Exit non-zero on any failure; commit only when this exits 0.
set -euo pipefail
cd "$(dirname "$0")/.."

mode="${1:-}"

echo "[preflight] sbt compile"
sbt -batch compile Test/compile < /dev/null

if [[ "$mode" != "--fast" ]]; then
  echo "[preflight] sbt test"
  sbt -batch test < /dev/null
fi

if [[ "$mode" == "--gate" ]]; then
  out=/tmp/preflight_verify
  rm -rf "$out"
  echo "[preflight] Verify sf0.001 -> $out"
  sbt -batch "runMain graft.Verify /root/testdata/sf0.001 $out" < /dev/null
  echo "[preflight] check.py"
  python3 tools/check.py /root/testdata/sf0.001 "$out"

  # Replicate the driver's bench parse: capture sbt's combined output and
  # json-parse the LAST non-empty line. Subset + sf0.001 keeps it fast;
  # the parse contract (undecorated final JSON line) is sf-independent.
  echo "[preflight] bench line parse smoke"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 \
    SPARK_GRAFT_ONLY=q01_pricing_summary,txt_quality \
    sbt -batch "runMain graft.Bench" < /dev/null 2>&1 \
    | tee /tmp/preflight_bench.out >/dev/null
  python3 - <<'EOF'
import json
lines = [l.strip() for l in open("/tmp/preflight_bench.out") if l.strip()]
last = lines[-1]
d = json.loads(last)  # raises (non-zero exit) if the driver couldn't parse it
assert d.get("metric") == "total" and d.get("n_queries", 0) > 0, d
print("[preflight] bench line parses:", {k: d[k] for k in ("metric", "value", "n_queries")})
EOF
fi

echo "[preflight] OK"
