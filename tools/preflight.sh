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
fi

echo "[preflight] OK"
