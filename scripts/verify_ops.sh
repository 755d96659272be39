#!/usr/bin/env bash
# Tiered verify, iteration loop (r12 verdict #4): run ONLY the named
# registry entries through Verify + the DuckDB oracle compare (~25 s)
# instead of the full 265+-entry registry (~9 min). The full registry
# still runs exactly once, at round close — see the round workflow in
# .claude/skills/verify/SKILL.md.
#
# Usage: scripts/verify_ops.sh <op_name> [op_name ...]
set -euo pipefail
if [ $# -lt 1 ]; then
  echo "usage: $0 <op_name> [op_name ...]" >&2
  exit 2
fi
SF="${SPARK_GRAFT_SF_DIR_VERIFY:-/root/testdata/sf0.01}"
OUT="${SPARK_GRAFT_VERIFY_OUT:-/tmp/verify_subset}"
cd "$(dirname "$0")/.."
sbt -batch "runMain graft.Verify $SF $OUT $*"
python3 scripts/oracle_check.py "$SF" "$OUT"
