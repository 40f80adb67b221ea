#!/bin/bash
# Local correctness loop: sbt-run Verify at a small SF, then DuckDB-compare.
# Usage: scripts/check.sh [sfdir]
set -euo pipefail
SF=${1:-/root/testdata/sf0.01}
OUT=/tmp/verify_out
cd /root/repo
# Run the smoke gate unconditionally first (r9 verdict ask #2): even a
# hook-bypassing commit path gets caught by the build log this way.
bash scripts/smoke.sh
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 | grep -E "\[verify\]|error\]:" || true
python3 scripts/check_oracle.py "$SF" "$OUT"
