#!/usr/bin/env bash
# 2-process multi-host smoke test (VERDICT r2 task 10).
#
# Spawns two CPU processes, each with 4 virtual devices; jax.distributed
# joins them into one 8-device global mesh. Asserts sharded_detect and one
# distributed BA step match single-process compute. This is the scaled-down
# rehearsal of the real pod recipe (same init, same mesh, same collectives
# — DCN replaced by localhost gRPC).
#
# Usage: bash scripts/multihost_smoke.sh [port]
set -euo pipefail
cd "$(dirname "$0")/.."
PORT="${1:-$(( (RANDOM % 20000) + 20000 ))}"

LOG0=$(mktemp /tmp/mh_p0.XXXX.log)
LOG1=$(mktemp /tmp/mh_p1.XXXX.log)

timeout 300 python scripts/multihost_worker.py 0 2 "$PORT" >"$LOG0" 2>&1 &
P0=$!
timeout 300 python scripts/multihost_worker.py 1 2 "$PORT" >"$LOG1" 2>&1 &
P1=$!

FAIL=0
wait "$P0" || FAIL=1
wait "$P1" || FAIL=1

echo "--- process 0 ---"; cat "$LOG0"
echo "--- process 1 ---"; cat "$LOG1"

if [ "$FAIL" -ne 0 ] || ! grep -q "OK" "$LOG0" || ! grep -q "OK" "$LOG1"; then
  echo "MULTIHOST SMOKE: FAILED"
  exit 1
fi
echo "MULTIHOST SMOKE: PASSED (2 processes x 4 devices, 8-device global mesh)"
