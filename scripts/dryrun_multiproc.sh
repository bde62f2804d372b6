#!/usr/bin/env bash
# Two-process jax.distributed dryrun of the distributed windowed BA
# (VERDICT r4 item 7): 2 processes x 4 virtual CPU devices = one 8-device
# global mesh with cross-process collectives.  Writes
# artifacts/MULTIPROC_BA.json on success.
set -euo pipefail
cd "$(dirname "$0")/.."
PORT="${1:-12361}"
OUT="artifacts/MULTIPROC_BA.json"
python scripts/_dryrun_multiproc_worker.py 0 2 "$PORT" "$OUT" &
P0=$!
python scripts/_dryrun_multiproc_worker.py 1 2 "$PORT" &
P1=$!
trap 'kill $P0 $P1 2>/dev/null || true' EXIT
wait "$P0"
wait "$P1"
trap - EXIT
echo "dryrun_multiproc: OK ($OUT)"
