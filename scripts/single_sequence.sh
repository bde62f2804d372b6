#!/usr/bin/env bash
# One-off run — mirror of /root/reference/test/single_sequence.sh.
#   ./scripts/single_sequence.sh image=<dir> calib=<file> [times=..] [start=..]
HERE="$(cd "$(dirname "$0")" && pwd)"
exec python "$HERE/run_dataset.py" "$@"
