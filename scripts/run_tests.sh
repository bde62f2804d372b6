#!/bin/sh
# Canonical one-command test run.
#
# Two pytest-xdist workers (one per core on this box); the persistent
# XLA compile cache in tests/conftest.py makes warm runs dominated by
# actual test execution instead of recompiles.
set -e
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -q -n 2 "$@"
