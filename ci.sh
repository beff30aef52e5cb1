#!/bin/sh
# One-command CI: full test suite on the forced-CPU backend, then a dry
# bench run (pipeline + JSON-contract check) and the multi-chip dryrun.
set -e
cd "$(dirname "$0")"
python -m pytest tests/ -q
python bench.py --dry
python __graft_entry__.py dryrun 8
echo "CI OK"
