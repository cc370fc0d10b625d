#!/bin/bash
# Local mirror of the CI pipeline (role of the reference's run_ci_tests.sh).
set -euo pipefail

export JAX_PLATFORMS=cpu

echo "== lint =="
if command -v flake8 >/dev/null; then
  flake8 --max-line-length 132 --extend-ignore E203,W503,E731,E741 marex_tpu || true
fi

echo "== tests =="
python -m pytest tests/ -q --durations=15 "$@"

echo "== graft entry =="
python __graft_entry__.py
python -c "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"

echo "== bench (small) =="
MAREX_BENCH_YEARS=2 MAREX_BENCH_NY=30 MAREX_BENCH_NX=60 python bench.py
